"""AOT trace cache (utils/aotcache.py): round-trip identity and fallback."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from functools import partial

import jax.numpy as jnp

from whatshap_tpu.utils import aotcache


@partial(jax.jit, static_argnames=("k",))
def _toy_kernel(k, x, y):
    return (x * k + y, jnp.cumsum(x, axis=-1))


def test_aot_call_matches_direct(tmp_path, monkeypatch):
    monkeypatch.setattr(aotcache, "_DIR", tmp_path)
    aotcache._mem.clear()
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    y = jnp.ones((3, 4), jnp.float32)
    direct = jax.tree.map(np.asarray, _toy_kernel(3, x, y))
    via_aot = jax.tree.map(np.asarray, aotcache.aot_call(_toy_kernel, (3,), (x, y)))
    for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(via_aot)):
        np.testing.assert_array_equal(a, b)
    # an artifact was written and the second call loads it from memory
    arts = list(tmp_path.glob("*.jaxexp"))
    assert len(arts) == 1
    again = jax.tree.map(np.asarray, aotcache.aot_call(_toy_kernel, (3,), (x, y)))
    for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(again)):
        np.testing.assert_array_equal(a, b)


def test_aot_call_cold_process_load(tmp_path, monkeypatch):
    """A fresh in-memory state (new process simulation) must load the
    serialized artifact instead of re-exporting."""
    monkeypatch.setattr(aotcache, "_DIR", tmp_path)
    aotcache._mem.clear()
    x = jnp.zeros((2, 2), jnp.float32)
    y = jnp.zeros((2, 2), jnp.float32)
    aotcache.aot_call(_toy_kernel, (2,), (x, y))
    (art,) = tmp_path.glob("*.jaxexp")
    mtime = art.stat().st_mtime_ns
    aotcache._mem.clear()  # simulate a cold process
    out = jax.tree.map(np.asarray, aotcache.aot_call(_toy_kernel, (2,), (x, y)))
    assert art.stat().st_mtime_ns == mtime  # loaded, not re-exported
    direct = jax.tree.map(np.asarray, _toy_kernel(2, x, y))
    for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(out)):
        np.testing.assert_array_equal(a, b)


def test_aot_call_corrupt_artifact_falls_back(tmp_path, monkeypatch):
    monkeypatch.setattr(aotcache, "_DIR", tmp_path)
    aotcache._mem.clear()
    x = jnp.zeros((2, 3), jnp.float32)
    y = jnp.ones((2, 3), jnp.float32)
    aotcache.aot_call(_toy_kernel, (5,), (x, y))
    (art,) = tmp_path.glob("*.jaxexp")
    art.write_bytes(b"garbage")
    aotcache._mem.clear()
    out = jax.tree.map(np.asarray, aotcache.aot_call(_toy_kernel, (5,), (x, y)))
    direct = jax.tree.map(np.asarray, _toy_kernel(5, x, y))
    for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(out)):
        np.testing.assert_array_equal(a, b)


def test_aot_disabled_by_env(tmp_path, monkeypatch):
    monkeypatch.setattr(aotcache, "_DIR", tmp_path)
    monkeypatch.setenv("WHATSHAP_TPU_NO_AOT_CACHE", "1")
    aotcache._mem.clear()
    x = jnp.zeros((1,), jnp.float32)
    out = aotcache.aot_call(_toy_kernel, (4,), (x, x))
    assert not list(tmp_path.glob("*.jaxexp"))
    np.testing.assert_array_equal(np.asarray(out[0]), np.zeros((1,), np.float32))
