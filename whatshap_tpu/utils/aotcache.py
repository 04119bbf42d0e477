"""AOT trace cache for the batched device kernels.

The persistent XLA compilation cache (utils/jaxcache.py) removes the
*compile* cost of a cold process, but every process still pays the Python
*tracing* cost of the big Pallas kernels — the column loop is unrolled at
trace time, so a single trio-shaped bucket (K=15, T=4, C=64) takes ~10 s
to trace even when its executable is a cache hit.  jax.export serializes
the traced StableHLO; deserializing it on the next process takes
milliseconds and lowers to the same executable (bit-identical outputs —
validated in tests/test_aot_cache.py), so cold CLI runs skip tracing
entirely.

Artifacts are keyed by jax version, backend, device kind, function name,
static args, input avals, and a fingerprint of the kernel source files, so
any code or environment change invalidates cleanly.  Every failure path
falls back to the direct jitted call.
"""

import hashlib
import logging
import os
import threading
from pathlib import Path

logger = logging.getLogger(__name__)

_DIR = Path(
    os.environ.get("WHATSHAP_TPU_AOT_CACHE_DIR")
    or os.path.join(os.path.expanduser("~"), ".cache", "whatshap_tpu", "aot")
)
_mem: dict = {}  # key -> wrapped exported callable, or None (= use direct)
_lock = threading.Lock()
_fingerprint = None


def _source_fingerprint() -> str:
    """Hash of the kernel-defining sources; any edit invalidates the cache."""
    global _fingerprint
    if _fingerprint is None:
        h = hashlib.sha256()
        from ..ops import genotyping_jax, genotyping_pallas, wmec, wmec_pallas

        for mod in (wmec, wmec_pallas, genotyping_jax, genotyping_pallas):
            try:
                h.update(Path(mod.__file__).read_bytes())
            except OSError:
                pass
        _fingerprint = h.hexdigest()[:16]
    return _fingerprint


def _load_or_export(fn, key: str, statics, arrays):
    import jax

    path = _DIR / f"{key}.jaxexp"
    try:
        blob = path.read_bytes()
    except OSError:
        blob = None
    if blob is not None:
        try:
            exp = jax.export.deserialize(bytearray(blob))
            return jax.jit(exp.call)
        except Exception as exc:  # corrupt / version-skewed artifact
            logger.debug("aot cache load failed for %s: %s", key, exc)
            try:
                path.unlink()
            except OSError:
                pass
    try:
        sds = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays]
        exp = jax.export.export(fn)(*statics, *sds)
        blob = exp.serialize()
        _DIR.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(f".tmp{os.getpid()}")
        tmp.write_bytes(blob)
        os.replace(tmp, path)
        return jax.jit(exp.call)
    except Exception as exc:  # pragma: no cover - best-effort cache
        logger.debug("aot export failed for %s: %s", key, exc)
        return None


def aot_call(fn, statics, arrays):
    """Call jitted ``fn(*statics, *arrays)`` through a serialized export
    when one exists (or can be made) for this exact signature; identical
    results either way, but later processes skip the Python trace."""
    if os.environ.get("WHATSHAP_TPU_NO_AOT_CACHE"):
        return fn(*statics, *arrays)
    import jax

    name = getattr(fn, "__name__", None) or type(fn).__name__
    try:
        dev_kind = getattr(jax.devices()[0], "device_kind", "?")
    except Exception:
        dev_kind = "?"
    key_src = repr(
        (
            jax.__version__,
            jax.default_backend(),
            dev_kind,
            name,
            statics,
            tuple((tuple(a.shape), str(a.dtype)) for a in arrays),
            _source_fingerprint(),
        )
    )
    key = f"{name}-{hashlib.sha256(key_src.encode()).hexdigest()[:24]}"
    if key not in _mem:
        with _lock:
            if key not in _mem:
                _mem[key] = _load_or_export(fn, key, statics, arrays)
    wrapped = _mem[key]
    if wrapped is None:
        return fn(*statics, *arrays)
    return wrapped(*arrays)
