"""
Multi-device sharding: the full batched solve, sharded over a
jax.sharding.Mesh of the 8 virtual CPU devices (conftest), must be
bit-identical to per-block serial host solves — costs, transmission paths
and read partitionings.
"""

import jax
import numpy as np
import pytest

from whatshap_tpu.parallel import mesh as mesh_mod
from whatshap_tpu.parallel import workloads

pytestmark = pytest.mark.skipif(
    jax.device_count() < 2, reason="needs a multi-device (virtual) platform"
)


def _mesh(n=None):
    devices = jax.devices()[: n or jax.device_count()]
    return mesh_mod.make_block_mesh(devices), len(devices)


def test_single_sample_sharded_parity():
    mesh, n = _mesh()
    K, T, P, packed_list, arrays = workloads.build_single_sample_batch(
        2 * n, n_cols=32, coverage=5, seed=11
    )
    costs, index_paths, trans_paths = mesh_mod.solve_blocks_sharded(mesh, K, T, P, arrays)
    assert costs.shape == (2 * n,)
    workloads.assert_batched_matches_serial(packed_list, costs, index_paths, trans_paths)


def test_trio_sharded_parity():
    mesh, n = _mesh()
    K, T, P, packed_list, arrays = workloads.build_trio_batch(n, n_pos=12, seed=23)
    assert T == 4
    costs, index_paths, trans_paths = mesh_mod.solve_blocks_sharded(
        mesh, K, T, P, [np.asarray(a) for a in arrays]
    )
    workloads.assert_batched_matches_serial(packed_list, costs, index_paths, trans_paths)


def test_sharded_matches_unsharded_device_solve():
    """Sharding must not change results vs the same batched solve on one
    device."""
    from whatshap_tpu.ops import wmec

    mesh, n = _mesh()
    K, T, P, _packed, arrays = workloads.build_single_sample_batch(
        2 * n, n_cols=16, coverage=4, seed=3
    )
    sharded = mesh_mod.solve_blocks_sharded(mesh, K, T, P, arrays)
    plain = wmec.solve_batched(K, T, P, *[np.asarray(a) for a in arrays])
    np.testing.assert_array_equal(sharded[0], np.asarray(plain[0]))
    np.testing.assert_array_equal(sharded[1], np.asarray(plain[1]))
    np.testing.assert_array_equal(sharded[2], np.asarray(plain[2]))


def test_input_arrays_actually_sharded():
    """device_put with the block sharding must place distinct shards on
    distinct devices (catches silently-replicated layouts)."""
    from jax.sharding import NamedSharding, PartitionSpec

    mesh, n = _mesh()
    K, T, P, _packed, arrays = workloads.build_single_sample_batch(
        n, n_cols=16, coverage=4, seed=5
    )
    sharding = NamedSharding(mesh, PartitionSpec("blocks"))
    x = jax.device_put(arrays[0], sharding)
    used_devices = {shard.device for shard in x.addressable_shards}
    assert len(used_devices) == n
    per_shard = {shard.data.shape[0] for shard in x.addressable_shards}
    assert per_shard == {arrays[0].shape[0] // n}
