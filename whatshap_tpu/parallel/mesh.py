"""
Multi-chip execution: shard batched phase blocks data-parallel over a
``jax.sharding.Mesh``.

The reference is single-core (SURVEY.md section 2.7); the natural parallel
axes it leaves unused are chromosomes x samples x connected phase blocks.
Here, independent blocks are bucketed/padded (parallel.blocks), stacked on a
batch axis, and sharded across devices; each device runs the column-scan DP
for its shard.  Phase blocks are embarrassingly parallel: the only
collective is the implicit gather of the (tiny) per-block cost/path outputs
back to the host for VCF writing, so scaling is near-linear by
construction.

Multi-host: initialize_distributed() wires ``jax.distributed`` from
environment variables; the same mesh/sharding code then spans all hosts'
devices (block batches ride ICI within a host and DCN across hosts, but
only for the scalar outputs).
"""

import logging
import os
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import wmec

logger = logging.getLogger(__name__)


def initialize_distributed() -> bool:
    """Initialize jax.distributed for multi-host runs when the environment
    requests it (WHATSHAP_TPU_COORDINATOR, plus optionally
    WHATSHAP_TPU_NUM_PROCESSES / WHATSHAP_TPU_PROCESS_ID).  Returns True if
    a multi-process runtime was set up.  Single-host runs need none of
    this."""
    coordinator = os.environ.get("WHATSHAP_TPU_COORDINATOR")
    if not coordinator:
        return False
    kwargs = {"coordinator_address": coordinator}
    if "WHATSHAP_TPU_NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(os.environ["WHATSHAP_TPU_NUM_PROCESSES"])
    if "WHATSHAP_TPU_PROCESS_ID" in os.environ:
        kwargs["process_id"] = int(os.environ["WHATSHAP_TPU_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local + %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def make_block_mesh(devices: Optional[Sequence] = None, axis_name: str = "blocks") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def _shard_batch(mesh: Mesh, arrays, axis_name: str):
    sharding = NamedSharding(mesh, P(axis_name))
    return [jax.device_put(a, sharding) for a in arrays]


def run_blocks_sharded(mesh: Mesh, K: int, T: int, P_: int, arrays, axis_name: str = "blocks"):
    """Batched forward DP (costs only) with the block axis sharded over the
    mesh.  The leading batch dimension must be divisible by the mesh
    size."""
    return wmec.forward_cost_batched(K, T, P_, *_shard_batch(mesh, arrays, axis_name))


def solve_blocks_sharded(mesh: Mesh, K: int, T: int, P_: int, arrays, axis_name: str = "blocks"):
    """FULL batched solve (forward + device backtrace) with the block axis
    sharded over the mesh.  Returns host numpy (costs (B,), index paths
    (B, C), transmission paths (B, C)) — bit-identical to per-block
    ``run_dp`` solves."""
    costs, index_paths, trans_paths = wmec.solve_batched(
        K, T, P_, *_shard_batch(mesh, arrays, axis_name)
    )
    # single device_get call: one host<->device round trip for all outputs
    return tuple(
        np.asarray(x) for x in jax.device_get((costs, index_paths, trans_paths))
    )


def optimal_costs_from_batched(dp_last: np.ndarray) -> np.ndarray:
    """Final MEC cost per block from the batched forward output."""
    return np.asarray(dp_last).min(axis=(1, 2))
