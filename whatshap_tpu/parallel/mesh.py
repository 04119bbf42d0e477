"""
Multi-chip execution: shard batched phase blocks data-parallel over a
``jax.sharding.Mesh``.

The reference is single-core (SURVEY.md section 2.7); the natural parallel
axes it leaves unused are chromosomes x samples x connected phase blocks.
Here, independent blocks are bucketed/padded (parallel.blocks), stacked on a
batch axis, and sharded across devices; each device runs the column-scan DP
for its shard.  The only collective needed is the implicit gather of final
costs/haplotypes back to the host for VCF writing — phase blocks are
embarrassingly parallel, so scaling is near-linear by construction.
"""

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import wmec


def make_block_mesh(devices: Optional[Sequence] = None, axis_name: str = "blocks") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def run_blocks_sharded(mesh: Mesh, K: int, T: int, P_: int, arrays, axis_name: str = "blocks"):
    """Run the batched forward DP with the block axis sharded over the mesh.

    ``arrays`` is the tuple from parallel.blocks.stack_blocks; the leading
    batch dimension must be divisible by the mesh size.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    device_arrays = [jax.device_put(a, sharding) for a in arrays]
    out = wmec.forward_cost_batched(K, T, P_, *device_arrays)
    return out


def optimal_costs_from_batched(dp_last: np.ndarray) -> np.ndarray:
    """Final MEC cost per block from the batched forward output."""
    return np.asarray(dp_last).min(axis=(1, 2))
