"""
whatshap_tpu — a TPU-native read-based phasing engine.

A from-scratch reimplementation of the capabilities of WhatsHap
(read-based phasing of genomic variants via the weighted Minimum Error
Correction problem and its pedigree generalization), designed TPU-first:

- The wMEC/PedMEC column dynamic program runs as a JAX/XLA column scan in
  which the whole 2^coverage bipartition state space of a column is updated
  at once; the per-column cost over all bipartitions is computed with a
  bit-matrix matmul on the MXU (replacing the CPU Gray-code trick of the
  reference with a formulation that is exact and embarrassingly vectorized).
- Independent phase blocks are packed into fixed-shape padded tensors and
  batched per chip; blocks shard data-parallel over a ``jax.sharding.Mesh``
  for multi-host scale-out.
- Host-side I/O (BAM/VCF/FASTA) is implemented natively (no pysam).

Reference behavior parity target: whatshap/whatshap (v2.8 era).
"""

__version__ = "0.1.0"

__all__ = ["__version__"]
