"""
GenotypeDPTable (forward-backward genotyping) and the per-column prior
genotyper, with the reference API (whatshap/core.pyx:581-618, backed by
src/genotypedptable.cpp and src/genotyper.cpp).
"""

import math
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core.genotype import Genotype
from ..core.pedigree_model import Pedigree
from ..core.phredgl import PhredGenotypeLikelihoods
from ..core.readset import ReadSet
from ..ops import genotyping as gt_ops
from ..ops import wmec

#: When set, every genotyping instance is passed to this callable as
#: (readset, recombcost, pedigree, positions) before solving.  bench.py
#: installs it to replay the CLI's exact instances through the compiled
#: reference C++ genotyping engine (tools/oracle.py geno oracle).
CAPTURE_HOOK = None

#: Host-route threshold for the genotyping forward-backward, in units of
#: adaptive work sum_c 2^k_c * T^2 * 2^P (the native engine's true cost
#: model, native/genolib.cpp — it pays per-column 2^k_c like the reference,
#: src/genotypedptable.cpp:116-442, NOT the padded C * 2^K).  Routing on the
#: padded size was the round-3 regression: a C=2000/K=12 instance looks like
#: 8.4M padded but only ~800k adaptive, and the native engine solves it in
#: 0.07 s — far below a cold device dispatch.  Calibrated like
#: ops/wmec.HOST_ROUTE_WORK; env-overridable for other hosts.
GENO_HOST_ROUTE_WORK = int(os.environ.get("WHATSHAP_TPU_GENO_HOST_ROUTE_WORK", 1 << 25))


def adaptive_work(packed) -> int:
    """Adaptive host cost of a genotyping instance: sum_c 2^k_c * T^2 * 2^P.

    This is what the native engine (native/genolib.cpp) actually pays — it
    iterates each column's 2^k_c live bipartitions like the reference
    (src/genotypedptable.cpp:116-442) — NOT the padded C * 2^K * T that the
    device kernels pad to.
    """
    T, nA = packed.T, 1 << packed.P
    k_c = packed.active.sum(axis=1).astype(np.int64)
    return int(np.sum(np.int64(1) << np.minimum(k_c, 40))) * T * T * nA


def route_backend(packed) -> str:
    """Pick host vs device for one genotyping instance.

    The adaptive-cost check runs before any jax import so small instances
    never pay (or hang on) accelerator backend initialization.  Routing on
    the padded size was the round-3 regression: a C=2000/K=12 chromosome
    looks like 8.4M states padded but only ~800k adaptive, and the native
    engine solves it in 0.07 s — far below a cold device dispatch
    (tests/test_geno_routing.py guards this).
    """
    if adaptive_work(packed) <= GENO_HOST_ROUTE_WORK:
        return "host"
    import jax

    if jax.default_backend() == "cpu":
        return "host"
    from ..ops import genotyping_pallas

    if genotyping_pallas.kernel_supported(packed.K, packed.T, packed.P):
        return "pallas"
    return "jax32"


class GenotypeDPTable:
    def __init__(
        self,
        numeric_sample_ids,
        readset: ReadSet,
        recombcost: Sequence[int],
        pedigree: Pedigree,
        positions: Optional[Sequence[int]] = None,
    ):
        if CAPTURE_HOOK is not None:
            CAPTURE_HOOK(readset, recombcost, pedigree, positions)
        self._numeric_sample_ids = numeric_sample_ids
        self._pedigree = pedigree
        self._packed = wmec.pack_problem(
            readset, recombcost, pedigree, False, positions,
            check_conflicts=False,
            # the genotyping HMM builds its own probability-space emission
            # from allele/weight — the wMEC integer cost tables are unused
            # on every genotyping backend
            emission_tables=False,
        )
        # Adaptive backend routing, mirroring run_dp's cost model
        # (ops/wmec.py): the host longdouble path is byte-exact and faster
        # than a device dispatch for small state spaces, so it stays the
        # default below the C * 2^K * T work threshold; above it, on an
        # accelerator, the device kernels take over (the genotyping HMM is
        # the second core engine, src/genotypedptable.cpp:17-451 — it gets
        # the same treatment as the wMEC DP).  WHATSHAP_TPU_GENO_BACKEND
        # overrides: host (exact longdouble), jax (f64, ~1e-12 relative),
        # jax32 (f32 TPU-speed, ~1e-4 — inside GT/GQ quantization), pallas
        # (VMEM-resident f32 kernel, same tolerance class as jax32).
        backend = os.environ.get("WHATSHAP_TPU_GENO_BACKEND", "")
        if backend not in ("host", "jax", "jax32", "pallas"):
            backend = self._auto_backend()
        if backend == "pallas":
            from ..ops.genotyping_pallas import run_genotyping_pallas_batched

            out = run_genotyping_pallas_batched([self._packed], pedigree)
            self._likelihoods = None if out is None else out[0]
        elif backend in ("jax", "jax32"):
            from ..ops.genotyping_jax import run_genotyping_jax

            dtype = "f32" if backend == "jax32" else "f64"
            self._likelihoods = run_genotyping_jax(self._packed, pedigree, dtype=dtype)
        else:
            self._likelihoods = gt_ops.run_genotyping(self._packed, pedigree)

    def _auto_backend(self) -> str:
        return route_backend(self._packed)

    def get_genotype_likelihoods(self, sample_id, pos: int) -> PhredGenotypeLikelihoods:
        numeric_id = self._numeric_sample_ids[sample_id]
        ind = self._pedigree.id_to_index(numeric_id)
        assert self._likelihoods is not None
        values = [float(v) for v in self._likelihoods[pos, ind]]
        return PhredGenotypeLikelihoods(values)


class GenotypeDistribution:
    """Per-column prior genotype distribution (src/genotypedistribution.cpp)."""

    def __init__(self, hom_ref_prob=1 / 3, het_prob=1 / 3, hom_alt_prob=1 / 3):
        self.distribution = [hom_ref_prob, het_prob, hom_alt_prob]

    def probability_of(self, genotype: int) -> float:
        return self.distribution[genotype]

    def __mul__(self, other: "GenotypeDistribution") -> "GenotypeDistribution":
        d = [a * b for a, b in zip(self.distribution, other.distribution)]
        s = sum(d)
        d = [x / s for x in d]
        return GenotypeDistribution(*d)

    def normalize(self) -> None:
        s = sum(self.distribution)
        if s <= 0.0:
            self.distribution = [1 / 3] * 3
        else:
            self.distribution = [x / s for x in self.distribution]

    def likeliest_genotype(self) -> int:
        best_index = 0
        best = 0.0
        for i, p in enumerate(self.distribution):
            if p > best:
                best = p
                best_index = i
        return best_index

    def error_probability(self) -> float:
        best_index = self.likeliest_genotype()
        return sum(p for i, p in enumerate(self.distribution) if i != best_index)


def compute_genotypes(
    readset: ReadSet, positions: Optional[Sequence[int]] = None
) -> Tuple[List[Genotype], List[Tuple[float, float, float]]]:
    """Per-column product-model prior genotyper
    (src/genotyper.cpp:13-55 via core.pyx:603-618)."""
    if positions is None:
        positions = readset.get_positions()
    # column walk identical to ColumnIterator: active reads between first
    # and last variant position, entries at the column position
    genotypes: List[Genotype] = []
    gls: List[Tuple[float, float, float]] = []

    # build per-position entries directly (order does not affect products)
    entries_by_pos = {p: [] for p in positions}
    pos_set = set(positions)
    for read in readset:
        for v in read:
            if v.position in pos_set:
                entries_by_pos[v.position].append((v.allele, v.quality))

    for p in positions:
        dist = GenotypeDistribution()
        for allele, quality in entries_by_pos[p]:
            p_wrong = max(0.05, 10.0 ** (-quality / 10.0))
            if allele == 0:
                dist = dist * GenotypeDistribution(
                    2.0 / 3.0 - 1.0 / 3.0 * p_wrong, 1.0 / 3.0, 1.0 / 3.0 * p_wrong
                )
            elif allele == 1:
                dist = dist * GenotypeDistribution(
                    1.0 / 3.0 * p_wrong, 1.0 / 3.0, 2.0 / 3.0 - 1.0 / 3.0 * p_wrong
                )
        dist.normalize()
        if dist.error_probability() < 0.1:
            genotype = Genotype.from_index(dist.likeliest_genotype(), 2)
        else:
            genotype = Genotype([])
        genotypes.append(genotype)
        gls.append(
            (dist.probability_of(0), dist.probability_of(1), dist.probability_of(2))
        )
    return genotypes, gls
