"""
Pallas genotyping forward-backward (interpret mode) vs the byte-exact
longdouble host engine.  The kernel computes in f32; the rescaled
quantities stay near magnitude 1, so parity on the final likelihoods is
far tighter than the 1e-3 the jax32 path is held to.
"""

import random

import numpy as np
import pytest

import whatshap_tpu.core as core
from whatshap_tpu.core.genotype import Genotype
from whatshap_tpu.core.phredgl import PhredGenotypeLikelihoods
from whatshap_tpu.ops import genotyping as gt_ops
from whatshap_tpu.ops import genotyping_jax, genotyping_pallas, wmec


def _instance(seed, n_pos, n_reads, n_ind=1, trios=()):
    rng = random.Random(seed)
    positions = sorted(rng.sample(range(10, 10**5), n_pos))
    rs = core.ReadSet()
    for i in range(n_reads):
        s = rng.randint(0, n_pos - 4)
        e = min(s + rng.randint(3, 9), n_pos)
        r = core.Read(f"r{i}", 50, 0, rng.randint(0, n_ind - 1))
        for p in range(s, e):
            r.add_variant(positions[p], rng.randint(0, 1), rng.choice([5, 10, 30]))
        rs.add(r)
    rs.sort()
    nsi = core.NumericSampleIds()
    ped = core.Pedigree(nsi)
    for ind in range(n_ind):
        gls = []
        for _ in range(n_pos):
            t = [10.0 ** (-rng.choice([0, 5, 20]) / 10.0) for _ in range(3)]
            t[rng.randint(0, 2)] = 1.0
            gls.append(PhredGenotypeLikelihoods(t))
        ped.add_individual(
            f"i{ind}",
            [Genotype.from_index(rng.randint(0, 2), 2) for _ in range(n_pos)],
            gls,
        )
    for f, m, c in trios:
        ped.add_relationship(f"i{f}", f"i{m}", f"i{c}")
    recomb = [rng.choice([1, 2, 5]) for _ in range(n_pos)]
    packed = wmec.pack_problem(rs, recomb, ped, False, positions, check_conflicts=False)
    return packed, ped


def _pallas_likelihoods(packed_list, ped):
    import jax.numpy as jnp

    static, stacked = genotyping_jax.prepare_genotyping_batch(packed_list, ped)
    if static[0] < genotyping_pallas.LANE_BITS:
        static, stacked = genotyping_pallas.pad_prepared_k(
            static, stacked, genotyping_pallas.LANE_BITS
        )
    K, T, P, n_ind = static
    red, _scaling = genotyping_pallas.forward_backward_pallas(
        K,
        T,
        P,
        jnp.asarray(stacked[3], jnp.float32),
        jnp.asarray(stacked[2], jnp.float32),
        jnp.asarray(stacked[1], jnp.float32),
        jnp.asarray(stacked[0], jnp.float32),
        jnp.asarray(stacked[4]),
        jnp.asarray(stacked[5]),
        jnp.asarray(stacked[6], jnp.float32),
        interpret=True,
    )
    red = np.asarray(red, dtype=np.float64)
    gmask = np.asarray(stacked[7])[0]
    marg = np.einsum("bcta,itag->bcig", red, gmask)
    norm = red.sum(axis=(2, 3))[:, :, None, None]
    return marg / norm


def test_pallas_single_sample_parity():
    packed, ped = _instance(3, 24, 20)
    assert packed.K >= genotyping_pallas.LANE_BITS
    lik = _pallas_likelihoods([packed], ped)
    host = np.asarray(gt_ops.run_genotyping(packed, ped), dtype=np.float64)
    np.testing.assert_allclose(lik[0, :, 0, :], host[:, 0, :], atol=2e-4)


def test_pallas_low_k_padding():
    packed, ped = _instance(9, 16, 6)
    assert packed.K < genotyping_pallas.LANE_BITS
    lik = _pallas_likelihoods([packed], ped)
    host = np.asarray(gt_ops.run_genotyping(packed, ped), dtype=np.float64)
    np.testing.assert_allclose(lik[0, :, 0, :], host[:, 0, :], atol=2e-4)


@pytest.mark.parametrize("seed", [11, 12])
def test_pallas_trio_parity(seed):
    packed, ped = _instance(seed, 12, 12, n_ind=3, trios=((0, 1, 2),))
    assert packed.T == 4
    lik = _pallas_likelihoods([packed], ped)
    host = np.asarray(gt_ops.run_genotyping(packed, ped), dtype=np.float64)
    for ind in range(3):
        np.testing.assert_allclose(lik[0, :, ind, :], host[:, ind, :], atol=3e-4)
