"""
Differential testing: the JAX device path must produce results identical to
the pure-numpy mirror (which is itself fuzz-verified bit-exact against the
reference C++ in test_oracle_parity.py).

This catches device-specific numerics hazards (e.g. TPU default-precision
matmuls truncating to bf16) automatically.
"""

import numpy as np

from whatshap_tpu.core import NumericSampleIds, Pedigree, Read, ReadSet
from whatshap_tpu.ops import wmec
from whatshap_tpu.testhelpers import canonic_index_to_biallelic_gt


def _random_instance(rng, n_reads, n_pos, n_ind=1, trios=(), max_q=300):
    positions = [(i + 1) * 10 for i in range(n_pos)]
    rs = ReadSet()
    for i in range(n_reads):
        sample = int(rng.randint(0, n_ind))
        start = int(rng.randint(0, n_pos - 1))
        end = int(rng.randint(start + 1, n_pos))
        read = Read(f"R{i}", 50, 0, sample)
        for c in range(start, end + 1):
            if rng.rand() < 0.2 and c not in (start, end):
                continue
            read.add_variant(positions[c], int(rng.randint(0, 2)), int(rng.randint(1, max_q)))
        rs.add(read)
    rs.sort()
    ped = Pedigree(NumericSampleIds())
    for ind in range(n_ind):
        ped.add_individual(
            f"ind{ind}", [canonic_index_to_biallelic_gt(1) for _ in positions], None
        )
    for f, m, c in trios:
        ped.add_relationship(f"ind{f}", f"ind{m}", f"ind{c}")
    packed = wmec.pack_problem(rs, [int(rng.randint(1, 10)) for _ in positions], ped, False, positions)
    return packed


def _compare_backends(packed):
    res_np = wmec.run_dp(packed, backend="numpy")
    res_jax = wmec.run_dp(packed, backend="jax")
    assert res_np.optimal_cost == res_jax.optimal_cost
    assert np.array_equal(res_np.index_path, res_jax.index_path)
    assert np.array_equal(res_np.trans_path, res_jax.trans_path)


def test_backend_parity_single_sample():
    rng = np.random.RandomState(11)
    # fixed shape bucket to bound compile count
    for trial in range(5):
        packed = _random_instance(rng, 10, 12)
        _compare_backends(packed)


def test_backend_parity_large_weights():
    # weights beyond bf16's exact-integer range (256) — guards the matmul
    # precision choice on TPU
    rng = np.random.RandomState(12)
    packed = _random_instance(rng, 10, 12, max_q=5000)
    _compare_backends(packed)


def test_backend_parity_trio():
    rng = np.random.RandomState(13)
    packed = _random_instance(rng, 9, 8, n_ind=3, trios=[(0, 1, 2)])
    _compare_backends(packed)


def test_batched_matches_single():
    # the batched scale-out path must agree with the single-block path
    from whatshap_tpu.parallel import blocks as blk

    rng = np.random.RandomState(14)
    packeds = [_random_instance(rng, 8, 10) for _ in range(4)]
    k_max = max(p.K for p in packeds)
    padded = [blk.pad_block(p, 16, k_pad=k_max) for p in packeds]
    arrays = blk.stack_blocks(padded)
    T, P = packeds[0].T, packeds[0].P
    out = wmec.forward_cost_batched(k_max, T, P, *[np.asarray(a) for a in arrays])
    batched_costs = np.asarray(out[0]).min(axis=(1, 2))
    for i, packed in enumerate(packeds):
        res = wmec.run_dp(packed, backend="numpy")
        assert res.optimal_cost == int(batched_costs[i])
