"""
Guards for the genotyping backend router (solver/genotyping.route_backend).

Round 3 shipped a 57x end-to-end regression because the router costed
instances by the PADDED state space C * 2^K * T instead of the adaptive
sum_c 2^k_c that the native engine (and the reference,
src/genotypedptable.cpp:116-442) actually pays.  These tests pin the
routing contract: adaptive-small instances go to the native host engine on
EVERY backend; only genuinely adaptive-large instances may be shipped to an
accelerator.
"""

from types import SimpleNamespace

import numpy as np

import whatshap_tpu.core  # noqa: F401  (resolves core<->solver import cycle)
from whatshap_tpu.solver import genotyping as sg


def _packed(k_per_col, n_cols, K, T=1, P=2):
    """Minimal stand-in exposing the fields route_backend consults."""
    active = np.zeros((n_cols, K), dtype=bool)
    active[:, :k_per_col] = True
    return SimpleNamespace(n_cols=n_cols, K=K, T=T, P=P, active=active)


def test_adaptive_small_routes_host_regardless_of_backend(monkeypatch):
    # C=2000, K=12 padded -> 8.4M padded states (the round-3 misroute),
    # but coverage ~5 -> adaptive ~2000*32*4 = 256k: must stay on host.
    packed = _packed(k_per_col=5, n_cols=2000, K=12)
    assert sg.adaptive_work(packed) <= sg.GENO_HOST_ROUTE_WORK
    # Must decide host WITHOUT consulting the accelerator: poison
    # jax.default_backend so any device probe fails loudly.
    import jax

    def boom():  # pragma: no cover - only hit on regression
        raise AssertionError("router consulted the device for a small instance")

    monkeypatch.setattr(jax, "default_backend", boom)
    assert sg.route_backend(packed) == "host"


def test_adaptive_large_routes_device_when_accelerator(monkeypatch):
    # Dense coverage: k_c == K == 16 in every column -> adaptive-large.
    packed = _packed(k_per_col=16, n_cols=512, K=16)
    assert sg.adaptive_work(packed) > sg.GENO_HOST_ROUTE_WORK
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    from whatshap_tpu.ops import genotyping_pallas

    monkeypatch.setattr(genotyping_pallas, "kernel_supported", lambda K, T, P: True)
    assert sg.route_backend(packed) == "pallas"
    monkeypatch.setattr(genotyping_pallas, "kernel_supported", lambda K, T, P: False)
    assert sg.route_backend(packed) == "jax32"


def test_adaptive_large_routes_host_on_cpu(monkeypatch):
    packed = _packed(k_per_col=16, n_cols=512, K=16)
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert sg.route_backend(packed) == "host"


def test_trio_and_assignment_axes_scale_adaptive_cost():
    base = _packed(k_per_col=4, n_cols=10, K=8, T=1, P=2)
    trio = _packed(k_per_col=4, n_cols=10, K=8, T=4, P=3)
    # T enters squared (transmission transition matrix), P as 2^P
    assert sg.adaptive_work(trio) == sg.adaptive_work(base) * 16 * 2


def test_routed_small_instance_latency_near_direct_native():
    """The full routed GenotypeDPTable call on an adaptive-small instance
    must cost close to the bare native engine run on the same packed
    problem — the router, packing and glue may not add more than ~1x the
    engine's own time (wall-clock guard for the round-4 ask that routed
    latency stays bounded; generous factor to survive CI noise)."""
    import random
    import time

    import whatshap_tpu.core as core
    from whatshap_tpu.core.genotype import Genotype
    from whatshap_tpu.core.phredgl import PhredGenotypeLikelihoods
    from whatshap_tpu.ops import genotyping as gt_ops
    from whatshap_tpu.ops import wmec

    rng = random.Random(5)
    n_pos = 500
    positions = sorted(rng.sample(range(10, 10**6), n_pos))
    rs = core.ReadSet()
    for i in range(150):
        start = rng.randint(0, n_pos - 10)
        r = core.Read(f"r{i}", 50, 0, 0)
        for p in range(start, min(start + rng.randint(5, 20), n_pos)):
            r.add_variant(positions[p], rng.randint(0, 1), rng.choice([5, 30]))
        rs.add(r)
    rs.sort()
    nsi = core.NumericSampleIds()
    ped = core.Pedigree(nsi)
    gls = []
    for _ in range(n_pos):
        triple = [10.0 ** (-rng.choice([0, 5, 20]) / 10.0) for _ in range(3)]
        triple[rng.randint(0, 2)] = 1.0
        gls.append(triple)
    ped.add_individual(
        "ind0",
        [Genotype.from_index(rng.randint(0, 2), 2) for _ in range(n_pos)],
        [PhredGenotypeLikelihoods(gl) for gl in gls],
    )
    recomb = [rng.choice([1, 2, 5]) for _ in range(n_pos)]

    packed = wmec.pack_problem(
        rs, recomb, ped, False, positions, check_conflicts=False,
        emission_tables=False,
    )
    assert sg.adaptive_work(packed) <= sg.GENO_HOST_ROUTE_WORK

    def best_of(f, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_direct = best_of(lambda: gt_ops.run_genotyping(packed, ped))
    t_routed = best_of(
        lambda: core.GenotypeDPTable(nsi, rs, recomb, ped, positions)
    )
    assert t_routed <= max(2.0 * t_direct, t_direct + 0.05), (
        f"routed {t_routed:.4f}s vs direct {t_direct:.4f}s"
    )
