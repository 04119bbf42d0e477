"""
Fuzz parity for the genotyping HMM, HapChatCore and PedMecHeuristic against
the compiled reference C++ (dev-only oracles in tools/; skipped when the
reference checkout / compiler are unavailable).

These are the tests that caught the slot-reuse bug in the genotyping
backward fold: the ported unit suites never exercised a column where a read
dies and its slot is reassigned in the same step.
"""

import math
import random
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

import oracle  # noqa: E402

import whatshap_tpu.core as core  # noqa: E402
from whatshap_tpu.core.genotype import Genotype  # noqa: E402
from whatshap_tpu.core.phredgl import PhredGenotypeLikelihoods  # noqa: E402

pytestmark = pytest.mark.skipif(
    not oracle.oracle_available(), reason="reference oracle unavailable"
)


def _gt(i):
    return Genotype.from_index(i, 2)


GT3 = [_gt(0), _gt(1), _gt(2)]


def _random_reads(rng, n_pos, n_reads, positions, n_ind, min_vars=1, keep_p=0.9):
    rows = []
    for i in range(n_reads):
        start = rng.randint(0, max(n_pos - min_vars, 0))
        length = rng.randint(min_vars, n_pos - start)
        vs = [
            (positions[p], rng.randint(0, 1), rng.choice([5, 10, 30]))
            for p in range(start, start + length)
            if rng.random() < keep_p or min_vars > 1
        ]
        if len(vs) >= min_vars:
            rows.append((f"r{i}", rng.randint(0, n_ind - 1), vs))
    return rows


def _readset(rows):
    rs = core.ReadSet()
    for name, sid, vs in rows:
        r = core.Read(name, 50, 0, sid)
        for p, a, q in vs:
            r.add_variant(p, a, q)
        rs.add(r)
    rs.sort()
    return rs


def test_genotyping_matches_reference():
    if oracle.ensure_extra_oracle("geno") is None:
        pytest.skip("geno oracle unavailable")
    checked = 0
    for seed in range(30):
        rng = random.Random(7000 + seed)
        trio = rng.random() < 0.4
        n_ind = 3 if trio else 1
        n_pos = rng.randint(2, 8)
        positions = sorted(rng.sample(range(10, 400), n_pos))
        rows = _random_reads(rng, n_pos, rng.randint(2, 8), positions, n_ind, min_vars=2, keep_p=1.1)
        if not rows:
            continue
        gts = [[rng.randint(0, 2) for _ in range(n_pos)] for _ in range(n_ind)]
        gls = [
            [[rng.choice([0.0, 5.0, 20.0]) for _ in range(3)] for _ in range(n_pos)]
            for _ in range(n_ind)
        ]
        recomb = [rng.choice([1, 2, 5]) for _ in range(n_pos)]
        trios = [(0, 1, 2)] if trio else []

        inp = [f"{len(rows)} {n_pos} {n_ind} {len(trios)}", " ".join(map(str, positions))]
        for name, sid, vs in rows:
            inp.append(f"{name} {sid} {len(vs)}")
            inp += [f"{p} {a} {q}" for p, a, q in vs]
        for i in range(n_ind):
            for c in range(n_pos):
                inp.append(f"{gts[i][c]} {gls[i][c][0]} {gls[i][c][1]} {gls[i][c][2]}")
        for t in trios:
            inp.append(" ".join(map(str, t)))
        inp.append(" ".join(map(str, recomb)))
        out = oracle.run_extra_oracle("geno", "\n".join(inp) + "\n")
        if out is None:
            continue
        expected = {}
        for line in out.strip().split("\n"):
            t = line.split()
            if t and t[0] == "gl":
                expected[(int(t[1]), int(t[2]))] = [float(x) for x in t[3:6]]

        rs = _readset(rows)
        nsi = core.NumericSampleIds()
        ped = core.Pedigree(nsi)
        names = [f"ind{i}" for i in range(n_ind)]
        for i in range(n_ind):
            ped.add_individual(
                names[i],
                [_gt(g) for g in gts[i]],
                [PhredGenotypeLikelihoods(gls[i][c]) for c in range(n_pos)],
            )
        for f, m, c in trios:
            ped.add_relationship(names[f], names[m], names[c])
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            dp = core.GenotypeDPTable(nsi, rs, recomb, ped, positions)
        for i in range(n_ind):
            for p in range(n_pos):
                mine = [dp.get_genotype_likelihoods(names[i], p)[g] for g in GT3]
                ov = expected[(i, p)]
                for mv, o in zip(mine, ov):
                    if math.isnan(o):
                        assert math.isnan(mv), (seed, i, p, mine, ov)
                        continue
                    assert abs(mv - o) <= 1e-9 * max(abs(o), 1e-12), (seed, i, p, mine, ov)
        checked += 1
    assert checked >= 20


def _parse_hapchat_out(out):
    lines = out.strip().split("\n")
    ocost = int(lines[0].split()[1])
    ohaps = [
        {int(t.split(":")[0]): int(t.split(":")[1]) for t in line.split()[1:]}
        for line in lines[1:]
        if line.startswith("hap ")
    ]
    return ocost, ohaps


def test_hapchat_matches_reference():
    # The reference HapChatCore has genuine undefined behavior on tie
    # instances: Backtrace1() default-initializes jump=-1
    # (src/hapchat/basictypes.h:68-76) and reconstruct_haplotypes indexes
    # backtrace_table2_haplotypes[col][back1.jump][back1.index] without
    # checking that the entry was ever written (hapchatcore.cpp:1437-1470),
    # an out-of-bounds read whose garbage can flip tied haplotype alleles in
    # ~1% of oracle invocations (observed: both haps reporting allele 1 at a
    # cost-0 tied column, i.e. the nominally-dead homozygous fill loop ran).
    # Our implementation is deterministic and matches the reference's
    # common-case output, so: cost parity is asserted strictly; on a
    # haplotype mismatch the oracle is re-invoked a few times and the seed
    # passes if any invocation agrees (fresh process -> fresh heap garbage).
    if oracle.ensure_extra_oracle("hapchat") is None:
        pytest.skip("hapchat oracle unavailable")
    from whatshap_tpu.solver.hapchat import HapChatCore

    checked = 0
    for seed in range(40):
        rng = random.Random(1000 + seed)
        n_pos = rng.randint(2, 14)
        positions = sorted(rng.sample(range(10, 1000), n_pos))
        rows = _random_reads(rng, n_pos, rng.randint(2, 14), positions, 1, min_vars=1, keep_p=0.85)
        if not rows:
            continue
        inp = [str(len(rows))]
        for name, sid, vs in rows:
            inp.append(f"{name} {sid} {len(vs)}")
            inp += [f"{p} {a} {q}" for p, a, q in vs]
        problem = "\n".join(inp) + "\n"
        out = oracle.run_extra_oracle("hapchat", problem)
        if out is None:
            continue
        ocost, ohaps = _parse_hapchat_out(out)
        hc = HapChatCore(_readset(rows))
        srs, _ = hc.get_super_reads()
        mh = [{v.position: v.allele for v in srs[0][k]} for k in range(2)]
        assert hc.get_optimal_cost() == ocost, seed
        if mh[0] != ohaps[0] or mh[1] != ohaps[1]:
            for _retry in range(5):
                out = oracle.run_extra_oracle("hapchat", problem)
                rcost, rhaps = _parse_hapchat_out(out)
                assert rcost == ocost, seed
                if mh[0] == rhaps[0] and mh[1] == rhaps[1]:
                    break
            else:
                raise AssertionError(
                    f"seed {seed}: haplotypes differ from all oracle runs: "
                    f"mine={sorted(mh[0].items())} oracle={sorted(ohaps[0].items())}"
                )
        checked += 1
    assert checked >= 25


def test_heuristic_matches_reference():
    if oracle.ensure_extra_oracle("heur") is None:
        pytest.skip("heuristic oracle unavailable")
    from whatshap_tpu.solver.heuristic import PedMecHeuristic

    checked = 0
    for seed in range(30):
        rng = random.Random(2000 + seed)
        trio = rng.random() < 0.4
        n_ind = 3 if trio else 1
        n_pos = rng.randint(2, 10)
        positions = sorted(rng.sample(range(10, 500), n_pos))
        rows = _random_reads(rng, n_pos, rng.randint(2, 10), positions, n_ind, min_vars=1, keep_p=0.9)
        if not rows:
            continue
        gts = [[rng.randint(0, 2) for _ in range(n_pos)] for _ in range(n_ind)]
        recomb = [rng.choice([1, 2, 5]) for _ in range(n_pos)]
        trios = [(0, 1, 2)] if trio else []
        distrust = rng.random() < 0.3
        row_limit = rng.choice([16, 256])

        inp = [
            f"{len(rows)} {n_pos} {n_ind} {len(trios)} {1 if distrust else 0} {row_limit}",
            " ".join(map(str, positions)),
        ]
        for name, sid, vs in rows:
            inp.append(f"{name} {sid} {len(vs)}")
            inp += [f"{p} {a} {q}" for p, a, q in vs]
        for i in range(n_ind):
            inp.append(" ".join(map(str, gts[i])))
        for t in trios:
            inp.append(" ".join(map(str, t)))
        inp.append(" ".join(map(str, recomb)))
        out = oracle.run_extra_oracle("heur", "\n".join(inp) + "\n")
        if out is None:
            continue
        lines = out.strip().split("\n")
        opart = lines[1].split()[1] if len(lines[1].split()) > 1 else ""
        otrans = [int(x) for x in lines[2].split()[1:]]
        ohaps = {}
        for line in lines[3:]:
            t = line.split()
            ohaps[(int(t[1]), int(t[2]))] = t[3] if len(t) > 3 else ""

        nsi = core.NumericSampleIds()
        ped = core.Pedigree(nsi)
        names = [f"ind{i}" for i in range(n_ind)]
        for i in range(n_ind):
            ped.add_individual(names[i], [_gt(g) for g in gts[i]], [None] * n_pos)
        for f, m, c in trios:
            ped.add_relationship(names[f], names[m], names[c])
        h = PedMecHeuristic(
            _readset(rows), recomb, ped, row_limit, distrust_genotypes=distrust, positions=positions
        )
        h.solve()
        assert "".join("1" if x else "0" for x in h.optBipart) == opart, seed
        assert h.optTrans == otrans, seed
        for (s, k), hap in ohaps.items():
            assert "".join(str(a) for a in h.optHaps[s][k]) == hap, seed
        checked += 1
    assert checked >= 20
