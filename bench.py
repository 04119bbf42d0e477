#!/usr/bin/env python
"""
Benchmark suite covering the BASELINE.json configs.

Headline metric (the JSON line's value): variants phased per second per
chip on the batched wMEC solve (forward column DP + device backtrace),
coverage ~14 blocks — the compute core of `whatshap phase`.  The baseline
is the single-core reference C++ PedigreeDPTable measured on the same
instances via the out-of-tree oracle (tools/oracle.py).

The same JSON line carries a "configs" breakdown:
  phase_cli_fixture        - the real `phase` pipeline end-to-end on the
                             PacBio fixture (BAM+VCF -> phased VCF)
  phase_chromosome_cli     - `phase` end-to-end on a generated 4k-variant
                             chromosome, switch errors vs simulated truth
  phase_trio_chromosome_cli- `phase --ped` on a generated trio chromosome
                             (PedMEC T=4 over three samples' reads)
  genotype_fb              - host genotyping forward-backward vs the
                             reference C++ oracle binary
  genotype_fb_device       - batched Pallas f32 forward-backward vs oracle
  trio_pedmec              - batched trio (T=4) PedMEC solve vs oracle
  whole_chromosome         - segmented checkpoint/recompute solve, 16k
                             columns in one block
  polyphase_tetraploid     - cluster editing + threading + reordering on a
                             synthetic tetraploid instance
  batch_scaling            - per-chip batching efficiency (t(B)/t(8B) * 8)
  mesh_virtual8            - sharded-solve mechanism check on a virtual
                             8-device CPU mesh (subprocess)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "configs"}.
"""

import contextlib
import io
import json
import os

import sys
import time
from pathlib import Path

import numpy as np

BASELINE_FALLBACK = 513.0  # vars/s, last measured single-core reference C++

#: Reference end-to-end baselines (the reference wheel is not buildable in
#: this environment: Cython/pysam/pyfaidx are absent and installs are
#: barred), so the CLI configs replay their exact DP instances through the
#: compiled reference C++ engine and use ITS DP-only time as the baseline.
#: That time is a LOWER bound on the reference CLI's end-to-end wall time
#: on identical inputs (its pysam I/O, realignment, read selection and VCF
#: writing are not counted), so every vs_baseline computed against it
#: UNDERSTATES the true end-to-end advantage.
E2E_BASELINE_NOTE = (
    "baseline = compiled reference C++ DP on the identical instances "
    "(its own internal timer); a lower bound on the reference CLI's "
    "end-to-end time, so this ratio is conservative"
)


@contextlib.contextmanager
def _capture_phase_instances():
    """Record every (readset, recombcost, pedigree, distrust, positions)
    the phase pipeline sends to PedigreeDPTable."""
    from whatshap_tpu.solver import dptable

    captured = []
    old = dptable.CAPTURE_HOOK
    dptable.CAPTURE_HOOK = lambda *args: captured.append(args)
    try:
        yield captured
    finally:
        dptable.CAPTURE_HOOK = old


@contextlib.contextmanager
def _capture_geno_instances():
    """Record every (readset, recombcost, pedigree, positions) the genotype
    pipeline sends to GenotypeDPTable."""
    from whatshap_tpu.solver import genotyping as geno_mod

    captured = []
    old = geno_mod.CAPTURE_HOOK
    geno_mod.CAPTURE_HOOK = lambda *args: captured.append(args)
    try:
        yield captured
    finally:
        geno_mod.CAPTURE_HOOK = old


def _reference_phase_dp_seconds(instances):
    """Total reference C++ PedigreeDPTable seconds (construction + solve,
    measured by the oracle's internal timer — no process spawn or input
    parse) on the CLI's exact DP instances.  See E2E_BASELINE_NOTE."""
    oracle = _oracle()
    if oracle is None or not instances:
        return None
    total = 0.0
    for readset, recomb, ped, distrust, positions in instances:
        if positions is None:
            positions = readset.get_positions()
        n_pos = len(positions)
        if n_pos == 0 or len(readset) == 0:
            continue  # trivial instance: the reference would throw, and
            # its DP time is ~0
        if any(len(read) == 0 for read in readset):
            # reference Read::firstPosition throws on variant-less reads
            sub = type(readset)()
            for read in readset:
                if len(read):
                    sub.add(read)
            readset = sub
            if len(readset) == 0:
                continue
        n_ind = len(ped)
        genos = [
            [ped.get_genotype(i, c).get_index() for c in range(n_pos)]
            for i in range(n_ind)
        ]
        gls = None
        if distrust:
            gls = [
                [list(ped.get_genotype_likelihoods(i, c)) for c in range(n_pos)]
                for i in range(n_ind)
            ]
        text = oracle.serialize_problem(
            readset, list(positions), genos, list(recomb), ped.triples, distrust, gls
        )
        total += oracle.run_oracle(text)["time"]
    return total


def _reference_geno_seconds(instances):
    """Total reference C++ GenotypeDPTable seconds (internal timer) on the
    CLI's exact genotyping instances.  See E2E_BASELINE_NOTE."""
    oracle = _oracle()
    if oracle is None or not instances:
        return None
    if oracle.ensure_extra_oracle("geno") is None:
        return None
    total = 0.0
    for readset, recomb, ped, positions in instances:
        if positions is None:
            positions = readset.get_positions()
        n_pos = len(positions)
        n_ind = len(ped)
        inp = [f"{len(readset)} {n_pos} {n_ind} {len(ped.triples)}"]
        inp.append(" ".join(str(p) for p in positions))
        for read in readset:
            inp.append(f"{read.name.replace(' ', '_')} {read.sample_id} {len(read)}")
            inp += [f"{v.position} {v.allele} {v.quality}" for v in read]
        for i in range(n_ind):
            for c in range(n_pos):
                gl = ped.get_genotype_likelihoods(i, c)
                g0, g1, g2 = (0.0, 0.0, 0.0) if gl is None else gl.as_vector()[:3]
                # genotype index is unused by the genotyping DP (it reads
                # the likelihood priors); serialize 0 for no-call entries
                g = ped.get_genotype(i, c)
                gi = 0 if g.is_none() else g.get_index()
                inp.append(f"{gi} {g0} {g1} {g2}")
        for t in ped.triples:
            inp.append(" ".join(map(str, t)))
        inp.append(" ".join(str(r) for r in recomb))
        out = oracle.run_extra_oracle("geno", "\n".join(inp) + "\n")
        if out is None:
            return None
        for line in out.splitlines():
            parts = line.split()
            if parts and parts[0] == "time":
                total += float(parts[1])
                break
        else:
            return None
    return total


def _timed_cli(run_once, instances_ctx, n=5):
    """One capture/compile-warmup run (cold) under the instance-capture
    hook, then n timed runs.  Returns (cold_s, best_s, median_s, text,
    captured_instances)."""
    with instances_ctx() as instances:
        t0 = time.perf_counter()
        run_once()
        cold = time.perf_counter() - t0
    from whatshap_tpu.io.sam import clear_bam_pool_cache

    times = []
    text = None
    for _ in range(n):
        # Each timed run pays the full fresh-process BAM decode, matching
        # what one CLI invocation costs (the pool cache only helps repeated
        # opens *within* a run).
        clear_bam_pool_cache()
        t0 = time.perf_counter()
        text = run_once()
        times.append(time.perf_counter() - t0)
    times.sort()
    return cold, times[0], times[len(times) // 2], text, instances


def _phase_stage_breakdown():
    """Per-stage seconds of the most recent run_whatshap call (its own
    StageTimer) — shows where the end-to-end wall time goes."""
    from whatshap_tpu.cli import phase as phase_cli

    t = phase_cli.LAST_TIMERS
    if t is None:
        return None
    stages = {k: round(v, 3) for k, v in sorted(t._acc.items()) if v >= 0.0005}
    stages["total"] = round(t.total(), 3)
    return stages


def _oracle():
    sys.path.insert(0, str(Path(__file__).parent / "tools"))
    try:
        import oracle
    except ImportError:
        return None
    if not oracle.oracle_available() or oracle.ensure_oracle() is None:
        return None
    return oracle


def build_workload(n_blocks=32, n_cols=512, coverage=14, seed=7):
    from whatshap_tpu.core import NumericSampleIds, Pedigree
    from whatshap_tpu.ops import wmec
    from whatshap_tpu.parallel import blocks as blk
    from whatshap_tpu.testhelpers import canonic_index_to_biallelic_gt

    packed_list = []
    readsets = []
    k_max = 0
    for b in range(n_blocks):
        rs, positions, _ = blk.make_synthetic_readset(
            n_cols, coverage, read_len=12, seed=seed + b
        )
        ped = Pedigree(NumericSampleIds())
        ped.add_individual(
            "s", [canonic_index_to_biallelic_gt(1) for _ in positions], [None] * len(positions)
        )
        packed = wmec.pack_problem(rs, [1] * len(positions), ped, False)
        packed_list.append(packed)
        readsets.append((rs, positions))
        k_max = max(k_max, packed.K)
    padded = [blk.pad_block(p, n_cols, k_pad=k_max) for p in packed_list]
    arrays = blk.stack_blocks(padded)
    T, P = packed_list[0].T, packed_list[0].P
    return k_max, T, P, arrays, packed_list, readsets


def measure_device(K, T, P, arrays, n_iters=3):
    """End-to-end batched solve; only the (B, C) paths leave the chip.
    device_get is the only dependable fence over the RPC tunnel."""
    import jax

    from whatshap_tpu.ops import wmec

    device_arrays = [jax.device_put(a) for a in arrays]
    out = wmec.solve_batched_auto(K, T, P, *device_arrays)  # compile
    _ = jax.device_get(out[1])
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        out = wmec.solve_batched_auto(K, T, P, *device_arrays)
        _ = jax.device_get(out[1])
        times.append(time.perf_counter() - t0)
    return min(times)


def measure_dispatch_split(K, T, P, arrays, n_chain=8, n_iters=3):
    """Split the per-launch overhead into its pipelined and serialized
    parts: `fence` = one result-fetch round trip (paid once per launch
    group, the production dispatch-all-then-fetch-once pattern), `dispatch`
    = the incremental cost of one more async launch before that single
    fetch (host dispatch + device inter-kernel gap — the part that really
    multiplies with chunk count)."""
    import jax

    from whatshap_tpu.ops import wmec

    device_arrays = [jax.device_put(a) for a in arrays]

    def chain(n):
        t0 = time.perf_counter()
        outs = [wmec.solve_batched_auto(K, T, P, *device_arrays) for _ in range(n)]
        _ = jax.device_get([o[1] for o in outs])
        return time.perf_counter() - t0

    chain(1)  # compile/load
    t1 = min(chain(1) for _ in range(n_iters))
    tn = min(chain(n_chain) for _ in range(n_iters))
    dispatch = max(0.0, (tn - t1) / (n_chain - 1))
    fence = max(0.0, t1 - dispatch)

    # Decompose the fence: fetching a fresh 8-element result measures the
    # pure host<->device round trip (the tunnel RTT on this attachment); the
    # remainder is device-side fence work that a locally-attached controller
    # would also pay.
    x = jax.device_put(np.zeros(8, np.float32))
    jax.device_get(x + 1.0)
    rtt = min(
        _timed(lambda i=i: jax.device_get(x + float(i))) for i in range(8)
    )
    return fence, dispatch, min(rtt, fence)


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def measure_wmec_baseline(readsets, n_blocks=16):
    """Single-core C++ reference on a subsample of the same blocks."""
    oracle = _oracle()
    if oracle is None:
        return None
    total_cols = 0
    total_time = 0.0
    for (rs, positions) in readsets[:n_blocks]:
        text = oracle.serialize_problem(rs, positions, [[1] * len(positions)], [1] * len(positions))
        ref = oracle.run_oracle(text)
        total_cols += len(positions)
        total_time += ref["time"]
    return total_cols / total_time if total_time > 0 else None


def bench_headline():
    import jax

    if jax.default_backend() != "cpu":
        n_blocks, n_cols, cov = 256, 512, 14
    else:
        # emergency CPU fallback (device unreachable): keep the config
        # inside its timeout; the number is a mechanism check, not a claim
        n_blocks, n_cols, cov = 8, 128, 10
    K, T, P, arrays, packed_list, readsets = build_workload(n_blocks, n_cols, coverage=cov)
    dt = measure_device(K, T, P, arrays)
    throughput = n_blocks * n_cols / dt
    baseline = measure_wmec_baseline(readsets) or BASELINE_FALLBACK
    try:
        roofline = _wmec_roofline(K, T, P, n_blocks, n_cols, dt)
    except Exception:
        roofline = None
    return throughput, baseline, roofline


def bench_phase_cli():
    """The real phase pipeline end-to-end on the PacBio fixture (real
    long-read data from tests/data), with the reference C++ DP replayed on
    the identical instances as the (conservative) end-to-end baseline."""
    from whatshap_tpu.cli.phase import run_whatshap
    from whatshap_tpu.io.sam import build_minimal_index

    data = Path(__file__).parent / "tests" / "data" / "pacbio"
    # *.bai is gitignored under tests/data/pacbio; a fresh checkout has no
    # index (tests regenerate it in conftest — do the same here)
    for bam in data.glob("*.bam"):
        if not bam.with_suffix(".bam.bai").exists():
            build_minimal_index(str(bam))

    def run_once():
        out = io.StringIO()
        run_whatshap(
            phase_input_files=[str(data / "pacbio.bam")],
            variant_file=str(data / "variants.vcf"),
            reference=str(data / "reference.fasta"),
            output=out,
            write_command_line_header=False,
        )
        return out.getvalue()

    cold, best, median, text, instances = _timed_cli(run_once, _capture_phase_instances)
    n_variants = sum(1 for line in text.splitlines() if line and not line.startswith("#"))
    ref_dp = _reference_phase_dp_seconds(instances)
    return {
        "value": round(n_variants / best, 1),
        "unit": "variants/s",
        "seconds": round(best, 3),
        "seconds_median": round(median, 3),
        "cold_seconds": round(cold, 3),
        "ref_dp_seconds": round(ref_dp, 4) if ref_dp is not None else None,
        "vs_baseline": round(ref_dp / best, 3) if ref_dp is not None else None,
        "baseline_note": E2E_BASELINE_NOTE,
    }


def bench_phase_trio_chromosome():
    """End-to-end pedigree phasing: `phase --ped` on a synthetic trio
    chromosome (three read groups in one BAM, PED file, 2k variants).
    The PedMEC DP runs over all three samples' reads jointly (T=4
    transmissions); the child's within-block switch-error rate against
    the simulated truth is the correctness gate."""
    import sys as _sys
    import tempfile

    _sys.path.insert(0, str(Path(__file__).parent / "tools"))
    from make_synth_chrom import generate_trio

    from whatshap_tpu.cli.phase import run_whatshap

    out_dir = Path(tempfile.gettempdir()) / "whatshap_tpu_bench_trio_v1"
    info = generate_trio(out_dir, n_vars=2000, coverage=4, seed=7)

    def run_once():
        out = io.StringIO()
        run_whatshap(
            phase_input_files=[info["bam"]],
            variant_file=info["vcf"],
            reference=info["fasta"],
            ped=info["ped"],
            output=out,
            write_command_line_header=False,
        )
        return out.getvalue()

    cold, dt, dt_median, text, instances = _timed_cli(run_once, _capture_phase_instances)
    stages = _phase_stage_breakdown()  # before the oracle replay: the
    # timer's total() runs until capture, so capture right after the runs
    ref_dp = _reference_phase_dp_seconds(instances)

    header = [ln for ln in text.splitlines() if ln.startswith("#CHROM")][0].split("\t")
    ci = header[9:].index("child")
    truth = info["samples"]["child"][0]
    blocks = {}
    for line in text.splitlines():
        if not line or line.startswith("#"):
            continue
        f = line.split("\t")
        call = dict(zip(f[8].split(":"), f[9 + ci].split(":")))
        gt = call.get("GT", "")
        if "|" not in gt:
            continue
        a, b = gt.split("|")
        if a == b:
            continue
        vi = int(f[1]) // 150 - 1
        blocks.setdefault(call.get("PS"), []).append((vi, int(a)))
    n_pairs = n_switch = 0
    for members in blocks.values():
        members.sort()
        prev = None
        for vi, a in members:
            rel = a ^ truth[vi]
            if prev is not None:
                n_pairs += 1
                n_switch += rel != prev
            prev = rel
    return {
        "value": round(info["n_vars"] / dt, 1),
        "unit": "variants/s",
        "seconds": round(dt, 2),
        "seconds_median": round(dt_median, 2),
        "cold_seconds": round(cold, 2),
        "reads": info["n_reads"],
        "child_switch_error_rate": round(n_switch / n_pairs, 4) if n_pairs else None,
        "ref_dp_seconds": round(ref_dp, 3) if ref_dp is not None else None,
        "vs_baseline": round(ref_dp / dt, 3) if ref_dp is not None else None,
        "stages": stages,
        "baseline_note": E2E_BASELINE_NOTE,
    }


def bench_genotype_chromosome_cli():
    """End-to-end `genotype` on the synthetic 4k-variant chromosome (the
    same dataset as phase_chromosome_cli): BAM parsing, realignment, the
    forward-backward genotyping HMM (device-routed at this scale on
    accelerators) and VCF writing, with the reference C++ GenotypeDPTable
    replayed on the identical instances as the conservative baseline."""
    import sys as _sys
    import tempfile

    _sys.path.insert(0, str(Path(__file__).parent / "tools"))
    from make_synth_chrom import generate

    from whatshap_tpu.cli.genotype import run_genotype

    out_dir = Path(tempfile.gettempdir()) / "whatshap_tpu_bench_chrom_v1"
    info = generate(out_dir, n_vars=4000, coverage=14, seed=7)

    def run_once():
        out = io.StringIO()
        run_genotype(
            phase_input_files=[info["bam"]],
            variant_file=info["vcf"],
            reference=info["fasta"],
            output=out,
            write_command_line_header=False,
        )
        return out.getvalue()

    cold, dt, dt_median, text, instances = _timed_cli(run_once, _capture_geno_instances)
    ref_dp = _reference_geno_seconds(instances)
    n_vars = info["n_vars"]
    return {
        "value": round(n_vars / dt, 1),
        "unit": "variants/s",
        "seconds": round(dt, 2),
        "seconds_median": round(dt_median, 2),
        "cold_seconds": round(cold, 2),
        "ref_dp_seconds": round(ref_dp, 3) if ref_dp is not None else None,
        "vs_baseline": round(ref_dp / dt, 3) if ref_dp is not None else None,
        "baseline_note": E2E_BASELINE_NOTE,
    }


def bench_genotype():
    """Forward-backward genotyping (host longdouble/native path) vs the
    reference C++ oracle binary on the same instance."""
    import random

    import whatshap_tpu.core as core
    from whatshap_tpu.core.genotype import Genotype
    from whatshap_tpu.core.phredgl import PhredGenotypeLikelihoods

    rng = random.Random(11)
    n_pos = 2000
    positions = sorted(rng.sample(range(10, 10**6), n_pos))
    rows = []
    for i in range(600):
        start = rng.randint(0, n_pos - 10)
        length = rng.randint(5, 25)
        vs = [
            (positions[p], rng.randint(0, 1), rng.choice([5, 10, 30]))
            for p in range(start, min(start + length, n_pos))
        ]
        rows.append((f"r{i}", 0, vs))
    rs = core.ReadSet()
    for name, sid, vs in rows:
        r = core.Read(name, 50, 0, sid)
        for p, a, q in vs:
            r.add_variant(p, a, q)
        rs.add(r)
    rs.sort()
    nsi = core.NumericSampleIds()
    ped = core.Pedigree(nsi)
    gts = [rng.randint(0, 2) for _ in range(n_pos)]
    # linear-scale likelihood triples from random phred scores: always one
    # likelihood of 1.0, never an all-zero row (an all-zero row is 0/0 ->
    # NaN in both engines -- reference parity -- and x87 NaN propagation is
    # so slow the bench would otherwise measure microcode assists)
    gls = []
    for _ in range(n_pos):
        triple = [10.0 ** (-rng.choice([0, 5, 20]) / 10.0) for _ in range(3)]
        triple[rng.randint(0, 2)] = 1.0
        gls.append(triple)
    ped.add_individual(
        "ind0",
        [Genotype.from_index(g, 2) for g in gts],
        [PhredGenotypeLikelihoods(gl) for gl in gls],
    )
    recomb = [rng.choice([1, 2, 5]) for _ in range(n_pos)]

    # median of 3 on both sides: the host longdouble engine and the oracle
    # binary are each a single ~0.1 s call, noisy one-shot
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        core.GenotypeDPTable(nsi, rs, recomb, ped, positions)
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[1]
    ours = n_pos / dt

    baseline = None
    oracle = _oracle()
    if oracle is not None and oracle.ensure_extra_oracle("geno") is not None:
        inp = [f"{len(rows)} {n_pos} 1 0", " ".join(map(str, positions))]
        for name, sid, vs in rows:
            inp.append(f"{name} {sid} {len(vs)}")
            inp += [f"{p} {a} {q}" for p, a, q in vs]
        for c in range(n_pos):
            inp.append(f"{gts[c]} {gls[c][0]} {gls[c][1]} {gls[c][2]}")
        inp.append(" ".join(map(str, recomb)))
        text = "\n".join(inp) + "\n"
        ref_times = []
        for _ in range(3):
            t0 = time.perf_counter()
            oracle.run_extra_oracle("geno", text)
            ref_times.append(time.perf_counter() - t0)
        ref_times.sort()
        baseline = n_pos / ref_times[1]
    return {
        "value": round(ours, 1),
        "unit": "variants/s",
        "vs_baseline": round(ours / baseline, 2) if baseline else None,
    }


def bench_phase_chromosome_cli():
    """End-to-end `phase` on a synthetic 4k-variant chromosome (FASTA +
    BAM + VCF on disk -> phased VCF): BAM parsing, realignment allele
    detection, read selection, the batched device solve, and VCF writing
    all included.  The second run is reported (first pays jit compiles);
    switch-error rate vs the simulated truth is a correctness gate."""
    import sys as _sys
    import tempfile

    _sys.path.insert(0, str(Path(__file__).parent / "tools"))
    from make_synth_chrom import generate

    from whatshap_tpu.cli.phase import run_whatshap

    out_dir = Path(tempfile.gettempdir()) / "whatshap_tpu_bench_chrom_v1"
    marker = out_dir / "reads.bam"
    if not marker.exists():
        info = generate(out_dir, n_vars=4000, coverage=14, seed=7)
    else:
        info = generate(out_dir, n_vars=4000, coverage=14, seed=7)  # deterministic

    def run_once():
        out = io.StringIO()
        run_whatshap(
            phase_input_files=[info["bam"]],
            variant_file=info["vcf"],
            reference=info["fasta"],
            output=out,
            write_command_line_header=False,
        )
        return out.getvalue()

    cold, dt, dt_median, text, instances = _timed_cli(run_once, _capture_phase_instances)
    stages = _phase_stage_breakdown()  # before the oracle replay (see above)
    ref_dp = _reference_phase_dp_seconds(instances)

    # switch-error rate within phase blocks vs the simulated truth
    hap0 = info["hap0"]
    blocks = {}
    for line in text.splitlines():
        if not line or line.startswith("#"):
            continue
        f = line.split("\t")
        call = dict(zip(f[8].split(":"), f[9].split(":")))
        gt = call.get("GT", "")
        if "|" not in gt:
            continue
        vi = int(f[1]) // 150 - 1
        blocks.setdefault(call.get("PS"), []).append(
            (vi, int(gt.split("|")[0]))
        )
    n_pairs = 0
    n_switch = 0
    for members in blocks.values():
        members.sort()
        rel_prev = None
        for vi, a in members:
            rel = a ^ hap0[vi]
            if rel_prev is not None:
                n_pairs += 1
                if rel != rel_prev:
                    n_switch += 1
            rel_prev = rel
    switch_rate = n_switch / n_pairs if n_pairs else None
    n_vars = info["n_vars"]
    return {
        "value": round(n_vars / dt, 1),
        "unit": "variants/s",
        "seconds": round(dt, 2),
        "seconds_median": round(dt_median, 2),
        "cold_seconds": round(cold, 2),
        "reads": info["n_reads"],
        "switch_error_rate": round(switch_rate, 4) if switch_rate is not None else None,
        "ref_dp_seconds": round(ref_dp, 3) if ref_dp is not None else None,
        "vs_baseline": round(ref_dp / dt, 3) if ref_dp is not None else None,
        "stages": stages,
        "baseline_note": E2E_BASELINE_NOTE,
    }


def bench_genotype_device():
    """Batched device genotyping (f32 forward-backward, vmapped over
    same-shaped instances) vs the reference C++ oracle.  The f32 kernel is
    the TPU scale-out path (GT-identical, GQ within +-1 of the longdouble
    host engine); the host engine stays the byte-exact CLI default."""
    import random

    import whatshap_tpu.core as core
    from whatshap_tpu.core.genotype import Genotype
    from whatshap_tpu.core.phredgl import PhredGenotypeLikelihoods
    from whatshap_tpu.ops import genotyping as gt_ops
    from whatshap_tpu.ops import genotyping_jax, wmec

    import jax as _jax

    if _jax.default_backend() != "cpu":
        B, n_pos, n_reads = 64, 1024, 320
    else:  # emergency CPU fallback — mechanism check only
        B, n_pos, n_reads = 8, 256, 80
    rng = random.Random(5)
    positions = sorted(rng.sample(range(10, 10**6), n_pos))
    # identical read geometry across blocks -> identical (C, K) shapes, so
    # the batch vmaps; alleles/qualities vary per block
    geometry = []
    for _ in range(n_reads):
        start = rng.randint(0, n_pos - 10)
        geometry.append((start, min(start + rng.randint(5, 25), n_pos)))
    nsi = core.NumericSampleIds()
    ped = core.Pedigree(nsi)
    gts = [rng.randint(0, 2) for _ in range(n_pos)]
    gls = []
    for _ in range(n_pos):
        triple = [10.0 ** (-rng.choice([0, 5, 20]) / 10.0) for _ in range(3)]
        triple[rng.randint(0, 2)] = 1.0
        gls.append(triple)
    ped.add_individual(
        "ind0",
        [Genotype.from_index(g, 2) for g in gts],
        [PhredGenotypeLikelihoods(gl) for gl in gls],
    )
    recomb = [rng.choice([1, 2, 5]) for _ in range(n_pos)]

    packed_list = []
    rows0 = None
    for b in range(B):
        rngb = random.Random(1000 + b)
        rs = core.ReadSet()
        rows = []
        for i, (s, e) in enumerate(geometry):
            r = core.Read(f"r{i}", 50, 0, 0)
            vs = [(positions[p], rngb.randint(0, 1), rngb.choice([5, 10, 30]))
                  for p in range(s, e)]
            for p, a, q in vs:
                r.add_variant(p, a, q)
            rs.add(r)
            rows.append((f"r{i}", 0, vs))
        rs.sort()
        if b == 0:
            rows0 = rows
        packed_list.append(
            wmec.pack_problem(rs, recomb, ped, False, positions, check_conflicts=False)
        )

    import jax as _jax

    from whatshap_tpu.ops import genotyping_pallas

    static, stacked = genotyping_jax.prepare_genotyping_batch(packed_list, ped)
    # pre-cast once so the timed launches measure transfer + kernel, not
    # host-side dtype conversion
    stacked = [
        np.asarray(a, dtype=np.float32) if i in (0, 1, 2, 3, 6) else np.asarray(a)
        for i, a in enumerate(stacked)
    ]
    use_pallas = _jax.default_backend() != "cpu" and genotyping_pallas.kernel_supported(
        max(static[0], genotyping_pallas.LANE_BITS), static[1], static[2]
    )
    if use_pallas:
        launch = lambda: genotyping_pallas.launch_genotyping_pallas(static, stacked)  # noqa: E731
    else:
        launch = lambda: genotyping_jax.launch_genotyping_batch(static, stacked, dtype="f32")  # noqa: E731
    out = launch()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = launch()
        times.append(time.perf_counter() - t0)
    ours = B * n_pos / min(times)

    # spot parity: genotype calls of block 0 vs the byte-exact host engine
    host = gt_ops.run_genotyping(packed_list[0], ped)
    gt_dev = np.argmax(out[0, :, 0, :], axis=1)
    gt_host = np.argmax(np.asarray(host[:, 0, :], dtype=np.float64), axis=1)
    gt_match = float(np.mean(gt_dev == gt_host))

    baseline = None
    oracle = _oracle()
    if oracle is not None and oracle.ensure_extra_oracle("geno") is not None:
        inp = [f"{len(rows0)} {n_pos} 1 0", " ".join(map(str, positions))]
        for name, sid, vs in rows0:
            inp.append(f"{name} {sid} {len(vs)}")
            inp += [f"{p} {a} {q}" for p, a, q in vs]
        for c in range(n_pos):
            inp.append(f"{gts[c]} {gls[c][0]} {gls[c][1]} {gls[c][2]}")
        inp.append(" ".join(map(str, recomb)))
        t0 = time.perf_counter()
        oracle.run_extra_oracle("geno", "\n".join(inp) + "\n")
        baseline = n_pos / (time.perf_counter() - t0)
    return {
        "value": round(ours, 1),
        "unit": "variants/s",
        "gt_match": gt_match,
        "path": "pallas-f32" if use_pallas else "xla-f32",
        "vs_baseline": round(ours / baseline, 2) if baseline else None,
    }


def bench_trio():
    """Batched trio PedMEC (T=4) on the device vs the reference oracle."""
    import jax

    from whatshap_tpu.ops import wmec
    from whatshap_tpu.parallel import workloads

    n_blocks, n_pos = (256, 256) if jax.default_backend() != "cpu" else (8, 128)
    # read_len caps coverage so K stays within the trio kernel limit
    # (T=4 needs K <= 15) and the backtrace tables within HBM; the oracle
    # instances below match this shape
    K, T, P, packed_list, _ = workloads.build_trio_batch(
        n_blocks,
        n_pos=n_pos,
        n_reads=120 if n_blocks > 8 else 40,
        seed=17,
        c_pad=n_pos,
        read_len=12,
    )
    assert K <= 15, f"trio workload K={K} exceeds the T=4 kernel limit"
    # bucket blocks by (K, C) so sparse blocks don't pay the densest
    # block's 2^K state space, then time the per-bucket launches
    buckets = [
        (k_b, idxs, [jax.device_put(np.asarray(a)) for a in stacked])
        for k_b, _, idxs, stacked in wmec.bucket_packed_list(packed_list, c_pad=n_pos)
    ]

    def solve_all():
        outs = [
            wmec.solve_batched_auto(k_b, T, P, *dev) for k_b, _, dev in buckets
        ]
        for out in outs:
            _ = jax.device_get(out[1])

    solve_all()  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        solve_all()
        times.append(time.perf_counter() - t0)
    ours = n_blocks * n_pos / min(times)

    baseline = None
    oracle = _oracle()
    if oracle is not None:
        # rebuild equivalent oracle problems from the packed readsets is
        # intricate; time the oracle on matched fresh instances instead
        import random

        from whatshap_tpu.core import Read, ReadSet

        rng = random.Random(99)
        total_cols = 0
        total_time = 0.0
        for b in range(10):
            positions = [(i + 1) * 10 for i in range(n_pos)]
            rs = ReadSet()
            for i in range(120):
                sample = rng.randint(0, 2)
                start = rng.randint(0, n_pos - 2)
                end = rng.randint(start + 1, min(start + 12, n_pos - 1))
                read = Read(f"R{i}", 50, 0, sample)
                for c in range(start, end + 1):
                    read.add_variant(positions[c], rng.randint(0, 1), rng.randint(1, 60))
                rs.add(read)
            genotypes = [[1] * n_pos for _ in range(3)]
            recomb = [rng.choice([1, 2, 5]) for _ in range(n_pos)]
            text = oracle.serialize_problem(
                rs, positions, genotypes, recomb, trios=[(0, 1, 2)]
            )
            ref = oracle.run_oracle(text)
            total_cols += n_pos
            total_time += ref["time"]
        baseline = total_cols / total_time if total_time > 0 else None
    return {
        "value": round(ours, 1),
        "unit": "variants/s",
        "vs_baseline": round(ours / baseline, 2) if baseline else None,
    }


def bench_whole_chromosome():
    """One long block (16k columns) through the segmented solve."""
    import jax

    from whatshap_tpu.ops import wmec
    from whatshap_tpu.parallel import blocks as blk
    from whatshap_tpu.core import NumericSampleIds, Pedigree
    from whatshap_tpu.testhelpers import canonic_index_to_biallelic_gt

    if jax.default_backend() != "cpu":
        n_cols, coverage, seg = 16384, 14, 2048
    else:  # emergency CPU fallback — mechanism check only
        n_cols, coverage, seg = 1024, 10, 256
    rs, positions, _ = blk.make_synthetic_readset(n_cols, coverage, read_len=12, seed=5)
    ped = Pedigree(NumericSampleIds())
    ped.add_individual(
        "s", [canonic_index_to_biallelic_gt(1) for _ in positions], [None] * len(positions)
    )
    packed = wmec.pack_problem(rs, [1] * len(positions), ped, False)
    from whatshap_tpu.ops import wmec_pallas

    use_pallas = jax.default_backend() != "cpu" and wmec_pallas.kernel_supported(
        max(packed.K, 7), packed.T, packed.P
    )
    k_run = max(packed.K, wmec_pallas.LANE_BITS) if use_pallas else packed.K
    padded = blk.pad_block(packed, n_cols, k_pad=k_run)
    args = [
        np.asarray(x)
        for x in (padded.wdiff, padded.wbase, padded.rankw, padded.acost,
                  padded.die_prev, padded.rc)
    ]

    def solve():
        if use_pallas:
            out = wmec_pallas.solve_segmented(
                k_run, packed.T, packed.P, *[a[None] for a in args], seg=seg
            )
        else:
            out = (wmec.solve_scan_segmented(k_run, packed.T, packed.P, *args, seg=seg),)
        return out

    import jax as _jax

    def run_once():
        t0 = time.perf_counter()
        out = solve()
        if use_pallas:
            _ = _jax.device_get(out[1])
        return time.perf_counter() - t0

    compile_and_run = run_once()  # includes compile on first call
    dt = min(run_once() for _ in range(3))
    # baseline: the compiled reference C++ DP on the identical instance
    # (same oracle replay as every other phase config)
    ref_dp = _reference_phase_dp_seconds([(rs, [1] * len(positions), ped, False, positions)])
    return {
        "value": round(n_cols / dt, 1),
        "unit": "variants/s",
        "first_call_s": round(compile_and_run, 1),
        "path": "pallas-segmented" if use_pallas else "xla-segmented",
        "ref_dp_seconds": round(ref_dp, 3) if ref_dp is not None else None,
        "vs_baseline": round(ref_dp / dt, 3) if ref_dp is not None else None,
        "baseline_note": E2E_BASELINE_NOTE,
    }


def bench_polyphase():
    """Cluster editing + threading + reordering on a synthetic tetraploid
    instance (the reference pipeline's shape, all native engines on)."""
    import random

    from whatshap_tpu.core import Read, ReadSet
    from whatshap_tpu.polyphase import PolyphaseParameter
    from whatshap_tpu.polyphase.algorithm import solve_polyphase_instance
    from whatshap_tpu.polyphase.solver import AlleleMatrix
    from whatshap_tpu.timer import StageTimer

    rng = random.Random(23)
    ploidy, n_pos, n_reads = 4, 600, 1200
    haps = [[rng.randint(0, 1) for _ in range(n_pos)] for _ in range(ploidy)]
    positions = [(i + 1) * 10 for i in range(n_pos)]
    rs = ReadSet()
    for i in range(n_reads):
        h = rng.randrange(ploidy)
        start = rng.randint(0, n_pos - 8)
        length = rng.randint(6, 24)
        read = Read(f"r{i}", 50, 0, 0)
        for c in range(start, min(start + length, n_pos)):
            allele = haps[h][c] if rng.random() > 0.05 else 1 - haps[h][c]
            read.add_variant(positions[c], allele, 30)
        rs.add(read)
    rs.sort()
    matrix = AlleleMatrix(rs)
    genotypes = [
        {0: sum(1 for h in range(ploidy) if haps[h][c] == 0),
         1: sum(1 for h in range(ploidy) if haps[h][c] == 1)}
        for c in range(n_pos)
    ]
    genotypes = [{a: m for a, m in g.items() if m} for g in genotypes]
    param = PolyphaseParameter(
        ploidy=ploidy, ce_bundle_edges=False, distrust_genotypes=False,
        min_overlap=2, block_cut_sensitivity=4, plot_clusters=False,
        plot_threading=False, plot_path="", threads=1, use_prephasing=False,
    )
    # same methodology as the CLI configs: one warmup call (first-contact
    # caches: score-LUTs, native .so loads), then the median of 3 timed runs
    solve_polyphase_instance(matrix, genotypes, param, StageTimer())
    times = []
    for _ in range(3):
        timers = StageTimer()
        t0 = time.perf_counter()
        solve_polyphase_instance(matrix, genotypes, param, timers)
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[1]

    # reference baseline: the compiled reference polyphase compute core
    # (AlleleMatrix + ReadScoring + ClusterEditingSolver) on the identical
    # ReadSet.  The reference's threading/reordering stages (Python-driven)
    # are NOT counted while our dt includes them — conservative bound.
    ref_s = None
    oracle = _oracle()
    if oracle is not None and oracle.ensure_extra_oracle("polyphase") is not None:
        inp = [f"{len(rs)} {ploidy} {param.min_overlap} 0.0"]
        for read in rs:
            inp.append(f"{read.name.replace(' ', '_')} 0 {len(read)}")
            inp += [f"{v.position} {v.allele} {v.quality}" for v in read]
        text = "\n".join(inp) + "\n"
        ref_times = []
        for _ in range(3):  # median of 3, like our side — the leg was noisy
            out = oracle.run_extra_oracle("polyphase", text)
            if out is None:
                break
            for line in out.splitlines():
                parts = line.split()
                if parts and parts[0] == "time":
                    ref_times.append(float(parts[1]))
                    break
        if len(ref_times) == 3:
            ref_times.sort()
            ref_s = ref_times[1]
        elif ref_times:
            ref_s = ref_times[0]
    return {
        "value": round(n_pos / dt, 1),
        "unit": "variants/s",
        "reads": n_reads,
        "clustering_s": round(timers.elapsed("clustering"), 2),
        "threading_s": round(timers.elapsed("threading"), 2),
        "ref_scoring_clustering_seconds": round(ref_s, 3) if ref_s is not None else None,
        "vs_baseline": round(ref_s / dt, 3) if ref_s is not None else None,
        "baseline_note": (
            "baseline = compiled reference C++ AlleleMatrix+ReadScoring+"
            "ClusterEditing on the identical ReadSet; reference threading/"
            "reordering not counted while ours is — conservative ratio"
        ),
    }


def bench_mesh_virtual():
    """Sharded-solve scaling on a virtual CPU mesh (subprocesses, since
    this process owns the TPU platform).  A mechanism check: the mesh path
    compiles, runs, and bit-matches the serial solve.

    A virtual-device mesh shares the host's physical cores, so the honest
    per-core scaling number needs a single-CORE baseline: the 1-device run
    is pinned to core 0 (XLA-CPU otherwise multithreads it over every
    core, which would make even perfect sharding look like a loss).  The
    mesh size is the physical core count and the workload is many blocks
    per device — the same load-balance regime the scaling model's
    chromosome workload runs."""
    import os
    import subprocess

    cores = os.cpu_count() or 1
    n = max(2, min(4, cores))
    blocks = 64 * n  # many blocks/device: the model's chr1 regime

    def run_solo(devices, pin, extra_env):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            flags += f" --xla_force_host_platform_device_count={n}"
        env["XLA_FLAGS"] = flags.strip()
        env.update(extra_env)
        cmd = [
            sys.executable,
            str(Path(__file__).parent / "tools" / "mesh_bench.py"),
            "--cpu", "--mode", "solo",
            "--devices", str(devices),
            "--blocks", str(blocks),
            "--cols", "64",
            "--repeat", "1",
        ]
        if pin is not None:
            cmd += ["--pin-cores", pin]
        p = subprocess.run(cmd, capture_output=True, text=True, timeout=1800, env=env)
        if p.returncode != 0:
            raise RuntimeError((p.stderr or p.stdout)[-300:])
        return json.loads(p.stdout.strip().splitlines()[-1])

    try:
        base = run_solo(1, "0", {})
        meshed = run_solo(n, None, {})
    except RuntimeError as exc:
        return {"error": str(exc)[-200:]}
    if base["costs_sha"] != meshed["costs_sha"]:
        return {"error": "sharded result diverged from 1-device result"}
    eff = base["t"] / (n * meshed["t"])
    return {
        "value": round(eff, 3),
        "unit": f"virtual{n}_cpu_efficiency_vs_pinned_core",
        "devices": n,
        "physical_cores": cores,
        "blocks": blocks,
        "t1_single_core": base["t"],
        "tn": meshed["t"],
        "note": (
            "virtual devices share host cores; baseline pinned to one core "
            "so the ratio measures per-core scaling of the sharded path, "
            "bit-parity asserted via result checksum"
        ),
    }


def bench_batch_scaling(K, T, P, arrays_small, arrays_big, b_small, b_big):
    small = measure_device(K, T, P, arrays_small, n_iters=2)
    big = measure_device(K, T, P, arrays_big, n_iters=2)
    # perfect batching: t(8B) == 8 * t(B) per variant, i.e. equal throughput
    eff = (b_big / big) / (b_small / small)
    out = {"value": round(eff, 3), "unit": "throughput_ratio_8x_batch"}
    # roofline at both batch sizes explains where the small launch idles:
    # the fixed dispatch+fence overhead plus VPU underutilization at low
    # row counts (see tools/roofline.py; doc/tpu.md "Roofline")
    try:
        out["roofline_small"] = _wmec_roofline(
            K, T, P, arrays_small[0].shape[0], arrays_small[0].shape[1], small
        )
        out["roofline_big"] = _wmec_roofline(
            K, T, P, arrays_big[0].shape[0], arrays_big[0].shape[1], big
        )
    except Exception:
        pass
    return out


def _wmec_roofline(K, T, P, n_blocks, n_cols, seconds):
    """Roofline numbers for one measured batched solve (tools/roofline.py),
    trimmed for the bench JSON."""
    import jax

    sys.path.insert(0, str(Path(__file__).parent / "tools"))
    from roofline import wmec_roofline

    kind = jax.devices()[0].device_kind
    r = wmec_roofline(K, T, P, n_blocks, n_cols, seconds, kind)
    return {
        k: r[k]
        for k in (
            "achieved_gops",
            "achieved_gbps",
            "vpu_utilization",
            "vpu_issue_utilization",
            "hbm_utilization",
            "bound",
            "device_kind",
        )
        if k in r
    }


def bench_scaling_model():
    """Measured-launch + load-balance model of N-chip scaling efficiency.

    Real multi-chip hardware is not attachable here, so instead of an
    unsubstantiated claim this config derives the efficiency bound from
    single-chip measurements: it records every batched launch the
    chromosome-scale phase CLI actually makes (shape, batch, padding),
    measures the per-launch dispatch+fence overhead and the warm per-state
    solve rate on the attached device, and models
        T_n = sum_launches( ceil(B/n) * C * T * 2^K / rate + overhead )
    with blocks round-robined across n devices (exactly what shard_map
    does to the block axis; there are no collectives).  Reports the
    per-launch balance stats alongside so the model is auditable.
    """
    import math
    import sys as _sys
    import tempfile

    import jax

    from whatshap_tpu.ops import wmec

    _sys.path.insert(0, str(Path(__file__).parent / "tools"))
    from make_synth_chrom import generate

    from whatshap_tpu.cli.phase import run_whatshap

    on_accel = jax.default_backend() != "cpu"

    def capture_launches(info):
        """Run the phase CLI once under the batched route and record every
        batched launch it makes (shape, batch, padding)."""
        wmec.LAUNCH_STATS.clear()
        out = io.StringIO()
        # force the batched route for the capture run so the launch shapes
        # are the production accelerator shapes even when this pass runs on
        # a CPU host (auto would route small instances to numpy there)
        old_backend = os.environ.get("WHATSHAP_TPU_BACKEND")
        os.environ["WHATSHAP_TPU_BACKEND"] = "batched"
        try:
            run_whatshap(
                phase_input_files=[info["bam"]],
                variant_file=info["vcf"],
                reference=info["fasta"],
                output=out,
                write_command_line_header=False,
            )
        finally:
            if old_backend is None:
                os.environ.pop("WHATSHAP_TPU_BACKEND", None)
            else:
                os.environ["WHATSHAP_TPU_BACKEND"] = old_backend
        return [s for s in wmec.LAUNCH_STATS if s[3] > 0]

    if on_accel:
        # chromosome grain: a chr1-scale synthetic (100k variants — the
        # BASELINE.json "PacBio HG001 chr1-style" workload) — hundreds of
        # blocks per launch, the regime the architecture is built for
        out_dir = Path(tempfile.gettempdir()) / "whatshap_tpu_bench_chrom_chr1"
        info = generate(out_dir, n_vars=100_000, coverage=14, seed=7)
        # small grain kept alongside: a 4k-variant toy is overhead-dominated
        # by construction and stays reported as the honest lower bound
        out_dir_small = Path(tempfile.gettempdir()) / "whatshap_tpu_bench_chrom_v1"
        info_small = generate(out_dir_small, n_vars=4000, coverage=14, seed=7)
        launches_small = capture_launches(info_small)
    else:
        # CPU fallback: mechanism validation only — the XLA-CPU scan at the
        # accelerator workload sizes would blow the config timeout
        out_dir = Path(tempfile.gettempdir()) / "whatshap_tpu_bench_chrom_small"
        info = generate(out_dir, n_vars=1200, coverage=10, seed=7)
        launches_small = None
    launches = capture_launches(info)
    if not launches:
        return {"error": "CLI made no batched launches"}

    # per-launch overhead, split into the part that pipelines (one fetch
    # fence per launch wave — the production dispatch-all-then-fetch-once
    # pattern, wmec._launch_batched + solve_packed_list) and the part that
    # multiplies with chunk count (incremental async dispatch)
    K0, T0, P0, tiny, _, _ = build_workload(n_blocks=1, n_cols=64, coverage=5)
    fence, dispatch, rtt = measure_dispatch_split(K0, T0, P0, tiny)
    overhead = fence + dispatch
    # the fence on this attachment is almost entirely the tunnel's network
    # round trip; a locally-attached controller (any real multi-chip pod)
    # pays only the device-side residue
    fence_local = max(0.0, fence - rtt)

    # warm per-state solve rate from a saturated launch
    nb, nc, cov = (256, 512, 14) if on_accel else (16, 128, 10)
    K, T, P, arrays, _, _ = build_workload(nb, nc, coverage=cov)
    dt_big = measure_device(K, T, P, arrays, n_iters=3 if on_accel else 1)
    rate = nb * nc * T * (1 << K) / dt_big  # states/sec

    def model_time(n, ls, fence_s):
        """Replay _launch_batched's exact launch structure at n devices:
        per-shape block totals are split into chunks bounded by the
        PER-DEVICE HBM table budget times n (the chunk cap scales with the
        mesh, wmec._launch_batched), each chunk runs ceil(chunk/n) blocks
        per device.  Chunks are dispatched asynchronously and fetched once
        per launch wave (solve_packed_list), so each chunk pays only the
        incremental dispatch cost; the fetch fence is paid once."""
        from whatshap_tpu.ops.wmec import HBM_TABLE_BUDGET

        shape_blocks = {}
        for (k, t, c, _b, b_pad, _nd) in ls:
            key = (k, t, c)
            shape_blocks[key] = shape_blocks.get(key, 0) + b_pad
        total = fence_s
        for (k, t, c), blocks in shape_blocks.items():
            per_block_bytes = c * t * (1 << k) * 4 * 2
            max_b = max(1, HBM_TABLE_BUDGET // max(per_block_bytes, 1)) * n
            remaining = blocks
            while remaining > 0:
                chunk = min(remaining, max_b)
                total += math.ceil(chunk / n) * c * t * (1 << k) / rate + dispatch
                remaining -= chunk
        return total

    def model_eff(ls, fence_s=None):
        f = fence if fence_s is None else fence_s
        t1 = model_time(1, ls, f)
        return {
            n: round(t1 / (n * model_time(n, ls, f)), 3) for n in (2, 4, 8, 16, 32)
        }

    eff = model_eff(launches)
    # projection for a locally-attached controller: same launch structure,
    # fence minus the measured tunnel round trip (reported separately so
    # the substitution is auditable)
    eff_local = model_eff(launches, fence_s=fence_local)
    eff_small = model_eff(launches_small) if launches_small else None

    total_blocks = sum(s[3] for s in launches)
    total_padded = sum(s[4] for s in launches)
    by_shape = {}
    for (k, t, c, b, b_pad, _nd) in launches:
        key = f"K{k}/C{c}"
        agg = by_shape.setdefault(key, [0, 0])
        agg[0] += 1
        agg[1] += b
    return {
        # headline: what the launch structure would sustain on a locally
        # attached 8-chip mesh; the tunnel-attachment table (charging this
        # environment's full network RTT per launch wave) sits alongside
        "value": eff_local[8],
        "unit": "modeled_8dev_efficiency",
        "value_tunnel_attachment": eff[8],
        "workload_variants": info["n_vars"],
        "efficiency_by_devices": eff,
        "efficiency_by_devices_local_controller": eff_local,
        "efficiency_by_devices_small_4k": eff_small,
        "launches": len(launches),
        "blocks": total_blocks,
        "pad_fraction": round((total_padded - total_blocks) / max(total_padded, 1), 4),
        "launch_overhead_s": round(overhead, 4),
        "fence_s": round(fence, 4),
        "dispatch_s": round(dispatch, 4),
        "tunnel_rtt_s": round(rtt, 4),
        "states_per_sec": round(rate, 0),
        "launch_shapes": {k: {"launches": v[0], "blocks": v[1]} for k, v in by_shape.items()},
        "note": (
            "single-chip-measured model (real multi-chip not attachable "
            "here); blocks are independent and shard without collectives, "
            "so the bound is launch-grain load balance + dispatch overhead; "
            "the headline is the chr1-grain workload, the 4k toy kept "
            "alongside as the overhead-dominated lower bound. The "
            "launch-wave fence on this attachment is almost entirely the "
            "tunnel's network round trip (tunnel_rtt_s, measured as a fresh "
            "8-element result fetch); efficiency_by_devices charges it in "
            "full, efficiency_by_devices_local_controller charges only the "
            "device-side residue, which is what a locally attached "
            "multi-chip controller would pay"
        ),
    }


def _progress(msg):
    # stderr, flushed: the stdout contract is exactly one JSON line
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


class _ConfigTimeout(Exception):
    pass


def _with_timeout(fn, seconds):
    """Run fn() under a SIGALRM deadline so one hung remote compile cannot
    stall the whole bench (the stdout JSON line must always appear)."""
    import signal

    def _raise(signum, frame):
        raise _ConfigTimeout(f"config exceeded {seconds}s")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)
    try:
        return fn()
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _probe_device_attach(
    timeout_s=int(os.environ.get("WHATSHAP_TPU_BENCH_ATTACH_TIMEOUT", 900)),
):
    """Initialize the accelerator backend in a SUBPROCESS first.

    A wedged device tunnel blocks inside PJRT client init (C++ holding the
    GIL), where neither SIGALRM (_with_timeout) nor faulthandler can fire —
    the whole bench would hang without ever printing its JSON line.  A
    subprocess attach can be killed from outside; it also warms the
    server-side session so the in-process attach that follows is quick.
    Returns None when the device is reachable, else an error string.
    """
    import subprocess

    try:
        p = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return f"device attach still blocked after {timeout_s}s (wedged tunnel?)"
    if p.returncode != 0:
        return (p.stderr or p.stdout)[-200:]
    return None


def main():
    configs = {}

    attach_err = _probe_device_attach()
    if attach_err is not None:
        _progress(f"device attach FAILED: {attach_err}; falling back to CPU")
        import jax

        jax.config.update("jax_platforms", "cpu")
        configs["device_attach_error"] = attach_err

    _progress("headline: batched wMEC vs oracle baseline ...")
    headline_error = None
    try:
        throughput, baseline, roofline = _with_timeout(bench_headline, 1800)
        _progress(f"headline done: {throughput:.0f} var/s (baseline {baseline:.0f})")
        if roofline:
            configs["roofline_headline"] = roofline
    except Exception as e:  # a dead accelerator must still yield the JSON line
        throughput, baseline = 0.0, BASELINE_FALLBACK
        headline_error = str(e)[:200]
        _progress(f"headline FAILED: {headline_error}")

    try:
        _progress("batch_scaling ...")
        import jax as _jax

        if _jax.default_backend() != "cpu":
            bs, bb, cols, cov = 32, 256, 512, 14
        else:  # emergency CPU fallback — mechanism check only
            bs, bb, cols, cov = 2, 16, 128, 10
        K, T, P, arrays_small, _, _ = build_workload(bs, cols, coverage=cov)
        _, _, _, arrays_big, _, _ = build_workload(bb, cols, coverage=cov)
        configs["batch_scaling"] = bench_batch_scaling(
            K, T, P, arrays_small, arrays_big, bs * cols, bb * cols
        )
    except Exception as e:  # pragma: no cover - never fail the bench line
        configs["batch_scaling"] = {"error": str(e)[:200]}

    for name, fn in [
        ("phase_cli_fixture", bench_phase_cli),
        ("phase_chromosome_cli", bench_phase_chromosome_cli),
        ("phase_trio_chromosome_cli", bench_phase_trio_chromosome),
        ("genotype_fb", bench_genotype),
        ("genotype_fb_device", bench_genotype_device),
        ("genotype_chromosome_cli", bench_genotype_chromosome_cli),
        ("trio_pedmec", bench_trio),
        ("whole_chromosome", bench_whole_chromosome),
        ("polyphase_tetraploid", bench_polyphase),
        ("mesh_virtual8", bench_mesh_virtual),
        ("scaling_model", bench_scaling_model),
    ]:
        try:
            _progress(f"{name} ...")
            configs[name] = _with_timeout(fn, 1200)
        except Exception as e:  # pragma: no cover
            configs[name] = {"error": str(e)[:200]}
        _progress(f"{name}: {configs[name]}")
        # each leg holds instance captures, readsets and device buffers;
        # collecting here keeps later legs from timing under the earlier
        # legs' memory pressure
        import gc

        gc.collect()

    result = {
        "metric": "variants_phased_per_sec_per_chip",
        "value": round(throughput, 1),
        "unit": "variants/s",
        "vs_baseline": round(throughput / baseline, 2),
        "configs": configs,
    }
    if headline_error:
        result["error"] = headline_error
    print(json.dumps(result))


if __name__ == "__main__":
    main()
