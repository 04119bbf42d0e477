"""
Dev-only parity oracle: run the *reference* C++ PedigreeDPTable (compiled
from the read-only reference checkout into /tmp) on the same problem as our
solver and compare outputs bit-for-bit.

This never ships reference code in this repo; it compiles the reference
sources out-of-tree purely as a test oracle.  If the reference checkout or a
compiler is unavailable, callers should skip.
"""

import os
import subprocess
from pathlib import Path
from typing import List, Optional

ORACLE_DIR = Path("/tmp/oracle")
ORACLE_BIN = ORACLE_DIR / "oracle"
REFERENCE_SRC = Path("/root/reference/src")

_ORACLE_SOURCES = [
    "pedigree.cpp",
    "pedigreedptable.cpp",
    "pedigreecolumncostcomputer.cpp",
    "columnindexingiterator.cpp",
    "columnindexingscheme.cpp",
    "entry.cpp",
    "graycodes.cpp",
    "read.cpp",
    "readset.cpp",
    "columniterator.cpp",
    "indexset.cpp",
    "genotype.cpp",
    "binomial.cpp",
    "multinomial.cpp",
    "pedigreepartitions.cpp",
    "phredgenotypelikelihoods.cpp",
]


_MAIN_CPP = Path(__file__).parent / "oracle_main.cpp"


def oracle_available() -> bool:
    if ORACLE_BIN.exists():
        return True
    return REFERENCE_SRC.exists() and _MAIN_CPP.exists()


def ensure_oracle() -> Optional[Path]:
    if ORACLE_BIN.exists():
        # rebuild when the driver source changed (cached across sessions)
        if not _MAIN_CPP.exists() or _MAIN_CPP.stat().st_mtime <= ORACLE_BIN.stat().st_mtime:
            return ORACLE_BIN
        ORACLE_BIN.unlink()
    if not (REFERENCE_SRC.exists() and _MAIN_CPP.exists()):
        return None
    ORACLE_DIR.mkdir(parents=True, exist_ok=True)
    main_cpp = _MAIN_CPP
    cmd = (
        ["g++", "-O3", "-std=c++11", f"-I{REFERENCE_SRC}", "-o", str(ORACLE_BIN), str(main_cpp)]
        + [str(REFERENCE_SRC / s) for s in _ORACLE_SOURCES]
    )
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return ORACLE_BIN if ORACLE_BIN.exists() else None


def serialize_problem(
    readset,
    positions: List[int],
    genotypes_per_ind: List[List[int]],
    recombcost: List[int],
    trios: List[tuple] = (),
    distrust: bool = False,
    gls_per_ind: Optional[List[List[List[float]]]] = None,
) -> str:
    """Serialize to the oracle's stdin format.  ReadSet must be unsorted-ok;
    the oracle sorts with the same comparator as the reference."""
    n_ind = len(genotypes_per_ind)
    lines = [
        f"{len(readset)} {len(positions)} {n_ind} {len(trios)} {int(distrust)}",
        " ".join(str(p) for p in positions),
    ]
    for read in readset:
        name = read.name.replace(" ", "_")
        lines.append(f"{name} {read.sample_id} {len(read)}")
        for v in read:
            lines.append(f"{v.position} {v.allele} {v.quality}")
    for ind in range(n_ind):
        for c in range(len(positions)):
            row = str(genotypes_per_ind[ind][c])
            if distrust:
                g = gls_per_ind[ind][c]
                row += f" {g[0]} {g[1]} {g[2]}"
            lines.append(row)
    for f, m, c in trios:
        lines.append(f"{f} {m} {c}")
    lines.append(" ".join(str(r) for r in recombcost))
    return "\n".join(lines) + "\n"


def run_oracle(problem_text: str) -> dict:
    binpath = ensure_oracle()
    assert binpath is not None, "oracle unavailable"
    proc = subprocess.run(
        [str(binpath)], input=problem_text, capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0, proc.stderr
    out = {}
    haps = {}
    quals = {}
    for line in proc.stdout.splitlines():
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "cost":
            out["cost"] = int(parts[1])
        elif parts[0] == "time":
            out["time"] = float(parts[1])
        elif parts[0] == "partition":
            out["partition"] = [int(c) for c in parts[1]] if len(parts) > 1 else []
        elif parts[0] == "readorder":
            out["readorder"] = parts[1:]
        elif parts[0] == "transmission":
            out["transmission"] = [int(x) for x in parts[1:]]
        elif parts[0] == "hap":
            k, h = int(parts[1]), int(parts[2])
            alleles = parts[3] if len(parts) > 3 else ""
            qpos = parts.index("q") if "q" in parts else None
            haps[(k, h)] = alleles if alleles != "q" else ""
            if qpos is not None:
                quals[(k, h)] = [int(x) for x in parts[qpos + 1 :]]
    out["haplotypes"] = haps
    out["qualities"] = quals
    return out


# ---------------------------------------------------------------------------
# additional dev-only oracles (genotyping HMM, HapChat, PedMecHeuristic)

_EXTRA_ORACLES = {
    "geno": (
        "geno_oracle_main.cpp",
        [
            "read.cpp",
            "readset.cpp",
            "entry.cpp",
            "columniterator.cpp",
            "backwardcolumniterator.cpp",
            "indexset.cpp",
            "pedigree.cpp",
            "genotype.cpp",
            "binomial.cpp",
            "phredgenotypelikelihoods.cpp",
            "genotypedptable.cpp",
            "genotypecolumncostcomputer.cpp",
            "transitionprobabilitycomputer.cpp",
            "columnindexingiterator.cpp",
            "columnindexingscheme.cpp",
            "graycodes.cpp",
            "pedigreepartitions.cpp",
            "genotypedistribution.cpp",
        ],
    ),
    "hapchat": (
        "hapchat_oracle_main.cpp",
        [
            "read.cpp",
            "readset.cpp",
            "entry.cpp",
            "columniterator.cpp",
            "indexset.cpp",
            "hapchat/basictypes.cpp",
            "hapchat/binomialcoefficient.cpp",
            "hapchat/balancedcombinations.cpp",
        ],
    ),
    "polyphase": (
        "polyphase_oracle_main.cpp",
        [
            "read.cpp",
            "readset.cpp",
            "entry.cpp",
            "columniterator.cpp",
            "indexset.cpp",
            "genotype.cpp",
            "binomial.cpp",
            "multinomial.cpp",
            "phredgenotypelikelihoods.cpp",
            "polyphase/allelematrix.cpp",
            "polyphase/readscoring.cpp",
            "polyphase/trianglesparsematrix.cpp",
            "polyphase/clustereditingsolver.cpp",
            "polyphase/clustereditingsolution.cpp",
            "polyphase/edgeheap.cpp",
            "polyphase/inducedcostheuristic.cpp",
            "polyphase/staticsparsegraph.cpp",
        ],
    ),
    "heur": (
        "heur_oracle_main.cpp",
        [
            "pedmecheuristic.cpp",
            "read.cpp",
            "readset.cpp",
            "entry.cpp",
            "columniterator.cpp",
            "indexset.cpp",
            "pedigree.cpp",
            "genotype.cpp",
            "binomial.cpp",
            "phredgenotypelikelihoods.cpp",
            "polyphase/allelematrix.cpp",
        ],
    ),
}


def ensure_extra_oracle(kind: str) -> Optional[Path]:
    main_name, sources = _EXTRA_ORACLES[kind]
    binpath = ORACLE_DIR / f"oracle_{kind}"
    main_cpp = Path(__file__).parent / main_name
    if binpath.exists():
        # rebuild when the driver source changed (cached across sessions)
        if not main_cpp.exists() or main_cpp.stat().st_mtime <= binpath.stat().st_mtime:
            return binpath
        binpath.unlink()
    if not (REFERENCE_SRC.exists() and main_cpp.exists()):
        return None
    ORACLE_DIR.mkdir(parents=True, exist_ok=True)
    cmd = (
        [
            "g++",
            "-O2",
            "-std=c++17",
            f"-I{REFERENCE_SRC}",
            f"-I{REFERENCE_SRC}/hapchat",
            "-o",
            str(binpath),
            str(main_cpp),
        ]
        + [str(REFERENCE_SRC / s) for s in sources]
    )
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return binpath if binpath.exists() else None


def run_extra_oracle(kind: str, problem_text: str) -> Optional[str]:
    binpath = ensure_extra_oracle(kind)
    if binpath is None:
        return None
    proc = subprocess.run(
        [str(binpath)], input=problem_text, capture_output=True, text=True, timeout=600
    )
    if proc.returncode != 0:
        return None
    return proc.stdout
