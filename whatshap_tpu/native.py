"""
ctypes loader for the native host kernels (native/alignlib.cpp).

Builds the shared library on first use with g++ (cached next to the
sources); falls back cleanly if no compiler is available — callers check for
``lib is None`` and use the Python implementations.
"""

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "_alignlib.so"


class _NativeLib:
    def __init__(self, cdll):
        self._lib = cdll
        self._lib.wh_edit_distance.restype = ctypes.c_int
        self._lib.wh_edit_distance.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
        ]
        self._lib.wh_edit_distance_affine_gap.restype = ctypes.c_int
        self._lib.wh_edit_distance_affine_gap.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.c_int,
        ]

    def edit_distance(self, s: bytes, t: bytes, maxdiff: int = -1) -> int:
        return self._lib.wh_edit_distance(s, len(s), t, len(t), maxdiff)

    def edit_distance_affine_gap(self, q, r, mismatch_cost, gap_start, gap_extend):
        arr = (ctypes.c_int * len(mismatch_cost))(*mismatch_cost)
        return self._lib.wh_edit_distance_affine_gap(
            q, len(q), r, len(r), arr, gap_start, gap_extend
        )


def _build() -> bool:
    src = _NATIVE_DIR / "alignlib.cpp"
    if not src.exists():
        return False
    if _SO_PATH.exists() and _SO_PATH.stat().st_mtime >= src.stat().st_mtime:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", str(_SO_PATH), str(src)],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


lib = None
if _build():
    try:
        lib = _NativeLib(ctypes.CDLL(str(_SO_PATH)))
    except OSError:
        lib = None


# --- native BAM loader (native/bamlib.cpp) ---------------------------------

_BAM_SO_PATH = _NATIVE_DIR / "_bamlib.so"


class _BamLib:
    def __init__(self, cdll):
        c = self._lib = cdll
        c.wh_bam_load.restype = ctypes.c_void_p
        c.wh_bam_load.argtypes = [ctypes.c_char_p]
        c.wh_bam_n_records.restype = ctypes.c_uint64
        c.wh_bam_n_records.argtypes = [ctypes.c_void_p]
        c.wh_bam_pool.restype = ctypes.POINTER(ctypes.c_uint8)
        c.wh_bam_pool.argtypes = [ctypes.c_void_p]
        c.wh_bam_pool_size.restype = ctypes.c_uint64
        c.wh_bam_pool_size.argtypes = [ctypes.c_void_p]
        c.wh_bam_offsets.restype = ctypes.POINTER(ctypes.c_uint64)
        c.wh_bam_offsets.argtypes = [ctypes.c_void_p]
        c.wh_bam_fixed.restype = ctypes.POINTER(ctypes.c_int32)
        c.wh_bam_fixed.argtypes = [ctypes.c_void_p]
        c.wh_bam_header_text.restype = ctypes.c_char_p
        c.wh_bam_header_text.argtypes = [ctypes.c_void_p]
        c.wh_bam_n_refs.restype = ctypes.c_int
        c.wh_bam_n_refs.argtypes = [ctypes.c_void_p]
        c.wh_bam_ref_name.restype = ctypes.c_char_p
        c.wh_bam_ref_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
        c.wh_bam_ref_len.restype = ctypes.c_int
        c.wh_bam_ref_len.argtypes = [ctypes.c_void_p, ctypes.c_int]
        c.wh_bam_free.restype = None
        c.wh_bam_free.argtypes = [ctypes.c_void_p]


def _build_bamlib() -> bool:
    src = _NATIVE_DIR / "bamlib.cpp"
    if not src.exists():
        return False
    if _BAM_SO_PATH.exists() and _BAM_SO_PATH.stat().st_mtime >= src.stat().st_mtime:
        return True
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-shared",
                "-fPIC",
                "-std=c++17",
                "-o",
                str(_BAM_SO_PATH),
                str(src),
                "-lz",
            ],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


bamlib = None
if _build_bamlib():
    try:
        bamlib = _BamLib(ctypes.CDLL(str(_BAM_SO_PATH)))
    except OSError:
        bamlib = None


# --- native cluster editing (native/clusterlib.cpp) -------------------------

_CLUSTER_SO_PATH = _NATIVE_DIR / "_clusterlib.so"


class _ClusterLib:
    def __init__(self, cdll):
        c = self._lib = cdll
        c.wh_cluster_run.restype = ctypes.c_longlong
        c.wh_cluster_run.argtypes = [
            ctypes.c_int,
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        c.wh_cluster_nodes.restype = ctypes.POINTER(ctypes.c_int)
        c.wh_cluster_nodes.argtypes = []
        c.wh_cluster_offsets.restype = ctypes.POINTER(ctypes.c_int64)
        c.wh_cluster_offsets.argtypes = []

    def run(self, n_nodes, us, vs, ws, bundle_edges):
        import numpy as np

        n = len(us)
        ua = np.ascontiguousarray(us, dtype=np.int32)
        va = np.ascontiguousarray(vs, dtype=np.int32)
        wa = np.ascontiguousarray(ws, dtype=np.float32)
        k = self._lib.wh_cluster_run(
            n_nodes,
            n,
            ua.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            va.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            wa.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            int(bundle_edges),
        )
        nodes_p = self._lib.wh_cluster_nodes()
        offs_p = self._lib.wh_cluster_offsets()
        if k <= 0:
            return []
        offs = np.ctypeslib.as_array(offs_p, shape=(k + 1,))
        nodes = np.ctypeslib.as_array(nodes_p, shape=(int(offs[k]),)).tolist()
        return [nodes[offs[i] : offs[i + 1]] for i in range(k)]


def _build_clusterlib() -> bool:
    src = _NATIVE_DIR / "clusterlib.cpp"
    if not src.exists():
        return False
    if _CLUSTER_SO_PATH.exists() and _CLUSTER_SO_PATH.stat().st_mtime >= src.stat().st_mtime:
        return True
    # -march=native for the heap/scan hot loops; -ffp-contract=off pins the
    # induced-cost float sums (no FMA contraction, so the clustering stays
    # bit-identical across arch flags)
    # (A PGO variant trained on synthetic instances was tried here and
    # measured SLOWER than the plain -O3 build on real pipeline inputs —
    # the profile did not transfer across -fPIC codegen; keep it simple.)
    flags = ["-O3", "-march=native", "-ffp-contract=off", "-std=c++17"]
    try:
        subprocess.run(
            ["g++", *flags, "-shared", "-fPIC", "-o", str(_CLUSTER_SO_PATH), str(src)],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


clusterlib = None
if _build_clusterlib():
    try:
        clusterlib = _ClusterLib(ctypes.CDLL(str(_CLUSTER_SO_PATH)))
    except OSError:
        clusterlib = None


# --- native haplotype threading (native/threadlib.cpp) ----------------------

_THREAD_SO_PATH = _NATIVE_DIR / "_threadlib.so"


class _ThreadLib:
    def __init__(self, cdll):
        c = self._lib = cdll
        c.wh_thread_paths.restype = ctypes.c_int32
        c.wh_thread_paths.argtypes = [
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]

    def thread_paths(
        self,
        num_vars,
        ploidy,
        switch_cost,
        affine_switch_cost,
        max_cluster_gap,
        row_limit,
        block_starts,
        cov_offsets,
        cov_ids,
        cov_totals,
    ):
        import numpy as np

        p32 = ctypes.POINTER(ctypes.c_int32)

        def _arr(seq):
            a = np.ascontiguousarray(
                seq if isinstance(seq, np.ndarray) else np.fromiter(seq, np.int32, count=len(seq)),
                dtype=np.int32,
            )
            if a.size == 0:
                a = np.zeros(1, np.int32)
            return a

        bs, co, ci, ct = _arr(block_starts), _arr(cov_offsets), _arr(cov_ids), _arr(cov_totals)
        out = np.empty(num_vars * ploidy, np.int32)
        n = self._lib.wh_thread_paths(
            num_vars,
            ploidy,
            switch_cost,
            affine_switch_cost,
            max_cluster_gap,
            row_limit,
            bs.ctypes.data_as(p32),
            len(block_starts),
            co.ctypes.data_as(p32),
            ci.ctypes.data_as(p32),
            ct.ctypes.data_as(p32),
            out.ctypes.data_as(p32),
        )
        if n < 0:
            return None
        return out[: n * ploidy].reshape(n, ploidy).tolist()


def _build_threadlib() -> bool:
    src = _NATIVE_DIR / "threadlib.cpp"
    if not src.exists():
        return False
    if _THREAD_SO_PATH.exists() and _THREAD_SO_PATH.stat().st_mtime >= src.stat().st_mtime:
        return True
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-ffp-contract=off",
                "-shared",
                "-fPIC",
                "-std=c++17",
                "-o",
                str(_THREAD_SO_PATH),
                str(src),
            ],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


threadlib = None
if _build_threadlib():
    try:
        threadlib = _ThreadLib(ctypes.CDLL(str(_THREAD_SO_PATH)))
    except OSError:
        threadlib = None


# --- native genotyping forward-backward (native/genolib.cpp) ----------------

_GENO_SO_PATH = _NATIVE_DIR / "_genolib.so"


class _GenoLib:
    def __init__(self, cdll):
        c = self._lib = cdll
        c.wh_genotype_run.restype = ctypes.c_int32
        c.wh_genotype_run.argtypes = [
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_longdouble),
        ]

    def run(self, C, K, T, P, n_ind, trio_count, active, allele, weight,
            slot_read, read_source, die_prev, rc, h2p, gl):
        import numpy as np

        def arr(a, ct):
            a = np.ascontiguousarray(a)
            return a, a.ctypes.data_as(ctypes.POINTER(ct))

        n_out = C * max(n_ind, 1) * 3
        out = (ctypes.c_longdouble * n_out)()
        keep = []
        ptrs = []
        for a, ct in (
            (active.astype(np.uint8), ctypes.c_uint8),
            (allele.astype(np.int8), ctypes.c_int8),
            (weight.astype(np.int32), ctypes.c_int32),
            (slot_read.astype(np.int32), ctypes.c_int32),
            (read_source.astype(np.int32), ctypes.c_int32),
            (die_prev.astype(np.uint8), ctypes.c_uint8),
            (rc.astype(np.int32), ctypes.c_int32),
            (h2p.astype(np.int32), ctypes.c_int32),
            (gl.astype(np.float64), ctypes.c_double),
        ):
            a2, p = arr(a, ct)
            keep.append(a2)
            ptrs.append(p)
        ret = self._lib.wh_genotype_run(C, K, T, P, n_ind, trio_count, *ptrs, out)
        if ret != 0:
            return None
        res = np.frombuffer(out, dtype=np.longdouble).copy()
        return res.reshape(C, max(n_ind, 1), 3)


def _build_genolib() -> bool:
    src = _NATIVE_DIR / "genolib.cpp"
    if not src.exists():
        return False
    if _GENO_SO_PATH.exists() and _GENO_SO_PATH.stat().st_mtime >= src.stat().st_mtime:
        return True
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-ffp-contract=off",
                "-shared",
                "-fPIC",
                "-std=c++17",
                "-o",
                str(_GENO_SO_PATH),
                str(src),
            ],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


genolib = None
if _build_genolib():
    try:
        genolib = _GenoLib(ctypes.CDLL(str(_GENO_SO_PATH)))
    except OSError:
        genolib = None


# --- native priority queue (native/pqext.cpp, CPython extension) ------------

_PQ_SO_PATH = _NATIVE_DIR / "_pqext.so"


def _build_pqext() -> bool:
    src = _NATIVE_DIR / "pqext.cpp"
    if not src.exists():
        return False
    if _PQ_SO_PATH.exists() and _PQ_SO_PATH.stat().st_mtime >= src.stat().st_mtime:
        return True
    import sysconfig

    include = sysconfig.get_paths()["include"]
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-shared",
                "-fPIC",
                "-std=c++17",
                f"-I{include}",
                "-o",
                str(_PQ_SO_PATH),
                str(src),
            ],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


pqext = None
if _build_pqext():
    try:
        import importlib.machinery
        import importlib.util

        _loader = importlib.machinery.ExtensionFileLoader("_pqext", str(_PQ_SO_PATH))
        _spec = importlib.util.spec_from_loader("_pqext", _loader)
        pqext = importlib.util.module_from_spec(_spec)
        _loader.exec_module(pqext)
    except (ImportError, OSError):
        pqext = None


# --- native PedMEC heuristic (native/heurlib.cpp) ---------------------------

_HEUR_SO_PATH = _NATIVE_DIR / "_heurlib.so"


class _HeurLib:
    def __init__(self, cdll):
        c = self._lib = cdll
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        c.wh_pedmec_heuristic.restype = ctypes.c_int32
        c.wh_pedmec_heuristic.argtypes = [
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            f64p, f64p, i32p, i32p, i32p, i32p, i32p, i32p, i32p, i32p, f64p,
            ctypes.POINTER(ctypes.c_uint8), i32p, i32p, i32p, i32p, i32p,
        ]

    def solve(
        self, m, n, num_samples, trios, tm_bits, row_limit, distrust,
        recomb_cost, mutation_cost, genotypes_flat,
        read_sample, read_first, read_last, var_off, var_pos, var_allele, var_qual,
    ):
        """Returns (bipart list, trans list, haps[sample][hap][col],
        mutations[sample] list of (hap, col))."""
        def i32(xs):
            return (ctypes.c_int32 * max(len(xs), 1))(*xs)

        def f64(xs):
            return (ctypes.c_double * max(len(xs), 1))(*xs)

        out_bipart = (ctypes.c_uint8 * max(m, 1))()
        out_trans = (ctypes.c_int32 * max(n, 1))()
        out_haps = (ctypes.c_int32 * max(num_samples * 2 * n, 1))()
        cap = max(2 * n * num_samples, 1)
        out_ms = (ctypes.c_int32 * cap)()
        out_mh = (ctypes.c_int32 * cap)()
        out_mp = (ctypes.c_int32 * cap)()
        trios_flat = [x for t in trios for x in t]
        nm = self._lib.wh_pedmec_heuristic(
            m, n, num_samples, len(trios), tm_bits, row_limit, int(distrust),
            f64(recomb_cost), f64(mutation_cost), i32(trios_flat), i32(genotypes_flat),
            i32(read_sample), i32(read_first), i32(read_last),
            i32(var_off), i32(var_pos), i32(var_allele), f64(var_qual),
            out_bipart, out_trans, out_haps, out_ms, out_mh, out_mp,
        )
        if nm < 0:
            return None
        bipart = [bool(out_bipart[i]) for i in range(m)]
        trans = [int(out_trans[p]) for p in range(n)]
        haps = [
            [[int(out_haps[(s * 2 + h) * n + p]) for p in range(n)] for h in range(2)]
            for s in range(num_samples)
        ]
        mutations = [[] for _ in range(num_samples)]
        for i in range(nm):
            mutations[out_ms[i]].append((int(out_mh[i]), int(out_mp[i])))
        return bipart, trans, haps, mutations


def _build_heurlib() -> bool:
    src = _NATIVE_DIR / "heurlib.cpp"
    if not src.exists():
        return False
    if _HEUR_SO_PATH.exists() and _HEUR_SO_PATH.stat().st_mtime >= src.stat().st_mtime:
        return True
    try:
        subprocess.run(
            [
                "g++", "-O3", "-ffp-contract=off", "-shared", "-fPIC",
                "-std=c++17", "-o", str(_HEUR_SO_PATH), str(src),
            ],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


heurlib = None
if _build_heurlib():
    try:
        heurlib = _HeurLib(ctypes.CDLL(str(_HEUR_SO_PATH)))
    except OSError:
        heurlib = None



# --- native CIGAR allele detection (native/cigarlib.cpp) --------------------

_CIGAR_SO_PATH = _NATIVE_DIR / "_cigarlib.so"


class _CigarLib:
    def __init__(self, cdll):
        c = self._lib = cdll
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        c.wh_iterate_cigar.restype = ctypes.c_int32
        c.wh_iterate_cigar.argtypes = [
            i64p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
            i32p, i32p, ctypes.c_int32,
            i32p, i32p, i32p, i32p, ctypes.c_int32,
        ]
        c.wh_detect_alleles.restype = ctypes.c_int32
        c.wh_detect_alleles.argtypes = [
            i64p, i32p, i32p, ctypes.c_int32,
            i32p, i32p, i32p, i32p, i32p, ctypes.c_char_p,
            ctypes.c_int32, ctypes.c_int64,
            i32p, i32p, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int8), ctypes.c_int32,
            i32p, i32p, i32p, ctypes.c_int32,
        ]
        c.wh_realign_read.restype = ctypes.c_int32
        c.wh_realign_read.argtypes = [
            i64p, ctypes.c_int32, ctypes.c_int32,
            i32p, i32p, i32p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            i32p, i32p, i32p, ctypes.c_int32,
        ]
        u64p = ctypes.POINTER(ctypes.c_uint64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        c.wh_realign_pool.restype = ctypes.c_void_p
        c.wh_realign_pool.argtypes = [
            ctypes.c_char_p, u64p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_char_p, i32p, ctypes.c_int32,
            i64p, ctypes.c_int32,
            i32p, i32p, i32p, ctypes.c_char_p, u8p,
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ]
        c.wh_realign_pool_n_hits.restype = ctypes.c_int64
        c.wh_realign_pool_n_hits.argtypes = [ctypes.c_void_p]
        c.wh_realign_pool_fetch.restype = None
        c.wh_realign_pool_fetch.argtypes = [
            ctypes.c_void_p, i32p, i32p, i32p, i64p, i64p, i32p, i64p,
            i64p, i32p, i64p, i32p, i64p, i32p, i32p, i32p,
        ]
        c.wh_realign_pool_free.restype = None
        c.wh_realign_pool_free.argtypes = [ctypes.c_void_p]

    def realign_pool(
        self, pool, rec_offsets, target_tid, mapq_threshold, keep_duplicates,
        rg_ids, var_positions, n_vars, ref_lens, alt_off, alt_seq_off,
        alt_seq, skip, reference, overhang, use_affine=False,
        default_mismatch=15, gap_start=10, gap_extend=7, n_threads=4,
    ):
        """Batched realignment over a whole BAM record pool (one contig).

        Returns a dict of numpy arrays: per-record `status` (>=0 kept with
        that many hits, -1 filtered, -2 needs the Python fallback), header
        fields, tag values, and the packed (variant, allele, quality) hit
        arrays with per-record `hit_off` boundaries.  `rg_ids` is an
        iterable of allowed read-group id strings, or None to skip sample
        filtering.
        """
        import numpy as np

        n_rec = len(rec_offsets) - 1
        rec_off = np.ascontiguousarray(rec_offsets, dtype=np.uint64)
        if rg_ids is None:
            rg_concat, rg_off_arr, n_rg = b"", self._i32([0]), 0
        else:
            ids = [s.encode() for s in rg_ids]
            offs = [0]
            for s in ids:
                offs.append(offs[-1] + len(s))
            rg_concat = b"".join(ids)
            rg_off_arr = self._i32(offs)
            n_rg = len(ids)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        h = self._lib.wh_realign_pool(
            pool, rec_off.ctypes.data_as(u64p), n_rec,
            target_tid, mapq_threshold, int(keep_duplicates),
            rg_concat, rg_off_arr, n_rg,
            var_positions, n_vars, ref_lens, alt_off, alt_seq_off,
            alt_seq, skip, reference, len(reference),
            overhang, int(use_affine), default_mismatch, gap_start,
            gap_extend, n_threads,
        )
        if not h:
            return None
        try:
            n_hits = self._lib.wh_realign_pool_n_hits(h)
            out = {
                "status": np.empty(n_rec, np.int32),
                "flag": np.empty(n_rec, np.int32),
                "mapq": np.empty(n_rec, np.int32),
                "ref_start": np.empty(n_rec, np.int64),
                "ref_end": np.empty(n_rec, np.int64),
                "hp": np.empty(n_rec, np.int32),
                "ps": np.empty(n_rec, np.int64),
                "name_off": np.empty(n_rec, np.int64),
                "name_len": np.empty(n_rec, np.int32),
                "bx_off": np.empty(n_rec, np.int64),
                "bx_len": np.empty(n_rec, np.int32),
                "hit_off": np.empty(n_rec + 1, np.int64),
                "hit_var": np.empty(max(n_hits, 1), np.int32),
                "hit_allele": np.empty(max(n_hits, 1), np.int32),
                "hit_qual": np.empty(max(n_hits, 1), np.int32),
            }
            i32p = ctypes.POINTER(ctypes.c_int32)

            def p32(name):
                return out[name].ctypes.data_as(i32p)

            def p64(name):
                return out[name].ctypes.data_as(i64p)

            self._lib.wh_realign_pool_fetch(
                h, p32("status"), p32("flag"), p32("mapq"),
                p64("ref_start"), p64("ref_end"), p32("hp"), p64("ps"),
                p64("name_off"), p32("name_len"), p64("bx_off"), p32("bx_len"),
                p64("hit_off"), p32("hit_var"), p32("hit_allele"),
                p32("hit_qual"),
            )
        finally:
            self._lib.wh_realign_pool_free(h)
        return out

    @staticmethod
    def _i32(xs):
        return (ctypes.c_int32 * max(len(xs), 1))(*xs)

    @staticmethod
    def _i64(xs):
        return (ctypes.c_int64 * max(len(xs), 1))(*xs)

    def iterate_cigar(self, var_positions, j, ref_start, cigar_ops, cigar_lens):
        cap = len(var_positions) - j if len(var_positions) > j else 0
        cap = max(cap, 1)
        oi = (ctypes.c_int32 * cap)()
        oe = (ctypes.c_int32 * cap)()
        oc = (ctypes.c_int32 * cap)()
        oq = (ctypes.c_int32 * cap)()
        n = self._lib.wh_iterate_cigar(
            var_positions, len(var_positions), j, ref_start,
            cigar_ops, cigar_lens, len(cigar_ops), oi, oe, oc, oq, cap,
        )
        if n < 0:
            return None
        return [(oi[k], oe[k], oc[k], oq[k]) for k in range(n)]

    def detect_alleles(
        self, prog_positions, prog_variant_id, prog_ref_len, allele_off,
        match_t, insert_t, delete_t, seq_off, allele_seq,
        first, ref_start, cigar_ops, cigar_lens, query_seq, query_quals,
    ):
        n_prog = len(prog_positions)
        cap = max(n_prog, 1)
        ov = (ctypes.c_int32 * cap)()
        oa = (ctypes.c_int32 * cap)()
        oq = (ctypes.c_int32 * cap)()
        if query_quals is not None:
            quals = (ctypes.c_int8 * max(len(query_quals), 1))(*query_quals)
            has_quals = 1
        else:
            quals = (ctypes.c_int8 * 1)()
            has_quals = 0
        n = self._lib.wh_detect_alleles(
            prog_positions, prog_variant_id, prog_ref_len, n_prog,
            allele_off, match_t, insert_t, delete_t, seq_off, allele_seq,
            first, ref_start, cigar_ops, cigar_lens, len(cigar_ops),
            query_seq.encode() if isinstance(query_seq, str) else query_seq,
            len(query_seq), quals, has_quals, ov, oa, oq, cap,
        )
        if n < 0:
            return None
        return [(ov[k], oa[k], oq[k]) for k in range(n)]

    def realign_read(
        self, var_positions, n_vars, j0, ref_lens, alt_off, alt_seq_off,
        alt_seq, skip, reference, ref_start, cigar_ops, cigar_lens,
        query_seq, overhang, use_affine=False, default_mismatch=15,
        gap_start=10, gap_extend=7,
    ):
        cap = max(n_vars - j0, 1)
        oi = (ctypes.c_int32 * cap)()
        oa = (ctypes.c_int32 * cap)()
        oq = (ctypes.c_int32 * cap)()
        n = self._lib.wh_realign_read(
            var_positions, n_vars, j0, ref_lens, alt_off, alt_seq_off,
            alt_seq, skip, reference, len(reference), ref_start,
            cigar_ops, cigar_lens, len(cigar_ops),
            query_seq.encode() if isinstance(query_seq, str) else query_seq,
            len(query_seq), overhang,
            int(use_affine), default_mismatch, gap_start, gap_extend,
            oi, oa, oq, cap,
        )
        return [(oi[k], oa[k], oq[k]) for k in range(n)]


def _build_cigarlib() -> bool:
    src = _NATIVE_DIR / "cigarlib.cpp"
    if not src.exists():
        return False
    if _CIGAR_SO_PATH.exists() and _CIGAR_SO_PATH.stat().st_mtime >= src.stat().st_mtime:
        return True
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                "-o", str(_CIGAR_SO_PATH), str(src),
            ],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


cigarlib = None
if _build_cigarlib():
    try:
        cigarlib = _CigarLib(ctypes.CDLL(str(_CIGAR_SO_PATH)))
    except OSError:
        cigarlib = None



# --- native HapChat solver (native/hapchatlib.cpp) --------------------------

_HAPCHAT_SO_PATH = _NATIVE_DIR / "_hapchatlib.so"


class _HapchatLib:
    def __init__(self, cdll):
        c = self._lib = cdll
        i32p = ctypes.POINTER(ctypes.c_int32)
        c.wh_hapchat_solve.restype = ctypes.c_int32
        c.wh_hapchat_solve.argtypes = [
            ctypes.c_int32, ctypes.c_int32,
            i32p, i32p, i32p, i32p,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double),
        ]

    def solve(self, n_reads, n_cols, var_off, var_pos, var_allele, var_qual):
        """Returns (hap1 list, hap2 list, optimal cost) or None."""
        def i32(xs):
            return (ctypes.c_int32 * max(len(xs), 1))(*xs)

        h1 = (ctypes.c_uint8 * max(n_cols, 1))()
        h2 = (ctypes.c_uint8 * max(n_cols, 1))()
        cost = ctypes.c_double()
        rc = self._lib.wh_hapchat_solve(
            n_reads, n_cols, i32(var_off), i32(var_pos), i32(var_allele),
            i32(var_qual), h1, h2, ctypes.byref(cost),
        )
        if rc != 0:
            return None
        return (
            [bool(h1[c]) for c in range(n_cols)],
            [bool(h2[c]) for c in range(n_cols)],
            cost.value,
        )


def _build_hapchatlib() -> bool:
    src = _NATIVE_DIR / "hapchatlib.cpp"
    if not src.exists():
        return False
    if _HAPCHAT_SO_PATH.exists() and _HAPCHAT_SO_PATH.stat().st_mtime >= src.stat().st_mtime:
        return True
    try:
        subprocess.run(
            [
                "g++", "-O3", "-ffp-contract=off", "-shared", "-fPIC",
                "-std=c++17", "-o", str(_HAPCHAT_SO_PATH), str(src),
            ],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


hapchatlib = None
if _build_hapchatlib():
    try:
        hapchatlib = _HapchatLib(ctypes.CDLL(str(_HAPCHAT_SO_PATH)))
    except OSError:
        hapchatlib = None



# --- native read-pair scoring (native/scorelib.cpp) -------------------------

_SCORE_SO_PATH = _NATIVE_DIR / "_scorelib.so"


class _ScoreLib:
    def __init__(self, cdll):
        c = self._lib = cdll
        i32p = ctypes.POINTER(ctypes.c_int32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        f32p = ctypes.POINTER(ctypes.c_float)
        c.wh_score_pairs.restype = ctypes.c_int64
        c.wh_score_pairs.argtypes = [
            ctypes.c_int32, ctypes.c_int32,
            i32p, i32p, i32p, u32p, u32p, i32p, i32p, f32p,
            ctypes.c_int32, ctypes.c_float,
            i32p, i32p, f32p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ]

    def score_pairs(
        self, n_reads, num_alleles, read_off, read_pos, read_allele,
        first_pos, last_pos, sorted_reads, lut_of_pos, luts_flat,
        min_overlap, offset, cap,
    ):
        """Returns (i_array, j_array, score_array, nan_count) or None.

        Inputs may be numpy arrays (zero-copy pointer pass) or plain
        sequences; outputs are numpy views trimmed to the pair count."""
        import numpy as np

        def as_np(xs, dt):
            a = np.ascontiguousarray(xs, dtype=dt)
            return a if a.size else np.zeros(1, dt)

        ro = as_np(read_off, np.int32)
        rp = as_np(read_pos, np.int32)
        ra = as_np(read_allele, np.int32)
        fp = as_np(first_pos, np.uint32)
        lp = as_np(last_pos, np.uint32)
        sr = as_np(sorted_reads, np.int32)
        lop = as_np(lut_of_pos, np.int32)
        lf = as_np(luts_flat, np.float32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        f32p = ctypes.POINTER(ctypes.c_float)
        oi = np.empty(max(cap, 1), np.int32)
        oj = np.empty(max(cap, 1), np.int32)
        osc = np.empty(max(cap, 1), np.float32)
        nans = ctypes.c_int64()
        n = self._lib.wh_score_pairs(
            n_reads, num_alleles,
            ro.ctypes.data_as(i32p), rp.ctypes.data_as(i32p),
            ra.ctypes.data_as(i32p), fp.ctypes.data_as(u32p),
            lp.ctypes.data_as(u32p), sr.ctypes.data_as(i32p),
            lop.ctypes.data_as(i32p), lf.ctypes.data_as(f32p),
            min_overlap, offset,
            oi.ctypes.data_as(i32p), oj.ctypes.data_as(i32p),
            osc.ctypes.data_as(f32p), cap, ctypes.byref(nans),
        )
        if n < 0:
            return None
        if n > cap:
            return ("retry", n)
        return oi[:n], oj[:n], osc[:n], nans.value


def _build_scorelib() -> bool:
    src = _NATIVE_DIR / "scorelib.cpp"
    if not src.exists():
        return False
    if _SCORE_SO_PATH.exists() and _SCORE_SO_PATH.stat().st_mtime >= src.stat().st_mtime:
        return True
    try:
        subprocess.run(
            [
                "g++", "-O3", "-ffp-contract=off", "-shared", "-fPIC",
                "-std=c++17", "-o", str(_SCORE_SO_PATH), str(src),
            ],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


scorelib = None
if _build_scorelib():
    try:
        scorelib = _ScoreLib(ctypes.CDLL(str(_SCORE_SO_PATH)))
    except OSError:
        scorelib = None



# --- native switch/flip calculator (native/switchfliplib.cpp) ---------------

_SF_SO_PATH = _NATIVE_DIR / "_switchfliplib.so"


class _SwitchFlipLib:
    def __init__(self, cdll):
        c = self._lib = cdll
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        c.wh_switchflip.restype = ctypes.c_int32
        c.wh_switchflip.argtypes = [
            ctypes.c_int32, ctypes.c_double, ctypes.c_double, ctypes.c_int32,
            i32p, i32p, f64p, f64p, i32p, i32p, i32p, i32p,
        ]

    def compute(self, ploidy, switch_cost, flip_cost, num_vars, phase0_flat, phase1_flat):
        """Returns (switches, flips, sw_col, fl_col, perm_col) or None for
        a DP dead-end (caller returns inf)."""
        def i32(xs):
            return (ctypes.c_int32 * max(len(xs), 1))(*xs)

        sw = ctypes.c_double()
        fl = ctypes.c_double()
        sw_col = (ctypes.c_int32 * max(num_vars, 1))()
        fl_off = (ctypes.c_int32 * (num_vars + 1))()
        fl_haps = (ctypes.c_int32 * max(num_vars * ploidy, 1))()
        perm_col = (ctypes.c_int32 * max(num_vars * ploidy, 1))()
        rc = self._lib.wh_switchflip(
            ploidy, switch_cost, flip_cost, num_vars,
            i32(phase0_flat), i32(phase1_flat),
            ctypes.byref(sw), ctypes.byref(fl), sw_col, fl_off, fl_haps, perm_col,
        )
        if rc != 0:
            return None
        switches_in_column = [int(sw_col[i]) for i in range(num_vars)]
        flips_in_column = [
            [int(fl_haps[k]) for k in range(fl_off[i], fl_off[i + 1])]
            for i in range(num_vars)
        ]
        perm_in_column = [
            [int(perm_col[i * ploidy + j]) for j in range(ploidy)] for i in range(num_vars)
        ]
        return sw.value, fl.value, switches_in_column, flips_in_column, perm_in_column


def _build_switchfliplib() -> bool:
    src = _NATIVE_DIR / "switchfliplib.cpp"
    if not src.exists():
        return False
    if _SF_SO_PATH.exists() and _SF_SO_PATH.stat().st_mtime >= src.stat().st_mtime:
        return True
    try:
        subprocess.run(
            [
                "g++", "-O3", "-ffp-contract=off", "-shared", "-fPIC",
                "-std=c++17", "-o", str(_SF_SO_PATH), str(src),
            ],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


switchfliplib = None
if _build_switchfliplib():
    try:
        switchfliplib = _SwitchFlipLib(ctypes.CDLL(str(_SF_SO_PATH)))
    except OSError:
        switchfliplib = None


# --- native exact wMEC/PedMEC DP (native/wmeclib.cpp) -----------------------

_WMEC_SO_PATH = _NATIVE_DIR / "_wmeclib.so"


class _WmecLib:
    def __init__(self, cdll):
        c = self._lib = cdll
        c.wh_wmec_solve.restype = ctypes.c_int32
        c.wh_wmec_solve.argtypes = [
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]

    def solve(self, C, K, T, P, active, die_prev, wdiff, wbase, acost, rank, rc):
        import numpy as np

        keep = []
        ptrs = []
        for a, ct in (
            (active.astype(np.uint8), ctypes.c_uint8),
            (die_prev.astype(np.uint8), ctypes.c_uint8),
            (wdiff.astype(np.int32), ctypes.c_int32),
            (wbase.astype(np.int32), ctypes.c_int32),
            (acost.astype(np.int32), ctypes.c_int32),
            (rank.astype(np.int8), ctypes.c_int8),
            (rc.astype(np.int32), ctypes.c_int32),
        ):
            a = np.ascontiguousarray(a)
            keep.append(a)
            ptrs.append(a.ctypes.data_as(ctypes.POINTER(ct)))
        out_cost = (ctypes.c_int64 * 1)()
        out_index = (ctypes.c_int64 * C)()
        out_trans = (ctypes.c_int64 * C)()
        rcode = self._lib.wh_wmec_solve(
            C, K, T, P, *ptrs, out_cost, out_index, out_trans
        )
        if rcode != 0:
            return None
        return (
            int(out_cost[0]),
            np.frombuffer(out_index, dtype=np.int64).copy(),
            np.frombuffer(out_trans, dtype=np.int64).copy(),
        )


def _build_wmeclib() -> bool:
    src = _NATIVE_DIR / "wmeclib.cpp"
    if not src.exists():
        return False
    if _WMEC_SO_PATH.exists() and _WMEC_SO_PATH.stat().st_mtime >= src.stat().st_mtime:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", str(_WMEC_SO_PATH), str(src)],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


wmeclib = None
if _build_wmeclib():
    try:
        wmeclib = _WmecLib(ctypes.CDLL(str(_WMEC_SO_PATH)))
    except OSError:
        wmeclib = None


# --- native read selection (native/readselectlib.cpp) -----------------------

_READSELECT_SO_PATH = _NATIVE_DIR / "_readselectlib.so"


class _ReadSelectLib:
    def __init__(self, cdll):
        c = self._lib = cdll
        i32p = ctypes.POINTER(ctypes.c_int32)
        c.wh_readselection.restype = ctypes.c_int32
        c.wh_readselection.argtypes = [
            ctypes.c_int32, ctypes.c_int32,
            i32p, i32p, i32p,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
        ]

    def readselection(self, read_off, vidx, quals, n_positions, max_cov, bridging):
        """Run the full slice/bridging selection; returns the selected-read
        boolean mask as a numpy array.  Inputs are int32 numpy arrays:
        CSR offsets per read into the (position index, quality) columns."""
        import numpy as np

        n_reads = len(read_off) - 1
        out = np.zeros(max(n_reads, 1), dtype=np.uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        self._lib.wh_readselection(
            n_reads, n_positions,
            read_off.ctypes.data_as(i32p),
            vidx.ctypes.data_as(i32p),
            quals.ctypes.data_as(i32p),
            max_cov, int(bridging),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out[:n_reads]


def _build_readselectlib() -> bool:
    src = _NATIVE_DIR / "readselectlib.cpp"
    if not src.exists():
        return False
    if (
        _READSELECT_SO_PATH.exists()
        and _READSELECT_SO_PATH.stat().st_mtime >= src.stat().st_mtime
    ):
        return True
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                "-o", str(_READSELECT_SO_PATH), str(src),
            ],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


readselectlib = None
if _build_readselectlib():
    try:
        readselectlib = _ReadSelectLib(ctypes.CDLL(str(_READSELECT_SO_PATH)))
    except OSError:
        readselectlib = None


# WHATSHAP_TPU_NO_NATIVE=1 disables every native engine (pure-Python
# fallbacks take over) — a debugging/verification kill switch.
if os.environ.get("WHATSHAP_TPU_NO_NATIVE"):
    lib = bamlib = clusterlib = threadlib = genolib = pqext = heurlib = cigarlib = hapchatlib = scorelib = switchfliplib = wmeclib = readselectlib = None
