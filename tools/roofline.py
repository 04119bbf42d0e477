"""
Roofline / MFU accounting for the wMEC column-scan kernels.

The DP is not a matmul workload: the Pallas kernel computes the per-column
emission costs with VPU multiply-accumulates over the (rows, 128-lane)
bipartition plane (one on-demand bit mask per slot — see
ops/wmec_pallas.py), folds dying slots with predicated butterflies, and
runs the transmission min-plus with scalar-broadcast compares.  Its
ceilings are therefore the VPU issue rate and HBM write bandwidth for the
backtrace tables — the MXU is idle by design (a popcount matmul
formulation was measured slower: int32-exact matmuls need the 3-pass
HIGHEST precision scheme, tripling MXU work for a kernel that is not
FLOP-bound anyway).

Ops model per column per block (counted from the kernel loop):
  emission   2*K*(T*P*2 + 1) * S   fused mul-adds (f32)
  assignment S*T*(3*P + nA*(P/2 + 2))  int adds/mins
  trans      3*S*T^2 (T > 1)       adds + compare/select
  key        ~5*S                  inverse-Gray xor-shifts
HBM model per column per block:
  backtrace  4*S*T * (2 if T > 1 else 1) bytes written
  inputs     ~ (K*(T*P*2) + T*P*2 + K + T*2^P + 2) * 4 bytes read

Chip peaks: bf16 MXU numbers are published; the VPU peak is derived as
  n_alus(4) * 8 sublanes * 128 lanes * clock
with the clock inferred from the published bf16 peak and MXU count — an
estimate, flagged as such in the output.
"""

from typing import Optional

#: device_kind substring -> (clock Hz, MXU bf16 FLOP/s, HBM bytes/s)
#: clocks derived from published bf16 peaks (see module docstring)
CHIPS = {
    "v6": (1.75e9, 9.18e14, 1.64e12),  # Trillium: 918 bf16 TFLOPs, 1.64 TB/s
    "v5p": (1.75e9, 4.59e14, 2.765e12),
    "v5": (1.5e9, 1.97e14, 8.19e11),  # v5e: 197 bf16 TFLOPs, 819 GB/s
    "v4": (1.05e9, 2.75e14, 1.228e12),
}
VPU_ALUS = 4  # independent VPU ALUs per (8, 128) vector unit


def chip_peaks(device_kind: str) -> Optional[dict]:
    kind = device_kind.lower()
    for key, (clock, mxu, hbm) in CHIPS.items():
        if key in kind:
            return {
                "device_kind": device_kind,
                "clock_hz": clock,
                "mxu_bf16_flops": mxu,
                "hbm_bytes_per_s": hbm,
                "vpu_ops_per_s": VPU_ALUS * 8 * 128 * clock,
            }
    return None


def wmec_column_ops(K: int, T: int, P: int) -> int:
    """VPU ops per column per block (forward scan with table emission)."""
    S = 1 << K
    TP2 = T * P * 2
    nA = 1 << P
    emission = 2 * K * (TP2 + 1) * S
    assignment = S * T * (3 * P + nA * (P // 2 + 2))
    trans = 3 * S * T * T if T > 1 else S
    key = 5 * S
    return emission + assignment + trans + key


def wmec_column_bytes(K: int, T: int, P: int, emit_tables: bool = True) -> int:
    """HBM bytes per column per block."""
    S = 1 << K
    tables = 4 * S * T * (2 if T > 1 else 1) if emit_tables else 0
    inputs = 4 * (K * T * P * 2 + T * P * 2 + K + T * (1 << P) + 2)
    return tables + inputs


def wmec_roofline(
    K: int,
    T: int,
    P: int,
    n_blocks: int,
    n_cols: int,
    seconds: float,
    device_kind: str,
    emit_tables: bool = True,
) -> dict:
    """Achieved throughput vs the VPU and HBM ceilings for one batched
    solve.  `bound` names the binding ceiling under this model; the solve
    also pays a device-backtrace pass (~C more light columns) and the
    final gather, so utilization here is an upper bound on headroom, not a
    precision claim."""
    total_cols = n_blocks * n_cols
    ops = wmec_column_ops(K, T, P) * total_cols
    byts = wmec_column_bytes(K, T, P, emit_tables) * total_cols
    out = {
        "model_vpu_ops": ops,
        "model_hbm_bytes": byts,
        "achieved_gops": round(ops / seconds / 1e9, 1),
        "achieved_gbps": round(byts / seconds / 1e9, 2),
    }
    peaks = chip_peaks(device_kind)
    if peaks is not None:
        vpu_u = ops / seconds / peaks["vpu_ops_per_s"]
        hbm_u = byts / seconds / peaks["hbm_bytes_per_s"]
        # the practical ceiling for this op mix is ONE retired (8, 128)
        # vector op per cycle: an op-count ablation (the m-only seam kernel
        # at ~0.76x the ops runs ~1.5x faster — throughput tracks 1/ops)
        # shows the kernel is issue-bound, and its achieved rate sits at
        # ~100% of 8*128*clock.  The 4-ALU figure is the theoretical
        # multi-issue peak this elementwise int/f32 mix cannot dual-issue
        # into; doc/tpu.md "Roofline" carries the measurement.
        issue_peak = 8 * 128 * peaks["clock_hz"]
        out.update(
            {
                "device_kind": peaks["device_kind"],
                "vpu_utilization": round(vpu_u, 3),
                "vpu_issue_utilization": round(ops / seconds / issue_peak, 3),
                "hbm_utilization": round(hbm_u, 3),
                "bound": "vpu" if vpu_u >= hbm_u else "hbm",
                "note": (
                    "vpu_utilization is against the theoretical "
                    f"{VPU_ALUS}-ALU peak; vpu_issue_utilization is against "
                    "the single-issue 8x128/cycle ceiling, the measured "
                    "structural limit for this op mix (doc/tpu.md Roofline); "
                    "HBM peak is the published number"
                ),
            }
        )
    return out
