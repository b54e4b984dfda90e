"""Per-kernel roofline report for the fused exact-solve path.

Counts the EXACT arithmetic the event streams execute (from the same
chunk/count arrays the kernels run), measures warm device time on the
chip, and compares against two ceilings:

  * VPU speed of light — limb-MACs/s. One 16x16-bit limb MAC in the
    byte-plane convolution scheme (ops/pallas_limbs.mul_mod) costs ~4
    int32 vector ops (2 mul + 2 add across two accumulator planes);
    v5e's VPU retires 8x128 int32 lanes/cycle at ~0.94 GHz
    => SOL ~= 8*128*0.94e9/4 = 2.4e11 limb-MAC/s.
  * HBM bandwidth — bytes DMA'd by the value-table gathers/scatters
    (HBM mode only) vs ~800 GB/s.

plus the fixed ~45 ms/solve tunnel dispatch+fetch floor (ROADMAP).

Usage: python tools/roofline.py [names...]   (default: grid16 uni10k)
Writes ROOFLINE.md at the repo root. ONE matrix per process would be
stricter (tunnel), but warm same-process reps are what users see.
"""

import os
import sys
import time

try:  # prefer the installed package (pip install -e .)
    import slip_lu_tpu  # noqa: F401
except ImportError:  # bare checkout: fall back to the repo root
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

VPU_MACS = 8 * 128 * 0.94e9 / 4      # limb-MAC/s speed of light (v5e)
HBM_BW = 800e9                        # bytes/s
SYNC_FLOOR = 0.045                    # s per solve (tunnel dispatch+fetch)


def stream_macs(es, W8, Ws8, WN, WNS, WI8, segments=None,
                ssegments=None):
    """Exact limb-MAC counts per stream from the chunk count arrays.

    segments/ssegments: the adaptive-width plans ((lo, hi, W8s), ...)
    actually run (backslash_fused caches them) — chunks are costed at
    their own segment's widths."""
    from slip_lu_tpu.tpu.factor_fused import _r8
    f, s = es.factor, es.solve
    if segments is None:
        segments = ((0, f.nchunks, W8),)
    f_macs = 0
    fev = 0
    for si, (lo, hi, W8s) in enumerate(segments):
        # verified short division (factor_fused): quotient product at
        # WQ = _r8(W8s+2), verify product WQ x W8s; GT lifts at WQ
        WQ = _r8(W8s + 2)
        div = WQ * WQ + WQ * W8s
        ev = int(f.counts[lo:hi, 1].sum() + f.counts[lo:hi, 2].sum())
        heads = int(f.counts[lo:hi, 0].sum())
        hchunks = int((f.counts[lo:hi, 0] > 0).sum())
        # per factor event: t*m (W8xW8) + a*b (W8xW8) + short div;
        # pass 1 has no a*b (shortcut) — cost it at the a*b-free rate
        ev1 = int(f.counts[lo:hi, 1].sum())
        f_macs += ev * (W8s * W8s + div) + (ev - ev1) * W8s * W8s
        # per head: fix (W8xW8 + short div); per head-chunk: batched
        # lift, doubling rungs sum ~ (8/3)*WQ^2 per lane
        f_macs += heads * (W8s * W8s + div)
        f_macs += hchunks * 8 * (8 * WQ * WQ // 3)
        fev += ev
    s_macs = 0
    sev = 0
    for (lo, hi, Ws_s) in (ssegments or ((0, s.nchunks, Ws8),)):
        WQs = _r8(Ws_s + 2)
        divs = WQs * WQs + WQs * W8
        ev = int(s.counts[lo:hi, 1].sum() + s.counts[lo:hi, 2].sum())
        ev1 = int(s.counts[lo:hi, 1].sum())
        # per solve event: t*m (Ws8xW8) + a*b (W8xWs8) + short div;
        # pass 1 (fixes, det scale, pivot divisions) has no a*b
        s_macs += ev * (W8 * Ws_s + divs) + (ev - ev1) * W8 * Ws_s
        sev += ev
    return f_macs, s_macs, fev, sev


def main():
    names = sys.argv[1:] or ["grid16", "uni10k"]
    from slip_lu_tpu.analyze import analyze
    from slip_lu_tpu.convert import matrix_copy
    from slip_lu_tpu.io import read_dense, read_triplet
    from slip_lu_tpu.matrix import Kind, Type
    from slip_lu_tpu.options import Options
    from slip_lu_tpu.stats import last_stats
    from slip_lu_tpu.tpu.backslash_fused import factorize_solve_tpu_fused
    from slip_lu_tpu.tpu.factor_fused import _r8, val_table_in_hbm

    from slip_lu_tpu.options import Ordering
    rows = []
    for name in names:
        # "stem:order" selects the ordering (e.g. uni100k:none — the
        # banded 100K+ members are built for the natural order)
        stem, _, osel = name.partition(":")
        order = {"": Ordering.COLAMD, "colamd": Ordering.COLAMD,
                 "none": Ordering.NONE, "amd": Ordering.AMD,
                 "auto": Ordering.AUTO}[osel]
        A = matrix_copy(read_triplet(f"data/ExampleMats/{stem}_mat.txt"),
                        Kind.CSC, Type.MPZ)
        b = read_dense(f"data/ExampleMats/{stem}_v.txt")
        nnz = int(A.p[A.n])
        opts = Options(order=order)
        ana = analyze(A, opts)
        factorize_solve_tpu_fused(A, ana, b, opts)   # converge widths
        reps = int(os.environ.get("REPS", "3"))
        t0 = time.perf_counter()
        for _ in range(reps):
            factorize_solve_tpu_fused(A, ana, b, opts)
        warm = (time.perf_counter() - t0) / reps
        st = last_stats()
        dev_s = st.phases.get("device", warm)
        W8, Ws8 = st.W, st.Ws
        WN = _r8(2 * W8 + 2)
        WNS = _r8(W8 + Ws8 + 2)
        WI8 = max(WN, WNS)
        _, (sched, r, es, _, _) = ana.fused_cache
        seg = getattr(ana, "fused_seg_cache", None)
        segments = seg[2] if seg is not None else None
        ssegments = seg[4] if seg is not None and len(seg) > 4 else None
        fm, sm, fev, sev = stream_macs(es, W8, Ws8, WN, WNS, WI8,
                                       segments, ssegments)
        macs = fm + sm
        E8 = _r8(es.nnz + 1)
        hbm = val_table_in_hbm(E8, W8)
        KR = (W8 + 127) // 128
        dma_bytes = (4 * (fev + sev) * KR * 512) if hbm else 0
        sol_t = max(macs / VPU_MACS, dma_bytes / HBM_BW)
        util = sol_t / max(dev_s, 1e-9)
        rows.append((name, A.n, nnz, W8, Ws8, fev + sev, macs, hbm,
                     dma_bytes, warm, dev_s, sol_t, util))
        print(f"{name}: warm {warm*1e3:.1f} ms (device {dev_s*1e3:.1f}), "
              f"{macs/1e9:.2f} G limb-MACs, SOL {sol_t*1e3:.2f} ms, "
              f"{100*util:.1f}% of speed-of-light", flush=True)

    with open("ROOFLINE.md", "w") as f:
        f.write("# Roofline — fused exact-solve path (TPU v5e, axon tunnel)\n\n")
        f.write(f"Ceilings: VPU {VPU_MACS/1e12:.2f} T limb-MAC/s "
                f"(byte-plane conv ~4 int32 ops/MAC), HBM {HBM_BW/1e9:.0f} "
                f"GB/s, tunnel sync floor {SYNC_FLOOR*1e3:.0f} ms/solve.\n\n")
        f.write("| matrix | n | nnz | W8 | Ws8 | events | limb-MACs | "
                "val table | DMA bytes | warm (ms) | device (ms) | "
                "SoL (ms) | % of SoL |\n|---|---|---|---|---|---|---|---|"
                "---|---|---|---|---|\n")
        for (name, n, nnz, W8, Ws8, ev, macs, hbm, dmab, warm, dev_s,
             sol_t, util) in rows:
            f.write(f"| {name} | {n} | {nnz} | {W8} | {Ws8} | {ev} | "
                    f"{macs/1e9:.2f}G | {'HBM' if hbm else 'VMEM'} | "
                    f"{dmab/1e6:.1f}M | {warm*1e3:.1f} | {dev_s*1e3:.1f} | "
                    f"{sol_t*1e3:.2f} | {100*util:.1f}% |\n")
        f.write(
            "\nReading: `% of SoL` = analytic minimum kernel time over "
            "measured device time. The gap is per-chunk fixed cost "
            "(gather/scatter row moves, carry-normalize log passes, "
            "sequential pivot heads) plus the dispatch floor; small "
            "matrices are sync-bound, wide-W matrices are MAC-bound.\n")
    print("wrote ROOFLINE.md")


if __name__ == "__main__":
    main()
