"""Split-timing probe: factor program vs solve program of the fused path.

Builds the cached schedule/stream once, then times factor_fused alone and
solve_fused alone (warm), so per-phase work (heads vs batched passes) can
be attributed before optimizing. ONE matrix per process (tunnel rule).

Usage: python tools/probe_split.py <name> [reps]
"""

import os
import sys
import time

try:  # prefer the installed package (pip install -e .)
    import slip_lu_tpu  # noqa: F401
except ImportError:  # bare checkout: fall back to the repo root
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

name = sys.argv[1] if len(sys.argv) > 1 else "tri1000"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax
import jax.numpy as jnp
import numpy as np

from slip_lu_tpu.analyze import analyze
from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.io import read_dense, read_triplet
from slip_lu_tpu.matrix import Kind, Type
from slip_lu_tpu.options import Options
from slip_lu_tpu.tpu.backslash_fused import factorize_solve_tpu_fused
from slip_lu_tpu.tpu import factor_fused as ff

A = matrix_copy(read_triplet(f"data/ExampleMats/{name}_mat.txt"),
                Kind.CSC, Type.MPZ)
b = read_dense(f"data/ExampleMats/{name}_v.txt")
nnz = int(A.p[A.n])
opts = Options()
ana = analyze(A, opts)

# one full solve to populate every cache (schedule, streams, widths, val)
t0 = time.perf_counter()
x = factorize_solve_tpu_fused(A, ana, b, opts)
cold = time.perf_counter() - t0
t0 = time.perf_counter()
for _ in range(REPS):
    x = factorize_solve_tpu_fused(A, ana, b, opts)
full = (time.perf_counter() - t0) / REPS
print(f"{name}: n={A.n} nnz={nnz} cold {cold:.1f}s full warm "
      f"{full*1e3:.1f} ms", flush=True)

key, (sched, r, es, dev_streams, avals) = ana.fused_cache
(fhm, fev1, fev2, scnt, sev1, sev2) = dev_streams
W, Ws = ana.fused_width_cache
W8 = ff._r8(W)
Ws8 = ff._r8(max(Ws, W + 1))
WN = ff._r8(2 * W8 + 2)
WNS = ff._r8(W8 + Ws8 + 2)
WI8 = ff._r8(max(W8, Ws8) + 2)
E = es.nnz
E8 = ff._r8(E + 1)
_, segments, _, ssegments = ana.fused_seg_cache[1:]
print(f"W8={W8} Ws8={Ws8} factor chunks={fhm.shape[0]} "
      f"solve chunks={scnt.shape[0]} segs={segments} ssegs={ssegments}",
      flush=True)

H = 8
w0 = segments[0][2]
hbm0 = ff.val_table_in_hbm(E8, w0)
WV = ff._r128(w0) if hbm0 else w0
val_in = np.zeros((E8, WV), dtype=np.int32)
val_in[np.asarray(es.init_pos), :w0] = ff.ints_to_tc_rows(avals, w0)
if hbm0:
    val_in = val_in.reshape(E8 * (WV // 128), 128)
val_dev = jnp.asarray(val_in)


def run_factor():
    val_d = val_dev
    tables = None
    prev = None
    outs = None
    from slip_lu_tpu.tpu.relift import relift_gt, widen_tc, widen_val
    for (lo, hi, W8s) in segments:
        WNs = ff._r8(2 * W8s + 2)
        WQf = ff._r8(W8s + 2)
        WIs = max(WQf, WI8) if len(segments) == 1 else WQf
        hbms = ff.val_table_in_hbm(E8, W8s)
        if prev is not None:
            pW8, pWI, phbm = prev
            val_d = widen_val(val_d, E8, pW8, W8s, phbm, hbms)
            SMT_d = widen_tc(outs[1], pW8, W8s)
            GT_d = relift_gt(SMT_d, outs[2], outs[3], W8s, pWI, WIs)
            tables = (SMT_d, GT_d, outs[3])
        outs = ff.factor_fused(
            A.n, E, W8s, WNs, WIs, H, 32, 128,
            fhm[lo:hi], fev1[lo:hi], fev2[lo:hi], val_d, hbm=hbms,
            tables=tables)
        val_d = outs[0]
        prev = (W8s, WIs, hbms)
    return outs, prev


outs, prev = run_factor()
jax.block_until_ready(outs)
t0 = time.perf_counter()
for _ in range(REPS):
    o2, _ = run_factor()
    jax.block_until_ready(o2)
fact = (time.perf_counter() - t0) / REPS
print(f"factor program alone: {fact*1e3:.1f} ms", flush=True)

val_f, SMT_f, GT_f, TZ_f, _ = outs
hbm = prev[2]
WIf = prev[1]
from slip_lu_tpu.tpu.relift import relift_gt

WQs = min(WI8, ff._r8(Ws8 + 2))
if WIf < WQs:
    GT_f = relift_gt(SMT_f, GT_f, TZ_f, W8, WIf, WQs)
    WIf = WQs
n = A.n
X8 = ff._r8(n + 1)
bz = matrix_copy(b, Kind.DENSE, Type.MPZ, opts)
bcol = [int(bz.x[int(r[k]), 0]) for k in range(n)]
X_in = np.zeros((X8, Ws8), dtype=np.int32)
X_in[:n] = ff.ints_to_tc_rows(bcol, Ws8)
X_dev = jnp.asarray(X_in)
sseg = tuple((lo, hi, Ws8) for lo, hi, _ in [[0, scnt.shape[0], Ws8]])


def run_solve():
    X_d = X_dev
    outs = None
    for (lo, hi, Ws_s) in sseg:
        WNS_s = ff._r8(W8 + Ws_s + 2)
        outs = ff.solve_fused(
            n, E, W8, Ws_s, WNS_s, WIf, 32, 128,
            scnt[lo:hi], sev1[lo:hi], sev2[lo:hi],
            val_f, SMT_f, GT_f, TZ_f, X_d, hbm=hbm)
        X_d = outs[0]
    return outs


o = run_solve()
jax.block_until_ready(o)
t0 = time.perf_counter()
for _ in range(REPS):
    o = run_solve()
    jax.block_until_ready(o)
slv = (time.perf_counter() - t0) / REPS
print(f"solve program alone (1 rhs, full width): {slv*1e3:.1f} ms",
      flush=True)
