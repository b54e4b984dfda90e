"""Time the fused Pallas sparse path vs padded-sparse vs host oracle on
one matrix, with per-phase breakdown. ONE matrix per process (tunnel).

Usage: python tools/time_fused.py <name> [backends...]
  name: corpus stem, e.g. grid16, grid24, tri1000, uni10k
  backends: any of host, sparse, fused  (default: host fused)
"""

import os
import sys
import time

try:  # prefer the installed package (pip install -e .)
    import slip_lu_tpu  # noqa: F401
except ImportError:  # bare checkout: fall back to the repo root
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

name = sys.argv[1] if len(sys.argv) > 1 else "grid16"
which = [a for a in sys.argv[2:] if not a.startswith("--")] \
    or ["host", "fused"]
# --order=none|colamd|amd (banded corpus members like uni1m are BUILT
# for the natural order: every pivot is exactly 1 there, so widths and
# fill stay minimal — see tools/gen_large_mats.py)
_order = next((a.split("=", 1)[1] for a in sys.argv[2:]
               if a.startswith("--order=")), "colamd")

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from slip_lu_tpu.analyze import analyze
from slip_lu_tpu.backslash import backslash
from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.io import read_dense, read_triplet
from slip_lu_tpu.matrix import Kind, Type
from slip_lu_tpu.options import Options
from slip_lu_tpu.stats import last_stats

A = matrix_copy(read_triplet(f"data/ExampleMats/{name}_mat.txt"),
                Kind.CSC, Type.MPZ)
b = read_dense(f"data/ExampleMats/{name}_v.txt")
nnz = int(A.p[A.n])
print(f"{name}: n={A.n} nnz={nnz}", flush=True)
from slip_lu_tpu.options import Ordering

opts = Options(order={"none": Ordering.NONE, "colamd": Ordering.COLAMD,
                      "amd": Ordering.AMD}[_order])
ana = analyze(A, opts)

x_ref = None
REPS = int(os.environ.get("REPS", "3"))

if "host" in which:
    t0 = time.perf_counter()
    x_ref = backslash(A, b, Type.MPQ, opts)
    host_s = time.perf_counter() - t0
    print(f"host oracle: {host_s*1e3:.1f} ms  ({nnz/host_s:,.0f} nnz/s)",
          flush=True)

for bk in which:
    if bk == "host":
        continue
    if bk == "fused":
        from slip_lu_tpu.tpu.backslash_fused import factorize_solve_tpu_fused
        run = factorize_solve_tpu_fused
    elif bk == "sparse":
        from slip_lu_tpu.tpu.backslash_sparse import factorize_solve_tpu_sparse
        run = factorize_solve_tpu_sparse
    else:
        raise SystemExit(f"unknown backend {bk}")
    t0 = time.perf_counter()
    x = run(A, ana, b, opts)      # cold: schedule + compile + run
    cold = time.perf_counter() - t0
    if x_ref is not None:
        for i in range(A.n):
            assert x.x[i, 0] == x_ref.x[i, 0], i
        print(f"{bk}: parity OK", flush=True)
    else:
        # no host-oracle run (too slow at this scale): verify with the
        # exact rational check A @ x == b instead (the reference's own
        # oracle, slip_check_solution.c) — O(nnz) rational work
        from slip_lu_tpu.solve import check_solution
        check_solution(A, x, b)
        print(f"{bk}: exact rational check OK", flush=True)
    t0 = time.perf_counter()
    for _ in range(REPS):
        x = run(A, ana, b, opts)
    warm = (time.perf_counter() - t0) / REPS
    print(f"{bk}: cold {cold:.2f} s, warm {warm*1e3:.1f} ms "
          f"({nnz/warm:,.0f} nnz/s)", flush=True)
    print(last_stats().summary(), flush=True)
