"""Time member-lane batched pattern-sharing solves vs sequential.

G systems sharing one sparsity pattern (values perturbed per member)
ride the vector lanes of ONE fused dispatch
(backslash_fused.factorize_solve_tpu_fused_many) — compare against G
sequential single-matrix fused solves. ONE matrix family per process
(tunnel rule).

Usage: python tools/time_batch.py <name> [G] [seq|noseq]
  name: corpus stem, e.g. grid16, tri1000, uni10k
  G:    family size (default 8)
"""

import copy
import os
import sys
import time

try:  # prefer the installed package (pip install -e .)
    import slip_lu_tpu  # noqa: F401
except ImportError:  # bare checkout: fall back to the repo root
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

name = sys.argv[1] if len(sys.argv) > 1 else "grid16"
G = int(sys.argv[2]) if len(sys.argv) > 2 else 8
do_seq = "noseq" not in sys.argv[3:]

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from slip_lu_tpu.analyze import analyze
from slip_lu_tpu.backslash import backslash
from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.io import read_dense, read_triplet
from slip_lu_tpu.matrix import Kind, Type
from slip_lu_tpu.options import Options
from slip_lu_tpu.tpu.backslash_fused import (factorize_solve_tpu_fused,
                                             factorize_solve_tpu_fused_many)

A0 = matrix_copy(read_triplet(f"data/ExampleMats/{name}_mat.txt"),
                 Kind.CSC, Type.MPZ)
b0 = read_dense(f"data/ExampleMats/{name}_v.txt")
n = A0.n
nnz = int(A0.p[n])
print(f"{name}: n={n} nnz={nnz} G={G}", flush=True)

# family: member 0 is the original; members g>0 perturb a few values
# (pattern unchanged, nonsingularity preserved w.h.p. -- the driver
# replans/falls back per member if a pivot cancels)
rng = np.random.default_rng(20260820)
As, bs = [A0], [b0]
for g in range(1, G):
    Ag = copy.deepcopy(A0)
    for _ in range(4):
        j = int(rng.integers(0, nnz))
        d = int(rng.integers(1, 3))
        if Ag.x[j] + d == 0:     # never turn a stored nonzero into an
            d += 1               # explicit zero (pattern must hold)
        Ag.x[j] = Ag.x[j] + d
    As.append(Ag)
    bs.append(b0)

opts = Options()
ana = analyze(A0, opts)

# host-oracle parity (member 0 and one perturbed member)
x_ref0 = backslash(As[0], bs[0], Type.MPQ, opts)
x_refl = backslash(As[-1], bs[-1], Type.MPQ, Options())

t0 = time.perf_counter()
xs = factorize_solve_tpu_fused_many(As, ana, bs, opts)
cold = time.perf_counter() - t0
for i in range(n):
    assert xs[0].x[i, 0] == x_ref0.x[i, 0], i
    assert xs[-1].x[i, 0] == x_refl.x[i, 0], i
print("batched: parity OK", flush=True)

REPS = int(os.environ.get("REPS", "3"))
t0 = time.perf_counter()
for _ in range(REPS):
    xs = factorize_solve_tpu_fused_many(As, ana, bs, opts)
warm = (time.perf_counter() - t0) / REPS
print(f"batched x{G}: cold {cold:.2f} s, warm {warm*1e3:.1f} ms total "
      f"({warm*1e3/G:.1f} ms/member, {G*nnz/warm:,.0f} nnz/s)", flush=True)

if do_seq:
    # sequential baseline: G single-matrix fused solves. Analyses are
    # built ONCE per member (fresh, so pinned-pivot state from the
    # family run can't leak) and reused across reps — both paths are
    # then timed warm against cached schedules/streams/widths, so the
    # comparison isolates member-lane batching from cache reuse.
    anas = [analyze(As[g], opts) for g in range(G)]
    xs_seq = [factorize_solve_tpu_fused(As[g], anas[g], bs[g], opts)
              for g in range(G)]
    t0 = time.perf_counter()
    for _ in range(REPS):
        for g in range(G):
            xs_seq[g] = factorize_solve_tpu_fused(
                As[g], anas[g], bs[g], opts)
    seq = (time.perf_counter() - t0) / REPS
    for i in range(n):
        assert xs_seq[0].x[i, 0] == x_ref0.x[i, 0], i
        assert xs_seq[-1].x[i, 0] == x_refl.x[i, 0], i
    print(f"sequential x{G}: warm {seq*1e3:.1f} ms total "
          f"({seq*1e3/G:.1f} ms/member) -> batched speedup "
          f"{seq/warm:.2f}x", flush=True)
