"""Hardware smoke + timing for the SHARDED fused program on the real chip.

The sharded superstep program (parallel/factor_fused_shard.py) is
normally exercised on the virtual CPU mesh (interpret-mode Pallas,
tests/conftest.py). This tool compiles and runs it on the real TPU at
p=1 — psums are no-ops there, so it measures the hardware cost of the
superstep STRUCTURE itself (2 pallas dispatches per chunk inside the
scan, vs the single-chip mega-kernel's 1 grid step) and proves the
kernels are Mosaic-compile-clean (dynamic-index rules differ from the
interpreter; this caught the owner-mask VMEM scalar-read rejection).

Usage:  python tools/shard_hw_smoke.py [matrix_stem] [--hbm]
        (default tiny random system; stems resolve under
        data/ExampleMats/<stem>_mat.txt / _v.txt)
"""

import sys
import time
from fractions import Fraction
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

import slip_lu_tpu as slip  # noqa: E402
from slip_lu_tpu.analyze import analyze  # noqa: E402
from slip_lu_tpu.convert import matrix_copy  # noqa: E402
from slip_lu_tpu.io import read_dense, read_triplet  # noqa: E402
from slip_lu_tpu.matrix import Kind, SlipMatrix, Type  # noqa: E402
from slip_lu_tpu.parallel import make_mesh  # noqa: E402
from slip_lu_tpu.parallel.driver_fused import (  # noqa: E402
    factorize_solve_fused_sharded)
from slip_lu_tpu.solve import check_solution  # noqa: E402
from slip_lu_tpu.stats import last_stats  # noqa: E402


def _rand_sys(n=18, seed=7):
    rng = np.random.default_rng(seed)
    dense = np.zeros((n, n), dtype=object)
    for i in range(n):
        dense[i, i] = int(rng.integers(1, 9))
        for _ in range(4):
            j = int(rng.integers(0, n))
            dense[i, j] = int(rng.integers(-9, 9))
    A = matrix_copy(SlipMatrix.from_dense(dense, Type.MPZ),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-9, 10))] for _ in range(n)],
                 dtype=object), Type.MPZ)
    return A, b


def main():
    args = [a for a in sys.argv[1:] if a != "--hbm"]
    if "--hbm" in sys.argv[1:]:
        from slip_lu_tpu.tpu import factor_fused as ff
        ff.val_table_in_hbm = lambda E8, W8: True
        print("forcing HBM value-table layout")
    if args:
        stem = args[0]
        root = Path(__file__).resolve().parent.parent / "data/ExampleMats"
        A = matrix_copy(read_triplet(str(root / f"{stem}_mat.txt")),
                        Kind.CSC, Type.MPZ)
        b = read_dense(str(root / f"{stem}_v.txt"))
    else:
        A, b = _rand_sys()
    print(f"device: {jax.devices()[0].platform}, "
          f"n={A.n}, nnz={int(A.p[A.n])}")
    mesh = make_mesh(jax.devices()[:1])
    opts = slip.Options()
    ana = analyze(A, opts)
    t0 = time.perf_counter()
    x = factorize_solve_fused_sharded(A, ana, b, mesh, opts)
    cold = time.perf_counter() - t0
    st = last_stats()
    assert st.backend == "tpu-fused-sharded" and not st.fallback, \
        (st.backend, st.fallback)
    check_solution(A, x, b)
    t0 = time.perf_counter()
    x = factorize_solve_fused_sharded(A, ana, b, mesh, opts)
    warm = time.perf_counter() - t0
    check_solution(A, x, b)
    print(f"sharded p=1 on hardware: cold {cold:.2f}s warm {warm:.3f}s "
          f"(exact check OK, no fallback)")


if __name__ == "__main__":
    main()
