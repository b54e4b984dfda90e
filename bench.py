"""Benchmark: exact-solve throughput (nnz/s) on the device path vs host oracle.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "nnz/s", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so the baseline is the
self-measured host oracle — the reference algorithm (left-looking REF LU +
exact rational solve, reimplemented with Python ints) on the same matrix
on this machine. vs_baseline = device nnz/s divided by oracle nnz/s.
Correctness is asserted (exact rational A·x == b) before timing counts.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    # default: the 11K-nnz banded member — large enough that device
    # compute (not the per-dispatch tunnel latency) is what's measured
    mat = os.environ.get("SLIP_BENCH_MAT", "data/ExampleMats/uni10k_mat.txt")
    rhs = os.environ.get("SLIP_BENCH_RHS", "data/ExampleMats/uni10k_v.txt")
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    os.chdir(here)

    if os.environ.get("JAX_PLATFORMS"):
        # sitecustomize pins the axon TPU; honor an explicit override so
        # the bench can run on CPU in CI
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    backend = os.environ.get("SLIP_BENCH_BACKEND", "tpu-fused")

    from slip_lu_tpu.analyze import analyze
    from slip_lu_tpu.backslash import backslash
    from slip_lu_tpu.convert import matrix_copy
    from slip_lu_tpu.io import read_dense, read_triplet
    from slip_lu_tpu.matrix import Kind, Type
    from slip_lu_tpu.options import Options
    from slip_lu_tpu.solve import check_solution
    from slip_lu_tpu.tpu.backslash_fused import factorize_solve_tpu_fused
    from slip_lu_tpu.tpu.backslash_sparse import factorize_solve_tpu_sparse
    from slip_lu_tpu.tpu.backslash_tpu import factorize_solve_tpu

    A = matrix_copy(read_triplet(mat), Kind.CSC, Type.MPZ)
    b = read_dense(rhs)
    nnz = int(A.p[A.n])
    opts = Options()
    ana = analyze(A, opts)
    run_dev = {"tpu-sparse": factorize_solve_tpu_sparse,
               "tpu-fused": factorize_solve_tpu_fused,
               "tpu": factorize_solve_tpu}[backend]

    # --- baseline: host oracle (the reference algorithm, Python ints) ---
    t0 = time.perf_counter()
    x_host = backslash(A, b, Type.MPQ, opts)
    host_s = time.perf_counter() - t0
    check_solution(A, x_host, b)

    # --- device path: warm up (compile), then time ---
    x_dev = run_dev(A, ana, b, opts)  # compile + run
    check_solution(A, x_dev, b)
    reps = int(os.environ.get("SLIP_BENCH_REPS", "3"))
    t0 = time.perf_counter()
    for _ in range(reps):
        x_dev = run_dev(A, ana, b, opts)
    dev_s = (time.perf_counter() - t0) / reps

    for i in range(A.n):
        assert x_dev.x[i, 0] == x_host.x[i, 0], "device/oracle mismatch"

    dev_nnz_s = nnz / dev_s
    host_nnz_s = nnz / host_s
    out = {
        "metric": "exact_solve_throughput",
        "value": round(dev_nnz_s, 2),
        "unit": "nnz/s",
        "vs_baseline": round(dev_nnz_s / host_nnz_s, 4),
    }

    # --- scale member (uni100k, natural order — the regime where the
    # ~45 ms tunnel sync floor stops dominating). Extra keys on the
    # SAME JSON line so the driver's one-line contract holds.
    scale = os.environ.get("SLIP_BENCH_SCALE", "uni100k")
    if scale and scale != "0":
        from slip_lu_tpu.options import Ordering, Options as Opt
        A2 = matrix_copy(read_triplet(f"data/ExampleMats/{scale}_mat.txt"),
                         Kind.CSC, Type.MPZ)
        b2 = read_dense(f"data/ExampleMats/{scale}_v.txt")
        nnz2 = int(A2.p[A2.n])
        o2 = Opt(order=Ordering.NONE)
        t0 = time.perf_counter()
        x2h = backslash(A2, b2, Type.MPQ, o2)
        host2 = time.perf_counter() - t0
        ana2 = analyze(A2, o2)
        x2 = run_dev(A2, ana2, b2, o2)          # compile + run
        check_solution(A2, x2, b2)
        for i in range(A2.n):
            assert x2.x[i, 0] == x2h.x[i, 0], "scale device/oracle mismatch"
        t0 = time.perf_counter()
        for _ in range(reps):
            run_dev(A2, ana2, b2, o2)
        dev2 = (time.perf_counter() - t0) / reps
        out["scale_matrix"] = scale
        out["scale_nnz_per_s"] = round(nnz2 / dev2, 2)
        out["scale_vs_baseline"] = round((nnz2 / dev2) / (nnz2 / host2), 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
