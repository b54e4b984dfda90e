"""Command-line exact solver — the framework's SLIPLU demo equivalent.

Reference parity: SLIP_LU/Demo/SLIPLU.c (flag parsing, triplet matrix +
dense RHS reading, per-phase timing, solution output / check) — rebuilt as
an argparse front end over the Python API.

Usage:
    python -m slip_lu_tpu.cli MAT_FILE [RHS_FILE] [options]

The matrix file is triplet text (`m n nnz` header then `i j x` rows, same
format as the reference's ExampleMats/); the RHS file is dense text
(`m n` header then values). Without RHS_FILE, b = A @ ones is used (so any
matrix file is self-testing: x must come back all ones).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sliplu",
        description="Exactly solve A x = b (roundoff-error-free sparse LU).")
    p.add_argument("matrix", help="triplet-format matrix file")
    p.add_argument("rhs", nargs="?", default=None,
                   help="dense RHS file (default: b = A @ ones)")
    p.add_argument("--order", choices=["none", "colamd", "amd", "auto"],
                   default="colamd",
                   help="fill-reducing column ordering (auto: pick the "
                        "minimum estimated fill among none/colamd/amd)")
    p.add_argument("--pivot",
                   choices=["smallest", "diagonal", "first", "tol-smallest",
                            "tol-largest", "largest"],
                   default="smallest", help="pivot scheme")
    p.add_argument("--tol", type=float, default=0.1,
                   help="tolerance for the tol-* pivot schemes")
    p.add_argument("--exact-pivot", action="store_true",
                   dest="pivot_exact",
                   help="honor --pivot on the scheduled device backends "
                        "(host pivot search pinned into the schedule)")
    p.add_argument("--out-type", choices=["mpq", "mpfr", "fp64"],
                   default="mpq", help="solution output type")
    p.add_argument("--prec", type=int, default=128,
                   help="bits of precision for --out-type mpfr")
    p.add_argument("--backend",
                   choices=["host", "tpu", "tpu-sparse", "tpu-fused",
                            "sharded"],
                   default="host",
                   help="execution backend (tpu-fused is the flagship "
                        "device path: the whole solve as one Pallas "
                        "program)")
    p.add_argument("--check", action="store_true",
                   help="verify A x == b exactly in rational arithmetic")
    p.add_argument("--time", action="store_true", dest="timing",
                   help="print per-phase wall-clock times")
    p.add_argument("--print-level", type=int, default=0, choices=[0, 1, 2, 3],
                   help="matrix/stat printing verbosity")
    p.add_argument("-o", "--output", default=None,
                   help="write the solution to a dense text file")
    return p


def main(argv=None) -> int:
    args = make_parser().parse_args(argv)

    from . import __version__
    from .analyze import analyze
    from .backslash import backslash
    from .convert import matrix_copy
    from .errors import SlipError
    from .io import read_dense, read_triplet, write_dense
    from .matrix import Kind, SlipMatrix, Type
    from .options import Options, Ordering, Pivot

    order = {"none": Ordering.NONE, "colamd": Ordering.COLAMD,
             "amd": Ordering.AMD, "auto": Ordering.AUTO}[args.order]
    pivot = {"smallest": Pivot.SMALLEST, "diagonal": Pivot.DIAGONAL,
             "first": Pivot.FIRST_NONZERO, "tol-smallest": Pivot.TOL_SMALLEST,
             "tol-largest": Pivot.TOL_LARGEST,
             "largest": Pivot.LARGEST}[args.pivot]
    out_type = {"mpq": Type.MPQ, "mpfr": Type.MPFR,
                "fp64": Type.FP64}[args.out_type]
    options = Options(pivot=pivot, pivot_exact=args.pivot_exact,
                      order=order, tol=args.tol,
                      prec=args.prec, check=args.check,
                      print_level=args.print_level)

    t0 = time.perf_counter()
    try:
        A = read_triplet(args.matrix)
    except (OSError, SlipError) as e:
        print(f"error reading matrix: {e}", file=sys.stderr)
        return 1
    A2 = matrix_copy(A, Kind.CSC, Type.MPZ, options)
    if args.rhs is not None:
        try:
            b = read_dense(args.rhs)
        except (OSError, SlipError) as e:
            print(f"error reading rhs: {e}", file=sys.stderr)
            return 1
    else:
        # b = A @ ones: exact solve must return all ones
        bvals = np.zeros((A2.m, 1), dtype=object)
        for col in range(A2.n):
            for idx in range(int(A2.p[col]), int(A2.p[col + 1])):
                bvals[int(A2.i[idx]), 0] += int(A2.x[idx])
        b = SlipMatrix.from_dense(bvals, Type.MPZ)
        b.scale = A2.scale
    t_read = time.perf_counter() - t0

    if args.print_level >= 1:
        nnz = int(A2.p[A2.n])
        print(f"slip_lu_tpu {__version__}: {A.m} x {A.n}, nnz {nnz}, "
              f"order={args.order}, pivot={args.pivot}, "
              f"backend={args.backend}")

    t0 = time.perf_counter()
    try:
        if args.backend == "sharded":
            import jax

            from .parallel import make_mesh
            from .parallel.driver_sparse import (
                factorize_solve_sharded_sparse)
            from .solve import check_solution
            mesh = make_mesh(jax.devices())
            x = factorize_solve_sharded_sparse(A2, analyze(A2, options), b,
                                               mesh, options)
            if args.check:
                check_solution(A, x, b, options)
            x = matrix_copy(x, Kind.DENSE, out_type, options)
        else:
            x = backslash(A, b, out_type, options, backend=args.backend)
    except SlipError as e:
        print(f"solve failed: {type(e).__name__}: {e}", file=sys.stderr)
        return 2
    t_solve = time.perf_counter() - t0

    if args.timing:
        print(f"read:  {t_read * 1e3:10.2f} ms")
        print(f"solve: {t_solve * 1e3:10.2f} ms"
              + ("  (includes exact check)" if args.check else ""))
        if args.print_level >= 1:
            from .stats import last_stats
            st = last_stats()
            if st is not None:
                print(st.summary())
    if args.check:
        print("check: A x == b verified exactly")

    if args.output:
        write_dense(x, args.output)
        if args.print_level >= 1:
            print(f"solution written to {args.output}")
    elif args.print_level >= 2 or (args.output is None and not args.timing
                                   and args.print_level == 0):
        for i in range(x.m):
            row = " ".join(str(x.x[i, j]) for j in range(x.n))
            print(row)
    return 0


if __name__ == "__main__":
    sys.exit(main())
