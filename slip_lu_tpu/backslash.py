"""One-call exact solve: analyze + factorize + solve + output conversion.

Reference parity: ``SLIP_backslash.c`` (reference: SLIP_LU/Source/
SLIP_backslash.c ~l.80 — copy input to CSC x MPZ, SLIP_LU_analyze,
SLIP_LU_factorize, SLIP_LU_solve, then SLIP_matrix_copy the rational
solution to the caller's requested type). This is the primary user entry
point, like ``x = SLIP_backslash(A, b)``.
"""

from __future__ import annotations

from typing import Optional

from .analyze import analyze
from .convert import matrix_copy
from .errors import SlipIncorrectInputError
from .factorize import factorize
from .matrix import Kind, SlipMatrix, Type
from .options import Options
from .solve import check_solution, solve


def backslash(A: SlipMatrix, b: SlipMatrix, out_type: Type = Type.MPQ,
              options: Optional[Options] = None,
              backend: str = "host") -> SlipMatrix:
    """Exactly solve A x = b; return dense x of `out_type`.

    out_type semantics (reference: SLIP_backslash's type argument):
      MPQ  — exact rationals (lossless),
      MPFR — rounded to options.prec bits,
      FP64 — rounded to double,
      MPZ/INT64 — valid only if the exact solution is integral.

    backend:
      "host"       — Python-int oracle (the reference algorithm),
      "tpu"        — dense-with-masking device kernel, full pivoting
                     faithful to options.pivot,
      "tpu-sparse" — static-schedule sparse device kernel (transversal +
                     diagonal pivot sequence fixed symbolically;
                     nnz-proportional work, falls back to "tpu" on exact
                     pivot cancellation),
      "tpu-fused"  — the same schedule compiled into one Pallas mega-kernel
                     (two device dispatches per solve; falls back to
                     "tpu-sparse" on exact pivot cancellation).
    All backends produce bit-identical rationals (the exact solution is
    unique; only internal pivot sequences differ).
    """
    from .stats import SolveStats, phase_timer, record

    options = options or Options()
    options.validate()
    A2 = matrix_copy(A, Kind.CSC, Type.MPZ, options)  # integerize
    analysis = analyze(A2, options)
    if backend == "tpu":
        from .tpu.backslash_tpu import factorize_solve_tpu
        x_mpq = factorize_solve_tpu(A2, analysis, b, options)
    elif backend == "tpu-sparse":
        from .tpu.backslash_sparse import factorize_solve_tpu_sparse
        x_mpq = factorize_solve_tpu_sparse(A2, analysis, b, options)
    elif backend == "tpu-fused":
        from .tpu.backslash_fused import factorize_solve_tpu_fused
        x_mpq = factorize_solve_tpu_fused(A2, analysis, b, options)
    elif backend == "host":
        st = SolveStats(backend="host", n=A2.n, nnz=int(A2.p[A2.n]),
                        nrhs=b.n if b.kind == Kind.DENSE else 1)
        with phase_timer(st, "factorize"):
            F = factorize(A2, analysis, options)
        with phase_timer(st, "solve"):
            x_mpq = solve(F, b, options)
        record(st)
    else:
        raise SlipIncorrectInputError(
            f"unknown backend={backend!r}, expected 'host', 'tpu', "
            "'tpu-sparse', or 'tpu-fused'")
    if options.check:
        check_solution(A, x_mpq, b, options)
    return matrix_copy(x_mpq, Kind.DENSE, out_type, options)
