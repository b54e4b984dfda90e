"""Symbolic analysis: fill-reducing ordering + fill estimates.

Reference parity: ``SLIP_LU_analyze.c`` / ``SLIP_LU_analysis_free.c``
(reference: SLIP_LU/Source/SLIP_LU_analyze.c ~l.60 — runs COLAMD (default),
AMD, or the identity on A and stores the column permutation ``q`` plus
``lnz``/``unz`` fill estimates used to pre-size L and U).

The TPU path extends the analysis with a static schedule (see
slip_lu_tpu.tpu); this module is the shared host-side front.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from .errors import SlipIncorrectInputError
from .matrix import Kind, SlipMatrix
from .options import Options, Ordering


@dataclasses.dataclass
class Analysis:
    """Reference parity: SLIP_LU_analysis {int64 *q; int64 lnz, unz}."""

    q: np.ndarray       # column permutation, len n
    lnz: int            # estimated nnz(L) (pre-size hint only)
    unz: int            # estimated nnz(U)
    # symbolic state cached by the static-schedule sparse path: pinned
    # pivot rows after a cancellation repair, so repeated solves with the
    # same analysis skip the failed transversal plan (the reference
    # similarly carries symbolic results in SLIP_LU_analysis)
    sparse_fixed_r: "np.ndarray | None" = None


def analyze(A: SlipMatrix, options: Optional[Options] = None) -> Analysis:
    """Compute the column ordering for REF LU (reference: SLIP_LU_analyze)."""
    options = options or Options()
    options.validate()
    if A.kind != Kind.CSC:
        raise SlipIncorrectInputError("analyze requires a CSC matrix")
    if A.m != A.n:
        raise SlipIncorrectInputError(f"matrix must be square, got {A.m}x{A.n}")
    n = A.n
    if n == 0:
        return Analysis(q=np.zeros(0, dtype=np.int64), lnz=0, unz=0)

    if options.order == Ordering.NONE:
        q = np.arange(n, dtype=np.int64)
    elif options.order == Ordering.AMD:
        from .ordering.native import amd_order_best
        q = amd_order_best(A)
    elif options.order == Ordering.COLAMD:
        from .ordering.native import colamd_order_best
        q = colamd_order_best(A)
    else:
        raise SlipIncorrectInputError(f"unknown ordering {options.order!r}")

    # Fill estimates: the reference seeds these from the ordering's stats
    # (e.g. AMD Info[AMD_LNZ]) and grows L/U dynamically when exceeded
    # (slip_sparse_realloc.c). Our containers grow natively, so these are
    # pre-size hints with the reference's fallback formula.
    nnz = A.nnz()
    guess = min(int(10 + 2 * nnz + n), n * (n + 1) // 2)
    analysis = Analysis(q=q, lnz=guess, unz=guess)
    if options.print_level >= 1:
        print(f"analyze: n={n} nnz={nnz} order={options.order.name} "
              f"lnz~{analysis.lnz} unz~{analysis.unz}")
    return analysis
