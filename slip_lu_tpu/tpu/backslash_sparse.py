"""Host glue for the scheduled sparse device path.

Pipeline (the sparse analogue of tpu/backslash_tpu.py):
  1. fill-reducing column ordering q (analysis) + maximum transversal row
     permutation r -> B = A[r][:, q] with a structurally nonzero diagonal;
  2. symbolic elimination -> static schedule + fill pattern (schedule.py);
  3. pack A's values into the value-slot array, b into the RHS block;
  4. one fused device program: scheduled factor + forward/back sub;
  5. widen-and-retry on limb overflow; fall back to the dense
     full-pivoting kernel if exact cancellation kills a scheduled pivot
     (the static-pivot analogue of SLIP_SINGULAR, which full pivoting may
     still avoid).
"""

from __future__ import annotations

from fractions import Fraction
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..analyze import Analysis
from ..convert import matrix_copy
from ..errors import SlipIncorrectInputError, SlipLimbOverflowError
from ..matrix import Kind, SlipMatrix, Type
from ..options import Options
from ..ops.limbs import limbs_to_ints, matrix_to_limbs
from .bounds import factor_width, solve_width
from .factor_sparse import factor_solve_sparse
from .schedule import SparseSchedule, _permute_cols
from .schedule_native import build_schedule_best

_MAX_RETRIES = 3


def factorize_solve_tpu_sparse(A: SlipMatrix, analysis: Analysis,
                               b: SlipMatrix,
                               options: Optional[Options] = None
                               ) -> SlipMatrix:
    """Exact solve via the static-schedule sparse device path."""
    options = options or Options()
    options.validate()
    if A.kind != Kind.CSC or A.type != Type.MPZ:
        raise SlipIncorrectInputError("sparse path requires CSC x MPZ input")
    n = A.n
    if b.m != n:
        raise SlipIncorrectInputError(f"b has {b.m} rows, matrix has {n}")
    bz = matrix_copy(b, Kind.DENSE, Type.MPZ, options)
    nrhs = bz.n
    if n == 0:
        return SlipMatrix.allocate(Kind.DENSE, Type.MPQ, 0, nrhs)
    q = np.asarray(analysis.q, dtype=np.int64)
    sched, r = build_schedule_best(A, q)     # raises if structurally singular
    Aq = _permute_cols(A, q)
    avals = [int(Aq.x[idx]) for c in range(n)
             for idx in range(int(Aq.p[c]), int(Aq.p[c + 1]))]

    W = factor_width(A, options.max_limbs)
    Ws = solve_width(A, bz.x, W, n, options.max_limbs)
    for attempt in range(_MAX_RETRIES):
        from ..ops.limbs import ints_to_limbs
        aS, aM = ints_to_limbs(avals, W)
        valS = np.zeros(sched.nnz + 1, dtype=np.int32)
        valM = np.zeros((sched.nnz + 1, W), dtype=np.int32)
        valS[sched.init_pos] = aS
        valM[sched.init_pos] = aM
        xb = np.zeros((n + 1, nrhs), dtype=object)
        xb[:n] = bz.x[r, :]                  # rows of B order
        XS0, XM0 = matrix_to_limbs(xb, Ws)
        out = factor_solve_sparse(
            n, jnp.asarray(valS), jnp.asarray(valM),
            jnp.asarray(XS0), jnp.asarray(XM0),
            jnp.asarray(sched.col_pos), jnp.asarray(sched.col_hist),
            jnp.asarray(sched.row_pos), jnp.asarray(sched.row_hist),
            jnp.asarray(sched.diag_pos), jnp.asarray(sched.diag_hist),
            jnp.asarray(sched.tile_pos), jnp.asarray(sched.tile_hist),
            jnp.asarray(sched.fwd_hist), jnp.asarray(sched.fwd_xk_hist),
            jnp.asarray(sched.bwd_pos), jnp.asarray(sched.bwd_row),
            jnp.asarray(np.concatenate([sched.row_of,
                                        [np.int32(n)]]).astype(np.int32)))
        (valS_o, valM_o, XS, XM, rhoS, rhoM, sing, ovf) = jax.device_get(out)
        if bool(sing):
            # exact cancellation on a scheduled pivot: full pivoting may
            # still succeed — dense fallback decides singular vs not
            from .backslash_tpu import factorize_solve_tpu
            return factorize_solve_tpu(A, analysis, b, options)
        if bool(ovf):
            W *= 2
            Ws = max(2 * Ws, 2 * W + 2)
            continue
        det = int(limbs_to_ints(rhoS[n - 1:n], rhoM[n - 1][None, :])[0])
        xhat = limbs_to_ints(XS[:n], XM[:n])
        factor = A.scale / bz.scale
        x = SlipMatrix.allocate(Kind.DENSE, Type.MPQ, n, nrhs)
        for k in range(n):
            oc = int(q[k])
            for c in range(nrhs):
                x.x[oc, c] = Fraction(int(xhat[k, c]), det) * factor
        return x
    raise SlipLimbOverflowError(
        f"sparse solve exceeded limb budget after {_MAX_RETRIES} widenings")
