"""Host glue for the sharded scheduled sparse path.

Mirrors tpu/backslash_sparse.py across a device mesh: build the static
schedule once, split it per chip (cyclic rows), pack each chip's value
slots and RHS rows, run the fused sharded program, unpack. Bit-identical
to the host oracle and to every other backend/topology
(tests/test_sharded_sparse.py).
"""

from __future__ import annotations

from fractions import Fraction
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..analyze import Analysis
from ..convert import matrix_copy
from ..errors import SlipIncorrectInputError, SlipLimbOverflowError
from ..matrix import Kind, SlipMatrix, Type
from ..options import Options
from ..ops.limbs import ints_to_limbs, limbs_to_ints, matrix_to_limbs
from ..tpu.bounds import factor_width, solve_width, widen_widths
from ..tpu.schedule import _permute_cols
from ..tpu.schedule_native import build_schedule_best
from .factor_sparse_shard import factor_solve_sparse_sharded
from .schedule_shard import shard_schedule


def factorize_solve_sharded_sparse(A: SlipMatrix, analysis: Analysis,
                                   b: SlipMatrix, mesh: Mesh,
                                   options: Optional[Options] = None
                                   ) -> SlipMatrix:
    """Exact sparse solve over a block-row (cyclic) sharded mesh."""
    options = options or Options()
    options.validate()
    if A.kind != Kind.CSC or A.type != Type.MPZ:
        raise SlipIncorrectInputError("sharded sparse requires CSC x MPZ")
    n = A.n
    if A.m != n:
        raise SlipIncorrectInputError(f"matrix must be square, got {A.m}x{n}")
    if b.m != n:
        raise SlipIncorrectInputError(f"b has {b.m} rows, matrix has {n}")
    bz = matrix_copy(b, Kind.DENSE, Type.MPZ, options)
    nrhs = bz.n
    if n == 0:
        return SlipMatrix.allocate(Kind.DENSE, Type.MPQ, 0, nrhs)
    p = mesh.devices.size
    if options.pivot_exact:
        from ..tpu.backslash_fused import _pin_scheme_rows
        _pin_scheme_rows(A, analysis, options)
    q = np.asarray(analysis.q, dtype=np.int64)
    fixed_r = analysis.sparse_fixed_r   # cached repair from earlier solves
    for plan in range(2):
        x = _try_plan(A, analysis, b, bz, mesh, options, q, fixed_r)
        if x is not None:
            return x
        if plan == 0:
            # cancellation repair: pin the oracle's pivot sequence
            from ..factorize import factorize
            F = factorize(A, analysis, options)   # raises if singular
            fixed_r = np.asarray(F.row_perm, dtype=np.int64)
            analysis.sparse_fixed_r = fixed_r     # cache for reuse
    from ..tpu.backslash_tpu import factorize_solve_tpu
    return factorize_solve_tpu(A, analysis, b, options)


def _try_plan(A, analysis, b, bz, mesh, options, q, fixed_r):
    """One schedule plan with widen-and-retry; None if a pivot cancelled."""
    n = A.n
    nrhs = bz.n
    p = mesh.devices.size
    sched, r = build_schedule_best(A, q, fixed_r)
    ss = shard_schedule(sched, p)
    Aq = _permute_cols(A, q)
    avals = [int(Aq.x[idx]) for c in range(n)
             for idx in range(int(Aq.p[c]), int(Aq.p[c + 1]))]

    W = factor_width(A, options.max_limbs)
    Ws = solve_width(A, bz.x, W, n, options.max_limbs)
    W_full = factor_width(A)
    Ws_full = solve_width(A, bz.x, W_full, n)
    nloc = ss.nloc
    sched_args = tuple(jnp.asarray(a) for a in (
        ss.col_pos, ss.col_hist, ss.tile_pos, ss.tile_hist,
        ss.row_pos, ss.row_hist, ss.row_valid, ss.diag_pos, ss.diag_hist,
        ss.fwd_rows, ss.fwd_hist, ss.fwd_xk_hist.astype(np.int32),
        ss.bwd_pos, ss.bwd_row, ss.row_owner_row))
    while True:
        aS, aM = ints_to_limbs(avals, W)
        valS = np.zeros((p, ss.e_loc + 1), dtype=np.int32)
        valM = np.zeros((p, ss.e_loc + 1, W), dtype=np.int32)
        for t, g in enumerate(sched.init_pos):
            c, l = int(ss.slot_chip[g]), int(ss.slot_local[g])
            valS[c, l] = aS[t]
            valM[c, l] = aM[t]
        xb = np.zeros((p, nloc + 1, nrhs), dtype=object)
        for i in range(n):
            xb[i % p, i // p] = bz.x[int(r[i]), :]
        XS0, XM0 = matrix_to_limbs(xb.reshape(-1, nrhs), Ws)
        XS0 = XS0.reshape(p, nloc + 1, nrhs)
        XM0 = XM0.reshape(p, nloc + 1, nrhs, Ws)
        buf = jax.device_get(factor_solve_sparse_sharded(
            mesh, n, p, jnp.asarray(valS), jnp.asarray(valM),
            jnp.asarray(XS0), jnp.asarray(XM0), *sched_args))
        sing, ovf = bool(buf[0]), bool(buf[1])
        o = 2
        det_s = buf[o]; o += 1
        det_m = buf[o:o + W]; o += W
        XS = buf[o:o + p * nloc * nrhs].reshape(p, nloc, nrhs)
        o += p * nloc * nrhs
        XM = buf[o:].reshape(p, nloc, nrhs, Ws)
        # overflow first (truncation can fake a zero pivot), but at the
        # analytic bound a set sing flag is the true cause — the garbage
        # past an exactly-cancelled pivot legitimately fakes overflow
        if ovf:
            nxt = widen_widths(W, Ws, W_full, Ws_full)
            if nxt is not None:
                W, Ws = nxt
                continue
            if not sing:
                raise SlipLimbOverflowError(
                    "sharded sparse overflow persists at the analytic "
                    f"width bound (W={W}, Ws={Ws}) — invariant violated")
        if sing:
            return None          # caller replans around the oracle pivots
        det = int(limbs_to_ints(det_s.reshape(1), det_m[None, :])[0])
        factor = A.scale / bz.scale
        x = SlipMatrix.allocate(Kind.DENSE, Type.MPQ, n, nrhs)
        xhat = limbs_to_ints(XS.reshape(-1, nrhs),
                             XM.reshape(-1, nrhs, Ws))
        xhat = xhat.reshape(p, nloc, nrhs)
        for k in range(n):
            oc = int(q[k])
            for c in range(nrhs):
                v = int(xhat[k % p, k // p, c])
                x.x[oc, c] = Fraction(v, det) * factor
        return x
