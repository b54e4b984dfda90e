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
from ..stats import SolveStats, phase_timer, record
from .bounds import factor_width, solve_width, widen_widths
from .factor_sparse import factor_solve_sparse_packed, unpack_sparse_result
from .schedule import SparseSchedule, _permute_cols
from .schedule_native import build_schedule_best


def pack_schedule(sched: SparseSchedule, n: int) -> np.ndarray:
    """Concatenate every schedule array into one int32 buffer (the layout
    factor_solve_sparse_packed unpacks). Reusable across solves/retries."""
    return np.concatenate([
        sched.col_pos.reshape(-1), sched.col_hist.reshape(-1),
        sched.row_pos.reshape(-1), sched.row_hist.reshape(-1),
        sched.diag_pos, sched.diag_hist,
        sched.tile_pos.reshape(-1), sched.tile_hist.reshape(-1),
        sched.fwd_hist.reshape(-1), sched.fwd_xk_hist,
        sched.bwd_pos.reshape(-1), sched.bwd_row.reshape(-1),
        np.concatenate([sched.row_of, [np.int32(n)]]),
    ]).astype(np.int32)

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
    st = SolveStats(backend="tpu-sparse", n=n, nnz=int(A.p[n]), nrhs=nrhs)
    if options.pivot_exact:
        from .backslash_fused import _pin_scheme_rows
        _pin_scheme_rows(A, analysis, options)
    q = np.asarray(analysis.q, dtype=np.int64)
    fixed_r = analysis.sparse_fixed_r   # cached repair from earlier solves
    for plan in range(2):
        with phase_timer(st, "schedule"):
            # plan 0: transversal diagonal; plan 1 (cancellation repair):
            # pin the host oracle's pivot rows — guaranteed nonzero pivots
            sched, r = build_schedule_best(A, q, fixed_r)
            Aq = _permute_cols(A, q)
            avals = [int(Aq.x[idx]) for c in range(n)
                     for idx in range(int(Aq.p[c]), int(Aq.p[c + 1]))]
        st.lnz, st.unz = sched.lnz, sched.unz
        W = factor_width(A, options.max_limbs)
        Ws = solve_width(A, bz.x, W, n, options.max_limbs)
        W_full = factor_width(A)
        Ws_full = solve_width(A, bz.x, W_full, n)
        sched_dev = jnp.asarray(pack_schedule(sched, n))  # one reusable h2d
        sing = False
        attempt = 0
        while True:
            st.W, st.Ws, st.retries = W, Ws, attempt
            attempt += 1
            with phase_timer(st, "pack"):
                from ..ops.limbs import ints_to_limbs
                aS, aM = ints_to_limbs(avals, W)
                valS = np.zeros(sched.nnz + 1, dtype=np.int32)
                valM = np.zeros((sched.nnz + 1, W), dtype=np.int32)
                valS[sched.init_pos] = aS
                valM[sched.init_pos] = aM
                xb = np.zeros((n + 1, nrhs), dtype=object)
                xb[:n] = bz.x[r, :]          # rows of B order
                XS0, XM0 = matrix_to_limbs(xb, Ws)
                vals_buf = np.concatenate([valS, valM.reshape(-1),
                                           XS0.reshape(-1),
                                           XM0.reshape(-1)])
            with phase_timer(st, "device"):
                out = factor_solve_sparse_packed(
                    n, sched.nnz, W, Ws, nrhs, sched.rmax, sched.cmax,
                    sched.umax, jnp.asarray(vals_buf), sched_dev)
                (XS, XM, det_s, det_m, sing, ovf) = unpack_sparse_result(
                    jax.device_get(out), n, nrhs, W, Ws)
            # overflow first: a truncated quotient can have all-zero low
            # limbs, so a width overflow can masquerade as a zero pivot —
            # widen and retry before trusting the singular flag. The
            # converse also holds: past an exact cancellation the kernel
            # pins rho=1 and propagates garbage, so a genuine singular
            # flag fakes overflow — at the analytic bound (where real
            # overflow is impossible) trust sing and replan.
            if ovf:
                nxt = widen_widths(W, Ws, W_full, Ws_full)
                if nxt is not None:
                    W, Ws = nxt
                    continue
                if not sing:
                    raise SlipLimbOverflowError(
                        "overflow persists at the analytic width bound "
                        f"(W={W}, Ws={Ws}) — internal invariant violated")
            if sing:
                break
            with phase_timer(st, "unpack"):
                det = int(limbs_to_ints(det_s.reshape(1),
                                        det_m[None, :])[0])
                xhat = limbs_to_ints(XS, XM)
                factor = A.scale / bz.scale
                x = SlipMatrix.allocate(Kind.DENSE, Type.MPQ, n, nrhs)
                for k in range(n):
                    oc = int(q[k])
                    for c in range(nrhs):
                        x.x[oc, c] = Fraction(int(xhat[k, c]), det) * factor
            record(st)
            return x
        # reaching here means the singular flag stopped the width loop
        if plan == 0:
            # exact cancellation killed a scheduled pivot: replan around
            # the oracle's actual pivot sequence (reference analogue: the
            # dynamic pivot search of slip_get_pivot.c, done once on host)
            with phase_timer(st, "replan"):
                from ..factorize import factorize
                F = factorize(A, analysis, options)   # raises if singular
                fixed_r = np.asarray(F.row_perm, dtype=np.int64)
                analysis.sparse_fixed_r = fixed_r     # cache for reuse
    # both plans still singular-flagged (cannot happen with a pinned
    # oracle sequence unless something deeper is wrong) — last resort:
    # the dense full-pivoting kernel, which searches pivots dynamically
    st.fallback = True
    record(st)
    from .backslash_tpu import factorize_solve_tpu
    return factorize_solve_tpu(A, analysis, b, options)


def factorize_solve_tpu_sparse_many(As, analysis, bs,
                                    options: Optional[Options] = None):
    """Batched exact solves of pattern-sharing systems (data parallel).

    The SURVEY §2.10 batch axis: many independent matrices with the SAME
    sparsity pattern (e.g. parameter sweeps, time steps on one mesh)
    share one static schedule and solve in a single vmapped device
    program. Returns a list of dense MPQ solutions, one per system.

    As: list of CSC x MPZ matrices with identical (p, i) patterns;
    bs: list of RHS matrices (same length).
    """
    options = options or Options()
    options.validate()
    if not As or len(As) != len(bs):
        raise SlipIncorrectInputError("As and bs must be equal-length, "
                                      "nonempty lists")
    A0 = As[0]
    n = A0.n
    for A in As[1:]:
        if A.n != n or not np.array_equal(A.p, A0.p) \
                or not np.array_equal(A.i[:int(A.p[n])],
                                      A0.i[:int(A0.p[n])]):
            raise SlipIncorrectInputError(
                "all matrices must share one sparsity pattern")
    nb = len(As)
    bzs = [matrix_copy(b, Kind.DENSE, Type.MPZ, options) for b in bs]
    nrhs = bzs[0].n
    q = np.asarray(analysis.q, dtype=np.int64)
    # transversal must avoid numerically-zero entries in EVERY member;
    # use the shared structural pattern (all stored entries) — members
    # with an exact zero on a scheduled pivot fall back individually
    sched, r = build_schedule_best(A0, q, analysis.sparse_fixed_r)
    sched_dev = jnp.asarray(pack_schedule(sched, n))
    W = max(factor_width(A, options.max_limbs) for A in As)
    Ws = max(solve_width(A, bz.x, W, n, options.max_limbs)
             for A, bz in zip(As, bzs))
    W_full = max(factor_width(A) for A in As)
    Ws_full = max(solve_width(A, bz.x, W_full, n)
                  for A, bz in zip(As, bzs))
    from ..ops.limbs import ints_to_limbs
    while True:
        bufs = []
        for A, bz in zip(As, bzs):
            Aq = _permute_cols(A, q)
            avals = [int(Aq.x[idx]) for c in range(n)
                     for idx in range(int(Aq.p[c]), int(Aq.p[c + 1]))]
            aS, aM = ints_to_limbs(avals, W)
            valS = np.zeros(sched.nnz + 1, dtype=np.int32)
            valM = np.zeros((sched.nnz + 1, W), dtype=np.int32)
            valS[sched.init_pos] = aS
            valM[sched.init_pos] = aM
            xb = np.zeros((n + 1, nrhs), dtype=object)
            xb[:n] = bz.x[r, :]
            XS0, XM0 = matrix_to_limbs(xb, Ws)
            bufs.append(np.concatenate([valS, valM.reshape(-1),
                                        XS0.reshape(-1), XM0.reshape(-1)]))
        vals_stack = jnp.asarray(np.stack(bufs))
        run = lambda vb: factor_solve_sparse_packed(
            n, sched.nnz, W, Ws, nrhs, sched.rmax, sched.cmax, sched.umax,
            vb, sched_dev)
        out = jax.device_get(jax.vmap(run)(vals_stack))
        results = [unpack_sparse_result(out[t], n, nrhs, W, Ws)
                   for t in range(nb)]
        # overflow on a non-cancelled member -> widen all (a cancelled
        # member's flags are garbage past its zero pivot; it falls back)
        if any(res[5] and not res[4] for res in results):
            nxt = widen_widths(W, Ws, W_full, Ws_full)
            if nxt is None:
                raise SlipLimbOverflowError(
                    "overflow persists at the analytic width bound "
                    f"(W={W}, Ws={Ws}) — internal invariant violated")
            W, Ws = nxt
            continue
        xs = []
        factor_scales = [A.scale / bz.scale for A, bz in zip(As, bzs)]
        for t, (XS, XM, det_s, det_m, sing, _) in enumerate(results):
            if sing:
                # exact cancellation for this member only: solve it solo
                xs.append(factorize_solve_tpu_sparse(As[t], analysis,
                                                     bs[t], options))
                continue
            det = int(limbs_to_ints(det_s.reshape(1), det_m[None, :])[0])
            xhat = limbs_to_ints(XS, XM)
            x = SlipMatrix.allocate(Kind.DENSE, Type.MPQ, n, nrhs)
            for k in range(n):
                oc = int(q[k])
                for c in range(nrhs):
                    x.x[oc, c] = Fraction(int(xhat[k, c]),
                                          det) * factor_scales[t]
            xs.append(x)
        return xs


def factorize_solve_tpu_events(A: SlipMatrix, analysis: Analysis,
                               b: SlipMatrix,
                               options: Optional[Options] = None,
                               chunk: int = 256) -> SlipMatrix:
    """Exact solve via the event-chunked sparse path (O(fill) memory).

    Same pipeline as factorize_solve_tpu_sparse but the device program
    scans flat event chunks (tpu/schedule_events.py), so steps with huge
    update tiles don't inflate every step's padding — the route to the
    100K+ nnz regime. Falls back to the padded path on cancellation.
    """
    from .factor_sparse_events import factor_events, solve_events
    from .schedule_events import build_event_schedule

    options = options or Options()
    options.validate()
    if A.kind != Kind.CSC or A.type != Type.MPZ:
        raise SlipIncorrectInputError("event path requires CSC x MPZ input")
    n = A.n
    if b.m != n:
        raise SlipIncorrectInputError(f"b has {b.m} rows, matrix has {n}")
    bz = matrix_copy(b, Kind.DENSE, Type.MPZ, options)
    nrhs = bz.n
    if n == 0:
        return SlipMatrix.allocate(Kind.DENSE, Type.MPQ, 0, nrhs)
    q = np.asarray(analysis.q, dtype=np.int64)
    sched, r = build_schedule_best(A, q, analysis.sparse_fixed_r)
    es = build_event_schedule(sched, chunk=chunk)
    Aq = _permute_cols(A, q)
    avals = [int(Aq.x[idx]) for c in range(n)
             for idx in range(int(Aq.p[c]), int(Aq.p[c + 1]))]
    W = factor_width(A, options.max_limbs)
    Ws = solve_width(A, bz.x, W, n, options.max_limbs)
    W_full = factor_width(A)
    Ws_full = solve_width(A, bz.x, W_full, n)

    def _widen(W, Ws):
        nxt = widen_widths(W, Ws, W_full, Ws_full)
        if nxt is None:
            raise SlipLimbOverflowError(
                "overflow persists at the analytic width bound "
                f"(W={W}, Ws={Ws}) — internal invariant violated")
        return nxt

    from ..ops.limbs import ints_to_limbs
    while True:
        W2 = 2 * W + 1
        # must cover the widest solve numerator (W+Ws+1) so a clamped-width
        # quotient can never wrap undetected (see factor_sparse.py)
        Wi = max(W2, W + Ws + 1)
        aS, aM = ints_to_limbs(avals, W)
        val = np.zeros((es.nnz + 1, 1 + W), dtype=np.int32)
        val[es.init_pos, 0] = aS
        val[es.init_pos, 1:] = aM
        val_d, GT, SMT, sing, ovf = factor_events(
            n, es.nnz, W, Wi, jnp.asarray(val),
            jnp.asarray(es.f_kind), jnp.asarray(es.f_step),
            jnp.asarray(es.f_ev))
        if bool(ovf) and not bool(sing):
            # overflow before singular: truncated values can fake a zero
            # pivot, so widen first and only then trust the flag (when
            # sing is ALSO set, the overflow may itself be garbage from
            # the cancelled pivot — let the padded path replan instead)
            W, Ws = _widen(W, Ws)
            continue
        if bool(sing):
            # cancellation: reuse the padded path's replanning machinery
            return factorize_solve_tpu_sparse(A, analysis, b, options)
        xb = np.zeros((n + 1, nrhs), dtype=object)
        xb[:n] = bz.x[r, :]
        XS0, XM0 = matrix_to_limbs(xb, Ws)
        X0 = np.concatenate([XS0[..., None], XM0], axis=-1)
        X, ovf2 = solve_events(
            n, es.nnz, W, Wi, Ws, val_d, GT, SMT, jnp.asarray(X0),
            jnp.asarray(es.s_kind), jnp.asarray(es.s_step),
            jnp.asarray(es.s_ev), jnp.asarray(es.b_kind),
            jnp.asarray(es.b_step), jnp.asarray(es.b_ev))
        if bool(ovf2):
            W, Ws = _widen(W, Ws)
            continue
        SMT_h = jax.device_get(SMT)
        det = int(limbs_to_ints(SMT_h[n, 0].reshape(1),
                                SMT_h[n, 1:][None, :])[0])
        Xh = jax.device_get(X)
        xhat = limbs_to_ints(Xh[:n, :, 0], Xh[:n, :, 1:])
        factor = A.scale / bz.scale
        x = SlipMatrix.allocate(Kind.DENSE, Type.MPQ, n, nrhs)
        for k in range(n):
            oc = int(q[k])
            for c in range(nrhs):
                x.x[oc, c] = Fraction(int(xhat[k, c]), det) * factor
        return x
