"""Scheduled sparse REF LU + substitution on device (nnz-proportional).

The sparse twin of tpu/factor.py + tpu/solve.py: instead of masked dense
updates (O(n^3) regardless of fill), a lax.scan walks the static schedule
emitted by tpu/schedule.py — per elimination step it gathers exactly the
pivot column, pivot row, and update tile of the *symbolic fill pattern*,
so total work is proportional to the true IPGE operation count, like the
reference's left-looking loop (reference: SLIP_LU_factorize.c +
slip_ref_triangular_solve.c, whose reach/history machinery this schedule
precomputes statically).

History updates (the reference's h[] vector) divide by rho_h with h
varying per entry: each step's pivot inverse is appended to an on-device
Hensel-inverse table, and history fixes gather their divisor's inverse
from it (ops/matarith.py pairwise ops). The IPGE division by rho_{k-1} is
shared across the tile (Toeplitz matmul).

Everything — factorization, forward substitution, determinant scaling,
back substitution — is one jitted program: one dispatch, one transfer.
Exact-cancellation pivots and limb overflow come back as flags; the
driver falls back to the dense full-pivoting kernel / widens W.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import matarith as mt


def _signed_fix(vS, vM, rp_s, rp_m, inv_h, tz_h, s_h, out_w):
    """History fix v <- v * rho_prev / rho_h (per-entry divisors)."""
    num, _ = mt.mul_shared(vM, rp_m, vM.shape[-1] + rp_m.shape[-1])
    fixM, bad = mt.divexact_gathered(num, inv_h, tz_h, out_w)
    fixS = vS * rp_s * s_h
    fixS = jnp.where(jnp.all(fixM == 0, axis=-1), 0, fixS)
    return fixS, fixM, bad


def factor_solve_sparse(n: int,
                        valS: jnp.ndarray, valM: jnp.ndarray,
                        XS: jnp.ndarray, XM: jnp.ndarray,
                        col_pos, col_hist, row_pos, row_hist,
                        diag_pos, diag_hist, tile_pos, tile_hist,
                        fwd_hist, fwd_xk_hist, bwd_pos, bwd_row,
                        row_of):
    """Run the full static schedule. See tpu/schedule.py for the layout.

    valS/valM: [E+1(, W)] value slots (A scattered in, fill zero, slot E
    dummy). XS/XM: [n+1, nrhs(, Ws)] RHS with dummy row n.
    Returns (valS, valM, XS, XM, rhoS, rhoM, singular, overflow).
    """
    E = valS.shape[0] - 1
    W = valM.shape[-1]
    Ws = XM.shape[-1]
    W2 = 2 * W + 1
    Wi = max(W2, Ws)          # inverse-table width (serves factor + solve)
    nrhs = XS.shape[-1]

    one_w = jnp.zeros(W, jnp.int32).at[0].set(1)
    # rho/inverse tables; index h+1 holds rho_h (index 0: rho_{-1} = 1)
    signT0 = jnp.zeros(n + 1, jnp.int32).at[0].set(1)
    magT0 = jnp.zeros((n + 1, W), jnp.int32).at[0, 0].set(1)
    invT0 = jnp.zeros((n + 1, Wi), jnp.int32).at[0, 0].set(1)
    tzT0 = jnp.zeros(n + 1, jnp.int32)

    # ------------------------- factorization scan -------------------------
    def fstep(carry, xs):
        (valS, valM, rp_s, rp_m, inv_p, tz_p, signT, magT, invT, tzT,
         k, sing, ovf) = carry
        (cpos, chist, rpos, rhist, dpos, dhist, tpos, thist) = xs
        R = cpos.shape[0]
        C = rpos.shape[0]
        tposf = tpos.reshape(-1)
        thistf = thist.reshape(-1)
        # --- ONE batched gather + history fix for diag, pivot row, pivot
        # column, and update tile (every history level is < k, so all
        # fixes can run before this step's pivot inverse exists)
        allpos = jnp.concatenate([dpos[None], rpos, cpos, tposf])
        allhist = jnp.concatenate([dhist[None], rhist, chist, thistf])
        vS = valS[allpos]
        vM = valM[allpos]
        fixS, fixM, bad1 = _signed_fix(vS, vM, rp_s, rp_m,
                                       invT[allhist], tzT[allhist],
                                       signT[allhist], W)
        valS = valS.at[allpos[:1 + C + R]].set(fixS[:1 + C + R])
        valM = valM.at[allpos[:1 + C + R]].set(fixM[:1 + C + R])
        rho_s, rho_m = fixS[0], fixM[0]
        sing = sing | (rho_s == 0)
        rho_m_safe = jnp.where(jnp.all(rho_m == 0), one_w, rho_m)
        inv_k, tz_k = mt.div_precompute_hensel(rho_m_safe, Wi)
        signT = signT.at[k + 1].set(jnp.where(rho_s == 0, 1, rho_s))
        magT = magT.at[k + 1].set(rho_m_safe)
        invT = invT.at[k + 1].set(inv_k)
        tzT = tzT.at[k + 1].set(tz_k)
        # --- IPGE update of the (already fixed) tile
        rowS, rowM = fixS[1:1 + C], fixM[1:1 + C]
        colS, colM = fixS[1 + C:1 + C + R], fixM[1 + C:1 + C + R]
        t_fixS, t_fixM = fixS[1 + C + R:], fixM[1 + C + R:]
        bad2 = jnp.zeros((), dtype=bool)
        p1s, p1m, _ = mt.signed_mul_shared(
            t_fixS.reshape(tpos.shape), t_fixM.reshape(tpos.shape + (W,)),
            rho_s, rho_m_safe, W2)
        p2s, p2m, _ = mt.signed_mul_outer(colS, colM, rowS, rowM, W2)
        ds, dm, _ = mt.signed_sub_vec(p1s, p1m, p2s, p2m, W2)
        qs, qm, bad3 = mt.signed_divexact_shared(
            ds, dm, rp_s, inv_p[..., :W2], tz_p, W)
        valS = valS.at[tposf].set(qs.reshape(-1))
        valM = valM.at[tposf].set(qm.reshape(-1, W))
        # pads all target the dummy slot; keep it zero
        valS = valS.at[E].set(0)
        valM = valM.at[E].set(jnp.zeros(W, jnp.int32))
        ovf = ovf | jnp.any(bad1) | jnp.any(bad2) | jnp.any(bad3)
        return (valS, valM, rho_s, rho_m_safe, inv_k, tz_k,
                signT, magT, invT, tzT, k + 1, sing, ovf), None

    carry0 = (valS, valM, jnp.int32(1), one_w,
              invT0[0], jnp.int32(0), signT0, magT0, invT0, tzT0,
              jnp.int32(0), jnp.bool_(False), jnp.bool_(False))
    carry, _ = lax.scan(
        fstep, carry0,
        (col_pos, col_hist, row_pos, row_hist, diag_pos, diag_hist,
         tile_pos, tile_hist))
    (valS, valM, _, _, _, _, signT, magT, invT, tzT, _, sing, ovf) = carry

    # --------------------- forward substitution scan ----------------------
    def sstep(carry, xs):
        XS, XM, k, ovf = carry
        (cpos, fhist, dpos_k, xk_hist) = xs
        rp_s, rp_m = signT[k], magT[k]              # rho_{k-1}
        rho_s, rho_m = signT[k + 1], magT[k + 1]    # rho_k
        # history-fix x[k]
        xkS, xkM = XS[k], XM[k]                     # [nrhs](, Ws)
        inv_h = jnp.broadcast_to(invT[xk_hist], (nrhs, Wi))
        tz_h = jnp.broadcast_to(tzT[xk_hist], (nrhs,))
        s_h = jnp.broadcast_to(signT[xk_hist], (nrhs,))
        xk_fS, xk_fM, b1 = _signed_fix(xkS, xkM, rp_s, rp_m,
                                       inv_h, tz_h, s_h, Ws)
        XS = XS.at[k].set(xk_fS)
        XM = XM.at[k].set(xk_fM)
        # history-fix the touched RHS rows
        rows = row_of[cpos]                         # [R] (pads -> n)
        riS = XS[rows]
        riM = XM[rows]
        flat_inv = invT[fhist]
        ri_fS, ri_fM, b2 = _signed_fix(
            riS.reshape(-1), riM.reshape(-1, Ws), rp_s, rp_m,
            jnp.repeat(flat_inv, nrhs, axis=0),
            jnp.repeat(tzT[fhist], nrhs), jnp.repeat(signT[fhist], nrhs), Ws)
        ri_fS = ri_fS.reshape(riS.shape)
        ri_fM = ri_fM.reshape(riM.shape)
        # IPGE: x[i] <- (rho_k * x[i] - L(i,k) * x[k]) / rho_{k-1}
        lS, lM = valS[cpos], valM[cpos]             # [R](, W)
        p1s, p1m, _ = mt.signed_mul_shared(ri_fS, ri_fM, rho_s, rho_m,
                                           W + Ws + 1)
        p2s, p2m, _ = mt.signed_mul_outer(lS, lM, xk_fS, xk_fM, W + Ws + 1)
        ds, dm, _ = mt.signed_sub_vec(p1s, p1m, p2s, p2m, W + Ws + 1)
        qs, qm, bad = mt.signed_divexact_shared(ds, dm, rp_s, invT[k],
                                                tzT[k], Ws)
        XS = XS.at[rows].set(qs)
        XM = XM.at[rows].set(qm)
        XS = XS.at[n].set(jnp.zeros(nrhs, jnp.int32))
        XM = XM.at[n].set(jnp.zeros((nrhs, Ws), jnp.int32))
        ovf = ovf | jnp.any(b1) | jnp.any(b2) | jnp.any(bad)
        return (XS, XM, k + 1, ovf), None

    carry, _ = lax.scan(sstep, (XS, XM, jnp.int32(0), ovf),
                        (col_pos, fwd_hist, diag_pos, fwd_xk_hist))
    XS, XM, _, ovf = carry

    # --------------------- scale by det = rho_{n-1} -----------------------
    XS, XM, o_det = mt.signed_mul_shared(XS, XM, signT[n], magT[n], Ws)
    ovf = ovf | jnp.any(o_det[:n])

    # ----------------------- back substitution scan -----------------------
    def bstep(carry, xs):
        XS, XM, t, ovf = carry
        (upos, urow) = xs
        j = n - 1 - t
        # x[j] <- x[j] / rho_j (exact)
        inv_j = jnp.broadcast_to(invT[j + 1], (nrhs, Wi))
        tz_j = jnp.broadcast_to(tzT[j + 1], (nrhs,))
        qM, bad = mt.divexact_gathered(XM[j], inv_j, tz_j, Ws)
        qS = XS[j] * signT[j + 1]
        qS = jnp.where(jnp.all(qM == 0, axis=-1), 0, qS)
        XS = XS.at[j].set(qS)
        XM = XM.at[j].set(qM)
        # x[i] -= U(i,j) * x[j] for the above-diagonal slots of column j
        uS, uM = valS[upos], valM[upos]             # [Umax](, W)
        pS, pM, o1 = mt.signed_mul_outer(uS, uM, qS, qM, Ws)
        riS, riM = XS[urow], XM[urow]
        nS, nM, o2 = mt.signed_sub_vec(riS, riM, pS, pM, Ws)
        XS = XS.at[urow].set(nS)
        XM = XM.at[urow].set(nM)
        XS = XS.at[n].set(jnp.zeros(nrhs, jnp.int32))
        XM = XM.at[n].set(jnp.zeros((nrhs, Ws), jnp.int32))
        ovf = ovf | jnp.any(bad) | jnp.any(o1) | jnp.any(o2)
        return (XS, XM, t + 1, ovf), None

    carry, _ = lax.scan(bstep, (XS, XM, jnp.int32(0), ovf),
                        (bwd_pos[::-1], bwd_row[::-1]))
    XS, XM, _, ovf = carry
    # ONE flat int32 result buffer (single device->host fetch; the tunnel
    # pays a large per-buffer latency):
    #   [singular, overflow, det_s, det_m (W), XS (n*nrhs), XM (n*nrhs*Ws)]
    flags = jnp.stack([sing.astype(jnp.int32), ovf.astype(jnp.int32)])
    det_s, det_m = signT[n], magT[n]
    return jnp.concatenate([flags, det_s[None], det_m,
                            XS[:n].reshape(-1), XM[:n].reshape(-1)])


def unpack_sparse_result(buf, n, nrhs, W, Ws):
    """Split the flat result of factor_solve_sparse back into parts."""
    singular, overflow = bool(buf[0]), bool(buf[1])
    o = 2
    det_s = buf[o]; o += 1
    det_m = buf[o:o + W]; o += W
    XS = buf[o:o + n * nrhs].reshape(n, nrhs); o += n * nrhs
    XM = buf[o:o + n * nrhs * Ws].reshape(n, nrhs, Ws)
    return XS, XM, det_s, det_m, singular, overflow


# ---------------------------------------------------------------------------
# packed-buffer entry point: two host->device transfers total
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n", "E", "W", "Ws", "nrhs",
                                             "rmax", "cmax", "umax"))
def factor_solve_sparse_packed(n: int, E: int, W: int, Ws: int, nrhs: int,
                               rmax: int, cmax: int, umax: int,
                               vals_buf: jnp.ndarray,
                               sched_buf: jnp.ndarray) -> jnp.ndarray:
    """factor_solve_sparse with all inputs in two flat int32 buffers.

    Every h2d transfer over the TPU tunnel pays per-buffer latency; the
    driver concatenates the (per-solve) value data and the (per-matrix,
    reusable) schedule into one buffer each. Layouts produced by
    backslash_sparse.pack_values / pack_schedule; device-side unpacking is
    free (static slices + reshapes).
    """
    o = 0

    def take(buf, off, count, shape):
        return buf[off:off + count].reshape(shape), off + count

    valS, o = take(vals_buf, o, E + 1, (E + 1,))
    valM, o = take(vals_buf, o, (E + 1) * W, (E + 1, W))
    XS, o = take(vals_buf, o, (n + 1) * nrhs, (n + 1, nrhs))
    XM, o = take(vals_buf, o, (n + 1) * nrhs * Ws, (n + 1, nrhs, Ws))

    s = 0
    col_pos, s = take(sched_buf, s, n * rmax, (n, rmax))
    col_hist, s = take(sched_buf, s, n * rmax, (n, rmax))
    row_pos, s = take(sched_buf, s, n * cmax, (n, cmax))
    row_hist, s = take(sched_buf, s, n * cmax, (n, cmax))
    diag_pos, s = take(sched_buf, s, n, (n,))
    diag_hist, s = take(sched_buf, s, n, (n,))
    tile_pos, s = take(sched_buf, s, n * rmax * cmax, (n, rmax, cmax))
    tile_hist, s = take(sched_buf, s, n * rmax * cmax, (n, rmax, cmax))
    fwd_hist, s = take(sched_buf, s, n * rmax, (n, rmax))
    fwd_xk_hist, s = take(sched_buf, s, n, (n,))
    bwd_pos, s = take(sched_buf, s, n * umax, (n, umax))
    bwd_row, s = take(sched_buf, s, n * umax, (n, umax))
    row_of, s = take(sched_buf, s, E + 1, (E + 1,))

    return factor_solve_sparse(
        n, valS, valM, XS, XM, col_pos, col_hist, row_pos, row_hist,
        diag_pos, diag_hist, tile_pos, tile_hist, fwd_hist, fwd_xk_hist,
        bwd_pos, bwd_row, row_of)
