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

    Internally signs ride as column 0 of merged value/RHS arrays and the
    rho tables merge into two (gathered: sign|tz|inv; per-step fetched:
    sign|mag) — every gather/scatter/table fetch on this runtime pays a
    fixed ~100us, so halving their count per step matters more than the
    arithmetic. Returns one flat int32 result buffer:
      [singular, overflow, det_s, det_m (W), XS (n*nrhs), XM (n*nrhs*Ws)]
    """
    E = valS.shape[0] - 1
    W = valM.shape[-1]
    Ws = XM.shape[-1]
    W2 = 2 * W + 1
    # Inverse-table width serves factor AND solve divisions. It must cover
    # the WIDEST numerator fed to a divexact (forward-sub IPGE: W+Ws+1
    # limbs) — if Wi were smaller, a quotient wider than Wi limbs would
    # wrap mod 2**(16*Wi) and truncate_mag could never flag it (silent
    # wrong answer when options.max_limbs clamps the analytic bounds).
    Wi = max(W2, W + Ws + 1)
    nrhs = XS.shape[-1]

    one_w = jnp.zeros(W, jnp.int32).at[0].set(1)
    val = jnp.concatenate([valS[:, None], valM], axis=-1)   # [E+1, 1+W]
    X = jnp.concatenate([XS[..., None], XM], axis=-1)       # [n+1, nrhs, 1+Ws]
    # gathered table: [n+1, 2+Wi] = sign | tz | inverse; index h+1 = rho_h
    gt0 = jnp.zeros((n + 1, 2 + Wi), jnp.int32)
    gt0 = gt0.at[0, 0].set(1).at[0, 2].set(1)
    # per-step table: [n+1, 1+W] = sign | magnitude
    smt0 = jnp.zeros((n + 1, 1 + W), jnp.int32)
    smt0 = smt0.at[0, 0].set(1).at[0, 1].set(1)

    # ------------------------- factorization scan -------------------------
    def fstep(carry, xs):
        val, X, rp_s, rp_m, inv_p, tz_p, GT, SMT, k, sing, ovf = carry
        (cpos, chist, rpos, rhist, dpos, dhist, tpos, thist,
         fhist, xk_hist) = xs
        R = cpos.shape[0]
        C = rpos.shape[0]
        tposf = tpos.reshape(-1)
        thistf = thist.reshape(-1)
        # --- ONE batched gather + history fix for diag, pivot row, pivot
        # column, and update tile (every history level is < k, so all
        # fixes can run before this step's pivot inverse exists)
        allpos = jnp.concatenate([dpos[None], rpos, cpos, tposf])
        allhist = jnp.concatenate([dhist[None], rhist, chist, thistf])
        v = val[allpos]
        g = GT[allhist]
        fixS, fixM, bad1 = _signed_fix(v[:, 0], v[:, 1:], rp_s, rp_m,
                                       g[:, 2:], g[:, 1], g[:, 0], W)
        fix = jnp.concatenate([fixS[:, None], fixM], axis=-1)
        val = val.at[allpos[:1 + C + R]].set(fix[:1 + C + R])
        rho_s, rho_m = fixS[0], fixM[0]
        sing = sing | (rho_s == 0)
        rho_m_safe = jnp.where(jnp.all(rho_m == 0), one_w, rho_m)
        inv_k, tz_k = mt.div_precompute_hensel(rho_m_safe, Wi)
        sign_k = jnp.where(rho_s == 0, 1, rho_s)
        GT = GT.at[k + 1].set(jnp.concatenate(
            [sign_k[None], tz_k[None], inv_k]))
        SMT = SMT.at[k + 1].set(jnp.concatenate(
            [sign_k[None], rho_m_safe]))
        # --- IPGE update of the (already fixed) tile
        rowS, rowM = fixS[1:1 + C], fixM[1:1 + C]
        colS, colM = fixS[1 + C:1 + C + R], fixM[1 + C:1 + C + R]
        t_fixS, t_fixM = fixS[1 + C + R:], fixM[1 + C + R:]
        p1s, p1m, _ = mt.signed_mul_shared(
            t_fixS.reshape(tpos.shape), t_fixM.reshape(tpos.shape + (W,)),
            rho_s, rho_m_safe, W2)
        p2s, p2m, _ = mt.signed_mul_outer(colS, colM, rowS, rowM, W2)
        ds, dm, _ = mt.signed_sub_vec(p1s, p1m, p2s, p2m, W2)
        qs, qm, bad3 = mt.signed_divexact_shared(
            ds, dm, rp_s, inv_p[..., :W2], tz_p, W)
        q = jnp.concatenate([qs.reshape(-1)[:, None], qm.reshape(-1, W)],
                            axis=-1)
        val = val.at[tposf].set(q)
        # pads all target the dummy slot; keep it zero
        val = val.at[E].set(jnp.zeros(1 + W, jnp.int32))
        # --- forward substitution rides the same step (the reference's
        # left-looking style): x[k] and the touched RHS rows history-fix
        # in one batch, then IPGE with the L column already in registers
        rows = row_of[cpos]                          # [R] (pads -> n)
        xrows = jnp.concatenate([jnp.reshape(k, (1,)), rows])
        gh = GT[jnp.concatenate([xk_hist[None], fhist])]
        xi = X[xrows]                                # [1+R, nrhs, 1+Ws]
        fSx, fMx, b1 = _signed_fix(
            xi[..., 0].reshape(-1), xi[..., 1:].reshape(-1, Ws),
            rp_s, rp_m,
            jnp.repeat(gh[:, 2:], nrhs, axis=0),
            jnp.repeat(gh[:, 1], nrhs), jnp.repeat(gh[:, 0], nrhs), Ws)
        fSx = fSx.reshape(1 + R, nrhs)
        fMx = fMx.reshape(1 + R, nrhs, Ws)
        xk_fS, xk_fM = fSx[0], fMx[0]
        x1s, x1m, _ = mt.signed_mul_shared(fSx[1:], fMx[1:],
                                           sign_k, rho_m_safe, W + Ws + 1)
        x2s, x2m, _ = mt.signed_mul_outer(colS, colM, xk_fS, xk_fM,
                                          W + Ws + 1)
        xds, xdm, _ = mt.signed_sub_vec(x1s, x1m, x2s, x2m, W + Ws + 1)
        xqs, xqm, xbad = mt.signed_divexact_shared(xds, xdm, rp_s,
                                                   inv_p, tz_p, Ws)
        newS = jnp.concatenate([xk_fS[None], xqs])
        newM = jnp.concatenate([xk_fM[None], xqm])
        X = X.at[xrows].set(
            jnp.concatenate([newS[..., None], newM], axis=-1))
        X = X.at[n].set(jnp.zeros((nrhs, 1 + Ws), jnp.int32))
        ovf = ovf | jnp.any(bad1) | jnp.any(bad3) | jnp.any(b1) \
            | jnp.any(xbad)
        return (val, X, rho_s, rho_m_safe, inv_k, tz_k,
                GT, SMT, k + 1, sing, ovf), None

    carry0 = (val, X, jnp.int32(1), one_w, gt0[0, 2:], jnp.int32(0),
              gt0, smt0, jnp.int32(0), jnp.bool_(False), jnp.bool_(False))
    carry, _ = lax.scan(
        fstep, carry0,
        (col_pos, col_hist, row_pos, row_hist, diag_pos, diag_hist,
         tile_pos, tile_hist, fwd_hist, fwd_xk_hist))
    (val, X, _, _, _, _, GT, SMT, _, sing, ovf) = carry

    # --------------------- scale by det = rho_{n-1} -----------------------
    det_s, det_m = SMT[n, 0], SMT[n, 1:]
    sS, sM, o_det = mt.signed_mul_shared(X[..., 0], X[..., 1:],
                                         det_s, det_m, Ws)
    X = jnp.concatenate([sS[..., None], sM], axis=-1)
    ovf = ovf | jnp.any(o_det[:n])

    # ----------------------- back substitution scan -----------------------
    def bstep(carry, xs):
        X, t, ovf = carry
        (upos, urow) = xs
        j = n - 1 - t
        g_j = GT[j + 1]                              # rho_j: sign|tz|inv
        # ONE gather: x[j] plus the update-target rows
        xrows = jnp.concatenate([jnp.reshape(j, (1,)), urow])
        xi = X[xrows]
        # x[j] <- x[j] / rho_j (exact)
        inv_j = jnp.broadcast_to(g_j[2:], (nrhs, Wi))
        tz_j = jnp.broadcast_to(g_j[1], (nrhs,))
        qM, bad = mt.divexact_gathered(xi[0, :, 1:], inv_j, tz_j, Ws)
        qS = xi[0, :, 0] * g_j[0]
        qS = jnp.where(jnp.all(qM == 0, axis=-1), 0, qS)
        # x[i] -= U(i,j) * x[j] for the above-diagonal slots of column j
        uv = val[upos]                               # [Umax, 1+W]
        pS, pM, o1 = mt.signed_mul_outer(uv[:, 0], uv[:, 1:], qS, qM, Ws)
        nS, nM, o2 = mt.signed_sub_vec(xi[1:, :, 0], xi[1:, :, 1:],
                                       pS, pM, Ws)
        newS = jnp.concatenate([qS[None], nS])
        newM = jnp.concatenate([qM[None], nM])
        X = X.at[xrows].set(
            jnp.concatenate([newS[..., None], newM], axis=-1))
        X = X.at[n].set(jnp.zeros((nrhs, 1 + Ws), jnp.int32))
        ovf = ovf | jnp.any(bad) | jnp.any(o1) | jnp.any(o2)
        return (X, t + 1, ovf), None

    carry, _ = lax.scan(bstep, (X, jnp.int32(0), ovf),
                        (bwd_pos[::-1], bwd_row[::-1]))
    X, _, ovf = carry
    # ONE flat int32 result buffer (single device->host fetch; the tunnel
    # pays a large per-buffer latency):
    #   [singular, overflow, det_s, det_m (W), XS (n*nrhs), XM (n*nrhs*Ws)]
    flags = jnp.stack([sing.astype(jnp.int32), ovf.astype(jnp.int32)])
    return jnp.concatenate([flags, det_s[None], det_m,
                            X[:n, :, 0].reshape(-1),
                            X[:n, :, 1:].reshape(-1)])


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
