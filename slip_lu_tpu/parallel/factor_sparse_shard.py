"""Sharded scheduled sparse REF LU + substitution (shard_map).

The multi-chip twin of tpu/factor_sparse.py over the split schedules of
schedule_shard.py. Per elimination step:

  * the pivot-row owner (chip k mod p) history-fixes the diagonal and
    pivot row locally; the fixed values broadcast with one integer psum
    (non-owners contribute exact zeros — their schedule slots are pads);
  * rho/inverse tables update replicated (same broadcast rho on every
    chip, so the tables stay bit-identical without communication);
  * pivot-column fixes and the IPGE tile update are chip-local (every
    value slot lives with its row).

Communication per step is O(cmax * W + nrhs * Ws) — the pivot row and
one RHS row — over ICI; all O(fill * W^2) limb arithmetic is local.
Integer collectives keep every topology bit-identical to the
single-chip kernel (asserted in tests/test_sharded_sparse.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import matarith as mt
from ..tpu.factor_sparse import _signed_fix
from .shard import ROWS_AXIS, mesh_axes


def _sparse_local(valS, valM, XS, XM,
                  col_pos, col_hist, tile_pos, tile_hist,
                  row_pos, row_hist, row_valid, diag_pos, diag_hist,
                  fwd_rows, fwd_hist, fwd_xk_hist, bwd_pos, bwd_row,
                  row_owner_row, *, n: int, p: int, axes: tuple,
                  rows_size: int):
    """Per-chip body under shard_map. Leading [1, ...] blocks squeezed.

    `axes` is the tuple of mesh axis names rows are cyclically spread
    over (('rows',) or ('dcn', 'rows')); every collective reduces over
    the whole tuple, so the program is topology-independent bit for bit.
    """
    def _bcast(x, mask_val):
        # replicate the owner's values: psum of owner-masked contributions
        return lax.psum(x * mask_val, axes)
    squeeze = lambda a: a.reshape(a.shape[1:])
    valS, valM = squeeze(valS), squeeze(valM)
    XS, XM = squeeze(XS), squeeze(XM)
    col_pos, col_hist = squeeze(col_pos), squeeze(col_hist)
    tile_pos, tile_hist = squeeze(tile_pos), squeeze(tile_hist)
    row_pos, row_hist = squeeze(row_pos), squeeze(row_hist)
    row_valid = squeeze(row_valid)
    diag_pos, diag_hist = squeeze(diag_pos), squeeze(diag_hist)
    fwd_rows, fwd_hist = squeeze(fwd_rows), squeeze(fwd_hist)
    bwd_pos, bwd_row = squeeze(bwd_pos), squeeze(bwd_row)

    e_loc = valS.shape[0] - 1
    W = valM.shape[-1]
    nloc = XS.shape[0] - 1
    nrhs = XS.shape[-1]
    Ws = XM.shape[-1]
    W2 = 2 * W + 1
    Wi = max(W2, Ws)
    dev = lax.axis_index(axes[0])
    for ax in axes[1:]:
        dev = dev * rows_size + lax.axis_index(ax)
    one_w = jnp.zeros(W, jnp.int32).at[0].set(1)

    signT0 = jnp.zeros(n + 1, jnp.int32).at[0].set(1)
    magT0 = jnp.zeros((n + 1, W), jnp.int32).at[0, 0].set(1)
    invT0 = jnp.zeros((n + 1, Wi), jnp.int32).at[0, 0].set(1)
    tzT0 = jnp.zeros(n + 1, jnp.int32)

    # ------------------------- factorization scan -------------------------
    def fstep(carry, xs):
        (valS, valM, rp_s, rp_m, inv_p, tz_p, signT, magT, invT, tzT,
         k, sing, ovf) = carry
        (cpos, chist, tpos, thist, rpos, rhist, rvalid, dpos, dhist) = xs
        owner = (k % p) == dev
        mask = owner.astype(jnp.int32)
        R = cpos.shape[0]
        C = rpos.shape[0]
        tposf = tpos.reshape(-1)
        thistf = thist.reshape(-1)
        del rvalid  # pad columns are implicit: broadcast row is 0 there
        # --- ONE batched history fix: diag + pivot row (owner's slots;
        # pads elsewhere -> zeros) + local pivot column + local tile
        allpos = jnp.concatenate([dpos[None], rpos, cpos, tposf])
        allhist = jnp.concatenate([dhist[None], rhist, chist, thistf])
        vS, vM = valS[allpos], valM[allpos]
        fixS, fixM, bad1 = _signed_fix(vS, vM, rp_s, rp_m,
                                       invT[allhist], tzT[allhist],
                                       signT[allhist], W)
        valS = valS.at[allpos[:1 + C + R]].set(fixS[:1 + C + R])
        valM = valM.at[allpos[:1 + C + R]].set(fixM[:1 + C + R])
        # --- broadcast the fixed pivot row + rho
        bS = _bcast(fixS[:1 + C], mask)
        bM = _bcast(fixM[:1 + C], mask)
        rho_s, rho_m = bS[0], bM[0]
        rowS, rowM = bS[1:], bM[1:]
        sing = sing | (rho_s == 0)
        rho_m_safe = jnp.where(jnp.all(rho_m == 0), one_w, rho_m)
        inv_k, tz_k = mt.div_precompute_hensel(rho_m_safe, Wi)
        signT = signT.at[k + 1].set(jnp.where(rho_s == 0, 1, rho_s))
        magT = magT.at[k + 1].set(rho_m_safe)
        invT = invT.at[k + 1].set(inv_k)
        tzT = tzT.at[k + 1].set(tz_k)
        # --- IPGE update of the (already fixed) tile
        colS, colM = fixS[1 + C:1 + C + R], fixM[1 + C:1 + C + R]
        t_fixS, t_fixM = fixS[1 + C + R:], fixM[1 + C + R:]
        bad2 = jnp.zeros((), dtype=bool)
        bad3 = jnp.zeros((), dtype=bool)
        p1s, p1m, _ = mt.signed_mul_shared(
            t_fixS.reshape(tpos.shape), t_fixM.reshape(tpos.shape + (W,)),
            rho_s, rho_m_safe, W2)
        p2s, p2m, _ = mt.signed_mul_outer(colS, colM, rowS, rowM, W2)
        ds, dm, _ = mt.signed_sub_vec(p1s, p1m, p2s, p2m, W2)
        qs, qm, bad4 = mt.signed_divexact_shared(
            ds, dm, rp_s, inv_p[..., :W2], tz_p, W)
        valS = valS.at[tposf].set(qs.reshape(-1))
        valM = valM.at[tposf].set(qm.reshape(-1, W))
        valS = valS.at[e_loc].set(0)
        valM = valM.at[e_loc].set(jnp.zeros(W, jnp.int32))
        ovf = ovf | jnp.any(bad1) | jnp.any(bad2) | jnp.any(bad3) \
            | jnp.any(bad4 & (tpos < e_loc))
        return (valS, valM, rho_s, rho_m_safe, inv_k, tz_k,
                signT, magT, invT, tzT, k + 1, sing, ovf), None

    carry0 = (valS, valM, jnp.int32(1), one_w,
              invT0[0], jnp.int32(0), signT0, magT0, invT0, tzT0,
              jnp.int32(0), jnp.bool_(False), jnp.bool_(False))
    carry, _ = lax.scan(
        fstep, carry0,
        (col_pos, col_hist, tile_pos, tile_hist, row_pos, row_hist,
         row_valid, diag_pos, diag_hist))
    (valS, valM, _, _, _, _, signT, magT, invT, tzT, _, sing, ovf) = carry

    # --------------------- forward substitution scan ----------------------
    def sstep(carry, xs):
        XS, XM, k, ovf = carry
        (cpos, frow, fhist, xk_row, xk_hist) = xs
        owner = (k % p) == dev
        mask = owner.astype(jnp.int32)
        rp_s, rp_m = signT[k], magT[k]
        rho_s, rho_m = signT[k + 1], magT[k + 1]
        # owner fixes x[k], broadcast
        loc = jnp.where(owner, xk_row, nloc)
        xkS, xkM = XS[loc], XM[loc]
        inv_h = jnp.broadcast_to(invT[xk_hist], (nrhs, Wi))
        tz_h = jnp.broadcast_to(tzT[xk_hist], (nrhs,))
        s_h = jnp.broadcast_to(signT[xk_hist], (nrhs,))
        xk_fS, xk_fM, b1 = _signed_fix(xkS, xkM, rp_s, rp_m,
                                       inv_h, tz_h, s_h, Ws)
        xk_fS = jnp.where(owner, xk_fS, 0)
        xk_fM = jnp.where(owner, xk_fM, 0)
        XS = XS.at[loc].set(jnp.where(owner, xk_fS, XS[loc]))
        XM = XM.at[loc].set(jnp.where(owner, xk_fM, XM[loc]))
        xk_bS = lax.psum(xk_fS, axes)
        xk_bM = lax.psum(xk_fM, axes)
        # local RHS rows touched by L(:, k)
        riS, riM = XS[frow], XM[frow]
        flat_inv = invT[fhist]
        ri_fS, ri_fM, b2 = _signed_fix(
            riS.reshape(-1), riM.reshape(-1, Ws), rp_s, rp_m,
            jnp.repeat(flat_inv, nrhs, axis=0),
            jnp.repeat(tzT[fhist], nrhs), jnp.repeat(signT[fhist], nrhs),
            Ws)
        ri_fS = ri_fS.reshape(riS.shape)
        ri_fM = ri_fM.reshape(riM.shape)
        lS, lM = valS[cpos], valM[cpos]
        p1s, p1m, _ = mt.signed_mul_shared(ri_fS, ri_fM, rho_s, rho_m,
                                           W + Ws + 1)
        p2s, p2m, _ = mt.signed_mul_outer(lS, lM, xk_bS, xk_bM, W + Ws + 1)
        ds, dm, _ = mt.signed_sub_vec(p1s, p1m, p2s, p2m, W + Ws + 1)
        qs, qm, bad = mt.signed_divexact_shared(ds, dm, rp_s, invT[k],
                                                tzT[k], Ws)
        XS = XS.at[frow].set(qs)
        XM = XM.at[frow].set(qm)
        XS = XS.at[nloc].set(jnp.zeros(nrhs, jnp.int32))
        XM = XM.at[nloc].set(jnp.zeros((nrhs, Ws), jnp.int32))
        ovf = ovf | jnp.any(b1 & owner) | jnp.any(b2) \
            | jnp.any(bad & (frow < nloc)[:, None])
        return (XS, XM, k + 1, ovf), None

    carry, _ = lax.scan(
        sstep, (XS, XM, jnp.int32(0), ovf),
        (col_pos, fwd_rows, fwd_hist, row_owner_row, fwd_xk_hist))
    XS, XM, _, ovf = carry

    # --------------------- scale by det = rho_{n-1} -----------------------
    XS, XM, o_det = mt.signed_mul_shared(XS, XM, signT[n], magT[n], Ws)
    ovf = ovf | jnp.any(o_det[:nloc])

    # ----------------------- back substitution scan -----------------------
    def bstep(carry, xs):
        XS, XM, t, ovf = carry
        (upos, urow, xj_row) = xs
        j = n - 1 - t
        owner = (j % p) == dev
        # x[j] <- x[j] / rho_j, computed replicated from a broadcast
        loc = jnp.where(owner, xj_row, nloc)
        xjS = lax.psum(XS[loc] * owner.astype(jnp.int32), axes)
        xjM = lax.psum(XM[loc] * owner.astype(jnp.int32), axes)
        inv_j = jnp.broadcast_to(invT[j + 1], (nrhs, Wi))
        tz_j = jnp.broadcast_to(tzT[j + 1], (nrhs,))
        qM, bad = mt.divexact_gathered(xjM, inv_j, tz_j, Ws)
        qS = xjS * signT[j + 1]
        qS = jnp.where(jnp.all(qM == 0, axis=-1), 0, qS)
        XS = XS.at[loc].set(jnp.where(owner, qS, XS[loc]))
        XM = XM.at[loc].set(jnp.where(owner, qM, XM[loc]))
        # local updates x[i] -= U(i,j) * x[j]
        uS, uM = valS[upos], valM[upos]
        pS, pM, o1 = mt.signed_mul_outer(uS, uM, qS, qM, Ws)
        riS, riM = XS[urow], XM[urow]
        nS, nM, o2 = mt.signed_sub_vec(riS, riM, pS, pM, Ws)
        XS = XS.at[urow].set(nS)
        XM = XM.at[urow].set(nM)
        XS = XS.at[nloc].set(jnp.zeros(nrhs, jnp.int32))
        XM = XM.at[nloc].set(jnp.zeros((nrhs, Ws), jnp.int32))
        ovf = ovf | jnp.any(bad) | jnp.any((o1 | o2) & (upos < e_loc)[:, None])
        return (XS, XM, t + 1, ovf), None

    carry, _ = lax.scan(
        bstep, (XS, XM, jnp.int32(0), ovf),
        (bwd_pos[::-1], bwd_row[::-1], row_owner_row[::-1]))
    XS, XM, _, ovf = carry

    # --- gather the distributed solution; pack one replicated result buffer
    sing = lax.psum(sing.astype(jnp.int32), axes) > 0
    ovf = lax.psum(ovf.astype(jnp.int32), axes) > 0
    x_all_S = lax.all_gather(XS[:nloc], axes)   # [p, nloc, nrhs]
    x_all_M = lax.all_gather(XM[:nloc], axes)
    flags = jnp.stack([sing.astype(jnp.int32), ovf.astype(jnp.int32)])
    det_s, det_m = signT[n], magT[n]
    return jnp.concatenate([flags, det_s[None], det_m,
                            x_all_S.reshape(-1), x_all_M.reshape(-1)])


@functools.partial(jax.jit,
                   static_argnames=("mesh", "n", "p"))
def factor_solve_sparse_sharded(mesh: Mesh, n: int, p: int,
                                valS, valM, XS, XM,
                                col_pos, col_hist, tile_pos, tile_hist,
                                row_pos, row_hist, row_valid,
                                diag_pos, diag_hist,
                                fwd_rows, fwd_hist, fwd_xk_hist,
                                bwd_pos, bwd_row, row_owner_row):
    """shard_map entry. Chip-stacked arrays have leading axis p.

    Returns one replicated flat int32 buffer:
      [singular, overflow, det_s, det_m (W), XS (p*nloc*nrhs),
       XM (p*nloc*nrhs*Ws)]  — X in chip-major (cyclic) row order.
    """
    axes = mesh_axes(mesh)
    rows_size = mesh.devices.shape[-1]
    sharded = lambda a: P(axes, *([None] * (a - 1)))
    fn = jax.shard_map(
        functools.partial(_sparse_local, n=n, p=p, axes=axes,
                          rows_size=rows_size),
        mesh=mesh,
        in_specs=(sharded(2), sharded(3), sharded(3), sharded(4),
                  sharded(3), sharded(3), sharded(4), sharded(4),
                  sharded(3), sharded(3), sharded(3),
                  sharded(2), sharded(2),
                  sharded(3), sharded(3), P(),
                  sharded(3), sharded(3), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(valS, valM, XS, XM, col_pos, col_hist, tile_pos, tile_hist,
              row_pos, row_hist, row_valid, diag_pos, diag_hist,
              fwd_rows, fwd_hist, fwd_xk_hist, bwd_pos, bwd_row,
              row_owner_row)
