"""Event-chunked sparse REF LU kernel (O(fill) memory and work).

Companion to tpu/schedule_events.py: scans the flat chunk stream with a
UNIFORM body — no lax.switch over chunk kinds, because a multi-way
branch materializes the full carried state (value slots, rho tables,
RHS) per chunk, which measured ~10 ms/chunk. Instead every chunk runs
the same pipeline and masks decide what sticks:

  * fix phase: history-fix the chunk's (slot, hist) events (always);
  * rho extraction: when the chunk is a step head (kind 0), event 0 is
    the diagonal — the fixed value becomes rho_k and a small-state
    lax.cond runs the Hensel lift (its operands/outputs are a few
    hundred ints, so the cond is cheap);
  * update phase: the IPGE combination runs for every chunk and a
    per-event mask (Lslot < E means a real update) selects between the
    updated and the merely-fixed value.

Unlike the padded kernel, update operands arrive as gathered pairs
(Lslot, Uslot per event), so a step with a huge tile just becomes more
chunks — no padding blowup. Bit-exact vs the host oracle and the padded
kernel (tests/test_events.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import matarith as mt


def _fix_chunk(val, GT, ev, rp_s, rp_m, W):
    """History-fix the chunk's slots to level k-1; returns fixed parts."""
    slots = ev[:, 0]
    hist = ev[:, 1]
    v = val[slots]
    g = GT[hist]
    num, _ = mt.mul_shared(v[:, 1:], rp_m, v.shape[-1] - 1 + rp_m.shape[-1])
    fixM, bad = mt.divexact_gathered(num, g[:, 2:], g[:, 1], W)
    fixS = v[:, 0] * rp_s * g[:, 0]
    fixS = jnp.where(jnp.all(fixM == 0, axis=-1), 0, fixS)
    return slots, fixS, fixM, bad


@functools.partial(jax.jit, static_argnames=("n", "E", "W", "Wi"))
def factor_events(n: int, E: int, W: int, Wi: int,
                  val: jnp.ndarray, f_kind, f_step, f_ev):
    """Run the factorization chunk stream.

    val: [E+1, 1+W] merged sign|mag slots. Returns (val, GT, SMT,
    singular, overflow) with the rho tables for the solve streams.
    """
    W2 = 2 * W + 1
    one_w = jnp.zeros(W, jnp.int32).at[0].set(1)
    gt0 = jnp.zeros((n + 1, 2 + Wi), jnp.int32).at[0, 0].set(1) \
                                               .at[0, 2].set(1)
    smt0 = jnp.zeros((n + 1, 1 + W), jnp.int32).at[0, 0].set(1) \
                                               .at[0, 1].set(1)

    def chunk_step(state, xs):
        kind, k, ev = xs
        (val, rp_s, rp_m, inv_p, tz_p, rho_s, rho_m, inv_c, tz_c,
         GT, SMT, sing, ovf) = state
        is_head = kind == 0
        # on a head, the previous step's pivot becomes the shared divisor
        rp_s = jnp.where(is_head, rho_s, rp_s)
        rp_m = jnp.where(is_head, rho_m, rp_m)
        inv_p = jnp.where(is_head, inv_c, inv_p)
        tz_p = jnp.where(is_head, tz_c, tz_p)
        # --- fix phase (all kinds)
        slots, fixS, fixM, bad1 = _fix_chunk(val, GT, ev, rp_s, rp_m, W)
        # --- rho extraction (head only; event 0 is the diagonal)
        r_s = jnp.where(is_head, fixS[0], rho_s)
        sing = sing | (is_head & (fixS[0] == 0))
        r_s = jnp.where(r_s == 0, 1, r_s)
        r_m_raw = jnp.where(is_head, fixM[0], rho_m)
        r_m = jnp.where(jnp.all(r_m_raw == 0, axis=-1), one_w, r_m_raw)
        inv_c, tz_c = lax.cond(
            is_head,
            lambda m: mt.div_precompute_hensel(m, Wi),
            lambda m: (inv_c, tz_c), r_m)
        gt_row = jnp.concatenate([r_s[None], tz_c[None], inv_c])
        smt_row = jnp.concatenate([r_s[None], r_m])
        GT = GT.at[k + 1].set(jnp.where(is_head, gt_row, GT[k + 1]))
        SMT = SMT.at[k + 1].set(jnp.where(is_head, smt_row, SMT[k + 1]))
        # --- update phase (applied only to events with a real Lslot)
        lv = val[ev[:, 2]]
        uv = val[ev[:, 3]]
        p1s, p1m, _ = mt.signed_mul_shared(fixS, fixM, r_s, r_m, W2)
        p2m, _ = mt.mul_pairwise(lv[:, 1:], uv[:, 1:], W2)
        p2s = lv[:, 0] * uv[:, 0]
        ds, dm, _ = mt.signed_sub_vec(p1s, p1m, p2s, p2m, W2)
        qs, qm, bad2 = mt.signed_divexact_shared(ds, dm, rp_s,
                                                 inv_p[..., :W2], tz_p, W)
        is_upd = (ev[:, 2] < E)
        outS = jnp.where(is_upd, qs, fixS)
        outM = jnp.where(is_upd[:, None], qm, fixM)
        val = val.at[slots].set(
            jnp.concatenate([outS[:, None], outM], axis=-1))
        val = val.at[E].set(jnp.zeros(val.shape[-1], jnp.int32))
        ovf = ovf | jnp.any(bad1) | jnp.any(bad2 & is_upd)
        return (val, rp_s, rp_m, inv_p, tz_p, r_s, r_m, inv_c, tz_c,
                GT, SMT, sing, ovf), None

    one_inv = jnp.zeros(Wi, jnp.int32).at[0].set(1)
    state0 = (val, jnp.int32(1), one_w, one_inv, jnp.int32(0),
              jnp.int32(1), one_w, one_inv, jnp.int32(0),
              gt0, smt0, jnp.bool_(False), jnp.bool_(False))
    state, _ = lax.scan(chunk_step, state0, (f_kind, f_step, f_ev))
    (val, _, _, _, _, _, _, _, _, GT, SMT, sing, ovf) = state
    return val, GT, SMT, sing, ovf


@functools.partial(jax.jit, static_argnames=("n", "E", "W", "Wi", "Ws"))
def solve_events(n: int, E: int, W: int, Wi: int, Ws: int,
                 val: jnp.ndarray, GT, SMT, X,
                 s_kind, s_step, s_ev, b_kind, b_step, b_ev):
    """Forward + determinant + backward substitution over event streams.

    X: [n+1, nrhs, 1+Ws] merged RHS (dummy row n), rows in pivot order.
    Returns (X, overflow). Same uniform-body structure as factor_events.
    """
    nrhs = X.shape[1]
    Wp = W + Ws + 1

    def x_fix(X, ev, rp_s, rp_m):
        rows = ev[:, 0]
        g = GT[ev[:, 1]]
        xi = X[rows]
        num, _ = mt.mul_shared(xi[..., 1:].reshape(-1, Ws), rp_m, Ws + W)
        fixM, bad = mt.divexact_gathered(
            num, jnp.repeat(g[:, 2:], nrhs, axis=0),
            jnp.repeat(g[:, 1], nrhs), Ws)
        fixS = (xi[..., 0] * rp_s * g[:, 0:1]).reshape(-1)
        fixS = jnp.where(jnp.all(fixM == 0, axis=-1), 0, fixS)
        return (rows, fixS.reshape(-1, nrhs),
                fixM.reshape(-1, nrhs, Ws), bad)

    def s_chunk(state, xs):
        kind, k, ev = xs
        X, xk_s, xk_m, ovf = state
        is_head = kind == 0
        rp = SMT[k]
        rho = SMT[k + 1]
        g_div = GT[k]
        rows, fS, fM, b1 = x_fix(X, ev, rp[0], rp[1:])
        xk_s = jnp.where(is_head, fS[0], xk_s)
        xk_m = jnp.where(is_head, fM[0], xk_m)
        lv = val[ev[:, 2]]
        p1s, p1m, _ = mt.signed_mul_shared(fS, fM, rho[0], rho[1:], Wp)
        p2m, _ = mt.mul_pairwise(
            jnp.repeat(lv[:, 1:], nrhs, axis=0),
            jnp.tile(xk_m, (lv.shape[0], 1)), Wp)
        p2s = (lv[:, 0:1] * xk_s[None, :]).reshape(-1)
        ds, dm, _ = mt.signed_sub_vec(
            p1s.reshape(-1), p1m.reshape(-1, Wp), p2s, p2m, Wp)
        qs, qm, bad = mt.signed_divexact_shared(ds, dm, rp[0],
                                                g_div[2:], g_div[1], Ws)
        is_upd = (ev[:, 2] < E)[:, None]
        outS = jnp.where(is_upd, qs.reshape(-1, nrhs), fS)
        outM = jnp.where(is_upd[..., None], qm.reshape(-1, nrhs, Ws), fM)
        X = X.at[rows].set(
            jnp.concatenate([outS[..., None], outM], axis=-1))
        X = X.at[n].set(jnp.zeros((nrhs, 1 + Ws), jnp.int32))
        ovf = ovf | jnp.any(b1) \
            | jnp.any(bad.reshape(-1, nrhs) & is_upd)
        return (X, xk_s, xk_m, ovf), None

    state0 = (X, jnp.zeros(nrhs, jnp.int32),
              jnp.zeros((nrhs, Ws), jnp.int32), jnp.bool_(False))
    state, _ = lax.scan(s_chunk, state0, (s_kind, s_step, s_ev))
    X, _, _, ovf = state

    # determinant scale
    det = SMT[n]
    sS, sM, o_det = mt.signed_mul_shared(X[..., 0], X[..., 1:],
                                         det[0], det[1:], Ws)
    X = jnp.concatenate([sS[..., None], sM], axis=-1)
    ovf = ovf | jnp.any(o_det[:n])

    def b_chunk(state, xs):
        kind, j, ev = xs
        X, xj_s, xj_m, ovf = state
        is_head = kind == 0
        g = GT[j + 1]
        rows = ev[:, 0]
        xi = X[rows]
        # head: divide event 0's row by rho_j
        qM, bad_div = mt.divexact_gathered(
            xi[0, :, 1:], jnp.broadcast_to(g[2:], (nrhs, Wi)),
            jnp.broadcast_to(g[1], (nrhs,)), Ws)
        qS = xi[0, :, 0] * g[0]
        qS = jnp.where(jnp.all(qM == 0, axis=-1), 0, qS)
        xj_s = jnp.where(is_head, qS, xj_s)
        xj_m = jnp.where(is_head, qM, xj_m)
        # updates: x[row] -= U * x[j] (events with a real Uslot)
        uv = val[ev[:, 2]]
        pm, _ = mt.mul_pairwise(
            jnp.repeat(uv[:, 1:], nrhs, axis=0),
            jnp.tile(xj_m, (uv.shape[0], 1)), Ws)
        ps = (uv[:, 0:1] * xj_s[None, :]).reshape(-1)
        nS, nM, o2 = mt.signed_sub_vec(
            xi[..., 0].reshape(-1), xi[..., 1:].reshape(-1, Ws), ps, pm,
            Ws)
        is_upd = (ev[:, 2] < E)[:, None]
        outS = jnp.where(is_upd, nS.reshape(-1, nrhs), xi[..., 0])
        outM = jnp.where(is_upd[..., None], nM.reshape(-1, nrhs, Ws),
                         xi[..., 1:])
        # the head writes the divided x[j] at position 0
        head0 = jnp.zeros((ev.shape[0], 1), bool).at[0, 0].set(True) \
            & is_head
        outS = jnp.where(head0, qS[None, :], outS)
        outM = jnp.where(head0[..., None], qM[None, :, :], outM)
        X = X.at[rows].set(
            jnp.concatenate([outS[..., None], outM], axis=-1))
        X = X.at[n].set(jnp.zeros((nrhs, 1 + Ws), jnp.int32))
        ovf = ovf | (is_head & jnp.any(bad_div)) \
            | jnp.any(o2.reshape(-1, nrhs) & is_upd)
        return (X, xj_s, xj_m, ovf), None

    state0 = (X, jnp.zeros(nrhs, jnp.int32),
              jnp.zeros((nrhs, Ws), jnp.int32), ovf)
    state, _ = lax.scan(b_chunk, state0, (b_kind, b_step, b_ev))
    X, _, _, ovf = state
    return X, ovf
