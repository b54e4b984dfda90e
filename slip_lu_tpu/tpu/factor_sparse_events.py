"""Event-chunked sparse REF LU kernel (O(fill) memory and work).

Companion to tpu/schedule_events.py: scans the flat chunk stream with a
three-way branch per chunk (step head / history fixes / IPGE updates).
Unlike the padded kernel (factor_sparse.py), update operands arrive as
*gathered pairs* (Lslot, Uslot per event) instead of an outer product,
so a step with a huge tile just becomes more chunks — no padding blowup.
Bit-exact vs the host oracle and the padded kernel (same slot numbering
and histories; tests/test_events.py).
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

    def head(state, ev, k):
        (val, rp_s, rp_m, inv_p, tz_p, rho_s, rho_m, inv_c, tz_c,
         GT, SMT, sing, ovf) = state
        # previous step's pivot becomes the shared divisor
        rp_s, rp_m, inv_p, tz_p = rho_s, rho_m, inv_c, tz_c
        slots, fixS, fixM, bad = _fix_chunk(val, GT, ev, rp_s, rp_m, W)
        val = val.at[slots].set(
            jnp.concatenate([fixS[:, None], fixM], axis=-1))
        val = val.at[E].set(jnp.zeros(val.shape[-1], jnp.int32))
        r_s, r_m = fixS[0], fixM[0]
        sing = sing | (r_s == 0)
        r_m_safe = jnp.where(jnp.all(r_m == 0), one_w, r_m)
        inv_k, tz_k = mt.div_precompute_hensel(r_m_safe, Wi)
        s_k = jnp.where(r_s == 0, 1, r_s)
        GT = GT.at[k + 1].set(
            jnp.concatenate([s_k[None], tz_k[None], inv_k]))
        SMT = SMT.at[k + 1].set(jnp.concatenate([s_k[None], r_m_safe]))
        ovf = ovf | jnp.any(bad)
        return (val, rp_s, rp_m, inv_p, tz_p, s_k, r_m_safe, inv_k, tz_k,
                GT, SMT, sing, ovf)

    def fix(state, ev, k):
        (val, rp_s, rp_m, inv_p, tz_p, rho_s, rho_m, inv_c, tz_c,
         GT, SMT, sing, ovf) = state
        slots, fixS, fixM, bad = _fix_chunk(val, GT, ev, rp_s, rp_m, W)
        val = val.at[slots].set(
            jnp.concatenate([fixS[:, None], fixM], axis=-1))
        val = val.at[E].set(jnp.zeros(val.shape[-1], jnp.int32))
        return (val, rp_s, rp_m, inv_p, tz_p, rho_s, rho_m, inv_c, tz_c,
                GT, SMT, sing, ovf | jnp.any(bad))

    def upd(state, ev, k):
        (val, rp_s, rp_m, inv_p, tz_p, rho_s, rho_m, inv_c, tz_c,
         GT, SMT, sing, ovf) = state
        slots, t_fixS, t_fixM, b1 = _fix_chunk(val, GT, ev, rp_s, rp_m, W)
        lv = val[ev[:, 2]]
        uv = val[ev[:, 3]]
        p1s, p1m, _ = mt.signed_mul_shared(t_fixS, t_fixM,
                                           rho_s, rho_m, W2)
        p2m, _ = mt.mul_pairwise(lv[:, 1:], uv[:, 1:], W2)
        p2s = lv[:, 0] * uv[:, 0]
        ds, dm, _ = mt.signed_sub_vec(p1s, p1m, p2s, p2m, W2)
        qs, qm, bad = mt.signed_divexact_shared(ds, dm, rp_s,
                                                inv_p[..., :W2], tz_p, W)
        val = val.at[slots].set(
            jnp.concatenate([qs[:, None], qm], axis=-1))
        val = val.at[E].set(jnp.zeros(val.shape[-1], jnp.int32))
        return (val, rp_s, rp_m, inv_p, tz_p, rho_s, rho_m, inv_c, tz_c,
                GT, SMT, sing, ovf | jnp.any(b1) | jnp.any(bad))

    def chunk_step(state, xs):
        kind, k, ev = xs
        new = lax.switch(kind, [
            lambda s: head(s, ev, k),
            lambda s: fix(s, ev, k),
            lambda s: upd(s, ev, k),
        ], state)
        return new, None

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
    Returns (X, overflow).
    """
    nrhs = X.shape[1]
    Wp = W + Ws + 1

    def x_fix(X, GT, ev, rp_s, rp_m):
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

    def s_head(state, ev, k):
        X, xk_s, xk_m, ovf = state
        rp = SMT[k]
        rows, fS, fM, bad = x_fix(X, GT, ev, rp[0], rp[1:])
        X = X.at[rows].set(
            jnp.concatenate([fS[..., None], fM], axis=-1))
        X = X.at[n].set(jnp.zeros((nrhs, 1 + Ws), jnp.int32))
        return (X, fS[0], fM[0], ovf | jnp.any(bad))

    def s_upd(state, ev, k):
        X, xk_s, xk_m, ovf = state
        rp = SMT[k]
        rho = SMT[k + 1]
        g_div = GT[k]
        rows, fS, fM, b1 = x_fix(X, GT, ev, rp[0], rp[1:])
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
        X = X.at[rows].set(jnp.concatenate(
            [qs.reshape(-1, nrhs)[..., None],
             qm.reshape(-1, nrhs, Ws)], axis=-1))
        X = X.at[n].set(jnp.zeros((nrhs, 1 + Ws), jnp.int32))
        return (X, xk_s, xk_m, ovf | jnp.any(b1) | jnp.any(bad))

    def s_chunk(state, xs):
        kind, k, ev = xs
        new = lax.switch(kind // 2, [
            lambda s: s_head(s, ev, k),
            lambda s: s_upd(s, ev, k),
        ], state)
        return new, None

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

    def b_head(state, ev, j):
        X, xj_s, xj_m, ovf = state
        g = GT[j + 1]
        row = ev[0, 0]
        xi = X[row]
        qM, bad = mt.divexact_gathered(
            xi[:, 1:], jnp.broadcast_to(g[2:], (nrhs, Wi)),
            jnp.broadcast_to(g[1], (nrhs,)), Ws)
        qS = xi[:, 0] * g[0]
        qS = jnp.where(jnp.all(qM == 0, axis=-1), 0, qS)
        X = X.at[row].set(jnp.concatenate([qS[:, None], qM], axis=-1))
        return (X, qS, qM, ovf | jnp.any(bad))

    def b_upd(state, ev, j):
        X, xj_s, xj_m, ovf = state
        rows = ev[:, 0]
        uv = val[ev[:, 2]]
        pm, o1 = mt.mul_pairwise(
            jnp.repeat(uv[:, 1:], nrhs, axis=0),
            jnp.tile(xj_m, (uv.shape[0], 1)), Ws)
        ps = (uv[:, 0:1] * xj_s[None, :]).reshape(-1)
        xi = X[rows]
        nS, nM, o2 = mt.signed_sub_vec(
            xi[..., 0].reshape(-1), xi[..., 1:].reshape(-1, Ws),
            ps, pm, Ws)
        X = X.at[rows].set(jnp.concatenate(
            [nS.reshape(-1, nrhs)[..., None],
             nM.reshape(-1, nrhs, Ws)], axis=-1))
        X = X.at[n].set(jnp.zeros((nrhs, 1 + Ws), jnp.int32))
        return (X, xj_s, xj_m, ovf | jnp.any(o1) | jnp.any(o2))

    def b_chunk(state, xs):
        kind, j, ev = xs
        new = lax.switch(kind // 2, [
            lambda s: b_head(s, ev, j),
            lambda s: b_upd(s, ev, j),
        ], state)
        return new, None

    state0 = (X, jnp.zeros(nrhs, jnp.int32),
              jnp.zeros((nrhs, Ws), jnp.int32), ovf)
    state, _ = lax.scan(b_chunk, state0, (b_kind, b_step, b_ev))
    X, _, _, ovf = state
    return X, ovf
