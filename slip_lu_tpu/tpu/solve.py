"""Device REF substitution: dense-RHS forward/back solve in limb arithmetic.

Reference parity: slip_forward_sub.c (dense-RHS IPGE forward substitution,
HOT LOOP #2), slip_matrix_mul.c (scale by rho_{n-1}), slip_back_sub.c
(exact integer back substitution). Right-looking dense form on device —
no history vector needed because every row is touched at every step; the
resulting integers equal the reference's left-looking values exactly.

Per step everything is shared-operand Toeplitz-matmul arithmetic
(ops/matarith.py): rho×X, the L-column × X-row outer product, and exact
division by rho via its per-step Hensel inverse.

Inputs come from tpu.factor.factor_dense_limbs: the packed LU tensor
(FS, FM) whose diagonal is rhos, strict lower is L, upper is U.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import matarith as mt


@jax.jit
def solve_dense_limbs(FS: jnp.ndarray, FM: jnp.ndarray,
                      VS: jnp.ndarray, VM: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Solve U x_hat = rho_{n-1} * forward_sub(L, P b) on device.

    FS/FM: [n, n(, W)] packed LU; VS/VM: [n, nrhs(, Ws)] RHS already
    permuted into pivot order. Returns (XS, XM, overflow) where x_hat is
    the integer solution scaled by det = rho_{n-1}; the exact rational
    solution is x_hat / det (host divides).
    """
    n, _, W = FM.shape
    _, nrhs, Ws = VM.shape
    Wp = W + Ws + 1  # product / intermediate width
    rows = jnp.arange(n, dtype=jnp.int32)
    one_mag = jnp.zeros(W, jnp.int32).at[0].set(1)

    # ---- forward substitution (rows process in pivot order) ----
    def fwd_body(k, state):
        VS, VM, rp_s, rp_m, ovf = state
        rho_s, rho_m = FS[k, k], FM[k, k]
        rho_m_safe = jnp.where(jnp.all(rho_m == 0), one_mag, rho_m)
        vk_s, vk_m = VS[k], VM[k]                     # [nrhs], [nrhs, Ws]
        l_s, l_m = FS[:, k], FM[:, k]                 # [n], [n, W]
        p1s, p1m, _ = mt.signed_mul_shared(VS, VM, rho_s, rho_m_safe, Wp)
        p2s, p2m, _ = mt.signed_mul_outer(l_s, l_m, vk_s, vk_m, Wp)
        ds, dm, _ = mt.signed_sub_vec(p1s, p1m, p2s, p2m, Wp)
        inv, tz = mt.div_precompute_hensel(rp_m, Wp)
        qs, qm, bad = mt.signed_divexact_shared(ds, dm, rp_s, inv, tz, Ws)
        mask = (rows > k)[:, None]                    # [n, 1] over rhs
        VS = jnp.where(mask, qs, VS)
        VM = jnp.where(mask[..., None], qm, VM)
        ovf = ovf | jnp.any(mask & bad)
        return (VS, VM, rho_s, rho_m_safe, ovf)

    state = (VS, VM, jnp.int32(1), one_mag, jnp.bool_(False))
    VS, VM, _, _, ovf = lax.fori_loop(0, n, fwd_body, state)

    # ---- scale by the determinant rho_{n-1} ----
    det_s, det_m = FS[n - 1, n - 1], FM[n - 1, n - 1]
    VS, VM, o_det = mt.signed_mul_shared(VS, VM, det_s, det_m, Ws)
    ovf = ovf | jnp.any(o_det)

    # ---- back substitution ----
    def bwd_body(t, state):
        VS, VM, ovf = state
        j = n - 1 - t
        rho_s, rho_m = FS[j, j], FM[j, j]
        rho_m_safe = jnp.where(jnp.all(rho_m == 0), one_mag, rho_m)
        inv, tz = mt.div_precompute_hensel(rho_m_safe, Ws)
        xj_s, xj_m, bad = mt.signed_divexact_shared(VS[j], VM[j], rho_s,
                                                    inv, tz, Ws)
        VS = VS.at[j].set(xj_s)
        VM = VM.at[j].set(xj_m)
        u_s, u_m = FS[:, j], FM[:, j]                 # [n], [n, W]
        ps, pm, o1 = mt.signed_mul_outer(u_s, u_m, xj_s, xj_m, Ws)
        ns, nm, o2 = mt.signed_sub_vec(VS, VM, ps, pm, Ws)
        mask = (rows < j)[:, None]
        VS = jnp.where(mask, ns, VS)
        VM = jnp.where(mask[..., None], nm, VM)
        ovf = ovf | jnp.any(bad) | jnp.any(mask & (o1 | o2))
        return (VS, VM, ovf)

    VS, VM, ovf = lax.fori_loop(0, n, bwd_body, (VS, VM, ovf))
    return VS, VM, ovf
