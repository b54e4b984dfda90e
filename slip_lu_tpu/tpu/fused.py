"""Fused factor+solve: one device program, one host round-trip.

The reference runs factorize and solve as separate host calls
(SLIP_LU_factorize.c / SLIP_LU_solve.c); on TPU every host<->device
round-trip costs real latency (dispatch + transfer), so the full numeric
phase — factorization, RHS row permutation, forward/back substitution,
determinant extraction — is fused into a single jitted program. The host
packs inputs once, dispatches once, and fetches (solution, det, rowidx,
flags) in one batched device_get.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .factor import factor_dense_limbs
from .solve import solve_dense_limbs


@functools.partial(jax.jit, static_argnames=("scheme", "tol_shift"))
def factor_solve_dense(S: jnp.ndarray, M: jnp.ndarray, qcols: jnp.ndarray,
                       VS0: jnp.ndarray, VM0: jnp.ndarray, scheme: int,
                       tol_num_mag: jnp.ndarray, tol_shift: int):
    """Factor A (packed, column-permuted) and solve for RHS block on device.

    VS0/VM0: RHS in *natural* row order at solve width Ws; the pivot-order
    permutation happens on device using the factorization's rowidx.
    Returns (XS, XM, det_s, det_m, rowidx, singular, f_ovf, s_ovf).
    """
    n = S.shape[0]
    FS, FM, rowidx, singular, f_ovf = factor_dense_limbs(
        S, M, qcols, scheme, tol_num_mag, tol_shift)
    VS = jnp.take(VS0, rowidx, axis=0)
    VM = jnp.take(VM0, rowidx, axis=0)
    XS, XM, s_ovf = solve_dense_limbs(FS, FM, VS, VM)
    det_s, det_m = FS[n - 1, n - 1], FM[n - 1, n - 1]
    return XS, XM, det_s, det_m, rowidx, singular, f_ovf, s_ovf
