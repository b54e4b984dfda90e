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

    Returns ONE flat int32 buffer (device->host transfers over the TPU
    tunnel pay a large per-buffer latency, so everything the host needs
    rides one fetch):
      [singular, f_ovf, s_ovf, det_s, det_m (W), rowidx (n),
       XS (n*nrhs), XM (n*nrhs*Ws)]
    Unpack with unpack_dense_result(buf, n, nrhs, W, Ws).
    """
    n = S.shape[0]
    FS, FM, rowidx, singular, f_ovf = factor_dense_limbs(
        S, M, qcols, scheme, tol_num_mag, tol_shift)
    VS = jnp.take(VS0, rowidx, axis=0)
    VM = jnp.take(VM0, rowidx, axis=0)
    XS, XM, s_ovf = solve_dense_limbs(FS, FM, VS, VM)
    det_s, det_m = FS[n - 1, n - 1], FM[n - 1, n - 1]
    flags = jnp.stack([singular.astype(jnp.int32),
                       f_ovf.astype(jnp.int32),
                       s_ovf.astype(jnp.int32)])
    return jnp.concatenate([flags, det_s[None], det_m, rowidx,
                            XS.reshape(-1), XM.reshape(-1)])


def unpack_dense_result(buf, n, nrhs, W, Ws):
    """Split the flat result of factor_solve_dense back into parts."""
    singular, f_ovf, s_ovf = (bool(buf[t]) for t in range(3))
    o = 3
    det_s = buf[o]; o += 1
    det_m = buf[o:o + W]; o += W
    rowidx = buf[o:o + n]; o += n
    XS = buf[o:o + n * nrhs].reshape(n, nrhs); o += n * nrhs
    XM = buf[o:o + n * nrhs * Ws].reshape(n, nrhs, Ws)
    return XS, XM, det_s, det_m, rowidx, singular, f_ovf, s_ovf
