"""Single-chip REF LU factorization on device (dense-with-masking IPGE).

TPU-first redesign of the reference's left-looking factorization
(reference: SLIP_LU_factorize.c + slip_ref_triangular_solve.c). On TPU,
pointer-chasing sparse scatter is hostile and the VPU wants wide regular
updates, so the device path runs *right-looking* IPGE (Bareiss fraction-free
elimination) over a dense limb tensor with masks:

    M[i,j] <- (rho_k * M[i,j] - M[i,k] * M[k,j]) / rho_{k-1}   for i,j > k

This computes the *identical* integers as the reference's left-looking
formulation — IPGE values are basis-independent minors — so L, U, and rhos
match the host oracle bit-for-bit (asserted in tests/test_tpu_factor.py).

Per elimination step everything is a handful of large contractions
(ops/matarith.py): rho×M and the pivot outer product are Toeplitz-matmul
digit convolutions, the exact division is one truncated multiply by
rho_{k-1}'s Hensel inverse (computed once per step), and the pivot search
is a vectorized log-depth tournament. No per-limb scans anywhere in the
hot loop.

After the loop the working tensor *is* the packed factorization:
  upper triangle + diagonal = U rows frozen at their pivot level,
  strict lower triangle     = L columns at their freeze level,
  diagonal                  = rhos.

Overflow/singularity are returned as flags; the host widens W and retries
(the framework's analogue of the reference's GMP OOM longjmp recovery).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import matarith as mt
from ..options import Pivot


def _swap_rows(t: jnp.ndarray, k: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Swap rows k and p of t (first axis), k/p traced scalars."""
    rk = lax.dynamic_index_in_dim(t, k, axis=0, keepdims=False)
    rp = lax.dynamic_index_in_dim(t, p, axis=0, keepdims=False)
    t = lax.dynamic_update_index_in_dim(t, rk, p, axis=0)
    return lax.dynamic_update_index_in_dim(t, rp, k, axis=0)


def _tournament(cm: jnp.ndarray, eligible: jnp.ndarray, rowidx: jnp.ndarray,
                minimize: bool) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """argext over eligible rows of (magnitude, original row) lexicographic.

    Log-depth pairwise reduction — the vectorized replacement for the
    reference's sequential pivot scan (slip_get_smallest/largest_pivot.c).
    Returns (best_mag, best_position, any_eligible).
    """
    n, W = cm.shape
    m = 1 << max(1, (n - 1)).bit_length()
    pad = m - n
    mags = jnp.pad(cm, ((0, pad), (0, 0)))
    elig = jnp.pad(eligible, (0, pad))
    rows = jnp.pad(rowidx, (0, pad), constant_values=2 ** 30)
    pos = jnp.pad(jnp.arange(n, dtype=jnp.int32), (0, pad))
    while m > 1:
        h = m // 2
        ma_, mb_ = mags[:h], mags[h:]
        ea, eb = elig[:h], elig[h:]
        ra, rb = rows[:h], rows[h:]
        pa, pb = pos[:h], pos[h:]
        c = mt.mag_cmp_vec(mb_, ma_)
        better = (c < 0) if minimize else (c > 0)
        take_b = eb & ((~ea) | better | ((c == 0) & (rb < ra)))
        mags = jnp.where(take_b[:, None], mb_, ma_)
        elig = ea | eb
        rows = jnp.where(take_b, rb, ra)
        pos = jnp.where(take_b, pb, pa)
        m = h
    return mags[0], pos[0], elig[0]


def _select_pivot(cs: jnp.ndarray, cm: jnp.ndarray, eligible: jnp.ndarray,
                  rowidx: jnp.ndarray, scheme: int, k: jnp.ndarray,
                  diag_orig_col: jnp.ndarray,
                  tol_num_mag: jnp.ndarray, tol_shift: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """On-device pivot search over column k's candidates.

    cs/cm: sign [n] and magnitude [n, W] of the current column.
    eligible: row position >= k and entry nonzero.
    Tie-breaks match the host oracle exactly: smallest *original* row index
    (reference: slip_get_*_pivot.c; semantics in Options.Pivot docstring).
    Returns (pivot_position, found_flag).
    """
    n, W = cm.shape

    def first_nonzero():
        big = jnp.int32(2 ** 30)
        keyed = jnp.where(eligible, rowidx, big)
        pos = jnp.argmin(keyed).astype(jnp.int32)
        return pos, jnp.any(eligible)

    # diagonal candidate: the row whose original index equals the original
    # column index of column k (columns were permuted on the host by q)
    diag_mask = eligible & (rowidx == diag_orig_col)
    diag_pos = jnp.argmax(diag_mask).astype(jnp.int32)
    has_diag = jnp.any(diag_mask)
    diag_mag = cm[diag_pos]

    if scheme == Pivot.FIRST_NONZERO:
        return first_nonzero()
    if scheme == Pivot.SMALLEST:
        _, pos, has = _tournament(cm, eligible, rowidx, minimize=True)
        return pos, has
    if scheme == Pivot.LARGEST:
        _, pos, has = _tournament(cm, eligible, rowidx, minimize=False)
        return pos, has
    if scheme == Pivot.DIAGONAL:
        _, pos, has = _tournament(cm, eligible, rowidx, minimize=True)
        return jnp.where(has_diag, diag_pos, pos), has
    if scheme == Pivot.TOL_SMALLEST:
        bm, pos, has = _tournament(cm, eligible, rowidx, minimize=True)
        # use diagonal if |diag| * tol <= |smallest|  (tol = num / 2**shift)
        lhs, _ = mt.mul_shared(diag_mag[None, :], tol_num_mag,
                               W + tol_num_mag.shape[-1])
        rhs = _shl_static(bm, tol_shift)
        use_diag = has_diag & (mt.mag_cmp_vec(lhs[0], rhs) <= 0)
        return jnp.where(use_diag, diag_pos, pos), has
    if scheme == Pivot.TOL_LARGEST:
        bm, pos, has = _tournament(cm, eligible, rowidx, minimize=False)
        # use diagonal if |diag| >= |largest| * tol
        lhs = _shl_static(diag_mag, tol_shift)
        rhs, _ = mt.mul_shared(bm[None, :], tol_num_mag,
                               W + tol_num_mag.shape[-1])
        use_diag = has_diag & (mt.mag_cmp_vec(lhs, rhs[0]) >= 0)
        return jnp.where(use_diag, diag_pos, pos), has
    raise ValueError(f"unknown pivot scheme {scheme}")


def _shl_static(a: jnp.ndarray, nbits: int) -> jnp.ndarray:
    from ..ops.arith import mag_shl_bits_static
    return mag_shl_bits_static(a, nbits)


@functools.partial(jax.jit, static_argnames=("scheme", "tol_shift"))
def factor_dense_limbs(S: jnp.ndarray, M: jnp.ndarray, qcols: jnp.ndarray,
                       scheme: int, tol_num_mag: jnp.ndarray, tol_shift: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                  jnp.ndarray, jnp.ndarray]:
    """Factor a column-permuted dense limb matrix on device.

    S: [n, n] int32 signs; M: [n, n, W] magnitudes (of A[:, q], integerized).
    qcols: [n] original column index per position (for DIAGONAL schemes).
    Returns (S, M, rowidx, singular_flag, overflow_flag) with the packed LU
    in (S, M), and rowidx[k] = original row pivoting position k.
    """
    n, _, W = M.shape
    W2 = 2 * W + 1  # product / IPGE-intermediate width

    rows = jnp.arange(n, dtype=jnp.int32)
    one_mag = jnp.zeros(W, jnp.int32).at[0].set(1)

    def body(k, state):
        S, M, rowidx, rp_sign, rp_mag, singular, overflow = state
        # --- pivot search on column k
        cs = lax.dynamic_index_in_dim(jnp.swapaxes(S, 0, 1), k, 0, keepdims=False)
        cm = lax.dynamic_index_in_dim(jnp.swapaxes(M, 0, 1), k, 0, keepdims=False)
        eligible = (rows >= k) & (cs != 0)
        pos, found = _select_pivot(cs, cm, eligible, rowidx, scheme, k,
                                   qcols[k], tol_num_mag, tol_shift)
        singular = singular | (~found)
        pos = jnp.where(found, pos, k)  # keep computation defined if singular
        # --- swap pivot row into position k
        S = _swap_rows(S, k, pos)
        M = _swap_rows(M, k, pos)
        rowidx = _swap_rows(rowidx, k, pos)
        rho_s = S[k, k]
        rho_m = M[k, k]
        # degenerate-safe divisor (flag already set if singular)
        rho_m_safe = jnp.where(jnp.all(rho_m == 0), one_mag, rho_m)
        # --- IPGE rank-1-style update of the trailing submatrix:
        #     three contractions + one subtract, no per-limb scans
        mask = ((rows > k)[:, None]) & ((rows > k)[None, :])     # [n, n]
        piv_row_s, piv_row_m = S[k, :], M[k, :, :]               # [n], [n, W]
        piv_col_s, piv_col_m = S[:, k], M[:, k, :]               # [n], [n, W]
        p1s, p1m, _ = mt.signed_mul_shared(S, M, rho_s, rho_m_safe, W2)
        p2s, p2m, _ = mt.signed_mul_outer(piv_col_s, piv_col_m,
                                          piv_row_s, piv_row_m, W2)
        ds, dm, _ = mt.signed_sub_vec(p1s, p1m, p2s, p2m, W2)
        inv, tz = mt.div_precompute_hensel(rp_mag, W2)
        qs, qm, bad = mt.signed_divexact_shared(ds, dm, rp_sign, inv, tz, W)
        S = jnp.where(mask, qs, S)
        M = jnp.where(mask[..., None], qm, M)
        overflow = overflow | jnp.any(mask & bad)
        return (S, M, rowidx, rho_s, rho_m_safe, singular, overflow)

    init = (S, M, rows, jnp.int32(1), one_mag,
            jnp.bool_(False), jnp.bool_(False))
    S, M, rowidx, _, _, singular, overflow = lax.fori_loop(0, n, body, init)
    return S, M, rowidx, singular, overflow
