"""Block-row sharded REF LU factorization (shard_map over a 1-D mesh).

The multi-chip redesign of the reference's sequential factorization loop
(reference: SLIP_LU_factorize.c) per SURVEY.md §7 / BASELINE.json config 4:

  * the [n, n, W] limb tensor is partitioned by block rows over mesh axis
    'rows'; each chip owns n/p contiguous rows;
  * per column step k: every chip scans its local slice of column k for
    pivot candidates; the full column is gathered (lax.all_gather over ICI)
    and the pivot chosen with the *identical* semantics as the single-chip
    kernel (tpu.factor._select_pivot), so pivots — and therefore all IPGE
    minors — are bit-identical across topologies;
  * the pivot row is broadcast by a masked lax.psum (integer adds are
    associative: no fp-reduction nondeterminism), the row swap touches at
    most two chips;
  * the rank-1-shaped IPGE update of the trailing submatrix is fully local
    to each chip — the O(n^2 W) work parallelizes perfectly, the per-step
    communication is O(n W).

Overflow/singularity flags are reduced with lax.psum and returned
replicated, preserving the widen-and-retry protocol of the single-chip
path (tpu/backslash_tpu.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import matarith as mt
from ..tpu.factor import _select_pivot
from .shard import ROWS_AXIS


def _fetch_row(Sl: jnp.ndarray, Ml: jnp.ndarray, r: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Broadcast global row r of the block-row-sharded (S, M) to all chips."""
    rpd = Sl.shape[0]
    dev = lax.axis_index(ROWS_AXIS)
    owner = r // rpd
    loc = jnp.where(owner == dev, r % rpd, 0)
    rs = lax.dynamic_index_in_dim(Sl, loc, axis=0, keepdims=False)
    rm = lax.dynamic_index_in_dim(Ml, loc, axis=0, keepdims=False)
    mine = (owner == dev).astype(jnp.int32)
    rs = lax.psum(rs * mine, ROWS_AXIS)
    rm = lax.psum(rm * mine, ROWS_AXIS)
    return rs, rm


def _store_row(Sl: jnp.ndarray, Ml: jnp.ndarray, r: jnp.ndarray,
               rs: jnp.ndarray, rm: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Write a replicated row into global position r (owner chip only)."""
    rpd = Sl.shape[0]
    dev = lax.axis_index(ROWS_AXIS)
    owner = r // rpd
    loc = jnp.where(owner == dev, r % rpd, 0)
    cur_s = lax.dynamic_index_in_dim(Sl, loc, axis=0, keepdims=False)
    cur_m = lax.dynamic_index_in_dim(Ml, loc, axis=0, keepdims=False)
    mine = owner == dev
    new_s = jnp.where(mine, rs, cur_s)
    new_m = jnp.where(mine, rm, cur_m)
    Sl = lax.dynamic_update_index_in_dim(Sl, new_s, loc, axis=0)
    Ml = lax.dynamic_update_index_in_dim(Ml, new_m, loc, axis=0)
    return Sl, Ml


def _factor_local(Sl: jnp.ndarray, Ml: jnp.ndarray, qcols: jnp.ndarray,
                  rowidx0: jnp.ndarray, tol_num_mag: jnp.ndarray, *,
                  scheme: int, tol_shift: int, n_true: int):
    """Per-chip body run under shard_map. Sl: [rpd, n], Ml: [rpd, n, W]."""
    rpd, n = Sl.shape
    W = Ml.shape[-1]
    W2 = 2 * W + 1
    dev = lax.axis_index(ROWS_AXIS)
    gids = dev * rpd + jnp.arange(rpd, dtype=jnp.int32)   # global row ids
    one_mag = jnp.zeros(W, jnp.int32).at[0].set(1)
    cols = jnp.arange(n, dtype=jnp.int32)

    def body(k, state):
        Sl, Ml, rowidx, rp_sign, rp_mag, singular, overflow = state
        # --- gather column k (signs + magnitudes) to all chips
        col_s = lax.all_gather(
            lax.dynamic_index_in_dim(jnp.swapaxes(Sl, 0, 1), k, 0,
                                     keepdims=False), ROWS_AXIS, tiled=True)
        col_m = lax.all_gather(
            lax.dynamic_index_in_dim(jnp.swapaxes(Ml, 0, 1), k, 0,
                                     keepdims=False), ROWS_AXIS, tiled=True)
        # --- pivot choice, replicated, identical to single-chip semantics
        all_rows = jnp.arange(n, dtype=jnp.int32)
        eligible = (all_rows >= k) & (col_s != 0)
        pos, found = _select_pivot(col_s, col_m, eligible, rowidx, scheme, k,
                                   qcols[k], tol_num_mag, tol_shift)
        singular = singular | (~found)
        pos = jnp.where(found, pos, k)
        # --- swap global rows k and pos (pivot row = pre-swap row pos)
        rk_s, rk_m = _fetch_row(Sl, Ml, k)
        rp_s_row, rp_m_row = _fetch_row(Sl, Ml, pos)
        Sl, Ml = _store_row(Sl, Ml, k, rp_s_row, rp_m_row)
        Sl, Ml = _store_row(Sl, Ml, pos, rk_s, rk_m)
        ri_k = rowidx[k]
        rowidx = rowidx.at[k].set(rowidx[pos]).at[pos].set(ri_k)
        rho_s = rp_s_row[k]
        rho_m = rp_m_row[k]
        rho_m_safe = jnp.where(jnp.all(rho_m == 0), one_mag, rho_m)
        # --- local IPGE update: rows with gid > k, columns > k
        mask = (gids > k)[:, None] & (cols > k)[None, :]          # [rpd, n]
        piv_col_s = lax.dynamic_index_in_dim(jnp.swapaxes(Sl, 0, 1), k, 0,
                                             keepdims=False)      # [rpd]
        piv_col_m = lax.dynamic_index_in_dim(jnp.swapaxes(Ml, 0, 1), k, 0,
                                             keepdims=False)      # [rpd, W]
        p1s, p1m, _ = mt.signed_mul_shared(Sl, Ml, rho_s, rho_m_safe, W2)
        p2s, p2m, _ = mt.signed_mul_outer(piv_col_s, piv_col_m,
                                          rp_s_row, rp_m_row, W2)
        ds, dm, _ = mt.signed_sub_vec(p1s, p1m, p2s, p2m, W2)
        inv, tz = mt.div_precompute_hensel(rp_mag, W2)
        qs, qm, bad = mt.signed_divexact_shared(ds, dm, rp_sign, inv, tz, W)
        Sl = jnp.where(mask, qs, Sl)
        Ml = jnp.where(mask[..., None], qm, Ml)
        overflow = overflow | jnp.any(mask & bad)
        return (Sl, Ml, rowidx, rho_s, rho_m_safe, singular, overflow)

    init = (Sl, Ml, rowidx0, jnp.int32(1), one_mag,
            jnp.bool_(False), jnp.bool_(False))
    # only the first n_true steps carry information for the original matrix;
    # the identity-padding steps are still run so every chip's rhos agree
    Sl, Ml, rowidx, _, _, singular, overflow = lax.fori_loop(
        0, n_true, body, init)
    # replicate flags (integer reduce — deterministic)
    singular = lax.psum(singular.astype(jnp.int32), ROWS_AXIS) > 0
    overflow = lax.psum(overflow.astype(jnp.int32), ROWS_AXIS) > 0
    return Sl, Ml, rowidx, singular, overflow


@functools.partial(jax.jit,
                   static_argnames=("mesh", "scheme", "tol_shift", "n_true"))
def factor_dense_limbs_sharded(mesh: Mesh, S: jnp.ndarray, M: jnp.ndarray,
                               qcols: jnp.ndarray, scheme: int,
                               tol_num_mag: jnp.ndarray, tol_shift: int,
                               n_true: int):
    """Sharded twin of tpu.factor.factor_dense_limbs — bit-identical output.

    S: [n, n] signs, M: [n, n, W] magnitudes, n divisible by mesh size
    (use parallel.shard.pad_to_multiple). n_true = number of elimination
    steps (original dimension before identity padding).
    """
    fn = jax.shard_map(
        functools.partial(_factor_local, scheme=scheme, tol_shift=tol_shift,
                          n_true=n_true),
        mesh=mesh,
        in_specs=(P(ROWS_AXIS, None), P(ROWS_AXIS, None, None), P(), P(),
                  P()),
        out_specs=(P(ROWS_AXIS, None), P(ROWS_AXIS, None, None), P(),
                   P(), P()),
        check_vma=False,
    )
    n = S.shape[0]
    rowidx0 = jnp.arange(n, dtype=jnp.int32)
    return fn(S, M, qcols, rowidx0, tol_num_mag)
