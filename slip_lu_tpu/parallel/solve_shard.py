"""Block-row sharded REF forward/back substitution.

Sharded twin of tpu/solve.py (reference parity: slip_forward_sub.c,
slip_matrix_mul.c, slip_back_sub.c). The packed LU tensor and the RHS
block are both partitioned by block rows over mesh axis 'rows'; per step
the pivot entry rho_k and the solution row x[k] are broadcast with masked
integer psums (O(nrhs·W) per step) while the row updates stay local.
Bit-identical to the single-chip kernel by associativity of integer adds.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import matarith as mt
from .shard import ROWS_AXIS


def _fetch_rhs_row(VSl, VMl, r):
    """Broadcast global row r of the sharded RHS block to all chips."""
    rpd = VSl.shape[0]
    dev = lax.axis_index(ROWS_AXIS)
    owner = r // rpd
    loc = jnp.where(owner == dev, r % rpd, 0)
    rs = lax.dynamic_index_in_dim(VSl, loc, axis=0, keepdims=False)
    rm = lax.dynamic_index_in_dim(VMl, loc, axis=0, keepdims=False)
    mine = (owner == dev).astype(jnp.int32)
    return lax.psum(rs * mine, ROWS_AXIS), lax.psum(rm * mine, ROWS_AXIS)


def _fetch_entry(FSl, FMl, r, c):
    """Broadcast the (sign, magnitude) of global entry (r, c)."""
    rpd = FSl.shape[0]
    dev = lax.axis_index(ROWS_AXIS)
    owner = r // rpd
    loc = jnp.where(owner == dev, r % rpd, 0)
    row_s = lax.dynamic_index_in_dim(FSl, loc, axis=0, keepdims=False)
    row_m = lax.dynamic_index_in_dim(FMl, loc, axis=0, keepdims=False)
    es = lax.dynamic_index_in_dim(row_s, c, axis=0, keepdims=False)
    em = lax.dynamic_index_in_dim(row_m, c, axis=0, keepdims=False)
    mine = (owner == dev).astype(jnp.int32)
    return lax.psum(es * mine, ROWS_AXIS), lax.psum(em * mine, ROWS_AXIS)


def _store_rhs_row(VSl, VMl, r, rs, rm):
    rpd = VSl.shape[0]
    dev = lax.axis_index(ROWS_AXIS)
    owner = r // rpd
    loc = jnp.where(owner == dev, r % rpd, 0)
    cur_s = lax.dynamic_index_in_dim(VSl, loc, axis=0, keepdims=False)
    cur_m = lax.dynamic_index_in_dim(VMl, loc, axis=0, keepdims=False)
    mine = owner == dev
    VSl = lax.dynamic_update_index_in_dim(
        VSl, jnp.where(mine, rs, cur_s), loc, axis=0)
    VMl = lax.dynamic_update_index_in_dim(
        VMl, jnp.where(mine, rm, cur_m), loc, axis=0)
    return VSl, VMl


def _solve_local(FSl, FMl, VSl, VMl, *, n_true: int):
    """Per-chip body. FSl: [rpd, n], FMl: [rpd, n, W], VMl: [rpd, nrhs, Ws]."""
    rpd, n = FSl.shape
    W = FMl.shape[-1]
    Ws = VMl.shape[-1]
    Wp = W + Ws + 1
    dev = lax.axis_index(ROWS_AXIS)
    gids = dev * rpd + jnp.arange(rpd, dtype=jnp.int32)
    one_magW = jnp.zeros(W, jnp.int32).at[0].set(1)

    # ---- forward substitution ----
    def fwd_body(k, state):
        VSl, VMl, rp_s, rp_m, ovf = state
        rho_s, rho_m = _fetch_entry(FSl, FMl, k, k)
        rho_m_safe = jnp.where(jnp.all(rho_m == 0), one_magW, rho_m)
        vk_s, vk_m = _fetch_rhs_row(VSl, VMl, k)       # [nrhs], [nrhs, Ws]
        l_s = lax.dynamic_index_in_dim(jnp.swapaxes(FSl, 0, 1), k, 0,
                                       keepdims=False)  # [rpd]
        l_m = lax.dynamic_index_in_dim(jnp.swapaxes(FMl, 0, 1), k, 0,
                                       keepdims=False)  # [rpd, W]
        p1s, p1m, _ = mt.signed_mul_shared(VSl, VMl, rho_s, rho_m_safe, Wp)
        p2s, p2m, _ = mt.signed_mul_outer(l_s, l_m, vk_s, vk_m, Wp)
        ds, dm, _ = mt.signed_sub_vec(p1s, p1m, p2s, p2m, Wp)
        inv, tz = mt.div_precompute_hensel(rp_m, Wp)
        qs, qm, bad = mt.signed_divexact_shared(ds, dm, rp_s, inv, tz, Ws)
        mask = (gids > k)[:, None]
        VSl = jnp.where(mask, qs, VSl)
        VMl = jnp.where(mask[..., None], qm, VMl)
        ovf = ovf | jnp.any(mask & bad)
        return (VSl, VMl, rho_s, rho_m_safe, ovf)

    state = (VSl, VMl, jnp.int32(1), one_magW, jnp.bool_(False))
    VSl, VMl, _, _, ovf = lax.fori_loop(0, n_true, fwd_body, state)

    # ---- scale by the determinant rho_{n_true-1} ----
    det_s, det_m = _fetch_entry(FSl, FMl, n_true - 1, n_true - 1)
    VSl, VMl, o_det = mt.signed_mul_shared(VSl, VMl, det_s, det_m, Ws)
    ovf = ovf | jnp.any(o_det)

    # ---- back substitution ----
    def bwd_body(t, state):
        VSl, VMl, ovf = state
        j = n_true - 1 - t
        rho_s, rho_m = _fetch_entry(FSl, FMl, j, j)
        rho_m_safe = jnp.where(jnp.all(rho_m == 0), one_magW, rho_m)
        inv, tz = mt.div_precompute_hensel(rho_m_safe, Ws)
        vj_s, vj_m = _fetch_rhs_row(VSl, VMl, j)
        xj_s, xj_m, bad = mt.signed_divexact_shared(vj_s, vj_m, rho_s,
                                                    inv, tz, Ws)
        VSl, VMl = _store_rhs_row(VSl, VMl, j, xj_s, xj_m)
        u_s = lax.dynamic_index_in_dim(jnp.swapaxes(FSl, 0, 1), j, 0,
                                       keepdims=False)
        u_m = lax.dynamic_index_in_dim(jnp.swapaxes(FMl, 0, 1), j, 0,
                                       keepdims=False)
        ps, pm, o1 = mt.signed_mul_outer(u_s, u_m, xj_s, xj_m, Ws)
        ns, nm, o2 = mt.signed_sub_vec(VSl, VMl, ps, pm, Ws)
        mask = (gids < j)[:, None]
        VSl = jnp.where(mask, ns, VSl)
        VMl = jnp.where(mask[..., None], nm, VMl)
        ovf = ovf | jnp.any(bad) | jnp.any(mask & (o1 | o2))
        return (VSl, VMl, ovf)

    VSl, VMl, ovf = lax.fori_loop(0, n_true, bwd_body, (VSl, VMl, ovf))
    ovf = lax.psum(ovf.astype(jnp.int32), ROWS_AXIS) > 0
    return VSl, VMl, ovf


@functools.partial(jax.jit, static_argnames=("mesh", "n_true"))
def solve_dense_limbs_sharded(mesh: Mesh, FS: jnp.ndarray, FM: jnp.ndarray,
                              VS: jnp.ndarray, VM: jnp.ndarray, n_true: int
                              ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                         jnp.ndarray]:
    """Sharded twin of tpu.solve.solve_dense_limbs — bit-identical output.

    FS/FM: packed LU [n, n(, W)]; VS/VM: RHS [n, nrhs(, Ws)] already in
    pivot order, rows n_true.. zero-padded. n divisible by mesh size.
    """
    fn = jax.shard_map(
        functools.partial(_solve_local, n_true=n_true),
        mesh=mesh,
        in_specs=(P(ROWS_AXIS, None), P(ROWS_AXIS, None, None),
                  P(ROWS_AXIS, None), P(ROWS_AXIS, None, None)),
        out_specs=(P(ROWS_AXIS, None), P(ROWS_AXIS, None, None), P()),
        check_vma=False,
    )
    return fn(FS, FM, VS, VM)
