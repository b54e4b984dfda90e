"""Sharded fused exact solve: the flagship mega-kernel path, multi-chip.

Executes the chip-partitioned chunk streams of stream_shard_fused.py
under shard_map. Per chunk (one sharded superstep):

    diag psum -> [heads replicated + pass-1 local + B-gather]  (pallas)
              -> B psum -> [B-scatter + pass-2 local]          (pallas)

Tables (SMT/GT/TZ) are replicated and stay bit-identical on every chip
because phase A is replicated from psum-broadcast diagonals (integer
collectives; the same topology-independence argument as
parallel/factor_sparse_shard.py). The value table is PARTITIONED: each
chip holds only its owned rows' slots ([p, Lp8, W8], built by
driver_fused.py); pass-2 B operands come from the psum broadcast buffer
by position, never from local storage of remote rows. All O(W^2) event
arithmetic is chip-local.

Reference anchor: the k-loop of SLIP_LU_factorize.c (SURVEY §3.2)
distributed block-row; SLIP_LU_solve.c for the solve scan.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import pallas_limbs as pk
from ..tpu.factor_fused import (_gather_row, _heads_phase, _lift_phase,
                                _pass_body, _interpret, _r8, _r128,
                                _scatter_row, ints_to_tc_rows,
                                tc_rows_to_ints)
from .shard import mesh_axes


def _smem(shape):
    return pl.BlockSpec(shape, memory_space=pltpu.SMEM)


def _vmem(shape):
    return pl.BlockSpec(shape, memory_space=pltpu.VMEM)


# ------------------------------------------------------------------ AB
def _ab_kernel(cnt, hs, hsl, hd, ev1, bidx, bcn, diag_b,
               val_in, SMT_in, GT_in, TZ_in, facc_in, mbc,
               val, SMT, GT, TZ, facc, bc_out,
               *scratch, n, E, W8, WN, WQ, WV, WI8, H, C1, CB8,
               heads, Wt, is_solve, hbm=False, KR=1):
    """One chunk: replicated heads (+lift) -> local pass 1 -> B gather.

    For the solve stream (is_solve=True) `val` is X ([X8, Ws8]) and the
    a-operands come from the separate finished value table passed as
    `diag_b`'s sibling — see _solve caller (heads=False there).

    hbm=True (factor stream only): the per-chip value table lives in
    ANY/HBM memory as [Lp8*KR, 128] packed planes (KR 128-lane rows per
    slot, factor_fused docstring); pivot writes, pass-1 row traffic and
    the B gather move single rows by async DMA instead of keeping the
    table VMEM-resident."""
    if hbm:
        *scratch, hrows, bgat, sem = scratch
    else:
        hrows = bgat = sem = None
    (gat_t, gat_m, gat_a, gat_b, gat_g, gat_z, gat_dm, scat,
     mT1, bT1, iT1, acc0a, acc1a, pA1, pB1, qb1,
     hgx, hgm, hgi, hgz, hgv, hmT, hiT, hbT, nbuf, Rbuf,
     lacc0, lacc1, ld, lx, lu, ltz) = scratch

    any_heads = (cnt[0, 0] > 0) if heads else False
    fl = cnt[0, 3]

    if heads:
        ks = [hs[0, t] for t in range(H)]
        slots = [hsl[0, t] for t in range(H)]
        dvs = [hd[0, t] for t in range(H)]

        @pl.when(any_heads)
        def _hi():
            ld[:] = jnp.zeros_like(ld)
            ld[0:1, :] = jnp.ones((1, ld.shape[1]), jnp.int32)
            ltz[:] = jnp.zeros_like(ltz)

        @pl.when(any_heads)
        def _h():
            _heads_phase(ks, slots, dvs, cnt[0, 0], (fl & 256) != 0,
                         val, SMT, GT, TZ,
                         hgx, hgm, hgi, hgz, hgv, hmT, hiT, hbT,
                         nbuf, Rbuf, lacc0, lacc1, ld, ltz, facc,
                         W8=W8, WN=WN, WQ=WQ, WV=WV, WI8=WI8, G=1,
                         hbm=hbm, hrows=hrows, sem=sem, KR=KR,
                         diag_ext=diag_b)

        if hbm:
            # pivot-row DMAs must land before pass 1 gathers them
            for t in range(H):
                @pl.when(ks[t] >= 0)
                def _hww():
                    _scatter_row(hrows, t, val, slots[t], KR, sem,
                                 wait=True)

        @pl.when(any_heads)
        def _l():
            _lift_phase(ks, GT, TZ, ld, lx, lu, ltz, lacc0, lacc1,
                        WI8=WI8, G=1)

    _pass_body(C1, Wt, Wt, W8, WN, WQ, WV, E, cnt[0, 1], ev1, val,
               val, SMT, GT, TZ, gat_t, gat_m, gat_a, gat_b, gat_g,
               gat_z, gat_dm, scat,
               (mT1, bT1, iT1, acc0a, acc1a, pA1, pB1, qb1),
               facc, val, flag_slot=3, hbm=(hbm, False, False),
               sem=sem, KR=KR, has_ab=False,
               m0=(fl & 1) != 0, d0=(fl & 4) != 0,
               um=(fl & 16) != 0, ud=(fl & 32) != 0)

    # B-operand gather, owner-masked (post-pass-1 values)
    bc_out[:] = jnp.zeros_like(bc_out)

    if hbm:
        def bcg_i(e, _):
            _gather_row(val, bidx[0, e], bgat, e, KR, sem)
            return 0

        def bcg_w(e, _):
            _gather_row(val, bidx[0, e], bgat, e, KR, sem, wait=True)
            return 0

        def bcg_m(e, _):
            row = jnp.concatenate(
                [bgat[k2, pl.ds(e, 1), :] for k2 in range(KR)],
                axis=1)
            bc_out[pl.ds(e, 1), :] = row[:, :Wt] * mbc[0, e]
            return 0

        lax.fori_loop(0, bcn[0, 0], bcg_i, 0)
        lax.fori_loop(0, bcn[0, 0], bcg_w, 0)
        lax.fori_loop(0, bcn[0, 0], bcg_m, 0)
    else:
        def bcg(e, _):
            idx = bidx[0, e]
            m = mbc[0, e]
            bc_out[pl.ds(e, 1), :] = val[pl.ds(idx, 1), :] * m
            return 0

        lax.fori_loop(0, bcn[0, 0], bcg, 0)


# ------------------------------------------------------------------- C
def _c_kernel(cnt, ev2, bidx, bcn, bc, a_src, SMT, GT, TZ,
              val_in, facc_in, val, facc,
              *scratch, n, E, W8, WN, WQ, WV, WI8, C2, Wt, is_solve,
              hbm_t=False, hbm_a=False, KR=1):
    """One chunk: local pass 2.

    Factor stream (is_solve=False): the B operands are POSITIONS into
    the psum-broadcast bc buffer and read straight from it — remote
    slot values are never stored (partitioned value table). Solve
    stream: B operands are X rows; the broadcast scatters into the
    full per-chip X first.

    Factor streams read their a operands through the SAME (aliased)
    target ref — `a_src` is a dummy there; passing the table as a
    second input would double its VMEM window (or HBM copy) per chunk.
    The single-chip kernel has the same one-ref layout. hbm_t: the
    target value table is HBM-packed planes (factor stream at scale).
    hbm_a without hbm_t: solve stream whose finished factor table is
    HBM-packed (a rows DMA-gather; X stays VMEM)."""
    if hbm_t or hbm_a:
        *scratch, sem = scratch
    else:
        sem = None
    (gat_t, gat_m, gat_a, gat_b, gat_g, gat_z, gat_dm, scat,
     mT2, bT2, iT2, acc0b, acc1b, pA2, pB2, qb2) = scratch
    fl = cnt[0, 3]
    a_ref = a_src if is_solve else val

    if is_solve:
        def sct(e, _):
            idx = bidx[0, e]
            val[pl.ds(idx, 1), :] = bc[pl.ds(e, 1), :]
            return 0

        lax.fori_loop(0, bcn[0, 0], sct, 0)

    _pass_body(C2, Wt, Wt, W8, WN, WQ, WV, E, cnt[0, 2], ev2, val,
               a_ref, SMT, GT, TZ, gat_t, gat_m, gat_a, gat_b, gat_g,
               gat_z, gat_dm, scat,
               (mT2, bT2, iT2, acc0b, acc1b, pA2, pB2, qb2),
               facc, val if is_solve else bc, flag_slot=4,
               hbm=(hbm_t, hbm_a, False),
               sem=sem, KR=KR, KRT=KR if hbm_t else 1, has_ab=True,
               m0=(fl & 2) != 0, d0=(fl & 8) != 0,
               um=(fl & 64) != 0, ud=(fl & 128) != 0)


def _ab_call(cnt, hs, hsl, hd, ev1, bidx, bcn, diag_b, val, SMT, GT,
             TZ, facc, mbc, *, n, E, W8, WN, WQ, WV, WI8, H, C1, CB8,
             heads, Wt, is_solve, hbm=False, KR=1):
    HACC = max(2 * WI8, WN, WV) + 24
    ACC = max(WN, 2 * WQ + 2, WV) + 24
    LL = max(H, 8)
    E8v = val.shape[0]
    n8 = SMT.shape[0]
    kern = functools.partial(
        _ab_kernel, n=n, E=E, W8=W8, WN=WN, WQ=WQ, WV=WV, WI8=WI8,
        H=H, C1=C1, CB8=CB8, heads=heads, Wt=Wt, is_solve=is_solve,
        hbm=hbm, KR=KR)
    tshape = (KR, C1, 128) if hbm else (C1, Wt)
    scratch = [
        pltpu.VMEM(tshape, jnp.int32),        # gat_t
        pltpu.VMEM((C1, W8), jnp.int32),      # gat_m
        pltpu.VMEM((C1, W8), jnp.int32),      # gat_a (unused, pass1)
        pltpu.VMEM((C1, Wt), jnp.int32),      # gat_b (unused, pass1)
        pltpu.VMEM((C1, WI8), jnp.int32),     # gat_g
        pltpu.VMEM((C1, 8), jnp.int32),       # gat_z
        pltpu.VMEM((C1, W8), jnp.int32),      # gat_dm
        pltpu.VMEM(tshape, jnp.int32),        # scat
        pltpu.VMEM((W8, C1), jnp.int32),      # mT1
        pltpu.VMEM((Wt, C1), jnp.int32),      # bT1
        pltpu.VMEM((WQ, C1), jnp.int32),      # iT1
        pltpu.VMEM((ACC, C1), jnp.int32),     # acc0a
        pltpu.VMEM((ACC, C1), jnp.int32),     # acc1a
        pltpu.VMEM((WN, C1), jnp.int32),      # pA1
        pltpu.VMEM((WN, C1), jnp.int32),      # pB1
        pltpu.VMEM((WN, C1), jnp.int32),      # qb1
        pltpu.VMEM((LL, W8), jnp.int32),      # hgx
        pltpu.VMEM((LL, W8), jnp.int32),      # hgm
        pltpu.VMEM((LL, WI8), jnp.int32),     # hgi
        pltpu.VMEM((LL, 8), jnp.int32),       # hgz
        pltpu.VMEM((LL, W8), jnp.int32),      # hgv
        pltpu.VMEM((W8, LL), jnp.int32),      # hmT
        pltpu.VMEM((WQ, LL), jnp.int32),      # hiT
        pltpu.VMEM((W8, LL), jnp.int32),      # hbT
        pltpu.VMEM((WN, LL), jnp.int32),      # nbuf
        pltpu.VMEM((WQ, LL), jnp.int32),      # Rbuf
        pltpu.VMEM((HACC, LL), jnp.int32),    # lacc0
        pltpu.VMEM((HACC, LL), jnp.int32),    # lacc1
        pltpu.VMEM((WI8, LL), jnp.int32),     # ld
        pltpu.VMEM((WI8, LL), jnp.int32),     # lx
        pltpu.VMEM((WI8, LL), jnp.int32),     # lu
        pltpu.VMEM((1, LL), jnp.int32),       # ltz
    ]
    if hbm:
        scratch += [
            pltpu.VMEM((KR, max(H, 8), 128), jnp.int32),   # hrows
            pltpu.VMEM((KR, CB8, 128), jnp.int32),         # bgat
            pltpu.SemaphoreType.DMA(()),                   # sem
        ]
    val_spec = (pl.BlockSpec(memory_space=pl.ANY) if hbm
                else _vmem((E8v, Wt)))
    out = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(val.shape, jnp.int32),    # val
            jax.ShapeDtypeStruct((n8, W8), jnp.int32),     # SMT
            jax.ShapeDtypeStruct((n8, WI8), jnp.int32),    # GT
            jax.ShapeDtypeStruct((n8, 8), jnp.int32),      # TZ
            jax.ShapeDtypeStruct((8, 128), jnp.int32),     # facc
            jax.ShapeDtypeStruct((CB8, Wt), jnp.int32),    # bc_out
        ),
        in_specs=[
            _smem((1, 4)), _smem((1, H)), _smem((1, H)), _smem((1, H)),
            _smem((1, 5, C1)), _smem((1, CB8)), _smem((1, 1)),
            _vmem((max(H, 8), Wt)),
            val_spec, _vmem((n8, W8)), _vmem((n8, WI8)),
            _vmem((n8, 8)), _vmem((8, 128)), _smem((1, CB8)),
        ],
        out_specs=(
            val_spec, _vmem((n8, W8)), _vmem((n8, WI8)),
            _vmem((n8, 8)), _vmem((8, 128)), _vmem((CB8, Wt)),
        ),
        input_output_aliases={8: 0, 9: 1, 10: 2, 11: 3, 12: 4},
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(cnt[None], hs[None], hsl[None], hd[None], ev1[None],
      bidx[None], bcn[None, None], diag_b, val, SMT, GT, TZ, facc,
      mbc[None])
    return out


def _c_call(cnt, ev2, bidx, bcn, bc, a_src, SMT, GT, TZ, val, facc,
            *, n, E, W8, WN, WQ, WV, WI8, C2, Wt, is_solve,
            hbm_t=False, hbm_a=False, KR=1):
    ACC = max(WN, 2 * WQ + 2, WV) + 24
    E8v = val.shape[0]
    n8 = SMT.shape[0]
    CB8 = bc.shape[0]
    kern = functools.partial(
        _c_kernel, n=n, E=E, W8=W8, WN=WN, WQ=WQ, WV=WV, WI8=WI8,
        C2=C2, Wt=Wt, is_solve=is_solve, hbm_t=hbm_t, hbm_a=hbm_a,
        KR=KR)
    tshape = (KR, C2, 128) if hbm_t else (C2, Wt)
    ashape = (KR, C2, 128) if hbm_a else (C2, W8)
    scratch = [
        pltpu.VMEM(tshape, jnp.int32),        # gat_t
        pltpu.VMEM((C2, W8), jnp.int32),      # gat_m
        pltpu.VMEM(ashape, jnp.int32),        # gat_a
        pltpu.VMEM((C2, Wt), jnp.int32),      # gat_b
        pltpu.VMEM((C2, WI8), jnp.int32),     # gat_g
        pltpu.VMEM((C2, 8), jnp.int32),       # gat_z
        pltpu.VMEM((C2, W8), jnp.int32),      # gat_dm
        pltpu.VMEM(tshape, jnp.int32),        # scat
        pltpu.VMEM((W8, C2), jnp.int32),      # mT2
        pltpu.VMEM((Wt, C2), jnp.int32),      # bT2
        pltpu.VMEM((WQ, C2), jnp.int32),      # iT2
        pltpu.VMEM((ACC, C2), jnp.int32),     # acc0b
        pltpu.VMEM((ACC, C2), jnp.int32),     # acc1b
        pltpu.VMEM((WN, C2), jnp.int32),      # pA2
        pltpu.VMEM((WN, C2), jnp.int32),      # pB2
        pltpu.VMEM((WN, C2), jnp.int32),      # qb2
    ]
    if hbm_t or hbm_a:
        scratch.append(pltpu.SemaphoreType.DMA(()))        # sem
    tgt_spec = (pl.BlockSpec(memory_space=pl.ANY) if hbm_t
                else _vmem((E8v, Wt)))
    a_spec = (pl.BlockSpec(memory_space=pl.ANY) if hbm_a and not hbm_t
              else _vmem(a_src.shape))
    out = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(val.shape, jnp.int32),    # val
            jax.ShapeDtypeStruct((8, 128), jnp.int32),     # facc
        ),
        in_specs=[
            _smem((1, 4)), _smem((1, 5, C2)), _smem((1, CB8)),
            _smem((1, 1)),
            _vmem((CB8, Wt)), a_spec,
            _vmem((n8, W8)), _vmem((n8, WI8)), _vmem((n8, 8)),
            tgt_spec, _vmem((8, 128)),
        ],
        out_specs=(tgt_spec, _vmem((8, 128))),
        input_output_aliases={9: 0, 10: 1},
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(cnt[None], ev2[None], bidx[None], bcn[None, None], bc, a_src,
      SMT, GT, TZ, val, facc)
    return out


@functools.partial(
    jax.jit, static_argnames=("mesh", "n", "E", "W8", "Ws8", "WN",
                              "WNS", "WI8", "H", "C1", "C2", "CBf",
                              "CBs", "nrhs", "ndet", "segments",
                              "ssegments", "hbm_segs", "Lp8"))
def fused_sharded_solve(mesh: Mesh, n, E, W8, Ws8, WN, WNS, WI8, H,
                        C1, C2, CBf, CBs, nrhs,
                        fhs, fhsl, fhd, f_mdiag, f_cnt, f_ev1, f_ev2,
                        f_bidx, f_bcnt, f_mbc,
                        s_cnt, s_ev1, s_ev2, s_bidx, s_bcnt, s_mbc,
                        xown, val0, X0, ndet=None, segments=None,
                        ssegments=None, hbm_segs=None, Lp8=None):
    """ONE XLA program: sharded factor scan + per-RHS sharded solve
    scans. Returns a replicated flat int32 vector
    [fsing, fovf, sovf, det (W8), X (nrhs*n*Ws8)].

    Grouped (subtree-local) streams pass ndet = the table row holding
    the determinant (> n: local chains + PD + top rows, see
    tpu/schedule_subtree.py) and ship X clone rows inside X0 (rows
    n+1 ..); only X rows [0, n) are psum-returned either way.

    segments/ssegments: adaptive-width chunk segments ((lo, hi, W8s),
    ...) exactly as in the single-chip fused_solve_all — early chunks
    run the same events at a fraction of the width (MAC cost is
    quadratic in width); val/X widen and GT re-lifts at each segment
    boundary, all chip-local (tables are replicated, no extra
    collectives). val0 must be packed at segments[0] width, X0 at
    ssegments[0] width.

    hbm_segs: per-factor-segment HBM flags (driver: val_table_in_hbm
    at the PER-CHIP row count — the partition divides the table across
    chips, so HBM mode engages p× later than single-chip). An HBM
    segment keeps its per-chip table as [Lp8*KR, 128] packed planes in
    ANY memory and the kernels move rows by async DMA (_gather_row /
    _scatter_row); widen_val converts layouts at segment boundaries.
    The solve scans gather their a-operands from the finished table in
    its final layout. X and the rho/inverse tables stay VMEM-resident
    (O(n) objects; the value table is the O(nnz + fill) one). val0
    must arrive packed in hbm_segs[0]'s layout."""
    from ..tpu.relift import relift_gt, widen_tc, widen_val
    if ndet is None:
        ndet = n
    if segments is None:
        segments = ((0, f_cnt.shape[1], W8),)
    if ssegments is None:
        ssegments = ((0, s_cnt.shape[1], Ws8),)
    if hbm_segs is None:
        hbm_segs = (False,) * len(segments)
    axes = mesh_axes(mesh)
    # per-chip local table rows (slots); HBM packing flattens the
    # minor axes to [Lp8 * KR, 128], so the slot count rides in as Lp8
    E8v = Lp8 if Lp8 is not None else val0.shape[1]
    n8v = _r8(ndet + 2)
    S = len(segments)
    H8 = max(H, 8)

    def local(fhs, fhsl, fhd, f_mdiag, f_cnt, f_ev1, f_ev2,
              f_bidx, f_bcnt, f_mbc,
              s_cnt, s_ev1, s_ev2, s_bidx, s_bcnt, s_mbc,
              xown, val0, X0):
        sq = lambda a: a.reshape(a.shape[1:])
        fhsl, f_bidx, val0 = sq(fhsl), sq(f_bidx), sq(val0)
        f_mdiag, f_cnt = sq(f_mdiag), sq(f_cnt)
        f_ev1, f_ev2, f_mbc = sq(f_ev1), sq(f_ev2), sq(f_mbc)
        s_cnt, s_ev1, s_ev2, s_mbc = (sq(s_cnt), sq(s_ev1), sq(s_ev2),
                                      sq(s_mbc))
        xown = sq(xown)
        facc0 = jnp.zeros((8, 128), jnp.int32)

        dummy_a = jnp.zeros((8, 128), jnp.int32)

        def fstep_at(W8s, WNs, WQf, WVf, WIs, hseg, KRs):
            def fstep(carry, xs):
                val, SMT, GT, TZ, facc = carry
                (hs, hsl, hd, mdiag, cnt, e1, e2, bidx, bcnt, mbc) = xs
                # psum#1: owner-masked current diagonals of this chunk
                # (hsl is this chip's LOCAL index — dummy row off-chip)
                vrows = (val.reshape(E8v, KRs * 128)[:, :W8s]
                         if hseg else val)
                contrib = vrows[jnp.minimum(hsl, E8v - 1)] \
                    * mdiag[:, None]
                diag_b = lax.psum(contrib, axes)
                diag_b = jnp.concatenate(
                    [diag_b, jnp.zeros((H8 - H, W8s), jnp.int32)]) \
                    if H8 > H else diag_b
                val, SMT, GT, TZ, facc, bc_loc = _ab_call(
                    cnt, hs, hsl, hd, e1, bidx, bcnt, diag_b,
                    val, SMT, GT, TZ, facc, mbc,
                    n=n, E=E, W8=W8s, WN=WNs, WQ=WQf, WV=WVf,
                    WI8=WIs, H=H, C1=C1, CB8=f_bidx.shape[-1],
                    heads=True, Wt=W8s, is_solve=False,
                    hbm=hseg, KR=KRs)
                bc = lax.psum(bc_loc, axes)
                val, facc = _c_call(
                    cnt, e2, bidx, bcnt, bc,
                    dummy_a, SMT, GT, TZ, val,
                    facc, n=n, E=E, W8=W8s, WN=WNs, WQ=WQf, WV=WVf,
                    WI8=WIs, C2=C2, Wt=W8s, is_solve=False,
                    hbm_t=hseg, hbm_a=hseg, KR=KRs)
                return (val, SMT, GT, TZ, facc), None
            return fstep

        val = val0
        facc = facc0
        SMT = GT = TZ = None
        prev = None
        for (lo, hi, W8s), hseg in zip(segments, hbm_segs):
            WNs = _r8(2 * W8s + 2)
            WQf = _r8(W8s + 2)
            WIs = max(WQf, WI8) if S == 1 else WQf
            KRs = _r128(W8s) // 128 if hseg else 1
            if prev is None:
                SMT = jnp.zeros((n8v, W8s), jnp.int32).at[0, 0].set(1)
                GT = jnp.zeros((n8v, WIs), jnp.int32).at[0, 0].set(1)
                TZ = jnp.zeros((n8v, 8), jnp.int32)
            else:
                pW8, pWI, phbm = prev
                val = widen_val(val, E8v, pW8, W8s, phbm, hseg)
                SMT = widen_tc(SMT, pW8, W8s)
                GT = relift_gt(SMT, GT, TZ, W8s, pWI, WIs)
            WVf = _r8(WQf + W8s)
            (val, SMT, GT, TZ, facc), _ = lax.scan(
                fstep_at(W8s, WNs, WQf, WVf, WIs, hseg, KRs),
                (val, SMT, GT, TZ, facc),
                (fhs[lo:hi], fhsl[lo:hi], fhd[lo:hi],
                 f_mdiag[lo:hi], f_cnt[lo:hi], f_ev1[lo:hi],
                 f_ev2[lo:hi], f_bidx[lo:hi], f_bcnt[lo:hi],
                 f_mbc[lo:hi]))
            prev = (W8s, WIs, hseg)
        fsing = lax.psum(facc[0, 0], axes)
        fovf = lax.psum(facc[1, 0], axes)
        det_row = SMT[ndet]
        hbm_fin = prev[2]
        KRf = _r128(W8) // 128 if hbm_fin else 1
        WIf = prev[1]
        WQs_full = _r8(Ws8 + 2)
        if WIf < min(WI8, WQs_full):
            GT = relift_gt(SMT, GT, TZ, W8, WIf,
                           min(WI8, WQs_full))
            WIf = min(WI8, WQs_full)

        # ---- solve scans (one per RHS) ----
        def sstep_at(Ws_s, WNs, WQss, WVss):
            def sstep(carry, xs):
                X, facc = carry
                (cnt, e1, e2, bidx, bcnt, mbc) = xs
                X, _, _, _, facc, bc_loc = _ab_call(
                    cnt, jnp.zeros((H,), jnp.int32),
                    jnp.zeros((H,), jnp.int32),
                    jnp.zeros((H,), jnp.int32),
                    e1, bidx, bcnt,
                    jnp.zeros((H8, Ws_s), jnp.int32),
                    X, SMT, GT, TZ, facc, mbc,
                    n=n, E=E, W8=W8, WN=WNs, WQ=WQss, WV=WVss,
                    WI8=WIf, H=H, C1=C1, CB8=s_bidx.shape[-1],
                    heads=False, Wt=Ws_s, is_solve=True)
                bc = lax.psum(bc_loc, axes)
                X, facc = _c_call(
                    cnt, e2, bidx, bcnt, bc, val, SMT, GT, TZ, X,
                    facc, n=n, E=E, W8=W8, WN=WNs, WQ=WQss, WV=WVss,
                    WI8=WIf, C2=C2, Wt=Ws_s, is_solve=True,
                    hbm_a=hbm_fin, KR=KRf)
                return (X, facc), None
            return sstep

        souts = []
        sovf_all = jnp.int32(0)
        for c in range(nrhs):
            X = X0[c]
            sfacc = jnp.zeros((8, 128), jnp.int32)
            pWs = None
            for (lo, hi, Ws_s) in ssegments:
                if pWs is not None and Ws_s != pWs:
                    X = widen_tc(X, pWs, Ws_s)
                WNs = _r8(W8 + Ws_s + 2)
                WQss = min(WIf, _r8(Ws_s + 2))
                WVss = _r8(WQss + W8)
                (X, sfacc), _ = lax.scan(
                    sstep_at(Ws_s, WNs, WQss, WVss), (X, sfacc),
                    (s_cnt[lo:hi], s_ev1[lo:hi], s_ev2[lo:hi],
                     s_bidx[lo:hi], s_bcnt[lo:hi], s_mbc[lo:hi]))
                pWs = Ws_s
            sovf_all = sovf_all + lax.psum(
                sfacc[0, 0] + sfacc[1, 0], axes)
            xfull = lax.psum(X[:n] * xown[:n, None], axes)
            souts.append(xfull.reshape(-1))

        flags = jnp.stack([fsing, fovf, sovf_all])
        return jnp.concatenate([flags, det_row] + souts)

    sh = lambda a: P(axes, *([None] * (a - 1)))
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), sh(3), P(), sh(3), sh(3), sh(4), sh(4),
                  sh(3), P(), sh(3),
                  sh(3), sh(4), sh(4), P(), P(), sh(3),
                  sh(2), sh(3), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(fhs, fhsl, fhd, f_mdiag, f_cnt, f_ev1, f_ev2,
              f_bidx, f_bcnt, f_mbc,
              s_cnt, s_ev1, s_ev2, s_bidx, s_bcnt, s_mbc,
              xown, val0, X0)
