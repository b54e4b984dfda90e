"""Fused sparse REF LU: the entire factorization as ONE Pallas call.

The scheduled sparse path (tpu/factor_sparse.py) lowers each elimination
step to ~10 separate XLA ops (gathers, convolutions, table updates);
on this runtime every non-fused op costs a fixed dispatch quantum, which
floors small-matrix solves far above the hardware's capability. Here the
whole factorization runs inside one pallas_call whose grid walks the
uniform-event chunk stream (tpu/schedule_stream.py): per grid step the
kernel gathers the chunk's operand rows from the value table, does
phase A (sequential pivot heads: history-fix the diagonal, Hensel-lift
its inverse), then two batched passes of the single formula

    out = (val[target] * SMT[mult] - A * B) / GT[div]

entirely in-register/VMEM. A second pallas_call replays the solve
stream (forward substitution, determinant scale, back substitution)
against the finished tables. Reference behavior being reproduced:
SLIP_LU_factorize.c + slip_ref_triangular_solve.c (factor stream) and
SLIP_LU_solve.c / slip_forward_sub.c / slip_back_sub.c (solve stream).

Value-table placement: VMEM tiles are (8 sublanes x 128 lanes), so an
[E8, W8] int32 table occupies E8*max(128, W8)*4 bytes of VMEM no matter
how narrow W8 is — 120MB for a 100K-nnz fill at ANY width. Above a
budget the table therefore lives in HBM ([E8, WH] rows, WH = W8 rounded
to 128 lanes, the DMA slice granularity) and the kernels gather/scatter
rows with async DMAs: issue the whole chunk's row copies, wait once,
compute. Small problems keep the all-VMEM layout (same code, static
flag). This is what scales the path across the 100K-1M nnz regime.

Arithmetic is two's-complement multi-limb (ops/pallas_limbs.py); all
divisions run as VERIFIED SHORT DIVISIONS — the Hensel product at the
quotient-sized modulus WQ = target+2 limbs, re-multiplied against the
divisor and compared with the numerator so that any wrapped quotient
is caught exactly (see _pass_body). Overflow and exact-cancellation
(singular pivot) come back as flags; the driver widens-and-retries or
replans (backslash_fused.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import pallas_limbs as pk
from ..ops.pallas_limbs import MASK16


def _r8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _r128(x: int) -> int:
    return ((x + 127) // 128) * 128


_HBM_VAL_BUDGET = 40 * 2**20  # VMEM bytes the value table may occupy


def val_table_in_hbm(E8: int, W8: int) -> bool:
    """Whether the value table must live in HBM (see module docstring).
    SLIP_HBM_BUDGET (bytes) overrides the default 40MB — mainly to
    force HBM mode on small matrices in tests/diagnostics."""
    import os
    budget = int(os.environ.get("SLIP_HBM_BUDGET", _HBM_VAL_BUDGET))
    return E8 * max(128, _r128(W8)) * 4 > budget


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _one_residue(rows: int, b: int) -> jnp.ndarray:
    return jnp.concatenate(
        [jnp.ones((1, b), jnp.int32), jnp.zeros((rows - 1, b), jnp.int32)])


def _signed_terms(pu, x, y, D):
    """Split the signed-product correction of pu = conv_u(x, y) mod D
    into (positive_extra, negative_extra): true signed product
    = pu + pos - neg (all mod 2**(16*D))."""
    Wx, B = x.shape
    Wy = y.shape[0]
    nx = pk.neg_flag(x)
    ny = pk.neg_flag(y)
    pad = jnp.zeros((max(0, D - Wy), B), jnp.int32)
    cy = pk.shift_rows_up(pk._cat([y * nx, pad])[:D], Wx)
    pad2 = jnp.zeros((max(0, D - Wx), B), jnp.int32)
    cx = pk.shift_rows_up(pk._cat([x * ny, pad2])[:D], Wy)
    neg = cx + cy                                  # per-limb <= 2*MASK16
    if Wx + Wy < D:
        pos = pk._cat([
            jnp.zeros((Wx + Wy, B), jnp.int32), nx * ny,
            jnp.zeros((D - Wx - Wy - 1, B), jnp.int32)])
    else:
        pos = jnp.zeros((D, B), jnp.int32)
    return pos, neg


def lane_group(x: int) -> int:
    """Member-lane count for x members: padded to a multiple of 8 on
    hardware (row-slice alignment); exact in interpreter mode, where
    padding would be real CPU work instead of free lanes."""
    return x if _interpret() else -(-x // 8) * 8


def _mo8(x, G: int):
    """8-alignment hint for member-row offsets — only when TRUE
    (G a multiple of 8); unpadded interpreter-mode member counts must
    not claim alignment they don't have."""
    return pl.multiple_of(x, 8) if G % 8 == 0 else x


def _dma(src_ref, s_row, dst_ref, d_row, sem):
    return pltpu.make_async_copy(src_ref.at[pl.ds(s_row, 1), :],
                                 dst_ref.at[pl.ds(d_row, 1), :], sem)


def _gather_row(tbl, slot, dst3, e, KR, sem, wait=False):
    """HBM value row -> VMEM gather planes. The table stores each slot
    as KR consecutive 128-lane rows and the destination is segment-major
    [KR, C, 128]: every DMA endpoint is a [1, 128] slice of a
    single-lane-tile plane, the only slice shape the DMA engine accepts
    (multi-tile rows cannot be partially sliced)."""
    for k2 in range(KR):
        cp = pltpu.make_async_copy(
            tbl.at[pl.ds(slot * KR + k2, 1), :],
            dst3.at[k2, pl.ds(e, 1), :], sem)
        cp.wait() if wait else cp.start()


def _scatter_row(src3, e, tbl, slot, KR, sem, wait=False):
    """VMEM planes -> HBM value row (KR 128-lane segments)."""
    for k2 in range(KR):
        cp = pltpu.make_async_copy(
            src3.at[k2, pl.ds(e, 1), :],
            tbl.at[pl.ds(slot * KR + k2, 1), :], sem)
        cp.wait() if wait else cp.start()


def _planes_T(gat, C, hbm):
    """Gathered rows, transposed to limb-major [W, C]: segment-major
    planes concatenate along the limb axis in HBM mode."""
    if hbm:
        return jnp.concatenate(
            [gat[k2, :C, :].T for k2 in range(gat.shape[0])], axis=0)
    return gat[:C, :].T


def _fold_members(v, CL: int, G: int):
    """[1, C*G] per-(event, member) mask, member-minor -> [1, G] per
    member, by log-halving OR over the event axis (halving a
    member-minor layout folds event blocks onto event blocks)."""
    w = CL
    while w > G:
        w //= 2
        v = v[:, :w] | v[:, w:2 * w]
    return v


def _facc_or(facc, cat: int, memb):
    """OR a [1, G] per-member flag vector into accumulator row `cat`
    (facc is [8, 128]; lanes beyond G keep their zeros)."""
    G = memb.shape[1]
    if G < 128:
        memb = pk._cat([memb, jnp.zeros((1, 128 - G), jnp.int32)],
                       axis=1)
    facc[cat:cat + 1, :] = facc[cat:cat + 1, :] | memb


def _pass_body(C, Wt, Wo, W8, WN, WQ, WV, E_dummy,
               cnt, ev_ref, tgt_ref, a_ref, SMT_ref, GT_ref, TZ_ref,
               gat_t, gat_m, gat_a, gat_b, gat_g, gat_z, gat_dm, scat,
               conv, facc, b_src_ref, flag_slot=1,
               hbm=(False, False, False), sem=None, KR=1,
               has_ab=True, m0=None, d0=None,
               G=1, a_g=True, tab_g=True, um=None, ud=None,
               tpk=False, TO_G=0, TO_Z=0, KRT=None, evo=0):
    mT, bT, iT, acc0, acc1, pA, pB, qb = conv
    if KRT is None:
        KRT = KR                     # target/b row width = a row width
    """One batched pass: gather -> fix/update formula -> scatter.

    Wt: limb width of target rows (W8 for factor, Ws8 for solve);
    Wo: output width = Wt. a operands always come from the value table
    (width W8); b operands from b_src_ref (val for factor, X for solve).

    VERIFIED SHORT DIVISION: the exact quotient fits Wo limbs whenever
    the write is overflow-clean, so the Hensel product runs at the
    SHORT modulus WQ = _r8(Wo + 2) (cost ~WQ^2 instead of WN^2) and a
    verification multiply q'*rho_div restores soundness: WV >= WQ + W8
    rows make residue equality imply INTEGER equality (both sides fit
    WQ + W8 limbs signed), so `verify ok` <=> q' is the exact quotient,
    and then fits_in(q', Wo) is an exact overflow detector. Any
    mismatch (true quotient too wide for WQ) raises the overflow flag
    and the driver widens-and-retries — never a wrong answer.

    cnt is the chunk's REAL event count (SMEM scalar): gather/scatter
    loops run cnt iterations, not capacity C; lanes >= cnt hold stale
    scratch whose (discarded) arithmetic is harmless, and the overflow
    reduction is masked to live lanes. An empty pass is skipped whole.

    Shortcut structure (the uniform formula specialized per chunk):
      * has_ab (STATIC): pass-1 events never carry a live A operand
        (asserted by the stream builder), so the A*B product, its sign
        corrections, and both gathers drop out of pass 1 entirely;
      * m0 (traced per chunk): every event multiplies by SMT[0] = 1 —
        the target IS the P side (back-substitution, pivot division);
      * d0 (traced per chunk): every event divides by GT[0] = 1 — the
        numerator IS the quotient (back-sub updates, determinant
        scale). Together these cut ~6x off back-substitution chunks.

    hbm = (target, a, b) flags: HBM-resident sources gather by async
    row DMA (issue all, wait all); VMEM sources copy directly. An HBM
    target also scatters back by DMA. All DMAs share ONE byte-counting
    scalar semaphore (v5e has 2KB of semaphore memory — per-event sem
    arrays do not fit): since every phase is issue-all/wait-all, the
    summed waits exactly consume the summed signals.

    MEMBER-LANE BATCHING (G > 1): G pattern-sharing systems ride the
    vector lanes, member-MINOR — lane e*G + g holds event e of member
    g. Member-ized tables store G consecutive rows per logical slot
    (row slot*G + g), so one event gathers a G-row slice (offsets
    provably 8-aligned: G is 1 or a multiple of 8). a_g=False means
    the a-source is SHARED across members (multi-RHS solves: one
    factored value table, G right-hand sides) and each a row is
    replicated across the member lanes. Narrow-lane arithmetic pads
    to 128 lanes anyway, so thin streams get the extra members nearly
    free. Flags accumulate PER MEMBER into facc[cat, member]
    (categories: 0 sing, 1 any-ovf, 2 heads, 3 pass1, 4 pass2).
    G > 1 requires all-VMEM tables (the drivers fall back per member
    when the value table must live in HBM).

    PACKED TABLES (tpk=True, G == 1 only): for large n with small
    widths, three separate VMEM tables each pad their rows to 128
    lanes (a [n8, 8] TZ costs as much as a [n8, 128]); when
    W8 + WI8 + 1 <= 128 they fuse into ONE [n8, 128] table instead —
    lanes [0, W8) = SMT row, [TO_G, TO_G+WI8) = GT row, lane TO_Z = tz
    — passed as SMT_ref = GT_ref = TZ_ref. One row gather then serves
    the div side's inverse, tz, AND verify divisor together (2 gathers
    per event instead of 4), and the table footprint drops 3x, which
    is what fits 100K-row tables (1M-nnz solves) in VMEM at all.
    """
    t_hbm, a_hbm, b_hbm = hbm
    if tpk:
        assert G == 1 and tab_g
    CL = C * G
    # uniform mult/div shortcut (builder flag bits 4-7): one shared
    # table row broadcasts to all lanes instead of per-event gathers.
    # Disabled for member-ized tables (each member has its own row —
    # broadcasting would need a G-row tile per lane block).
    if G > 1 and tab_g:
        um = ud = None
    falsy = None
    if um is None or ud is None:
        falsy = jnp.zeros((), jnp.bool_)
    umv = falsy if um is None else um
    udv = falsy if ud is None else ud

    def _memb_copy(gat, src, e, idx):
        """gather rows of a member-ized source: G rows per event."""
        if G == 1:
            gat[pl.ds(e, 1), :] = src[pl.ds(idx, 1), :]
        else:
            gat[pl.ds(_mo8(e * G, G), G), :] = \
                src[pl.ds(_mo8(idx * G, G), G), :]

    def _shared_copy(gat, src, e, idx):
        """gather one shared row, replicated across the member lanes."""
        for g in range(G):
            gat[pl.ds(e * G + g, 1), :] = src[pl.ds(idx, 1), :]

    @pl.when(cnt > 0)
    def _run():
        _tab_copy = _memb_copy if tab_g else _shared_copy

        def gissue(e, _):
            t = ev_ref[0, evo + 0, e]
            m_ = ev_ref[0, evo + 1, e]
            d_ = ev_ref[0, evo + 2, e]

            @pl.when(~umv)
            def _gm():
                _tab_copy(gat_m, SMT_ref, e, m_)

            @pl.when(~udv)
            def _gd():
                if tpk:
                    # one packed row = GT + tz + verify divisor
                    _tab_copy(gat_dm, GT_ref, e, d_)
                else:
                    _tab_copy(gat_g, GT_ref, e, d_)
                    _tab_copy(gat_z, TZ_ref, e, d_)
                    _tab_copy(gat_dm, SMT_ref, e, d_)
            if t_hbm:
                _gather_row(tgt_ref, t, gat_t, e, KRT, sem)
            else:
                _memb_copy(gat_t, tgt_ref, e, t)
            if has_ab:
                a_ = ev_ref[0, evo + 3, e]
                b_ = ev_ref[0, evo + 4, e]
                if a_hbm:
                    _gather_row(a_ref, a_, gat_a, e, KR, sem)
                elif a_g:
                    _memb_copy(gat_a, a_ref, e, a_)
                else:
                    _shared_copy(gat_a, a_ref, e, a_)
                if b_hbm:
                    _gather_row(b_src_ref, b_, gat_b, e, KRT, sem)
                else:
                    _memb_copy(gat_b, b_src_ref, e, b_)
            return 0

        lax.fori_loop(0, cnt, gissue, 0)

        if t_hbm or (has_ab and (a_hbm or b_hbm)):
            def gwait(e, _):
                t = ev_ref[0, evo + 0, e]
                if t_hbm:
                    _gather_row(tgt_ref, t, gat_t, e, KRT, sem,
                                wait=True)
                if has_ab:
                    a_ = ev_ref[0, evo + 3, e]
                    b_ = ev_ref[0, evo + 4, e]
                    if a_hbm:
                        _gather_row(a_ref, a_, gat_a, e, KR, sem,
                                    wait=True)
                    if b_hbm:
                        _gather_row(b_src_ref, b_, gat_b, e, KRT, sem,
                                    wait=True)
                return 0

            lax.fori_loop(0, cnt, gwait, 0)

        tT = _planes_T(gat_t, CL, t_hbm)[:Wt]          # [Wt, CL]
        if tpk:
            # the packed div row carries inverse, tz, and divisor
            dT = gat_dm[:CL, :].T                      # [128, CL]
            if ud is None:
                iT[:] = dT[TO_G:TO_G + WQ]
                tz = dT[TO_Z:TO_Z + 1]
            else:
                d0r = ev_ref[0, evo + 2, 0]
                drow = GT_ref[pl.ds(d0r, 1), :]
                dT_u = jnp.broadcast_to(drow, (CL, 128)).T
                iT[:] = jnp.where(ud, dT_u[TO_G:TO_G + WQ],
                                  dT[TO_G:TO_G + WQ])
                tz = jnp.where(ud, dT_u[TO_Z:TO_Z + 1],
                               dT[TO_Z:TO_Z + 1])
        elif ud is None:
            iT[:] = gat_g[:CL, :].T[:WQ]               # [WQ, CL]
            tz = gat_z[:CL, :].T[0:1]                  # [1, CL]
        else:
            d0r = ev_ref[0, evo + 2, 0]
            gt_row = GT_ref[pl.ds(d0r, 1), :]
            iT_u = jnp.broadcast_to(gt_row,
                                    (CL, gt_row.shape[1])).T[:WQ]
            iT[:] = jnp.where(ud, iT_u, gat_g[:CL, :].T[:WQ])
            tz_u = jnp.broadcast_to(TZ_ref[pl.ds(d0r, 1), 0:1],
                                    (1, CL))
            tz = jnp.where(ud, tz_u, gat_z[:CL, :].T[0:1])

        # P side: target * rho_mult (skipped whole when mult == 0)
        @pl.when(m0)
        def _pm0():
            pA[:] = pk.sign_extend(tT, WN)
            pB[:] = jnp.zeros_like(pB)

        @pl.when(~m0)
        def _pm1():
            if um is None:
                mT[:] = gat_m[:CL, :].T[:W8]           # [W8, CL]
            else:
                m0r = ev_ref[0, evo + 1, 0]
                mrow = SMT_ref[pl.ds(m0r, 1), :]
                mT_u = jnp.broadcast_to(
                    mrow, (CL, mrow.shape[1])).T[:W8]
                mT[:] = jnp.where(um, mT_u, gat_m[:CL, :].T[:W8])
            p1u = pk.mul_mod(tT, mT, 0, W8, acc0, acc1, WN)
            pos1, neg1 = _signed_terms(p1u, tT, mT[:], WN)
            pA[:] = pk.carry_normalize(p1u + pos1, 2 * MASK16)
            pB[:] = neg1                               # <= 2*MASK16/limb

        if has_ab:
            # N side: A * B (unsigned conv + sign corrections)
            aT = _planes_T(gat_a, CL, a_hbm)[:W8]      # [W8, CL]
            bT[:] = _planes_T(gat_b, CL, b_hbm)[:bT.shape[0]]
            Wb = bT.shape[0]
            p2u = pk.mul_mod(aT, bT, 0, Wb, acc0, acc1, WN)
            pos2, neg2 = _signed_terms(p2u, aT, bT[:], WN)
            P = pk.carry_normalize(pA[:] + neg2, 3 * MASK16)
            N = pk.carry_normalize(p2u + pos2 + pB[:], 4 * MASK16)
            num = pk.sub_mod(P, N)
        else:
            num = pk.sub_mod(pA[:],
                             pk.carry_normalize(pB[:], 2 * MASK16))

        # exact division by rho_div: shift out tz bits, multiply by the
        # Hensel inverse at the SHORT modulus 2**(16*WQ), then verify
        # q'*rho_div == num exactly (residues mod 2**(16*WV) with both
        # sides < 2**(16*WV-1) in magnitude, so equality is integer
        # equality); a mismatch poisons q's top limb so the fits_in
        # overflow check below flags it — see the docstring proof
        @pl.when(d0)
        def _qd0():
            qb[:] = num

        @pl.when(~d0)
        def _qd1():
            shifted = pk.shr_bits(num, tz, W8)
            qp = pk.mul_mod(shifted[:WQ], iT, 0, WQ, acc0, acc1, WQ)
            if ud is None:
                mT[:] = gat_dm[:CL, :].T[:W8]          # rho_div [W8, CL]
            else:
                dvrow = SMT_ref[pl.ds(ev_ref[0, evo + 2, 0], 1), :]
                dm_u = jnp.broadcast_to(
                    dvrow, (CL, dvrow.shape[1])).T[:W8]
                mT[:] = jnp.where(ud, dm_u, gat_dm[:CL, :].T[:W8])
            vu = pk.mul_mod(qp, mT, 0, W8, acc0, acc1, WV)
            posv, negv = _signed_terms(vu, qp, mT[:], WV)
            v = pk.sub_mod(pk.carry_normalize(vu + posv, 2 * MASK16),
                           pk.carry_normalize(negv, 2 * MASK16))
            bad = ~jnp.all(v == pk.sign_extend(num, WV), axis=0,
                           keepdims=True)              # [1, C]
            q_ext = pk.sign_extend(qp, WN)
            top = jnp.where(bad, q_ext[-1:] ^ 0x5555, q_ext[-1:])
            qb[:] = pk._cat([q_ext[:-1], top])

        q = qb[:]
        lane = lax.broadcasted_iota(jnp.int32, (1, CL), 1)
        ovf = ((~pk.fits_in(q, Wo)) & (lane < cnt * G)).astype(jnp.int32)
        memb = _fold_members(ovf, CL, G)
        _facc_or(facc, 1, memb)
        _facc_or(facc, flag_slot, memb)

        if t_hbm:
            full = pk._cat([q[:Wo],
                            jnp.zeros((128 * KRT - Wo, CL),
                                      jnp.int32)])
            for k2 in range(KRT):
                scat[k2, 0:CL, :] = full[128 * k2:128 * (k2 + 1), :].T
        else:
            scat[0:CL, :] = q[:Wo].T                   # [CL, Wo]

        def sissue(e, _):
            t = ev_ref[0, evo + 0, e]
            if t_hbm:
                _scatter_row(scat, e, tgt_ref, t, KRT, sem)
            else:
                if G == 1:
                    tgt_ref[pl.ds(t, 1), :] = scat[pl.ds(e, 1), :]
                else:
                    tgt_ref[pl.ds(_mo8(t * G, G), G), :] = \
                        scat[pl.ds(_mo8(e * G, G), G), :]
            return 0

        lax.fori_loop(0, cnt, sissue, 0)

        if t_hbm:
            def swait(e, _):
                t = ev_ref[0, evo + 0, e]
                _scatter_row(scat, e, tgt_ref, t, KRT, sem, wait=True)
                return 0

            lax.fori_loop(0, cnt, swait, 0)


def _heads_phase(ks, slots, dvs, nh, anyfix, val, SMT, GT, TZ,
                 hgx, hgm, hgi, hgz, hgv, hmT, hiT, hbT, nbuf, Rbuf,
                 lacc0, lacc1, ld, ltz, facc, *,
                 W8, WN, WQ, WV, WI8, G, hbm=False, hrows=None,
                 sem=None, KR=1, diag_ext=None,
                 tpk=False, TO_G=0, TO_Z=0):
    """Phase A: a chunk's pivot heads, batched + chain-refined.

    Head t rides lanes [t*GL, (t+1)*GL). The only sequential content of
    a chunk's heads is the rho chain itself: head k's history fix
    multiplies by SMT[k] = rho_{k-1}, produced IN-CHUNK exactly when
    head k-1 shares the chunk (heads are consecutive ascending steps).
    Everything else batches:
      1. gather all head operands (diag, SMT[k], GT/TZ/SMT[dv]);
      2. ONE speculative batched fix of every fix-head from pre-chunk
         table state — final for heads whose k-1 is outside the chunk;
      3. sequential refine of true chain links only (2 muls per link:
         product with the just-refined rho_{k-1}, short division);
      4. ONE deferred batched verify of all fixes + flags + table/val
         writes + lift staging (ld/ltz for _lift_phase).
    vs a per-head loop (3 sequential full-width muls per fix plus
    per-head verify/flag/staging overhead) this costs 2 batched +
    2*links sequential + 1 batched muls per chunk.

    ks/slots/dvs: H traced scalars each (pad step -1). diag_ext, when
    given, is an [HL8, W8] VMEM ref holding the heads' diagonal rows
    (the sharded path passes the psum-broadcast diags); otherwise the
    diag gathers from val (VMEM) or the prefetched hrows (HBM).
    """
    H = len(ks)
    GL = 1 if G == 1 else G
    HL = H * GL
    HL8 = max(HL, 8)
    # ---- 1. batched gathers (per-head row copies). The fix operands
    # (SMT[k], GT/TZ/SMT[dv]) are only touched by the anyfix-gated
    # passes below, so skip-only chunks gather nothing but the diag.
    for t in range(H):
        k = ks[t]

        @pl.when(k >= 0)
        def _gd():
            slot = slots[t]
            if G == 1:
                if diag_ext is None and not hbm:
                    hgx[t:t + 1, :] = val[pl.ds(slot, 1), :]
            else:
                if diag_ext is None:
                    hgx[pl.ds(_mo8(t * G, G), G), :] = \
                        val[pl.ds(_mo8(slot * G, G), G), :]

        @pl.when((k >= 0) & anyfix)
        def _g():
            dv = dvs[t]
            if tpk:
                # packed rows: row k = mult, row dv = inverse + tz +
                # verify divisor, all in two gathers
                hgm[t:t + 1, :] = SMT[pl.ds(k, 1), :]
                hgi[t:t + 1, :] = GT[pl.ds(dv, 1), :]
            elif G == 1:
                hgm[t:t + 1, :] = SMT[pl.ds(k, 1), :]
                hgi[t:t + 1, :] = GT[pl.ds(dv, 1), :]
                hgz[t:t + 1, :] = TZ[pl.ds(dv, 1), :]
                hgv[t:t + 1, :] = SMT[pl.ds(dv, 1), :]
            else:
                dst = pl.ds(_mo8(t * G, G), G)
                hgm[dst, :] = SMT[pl.ds(_mo8(k * G, G), G), :]
                hgi[dst, :] = GT[pl.ds(_mo8(dv * G, G), G), :]
                hgz[dst, :] = TZ[pl.ds(_mo8(dv * G, G), G), :]
                hgv[dst, :] = SMT[pl.ds(_mo8(dv * G, G), G), :]

    if diag_ext is not None:
        xT = diag_ext[:HL8, :].T[:W8]
    elif hbm:
        xT = jnp.concatenate(
            [hrows[k2, :HL8, :] for k2 in range(KR)],
            axis=1).T[:W8]                       # [W8, HL8]
    else:
        xT = hgx[:].T[:W8]

    # per-lane live mask: heads pack contiguously from lane 0 (pads
    # have k = -1 and sit at the end), so one compare suffices
    lane = lax.broadcasted_iota(jnp.int32, (1, HL8), 1)
    live = lane < nh * GL

    # ---- 2-4 (fix chunks only): speculative batched fix, sequential
    # chain refine, deferred batched verify. Skip-only chunks bypass
    # the whole block — their rho IS the gathered diagonal.
    @pl.when(anyfix)
    def _fix_chunk():
        fixm = jnp.zeros((1, HL8), jnp.bool_)
        for t in range(H):
            blk = (lane >= t * GL) & (lane < (t + 1) * GL)
            fixm = fixm | (blk & (ks[t] >= 0) & (dvs[t] != ks[t]))
        hmT[:] = hgm[:].T[:W8]
        if tpk:
            hiT[:] = hgi[:].T[TO_G:TO_G + WQ]
            tzv = hgi[:].T[TO_Z:TO_Z + 1]        # [1, HL8]
        else:
            hiT[:] = hgi[:].T[:WQ]
            tzv = hgz[:].T[0:1]                  # [1, HL8]
        # speculative fix of every head from pre-chunk table state
        p1u = pk.mul_mod(xT, hmT, 0, W8, lacc0, lacc1, WN)
        pos1, neg1 = _signed_terms(p1u, xT, hmT[:], WN)
        P = pk.carry_normalize(p1u + pos1, 2 * MASK16)
        num = pk.sub_mod(P, pk.carry_normalize(neg1, 2 * MASK16))
        nbuf[:] = num
        shifted = pk.shr_bits(num, tzv, W8)
        qp = pk.mul_mod(shifted[:WQ], hiT, 0, WQ, lacc0, lacc1, WQ)
        Rbuf[:] = jnp.where(fixm, qp, pk.sign_extend(xT, WQ))

        # sequential refine of true chain links
        for t in range(1, H):
            k = ks[t]

            @pl.when((k >= 0) & (dvs[t] != k) & (ks[t - 1] == k - 1))
            def _link():
                prev = Rbuf[:W8, (t - 1) * GL:t * GL]    # [W8, GL]
                if GL == 1:
                    hbT[:] = jnp.broadcast_to(prev, (W8, HL8))
                else:
                    reps = -(-HL8 // GL)
                    hbT[:] = jnp.concatenate(
                        [prev] * reps, axis=1)[:, :HL8]
                p1u = pk.mul_mod(xT, hbT, 0, W8, lacc0, lacc1, WN)
                pos1, neg1 = _signed_terms(p1u, xT, hbT[:], WN)
                P = pk.carry_normalize(p1u + pos1, 2 * MASK16)
                num = pk.sub_mod(P,
                                 pk.carry_normalize(neg1, 2 * MASK16))
                blk = (lane >= t * GL) & (lane < (t + 1) * GL)
                nbuf[:] = jnp.where(blk, num, nbuf[:])
                shifted = pk.shr_bits(num, tzv, W8)
                qp = pk.mul_mod(shifted[:WQ], hiT, 0, WQ, lacc0,
                                lacc1, WQ)
                Rbuf[:] = jnp.where(blk, qp, Rbuf[:])

        # deferred batched verify of every fix
        if tpk:
            hbT[:] = hgi[:].T[:W8]               # divisor (packed row)
        else:
            hbT[:] = hgv[:].T[:W8]               # divisor rows
        vu = pk.mul_mod(Rbuf[:WQ, :], hbT, 0, W8, lacc0, lacc1, WV)
        posv, negv = _signed_terms(vu, Rbuf[:WQ, :], hbT[:], WV)
        v = pk.sub_mod(pk.carry_normalize(vu + posv, 2 * MASK16),
                       pk.carry_normalize(negv, 2 * MASK16))
        bad = (~jnp.all(v == pk.sign_extend(nbuf[:], WV), axis=0,
                        keepdims=True)) & fixm
        badm = _fold_members(bad.astype(jnp.int32)[:, :HL], HL, G)
        _facc_or(facc, 1, badm)
        _facc_or(facc, 2, badm)

    @pl.when(~anyfix)
    def _nofix():
        Rbuf[:] = pk.sign_extend(xT, WQ)

    rho = Rbuf[:]
    zer = pk.is_zero(rho) & live                 # [1, HL8]
    zm = _fold_members(zer.astype(jnp.int32)[:, :HL], HL, G)
    _facc_or(facc, 0, zm)
    hovf = (~pk.fits_in(rho, W8)) & live
    om = _fold_members(hovf.astype(jnp.int32)[:, :HL], HL, G)
    _facc_or(facc, 1, om)
    _facc_or(facc, 2, om)
    rho_w = jnp.where(zer, _one_residue(W8, HL8), rho[:W8])
    rows_all = rho_w.T                           # [HL8, W8]
    if hbm:
        # sublane-pad to the DMA row width BEFORE transposing (lane
        # concats of sliced rows break Mosaic's offset layout)
        rows_pad = pk._cat(
            [rho_w, jnp.zeros((128 * KR - W8, HL8), jnp.int32)]
        ).T                                      # [HL8, 128*KR]
    for t in range(H):
        k = ks[t]

        @pl.when(k >= 0)
        def _wr():
            slot = slots[t]
            if G == 1:
                row = rows_all[t:t + 1, :]
                if not tpk:
                    # packed mode writes SMT combined with GT/tz after
                    # the lift (_lift_phase) — one full-lane row each
                    SMT[pl.ds(k + 1, 1), :] = row
                if hbm:
                    for k2 in range(KR):
                        hrows[k2, t:t + 1, :] = \
                            rows_pad[t:t + 1, 128 * k2:128 * (k2 + 1)]
                    _scatter_row(hrows, t, val, slot, KR, sem)
                else:
                    val[pl.ds(slot, 1), :] = row
            else:
                rows = rows_all[t * G:(t + 1) * G, :]
                SMT[pl.ds(_mo8((k + 1) * G, G), G), :] = rows
                val[pl.ds(_mo8(slot * G, G), G), :] = rows
    # stage for the batched Hensel lift (lanes already head-major)
    tzr = pk.trailing_zero_bits(rho_w)           # [1, HL8]
    odd = pk.shr_bits(pk.sign_extend(rho_w, WI8), tzr, W8)
    ld[:] = jnp.where(live, odd, ld[:])
    ltz[:] = jnp.where(live, tzr, ltz[:])


def _lift_phase(ks, GT, TZ, ld, lx, lu, ltz, lacc0, lacc1, *, WI8, G,
                tpk=False, W8=0, TO_G=0, TO_Z=0, Rbuf=None):
    """Phase A2: batched Hensel lift of the chunk's new pivot inverses
    (Newton doubling over the staged odd parts in ld) + GT/TZ writes.

    Packed mode (tpk): writes each head's ENTIRE table row at once —
    [rho | inverse | tz] assembled limb-major then transposed (full
    128-lane row stores only; GT is the packed table, Rbuf still holds
    the heads' rhos from _heads_phase)."""
    H = len(ks)
    LL = ld.shape[1]
    x = pk.inv16(ld[0:1, :])
    w = 1
    while w < WI8:
        w2 = min(2 * w, WI8)
        lx[:] = pk._cat([x, jnp.zeros((WI8 - x.shape[0], LL),
                                      jnp.int32)])
        tprod = pk.mul_mod(ld[:w2, :], lx, 0, w, lacc0, lacc1, w2)
        u = pk.two_minus_mod(tprod)
        lu[:] = pk._cat([u, jnp.zeros((WI8 - w2, LL), jnp.int32)])
        x = pk.mul_mod(
            pk._cat([x, jnp.zeros((w2 - x.shape[0], LL),
                                  jnp.int32)]),
            lu, 0, w2, lacc0, lacc1, w2)
        w = w2
    inv_full = pk._cat(
        [x, jnp.zeros((WI8 - x.shape[0], LL), jnp.int32)])
    if tpk:
        # assemble [rho | inverse | tz | 0-pad] limb-major, transpose,
        # write full 128-lane rows (TO_G == W8, TO_Z == W8 + WI8)
        rho = Rbuf[:]
        zer = pk.is_zero(rho)
        rho_w = jnp.where(zer, _one_residue(W8, LL), rho[:W8])
        comb = pk._cat([rho_w, inv_full, ltz[:],
                        jnp.zeros((128 - TO_Z - 1, LL), jnp.int32)])
        rowsC = comb.T                              # [LL, 128]
        for t in range(H):
            k = ks[t]

            @pl.when(k >= 0)
            def _write_row():
                GT[pl.ds(k + 1, 1), :] = rowsC[t:t + 1, :]
        return
    invT = inv_full.T                               # [LL, WI8]
    tzT = ltz[:].T                                  # [LL, 1]
    for t in range(H):
        k = ks[t]

        @pl.when(k >= 0)
        def _write_gt():
            if G == 1:
                GT[pl.ds(k + 1, 1), :] = invT[t:t + 1, :]
                TZ[pl.ds(k + 1, 1), :] = jnp.broadcast_to(
                    tzT[t:t + 1, :], (1, 8))
            else:
                GT[pl.ds(_mo8((k + 1) * G, G), G), :] = \
                    invT[t * G:(t + 1) * G, :]
                TZ[pl.ds(_mo8((k + 1) * G, G), G), :] = \
                    jnp.broadcast_to(tzT[t * G:(t + 1) * G, :],
                                     (G, 8))


def _factor_kernel(hmeta, ev1, ev2, val_in,
                   *rest, n, E, W8, WN, WQ, WV, WI8, H, C1, C2, hbm, KR,
                   first, G=1, tpk=False, TO_G=0, TO_Z=0, CK=1):
    # hmeta [1, CK, 3H+4]: lanes [0,H) head steps, [H,2H) diag slots,
    # [2H,3H) diag hists, [3H,3H+4) the chunk counts/flags (2D layout:
    # a [nc, C, 5]-shaped HBM operand tiles its 5-wide minor dim to
    # 128, a 25x memory blowup at 1M nnz). CK SUB-CHUNKS execute per
    # grid step in an in-kernel loop — the per-grid-step pipeline
    # overhead (~15 us on v5e: SMEM window swaps + bookkeeping) was
    # 60% of narrow-width solves at one chunk per step.
    # later segments receive the previous tables as ANY-memory inputs
    # (a VMEM block spec here would DOUBLE the table footprint — the
    # in-window and out-window both count against scoped VMEM, which
    # overflowed at 100K nnz); they DMA into the output tables at init
    if first:
        SMT_in = GT_in = TZ_in = None
        val, SMT, GT, TZ, flags = rest[:5]
        scratch = rest[5:]
    else:
        SMT_in, GT_in, TZ_in = rest[:3]
        val, SMT, GT, TZ, flags = rest[3:8]
        scratch = rest[8:]
    (gat_t, gat_m, gat_a, gat_b, gat_g, gat_z, gat_dm, scat,
     mT1, bT1, iT1, acc0a, acc1a, pA1, pB1, qb1,
     mT2, bT2, iT2, acc0b, acc1b, pA2, pB2, qb2,
     hgx, hgm, hgi, hgz, hgv, hmT, hiT, hbT, nbuf, Rbuf,
     lacc0, lacc1, ld, lx, lu, ltz, facc) = scratch[:41]
    extra = scratch[41:]
    if hbm:
        hrows, sem = extra
    else:
        hrows = None
        sem = extra[0] if extra else None
    i = pl.program_id(0)
    if tpk:
        # packed-tables mode: SMT IS the single packed [n8, 128] table
        # (_pass_body docstring); GT/TZ outputs are unused dummies
        assert G == 1 and first
        GT = TZ = SMT
    # member-lane batching (G > 1): logical row r of every table is
    # stored as G member rows r*G + g; heads/lift lanes carry members
    GL = 1 if G == 1 else G         # head/lift lanes per head
    HL = H * GL                     # live head lanes (head t at t*GL+g)
    HL8 = max(HL, 8)

    @pl.when(i == 0)
    def _init():
        if hbm:
            cp = pltpu.make_async_copy(val_in, val, sem)
            cp.start()
            cp.wait()
        else:
            val[:] = val_in[:]
        if tpk:
            # packed identity row: SMT identity at lane 0, GT identity
            # at lane TO_G, tz = 0
            l0 = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            SMT[0:1, :] = ((l0 == 0) | (l0 == TO_G)).astype(jnp.int32)
        elif first:
            # rows 0..G-1 of both tables = the identity (rho_{-1} = 1)
            SMT[0:G, :] = jnp.concatenate(
                [jnp.ones((G, 1), jnp.int32),
                 jnp.zeros((G, W8 - 1), jnp.int32)], axis=1)
            GT[0:G, :] = jnp.concatenate(
                [jnp.ones((G, 1), jnp.int32),
                 jnp.zeros((G, WI8 - 1), jnp.int32)], axis=1)
            TZ[0:G, :] = jnp.zeros((G, 8), jnp.int32)
        else:
            # later width segment: continue from the widened tables
            # (sign-extended SMT, re-lifted GT — see tpu/relift.py)
            for src, dst in ((SMT_in, SMT), (GT_in, GT), (TZ_in, TZ)):
                cp = pltpu.make_async_copy(src, dst, sem)
                cp.start()
                cp.wait()
        facc[:] = jnp.zeros_like(facc)

    # ---------------- per-sub-chunk body (CK per grid step) -----------
    # Phase A: pivot heads, batched + chain-refined (_heads_phase);
    # phase A2: one batched Hensel lift; phases B/C: the two batched
    # passes. Sub-chunks execute strictly in order — identical
    # semantics to one-chunk-per-grid-step, minus CK-1 grid overheads.
    def _sub(k2):
        def h_step(a, b, t):
            return hmeta[0, k2, t]

        def h_slot(a, b, t):
            return hmeta[0, k2, H + t]

        def h_div(a, b, t):
            return hmeta[0, k2, 2 * H + t]

        def cnts(a, b, j):
            return hmeta[0, k2, 3 * H + j]

        evo = 5 * k2
        any_heads = cnts(0, 0, 0) > 0

        @pl.when(any_heads)
        def _heads_init():
            ld[:] = jnp.zeros_like(ld)
            ld[0:1, :] = jnp.ones((1, ld.shape[1]), jnp.int32)
            ltz[:] = jnp.zeros_like(ltz)

        if hbm:
            # prefetch every head's diagonal row (distinct slots by
            # construction)
            for t in range(H):
                @pl.when(h_step(0, 0, t) >= 0)
                def _hg():
                    _gather_row(val, h_slot(0, 0, t), hrows, t, KR, sem)
            for t in range(H):
                @pl.when(h_step(0, 0, t) >= 0)
                def _hw():
                    _gather_row(val, h_slot(0, 0, t), hrows, t, KR, sem,
                                wait=True)

        ks = [h_step(0, 0, t) for t in range(H)]
        slots = [h_slot(0, 0, t) for t in range(H)]
        dvs = [h_div(0, 0, t) for t in range(H)]

        @pl.when(any_heads)
        def _heads():
            _heads_phase(ks, slots, dvs, cnts(0, 0, 0),
                         (cnts(0, 0, 3) & 256) != 0,
                         val, SMT, GT, TZ,
                         hgx, hgm, hgi, hgz, hgv, hmT, hiT, hbT, nbuf,
                         Rbuf, lacc0, lacc1, ld, ltz, facc,
                         W8=W8, WN=WN, WQ=WQ, WV=WV, WI8=WI8, G=G,
                         hbm=hbm, hrows=hrows, sem=sem, KR=KR,
                         tpk=tpk, TO_G=TO_G, TO_Z=TO_Z)

        if hbm:
            # pivot writes must land before the passes gather them
            for t in range(H):
                @pl.when(h_step(0, 0, t) >= 0)
                def _hww():
                    _scatter_row(hrows, t, val, h_slot(0, 0, t), KR,
                                 sem, wait=True)

        @pl.when(any_heads)
        def _lift():
            _lift_phase(ks, GT, TZ, ld, lx, lu, ltz, lacc0, lacc1,
                        WI8=WI8, G=G, tpk=tpk, W8=W8, TO_G=TO_G,
                        TO_Z=TO_Z, Rbuf=Rbuf)

        vh = (hbm, hbm, hbm)
        fl = cnts(0, 0, 3)
        _pass_body(C1, W8, W8, W8, WN, WQ, WV, E, cnts(0, 0, 1), ev1,
                   val, val, SMT, GT, TZ, gat_t, gat_m, gat_a, gat_b,
                   gat_g, gat_z, gat_dm, scat,
                   (mT1, bT1, iT1, acc0a, acc1a, pA1, pB1, qb1),
                   facc, val, flag_slot=3, hbm=vh, sem=sem, KR=KR,
                   has_ab=False, m0=(fl & 1) != 0, d0=(fl & 4) != 0,
                   G=G, um=(fl & 16) != 0, ud=(fl & 32) != 0,
                   tpk=tpk, TO_G=TO_G, TO_Z=TO_Z, evo=evo)
        _pass_body(C2, W8, W8, W8, WN, WQ, WV, E, cnts(0, 0, 2), ev2,
                   val, val, SMT, GT, TZ, gat_t, gat_m, gat_a, gat_b,
                   gat_g, gat_z, gat_dm, scat,
                   (mT2, bT2, iT2, acc0b, acc1b, pA2, pB2, qb2),
                   facc, val, flag_slot=4, hbm=vh, sem=sem, KR=KR,
                   has_ab=True, m0=(fl & 2) != 0, d0=(fl & 8) != 0,
                   G=G, um=(fl & 64) != 0, ud=(fl & 128) != 0,
                   tpk=tpk, TO_G=TO_G, TO_Z=TO_Z, evo=evo)

    if CK == 1:
        _sub(0)
    else:
        def _loop(k2, carry):
            _sub(k2)
            return carry

        lax.fori_loop(0, CK, _loop, 0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _fin():
        flags[:] = facc[:]


def _chunk_group(hmeta, ev1, ev2, H, C1, C2, CK):
    """Pad the chunk axis to a multiple of CK and fold CK chunks into
    each grid step: hmeta [nc, 3H+4] -> [ncg, CK, 3H+4], ev [nc, 5, C]
    -> [ncg, CK*5, C]. Pad chunks are empty (head steps -1, counts 0),
    which every phase skips."""
    nc = hmeta.shape[0]
    ncg = -(-nc // CK)
    pad = ncg * CK - nc
    if pad:
        hp = jnp.zeros((pad, 3 * H + 4), jnp.int32).at[:, :H].set(-1)
        hmeta = jnp.concatenate([hmeta, hp])
        ev1 = jnp.concatenate(
            [ev1, jnp.zeros((pad, 5, C1), jnp.int32)])
        ev2 = jnp.concatenate(
            [ev2, jnp.zeros((pad, 5, C2), jnp.int32)])
    return (hmeta.reshape(ncg, CK, 3 * H + 4),
            ev1.reshape(ncg, CK * 5, C1),
            ev2.reshape(ncg, CK * 5, C2), ncg)


def _auto_ck():
    """Sub-chunks per grid step (SLIP_FUSED_CK override, default 1).

    Measured negative result (uni10k, v5e): an all-phases-skipped
    chunk still costs ~15 us, but folding CK=4 chunks into one grid
    step does NOT recover it (62-68 ms device either way) — the floor
    is the per-chunk SCALAR code (condition evaluation, head-metadata
    reads, gather-loop setup), which runs per sub-chunk regardless,
    not the grid/SMEM-window bookkeeping. Kept as a tested hook; the
    real lever for the chunk floor is fewer chunks (scheduling depth,
    ROADMAP round-5 item 1)."""
    import os
    return int(os.environ.get("SLIP_FUSED_CK", 1))


@functools.partial(jax.jit, static_argnames=(
    "n", "E", "W8", "WN", "WI8", "H", "C1", "C2", "hbm", "G", "tpk",
    "CK"))
def factor_fused(n, E, W8, WN, WI8, H, C1, C2,
                 hmeta, ev1, ev2, val_in,
                 hbm=False, tables=None, G=1, tpk=False, CK=1):
    """Run a factor-stream (segment of) chunks.
    Returns (val, SMT, GT, TZ, flags).

    val_in is [E8, W8] (VMEM mode) or [E8, WH] with WH = W8 rounded to
    128 lanes (HBM mode — chosen by val_table_in_hbm). tables, when
    given, is (SMT, GT, TZ) from an earlier (narrower) width segment,
    already widened/re-lifted to this segment's shapes (tpu/relift.py);
    None means this is the first segment and the kernel initializes the
    identity rows itself.

    G > 1 = member-lane batching (VMEM-only): every logical table row r
    is stored as G member rows r*G + g and the G systems execute the
    chunk stream together on the vector lanes (_pass_body docstring).
    Flags come back per member: flags[cat, g].

    hmeta is the 2D head/count block [nc, 3H+4] (steps | slots | hists
    | counts+flags); ev1/ev2 are field-major event blocks [nc, 5, C]
    (row f, lane e = field f of event e) — these layouts keep the HBM
    tiling from padding a 5-wide minor dim to 128 lanes. CK sub-chunks
    run per grid step (_chunk_group)."""
    nc = hmeta.shape[0]
    # on hardware, member-ized row slices demand 8-aligned offsets
    # (G % 8 == 0); the interpreter has no alignment rules, so CPU
    # tests run unpadded member counts (lane_group() in the drivers)
    assert G == 1 or ((G % 8 == 0 or _interpret()) and not hbm
                      and H * G <= 128
                      and C1 * G <= 1024 and C2 * G <= 1024)
    assert C1 & (C1 - 1) == 0 and C2 & (C2 - 1) == 0
    # the batched head phase folds its per-lane flags down to members
    # by lane halving, which needs heads-per-chunk to be a power of two
    # (head t rides lanes [t*GL, (t+1)*GL), GL = 1 or G)
    assert H & (H - 1) == 0 and H * (1 if G == 1 else G) <= 128
    assert not tpk or (G == 1 and tables is None)
    E8 = _r8(E + 1)
    n8 = _r8(n + 2) if G == 1 else (n + 2) * G
    KR = val_in.shape[0] // E8 if hbm else 1
    first = tables is None
    WQ = min(WI8, _r8(W8 + 2))      # short-division quotient modulus
    WV = _r8(WQ + W8)               # verification modulus (>= WQ + W8)
    ACC = max(WN, 2 * WQ + 2, WV) + 24
    HACC = max(2 * WI8, WN, WV) + 24
    # head/lift lanes: head t at lanes [t*GL, (t+1)*GL), min 8 lanes
    # (must equal the kernel's HL8 = max(H*GL, 8))
    LL = max(H * (1 if G == 1 else G), 8)
    C1G, C2G = C1 * G, C2 * G
    TO_G, TO_Z = W8, W8 + WI8
    hmeta, ev1, ev2, ncg = _chunk_group(hmeta, ev1, ev2, H, C1, C2,
                                        CK)
    kern = functools.partial(
        _factor_kernel, n=n, E=E, W8=W8, WN=WN, WQ=WQ, WV=WV, WI8=WI8,
        H=H, C1=C1, C2=C2, hbm=hbm, KR=KR, first=first, G=G,
        tpk=tpk, TO_G=TO_G, TO_Z=TO_Z, CK=CK)
    # packed-tables shapes: ONE [n8, 128] table; row-gather scratches
    # widen to full rows, the per-component ones shrink to dummies
    SW = 128 if tpk else W8          # SMT/table lane width
    GW = 8 if tpk else WI8           # GT table width (dummy when tpk)
    GR = 8 if tpk else n8            # GT/TZ table rows (dummy when tpk)
    MW = 128 if tpk else W8          # gat_m lanes
    DW = 128 if tpk else W8          # gat_dm lanes
    HMW = 128 if tpk else W8         # hgm lanes
    HIW = 128 if tpk else WI8        # hgi lanes
    val_space = (pl.BlockSpec(memory_space=pl.ANY) if hbm else
                 pl.BlockSpec((val_in.shape[0], W8), lambda i: (0, 0),
                              memory_space=pltpu.VMEM))
    gshape = ((KR, C2, 128) if hbm else (C2G, W8))
    scratch = [
        pltpu.VMEM(gshape, jnp.int32),        # gat_t
        pltpu.VMEM((C2G, MW), jnp.int32),     # gat_m
        pltpu.VMEM(gshape, jnp.int32),        # gat_a
        pltpu.VMEM(gshape, jnp.int32),        # gat_b
        pltpu.VMEM((8 if tpk else C2G, WI8), jnp.int32),   # gat_g
        pltpu.VMEM((8 if tpk else C2G, 8), jnp.int32),     # gat_z
        pltpu.VMEM((C2G, DW), jnp.int32),     # gat_dm
        pltpu.VMEM(gshape, jnp.int32),        # scat
        pltpu.VMEM((W8, C1G), jnp.int32),     # mT1
        pltpu.VMEM((W8, C1G), jnp.int32),     # bT1
        pltpu.VMEM((WQ, C1G), jnp.int32),     # iT1
        pltpu.VMEM((ACC, C1G), jnp.int32),    # acc0a
        pltpu.VMEM((ACC, C1G), jnp.int32),    # acc1a
        pltpu.VMEM((WN, C1G), jnp.int32),     # pA1
        pltpu.VMEM((WN, C1G), jnp.int32),     # pB1
        pltpu.VMEM((WN, C1G), jnp.int32),     # qb1
        pltpu.VMEM((W8, C2G), jnp.int32),     # mT2
        pltpu.VMEM((W8, C2G), jnp.int32),     # bT2
        pltpu.VMEM((WQ, C2G), jnp.int32),     # iT2
        pltpu.VMEM((ACC, C2G), jnp.int32),    # acc0b
        pltpu.VMEM((ACC, C2G), jnp.int32),    # acc1b
        pltpu.VMEM((WN, C2G), jnp.int32),     # pA2
        pltpu.VMEM((WN, C2G), jnp.int32),     # pB2
        pltpu.VMEM((WN, C2G), jnp.int32),     # qb2
        pltpu.VMEM((LL, W8), jnp.int32),      # hgx (diag rows)
        pltpu.VMEM((LL, HMW), jnp.int32),     # hgm (SMT[k])
        pltpu.VMEM((LL, HIW), jnp.int32),     # hgi (GT[dv])
        pltpu.VMEM((LL, 8), jnp.int32),       # hgz (TZ[dv])
        pltpu.VMEM((LL, W8), jnp.int32),      # hgv (SMT[dv])
        pltpu.VMEM((W8, LL), jnp.int32),      # hmT
        pltpu.VMEM((WQ, LL), jnp.int32),      # hiT
        pltpu.VMEM((W8, LL), jnp.int32),      # hbT
        pltpu.VMEM((WN, LL), jnp.int32),      # nbuf (nums for verify)
        pltpu.VMEM((WQ, LL), jnp.int32),      # Rbuf (head rhos)
        pltpu.VMEM((HACC, LL), jnp.int32),    # lacc0
        pltpu.VMEM((HACC, LL), jnp.int32),    # lacc1
        pltpu.VMEM((WI8, LL), jnp.int32),     # ld
        pltpu.VMEM((WI8, LL), jnp.int32),     # lx
        pltpu.VMEM((WI8, LL), jnp.int32),     # lu
        pltpu.VMEM((1, LL), jnp.int32),       # ltz
        pltpu.VMEM((8, 128), jnp.int32),      # facc (per-member flags)
    ]
    if hbm:
        scratch += [
            pltpu.VMEM((KR, max(H, 8), 128), jnp.int32),   # hrows
            pltpu.SemaphoreType.DMA(()),              # sem (shared)
        ]
    elif not first:
        scratch.append(pltpu.SemaphoreType.DMA(()))   # sem (table DMA)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ncg,),
        in_specs=[
            pl.BlockSpec((1, CK, 3 * H + 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CK * 5, C1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CK * 5, C2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            val_space,
        ] + ([] if first else [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]),
        out_specs=(
            val_space,
            pl.BlockSpec((n8, SW), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GR, GW), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GR, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(val_in.shape, jnp.int32),
            jax.ShapeDtypeStruct((n8, SW), jnp.int32),
            jax.ShapeDtypeStruct((GR, GW), jnp.int32),
            jax.ShapeDtypeStruct((GR, 8), jnp.int32),
            jax.ShapeDtypeStruct((8, 128), jnp.int32),
        ),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(hmeta, ev1, ev2, val_in,
      *(() if first else tables))


def _solve_kernel(cnt_ref, ev1, ev2, val, SMT, GT, TZ, X_in,
                  X, flags,
                  gat_t, gat_m, gat_a, gat_b, gat_g, gat_z, gat_dm, scat,
                  mT1, bT1, iT1, acc0a, acc1a, pA1, pB1, qb1,
                  mT2, bT2, iT2, acc0b, acc1b, pA2, pB2, qb2, facc,
                  *extra, n, E, W8, Ws8, WNS, WQ, WV, WI8, C1, C2, hbm,
                  KR, G=1, a_g=True, tab_g=True, tpk=False, TO_G=0,
                  TO_Z=0, x_hbm=False, CK=1):
    sem = extra[0] if (hbm or x_hbm) else None
    i = pl.program_id(0)
    if tpk:
        GT = TZ = SMT                 # the single packed table

    @pl.when(i == 0)
    def _init():
        if x_hbm:
            cp = pltpu.make_async_copy(X_in, X, sem)
            cp.start()
            cp.wait()
        else:
            X[:] = X_in[:]
        facc[:] = jnp.zeros_like(facc)

    def _sub(k2):
        def cnts(a, b, j):
            return cnt_ref[0, k2, j]

        evo = 5 * k2
        vh = (x_hbm, hbm, x_hbm)
        fl = cnts(0, 0, 3)
        _pass_body(C1, Ws8, Ws8, W8, WNS, WQ, WV, n, cnts(0, 0, 1),
                   ev1, X, val, SMT, GT, TZ, gat_t, gat_m, gat_a,
                   gat_b, gat_g, gat_z, gat_dm, scat,
                   (mT1, bT1, iT1, acc0a, acc1a, pA1, pB1, qb1),
                   facc, X, flag_slot=3, hbm=vh, sem=sem, KR=KR,
                   has_ab=False, m0=(fl & 1) != 0, d0=(fl & 4) != 0,
                   G=G, a_g=a_g, tab_g=tab_g,
                   um=(fl & 16) != 0, ud=(fl & 32) != 0,
                   tpk=tpk, TO_G=TO_G, TO_Z=TO_Z,
                   KRT=1 if x_hbm else KR, evo=evo)
        _pass_body(C2, Ws8, Ws8, W8, WNS, WQ, WV, n, cnts(0, 0, 2),
                   ev2, X, val, SMT, GT, TZ, gat_t, gat_m, gat_a,
                   gat_b, gat_g, gat_z, gat_dm, scat,
                   (mT2, bT2, iT2, acc0b, acc1b, pA2, pB2, qb2),
                   facc, X, flag_slot=4, hbm=vh, sem=sem, KR=KR,
                   has_ab=True, m0=(fl & 2) != 0, d0=(fl & 8) != 0,
                   G=G, a_g=a_g, tab_g=tab_g,
                   um=(fl & 64) != 0, ud=(fl & 128) != 0,
                   tpk=tpk, TO_G=TO_G, TO_Z=TO_Z,
                   KRT=1 if x_hbm else KR, evo=evo)

    for k2 in range(CK):
        _sub(k2)

    @pl.when(i == pl.num_programs(0) - 1)
    def _fin():
        flags[:] = facc[:]


@functools.partial(jax.jit, static_argnames=(
    "n", "E", "W8", "Ws8", "WNS", "WI8", "C1", "C2", "hbm", "G", "a_g",
    "tab_g", "tpk", "x_hbm", "CK"))
def solve_fused(n, E, W8, Ws8, WNS, WI8, C1, C2,
                cnts, ev1, ev2, val, SMT, GT, TZ, X_in, hbm=False,
                G=1, a_g=True, tab_g=True, tpk=False, x_hbm=False,
                CK=1):
    """Run the solve stream (fwd + det + bwd). Returns (X, flags).

    G > 1 = member-lane batching of G solve streams (X member-ized,
    rows j*G + g). a_g/tab_g say whether the value table / rho tables
    are member-ized too (G pattern-sharing systems) or shared (one
    factorization, G right-hand sides)."""
    nc = ev1.shape[0]  # ev1/ev2 2D [nc, 5*C], cnts 2D [nc, 4]
    assert G == 1 or ((G % 8 == 0 or _interpret()) and not hbm
                      and C1 * G <= 1024 and C2 * G <= 1024)
    n8 = SMT.shape[0]
    X8 = X_in.shape[0]
    E8 = _r8(E + 1)
    KR = val.shape[0] // E8 if hbm else 1
    WQ = min(WI8, _r8(Ws8 + 2))     # short-division quotient modulus
    WV = _r8(WQ + W8)               # verification modulus (>= WQ + W8)
    ACC = max(WNS, 2 * WQ + 2, WV) + 24
    C1G, C2G = C1 * G, C2 * G
    assert not tpk or (G == 1 and a_g and tab_g)
    assert not x_hbm or (G == 1 and Ws8 <= 128)
    TO_G, TO_Z = W8, W8 + WI8
    # fold CK sub-chunks per grid step (same trick as factor_fused)
    ncg = -(-nc // CK)
    padc = ncg * CK - nc
    if padc:
        cnts = jnp.concatenate(
            [cnts, jnp.zeros((padc, 4), jnp.int32)])
        ev1 = jnp.concatenate(
            [ev1, jnp.zeros((padc, 5, C1), jnp.int32)])
        ev2 = jnp.concatenate(
            [ev2, jnp.zeros((padc, 5, C2), jnp.int32)])
    cnts = cnts.reshape(ncg, CK, 4)
    ev1 = ev1.reshape(ncg, CK * 5, C1)
    ev2 = ev2.reshape(ncg, CK * 5, C2)
    kern = functools.partial(
        _solve_kernel, n=n, E=E, W8=W8, Ws8=Ws8, WNS=WNS, WQ=WQ, WV=WV,
        WI8=WI8, C1=C1, C2=C2, hbm=hbm, KR=KR, G=G, a_g=a_g,
        tab_g=tab_g, tpk=tpk, TO_G=TO_G, TO_Z=TO_Z, x_hbm=x_hbm,
        CK=CK)
    MW = 128 if tpk else W8
    val_space = (pl.BlockSpec(memory_space=pl.ANY) if hbm else
                 pl.BlockSpec((val.shape[0], W8), lambda i: (0, 0),
                              memory_space=pltpu.VMEM))
    scratch = [
        pltpu.VMEM((1, C2, 128) if x_hbm else (C2G, Ws8),
                   jnp.int32),                # gat_t
        pltpu.VMEM((C2G, MW), jnp.int32),     # gat_m
        pltpu.VMEM((KR, C2, 128) if hbm else (C2G, W8),
                   jnp.int32),                # gat_a
        pltpu.VMEM((1, C2, 128) if x_hbm else (C2G, Ws8),
                   jnp.int32),                # gat_b
        pltpu.VMEM((8 if tpk else C2G, WI8), jnp.int32),   # gat_g
        pltpu.VMEM((8 if tpk else C2G, 8), jnp.int32),     # gat_z
        pltpu.VMEM((C2G, MW), jnp.int32),     # gat_dm
        pltpu.VMEM((1, C2, 128) if x_hbm else (C2G, Ws8),
                   jnp.int32),                # scat
        pltpu.VMEM((W8, C1G), jnp.int32),     # mT1
        pltpu.VMEM((Ws8, C1G), jnp.int32),    # bT1
        pltpu.VMEM((WQ, C1G), jnp.int32),     # iT1
        pltpu.VMEM((ACC, C1G), jnp.int32),    # acc0a
        pltpu.VMEM((ACC, C1G), jnp.int32),    # acc1a
        pltpu.VMEM((WNS, C1G), jnp.int32),    # pA1
        pltpu.VMEM((WNS, C1G), jnp.int32),    # pB1
        pltpu.VMEM((WNS, C1G), jnp.int32),    # qb1
        pltpu.VMEM((W8, C2G), jnp.int32),     # mT2
        pltpu.VMEM((Ws8, C2G), jnp.int32),    # bT2
        pltpu.VMEM((WQ, C2G), jnp.int32),     # iT2
        pltpu.VMEM((ACC, C2G), jnp.int32),    # acc0b
        pltpu.VMEM((ACC, C2G), jnp.int32),    # acc1b
        pltpu.VMEM((WNS, C2G), jnp.int32),    # pA2
        pltpu.VMEM((WNS, C2G), jnp.int32),    # pB2
        pltpu.VMEM((WNS, C2G), jnp.int32),    # qb2
        pltpu.VMEM((8, 128), jnp.int32),      # facc (per-member flags)
    ]
    if hbm or x_hbm:
        scratch.append(pltpu.SemaphoreType.DMA(()))  # sem (shared)
    x_space = (pl.BlockSpec(memory_space=pl.ANY) if x_hbm else
               pl.BlockSpec((X8, X_in.shape[1]), lambda i: (0, 0),
                            memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ncg,),
        in_specs=[
            pl.BlockSpec((1, CK, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CK * 5, C1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CK * 5, C2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            val_space,
            pl.BlockSpec(SMT.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(GT.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(TZ.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            x_space,
        ],
        out_specs=(
            x_space,
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(X_in.shape, jnp.int32),
            jax.ShapeDtypeStruct((8, 128), jnp.int32),
        ),
        grid_spec=grid_spec,
        input_output_aliases={7: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(cnts, ev1, ev2, val, SMT, GT, TZ, X_in)


@functools.partial(jax.jit, static_argnames=(
    "n", "E", "W8", "Ws8", "WN", "WNS", "WI8", "H", "C1", "C2", "hbm",
    "segments", "ssegments", "G", "tpk", "CK", "ndet", "nxx"))
def fused_solve_all(n, E, W8, Ws8, WN, WNS, WI8, H, C1, C2,
                    fhm, fev1, fev2,
                    scnt, sev1, sev2, val_in, b_rows, hbm=False,
                    segments=None, ssegments=None, G=1, tpk=False,
                    CK=1, ndet=None, nxx=0):
    """ONE XLA program for the whole exact solve: factor stream, every
    RHS solve stream, and a single flat int32 result vector

        [per factor segment: fsing, fovf] [det(W8)]
        [then per rhs, per solve segment: ssing, sovf] [X(n*Ws8)].

    The tunnel to the chip charges a fixed ~45 ms for every host sync
    (measured; see ROADMAP), so the entire solve must be one dispatch +
    one fetch: b ships as a narrow [nrhs, n, Wb] argument (args ride the
    execute call for free), is sign-extended to Ws8 on device, and only
    the flat vector comes back.

    segments (static), when given, is a tuple of (lo, hi, W8s) chunk
    ranges with nondecreasing widths ending at W8: each range's chunks
    run in their own pallas_call at W8s-limb shapes (IPGE values at
    level L only need ~L/n of the final width — quadratic MAC savings),
    with sign-extension / Hensel re-lift glue between segments
    (tpu/relift.py). val_in must be packed at segments[0]'s width.
    None = one full-width segment (identical to the classic path).

    ssegments does the same for the SOLVE stream (forward-substitution
    values grow with elimination level exactly like factor values; the
    determinant-scale and back-substitution chunks sit at the full Ws8
    by construction of their max_level). Between solve segments only X
    sign-extends — the shared GT inverse table needs NO re-lift because
    a Hensel inverse mod 2^(16*WI) truncates to a correct inverse mod
    any smaller power (the kernel reads GT rows [:WQ_s]).

    G > 1 = member-lane batching of G pattern-sharing systems: val_in
    is slot-interleaved ([(E8)*G rows], row slot*G + g), b_rows is
    [G, nrhs, n, Wb], and the flat layout generalizes to per-member
    vectors: [per factor segment: sing*G, ovf*G] [det: G*W8]
    [per rhs: per solve segment: sing*G, ovf*G; X: n*G*Ws8 rows
    interleaved (j*G + g)]. G == 1 keeps the exact legacy layout.

    Grouped (subtree-local) streams pass ndet = the table row holding
    the determinant (local chains + PD + top rows, so > n; see
    tpu/schedule_subtree.py) and nxx = extra X clone rows appended
    after the dummy row n. Defaults keep the classic layout (ndet=n,
    nxx=0). Only X rows [0, n) are returned either way.
    """
    from .relift import relift_gt, widen_tc, widen_val
    if ndet is None:
        ndet = n
    if segments is None:
        segments = ((0, fhm.shape[0], W8),)
    E8 = _r8(E + 1)
    S = len(segments)
    # packed-tables mode (large n, small widths — _pass_body docstring)
    # runs a single full-width segment on each stream
    assert not tpk or (G == 1 and S == 1)
    val_d = val_in
    SMT_d = GT_d = TZ_d = None
    fparts = []
    prev = None
    for si, (lo, hi, W8s) in enumerate(segments):
        WNs = _r8(2 * W8s + 2)
        # segmented runs lift head inverses only to that segment's
        # SHORT division modulus _r8(W8s + 2) (the per-chunk Hensel
        # lift is quadratic in its width; verified short division —
        # _pass_body docstring — never needs more); GT re-lifts to the
        # solve quotient width ONCE, batched 128 rows at a time, below.
        # Unsegmented (small) runs lift straight to the final width —
        # a relift launch costs more than it saves there.
        WQf = _r8(W8s + 2)
        WIs = max(WQf, WI8) if S == 1 else WQf
        hbms = val_table_in_hbm(E8, W8s) if G == 1 else False
        tables = None
        if prev is not None:
            pW8, pWI, phbm = prev
            val_d = widen_val(val_d, E8, pW8, W8s, phbm, hbms)
            SMT_d = widen_tc(SMT_d, pW8, W8s)
            GT_d = relift_gt(SMT_d, GT_d, TZ_d, W8s, pWI, WIs)
            tables = (SMT_d, GT_d, TZ_d)
        val_d, SMT_d, GT_d, TZ_d, fflags = factor_fused(
            ndet, E, W8s, WNs, WIs, H, C1, C2,
            fhm[lo:hi], fev1[lo:hi], fev2[lo:hi], val_d, hbm=hbms,
            tables=tables, G=G, tpk=tpk, CK=CK)
        fparts.append(fflags[:2, :G].reshape(-1))
        prev = (W8s, WIs, hbms)
    hbm = prev[2]
    parts = fparts + [SMT_d[ndet * G:(ndet + 1) * G, :W8].reshape(-1)]
    X8G = _r8((n + 1 + nxx) * G)
    if G == 1:
        b_rows = b_rows[None]
    nrhs, _, Wb = b_rows.shape[1:]
    if ssegments is None:
        ssegments = ((0, scnt.shape[0], Ws8),)
    WQs = min(WI8, _r8(Ws8 + 2))    # solve-stream quotient modulus
    WIf = prev[1]
    if WIf < WQs:
        GT_d = relift_gt(SMT_d, GT_d, TZ_d, W8, WIf, WQs)
        WIf = WQs
    # RHS-LANE BATCHING: with a single system (G == 1), several right-
    # hand sides ride the member lanes of ONE solve-stream run instead
    # of nrhs sequential runs — the factored tables are SHARED across
    # lanes (a_g=False, tab_g=False in _pass_body), only X is
    # member-ized. nrhs pads to a multiple of 8 with copies of column
    # 0; VMEM tables only (HBM a-gathers are per-lane DMAs — not worth
    # it). Flat layout: per solve segment [sing*R8, ovf*R8], then
    # X rows (j*R8 + c)*Ws8 ONCE (not per rhs).
    rhs_lanes = (G == 1 and nrhs > 1 and not hbm and not tpk)
    if rhs_lanes:
        R8 = lane_group(nrhs)
        Ws0 = ssegments[0][2]
        col = b_rows[0]                                # [nrhs, n, Wb]
        if Wb < Ws0:
            fill = jnp.where(col[:, :, Wb - 1:Wb] >= 0x8000, 0xFFFF, 0)
            col = jnp.concatenate(
                [col, jnp.broadcast_to(fill, col.shape[:2]
                                       + (Ws0 - Wb,))], axis=2)
        col = col[:, :, :Ws0]
        if R8 > nrhs:
            col = jnp.concatenate(
                [col, jnp.broadcast_to(col[0:1], (R8 - nrhs,) +
                                       col.shape[1:])], axis=0)
        xr = col.transpose(1, 0, 2).reshape(n * R8, Ws0)
        X8R = _r8((n + 1 + nxx) * R8)
        X_d = jnp.zeros((X8R, Ws0), jnp.int32).at[:n * R8].set(xr)
        pWs = Ws0
        for (lo, hi, Ws_s) in ssegments:
            if Ws_s != pWs:
                X_d = widen_tc(X_d, pWs, Ws_s)
            WNS_s = _r8(W8 + Ws_s + 2)
            X_d, sflags = solve_fused(
                n, E, W8, Ws_s, WNS_s, WIf, C1, C2,
                scnt[lo:hi], sev1[lo:hi], sev2[lo:hi],
                val_d, SMT_d, GT_d, TZ_d, X_d, hbm=False,
                G=R8, a_g=False, tab_g=False, CK=CK)  # (tpk never here)
            parts.append(sflags[:2, :R8].reshape(-1))
            pWs = Ws_s
        parts.append(X_d[:n * R8].reshape(-1))
        return jnp.concatenate(parts)
    # packed mode keeps X in HBM too (a [130K, Ws8] VMEM window pads
    # its rows to 128 lanes — the same blowup the packed table avoids)
    x_hbm = tpk
    for c in range(nrhs):
        col = b_rows[:, c]                             # [G, n, Wb]
        Ws0 = ssegments[0][2]
        if Wb < Ws0:
            fill = jnp.where(col[:, :, Wb - 1:Wb] >= 0x8000, 0xFFFF, 0)
            col = jnp.concatenate(
                [col, jnp.broadcast_to(fill, col.shape[:2]
                                       + (Ws0 - Wb,))], axis=2)
        xr = col[:, :, :Ws0].transpose(1, 0, 2).reshape(n * G, Ws0)
        XW = 128 if x_hbm else Ws0
        X_d = jnp.zeros((X8G, XW), jnp.int32).at[:n * G, :Ws0].set(xr)
        pWs = Ws0
        for (lo, hi, Ws_s) in ssegments:
            if Ws_s != pWs:
                X_d = widen_tc(X_d, pWs, Ws_s)
            WNS_s = _r8(W8 + Ws_s + 2)
            X_d, sflags = solve_fused(
                n, E, W8, Ws_s, WNS_s, WIf, C1, C2,
                scnt[lo:hi], sev1[lo:hi], sev2[lo:hi],
                val_d, SMT_d, GT_d, TZ_d, X_d, hbm=hbm, G=G,
                tpk=tpk, x_hbm=x_hbm, CK=CK)
            parts.append(sflags[:2, :G].reshape(-1))
            pWs = Ws_s
        parts.append(X_d[:n * G, :Ws8].reshape(-1))
    return jnp.concatenate(parts)


@functools.partial(jax.jit, static_argnames=(
    "n", "E", "W8", "Ws8", "WN", "WNS", "WI8", "H", "C1", "C2", "hbm",
    "segments", "G", "CK"))
def fused_solve_many(n, E, W8, Ws8, WN, WNS, WI8, H, C1, C2, G,
                     fhm, fev1, fev2,
                     scnt, sev1, sev2, val_stack, b_stack, hbm=False,
                     segments=None, CK=1):
    """G pattern-sharing systems in ONE XLA program (SURVEY §2.10 data-
    parallel axis), MEMBER-LANE batched: the schedule/streams are
    shared, each member brings its own value table (val_stack[g]) and
    RHS block (b_stack[g]), and all G systems execute every chunk
    TOGETHER on the vector lanes (lane e*G + g = event e of member g —
    see _pass_body). Narrow-lane arithmetic pads to 128 lanes anyway,
    so for thin streams the extra members are nearly free: one
    dispatch, one fetch, one set of chunk fixed costs for all G.
    Requires G % 8 == 0 (lane-slice alignment) and all-VMEM tables;
    the driver pads the member count and falls back per member
    otherwise. Returns the G-aware fused_solve_all flat layout."""
    val_il = val_stack.transpose(1, 0, 2).reshape(
        val_stack.shape[1] * G, val_stack.shape[2])
    return fused_solve_all(
        n, E, W8, Ws8, WN, WNS, WI8, H, C1, C2,
        fhm, fev1, fev2,
        scnt, sev1, sev2, val_il, b_stack, hbm=False,
        segments=segments, G=G, CK=CK)


# ---------------------------------------------------------------------------
# host-side packing helpers (two's complement)
# ---------------------------------------------------------------------------

def ints_to_tc_rows(values, W: int) -> np.ndarray:
    """Python ints -> [len, W] int32 two's-complement 16-bit limb rows.

    int64-range values take a vectorized path (arithmetic right shift
    produces exactly the two's-complement limbs; limbs above bit 63 are
    the sign fill) — the per-entry loop only runs for wider ints.
    """
    out = np.zeros((len(values), W), dtype=np.int32)
    try:
        a64 = np.array(values, dtype=np.int64)
    except (OverflowError, TypeError):
        a64 = None
    if a64 is not None:
        if len(values):
            k = min(W, 4)
            shifts = (16 * np.arange(k, dtype=np.int64))[None, :]
            out[:, :k] = ((a64[:, None] >> shifts) & 0xFFFF).astype(np.int32)
            if W > 4:
                out[:, 4:] = np.where(a64[:, None] < 0, 0xFFFF, 0)
        return out
    mod = 1 << (16 * W)
    for r, v in enumerate(values):
        u = int(v) % mod
        b = u.to_bytes(2 * W, "little")
        out[r] = np.frombuffer(b, dtype="<u2").astype(np.int32)
    return out


def tc_rows_to_ints(rows: np.ndarray) -> list:
    """[R, W] limb rows -> Python ints (signed)."""
    R, W = rows.shape
    arr = rows.astype(np.uint16)
    # vectorized path: rows whose payload fits in int64 (all limbs above
    # the third are pure sign fill) combine exactly inside int64
    if W >= 4:
        neg = arr[:, 3] >= 0x8000
        fill = np.where(neg, 0xFFFF, 0).astype(np.uint16)
        if W == 4 or bool((arr[:, 4:] == fill[:, None]).all()):
            u = np.zeros(R, dtype=np.uint64)
            for k in range(4):
                u |= arr[:, k].astype(np.uint64) << (16 * k)
            return u.astype(np.int64).tolist()
    half = 1 << (16 * W - 1)
    mod = 1 << (16 * W)
    out = []
    for r in range(R):
        u = int.from_bytes(arr[r].tobytes(), "little")
        out.append(u - mod if u >= half else u)
    return out
