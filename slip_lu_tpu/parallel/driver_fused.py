"""Host driver for the sharded fused exact solve (the flagship path,
multi-chip).

Mirrors tpu/backslash_fused.py's pipeline — schedule + chunk streams +
optimistic widths with a sound widen-and-retry ladder, adaptive-width
segments on long scans, grouped (subtree-local) stream adoption, and
per-chip HBM-resident value tables once the partitioned table outgrows
VMEM (val_table_in_hbm at the per-chip row count) — but the streams
are chip-partitioned (stream_shard_fused.py) and the device program is
the sharded superstep scan (factor_fused_shard.py). Exact pivot
cancellation falls back to the single-chip fused driver (which replans
there; reference analogue: slip_get_pivot.c's dynamic search).
"""

from __future__ import annotations

import os
from fractions import Fraction
from math import gcd
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..analyze import Analysis
from ..convert import matrix_copy
from ..errors import SlipIncorrectInputError, SlipLimbOverflowError
from ..matrix import Kind, SlipMatrix, Type
from ..options import Options
from ..stats import SolveStats, phase_timer, record
from ..tpu.backslash_fused import (_dissect_candidate, _mpq,
                                   _resolve_order, _tc_width)
from ..tpu.bounds import (_input_width, factor_width, hadamard_bits,
                          solve_width)
from ..tpu.factor_fused import _r8, ints_to_tc_rows, tc_rows_to_ints
from ..tpu.schedule import _permute_cols
from ..tpu.schedule_native import build_schedule_best
from .factor_fused_shard import fused_sharded_solve
from .stream_shard_fused import build_sharded_stream


def _ev4d(ev):
    """[p, nc, C, 5] -> field-major [p, nc, 5, C] (the shared
    _pass_body reads ev_ref[0, field, event])."""
    return np.ascontiguousarray(ev.transpose(0, 1, 3, 2))


def _pad_bc(chunks, dummy):
    """Pad a ShardedChunks' bc arrays to a lane-friendly width."""
    CB8 = max(8, _r8(chunks.CB))
    nc = chunks.nchunks
    p = chunks.mine_bc.shape[0]
    bidx = np.full((nc, CB8), dummy, np.int32)
    bidx[:, :chunks.bc_idx.shape[1]] = chunks.bc_idx
    mbc = np.zeros((p, nc, CB8), np.int32)
    mbc[:, :, :chunks.mine_bc.shape[2]] = chunks.mine_bc
    return bidx, mbc


def plan_sharded(A: SlipMatrix, analysis: Analysis, p: int,
                 options: Options, heads_per_chunk: int = 8,
                 pass1_events: int = 32, pass2_events: int = 128):
    """The sharded driver's planning phase: schedule + chip-partitioned
    stream for a p-chip mesh, with grouped (subtree-local) adoption.

    Callable without executing anything on devices —
    tools/scaling_sweep uses it for structural metrics at topologies
    it does not run. Returns (sched, r, ses, avals, q) and caches on
    the Analysis under (p, capacities, pinned-rows) like every other
    driver phase.

    Grouped adoption: G independent groups feed every chunk, so
    per-chip capacity BINDS and p chips shorten the serial chunk scan
    by up to p (ungrouped streams hazard-cut at ~1.5 elimination
    steps and never fill the capacity). The decision is width-aware —
    a dissection reorder can shorten the scan but widen the pivots
    (uni100k: W 16 -> 112), so each candidate stream is costed at ITS
    OWN width and adopted only when the modeled wall time wins at
    this chip count."""
    n = A.n
    q = np.asarray(analysis.q, dtype=np.int64)
    fixed_r = analysis.sparse_fixed_r
    skey = None if fixed_r is None else fixed_r.tobytes()
    key = (p, heads_per_chunk, pass1_events, pass2_events, skey)
    cache = getattr(analysis, "fused_shard_cache", None)
    if cache is not None and cache[0] == key:
        return cache[1] + (q,)
    q, built = _resolve_order(A, analysis, q, fixed_r)
    sched, r = built if built is not None \
        else build_schedule_best(A, q, fixed_r)
    ses = build_sharded_stream(sched, p, heads_per_chunk,
                               pass1_events, pass2_events)
    subtree_mode = os.environ.get("SLIP_FUSED_SUBTREE", "1")
    if subtree_mode != "0":
        from ..tpu.schedule_subtree import try_build_grouped
        # group count scales with the mesh: more, smaller groups keep
        # per-chip capacity binding and shorten the solve scan
        # (uni100k at 8 chips: G=8 -> 16 cuts it 3486 -> 1967 chunks)
        G = min(32, max(8, 2 * p))
        ses_g = try_build_grouped(
            sched, 8, max(64, pass1_events), pass2_events,
            n_groups=G, p=p)
        cand = None
        if ses_g is None and fixed_r is None and n >= 192:
            cand = _dissect_candidate(A, analysis, options,
                                      n_groups=G)
            if cand is not None:
                ses_g = try_build_grouped(
                    cand[2], 8, max(64, pass1_events),
                    pass2_events, n_groups=G, p=p)

        def scan(s):
            return s.factor.nchunks + s.solve.nchunks

        def _cost(s, West):
            # modeled per-solve wall: per-chunk scalar floor (~15 us
            # measured, CK postmortem) + per-event MAC cost quadratic
            # in the segment width the planner will choose (~2 ns at
            # one 8-limb group, calibrated on uni100k 16- and 352-limb
            # runs). Events divide across chips; the scan does not.
            F, Ec = 15e-6, 2e-9
            tot = 0.0
            for sc in (s.factor, s.solve):
                ml = np.asarray(sc.max_level, np.float64)
                wq = (np.minimum(
                    West, West * (ml + 2) / n + 2) / 8.0) ** 2
                ev = sc.counts[:, :, 1:3].sum(
                    axis=(0, 2)).astype(np.float64)
                tot += (F * sc.nchunks
                        + Ec * float((ev / p * wq).sum()))
            return tot

        adopt = ses_g is not None and subtree_mode == "force"
        if ses_g is not None and not adopt:
            from ..tpu.backslash_fused import _width_probe
            wc = getattr(analysis, "fused_width_cache", None)
            West_u = wc[0] if wc else _width_probe(
                A, analysis, options, fixed_r=r)
            if West_u is None:
                W_in0 = _input_width(
                    [int(A.x[i]) for i in range(int(A.p[n]))])
                hb = getattr(analysis, "hadamard_bits_cache", None)
                if hb is None:
                    hb = hadamard_bits(A)
                    analysis.hadamard_bits_cache = hb
                Wf0 = factor_width(A, hbits=hb)
                West_u = min(max(2, W_in0 + 1,
                                 min(-(-Wf0 // 16), 16)), Wf0)
            West_g = cand[4] if cand is not None else West_u
            # per-chip value table must fit VMEM at the final segment
            # width — or, failing that, the per-chip HBM budget (the
            # sharded HBM val mode then moves rows by async DMA)
            bytes_g = _r8(ses_g.Lp) * _r8(West_g) * 4
            fits = (bytes_g <= int(os.environ.get(
                        "SLIP_SHARD_VMEM", 90 * 1024 * 1024))
                    or bytes_g <= int(os.environ.get(
                        "SLIP_SHARD_HBM", 2 * 1024 ** 3)))
            adopt = (fits and scan(ses_g) < scan(ses)
                     and _cost(ses_g, West_g)
                     < 0.9 * _cost(ses, West_u))
        if adopt:
            ses = ses_g
            if cand is not None:
                # commit the dissection: reorder, pinned rows,
                # exact width seed, fresh cache keys
                q, fixed_r, sched, r, _Wx = cand
                analysis.q = q
                analysis.sparse_fixed_r = fixed_r
                skey = fixed_r.tobytes()
                analysis.fused_pin_check = (skey, _Wx)
                analysis.fused_sched_only_cache = (skey, (sched, r))
                key = (p, heads_per_chunk, pass1_events,
                       pass2_events, skey)
    Aq = _permute_cols(A, q)
    avals = [int(Aq.x[idx]) for c in range(n)
             for idx in range(int(Aq.p[c]), int(Aq.p[c + 1]))]
    analysis.fused_shard_cache = (key, (sched, r, ses, avals))
    return sched, r, ses, avals, q


def factorize_solve_fused_sharded(A: SlipMatrix, analysis: Analysis,
                                  b: SlipMatrix, mesh: Mesh,
                                  options: Optional[Options] = None,
                                  heads_per_chunk: int = 8,
                                  pass1_events: int = 32,
                                  pass2_events: int = 128
                                  ) -> SlipMatrix:
    options = options or Options()
    options.validate()
    if A.kind != Kind.CSC or A.type != Type.MPZ:
        raise SlipIncorrectInputError(
            "sharded fused path requires CSC x MPZ input")
    n = A.n
    if b.m != n:
        raise SlipIncorrectInputError(
            f"b has {b.m} rows, matrix has {n}")
    bz = matrix_copy(b, Kind.DENSE, Type.MPZ, options)
    nrhs = bz.n
    if n == 0:
        return SlipMatrix.allocate(Kind.DENSE, Type.MPQ, 0, nrhs)
    p = int(np.prod(mesh.devices.shape))
    st = SolveStats(backend="tpu-fused-sharded", n=n, nnz=int(A.p[n]),
                    nrhs=nrhs)
    if options.pivot_exact:
        from ..tpu.backslash_fused import _pin_scheme_rows
        _pin_scheme_rows(A, analysis, options)

    with phase_timer(st, "schedule"):
        sched, r, ses, avals, q = plan_sharded(
            A, analysis, p, options, heads_per_chunk, pass1_events,
            pass2_events)
    fixed_r = analysis.sparse_fixed_r
    st.lnz, st.unz = ses.lnz, ses.unz
    E = ses.nnz
    Lp8 = _r8(ses.Lp)
    # stream geometry (grouped streams use H=8 / C1 = max(64, C1))
    H_es = int(ses.factor.h_step.shape[1])
    C1_es = int(ses.factor.ev1.shape[2])
    C2_es = int(ses.factor.ev2.shape[2])
    # factor bc indices are per-chip LOCAL (partitioned value table);
    # solve bc indices are global X rows (X is full per chip)
    CBf8 = max(8, _r8(ses.factor.CB))
    nc_f = ses.factor.nchunks
    fb_idx = np.full((p, nc_f, CBf8), Lp8 - 1, np.int32)
    fb_idx[:, :, :ses.bc_loc.shape[2]] = ses.bc_loc
    fb_mbc = np.zeros((p, nc_f, CBf8), np.int32)
    fb_mbc[:, :, :ses.factor.mine_bc.shape[2]] = ses.factor.mine_bc
    sb_idx, sb_mbc = _pad_bc(ses.solve, n)
    xown = np.zeros((p, _r8(n)), np.int32)
    for i in range(n):
        xown[i % p, i] = 1

    hbits = getattr(analysis, "hadamard_bits_cache", None)
    if hbits is None:
        hbits = hadamard_bits(A)
        analysis.hadamard_bits_cache = hbits
    W_full = factor_width(A, hbits=hbits)
    Ws_full = solve_width(A, bz.x, W_full, n, hbits=hbits)
    if ses.ndet is not None:
        # grouped merge intermediates can exceed the single-minor
        # bound by a few bits (same headroom as the single-chip path)
        W_full += 1
        Ws_full += 1
    W_in = _input_width(avals)
    Wb_in = _input_width(bz.x.reshape(-1))
    if options.max_limbs is not None:
        W = factor_width(A, options.max_limbs, hbits=hbits)
        Ws = solve_width(A, bz.x, W, n, options.max_limbs, hbits=hbits)
    else:
        # converged single-chip widths transfer exactly (same pivot
        # sequence): reuse the fused cache when present
        wcache = getattr(analysis, "fused_width_cache", None)
        if wcache is not None:
            W, Ws = wcache
            W = min(max(W, W_in), W_full)
            Ws = min(max(Ws, W + 1, Wb_in), Ws_full)
        else:
            W = min(max(2, W_in + 1, min(-(-W_full // 16), 16)),
                    W_full)
            Ws = min(max(W + 1, Wb_in + 1,
                         min(-(-Ws_full // 16), 32)), Ws_full)
        # exact pinned-pivot width (dissection commit) beats any guess
        pchk = getattr(analysis, "fused_pin_check", None)
        if (pchk is not None and fixed_r is not None
                and pchk[0] == fixed_r.tobytes()
                and pchk[1] is not None):
            W = min(max(W, pchk[1], W_in + 1), W_full)
            Ws = min(max(Ws, W + 1), Ws_full)

    sing_seen = False
    while True:
        W8 = _r8(W)
        Ws8 = _r8(max(Ws, W + 1))
        WN = _r8(2 * W8 + 2)
        WNS = _r8(W8 + Ws8 + 2)
        WI8 = _r8(max(W8, Ws8) + 2)
        st.W, st.Ws = W8, Ws8
        # adaptive-width chunk segments (single-chip plan_segments
        # model: a level-L chunk runs at ~W*(L+1)/n limbs); widths
        # re-planned per ladder rung, overflow widens the whole rung.
        # Short scans skip segmentation: every extra segment is
        # another compiled scan program + relift boundary, which only
        # amortizes at scale (a 2-segment plan on a 157-chunk solve
        # stream doubled a CI test's compile time for ~zero MACs
        # saved).
        from ..tpu.backslash_fused import _merged, plan_segments
        Wmin_in = max(2, W_in + 1)
        segments = _merged(plan_segments(
            ses.factor.max_level, n, W, Wmin_in)) \
            if ses.factor.nchunks >= 256 \
            else ((0, ses.factor.nchunks, W8),)
        bcols = [[int(bz.x[int(r[k]), c]) for k in range(n)]
                 for c in range(nrhs)]
        Wb = _tc_width((v for col in bcols for v in col), Ws8)
        if ses.solve.nchunks >= 256:
            ssegplan = plan_segments(
                ses.solve.max_level, n, max(Ws, W + 1),
                max(Wmin_in, Wb + 1))
            for sp in ssegplan:
                sp[2] = min(max(sp[2], _r8(Wb + 1)), Ws8)
            ssegplan[-1][2] = Ws8
            ssegments = _merged(ssegplan)
        else:
            ssegments = ((0, ses.solve.nchunks, Ws8),)
        w0 = segments[0][2]
        ws0 = ssegments[0][2]
        # per-SEGMENT value-table layout: HBM planes once the per-chip
        # partition outgrows the VMEM budget (p× later than the
        # single-chip path — partitioning IS the first scale lever)
        from ..tpu import factor_fused as _ff
        hbm_segs = tuple(_ff.val_table_in_hbm(Lp8, wseg)
                         for (_, _, wseg) in segments)
        with phase_timer(st, "pack"):
            # per-chip partitioned value table [p, Lp8, w0]; HBM
            # first segment packs slots as KR 128-lane plane rows
            wv0 = _ff._r128(w0) if hbm_segs[0] else w0
            val_in = np.zeros((p, Lp8, wv0), dtype=np.int32)
            val_in[ses.init_chip, ses.init_loc, :w0] = ints_to_tc_rows(
                avals, w0)
            if ses.extra_chip is not None and len(ses.extra_chip):
                # grouped streams: constant / scratch slot inits
                val_in[ses.extra_chip, ses.extra_loc, :w0] = \
                    ints_to_tc_rows(ses.extra_vals, w0)
            if hbm_segs[0]:
                val_in = val_in.reshape(p, Lp8 * (wv0 // 128), 128)
            X8 = _r8(n + 1 + ses.nxx)
            X0 = np.zeros((nrhs, X8, ws0), dtype=np.int32)
            for c in range(nrhs):
                X0[c, :n] = ints_to_tc_rows(bcols[c], ws0)
        with phase_timer(st, "device"):
            flat = np.asarray(jax.device_get(fused_sharded_solve(
                mesh, n, E, W8, Ws8, WN, WNS, WI8, H_es,
                C1_es, C2_es,
                fb_idx.shape[1], sb_idx.shape[1], nrhs,
                jnp.asarray(ses.factor.h_step),
                jnp.asarray(ses.h_slot_loc),
                jnp.asarray(ses.factor.h_div),
                jnp.asarray(ses.factor.mine_diag),
                jnp.asarray(ses.factor.counts),
                jnp.asarray(_ev4d(ses.factor.ev1)),
                jnp.asarray(_ev4d(ses.factor.ev2)),
                jnp.asarray(fb_idx),
                jnp.asarray(ses.factor.bc_cnt),
                jnp.asarray(fb_mbc),
                jnp.asarray(ses.solve.counts),
                jnp.asarray(_ev4d(ses.solve.ev1)),
                jnp.asarray(_ev4d(ses.solve.ev2)),
                jnp.asarray(sb_idx),
                jnp.asarray(ses.solve.bc_cnt),
                jnp.asarray(sb_mbc),
                jnp.asarray(xown),
                jnp.asarray(val_in),
                jnp.asarray(X0), ndet=ses.ndet,
                segments=segments, ssegments=ssegments,
                hbm_segs=hbm_segs, Lp8=Lp8)))
        fsing, fovf, sovf = (bool(flat[0]), bool(flat[1]),
                             bool(flat[2]))
        sing_seen = sing_seen or fsing
        if fsing and not fovf:
            break                       # genuine cancellation: replan
        if fovf or sovf:
            W2, Ws2 = W, Ws
            if fovf:
                W2 = min(2 * W, W_full)
            else:
                Ws2 = min(2 * Ws, Ws_full)
            Ws2 = max(Ws2, W2 + 1)
            if (W2, Ws2) == (W, Ws):
                if fsing:
                    break
                raise SlipLimbOverflowError(
                    "overflow persists at the analytic width bound "
                    f"(W={W}, Ws={Ws})")
            W, Ws = W2, Ws2
            st.retries += 1
            continue
        if options.max_limbs is None:
            # converged widths are pivot-sequence properties — share
            # them with the single-chip fused driver's cache
            analysis.fused_width_cache = (W, Ws)
        with phase_timer(st, "unpack"):
            o = 3
            det = tc_rows_to_ints(flat[o:o + W8][None, :])[0]
            o += W8
            x = SlipMatrix.allocate(Kind.DENSE, Type.MPQ, n, nrhs)
            factor = A.scale / bz.scale
            fnum, fden = factor.numerator, factor.denominator
            den_all = det * fden
            for c in range(nrhs):
                xh = tc_rows_to_ints(
                    flat[o:o + n * Ws8].reshape(n, Ws8))
                o += n * Ws8
                for k in range(n):
                    x.x[int(q[k]), c] = _mpq(xh[k] * fnum, den_all)
        record(st)
        return x

    # exact cancellation on the scheduled pivots: the single-chip fused
    # driver replans around the oracle's pivot rows (and pins them on
    # the shared Analysis for future sharded solves)
    st.fallback = True
    record(st)
    from ..tpu.backslash_fused import factorize_solve_tpu_fused
    return factorize_solve_tpu_fused(A, analysis, b, options)
