"""Host glue for the fused (Pallas mega-kernel) sparse path.

Pipeline, mirroring backslash_sparse.py but with ONE device dispatch
and ONE fetch per solve instead of ~10 XLA ops per elimination step
(the tunnel charges ~45 ms per host sync regardless of size, so round
trips — not FLOPs — set the small-matrix floor):

  1. ordering q + transversal r, symbolic elimination (schedule.py),
     uniform-event chunk streams (schedule_stream.py) — all reusable
     per matrix, cached on the Analysis as device buffers;
  2. pack A's values as two's-complement limb rows, upload once per
     (analysis, W) and cache the device buffer;
  3. fused_solve_all: one XLA program runs the factor stream
     (factor_fused) and every RHS solve stream (solve_fused) back to
     back on device, b riding the execute call as a narrow argument;
  4. ONE device->host fetch of a flat int32 vector (flags, det, X);
  5. widen-and-retry on overflow, replan/fallback on cancellation,
     exactly like the padded path.

Reference parity anchor: same as backslash_sparse.py (the oracle's
DIAGONAL pivots on B = A[r][:, q]).
"""

from __future__ import annotations

import os
from fractions import Fraction
from math import gcd
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..analyze import Analysis
from ..convert import matrix_copy
from ..errors import SlipIncorrectInputError, SlipLimbOverflowError
from ..matrix import Kind, SlipMatrix, Type
from ..options import Options
from ..stats import SolveStats, phase_timer, record
from .bounds import (_input_width, factor_width, hadamard_bits,
                     solve_width)
from .factor_fused import (_auto_ck, fused_solve_all, fused_solve_many,
                           ints_to_tc_rows, lane_group, tc_rows_to_ints,
                           val_table_in_hbm, _r8, _r128)
from .schedule import _permute_cols
from .schedule_native import build_schedule_best
from .schedule_stream import build_event_stream


def _ev2d(ev):
    """[nc, C, 5] -> field-major [nc, 5, C]. The event-minor layout
    tiles its 5-wide minor dim to 128 lanes on device (25x memory —
    at 1M nnz that alone exceeds HBM); field-major tiles 5 -> 8
    sublanes instead (1.6x)."""
    return np.ascontiguousarray(ev.transpose(0, 2, 1))


def _stream_arrays(es):
    f, s = es.factor, es.solve
    fhm = np.concatenate([f.h_step, f.h_slot, f.h_div, f.counts],
                         axis=1).astype(np.int32)
    return (
        jnp.asarray(fhm), jnp.asarray(_ev2d(f.ev1)),
        jnp.asarray(_ev2d(f.ev2)),
        jnp.asarray(s.counts), jnp.asarray(_ev2d(s.ev1)),
        jnp.asarray(_ev2d(s.ev2)),
    )


def _mpq(num: int, den: int) -> Fraction:
    """Canonical Fraction without the pure-Python Fraction() overhead
    (the reference's mpq_canonicalize; math.gcd runs at C speed)."""
    if den < 0:
        num, den = -num, -den
    g = gcd(num, den)
    if g > 1:
        num //= g
        den //= g
    f = Fraction.__new__(Fraction)
    f._numerator = num
    f._denominator = den
    return f


def _tc_width(values, cap: int) -> int:
    """Smallest limb count whose two's complement holds every value
    exactly (sign bit included), clamped to [1, cap]."""
    bits = 1
    for v in values:
        b = (v if v >= 0 else ~v).bit_length() + 1
        if b > bits:
            bits = b
    return max(1, min(cap, -(-bits // 16)))


def plan_segments(max_level, n: int, W: int, Wmin: int):
    """Adaptive-width chunk segments: list of [lo, hi, W8s], widths
    nondecreasing and ending at _r8(W).

    Model: IPGE values at level L are k x k minors with k ~ L, whose
    bit growth is ~linear in L for the matrices the corpus spans — a
    level-L value needs ~W*(L+1)/n limbs. The model only steers the
    INITIAL optimistic widths; every kernel write is overflow-checked,
    so an undersized segment costs a per-segment widen-and-retry
    (backslash loop below), never a wrong answer. Early segments run
    the same events at a fraction of the width — the MAC cost per event
    is quadratic in width (ops/pallas_limbs.mul_mod), which is where
    wide-W matrices spend their time."""
    nc = len(max_level)
    W8 = _r8(W)
    if W8 < 32 or nc < 16 or os.environ.get(
            "SLIP_FUSED_SEGMENTS", "1") == "0":
        return [[0, nc, W8]]

    def need(L):
        return _r8(max(Wmin, (W * (L + 2)) // n + 2))

    targets = sorted({max(_r8(W8 // 8), 8), _r8(W8 // 4),
                      _r8(W8 // 2)} - {W8})
    segs = []
    lo = 0
    for T in targets:
        hi = lo
        while hi < nc and need(int(max_level[hi])) <= T:
            hi += 1
        # slivers aren't worth a pallas_call + relift boundary
        if hi - lo >= max(8, nc // 16):
            segs.append([lo, hi, T])
            lo = hi
    segs.append([lo, nc, W8])
    return segs


def _merged(segplan):
    """Collapse adjacent equal-width segments (after widen bumps)."""
    out = []
    for lo, hi, w in segplan:
        if out and out[-1][2] == w:
            out[-1][1] = hi
        else:
            out.append([lo, hi, w])
    return tuple((lo, hi, w) for lo, hi, w in out)


def _resolve_order(A, analysis, q, fixed_r):
    """One-time per analysis: pick the base or the etree-interleaved
    column order for the scheduled paths, measured-thin rule.

    Interleaving independent elimination-tree branches
    (analyze.etree_interleave — topological, fill-preserving) lets the
    chunk packer put up to heads_per_chunk pivot heads in one chunk,
    cutting the device scan for HEAD-BOUND streams (tri1000: 826 ->
    284 factor chunks, solve 1725 -> 613). Event-bound streams get
    NOTHING from it and lose event locality (grid24 factor chunks
    2080 -> 3650), so the rule is: interleave only when the schedule
    averages < 8 live IPGE tiles per step. The decision is sticky
    (analysis.q is updated in place so every backend and the
    cancellation-replan path stay consistent) and skipped entirely
    once pinned pivot rows exist.

    Returns (q, (sched, r) or None) — the schedule built while
    deciding is handed back so the caller doesn't rebuild it."""
    if fixed_r is not None or getattr(analysis, "ilv_decided", False):
        return q, None
    analysis.ilv_decided = True
    sched, r = build_schedule_best(A, q, None)
    tp = np.asarray(sched.tile_pos)
    per_step = float((tp < sched.nnz).sum()) / max(sched.n, 1)
    if per_step >= 8.0:
        analysis.ilv_applied = False
        return q, (sched, r)
    from ..analyze import etree_interleave
    q2 = etree_interleave(A, q)
    if q2 is q:
        analysis.ilv_applied = False
        return q, (sched, r)
    analysis.q = q2
    analysis.ilv_applied = True
    sched2, r2 = build_schedule_best(A, q2, None)
    return q2, (sched2, r2)


def _auto_capacities(sched, n: int):
    """Chunk-stream event capacities. Measured sweeps settle on the
    fixed (32, 128): the vector unit processes 128 lanes per op
    regardless of how few are live, so C2 > 128 costs extra vector
    registers per op while hazard cuts keep big chunks partially full
    (grid24 at C2=512: 147 ms vs 108 ms at 128), and SMALLER
    capacities split chunks without making any op cheaper (tri1000 at
    C1=8/C2=32: 333 ms vs 240 ms at 32/128 — every extra chunk pays
    the fixed head/gather/carry overhead). SLIP_FUSED_C1/SLIP_FUSED_C2
    override for experiments (powers of two)."""
    return (int(os.environ.get("SLIP_FUSED_C1", 32)),
            int(os.environ.get("SLIP_FUSED_C2", 128)))


def _dissect_candidate(A: SlipMatrix, analysis: Analysis,
                       options: Options, n_groups: int = 8):
    """One-time per analysis: when the native ordering's dependency
    forest is a chain (banded matrices under natural/COLAMD order),
    prepare — but do NOT commit — a dissection reorder so the grouped
    (subtree-local) streams have independent subtrees.

    Reordered pivot VALUES are arbitrary — exact cancellations in the
    local chains are likely on integer corpora — so cancellations are
    repaired with pivoting confined to each group's block
    (schedule_subtree.pin_rows_per_group), the composed sequence is
    certified end to end by one host REF LU (slip_get_pivot.c
    analogue), and the exact limb width is captured so an adopting
    caller skips the widen ladder. Returns
    (q_nd, fixed_r, sched_nd, r_nd, Wx) or None; the CALLER adopts
    only if the grouped stream actually wins.

    n_groups sets the dissection depth (cached per value): the sharded
    planner scales it with the chip count — more, smaller groups keep
    per-chip capacity binding and shorten the solve scan (uni100k at 8
    chips: G=8 -> G=16 cuts the solve scan 3486 -> 1967 chunks)."""
    cache = getattr(analysis, "nd_candidate", None)
    if cache is not None and n_groups in cache:
        return cache[n_groups]
    if cache is None:
        cache = analysis.nd_candidate = {}
    cache[n_groups] = None
    n = A.n
    if n > int(os.environ.get("SLIP_DISSECT_NMAX", 65536)):
        # the candidate must be CERTIFIED by one full host REF LU
        # (top cancellations), and a dissected order's pivot values
        # grow with leaf size — at 100K+ columns that certification
        # costs minutes of big-integer work for a candidate the width
        # model would likely reject anyway (leaf minors ~n/G levels
        # deep). Scale there comes from sharding the natural order.
        return None
    from .schedule_subtree import (dependency_forest, dissect_order,
                                   partition_groups,
                                   pin_rows_per_group)
    q0 = np.asarray(analysis.q, dtype=np.int64)
    sc = getattr(analysis, "fused_sched_only_cache", None)
    if sc is not None and sc[0] is None:
        sched0, _ = sc[1]
    else:
        q0, built = _resolve_order(A, analysis, q0, None)
        sched0, r0 = built if built is not None \
            else build_schedule_best(A, q0, None)
        analysis.fused_sched_only_cache = (None, (sched0, r0))
    q_nd = dissect_order(A, n_groups=n_groups)
    sched_nd, r_nd = build_schedule_best(A, q_nd, None)
    if sched_nd.lnz + sched_nd.unz > 1.9 * (sched0.lnz + sched0.unz):
        return None             # fill guard: reorder not worth it
    gr = partition_groups(dependency_forest(sched_nd),
                          n_groups=n_groups)
    if gr is None:
        return None
    pair_g, demoted = pin_rows_per_group(A, q_nd, r_nd, gr,
                                         report_bad=True)
    if pair_g is None:
        return None             # unrepairable block: stay native
    # compose the full (column -> pivot row) assignment: block pivots
    # from the repair, demoted pairs (an exactly-singular block's
    # dependent column with the unpivoted row carrying its missing
    # rank — see pin_rows_per_group), transversal rows elsewhere; the
    # demoted columns move to the END of the order (the separator)
    pair = {int(q_nd[k]): int(r_nd[k]) for k in range(n)}
    pair.update(pair_g)
    dem_cols = [c for c, _ in demoted]
    for c, r2 in demoted:
        pair[c] = r2
    if demoted:
        dset = set(dem_cols)
        q_nd = np.asarray([c for c in q_nd if int(c) not in dset]
                          + dem_cols, np.int64)
    fixed_r = np.asarray([pair[int(c)] for c in q_nd], np.int64)
    assert len(set(map(int, fixed_r))) == n   # still a permutation
    from ..errors import SlipSingularError
    from ..factorize import factorize
    old_q = analysis.q
    analysis.q = q_nd
    try:
        F = factorize(A, analysis, options, fixed_r=fixed_r)
    except SlipSingularError:
        return None             # top cancellation: stay native
    finally:
        analysis.q = old_q
    sched_p, r_p = build_schedule_best(A, q_nd, fixed_r)
    Wx = _tc_width((v for col in (F.Lcols + F.Ucols)
                    for _, v in col), 1 << 30) + 1
    cache[n_groups] = (q_nd, fixed_r, sched_p, r_p, Wx)
    return cache[n_groups]


def _width_probe(A: SlipMatrix, analysis: Analysis, options: Options,
                 fixed_r=None, steps: int = 1024) -> Optional[int]:
    """Value-aware limb-width estimate for the CURRENT order and pivot
    rows: a TRUNCATED host REF factorization (first `steps` columns,
    transversal rows pinned) with linear-rate extrapolation — IPGE
    entry widths grow ~linearly with elimination level. Symbolic
    estimates cannot see value effects (the banded corpus's natural
    order has unit minors and W stays at the input width; a dissected
    order of the same matrix grows to 112 limbs), and the adoption
    cost model needs BOTH sides' widths, so this is the cheap probe
    for the side that has no certified width. None on an exact
    cancellation inside the probe window (caller falls back)."""
    cache = getattr(analysis, "width_probe_cache", None)
    key = None if fixed_r is None else fixed_r.tobytes()
    if cache is not None and cache[0] == key:
        return cache[1]
    from ..errors import SlipSingularError
    from ..factorize import factorize
    n = A.n
    s = min(n, steps)
    try:
        F = factorize(A, analysis, options, fixed_r=fixed_r,
                      max_steps=s)
    except SlipSingularError:
        analysis.width_probe_cache = (key, None)
        return None
    Wmax = _tc_width((v for col in (F.Lcols + F.Ucols)
                      for _, v in col), 1 << 30)
    W_in = _tc_width((int(A.x[i]) for i in range(int(A.p[n]))),
                     1 << 30)
    est = Wmax + 1 if s >= n \
        else max(Wmax, W_in + (Wmax - W_in) * n // s) + 1
    analysis.width_probe_cache = (key, est)
    return est


def _pin_scheme_rows(A: SlipMatrix, analysis: Analysis,
                     options: Options) -> None:
    """options.pivot honored on the scheduled paths (pivot_exact=True):
    run the reference pivot search ONCE on host (the slip_get_pivot.c
    dispatch inside factorize) and pin the resulting row sequence into
    the static schedule. Cached per (pivot, tol) on the Analysis; the
    host factorization's exact limb width seeds the device ladder, so
    the device pass runs once at the right width. Raises
    SlipSingularError for genuinely singular input (host semantics)."""
    tag = (int(options.pivot), float(options.tol))
    if (getattr(analysis, "pivot_pin_tag", None) == tag
            and analysis.sparse_fixed_r is not None):
        return
    from ..factorize import factorize
    F = factorize(A, analysis, options)     # raises if singular
    fixed_r = np.asarray(F.row_perm, dtype=np.int64)
    analysis.sparse_fixed_r = fixed_r
    analysis.pivot_pin_tag = tag
    Wx = _tc_width((v for col in (F.Lcols + F.Ucols)
                    for _, v in col), 1 << 30) + 1
    analysis.fused_pin_check = (fixed_r.tobytes(), Wx)
    analysis.fused_sched_only_cache = None


def factorize_solve_tpu_fused(A: SlipMatrix, analysis: Analysis,
                              b: SlipMatrix,
                              options: Optional[Options] = None,
                              heads_per_chunk: Optional[int] = None,
                              pass1_events: Optional[int] = None,
                              pass2_events: Optional[int] = None) -> SlipMatrix:
    """Exact solve via the fused Pallas sparse path.

    heads_per_chunk: None (default) auto-picks per matrix — 8 when the
    etree interleave packs independent heads together (head-bound
    streams), else 2 (event-bound streams pack ~1.5 steps per chunk,
    and every unused head slot costs per-chunk scalar work: uni100k
    natural-order measured 599 -> 490 ms at H=2).
    pass1_events/pass2_events: chunk-stream event capacities; None
    (default) auto-tunes them per matrix (_auto_capacities)."""
    options = options or Options()
    options.validate()
    if A.kind != Kind.CSC or A.type != Type.MPZ:
        raise SlipIncorrectInputError("fused path requires CSC x MPZ input")
    n = A.n
    if b.m != n:
        raise SlipIncorrectInputError(f"b has {b.m} rows, matrix has {n}")
    bz = matrix_copy(b, Kind.DENSE, Type.MPZ, options)
    nrhs = bz.n
    if n == 0:
        return SlipMatrix.allocate(Kind.DENSE, Type.MPQ, 0, nrhs)
    st = SolveStats(backend="tpu-fused", n=n, nnz=int(A.p[n]), nrhs=nrhs)
    if options.pivot_exact:
        _pin_scheme_rows(A, analysis, options)
    q = np.asarray(analysis.q, dtype=np.int64)
    fixed_r = analysis.sparse_fixed_r   # cached repair from earlier solves

    for plan in range(2):
        # plan 0: transversal-diagonal pivots; plan 1 (cancellation
        # repair): pin the host oracle's pivot rows — guaranteed nonzero
        with phase_timer(st, "schedule"):
            skey = None if fixed_r is None else fixed_r.tobytes()
            sc = getattr(analysis, "fused_sched_only_cache", None)
            if sc is not None and sc[0] == skey:
                sched, r = sc[1]
            else:
                q, built = _resolve_order(A, analysis, q, fixed_r)
                sched, r = built if built is not None \
                    else build_schedule_best(A, q, fixed_r)
                analysis.fused_sched_only_cache = (skey, (sched, r))
            c1a, c2a = _auto_capacities(sched, n)   # fixed (32, 128)
            p1 = pass1_events if pass1_events is not None else c1a
            p2 = pass2_events if pass2_events is not None else c2a
            if heads_per_chunk is None:
                heads_per_chunk = 8 if getattr(
                    analysis, "ilv_applied", False) else 2
            cache = getattr(analysis, "fused_cache", None)
            key = (heads_per_chunk, p1, p2, skey)
            if cache is not None and cache[0] == key:
                sched, r, es, dev_streams, avals = cache[1]
            else:
                es = build_event_stream(sched, heads_per_chunk, p1, p2)
                subtree_mode = os.environ.get("SLIP_FUSED_SUBTREE", "1")
                if subtree_mode != "0":
                    # subtree-local (grouped) streams: independent
                    # etree subtrees factor concurrently with deferred
                    # determinant scaling (tpu/schedule_subtree.py) —
                    # adopted when they shorten the serial chunk scan
                    # ("force" adopts any decomposition — tests)
                    from .schedule_subtree import try_build_grouped
                    # grouped streams are fix-heavy (stale clone /
                    # cross-round targets): pass-1 capacity doubles so
                    # C1 cuts stop dominating the scan (measured:
                    # 177 -> 117 chunks on the dissected band probe)
                    es_g = try_build_grouped(sched, 8, max(64, p1), p2)
                    cand = None
                    if es_g is None and fixed_r is None and n >= 192:
                        # chain forest: evaluate a dissection reorder
                        # (committed only if the grouped stream wins)
                        cand = _dissect_candidate(A, analysis, options)
                        if cand is not None:
                            es_g = try_build_grouped(
                                cand[2], 8, max(64, p1), p2)

                    def _events(s):
                        return int((s.factor.counts[:, 1:3].sum())
                                   + (s.solve.counts[:, 1:3].sum()))

                    # single-chip adoption: the measured per-EVENT
                    # scalar gather cost dominates narrow-W streams
                    # (uni10k A/B: grouped 65.2 ms vs 60.8 ms when
                    # dissection tripled the events), so the shorter
                    # scan must not come with event inflation. The
                    # sharded driver adopts on scan length alone —
                    # chips divide the events, the scan is shared.
                    adopt = es_g is not None and (
                        subtree_mode == "force"
                        or (es_g.factor.nchunks + es_g.solve.nchunks
                            < 0.85 * (es.factor.nchunks
                                      + es.solve.nchunks)
                            and _events(es_g) < 1.25 * _events(es)))
                    if es_g is not None and not adopt:
                        # MAC-bound wide-W regime: per-event cost is
                        # ~quadratic in the adaptive segment width, and
                        # grouped chunks run at LOCAL widths
                        # (max_level model) — weight events by the
                        # segment width the planner would choose.
                        # Each stream is costed at ITS OWN width: the
                        # grouped side has a certified Wx, the
                        # ungrouped side is value-probed (a dissection
                        # can widen pivots 16 -> 112 on the same
                        # matrix, so one shared West mis-ranks them —
                        # seen as a 456 -> 1123 ms uni100k:none
                        # regression).
                        pchk = getattr(analysis, "fused_pin_check",
                                       None)
                        West_g = cand[4] if cand is not None else (
                            pchk[1] if (pchk is not None
                                        and pchk[0] == skey
                                        and pchk[1]) else None)
                        if West_g is not None and West_g >= 32:
                            West_u = _width_probe(A, analysis, options,
                                                  fixed_r=r)
                            if West_u is None:
                                West_u = West_g

                            def _wcost(s, West):
                                c = 0.0
                                for sc in (s.factor, s.solve):
                                    ml = np.asarray(sc.max_level,
                                                    np.float64)
                                    w = np.minimum(
                                        West, West * (ml + 2) / n + 2)
                                    ev = (sc.counts[:, 1]
                                          + sc.counts[:, 2])
                                    c += float((ev * (w / 8.0) ** 2)
                                               .sum())
                                return c
                            adopt = (_wcost(es_g, West_g)
                                     < 0.8 * _wcost(es, West_u))
                    if adopt:
                        es = es_g
                        if cand is not None:
                            # commit the dissection: reorder, pinned
                            # rows, exact width seed, fresh cache keys
                            q, fixed_r, sched, r, Wx = cand
                            analysis.q = q
                            analysis.sparse_fixed_r = fixed_r
                            skey = fixed_r.tobytes()
                            analysis.fused_pin_check = (skey, Wx)
                            analysis.fused_sched_only_cache = (
                                skey, (sched, r))
                            key = (heads_per_chunk, p1, p2, skey)
                dev_streams = _stream_arrays(es)
                Aq = _permute_cols(A, q)
                avals = [int(Aq.x[idx]) for c in range(n)
                         for idx in range(int(Aq.p[c]), int(Aq.p[c + 1]))]
                analysis.fused_cache = (key, (sched, r, es, dev_streams,
                                              avals))
        st.lnz, st.unz = es.lnz, es.unz
        (fhm, fev1, fev2, scnt, sev1, sev2) = dev_streams
        E = es.nnz
        es_H = int(es.factor.h_step.shape[1])   # H the stream was built
        #                                         with (grouped uses 8)
        es_C1 = int(es.factor.ev1.shape[1])     # capacities likewise
        es_C2 = int(es.factor.ev2.shape[1])     # (grouped doubles C1)
        ndet_eff = n if es.ndet is None else es.ndet

        # --- width strategy: optimistic start + sound widen-and-retry --
        # The analytic Hadamard bound (W_full) is often 4-40x wider than
        # the entries the factorization actually produces (tridiagonal/
        # banded/unimodular matrices especially). Every value the kernel
        # WRITES is overflow-checked at a modulus where the true quotient
        # provably fits (ops/pallas_limbs.py), and every value it READS
        # was either so checked or packed on host at a width verified
        # below — so starting far below the bound is sound: an undersized
        # width costs a retry, never a wrong answer. Converged widths are
        # cached on the Analysis, so warm solves skip the ladder.
        hbits = getattr(analysis, "hadamard_bits_cache", None)
        if hbits is None:
            hbits = hadamard_bits(A)
            analysis.hadamard_bits_cache = hbits
        W_full = factor_width(A, hbits=hbits)
        Ws_full = solve_width(A, bz.x, W_full, n, hbits=hbits)
        if es.ndet is not None:
            # grouped merge intermediates (clone terms scaled by
            # determinant products, fold partial sums) can exceed the
            # single-minor bound by a few bits — one limb of headroom
            # keeps the ladder-exhaustion invariant sound
            W_full += 1
            Ws_full += 1
        W_in = _input_width(avals)
        Wb_in = _input_width(bz.x.reshape(-1))
        if options.max_limbs is not None:
            # explicit user clamp: honor it exactly (reference semantics)
            W = factor_width(A, options.max_limbs, hbits=hbits)
            Ws = solve_width(A, bz.x, W, n, options.max_limbs,
                             hbits=hbits)
        else:
            wcache = getattr(analysis, "fused_width_cache", None)
            if wcache is not None:
                W, Ws = wcache
                W = min(max(W, W_in), W_full)
                Ws = min(max(Ws, W + 1, Wb_in), Ws_full)
            else:
                # start at bound/16 but never above 16 limbs — for very
                # large matrices the bound grows with n while the true
                # entry growth often doesn't, and the doubling ladder
                # recovers genuinely wide cases in O(log) retries
                W = min(max(2, W_in + 1, min(-(-W_full // 16), 16)),
                        W_full)
                Ws = min(max(W + 1, Wb_in + 1,
                             min(-(-Ws_full // 16), 32)), Ws_full)
            # an exact pinned-pivot width for THIS schedule (from a
            # previous rung's host check or pre-seeded at replan time)
            # beats any guess — start there
            pchk = getattr(analysis, "fused_pin_check", None)
            if (pchk is not None and pchk[0] == skey
                    and pchk[1] is not None):
                W = min(max(W, pchk[1], W_in + 1), W_full)
                Ws = min(max(Ws, W + 1), Ws_full)

        sing = False
        sing_seen = False
        Wmin_in = max(2, W_in + 1)
        segplan = None
        ssegplan = None
        scache = getattr(analysis, "fused_seg_cache", None)
        if (scache is not None and scache[0] == key and scache[1] == W
                and scache[3] == Ws):
            segplan = [list(s) for s in scache[2]]
            ssegplan = [list(s) for s in scache[4]]
        while True:
            W8 = _r8(W)
            Ws8 = _r8(max(Ws, W + 1))
            WN = _r8(2 * W8 + 2)
            WNS = _r8(W8 + Ws8 + 2)
            WI8 = _r8(max(W8, Ws8) + 2)   # GT width: verified short
            #                                 division (factor_fused)
            st.W, st.Ws = W8, Ws8
            # packed-tables mode: three separate VMEM rho tables pad
            # every row to 128 lanes, so at large n they exceed VMEM
            # (130K rows x 128 lanes x 3 tables = 190MB); when the
            # widths fit one row (W8 + WI8 + 1 <= 128) they fuse into
            # a single [n8, 128] table instead (factor_fused._pass_body
            # docstring). Runs single-segment (widths are small here).
            n8v = _r8(ndet_eff + 2)
            tpk_budget = int(os.environ.get("SLIP_TPK_BUDGET",
                                            64 * 2**20))
            tpk = (n8v * 128 * 4 * 3 > tpk_budget)
            if tpk and W8 + WI8 + 1 > 128:
                raise SlipLimbOverflowError(
                    f"rho tables for n={n} exceed VMEM and widths "
                    f"(W8={W8}, WI8={WI8}) are too wide to pack — "
                    "matrix out of single-chip range")
            if segplan is None:
                segplan = plan_segments(es.factor.max_level, n, W,
                                        Wmin_in) if not tpk \
                    else [[0, len(es.factor.max_level), W8]]
            segments = _merged(segplan)
            segplan = [list(s) for s in segments]
            S = len(segments)
            w0 = segments[0][2]
            with phase_timer(st, "pack"):
                # A's limb table is per-(schedule, first-segment width):
                # upload once, reuse the device buffer across solves
                # (fused_solve_all never donates its val argument)
                E8 = _r8(E + 1)
                # HBM mode: each slot stored as KR 128-lane rows (the
                # DMA slice granularity; see factor_fused docstring)
                hbm_mode = val_table_in_hbm(E8, w0)
                WV = _r128(w0) if hbm_mode else w0
                vkey = (key, w0)
                vcache = getattr(analysis, "fused_val_cache", None)
                if vcache is not None and vcache[0] == vkey:
                    val_dev = vcache[1]
                else:
                    val_in = np.zeros((E8, WV), dtype=np.int32)
                    val_in[np.asarray(es.init_pos), :w0] = ints_to_tc_rows(
                        avals, w0)
                    if es.extra_pos is not None and len(es.extra_pos):
                        # grouped streams: constant / scratch slots
                        val_in[np.asarray(es.extra_pos), :w0] = \
                            ints_to_tc_rows(es.extra_vals, w0)
                    if hbm_mode:
                        val_in = val_in.reshape(E8 * (WV // 128), 128)
                    val_dev = jnp.asarray(val_in)
                    analysis.fused_val_cache = (vkey, val_dev)
                bcols = [[int(bz.x[int(r[k]), c]) for k in range(n)]
                         for c in range(nrhs)]
                Wb = _tc_width((v for col in bcols for v in col), Ws8)
                b_rows = np.stack([ints_to_tc_rows(col, Wb)
                                   for col in bcols])
            # solve-stream width segments (forward-sub values grow with
            # level like factor values; det/bwd chunks pin full width
            # via their max_level). First segment must hold b exactly.
            if ssegplan is None:
                ssegplan = plan_segments(es.solve.max_level, n,
                                         max(Ws, W + 1),
                                         max(Wmin_in, Wb + 1)) \
                    if not tpk \
                    else [[0, len(es.solve.max_level), Ws8]]
            for sp in ssegplan:
                sp[2] = min(max(sp[2], _r8(Wb + 1)), Ws8)
            ssegplan[-1][2] = Ws8
            ssegments = _merged(ssegplan)
            ssegplan = [list(s) for s in ssegments]
            Ss = len(ssegments)
            with phase_timer(st, "device"):
                # ONE dispatch, ONE fetch (the tunnel pays a fixed
                # ~45 ms per host sync, so never go piecemeal)
                try:
                    flat = np.asarray(jax.device_get(fused_solve_all(
                        n, E, W8, Ws8, WN, WNS, WI8, es_H,
                        es_C1, es_C2,
                        fhm, fev1, fev2,
                        scnt, sev1, sev2, val_dev, jnp.asarray(b_rows),
                        hbm=hbm_mode, segments=segments,
                        ssegments=ssegments, tpk=tpk,
                        CK=_auto_ck(), ndet=es.ndet, nxx=es.nxx)))
                except jax.errors.JaxRuntimeError as e:
                    # a width rung too wide to COMPILE (tables overflow
                    # scoped VMEM) is ladder exhaustion, not a crash:
                    # with a sing on record the cancellation diagnosis
                    # stands (replan); otherwise nothing can solve this
                    # width on-device — surface the real error
                    msg = str(e)
                    if sing_seen and ("RESOURCE_EXHAUSTED" in msg
                                      or "Ran out of memory" in msg
                                      or "vmem limit" in msg
                                      or "exceeded" in msg):
                        sing = True
                        break
                    raise
            o = 0
            seg_sing = [bool(flat[o + 2 * s]) for s in range(S)]
            seg_ovf = [bool(flat[o + 2 * s + 1]) for s in range(S)]
            o += 2 * S
            det_row = flat[o:o + W8][None, :]; o += W8
            X_h = []
            sseg_ovf = [False] * Ss
            # fused_solve_all batches multiple RHS onto the member
            # lanes of one solve-stream run whenever the (final
            # segment's) value table is VMEM-resident — mirror its
            # rhs_lanes rule to read the flat layout back
            rhs_lanes = (nrhs > 1 and not tpk
                         and not val_table_in_hbm(E8, segments[-1][2]))
            if rhs_lanes:
                R8 = lane_group(nrhs)
                for s in range(Ss):
                    if flat[o + R8:o + 2 * R8].any():
                        sseg_ovf[s] = True
                    o += 2 * R8
                blk = flat[o:o + n * R8 * Ws8].reshape(n, R8, Ws8)
                o += n * R8 * Ws8
                for c in range(nrhs):
                    X_h.append(blk[:, c, :])
            else:
                for c in range(nrhs):
                    for s in range(Ss):
                        if flat[o + 1]:
                            sseg_ovf[s] = True
                        o += 2
                    X_h.append(flat[o:o + n * Ws8].reshape(n, Ws8))
                    o += n * Ws8
            sing = any(seg_sing)
            sing_seen = sing_seen or sing
            f_ovf = any(seg_ovf)
            s_ovf = any(sseg_ovf)
            # a sing with no overflow in the SAME or any EARLIER segment
            # cannot be a truncation artifact: all arithmetic feeding
            # that pivot was overflow-clean, so the cancellation is real
            sing_clean = sing and not any(
                seg_ovf[i] for i in range(seg_sing.index(True) + 1))
            if os.environ.get("SLIP_FUSED_DEBUG"):
                print(f"[fused] plan={plan} W={W} Ws={Ws} "
                      f"segs={segments} sing={seg_sing} ovf={seg_ovf} "
                      f"s_ovf={s_ovf}", flush=True)
            # Flag trust: sing is only believable when NO overflow hit
            # the same or any earlier segment (sing_clean) — then every
            # value feeding the pivot fit its storage width, storage is
            # exact, and a zero residue IS a zero pivot. A sing that
            # rides along with overflow must be IGNORED and the ladder
            # climbed: integer pivot sequences can be 2-adically deep
            # (tridiagonal minors with small entries accumulate
            # linearly-growing powers of two), making the exact pivot
            # ≡ 0 mod 2^(16*W8) for MANY consecutive rungs — any
            # "sing that survives N rungs is genuine" shortcut is
            # unsound (found on tri1000: pivots divisible by 2^600+).
            # Termination: at the analytic bound genuine overflow is
            # impossible, so either the flags come back clean or the
            # sing there is real (bound-exhaustion break below).
            if sing and sing_clean:
                break                       # genuine cancellation
            if sing or (f_ovf and st.retries >= 2):
                # inconclusive sing (riding with overflow), or a climb
                # that is clearly going to take several rungs. ONE
                # exact host REF LU pinned to THIS schedule's rows
                # decides for good — either the pinned sequence truly
                # cancels (replan), or it yields the exact factor
                # values and therefore the exact width to jump to
                # (every blind rung costs a compile; the host pass
                # costs about one device solve).
                # keyed on the pinned row sequence only — the exact
                # width of a pinned factorization is independent of
                # chunk capacities
                chk = getattr(analysis, "fused_pin_check", None)
                if chk is None or chk[0] != skey:
                    with phase_timer(st, "pincheck"):
                        from ..errors import SlipSingularError
                        from ..factorize import factorize
                        try:
                            F = factorize(A, analysis, options,
                                          fixed_r=np.asarray(r))
                            Wx = _tc_width(
                                (v for col in (F.Lcols + F.Ucols)
                                 for _, v in col), 1 << 30) + 1
                            chk = (skey, Wx)
                        except SlipSingularError:
                            chk = (skey, None)
                    analysis.fused_pin_check = chk
                if chk[1] is None:
                    sing = True
                    break                   # proven cancellation
                Wx = max(chk[1], W_in + 1)  # table also holds raw A
                if W < Wx <= W_full:
                    W = Wx
                    Ws = max(Ws, W + 1)
                    segplan = None
                    ssegplan = None
                    st.retries += 1
                    continue
            if f_ovf or s_ovf:
                # only the FIRST overflowed segment's flag is
                # trustworthy (its garbage feeds everything after it);
                # widen it alone below the full width, escalate to the
                # global ladder only when the full-width segment flags.
                # A rung where BOTH the first and the full-width
                # segment flag is wholesale undersized — collapsing it
                # segment by segment wastes a compile per step, so go
                # straight to the global ladder.
                first_bad = seg_ovf.index(True) if f_ovf else None
                if (first_bad is not None
                        and segplan[first_bad][2] < W8
                        and not (S > 1 and seg_ovf[0]
                                 and seg_ovf[-1])):
                    segplan[first_bad][2] = min(
                        2 * segplan[first_bad][2], W8)
                    for s in range(first_bad + 1, S):
                        segplan[s][2] = max(segplan[s][2],
                                            segplan[first_bad][2])
                    st.retries += 1
                    continue
                # same per-segment policy for the solve stream (only
                # reached with the factor stream clean or exhausted)
                if not f_ovf and s_ovf:
                    sbad = sseg_ovf.index(True)
                    if ssegplan[sbad][2] < Ws8:
                        ssegplan[sbad][2] = min(
                            2 * ssegplan[sbad][2], Ws8)
                        for s in range(sbad + 1, Ss):
                            ssegplan[s][2] = max(ssegplan[s][2],
                                                 ssegplan[sbad][2])
                        st.retries += 1
                        continue
                W2, Ws2 = W, Ws
                if f_ovf:
                    W2 = min(2 * W, W_full)
                else:
                    Ws2 = min(2 * Ws, Ws_full)
                Ws2 = max(Ws2, W2 + 1)
                if (W2, Ws2) == (W, Ws):
                    if sing:
                        break               # cancellation proven (see ^)
                    raise SlipLimbOverflowError(
                        "overflow persists at the analytic width bound "
                        f"(W={W}, Ws={Ws}) — internal invariant violated")
                if W2 != W:
                    segplan = None          # widths rescale with W
                if Ws2 != Ws:
                    ssegplan = None
                W, Ws = W2, Ws2
                st.retries += 1
                continue
            if options.max_limbs is None:
                analysis.fused_width_cache = (W, Ws)
                analysis.fused_seg_cache = (key, W, segments, Ws,
                                            ssegments)
            with phase_timer(st, "unpack"):
                det = tc_rows_to_ints(det_row)[0]
                x = SlipMatrix.allocate(Kind.DENSE, Type.MPQ, n, nrhs)
                factor = A.scale / bz.scale
                fnum, fden = factor.numerator, factor.denominator
                den_all = det * fden
                for c in range(nrhs):
                    xh = tc_rows_to_ints(X_h[c][:n])
                    for k in range(n):
                        x.x[int(q[k]), c] = _mpq(xh[k] * fnum, den_all)
            record(st)
            return x
        # the singular flag stopped the width loop
        if plan == 0:
            # exact cancellation killed a scheduled pivot: replan around
            # the oracle's actual pivot sequence (reference analogue: the
            # dynamic pivot search of slip_get_pivot.c, done once on
            # host) and rerun the fused path with the pinned rows
            with phase_timer(st, "replan"):
                from ..factorize import factorize
                F = factorize(A, analysis, options)   # raises if singular
                fixed_r = np.asarray(F.row_perm, dtype=np.int64)
                analysis.sparse_fixed_r = fixed_r
                # this factorization IS plan 1's pinned sequence: seed
                # its exact width so plan 1 starts at the right rung
                # instead of re-climbing (or re-running the host pass)
                key1 = fixed_r.tobytes()
                Wx1 = _tc_width((v for col in (F.Lcols + F.Ucols)
                                 for _, v in col), 1 << 30) + 1
                analysis.fused_pin_check = (key1, Wx1)
    # both plans singular-flagged (cannot happen with a pinned oracle
    # sequence unless something deeper is wrong) — last resort: the
    # dense full-pivoting kernel, which searches pivots dynamically.
    # Its working set is O(n^2 * W) — beyond small n that exceeds any
    # memory, so large systems fall back to the host oracle instead
    # (exact, O(fill) memory) rather than a doomed allocation.
    st.fallback = True
    record(st)
    if n > 256:
        from ..backslash import backslash
        return backslash(A, b, Type.MPQ, options)
    from .backslash_tpu import factorize_solve_tpu
    return factorize_solve_tpu(A, analysis, b, options)


def factorize_solve_tpu_fused_many(As, analysis, bs,
                                   options: Optional[Options] = None,
                                   heads_per_chunk: int = 8,
                                   pass1_events: int = 16,
                                   pass2_events: int = 32):
    """Batched exact solves of pattern-sharing systems, fused path.

    The SURVEY §2.10 data-parallel axis done the way this runtime wants
    it: G matrices with identical (p, i) patterns share ONE schedule and
    ONE event stream, and all members execute every chunk TOGETHER on
    the vector lanes (member-lane batching, factor_fused._pass_body):
    lane e*G + g carries event e of member g, every logical table row
    holds G member rows. Narrow-lane arithmetic pads to 128 lanes
    anyway, so for thin chunk streams the extra members are nearly
    free — one dispatch, one fetch, and one set of per-chunk fixed
    costs for the whole family (vs ~45 ms/dispatch per member on the
    tunnel, plus G x the vector work, sequentially).

    The member count is padded to a multiple of 8 (lane-slice
    alignment) with copies of member 0, and large families run in
    groups sized so heads*G <= 128 lift lanes and the event capacities
    keep C*G within bounds. Families whose value table would need HBM
    residency (G > 1 is all-VMEM) fall back to sequential solves.

    Members whose scheduled pivot hits an exact cancellation fall back
    to the single-matrix driver individually (which replans around the
    oracle's pivots); everything else stays batched. Returns a list of
    dense MPQ solutions, one per system.
    """
    options = options or Options()
    options.validate()
    if not As or len(As) != len(bs):
        raise SlipIncorrectInputError("As and bs must be equal-length, "
                                      "nonempty lists")
    A0 = As[0]
    n = A0.n
    for A in As:
        if A.kind != Kind.CSC or A.type != Type.MPZ:
            raise SlipIncorrectInputError(
                "fused path requires CSC x MPZ input")
    for A in As[1:]:
        if A.n != n or not np.array_equal(A.p, A0.p) \
                or not np.array_equal(A.i[:int(A.p[n])],
                                      A0.i[:int(A0.p[n])]):
            raise SlipIncorrectInputError(
                "all matrices must share one sparsity pattern")
    GR = len(As)
    bzs = [matrix_copy(b, Kind.DENSE, Type.MPZ, options) for b in bs]
    nrhs = bzs[0].n
    if any(bz.m != n or bz.n != nrhs for bz in bzs):
        raise SlipIncorrectInputError("every b must be n x nrhs")
    if n == 0:
        return [SlipMatrix.allocate(Kind.DENSE, Type.MPQ, 0, nrhs)
                for _ in range(GR)]

    # lane budget: heads*G <= 128 (lift lanes), pass capacities * G
    # bounded so scratch stays sane
    gmax = min(128 // max(1, heads_per_chunk),
               1024 // max(pass1_events, pass2_events))
    gmax = max(8, (gmax // 8) * 8)
    gmax = int(os.environ.get("SLIP_FUSED_GMAX", gmax))
    xs = [None] * GR
    for lo in range(0, GR, gmax):
        sub = list(range(lo, min(lo + gmax, GR)))
        G = lane_group(len(sub))   # pad to a multiple of 8 (hardware)
        idx = sub + [sub[0]] * (G - len(sub))
        sols = _fused_many_group(
            [As[i] for i in idx], analysis, [bzs[i] for i in idx],
            [bs[i] for i in idx], options, heads_per_chunk,
            pass1_events, pass2_events, nrhs)
        for j, i in enumerate(sub):
            xs[i] = sols[j]
    return xs


def _fused_many_group(As, analysis, bzs, bs, options, heads_per_chunk,
                      pass1_events, pass2_events, nrhs, plan=0):
    """One member-lane group (G = len(As), a multiple of 8 on
    hardware). plan=0 runs the transversal-diagonal schedule; if a
    member's pivot cancels exactly, plan 1 replans the WHOLE family
    around one member's oracle pivot rows (pinned on the shared
    Analysis, like the single-matrix driver) — members whose values
    still cancel on the pinned rows fall back individually."""
    G = len(As)
    A0 = As[0]
    n = A0.n
    st = SolveStats(backend="tpu-fused-many", n=n, nnz=int(A0.p[n]),
                    nrhs=nrhs)
    q = np.asarray(analysis.q, dtype=np.int64)

    fr = analysis.sparse_fixed_r
    key = (heads_per_chunk, pass1_events, pass2_events,
           None if fr is None else fr.tobytes())
    with phase_timer(st, "schedule"):
        # schedule/stream are value-independent: cache like the
        # single-matrix driver (warm family solves skip the rebuild)
        mcache = getattr(analysis, "fused_many_sched_cache", None)
        if mcache is not None and mcache[0] == key:
            sched, r, es, dev_streams = mcache[1]
        else:
            q, built = _resolve_order(A0, analysis, q, fr)
            sched, r = built if built is not None \
                else build_schedule_best(A0, q, fr)
            es = build_event_stream(sched, heads_per_chunk,
                                    pass1_events, pass2_events)
            dev_streams = _stream_arrays(es)
            analysis.fused_many_sched_cache = (key, (sched, r, es,
                                                     dev_streams))
        (fhm, fev1, fev2, scnt, sev1, sev2) = dev_streams
        avals_g = []
        for A in As:
            Aq = _permute_cols(A, q)
            avals_g.append([int(Aq.x[idx]) for c in range(n)
                            for idx in range(int(Aq.p[c]),
                                             int(Aq.p[c + 1]))])
    st.lnz, st.unz = es.lnz, es.unz
    E = es.nnz
    avhash = hash(tuple(tuple(av) for av in avals_g))

    hb_g = [hadamard_bits(A) for A in As]
    W_full = max(factor_width(A, hbits=hb)
                 for A, hb in zip(As, hb_g))
    Ws_full = max(solve_width(A, bz.x, W_full, n, hbits=hb)
                  for A, bz, hb in zip(As, bzs, hb_g))
    W_in = max(_input_width(av) for av in avals_g)
    Wb_in = max(_input_width(bz.x.reshape(-1)) for bz in bzs)
    if options.max_limbs is not None:
        W = max(factor_width(A, options.max_limbs, hbits=hb)
                for A, hb in zip(As, hb_g))
        Ws = max(solve_width(A, bz.x, W, n, options.max_limbs, hbits=hb)
                 for A, bz, hb in zip(As, bzs, hb_g))
    else:
        W = min(max(2, W_in + 1, min(-(-W_full // 16), 16)), W_full)
        Ws = min(max(W + 1, Wb_in + 1, min(-(-Ws_full // 16), 32)),
                 Ws_full)
        # warm batches skip the ladder: converged widths cached per
        # (schedule, G) — the flags keep a stale hint sound
        mkey = (key, G)
        mw = getattr(analysis, "fused_many_width_cache", None)
        if mw is not None and mw[0] == mkey:
            W = min(max(W, mw[1]), W_full)
            Ws = min(max(Ws, mw[2], W + 1), Ws_full)

    Wmin_in = max(2, W_in + 1)
    segplan = None
    scache = getattr(analysis, "fused_many_seg_cache", None)
    if scache is not None and scache[0] == (key, G, W, Ws):
        segplan = [list(sg) for sg in scache[1]]
    while True:
        W8 = _r8(W)
        Ws8 = _r8(max(Ws, W + 1))
        WN = _r8(2 * W8 + 2)
        WNS = _r8(W8 + Ws8 + 2)
        WI8 = _r8(max(W8, Ws8) + 2)   # GT width: verified short division
        st.W, st.Ws = W8, Ws8
        if segplan is None:
            segplan = plan_segments(es.factor.max_level, n, W, Wmin_in)
        segments = _merged(segplan)
        segplan = [list(s) for s in segments]
        S = len(segments)
        w0 = segments[0][2]
        E8 = _r8(E + 1)
        # member-lane batching is all-VMEM; if any segment's G-member
        # table would need HBM residency, solve sequentially instead
        if any(val_table_in_hbm(E8 * G, wseg) for _, _, wseg in segments):
            record(st)
            out = []
            for g in range(G):
                from ..analyze import analyze
                out.append(factorize_solve_tpu_fused(
                    As[g], analyze(As[g], options), bs[g], options))
            return out
        with phase_timer(st, "pack"):
            # the key must identify the member VALUES too — one
            # analysis serves many groups/families (grouped calls
            # reuse it back to back with different value stacks)
            vkey = (key, G, w0, avhash)
            vc = getattr(analysis, "fused_many_val_cache", None)
            if vc is not None and vc[0] == vkey:
                vstack = vc[1]
            else:
                vstack = []
                for av in avals_g:
                    val_in = np.zeros((E8, w0), dtype=np.int32)
                    val_in[np.asarray(es.init_pos), :w0] = \
                        ints_to_tc_rows(av, w0)
                    vstack.append(val_in)
                vstack = jnp.asarray(np.stack(vstack))
                analysis.fused_many_val_cache = (vkey, vstack)
            ball = []
            Wb = 1
            for bz in bzs:
                bcols = [[int(bz.x[int(r[k]), c]) for k in range(n)]
                         for c in range(nrhs)]
                ball.append(bcols)
                Wb = max(Wb, _tc_width(
                    (v for col in bcols for v in col), Ws8))
            b_stack = np.stack([
                np.stack([ints_to_tc_rows(col, Wb) for col in bcols])
                for bcols in ball])
        with phase_timer(st, "device"):
            flat = np.asarray(jax.device_get(fused_solve_many(
                n, E, W8, Ws8, WN, WNS, WI8, heads_per_chunk,
                pass1_events, pass2_events, G,
                fhm, fev1, fev2,
                scnt, sev1, sev2, vstack, jnp.asarray(b_stack),
                hbm=False, segments=segments, CK=_auto_ck())))
        # G-aware flat layout (fused_solve_all docstring):
        # per factor segment [sing*G, ovf*G]; det G*W8; per rhs
        # [per solve segment sing*G, ovf*G] then X rows (j*G+g)*Ws8
        o = 0
        g_segsing = np.zeros((G, S), dtype=bool)
        g_segovf = np.zeros((G, S), dtype=bool)
        for s in range(S):
            g_segsing[:, s] = flat[o:o + G] != 0
            g_segovf[:, s] = flat[o + G:o + 2 * G] != 0
            o += 2 * G
        dets = flat[o:o + G * W8].reshape(G, W8)
        o += G * W8
        Xs = [[] for _ in range(G)]
        g_sovf = np.zeros(G, dtype=bool)
        for c in range(nrhs):
            g_sovf |= flat[o + G:o + 2 * G] != 0
            o += 2 * G
            xcol = flat[o:o + n * G * Ws8].reshape(n, G, Ws8)
            o += n * G * Ws8
            for g in range(G):
                Xs[g].append(xcol[:, g, :])
        g_sing = g_segsing.any(axis=1)
        g_ovf = [list(g_segovf[g]) for g in range(G)]
        f_ovf = bool(g_segovf.any())
        s_ovf = bool(g_sovf.any())
        sing = bool(g_sing.any())

        def _member_sing_clean(g):
            # a member's sing is genuine iff no overflow hit the same
            # or any earlier segment of THAT member (same rule as the
            # single-matrix driver)
            if not g_sing[g]:
                return True
            fs = int(np.argmax(g_segsing[g]))
            return not any(g_ovf[g][:fs + 1])

        sing_clean = sing and all(_member_sing_clean(g)
                                  for g in range(G))
        if sing and sing_clean:
            break                   # genuine cancellation (see the
            #                         single-matrix driver's flag-trust
            #                         comment: sing + overflow must
            #                         climb, 2-adically deep pivots
            #                         fake zero residues for many rungs)
        if f_ovf or s_ovf:
            first_bad = min((so.index(True) for so in g_ovf if any(so)),
                            default=None)
            if first_bad is not None and segplan[first_bad][2] < W8:
                segplan[first_bad][2] = min(2 * segplan[first_bad][2],
                                            W8)
                for s in range(first_bad + 1, S):
                    segplan[s][2] = max(segplan[s][2],
                                        segplan[first_bad][2])
                st.retries += 1
                continue
            W2, Ws2 = W, Ws
            if f_ovf:
                W2 = min(2 * W, W_full)
            else:
                Ws2 = min(2 * Ws, Ws_full)
            Ws2 = max(Ws2, W2 + 1)
            if (W2, Ws2) == (W, Ws):
                if sing:
                    break
                raise SlipLimbOverflowError(
                    "overflow persists at the analytic width bound "
                    f"(W={W}, Ws={Ws}) — internal invariant violated")
            if W2 != W:
                segplan = None
            W, Ws = W2, Ws2
            st.retries += 1
            continue
        if options.max_limbs is None:
            analysis.fused_many_width_cache = ((key, G), W, Ws)
            analysis.fused_many_seg_cache = ((key, G, W, Ws), segments)
        break

    xs = []
    with phase_timer(st, "unpack"):
        for g in range(G):
            # a member is unpackable only if NOTHING flagged on it in
            # the final iteration (a sing-triggered break can leave
            # other members mid-ladder with overflow garbage)
            if g_sing[g] or any(g_ovf[g]) or g_sovf[g]:
                xs.append(None)     # individual fallback below
                continue
            det = tc_rows_to_ints(dets[g:g + 1])[0]
            x = SlipMatrix.allocate(Kind.DENSE, Type.MPQ, n, nrhs)
            factor = As[g].scale / bzs[g].scale
            fnum, fden = factor.numerator, factor.denominator
            den_all = det * fden
            for c in range(nrhs):
                xh = tc_rows_to_ints(Xs[g][c])
                for k in range(n):
                    x.x[int(q[k]), c] = _mpq(xh[k] * fnum, den_all)
            xs.append(x)
    record(st)
    if plan == 0 and any(x is None for x in xs) and fr is None:
        # exact cancellation on the shared transversal schedule:
        # replan the WHOLE family around one singing member's oracle
        # pivot rows (the reference's dynamic pivot search, done once
        # on host — slip_get_pivot.c analogue), exactly like the
        # single-matrix driver's plan 1. Warm family solves then hit
        # the pinned schedule directly via analysis.sparse_fixed_r.
        from ..errors import SlipSingularError
        from ..factorize import factorize
        g0 = next(g for g in range(G) if xs[g] is None)
        try:
            with phase_timer(st, "replan"):
                F = factorize(As[g0], analysis, options)
            analysis.sparse_fixed_r = np.asarray(F.row_perm,
                                                 dtype=np.int64)
            return _fused_many_group(As, analysis, bzs, bs, options,
                                     heads_per_chunk, pass1_events,
                                     pass2_events, nrhs, plan=1)
        except SlipSingularError:
            pass                    # truly singular member: fall back
    for g in range(G):
        if xs[g] is None:
            # this member's values cancel even on the pinned rows (or
            # it is genuinely singular): the single-matrix driver
            # replans around ITS OWN oracle pivots / raises
            from ..analyze import analyze
            ana_g = analyze(As[g], options)
            xs[g] = factorize_solve_tpu_fused(
                As[g], ana_g, bs[g], options, heads_per_chunk,
                pass1_events, pass2_events)
    return xs
