"""Host glue for the fused (Pallas mega-kernel) sparse path.

Pipeline, mirroring backslash_sparse.py but with two device dispatches
per solve (factor stream, solve stream) instead of ~10 XLA ops per
elimination step:

  1. ordering q + transversal r, symbolic elimination (schedule.py),
     uniform-event chunk streams (schedule_stream.py) — all reusable
     per matrix;
  2. pack A's values as two's-complement limb rows, upload once;
  3. factor_fused -> val/SMT/GT/TZ stay on device; solve_fused replays
     fwd + det + bwd against them;
  4. ONE device->host fetch (X, det row, flags ride separate small
     arrays but are fetched together via jax.device_get's single call);
  5. widen-and-retry on overflow, replan/fallback on cancellation,
     exactly like the padded path.

Reference parity anchor: same as backslash_sparse.py (the oracle's
DIAGONAL pivots on B = A[r][:, q]).
"""

from __future__ import annotations

from fractions import Fraction
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
from .bounds import factor_width, solve_width, widen_widths
from .factor_fused import (factor_fused, ints_to_tc_rows, solve_fused,
                           tc_rows_to_ints, _r8)
from .schedule import _permute_cols
from .schedule_native import build_schedule_best
from .schedule_stream import build_event_stream


def _stream_arrays(es):
    f, s = es.factor, es.solve
    return (
        jnp.asarray(f.h_step), jnp.asarray(f.h_slot),
        jnp.asarray(f.h_div), jnp.asarray(f.ev1), jnp.asarray(f.ev2),
        jnp.asarray(s.ev1), jnp.asarray(s.ev2),
    )


def factorize_solve_tpu_fused(A: SlipMatrix, analysis: Analysis,
                              b: SlipMatrix,
                              options: Optional[Options] = None,
                              heads_per_chunk: int = 8,
                              pass1_events: int = 32,
                              pass2_events: int = 128) -> SlipMatrix:
    """Exact solve via the fused Pallas sparse path."""
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
    q = np.asarray(analysis.q, dtype=np.int64)

    with phase_timer(st, "schedule"):
        cache = getattr(analysis, "fused_cache", None)
        fixed_r = analysis.sparse_fixed_r
        key = (heads_per_chunk, pass1_events, pass2_events,
               None if fixed_r is None else fixed_r.tobytes())
        if cache is not None and cache[0] == key:
            sched, r, es, dev_streams = cache[1]
        else:
            sched, r = build_schedule_best(A, q, fixed_r)
            es = build_event_stream(sched, heads_per_chunk,
                                    pass1_events, pass2_events)
            dev_streams = _stream_arrays(es)
            analysis.fused_cache = (key, (sched, r, es, dev_streams))
    st.lnz, st.unz = es.lnz, es.unz
    (h_step, h_slot, h_div, fev1, fev2, sev1, sev2) = dev_streams
    E = es.nnz

    Aq = _permute_cols(A, q)
    avals = [int(Aq.x[idx]) for c in range(n)
             for idx in range(int(Aq.p[c]), int(Aq.p[c + 1]))]
    W = factor_width(A, options.max_limbs)
    Ws = solve_width(A, bz.x, W, n, options.max_limbs)
    W_full = factor_width(A)
    Ws_full = solve_width(A, bz.x, W_full, n)

    while True:
        W8 = _r8(W)
        Ws8 = _r8(max(Ws, W + 1))
        WN = _r8(2 * W8 + 2)
        WNS = _r8(W8 + Ws8 + 2)
        WI8 = max(WN, WNS)
        st.W, st.Ws = W8, Ws8
        with phase_timer(st, "pack"):
            val_in = np.zeros((_r8(E + 1), W8), dtype=np.int32)
            val_in[:0] = 0
            rows = ints_to_tc_rows(avals, W8)
            val_in[np.asarray(es.init_pos)] = rows
            xb = np.zeros((_r8(n + 1), Ws8), dtype=np.int32)
            bcol = [int(bz.x[int(r[k]), 0]) for k in range(n)]
            # (multi-RHS handled below by per-column solve dispatches)
        with phase_timer(st, "device"):
            val_d, SMT_d, GT_d, TZ_d, fflags = factor_fused(
                n, E, W8, WN, WI8, heads_per_chunk,
                pass1_events, pass2_events,
                h_step, h_slot, h_div, fev1, fev2, jnp.asarray(val_in))
            parts = [fflags[0, :2], SMT_d[n, :]]
            for c in range(nrhs):
                col = [int(bz.x[int(r[k]), c]) for k in range(n)]
                xarr = np.zeros((_r8(n + 1), Ws8), dtype=np.int32)
                xarr[:n] = ints_to_tc_rows(col, Ws8)
                X_d, sflags = solve_fused(
                    n, E, W8, Ws8, WNS, WI8,
                    pass1_events, pass2_events,
                    sev1, sev2, val_d, SMT_d, GT_d, TZ_d,
                    jnp.asarray(xarr))
                parts.append(sflags[0, :2])
                parts.append(X_d[:n].reshape(-1))
            # ONE flat device buffer -> ONE host fetch (the tunnel pays
            # a large per-buffer latency, so never fetch piecemeal)
            flat = jax.device_get(jnp.concatenate(parts))
        o = 0
        fflags_h = flat[o:o + 2]; o += 2
        det_row = flat[o:o + W8][None, :]; o += W8
        X_h, sflags_h = [], []
        for c in range(nrhs):
            sflags_h.append(flat[o:o + 2]); o += 2
            X_h.append(flat[o:o + n * Ws8].reshape(n, Ws8)); o += n * Ws8
        sing = bool(fflags_h[0])
        ovf = bool(fflags_h[1]) or any(bool(f[1]) for f in sflags_h)
        if ovf and not sing:
            nxt = widen_widths(W, Ws, W_full, Ws_full)
            if nxt is None:
                raise SlipLimbOverflowError(
                    "overflow persists at the analytic width bound "
                    f"(W={W}, Ws={Ws}) — internal invariant violated")
            W, Ws = nxt
            st.retries += 1
            continue
        if sing:
            # exact cancellation of a scheduled pivot: the padded path
            # owns the replanning machinery (pin the oracle's pivots)
            st.fallback = True
            record(st)
            from .backslash_sparse import factorize_solve_tpu_sparse
            return factorize_solve_tpu_sparse(A, analysis, b, options)
        with phase_timer(st, "unpack"):
            det = tc_rows_to_ints(det_row)[0]
            x = SlipMatrix.allocate(Kind.DENSE, Type.MPQ, n, nrhs)
            factor = A.scale / bz.scale
            for c in range(nrhs):
                xh = tc_rows_to_ints(X_h[c][:n])
                for k in range(n):
                    x.x[int(q[k]), c] = Fraction(xh[k], det) * factor
        record(st)
        return x
