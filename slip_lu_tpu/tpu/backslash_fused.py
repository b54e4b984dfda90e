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
from .factor_fused import (fused_solve_all, ints_to_tc_rows,
                           tc_rows_to_ints, val_table_in_hbm,
                           _r8, _r128)
from .schedule import _permute_cols
from .schedule_native import build_schedule_best
from .schedule_stream import build_event_stream


def _stream_arrays(es):
    f, s = es.factor, es.solve
    return (
        jnp.asarray(f.h_step), jnp.asarray(f.h_slot),
        jnp.asarray(f.h_div), jnp.asarray(f.counts),
        jnp.asarray(f.ev1), jnp.asarray(f.ev2),
        jnp.asarray(s.counts), jnp.asarray(s.ev1), jnp.asarray(s.ev2),
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
    fixed_r = analysis.sparse_fixed_r   # cached repair from earlier solves

    for plan in range(2):
        # plan 0: transversal-diagonal pivots; plan 1 (cancellation
        # repair): pin the host oracle's pivot rows — guaranteed nonzero
        with phase_timer(st, "schedule"):
            cache = getattr(analysis, "fused_cache", None)
            key = (heads_per_chunk, pass1_events, pass2_events,
                   None if fixed_r is None else fixed_r.tobytes())
            if cache is not None and cache[0] == key:
                sched, r, es, dev_streams, avals = cache[1]
            else:
                sched, r = build_schedule_best(A, q, fixed_r)
                es = build_event_stream(sched, heads_per_chunk,
                                        pass1_events, pass2_events)
                dev_streams = _stream_arrays(es)
                Aq = _permute_cols(A, q)
                avals = [int(Aq.x[idx]) for c in range(n)
                         for idx in range(int(Aq.p[c]), int(Aq.p[c + 1]))]
                analysis.fused_cache = (key, (sched, r, es, dev_streams,
                                              avals))
        st.lnz, st.unz = es.lnz, es.unz
        (h_step, h_slot, h_div, fcnt, fev1, fev2,
         scnt, sev1, sev2) = dev_streams
        E = es.nnz

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

        sing = False
        sing_streak = 0
        while True:
            W8 = _r8(W)
            Ws8 = _r8(max(Ws, W + 1))
            WN = _r8(2 * W8 + 2)
            WNS = _r8(W8 + Ws8 + 2)
            WI8 = max(WN, WNS)
            st.W, st.Ws = W8, Ws8
            with phase_timer(st, "pack"):
                # A's limb table is per-(schedule, W): upload once, reuse
                # the device buffer across solves (fused_solve_all never
                # donates its val argument)
                E8 = _r8(E + 1)
                # HBM mode: each slot stored as KR 128-lane rows (the
                # DMA slice granularity; see factor_fused docstring)
                hbm_mode = val_table_in_hbm(E8, W8)
                WV = _r128(W8) if hbm_mode else W8
                vkey = (key, W8)
                vcache = getattr(analysis, "fused_val_cache", None)
                if vcache is not None and vcache[0] == vkey:
                    val_dev = vcache[1]
                else:
                    val_in = np.zeros((E8, WV), dtype=np.int32)
                    val_in[np.asarray(es.init_pos), :W8] = ints_to_tc_rows(
                        avals, W8)
                    if hbm_mode:
                        val_in = val_in.reshape(E8 * (WV // 128), 128)
                    val_dev = jnp.asarray(val_in)
                    analysis.fused_val_cache = (vkey, val_dev)
                bcols = [[int(bz.x[int(r[k]), c]) for k in range(n)]
                         for c in range(nrhs)]
                Wb = _tc_width((v for col in bcols for v in col), Ws8)
                b_rows = np.stack([ints_to_tc_rows(col, Wb)
                                   for col in bcols])
            with phase_timer(st, "device"):
                # ONE dispatch, ONE fetch (the tunnel pays a fixed
                # ~45 ms per host sync, so never go piecemeal)
                flat = np.asarray(jax.device_get(fused_solve_all(
                    n, E, W8, Ws8, WN, WNS, WI8, heads_per_chunk,
                    pass1_events, pass2_events,
                    h_step, h_slot, h_div, fcnt, fev1, fev2,
                    scnt, sev1, sev2, val_dev, jnp.asarray(b_rows),
                    hbm=hbm_mode)))
            o = 0
            fflags_h = flat[o:o + 2]; o += 2
            det_row = flat[o:o + W8][None, :]; o += W8
            X_h, sflags_h = [], []
            for c in range(nrhs):
                sflags_h.append(flat[o:o + 2]); o += 2
                X_h.append(flat[o:o + n * Ws8].reshape(n, Ws8))
                o += n * Ws8
            sing = bool(fflags_h[0])
            f_ovf = bool(fflags_h[1])
            s_ovf = any(bool(f[1]) for f in sflags_h)
            # Flag trust order (each can fake the other): with NO factor
            # overflow, all arithmetic up to a zero pivot was exact, so
            # sing is genuine -> replan. With factor overflow below the
            # analytic bound, sing may be a truncation artifact (a
            # wrapped pivot with 16W zero low bits) -> widen and
            # re-look ONCE: doubling the width destroys any truncation
            # fake, so a sing that survives two rungs is a genuine
            # cancellation whose downstream garbage keeps faking ovf —
            # replan rather than climb to the (possibly huge) bound.
            sing_streak = sing_streak + 1 if sing else 0
            if sing and (not f_ovf or sing_streak >= 2):
                break                       # genuine cancellation
            if f_ovf or s_ovf:
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
                W, Ws = W2, Ws2
                st.retries += 1
                continue
            if options.max_limbs is None:
                analysis.fused_width_cache = (W, Ws)
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
    # both plans singular-flagged (cannot happen with a pinned oracle
    # sequence unless something deeper is wrong) — last resort: the
    # dense full-pivoting kernel, which searches pivots dynamically
    st.fallback = True
    record(st)
    from .backslash_tpu import factorize_solve_tpu
    return factorize_solve_tpu(A, analysis, b, options)
