"""Event-chunked schedule emission (scales to general fill patterns).

The per-step padded schedule (tpu/schedule.py) costs
O(n * max_k |Rk| * max_k |Ck|) memory — catastrophic padding when a few
late steps have dense-ish tiles. This emitter flattens the same
computation into fixed-size *chunks* of events tagged by kind, so memory
and device work are O(total events) = O(IPGE operation count):

  kind 0 (STEP HEAD): a fix chunk whose position 0 is the diagonal —
          after fixing, rho_k is extracted, its Hensel inverse built,
          and the rho tables advance. Exactly one per step.
  kind 1 (FIX):  overflow fix chunks (slot, hist) — history-fix further
          L-column and U-row slots to level k-1 (their final values).
  kind 2 (UPDATE): events (target_slot, hist, Lslot, Uslot) — the IPGE
          tile update; operand slots point at the (already fixed) pivot
          column/row entries, so operands are *gathered pairs* instead
          of an outer product.

Within a step the order is head -> fix chunks -> update chunks; chunks
never span steps (the tail chunk of each phase is padded with dummy
events). The kernel (factor_sparse_events.py) scans the chunk stream
with a 3-way branch.

Forward/back substitution use their own event streams with the same
chunking (fwd: (xrow, hist, Lslot) updates after an x[k] head; bwd:
(xrow, Uslot) updates after an x[j] /= rho_j head).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from ..matrix import SlipMatrix
from .schedule import SparseSchedule


@dataclasses.dataclass
class EventSchedule:
    """Chunked event streams for one factorization + substitution."""
    n: int
    nnz: int                     # value slots (E); slot E = dummy
    chunk: int                   # events per chunk
    init_pos: np.ndarray         # [nnz(A)] slot of each original A entry
    row_of: np.ndarray           # [E+1] row of each slot (dummy -> n)
    # factorization stream: [nchunks] kind + step, [nchunks, chunk, 4]
    # event fields (slot|xrow, hist, Lslot, Uslot); dummies point at E/n
    f_kind: np.ndarray
    f_step: np.ndarray
    f_ev: np.ndarray
    # substitution streams (forward shares the factor steps; emitted
    # separately so the kernel can also run solve-only)
    s_kind: np.ndarray           # 0 = x[k] head, 2 = fwd update
    s_step: np.ndarray
    s_ev: np.ndarray             # (xrow, hist, Lslot, -)
    b_kind: np.ndarray           # 0 = x[j]/rho_j head, 2 = bwd update
    b_step: np.ndarray           # stores j
    b_ev: np.ndarray             # (xrow, -, Uslot, -)
    lnz: int
    unz: int


def build_event_schedule(sched: SparseSchedule, chunk: int = 256
                         ) -> EventSchedule:
    """Flatten a padded SparseSchedule into chunked event streams.

    Reuses the proven symbolic elimination (slot numbering, histories)
    and only re-encodes its shape; bit-identical computation by
    construction.
    """
    n, E = sched.n, sched.nnz

    def pad_events(evs: List[Tuple[int, int, int, int]], dummy):
        while len(evs) % chunk:
            evs.append(dummy)
        return evs

    f_kind: List[int] = []
    f_step: List[int] = []
    f_ev: List[List[Tuple[int, int, int, int]]] = []

    def emit(kind, step, evs):
        for t in range(0, len(evs), chunk):
            f_kind.append(kind)
            f_step.append(step)
            f_ev.append(evs[t:t + chunk])

    dummy_fix = (E, 0, E, E)
    s_kind: List[int] = []
    s_step: List[int] = []
    s_ev: List[List[Tuple[int, int, int, int]]] = []

    def emit_s(kind, step, evs):
        for t in range(0, len(evs), chunk):
            s_kind.append(kind)
            s_step.append(step)
            s_ev.append(evs[t:t + chunk])

    dummy_x = (n, 0, E, E)

    for k in range(n):
        # fixes: the diagonal rides position 0 of the first fix chunk,
        # which doubles as the step head (kind 0) — no dedicated
        # near-empty head chunk per step
        fixes = [(int(sched.diag_pos[k]), int(sched.diag_hist[k]), E, E)]
        for b2 in range(sched.cmax):
            g = int(sched.row_pos[k, b2])
            if g < E:
                fixes.append((g, int(sched.row_hist[k, b2]), E, E))
        for a in range(sched.rmax):
            g = int(sched.col_pos[k, a])
            if g < E:
                fixes.append((g, int(sched.col_hist[k, a]), E, E))
        fixes = pad_events(fixes, dummy_fix)
        emit(0, k, fixes[:chunk])
        if len(fixes) > chunk:
            emit(1, k, fixes[chunk:])
        # updates: (target, hist, Lslot, Uslot)
        ups = []
        for a in range(sched.rmax):
            gl = int(sched.col_pos[k, a])
            if gl >= E:
                continue
            for b2 in range(sched.cmax):
                gu = int(sched.row_pos[k, b2])
                gt = int(sched.tile_pos[k, a, b2])
                if gu >= E or gt >= E:
                    continue
                ups.append((gt, int(sched.tile_hist[k, a, b2]), gl, gu))
        if ups:
            emit(2, k, pad_events(ups, dummy_fix))
        # forward substitution stream for step k
        emit_s(0, k, pad_events([(k, int(sched.fwd_xk_hist[k]), E, E)],
                                dummy_x))
        fwd = []
        for a in range(sched.rmax):
            gl = int(sched.col_pos[k, a])
            if gl >= E:
                continue
            fwd.append((int(sched.row_of[gl]), int(sched.fwd_hist[k, a]),
                        gl, E))
        if fwd:
            emit_s(2, k, pad_events(fwd, dummy_x))

    # back substitution stream (descending j)
    b_kind: List[int] = []
    b_step: List[int] = []
    b_ev: List[List[Tuple[int, int, int, int]]] = []

    def emit_b(kind, step, evs):
        for t in range(0, len(evs), chunk):
            b_kind.append(kind)
            b_step.append(step)
            b_ev.append(evs[t:t + chunk])

    for j in range(n - 1, -1, -1):
        emit_b(0, j, pad_events([(j, 0, E, E)], dummy_x))
        ups = []
        for a in range(sched.umax):
            g = int(sched.bwd_pos[j, a])
            if g < E:
                ups.append((int(sched.bwd_row[j, a]), 0, g, E))
        if ups:
            emit_b(2, j, pad_events(ups, dummy_x))

    row_of = np.concatenate([sched.row_of,
                             [np.int32(n)]]).astype(np.int32)
    return EventSchedule(
        n=n, nnz=E, chunk=chunk, init_pos=sched.init_pos, row_of=row_of,
        f_kind=np.asarray(f_kind, np.int32),
        f_step=np.asarray(f_step, np.int32),
        f_ev=np.asarray(f_ev, np.int32),
        s_kind=np.asarray(s_kind, np.int32),
        s_step=np.asarray(s_step, np.int32),
        s_ev=np.asarray(s_ev, np.int32),
        b_kind=np.asarray(b_kind, np.int32),
        b_step=np.asarray(b_step, np.int32),
        b_ev=np.asarray(b_ev, np.int32),
        lnz=sched.lnz, unz=sched.unz)
