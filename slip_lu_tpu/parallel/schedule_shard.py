"""Split a static sparse schedule across a device mesh (host side).

Multi-chip version of the scheduled sparse path (BASELINE config 4, the
sparse analogue of factor_shard.py): rows of the permuted matrix are
distributed *cyclically* over the mesh axis (row i -> chip i mod p) so
early and late elimination steps spread evenly; every value slot lives
with its row. Per step k:

  * chip k mod p owns the pivot row and diagonal — it history-fixes them
    and the kernel broadcasts the fixed values (masked integer psum);
  * each chip owns the slice of the pivot column and the update tile
    that falls on its rows — those fixes and the IPGE update are local;
  * the inverse/rho tables are replicated (identical on every chip).

This module does the bookkeeping: local slot numbering per chip and the
per-chip padded schedule arrays, stacked on a leading mesh axis so
shard_map can partition them directly. All slot references in the
emitted arrays are LOCAL indices into that chip's value array; pads
point at the chip's dummy slot.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..tpu.schedule import SparseSchedule


@dataclasses.dataclass
class ShardedSchedule:
    """Per-chip schedule stack; leading axis = mesh position."""
    p: int
    n: int
    e_loc: int                   # local value slots per chip (padded max)
    nloc: int                    # local RHS rows per chip (padded max)
    rmax_l: int                  # local pivot-column rows per step (max)
    cmax: int                    # pivot-row width (global, broadcast)
    umax_l: int                  # local back-sub updates per step (max)
    slot_chip: np.ndarray        # [E] owning chip of each global slot
    slot_local: np.ndarray       # [E] local index of each global slot
    # stacked per-chip arrays (leading axis p)
    col_pos: np.ndarray          # [p, n, rmax_l] local slots of (i,k)
    col_hist: np.ndarray
    tile_pos: np.ndarray         # [p, n, rmax_l, cmax]
    tile_hist: np.ndarray
    row_pos: np.ndarray          # [p, n, cmax] owner's local slots of (k,j)
    row_hist: np.ndarray
    row_valid: np.ndarray        # [p, n, cmax] 1 where a real U slot
    diag_pos: np.ndarray         # [p, n]
    diag_hist: np.ndarray
    fwd_rows: np.ndarray         # [p, n, rmax_l] local RHS row per col slot
    fwd_hist: np.ndarray
    fwd_xk_hist: np.ndarray      # [n] (replicated)
    bwd_pos: np.ndarray          # [p, n, umax_l]
    bwd_row: np.ndarray          # [p, n, umax_l] local RHS row targets
    row_owner_row: np.ndarray    # [n] local RHS row index of global row k


def shard_schedule(s: SparseSchedule, p: int) -> ShardedSchedule:
    n, E = s.n, s.nnz
    chip_of_row = lambda i: i % p
    row_loc = lambda i: i // p
    # local slot numbering per chip, in global slot order
    slot_chip = np.array([chip_of_row(int(r)) for r in s.row_of],
                         dtype=np.int32)
    slot_local = np.zeros(E, dtype=np.int32)
    counts = np.zeros(p, dtype=np.int64)
    for t in range(E):
        c = slot_chip[t]
        slot_local[t] = counts[c]
        counts[c] += 1
    e_loc = int(counts.max()) if p else 0
    nloc = (n + p - 1) // p

    def loc_of(gslot: int) -> tuple:
        """(chip, local slot) of a global slot; pads handled by caller."""
        return int(slot_chip[gslot]), int(slot_local[gslot])

    # --- factorization schedules -----------------------------------------
    col_lists = [[[] for _ in range(n)] for _ in range(p)]   # (loc, hist)
    tile_lists = [[[] for _ in range(n)] for _ in range(p)]  # rows of tiles
    fwd_lists = [[[] for _ in range(n)] for _ in range(p)]   # (locrow, hist)
    for k in range(n):
        for a in range(s.rmax):
            g = int(s.col_pos[k, a])
            if g >= E:
                continue
            c, l = loc_of(g)
            col_lists[c][k].append((l, int(s.col_hist[k, a])))
            trow = []
            for b2 in range(s.cmax):
                gt = int(s.tile_pos[k, a, b2])
                if gt >= E:
                    trow.append((None, 0))
                else:
                    ct, lt = loc_of(gt)
                    assert ct == c, "tile slot must live with its row"
                    trow.append((lt, int(s.tile_hist[k, a, b2])))
            tile_lists[c][k].append(trow)
            i_glob = int(s.row_of[g])
            fwd_lists[c][k].append((row_loc(i_glob),
                                    int(s.fwd_hist[k, a])))
    rmax_l = max(1, max(len(col_lists[c][k])
                        for c in range(p) for k in range(n)))

    col_pos = np.full((p, n, rmax_l), e_loc, dtype=np.int32)
    col_hist = np.zeros((p, n, rmax_l), dtype=np.int32)
    tile_pos = np.full((p, n, rmax_l, s.cmax), e_loc, dtype=np.int32)
    tile_hist = np.zeros((p, n, rmax_l, s.cmax), dtype=np.int32)
    fwd_rows = np.full((p, n, rmax_l), nloc, dtype=np.int32)
    fwd_hist = np.zeros((p, n, rmax_l), dtype=np.int32)
    for c in range(p):
        for k in range(n):
            for a, (l, h) in enumerate(col_lists[c][k]):
                col_pos[c, k, a] = l
                col_hist[c, k, a] = h
            for a, trow in enumerate(tile_lists[c][k]):
                for b2, (lt, ht) in enumerate(trow):
                    if lt is not None:
                        tile_pos[c, k, a, b2] = lt
                        tile_hist[c, k, a, b2] = ht
            for a, (lr, h) in enumerate(fwd_lists[c][k]):
                fwd_rows[c, k, a] = lr
                fwd_hist[c, k, a] = h

    # pivot row / diagonal: owner chip only
    row_pos = np.full((p, n, s.cmax), e_loc, dtype=np.int32)
    row_hist = np.zeros((p, n, s.cmax), dtype=np.int32)
    row_valid = np.zeros((p, n, s.cmax), dtype=np.int32)
    diag_pos = np.full((p, n), e_loc, dtype=np.int32)
    diag_hist = np.zeros((p, n), dtype=np.int32)
    for k in range(n):
        c = chip_of_row(k)
        gd = int(s.diag_pos[k])
        diag_pos[c, k] = slot_local[gd]
        diag_hist[c, k] = int(s.diag_hist[k])
        for b2 in range(s.cmax):
            g = int(s.row_pos[k, b2])
            if g >= E:
                continue
            row_pos[c, k, b2] = slot_local[g]
            row_hist[c, k, b2] = int(s.row_hist[k, b2])
            row_valid[c, k, b2] = 1

    # back substitution: updates target RHS row i (local on chip(i)),
    # reading U slot (i, j) which lives with row i — fully local
    bwd_lists = [[[] for _ in range(n)] for _ in range(p)]
    for j in range(n):
        for a in range(s.umax):
            g = int(s.bwd_pos[j, a])
            if g >= E:
                continue
            i_glob = int(s.bwd_row[j, a])
            c = chip_of_row(i_glob)
            bwd_lists[c][j].append((int(slot_local[g]), row_loc(i_glob)))
    umax_l = max(1, max(len(bwd_lists[c][j])
                        for c in range(p) for j in range(n)))
    bwd_pos = np.full((p, n, umax_l), e_loc, dtype=np.int32)
    bwd_row = np.full((p, n, umax_l), nloc, dtype=np.int32)
    for c in range(p):
        for j in range(n):
            for a, (l, lr) in enumerate(bwd_lists[c][j]):
                bwd_pos[c, j, a] = l
                bwd_row[c, j, a] = lr

    row_owner_row = np.array([row_loc(k) for k in range(n)], dtype=np.int32)

    return ShardedSchedule(
        p=p, n=n, e_loc=e_loc, nloc=nloc, rmax_l=rmax_l, cmax=s.cmax,
        umax_l=umax_l, slot_chip=slot_chip, slot_local=slot_local,
        col_pos=col_pos, col_hist=col_hist, tile_pos=tile_pos,
        tile_hist=tile_hist, row_pos=row_pos, row_hist=row_hist,
        row_valid=row_valid, diag_pos=diag_pos, diag_hist=diag_hist,
        fwd_rows=fwd_rows, fwd_hist=fwd_hist, fwd_xk_hist=s.fwd_xk_hist,
        bwd_pos=bwd_pos, bwd_row=bwd_row, row_owner_row=row_owner_row)
