"""Uniform-event stream semantics: an exact Python-int replay of the
chunk phases must reproduce the oracle's factorization and solution.

This pins the stream encoding (schedule_stream.py) independently of the
Pallas kernels: the replay gathers every pass's operands BEFORE writing
(exactly the kernel's vectorized semantics), so it also proves the
builder's conflict-cut rules make each pass write-after-read safe.
"""

from fractions import Fraction

import numpy as np
import pytest

from slip_lu_tpu.analyze import analyze
from slip_lu_tpu.backslash import backslash
from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.matrix import Kind, SlipMatrix, Type
from slip_lu_tpu.options import Options
from slip_lu_tpu.tpu.schedule import _permute_cols
from slip_lu_tpu.tpu.schedule_native import build_schedule_best
from slip_lu_tpu.tpu.schedule_stream import build_event_stream

from conftest import random_sparse_int


def _exact_div(a: int, d: int) -> int:
    q, r = divmod(a, d)
    assert r == 0, "stream division not exact"
    return q


def replay_stream(es, avals, b_rows, n):
    """Execute the streams with Python ints, phase-accurate.

    Also handles grouped (subtree-local) streams: chain tables sized to
    es.ndet rows, extra value-slot inits, X clone rows (es.nxx)."""
    E = es.nnz
    val = [0] * (E + 1)
    for v, s in zip(avals, es.init_pos):
        val[int(s)] = int(v)
    if es.extra_pos is not None:
        for s, v in zip(es.extra_pos, es.extra_vals):
            val[int(s)] = int(v)
    R = n if es.ndet is None else es.ndet
    SMT = [0] * (R + 1)
    SMT[0] = 1
    sing = False

    def run_pass(state, events, operand_b):
        # vectorized semantics: gather everything, then write everything
        outs = []
        for (t, m, d, a, bb) in events:
            num = state[t] * SMT[m] - val[a] * operand_b[bb]
            outs.append((t, _exact_div(num, SMT[d])))
        for t, v in outs:
            state[t] = v
        state[-1] = 0                      # dummy row stays zero

    f = es.factor
    for c in range(f.nchunks):
        for t in range(f.h_step.shape[1]):
            k = int(f.h_step[c, t])
            if k < 0:
                continue
            s, d = int(f.h_slot[c, t]), int(f.h_div[c, t])
            # d == k: skip-fix head — the kernel takes the diagonal as
            # the rho without arithmetic (_heads_phase fixm mask)
            rho = val[s] if d == k else _exact_div(val[s] * SMT[k],
                                                   SMT[d])
            if rho == 0:
                sing = True
                rho = 1
            SMT[k + 1] = rho
            val[s] = rho
        for ev in (f.ev1, f.ev2):
            run_pass(val, [tuple(int(x) for x in ev[c, e])
                           for e in range(ev.shape[1])], val)

    X = [list(r) for r in b_rows] \
        + [[0] * len(b_rows[0]) for _ in range(1 + es.nxx)]
    s = es.solve
    for c in range(s.nchunks):
        for evarr in (s.ev1, s.ev2):
            events = [tuple(int(x) for x in evarr[c, e])
                      for e in range(evarr.shape[1])]
            outs = []
            for (t, m, d, a, bb) in events:
                outs.append((t, [
                    _exact_div(X[t][r] * SMT[m] - val[a] * X[bb][r], SMT[d])
                    for r in range(len(X[0]))]))
            for t, v in outs:
                X[t] = v
            X[n] = [0] * len(X[0])
    det = SMT[R]
    return val, X, det, sing


def _system(n, nrhs=1, density=0.3, seed=0):
    rng = np.random.default_rng(seed)
    A = matrix_copy(random_sparse_int(n, density=density, rng=rng),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-9, 10)) for _ in range(nrhs)]
                  for _ in range(n)], dtype=object), Type.MPZ)
    return A, b


@pytest.mark.parametrize("n,H,C,nrhs,seed", [
    (7, 2, 4, 1, 1), (15, 4, 16, 1, 2), (24, 8, 128, 2, 3),
    (40, 8, 64, 1, 4),
])
def test_stream_replay_matches_oracle(n, H, C, nrhs, seed):
    A, b = _system(n, nrhs=nrhs, seed=seed)
    opts = Options()
    ana = analyze(A, opts)
    q = np.asarray(ana.q, np.int64)
    sched, r = build_schedule_best(A, q, None)
    es = build_event_stream(sched, heads_per_chunk=H,
                            pass1_events=max(2, C // 4), pass2_events=C)
    Aq = _permute_cols(A, q)
    avals = [int(Aq.x[idx]) for c in range(n)
             for idx in range(int(Aq.p[c]), int(Aq.p[c + 1]))]
    b_rows = [[int(b.x[int(r[k]), c2]) for c2 in range(nrhs)]
              for k in range(n)]
    val, X, det, sing = replay_stream(es, avals, b_rows, n)
    assert not sing
    x_host = backslash(A, b, Type.MPQ, opts)
    for k in range(n):
        oc = int(q[k])
        for c2 in range(nrhs):
            assert Fraction(X[k][c2], det) == x_host.x[oc, c2], (k, c2)


def test_stream_packs_multiple_steps_per_chunk():
    """Chunk count tracks total work (events/capacity), not 1 per step:
    cuts and padding may at most ~3x the ideal chunk count."""
    A, _ = _system(48, seed=7)
    ana = analyze(A, Options())
    sched, _ = build_schedule_best(A, np.asarray(ana.q, np.int64), None)
    es = build_event_stream(sched, heads_per_chunk=8,
                            pass1_events=32, pass2_events=128)
    f = es.factor
    events = int((f.ev1[:, :, 0] < es.nnz).sum()
                 + (f.ev2[:, :, 0] < es.nnz).sum())
    ideal = -(-events // (32 + 128))
    assert f.nchunks <= 3 * ideal
    assert f.fill > 0.3


def test_stream_heads_pack_on_sparse_patterns():
    """On a banded (low-fill) matrix several steps share one chunk."""
    n = 60
    dense = np.zeros((n, n), dtype=object)
    for i in range(n):
        dense[i, i] = 2 + (i % 5)
        if i + 1 < n:
            dense[i, i + 1] = 1
            dense[i + 1, i] = 1
    A = matrix_copy(SlipMatrix.from_dense(dense, Type.MPZ),
                    Kind.CSC, Type.MPZ)
    ana = analyze(A, Options())
    sched, _ = build_schedule_best(A, np.asarray(ana.q, np.int64), None)
    es = build_event_stream(sched, heads_per_chunk=8,
                            pass1_events=32, pass2_events=128)
    f = es.factor
    assert int((f.h_step >= 0).sum(axis=1).max()) > 1
    # pivot-chain conflicts (step k updates step k+1's diagonal) bound
    # packing at ~1 step/chunk on a tridiagonal; never worse than that
    assert f.nchunks <= n


def test_head_gt_read_never_references_same_chunk_head():
    """Kernel-order invariant: a head's history fix (div != k) reads
    GT[div]/TZ[div], which the batched Hensel lift writes only AFTER all
    heads of the chunk holding head div-1 — so head div-1 must never
    share a chunk with a head whose fix divides by it. (Regression: the
    builder originally allowed this; low-fill banded streams pack many
    heads per chunk and read garbage inverses — found on the uni10k
    corpus member.)"""
    from slip_lu_tpu.io import read_triplet
    from slip_lu_tpu.convert import matrix_copy
    from slip_lu_tpu.matrix import Kind

    cases = [_system(40, seed=4)[0], _system(24, seed=3)[0],
             matrix_copy(read_triplet("data/ExampleMats/tri200_mat.txt"),
                         Kind.CSC, Type.MPZ)]
    for A in cases:
        ana = analyze(A, Options())
        sched, _ = build_schedule_best(A, np.asarray(ana.q, np.int64),
                                       None)
        es = build_event_stream(sched, heads_per_chunk=8,
                                pass1_events=32, pass2_events=128)
        f = es.factor
        for c in range(f.nchunks):
            steps = set()
            for t in range(f.h_step.shape[1]):
                k = int(f.h_step[c, t])
                if k < 0:
                    continue
                d = int(f.h_div[c, t])
                assert d == k or (d - 1) not in steps, (c, t, k, d)
                steps.add(k)


def test_stream_counts_match_events():
    """StreamChunks.counts must equal the number of non-pad entries —
    the kernels bound their gather/scatter loops by these."""
    A, _ = _system(24, seed=3)
    ana = analyze(A, Options())
    sched, _ = build_schedule_best(A, np.asarray(ana.q, np.int64), None)
    es = build_event_stream(sched, heads_per_chunk=8,
                            pass1_events=16, pass2_events=64)
    for sc in (es.factor, es.solve):
        E_dummy = es.nnz if sc is es.factor else es.n
        for c in range(sc.nchunks):
            nh = int((sc.h_step[c] >= 0).sum())
            n1 = int((sc.ev1[c, :, 0] != E_dummy).sum())
            n2 = int((sc.ev2[c, :, 0] != E_dummy).sum())
            assert tuple(sc.counts[c][:3]) == (nh, n1, n2), c
            # non-pad events pack densely from slot 0
            assert (sc.ev1[c, :n1, 0] != E_dummy).all()
            assert (sc.ev2[c, :n2, 0] != E_dummy).all()


def test_etree_parallel_head_packing():
    """Independent elimination-tree branches pack multiple pivot heads
    per chunk (SURVEY §7 hard part 4: recover parallelism from the
    sequential k-loop). A block-diagonal matrix's etree is a forest —
    every block's columns are independent — so the greedy chunk packer
    must put ~heads_per_chunk heads in each chunk, making the device
    scan much shorter than n."""
    rng = np.random.default_rng(17)
    nb, bs_ = 24, 4
    n = nb * bs_
    dense = np.zeros((n, n), dtype=object)
    for b in range(nb):
        o = b * bs_
        for r in range(bs_):
            for c in range(bs_):
                if r == c:
                    # dominant diagonal: every block nonsingular
                    dense[o + r, o + c] = 100 + int(rng.integers(0, 9))
                elif rng.random() < 0.5:
                    dense[o + r, o + c] = int(rng.integers(1, 9))
    A = matrix_copy(SlipMatrix.from_dense(dense, Type.MPZ),
                    Kind.CSC, Type.MPZ)
    from slip_lu_tpu.analyze import etree_interleave
    ana = analyze(A, Options())
    q = etree_interleave(A, np.asarray(ana.q, dtype=np.int64))
    sched, r = build_schedule_best(A, q, None)
    es = build_event_stream(sched)          # heads_per_chunk = 8
    f = es.factor
    heads = int(f.counts[:, 0].sum())
    assert heads == n
    # forest etree: chunks carry several independent heads each
    assert f.nchunks < n // 2, (f.nchunks, n)
    assert heads / f.nchunks > 2.0
    # and the stream still replays to the exact oracle solution
    Aq = _permute_cols(A, q)
    avals = [int(Aq.x[t]) for c in range(n)
             for t in range(int(Aq.p[c]), int(Aq.p[c + 1]))]
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-9, 9))] for _ in range(n)],
                 dtype=object), Type.MPZ)
    b_rows = [[int(b.x[int(r[k]), 0])] for k in range(n)]
    val, X, det, sing = replay_stream(es, avals, b_rows, n)
    assert not sing
    x_host = backslash(A, b, Type.MPQ, Options())
    for k in range(n):
        assert Fraction(X[k][0], det) == x_host.x[int(q[k]), 0]
