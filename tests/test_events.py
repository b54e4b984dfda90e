"""Event-chunked sparse path: parity with the host oracle and the
padded kernel, across chunk sizes (SURVEY §7 hard part 2 mitigation)."""

import numpy as np
import pytest

from slip_lu_tpu.analyze import analyze
from slip_lu_tpu.backslash import backslash
from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.matrix import Kind, SlipMatrix, Type
from slip_lu_tpu.options import Options
from slip_lu_tpu.tpu.backslash_sparse import factorize_solve_tpu_events
from slip_lu_tpu.tpu.schedule import build_schedule
from slip_lu_tpu.tpu.schedule_events import build_event_schedule

from conftest import random_sparse_int


def _system(n, nrhs=1, density=0.3, seed=0):
    rng = np.random.default_rng(seed)
    A = matrix_copy(random_sparse_int(n, density=density, rng=rng),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-5, 6)) for _ in range(nrhs)]
                  for _ in range(n)], dtype=object), Type.MPZ)
    return A, b


@pytest.mark.parametrize("n,chunk,seed", [
    (7, 4, 1), (15, 16, 2), (24, 256, 3),
])
def test_events_match_oracle(n, chunk, seed):
    A, b = _system(n, seed=seed)
    opts = Options()
    x_host = backslash(A, b, Type.MPQ, opts)
    x_ev = factorize_solve_tpu_events(A, analyze(A, opts), b, opts,
                                      chunk=chunk)
    for i in range(n):
        assert x_ev.x[i, 0] == x_host.x[i, 0], i


def test_events_multirhs():
    A, b = _system(11, nrhs=3, seed=5)
    opts = Options()
    x_host = backslash(A, b, Type.MPQ, opts)
    x_ev = factorize_solve_tpu_events(A, analyze(A, opts), b, opts,
                                      chunk=8)
    for i in range(11):
        for c in range(3):
            assert x_ev.x[i, c] == x_host.x[i, c]


def test_event_stream_counts():
    A, _ = _system(14, seed=9)
    sched, _ = build_schedule(A, analyze(A, Options()).q)
    es = build_event_schedule(sched, chunk=8)
    # exactly one head per step in the factor stream
    assert int((es.f_kind == 0).sum()) == sched.n
    # total real update events == total tile entries
    real = 0
    for t in range(es.f_ev.shape[0]):
        if es.f_kind[t] == 2:
            real += int((es.f_ev[t, :, 0] < sched.nnz).sum())
    tiles = int((sched.tile_pos < sched.nnz).sum())
    assert real == tiles


def test_events_cancellation_falls_back():
    dense = np.array([[1, 1, 0], [1, 1, 1], [0, 1, 1]], dtype=object)
    A = matrix_copy(SlipMatrix.from_dense(dense, Type.MPZ),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(np.array([[1], [2], [3]], dtype=object),
                              Type.MPZ)
    from slip_lu_tpu.options import Ordering
    opts = Options(order=Ordering.NONE)
    x = factorize_solve_tpu_events(A, analyze(A, opts), b, opts, chunk=4)
    x_host = backslash(A, b, Type.MPQ, opts)
    for i in range(3):
        assert x.x[i, 0] == x_host.x[i, 0]
