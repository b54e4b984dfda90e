"""Pallas kernel path (interpret mode on CPU) vs the XLA path and ints.

SLIP_PALLAS=1 forces the fused conv+carry kernel even off-TPU; bit
parity with Python ints and with the default path is the contract.
"""

import os
import random

import numpy as np
import pytest

import jax.numpy as jnp

from slip_lu_tpu.ops import matarith as mt
from slip_lu_tpu.ops import pallas_kernels as pk
from slip_lu_tpu.ops.limbs import ints_to_limbs, limbs_to_ints


@pytest.fixture
def force_pallas(monkeypatch):
    monkeypatch.setenv("SLIP_PALLAS", "1")
    assert pk.use_pallas()
    yield
    monkeypatch.setenv("SLIP_PALLAS", "0")


def test_reduction_passes_bound():
    assert pk._reduction_passes(256) == 1
    # worst case for 512-digit convs stays small and static
    assert pk._reduction_passes(512 * 255 * 255) <= 4


def test_mul_shared_pallas_exact(force_pallas):
    random.seed(3)
    W = 7
    vals = [random.randint(-2**100, 2**100) for _ in range(300)]
    shared = 0xDEADBEEFCAFEBABE1234567
    sa, ma = ints_to_limbs(vals, W)
    ss, ms = ints_to_limbs([shared], W)
    s, m, o = mt.signed_mul_shared(jnp.asarray(sa), jnp.asarray(ma),
                                   jnp.asarray(ss)[0], jnp.asarray(ms)[0],
                                   2 * W + 1)
    assert not np.asarray(o).any()
    got = limbs_to_ints(np.asarray(s), np.asarray(m))
    for g, v in zip(got, vals):
        assert int(g) == v * shared


def test_mul_shared_pallas_matches_xla(force_pallas, monkeypatch):
    random.seed(4)
    W = 5
    vals = [random.randint(0, 2**70) for _ in range(37)]
    _, ma = ints_to_limbs(vals, W)
    _, ms = ints_to_limbs([987654321987654321], W)
    m_p, o_p = mt.mul_shared(jnp.asarray(ma), jnp.asarray(ms)[0], 2 * W)
    monkeypatch.setenv("SLIP_PALLAS", "0")
    m_x, o_x = mt.mul_shared(jnp.asarray(ma), jnp.asarray(ms)[0], 2 * W)
    assert np.array_equal(np.asarray(m_p), np.asarray(m_x))
    assert np.array_equal(np.asarray(o_p), np.asarray(o_x))


def test_divexact_hensel_via_pallas(force_pallas):
    random.seed(5)
    W = 6
    d = 123456789012345 * 2**7
    vals = [random.randint(0, 2**80) for _ in range(64)]
    prods = [v * d for v in vals]
    Wn = 2 * W + 1
    _, mn = ints_to_limbs(prods, Wn + 1)
    _, md = ints_to_limbs([d], W)
    inv, tz = mt.div_precompute_hensel(jnp.asarray(md)[0], Wn + 1)
    q, bad = mt.divexact_shared(jnp.asarray(mn), inv, tz, W)
    assert not np.asarray(bad).any()
    got = limbs_to_ints(np.ones(64, np.int32), np.asarray(q))
    for g, v in zip(got, vals):
        assert int(g) == v


def test_full_solve_via_pallas(force_pallas):
    # the dense device path end-to-end with the kernel forced on
    from conftest import random_sparse_int

    from slip_lu_tpu.analyze import analyze
    from slip_lu_tpu.backslash import backslash
    from slip_lu_tpu.convert import matrix_copy
    from slip_lu_tpu.matrix import Kind, SlipMatrix, Type
    from slip_lu_tpu.options import Options
    from slip_lu_tpu.tpu.backslash_tpu import factorize_solve_tpu
    rng = np.random.default_rng(11)
    A = matrix_copy(random_sparse_int(9, density=0.4, rng=rng),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-5, 6))] for _ in range(9)],
                 dtype=object), Type.MPZ)
    opts = Options()
    x_host = backslash(A, b, Type.MPQ, opts)
    x_dev = factorize_solve_tpu(A, analyze(A, opts), b, opts)
    for i in range(9):
        assert x_host.x[i, 0] == x_dev.x[i, 0]


def test_worst_case_ripple_carry(force_pallas):
    # product engineered so normalization must ripple a carry far:
    # (2^16k - 1) * 1 + 1-style patterns via (2^(16k) - 1) * (2^16 + 1)
    W = 8
    v = (1 << (16 * 6)) - 1
    shared = (1 << 16) + 1
    _, ma = ints_to_limbs([v] * 16, W)
    _, ms = ints_to_limbs([shared], 2)
    m, o = mt.mul_shared(jnp.asarray(ma), jnp.asarray(ms)[0], W + 2)
    got = limbs_to_ints(np.ones(16, np.int32), np.asarray(m))
    for g in got:
        assert int(g) == v * shared
