"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on XLA's host-platform virtual devices (SURVEY.md section 4,
carry-over (d)). Must set flags before jax imports anywhere.
"""

import os

# NOTE: this machine's sitecustomize forces JAX_PLATFORMS=axon (the tunneled
# TPU); env vars alone cannot override it. jax.config.update after import
# can — and XLA_FLAGS must still be set before backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import random

import numpy as np
import pytest

from slip_lu_tpu.matrix import Kind, SlipMatrix, Type


@pytest.fixture(autouse=True)
def _seed():
    random.seed(12345)
    np.random.seed(12345)


def random_sparse_int(n, density=0.3, lo=-9, hi=9, rng=None, ensure_nonsingular=True):
    """Random integer CSC matrix; unit-ish diagonal guarantees nonsingularity
    is *likely* — callers that must have nonsingular use retry loops."""
    rng = rng or np.random.default_rng(0)
    dense = np.zeros((n, n), dtype=object)
    for r in range(n):
        for c in range(n):
            if rng.random() < density:
                v = int(rng.integers(lo, hi + 1))
                dense[r, c] = v
    if ensure_nonsingular:
        for d in range(n):
            if dense[d, d] == 0:
                dense[d, d] = int(rng.integers(1, hi + 1))
    return SlipMatrix.from_dense(dense, Type.MPZ)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
