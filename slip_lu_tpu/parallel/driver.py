"""Host glue for the multi-chip path: pad -> shard -> factor -> solve.

Mirrors tpu/backslash_tpu.py (reference: SLIP_backslash.c pipeline) but
runs the sharded kernels over a jax.sharding.Mesh. Results are asserted
bit-identical to the host oracle and the single-chip device path across
mesh sizes (tests/test_sharded.py) — the cross-topology parity guarantee
of SURVEY.md §4(d).
"""

from __future__ import annotations

from fractions import Fraction
from typing import Optional

import numpy as np

import jax.numpy as jnp
from jax.sharding import Mesh

from ..analyze import Analysis
from ..convert import csc_to_dense, matrix_copy
from ..errors import (SlipIncorrectInputError, SlipLimbOverflowError,
                      SlipSingularError)
from ..matrix import Kind, SlipMatrix, Type
from ..options import Options
from ..ops.limbs import limbs_to_ints, matrix_to_limbs
from ..tpu.backslash_tpu import _tol_dyadic
from ..tpu.bounds import factor_width, solve_width
from .factor_shard import factor_dense_limbs_sharded
from .shard import pad_to_multiple
from .solve_shard import solve_dense_limbs_sharded

_MAX_RETRIES = 3


def factorize_solve_sharded(A: SlipMatrix, analysis: Analysis, b: SlipMatrix,
                            mesh: Mesh,
                            options: Optional[Options] = None) -> SlipMatrix:
    """Exact solve of A x = b on a block-row-sharded device mesh."""
    options = options or Options()
    options.validate()
    if A.kind != Kind.CSC or A.type != Type.MPZ:
        raise SlipIncorrectInputError("sharded path requires CSC x MPZ input")
    if A.m != A.n:
        raise SlipIncorrectInputError(f"matrix must be square, got {A.m}x{A.n}")
    n = A.n
    if b.m != n:
        raise SlipIncorrectInputError(f"b has {b.m} rows, matrix has {n}")
    bz = matrix_copy(b, Kind.DENSE, Type.MPZ, options)
    nrhs = bz.n
    if n == 0:
        return SlipMatrix.allocate(Kind.DENSE, Type.MPQ, 0, nrhs)
    p = mesh.devices.size
    q = np.asarray(analysis.q, dtype=np.int64)
    tol_mag, tol_shift = _tol_dyadic(options.tol)
    W = factor_width(A, options.max_limbs)
    Ws = solve_width(A, bz.x, W, n, options.max_limbs)
    for attempt in range(_MAX_RETRIES):
        dense = csc_to_dense(A)
        perm = dense.x[:, q]
        S0, M0 = matrix_to_limbs(perm, W)
        Sp, Mp, qp, n_pad = pad_to_multiple(
            np.asarray(S0), np.asarray(M0), q.astype(np.int32), p)
        FS, FM, rowidx, singular, f_ovf = factor_dense_limbs_sharded(
            mesh, jnp.asarray(Sp), jnp.asarray(Mp), jnp.asarray(qp),
            int(options.pivot), jnp.asarray(tol_mag), tol_shift, n)
        if bool(singular):
            raise SlipSingularError("sharded factorization found no eligible pivot")
        if bool(f_ovf):
            W *= 2
            Ws = max(Ws, 2 * W + 2)
            continue
        rowidx_np = np.asarray(rowidx, dtype=np.int64)[:n]
        perm_b = np.zeros((n_pad, nrhs), dtype=object)
        perm_b[:n] = bz.x[rowidx_np, :]
        VSn, VMn = matrix_to_limbs(perm_b, Ws)
        XS, XM, s_ovf = solve_dense_limbs_sharded(
            mesh, FS, FM, jnp.asarray(VSn), jnp.asarray(VMn), n)
        if bool(s_ovf):
            W *= 2
            Ws = 2 * Ws
            continue
        FSh = np.asarray(FS)
        FMh = np.asarray(FM)
        det = int(limbs_to_ints(FSh[n - 1, n - 1].reshape(1),
                                FMh[n - 1, n - 1][None, :])[0])
        xhat = limbs_to_ints(np.asarray(XS)[:n], np.asarray(XM)[:n])
        factor = A.scale / bz.scale
        x = SlipMatrix.allocate(Kind.DENSE, Type.MPQ, n, nrhs)
        for k in range(n):
            oc = int(q[k])
            for c in range(nrhs):
                x.x[oc, c] = Fraction(int(xhat[k, c]), det) * factor
        return x
    raise SlipLimbOverflowError(
        f"sharded solve exceeded limb budget after {_MAX_RETRIES} widenings")
