"""scipy/numpy interoperability — the reference's MATLAB-interface role.

The reference ships a mex bridge (`x = SLIP_backslash(A, b)` on MATLAB
sparse matrices, reference: MATLAB/SLIP_backslash.m + SLIP_mex_soln.c);
this framework's front door for the scientific-Python ecosystem is the
same one-call shape over scipy.sparse / numpy:

    import scipy.sparse as sp
    x = slip.backslash_scipy(sp.csc_matrix(...), b_numpy)   # exact Fractions
    x = slip.backslash_scipy(A, b, out="fp64")              # rounded once

scipy is optional — these helpers raise a clear error if it is missing.
"""

from __future__ import annotations

from fractions import Fraction
from typing import Optional

import numpy as np

from .backslash import backslash
from .errors import SlipIncorrectInputError
from .matrix import Kind, SlipMatrix, Type
from .options import Options


def _require_scipy():
    try:
        import scipy.sparse as sp
        return sp
    except ImportError as e:  # pragma: no cover
        raise SlipIncorrectInputError(
            "scipy is required for scipy interop") from e


def from_scipy(A, type_: Type = Type.FP64) -> SlipMatrix:
    """scipy.sparse matrix (any format) -> CSC SlipMatrix.

    Integer dtypes become exact MPZ/INT64 values; floating dtypes become
    FP64 (integerized exactly later — float64 is a dyadic rational).
    """
    sp = _require_scipy()
    if not sp.issparse(A):
        raise SlipIncorrectInputError("from_scipy expects a scipy.sparse "
                                      f"matrix, got {type(A).__name__}")
    A = A.tocsc()
    A.sort_indices()
    m, n = A.shape
    if np.issubdtype(A.dtype, np.integer):
        type_ = Type.MPZ
        vals = [int(v) for v in A.data]
    else:
        vals = [float(v) for v in A.data]
    out = SlipMatrix.allocate(Kind.CSC, type_, m, n, nzmax=len(vals))
    out.p[:] = A.indptr
    out.i[: len(vals)] = A.indices
    for t, v in enumerate(vals):
        out.x[t] = v
    out.nz = len(vals)
    return out


def to_scipy(A: SlipMatrix):
    """SlipMatrix -> scipy.sparse.csc_matrix (values rounded to float64)."""
    sp = _require_scipy()
    from .convert import matrix_copy
    C = matrix_copy(A, Kind.CSC, Type.FP64)
    nnz = int(C.p[C.n])
    return sp.csc_matrix(
        (np.asarray(C.x[:nnz], dtype=np.float64),
         np.asarray(C.i[:nnz], dtype=np.int64),
         np.asarray(C.p, dtype=np.int64)),
        shape=(C.m, C.n))


def backslash_scipy(A, b, out: str = "mpq",
                    options: Optional[Options] = None,
                    backend: str = "host"):
    """Exactly solve A x = b for scipy/numpy inputs.

    A: scipy.sparse matrix (or numpy 2-D array); b: numpy 1-D/2-D array.
    out: "mpq" -> object array of fractions.Fraction (exact),
         "fp64" -> float64 array (rounded once at output).
    """
    sp = _require_scipy()
    if sp.issparse(A):
        A2 = from_scipy(A)
    else:
        arr = np.asarray(A)
        if arr.ndim != 2:
            raise SlipIncorrectInputError("A must be 2-D")
        type_ = Type.MPZ if np.issubdtype(arr.dtype, np.integer) \
            else Type.FP64
        A2 = SlipMatrix.from_dense(arr.astype(object), type_)
    b_arr = np.asarray(b)
    if b_arr.ndim == 1:
        b_arr = b_arr[:, None]
    btype = Type.MPZ if np.issubdtype(b_arr.dtype, np.integer) else Type.FP64
    B = SlipMatrix.from_dense(b_arr.astype(object), btype)
    try:
        out_type = {"mpq": Type.MPQ, "fp64": Type.FP64}[out]
    except KeyError:
        raise SlipIncorrectInputError(
            f"unknown out={out!r}, expected 'mpq' or 'fp64'") from None
    x = backslash(A2, B, out_type, options, backend=backend)
    res = np.asarray(x.x)
    if out == "fp64":
        res = res.astype(np.float64)
    return res[:, 0] if np.asarray(b).ndim == 1 else res
