"""Persist factorizations to disk (checkpoint / resume).

The reference supports re-solving without refactorizing implicitly —
SLIP_LU_factorize and SLIP_LU_solve are separate calls holding (L, U,
rhos, pinv, q) in memory (reference: SLIP_LU_factorize.c /
SLIP_LU_solve.c). This module makes that durable: a `Factorization` is
written as a single .npz of int32/int64 arrays — big integers go through
the same base-2**16 limb packing the device uses (ops/limbs.py), so the
format is exact, portable, and free of pickled Python objects.

    F = slip.factorize(A2, slip.analyze(A2, opts), opts)
    slip.save_factorization(F, "fact.npz")
    ...
    F2 = slip.load_factorization("fact.npz")
    x = slip.solve(F2, b, opts)       # identical rationals, no refactor
"""

from __future__ import annotations

from fractions import Fraction
from typing import List, Tuple

import numpy as np

from .errors import SlipIncorrectInputError
from .factorize import Factorization
from .ops.limbs import ints_to_limbs, limbs_to_ints

_FORMAT_VERSION = 1


def _pack_cols(cols: List[List[Tuple[int, int]]]):
    """[(row, value)] per column -> (ptr, rows, sign, mag) arrays."""
    ptr = np.zeros(len(cols) + 1, dtype=np.int64)
    rows: List[int] = []
    vals: List[int] = []
    for j, col in enumerate(cols):
        for r, v in col:
            rows.append(r)
            vals.append(v)
        ptr[j + 1] = len(rows)
    wmax = max((abs(v).bit_length() for v in vals), default=1)
    W = max(1, -(-wmax // 16))
    sign, mag = ints_to_limbs(vals, W)
    return ptr, np.asarray(rows, dtype=np.int64), sign, mag


def _unpack_cols(ptr, rows, sign, mag):
    vals = limbs_to_ints(sign, mag)
    cols = []
    for j in range(len(ptr) - 1):
        cols.append([(int(rows[t]), int(vals[t]))
                     for t in range(int(ptr[j]), int(ptr[j + 1]))])
    return cols


def save_factorization(F: Factorization, path: str) -> None:
    """Write a factorization as an exact .npz checkpoint."""
    lptr, lrows, lsign, lmag = _pack_cols(F.Lcols)
    uptr, urows, usign, umag = _pack_cols(F.Ucols)
    rw = max((abs(v).bit_length() for v in F.rhos), default=1)
    rsign, rmag = ints_to_limbs(F.rhos, max(1, -(-rw // 16)))
    snum, smag = ints_to_limbs(
        [F.scale.numerator, F.scale.denominator],
        max(1, -(-max(F.scale.numerator.bit_length(),
                      F.scale.denominator.bit_length()) // 16)))
    np.savez_compressed(
        path, version=np.int64(_FORMAT_VERSION), n=np.int64(F.n),
        lptr=lptr, lrows=lrows, lsign=lsign, lmag=lmag,
        uptr=uptr, urows=urows, usign=usign, umag=umag,
        rsign=rsign, rmag=rmag,
        pinv=np.asarray(F.pinv, dtype=np.int64),
        row_perm=np.asarray(F.row_perm, dtype=np.int64),
        q=np.asarray(F.q, dtype=np.int64),
        scale_sign=snum, scale_mag=smag)


def load_factorization(path: str) -> Factorization:
    """Read a checkpoint written by save_factorization."""
    z = np.load(path)
    if int(z["version"]) != _FORMAT_VERSION:
        raise SlipIncorrectInputError(
            f"unsupported factorization format v{int(z['version'])}")
    n = int(z["n"])
    Lcols = _unpack_cols(z["lptr"], z["lrows"], z["lsign"], z["lmag"])
    Ucols = _unpack_cols(z["uptr"], z["urows"], z["usign"], z["umag"])
    rhos = [int(v) for v in limbs_to_ints(z["rsign"], z["rmag"])]
    sc = limbs_to_ints(z["scale_sign"], z["scale_mag"])
    scale = Fraction(int(sc[0]), int(sc[1]))
    return Factorization(n=n, Lcols=Lcols, Ucols=Ucols, rhos=rhos,
                         pinv=z["pinv"], row_perm=z["row_perm"], q=z["q"],
                         scale=scale)
