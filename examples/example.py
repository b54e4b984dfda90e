"""Self-contained small example (reference parity: Demo/example.c).

Builds a small dense system in code, solves it exactly, and verifies the
solution in rational arithmetic.
"""

import os
import sys

import numpy as np

try:  # prefer the installed package (pip install -e .)
    import slip_lu_tpu  # noqa: F401
except ImportError:  # bare checkout: fall back to the repo root
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import slip_lu_tpu as slip


def main():
    dense = np.array([
        [11,  0,  5,  0, -4],
        [0,   7,  0,  3,  0],
        [2,   0,  9,  0,  1],
        [0,  -6,  0, 13,  0],
        [5,   0, -2,  0,  8],
    ], dtype=object)
    A = slip.SlipMatrix.from_dense(dense, slip.Type.MPZ)
    b = slip.SlipMatrix.from_dense(
        np.array([[1], [2], [3], [4], [5]], dtype=object), slip.Type.MPZ)

    x = slip.backslash(A, b, slip.Type.MPQ, slip.Options(check=True))
    print("exact solution:")
    for i in range(5):
        print(f"  x[{i}] = {x.x[i, 0]}")

    xf = slip.backslash(A, b, slip.Type.FP64)
    print("as float64:", [float(xf.x[i, 0]) for i in range(5)])


if __name__ == "__main__":
    main()
