"""Read a corpus matrix and solve with MPFR output at custom precision
(reference parity: Demo/example2.c — SLIP_backslash with mpfr output).
"""

import os
import sys

try:  # prefer the installed package (pip install -e .)
    import slip_lu_tpu  # noqa: F401
except ImportError:  # bare checkout: fall back to the repo root
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import slip_lu_tpu as slip

DATA = os.path.join(os.path.dirname(__file__), "..", "data", "ExampleMats")


def main():
    A = slip.read_triplet(os.path.join(DATA, "sparse30_mat.txt"))
    b = slip.read_dense(os.path.join(DATA, "sparse30_v.txt"))

    opts = slip.Options(order=slip.Ordering.AMD, prec=256, check=True)
    x = slip.backslash(A, b, slip.Type.MPFR, opts)
    print("first entries at 256-bit precision:")
    for i in range(5):
        print(f"  x[{i}] = {x.x[i, 0]}")

    from slip_lu_tpu.stats import last_stats
    st = last_stats()
    if st:
        print(st.summary())


if __name__ == "__main__":
    main()
