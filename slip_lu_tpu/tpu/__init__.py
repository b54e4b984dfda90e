"""TPU execution path: fixed-width limb REF LU on device.

Replaces the reference's GMP-based numeric core (SURVEY.md section 7):
the host computes an IPGE/Hadamard bit-growth bound (bounds.py), packs the
integerized matrix into limb tensors, and runs the dense-with-masking
Bareiss/IPGE factorization (factor.py) and REF substitution (solve.py)
under jit. Overflow flags trigger widen-and-retry on the host — the
framework's analogue of the reference's setjmp OOM recovery (SLIP_gmp.c).
"""

from .bounds import factor_width, solve_width
from .backslash_tpu import factorize_solve_tpu

__all__ = ["factor_width", "solve_width", "factorize_solve_tpu"]
