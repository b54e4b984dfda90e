"""slip_lu_tpu — a TPU-native exact sparse linear algebra framework.

A from-scratch reimplementation of the capabilities of SLIP_LU (SPEX Left
LU; reference mounted at /root/reference, surveyed in SURVEY.md): exact
solution of sparse Ax = b via left-looking roundoff-error-free (REF/IPGE)
LU factorization — redesigned TPU-first:

  * arbitrary precision on the host via Python ints (the bit-exact oracle),
  * fixed-width multi-word limb arrays + JAX/Pallas kernels on device,
  * host-side symbolic passes (orderings, reach, static schedules) with a
    native C++ implementation,
  * multi-chip scaling via jax.sharding / shard_map block-row partitioning.

Public API (reference parity with Include/SLIP_LU.h):
  initialize/finalize, Options/default_options, SlipMatrix, matrix_copy,
  analyze, factorize, solve, backslash, check_solution, read_triplet,
  read_dense, SlipInfo + exceptions.
"""

from .analyze import Analysis, analyze
from .backslash import backslash
from .bigfloat import BigFloat
from .checkpoint import load_factorization, save_factorization
from .convert import matrix_copy
from .errors import (SlipError, SlipIncorrectError, SlipIncorrectInputError,
                     SlipInfo, SlipLimbOverflowError, SlipPanicError,
                     SlipSingularError, raise_for_info)
from .factorize import Factorization, factorize
from .interop import backslash_scipy, from_scipy, to_scipy
from .io import read_dense, read_triplet, write_dense, write_triplet
from .matrix import Kind, SlipMatrix, Type
from .options import Options, Ordering, Pivot, RoundMode, default_options
from .solve import check_solution, solve

__version__ = "0.5.0"

_initialized = False


def initialize(expert_allocators=None) -> None:
    """API parity with SLIP_initialize / SLIP_initialize_expert.

    The reference registers custom GMP allocators with setjmp/longjmp OOM
    recovery (reference: SLIP_initialize.c, SLIP_gmp.c ~l.150). Python/JAX
    own allocation here, so this records state for parity and validates the
    environment; `expert_allocators` is accepted and ignored (documented
    divergence — host memory is GC-managed).
    """
    global _initialized
    _initialized = True


def finalize() -> None:
    """API parity with SLIP_finalize (reference frees MPFR caches)."""
    global _initialized
    _initialized = False


__all__ = [
    "Analysis", "analyze", "backslash", "BigFloat", "matrix_copy",
    "SlipError", "SlipIncorrectError", "SlipIncorrectInputError", "SlipInfo",
    "SlipLimbOverflowError", "SlipPanicError", "SlipSingularError",
    "raise_for_info", "Factorization", "factorize", "read_dense",
    "read_triplet", "write_dense", "write_triplet", "Kind", "SlipMatrix",
    "Type", "Options", "Ordering", "Pivot", "RoundMode", "default_options",
    "check_solution", "solve", "initialize", "finalize",
    "save_factorization", "load_factorization",
    "backslash_scipy", "from_scipy", "to_scipy",
]
