"""Device compute ops: fixed-width multi-limb integer arithmetic.

The reference's arbitrary-precision layer is GMP (heap mpz_t, one pointer
per entry — the antithesis of TPU memory; reference: SLIP_gmp.c). This
package replaces it with fixed-width limb tensors: every value is a sign
(int32 in {-1,0,1}) plus W little-endian 16-bit limbs stored in int32,
laid out [..., W] so the VPU vectorizes over entries. See SURVEY.md §7.

- limbs.py: host <-> device conversion (Python int <-> limb arrays)
- arith.py: jnp primitives — add/sub/cmp/mul/divexact (Jebelean), signed ops
- pallas_kernels.py: fused Pallas implementations of the hot IPGE ops
"""

from .limbs import LIMB_BITS, ints_to_limbs, limbs_to_ints
from . import arith

__all__ = ["LIMB_BITS", "ints_to_limbs", "limbs_to_ints", "arith"]
