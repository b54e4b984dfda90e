"""Fixed-width multi-limb integer arithmetic in JAX (jnp reference impls).

These primitives replace the GMP calls of the reference's numeric core
(reference: SLIP_gmp.c wrappers around mpz_mul/mpz_submul/mpz_divexact —
the three ops that are ~all of REF LU's runtime, SURVEY.md section 3.2).

Representation: little-endian base-2**16 limbs in int32 ([..., W], batch
dims lead), plus a separate sign tensor (int32 in {-1, 0, +1}). Key design
points for TPU:

  * 16-bit limbs so 8-bit digit products fit int32 with long accumulation
    chains (no int64 anywhere — TPUs emulate it poorly);
  * multiplication = 8-bit digit convolution (schoolbook via lax.scan;
    the Pallas kernel version tiles the same recurrence);
  * exact division by Jebelean's word-serial algorithm from the least
    significant limb using the divisor's inverse mod 2**16 — no trial
    quotients, valid exactly when the division is known exact, which IPGE
    guarantees (every SLIP divexact has the same property);
  * all control flow static; scans run a fixed W iterations.

Every function is batched over leading dims and jit-compatible.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

LIMB_BITS = 16
LIMB_BASE = 1 << LIMB_BITS
MASK = LIMB_BASE - 1


# ---------------------------------------------------------------------------
# carry/borrow propagation
# ---------------------------------------------------------------------------

def carry_normalize(acc: jnp.ndarray, base_bits: int = LIMB_BITS
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Propagate carries over the last axis of a nonnegative accumulator.

    Returns (digits < 2**base_bits, final_carry). acc entries must be < 2**31.
    """
    def step(carry, col):
        tot = col + carry
        return tot >> base_bits, tot & ((1 << base_bits) - 1)

    carry0 = jnp.zeros_like(acc[..., 0])
    carry, digs = lax.scan(step, carry0, jnp.moveaxis(acc, -1, 0))
    return jnp.moveaxis(digs, 0, -1), carry


def _borrow_subtract(a: jnp.ndarray, b: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """a - b limbwise with borrow; requires a >= b for a clean final borrow 0.

    Returns (diff_limbs, final_borrow)."""
    def step(borrow, ab):
        ai, bi = ab
        d = ai - bi - borrow
        neg = (d < 0).astype(jnp.int32)
        return neg, d + (neg << LIMB_BITS)

    borrow0 = jnp.zeros_like(a[..., 0])
    borrow, digs = lax.scan(
        step, borrow0,
        (jnp.moveaxis(a, -1, 0), jnp.moveaxis(b, -1, 0)))
    return jnp.moveaxis(digs, 0, -1), borrow


def _pad_to(a: jnp.ndarray, w: int) -> jnp.ndarray:
    cur = a.shape[-1]
    if cur == w:
        return a
    if cur > w:
        return a[..., :w]
    pad = [(0, 0)] * (a.ndim - 1) + [(0, w - cur)]
    return jnp.pad(a, pad)


# ---------------------------------------------------------------------------
# magnitude add / sub / compare
# ---------------------------------------------------------------------------

def mag_add(a: jnp.ndarray, b: jnp.ndarray, out_w: int
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """|a| + |b| -> (mag [..., out_w], overflow_flag [...])."""
    w = max(a.shape[-1], b.shape[-1])
    s = _pad_to(a, w) + _pad_to(b, w)
    digs, carry = carry_normalize(s)
    if out_w >= w:
        out = _pad_to(digs, out_w)
        if out_w > w:
            out = out.at[..., w].add(carry)
            carry = jnp.zeros_like(carry)
        return out, carry != 0
    dropped = jnp.any(digs[..., out_w:] != 0, axis=-1) | (carry != 0)
    return digs[..., :out_w], dropped


def mag_sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """|a| - |b| assuming |a| >= |b| (undefined otherwise)."""
    w = max(a.shape[-1], b.shape[-1])
    digs, _ = _borrow_subtract(_pad_to(a, w), _pad_to(b, w))
    return digs


def mag_cmp(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lexicographic compare of magnitudes: -1, 0, +1 (int32, batched)."""
    w = max(a.shape[-1], b.shape[-1])
    diff = jnp.sign(_pad_to(a, w) - _pad_to(b, w)).astype(jnp.int32)
    # most significant nonzero difference wins: scan from high limb
    def step(acc, col):
        acc = jnp.where(acc != 0, acc, col)
        return acc, None

    rev = jnp.moveaxis(diff[..., ::-1], -1, 0)
    out, _ = lax.scan(step, jnp.zeros_like(diff[..., 0]), rev)
    return out


def mag_is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


# ---------------------------------------------------------------------------
# multiplication: 8-bit digit convolution
# ---------------------------------------------------------------------------

def _to_digits(a: jnp.ndarray) -> jnp.ndarray:
    """[..., W] 16-bit limbs -> [..., 2W] 8-bit digits (little-endian)."""
    lo = a & 0xFF
    hi = a >> 8
    return jnp.stack([lo, hi], axis=-1).reshape(*a.shape[:-1], 2 * a.shape[-1])


def _from_digits(d: jnp.ndarray) -> jnp.ndarray:
    """[..., 2W] normalized 8-bit digits -> [..., W] 16-bit limbs."""
    return d[..., 0::2] + (d[..., 1::2] << 8)


def mag_mul(a: jnp.ndarray, b: jnp.ndarray, out_w: int
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """|a| * |b| -> (mag [..., out_w], overflow_flag [...]).

    Schoolbook 8-bit digit convolution: partial products <= 255**2 and
    accumulation chains of <= 2*(Wa+Wb) terms stay far below 2**31.
    """
    da = _to_digits(a)                      # [..., 2Wa]
    db = _to_digits(b)                      # [..., 2Wb]
    La, Lb = da.shape[-1], db.shape[-1]
    L = La + Lb
    db_pad = _pad_to(db, L)
    bshape = jnp.broadcast_shapes(da.shape[:-1], db.shape[:-1])
    acc0 = jnp.zeros(bshape + (L,), dtype=jnp.int32)

    def step(acc, j):
        col = lax.dynamic_index_in_dim(jnp.moveaxis(da, -1, 0), j, axis=0,
                                       keepdims=False)  # [...]
        shifted = jnp.roll(db_pad, j, axis=-1)  # zeros roll around harmlessly
        return acc + col[..., None] * shifted, None

    acc, _ = lax.scan(step, acc0, jnp.arange(La))
    digs, carry = carry_normalize(acc, base_bits=8)  # carry must end 0: L is wide enough
    limbs = _from_digits(digs)               # [..., (La+Lb)/2]
    w = limbs.shape[-1]
    if out_w >= w:
        return _pad_to(limbs, out_w), jnp.zeros(limbs.shape[:-1], dtype=bool)
    dropped = jnp.any(limbs[..., out_w:] != 0, axis=-1)
    return limbs[..., :out_w], dropped


# ---------------------------------------------------------------------------
# exact division (Jebelean, least-significant-first)
# ---------------------------------------------------------------------------

def _mulmod16(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(x * y) mod 2**16 for 16-bit values without int32 overflow."""
    lo = (x & 0xFF) * y                      # <= 2**24
    hi = (((x >> 8) * y) & 0xFF) << 8        # masked before shift
    return (lo + hi) & MASK


def inv16(d0: jnp.ndarray) -> jnp.ndarray:
    """Inverse of an odd 16-bit value mod 2**16 (Newton-Hensel lifting)."""
    x = d0  # correct to 3 bits (d*d == 1 mod 8 for odd d)
    for _ in range(3):  # 3 -> 6 -> 12 -> 24 bits
        t = (2 - _mulmod16(d0, x)) & MASK
        x = _mulmod16(x, t)
    return x


def trailing_zero_bits(d: jnp.ndarray) -> jnp.ndarray:
    """Trailing zero bits of a nonzero magnitude [..., W] -> int32 [...]."""
    nz = d != 0
    idx = jnp.argmax(nz, axis=-1).astype(jnp.int32)   # first nonzero limb
    v = jnp.take_along_axis(d, idx[..., None], axis=-1)[..., 0]
    lsb = (v & (-v)).astype(jnp.float32)              # power of two <= 2**15
    tz = jnp.round(jnp.log2(jnp.maximum(lsb, 1.0))).astype(jnp.int32)
    return idx * LIMB_BITS + tz


def mag_shr_bits(a: jnp.ndarray, nbits: jnp.ndarray) -> jnp.ndarray:
    """Right-shift a magnitude by a dynamic bit count (>= 0)."""
    W = a.shape[-1]
    limb_shift = nbits // LIMB_BITS
    s = nbits % LIMB_BITS
    pos = jnp.arange(W, dtype=jnp.int32)
    idx = pos + limb_shift[..., None] if jnp.ndim(limb_shift) else pos + limb_shift
    valid = idx < W
    idx_c = jnp.clip(idx, 0, W - 1)
    cur = jnp.take_along_axis(a, jnp.broadcast_to(idx_c, a.shape[:-1] + (W,)), axis=-1)
    cur = jnp.where(valid, cur, 0)
    nidx = jnp.clip(idx + 1, 0, W - 1)
    nxt = jnp.take_along_axis(a, jnp.broadcast_to(nidx, a.shape[:-1] + (W,)), axis=-1)
    nxt = jnp.where(idx + 1 < W, nxt, 0)
    s_ = s[..., None] if jnp.ndim(s) else s
    return ((cur >> s_) | ((nxt << (LIMB_BITS - s_)) & MASK)) & MASK


def mag_shl_bits_static(a: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """Left-shift a magnitude by a *static* bit count, widening the array."""
    W = a.shape[-1]
    limb_shift, s = divmod(nbits, LIMB_BITS)
    out_w = W + limb_shift + (1 if s else 0)
    shifted = jnp.zeros(a.shape[:-1] + (out_w,), dtype=jnp.int32)
    if s == 0:
        return shifted.at[..., limb_shift:limb_shift + W].set(a)
    lo = (a << s) & MASK
    hi = a >> (LIMB_BITS - s)
    shifted = shifted.at[..., limb_shift:limb_shift + W].add(lo)
    shifted = shifted.at[..., limb_shift + 1:limb_shift + 1 + W].add(hi)
    return shifted


def _scalar_mul16(q: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """16-bit scalar q [...] times magnitude d [..., W] -> [..., W+1]."""
    W = d.shape[-1]
    lo = (q & 0xFF)[..., None] * d           # <= 2**24
    hi = (q >> 8)[..., None] * d             # <= 2**24
    acc = jnp.zeros(jnp.broadcast_shapes(lo.shape[:-1], d.shape[:-1]) + (W + 1,),
                    dtype=jnp.int32)
    acc = acc.at[..., :W].add(lo)
    acc = acc.at[..., :W].add((hi & 0xFF) << 8)
    acc = acc.at[..., 1:].add(hi >> 8)
    digs, carry = carry_normalize(acc)
    return digs  # carry is 0: q*d < 2**(16(W+1))


def div_precompute(d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Precompute for exact division by magnitude d (shared divisor).

    Returns (d_odd, inv0, tz): d right-shifted to odd, the mod-2**16 inverse
    of its low limb, and the shift amount. d must be nonzero.
    """
    tz = trailing_zero_bits(d)
    d_odd = mag_shr_bits(d, tz)
    return d_odd, inv16(d_odd[..., 0]), tz


def mag_divexact(a: jnp.ndarray, d_odd: jnp.ndarray, inv0: jnp.ndarray,
                 tz: jnp.ndarray, out_w: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact |a| / |d| via Jebelean word-serial division.

    Preconditions: d = d_odd << tz divides a exactly (IPGE guarantees this).
    Returns (quotient [..., out_w], nonexact_or_overflow_flag [...]). The
    flag fires if the division was not exact or the quotient needs more
    than out_w limbs — used for limb-overflow detection on device.
    """
    Wa = a.shape[-1]
    r = mag_shr_bits(a, tz)
    d_pad = _pad_to(d_odd, Wa)

    def step(r, _):
        q_t = _mulmod16(r[..., 0], inv0)
        prod = _scalar_mul16(q_t, d_pad)            # [..., Wa+1]
        r_ext = _pad_to(r, Wa + 1)
        diff, borrow = _borrow_subtract(r_ext, jnp.broadcast_to(prod, r_ext.shape))
        return diff[..., 1:], (q_t, borrow)

    r_fin, (qs, borrows) = lax.scan(step, r, None, length=out_w)
    q = jnp.moveaxis(qs, 0, -1)
    bad = jnp.any(r_fin != 0, axis=-1) | jnp.any(borrows != 0, axis=0)
    return q, bad


# ---------------------------------------------------------------------------
# signed operations (sign tensors: int32 in {-1, 0, +1})
# ---------------------------------------------------------------------------

def signed_mul(sa, ma, sb, mb, out_w: int):
    """(sa,ma) * (sb,mb) -> (sign, mag, overflow)."""
    mag, ovf = mag_mul(ma, mb, out_w)
    return sa * sb, mag, ovf


def signed_add(sa, ma, sb, mb, out_w: int):
    """(sa,ma) + (sb,mb) -> (sign, mag, overflow). Branchless over batch."""
    added, add_ovf = mag_add(ma, mb, out_w)
    c = mag_cmp(ma, mb)
    w = max(ma.shape[-1], mb.shape[-1])
    ma_p, mb_p = _pad_to(ma, w), _pad_to(mb, w)
    big = jnp.where((c >= 0)[..., None], ma_p, mb_p)
    small = jnp.where((c >= 0)[..., None], mb_p, ma_p)
    diff = _pad_to(mag_sub(big, small), out_w) if out_w >= w else mag_sub(big, small)[..., :out_w]
    sign_diff = jnp.where(c == 0, 0, jnp.where(c > 0, sa, sb))
    opposite = sa * sb < 0
    sign = jnp.where(opposite, sign_diff, jnp.where(sa != 0, sa, sb))
    mag = jnp.where(opposite[..., None], diff, added)
    ovf = jnp.where(opposite, False, add_ovf)
    # result zero -> sign 0
    sign = jnp.where(mag_is_zero(mag), 0, sign)
    return sign, mag, ovf


def signed_sub(sa, ma, sb, mb, out_w: int):
    return signed_add(sa, ma, -sb, mb, out_w)


def signed_divexact(s_num, m_num, s_den, d_odd, inv0, tz, out_w: int):
    """(s_num,m_num) / signed divisor (s_den, d_odd<<tz), exact."""
    q, bad = mag_divexact(m_num, d_odd, inv0, tz, out_w)
    sign = s_num * s_den
    sign = jnp.where(mag_is_zero(q), 0, sign)
    return sign, q, bad
