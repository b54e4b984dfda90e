"""Matmul-form limb arithmetic: the fast path for the IPGE kernels.

The hot multiplies of REF LU all have a *shared* operand — the pivot
rho_k scaling every entry, the pivot row x pivot column outer product,
and the exact division by rho_{k-1} (reference: the mpz_mul / mpz_submul /
mpz_divexact triple in slip_ref_triangular_solve.c, ~all of runtime).
This module exploits that: a digit-convolution with a shared operand is a
matrix product with that operand's Toeplitz matrix, so each elimination
step becomes a handful of large dot_general contractions (MXU-friendly)
instead of O(limbs) sequential scan iterations (ops/arith.py, kept as the
reference implementation):

  * shared multiply   : [B, La] digits @ T_shared [La, D]      -> [B, D]
  * outer product     : [R, Lc] digits @ T_rows [Lc, C*D]      -> [R, C*D]
  * exact division    : one *truncated* multiply by the divisor's Hensel
    inverse mod 2**(16*check_w) — a ≡ q·d  =>  a·d⁻¹ ≡ q (mod 2**N),
    exact whenever the true quotient fits in check_w limbs (IPGE
    guarantees divisibility; quotient-width overflow is detected and
    reported, the widen-and-retry path handles it);
  * carry propagation : data-dependent while_loop (converges in ~3 passes)
    instead of a width-long scan chain.

Digits are 8-bit (products <= 255², chains << 2**31 in int32). All
functions are jit-compatible, batched, and bit-exact (tests/test_limbs.py
checks every op against Python ints).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

from .arith import (LIMB_BITS, MASK, _from_digits, _pad_to, _to_digits,
                    inv16)


# ---------------------------------------------------------------------------
# carry propagation (while_loop — O(1) typical passes, any-width exact)
# ---------------------------------------------------------------------------

def normalize(acc: jnp.ndarray, base_bits: int = LIMB_BITS
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Resolve carries/borrows of an int32 digit accumulator.

    Entries may exceed the base or be negative (borrows). Returns
    (digits in [0, 2**base_bits), carry_out) where carry_out collects
    everything that flowed past the top digit (0 for in-range results,
    negative if the represented value was negative).
    """
    mask = (1 << base_bits) - 1

    def cond(state):
        acc, _ = state
        return jnp.any((acc >> base_bits) != 0)

    def body(state):
        acc, out = state
        digs = acc & mask
        car = acc >> base_bits           # arithmetic shift: handles borrows
        shifted = jnp.concatenate(
            [jnp.zeros_like(car[..., :1]), car[..., :-1]], axis=-1)
        return digs + shifted, out + car[..., -1]

    out0 = jnp.zeros_like(acc[..., 0])
    digs, out = lax.while_loop(cond, body, (acc, out0))
    return digs, out


def normalize_unsigned(acc: jnp.ndarray, base_bits: int = LIMB_BITS
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-depth carry resolution for NONNEGATIVE accumulators.

    The while_loop in `normalize` pays a per-iteration sync on TPU; for
    the hot nonnegative cases (convolution products, magnitude adds) this
    fixed pipeline is much cheaper: value-halving passes bring every
    carry into {0,1}, then a Kogge-Stone generate/propagate prefix scan
    resolves worst-case ripple chains exactly (same construction as the
    Pallas kernel). int32 inputs up to 2**31-1 are handled.
    """
    mask = (1 << base_bits) - 1
    d = acc.shape[-1]

    def shift1(car):
        return jnp.concatenate(
            [jnp.zeros_like(car[..., :1]), car[..., :-1]], axis=-1)

    v = acc
    out_carry = jnp.zeros_like(acc[..., 0])
    # 2^31 -> <= base + 2^(31-2*bits) ... : 4 passes reach carry<=1 for
    # base_bits >= 8 (see pallas_kernels._reduction_passes)
    passes = 1
    bound = (1 << 31) - 1
    while bound > (1 << base_bits):
        bound = mask + (bound >> base_bits)
        passes += 1
    for _ in range(passes):
        digs = v & mask
        car = v >> base_bits
        out_carry = out_carry + car[..., -1]
        v = digs + shift1(car)
    # v in [0, 2**base_bits]; fold to digits + single-bit generate
    s = v & mask
    g = v >> base_bits
    p = (s == mask).astype(jnp.int32)
    dist = 1
    while dist < d:
        g_sh = jnp.concatenate(
            [jnp.zeros_like(g[..., :dist]), g[..., :-dist]], axis=-1)
        p_sh = jnp.concatenate(
            [jnp.zeros_like(p[..., :dist]), p[..., :-dist]], axis=-1)
        g = g | (p & g_sh)
        p = p & p_sh
        dist *= 2
    # composed g[i] = carry out of position i; its top entry leaves the
    # array (counted once here — propagation through the top included)
    out_carry = out_carry + g[..., -1]
    carry_in = jnp.concatenate(
        [jnp.zeros_like(g[..., :1]), g[..., :-1]], axis=-1)
    return (s + carry_in) & mask, out_carry


def mag_shr_bits_vec(a: jnp.ndarray, nbits: jnp.ndarray) -> jnp.ndarray:
    """Right-shift magnitudes by per-entry bit counts — barrel shifter.

    log2 passes of static slices + selects instead of the gathers of
    arith.mag_shr_bits (TPU gathers cost ~100x an elementwise pass).
    nbits broadcasts over a's batch dims; values in [0, 16*W).
    """
    w = a.shape[-1]
    nb = jnp.broadcast_to(nbits, a.shape[:-1]).astype(jnp.int32)
    limb_shift = nb // LIMB_BITS
    # limb-granularity shift, powers of two
    step = 1
    while step < w:
        take = ((limb_shift & step) != 0)[..., None]
        shifted = jnp.concatenate(
            [a[..., step:], jnp.zeros_like(a[..., :step])], axis=-1)
        a = jnp.where(take, shifted, a)
        step *= 2
    # bit-granularity shift within limbs, powers of two (1, 2, 4, 8)
    s = nb % LIMB_BITS
    for bit in (1, 2, 4, 8):
        take = ((s & bit) != 0)[..., None]
        nxt = jnp.concatenate(
            [a[..., 1:], jnp.zeros_like(a[..., :1])], axis=-1)
        shifted = ((a >> bit) | ((nxt << (LIMB_BITS - bit)) & MASK)) & MASK
        a = jnp.where(take, shifted, a)
    return a


def trailing_zero_bits_vec(d: jnp.ndarray) -> jnp.ndarray:
    """Trailing zero bits of nonzero magnitudes [..., W] -> int32 [...].

    Gather-free: the first nonzero limb is selected with a prefix-all-
    zero mask; its within-limb trailing zeros come from the isolated
    lowest set bit via a float log2 (exact for powers of two < 2**16).
    """
    nz = (d != 0).astype(jnp.int32)
    before = jnp.cumsum(nz, axis=-1) - nz      # nonzero limbs below i
    first = nz * (before == 0)                  # one-hot first nonzero
    idx = jnp.sum(first * jnp.arange(d.shape[-1], dtype=jnp.int32),
                  axis=-1)
    v = jnp.sum(first * d, axis=-1)
    lsb = (v & (-v)).astype(jnp.float32)
    tz16 = jnp.round(jnp.log2(jnp.maximum(lsb, 1.0))).astype(jnp.int32)
    return idx * LIMB_BITS + tz16


def truncate_mag(m: jnp.ndarray, out_w: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Truncate a limb magnitude to out_w limbs, flagging dropped nonzeros."""
    w = m.shape[-1]
    if out_w >= w:
        return _pad_to(m, out_w), jnp.zeros(m.shape[:-1], dtype=bool)
    return m[..., :out_w], jnp.any(m[..., out_w:] != 0, axis=-1)


# ---------------------------------------------------------------------------
# vectorized compare / add / sub (no scans)
# ---------------------------------------------------------------------------

def mag_cmp_vec(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lexicographic magnitude compare -> {-1, 0, +1}, fully vectorized.

    Gather-free (TPU gathers cost ~100x an elementwise pass): the sign at
    the most significant differing limb is selected with a suffix-any
    mask built from a reversed cumulative maximum.
    """
    w = max(a.shape[-1], b.shape[-1])
    ap, bp = _pad_to(a, w), _pad_to(b, w)
    diff = jnp.sign(ap - bp).astype(jnp.int32)
    neq = (diff != 0).astype(jnp.int32)
    # first_from_top[i] = 1 iff limb i differs and no higher limb does
    any_above = jnp.cumsum(neq[..., ::-1], axis=-1)[..., ::-1] - neq
    first = neq * (any_above == 0)
    return jnp.sum(diff * first, axis=-1)


def mag_add_vec(a: jnp.ndarray, b: jnp.ndarray, out_w: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """|a| + |b| -> (mag [..., out_w], overflow_flag)."""
    w = max(a.shape[-1], b.shape[-1])
    digs, car = normalize_unsigned(_pad_to(a, w) + _pad_to(b, w))
    if out_w > w:
        out = _pad_to(digs, out_w).at[..., w].add(car)
        return out, jnp.zeros(digs.shape[:-1], dtype=bool)
    out, dropped = truncate_mag(digs, out_w)
    return out, dropped | (car != 0)


def mag_sub_vec(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """|a| - |b| assuming |a| >= |b| (undefined otherwise).

    Borrow-free: a - b = a + complement(b) + 1 (mod 2**16W), all terms
    nonnegative, so the static carry resolver applies; the end-around
    carry (exactly 1 when a >= b) is dropped by the mod.
    """
    w = max(a.shape[-1], b.shape[-1])
    comp = MASK - _pad_to(b, w)
    acc = _pad_to(a, w) + comp
    acc = acc.at[..., 0].add(1)
    digs, _ = normalize_unsigned(acc)
    return digs


def signed_add_vec(sa, ma, sb, mb, out_w: int):
    """(sa,ma) + (sb,mb) -> (sign, mag, overflow), vectorized."""
    added, add_ovf = mag_add_vec(ma, mb, out_w)
    c = mag_cmp_vec(ma, mb)
    w = max(ma.shape[-1], mb.shape[-1])
    ma_p, mb_p = _pad_to(ma, w), _pad_to(mb, w)
    big = jnp.where((c >= 0)[..., None], ma_p, mb_p)
    small = jnp.where((c >= 0)[..., None], mb_p, ma_p)
    diff, diff_ovf = truncate_mag(mag_sub_vec(big, small), out_w)
    sign_diff = jnp.where(c == 0, 0, jnp.where(c > 0, sa, sb))
    opposite = sa * sb < 0
    sign = jnp.where(opposite, sign_diff, jnp.where(sa != 0, sa, sb))
    mag = jnp.where(opposite[..., None], diff, added)
    ovf = jnp.where(opposite, diff_ovf, add_ovf)
    sign = jnp.where(jnp.all(mag == 0, axis=-1), 0, sign)
    return sign, mag, ovf


def signed_sub_vec(sa, ma, sb, mb, out_w: int):
    return signed_add_vec(sa, ma, -sb, mb, out_w)


# ---------------------------------------------------------------------------
# shared-operand multiplication as Toeplitz matmul
# ---------------------------------------------------------------------------

def _toeplitz(shared_dig: jnp.ndarray, l_in: int, d_out: int) -> jnp.ndarray:
    """Band matrix T[..., u, d] = shared_dig[..., d-u] (0 outside).

    Gather-free tile/reshape construction: pad s to length L, tile it
    l_in times, and reshape with row length L-1 — row u is then s
    rotated right by u (u*(L-1) = -u mod L), which is exactly the
    Toeplitz band as long as the zero padding covers the wrap-around
    (L >= ls + l_in - 1 and L > d_out).
    """
    ls = shared_dig.shape[-1]
    L = max(d_out + 1, ls + l_in)
    batch = shared_dig.shape[:-1]
    hp = jnp.concatenate(
        [shared_dig,
         jnp.zeros(batch + (L - ls,), shared_dig.dtype)], axis=-1)
    flat = jnp.tile(hp, (1,) * len(batch) + (l_in,))
    flat = flat[..., : l_in * (L - 1)]
    t = flat.reshape(batch + (l_in, L - 1))
    return t[..., :d_out]


def _conv_shared_limbs(da: jnp.ndarray, ds: jnp.ndarray,
                       d_out: int) -> jnp.ndarray:
    """Digit conv with a shared operand -> normalized limbs [..., d_out//2].

    One gather-free 1-D convolution (batch in the conv N dimension, a
    single shared kernel) + carry resolution; carries past digit d_out
    are dropped (exact when the product fits, mod 2**(8*d_out) otherwise
    — exactly what mul_shared / mul_shared_mod need). Optional fused
    Pallas kernel on TPU.
    """
    from . import pallas_kernels as _pk
    if ds.ndim == 1 and da.shape[-1] <= _pk._MAX_K and _pk.use_pallas():
        t = _toeplitz(ds, da.shape[-1], d_out)
        flat = da.reshape(-1, da.shape[-1])
        limbs = _pk.mul_shared_digits_pallas(flat, t, d_out)
        return limbs.reshape(da.shape[:-1] + (d_out // 2,))
    la = da.shape[-1]
    ls = ds.shape[-1]
    flat = da.reshape(-1, la)
    b = flat.shape[0]
    # grouped conv with the shared kernel replicated per group lowers far
    # better on TPU than the single-kernel batch form (~6x measured)
    rhs = jnp.broadcast_to(ds[::-1], (b, 1, ls))
    acc = lax.conv_general_dilated(
        flat[None, :, :], rhs, window_strides=(1,),
        padding=[(ls - 1, ls - 1)], feature_group_count=b,
        dimension_numbers=("NCH", "OIH", "NCH"))[0]
    if acc.shape[-1] >= d_out:
        acc = acc[..., :d_out]
    else:
        acc = jnp.pad(acc, ((0, 0), (0, d_out - acc.shape[-1])))
    digs, _ = normalize_unsigned(acc, 8)
    return _from_digits(digs).reshape(da.shape[:-1] + (d_out // 2,))


def mul_shared(a: jnp.ndarray, shared: jnp.ndarray, out_w: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """|a| * |shared| for a batch a [..., Wa] and one shared value [Ws].

    Exact full-width product, then truncated to out_w with overflow flag.
    One dot_general: [B, La] @ T [La, D].
    """
    da = _to_digits(a)
    ds = _to_digits(shared)
    d_out = da.shape[-1] + ds.shape[-1]    # full width: top carry is 0
    limbs = _conv_shared_limbs(da, ds, d_out)
    return truncate_mag(limbs, out_w)


def mul_shared_mod(a: jnp.ndarray, shared: jnp.ndarray, out_w: int
                   ) -> jnp.ndarray:
    """(|a| * |shared|) mod 2**(16*out_w): truncated digit convolution."""
    da = _to_digits(a)
    ds = _to_digits(shared)
    return _conv_shared_limbs(da, ds, 2 * out_w)


def mul_outer(col: jnp.ndarray, row: jnp.ndarray, out_w: int
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Outer product of magnitudes: col [R, Wc] x row [C, Wr] -> [R, C, out_w].

    out[r, c] = col[r] * row[c]; one gather-free convolution with R as
    the conv batch and C as the output channels.
    """
    dc = _to_digits(col)                   # [R, Lc]
    dr = _to_digits(row)                   # [C, Lr]
    lc, lr = dc.shape[-1], dr.shape[-1]
    t = _toeplitz(dr, lc, lc + lr)         # [C, Lc, D]
    acc = jnp.einsum("ru,cud->rcd", dc, t)
    digs, _ = normalize_unsigned(acc, 8)
    limbs = _from_digits(digs)
    return truncate_mag(limbs, out_w)


def signed_mul_shared(sa, ma, s_shared, m_shared, out_w: int):
    mag, ovf = mul_shared(ma, m_shared, out_w)
    sign = sa * s_shared
    sign = jnp.where(jnp.all(mag == 0, axis=-1), 0, sign)
    return sign, mag, ovf


def signed_mul_outer(s_col, m_col, s_row, m_row, out_w: int):
    mag, ovf = mul_outer(m_col, m_row, out_w)
    sign = s_col[:, None] * s_row[None, :]
    sign = jnp.where(jnp.all(mag == 0, axis=-1), 0, sign)
    return sign, mag, ovf


# ---------------------------------------------------------------------------
# exact division: Hensel (2-adic) inverse + one truncated multiply
# ---------------------------------------------------------------------------

def _mod_sub_from_two(v: jnp.ndarray) -> jnp.ndarray:
    """(2 - v) mod 2**(16*W) for a magnitude v [..., W].

    Complement form: 2 - v = complement(v) + 3 (mod 2**16W), nonnegative
    throughout, so the static carry resolver applies.
    """
    comp = MASK - v
    comp = comp.at[..., 0].add(3)
    digs, _ = normalize_unsigned(comp)     # dropped carry == mod
    return digs


def hensel_inv(d_odd: jnp.ndarray, out_w: int) -> jnp.ndarray:
    """Inverse of an odd magnitude mod 2**(16*out_w) by Newton lifting.

    Each iteration doubles the correct width: x <- x*(2 - d*x). O(log W)
    small truncated multiplies, computed once per elimination step and
    amortized over every entry's division.
    """
    x = jnp.zeros(d_odd.shape[:-1] + (1,), jnp.int32).at[..., 0].set(
        inv16(d_odd[..., 0]))
    w = 1
    while w < out_w:
        w = min(2 * w, out_w)
        d_t = d_odd[..., :w] if d_odd.shape[-1] >= w else _pad_to(d_odd, w)
        dx = mul_shared_mod(d_t, x, w)
        x = mul_shared_mod(_pad_to(x, w), _mod_sub_from_two(dx), w)
    return x


def div_precompute_hensel(d: jnp.ndarray, check_w: int
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(inverse mod 2**(16*check_w) of the odd part, trailing-zero bits)."""
    tz = trailing_zero_bits_vec(d)
    d_odd = mag_shr_bits_vec(d, tz)
    return hensel_inv(d_odd, check_w), tz


def divexact_shared(a: jnp.ndarray, inv: jnp.ndarray, tz: jnp.ndarray,
                    out_w: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact |a| / |d| given inv = odd(d)^-1 mod 2**(16*check_w).

    check_w (= inv width) must be >= the numerator width so the true
    quotient is representable mod 2**(16*check_w); then
    q = (a >> tz) * inv mod 2**(16*check_w) is exact. Returns
    (q [..., out_w], overflow flag = quotient needs > out_w limbs).
    Requires the division to be exact — guaranteed by IPGE; bit-exactness
    vs the Python-int oracle is asserted across the test corpus.
    """
    r = mag_shr_bits_vec(a, tz)
    q_full = mul_shared_mod(r, inv, inv.shape[-1])
    return truncate_mag(q_full, out_w)


def signed_divexact_shared(s_num, m_num, s_den, inv, tz, out_w: int):
    q, bad = divexact_shared(m_num, inv, tz, out_w)
    sign = s_num * s_den
    sign = jnp.where(jnp.all(q == 0, axis=-1), 0, sign)
    return sign, q, bad


# ---------------------------------------------------------------------------
# pairwise multiplication (per-entry operands) as grouped convolution
# ---------------------------------------------------------------------------

def _pairwise_conv(da: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """Full digit convolution per entry: [E, La] x [E, Lb] -> [E, La+Lb-1].

    Grouped 1-D convolution (feature_group_count = E): each entry's digits
    convolve with its own counterpart — E independent small convolutions in
    one XLA op, used for history updates where every entry has a different
    divisor inverse (gathered from the per-step rho-inverse table).
    """
    e, la = da.shape
    lb = db.shape[-1]
    out = lax.conv_general_dilated(
        da[None, :, :], db[:, None, ::-1],
        window_strides=(1,), padding=[(lb - 1, lb - 1)],
        feature_group_count=e,
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out[0]


def mul_pairwise(a: jnp.ndarray, b: jnp.ndarray, out_w: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """|a[e]| * |b[e]| per entry -> (mag [E, out_w], overflow flag [E])."""
    acc = _pairwise_conv(_to_digits(a), _to_digits(b))
    acc = jnp.pad(acc, ((0, 0), (0, 1)))   # even digit count
    digs, _ = normalize_unsigned(acc, 8)
    return truncate_mag(_from_digits(digs), out_w)


def mul_pairwise_mod(a: jnp.ndarray, b: jnp.ndarray, out_w: int
                     ) -> jnp.ndarray:
    """(|a[e]| * |b[e]|) mod 2**(16*out_w) per entry."""
    acc = _pairwise_conv(_to_digits(a), _to_digits(b))
    d = 2 * out_w
    if acc.shape[-1] >= d:
        acc = acc[..., :d]
    else:
        acc = jnp.pad(acc, ((0, 0), (0, d - acc.shape[-1])))
    digs, _ = normalize_unsigned(acc, 8)
    return _from_digits(digs)


def divexact_gathered(a: jnp.ndarray, inv: jnp.ndarray, tz: jnp.ndarray,
                      out_w: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact |a[e]| / |d[e]| with per-entry Hensel inverses.

    inv [E, check_w]: odd(d[e])^-1 mod 2**(16*check_w) (gathered from the
    per-step inverse table); tz [E]: trailing zero bits of each d[e].
    Same contract as divexact_shared, pairwise.
    """
    r = mag_shr_bits_vec(a, tz)
    q_full = mul_pairwise_mod(r, inv, inv.shape[-1])
    return truncate_mag(q_full, out_w)
