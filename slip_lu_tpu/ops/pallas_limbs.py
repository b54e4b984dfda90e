"""In-kernel multi-limb integer arithmetic for the fused Pallas kernels.

Representation: two's-complement residues mod 2**(16*W), stored as W
int32 "limbs" of 16 bits each, TRANSPOSED — shape [W, B] with the limb
axis on sublanes and the batch on lanes. Mosaic (axon TPU v5e) rejects
dynamic lane indexing, allows single-row dynamic sublane access
anywhere, and multi-row dynamic sublane access only at offsets provably
multiples of 8 (tools/probe_pallas_axon.py pins these rules down) —
every helper here stays inside them: convolutions iterate over the
multiplier's limbs with eight statically sub-shifted addend copies so
all dynamic stores land 8-aligned.

Two's complement (vs the XLA path's sign-magnitude, ops/matarith.py)
removes sign planes and magnitude compares entirely: products of W-limb
residues are corrected to the true signed product mod 2**(16*Wn) with
two cheap rank-1 terms, subtraction is complement+carry, and the Hensel
inverse of a NEGATIVE odd divisor works untouched because Newton
iteration is sign-blind mod 2**M. Exact division q = num * inv(odd(d))
* 2^-tz runs as a VERIFIED SHORT DIVISION at quotient-sized modulus
WQ = W+2: a wrapped quotient cannot pass the exact re-multiplication
check q*d == num (tpu/factor_fused._pass_body), so fits_in(q, W) plus
the verify flag is a SOUND overflow detector (this closes, by
construction, the class of silent-wrap bugs the round-1 advisor found
in the sign-magnitude kernels).

All functions are pure except the convolution, which takes two VMEM
scratch accumulator refs (read-modify-write at 8-aligned offsets).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

MASK16 = 0xFFFF
# per-limb byte-plane accumulator bound: Wb terms of two 255*255
# products each; keeps int32 headroom up to Wb ~ 16000 multiplier limbs
_PLANE = 2 * 255 * 255


def _cat(parts, axis=0):
    return jnp.concatenate([p for p in parts if p.shape[axis]], axis=axis)


def shift_rows_down(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[i] = x[i+k], zero-fill at top (static k); keeps length."""
    if k == 0:
        return x
    return _cat([x[k:], jnp.zeros((k,) + x.shape[1:], x.dtype)])


def shift_rows_up(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[i] = x[i-k], zero-fill at bottom (static k); keeps length."""
    if k == 0:
        return x
    return _cat([jnp.zeros((k,) + x.shape[1:], x.dtype), x[:-k]])


def carry_normalize(acc: jnp.ndarray, max_val: int) -> jnp.ndarray:
    """Resolve limb values in [0, max_val] to clean 16-bit limbs mod
    2**(16*D) (the dropped top carry IS the modular reduction).

    Static value-halving passes bring every limb to digit+carry with
    carry in {0,1}, then a Kogge-Stone generate/propagate prefix
    resolves worst-case ripple chains in log2(D) steps (the same
    construction as ops/pallas_kernels._normalize_block, base 2**16,
    transposed to the sublane axis).
    """
    d = acc.shape[0]
    v = acc
    bound = max_val
    while bound > 2 * MASK16 + 1:
        v = (v & MASK16) + shift_rows_up(v >> 16, 1)
        bound = MASK16 + (bound >> 16) + 1
    s = v & MASK16
    g = v >> 16                          # in {0, 1}
    p = (s == MASK16).astype(jnp.int32)
    dist = 1
    while dist < d:
        g = g | (p & shift_rows_up(g, dist))
        p = p & shift_rows_up(p, dist)
        dist *= 2
    carry_in = shift_rows_up(g, 1)
    return (s + carry_in) & MASK16


def mul_mod(a: jnp.ndarray, b_ref, b_row0: int, Wb: int,
            acc0_ref, acc1_ref, D: int,
            extra0=None, extra_row: int = 0) -> jnp.ndarray:
    """(a * b + extra0 * 2**(16*extra_row)) mod 2**(16*D) -> [D, B].

    a: [Wa, B] clean 16-bit limbs (registers). b is read row-wise from
    b_ref rows [b_row0, b_row0+Wb) — b_ref may be any VMEM ref (value
    table, inverse table, scratch). acc0/acc1: [>= Wa+Wb+17, B] VMEM
    scratch (bit-0 and bit-8 byte planes). extra0 (optional, clean
    nonnegative limbs [*, B]) is folded in before carry resolution —
    used for the signed-product corrections and complement constants.
    """
    Wa, B = a.shape
    z8 = jnp.zeros((8, B), jnp.int32)
    z9 = jnp.zeros((9, B), jnp.int32)
    a_lo = a & 0xFF
    a_hi = a >> 8
    acc0_ref[:] = jnp.zeros_like(acc0_ref)
    acc1_ref[:] = jnp.zeros_like(acc1_ref)
    if extra0 is not None:
        acc0_ref[extra_row:extra_row + extra0.shape[0], :] += extra0

    for s in range(8):
        lo_s = _cat([z8[:s], a_lo, z8[:8 - s]])          # len Wa+8
        hi_s = _cat([z8[:s], a_hi, z8[:8 - s]])
        hi_s1 = _cat([z9[:s + 1], a_hi, z9[:7 - s]])     # len Wa+8
        win = Wa + 8

        def body(m, _):
            qv = b_ref[pl.ds(b_row0 + 8 * m + s, 1), :]
            q_lo = qv & 0xFF
            q_hi = qv >> 8
            base = pl.multiple_of(8 * m, 8)
            # bit-0 plane: lo*lo at shift s, hi*hi at shift s+1
            acc0_ref[pl.ds(base, win), :] += lo_s * q_lo + hi_s1 * q_hi
            # bit-8 plane: lo*hi + hi*lo at shift s
            acc1_ref[pl.ds(base, win), :] += lo_s * q_hi + hi_s * q_lo
            return 0

        lax.fori_loop(0, (Wb - s + 7) // 8, body, 0)

    a0 = acc0_ref[:D + 1, :]
    a1 = acc1_ref[:D + 1, :]
    total = a0 + ((a1 & 0xFF) << 8) + shift_rows_up(a1 >> 8, 1)
    bound = Wb * _PLANE + (MASK16 << 8) + ((Wb * _PLANE) >> 8) \
        + (0 if extra0 is None else 2 * MASK16)
    return carry_normalize(total, bound)[:D]


def row_const(B: int, value: int, rows: int = 1) -> jnp.ndarray:
    return jnp.full((rows, B), value, jnp.int32)


def neg_flag(x: jnp.ndarray) -> jnp.ndarray:
    """[1, B] 0/1: sign bit of the two's-complement residue."""
    return x[-1:] >> 15


def sub_mod(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(x - y) mod 2**(16*D) on clean limbs, via complement + carry."""
    D, B = x.shape
    one0 = _cat([jnp.ones((1, B), jnp.int32),
                 jnp.zeros((D - 1, B), jnp.int32)])
    return carry_normalize(x + (MASK16 - y) + one0, 2 * MASK16 + 1)


def two_minus_mod(x: jnp.ndarray) -> jnp.ndarray:
    """(2 - x) mod 2**(16*D): the Newton-iteration complement."""
    D, B = x.shape
    three0 = _cat([jnp.full((1, B), 3, jnp.int32),
                   jnp.zeros((D - 1, B), jnp.int32)])
    return carry_normalize((MASK16 - x) + three0, MASK16 + 3)


def sign_fill(top_limb: jnp.ndarray) -> jnp.ndarray:
    """[1, B] -> 0x0000 / 0xFFFF per lane from a limb's sign bit."""
    return (top_limb >> 15) * MASK16


def fits_in(x: jnp.ndarray, W: int) -> jnp.ndarray:
    """[1, B] bool: does the D-limb residue x hold a signed value that
    fits in W limbs (rows >= W all equal the sign fill of row W-1)?"""
    fill = sign_fill(x[W - 1:W])
    return jnp.all(x[W:] == fill, axis=0, keepdims=True)


def sign_extend(x: jnp.ndarray, D: int) -> jnp.ndarray:
    """[W, B] -> [D, B] two's-complement extension (D >= W)."""
    W, B = x.shape
    if D == W:
        return x
    fill = jnp.broadcast_to(sign_fill(x[W - 1:W]), (D - W, B))
    return _cat([x, fill])


def trailing_zero_bits(x: jnp.ndarray) -> jnp.ndarray:
    """[1, B] trailing-zero bit count of residues [D, B] (16*D if 0).

    Prefix-OR by log-step doubling (Mosaic has no cumsum primitive)."""
    D = x.shape[0]
    nz = (x != 0).astype(jnp.int32)
    pref = nz                                        # any nz at row <= i
    dist = 1
    while dist < D:
        pref = pref | shift_rows_up(pref, dist)
        dist *= 2
    first = nz & ~shift_rows_up(pref, 1)             # first nonzero limb
    low = jnp.sum(jnp.where(first != 0, x, 0), axis=0, keepdims=True)
    limb_idx = jnp.sum(1 - pref, axis=0, keepdims=True)
    lowbit = low & -low
    fbits = lax.bitcast_convert_type(lowbit.astype(jnp.float32),
                                     jnp.int32)
    tz16 = jnp.where(lowbit != 0, (fbits >> 23) - 127, 16)
    return 16 * limb_idx + tz16


def shr_bits(x: jnp.ndarray, tz: jnp.ndarray, max_limb_shift: int
             ) -> jnp.ndarray:
    """ARITHMETIC right shift of residues by per-lane bit counts tz
    [1, B] — the full-width residue of floor(x / 2**tz).

    A logical shift would zero the top tz bits, which is wrong for
    negative residues (their full-width residue needs sign fill); for
    the exact divisions here x is divisible by 2**tz, so the arithmetic
    shift IS the exact quotient's residue. Limb part via binary
    decomposition (static row shifts selected per lane), bit part via a
    funnel shift, both filling with the sign.
    """
    D, B = x.shape
    fill = sign_fill(x[-1:])                          # [1, B]
    q = tz >> 4
    r = tz & 15
    m = x
    b = 1
    while b <= max_limb_shift:
        shifted = _cat([m[b:], jnp.broadcast_to(fill, (b, B))])
        m = jnp.where((q & b) != 0, shifted, m)
        b *= 2
    nxt = _cat([m[1:], fill])
    return ((m >> r) | ((nxt << (16 - r)) & MASK16)) & MASK16


def inv16(d: jnp.ndarray) -> jnp.ndarray:
    """[1, B] Newton inverse mod 2**16 of odd values (int32 wraparound
    keeps every product exact mod 2**16, which is all that's needed)."""
    x = d & MASK16
    for _ in range(4):
        x = (x * (2 - d * x)) & MASK16
    return x


def is_zero(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(x == 0, axis=0, keepdims=True)
