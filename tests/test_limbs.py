"""Property tests of the limb arithmetic vs Python ints (the exact oracle).

Every op must be bit-exact for all magnitudes up to its width budget —
these are the TPU replacements for GMP mpz ops (reference: SLIP_gmp.c),
so exactness here is what makes the device factorization exact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slip_lu_tpu.ops import arith
from slip_lu_tpu.ops.limbs import LIMB_BITS, ints_to_limbs, limbs_to_ints

W = 8  # 128-bit test width
RNG = np.random.default_rng(987)


def rand_ints(n, bits, signed=True, nonzero=False):
    out = []
    for _ in range(n):
        b = int(RNG.integers(0, bits + 1))
        v = int.from_bytes(RNG.bytes(16), "little") % (2 ** max(b, 1))
        if nonzero and v == 0:
            v = 1
        if signed and RNG.random() < 0.5:
            v = -v
        out.append(v)
    return out


def test_pack_roundtrip():
    vals = rand_ints(50, 120) + [0, 1, -1, 2 ** 127 - 1, -(2 ** 127 - 1)]
    s, m = ints_to_limbs(vals, W)
    back = limbs_to_ints(s, m)
    assert list(back) == vals


def test_pack_overflow_detected():
    with pytest.raises(OverflowError):
        ints_to_limbs([2 ** (16 * W)], W)


def test_mag_add_sub_cmp():
    a = [abs(v) for v in rand_ints(64, 120, signed=False)]
    b = [abs(v) for v in rand_ints(64, 120, signed=False)]
    _, ma = ints_to_limbs(a, W)
    _, mb = ints_to_limbs(b, W)
    add, ovf = arith.mag_add(jnp.array(ma), jnp.array(mb), W + 1)
    got = limbs_to_ints(np.ones(64, np.int32), np.asarray(add))
    assert list(got) == [x + y for x, y in zip(a, b)]
    assert not np.asarray(ovf).any()
    cmp = np.asarray(arith.mag_cmp(jnp.array(ma), jnp.array(mb)))
    want_cmp = [(x > y) - (x < y) for x, y in zip(a, b)]
    assert list(cmp) == want_cmp
    big = [max(x, y) for x, y in zip(a, b)]
    small = [min(x, y) for x, y in zip(a, b)]
    _, mbig = ints_to_limbs(big, W)
    _, msmall = ints_to_limbs(small, W)
    sub = np.asarray(arith.mag_sub(jnp.array(mbig), jnp.array(msmall)))
    got = limbs_to_ints(np.ones(64, np.int32), sub)
    assert list(got) == [x - y for x, y in zip(big, small)]


def test_mag_add_overflow_flag():
    _, ma = ints_to_limbs([2 ** 127], W)
    _, mb = ints_to_limbs([2 ** 127], W)
    _, ovf = arith.mag_add(jnp.array(ma), jnp.array(mb), W)
    assert np.asarray(ovf).all()


def test_mag_mul_exact():
    a = [abs(v) for v in rand_ints(48, 60, signed=False)]
    b = [abs(v) for v in rand_ints(48, 60, signed=False)]
    _, ma = ints_to_limbs(a, W)
    _, mb = ints_to_limbs(b, W)
    prod, ovf = arith.mag_mul(jnp.array(ma), jnp.array(mb), 2 * W)
    got = limbs_to_ints(np.ones(48, np.int32), np.asarray(prod))
    assert list(got) == [x * y for x, y in zip(a, b)]
    assert not np.asarray(ovf).any()


def test_mag_mul_overflow_flag():
    _, ma = ints_to_limbs([2 ** 100], W)
    _, mb = ints_to_limbs([2 ** 100], W)
    _, ovf = arith.mag_mul(jnp.array(ma), jnp.array(mb), W)  # 200 bits > 128
    assert np.asarray(ovf).all()


def test_mag_mul_broadcast_divisor_style():
    """[N, W] x [W] broadcasting (shared multiplier, like rho)."""
    a = [abs(v) for v in rand_ints(16, 60, signed=False)]
    r = 0x1234_5678_9ABC
    _, ma = ints_to_limbs(a, W)
    _, mr = ints_to_limbs([r], W)
    prod, _ = arith.mag_mul(jnp.array(ma), jnp.array(mr[0]), 2 * W)
    got = limbs_to_ints(np.ones(16, np.int32), np.asarray(prod))
    assert list(got) == [x * r for x in a]


def test_inv16():
    odd = jnp.array([1, 3, 5, 0xFFFF, 0x1235, 12345], dtype=jnp.int32)
    inv = np.asarray(arith.inv16(odd))
    for d, i in zip(np.asarray(odd), inv):
        assert (int(d) * int(i)) % (1 << 16) == 1


def test_trailing_zero_bits():
    vals = [1, 2, 12, 2 ** 16, 2 ** 40, 3 << 33, 2 ** 100, 6]
    _, m = ints_to_limbs(vals, W)
    tz = np.asarray(arith.trailing_zero_bits(jnp.array(m)))
    want = [(v & -v).bit_length() - 1 for v in vals]
    assert list(tz) == want


def test_mag_shr_bits():
    vals = [abs(v) for v in rand_ints(20, 120, signed=False)]
    _, m = ints_to_limbs(vals, W)
    for shift in [0, 1, 7, 16, 17, 33, 64, 100]:
        out = np.asarray(arith.mag_shr_bits(jnp.array(m), jnp.int32(shift)))
        got = limbs_to_ints(np.ones(20, np.int32), out)
        assert list(got) == [v >> shift for v in vals], shift


@pytest.mark.parametrize("dbits", [5, 16, 17, 40, 60])
def test_divexact_random(dbits):
    n = 32
    ds = []
    quots = []
    for _ in range(n):
        d = int(RNG.integers(1, 2 ** dbits))
        q = int(RNG.integers(0, 2 ** 50))
        ds.append(d)
        quots.append(q)
    nums = [d * q for d, q in zip(ds, quots)]
    _, mn = ints_to_limbs(nums, W)
    _, md = ints_to_limbs(ds, W)
    d_odd, inv0, tz = arith.div_precompute(jnp.array(md))
    q, bad = arith.mag_divexact(jnp.array(mn), d_odd, inv0, tz, W)
    got = limbs_to_ints(np.ones(n, np.int32), np.asarray(q))
    assert list(got) == quots
    assert not np.asarray(bad).any()


def test_divexact_shared_divisor():
    d = 9876543210  # even
    quots = [abs(v) for v in rand_ints(16, 60, signed=False)]
    nums = [d * q for q in quots]
    _, mn = ints_to_limbs(nums, W)
    _, md = ints_to_limbs([d], W)
    d_odd, inv0, tz = arith.div_precompute(jnp.array(md[0]))
    q, bad = arith.mag_divexact(jnp.array(mn), d_odd, inv0, tz, W)
    got = limbs_to_ints(np.ones(16, np.int32), np.asarray(q))
    assert list(got) == quots
    assert not np.asarray(bad).any()


def test_divexact_inexact_flag():
    _, mn = ints_to_limbs([7], W)
    _, md = ints_to_limbs([3], W)
    d_odd, inv0, tz = arith.div_precompute(jnp.array(md))
    _, bad = arith.mag_divexact(jnp.array(mn), d_odd, inv0, tz, W)
    assert np.asarray(bad).all()


def test_signed_add_all_sign_combos():
    pairs = [(5, 3), (3, 5), (-5, 3), (5, -3), (-5, -3), (0, 7), (7, 0),
             (0, 0), (-4, 4), (4, -4), (2 ** 90, -(2 ** 89)), (-(2 ** 90), 2 ** 90)]
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    sa, ma = ints_to_limbs(a, W)
    sb, mb = ints_to_limbs(b, W)
    s, m, ovf = arith.signed_add(jnp.array(sa), jnp.array(ma),
                                 jnp.array(sb), jnp.array(mb), W)
    got = limbs_to_ints(np.asarray(s), np.asarray(m))
    assert list(got) == [x + y for x, y in zip(a, b)]
    assert not np.asarray(ovf).any()


def test_signed_mul_and_sub_random():
    a = rand_ints(40, 55)
    b = rand_ints(40, 55)
    sa, ma = ints_to_limbs(a, W)
    sb, mb = ints_to_limbs(b, W)
    s, m, _ = arith.signed_mul(jnp.array(sa), jnp.array(ma),
                               jnp.array(sb), jnp.array(mb), W)
    got = limbs_to_ints(np.asarray(s), np.asarray(m))
    assert list(got) == [x * y for x, y in zip(a, b)]
    s2, m2, _ = arith.signed_sub(jnp.array(sa), jnp.array(ma),
                                 jnp.array(sb), jnp.array(mb), W)
    got2 = limbs_to_ints(np.asarray(s2), np.asarray(m2))
    assert list(got2) == [x - y for x, y in zip(a, b)]


def test_ipge_update_formula_end_to_end():
    """One full IPGE update in limb arithmetic vs Python ints:
    x' = (rho*x - l*xj) / rho_prev, exactly."""
    rho_prev, rho = 37, -913
    xs = rand_ints(24, 40)
    ls = rand_ints(24, 40)
    xj = 7919
    # ensure exact divisibility by constructing x' then x
    want = [(rho * x - l * xj) for x, l in zip(xs, ls)]
    want = [w * rho_prev for w in want]  # make the dividend divisible
    num = want
    sn, mn = ints_to_limbs(num, 2 * W)
    _, md = ints_to_limbs([abs(rho_prev)], W)
    d_odd, inv0, tz = arith.div_precompute(jnp.array(md[0]))
    s, q, bad = arith.signed_divexact(jnp.array(sn), jnp.array(mn),
                                      jnp.int32(np.sign(rho_prev)),
                                      d_odd, inv0, tz, W)
    got = limbs_to_ints(np.asarray(s), np.asarray(q))
    assert list(got) == [w // rho_prev for w in want]
    assert not np.asarray(bad).any()


def test_jit_compatibility():
    f = jax.jit(lambda a, b: arith.mag_mul(a, b, 2 * W))
    _, ma = ints_to_limbs([123456789], W)
    _, mb = ints_to_limbs([987654321], W)
    prod, _ = f(jnp.array(ma), jnp.array(mb))
    assert limbs_to_ints(np.ones(1, np.int32), np.asarray(prod))[0] == 123456789 * 987654321
