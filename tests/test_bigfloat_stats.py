"""BigFloat (the MPFR equivalent) and SolveStats unit coverage.

BigFloat reference behavior: MPFR-style round-to-prec in the four
rounding modes (reference: SLIP_gmp.c mpfr wrappers;
slip_cast_array.c fp64<->mpfr<->mpq chains). Every BigFloat is an
exact dyadic rational, so expected values are computed with Fraction.
"""

import math
from fractions import Fraction

import pytest

from slip_lu_tpu.bigfloat import BigFloat, _as_fraction
from slip_lu_tpu.options import RoundMode
from slip_lu_tpu.stats import SolveStats, last_stats, phase_timer, record


# ---------------------------------------------------------------- BigFloat

def test_from_int_exact_and_canonical():
    b = BigFloat.from_int(48)
    assert b.to_fraction() == 48
    # canonical: odd mantissa (48 = 3 * 2^4)
    assert b.mantissa == 3 and b.exponent == 4
    assert BigFloat.from_int(0).mantissa == 0
    assert not BigFloat.from_int(0)
    assert BigFloat.from_int(-5).to_fraction() == -5


def test_from_float_exact_dyadic():
    for v in (0.5, -3.25, 1e-12, 2.0 ** 60, -0.1):
        assert BigFloat.from_float(v).to_fraction() == Fraction(v)
        assert BigFloat.from_float(v).to_float() == v


def test_from_float_rejects_nonfinite():
    for v in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError):
            BigFloat.from_float(v)


def _ref_round(v: Fraction, prec: int, mode: RoundMode) -> Fraction:
    """Independent MPFR-style rounding model: normalize |v| to
    [2^(prec-1), 2^prec) mantissa scale, round per mode, renormalize
    on carry. Pure Fraction arithmetic — the test oracle."""
    if v == 0:
        return Fraction(0)
    neg = v < 0
    a = abs(v)
    e = a.numerator.bit_length() - a.denominator.bit_length() - prec
    while a / Fraction(2) ** e >= 2 ** prec:
        e += 1
    while a / Fraction(2) ** e < 2 ** (prec - 1):
        e -= 1
    scaled = a / Fraction(2) ** e
    q = math.floor(scaled)
    r = scaled - q
    if r == 0:
        m = q
    elif mode == RoundMode.ZERO:
        m = q
    elif mode == RoundMode.UP:
        m = q if neg else q + 1
    elif mode == RoundMode.DOWN:
        m = q + 1 if neg else q
    else:
        m = q + 1 if (r > Fraction(1, 2)
                      or (r == Fraction(1, 2) and q % 2 == 1)) else q
    if m == 2 ** prec:
        m //= 2
        e += 1
    out = Fraction(m) * Fraction(2) ** e
    return -out if neg else out


@pytest.mark.parametrize("mode", [RoundMode.NEAREST, RoundMode.ZERO,
                                  RoundMode.UP, RoundMode.DOWN])
@pytest.mark.parametrize("prec", [4, 8, 53])
def test_rounding_modes_match_fraction_model(mode, prec):
    """BigFloat rounding equals the independent Fraction model
    EXACTLY, for non-dyadic rationals in every mode/precision."""
    for num, den in ((1, 3), (-1, 3), (2, 7), (-22, 7), (355, 113),
                     (-1, 10), (10 ** 9 + 7, 97), (1, 2 ** 40 + 1)):
        v = Fraction(num, den)
        b = BigFloat.from_fraction(v, prec, mode)
        assert abs(b.mantissa).bit_length() <= prec
        assert b.to_fraction() == _ref_round(v, prec, mode), (
            num, den, prec, mode)


def test_nearest_ties_to_even():
    # 5/2 at prec such that the tie decides: value q + 1/2 exactly
    # 0b101 at prec 2 -> mantissa candidates 0b10 (even) / 0b11 (odd)
    b = BigFloat.from_fraction(Fraction(5), 2, RoundMode.NEAREST)
    assert b.to_fraction() == 4           # ties to even: 5 -> 4 at 2 bits
    b = BigFloat.from_fraction(Fraction(7), 2, RoundMode.NEAREST)
    assert b.to_fraction() == 8           # 7 = 0b111 -> 0b10 << 2


def test_rounding_carry_out():
    """0.111..1 rounding up must carry into one extra bit (mantissa
    renormalizes, value doubles scale)."""
    prec = 4
    v = Fraction(2 ** prec - 1, 2 ** prec) + Fraction(1, 2 ** (prec + 1))
    b = BigFloat.from_fraction(v, prec, RoundMode.NEAREST)
    assert b.to_fraction() == 1
    b2 = BigFloat.from_fraction(Fraction(31, 16), 4, RoundMode.UP)
    assert b2.to_fraction() == 2


def test_to_int_round_all_modes():
    v = BigFloat.from_fraction(Fraction(7, 2), 53)   # 3.5
    assert v.to_int_round(RoundMode.DOWN) == 3
    assert v.to_int_round(RoundMode.UP) == 4
    assert v.to_int_round(RoundMode.ZERO) == 3
    assert v.to_int_round(RoundMode.NEAREST) == 4    # ties to even: 3.5->4
    w = BigFloat.from_fraction(Fraction(5, 2), 53)   # 2.5 -> 2 (even)
    assert w.to_int_round(RoundMode.NEAREST) == 2
    neg = BigFloat.from_fraction(Fraction(-7, 2), 53)
    assert neg.to_int_round(RoundMode.DOWN) == -4
    assert neg.to_int_round(RoundMode.UP) == -3
    assert neg.to_int_round(RoundMode.ZERO) == -3
    exact = BigFloat.from_int(12)
    assert exact.to_int_round() == 12


def test_comparisons_and_identities():
    a = BigFloat.from_int(3)
    b = BigFloat.from_fraction(Fraction(7, 2), 53)
    assert a < b and a <= b
    assert a == 3 and a == Fraction(3) and a == 3.0
    assert (a == "x") is False or True     # NotImplemented path
    assert a.__eq__("x") is NotImplemented
    assert -a == -3 and abs(-a) == 3
    assert hash(a) == hash(Fraction(3))
    assert "BigFloat" in repr(a)
    assert _as_fraction(0.5) == Fraction(1, 2)
    assert _as_fraction(a) == 3
    assert _as_fraction(7) == 7


def test_bigfloat_roundtrip_precision_loss_is_bounded():
    v = Fraction(10 ** 30 + 7, 3)
    for prec in (24, 53, 128):
        b = BigFloat.from_fraction(v, prec)
        rel = abs(b.to_fraction() - v) / v
        assert rel <= Fraction(1, 2 ** (prec - 1))


# --------------------------------------------------------------- SolveStats

def test_stats_phase_timer_accumulates_and_summary():
    st = SolveStats(backend="host", n=4, nnz=9, nrhs=1, W=2, Ws=3,
                    lnz=5, unz=4, retries=1, fallback=True)
    with phase_timer(st, "factor"):
        pass
    with phase_timer(st, "factor"):       # accumulate same phase
        pass
    with phase_timer(st, "solve"):
        pass
    assert set(st.phases) == {"factor", "solve"}
    assert st.total_s >= 0 and st.nnz_per_s >= 0
    s = st.summary()
    assert "backend=host" in s and "lnz=5" in s
    assert "retries=1" in s and "fallback=dense" in s
    assert "total" in s
    record(st)
    assert last_stats() is st


def test_stats_zero_time_nnz_per_s():
    st = SolveStats(nnz=10)
    assert st.nnz_per_s == 0.0
    assert "backend=" in st.summary()
