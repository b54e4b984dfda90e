"""Fast-tier unit coverage of the segment-boundary relift primitives.

tpu/relift.py is otherwise exercised mostly by the slow forced-segment
end-to-end ladder (tests/test_segments.py); these direct tests keep the
fast gate sensitive to relift regressions: sign-extension (widen_tc /
widen_val in both layouts) and the Newton Hensel re-lift (relift_gt)
checked against exact Python-int arithmetic.
"""

import numpy as np
import pytest

from slip_lu_tpu.tpu import relift as rl
from slip_lu_tpu.tpu.factor_fused import ints_to_tc_rows, tc_rows_to_ints


def test_widen_tc_sign_extends_exactly(rng):
    vals = [int(v) for v in rng.integers(-(10**18), 10**18, size=40)]
    vals += [0, 1, -1, 2**63 - 1, -(2**63)]
    rows = ints_to_tc_rows(vals, 5)
    wide = np.asarray(rl.widen_tc(np.asarray(rows), 5, 12))
    assert wide.shape == (len(vals), 12)
    assert tc_rows_to_ints(wide) == vals
    # no-op path returns the input unchanged
    same = rl.widen_tc(np.asarray(rows), 5, 5)
    assert np.array_equal(np.asarray(same), rows)


@pytest.mark.parametrize("hbm_old,hbm_new", [
    (False, False), (False, True), (True, False), (True, True)])
def test_widen_val_layouts(rng, hbm_old, hbm_new):
    E8 = 16
    W_old, W_new = 6, 10
    vals = [int(a) * (10**9) + int(b)
            for a, b in zip(rng.integers(-(10**11), 10**11, size=E8),
                            rng.integers(0, 10**9, size=E8))]
    flat = np.zeros((E8, rl._r128(W_old) if hbm_old else W_old),
                    dtype=np.int32)
    flat[:, :W_old] = ints_to_tc_rows(vals, W_old)
    if hbm_old:
        flat = flat.reshape(E8 * (rl._r128(W_old) // 128), 128)
    out = np.asarray(rl.widen_val(np.asarray(flat), E8, W_old, W_new,
                                  hbm_old, hbm_new))
    if hbm_new:
        out = out.reshape(E8, -1)
    assert tc_rows_to_ints(out[:, :W_new]) == vals


def test_relift_gt_newton_lift_exact(rng):
    """Stored inverses mod 2**(16*WIo) re-lift to exact inverses of the
    odd parts mod 2**(16*WIn)."""
    W8, WIo, WIn = 8, 8, 16
    n8 = 24
    rhos = [1]                           # row 0 = identity
    for _ in range(n8 - 1):
        v = ((int(rng.integers(1, 10**13)) * 10**12
              + int(rng.integers(0, 10**12)))
             * (2 ** int(rng.integers(0, 9))))
        rhos.append(v if rng.random() < 0.5 else -v)
    SMT = np.asarray(ints_to_tc_rows(rhos, W8), dtype=np.int32)
    TZ = np.zeros((n8, 8), dtype=np.int32)
    GT_old = np.zeros((n8, WIo), dtype=np.int32)
    mod_o, mod_n = 1 << (16 * WIo), 1 << (16 * WIn)
    odds = []
    for r, v in enumerate(rhos):
        tz = (v & -v).bit_length() - 1 if v else 0
        odd = v >> tz
        TZ[r, :] = tz
        odds.append(odd)
        GT_old[r] = ints_to_tc_rows([pow(odd, -1, mod_o)], WIo)[0]
    out = np.asarray(rl.relift_gt(np.asarray(SMT), np.asarray(GT_old),
                                  np.asarray(TZ), W8, WIo, WIn))
    assert out.shape == (n8, WIn)
    for r, odd in enumerate(odds):
        got = int.from_bytes(
            out[r].astype(np.uint16).tobytes(), "little")
        assert (got * odd) % mod_n == 1, r
    # WIn <= WIo: pure truncation
    trunc = np.asarray(rl.relift_gt(np.asarray(SMT), np.asarray(GT_old),
                                    np.asarray(TZ), W8, WIo, 4))
    assert np.array_equal(trunc, GT_old[:, :4])
