"""Pallas TPU kernels for the hot limb ops.

The XLA path (matarith.py) runs the digit-conv matmul and the carry
resolution as separate HLOs, bouncing the [B, D] int32 accumulator
through HBM between them. The Pallas kernel fuses them: each grid block
loads its digit tile into VMEM, runs the Toeplitz contraction on the
MXU, and resolves carries in-register before writing final 16-bit limbs
— one HBM round trip instead of four.

Carry resolution here is fully static (Pallas prefers bounded control
flow over the data-dependent while_loop the XLA path uses): a few
value-halving passes bring every carry into {0, 1}, then a Kogge-Stone
generate/propagate prefix scan (log2 D steps) resolves worst-case ripple
chains exactly — the classic parallel-adder construction, applied along
the digit axis.

Use is gated by use_pallas() (TPU platform or SLIP_PALLAS=1; interpret
mode on CPU for tests). Bit-exactness vs the XLA path is asserted in
tests/test_pallas.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

def use_pallas() -> bool:
    """Whether the fused Pallas path is enabled.

    SLIP_PALLAS=1 forces on (interpret mode off-TPU), =0 forces off.
    Default: on for the standard `tpu` backend; the tunneled `axon`
    platform stays on the XLA path until Mosaic lowering is validated
    there (flip with SLIP_PALLAS=1).
    """
    force = os.environ.get("SLIP_PALLAS", "")
    if force == "0":
        return False
    if force == "1":
        return True
    # Validated bit-exact on TPU v5e (incl. worst-case ripple carries)
    # and ~1.4x faster end-to-end than the unfused XLA path.
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _reduction_passes(max_acc: int) -> int:
    """Static pass count bringing accumulator values into carry in {0,1}."""
    passes = 0
    v = max_acc
    while v > 256:
        v = 255 + (v >> 8)
        passes += 1
    return max(passes, 1)


def _normalize_block(acc, d, passes):
    """In-kernel carry resolution: reduction passes + Kogge-Stone prefix."""
    def red(_, v):
        digs = v & 0xFF
        car = v >> 8
        shifted = jnp.concatenate(
            [jnp.zeros_like(car[:, :1]), car[:, :-1]], axis=1)
        return digs + shifted

    v = jax.lax.fori_loop(0, passes, red, acc)
    # v in [0, 256]; one more fold gives digits + single-bit generate
    s = v & 0xFF
    g = v >> 8                     # in {0, 1}: carry generated INTO i+1
    p = (s == 255).astype(jnp.int32)
    # Kogge-Stone: carry_in[i+1] = g[i] | (p[i] & carry_in[i])
    # prefix over pairs (g, p) with (g2,p2)∘(g1,p1) = (g2|p2&g1, p2&p1)
    dist = 1
    while dist < d:
        g_sh = jnp.concatenate(
            [jnp.zeros_like(g[:, :dist]), g[:, :-dist]], axis=1)
        p_sh = jnp.concatenate(
            [jnp.zeros_like(p[:, :dist]), p[:, :-dist]], axis=1)
        g = g | (p & g_sh)
        p = p & p_sh
        dist *= 2
    carry_in = jnp.concatenate(
        [jnp.zeros_like(g[:, :1]), g[:, :-1]], axis=1)
    return (s + carry_in) & 0xFF


# MXU constraint: Mosaic has no int32 matmul. Digits are <= 255 (exact in
# the MXU's bf16 input passes) and chains of <= _MAX_K digit products sum
# below 2**24 (exact f32 accumulation), so the contraction runs in f32 and
# casts back to int32 losslessly.
_MAX_K = 257  # K * 255^2 < 2^24


def _mul_shared_kernel(da_ref, t_ref, out_ref, *, passes, d):
    acc_f = jax.lax.dot_general(
        da_ref[:].astype(jnp.float32), t_ref[:].astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[:] = _normalize_block(acc_f.astype(jnp.int32), d, passes)


@functools.partial(jax.jit, static_argnames=("d_out",))
def mul_shared_digits_pallas(da: jnp.ndarray, t: jnp.ndarray,
                             d_out: int) -> jnp.ndarray:
    """Digit batch [B, La] x Toeplitz [La, D] -> limbs [B, D//2].

    The fused conv+normalize used by matarith.mul_shared/_mod when
    use_pallas() is on. d_out must be even; the product must fit in D
    digits (guaranteed by the callers' width choices). The kernel emits
    normalized 8-bit digits; the digit->limb fold stays outside (Mosaic
    rejects the in-kernel [B, D] -> [B, D/2, 2] shape cast).
    """
    b, la = da.shape
    d = d_out
    assert d % 2 == 0 and t.shape == (la, d)
    assert la <= _MAX_K, "caller must fall back to the XLA path"
    max_acc = la * 255 * 255
    passes = _reduction_passes(max_acc)
    tb = 256
    b_pad = ((b + tb - 1) // tb) * tb
    if b_pad != b:
        da = jnp.pad(da, ((0, b_pad - b), (0, 0)))
    digs = pl.pallas_call(
        functools.partial(_mul_shared_kernel, passes=passes, d=d),
        out_shape=jax.ShapeDtypeStruct((b_pad, d), jnp.int32),
        grid=(b_pad // tb,),
        in_specs=[
            pl.BlockSpec((tb, la), lambda i: (i, 0)),
            pl.BlockSpec((la, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, d), lambda i: (i, 0)),
        interpret=_interpret(),
    )(da, t)
    digs = digs[:b]
    return digs[:, 0::2] + (digs[:, 1::2] << 8)
