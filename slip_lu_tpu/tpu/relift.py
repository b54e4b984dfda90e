"""Between-segment glue for the adaptive-width fused factor path.

The factor stream runs as width SEGMENTS (backslash_fused plans them):
IPGE values at elimination level L need only ~L/n of the final limb
width, so early chunks run in a pallas_call with much narrower static
shapes — the MAC cost of every event is quadratic in width, which is
where wide-W matrices (tri1000 W=176, uni100k W=256) spend their time.

At a segment boundary the persistent tables must move to the next
width:

  * value table / SMT (two's-complement rows): plain sign-extension,
    `widen_tc` / `widen_val_hbm` below (pure XLA, fused into the next
    program);
  * GT (Hensel inverses of the pivots mod 2**(16*WI)): a residue mod a
    SMALLER modulus is not sign-extendable — it must be RE-LIFTED to
    the wider modulus. Newton doubling (x' = x*(2 - d*x)) squares the
    precision per step, so ceil(log2(WIn/WIo)) steps recover every
    stored inverse exactly; `relift_gt` runs them as one small Pallas
    kernel over 128-row lane blocks (reference anchor: the one-off
    mpz inverses inside SLIP_LU's history updates have no table to
    maintain — the table and its re-lift are artifacts of the
    static-schedule design).

Soundness does not depend on the segment width model: every kernel
write is overflow-checked at a modulus where the true quotient fits
(ops/pallas_limbs.py), so an undersized segment costs a per-segment
widen-and-retry, never a wrong answer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import pallas_limbs as pk


def _r128(x: int) -> int:
    return ((x + 127) // 128) * 128


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def widen_tc(x: jnp.ndarray, W_old: int, W_new: int) -> jnp.ndarray:
    """Sign-extend [R, >=W_old] two's-complement limb rows to [R, W_new].

    Columns past W_old are ignored (the kernels only read [:W_old];
    HBM-mode rows zero-pad to the 128-lane DMA granularity)."""
    if W_new == W_old and x.shape[1] == W_old:
        return x
    R = x.shape[0]
    fill = jnp.where(x[:, W_old - 1:W_old] >= 0x8000, 0xFFFF, 0)
    return jnp.concatenate(
        [x[:, :W_old],
         jnp.broadcast_to(fill, (R, W_new - W_old)).astype(jnp.int32)],
        axis=1)


def widen_val(val: jnp.ndarray, E8: int, W_old: int, W_new: int,
              hbm_old: bool, hbm_new: bool) -> jnp.ndarray:
    """Move the value table to the next segment's width and layout.

    VMEM layout is [E8, W8]; HBM layout is [E8*KR, 128] with each slot
    as KR consecutive 128-lane rows (factor_fused docstring). Values
    are two's complement at W_old limbs; lanes beyond W_old hold zeros
    (the kernels write zero fill there), so the sign lives in limb
    W_old-1 and widening is sign-extension + re-pad."""
    if hbm_old:
        KRo = val.shape[0] // E8
        val = val.reshape(E8, KRo * 128)
    wide = widen_tc(val, W_old, W_new)
    if hbm_new:
        WH = _r128(W_new)
        pad = WH - W_new
        if pad:
            wide = jnp.concatenate(
                [wide, jnp.zeros((E8, pad), jnp.int32)], axis=1)
        return wide.reshape(E8 * (WH // 128), 128)
    return wide


def _relift_kernel(SMT, GT_old, TZ, GT_new, sd, su, acc0, acc1,
                   *, W8, WIo, WIn, steps):
    """One 128-row lane block: Newton-lift the stored Hensel inverses
    from modulus 2**(16*WIo) to 2**(16*WIn).

    Rows ride the LANE axis ([W, 128] limb-major registers); unwritten
    (all-zero) GT rows stay zero (0 * anything = 0), the identity row
    stays 1."""
    rho = SMT[:].T[:W8]                                 # [W8, 128]
    tz = TZ[:].T[0:1]                                   # [1, 128]
    d = pk.shr_bits(pk.sign_extend(rho, WIn), tz, W8)   # odd part
    # residues mod the smaller modulus ZERO-extend (they are the low
    # limbs of the wider inverse's Newton seed, not signed values)
    xo = GT_old[:].T[:WIo]
    x = pk._cat([xo, jnp.zeros((WIn - WIo, 128), jnp.int32)]) \
        if WIn > WIo else xo[:WIn]
    sd[:] = d
    for _ in range(steps):
        t = pk.mul_mod(x, sd, 0, WIn, acc0, acc1, WIn)
        su[:] = pk.two_minus_mod(t)
        x = pk.mul_mod(x, su, 0, WIn, acc0, acc1, WIn)
    GT_new[:] = x.T


@functools.partial(jax.jit, static_argnames=("W8", "WIo", "WIn"))
def relift_gt(SMT: jnp.ndarray, GT_old: jnp.ndarray, TZ: jnp.ndarray,
              W8: int, WIo: int, WIn: int) -> jnp.ndarray:
    """[n8, WIo] inverse table -> [n8, WIn], exact mod 2**(16*WIn).

    SMT must already be at the new segment's width (>= W8 columns)."""
    if WIn <= WIo:
        return GT_old[:, :WIn]
    n8 = SMT.shape[0]
    R = _r128(n8)
    if R != n8:
        pad = R - n8
        SMT = jnp.concatenate(
            [SMT, jnp.zeros((pad, SMT.shape[1]), jnp.int32)])
        GT_old = jnp.concatenate(
            [GT_old, jnp.zeros((pad, WIo), jnp.int32)])
        TZ = jnp.concatenate([TZ, jnp.zeros((pad, 8), jnp.int32)])
    steps = 0
    w = WIo
    while w < WIn:
        w *= 2
        steps += 1
    kern = functools.partial(_relift_kernel, W8=W8, WIo=WIo, WIn=WIn,
                             steps=steps)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, WIn), jnp.int32),
        grid=(R // 128,),
        in_specs=[
            pl.BlockSpec((128, SMT.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((128, WIo), lambda i: (i, 0)),
            pl.BlockSpec((128, 8), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((128, WIn), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((WIn, 128), jnp.int32),          # sd
            pltpu.VMEM((WIn, 128), jnp.int32),          # su
            pltpu.VMEM((2 * WIn + 24, 128), jnp.int32),  # acc0
            pltpu.VMEM((2 * WIn + 24, 128), jnp.int32),  # acc1
        ],
        interpret=_interpret(),
    )(SMT, GT_old, TZ)
    return out[:n8]
