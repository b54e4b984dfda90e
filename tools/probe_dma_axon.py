"""Probe: Mosaic (axon TPU v5e) rules for HBM<->VMEM row DMAs.

Questions this pins down (for the HBM-resident value table design in
tpu/factor_fused.py):
  1. dynamic-row gather: make_async_copy(hbm.at[pl.ds(i,1)], vmem.at[e], sem)
     inside lax.fori_loop with a TRACED row index and sem array indexed
     by the loop var — issue-all then wait-all in a second loop;
  2. scatter-back: VMEM row -> HBM dynamic row, wait-all;
  3. interpret mode equivalence on CPU.

Run: python tools/probe_dma_axon.py   (axon default; JAX_PLATFORMS=cpu
for the interpret check)
"""

import os
import sys

try:  # prefer the installed package (pip install -e .)
    import slip_lu_tpu  # noqa: F401
except ImportError:  # bare checkout: fall back to the repo root
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    return jax.default_backend() not in ("tpu", "axon")


def kernel(idx_ref, tbl_hbm, out_hbm, outv, gat, sems, wsems):
    C = gat.shape[0]

    def issue(e, _):
        i = idx_ref[0, e]
        pltpu.make_async_copy(tbl_hbm.at[pl.ds(i, 1), :],
                              gat.at[pl.ds(e, 1), :],
                              sems.at[e]).start()
        return 0

    lax.fori_loop(0, C, issue, 0)

    def wait(e, _):
        i = idx_ref[0, e]
        pltpu.make_async_copy(tbl_hbm.at[pl.ds(i, 1), :],
                              gat.at[pl.ds(e, 1), :],
                              sems.at[e]).wait()
        return 0

    lax.fori_loop(0, C, wait, 0)

    outv[:] = gat[:] * 2 + 1

    def wb(e, _):
        i = idx_ref[0, e]
        pltpu.make_async_copy(outv.at[pl.ds(e, 1), :],
                              out_hbm.at[pl.ds(i, 1), :],
                              wsems.at[e]).start()
        return 0

    lax.fori_loop(0, C, wb, 0)

    def wbwait(e, _):
        i = idx_ref[0, e]
        pltpu.make_async_copy(outv.at[pl.ds(e, 1), :],
                              out_hbm.at[pl.ds(i, 1), :],
                              wsems.at[e]).wait()
        return 0

    lax.fori_loop(0, C, wbwait, 0)


@functools.partial(jax.jit, static_argnames=("C", "W"))
def run(idx, tbl, C, W):
    R = tbl.shape[0]
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((C, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, W), jnp.int32),
            jax.ShapeDtypeStruct((C, W), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((C, W), jnp.int32),
            pltpu.SemaphoreType.DMA((C,)),
            pltpu.SemaphoreType.DMA((C,)),
        ],
        interpret=_interpret(),
    )(idx[None, :], tbl)


def main():
    C, W, R = 16, 128, 1000
    rng = np.random.default_rng(0)
    tbl = rng.integers(0, 1000, (R, W)).astype(np.int32)
    idx = rng.permutation(R)[:C].astype(np.int32)
    hbm_out, v = run(jnp.asarray(idx), jnp.asarray(tbl), C, W)
    v = np.asarray(v)
    ok_v = (v == tbl[idx] * 2 + 1).all()
    hb = np.asarray(hbm_out)
    ok_h = (hb[idx] == tbl[idx] * 2 + 1).all()
    print(f"gather ok: {ok_v}; scatter-back ok: {ok_h}")


if __name__ == "__main__":
    main()
