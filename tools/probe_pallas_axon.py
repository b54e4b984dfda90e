"""Probe Mosaic/axon capabilities needed by the fused sparse kernel.

Findings so far (axon TPU v5e):
  * dynamic SUBLANE (second-to-last dim) ref indexing: OK (row gather);
  * dynamic LANE (last dim) ref indexing: REJECTED unless provably a
    multiple of 128 — so limb convolutions must run with limbs on the
    sublane axis (transposed layout);
checked here:
  1. dynamic row gather from a VMEM table inside fori_loop;
  2. digit convolution with limbs on sublanes ([W, B] layout);
  3. in-kernel transpose [B, W] <-> [W, B];
  4. per-grid-step cost of a chunk-shaped body (gather + transpose +
     conv + normalize) — is a pallas_call one runtime op-quantum?

Run me directly:  python tools/probe_pallas_axon.py
"""

import functools
import os
import sys
import time

try:  # prefer the installed package (pip install -e .)
    import slip_lu_tpu  # noqa: F401
except ImportError:  # bare checkout: fall back to the repo root
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def interpret():
    return jax.default_backend() not in ("tpu", "axon")


# ---------------------------------------------------------------- probe 1
def gather_kernel(idx_ref, table_ref, out_ref):
    C = out_ref.shape[0]

    def body(i, _):
        out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(idx_ref[i], 1), :]
        return 0

    jax.lax.fori_loop(0, C, body, 0)


@jax.jit
def gather_rows(idx, table):
    C = idx.shape[0]
    return pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct((C, table.shape[1]), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret(),
    )(idx, table)


# ------------------------------------------------- probe 2: sublane conv
# Mosaic: multi-row dynamic sublane offsets must be 8-aligned; single-row
# dynamic access is fine. So the conv loops over 8-aligned bases with 8
# static sub-shifts of the multiplicand.
def conv_kernel(a_ref, b_ref, out_ref, acc_ref):
    Wa, B = a_ref.shape
    Wb = b_ref.shape[0]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    z = jnp.zeros((8, B), jnp.int32)
    a_pad = jnp.concatenate([a_ref[:], z], axis=0)     # [Wa+8, B]

    for s in range(8):                                  # static sub-shift
        a_s = (jnp.concatenate([z[:s], a_ref[:], z[:8 - s]], axis=0)
               if s else a_pad)

        def body(m, _):
            v = 8 * m + s
            qv = b_ref[pl.ds(v, 1), :]                  # [1, B] single row
            base = pl.multiple_of(8 * m, 8)
            acc_ref[pl.ds(base, Wa + 8), :] += a_s * qv
            return 0

        jax.lax.fori_loop(0, (Wb + 7 - s) // 8, body, 0)
    out_ref[:] = acc_ref[:out_ref.shape[0]]


@jax.jit
def conv_limbs_T(a, b):
    Wa, B = a.shape
    Wb = b.shape[0]
    D = Wa + Wb
    return pl.pallas_call(
        conv_kernel,
        out_shape=jax.ShapeDtypeStruct((D, B), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((D + 16, B), jnp.int32)],
        interpret=interpret(),
    )(a, b)


# ------------------------------------------------- probe 3: transpose
def transpose_kernel(x_ref, out_ref):
    out_ref[:] = x_ref[:].T


@jax.jit
def transpose(x):
    return pl.pallas_call(
        transpose_kernel,
        out_shape=jax.ShapeDtypeStruct((x.shape[1], x.shape[0]), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret(),
    )(x)


# ---------------------------------------------- probe 4: chunk-shaped body
def chunkish_kernel(idx_ref, table_ref, out_ref, gat_ref, acc_ref, gt_ref):
    C, Wrow = gat_ref.shape

    def gbody(i, _):
        gat_ref[pl.ds(i, 1), :] = table_ref[pl.ds(idx_ref[i], 1), :]
        return 0

    jax.lax.fori_loop(0, C, gbody, 0)
    gt_ref[:] = gat_ref[:].T                 # [Wrow, C]
    g = gt_ref[:]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    z = jnp.zeros((8, C), jnp.int32)
    for s in range(8):
        parts = ([z[:s]] if s else []) + [g] + ([z[:8 - s]] if 8 - s else [])
        g_s = jnp.concatenate(parts, axis=0)

        def cbody(m, _):
            qv = gt_ref[pl.ds(8 * m + s, 1), :]
            base = pl.multiple_of(8 * m, 8)
            acc_ref[pl.ds(base, Wrow + 8), :] += g_s * qv
            return 0

        jax.lax.fori_loop(0, (Wrow + 7 - s) // 8, cbody, 0)
    v = acc_ref[:]
    for _ in range(3):
        v = (v & 0xFFFF) + jnp.concatenate(
            [jnp.zeros_like(v[:1, :]), (v >> 16)[:-1, :]], axis=0)
    i = pl.program_id(0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = v[:Wrow, :].T


@functools.partial(jax.jit, static_argnames=("steps",))
def chunkish(idx, table, steps):
    C = idx.shape[0]
    Wrow = table.shape[1]
    return pl.pallas_call(
        chunkish_kernel,
        out_shape=jax.ShapeDtypeStruct((C, Wrow), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((C, Wrow), jnp.int32),
                            pltpu.VMEM((2 * Wrow + 16, C), jnp.int32),
                            pltpu.VMEM((Wrow, C), jnp.int32)],
        ),
        interpret=interpret(),
    )(idx, table)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 16, size=(1024, 96)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 1024, size=256), jnp.int32)

    out = np.asarray(jax.block_until_ready(gather_rows(idx, table)))
    ref = np.asarray(table)[np.asarray(idx)]
    assert np.array_equal(out, ref), "gather mismatch"
    print("probe1 gather: OK")

    x = jnp.asarray(rng.integers(0, 1 << 30, size=(256, 96)), jnp.int32)
    out = np.asarray(jax.block_until_ready(transpose(x)))
    assert np.array_equal(out, np.asarray(x).T), "transpose mismatch"
    print("probe3 transpose: OK")

    a = jnp.asarray(rng.integers(0, 256, size=(96, 256)), jnp.int32)
    b = jnp.asarray(rng.integers(0, 256, size=(96, 256)), jnp.int32)
    out = np.asarray(jax.block_until_ready(conv_limbs_T(a, b)))
    an, bn = np.asarray(a, np.int64), np.asarray(b, np.int64)
    refc = np.zeros((192, 256), np.int64)
    for v in range(96):
        refc[v:v + 96, :] += an * bn[v:v + 1, :]
    assert np.array_equal(out, refc.astype(np.int32)), "conv mismatch"
    print("probe2 sublane conv: OK")

    for steps in (1, 16, 64):
        f = lambda: jax.block_until_ready(chunkish(idx, table, steps))
        f()  # compile
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            f()
        dt = (time.perf_counter() - t0) / reps
        print(f"probe4 steps={steps:3d}: {dt*1e3:8.3f} ms total, "
              f"{dt/steps*1e6:8.1f} us/step")


if __name__ == "__main__":
    main()
