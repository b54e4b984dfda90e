"""Second probe batch: kernel I/O patterns for the fused sparse kernels.

  5. SMEM-blocked input streamed per grid step (event tables) + scalar
     reads from it driving dynamic VMEM indexing;
  6. input/output aliasing with a constant-index whole-array block:
     do unwritten rows keep the input's values across grid steps?
  7. two's-complement building blocks: per-lane variable limb shift via
     binary decomposition + elementwise Newton inverse mod 2^16.
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


# ------------------------------------------ probe 5: SMEM event streaming
def smem_kernel(ev_ref, table_ref, out_ref):
    C = ev_ref.shape[1]

    def body(i, _):
        t = ev_ref[0, i, 0]
        out_ref[pl.ds(i, 1), :] += table_ref[pl.ds(t, 1), :]
        return 0

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    jax.lax.fori_loop(0, C, body, 0)


@jax.jit
def smem_stream(ev, table):
    nc, C, F = ev.shape
    return pl.pallas_call(
        smem_kernel,
        out_shape=jax.ShapeDtypeStruct((C, table.shape[1]), jnp.int32),
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((1, C, F), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(table.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, table.shape[1]), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret(),
    )(ev, table)


# ------------------------------------------ probe 6: io-alias revisiting
def alias_kernel(x_ref, out_ref):
    i = pl.program_id(0)
    out_ref[pl.ds(8 * i, 8), :] += 1


@jax.jit
def alias_inc(x, steps):
    return pl.pallas_call(
        alias_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        grid=(steps,),
        in_specs=[pl.BlockSpec(x.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(x.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        interpret=interpret(),
    )(x)


# ------------------------- probe 7: variable limb shift + newton inverse
def shift_inv_kernel(m_ref, q_ref, out_ref, inv_ref):
    W, B = m_ref.shape
    m = m_ref[:]
    q = q_ref[0:1, :]                       # [1, B] per-lane limb shifts
    b = 1
    while b < W:
        shifted = jnp.concatenate(
            [m[b:], jnp.zeros((b, B), jnp.int32)], axis=0)
        m = jnp.where((q & b) != 0, shifted, m)
        b *= 2
    out_ref[:] = m
    # elementwise Newton inverse mod 2**16 of odd low limbs
    d = m_ref[0:1, :] | 1
    x = d
    for _ in range(4):
        x = (x * (2 - d * x)) & 0xFFFF
    inv_ref[:] = x & 0xFFFF


@jax.jit
def shift_inv(m, q):
    W, B = m.shape
    return pl.pallas_call(
        shift_inv_kernel,
        out_shape=(jax.ShapeDtypeStruct((W, B), jnp.int32),
                   jax.ShapeDtypeStruct((1, B), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret(),
    )(m, q)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    table = jnp.asarray(rng.integers(0, 1000, size=(512, 128)), jnp.int32)
    ev = jnp.asarray(rng.integers(0, 512, size=(6, 64, 3)), jnp.int32)
    out = np.asarray(jax.block_until_ready(smem_stream(ev, table)))
    ref = np.zeros((64, 128), np.int64)
    for c in range(6):
        for i in range(64):
            ref[i] += np.asarray(table)[int(ev[c, i, 0])]
    assert np.array_equal(out, ref.astype(np.int32)), "smem stream mismatch"
    print("probe5 smem event streaming: OK")

    x = jnp.asarray(rng.integers(0, 100, size=(32, 128)), jnp.int32)
    out = np.asarray(jax.block_until_ready(alias_inc(x, 4)))
    assert np.array_equal(out, np.asarray(x) + 1), \
        f"alias mismatch: {out[0, 0]} vs {np.asarray(x)[0, 0] + 1}"
    print("probe6 io-alias revisit: OK")

    m = jnp.asarray(rng.integers(0, 1 << 16, size=(64, 128)), jnp.int32)
    q = jnp.asarray(rng.integers(0, 64, size=(1, 128)), jnp.int32)
    outs = jax.block_until_ready(shift_inv(m, q))
    sh, inv = (np.asarray(o) for o in outs)
    mn = np.asarray(m)
    for lane in range(128):
        qq = int(q[0, lane])
        exp = np.concatenate([mn[qq:, lane], np.zeros(qq, np.int64)])
        assert np.array_equal(sh[:, lane], exp.astype(np.int32)), lane
        d = int(mn[0, lane]) | 1
        assert (int(inv[0, lane]) * d) % (1 << 16) == 1, lane
    print("probe7 variable shift + newton inv16: OK")


if __name__ == "__main__":
    main()
