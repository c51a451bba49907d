"""Micro-benchmark: neighbour-gather strategies on the real TPU chip.

The VRCNet profile (PERF.md) attributes ~45ms/step to forward neighbour
gathers and ~80ms to their scatter-add backwards. This compares:

  1. XLA take_along_axis (current grouping_operation) fwd / fwd+bwd
  2. Pallas kernel with jnp.take on a VMEM-resident table (if it lowers)
  3. Pallas one-hot matmul gather, bf16 one-hot x fp32 table split bf16x2

Shapes = VRCNet level 1 in train (batch doubles): B=64, N=3072, k=16, C=20.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, K, C = 64, 3072, 16, 20
M = N * K


def sync(out):
    # block_until_ready under-reports through the axon tunnel; a host pull
    # of one element is a true sync.
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, *args, n=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((B, N, C), np.float32) )
    idx = jnp.asarray(rng.integers(0, N, (B, M)), jnp.int32)
    g = jnp.asarray(rng.standard_normal((B, M, C), np.float32))

    # --- 1. XLA take_along_axis ---
    @jax.jit
    def xla_gather(t, i):
        return jnp.take_along_axis(t, i[..., None], axis=1)

    @jax.jit
    def xla_gather_vjp(t, i, ct):
        out, vjp = jax.vjp(lambda tt: jnp.take_along_axis(tt, i[..., None], axis=1), t)
        return vjp(ct)[0]

    print(f"xla gather fwd:      {timeit(xla_gather, table, idx):8.2f} ms")
    print(f"xla gather bwd:      {timeit(xla_gather_vjp, table, idx, g):8.2f} ms")

    # --- 2. Pallas jnp.take from VMEM ---
    TM = 512

    def take_kernel(t_ref, i_ref, o_ref):
        m = pl.program_id(1)
        ii = i_ref[0, 0, pl.ds(m * TM, TM)]
        o_ref[0] = jnp.take(t_ref[0], ii, axis=0)

    def pallas_take(t, i):
        return pl.pallas_call(
            take_kernel,
            grid=(B, M // TM),
            in_specs=[
                pl.BlockSpec((1, N, C), lambda b, m: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, M), lambda b, m: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TM, C), lambda b, m: (b, m, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, M, C), jnp.float32),
        )(t, i.reshape(B, 1, M))

    try:
        f = jax.jit(pallas_take)
        out = f(table, idx)
        ref = xla_gather(table, idx)
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"pallas take fwd:     {timeit(f, table, idx):8.2f} ms  (maxerr {err:.1e})")
    except Exception as e:
        print(f"pallas take: FAILED: {str(e)[:200]}")

    # --- 3. Pallas one-hot matmul, bf16x2 exact ---
    def onehot_kernel(t_hi_ref, t_lo_ref, i_ref, o_ref):
        m = pl.program_id(1)
        ii = i_ref[0, 0, pl.ds(m * TM, TM)]               # (TM,)
        col = lax.broadcasted_iota(jnp.int32, (TM, N), 1)
        oh = (col == ii[:, None]).astype(jnp.bfloat16)
        hi = jnp.dot(oh, t_hi_ref[0], preferred_element_type=jnp.float32)
        lo = jnp.dot(oh, t_lo_ref[0], preferred_element_type=jnp.float32)
        o_ref[0] = hi + lo

    def pallas_onehot(t, i):
        hi = t.astype(jnp.bfloat16)
        lo = (t - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return pl.pallas_call(
            onehot_kernel,
            grid=(B, M // TM),
            in_specs=[
                pl.BlockSpec((1, N, C), lambda b, m: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, C), lambda b, m: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, M), lambda b, m: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TM, C), lambda b, m: (b, m, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, M, C), jnp.float32),
        )(hi, lo, i.reshape(B, 1, M))

    try:
        f = jax.jit(pallas_onehot)
        out = f(table, idx)
        ref = xla_gather(table, idx)
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"pallas onehot fwd:   {timeit(f, table, idx):8.2f} ms  (maxerr {err:.1e})")
    except Exception as e:
        print(f"pallas onehot: FAILED: {str(e)[:200]}")

    # --- 4. Pallas one-hot scatter-add (the backward direction) ---
    def scatter_kernel(g_hi_ref, g_lo_ref, i_ref, o_ref):
        m = pl.program_id(1)
        ii = i_ref[0, 0, pl.ds(m * TM, TM)]               # (TM,)
        col = lax.broadcasted_iota(jnp.int32, (TM, N), 1)
        oh = (col == ii[:, None]).astype(jnp.bfloat16)    # (TM, N)
        hi = jax.lax.dot_general(
            oh, g_hi_ref[0], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        lo = jax.lax.dot_general(
            oh, g_lo_ref[0], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(m == 0)
        def _():
            o_ref[0] = jnp.zeros_like(o_ref[0])
        o_ref[0] += hi + lo

    def pallas_scatter(ct, i):
        hi = ct.astype(jnp.bfloat16)
        lo = (ct - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return pl.pallas_call(
            scatter_kernel,
            grid=(B, M // TM),
            in_specs=[
                pl.BlockSpec((1, TM, C), lambda b, m: (b, m, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TM, C), lambda b, m: (b, m, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, M), lambda b, m: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, N, C), lambda b, m: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        )(hi, lo, i.reshape(B, 1, M))

    try:
        f = jax.jit(pallas_scatter)
        out = f(g, idx)
        ref = xla_gather_vjp(table, idx, g)
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"pallas onehot bwd:   {timeit(f, g, idx):8.2f} ms  (maxerr {err:.1e})")
    except Exception as e:
        print(f"pallas scatter: FAILED: {str(e)[:250]}")


if __name__ == "__main__":
    main()
