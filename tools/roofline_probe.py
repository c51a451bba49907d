#!/usr/bin/env python
"""Chip roofline calibration for the PERF.md floor audit.

Measures, under the chained-sync protocol:
  - MXU bf16 TFLOP/s (8192^3 matmul; v5e datasheet peak 197)
  - HBM GB/s (1 GiB f32 elementwise add: 3 streams; v5e datasheet 819)
  - VPU f32 elem-ops/s (chained elementwise FMA on a VMEM-resident tile)

These three numbers calibrate the per-component floor derivations: the
floor audit prices one-hot contractions against the MEASURED MXU rate,
stream kernels against the MEASURED HBM rate, and sweep/extraction kernels
against the MEASURED VPU rate — not datasheet peaks. Also the quickest way
to detect tunnel-chip contention (a shared chip deflates all three).

Usage: python tools/roofline_probe.py [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 30


def _chain(f, x, reps=REPS):
    r = f(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(r)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def mxu_tflops():
    n = 8192
    a = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def f(x):
        return (x @ a).astype(jnp.bfloat16)

    dt = _chain(f, a)
    return 2 * n**3 / dt / 1e12, dt


def hbm_gbps():
    # 2-D tile (1-D layouts measured 5x under; lane-major 2-D streams
    # saturate). read + write: 2 streams.
    x = jnp.ones((8192, 8192), jnp.float32)  # 256 MiB

    @jax.jit
    def f(x):
        return x + 1.0

    dt = _chain(f, x)
    return 2 * x.size * 4 / dt / 1e9, dt


def vpu_eops():
    # Pallas kernel: (512, 2048) f32 tile resident in VMEM, 512 dependent
    # abs-multiply-add passes in-kernel. abs() breaks the affine chain
    # (XLA collapses y*c+d chains to one fma); an XLA-level chain also
    # round-trips HBM per op (measured at HBM rate, not VPU rate) — only a
    # kernel keeps the chain register/VMEM-resident.
    from jax.experimental import pallas as pl

    R = 512
    x = jnp.full((512, 2048), 1.0000001, jnp.float32)

    def kern(x_ref, o_ref):
        y = x_ref[...]
        for _ in range(R):
            y = jnp.abs(y) * 1.0000001 + 1e-9
        o_ref[...] = y

    f = jax.jit(lambda x: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x))
    dt = _chain(f, x)
    return 3 * R * x.size / dt / 1e12, dt


def main():
    d = jax.devices()[0]
    print(f"device: {d.device_kind} ({d.platform})")
    t, dt = mxu_tflops()
    print(f"MXU bf16: {t:.1f} TFLOP/s  ({dt * 1e3:.2f} ms/iter; datasheet 197)")
    g, dt = hbm_gbps()
    print(f"HBM: {g:.0f} GB/s  ({dt * 1e3:.2f} ms/iter; datasheet 819)")
    v, dt = vpu_eops()
    print(f"VPU f32: {v:.2f} Teop/s  ({dt * 1e3:.2f} ms/iter)")


if __name__ == "__main__":
    main()
