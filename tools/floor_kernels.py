#!/usr/bin/env python
"""[INSTRUMENT INVALID — kept for reference] stripped-kernel floor attempt.

Status (round 5): the numbers this tool produces are internally
inconsistent — its stripped kernels time SLOWER than the full production
kernels they are supposed to lower-bound (plane_min at (64, 3072^2) reads
~49 ms where the full knn_pallas kernel measures 12.2 ms; onehot_mm at the
group_max shape reads 111 ms where the full op runs 5.5 ms), with a
pathological dependence on the M/N ratio that the production kernels do
not show. Some Mosaic layout/pipelining pathology in this formulation is
being measured, not the hardware floor. Do NOT cite its output. The
measured-floor audit in PERF.md instead uses the production kernels'
standalone microbenchmarks (tools/bench_knn.py, tools/bench_chamfer.py),
which the in-step attribution matches launch-for-launch.

Second data point (same session): rewriting the kernels with the
production chamfer access pattern (full (M, 3)/(N, 3) blocks per batch
element, in-kernel sublane slicing) and casting the one-hot table to bf16
in-kernel changed NOTHING — the same bimodal result reproduces exactly
(M <= N shapes: ~45-50 ms regardless of size, down to a (64, 384^2) row
that does 1/64 the work of L1; M > N shapes: 2-5 ms), with per-grid-step
overhead differing ~50x at identical per-step FLOPs. The effect is keyed
on the M-vs-N relationship, not on data volume, aliasing, dtype, or DMA
granularity — an unexplained Mosaic scheduling/pipelining interaction this
exact formulation triggers and the production kernels do not.

Original intent: MEASURED per-component floors for the VRCNet v5e audit.

The round-4 floor audit priced each step component at analytic datasheet
rates; VERDICT r4 requires floors that are *measured best-case kernel
runs*. This tool times two stripped Pallas kernels that do ONLY the work
any implementation of the component must do, at the exact in-step shapes:

- ``plane_min``: the (TM, N) 3-coordinate squared-distance plane plus a
  single row-min reduction. Lower bound for any kNN / chamfer-forward /
  three_nn launch (they all must touch every (query, point) pair once and
  reduce it); the real kernels add selection state on top.
- ``onehot_mm``: ONE (TM, N) iota-compare mask build plus ONE bf16
  (TM, N) x (N, C) MXU matmul per tile. Lower bound for any one-hot
  gather/scatter launch (SA aggregation, group_max, chamfer backward,
  three_interpolate): each must build at least one membership mask and
  contract it once.

Protocol: chained reps, one scalar pull (PERF.md chained-sync); the first
timed window of the process is discarded (per-process first-window
artifact, PERF.md round 5). Device time == wall only on a quiet host, but
relative floors hold in any window because device kernel time is
window-stable (PERF.md round-5 attribution note).

Usage: python tools/floor_kernels.py [reps]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def _plane_min_kernel(q_ref, p_ref, out_ref, *, tn):
    # Chamfer-kernel access pattern: the WHOLE (N, 3) blocks are resident
    # per batch element; the query tile is an in-kernel sublane slice.
    # (The first revision block-mapped a (1, TN, 3) query tile per grid
    # step — per-step 3-lane-wide DMAs — and timed 4-20x SLOWER than the
    # full production kernels; see the header note.)
    i = pl.program_id(1)
    n = p_ref.shape[1]
    d = jnp.zeros((tn, n), jnp.float32)
    for c in range(3):
        qc = q_ref[0, pl.ds(i * tn, tn), c]
        d += (qc[:, None] - p_ref[0, :, c][None, :]) ** 2
    out_ref[0, 0, pl.ds(i * tn, tn)] = jnp.min(d, axis=1)


def plane_min(q, p):
    B, M, _ = q.shape
    N = p.shape[1]
    TN = 256 if M % 256 == 0 else 128
    return pl.pallas_call(
        functools.partial(_plane_min_kernel, tn=TN),
        grid=(B, M // TN),
        in_specs=[
            pl.BlockSpec((1, M, 3), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 3), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, M), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, M), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * M * N * 3, bytes_accessed=B * (M + N) * 12,
            transcendentals=0),
    )(q, p)


def _onehot_mm_kernel(idx_ref, t_ref, out_ref, *, tm):
    i = pl.program_id(1)
    n = t_ref.shape[0]
    col = lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    ii = idx_ref[0, 0, pl.ds(i * tm, tm)]
    oh = (col == ii[:, None]).astype(jnp.bfloat16)
    out_ref[0] = jnp.dot(oh, t_ref[...].astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)


def onehot_mm(idx, table):
    B, M = idx.shape
    N, C = table.shape
    TM = 256 if M % 256 == 0 else 128
    return pl.pallas_call(
        functools.partial(_onehot_mm_kernel, tm=TM),
        grid=(B, M // TM),
        in_specs=[
            pl.BlockSpec((1, 1, M), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TM, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * N * C, bytes_accessed=B * (M * C * 4 + N * C * 2),
            transcendentals=0),
    )(idx.reshape(B, 1, M), table)


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    rng = np.random.default_rng(0)
    f_plane = jax.jit(plane_min)
    f_oh = jax.jit(onehot_mm)

    # Throwaway first window (per-process artifact).
    q = jnp.asarray(rng.random((8, 256, 3), np.float32))
    timeit(f_plane, q, q)

    # kNN family launches: self-kNN x4 + three_nn x3 (target, source).
    print("# plane_min floors (any kNN/chamfer-fwd/three_nn launch)")
    knn_shapes = [
        ("self-kNN L1", 64, 3072, 3072), ("self-kNN L2", 64, 1536, 1536),
        ("self-kNN L3", 64, 768, 768), ("self-kNN L4", 64, 384, 384),
        ("three_nn u1", 64, 1536, 768), ("three_nn u2", 64, 3072, 1536),
        ("three_nn dec", 32, 2048, 2048),
        ("chamfer 2048x2048", 64, 2048, 2048),
        ("chamfer 1024x2048", 64, 1024, 2048),
    ]
    total_knn = 0.0
    for name, B, M, N in knn_shapes:
        q = jnp.asarray(rng.random((B, M, 3), np.float32))
        p = q if M == N and "self" in name else jnp.asarray(
            rng.random((B, N, 3), np.float32))
        ms = timeit(f_plane, q, p)
        print(f"  {name:18s} B{B} M{M} N{N}: {ms:7.2f} ms", flush=True)
        total_knn += ms

    # One-hot contraction launches at SA / group_max / chamfer-bwd scale.
    print("# onehot_mm floors (any one-hot gather/scatter launch)")
    oh_shapes = [
        ("SA L1 gather", 64, 3072 * 1, 3072, 128),   # per-(k-slab) pass
        ("group_max L1", 64, 1536, 3072, 64),
        ("chamfer bwd", 64, 2048, 2048, 128),
        ("ti up", 64, 3072, 1536, 128),
    ]
    for name, B, M, N, C in oh_shapes:
        idx = jnp.asarray(rng.integers(0, N, (B, M)).astype(np.int32))
        table = jnp.asarray(rng.random((N, C), np.float32).astype(np.float32))
        ms = timeit(f_oh, idx, table)
        print(f"  {name:18s} B{B} M{M} N{N} C{C}: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
