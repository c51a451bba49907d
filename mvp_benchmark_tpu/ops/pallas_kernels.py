"""Fused Pallas TPU kernels for the hot geometry ops.

Design notes (see /opt/skills/guides/pallas_guide.md):

- **Chamfer**: the jnp path materializes the (B, N, M) distance matrix in HBM
  (16 MB per batch element at 2048^2) and reads it back for two min-reductions
  — 3x HBM traffic on a matrix that never needs to exist. The kernel tiles
  rows of ``a`` (TN x M distance tiles resident in VMEM), reduces row-mins
  immediately, and accumulates column-mins across the sequential grid
  dimension, so HBM traffic is just the points + the (N,) outputs. This is
  the blockwise-attention idea applied to point clouds (SURVEY.md §5).
  Distances use exact per-coordinate differences (VPU) so the CUDA parity bar
  (dist MSE < 1e-8, reference utils/metrics/CD/unit_test.py) holds — an MXU
  expansion path would round through bf16.

- **FPS**: inherently sequential in the sample index (2048 greedy argmax
  steps). The jnp fallback launches one tiny XLA loop iteration per step with
  the (B, N) min-distance buffer bouncing through HBM. The kernel holds the
  per-batch-element distance buffer and the (3, N) coordinates resident in
  VMEM for the whole loop (grid = (B,)); each step is a handful of (1, N)
  VPU ops.

Outputs carry a singleton middle axis inside the kernels ((B, 1, N) blocks)
to satisfy the TPU tiling rule that the last two block dims be divisible by
(8, 128) or span the array. Both kernels run in interpreter mode off-TPU
(parity-tested against the jnp golden references).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvp_benchmark_tpu.ops import jnp_ref


def _interpret() -> bool:
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:
        return True


# ---------------------------------------------------------------------------
# Chamfer
# ---------------------------------------------------------------------------


def _chamfer_kernel(a_ref, b_ref, d1_ref, i1_ref, d2_ref, i2_ref, *, tn):
    i = pl.program_id(1)
    m = b_ref.shape[1]

    # Exact squared distances, one (TN, M) plane per coordinate.
    d = jnp.zeros((tn, m), jnp.float32)
    for c in range(3):
        diff = a_ref[0, :, c][:, None] - b_ref[0, :, c][None, :]
        d += diff * diff

    # Row direction: nearest b for each a row of this tile.
    d1_ref[0, 0, pl.ds(i * tn, tn)] = jnp.min(d, axis=1)
    i1_ref[0, 0, pl.ds(i * tn, tn)] = jnp.argmin(d, axis=1).astype(jnp.int32)

    # Column direction: accumulate min over row tiles (grid dim 1 is
    # sequential on TPU, so the d2/i2 blocks stay resident across i).
    cmin = jnp.min(d, axis=0)
    cidx = (jnp.argmin(d, axis=0) + i * tn).astype(jnp.int32)

    @pl.when(i == 0)
    def _():
        d2_ref[0, 0, :] = cmin
        i2_ref[0, 0, :] = cidx

    @pl.when(i > 0)
    def _():
        better = cmin < d2_ref[0, 0, :]
        i2_ref[0, 0, :] = jnp.where(better, cidx, i2_ref[0, 0, :])
        d2_ref[0, 0, :] = jnp.minimum(cmin, d2_ref[0, 0, :])


def _chamfer_tile(n: int) -> int:
    for tn in (256, 128, 64, 32, 16, 8):
        if n % tn == 0:
            return tn
    return n


def _chamfer_pallas(a: jnp.ndarray, b: jnp.ndarray):
    B, N, _ = a.shape
    M = b.shape[1]
    TN = _chamfer_tile(N)
    grid = (B, N // TN)

    d1, i1, d2, i2 = pl.pallas_call(
        functools.partial(_chamfer_kernel, tn=TN),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TN, 3), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, 3), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, N), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, N), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, M), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, M), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * M * 3,
            bytes_accessed=B * (N + M) * 3 * 4 + B * (N + M) * 8,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(a.astype(jnp.float32), b.astype(jnp.float32))
    return d1[:, 0, :], d2[:, 0, :], i1[:, 0, :], i2[:, 0, :]


@jax.custom_vjp
def chamfer_distance(
    a: jnp.ndarray, b: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused bidirectional chamfer (semantics == jnp_ref.chamfer_distance)."""
    return _chamfer_pallas(a, b)


def _chamfer_fwd(a, b):
    d1, d2, i1, i2 = _chamfer_pallas(a, b)
    return (d1, d2, i1, i2), (a, b, i1, i2)


def _chamfer_bwd(res, g):
    """CUDA-equivalent backward (chamfer3D.cu:155-174): +-2 g (p - q) routed
    through the argmin pairs, scatter-add on the opposite cloud."""
    a, b, i1, i2 = res
    g1, g2, _, _ = g
    b_sel = jnp.take_along_axis(b, i1[..., None], axis=1)
    a_sel = jnp.take_along_axis(a, i2[..., None], axis=1)
    diff1 = 2.0 * g1[..., None] * (a - b_sel)        # (B, N, 3)
    diff2 = 2.0 * g2[..., None] * (b - a_sel)        # (B, M, 3)

    scatter = jax.vmap(lambda acc, idx, upd: acc.at[idx].add(upd))
    da = diff1 + scatter(jnp.zeros_like(a), i2, -diff2)
    db = diff2 + scatter(jnp.zeros_like(b), i1, -diff1)
    return da, db


chamfer_distance.defvjp(_chamfer_fwd, _chamfer_bwd)


# ---------------------------------------------------------------------------
# Furthest point sampling
# ---------------------------------------------------------------------------


def _fps_kernel(xyz_ref, idx_ref, mind_ref, *, num_samples):
    """No grid: the WHOLE batch advances one greedy step per loop iteration
    (TPU grid dimensions execute sequentially, so a per-batch-element grid
    would serialize B x num_samples argmax steps — batching them into (B, N)
    vector ops is ~B times faster). xyz_ref: (B, 3, N); everything stays
    VMEM-resident across all iterations.

    Scalar VMEM stores are not lowerable on TPU, so point extraction and
    index writes are masked vector ops over the lane dimension.
    """
    B = xyz_ref.shape[0]
    n = xyz_ref.shape[2]
    lane = lax.broadcasted_iota(jnp.int32, (B, n), 1)
    out_lane = lax.broadcasted_iota(jnp.int32, (B, num_samples), 1)

    mind_ref[:, :] = jnp.full((B, n), 1e10, jnp.float32)
    idx_ref[:, :] = jnp.zeros((B, num_samples), jnp.int32)

    x = xyz_ref[:, 0, :]                                     # (B, N)
    y = xyz_ref[:, 1, :]
    z = xyz_ref[:, 2, :]

    def body(j, last):
        sel = lane == last[:, None]                          # (B, N)
        x0 = jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)
        y0 = jnp.sum(jnp.where(sel, y, 0.0), axis=1, keepdims=True)
        z0 = jnp.sum(jnp.where(sel, z, 0.0), axis=1, keepdims=True)
        d = (x - x0) ** 2 + (y - y0) ** 2 + (z - z0) ** 2    # (B, N)
        mind = jnp.minimum(mind_ref[:, :], d)
        mind_ref[:, :] = mind
        nxt = jnp.argmax(mind, axis=1).astype(jnp.int32)     # (B,)
        idx_ref[:, :] = jnp.where(out_lane == j, nxt[:, None], idx_ref[:, :])
        return nxt

    lax.fori_loop(1, num_samples, body, jnp.zeros((B,), jnp.int32))


def furthest_point_sample(xyz: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """VMEM-resident greedy FPS (semantics == jnp_ref.furthest_point_sample)."""
    B, N, _ = xyz.shape
    # Index selection is non-differentiable; cut tangents before the kernel
    # (pallas_call has no JVP rule).
    xyz = lax.stop_gradient(xyz)
    xyz_t = jnp.swapaxes(xyz, 1, 2).astype(jnp.float32)   # (B, 3, N)

    out = pl.pallas_call(
        functools.partial(_fps_kernel, num_samples=num_samples),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, num_samples), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
        interpret=_interpret(),
    )(xyz_t)
    return lax.stop_gradient(out)


# ---------------------------------------------------------------------------
# kNN
# ---------------------------------------------------------------------------


def _knn_kernel(q_ref, p_ref, idx_ref, dist_ref, *, k):
    """Grid=(B, M/TM). One (TM, N) distance tile in VMEM; k successive
    masked min/argmin passes emit neighbours in ascending-distance order
    (ties -> lowest index, matching lax.top_k on the negated matrix).
    Outputs are (1, k, TM) so every store is a full lane row.

    Distances: exact per-coordinate difference planes for C <= 64 (covers
    the parity-critical 3D geometric case and the benchmark's feature-space
    kNN at C in {24, 48}); MXU |q|^2+|p|^2-2qp^T expansion beyond that
    (bf16-rounded inputs: ~94% neighbour agreement on random features —
    only reachable via EFExpansion k=4 graph features in >=2x upsample
    configs).
    """
    tm = q_ref.shape[1]
    n = p_ref.shape[1]
    dim = q_ref.shape[2]

    if dim <= 64:
        d = jnp.zeros((tm, n), jnp.float32)
        for c in range(dim):
            diff = q_ref[0, :, c][:, None] - p_ref[0, :, c][None, :]
            d += diff * diff
    else:
        q = q_ref[0]                                          # (TM, C)
        p = p_ref[0]                                          # (N, C)
        q2 = jnp.sum(q * q, axis=1, keepdims=True)            # (TM, 1)
        p2 = jnp.sum(p * p, axis=1, keepdims=True)            # (N, 1)
        qp = jax.lax.dot_general(
            q, p, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d = jnp.maximum(q2 + p2.T - 2.0 * qp, 0.0)

    col = lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    for j in range(k):
        arg = jnp.argmin(d, axis=1).astype(jnp.int32)        # (TM,)
        cur = jnp.min(d, axis=1)
        idx_ref[0, j, :] = arg
        dist_ref[0, j, :] = cur
        d = jnp.where(col == arg[:, None], jnp.float32(jnp.inf), d)


def _knn_tile(m: int) -> int:
    # The (1, k, TM) output block requires TM to be a multiple of 128 or to
    # span the whole M dimension.
    for tm in (256, 128):
        if m % tm == 0:
            return tm
    return m


def knn_pallas(
    query: jnp.ndarray, points: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused kNN: (B, M, C) queries in (B, N, C) points -> (sqdist, idx),
    both (B, M, k), nearest first. The (B, M, N) distance matrix never leaves
    VMEM (the jnp path materializes it in HBM and runs lax.top_k over it).
    """
    B, M, C = query.shape
    N = points.shape[1]
    k = min(k, N)
    TM = _knn_tile(M)

    idx, dist = pl.pallas_call(
        functools.partial(_knn_kernel, k=k),
        grid=(B, M // TM),
        in_specs=[
            pl.BlockSpec((1, TM, C), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k, TM), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, TM), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, k, M), jnp.int32),
            jax.ShapeDtypeStruct((B, k, M), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * M * N * 3 + B * M * N * k,
            bytes_accessed=B * (M + N) * 12 + B * M * k * 8,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(query.astype(jnp.float32), points.astype(jnp.float32))
    return (
        jnp.swapaxes(dist, 1, 2),
        lax.stop_gradient(jnp.swapaxes(idx, 1, 2)),
    )


def knn_points(
    query: jnp.ndarray, points: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for jnp_ref.knn_points (negative squared dists, nearest first).

    The distance output stays differentiable like the reference's dense-torch
    computation: distances are recomputed from the gathered neighbours (the
    gradient flows through the selected pairs exactly as a topk-of-matrix
    backward would).
    """
    # The kernel has no VJP; neighbour selection is non-differentiable anyway.
    _, idx = knn_pallas(
        lax.stop_gradient(query), lax.stop_gradient(points), k
    )
    neigh = jnp_ref.grouping_operation(points, idx)          # (B, M, k, 3)
    d = jnp.sum((query[:, :, None, :] - neigh) ** 2, axis=-1)
    return -d, idx


def knn_indices(points: jnp.ndarray, k: int) -> jnp.ndarray:
    """Drop-in for jnp_ref.knn_indices (self included, nearest first)."""
    pts = lax.stop_gradient(points)
    _, idx = knn_pallas(pts, pts, min(k, points.shape[1]))
    return idx
