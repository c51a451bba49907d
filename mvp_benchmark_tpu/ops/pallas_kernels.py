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
# Synthetic-flop audit
# ---------------------------------------------------------------------------
#
# The one-hot MXU kernels below report their REAL arithmetic (the one-hot
# contractions the MXU executes) in ``cost_estimate``, and XLA's compiled
# cost analysis folds those numbers into the step's flop count. For an MFU
# *utilization* number that is honest about useful work, the bookkeeping
# flops — O(M*N*C) matmuls performing O(M*C) gathers/scatters — must be
# separated out. Each such call site records, at TRACE time, the synthetic
# flops its cost estimate contributes and the useful-math flops the op
# logically performs; ``bench.py`` traces the train step under
# ``flop_audit()`` and reports ``mfu_useful`` alongside the raw number.

_FLOP_AUDIT = None


def _audit_flops(synthetic: float, useful: float = 0.0) -> None:
    if _FLOP_AUDIT is not None:
        _FLOP_AUDIT["synthetic"] += float(synthetic)
        _FLOP_AUDIT["useful"] += float(useful)


class flop_audit:
    """Context manager: collect {synthetic, useful} flops from every one-hot
    kernel call traced inside the block (per traced call, i.e. per step when
    tracing one jitted train step)."""

    def __enter__(self):
        global _FLOP_AUDIT
        self._prev = _FLOP_AUDIT
        _FLOP_AUDIT = {"synthetic": 0.0, "useful": 0.0}
        return _FLOP_AUDIT

    def __exit__(self, *exc):
        global _FLOP_AUDIT
        _FLOP_AUDIT = self._prev
        return False


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


def _chamfer_bwd_kernel(a_ref, b_ref, i1_ref, g1_ref, i2_ref, g2_ref,
                        da_ref, *, tn):
    """One direction of the chamfer backward as masked VPU reductions:

        da[n] = 2 g1[n] (a[n] - b[i1[n]])
                - 2 sum_m [i2[m] == n] g2[m] (b[m] - a[n])

    The XLA formulation runs two row gathers plus two row-at-a-time
    scatter-adds (~14 ns/row); at train scale (4 chamfer calls x B64 x 2048
    rows each way) the scatters alone cost ~10 ms/step. Here both the
    gather (via an i1 row mask) and the scatter (via an i2 membership mask)
    are (TN, M) masked lane reductions on VMEM-resident tiles — no HBM
    intermediate, no row loop. Outputs are (1, 3, TN) so stores are full
    lane rows (a 3-lane last dim would break the (8, 128) tiling rule)."""
    t = pl.program_id(1)
    m = b_ref.shape[1]
    col = lax.broadcasted_iota(jnp.int32, (tn, m), 1)
    row = lax.broadcasted_iota(jnp.int32, (tn, m), 0) + t * tn

    i1 = i1_ref[0, 0, pl.ds(t * tn, tn)]                    # (TN,)
    g1 = g1_ref[0, 0, pl.ds(t * tn, tn)]                    # (TN,)
    mask1 = col == i1[:, None]                              # (TN, M)
    mask2 = i2_ref[0, 0, :][None, :] == row                 # (TN, M)
    g2 = g2_ref[0, 0, :][None, :]                           # (1, M)
    g2m = jnp.where(mask2, g2, 0.0)                         # (TN, M)
    s0 = jnp.sum(g2m, axis=1)                               # (TN,)

    for c in range(3):
        a_c = a_ref[0, pl.ds(t * tn, tn), c]                # (TN,)
        b_c = b_ref[0, :, c][None, :]                       # (1, M)
        b_sel = jnp.sum(jnp.where(mask1, b_c, 0.0), axis=1)
        s_c = jnp.sum(g2m * b_c, axis=1)
        da_ref[0, c, :] = 2.0 * (g1 * (a_c - b_sel) + a_c * s0 - s_c)


def _chamfer_bwd_dir(a, b, i1, g1, i2, g2):
    """da for the (a -> b, b -> a) pair; call twice with roles swapped."""
    B, N, _ = a.shape
    M = b.shape[1]
    TN = _chamfer_tile(N)
    da = pl.pallas_call(
        functools.partial(_chamfer_bwd_kernel, tn=TN),
        grid=(B, N // TN),
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda bi, t: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, 3), lambda bi, t: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda bi, t: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda bi, t: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda bi, t: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda bi, t: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, TN), lambda bi, t: (bi, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=16 * B * N * M,
            bytes_accessed=B * ((N + M) * 12 + (N + M) * 8 + N * 12),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(
        a.astype(jnp.float32), b.astype(jnp.float32),
        i1.reshape(B, 1, N), g1.astype(jnp.float32).reshape(B, 1, N),
        i2.reshape(B, 1, M), g2.astype(jnp.float32).reshape(B, 1, M),
    )
    return jnp.swapaxes(da, 1, 2)                           # (B, N, 3)


# Measured on the v5e at VRCNet loss scale (B=64, N=M=2048, 20-rep chained
# sync, tools/bench_chamfer.py): the fused masked-reduction backward runs
# 8.6 ms vs 7.0 ms for XLA's gather+scatter formulation — the (TN, M)
# membership masks cost more VPU passes than XLA's ~14 ns/row scatters at
# this row count. Kept (parity-tested) for ablation; flip to re-measure on
# other hardware/shapes.
CHAMFER_BWD_PALLAS = False


def _chamfer_grad_mxu_kernel(a_ref, b_ref, g2_ref, i1_ref, g1_ref,
                             i2_ref, da_ref, *scratch, tn, exact):
    """One direction of the chamfer backward as TWO one-hot MXU matmuls.

        da[n] = 2 g1[n] (a[n] - b[i1[n]]) + 2 a[n] s0[n] - 2 t[n]
        s0[n] = sum_m [i2[m]==n] g2[m]     t[n] = sum_m [i2[m]==n] g2[m] b[m]

    The gather b[i1] and the segment sums (s0, t) both contract a 0/1
    (TN, M) mask against ONE shared lane-padded table
    T = [g2 | g2*b | b | 0...] (M, 128) — the gather uses a column one-hot
    of i1, the scatter a row-membership mask of i2. The earlier C=3 MXU
    attempt produced 3-lane matmul outputs (Mosaic-slow); here outputs are
    full 128-lane registers and only the final (3, TN) store is narrow.

    The table is built IN-KERNEL into VMEM scratch once per batch element
    (t == 0); the earlier XLA-side build materialized (B, M, 128) f32 + two
    bf16 casts in HBM (~300 MB/step of glue traffic at train scale — the
    source of the audit's 12-vs-7 ms chamfer-bwd discrepancy).
    ``exact``: hi+lo bf16 table split (~1e-6 of fp32); False rounds the
    table to bf16 once (~2^-9), halving MXU work."""
    t = pl.program_id(1)
    m = b_ref.shape[1]
    thi_ref = scratch[0]
    tlo_ref = scratch[1] if exact else None

    @pl.when(t == 0)
    def _build_table():
        colL = lax.broadcasted_iota(jnp.int32, (m, 128), 1)
        g2 = g2_ref[0, 0, :][:, None]                        # (M, 1)
        T = jnp.where(colL == 0, g2, 0.0)
        for c in range(3):
            b_c = b_ref[0, :, c][:, None]                    # (M, 1)
            T = jnp.where(colL == 1 + c, g2 * b_c, T)
            T = jnp.where(colL == 4 + c, b_c, T)
        thi = T.astype(jnp.bfloat16)
        thi_ref[...] = thi
        if exact:
            tlo_ref[...] = (T - thi.astype(jnp.float32)).astype(jnp.bfloat16)

    colM = lax.broadcasted_iota(jnp.int32, (tn, m), 1)
    rowN = lax.broadcasted_iota(jnp.int32, (tn, m), 0) + t * tn

    i1 = i1_ref[0, 0, pl.ds(t * tn, tn)]                    # (TN,)
    g1 = g1_ref[0, 0, pl.ds(t * tn, tn)]                    # (TN,)
    oh1 = (colM == i1[:, None]).astype(jnp.bfloat16)        # (TN, M)
    mask2 = (i2_ref[0, 0, :][None, :] == rowN).astype(jnp.bfloat16)

    def onehot_dot(oh):
        acc = jnp.dot(oh, thi_ref[...], preferred_element_type=jnp.float32)
        if exact:
            acc += jnp.dot(oh, tlo_ref[...],
                           preferred_element_type=jnp.float32)
        return acc                                           # (TN, 128)

    G = onehot_dot(oh1)                                      # b[i1] in 4:7
    S = onehot_dot(mask2)                                    # [s0, t] in 0:4
    for c in range(3):
        a_c = a_ref[0, pl.ds(t * tn, tn), c]                 # (TN,)
        da_ref[0, c, :] = 2.0 * (
            g1 * (a_c - G[:, 4 + c]) + a_c * S[:, 0] - S[:, 1 + c]
        )


def _chamfer_grad_mxu(a, b, i1, g1, i2, g2, exact=True):
    """da for one direction (see kernel). The lane-padded table is built
    in-kernel (VMEM scratch, once per batch element) — no HBM table."""
    B, N, _ = a.shape
    M = b.shape[1]
    TN = _chamfer_tile(N)
    passes = 2 if exact else 1
    # Synthetic one-hot contractions; useful work is the CUDA backward's
    # +-2g(p-q) adds (reference chamfer3D.cu:155-174).
    _audit_flops(2 * 2 * B * N * M * 128 * passes, B * N * 3 * 4)
    scratch = [pltpu.VMEM((M, 128), jnp.bfloat16)]
    if exact:
        scratch.append(pltpu.VMEM((M, 128), jnp.bfloat16))
    da = pl.pallas_call(
        functools.partial(_chamfer_grad_mxu_kernel, tn=TN, exact=exact),
        grid=(B, N // TN),
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda bi, t: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, 3), lambda bi, t: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda bi, t: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda bi, t: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda bi, t: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda bi, t: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, TN), lambda bi, t: (bi, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, N), jnp.float32),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * N * M * 128 * passes,
            bytes_accessed=B * (N * 12 + M * 12 + (N + M) * 8),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(
        a.astype(jnp.float32),
        b.astype(jnp.float32),
        g2.astype(jnp.float32).reshape(B, 1, M),
        i1.reshape(B, 1, N), g1.astype(jnp.float32).reshape(B, 1, N),
        i2.reshape(B, 1, M),
    )
    return jnp.swapaxes(da, 1, 2)                            # (B, N, 3)


# The one-hot MXU backward: ~2 full-lane matmuls per direction instead of
# XLA's two row gathers + one row-at-a-time scatter (~1.7 + 2.0 ms each at
# B64xN2048). Each direction is its own pallas_call, so the gt-side
# gradient (never needed — losses are calc_cd(pred, gt)) stays DCE-able.
CHAMFER_BWD_MXU = True
_CHAMFER_MXU_MAX = 4096  # (M, 128) table + (TN, M) masks must fit VMEM
# Table precision for the MXU backward. True: hi+lo bf16 split (~1e-6 of
# fp32, 4 matmuls/direction). False: single bf16 rounding (~2^-9 relative
# on the gradient, 2 matmuls) — set by engine.apply_compute_dtype for the
# bf16 activation policy, whose Dense backwards already round every matmul
# input to bf16; the fp32 policy keeps the exact split.
CHAMFER_MXU_EXACT = True
# Hybrid backward: XLA row-gather for b[i1] + ONE (N, 4) segment scatter-add
# for the opposite-direction term (s0 = seg_sum(g2), t = seg_sum(g2*b)),
# i.e. da = 2(g1 (a - b[i1]) + a s0 - t). Candidate replacement for the
# MXU one-hot path: that kernel's cost is dominated by its two (TN, M)
# iota-compare mask builds (VPU), not the matmuls (measured r5, PERF.md).
CHAMFER_BWD_HYBRID = False


def _chamfer_grad_hybrid(a, b, i1, g1, i2, g2):
    """da for one direction without Pallas: gather + fused segment scatter."""
    payload = jnp.concatenate(
        [g2[..., None], g2[..., None] * b], axis=-1)        # (B, M, 4)
    seg = jax.vmap(
        lambda acc, idx, upd: acc.at[idx].add(upd)
    )(jnp.zeros(a.shape[:2] + (4,), jnp.float32), i2,
      payload.astype(jnp.float32))                           # (B, N, 4)
    b_sel = jnp.take_along_axis(b, i1[..., None], axis=1)    # (B, N, 3)
    return 2.0 * (
        g1[..., None] * (a - b_sel) + a * seg[..., 0:1] - seg[..., 1:4]
    )


def _chamfer_bwd(res, g):
    """CUDA-equivalent backward (chamfer3D.cu:155-174): +-2 g (p - q) routed
    through the argmin pairs, scatter-add on the opposite cloud. Two
    MXU/Pallas alternatives were measured and rejected (see
    CHAMFER_BWD_PALLAS above; the MXU one-hot variant at C=3 produced 3-lane
    matmul outputs that REGRESSED PCN's step 3x, 38 -> 115 ms)."""
    a, b, i1, i2 = res
    g1, g2, _, _ = g
    N, M = a.shape[1], b.shape[1]
    if CHAMFER_BWD_HYBRID:
        da = _chamfer_grad_hybrid(a, b, i1, g1, i2, g2)
        db = _chamfer_grad_hybrid(b, a, i2, g2, i1, g1)
        return da.astype(a.dtype), db.astype(b.dtype)
    if CHAMFER_BWD_MXU and not _interpret() \
            and N % 128 == 0 and M % 128 == 0 \
            and N <= _CHAMFER_MXU_MAX and M <= _CHAMFER_MXU_MAX:
        da = _chamfer_grad_mxu(a, b, i1, g1, i2, g2, exact=CHAMFER_MXU_EXACT)
        db = _chamfer_grad_mxu(b, a, i2, g2, i1, g1, exact=CHAMFER_MXU_EXACT)
        return da.astype(a.dtype), db.astype(b.dtype)
    if CHAMFER_BWD_PALLAS and not _interpret() \
            and N % 128 == 0 and M % 128 == 0:
        da = _chamfer_bwd_dir(a, b, i1, g1, i2, g2)
        db = _chamfer_bwd_dir(b, a, i2, g2, i1, g1)
        return da.astype(a.dtype), db.astype(b.dtype)

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


def _knn_kernel(q_ref, p_ref, idx_ref, dist_ref, *, k, exact_dist=False,
                g_size=256, r_size=3):
    """Grid=(B, M/TM). One (TM, N) distance tile in VMEM; neighbours emitted
    in ascending-distance order via k packed-key min sweeps. Outputs are
    (1, k, TM) so every store is a full lane row.

    Packed-key extraction: distance bits and the candidate index are packed
    into ONE int32 key (non-negative f32 bit patterns sort like the floats;
    the low ceil(log2 N) mantissa bits are replaced by the column index), so
    each extraction is 3 VPU passes — min-reduce, compare-to-min, select —
    instead of separate argmin/min/mask sweeps. The index ride-along
    quantizes the comparison distance to ~2^-(23 - log2 N) relative
    (~5e-4 at N=2048): selection between two neighbours closer than that is
    tie-broken by index. Callers needing exact distances recompute them from
    the gathered neighbours (knn_points / dispatch.three_nn do).

    Distances: exact per-coordinate difference planes for C <= 8 (the
    parity-critical 3D geometric case); MXU expansion with bf16x2-split
    inner products beyond that (~1e-6 relative -> neighbour selection
    matches exact; unrolled per-coordinate planes at feature widths blow
    up Mosaic compile time).
    """
    tm = q_ref.shape[1]
    n = p_ref.shape[1]
    dim = q_ref.shape[2]

    if dim <= 8:
        # Exact per-coordinate difference planes — the geometric (3D) case,
        # where the parity bar is exact. Only for tiny dims: the unrolled
        # planes blow up Mosaic compile time at feature widths (a C=24
        # feature-space kNN made the ECG step compile run tens of minutes).
        # Round-4 note: routing these through the MXU |q|^2+|p|^2-2qp
        # expansion (bf16 hi/lo) was measured and REJECTED — the expansion
        # computes small d as a difference of O(1) norms, a catastrophic
        # cancellation that leaves ~3e-5 ABSOLUTE noise (9.6% relative on
        # near-neighbour distances in the parity test), far above the
        # packed key's ~2^-12 RELATIVE quantization. The planes' extra VPU
        # passes buy exact-at-fp32 distances; selection fidelity
        # (PERF.md kNN fidelity stats) depends on them.
        d = jnp.zeros((tm, n), jnp.float32)
        for c in range(dim):
            diff = q_ref[0, :, c][:, None] - p_ref[0, :, c][None, :]
            d += diff * diff
    else:
        # MXU |q|^2 + |p|^2 - 2 q.p expansion with the inner product split
        # bf16x2 (hi/lo): ~1e-6 relative, so neighbour selection matches the
        # exact computation (single-bf16 rounding only agreed ~94% on random
        # features). Norms accumulate exactly on the VPU.
        q = q_ref[0]                                          # (TM, C)
        p = p_ref[0]                                          # (N, C)
        q2 = jnp.sum(q * q, axis=1, keepdims=True)            # (TM, 1)
        p2 = jnp.sum(p * p, axis=1, keepdims=True)            # (N, 1)
        qh = q.astype(jnp.bfloat16)
        ql = (q - qh.astype(jnp.float32)).astype(jnp.bfloat16)
        ph = p.astype(jnp.bfloat16)
        plo = (p - ph.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        qp = (
            jax.lax.dot_general(qh, ph, dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(qh, plo, dimension_numbers=dn,
                                  preferred_element_type=jnp.float32)
            + jax.lax.dot_general(ql, ph, dimension_numbers=dn,
                                  preferred_element_type=jnp.float32)
        )
        d = jnp.maximum(q2 + p2.T - 2.0 * qp, 0.0)

    col = lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    if n % 128 == 0:
        # Packed path: Mosaic's vector bitcast requires lane-aligned vregs.
        bits = max(n - 1, 1).bit_length()
        lomask = (1 << bits) - 1
        d_bits = pltpu.bitcast(d, jnp.int32)
        key = (d_bits & ~lomask) | col                        # (TM, N)
        sentinel = jnp.int32(0x7F000000)                      # > any distance

        def put_dist(j, kmin):
            """Distance output for slot j. Default: the packed key's
            quantized distance (low mantissa bits replaced by the index).
            exact_dist: masked-min lookup of the exact fp32 distance at the
            selected column (what dispatch.three_nn otherwise recomputes
            with an XLA row gather per edge — ~5 ms/step at VRCNet scale)."""
            if exact_dist:
                dist_ref[0, j, :] = jnp.min(
                    jnp.where(col == (kmin & lomask), d, jnp.float32(jnp.inf)),
                    axis=1,
                )
            else:
                dist_ref[0, j, :] = pltpu.bitcast(
                    kmin & ~lomask, jnp.float32
                )[:, 0]

        def extract_sweeps(key):
            """k full-width packed-key min sweeps (the round-2 formulation;
            the exact fallback for the two-level fast path below)."""
            for j in range(k):
                kmin = jnp.min(key, axis=1, keepdims=True)    # (TM, 1)
                idx_ref[0, j, :] = (kmin & lomask)[:, 0]
                put_dist(j, kmin)
                key = jnp.where(key == kmin, sentinel, key)

        G = g_size
        S = n // G
        if n % G == 0 and S >= 2:
            # Two-level extraction: fold the N lanes into S slabs of G
            # columns and keep each GROUP's (= lane-across-slabs) smallest
            # candidates in (TM, G) registers; each of the k extractions
            # then runs on G lanes instead of N. Correct unless some group
            # holds more than DEPTH of the true top-k — when a group's
            # candidates run dry its slot becomes the RESCAN sentinel, and
            # if that sentinel ever WINS an extraction the whole tile redoes
            # the exact full-width sweeps (rare: P(group >= 5 of top-16 |
            # 256-col groups) ~ 1e-6 per row; adversarially tested).
            #
            # Fold formulation (round 4): a STREAMING INSERTION fold — each
            # slab is read once and min/max-chained through R sorted
            # registers; the displaced maximum feeds an overflow register
            # whose final value is the EXACT (R+1)-th-smallest of the group
            # (min over everything that ever fell off the top-R). Depth is
            # therefore R+1, at (2R+1)*S register passes and ONE read of
            # the (TM, N) key array (the earlier pop-fold re-read it R-1
            # times for invalidation rewrites).
            #
            # (G, R) trade-off (round 5): extraction cost scales with G
            # (k rounds of ~(R+5) passes on (TM, G) registers), fold cost
            # with (2R+1)*N. Narrower G needs deeper R to keep the
            # dry-group rescan probability negligible (each group covers
            # N/G columns; P(one group holds > R+1 of the true top-k)
            # grows as G shrinks). tools/bench_knn.py sweeps the pairs.
            R = r_size
            RESCAN = jnp.int32(0x7E000000)
            pad = jnp.full((tm, G), sentinel, jnp.int32)
            g = [pad] * R
            ov = pad                                          # overflow
            for i in range(S):
                w = key[:, i * G:(i + 1) * G]
                for r in range(R):
                    lo = jnp.minimum(g[r], w)
                    w = jnp.maximum(g[r], w)
                    g[r] = lo
                ov = jnp.minimum(ov, w)
            # Groups with <= R real elements never displace one, so ov
            # stays `sentinel` there — read as "fully stored" (complete
            # information), exactly like the old prep padding.
            g = g + [ov]
            tripv = jnp.zeros((tm, G), jnp.bool_)
            for j in range(k):
                kmin = jnp.min(g[0], axis=1, keepdims=True)   # (TM, 1)
                idx_ref[0, j, :] = (kmin & lomask)[:, 0]
                put_dist(j, kmin)
                sel = g[0] == kmin
                if j < k - 1:
                    # Vector-accumulate the dry-group condition; ONE scalar
                    # reduction at the end (was a full any() per slot).
                    tripv = tripv | (sel & (g[1] == RESCAN))
                for i in range(R):
                    g[i] = jnp.where(sel, g[i + 1], g[i])
                g[R] = jnp.where(sel, RESCAN, g[R])

            @pl.when(jnp.any(tripv))
            def _():
                extract_sweeps(key)
        else:
            extract_sweeps(key)
    else:
        # Exact argmin sweeps for unaligned N (small/smoke shapes only).
        for j in range(k):
            arg = jnp.argmin(d, axis=1).astype(jnp.int32)     # (TM,)
            idx_ref[0, j, :] = arg
            dist_ref[0, j, :] = jnp.min(d, axis=1)
            d = jnp.where(col == arg[:, None], jnp.float32(jnp.inf), d)


def _knn_tile(m: int) -> int:
    # The (1, k, TM) output block requires TM to be a multiple of 128 or to
    # span the whole M dimension. TM=128 measured 1.65x faster than 256 at
    # (B64, N3072, k16) — the (TM, N) key+distance working set stays inside
    # the VMEM pipelining sweet spot.
    for tm in (128, 256):
        if m % tm == 0:
            return tm
    return m


_KNN_G = 256  # two-level extraction slab width (micro-benched; see PERF.md
# round-5 interleaved A/B at (B64, M3072, k16): G=256 12.2 ms vs G=128
# 13.2 ms. NOTE a per-process ordering artifact: the FIRST timed config in
# a fresh process reads 4-200x slow even after a blocked warmup call —
# sweep tools must interleave configs and discard the first window.
_KNN_R = 3    # insertion-fold register depth (depth = R+1 with overflow)


def knn_pallas(
    query: jnp.ndarray, points: jnp.ndarray, k: int, tm: int | None = None,
    exact_dist: bool = False, g_size: int | None = None,
    r_size: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused kNN: (B, M, C) queries in (B, N, C) points ->
    (approx_sqdist, idx), both (B, M, k), nearest first. The (B, M, N)
    distance matrix never leaves VMEM (the jnp path materializes it in HBM
    and runs lax.top_k over it).

    INVARIANT: with exact_dist=False the first output is an APPROXIMATE
    squared distance — on the packed-key path the low ceil(log2 N) mantissa
    bits are replaced by the neighbour index, biasing values low by up to
    ~2^-(23 - log2 N) relative (~5e-4 at N=2048). It exists to
    order/inspect neighbours, not to be consumed as a distance. Callers
    needing real distances pass exact_dist=True (a masked-min lookup of the
    exact fp32 distance inside the kernel — 2 extra VPU passes per slot) or
    recompute from the gathered neighbours.
    """
    B, M, C = query.shape
    N = points.shape[1]
    k = min(k, N)
    TM = tm if tm is not None and M % tm == 0 else _knn_tile(M)

    idx, dist = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, exact_dist=exact_dist,
                          g_size=g_size or _KNN_G, r_size=r_size or _KNN_R),
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
    neigh = grouping_operation(points, idx)                  # (B, M, k, 3)
    d = jnp.sum((query[:, :, None, :] - neigh) ** 2, axis=-1)
    return -d, idx


def knn_indices(points: jnp.ndarray, k: int) -> jnp.ndarray:
    """Drop-in for jnp_ref.knn_indices (self included, nearest first)."""
    pts = lax.stop_gradient(points)
    _, idx = knn_pallas(pts, pts, min(k, points.shape[1]))
    return idx


# ---------------------------------------------------------------------------
# Fused gather + max (edge_preserve_sampling's neighbourhood pool)
# ---------------------------------------------------------------------------
#
# neighbor = max_j features[idx[m, j]] — the gathered (B, M, k, C) tensor
# exists only as kernel registers; the backward routes d_out to the argmax
# slot per (m, channel) via masked one-hot-transpose matmuls.

_GM_TM = 256


def _group_max_fwd_kernel(idx_ref, t_ref, out_ref, slot_ref, *, k, tm):
    m = pl.program_id(1)
    n = t_ref.shape[1]
    single = idx_ref.shape[2] == tm      # one tile: static slice (Mosaic
    tbl = t_ref[0].astype(jnp.bfloat16)  # needs 128-multiple dyn offsets)
    col = lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    acc = None
    slot = None
    for j in range(k):
        ii = idx_ref[0, j, :] if single else idx_ref[0, j, pl.ds(m * tm, tm)]
        oh = (col == ii[:, None]).astype(jnp.bfloat16)
        gj = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)
        if acc is None:
            acc, slot = gj, jnp.zeros(gj.shape, jnp.int32)
        else:
            better = gj > acc
            slot = jnp.where(better, j, slot)
            acc = jnp.maximum(acc, gj)
    out_ref[0] = acc.astype(out_ref.dtype)
    slot_ref[0] = slot


def _group_max_bwd_kernel(idx_ref, slot_ref, g_ref, dt_ref, *, k, tm):
    m = pl.program_id(1)
    n = dt_ref.shape[1]
    single = idx_ref.shape[2] == tm
    col = lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    g = g_ref[0].astype(jnp.float32)
    slot = slot_ref[0]
    acc = jnp.zeros((n, g.shape[1]), jnp.float32)
    contractT = (((0,), (0,)), ((), ()))
    for j in range(k):
        ii = idx_ref[0, j, :] if single else idx_ref[0, j, pl.ds(m * tm, tm)]
        oh = (col == ii[:, None]).astype(jnp.bfloat16)
        gj = jnp.where(slot == j, g, 0.0).astype(jnp.bfloat16)
        acc += lax.dot_general(oh, gj, dimension_numbers=contractT,
                               preferred_element_type=jnp.float32)

    @pl.when(m == 0)
    def _():
        dt_ref[0] = jnp.zeros_like(dt_ref[0])

    dt_ref[0] += acc


@jax.custom_vjp
def group_max(features, idx):
    """max over gathered neighbours: (B, N, C) x (B, M, k) -> (B, M, C).

    == ``grouping_operation(features, idx).max(axis=2)`` (the
    edge_preserve_sampling pool, reference completion/model_utils.py:88-110)
    without the (B, M, k, C) HBM intermediate.
    """
    return _group_max_forward(features, idx)[0]


def _gm_tile(m: int, n: int, c: int) -> int:
    # Prefer larger tiles (launch-overhead-bound at model scale: measured
    # 4.0 ms at L1->L2 vs a ~1 ms one-hot MXU floor with 256-wide tiles),
    # but cap by the kernel's scoped-VMEM footprint: Mosaic's kernel stack
    # is 16 MiB, and the backward's live set per tile is ~(tm*n) iota+onehot
    # + (tm*c) g/gj tiles + (n*c) f32 accumulator. tm=1024 at ECG's
    # N=3072/C=128 pool measured 16.16M scoped (compile-helper abort);
    # 512 fits. The estimate below maps that case to ~22.9M, so the 17M
    # budget keeps ~35% headroom at the measured scale factor (~0.7).
    def fits(tm):
        return tm * n * 6 + tm * c * 12 + n * c * 6 <= 17_000_000

    for tm in (1024, 512, 256):
        if m % tm == 0 and fits(tm):
            return tm
    if m <= 1024 and fits(m):       # non-power-of-two M: one tile
        return m
    for tm in (256, 128):
        if m % tm == 0:
            return tm
    return m


def _group_max_forward(features, idx):
    B, N, C = features.shape
    M, k = idx.shape[1], idx.shape[2]
    tm = _gm_tile(M, N, C)
    idx_jm = jnp.swapaxes(idx, 1, 2).astype(jnp.int32)     # (B, k, M)
    # Synthetic one-hot gathers; useful work is the M*k*C max compares.
    _audit_flops(2 * B * M * k * N * max(C, 128), B * M * k * C)
    out, slot = pl.pallas_call(
        functools.partial(_group_max_fwd_kernel, k=k, tm=tm),
        grid=(B, M // tm),
        in_specs=[
            pl.BlockSpec((1, k, M), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tm, C), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, C), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M, C), features.dtype),
            jax.ShapeDtypeStruct((B, M, C), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * k * N * max(C, 128),
            bytes_accessed=B * (M * C * 8 + N * C * 2 + M * k * 4),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(idx_jm, features)
    return out, (features.shape, idx_jm, slot)


def _group_max_fwd_rule(features, idx):
    out, res = _group_max_forward(features, idx)
    return out, res


def _group_max_bwd_rule(res, g):
    (B, N, C), idx_jm, slot = res
    M, k = idx_jm.shape[2], idx_jm.shape[1]
    tm = _gm_tile(M, N, C)
    # Synthetic one-hot scatter; useful work is the M*C routed adds.
    _audit_flops(2 * B * M * k * N * max(C, 128), B * M * C)
    dt = pl.pallas_call(
        functools.partial(_group_max_bwd_kernel, k=k, tm=tm),
        grid=(B, M // tm),
        in_specs=[
            pl.BlockSpec((1, k, M), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, C), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, C), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, C), lambda b, m: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * k * N * max(C, 128),
            bytes_accessed=B * (M * C * 8 + N * C * 4),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(idx_jm, slot, g)
    return dt.astype(g.dtype), _float0_like(idx_jm)


group_max.defvjp(_group_max_fwd_rule, _group_max_bwd_rule)


# ---------------------------------------------------------------------------
# Fused three_interpolate
# ---------------------------------------------------------------------------
#
# out[n] = sum_l w[n, l] * table[idx[n, l]] — instead of gathering
# (B, N, 3, C) and reducing, fold the weights into the one-hot:
# ohw[n, m] = sum_l [idx[n, l] == m] * w[n, l], then out = ohw @ table.
# One MXU matmul with N rows (not 3N), no (B, N, 3, C) intermediate.

_TI_TM = 256


def _ti_build_ohw(idx_ref, w_ref, m, n_src, tm):
    col = lax.broadcasted_iota(jnp.int32, (tm, n_src), 1)
    ohw = jnp.zeros((tm, n_src), jnp.float32)
    for l in range(3):
        ii = idx_ref[0, l, pl.ds(m * tm, tm)]               # (TM,)
        wl = w_ref[0, l, pl.ds(m * tm, tm)]                 # (TM,)
        ohw += jnp.where(col == ii[:, None], wl[:, None], 0.0)
    return ohw


def _ti_fwd_kernel(idx_ref, w_ref, t_ref, o_ref, *, tm):
    m = pl.program_id(1)
    n_src = t_ref.shape[1]
    ohw = _ti_build_ohw(idx_ref, w_ref, m, n_src, tm).astype(jnp.bfloat16)
    t = t_ref[0].astype(jnp.bfloat16)
    o_ref[0] = jnp.dot(
        ohw, t, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _ti_bwd_kernel(idx_ref, w_ref, t_ref, g_ref, dt_ref, dw_ref, *, tm):
    m = pl.program_id(1)
    n_src = t_ref.shape[1]
    ohw = _ti_build_ohw(idx_ref, w_ref, m, n_src, tm).astype(jnp.bfloat16)
    g = g_ref[0].astype(jnp.bfloat16)                       # (TM, C)
    # d_table += ohw^T @ g  (accumulated over the sequential N tiles)
    acc = lax.dot_general(ohw, g, dimension_numbers=(((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)

    @pl.when(m == 0)
    def _():
        dt_ref[0] = jnp.zeros_like(dt_ref[0])

    dt_ref[0] += acc

    # d_w[n, l] = <g[n], table[idx[n, l]]> : score matrix then masked reduce.
    S = lax.dot_general(
        g, t_ref[0].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # (TM, M_src)
    col = lax.broadcasted_iota(jnp.int32, (tm, n_src), 1)
    for l in range(3):
        ii = idx_ref[0, l, pl.ds(m * tm, tm)]
        dw_l = jnp.sum(jnp.where(col == ii[:, None], S, 0.0), axis=1)
        dw_ref[0, l, pl.ds(m * tm, tm)] = dw_l


def _ti_tile(n: int, n_src: int, c: int) -> int:
    # Prefer larger tiles: the (B, N/tm) grid at tm=256 ran launch-bound
    # (4.3 ms measured vs ~0.5 ms MXU floor at L1 scale). Cap by the
    # scoped-VMEM footprint like _gm_tile: the backward keeps ~(tm*n_src)
    # f32 ohw + S + iota and (tm*c)/(n_src*c) operand tiles live; ECG's
    # 1024->3072 C=512 upsample at tm=1024 took a 30 s Mosaic compile
    # (and sits near the 16 MiB kernel stack) — tm=512 is fast and safe.
    # (ti never hit the VMEM abort — its constraint is compile time — so
    # its budget is looser: 22M keeps VRCNet's 1536->3072 C=128 upsample
    # at tm=1024, both measured-good configurations.)
    for tm in (1024, 512, 256):
        if n % tm == 0 and tm * n_src * 12 + tm * c * 8 + n_src * c * 6 \
                <= 22_000_000:
            return tm
    for tm in (256, 128):
        if n % tm == 0:
            return tm
    return _TI_TM


@jax.custom_vjp
def three_interpolate_fused(features, idx, weight):
    """Fused weighted 3-NN interpolation (semantics ==
    jnp_ref.three_interpolate; reference
    utils/mm3d_pn2/ops/interpolate/three_interpolate_cuda.cu). Requires the
    target count N % 256 == 0 — dispatch guards."""
    return _ti_forward(features, idx, weight)


def _ti_forward(features, idx, weight):
    B, Msrc, C = features.shape
    N = idx.shape[1]
    tm = _ti_tile(N, Msrc, C)
    idx_lm = jnp.swapaxes(idx, 1, 2).astype(jnp.int32)      # (B, 3, N)
    w_lm = jnp.swapaxes(weight, 1, 2)                       # (B, 3, N)
    # Synthetic weight-folded one-hot; useful: N*3*C multiply-adds.
    _audit_flops(2 * B * N * Msrc * max(C, 128), 2 * B * N * 3 * C)
    out = pl.pallas_call(
        functools.partial(_ti_fwd_kernel, tm=tm),
        grid=(B, N // tm),
        in_specs=[
            pl.BlockSpec((1, 3, N), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, N), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Msrc, C), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, C), lambda b, m: (b, m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), features.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * Msrc * max(C, 128),
            bytes_accessed=B * (N * C * 4 + Msrc * C * 4 + N * 32),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(idx_lm, w_lm, features)
    return out


def _ti_fwd_rule(features, idx, weight):
    return _ti_forward(features, idx, weight), (features, idx, weight)


def _ti_bwd_rule(res, g):
    features, idx, weight = res
    B, Msrc, C = features.shape
    N = idx.shape[1]
    tm = _ti_tile(N, Msrc, C)
    idx_lm = jnp.swapaxes(idx, 1, 2).astype(jnp.int32)
    w_lm = jnp.swapaxes(weight, 1, 2)
    # Synthetic one-hot scatter + score matmul; useful: d_table/d_w math.
    _audit_flops(4 * B * N * Msrc * max(C, 128), 4 * B * N * 3 * C)
    dt, dw_lm = pl.pallas_call(
        functools.partial(_ti_bwd_kernel, tm=tm),
        grid=(B, N // tm),
        in_specs=[
            pl.BlockSpec((1, 3, N), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, N), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Msrc, C), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, C), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Msrc, C), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, N), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Msrc, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, N), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * Msrc * max(C, 128),
            bytes_accessed=B * (N * C * 8 + Msrc * C * 8),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(idx_lm, w_lm, features, g)
    return (
        dt.astype(features.dtype),
        _float0_like(idx),
        jnp.swapaxes(dw_lm, 1, 2).astype(weight.dtype),
    )


three_interpolate_fused.defvjp(_ti_fwd_rule, _ti_bwd_rule)


# ---------------------------------------------------------------------------
# Fused SA-module attention aggregation
# ---------------------------------------------------------------------------
#
# VRCNet's SA module (reference completion/models/vrcnet.py:21-57) is the
# profile's hot block: gather k neighbour projections per point, run a tiny
# two-layer MLP on the flattened rel-features to produce per-edge weights,
# and reduce a weighted sum over the neighbours. The XLA formulation
# materializes (B, N, k, rel+mid) in HBM plus layout copies for the rel/mid
# split, the (B, N, k*rel) flatten, the share-tile broadcast and the
# multiply-reduce — and its backward scatters (B*N*k) rows.
#
# This kernel runs the whole block per (batch, point-tile): per-slot one-hot
# gathers straight from the VMEM-resident projection table, the w-MLP on
# registers, and the weighted reduction — fwd emits ONLY (B, N, mid); the
# custom-VJP backward recomputes the cheap intermediates and emits d_table
# via one-hot-transpose matmuls plus the (tiny) MLP parameter grads.

_SA_TM = 128


def _sa_expand(w_small, mid, ms):
    """(TM, ms) -> (TM, mid): channel c takes w[:, c % ms] (the torch
    jnp.tile(w, share) layout), as an MXU matmul with a 0/1 matrix.
    Round-4 note: register-concat / slice-sum formulations (avoiding the
    narrow-lane matmul outputs) were measured and REJECTED — they raised
    the backward kernel's live VMEM past the 16 MiB Mosaic stack at every
    level tried (L1/L2/L3 OOM in turn); the kernel sits within ~1 MB of
    the stack limit and the tiny matmuls are not its bottleneck."""
    row = lax.broadcasted_iota(jnp.int32, (ms, mid), 0)
    colc = lax.broadcasted_iota(jnp.int32, (ms, mid), 1)
    F = (colc % ms == row).astype(jnp.float32)
    return jax.lax.dot_general(
        w_small, F, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _sa_fold(d_full, mid, ms):
    """(TM, mid) -> (TM, ms): d[:, q] = sum_{c: c%ms==q} d_full[:, c]."""
    row = lax.broadcasted_iota(jnp.int32, (mid, ms), 0)
    colc = lax.broadcasted_iota(jnp.int32, (mid, ms), 1)
    F = (row % ms == colc).astype(jnp.float32)
    return jax.lax.dot_general(
        d_full, F, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _sa_forward_core(idx_ref, x1_ref, t_ref, W1_ref, W2_ref, b2_ref,
                     m, *, rel, mid, share, k, tm):
    """Shared fwd recompute: returns (gs, x2f, w_in, u, w)."""
    n = t_ref.shape[1]
    ms = mid // share
    tbl = t_ref[0].astype(jnp.bfloat16)                     # (N, rel+mid)
    col = lax.broadcasted_iota(jnp.int32, (tm, n), 1)

    gs = []
    for j in range(k):
        ii = idx_ref[0, j, pl.ds(m * tm, tm)]               # (TM,)
        oh = (col == ii[:, None]).astype(jnp.bfloat16)
        gs.append(jnp.dot(oh, tbl, preferred_element_type=jnp.float32))

    x2f = jnp.concatenate([g[:, :rel] for g in gs], axis=1)  # (TM, k*rel)
    x1t = x1_ref[0].astype(jnp.float32)                      # (TM, rel)
    cat = jnp.concatenate([x1t, x2f], axis=1)                # (TM, (1+k)rel)
    w_in = jnp.maximum(cat, 0.0)
    u_pre = jnp.dot(
        w_in.astype(jnp.bfloat16), W1_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    u = jnp.maximum(u_pre, 0.0)                              # (TM, ms)
    w = jnp.dot(
        u.astype(jnp.bfloat16), W2_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)                        # (TM, k*ms)
    return gs, cat, w_in, u, w


def _sa_fwd_kernel(idx_ref, x1_ref, t_ref, W1_ref, W2_ref, b2_ref, out_ref,
                   *, rel, mid, share, k, tm, gsave_ref=None):
    m = pl.program_id(1)
    ms = mid // share
    gs, _, _, _, w = _sa_forward_core(
        idx_ref, x1_ref, t_ref, W1_ref, W2_ref, b2_ref, m,
        rel=rel, mid=mid, share=share, k=k, tm=tm,
    )
    acc = jnp.zeros((tm, mid), jnp.float32)
    for j in range(k):
        wj = _sa_expand(w[:, j * ms:(j + 1) * ms], mid, ms)  # (TM, mid)
        acc += wj * gs[j][:, rel:]
        if gsave_ref is not None:
            # Stash the gathered projections (bf16) so the backward skips
            # the gather recompute — the one-hot matmuls are the dominant
            # cost and running them twice made the bwd slower than XLA's.
            gsave_ref[0, j] = gs[j].astype(jnp.bfloat16)
    out_ref[0] = acc.astype(out_ref.dtype)


def _sa_fwd_save_kernel(idx_ref, x1_ref, t_ref, W1_ref, W2_ref, b2_ref,
                        out_ref, gsave_ref, *, rel, mid, share, k, tm):
    _sa_fwd_kernel(idx_ref, x1_ref, t_ref, W1_ref, W2_ref, b2_ref, out_ref,
                   rel=rel, mid=mid, share=share, k=k, tm=tm,
                   gsave_ref=gsave_ref)


def _sa_bwd_kernel(idx_ref, x1_ref, g_ref, W1_ref, W2_ref, b2_ref, dout_ref,
                   dt_ref, dx1_ref, dW1_ref, dW2_ref, db2_ref,
                   *, rel, mid, share, k, tm):
    m = pl.program_id(1)
    b = pl.program_id(0)
    n = dt_ref.shape[1]
    ms = mid // share
    # Gathered projections come from the forward's stash (bf16) — only the
    # tiny MLP is recomputed here.
    gs = [g_ref[0, j].astype(jnp.float32) for j in range(k)]
    x2f = jnp.concatenate([g[:, :rel] for g in gs], axis=1)
    x1t = x1_ref[0].astype(jnp.float32)
    cat = jnp.concatenate([x1t, x2f], axis=1)
    w_in = jnp.maximum(cat, 0.0)
    u = jnp.maximum(
        jnp.dot(w_in.astype(jnp.bfloat16), W1_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32), 0.0)
    w = jnp.dot(u.astype(jnp.bfloat16), W2_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b2_ref[:].astype(
        jnp.float32)
    d_out = dout_ref[0].astype(jnp.float32)                  # (TM, mid)

    d_w_parts = []
    d_gmid = []
    for j in range(k):
        gj_mid = gs[j][:, rel:]
        d_w_parts.append(_sa_fold(d_out * gj_mid, mid, ms))  # (TM, ms)
        wj = _sa_expand(w[:, j * ms:(j + 1) * ms], mid, ms)
        d_gmid.append(wj * d_out)                            # (TM, mid)
    d_w = jnp.concatenate(d_w_parts, axis=1)                 # (TM, k*ms)

    contractT = (((0,), (0,)), ((), ()))
    # dW2 += u^T d_w ; db2 += sum_rows d_w
    dW2_tile = lax.dot_general(u, d_w, dimension_numbers=contractT,
                               preferred_element_type=jnp.float32)
    db2_tile = jnp.sum(d_w, axis=0, keepdims=True)
    d_u = jnp.dot(d_w.astype(jnp.bfloat16),
                  W2_ref[:].astype(jnp.bfloat16).T,
                  preferred_element_type=jnp.float32)
    d_u = jnp.where(u > 0.0, d_u, 0.0)
    dW1_tile = lax.dot_general(w_in, d_u, dimension_numbers=contractT,
                               preferred_element_type=jnp.float32)
    d_win = jnp.dot(d_u.astype(jnp.bfloat16),
                    W1_ref[:].astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32)
    d_cat = jnp.where(cat > 0.0, d_win, 0.0)                 # relu'
    dx1_ref[0] = d_cat[:, :rel].astype(dx1_ref.dtype)
    d_x2f = d_cat[:, rel:]

    # d_table += sum_j oh_j^T [d_x2f_j | d_gmid_j]. (Zero-padding the
    # cotangent block to 128 lanes for full-lane matmul outputs was
    # measured and REJECTED: the (N, 128) f32 accumulator blew the Mosaic
    # kernel stack — see _sa_expand note.)
    col = lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    dt_acc = jnp.zeros((n, rel + mid), jnp.float32)
    for j in range(k):
        ii = idx_ref[0, j, pl.ds(m * tm, tm)]
        oh = (col == ii[:, None]).astype(jnp.bfloat16)
        d_gj = jnp.concatenate(
            [d_x2f[:, j * rel:(j + 1) * rel], d_gmid[j]], axis=1
        ).astype(jnp.bfloat16)                               # (TM, rel+mid)
        dt_acc += lax.dot_general(oh, d_gj, dimension_numbers=contractT,
                                  preferred_element_type=jnp.float32)

    @pl.when(m == 0)
    def _():
        dt_ref[0] = jnp.zeros_like(dt_ref[0])

    dt_ref[0] += dt_acc

    @pl.when((m == 0) & (b == 0))
    def _():
        dW1_ref[:] = jnp.zeros_like(dW1_ref[:])
        dW2_ref[:] = jnp.zeros_like(dW2_ref[:])
        db2_ref[:] = jnp.zeros_like(db2_ref[:])

    dW1_ref[:] += dW1_tile
    dW2_ref[:] += dW2_tile
    db2_ref[:] += db2_tile


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def sa_attention(proj, x1, idx_jm, W1, W2, b2, rel, mid, share):
    """Fused SA neighbour aggregation (semantics == the XLA block in
    models/vrcnet.py SAModule between the projection Denses and the output
    Dense). proj: (B, N, rel+mid), x1: (B, N, rel), idx_jm: (B, k, N)
    neighbour indices (slot-major), W1: ((1+k)rel, mid/share) [no bias],
    W2: (mid/share, k*mid/share), b2: (k*mid/share,). Returns (B, N, mid).
    """
    return _sa_primal(proj, x1, idx_jm, W1, W2, b2, rel, mid, share)


def _sa_in_specs(k, N, C, tm, rel, w2_cols):
    return [
        pl.BlockSpec((1, k, N), lambda b, m: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tm, rel), lambda b, m: (b, m, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, C), lambda b, m: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((1, w2_cols), lambda b, m: (0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _sa_tm(N):
    # 256 measured ~3% faster than 128 at L1 scale; fall back for levels
    # whose point count only divides 128 (e.g. N=384).
    return 256 if N % 256 == 0 else _SA_TM


def _sa_primal(proj, x1, idx_jm, W1, W2, b2, rel, mid, share):
    """Forward-only (no residual stash) — used outside differentiation."""
    B, N, C = proj.shape
    k = idx_jm.shape[1]
    tm = _sa_tm(N)
    assert N % tm == 0, (N, tm)
    ms = mid // share
    # Synthetic one-hot gathers dominate the estimate; useful work is the
    # per-edge w-MLP + the weighted reduction.
    _audit_flops(2 * B * N * k * N * max(C, 128),
                 B * N * (2 * (1 + k) * rel * ms + 2 * ms * k * ms
                          + 2 * k * mid))
    return pl.pallas_call(
        functools.partial(_sa_fwd_kernel, rel=rel, mid=mid, share=share,
                          k=k, tm=tm),
        grid=(B, N // tm),
        in_specs=_sa_in_specs(k, N, C, tm, rel, W2.shape[1]),
        out_specs=pl.BlockSpec((1, tm, mid), lambda b, m: (b, m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, mid), proj.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * k * N * max(C, 128),
            bytes_accessed=B * N * (C + rel + mid) * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(idx_jm.astype(jnp.int32), x1, proj, W1, W2, b2.reshape(1, -1))


def _sa_fwd(proj, x1, idx_jm, W1, W2, b2, rel, mid, share):
    B, N, C = proj.shape
    k = idx_jm.shape[1]
    tm = _sa_tm(N)
    assert N % tm == 0, (N, tm)
    ms = mid // share
    _audit_flops(2 * B * N * k * N * max(C, 128),
                 B * N * (2 * (1 + k) * rel * ms + 2 * ms * k * ms
                          + 2 * k * mid))
    out, gsave = pl.pallas_call(
        functools.partial(_sa_fwd_save_kernel, rel=rel, mid=mid, share=share,
                          k=k, tm=tm),
        grid=(B, N // tm),
        in_specs=_sa_in_specs(k, N, C, tm, rel, W2.shape[1]),
        out_specs=[
            pl.BlockSpec((1, tm, mid), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tm, C), lambda b, m: (b, 0, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, mid), proj.dtype),
            jax.ShapeDtypeStruct((B, k, N, C), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * k * N * max(C, 128),
            bytes_accessed=B * N * (C + rel + mid + 2 * k * C) * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(idx_jm.astype(jnp.int32), x1, proj, W1, W2, b2.reshape(1, -1))
    return out, (proj, gsave, x1, idx_jm, W1, W2, b2)


def _sa_bwd(rel, mid, share, res, d_out):
    proj, gsave, x1, idx_jm, W1, W2, b2 = res
    B, N, C = proj.shape
    k = idx_jm.shape[1]
    tm = _sa_tm(N)
    ms = mid // share
    # Backward's one-hot-transpose scatters; useful ~= 2x the fwd MLP.
    _audit_flops(4 * B * N * k * N * max(C, 128),
                 B * N * (4 * (1 + k) * rel * ms + 4 * ms * k * ms
                          + 4 * k * mid))
    dt, dx1, dW1, dW2, db2 = pl.pallas_call(
        functools.partial(_sa_bwd_kernel, rel=rel, mid=mid, share=share,
                          k=k, tm=tm),
        grid=(B, N // tm),
        in_specs=[
            pl.BlockSpec((1, k, N), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, rel), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tm, C), lambda b, m: (b, 0, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W2.shape[1]), lambda b, m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, mid), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, N, C), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, rel), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(W1.shape, lambda b, m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(W2.shape, lambda b, m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W2.shape[1]), lambda b, m: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), jnp.float32),
            jax.ShapeDtypeStruct((B, N, rel), jnp.float32),
            jax.ShapeDtypeStruct(W1.shape, jnp.float32),
            jax.ShapeDtypeStruct(W2.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, W2.shape[1]), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * k * N * max(C, 128),
            bytes_accessed=B * N * (2 * C + rel + mid) * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(idx_jm.astype(jnp.int32), x1, gsave, W1, W2, b2.reshape(1, -1), d_out)
    return (
        dt.astype(proj.dtype), dx1.astype(x1.dtype), _float0_like(idx_jm),
        dW1.astype(W1.dtype), dW2.astype(W2.dtype),
        db2.reshape(b2.shape).astype(b2.dtype),
    )


sa_attention.defvjp(
    lambda proj, x1, idx_jm, W1, W2, b2, rel, mid, share: _sa_fwd(
        proj, x1, idx_jm, W1, W2, b2, rel, mid, share
    ),
    _sa_bwd,
)


# ---------------------------------------------------------------------------
# Ball query
# ---------------------------------------------------------------------------


def _ball_query_kernel(xyz_ref, ctr_ref, idx_ref, *, nsample, min_r, max_r):
    """Grid=(B, M/TM). One (TM, N) squared-distance tile in VMEM; the first
    ``nsample`` in-ball indices per center are extracted in ascending index
    order by repeated min sweeps over an index key (valid -> column index,
    invalid -> N). Reproduces the CUDA streaming first-hit scan semantics
    (reference utils/mm3d_pn2/ops/ball_query/src/ball_query_cuda.cu:12-54):
    slots fill in ascending index order, unfilled slots repeat the FIRST
    hit, a center with zero hits keeps an all-zero row. Distances use exact
    per-coordinate differences, so the kernel's ``d2 == 0`` acceptance
    matches the CUDA test exactly (no matmul-expansion round-off).
    """
    tm = ctr_ref.shape[1]
    n = xyz_ref.shape[1]

    d = jnp.zeros((tm, n), jnp.float32)
    for c in range(3):
        diff = ctr_ref[0, :, c][:, None] - xyz_ref[0, :, c][None, :]
        d += diff * diff

    valid = (d == 0.0) | ((d >= min_r * min_r) & (d < max_r * max_r))
    col = lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    key = jnp.where(valid, col, n)                        # (TM, N)

    first = jnp.min(key, axis=1)                          # (TM,)
    has_hit = first < n
    fill = jnp.where(has_hit, first, 0).astype(jnp.int32)

    for j in range(nsample):
        kmin = jnp.min(key, axis=1)                       # (TM,)
        hit = kmin < n
        idx_ref[0, j, :] = jnp.where(hit, kmin, fill).astype(jnp.int32)
        key = jnp.where(key == kmin[:, None], n, key)


def ball_query(
    min_radius: float,
    max_radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    centers: jnp.ndarray,
) -> jnp.ndarray:
    """Drop-in for jnp_ref.ball_query (idx (B, M, nsample) int32). The jnp
    path runs lax.top_k over a (B, M, N) int key matrix in HBM; this keeps
    the distance tile in VMEM (ECG's get_uniform_loss hot path)."""
    B, N, _ = xyz.shape
    M = centers.shape[1]
    TM = _knn_tile(M)

    idx = pl.pallas_call(
        functools.partial(
            _ball_query_kernel, nsample=nsample,
            min_r=float(min_radius), max_r=float(max_radius),
        ),
        grid=(B, M // TM),
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, 3), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nsample, TM), lambda bi, i: (bi, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nsample, M), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=B * M * N * (9 + 3 * nsample),
            bytes_accessed=B * ((N + M) * 12 + M * nsample * 4),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(
        lax.stop_gradient(xyz).astype(jnp.float32),
        lax.stop_gradient(centers).astype(jnp.float32),
    )
    return lax.stop_gradient(jnp.swapaxes(idx, 1, 2))


# ---------------------------------------------------------------------------
# Scatter-add rows (the gather backward) on the MXU
# ---------------------------------------------------------------------------
#
# XLA lowers the scatter-add backward of a row gather to a row-at-a-time
# custom fusion (~5-10 ns/row); at VRCNet scale (3.1M gathered rows per step
# at level 1 alone) the scatters are the single largest cost in the profile
# (~120 ms of a 422 ms step). The TPU-native formulation is a matmul:
#
#     d_table = onehot(idx)^T @ g
#
# with the (TM, N) one-hot tile built in VMEM (never in HBM) and contracted
# on the MXU. The one-hot is exact in bf16 (0/1); `g` is split into
# hi + lo bf16 parts (bf16x2) so the result matches fp32 scatter-add to
# ~1e-6 relative — the CUDA ops the gathers replace (reference
# utils/mm3d_pn2/ops/{group_points,gather_points}) accumulate in fp32.

_SCATTER_TM = 512
_SCATTER_VMEM_LIMIT = 4 * 1024 * 1024  # max f32 bytes for the (N, C) block


def _scatter_rows_kernel(idx_ref, g_ref, out_ref, *, tm, exact):
    m = pl.program_id(1)
    n = out_ref.shape[1]
    ii = idx_ref[0, 0, pl.ds(m * tm, tm)]                  # (TM,)
    col = lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    oh = (col == ii[:, None]).astype(jnp.bfloat16)          # (TM, N)
    contract = (((0,), (0,)), ((), ()))
    # Cast in VMEM (fused with the tile load) — a host-graph astype would
    # round-trip the full cotangent tensor through HBM.
    g = g_ref[0]
    ghi = g.astype(jnp.bfloat16)
    acc = lax.dot_general(oh, ghi, dimension_numbers=contract,
                          preferred_element_type=jnp.float32)
    if exact:
        glo = (g - ghi.astype(g.dtype)).astype(jnp.bfloat16)
        acc = acc + lax.dot_general(oh, glo, dimension_numbers=contract,
                                    preferred_element_type=jnp.float32)

    @pl.when(m == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] += acc


def scatter_add_rows(
    grads: jnp.ndarray, idx: jnp.ndarray, num_rows: int, exact: bool = True
) -> jnp.ndarray:
    """Segment-sum of ``grads`` rows into ``num_rows`` buckets (MXU one-hot).

    grads: (B, M, C) f32, idx: (B, M) int32 in [0, num_rows) ->
      out (B, num_rows, C) with out[b, r] = sum_{m: idx[b,m]==r} grads[b, m].

    Semantics == ``zeros(B, num_rows, C).at[b, idx].add(grads)`` — the
    backward of a row gather (reference group_points_cuda.cu backward's
    atomicAdd loop). ``exact=True`` splits grads into bf16 hi+lo parts
    (~1e-6 relative of fp32); ``exact=False`` rounds grads to bf16 once
    (~2^-9 relative), halving MXU work.
    """
    B, M, C = grads.shape
    tm = _SCATTER_TM
    pad = (-M) % tm
    if pad:
        # Padded slots point at row `num_rows`, which no one-hot column
        # matches -> they contribute nothing.
        idx = jnp.concatenate(
            [idx, jnp.full((B, pad), num_rows, jnp.int32)], axis=1
        )
        grads = jnp.concatenate(
            [grads, jnp.zeros((B, pad, C), grads.dtype)], axis=1
        )
    Mp = M + pad

    # Synthetic one-hot matmul; useful work is the M*C adds of a scatter-add.
    _audit_flops(2 * B * Mp * num_rows * max(C, 128) * (2 if exact else 1),
                 B * M * C)
    out = pl.pallas_call(
        functools.partial(_scatter_rows_kernel, tm=tm, exact=exact),
        grid=(B, Mp // tm),
        in_specs=[
            pl.BlockSpec((1, 1, Mp), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, C), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, num_rows, C), lambda b, m: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, num_rows, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Mp * num_rows * max(C, 128) * (2 if exact else 1),
            bytes_accessed=B * (Mp * C * 4 + num_rows * C * 4 + Mp * 4),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(idx.astype(jnp.int32).reshape(B, 1, Mp), grads)
    return out


# Gather backwards round the incoming cotangents to bf16 (exact=False) by
# default: every Dense layer's backward matmul already runs at XLA DEFAULT
# precision (bf16-rounded inputs, f32 accumulation), so an exact fp32 edge
# scatter would be more precise than the rest of the backward pass while
# costing 2x MXU work plus a hi/lo split pass. Flip for ablations.
GATHER_BWD_EXACT = False


def _scatter_fits(num_rows: int, C: int) -> bool:
    return num_rows * C * 4 <= _SCATTER_VMEM_LIMIT


def _float0_like(x):
    import numpy as np

    return np.zeros(x.shape, jax.dtypes.float0)


def _gather_rows_kernel(idx_ref, t_ref, o_ref, *, tm, exact=False):
    m = pl.program_id(1)
    n = t_ref.shape[1]
    c = t_ref.shape[2]
    ii = idx_ref[0, 0, pl.ds(m * tm, tm)]                   # (TM,)
    col = lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    oh = (col == ii[:, None]).astype(jnp.bfloat16)
    # Table cast happens in VMEM (no HBM astype round-trip).
    tf = t_ref[0].astype(jnp.float32)
    thi = tf.astype(jnp.bfloat16)
    if exact and 2 * c <= 128:
        # hi+lo split (chamfer-backward pattern): the residual table
        # carries the bf16 rounding error, recovering ~1e-6-of-fp32
        # gathered values. [hi | lo] packed side by side: ONE matmul pass
        # (the MXU processes 128 output lanes either way; two separate
        # (N, C<=64) matmuls would pay two full passes).
        tlo = (tf - thi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc2 = jnp.dot(oh, jnp.concatenate([thi, tlo], axis=-1),
                       preferred_element_type=jnp.float32)
        acc = acc2[:, :c] + acc2[:, c:]
    else:
        acc = jnp.dot(oh, thi, preferred_element_type=jnp.float32)
        if exact:
            tlo = (tf - thi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = acc + jnp.dot(oh, tlo, preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _gather_rows_onehot(features: jnp.ndarray, flat_idx: jnp.ndarray,
                        exact: bool = False):
    """(B, N, C) x (B, M) -> (B, M, C) via a VMEM one-hot MXU matmul.

    The table is rounded to bf16 (the one-hot itself is exact): XLA's
    row-at-a-time gather costs ~6 ns/row regardless of width, so at VRCNet
    scale (>3M gathered rows per level) the MXU formulation is 2-6x faster.
    Used for ACTIVATION gathers only — every downstream matmul would round
    the gathered values to bf16 anyway (XLA DEFAULT precision).
    ``exact``: hi+lo bf16 table split (~1e-6 of fp32, 2 matmuls) — for
    value-sensitive gathers (e.g. RRI coordinates feeding the T_q
    cancellation) that would otherwise stay on the slow row-gather path.
    """
    B, N, C = features.shape
    # Mosaic compile time explodes (minutes) for awkward lane counts
    # (observed: C=120 with a 2-step grid took 230 s; C=128 or C=64 take
    # <1 s) — pad wide non-multiple-of-128 channel counts up to the next
    # lane boundary and slice the output.
    cpad = (-C) % 128 if C > 64 else 0
    if cpad:
        features = jnp.pad(features, ((0, 0), (0, 0), (0, cpad)))
        C = C + cpad
    M = flat_idx.shape[1]
    tm = _SCATTER_TM
    pad = (-M) % tm
    if pad:
        flat_idx = jnp.concatenate(
            [flat_idx, jnp.zeros((B, pad), jnp.int32)], axis=1
        )
    Mp = M + pad
    # Synthetic one-hot matmul; a gather performs no arithmetic.
    _audit_flops(2 * B * Mp * N * max(C, 128), 0.0)
    out = pl.pallas_call(
        functools.partial(_gather_rows_kernel, tm=tm, exact=exact),
        grid=(B, Mp // tm),
        in_specs=[
            pl.BlockSpec((1, 1, Mp), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, C), lambda b, m: (b, m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Mp, C), features.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Mp * N * max(C, 128),
            bytes_accessed=B * (Mp * C * 4 + N * C * 2 + Mp * 4),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(flat_idx.reshape(B, 1, Mp), features)
    if cpad:
        out = out[..., : C - cpad]
    return out[:, :M] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows(
    features: jnp.ndarray, idx: jnp.ndarray, approx: bool = False
) -> jnp.ndarray:
    """Row gather with an MXU scatter backward.

    features: (B, N, C), idx: (B, ...) int -> (B, ..., C).

    approx=False: forward is the plain XLA gather (exact, row-bound).
    approx=True: forward is a one-hot MXU matmul with the table rounded to
    bf16 — for activation gathers, where every consumer matmul applies the
    same rounding anyway. approx="hilo": one-hot MXU matmul with a hi+lo
    bf16 table split (~1e-6 of fp32 — value-sensitive coordinate gathers
    at MXU speed). Backward always routes through
    ``scatter_add_rows`` instead of XLA's row-at-a-time scatter fusion.
    """
    B, N, C = features.shape
    flat = idx.reshape(B, -1).astype(jnp.int32)
    if approx == "hilo":
        out = _gather_rows_onehot(features, flat, exact=True).astype(
            features.dtype)
    elif approx:
        out = _gather_rows_onehot(features, flat).astype(features.dtype)
    else:
        out = jnp.take_along_axis(features, flat[..., None], axis=1)
    return out.reshape(idx.shape + (C,))


def _gather_rows_fwd(features, idx, approx):
    return gather_rows(features, idx, approx), (features.shape, idx)


def _gather_rows_bwd(approx, res, g):
    (B, N, C), idx = res
    flat = idx.reshape(B, -1).astype(jnp.int32)
    if C <= 8:
        # Narrow channels: the one-hot matmul emits <=8-lane outputs, which
        # Mosaic handles poorly (3-lane chamfer scatters regressed PCN 3x);
        # XLA's row scatter is cheap at these widths.
        gf = g.reshape(B, -1, C)
        d_feat = jax.vmap(lambda acc, i, upd: acc.at[i].add(upd))(
            jnp.zeros((B, N, C), gf.dtype), flat, gf
        )
    else:
        d_feat = scatter_add_rows(
            g.astype(jnp.float32).reshape(B, -1, C), flat, N,
            exact=GATHER_BWD_EXACT,
        )
    # The gather preserves dtype, so g.dtype == features.dtype.
    return d_feat.astype(g.dtype), _float0_like(idx)


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def _gather_split_kernel(idx_ref, t_ref, o1_ref, o2_ref, *, tm, c1):
    m = pl.program_id(1)
    n = t_ref.shape[1]
    ii = idx_ref[0, 0, pl.ds(m * tm, tm)]                   # (TM,)
    col = lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    oh = (col == ii[:, None]).astype(jnp.bfloat16)
    t = t_ref[0].astype(jnp.bfloat16)
    g = jnp.dot(oh, t, preferred_element_type=jnp.float32)
    # The split happens on register values — an XLA-side lane slice of the
    # gathered tensor costs a full (B, N, k, C) relayout copy instead.
    o1_ref[0] = g[:, :c1].astype(o1_ref.dtype)
    o2_ref[0] = g[:, c1:].astype(o2_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def grouping_split(features: jnp.ndarray, idx: jnp.ndarray, c1: int):
    """Gather rows and split channels [0:c1] / [c1:] in one kernel.

    features: (B, N, C), idx: (B, M, K) -> ((B, M, K, c1), (B, M, K, C-c1)).

    Equivalent to slicing ``grouping_operation``'s output, but the two
    outputs are written directly from the one-hot matmul's registers — the
    SA-module's rel/mid split (reference completion/models/vrcnet.py:21-57)
    otherwise pays two full lane-slice copies per level. bf16-table approx
    forward + MXU scatter backward like ``gather_rows(approx=True)``.
    """
    B, N, C = features.shape
    flat = idx.reshape(B, -1).astype(jnp.int32)
    M = flat.shape[1]
    tm = _SCATTER_TM
    pad = (-M) % tm
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((B, pad), jnp.int32)], axis=1
        )
    Mp = M + pad
    # Synthetic one-hot matmul; a gather+split performs no arithmetic.
    _audit_flops(2 * B * Mp * N * max(C, 128), 0.0)
    o1, o2 = pl.pallas_call(
        functools.partial(_gather_split_kernel, tm=tm, c1=c1),
        grid=(B, Mp // tm),
        in_specs=[
            pl.BlockSpec((1, 1, Mp), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tm, c1), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, C - c1), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Mp, c1), features.dtype),
            jax.ShapeDtypeStruct((B, Mp, C - c1), features.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Mp * N * max(C, 128),
            bytes_accessed=B * (Mp * C * 4 + N * C * 2 + Mp * 4),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(flat.reshape(B, 1, Mp), features)
    shp = idx.shape
    return o1[:, :M].reshape(shp + (c1,)), o2[:, :M].reshape(shp + (C - c1,))


def _grouping_split_fwd(features, idx, c1):
    return grouping_split(features, idx, c1), (features.shape, idx)


def _grouping_split_bwd(c1, res, gs):
    (B, N, C), idx = res
    g1, g2 = gs
    flat = idx.reshape(B, -1).astype(jnp.int32)
    g = jnp.concatenate(
        [g1.reshape(B, -1, c1), g2.reshape(B, -1, C - c1)], axis=-1
    )
    d_feat = scatter_add_rows(
        g.astype(jnp.float32), flat, N, exact=GATHER_BWD_EXACT
    )
    return d_feat.astype(g1.dtype), _float0_like(idx)


grouping_split.defvjp(_grouping_split_fwd, _grouping_split_bwd)


def _approx_default(C: int) -> bool:
    # C == 3 gathers move raw xyz coordinates (chamfer/knn recomputation,
    # FPS outputs, uniform-loss disks) and stay exact; wider gathers move
    # activations whose consumers round to bf16 at the next matmul anyway.
    return C > 3


def grouping_operation(features: jnp.ndarray, idx: jnp.ndarray,
                       approx: bool | None = None) -> jnp.ndarray:
    """Drop-in for jnp_ref.grouping_operation with the MXU scatter backward.

    ``approx``: None -> per-width default (_approx_default; C=3 coordinate
    gathers stay exact row gathers). True -> force the bf16 one-hot MXU
    gather even at C=3 (lane-padded to 8) — measured 6.5 vs 10.0 ms at the
    DCP get_graph_feature shape (B32, 41k rows, N2048). Only valid where
    the gathered values are consumed at bf16 anyway and never enter a
    cancellation-prone subtraction (DCP's concat-[x_j, x_i] edges)."""
    B, N, C = features.shape
    if not _scatter_fits(N, C):
        return jnp_ref.grouping_operation(features, idx)
    use_approx = _approx_default(C) if approx is None else approx
    if use_approx and C < 8:
        pad = 8 - C
        out = gather_rows(
            jnp.pad(features, ((0, 0), (0, 0), (0, pad))), idx, use_approx)
        return out[..., :C]
    return gather_rows(features, idx, use_approx)


def gather_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for jnp_ref.gather_points with the MXU scatter backward."""
    B, N, C = features.shape
    if not _scatter_fits(N, C):
        return jnp_ref.gather_points(features, idx)
    return gather_rows(features, idx, _approx_default(C))


def three_interpolate(
    features: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """Drop-in for jnp_ref.three_interpolate with the MXU scatter backward."""
    B, M, C = features.shape
    N = idx.shape[1]
    if not _scatter_fits(M, C):
        return jnp_ref.three_interpolate(features, idx, weight)
    if N % _TI_TM == 0:
        return three_interpolate_fused(features, idx, weight)
    gathered = gather_rows(features, idx, _approx_default(C))  # (B, N, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)


# ---------------------------------------------------------------------------
# Auction EMD
# ---------------------------------------------------------------------------
#
# The jnp reference materializes the (B, n, m) sqrt-distance matrix in HBM
# (16 MB per batch element at 2048^2) and every auction round re-streams it
# through the while_loop body. This kernel runs the WHOLE auction per batch
# element on-chip: coordinates, prices, and assignment state live in VMEM
# scratch across all rounds, and each round recomputes benefit tiles from
# the (n, 3) coordinates on the fly (48 KB of coords replaces 16 MB of D).
# The CUDA original (reference utils/metrics/EMD/emd_cuda.cu:95-269) tiles
# xyz2 through shared memory per bid round and resolves multi-bidder races
# with atomics; here every phase is a deterministic masked reduction
# (segment-max via target-tile masks), matching jnp_ref._emd_body's
# tie-break (highest bidder index wins) exactly.

_EMD_TN = 256
# Cache the price-independent benefit base (3 - sqrt(dist)) in VMEM when the
# (n, m) f32 plane fits: at the protocol scale (2048^2 = 16.8 MB) this
# removes the 9-op distance rebuild + sqrt transcendental from EVERY auction
# round (they are constants of the pair) for a one-time prologue fill.
_EMD_CACHE_BYTES = 32 * 1024 * 1024


def _emd_kernel(x1_ref, x2_ref, idx_ref, price_ref, assign_ref, inv_ref,
                besti_ref, binc_ref, *scratch, n, m, eps, iters, tn,
                cache_c):
    neg_inf = jnp.float32(-jnp.inf)
    c_ref = scratch[0] if cache_c else None

    price_ref[0, :] = jnp.zeros((m,), jnp.float32)
    assign_ref[0, :] = jnp.full((n,), -1, jnp.int32)
    inv_ref[0, :] = jnp.full((m,), -1, jnp.int32)
    # besti/binc are read where-masked by `unass` before any gated bid tile
    # could have skipped writing them, but round 0 is all-unassigned so every
    # tile writes once before any read; no init needed.

    def _benefit_base(t):
        """(tn, m) price-independent benefit base for bidder tile t."""
        d = jnp.zeros((tn, m), jnp.float32)
        for c in range(3):
            diff = (x1_ref[0, pl.ds(t * tn, tn), c][:, None]
                    - x2_ref[0, :, c][None, :])
            d += diff * diff
        return 3.0 - jnp.sqrt(d)

    if cache_c:
        def fill(t, _):
            c_ref[pl.ds(t * tn, tn), :] = _benefit_base(t)
            return 0

        lax.fori_loop(0, n // tn, fill, 0)

    def bid_phase():
        """Per n-tile: top-2 benefit -> best_i, bid_inc into scratch.

        Tiles whose points are all assigned are skipped: their stale
        besti/binc entries are only ever consumed under an `unass` mask.
        """
        price_row = price_ref[0, :][None, :]                # (1, m)

        def tile(t, _):
            unass_t = assign_ref[0, pl.ds(t * tn, tn)] < 0

            @pl.when(jnp.any(unass_t))
            def _():
                if cache_c:
                    base = c_ref[pl.ds(t * tn, tn), :]
                else:
                    base = _benefit_base(t)
                benefit = base - price_row                  # (tn, m)
                best_i = jnp.argmax(benefit, axis=1).astype(jnp.int32)
                best = jnp.max(benefit, axis=1)
                col = lax.broadcasted_iota(jnp.int32, (tn, m), 1)
                second = jnp.max(
                    jnp.where(col == best_i[:, None], neg_inf, benefit),
                    axis=1,
                )
                besti_ref[0, pl.ds(t * tn, tn)] = best_i
                binc_ref[0, pl.ds(t * tn, tn)] = best - second + eps

            return 0

        lax.fori_loop(0, n // tn, tile, 0)

    def round_body(carry):
        it, _ = carry
        bid_phase()

        unass = assign_ref[0, :] < 0                        # (n,)
        masked_inc = jnp.where(unass, binc_ref[0, :], neg_inf)
        best_i_row = besti_ref[0, :][None, :]               # (1, n)
        minc_row = masked_inc[None, :]                      # (1, n)
        bid_tile_of = jnp.where(unass, besti_ref[0, :] // tn, -1)
        bidder = lax.broadcasted_iota(jnp.int32, (tn, n), 1)

        # Segment max over bidders per target tile: max bid increment and
        # (among tied max bids) the highest bidder index -> the winner.
        # Eviction + assignment fold in per won target: inv_ref[t] is
        # always the CURRENT owner of t (it is only rewritten when t is
        # won, by its new owner), so the previous owner of a won target is
        # exactly the point to evict; the winner (an unassigned bidder —
        # only unassigned points bid, so never the previous owner) takes
        # it. Each point owns at most one target and wins at most one
        # (it bids on exactly one), so per-tile assignment updates are
        # disjoint and the fold needs no separate owner pass.
        def tgt_tile(t, carry):
            @pl.when(jnp.any(bid_tile_of == t))
            def _():
                trow = (lax.broadcasted_iota(jnp.int32, (tn, n), 0) + t * tn)
                tmask = best_i_row == trow                  # (tn, n)
                bids = jnp.where(tmask, minc_row, neg_inf)
                max_inc = jnp.max(bids, axis=1)             # (tn,)
                winner = jnp.max(
                    jnp.where(bids == max_inc[:, None], bidder, -1), axis=1
                )
                # No bids -> max_inc = -inf -> winner must stay -1.
                winner = jnp.where(max_inc == neg_inf, -1, winner)
                won = winner >= 0
                old_inv = inv_ref[0, pl.ds(t * tn, tn)]
                price_ref[0, pl.ds(t * tn, tn)] = (
                    price_ref[0, pl.ds(t * tn, tn)]
                    + jnp.where(won, max_inc, 0.0)
                )
                inv_ref[0, pl.ds(t * tn, tn)] = jnp.where(
                    won, winner, old_inv
                )

                pt = lax.broadcasted_iota(jnp.int32, (tn, n), 1)
                evict_src = jnp.where(won & (old_inv >= 0), old_inv, -1)
                evicted = jnp.any(evict_src[:, None] == pt, axis=0)  # (n,)
                wmask = winner[:, None] == pt               # (tn, n)
                tvals = (lax.iota(jnp.int32, tn) + t * tn)[:, None]
                contrib = jnp.sum(jnp.where(wmask, tvals, 0), axis=0)
                hit = jnp.any(wmask, axis=0)
                a_row = assign_ref[0, :]
                assign_ref[0, :] = jnp.where(
                    hit, contrib, jnp.where(evicted, -1, a_row)
                )

            return carry

        lax.fori_loop(0, m // tn, tgt_tile, 0)
        n_unass = jnp.sum((assign_ref[0, :] < 0).astype(jnp.int32))
        return it + 1, n_unass

    def cond(carry):
        it, n_unass = carry
        return (it < iters - 1) & (n_unass > 0)

    lax.while_loop(cond, round_body, (0, jnp.int32(n)))

    # Final forced round (CUDA last=true): every leftover takes its current
    # best target, possibly breaking bijectivity — exactly like jnp_ref.
    # (When the auction converged this is all-gated-off: zero bid tiles.)
    bid_phase()
    unass = assign_ref[0, :] < 0
    idx_ref[0, 0, :] = jnp.where(unass, besti_ref[0, :], assign_ref[0, :])


def _emd_assignment_pallas(xyz1, xyz2, eps, iters):
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    tn = _EMD_TN if n % _EMD_TN == 0 else 128
    cache_c = n * m * 4 <= _EMD_CACHE_BYTES
    scratch = [
        pltpu.VMEM((1, m), jnp.float32),   # price
        pltpu.VMEM((1, n), jnp.int32),     # assignment
        pltpu.VMEM((1, m), jnp.int32),     # inverse assignment / winner
        pltpu.VMEM((1, n), jnp.int32),     # best target per bidder
        pltpu.VMEM((1, n), jnp.float32),   # bid increment per bidder
    ]
    if cache_c:
        scratch.append(pltpu.VMEM((n, m), jnp.float32))  # 3 - sqrt(dist)
    assignment = pl.pallas_call(
        functools.partial(_emd_kernel, n=n, m=m, eps=float(eps),
                          iters=int(iters), tn=tn, cache_c=cache_c),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # The index plane rides as (B, 1, n) so the block's trailing two
        # dims are (1, n) against array dims (1, n) — a 2-D (B, n) output
        # with block (1, n) violates Mosaic's sublane rule for B % 8 != 0.
        out_specs=pl.BlockSpec((1, 1, n), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, n), jnp.int32),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=B * iters * n * m * 20,
            bytes_accessed=B * (n + m) * 24,
            transcendentals=B * iters * n * m,
        ),
        # The cached (n, m) benefit plane alone exceeds Mosaic's default
        # 16 MiB scoped-VMEM budget at the 2048^2 protocol scale; grant the
        # kernel the cache plus headroom for its (tn, m) working tiles.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(n * m * 4 + 24 * 1024 * 1024) if cache_c
            else None,
        ),
        interpret=_interpret(),
    )(xyz1.astype(jnp.float32), xyz2.astype(jnp.float32))
    return assignment.reshape(B, n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def emd_auction(xyz1, xyz2, eps: float = 0.005, iters: int = 50):
    """Fused on-chip auction EMD (semantics == jnp_ref.emd_auction).

    Returns (dist (B, n) squared L2 to the assigned gt point, assignment
    (B, n) int32); gradient w.r.t. xyz1 only, like the reference
    (utils/metrics/EMD/emd_module.py:72-81). Distances inside the auction
    use exact per-coordinate planes (the jnp reference uses the
    HIGHEST-precision matmul expansion, so assignments can differ at
    ~1e-7-level benefit ties; the returned dist is exact either way).
    """
    return _emd_pallas_forward(xyz1, xyz2, eps, iters)


def _emd_pallas_forward(xyz1, xyz2, eps, iters):
    jnp_ref.emd_validate(xyz1, xyz2)
    assignment = lax.stop_gradient(
        _emd_assignment_pallas(xyz1, xyz2, eps, iters)
    )
    matched = jnp.take_along_axis(xyz2, assignment[..., None], axis=1)
    dist = jnp.sum((xyz1 - matched) ** 2, axis=-1)
    return dist, assignment


def _emd_pallas_fwd(xyz1, xyz2, eps, iters):
    dist, assignment = _emd_pallas_forward(xyz1, xyz2, eps, iters)
    return (dist, assignment), (xyz1, xyz2, assignment)


def _emd_pallas_bwd(eps, iters, res, g):
    xyz1, xyz2, assignment = res
    g_dist, _ = g
    matched = jnp.take_along_axis(xyz2, assignment[..., None], axis=1)
    dx1 = 2.0 * g_dist[..., None] * (xyz1 - matched)
    return dx1, jnp.zeros_like(xyz2)


emd_auction.defvjp(_emd_pallas_fwd, _emd_pallas_bwd)


# ---------------------------------------------------------------------------
# Fused multi-head attention (DCP's transformer pointer)
# ---------------------------------------------------------------------------
#
# The reference pointer materializes softmax(QK^T/sqrt(d)) per head
# (registration/models/dcp.py:26-32): at B32 x H4 x 2048^2 that is 2.1 GB of
# f32 score + weight tensors streamed through HBM several times per step —
# the DCP profile's dominant cost (~211 of 389 ms/step). jax's bundled flash
# kernel was measured SLOWER than dense XLA here (61 vs 41 ms per call f+b):
# its blockwise online-softmax rescaling is pure overhead when the whole
# (M, D) K/V panes fit in VMEM. This kernel exploits exactly that: per
# (batch*head, q-tile) program, K/V live in VMEM (bf16: 512 KB each at
# M=2048, D=128), the (TM, M) score plane exists only in registers, and the
# softmax is a single exact pass (row max / exp / row sum — no rescaling).
# Matmul inputs are bf16 with f32 accumulation — identical arithmetic to
# XLA's DEFAULT TPU precision for f32 operands — and the softmax runs in
# f32, unlike the round-2 bf16 cast that bypassed the dtype policy.
#
# The backward recomputes the softmax from Q/K (cheaper than streaming a
# saved 2 GB weight tensor back from HBM) and accumulates dK/dV across
# q-tiles in the output block, relying on TPU grids executing sequentially.

_ATTN_TM = 256


def _attn_math_fwd(q, k, v, scale, out_dtype):
    """Single-pass exact-softmax attention on VMEM-resident panes."""
    q = q.astype(jnp.bfloat16)                               # (TM, D)
    k = k.astype(jnp.bfloat16)                               # (M, D)
    s = lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                                # (TM, M) f32
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)
    return jnp.dot(
        p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def _attn_math_bwd(q, k, v, do, scale):
    """Backward math on one q-tile: returns (dq, dk_tile, dv_tile)."""
    q = q.astype(jnp.bfloat16)
    k = k.astype(jnp.bfloat16)
    v = v.astype(jnp.bfloat16)
    do = do.astype(jnp.float32)                              # (TM, D)

    s = lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)                # (TM, M) f32

    p16 = p.astype(jnp.bfloat16)
    do16 = do.astype(jnp.bfloat16)
    contractT = (((0,), (0,)), ((), ()))
    dv_tile = lax.dot_general(p16, do16, dimension_numbers=contractT,
                              preferred_element_type=jnp.float32)  # (M, Dv)
    dp = lax.dot_general(do16, v, dimension_numbers=(((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)       # (TM, M)
    delta = jnp.sum(p * dp, axis=1, keepdims=True)           # (TM, 1)
    ds = (p * (dp - delta)) * scale                          # (TM, M) f32
    ds16 = ds.astype(jnp.bfloat16)
    dq = jnp.dot(ds16, k, preferred_element_type=jnp.float32)
    dk_tile = lax.dot_general(ds16, q, dimension_numbers=contractT,
                              preferred_element_type=jnp.float32)  # (M, D)
    return dq, dk_tile, dv_tile


def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    o_ref[0] = _attn_math_fwd(q_ref[0], k_ref[0], v_ref[0], scale,
                              o_ref.dtype)


def _attn_fwd_save_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, *, scale):
    """Forward + saved softmax row stats (max, sum-of-exp) for the
    flash-style split backward used at D > 128."""
    q = q_ref[0].astype(jnp.bfloat16)                        # (TM, D)
    k = k_ref[0].astype(jnp.bfloat16)                        # (M, D)
    s = lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                                # (TM, M) f32
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=1, keepdims=True)
    o_ref[0] = jnp.dot(
        (e / l).astype(jnp.bfloat16), v_ref[0].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)
    m_ref[0, 0] = m[:, 0]
    l_ref[0, 0] = l[:, 0]


def _attn_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, dl_ref,
                        dq_ref, *, scale):
    """dQ over q-tiles: recompute p from saved row stats; delta
    (= rowsum(do * o)) precomputed outside. No (M, D) accumulator."""
    q = q_ref[0].astype(jnp.bfloat16)                        # (TM, D)
    k = k_ref[0].astype(jnp.bfloat16)                        # (M, D)
    s = lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jnp.exp(s - m_ref[0, 0][:, None]) / l_ref[0, 0][:, None]
    do = do_ref[0].astype(jnp.bfloat16)                      # (TM, Dv)
    dp = lax.dot_general(
        do, v_ref[0].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # (TM, M)
    ds = (p * (dp - dl_ref[0, 0][:, None])) * scale
    dq_ref[0] = jnp.dot(
        ds.astype(jnp.bfloat16), k, preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)


def _attn_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, dl_ref,
                         dk_ref, dv_ref, *, scale):
    """dK/dV over k-tiles: the transposed score plane (TN, Nq) is rebuilt
    per tile from the k-tile against the full Q pane, p comes from the
    saved row stats, and dk/dv are written per-tile — the (M, D) f32
    accumulator that OOMed the monolithic backward at D=512 never exists."""
    kt = k_ref[0].astype(jnp.bfloat16)                       # (TN, D)
    q = q_ref[0].astype(jnp.bfloat16)                        # (Nq, D)
    sT = lax.dot_general(
        kt, q, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                                # (TN, Nq)
    pT = jnp.exp(sT - m_ref[0, 0][None, :]) / l_ref[0, 0][None, :]
    do = do_ref[0].astype(jnp.bfloat16)                      # (Nq, Dv)
    dv_ref[0] = jnp.dot(
        pT.astype(jnp.bfloat16), do, preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dpT = lax.dot_general(
        v_ref[0].astype(jnp.bfloat16), do,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # (TN, Nq)
    dsT = (pT * (dpT - dl_ref[0, 0][None, :])) * scale
    dk_ref[0] = jnp.dot(
        dsT.astype(jnp.bfloat16), q, preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     *, scale):
    t = pl.program_id(1)
    dq, dk_tile, dv_tile = _attn_math_bwd(
        q_ref[0], k_ref[0], v_ref[0], do_ref[0], scale
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(t == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk_tile
    dv_ref[0] += dv_tile


def _attn_bwd_kernel_bnhd(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref,
                          dv_ref, *, scale):
    """Same blocks as _attn_bwd_kernel (the head axis picks a dk-wide LANE
    chunk of the (B, N, H*dk) view, so refs are 3-D); only the q-tile index
    moves to grid axis 2."""
    t = pl.program_id(2)
    dq, dk_tile, dv_tile = _attn_math_bwd(
        q_ref[0], k_ref[0], v_ref[0], do_ref[0], scale
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(t == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk_tile
    dv_ref[0] += dv_tile


def _attn_tm(n: int, d: int = 128) -> int:
    # Wide single-head attention (the svd_head correspondence, D=512) keeps
    # a (M, D) f32 dk accumulator + bf16 K pane resident in the backward;
    # TM=256's extra score registers pushed it past the 16 MiB kernel
    # stack (measured VMEM OOM) — drop to 128 there.
    sizes = (128,) if d > 128 else (_ATTN_TM, 128)
    for tm in sizes:
        if n % tm == 0:
            return tm
    return n


def fused_attention_ok(q, k, v, mask) -> bool:
    """Shape gate for the fused kernel (layers.mha_attention dispatches;
    the on-TPU check lives in the dispatcher, not here — tests drive the
    kernel in interpret mode through this same gate)."""
    if mask is not None or q.ndim != 4:
        return False
    D = q.shape[-1]
    Nq, M = q.shape[2], k.shape[2]
    return (
        D % 128 == 0
        and v.shape[-1] % 128 == 0       # value width may differ from D
        and M == v.shape[2]
        and Nq % 128 == 0
        and M % 128 == 0
        and Nq % _attn_tm(Nq, D) == 0
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, scale: float):
    """softmax(q k^T * scale) v with the score plane never leaving VMEM.

    q: (BH, Nq, D), k/v: (BH, M, D); returns (BH, Nq, D) in q.dtype.
    Matmul inputs bf16 / f32 accumulation (== XLA DEFAULT for f32 on TPU);
    softmax exact f32. Semantics == layers.attention (reference
    registration/models/dcp.py:26-32) up to DEFAULT-precision rounding.
    """
    return _attn_forward(q, k, v, scale)


def _attn_specs(BH, Nq, M, D, Dv, tm):
    return [
        pl.BlockSpec((1, tm, D), lambda bh, t: (bh, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M, D), lambda bh, t: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M, Dv), lambda bh, t: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _attn_forward(q, k, v, scale, save_stats=False):
    BH, Nq, D = q.shape
    M = k.shape[1]
    Dv = v.shape[-1]
    tm = _attn_tm(Nq, D)
    cost = pl.CostEstimate(
        flops=2 * BH * Nq * M * (D + Dv),
        bytes_accessed=BH * (Nq * (D + Dv) * 4 + M * (D + Dv) * 4),
        transcendentals=BH * Nq * M,
    )
    if save_stats:
        return pl.pallas_call(
            functools.partial(_attn_fwd_save_kernel, scale=float(scale)),
            grid=(BH, Nq // tm),
            in_specs=_attn_specs(BH, Nq, M, D, Dv, tm),
            out_specs=[
                pl.BlockSpec((1, tm, Dv), lambda bh, t: (bh, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tm), lambda bh, t: (bh, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tm), lambda bh, t: (bh, 0, t),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((BH, Nq, Dv), q.dtype),
                jax.ShapeDtypeStruct((BH, 1, Nq), jnp.float32),
                jax.ShapeDtypeStruct((BH, 1, Nq), jnp.float32),
            ],
            cost_estimate=cost,
            interpret=_interpret(),
        )(q, k, v)
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel, scale=float(scale)),
        grid=(BH, Nq // tm),
        in_specs=_attn_specs(BH, Nq, M, D, Dv, tm),
        out_specs=pl.BlockSpec((1, tm, Dv), lambda bh, t: (bh, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Nq, Dv), q.dtype),
        cost_estimate=cost,
        interpret=_interpret(),
    )(q, k, v)


def _attn_fwd(q, k, v, scale):
    if q.shape[-1] > 128:
        # Wide-D (svd_head, D=512): the monolithic backward's (M, D) f32
        # accumulator OOMs the kernel stack — use the flash-style split
        # backward, which needs the softmax row stats.
        o, m, l = _attn_forward(q, k, v, scale, save_stats=True)
        return o, (q, k, v, o, m, l)
    return _attn_forward(q, k, v, scale), (q, k, v)


def _attn_bwd_split(scale, q, k, v, o, mrow, lrow, d_out):
    """Flash-style backward: dQ over q-tiles, dK/dV over k-tiles, softmax
    rebuilt from saved row stats, delta = rowsum(do * o) precomputed."""
    BH, Nq, D = q.shape
    M = k.shape[1]
    Dv = v.shape[-1]
    tm = tn = 128
    delta = jnp.sum(
        d_out.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )[:, None, :]                                            # (BH, 1, Nq)
    row_spec = pl.BlockSpec((1, 1, tm), lambda bh, t: (bh, 0, t),
                            memory_space=pltpu.VMEM)
    full_row_spec = pl.BlockSpec((1, 1, Nq), lambda bh, t: (bh, 0, 0),
                                 memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_attn_bwd_dq_kernel, scale=float(scale)),
        grid=(BH, Nq // tm),
        in_specs=_attn_specs(BH, Nq, M, D, Dv, tm) + [
            pl.BlockSpec((1, tm, Dv), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec,
        ],
        out_specs=pl.BlockSpec((1, tm, D), lambda bh, t: (bh, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Nq, D), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * BH * Nq * M * (2 * D + Dv),
            bytes_accessed=BH * (2 * Nq * D * 4 + M * (D + Dv) * 4),
            transcendentals=BH * Nq * M,
        ),
        interpret=_interpret(),
    )(q, k, v, d_out, mrow, lrow, delta)
    dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_dkv_kernel, scale=float(scale)),
        grid=(BH, M // tn),
        in_specs=[
            pl.BlockSpec((1, Nq, D), lambda bh, t: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, D), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, Dv), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nq, Dv), lambda bh, t: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            full_row_spec, full_row_spec, full_row_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, tn, D), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, Dv), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, M, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, M, Dv), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * BH * Nq * M * (2 * D + 2 * Dv),
            bytes_accessed=BH * (Nq * (D + Dv) * 4 + 2 * M * D * 4),
            transcendentals=BH * Nq * M,
        ),
        interpret=_interpret(),
    )(q, k, v, d_out, mrow, lrow, delta)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _attn_bwd(scale, res, d_out):
    if len(res) == 6:
        return _attn_bwd_split(scale, *res, d_out)
    q, k, v = res
    BH, Nq, D = q.shape
    M = k.shape[1]
    Dv = v.shape[-1]
    tm = _attn_tm(Nq, D)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=float(scale)),
        grid=(BH, Nq // tm),
        in_specs=_attn_specs(BH, Nq, M, D, Dv, tm) + [
            pl.BlockSpec((1, tm, Dv), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tm, D), lambda bh, t: (bh, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, D), lambda bh, t: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, Dv), lambda bh, t: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Nq, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, M, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, M, Dv), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * BH * Nq * M * D + 4 * BH * Nq * M * Dv,
            bytes_accessed=BH * (2 * Nq * D * 8 + 3 * M * D * 8),
            transcendentals=BH * Nq * M,
        ),
        interpret=_interpret(),
    )(q, k, v, d_out)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


fused_attention.defvjp(_attn_fwd, _attn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention_bnhd(q, k, v, scale: float):
    """fused_attention over the PROJECTION-NATIVE layout: q (B, Nq, H, dk),
    k/v (B, M, H, dk) -> (B, Nq, H, dk).

    The (BH, N, dk) entry forces callers to materialize the
    (B, N, H, dk) -> (B, H, N, dk) transpose at the pallas_call boundary
    (XLA cannot fuse a copy into a custom kernel's operand); this variant
    views the array as (B, N, H*dk) — the SAME memory — and picks each
    head's dk-wide lane chunk via the last-dim block index, with the head
    on the grid: 2 fewer materialized (B, N, H*dk) copies per call forward
    and 2 backward. (A 4-D (1, tm, 1, dk) block is NOT Mosaic-legal: the
    sublane dim must be divisible by 8 or span the array.)
    """
    return _attn_forward_bnhd(q, k, v, scale)


def _attn_bnhd_specs(Nq, M, dk, tm):
    return [
        pl.BlockSpec((1, tm, dk), lambda b, h, t: (b, t, h),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M, dk), lambda b, h, t: (b, 0, h),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M, dk), lambda b, h, t: (b, 0, h),
                     memory_space=pltpu.VMEM),
    ]


def _attn_forward_bnhd(q, k, v, scale):
    B, Nq, H, dk = q.shape
    M = k.shape[1]
    tm = _attn_tm(Nq, dk)
    out = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, scale=float(scale)),
        grid=(B, H, Nq // tm),
        in_specs=_attn_bnhd_specs(Nq, M, dk, tm),
        out_specs=pl.BlockSpec((1, tm, dk), lambda b, h, t: (b, t, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Nq, H * dk), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Nq * M * dk,
            bytes_accessed=B * H * (Nq + M) * dk * 8,
            transcendentals=B * H * Nq * M,
        ),
        interpret=_interpret(),
    )(q.reshape(B, Nq, H * dk), k.reshape(B, M, H * dk),
      v.reshape(B, M, H * dk))
    return out.reshape(B, Nq, H, dk)


def _attn_bnhd_fwd(q, k, v, scale):
    return _attn_forward_bnhd(q, k, v, scale), (q, k, v)


def _attn_bnhd_bwd(scale, res, d_out):
    q, k, v = res
    B, Nq, H, dk = q.shape
    M = k.shape[1]
    tm = _attn_tm(Nq, dk)
    dq, dk_, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel_bnhd, scale=float(scale)),
        grid=(B, H, Nq // tm),
        in_specs=_attn_bnhd_specs(Nq, M, dk, tm) + [
            pl.BlockSpec((1, tm, dk), lambda b, h, t: (b, t, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tm, dk), lambda b, h, t: (b, t, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, dk), lambda b, h, t: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, dk), lambda b, h, t: (b, 0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Nq, H * dk), jnp.float32),
            jax.ShapeDtypeStruct((B, M, H * dk), jnp.float32),
            jax.ShapeDtypeStruct((B, M, H * dk), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * Nq * M * dk,
            bytes_accessed=B * H * (2 * Nq + 3 * M) * dk * 8,
            transcendentals=B * H * Nq * M,
        ),
        interpret=_interpret(),
    )(q.reshape(B, Nq, H * dk), k.reshape(B, M, H * dk),
      v.reshape(B, M, H * dk), d_out.reshape(B, Nq, H * dk))
    return (dq.reshape(B, Nq, H, dk).astype(q.dtype),
            dk_.reshape(B, M, H, dk).astype(k.dtype),
            dv.reshape(B, M, H, dk).astype(v.dtype))


fused_attention_bnhd.defvjp(_attn_bnhd_fwd, _attn_bnhd_bwd)


# ---------------------------------------------------------------------------
# Fused per-edge MLP chain (DCP's DGCNN edge-conv blocks)
# ---------------------------------------------------------------------------
#
# The reference DGCNN (registration/models/dcp.py:269-301) runs
# Conv2d+BN+ReLU over the (B, k, N, ch) edge tensor four times and
# max-pools each block over k. In XLA, every block materializes its
# (B, 20, 2048, ch) activations in HBM (f32: 0.7-2.7 GB each) several
# times forward and backward — DCP's dominant non-attention cost. But the
# whole chain is a *per-edge* MLP: edge (b, n, j) never mixes with other
# edges except through BatchNorm's global batch statistics. This section
# fuses an L-layer Dense+BN+relu chain into Pallas passes that keep every
# intermediate in registers and emit only the per-block max-pools, the BN
# batch statistics, and the (tiny) parameter gradients.
#
# BN needs exact global statistics, so the chain runs as sequential passes
# (grid-wide f32 accumulators, sequential TPU grid):
#   fwd: stat pass per layer l (recompute layers < l in registers,
#        accumulate sum/sumsq of h_l), then one final pass emitting the
#        per-layer max-pools. L+1 passes, ~L/2 x the chain's matmul flops —
#        trivial next to the HBM traffic they replace (input streams bf16).
#   bwd: mirror top-down. BN backward needs sum(dy) and sum(dy*hhat), so
#        pass t accumulates S_t for layer t while applying the (already
#        complete) S_{t+1..} to push gradients down one layer; the final
#        pass emits d_a1. dW_l accumulates in the pass that first holds
#        both a_{l-1} and dh_l; dgamma/dbeta fall out of S_l directly.
#
# Max-pool gradient routes to every j attaining the max (exact ties split
# nowhere in practice; relu's zero-plateau ties carry zero dy anyway).

_EM_TM = 256
_EM_EPS = 1e-5


def _em_split(refs, nl):
    """Parse the flat pallas ref list: a1, W*nl, gamma*nl, beta*nl, st*nl,
    then whatever the caller appended (bwd streams / out refs)."""
    a1 = refs[0]
    W = tuple(refs[1:1 + nl])
    g = tuple(refs[1 + nl:1 + 2 * nl])
    b = tuple(refs[1 + 2 * nl:1 + 3 * nl])
    st = tuple(refs[1 + 3 * nl:1 + 4 * nl])
    return a1, W, g, b, st, list(refs[1 + 4 * nl:])


def _em_bn(h, st_ref, g_ref, b_ref):
    """relu(gamma * (h - mu) * rsqrt(var + eps) + beta); returns (hhat, a)."""
    mu = st_ref[0, :].astype(jnp.float32)
    var = st_ref[1, :].astype(jnp.float32)
    hhat = (h - mu[None, :]) * lax.rsqrt(var + _EM_EPS)[None, :]
    g = g_ref[0, :].astype(jnp.float32)
    b = b_ref[0, :].astype(jnp.float32)
    return hhat, jnp.maximum(hhat * g[None, :] + b[None, :], 0.0)


def _em_bn_fast(h, st_ref, g_ref, b_ref):
    """Forward-only BN+relu with the per-channel scale/shift folded:
    a = relu(h * s + t), s = gamma * rsqrt(var + eps), t = beta - mu * s.
    Skips the hhat intermediate (2 fewer VPU ops per element) — for
    forward kernels that never consume hhat. Same value as _em_bn up to
    one f32 reassociation rounding."""
    mu = st_ref[0, :].astype(jnp.float32)
    var = st_ref[1, :].astype(jnp.float32)
    sc = g_ref[0, :].astype(jnp.float32) * lax.rsqrt(var + _EM_EPS)
    t = b_ref[0, :].astype(jnp.float32) - mu * sc
    return jnp.maximum(h * sc[None, :] + t[None, :], 0.0)


def _em_chain(a1j, W_refs, g_refs, b_refs, st_refs, upto, need_hhat=True):
    """Forward through layers 0..upto-1 from one j-slab (TM, C1) f32.

    Returns (h_list, hhat_list, a_list); h_{upto} is appended to h_list
    when upto < n_layers (its BN stats are what the caller accumulates).
    need_hhat=False uses the folded-BN fast path (hhat_list holds Nones).
    """
    hs, hhats, acts = [], [], []
    a = a1j
    for l in range(upto):
        h = jnp.dot(a.astype(jnp.bfloat16), W_refs[l][:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        if need_hhat:
            hhat, a = _em_bn(h, st_refs[l], g_refs[l], b_refs[l])
        else:
            hhat = None
            a = _em_bn_fast(h, st_refs[l], g_refs[l], b_refs[l])
        hs.append(h)
        hhats.append(hhat)
        acts.append(a)
    if upto < len(W_refs):
        h = jnp.dot(a.astype(jnp.bfloat16),
                    W_refs[upto][:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        hs.append(h)
    return hs, hhats, acts


def _em_stat_kernel(*refs, upto, k, tm, nl):
    """Accumulate [sum(h_upto), sum(h_upto^2)] over the whole edge set."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    a1_ref, W_refs, g_refs, b_refs, st_refs, rest = _em_split(refs, nl)
    out_ref = rest[0]
    ch = out_ref.shape[1]

    def body(j, carry):
        s, ss = carry
        a1j = a1_ref[0, pl.ds(j, 1), :, :][0].astype(jnp.float32)
        hs, _, _ = _em_chain(a1j, W_refs, g_refs, b_refs, st_refs, upto,
                             need_hhat=False)
        h = hs[upto]
        return (s + jnp.sum(h, axis=0, keepdims=True),
                ss + jnp.sum(h * h, axis=0, keepdims=True))

    z = jnp.zeros((1, ch), jnp.float32)
    s, ss = lax.fori_loop(0, k, body, (z, z))

    @pl.when((b == 0) & (t == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[0:1, :] += s
    out_ref[1:2, :] += ss


def _em_final_kernel(*refs, k, tm, nl):
    """Emit the per-layer max-pools over j (the only HBM outputs)."""
    a1_ref, W_refs, g_refs, b_refs, st_refs, x_refs = _em_split(refs, nl)
    neg = -jnp.inf

    def body(j, carry):
        a1j = a1_ref[0, pl.ds(j, 1), :, :][0].astype(jnp.float32)
        # NOT the fast path: the max-pool backward identifies argmax edges
        # by float equality against these exact-path values.
        _, _, acts = _em_chain(a1j, W_refs, g_refs, b_refs, st_refs, nl)
        return tuple(jnp.maximum(c, a) for c, a in zip(carry, acts))

    init = tuple(jnp.full((tm, r.shape[2]), neg, jnp.float32)
                 for r in x_refs)
    maxes = lax.fori_loop(0, k, body, init)
    for r, m in zip(x_refs, maxes):
        r[0] = m.astype(r.dtype)


def _em_bnbwd(dy, hhat, st_ref, g_ref, S_ref, E):
    """BatchNorm backward: dh from dy with the global sums S=[sum dy,
    sum dy*hhat] (training mode: mu/var are batch statistics)."""
    var = st_ref[1, :].astype(jnp.float32)
    g = g_ref[0, :].astype(jnp.float32)
    m1 = (S_ref[0, :] / E).astype(jnp.float32)
    m2 = (S_ref[1, :] / E).astype(jnp.float32)
    scale = (g * lax.rsqrt(var + _EM_EPS))[None, :]
    return scale * (dy - m1[None, :] - hhat * m2[None, :])


def _em_bwd_kernel(*refs, level, k, tm, E, nl):
    """One top-down backward pass over the fused chain.

    level=nl-1:     accumulate S_{nl-1}                     outs=(S,)
    nl-1>level>=0:  apply S above; accumulate S_level and
                    dW_{level+1}                            outs=(S, dW)
    level=-1:       apply all; emit d_a1, accumulate dW_0   outs=(da1, dW0)
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    a1_ref, W_refs, g_refs, b_refs, st_refs, rest = _em_split(refs, nl)
    x_in = rest[:nl]
    gx_in = rest[nl:2 * nl]
    S_refs = rest[2 * nl:3 * nl]
    outs = rest[3 * nl:]
    first = (b == 0) & (t == 0)

    xs = [r[0].astype(jnp.float32) for r in x_in]
    gxs = [r[0].astype(jnp.float32) for r in gx_in]

    def dchain(a1j):
        """Recompute fwd and push cotangents down to `level`.

        Returns (dy_level, hhat_level, acts, dh_above) for level >= 0, or
        (da1_edge, None, acts, dh_0) for level == -1; dh_above is the
        BN-backward output of layer level+1 (None when level == nl-1).
        """
        hs, hhats, acts = _em_chain(a1j, W_refs, g_refs, b_refs, st_refs, nl)
        d_carry = None
        dh_above = None
        for l in range(nl - 1, -1, -1):
            route = gxs[l] * (acts[l] == xs[l]).astype(jnp.float32)
            d_al = route if d_carry is None else d_carry + route
            dy = jnp.where(acts[l] > 0.0, d_al, 0.0)
            if l == level:
                return dy, hhats[l], acts, dh_above
            dh = _em_bnbwd(dy, hhats[l], st_refs[l], g_refs[l],
                           S_refs[l], E)
            dh_above = dh
            d_carry = jnp.dot(
                dh.astype(jnp.bfloat16),
                W_refs[l][:].astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32)
        return d_carry, None, acts, dh_above   # level == -1

    def dwT(a, dh):
        """a^T dh with bf16 inputs / f32 accumulation."""
        return lax.dot_general(
            a.astype(jnp.bfloat16), dh.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    for o in outs:
        @pl.when(first)
        def _(o=o):
            if o.ndim == 2:   # S / dW accumulators; d_a1 is fully written
                o[...] = jnp.zeros_like(o)

    def load_a1(j):
        return a1_ref[0, pl.ds(j, 1), :, :][0].astype(jnp.float32)

    if level == nl - 1:
        ch = outs[0].shape[1]
        z = jnp.zeros((1, ch), jnp.float32)

        def body(j, carry):
            s, ss = carry
            dy, hhat, _, _ = dchain(load_a1(j))
            return (s + jnp.sum(dy, axis=0, keepdims=True),
                    ss + jnp.sum(dy * hhat, axis=0, keepdims=True))

        s, ss = lax.fori_loop(0, k, body, (z, z))
        outs[0][0:1, :] += s
        outs[0][1:2, :] += ss
    elif level >= 0:
        ch = outs[0].shape[1]
        z = jnp.zeros((1, ch), jnp.float32)
        zw = jnp.zeros(outs[1].shape, jnp.float32)

        def body(j, carry):
            s, ss, dw = carry
            dy, hhat, acts, dh_above = dchain(load_a1(j))
            return (s + jnp.sum(dy, axis=0, keepdims=True),
                    ss + jnp.sum(dy * hhat, axis=0, keepdims=True),
                    dw + dwT(acts[level], dh_above))

        s, ss, dw = lax.fori_loop(0, k, body, (z, z, zw))
        outs[0][0:1, :] += s
        outs[0][1:2, :] += ss
        outs[1][...] += dw
    else:
        zw = jnp.zeros(outs[1].shape, jnp.float32)

        def body(j, dw):
            a1j = load_a1(j)
            da1, _, _, dh0 = dchain(a1j)
            outs[0][0, pl.ds(j, 1), :, :] = da1[None].astype(
                outs[0].dtype)
            return dw + dwT(a1j, dh0)

        dw = lax.fori_loop(0, k, body, zw)
        outs[1][...] += dw


def _em_tm(n: int) -> int:
    for tm in (_EM_TM, 128, 64, 32, 16, 8):
        if n % tm == 0:
            return tm
    return n


def _em_const(shape):
    return pl.BlockSpec(shape, lambda b, t: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _em_in_specs(B, k, N, C1, tm, chs, with_bwd):
    a1 = pl.BlockSpec((1, k, tm, C1), lambda b, t: (b, 0, t, 0),
                      memory_space=pltpu.VMEM)
    cins = (C1,) + chs[:-1]
    Ws = [_em_const((cin, ch)) for cin, ch in zip(cins, chs)]
    gs = [_em_const((1, ch)) for ch in chs]
    bs = [_em_const((1, ch)) for ch in chs]
    sts = [_em_const((2, ch)) for ch in chs]
    specs = [a1] + Ws + gs + bs + sts
    if with_bwd:
        xg = [pl.BlockSpec((1, tm, ch), lambda b, t: (b, t, 0),
                           memory_space=pltpu.VMEM) for ch in chs]
        specs += xg + xg + [_em_const((2, ch)) for ch in chs]
    return specs


def _em_args(a1, Ws, gammas, betas, stats):
    chs = tuple(W.shape[1] for W in Ws)
    sts = list(stats) + [jnp.zeros((2, ch), jnp.float32)
                         for ch in chs[len(stats):]]
    return ([a1] + list(Ws)
            + [g.reshape(1, -1).astype(jnp.float32) for g in gammas]
            + [b.reshape(1, -1).astype(jnp.float32) for b in betas]
            + [s.astype(jnp.float32) for s in sts])


def _em_cost(B, k, N, chs, passes=1):
    cins_chs = sum(a * b for a, b in zip((chs[0],) + chs[:-1], chs))
    return pl.CostEstimate(
        flops=2 * B * k * N * cins_chs * passes,
        bytes_accessed=B * k * N * chs[0] * 4,
        transcendentals=0,
    )


def _edge_mlp_stat_pass(a1, Ws, gammas, betas, stats, upto):
    B, k, N, C1 = a1.shape
    tm = _em_tm(N)
    chs = tuple(W.shape[1] for W in Ws)
    nl = len(Ws)
    return pl.pallas_call(
        functools.partial(_em_stat_kernel, upto=upto, k=k, tm=tm, nl=nl),
        grid=(B, N // tm),
        in_specs=_em_in_specs(B, k, N, C1, tm, chs, with_bwd=False),
        out_specs=_em_const((2, chs[upto])),
        out_shape=jax.ShapeDtypeStruct((2, chs[upto]), jnp.float32),
        cost_estimate=_em_cost(B, k, N, chs),
        interpret=_interpret(),
    )(*_em_args(a1, Ws, gammas, betas, stats))


def _edge_mlp_final_pass(a1, Ws, gammas, betas, stats):
    B, k, N, C1 = a1.shape
    tm = _em_tm(N)
    chs = tuple(W.shape[1] for W in Ws)
    nl = len(Ws)
    return pl.pallas_call(
        functools.partial(_em_final_kernel, k=k, tm=tm, nl=nl),
        grid=(B, N // tm),
        in_specs=_em_in_specs(B, k, N, C1, tm, chs, with_bwd=False),
        out_specs=[pl.BlockSpec((1, tm, ch), lambda b, t: (b, t, 0),
                                memory_space=pltpu.VMEM) for ch in chs],
        out_shape=[jax.ShapeDtypeStruct((B, N, ch), jnp.float32)
                   for ch in chs],
        cost_estimate=_em_cost(B, k, N, chs),
        interpret=_interpret(),
    )(*_em_args(a1, Ws, gammas, betas, stats))


def _edge_mlp_bwd_pass(a1, Ws, gammas, betas, stats, xs, gxs, Ss, level):
    B, k, N, C1 = a1.shape
    tm = _em_tm(N)
    chs = tuple(W.shape[1] for W in Ws)
    nl = len(Ws)
    cins = (C1,) + chs[:-1]
    assert len(Ss) == len(chs), "Ss must be indexed per layer"
    if level == nl - 1:
        out_specs = [_em_const((2, chs[level]))]
        out_shape = [jax.ShapeDtypeStruct((2, chs[level]), jnp.float32)]
    elif level >= 0:
        out_specs = [_em_const((2, chs[level])),
                     _em_const((cins[level + 1], chs[level + 1]))]
        out_shape = [
            jax.ShapeDtypeStruct((2, chs[level]), jnp.float32),
            jax.ShapeDtypeStruct((cins[level + 1], chs[level + 1]),
                                 jnp.float32),
        ]
    else:
        out_specs = [
            pl.BlockSpec((1, k, tm, C1), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
            _em_const((cins[0], chs[0])),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((B, k, N, C1), jnp.float32),
            jax.ShapeDtypeStruct((cins[0], chs[0]), jnp.float32),
        ]
    return pl.pallas_call(
        functools.partial(_em_bwd_kernel, level=level, k=k, tm=tm,
                          E=float(B * k * N), nl=nl),
        grid=(B, N // tm),
        in_specs=_em_in_specs(B, k, N, C1, tm, chs, with_bwd=True),
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=_em_cost(B, k, N, chs, passes=3),
        interpret=_interpret(),
    )(*(_em_args(a1, Ws, gammas, betas, stats)
        + [x.astype(jnp.float32) for x in xs]
        + [g.astype(jnp.float32) for g in gxs]
        + [s.astype(jnp.float32) for s in Ss]))


def _edge_mlp_forward(a1, Ws, gammas, betas):
    """Train forward: sequential stat passes then the pooled-output pass.

    Returns (xs tuple of (B, N, ch_l) f32, stats tuple of (2, ch_l)
    [batch_mean, biased batch_var])."""
    B, k, N, _ = a1.shape
    E = float(B * k * N)
    a1b = a1.astype(jnp.bfloat16)
    stats = []
    for p in range(len(Ws)):
        sums = _edge_mlp_stat_pass(a1b, Ws, gammas, betas, stats, p)
        mu = sums[0] / E
        var = sums[1] / E - mu * mu
        stats.append(jnp.stack([mu, jnp.maximum(var, 0.0)]))
    xs = _edge_mlp_final_pass(a1b, Ws, gammas, betas, stats)
    return tuple(xs), tuple(stats)


@jax.custom_vjp
def edge_mlp_train(a1, Ws, gammas, betas):
    """Fused Dense+BN+relu chain over edges with per-layer max-pool over k.

    a1: (B, k, N, C1) edge features (any float dtype; matmul inputs round
    to bf16 like XLA DEFAULT). Ws/gammas/betas: tuples per layer, any
    length. Returns (xs, stats); stats are stop-gradient batch statistics
    for the running-average update. Semantics == reference DGCNN edge-conv
    blocks (registration/models/dcp.py:269-301) in training mode.
    """
    xs, stats = _edge_mlp_forward(a1, Ws, gammas, betas)
    return xs, tuple(lax.stop_gradient(s) for s in stats)


def _edge_mlp_train_fwd(a1, Ws, gammas, betas):
    xs, stats = _edge_mlp_forward(a1, Ws, gammas, betas)
    res = (a1, Ws, gammas, betas, stats, xs)
    return (xs, tuple(lax.stop_gradient(s) for s in stats)), res


def _edge_mlp_train_bwd(res, cts):
    a1, Ws, gammas, betas, stats, xs = res
    gxs, _ = cts                      # stat cotangents are stop-gradient
    a1b = a1.astype(jnp.bfloat16)
    nl = len(Ws)
    chs = tuple(W.shape[1] for W in Ws)
    Ss = [jnp.zeros((2, ch), jnp.float32) for ch in chs]
    dWs = [None] * nl

    outs = _edge_mlp_bwd_pass(a1b, Ws, gammas, betas, stats, xs, gxs,
                              Ss, nl - 1)
    Ss[nl - 1] = outs[0]
    for level in range(nl - 2, -1, -1):
        S, dW = _edge_mlp_bwd_pass(a1b, Ws, gammas, betas, stats, xs, gxs,
                                   Ss, level)
        Ss[level] = S
        dWs[level + 1] = dW
    da1, dW0 = _edge_mlp_bwd_pass(a1b, Ws, gammas, betas, stats, xs, gxs,
                                  Ss, -1)
    dWs[0] = dW0
    dgammas = tuple(S[1].astype(g.dtype).reshape(g.shape)
                    for S, g in zip(Ss, gammas))
    dbetas = tuple(S[0].astype(b.dtype).reshape(b.shape)
                   for S, b in zip(Ss, betas))
    dWs = tuple(dw.astype(W.dtype) for dw, W in zip(dWs, Ws))
    return da1.astype(a1.dtype), dWs, dgammas, dbetas


edge_mlp_train.defvjp(_edge_mlp_train_fwd, _edge_mlp_train_bwd)


def edge_mlp_eval(a1, Ws, gammas, betas, means, variances):
    """Inference-mode fused chain using running statistics (single pass)."""
    stats = [jnp.stack([m.astype(jnp.float32), v.astype(jnp.float32)])
             for m, v in zip(means, variances)]
    return tuple(_edge_mlp_final_pass(a1.astype(jnp.bfloat16), Ws, gammas,
                                      betas, stats))


def edge_mlp_reference(a1, Ws, gammas, betas, means=None, variances=None,
                       train=True):
    """jnp golden with the kernel's arithmetic (bf16 matmul inputs, f32
    BN/stat math). Used as the CPU dispatch path and the parity baseline.

    Returns (xs, stats) in train mode, xs otherwise. Max-pool gradient
    routing under autodiff splits ties evenly (the kernel routes to every
    tie); exact-tie gradients differ only on measure-zero inputs.
    """
    a = a1.astype(jnp.float32)
    xs, stats = [], []
    for l, W in enumerate(Ws):
        h = jnp.einsum(
            "bknc,cd->bknd", a.astype(jnp.bfloat16),
            W.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        if train:
            mu = jnp.mean(h, axis=(0, 1, 2))
            var = jnp.mean(h * h, axis=(0, 1, 2)) - mu * mu
            var = jnp.maximum(var, 0.0)
            stats.append(jnp.stack([mu, var]))
        else:
            mu = means[l].astype(jnp.float32)
            var = variances[l].astype(jnp.float32)
        hhat = (h - mu) * lax.rsqrt(var + _EM_EPS)
        a = jnp.maximum(
            hhat * gammas[l].astype(jnp.float32)
            + betas[l].astype(jnp.float32), 0.0)
        xs.append(jnp.max(a, axis=1))
    if train:
        return tuple(xs), tuple(lax.stop_gradient(s) for s in stats)
    return tuple(xs)


def edge_mlp_supported(a1) -> bool:
    """Kernel shape gate: lane-friendly channel width and tileable N."""
    B, k, N, C1 = a1.shape
    return C1 % 8 == 0 and N % 8 == 0 and N >= 8


# ---------------------------------------------------------------------------
# Fused IDAM similarity-matrix stack
# ---------------------------------------------------------------------------
#
# IDAM's inner loop (reference registration/models/idam.py:267-279) runs a
# small MLP over every (src_i, tgt_j) pair: concat([emb_i, emb_j, dist_ij,
# dir_ij]) -> Dense(C) -> BN -> relu -> Dense(C) -> {max_j (weights head),
# Dense(C) -> BN -> relu -> Dense(1) (similarity logits)}, C = 32. In XLA
# each (B, M, M, C) intermediate (M = N/6) is materialized in HBM several
# times forward and backward — the dominant cost of the model after the
# GNN. But the chain is per-edge: edges couple only through the BatchNorm
# batch statistics and the max-pool. This section fuses the whole stack
# into sequential Pallas passes (the edge_mlp pattern above): each pass
# recomputes the chain in registers from the (B, M, C) projected embeddings
# and the (B, M, 3) positions, and only the (B, M, M) logits, the (B, M, C)
# max-pool, the BN statistics, and the parameter gradients touch HBM.
#
# The DenseCat input layer distributes over the virtual concat:
#   h0_ij = emb_i @ W_src + emb_j @ W_tgt + dist_ij * w0
#           + (p_i - p_j) @ W_xyz / (dist_ij + 1e-8)
# so the per-point projections run in XLA at (B, M, emb) and the kernel
# reconstructs only the distance terms from raw positions per tile.
# Positions are non-differentiable (training differentiates parameters
# only; the wrapper stop-gradients them on every path).
#
# LANE PACKING. C = 32 lanes would leave the VPU at 25% utilization and
# the whole fusion is elementwise-bound (measured: 45.9 ms per iteration
# unpacked vs the targets below). The kernels therefore pack G = 128//C
# consecutive i-rows into the lane dimension: per-edge tensors are
# (R, G*C) = ((TM//G)*TJ, 128) with row r = i4*TJ + jj and lane g*C + c
# for i = i4*G + g. All parameters arrive pre-packed from XLA (block-
# diagonal weight matrices, G-tiled vectors); per-(g,c) partial stat/grad
# accumulators are reduced over g by XLA after each pass. Mosaic cannot
# fold lanes into sublanes, so every cross-layout move uses one of the
# supported forms: leading-dim splits/collapses, minor-dim rank-3
# transposes ((m4, TJ, G) <-> (m4, G, TJ), used for the (TM, TJ) logits
# tile), trailing-lane broadcasts, and static lane slices + concat for
# group spread/segment sums (exact f32, no MXU rounding).
#
# Train mode needs exact global BN statistics, so the schedule is:
#   fwd: stats(h0) pass, stats(h2) pass, final pass (logits + max-pool).
#   bwd: S2/dW4 pass, then S1/dW3/dW2/db2 (needs S2), then
#        d_proj/dW_dd (needs S1) — mirroring _em_bwd_kernel's top-down
#        order. Matmul inputs round to bf16 (XLA DEFAULT on TPU); BN and
#        stat math is f32.

# Rows of i per grid cell / columns of j per inner step. TJ = 128 because
# the logits tile is stored (and its cotangent loaded) at a dynamic LANE
# offset j*TJ, which Mosaic must statically prove is a multiple of 128.
_SM_TM = 64
_SM_TJ = 128


def _sm_G(C: int) -> int:
    return max(1, 128 // C)


def _sm_rowmask(t, m, tm, tj, G, C):
    """(R, L) f32 row validity (row index depends on the lane's group)."""
    R = (tm // G) * tj
    L = G * C
    rid = lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    gl = lax.broadcasted_iota(jnp.int32, (1, L), 1) // C
    row = t * tm + (rid // tj) * G + gl                      # (R, L)
    return (row < m).astype(jnp.float32)


def _sm_colmask(j, m, tm, tj, G):
    """(R, 1) f32 column validity for one column block."""
    R = (tm // G) * tj
    rid = lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    return ((rid % tj + j * tj) < m).astype(jnp.float32)


def _sm_spread(x4, spreadM_ref):
    """(R, G) -> (R, L): replicate each group's value over its C lanes via
    an exact f32 matmul against the 0/1 spread matrix (HIGHEST precision —
    Mosaic rejects HIGH; exact f32 for single-product outputs)."""
    return lax.dot_general(
        x4, spreadM_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _sm_gsum_tp(dh0r, G):
    """(m4, tj, L) -> (tj, C): sum over i4 rows and lane groups (exact)."""
    s = jnp.sum(dh0r, axis=0)                                # (tj, L)
    tj, L = s.shape
    C = L // G
    out = s[:, :C]
    for g in range(1, G):
        out = out + s[:, g * C:(g + 1) * C]
    return out


def _sm_dot(a, w, transpose=False):
    """bf16-input matmul with f32 accumulation; optionally a @ w.T."""
    dims = (((1,), (1,)), ((), ())) if transpose else (((1,), (0,)), ((), ()))
    return lax.dot_general(a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                           dimension_numbers=dims,
                           preferred_element_type=jnp.float32)


def _sm_split(refs):
    """Fixed input order shared by every pass (packed layouts)."""
    names = ("spP", "tpT", "srcP", "tgtT", "W0sp", "WxyzBD", "W2BD", "b2L",
             "W3BD", "w4L", "g1L", "be1L", "g2L", "be2L", "st1L", "st2L",
             "spreadM", "segM", "W4seg")
    d = dict(zip(names, refs[:19]))
    return d, list(refs[19:])


def _sm_bcast_rows(blk, tj):
    """(m4, X) row block -> (R, X) edge-major (same value for every jj)."""
    m4, X = blk.shape
    return jnp.broadcast_to(blk[:, None, :], (m4, tj, X)).reshape(
        m4 * tj, X)


def _sm_bcast_cols(blk, m4):
    """(tj, X) column block -> (R, X) edge-major (same for every i4)."""
    tj, X = blk.shape
    return jnp.broadcast_to(blk[None, :, :], (m4, tj, X)).reshape(
        m4 * tj, X)


def _sm_h0(d, j, tm, tj):
    """h0 (R, L), dist4 (R, G), normalized diff ndiffP (R, 4G) for one
    column block. Broadcasts stay fused binary ops; group spreads and
    segment sums run as exact f32 matmuls against 0/1 matrices."""
    L = d["spP"].shape[-1]
    G = d["srcP"].shape[-1] // 4
    m4 = tm // G
    R = m4 * tj
    spb = d["spP"][0].astype(jnp.float32)                     # (m4, L)
    tpb = d["tpT"][0, pl.ds(j * tj, tj), :].astype(jnp.float32)
    emb = (spb[:, None, :] + tpb[None, :, :]).reshape(R, L)
    diffP = (d["srcP"][0].astype(jnp.float32)[:, None, :]
             - d["tgtT"][0, pl.ds(j * tj, tj), :].astype(
                 jnp.float32)[None, :, :]).reshape(R, 4 * G)
    d2 = lax.dot_general(
        diffP * diffP, d["segM"][:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)                   # (R, G)
    dist4 = jnp.sqrt(d2)
    inv4 = 1.0 / (dist4 + 1e-8)
    distw0 = _sm_spread(dist4, d["W0sp"])                     # dist * w0
    # Normalize diff at 4G lanes (tiny) instead of spreading 1/dist to all
    # L lanes: dirp/(dist+eps) == bf16dot(diff/(dist+eps), Wxyz) up to the
    # bf16 input rounding (mirrored by the golden).
    inv16 = lax.dot_general(
        inv4, d["segM"][:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)                   # (R, 4G)
    ndiffP = diffP * inv16
    dirpN = _sm_dot(ndiffP, d["WxyzBD"][:])                   # (R, L)
    h0 = emb + distw0 + dirpN
    return h0, dist4, ndiffP


def _sm_chain(d, h0, upto, fast=False):
    """Forward from h0: returns (hhat1, x1, h1[, h2[, hhat2, x2]]).

    fast=True uses the folded-BN forward (no hhat intermediates; the hhat
    slots hold None) — for the stat/final kernels, which never consume
    them. Backward kernels keep the exact _em_bn (hhat feeds the S sums).
    """
    if fast:
        x1 = _em_bn_fast(h0, d["st1L"], d["g1L"], d["be1L"])
        hhat1 = None
    else:
        hhat1, x1 = _em_bn(h0, d["st1L"], d["g1L"], d["be1L"])
    h1 = _sm_dot(x1, d["W2BD"][:]) + d["b2L"][0, :].astype(
        jnp.float32)[None, :]
    if upto == 1:
        return hhat1, x1, h1
    h2 = _sm_dot(h1, d["W3BD"][:])
    if upto == 2:
        return hhat1, x1, h1, h2
    if fast:
        x2 = _em_bn_fast(h2, d["st2L"], d["g2L"], d["be2L"])
        hhat2 = None
    else:
        hhat2, x2 = _em_bn(h2, d["st2L"], d["g2L"], d["be2L"])
    return hhat1, x1, h1, h2, hhat2, x2


def _sm_logits_tile(simr4, tm, tj, G):
    """(R, G) per-edge logits -> the (tm, tj) row-major tile."""
    m4 = tm // G
    return jnp.swapaxes(simr4.reshape(m4, tj, G), 1, 2).reshape(tm, tj)


def _sm_dsimE(d, dsim_ref, j, tm, tj):
    """Load the logits-cotangent (tm, tj) tile into packed (R, L) form."""
    L = d["spP"].shape[-1]
    G = d["srcP"].shape[-1] // 4
    C = L // G
    m4 = tm // G
    blk = dsim_ref[0, :, pl.ds(j * tj, tj)].astype(jnp.float32)
    d4 = jnp.swapaxes(blk.reshape(m4, G, tj), 1, 2).reshape(m4 * tj, G)
    return _sm_spread(d4, d["spreadM"])


def _sm_dy2(d, x2, dsimE):
    """relu-masked cotangent at BN2's output from the logits cotangent."""
    w4 = d["w4L"][0, :].astype(jnp.float32)
    dx2 = dsimE * w4[None, :]
    return jnp.where(x2 > 0.0, dx2, 0.0)


def _sm_dy1(d, rest, rowm, j, m, tm, tj, E):
    """Backward to BN1's output cotangent for one column block (needs S2).

    rowm is the hoisted (R, L) row mask for this grid cell.

    Returns (h0, dist4, ndiffP, hhat1, x1, h1, dh2, dh1, dy1, vmask)."""
    dsim_ref, dwmax_ref, wmax_ref, S1_ref, S2_ref = rest[:5]
    h0, dist4, ndiffP = _sm_h0(d, j, tm, tj)
    hhat1, x1, h1, h2, hhat2, x2 = _sm_chain(d, h0, 3)
    dsimE = _sm_dsimE(d, dsim_ref, j, tm, tj)
    dy2 = _sm_dy2(d, x2, dsimE)
    colm = _sm_colmask(j, m, tm, tj, d["srcP"].shape[-1] // 4)
    vmask = rowm * colm
    dh2 = _em_bnbwd(dy2, hhat2, d["st2L"], d["g2L"], S2_ref, E) * vmask
    wmE = _sm_bcast_rows(wmax_ref[0].astype(jnp.float32), tj)
    dwE = _sm_bcast_rows(dwmax_ref[0].astype(jnp.float32), tj)
    route = dwE * (h1 == wmE).astype(jnp.float32) * colm
    dh1 = _sm_dot(dh2, d["W3BD"][:], transpose=True) + route
    dx1 = _sm_dot(dh1, d["W2BD"][:], transpose=True)
    dy1 = jnp.where(x1 > 0.0, dx1, 0.0)
    return h0, dist4, ndiffP, hhat1, x1, h1, dh2, dh1, dy1, vmask


def _sm_stat_kernel(*refs, level, m, tm, tj, jt, G):
    """Accumulate per-(g, c) [sum, sumsq] of h0 (level 0) or h2 (level 1)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    d, rest = _sm_split(refs)
    out_ref = rest[0]
    L = out_ref.shape[1]
    C = L // G
    rowm = _sm_rowmask(t, m, tm, tj, G, C)

    def body(j, carry):
        s, ss = carry
        h0, _, _ = _sm_h0(d, j, tm, tj)
        h = h0 if level == 0 else _sm_chain(d, h0, 2, fast=True)[3]
        hm = h * (rowm * _sm_colmask(j, m, tm, tj, G))
        return (s + jnp.sum(hm, axis=0, keepdims=True),
                ss + jnp.sum(hm * h, axis=0, keepdims=True))

    z = jnp.zeros((1, L), jnp.float32)
    s, ss = lax.fori_loop(0, jt, body, (z, z))

    @pl.when((b == 0) & (t == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[0:1, :] += s
    out_ref[1:2, :] += ss


def _sm_final_kernel(*refs, m, tm, tj, jt, G):
    """Emit the (B, Mp, Mp) pre-bias logits and the packed max-pool."""
    t = pl.program_id(1)
    d, rest = _sm_split(refs)
    simr_ref, wmax_ref = rest
    L = wmax_ref.shape[2]
    C = L // G
    m4 = tm // G

    def body(j, wm):
        h0, _, _ = _sm_h0(d, j, tm, tj)
        # NOT the fast path: bwd routes the wmax cotangent by h1 equality.
        _, _, h1, _, _, x2 = _sm_chain(d, h0, 3)
        simr4 = lax.dot_general(
            x2, d["W4seg"][:].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)               # (R, G)
        simr_ref[0, :, pl.ds(j * tj, tj)] = _sm_logits_tile(
            simr4, tm, tj, G)
        colm = _sm_colmask(j, m, tm, tj, G)
        h1m = jnp.where(colm > 0.0, h1, -jnp.inf).reshape(m4, tj, L)
        return jnp.maximum(wm, jnp.max(h1m, axis=1))

    wm = lax.fori_loop(
        0, jt, body, jnp.full((m4, L), -jnp.inf, jnp.float32))
    wmax_ref[0] = wm


def _sm_bwd1_kernel(*refs, m, tm, tj, jt, G):
    """Accumulate per-(g, c) S2 = [sum dy2, sum dy2*hhat2] and dW4."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    d, rest = _sm_split(refs)
    dsim_ref = rest[0]
    S2_out, dw4_out = rest[5], rest[6]
    L = S2_out.shape[1]

    def body(j, carry):
        s, ss, dw4 = carry
        h0, _, _ = _sm_h0(d, j, tm, tj)
        _, _, _, _, hhat2, x2 = _sm_chain(d, h0, 3)
        dsimE = _sm_dsimE(d, dsim_ref, j, tm, tj)
        dy2 = _sm_dy2(d, x2, dsimE)
        return (s + jnp.sum(dy2, axis=0, keepdims=True),
                ss + jnp.sum(dy2 * hhat2, axis=0, keepdims=True),
                dw4 + jnp.sum(x2 * dsimE, axis=0, keepdims=True))

    z = jnp.zeros((1, L), jnp.float32)
    s, ss, dw4 = lax.fori_loop(0, jt, body, (z, z, z))

    @pl.when((b == 0) & (t == 0))
    def _():
        S2_out[...] = jnp.zeros_like(S2_out)
        dw4_out[...] = jnp.zeros_like(dw4_out)

    S2_out[0:1, :] += s
    S2_out[1:2, :] += ss
    dw4_out[...] += dw4


def _sm_dwT(a, dh):
    """a^T dh with bf16 inputs / f32 accumulation."""
    return lax.dot_general(
        a.astype(jnp.bfloat16), dh.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _sm_bwd2_kernel(*refs, m, tm, tj, jt, G, E):
    """Accumulate S1, block-diag dW3/dW2, db2 (needs complete S2)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    d, rest = _sm_split(refs)
    S1_out, dw3_out, dw2_out, db2_out = rest[5:9]
    L = S1_out.shape[1]
    C = L // G
    rowm = _sm_rowmask(t, m, tm, tj, G, C)

    def body(j, carry):
        s, ss, dw3, dw2, db2 = carry
        (h0, dist4, ndiffP, hhat1, x1, h1, dh2, dh1,
         dy1, vmask) = _sm_dy1(d, rest, rowm, j, m, tm, tj, E)
        return (s + jnp.sum(dy1, axis=0, keepdims=True),
                ss + jnp.sum(dy1 * hhat1, axis=0, keepdims=True),
                dw3 + _sm_dwT(h1, dh2),
                dw2 + _sm_dwT(x1, dh1),
                db2 + jnp.sum(dh1, axis=0, keepdims=True))

    z = jnp.zeros((1, L), jnp.float32)
    zw = jnp.zeros((L, L), jnp.float32)
    s, ss, dw3, dw2, db2 = lax.fori_loop(0, jt, body, (z, z, zw, zw, z))

    @pl.when((b == 0) & (t == 0))
    def _():
        S1_out[...] = jnp.zeros_like(S1_out)
        dw3_out[...] = jnp.zeros_like(dw3_out)
        dw2_out[...] = jnp.zeros_like(dw2_out)
        db2_out[...] = jnp.zeros_like(db2_out)

    S1_out[0:1, :] += s
    S1_out[1:2, :] += ss
    dw3_out[...] += dw3
    dw2_out[...] += dw2
    db2_out[...] += db2


def _sm_bwd3_kernel(*refs, m, tm, tj, jt, G, E):
    """Emit packed d_sp; accumulate d_tp, dw0, dW_xyz (needs S1, S2)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    d, rest = _sm_split(refs)
    S1_ref = rest[3]
    dsp_ref, dtp_ref, dw0_out, dwxyz_out = rest[5:9]
    L = dsp_ref.shape[2]
    C = L // G
    m4 = tm // G
    rowm = _sm_rowmask(t, m, tm, tj, G, C)

    @pl.when(t == 0)
    def _():
        dtp_ref[...] = jnp.zeros_like(dtp_ref)

    @pl.when((b == 0) & (t == 0))
    def _():
        dw0_out[...] = jnp.zeros_like(dw0_out)
        dwxyz_out[...] = jnp.zeros_like(dwxyz_out)

    def body(j, carry):
        dsp, dw0, dwxyz = carry
        (h0, dist4, ndiffP, hhat1, _, _, _, _, dy1, vmask) = _sm_dy1(
            d, rest, rowm, j, m, tm, tj, E)
        dh0 = _em_bnbwd(dy1, hhat1, d["st1L"], d["g1L"], S1_ref, E) * vmask
        dh0r = dh0.reshape(m4, tj, L)
        dtp_ref[0, pl.ds(j * tj, tj), :] += _sm_gsum_tp(dh0r, G)
        distL = _sm_spread(dist4, d["spreadM"])
        return (dsp + jnp.sum(dh0r, axis=1),
                dw0 + jnp.sum(dh0 * distL, axis=0, keepdims=True),
                dwxyz + _sm_dwT(ndiffP, dh0))

    dsp = jnp.zeros((m4, L), jnp.float32)
    dw0 = jnp.zeros((1, L), jnp.float32)
    dwxyz = jnp.zeros((4 * G, L), jnp.float32)
    dsp, dw0, dwxyz = lax.fori_loop(0, jt, body, (dsp, dw0, dwxyz))
    dsp_ref[0] = dsp
    dw0_out[...] += dw0
    dwxyz_out[...] += dwxyz


def _sm_gsum_tp(dh0r, G):
    """(m4, tj, L) -> (tj, C): sum over i4 rows and lane groups."""
    s = jnp.sum(dh0r, axis=0)                                # (tj, L)
    tj, L = s.shape
    C = L // G
    out = s[:, :C]
    for g in range(1, G):
        out = out + s[:, g * C:(g + 1) * C]
    return out


def _sm_const(shape):
    return pl.BlockSpec(shape, lambda b, t: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _sm_in_specs(B, Mp, C, tm, G, with_bwd):
    L = G * C
    m4row = lambda ch: pl.BlockSpec((1, tm // G, ch), lambda b, t: (b, t, 0),
                                    memory_space=pltpu.VMEM)
    full = lambda ch: pl.BlockSpec((1, Mp, ch), lambda b, t: (b, 0, 0),
                                   memory_space=pltpu.VMEM)
    G_ = G
    specs = [m4row(L), full(L), m4row(4 * G), full(4 * G),
             _sm_const((G_, L)), _sm_const((4 * G, L)), _sm_const((L, L)),
             _sm_const((1, L)), _sm_const((L, L)), _sm_const((1, L)),
             _sm_const((1, L)), _sm_const((1, L)), _sm_const((1, L)),
             _sm_const((1, L)), _sm_const((2, L)), _sm_const((2, L)),
             _sm_const((G_, L)), _sm_const((4 * G, G_)),
             _sm_const((L, G_))]
    if with_bwd:
        specs += [pl.BlockSpec((1, tm, Mp), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
                  m4row(L), m4row(L), _sm_const((2, L)), _sm_const((2, L))]
    return specs


def _sm_blockdiag(W, G):
    """(K, C) -> (G*K, G*C) block diagonal (XLA-side packing)."""
    K, C = W.shape
    out = jnp.zeros((G * K, G * C), W.dtype)
    for g in range(G):
        out = out.at[g * K:(g + 1) * K, g * C:(g + 1) * C].set(W)
    return out


def _sm_pack(sp, tp, srcp, tgtp, w0, wxyz, W2, b2, W3, w4r,
             g1, be1, g2, be2, st1, st2, G):
    """XLA-side packing of every kernel input into (g, c) lane layout."""
    B, Mp, C = sp.shape
    L = G * C
    f32 = lambda x: x.astype(jnp.float32)
    tileL = lambda v: jnp.tile(f32(v), (1, G))
    gl = jnp.arange(L) // C
    spreadM = (gl[None, :] == jnp.arange(G)[:, None]).astype(jnp.float32)
    W0sp = spreadM * tileL(w0)                   # rows g: w0[c] in group g
    k4 = jnp.arange(4 * G) // 4
    segM = (k4[:, None] == jnp.arange(G)[None, :]).astype(jnp.float32)
    W4seg = spreadM.T * tileL(w4r).reshape(L, 1)  # (L, G): w4[c] per group
    return [
        f32(sp).reshape(B, Mp // G, L),
        jnp.tile(f32(tp), (1, 1, G)),
        f32(srcp).reshape(B, Mp // G, 4 * G),
        jnp.tile(f32(tgtp), (1, 1, G)),
        W0sp,
        _sm_blockdiag(f32(wxyz), G),
        _sm_blockdiag(f32(W2), G),
        tileL(b2),
        _sm_blockdiag(f32(W3), G),
        tileL(w4r),
        tileL(g1), tileL(be1), tileL(g2), tileL(be2),
        jnp.tile(f32(st1), (1, G)), jnp.tile(f32(st2), (1, G)),
        spreadM, segM, W4seg,
    ]


def _sm_gred(x, G):
    """Reduce a per-(g, c) packed row vector / stat block over g."""
    rows, L = x.shape
    C = L // G
    return x.reshape(rows, G, C).sum(axis=1)


def _sm_bdred(Wp, G, K, C):
    """Sum the diagonal blocks of a packed (G*K, G*C) accumulator."""
    return jnp.einsum("gkgc->kc", Wp.reshape(G, K, G, C))


def _sm_unpack_rows(x, B, Mp, C):
    """(B, Mp//G, G*C) packed rows -> (B, Mp, C)."""
    return x.reshape(B, Mp, C)


def _sm_cost(B, Mp, C, G, passes=1):
    L = G * C
    return pl.CostEstimate(
        flops=2 * B * Mp * (Mp // G) * (L * L * 2 + L * 6) * passes,
        bytes_accessed=B * Mp * (Mp + 2 * C) * 4,
        transcendentals=B * Mp * Mp,
    )


def _sm_tiles(Mp, G):
    tm = _SM_TM
    while Mp % tm != 0 or tm % G != 0:
        tm //= 2
    tj = min(_SM_TJ, Mp)
    return tm, tj, Mp // tj


def _sm_pass(kernel, args, B, Mp, C, G, m, out_specs, out_shape, with_bwd,
             passes=1, **kw):
    tm, tj, jt = _sm_tiles(Mp, G)
    return pl.pallas_call(
        functools.partial(kernel, m=m, tm=tm, tj=tj, jt=jt, G=G, **kw),
        grid=(B, Mp // tm),
        in_specs=_sm_in_specs(B, Mp, C, tm, G, with_bwd),
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=_sm_cost(B, Mp, C, G, passes),
        interpret=_interpret(),
    )(*args)


def _sim_mlp_forward(m, sp, tp, srcp, tgtp, w0, wxyz, W2, b2, W3, w4r,
                     g1, be1, g2, be2):
    """Train forward on padded inputs: stat passes then the final pass."""
    B, Mp, C = sp.shape
    G = _sm_G(C)
    L = G * C
    E = float(B * m * m)
    z2 = jnp.zeros((2, C), jnp.float32)
    base = (sp, tp, srcp, tgtp, w0, wxyz, W2, b2, W3, w4r, g1, be1, g2, be2)

    sums1 = _sm_pass(
        _sm_stat_kernel, _sm_pack(*base, z2, z2, G), B, Mp, C, G, m,
        _sm_const((2, L)), jax.ShapeDtypeStruct((2, L), jnp.float32),
        with_bwd=False, level=0)
    sums1 = _sm_gred(sums1, G)
    mu1 = sums1[0] / E
    var1 = jnp.maximum(sums1[1] / E - mu1 * mu1, 0.0)
    st1 = jnp.stack([mu1, var1])

    sums2 = _sm_pass(
        _sm_stat_kernel, _sm_pack(*base, st1, z2, G), B, Mp, C, G, m,
        _sm_const((2, L)), jax.ShapeDtypeStruct((2, L), jnp.float32),
        with_bwd=False, level=1)
    sums2 = _sm_gred(sums2, G)
    mu2 = sums2[0] / E
    var2 = jnp.maximum(sums2[1] / E - mu2 * mu2, 0.0)
    st2 = jnp.stack([mu2, var2])

    tm, _, _ = _sm_tiles(Mp, G)
    simr, wmaxP = _sm_pass(
        _sm_final_kernel, _sm_pack(*base, st1, st2, G), B, Mp, C, G, m,
        [pl.BlockSpec((1, tm, Mp), lambda b, t: (b, t, 0),
                      memory_space=pltpu.VMEM),
         pl.BlockSpec((1, tm // G, L), lambda b, t: (b, t, 0),
                      memory_space=pltpu.VMEM)],
        [jax.ShapeDtypeStruct((B, Mp, Mp), jnp.float32),
         jax.ShapeDtypeStruct((B, Mp // G, L), jnp.float32)],
        with_bwd=False)
    return simr, _sm_unpack_rows(wmaxP, B, Mp, C), st1, st2


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def sim_mlp_core(m, sp, tp, srcp, tgtp, w0, wxyz, W2, b2, W3, w4r,
                 g1, be1, g2, be2):
    """Fused IDAM similarity stack on padded inputs (train mode).

    All tensor args are padded to Mp rows (zero pad); m is the real point
    count. Returns (pre-bias logits (B, Mp, Mp), max-pool (B, Mp, C),
    stop-gradient BN batch stats st1, st2 as (2, C) [mean, biased var]).
    Positions srcp/tgtp are non-differentiable (zero cotangents).
    """
    simr, wmax, st1, st2 = _sim_mlp_forward(
        m, sp, tp, srcp, tgtp, w0, wxyz, W2, b2, W3, w4r, g1, be1, g2, be2)
    return simr, wmax, lax.stop_gradient(st1), lax.stop_gradient(st2)


def _sim_mlp_core_fwd(m, sp, tp, srcp, tgtp, w0, wxyz, W2, b2, W3, w4r,
                      g1, be1, g2, be2):
    simr, wmax, st1, st2 = _sim_mlp_forward(
        m, sp, tp, srcp, tgtp, w0, wxyz, W2, b2, W3, w4r, g1, be1, g2, be2)
    res = (sp, tp, srcp, tgtp, w0, wxyz, W2, b2, W3, w4r, g1, be1, g2, be2,
           st1, st2, wmax)
    return (simr, wmax, lax.stop_gradient(st1), lax.stop_gradient(st2)), res


def _sim_mlp_core_bwd(m, res, cts):
    (sp, tp, srcp, tgtp, w0, wxyz, W2, b2, W3, w4r, g1, be1, g2, be2,
     st1, st2, wmax) = res
    d_simr, d_wmax, _, _ = cts
    B, Mp, C = sp.shape
    G = _sm_G(C)
    L = G * C
    E = float(B * m * m)
    z2 = jnp.zeros((2, C), jnp.float32)
    base = (sp, tp, srcp, tgtp, w0, wxyz, W2, b2, W3, w4r, g1, be1, g2, be2)
    d_simr = d_simr.astype(jnp.float32)
    wmaxP = wmax.astype(jnp.float32).reshape(B, Mp // G, L)
    dwmaxP = d_wmax.astype(jnp.float32).reshape(B, Mp // G, L)

    common = _sm_pack(*base, st1, st2, G)
    z2L = jnp.zeros((2, L), jnp.float32)

    S2p, dw4p = _sm_pass(
        _sm_bwd1_kernel, common + [d_simr, dwmaxP, wmaxP, z2L, z2L],
        B, Mp, C, G, m,
        [_sm_const((2, L)), _sm_const((1, L))],
        [jax.ShapeDtypeStruct((2, L), jnp.float32),
         jax.ShapeDtypeStruct((1, L), jnp.float32)],
        with_bwd=True, passes=2)
    S2 = _sm_gred(S2p, G)
    dw4 = _sm_gred(dw4p, G)
    S2L = jnp.tile(S2, (1, G))

    S1p, dW3p, dW2p, db2p = _sm_pass(
        _sm_bwd2_kernel, common + [d_simr, dwmaxP, wmaxP, z2L, S2L],
        B, Mp, C, G, m,
        [_sm_const((2, L)), _sm_const((L, L)), _sm_const((L, L)),
         _sm_const((1, L))],
        [jax.ShapeDtypeStruct((2, L), jnp.float32),
         jax.ShapeDtypeStruct((L, L), jnp.float32),
         jax.ShapeDtypeStruct((L, L), jnp.float32),
         jax.ShapeDtypeStruct((1, L), jnp.float32)],
        with_bwd=True, passes=3, E=E)
    S1 = _sm_gred(S1p, G)
    dW3 = _sm_bdred(dW3p, G, C, C)
    dW2 = _sm_bdred(dW2p, G, C, C)
    db2 = _sm_gred(db2p, G)
    S1L = jnp.tile(S1, (1, G))

    tm, _, _ = _sm_tiles(Mp, G)
    dspP, dtp, dw0p, dwxyzp = _sm_pass(
        _sm_bwd3_kernel, common + [d_simr, dwmaxP, wmaxP, S1L, S2L],
        B, Mp, C, G, m,
        [pl.BlockSpec((1, tm // G, L), lambda b, t: (b, t, 0),
                      memory_space=pltpu.VMEM),
         pl.BlockSpec((1, Mp, C), lambda b, t: (b, 0, 0),
                      memory_space=pltpu.VMEM),
         _sm_const((1, L)), _sm_const((4 * G, L))],
        [jax.ShapeDtypeStruct((B, Mp // G, L), jnp.float32),
         jax.ShapeDtypeStruct((B, Mp, C), jnp.float32),
         jax.ShapeDtypeStruct((1, L), jnp.float32),
         jax.ShapeDtypeStruct((4 * G, L), jnp.float32)],
        with_bwd=True, passes=3, E=E)
    dsp = _sm_unpack_rows(dspP, B, Mp, C)
    dw0 = _sm_gred(dw0p, G)
    dwxyz = _sm_bdred(dwxyzp, G, 4, C)

    return (dsp.astype(sp.dtype), dtp.astype(tp.dtype),
            jnp.zeros_like(srcp), jnp.zeros_like(tgtp),
            dw0.astype(w0.dtype), dwxyz.astype(wxyz.dtype),
            dW2.astype(W2.dtype), db2.astype(b2.dtype),
            dW3.astype(W3.dtype), dw4.astype(w4r.dtype),
            S1[1:2].astype(g1.dtype), S1[0:1].astype(be1.dtype),
            S2[1:2].astype(g2.dtype), S2[0:1].astype(be2.dtype))


sim_mlp_core.defvjp(_sim_mlp_core_fwd, _sim_mlp_core_bwd)


def _sm_prep(src, tgt, semb, temb, Wcat, W2, b2, W3, W4, b4,
             g1, be1, g2, be2):
    """Project embeddings (differentiable XLA), pad everything to Mp."""
    B, M, _ = src.shape
    emb = semb.shape[-1]
    C = W2.shape[0]
    Mp = max(_SM_TJ, -(-M // _SM_TJ) * _SM_TJ)

    def dot(x, w):
        return jnp.dot(
            x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16),
            w.astype(jnp.bfloat16), preferred_element_type=jnp.float32,
        ).reshape(x.shape[:-1] + (w.shape[-1],))

    sp = dot(semb, Wcat[:emb])
    tp = dot(temb, Wcat[emb:2 * emb])
    w0 = Wcat[2 * emb:2 * emb + 1]
    wxyz = jnp.concatenate(
        [Wcat[2 * emb + 1:2 * emb + 4],
         jnp.zeros((1, C), Wcat.dtype)], axis=0)

    pad_m = [(0, 0), (0, Mp - M), (0, 0)]
    sp = jnp.pad(sp, pad_m)
    tp = jnp.pad(tp, pad_m)
    srcp = lax.stop_gradient(
        jnp.pad(src.astype(jnp.float32), [(0, 0), (0, Mp - M), (0, 1)]))
    tgtp = lax.stop_gradient(
        jnp.pad(tgt.astype(jnp.float32), [(0, 0), (0, Mp - M), (0, 1)]))
    args = (sp, tp, srcp, tgtp, w0, wxyz, W2,
            b2.reshape(1, C), W3, W4.reshape(1, C),
            g1.reshape(1, C), be1.reshape(1, C),
            g2.reshape(1, C), be2.reshape(1, C))
    return M, args


def sim_mlp_train(src, tgt, semb, temb, Wcat, W2, b2, W3, W4, b4,
                  g1, be1, g2, be2):
    """Fused IDAM similarity-matrix stack, training mode.

    src/tgt: (B, M, 3) positions (non-differentiable here — training
    differentiates parameters only). semb/temb: (B, M, emb) embeddings.
    Wcat: (2*emb+4, C) DenseCat kernel over [emb_i, emb_j, dist, dir].
    W2/b2: Dense(C); W3: Dense(C, no bias); W4/b4: Dense(1).
    g/be: BN scale/offset pairs. Semantics match the reference similarity
    conv (registration/models/idam.py:267-279) with bf16 matmul inputs.

    Returns (sim (B, M, M) f32 clipped logits, wmax (B, M, C) f32 max-pool
    of the mid-chain Dense, (st1, st2) stop-gradient batch stats).
    """
    M, args = _sm_prep(src, tgt, semb, temb, Wcat, W2, b2, W3, W4, b4,
                       g1, be1, g2, be2)
    simr, wmax, st1, st2 = sim_mlp_core(M, *args)
    sim = jnp.clip(simr[:, :M, :M] + b4.reshape(()), -20.0, 20.0)
    return sim, wmax[:, :M], (st1, st2)


def sim_mlp_eval(src, tgt, semb, temb, Wcat, W2, b2, W3, W4, b4,
                 g1, be1, g2, be2, mean1, var1, mean2, var2):
    """Inference-mode fused stack using running BN statistics."""
    M, args = _sm_prep(src, tgt, semb, temb, Wcat, W2, b2, W3, W4, b4,
                       g1, be1, g2, be2)
    B, Mp, C = args[0].shape
    G = _sm_G(C)
    L = G * C
    st1 = jnp.stack([mean1.astype(jnp.float32), var1.astype(jnp.float32)])
    st2 = jnp.stack([mean2.astype(jnp.float32), var2.astype(jnp.float32)])
    tm, _, _ = _sm_tiles(Mp, G)
    simr, wmaxP = _sm_pass(
        _sm_final_kernel, _sm_pack(*args, st1, st2, G), B, Mp, C, G, M,
        [pl.BlockSpec((1, tm, Mp), lambda b, t: (b, t, 0),
                      memory_space=pltpu.VMEM),
         pl.BlockSpec((1, tm // G, L), lambda b, t: (b, t, 0),
                      memory_space=pltpu.VMEM)],
        [jax.ShapeDtypeStruct((B, Mp, Mp), jnp.float32),
         jax.ShapeDtypeStruct((B, Mp // G, L), jnp.float32)],
        with_bwd=False)
    wmax = _sm_unpack_rows(wmaxP, B, Mp, C)
    sim = jnp.clip(simr[:, :M, :M] + b4.reshape(()), -20.0, 20.0)
    return sim, wmax[:, :M]


def sim_mlp_reference(src, tgt, semb, temb, Wcat, W2, b2, W3, W4, b4,
                      g1, be1, g2, be2, mean1=None, var1=None, mean2=None,
                      var2=None, train=True):
    """jnp golden with the kernel's arithmetic (bf16 matmul inputs, f32
    BN/stat math; positions stop-gradient on every path). CPU dispatch path
    and parity baseline; materializes the (B, M, M, C) intermediates.

    Max-pool cotangents split across exact ties under autodiff (the kernel
    routes to every tie) — identical off measure-zero inputs.
    """
    f32 = jnp.float32
    emb = semb.shape[-1]
    C = W2.shape[0]

    def dot(x, w):
        return jnp.dot(
            x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16),
            w.astype(jnp.bfloat16), preferred_element_type=f32,
        ).reshape(x.shape[:-1] + (w.shape[-1],))

    src = lax.stop_gradient(src.astype(f32))
    tgt = lax.stop_gradient(tgt.astype(f32))
    sp = dot(semb, Wcat[:emb])
    tp = dot(temb, Wcat[emb:2 * emb])
    w0 = Wcat[2 * emb].astype(f32)
    wxyz = Wcat[2 * emb + 1:2 * emb + 4]

    diff = src[:, :, None, :] - tgt[:, None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1, keepdims=True))
    # The kernel normalizes diff BEFORE the bf16 matmul (the reference
    # divides after); equal up to bf16 input rounding.
    dproj = dist * w0 + dot(diff / (dist + 1e-8), wxyz)
    h0 = sp[:, :, None, :] + tp[:, None, :, :] + dproj

    def bn(h, g, be, mean, var):
        if train:
            mu = jnp.mean(h, axis=(0, 1, 2))
            v = jnp.maximum(jnp.mean(h * h, axis=(0, 1, 2)) - mu * mu, 0.0)
        else:
            mu, v = mean.astype(f32), var.astype(f32)
        hhat = (h - mu) * lax.rsqrt(v + _EM_EPS)
        return (jnp.maximum(hhat * g.astype(f32) + be.astype(f32), 0.0),
                jnp.stack([mu, v]))

    x1, st1 = bn(h0, g1, be1, mean1, var1)
    h1 = dot(x1, W2) + b2.astype(f32)
    wmax = jnp.max(h1, axis=2)
    h2 = dot(h1, W3)
    x2, st2 = bn(h2, g2, be2, mean2, var2)
    simr = jnp.sum(x2 * W4.reshape(1, 1, 1, C).astype(f32), axis=-1)
    sim = jnp.clip(simr + b4.reshape(()), -20.0, 20.0)
    if train:
        return sim, wmax, (lax.stop_gradient(st1), lax.stop_gradient(st2))
    return sim, wmax


def sim_mlp_supported(C: int) -> bool:
    """Kernel gate: the lane packing needs G = 128 // C whole groups."""
    return C >= 8 and 128 % C == 0


# ---------------------------------------------------------------------------
# Fused IDAM GNN edge block (Propagate: BN -> relu -> Dense -> max over k)
# ---------------------------------------------------------------------------
#
# IDAM's GNN (reference registration/models/idam.py:115-149) runs five
# Propagate layers per cloud: edge = gather(p, idx) - p_center, then
# BatchNorm -> relu -> Conv1x1(+bias) -> max over the 12 neighbours. In XLA
# every (B, N, 12, 64) intermediate (201 MB f32) is materialized in HBM
# several times forward and backward — the GNN dominates IDAM's step time.
# Here the edge tensor is built once in XLA (bf16, so its gather backward
# stays XLA's well-tuned scatter path), the BN batch statistics are plain
# XLA reduces over it, and a Pallas pass streams it through the
# BN+relu+Dense+max chain in registers, emitting only the (B, N, C) pooled
# output. Backward mirrors edge_mlp: one pass accumulates the BN backward
# sums S and dW/db while routing the max-pool cotangent to every argmax
# edge, a second pass (needs S) emits d_edge for XLA's scatter.
#
# Layout is edge_mlp's (B, k, N, C): the k dimension is a VMEM-resident
# loop, N tiles the grid.

def _ge_final_kernel(a1_ref, W_ref, b_ref, g_ref, be_ref, st_ref, x_ref,
                     *, k, tm):
    def body(j, best):
        a1j = a1_ref[0, pl.ds(j, 1), :, :][0].astype(jnp.float32)
        # NOT the fast path: the backward matches h == saved-max exactly.
        _, x1 = _em_bn(a1j, st_ref, g_ref, be_ref)
        h = (jnp.dot(x1.astype(jnp.bfloat16), W_ref[:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
             + b_ref[0, :].astype(jnp.float32)[None, :])
        return jnp.maximum(best, h)

    init = jnp.full((tm, x_ref.shape[2]), -jnp.inf, jnp.float32)
    x_ref[0] = lax.fori_loop(0, k, body, init)


def _ge_bwd1_kernel(a1_ref, W_ref, b_ref, g_ref, be_ref, st_ref,
                    dx_ref, xs_ref, S_ref, dW_ref, db_ref, *, k, tm):
    bpid = pl.program_id(0)
    t = pl.program_id(1)
    C = db_ref.shape[1]
    dout = dx_ref[0].astype(jnp.float32)
    xs = xs_ref[0].astype(jnp.float32)

    def body(j, carry):
        s, ss, dW, db = carry
        a1j = a1_ref[0, pl.ds(j, 1), :, :][0].astype(jnp.float32)
        hhat, x1 = _em_bn(a1j, st_ref, g_ref, be_ref)
        h = (jnp.dot(x1.astype(jnp.bfloat16), W_ref[:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
             + b_ref[0, :].astype(jnp.float32)[None, :])
        dy_h = dout * (h == xs).astype(jnp.float32)
        dx1 = lax.dot_general(
            dy_h.astype(jnp.bfloat16), W_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dy = jnp.where(x1 > 0.0, dx1, 0.0)
        dW_j = lax.dot_general(
            x1.astype(jnp.bfloat16), dy_h.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (s + jnp.sum(dy, axis=0, keepdims=True),
                ss + jnp.sum(dy * hhat, axis=0, keepdims=True),
                dW + dW_j,
                db + jnp.sum(dy_h, axis=0, keepdims=True))

    z = jnp.zeros((1, C), jnp.float32)
    zw = jnp.zeros(dW_ref.shape, jnp.float32)
    s, ss, dW, db = lax.fori_loop(0, k, body, (z, z, zw, z))

    @pl.when((bpid == 0) & (t == 0))
    def _():
        S_ref[...] = jnp.zeros_like(S_ref)
        dW_ref[...] = jnp.zeros_like(dW_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    S_ref[0:1, :] += s
    S_ref[1:2, :] += ss
    dW_ref[...] += dW
    db_ref[...] += db


def _ge_bwd2_kernel(a1_ref, W_ref, b_ref, g_ref, be_ref, st_ref,
                    dx_ref, xs_ref, S_ref, da1_ref, *, k, tm, E):
    dout = dx_ref[0].astype(jnp.float32)
    xs = xs_ref[0].astype(jnp.float32)

    def body(j, _):
        a1j = a1_ref[0, pl.ds(j, 1), :, :][0].astype(jnp.float32)
        hhat, x1 = _em_bn(a1j, st_ref, g_ref, be_ref)
        h = (jnp.dot(x1.astype(jnp.bfloat16), W_ref[:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
             + b_ref[0, :].astype(jnp.float32)[None, :])
        dy_h = dout * (h == xs).astype(jnp.float32)
        dx1 = lax.dot_general(
            dy_h.astype(jnp.bfloat16), W_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dy = jnp.where(x1 > 0.0, dx1, 0.0)
        da1 = _em_bnbwd(dy, hhat, st_ref, g_ref, S_ref, E)
        da1_ref[0, pl.ds(j, 1), :, :] = da1[None].astype(da1_ref.dtype)
        return 0

    lax.fori_loop(0, k, body, 0)


def _ge_specs(B, k, N, C, tm, with_bwd):
    a1 = pl.BlockSpec((1, k, tm, C), lambda b, t: (b, 0, t, 0),
                      memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, tm, C), lambda b, t: (b, t, 0),
                       memory_space=pltpu.VMEM)
    specs = [a1, _sm_const((C, C)), _sm_const((1, C)), _sm_const((1, C)),
             _sm_const((1, C)), _sm_const((2, C))]
    if with_bwd:
        specs += [row, row, _sm_const((2, C))]
    return specs


def _ge_tm(N):
    for tm in (512, 256, 128, 64, 32, 16, 8):
        if N % tm == 0:
            return tm
    return N


def _ge_args(a1, W, b, gamma, beta, st):
    f32 = lambda x: x.astype(jnp.float32)
    return [a1, f32(W), f32(b).reshape(1, -1), f32(gamma).reshape(1, -1),
            f32(beta).reshape(1, -1), f32(st)]


def _ge_cost(B, k, N, C, passes=1):
    return pl.CostEstimate(
        flops=2 * B * k * N * C * C * passes,
        bytes_accessed=B * k * N * C * 2,
        transcendentals=0,
    )


def _gnn_edge_forward(a1, W, b, gamma, beta):
    B, k, N, C = a1.shape
    E = float(B * k * N)
    a1f = a1.astype(jnp.float32)
    mu = jnp.sum(a1f, axis=(0, 1, 2)) / E
    var = jnp.maximum(jnp.sum(a1f * a1f, axis=(0, 1, 2)) / E - mu * mu, 0.0)
    st = jnp.stack([mu, var])
    tm = _ge_tm(N)
    x = pl.pallas_call(
        functools.partial(_ge_final_kernel, k=k, tm=tm),
        grid=(B, N // tm),
        in_specs=_ge_specs(B, k, N, C, tm, with_bwd=False),
        out_specs=pl.BlockSpec((1, tm, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        cost_estimate=_ge_cost(B, k, N, C),
        interpret=_interpret(),
    )(*_ge_args(a1, W, b, gamma, beta, st))
    return x, st


@jax.custom_vjp
def gnn_edge_train(a1, W, b, gamma, beta):
    """Fused BN -> relu -> Dense(+bias) -> max_k over a DGCNN edge tensor.

    a1: (B, k, N, C) edge features (gather - center; any float dtype,
    bf16 recommended — matmul inputs round to bf16 like XLA DEFAULT
    anyway, and BN statistics are computed from the stored values).
    Semantics match IDAM's Propagate body (reference idam.py:115-128) in
    training mode. Returns (x (B, N, C) f32, stats (2, C) stop-gradient
    [batch mean, biased var]).
    """
    x, st = _gnn_edge_forward(a1, W, b, gamma, beta)
    return x, lax.stop_gradient(st)


def _gnn_edge_train_fwd(a1, W, b, gamma, beta):
    x, st = _gnn_edge_forward(a1, W, b, gamma, beta)
    return (x, lax.stop_gradient(st)), (a1, W, b, gamma, beta, st, x)


def _gnn_edge_train_bwd(res, cts):
    a1, W, b, gamma, beta, st, x = res
    dx, _ = cts
    B, k, N, C = a1.shape
    E = float(B * k * N)
    tm = _ge_tm(N)
    dx = dx.astype(jnp.float32)
    common = _ge_args(a1, W, b, gamma, beta, st) + [dx, x]

    S, dW, db = pl.pallas_call(
        functools.partial(_ge_bwd1_kernel, k=k, tm=tm),
        grid=(B, N // tm),
        in_specs=_ge_specs(B, k, N, C, tm, with_bwd=True)[:-1],
        out_specs=[_sm_const((2, C)), _sm_const((C, C)),
                   _sm_const((1, C))],
        out_shape=[jax.ShapeDtypeStruct((2, C), jnp.float32),
                   jax.ShapeDtypeStruct((C, C), jnp.float32),
                   jax.ShapeDtypeStruct((1, C), jnp.float32)],
        cost_estimate=_ge_cost(B, k, N, C, passes=3),
        interpret=_interpret(),
    )(*common)

    da1 = pl.pallas_call(
        functools.partial(_ge_bwd2_kernel, k=k, tm=tm, E=E),
        grid=(B, N // tm),
        in_specs=_ge_specs(B, k, N, C, tm, with_bwd=True),
        out_specs=pl.BlockSpec((1, k, tm, C), lambda b, t: (b, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, k, N, C), a1.dtype),
        cost_estimate=_ge_cost(B, k, N, C, passes=3),
        interpret=_interpret(),
    )(*(common + [S]))

    return (da1, dW.astype(W.dtype), db.reshape(b.shape).astype(b.dtype),
            S[1].reshape(gamma.shape).astype(gamma.dtype),
            S[0].reshape(beta.shape).astype(beta.dtype))


gnn_edge_train.defvjp(_gnn_edge_train_fwd, _gnn_edge_train_bwd)


def gnn_edge_eval(a1, W, b, gamma, beta, mean, var):
    """Inference-mode fused block using running BN statistics."""
    B, k, N, C = a1.shape
    st = jnp.stack([mean.astype(jnp.float32), var.astype(jnp.float32)])
    tm = _ge_tm(N)
    return pl.pallas_call(
        functools.partial(_ge_final_kernel, k=k, tm=tm),
        grid=(B, N // tm),
        in_specs=_ge_specs(B, k, N, C, tm, with_bwd=False),
        out_specs=pl.BlockSpec((1, tm, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        cost_estimate=_ge_cost(B, k, N, C),
        interpret=_interpret(),
    )(*_ge_args(a1, W, b, gamma, beta, st))


def gnn_edge_reference(a1, W, b, gamma, beta, mean=None, var=None,
                       train=True):
    """jnp golden with the kernel's arithmetic (bf16 matmul inputs, f32
    BN/stat math). CPU dispatch path and parity baseline. Max-pool
    cotangents split across exact ties under autodiff (the kernel routes
    to every tie) — identical off measure-zero inputs."""
    f32 = jnp.float32
    a = a1.astype(f32)
    if train:
        mu = jnp.mean(a, axis=(0, 1, 2))
        v = jnp.maximum(jnp.mean(a * a, axis=(0, 1, 2)) - mu * mu, 0.0)
    else:
        mu, v = mean.astype(f32), var.astype(f32)
    hhat = (a - mu) * lax.rsqrt(v + _EM_EPS)
    x1 = jnp.maximum(hhat * gamma.astype(f32) + beta.astype(f32), 0.0)
    h = jnp.einsum(
        "bknc,cd->bknd", x1.astype(jnp.bfloat16), W.astype(jnp.bfloat16),
        preferred_element_type=f32) + b.astype(f32)
    x = jnp.max(h, axis=1)
    if train:
        return x, lax.stop_gradient(jnp.stack([mu, v]))
    return x


def gnn_edge_supported(a1) -> bool:
    """Kernel gate: lane-friendly channel width and tileable N."""
    B, k, N, C = a1.shape
    return C % 8 == 0 and N % 8 == 0 and N >= 8

# ---------------------------------------------------------------------------
# Fully fused IDAM Propagate: edge build + BN -> relu -> Dense -> max_k
# ---------------------------------------------------------------------------
#
# gnn_edge (above) still pays three XLA-side passes per Propagate layer:
# the one-hot gather kernel, an elementwise subtract/cast/transpose over the
# (B, N, k, C) edge tensor, and — on the way back — a 100 MB d_edge HBM
# round-trip into a separate MXU scatter launch. gnn_propagate folds all of
# that into the gnn_edge kernels themselves: the forward builds the
# (B, k, N, C) bf16 edge tensor directly from (p, idx) with in-register
# one-hot MXU gathers (one kernel, no intermediate layouts), and the
# backward's second pass scatters d_edge into d_p with transposed one-hot
# matmuls while the per-edge cotangent is still in registers — d_edge never
# exists in HBM. Arithmetic matches the unfused path bit-for-bit: the
# gather table rounds to bf16 (as XLA DEFAULT matmuls do), the center
# subtraction stays f32, and the edge values are stored bf16 (BN statistics
# are computed from the stored values, like gnn_edge).
#
# Reference: registration/models/idam.py:115-128 (Propagate).


def _gp_edge_kernel(idx_ref, p_ref, a1_ref, *, k, tm):
    t = pl.program_id(1)
    n = p_ref.shape[1]
    single = n == tm
    tbl = p_ref[0].astype(jnp.bfloat16)                      # (N, C)
    center = (p_ref[0] if single
              else p_ref[0, pl.ds(t * tm, tm), :]).astype(jnp.float32)
    col = lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    for j in range(k):
        ii = idx_ref[0, j, :] if single else idx_ref[0, j, pl.ds(t * tm, tm)]
        oh = (col == ii[:, None]).astype(jnp.bfloat16)
        g = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)
        a1_ref[0, j] = (g - center).astype(a1_ref.dtype)


def _gp_bwd2_kernel(a1_ref, W_ref, b_ref, g_ref, be_ref, st_ref,
                    dx_ref, xs_ref, S_ref, idx_ref, dp_ref, *, k, tm, E):
    t = pl.program_id(1)
    n = dp_ref.shape[1]
    C = dp_ref.shape[2]
    single = n == tm
    dout = dx_ref[0].astype(jnp.float32)
    xs = xs_ref[0].astype(jnp.float32)
    col = lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    contractT = (((0,), (0,)), ((), ()))

    @pl.when(t == 0)
    def _():
        dp_ref[0] = jnp.zeros_like(dp_ref[0])

    acc = jnp.zeros((n, C), jnp.float32)
    csum = jnp.zeros((tm, C), jnp.float32)
    for j in range(k):
        a1j = a1_ref[0, j].astype(jnp.float32)
        hhat, x1 = _em_bn(a1j, st_ref, g_ref, be_ref)
        h = (jnp.dot(x1.astype(jnp.bfloat16), W_ref[:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
             + b_ref[0, :].astype(jnp.float32)[None, :])
        dy_h = dout * (h == xs).astype(jnp.float32)
        dx1 = lax.dot_general(
            dy_h.astype(jnp.bfloat16), W_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dy = jnp.where(x1 > 0.0, dx1, 0.0)
        da1 = _em_bnbwd(dy, hhat, st_ref, g_ref, S_ref, E)
        # a1 was stored bf16, so the cotangent is bf16-valued already; the
        # scatter matmul's bf16 rounding loses nothing extra.
        ii = idx_ref[0, j, :] if single else idx_ref[0, j, pl.ds(t * tm, tm)]
        oh = (col == ii[:, None]).astype(jnp.bfloat16)
        acc += lax.dot_general(oh, da1.astype(jnp.bfloat16),
                               dimension_numbers=contractT,
                               preferred_element_type=jnp.float32)
        csum += da1
    dp_ref[0] += acc.astype(dp_ref.dtype)
    if single:
        dp_ref[0] -= csum.astype(dp_ref.dtype)
    else:
        cur = dp_ref[0, pl.ds(t * tm, tm), :]
        dp_ref[0, pl.ds(t * tm, tm), :] = cur - csum.astype(dp_ref.dtype)


def _gp_edge_build(p, idxT):
    """(B, N, C) x (B, k, N) -> (B, k, N, C) bf16 edge tensor (gather-center
    in the kernel arithmetic described above)."""
    B, N, C = p.shape
    k = idxT.shape[1]
    tm = min(_ge_tm(N), 512)
    return pl.pallas_call(
        functools.partial(_gp_edge_kernel, k=k, tm=tm),
        grid=(B, N // tm),
        in_specs=[
            pl.BlockSpec((1, k, N), lambda b_, t: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b_, t: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, tm, C), lambda b_, t: (b_, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, k, N, C), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * k * N * N * C,
            bytes_accessed=B * N * C * 4 + B * k * N * C * 2,
            transcendentals=0),
        interpret=_interpret(),
    )(idxT.astype(jnp.int32), p.astype(jnp.float32))


@jax.custom_vjp
def gnn_propagate_train(p, idx, W, b, gamma, beta):
    """Fused IDAM Propagate layer from projected features + neighbour graph.

    p: (B, N, C) projected point features, idx: (B, N, k) int neighbour
    indices (self-kNN). Equivalent to gnn_edge_train applied to the
    (gather(p, idx) - p_center) edge tensor, with the edge build and the
    d_p scatter fused into the kernels. Returns (x (B, N, C) f32,
    stats (2, C) stop-gradient [batch mean, biased var]).
    """
    idxT = jnp.swapaxes(idx, 1, 2)
    a1 = _gp_edge_build(p, idxT)
    x, st = _gnn_edge_forward(a1, W, b, gamma, beta)
    return x, lax.stop_gradient(st)


def _gnn_propagate_train_fwd(p, idx, W, b, gamma, beta):
    idxT = jnp.swapaxes(idx, 1, 2)
    a1 = _gp_edge_build(p, idxT)
    x, st = _gnn_edge_forward(a1, W, b, gamma, beta)
    return (x, lax.stop_gradient(st)), (a1, idxT, W, b, gamma, beta, st, x,
                                        jnp.zeros((0,), p.dtype))


def _gnn_propagate_train_bwd(res, cts):
    a1, idxT, W, b, gamma, beta, st, x, p_proto = res
    p_dtype = p_proto.dtype
    dx, _ = cts
    B, k, N, C = a1.shape
    E = float(B * k * N)
    tm = _ge_tm(N)
    dx = dx.astype(jnp.float32)
    common = _ge_args(a1, W, b, gamma, beta, st) + [dx, x]

    S, dW, db = pl.pallas_call(
        functools.partial(_ge_bwd1_kernel, k=k, tm=tm),
        grid=(B, N // tm),
        in_specs=_ge_specs(B, k, N, C, tm, with_bwd=True)[:-1],
        out_specs=[_sm_const((2, C)), _sm_const((C, C)),
                   _sm_const((1, C))],
        out_shape=[jax.ShapeDtypeStruct((2, C), jnp.float32),
                   jax.ShapeDtypeStruct((C, C), jnp.float32),
                   jax.ShapeDtypeStruct((1, C), jnp.float32)],
        cost_estimate=_ge_cost(B, k, N, C, passes=3),
        interpret=_interpret(),
    )(*common)

    tm2 = min(tm, 512)
    d_p = pl.pallas_call(
        functools.partial(_gp_bwd2_kernel, k=k, tm=tm2, E=E),
        grid=(B, N // tm2),
        in_specs=(_ge_specs(B, k, N, C, tm2, with_bwd=True)
                  + [pl.BlockSpec((1, k, N), lambda b_, t: (b_, 0, 0),
                                  memory_space=pltpu.VMEM)]),
        out_specs=pl.BlockSpec((1, N, C), lambda b_, t: (b_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        cost_estimate=_ge_cost(B, k, N, C, passes=4),
        interpret=_interpret(),
    )(*(common + [S, idxT]))

    return (d_p.astype(p_dtype), _float0_like(idxT.swapaxes(1, 2)),
            dW.astype(W.dtype), db.reshape(b.shape).astype(b.dtype),
            S[1].reshape(gamma.shape).astype(gamma.dtype),
            S[0].reshape(beta.shape).astype(beta.dtype))


gnn_propagate_train.defvjp(_gnn_propagate_train_fwd, _gnn_propagate_train_bwd)


def gnn_propagate_eval(p, idx, W, b, gamma, beta, mean, var):
    """Inference-mode fused Propagate using running BN statistics."""
    a1 = _gp_edge_build(p, jnp.swapaxes(idx, 1, 2))
    return gnn_edge_eval(a1, W, b, gamma, beta, mean, var)


def gnn_propagate_reference(p, idx, W, b, gamma, beta, mean=None, var=None,
                            train=True):
    """jnp golden with the kernel's arithmetic: the gather table rounds to
    bf16 (one-hot MXU semantics), the center subtraction is f32, edges are
    stored bf16, then the gnn_edge chain."""
    f32 = jnp.float32
    pb = p.astype(jnp.bfloat16).astype(f32)
    g = jnp_ref.grouping_operation(pb, idx)
    a1 = (g - p.astype(f32)[:, :, None, :]).astype(jnp.bfloat16)
    a1 = jnp.swapaxes(a1, 1, 2)
    return gnn_edge_reference(a1, W, b, gamma, beta, mean, var, train)


def gnn_propagate_supported(p, idx) -> bool:
    """Kernel gate: lane-friendly channels, lane-aligned idx tile offsets
    (single tile or 128-multiple tiles), and a VMEM-resident (N, C) table."""
    B, N, C = p.shape
    if C % 8 or N % 8 or N * C * 4 > 4 * 1024 * 1024:
        return False
    tm = _ge_tm(N)
    return tm == N or tm % 128 == 0
