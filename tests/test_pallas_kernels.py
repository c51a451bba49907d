"""Pallas kernels (interpreter mode on CPU) vs jnp golden references."""

import jax
import jax.numpy as jnp
import numpy as np

from mvp_benchmark_tpu.ops import jnp_ref, pallas_kernels


def clouds(rng, B=2, N=128, M=96):
    a = rng.random((B, N, 3), dtype=np.float64).astype(np.float32)
    b = rng.random((B, M, 3), dtype=np.float64).astype(np.float32)
    return a, b


def test_chamfer_matches_reference(rng):
    a, b = clouds(rng)
    d1, d2, i1, i2 = pallas_kernels.chamfer_distance(a, b)
    g1, g2, j1, j2 = jnp_ref.chamfer_distance(a, b)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(g1),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(g2),
                               rtol=1e-5, atol=1e-7)
    # Indices must reproduce the min distances (ties may differ from the
    # expansion-based reference argmin).
    for k in range(a.shape[0]):
        sel = b[k][np.asarray(i1[k])]
        np.testing.assert_allclose(
            np.sum((a[k] - sel) ** 2, -1), np.asarray(g1[k]),
            rtol=1e-5, atol=1e-7,
        )
        sel = a[k][np.asarray(i2[k])]
        np.testing.assert_allclose(
            np.sum((b[k] - sel) ** 2, -1), np.asarray(g2[k]),
            rtol=1e-5, atol=1e-7,
        )


def test_chamfer_gradient_matches_reference(rng):
    a, b = clouds(rng, N=32, M=48)

    def loss_p(a_, b_):
        d1, d2, _, _ = pallas_kernels.chamfer_distance(a_, b_)
        return jnp.sum(d1 * 0.3) + jnp.sum(d2 * 0.7)

    def loss_r(a_, b_):
        d1, d2, _, _ = jnp_ref.chamfer_distance(a_, b_)
        return jnp.sum(d1 * 0.3) + jnp.sum(d2 * 0.7)

    ga_p, gb_p = jax.grad(loss_p, argnums=(0, 1))(a, b)
    ga_r, gb_r = jax.grad(loss_r, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_r),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_r),
                               rtol=1e-4, atol=1e-6)


def test_chamfer_uneven_tile_sizes(rng):
    # N not a multiple of 128 exercises the small-tile fallback.
    a, b = clouds(rng, N=96, M=50)
    d1, d2, i1, i2 = pallas_kernels.chamfer_distance(a, b)
    g1, g2, _, _ = jnp_ref.chamfer_distance(a, b)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(g1),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(g2),
                               rtol=1e-5, atol=1e-7)


def test_fps_matches_reference(rng):
    a, _ = clouds(rng, B=3, N=160)
    idx_p = pallas_kernels.furthest_point_sample(a, 24)
    idx_r = jnp_ref.furthest_point_sample(a, 24)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_r))


def test_knn_pallas_matches_reference(rng):
    from mvp_benchmark_tpu.ops import pallas_kernels as pk

    q = rng.random((2, 64, 3), dtype=np.float64).astype(np.float32)
    p = rng.random((2, 96, 3), dtype=np.float64).astype(np.float32)
    negd, idx = pk.knn_points(q, p, 8)
    gold_negd, gold_idx = jnp_ref.knn_points(q, p, 8)
    np.testing.assert_allclose(np.asarray(negd), np.asarray(gold_negd),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(gold_idx))


def test_knn_pallas_self_indices(rng):
    from mvp_benchmark_tpu.ops import pallas_kernels as pk

    pts = rng.random((2, 40, 3), dtype=np.float64).astype(np.float32)
    idx = pk.knn_indices(pts, 4)
    ref = jnp_ref.knn_indices(pts, 4)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref))


def test_knn_pallas_dist_gradient(rng):
    """knn_points dist output must stay differentiable (uniform loss uses it)."""
    from mvp_benchmark_tpu.ops import pallas_kernels as pk

    q = rng.random((1, 16, 3), dtype=np.float64).astype(np.float32)
    p = rng.random((1, 24, 3), dtype=np.float64).astype(np.float32)

    g_p = jax.grad(lambda a, b: jnp.sum(pk.knn_points(a, b, 3)[0]))(q, p)
    g_r = jax.grad(lambda a, b: jnp.sum(jnp_ref.knn_points(a, b, 3)[0]))(q, p)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
                               rtol=1e-4, atol=1e-6)


def test_scatter_add_rows_matches_at_add(rng):
    B, M, N, C = 2, 330, 96, 12            # M deliberately not tile-aligned
    g = rng.random((B, M, C), dtype=np.float64).astype(np.float32)
    idx = rng.integers(0, N, (B, M)).astype(np.int32)
    out = pallas_kernels.scatter_add_rows(jnp.asarray(g), jnp.asarray(idx), N)
    ref = np.zeros((B, N, C), np.float32)
    for b in range(B):
        np.add.at(ref[b], idx[b], g[b])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_gather_rows_backward_matches_reference(rng):
    B, N, C, M, K = 2, 77, 9, 41, 5
    feats = jnp.asarray(rng.random((B, N, C), dtype=np.float64).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, (B, M, K)), jnp.int32)
    ct = jnp.asarray(rng.random((B, M, K, C), dtype=np.float64).astype(np.float32))

    # C > 3 -> approx one-hot forward (table rounded to bf16, like every
    # downstream matmul input under XLA DEFAULT precision).
    out = pallas_kernels.grouping_operation(feats, idx)
    ref = jnp_ref.grouping_operation(feats, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-2, atol=1e-2)
    # approx=False forward is the exact XLA gather.
    exact_fwd = pallas_kernels.gather_rows(feats, idx, False)
    np.testing.assert_array_equal(np.asarray(exact_fwd), np.asarray(ref))

    # Default backward rounds cotangents to bf16 (GATHER_BWD_EXACT=False),
    # consistent with DEFAULT-precision Dense backwards everywhere else.
    g_new = jax.grad(lambda f: jnp.sum(pallas_kernels.grouping_operation(f, idx) * ct))(feats)
    g_ref = jax.grad(lambda f: jnp.sum(jnp_ref.grouping_operation(f, idx) * ct))(feats)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=2e-2, atol=2e-2)
    # The exact (bf16x2) scatter matches fp32 scatter-add tightly.
    B_, M_, C_ = ct.shape[0], ct.shape[1] * ct.shape[2], ct.shape[3]
    exact = pallas_kernels.scatter_add_rows(
        ct.reshape(B_, M_, C_), idx.reshape(B_, M_), feats.shape[1], exact=True)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_three_interpolate_mxu_backward(rng):
    B, Msrc, C, Ntgt = 2, 40, 7, 65
    feats = jnp.asarray(rng.random((B, Msrc, C), dtype=np.float64).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, Msrc, (B, Ntgt, 3)), jnp.int32)
    w = jnp.asarray(rng.random((B, Ntgt, 3), dtype=np.float64).astype(np.float32))

    out = pallas_kernels.three_interpolate(feats, idx, w)
    ref = jnp_ref.three_interpolate(feats, idx, w)
    # C > 3 -> approx (bf16-table) one-hot forward.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-2, atol=1e-2)
    g_new = jax.grad(lambda f: jnp.sum(pallas_kernels.three_interpolate(f, idx, w) ** 2))(feats)
    g_ref = jax.grad(lambda f: jnp.sum(jnp_ref.three_interpolate(f, idx, w) ** 2))(feats)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=2e-2, atol=2e-2)
