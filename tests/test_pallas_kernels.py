"""Pallas kernels (interpreter mode on CPU) vs jnp golden references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_chamfer_bwd_kernel_matches_xla(rng):
    """The fused masked-reduction backward (the TPU path, gated off on CPU)
    vs the XLA gather+scatter formulation, at lane-aligned shapes."""
    a, b = clouds(rng, B=2, N=256, M=128)
    d1, d2, i1, i2 = pallas_kernels.chamfer_distance(a, b)
    g1 = rng.random(d1.shape).astype(np.float32)
    g2 = rng.random(d2.shape).astype(np.float32)

    da_k = pallas_kernels._chamfer_bwd_dir(a, b, i1, g1, i2, g2)
    db_k = pallas_kernels._chamfer_bwd_dir(b, a, i2, g2, i1, g1)

    b_sel = jnp.take_along_axis(jnp.asarray(b), i1[..., None], axis=1)
    a_sel = jnp.take_along_axis(jnp.asarray(a), i2[..., None], axis=1)
    diff1 = 2.0 * g1[..., None] * (a - b_sel)
    diff2 = 2.0 * g2[..., None] * (b - a_sel)
    scatter = jax.vmap(lambda acc, idx, upd: acc.at[idx].add(upd))
    da_x = diff1 + scatter(jnp.zeros_like(jnp.asarray(a)), i2, -diff2)
    db_x = diff2 + scatter(jnp.zeros_like(jnp.asarray(b)), i1, -diff1)

    np.testing.assert_allclose(np.asarray(da_k), np.asarray(da_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(db_k), np.asarray(db_x),
                               rtol=1e-5, atol=1e-6)


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

    # approx="hilo": hi+lo bf16 table split — exact to ~1e-6 of fp32
    # (the RRI coordinate-gather path; plain bf16 would be ~1e-2 here).
    hilo = pallas_kernels.gather_rows(feats, idx, "hilo")
    np.testing.assert_allclose(np.asarray(hilo), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # And through grouping_operation's C<8 lane-pad branch at C=3.
    feats3 = feats[..., :3]
    hilo3 = pallas_kernels.grouping_operation(feats3, idx, approx="hilo")
    ref3 = jnp_ref.grouping_operation(feats3, idx)
    np.testing.assert_allclose(np.asarray(hilo3), np.asarray(ref3),
                               rtol=1e-5, atol=1e-6)


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


def test_ball_query_pallas_matches_reference(rng):
    B, N, M, ns = 2, 256, 64, 12
    xyz = jnp.asarray(rng.random((B, N, 3), dtype=np.float64).astype(np.float32))
    # centers drawn FROM the cloud so the d2 == 0 acceptance path triggers
    centers = xyz[:, :M, :]
    for min_r, max_r in ((0.0, 0.2), (0.05, 0.25)):
        out = pallas_kernels.ball_query(min_r, max_r, ns, xyz, centers)
        ref = jnp_ref.ball_query(min_r, max_r, ns, xyz, centers)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_grouping_split_matches_slices(rng):
    B, N, C, M, K, c1 = 2, 64, 20, 48, 6, 4
    feats = jnp.asarray(rng.random((B, N, C), dtype=np.float64).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, (B, M, K)), jnp.int32)
    o1, o2 = pallas_kernels.grouping_split(feats, idx, c1)
    ref = jnp_ref.grouping_operation(feats, idx)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(ref[..., :c1]),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(ref[..., c1:]),
                               rtol=1e-2, atol=1e-2)

    w1 = jnp.asarray(rng.random((B, M, K, c1)).astype(np.float32))
    w2 = jnp.asarray(rng.random((B, M, K, C - c1)).astype(np.float32))

    def loss_new(f):
        a, b = pallas_kernels.grouping_split(f, idx, c1)
        return jnp.sum(a * w1) + jnp.sum(b * w2)

    def loss_ref(f):
        g = jnp_ref.grouping_operation(f, idx)
        return jnp.sum(g[..., :c1] * w1) + jnp.sum(g[..., c1:] * w2)

    g_new = jax.grad(loss_new)(feats)
    g_ref = jax.grad(loss_ref)(feats)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=2e-2, atol=2e-2)


def test_sa_attention_matches_xla_block(rng):
    """Fused SA kernel (interpret mode) vs the XLA fallback formulation."""
    B, N, k = 2, 256, 8
    rel, mid, share = 4, 16, 8
    ms = mid // share
    feats = jnp.asarray(rng.random((B, N, rel + mid)).astype(np.float32)) - .5
    x1 = jnp.asarray(rng.random((B, N, rel)).astype(np.float32)) - .5
    idx = jnp.asarray(rng.integers(0, N, (B, N, k)), jnp.int32)
    W1 = jnp.asarray(rng.random(((1 + k) * rel, ms)).astype(np.float32)) - .5
    W2 = jnp.asarray(rng.random((ms, k * ms)).astype(np.float32)) - .5
    b2 = jnp.asarray(rng.random((k * ms,)).astype(np.float32)) - .5

    def xla_block(feats, x1, W1, W2, b2):
        pn = jnp_ref.grouping_operation(feats, idx)
        x2 = pn[..., :rel].reshape(B, N, k * rel)
        x3 = pn[..., rel:]
        w = jnp.maximum(jnp.concatenate([x1, x2], axis=-1), 0.0)
        u = jnp.maximum(w @ W1, 0.0)
        w = u @ W2 + b2
        w = jnp.tile(w.reshape(B, N, k, ms), (1, 1, 1, share))
        return jnp.sum(w * x3, axis=2)

    out = pallas_kernels.sa_attention(
        feats, x1, jnp.swapaxes(idx, 1, 2), W1, W2, b2, rel, mid, share)
    ref = xla_block(feats, x1, W1, W2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

    # gradients of a scalar loss w.r.t. every differentiable input
    def loss_fused(feats, x1, W1, W2, b2):
        return jnp.sum(pallas_kernels.sa_attention(
            feats, x1, jnp.swapaxes(idx, 1, 2), W1, W2, b2,
            rel, mid, share) ** 2)

    def loss_ref(feats, x1, W1, W2, b2):
        return jnp.sum(xla_block(feats, x1, W1, W2, b2) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(feats, x1, W1, W2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(feats, x1, W1, W2, b2)
    for a, b, name in zip(gf, gr, ["d_proj", "d_x1", "dW1", "dW2", "db2"]):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.maximum(np.abs(b).max(), 1.0)
        # bf16-rounded preactivations can flip relu masks right at 0 for a
        # handful of elements; require bulk agreement, not elementwise.
        close = np.abs(a - b) / scale < 2e-2
        assert close.mean() > 0.995, (name, close.mean())


def test_three_interpolate_fused_matches_reference(rng):
    B, Msrc, C, N = 2, 40, 16, 256        # N % 256 == 0 -> fused kernel
    feats = jnp.asarray(rng.random((B, Msrc, C), dtype=np.float64).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, Msrc, (B, N, 3)), jnp.int32)
    w = jnp.asarray(rng.random((B, N, 3), dtype=np.float64).astype(np.float32))

    out = pallas_kernels.three_interpolate_fused(feats, idx, w)
    ref = jnp_ref.three_interpolate(feats, idx, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

    g_new = jax.grad(
        lambda f, ww: jnp.sum(
            pallas_kernels.three_interpolate_fused(f, idx, ww) ** 2),
        argnums=(0, 1))(feats, w)
    g_ref = jax.grad(
        lambda f, ww: jnp.sum(jnp_ref.three_interpolate(f, idx, ww) ** 2),
        argnums=(0, 1))(feats, w)
    for a, b, name in zip(g_new, g_ref, ["d_features", "d_weight"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-2, atol=3e-2, err_msg=name)


def test_group_max_matches_reference(rng):
    B, N, C, M, k = 2, 64, 16, 48, 8
    feats = jnp.asarray(rng.random((B, N, C), dtype=np.float64).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, (B, M, k)), jnp.int32)
    out = pallas_kernels.group_max(feats, idx)
    ref = jnp.max(jnp_ref.grouping_operation(feats, idx), axis=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-2, atol=1e-2)

    g_new = jax.grad(lambda f: jnp.sum(pallas_kernels.group_max(f, idx) ** 2))(feats)
    g_ref = jax.grad(lambda f: jnp.sum(
        jnp.max(jnp_ref.grouping_operation(f, idx), axis=2) ** 2))(feats)
    a, b = np.asarray(g_new), np.asarray(g_ref)
    scale = np.abs(b).max()
    # bf16 rounding can flip argmax winners on near-ties (random [0,1)
    # test values collide often in bf16); bulk agreement.
    assert (np.abs(a - b) / scale < 2e-2).mean() > 0.97


def test_knn_pallas_wide_features(rng):
    """Feature-space kNN beyond C=64 (the MXU-expansion path, bf16x2 inner
    products): neighbour indices match the exact reference."""
    from mvp_benchmark_tpu.ops import pallas_kernels as pk

    q = rng.standard_normal((2, 64, 96)).astype(np.float32)
    p = rng.standard_normal((2, 128, 96)).astype(np.float32)
    _, idx = pk.knn_pallas(jnp.asarray(q), jnp.asarray(p), 4)
    _, ref = jnp_ref.knn_points(jnp.asarray(q), jnp.asarray(p), 4)
    agree = (np.asarray(idx) == np.asarray(ref)).mean()
    assert agree > 0.999, agree


def test_knn_two_level_extraction_matches_reference(rng):
    """N >= 512 exercises the two-level (slab top-R) extraction path."""
    q = rng.random((2, 256, 3), dtype=np.float64).astype(np.float32)
    p = rng.random((2, 768, 3), dtype=np.float64).astype(np.float32)
    d_p, i_p = pallas_kernels.knn_points(jnp.asarray(q), jnp.asarray(p), 16)
    d_r, i_r = jnp_ref.knn_points(jnp.asarray(q), jnp.asarray(p), 16)
    # Packed keys tie-break near-equal distances (< ~2^-(23-log2 N)
    # relative) by index, so compare neighbour SETS and sorted distances
    # (the documented kernel contract; see knn_pallas docstring).
    i_p, i_r = np.asarray(i_p), np.asarray(i_r)
    for b in range(i_p.shape[0]):
        for r in range(i_p.shape[1]):
            assert set(i_p[b, r]) == set(i_r[b, r]), (b, r)
    np.testing.assert_allclose(np.sort(np.asarray(d_p)),
                               np.sort(np.asarray(d_r)),
                               rtol=1e-5, atol=1e-6)


def test_knn_two_level_fallback_group_collision(rng):
    """Adversarial case: >R of the top-k neighbours share one slab group
    (columns g, g+G, g+2G, ... for G=256), so the fast path runs dry and
    the in-kernel RESCAN fallback must reproduce the exact sweeps."""
    N, G, k = 1280, 256, 16
    q = np.full((1, 128, 3), 0.5, np.float32)
    p = rng.random((1, N, 3), dtype=np.float64).astype(np.float32) * 10.0
    # 6 points of one group made nearest to every query.
    for j, c in enumerate(range(0, N, G)):
        p[0, c] = 0.5 + 1e-3 * (j + 1)
    d_p, i_p = pallas_kernels.knn_points(jnp.asarray(q), jnp.asarray(p), k)
    d_r, i_r = jnp_ref.knn_points(jnp.asarray(q), jnp.asarray(p), k)
    # The 6 planted points must all be found (they are the 6 nearest).
    assert set(range(0, N, G)) <= set(np.asarray(i_p[0, 0]).tolist())
    i_p, i_r = np.asarray(i_p), np.asarray(i_r)
    for r in range(i_p.shape[1]):
        assert set(i_p[0, r]) == set(i_r[0, r]), r
    np.testing.assert_allclose(np.sort(np.asarray(d_p)),
                               np.sort(np.asarray(d_r)),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("g_size,r_size", [(256, 3), (128, 4), (64, 5),
                                           (64, 6), (32, 7)])
def test_knn_g_r_variants(rng, g_size, r_size):
    """(G, R) extraction/fold variants (see _knn_kernel): every pair must
    reproduce the reference neighbour sets, both on random clouds and under
    a group-collision that exceeds the fold depth (forcing RESCAN)."""
    N, k = 512, 16
    q = rng.random((1, 128, 3), dtype=np.float64).astype(np.float32)
    p = rng.random((1, N, 3), dtype=np.float64).astype(np.float32)
    d_p, i_p = pallas_kernels.knn_pallas(
        jnp.asarray(q), jnp.asarray(p), k, g_size=g_size, r_size=r_size)
    _, i_r = jnp_ref.knn_points(jnp.asarray(q), jnp.asarray(p), k)
    i_pn, i_rn = np.asarray(i_p), np.asarray(i_r)
    for r in range(i_pn.shape[1]):
        assert set(i_pn[0, r]) == set(i_rn[0, r]), r

    # Collision: R+2 of the true top-k in ONE slab group -> fold runs dry.
    q2 = np.full((1, 128, 3), 0.5, np.float32)
    p2 = rng.random((1, N, 3), dtype=np.float64).astype(np.float32) * 10.0
    for j, c in enumerate(range(0, min(N, (r_size + 2) * g_size), g_size)):
        p2[0, c] = 0.5 + 1e-3 * (j + 1)
    d2, i2 = pallas_kernels.knn_pallas(
        jnp.asarray(q2), jnp.asarray(p2), k, g_size=g_size, r_size=r_size)
    _, i2r = jnp_ref.knn_points(jnp.asarray(q2), jnp.asarray(p2), k)
    i2n, i2rn = np.asarray(i2), np.asarray(i2r)
    for r in range(i2n.shape[1]):
        assert set(i2n[0, r]) == set(i2rn[0, r]), r


def test_fused_attention_matches_dense(rng):
    """Fused attention kernel (interpret mode) vs a dense golden that
    reproduces the kernel's arithmetic (bf16 matmul inputs / f32 softmax —
    XLA DEFAULT TPU precision), plus a looser check vs full-f32 attention."""
    BH, Nq, M, D = 3, 256, 384, 128
    q = jnp.asarray(rng.standard_normal((BH, Nq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((BH, M, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((BH, M, D)).astype(np.float32))
    scale = 1.0 / np.sqrt(D)

    def golden(q, k, v):
        s = jnp.einsum(
            "bnd,bmd->bnm", q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum(
            "bnm,bmd->bnd", p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)

    out = pallas_kernels.fused_attention(q, k, v, scale)
    ref = golden(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

    # vs full-f32 dense attention: only bf16 input rounding apart.
    s = jnp.einsum("bnd,bmd->bnm", q, k) * scale
    full = jnp.einsum("bnm,bmd->bnd", jax.nn.softmax(s, axis=-1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                               rtol=5e-2, atol=5e-2)

    # Gradient parity vs the golden's autodiff for every input.
    g = jnp.asarray(rng.standard_normal((BH, Nq, D)).astype(np.float32))

    def loss_kernel(q, k, v):
        return jnp.sum(pallas_kernels.fused_attention(q, k, v, scale) * g)

    def loss_golden(q, k, v):
        return jnp.sum(golden(q, k, v) * g)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gg = jax.grad(loss_golden, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, gg, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-2, atol=3e-2,
            err_msg=f"d{name} mismatch")


class TestEdgeMLP:
    """Fused DGCNN-chain kernel (interpret mode) vs the jnp reference."""

    def _setup(self, rng, B=2, k=4, N=32, C1=8, chs=(8, 16, 32)):
        a1 = jnp.asarray(
            np.abs(rng.standard_normal((B, k, N, C1))).astype(np.float32))
        cins = (C1,) + chs[:-1]
        Ws = tuple(jnp.asarray(
            rng.standard_normal((ci, ch)).astype(np.float32)) * 0.3
            for ci, ch in zip(cins, chs))
        gammas = tuple(jnp.asarray(
            1.0 + 0.1 * rng.standard_normal(ch).astype(np.float32))
            for ch in chs)
        betas = tuple(jnp.asarray(
            0.1 * rng.standard_normal(ch).astype(np.float32)) for ch in chs)
        return a1, Ws, gammas, betas

    def test_train_forward_parity(self, rng):
        a1, Ws, gammas, betas = self._setup(rng)
        xs_k, st_k = pallas_kernels.edge_mlp_train(a1, Ws, gammas, betas)
        xs_r, st_r = pallas_kernels.edge_mlp_reference(a1, Ws, gammas, betas)
        for a, b in zip(xs_k, xs_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-2, atol=2e-3)
        for a, b in zip(st_k, st_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-2, atol=2e-3)

    def _grads(self, a1, Ws, gammas, betas, gs):
        def loss_k(a1, Ws, gammas, betas):
            xs, _ = pallas_kernels.edge_mlp_train(a1, Ws, gammas, betas)
            return sum(jnp.sum(x * g) for x, g in zip(xs, gs))

        def loss_r(a1, Ws, gammas, betas):
            xs, _ = pallas_kernels.edge_mlp_reference(a1, Ws, gammas, betas)
            return sum(jnp.sum(x * g) for x, g in zip(xs, gs))

        gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(a1, Ws, gammas, betas)
        gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(a1, Ws, gammas, betas)
        return gk, gr

    @pytest.mark.parametrize("k", [1, 4])
    def test_train_grad_parity(self, rng, k):
        """Grad parity vs the jnp reference.

        k=1 removes max-pool routing ambiguity entirely (identity pool)
        and isolates the BN-chain backward; k=4 additionally exercises the
        routing. The kernel rounds backward cotangents to bf16 before its
        MXU matmuls while the reference's autodiff keeps them f32 (on real
        TPU hardware XLA DEFAULT precision rounds them too), so parity is
        bounded normwise plus elementwise with a scale-aware floor — the
        raw elementwise tail is cancellation on near-zero elements, not
        structure (verified unbiased against a float64 golden). Measured
        (seed 0): norm_rel <= 0.5%, q95 <= 4.8%, frac(err>0.2) = 0.
        """
        a1, Ws, gammas, betas = self._setup(rng, k=k)
        gs = [jnp.asarray(rng.standard_normal((2, 32, ch)).astype(np.float32))
              for ch in (8, 16, 32)]
        gk, gr = self._grads(a1, Ws, gammas, betas, gs)
        for tk, tr, name in zip(gk, gr, ("a1", "W", "gamma", "beta")):
            for a, b in zip(jax.tree.leaves(tk), jax.tree.leaves(tr)):
                a, b = np.asarray(a), np.asarray(b)
                nb = np.linalg.norm(b)
                assert np.linalg.norm(a - b) <= 1.5e-2 * nb + 1e-6, (
                    f"d{name} normwise")
                rms = np.sqrt(np.mean(b * b))
                err = np.abs(a - b) / (0.05 * rms + np.abs(b) + 1e-12)
                assert np.quantile(err, 0.95) < 8e-2, f"d{name} bulk"
                assert np.mean(err > 0.2) < 5e-3, f"d{name} tail"

    def test_four_layer_parity(self, rng):
        """DCP uses the chain at 4 layers (all DGCNN blocks fused); the
        kernel is layer-count generic — pin forward + stats + grads."""
        chs = (8, 8, 16, 16)
        a1, Ws, gammas, betas = self._setup(rng, chs=chs)
        xs_k, st_k = pallas_kernels.edge_mlp_train(a1, Ws, gammas, betas)
        xs_r, st_r = pallas_kernels.edge_mlp_reference(a1, Ws, gammas, betas)
        assert len(xs_k) == 4
        for a, b in zip(list(xs_k) + list(st_k), list(xs_r) + list(st_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-2, atol=2e-3)
        gs = [jnp.asarray(rng.standard_normal((2, 32, ch)).astype(np.float32))
              for ch in chs]
        gk, gr = self._grads(a1, Ws, gammas, betas, gs)
        for tk, tr, name in zip(gk, gr, ("a1", "W", "gamma", "beta")):
            for a, b in zip(jax.tree.leaves(tk), jax.tree.leaves(tr)):
                a, b = np.asarray(a), np.asarray(b)
                nb = np.linalg.norm(b)
                assert np.linalg.norm(a - b) <= 2e-2 * nb + 1e-6, (
                    f"d{name} normwise")

    def test_eval_parity(self, rng):
        a1, Ws, gammas, betas = self._setup(rng)
        means = tuple(jnp.asarray(
            0.1 * rng.standard_normal(ch).astype(np.float32))
            for ch in (8, 16, 32))
        variances = tuple(jnp.asarray(
            1.0 + 0.2 * np.abs(rng.standard_normal(ch)).astype(np.float32))
            for ch in (8, 16, 32))
        xs_k = pallas_kernels.edge_mlp_eval(a1, Ws, gammas, betas,
                                            means, variances)
        xs_r = pallas_kernels.edge_mlp_reference(
            a1, Ws, gammas, betas, means, variances, train=False)
        for a, b in zip(xs_k, xs_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-2, atol=2e-3)


class TestSimMlp:
    """Fused IDAM similarity-stack kernel vs the jnp golden (interpret
    mode off-TPU). Forward/stats should agree to f32 accumulation noise;
    gradients to bf16 backward-dot noise (the golden's autodiff upcasts
    cotangents to f32 in the transpose dots; on TPU the unfused model's
    backward dots were bf16 anyway — see pallas_kernels sim_mlp notes)."""

    def _setup(self, rng, B=2, M=37, emb=16, C=32):
        f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
        src, tgt = f(B, M, 3), f(B, M, 3)
        semb, temb = f(B, M, emb), f(B, M, emb)
        params = (f(2 * emb + 4, C) * 0.2, f(C, C) * 0.2, f(C) * 0.1,
                  f(C, C) * 0.2, f(C, 1) * 0.2, f(1) * 0.1,
                  jnp.ones(C) + f(C) * 0.05, f(C) * 0.05,
                  jnp.ones(C) + f(C) * 0.05, f(C) * 0.05)
        return src, tgt, semb, temb, params

    def test_train_parity(self, rng):
        src, tgt, semb, temb, params = self._setup(rng)
        sk, wk, (st1k, st2k) = pallas_kernels.sim_mlp_train(
            src, tgt, semb, temb, *params)
        sr, wr, (st1r, st2r) = pallas_kernels.sim_mlp_reference(
            src, tgt, semb, temb, *params, train=True)
        assert sk.shape == sr.shape and wk.shape == wr.shape
        np.testing.assert_allclose(np.asarray(sk), np.asarray(sr),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(wk), np.asarray(wr),
                                   rtol=1e-3, atol=1e-3)
        for a, b in ((st1k, st1r), (st2k, st2r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_grad_parity(self, rng):
        src, tgt, semb, temb, params = self._setup(rng, M=21)

        def loss(fn, p, se, te, **kw):
            s, w, _ = fn(src, tgt, se, te, *p, **kw)
            return jnp.sum(jnp.sin(s * 3)) + jnp.sum(jnp.cos(w))

        gk = jax.grad(lambda p, se, te: loss(
            pallas_kernels.sim_mlp_train, p, se, te),
            argnums=(0, 1, 2))(params, semb, temb)
        gr = jax.grad(lambda p, se, te: loss(
            pallas_kernels.sim_mlp_reference, p, se, te, train=True),
            argnums=(0, 1, 2))(params, semb, temb)
        names = ("Wcat", "W2", "b2", "W3", "W4", "b4",
                 "g1", "be1", "g2", "be2", "semb", "temb")
        for name, a, b in zip(names, list(gk[0]) + [gk[1], gk[2]],
                              list(gr[0]) + [gr[1], gr[2]]):
            a, b = np.asarray(a), np.asarray(b)
            nb = np.linalg.norm(b)
            assert np.linalg.norm(a - b) <= 1.5e-2 * nb + 1e-6, (
                f"d{name} normwise: {np.linalg.norm(a - b):.3e} vs "
                f"{nb:.3e}")

    def test_eval_parity(self, rng):
        src, tgt, semb, temb, params = self._setup(rng)
        C = 32
        m1 = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))
        v1 = jnp.asarray(
            1.0 + 0.2 * np.abs(rng.standard_normal(C)).astype(np.float32))
        m2 = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))
        v2 = jnp.asarray(
            1.0 + 0.2 * np.abs(rng.standard_normal(C)).astype(np.float32))
        sk, wk = pallas_kernels.sim_mlp_eval(
            src, tgt, semb, temb, *params, m1, v1, m2, v2)
        sr, wr = pallas_kernels.sim_mlp_reference(
            src, tgt, semb, temb, *params, m1, v1, m2, v2, train=False)
        np.testing.assert_allclose(np.asarray(sk), np.asarray(sr),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(wk), np.asarray(wr),
                                   rtol=1e-3, atol=1e-3)

    def test_wmax_route_ties(self, rng):
        """Duplicate target points create exact max ties: forward parity
        must survive, and sim-path gradients must still match (loss uses
        only sim, whose gradient is tie-free; the kernel routes max-pool
        cotangents to every tie while the golden's autodiff splits them —
        measure-zero semantic difference, so wmax-path grads are only
        checked for finiteness). db2's true value is cancellation-dominated
        (sum of O(1) terms over all edges), so its bound is scaled by the
        same layer's dW2 norm."""
        src, tgt, semb, temb, params = self._setup(rng, M=16)
        tgt = tgt.at[:, 8:].set(tgt[:, :8])
        temb = temb.at[:, 8:].set(temb[:, :8])

        sk, wk, _ = pallas_kernels.sim_mlp_train(
            src, tgt, semb, temb, *params)
        sr, wr, _ = pallas_kernels.sim_mlp_reference(
            src, tgt, semb, temb, *params, train=True)
        # a handful of edges land exactly on a bf16 cast boundary where the
        # paths' ~1e-7 f32 noise flips the rounding (~0.4% jumps): bound the
        # bulk tightly and the boundary-flip tail loosely.
        for a, b in ((sk, sr), (wk, wr)):
            err = np.abs(np.asarray(a) - np.asarray(b))
            assert np.quantile(err, 0.99) < 1e-3
            assert err.max() < 2e-2

        # Gradient parity under ties is not well-posed (the kernel routes
        # max-pool cotangents to every tie, the golden's autodiff splits
        # them; and cancellation-dominated sums like db2 amplify bf16
        # noise data-dependently) — tie-free grad parity is pinned by
        # test_grad_parity. Here: the wmax-path gradients must stay finite
        # and the sim-path loss gradients must stay finite and nonzero.
        gw = jax.grad(lambda p: jnp.sum(pallas_kernels.sim_mlp_train(
            src, tgt, semb, temb, *p)[1]))(params)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in gw)
        gs = jax.grad(lambda p: jnp.sum(jnp.sin(pallas_kernels.sim_mlp_train(
            src, tgt, semb, temb, *p)[0] * 3)))(params)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in gs)
        assert float(jnp.linalg.norm(gs[0])) > 0.0


class TestGnnEdge:
    """Fused IDAM Propagate body (BN -> relu -> Dense -> max_k) vs the jnp
    golden (interpret mode off-TPU)."""

    def _setup(self, rng, B=2, k=5, N=48, C=16):
        f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
        a1 = f(B, k, N, C).astype(jnp.bfloat16)
        W = f(C, C) * 0.3
        b = f(C) * 0.1
        gamma = jnp.ones(C) + f(C) * 0.05
        beta = f(C) * 0.05
        return a1, W, b, gamma, beta

    def test_train_parity(self, rng):
        a1, W, b, gamma, beta = self._setup(rng)
        xk, stk = pallas_kernels.gnn_edge_train(a1, W, b, gamma, beta)
        xr, str_ = pallas_kernels.gnn_edge_reference(a1, W, b, gamma, beta)
        np.testing.assert_allclose(np.asarray(xk), np.asarray(xr),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(stk), np.asarray(str_),
                                   rtol=1e-4, atol=1e-5)

    def test_grad_parity(self, rng):
        a1, W, b, gamma, beta = self._setup(rng)
        ct = jnp.asarray(rng.standard_normal(
            (a1.shape[0], a1.shape[2], a1.shape[3])).astype(np.float32))

        def loss(fn, a, W_, b_, g_, be_, **kw):
            x = fn(a, W_, b_, g_, be_, **kw)[0]
            return jnp.sum(jnp.sin(x) * ct)

        gk = jax.grad(lambda *a: loss(pallas_kernels.gnn_edge_train, *a),
                      argnums=(0, 1, 2, 3, 4))(a1, W, b, gamma, beta)
        gr = jax.grad(lambda *a: loss(pallas_kernels.gnn_edge_reference, *a,
                                      train=True),
                      argnums=(0, 1, 2, 3, 4))(a1, W, b, gamma, beta)
        for name, a, r in zip(("a1", "W", "b", "gamma", "beta"), gk, gr):
            a, r = np.asarray(a, np.float32), np.asarray(r, np.float32)
            nr = np.linalg.norm(r)
            assert np.linalg.norm(a - r) <= 2e-2 * nr + 1e-5, (
                f"d{name}: {np.linalg.norm(a - r):.3e} vs {nr:.3e}")

    def test_eval_parity(self, rng):
        a1, W, b, gamma, beta = self._setup(rng)
        C = a1.shape[-1]
        mean = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))
        var = jnp.asarray(
            1.0 + 0.2 * np.abs(rng.standard_normal(C)).astype(np.float32))
        xk = pallas_kernels.gnn_edge_eval(a1, W, b, gamma, beta, mean, var)
        xr = pallas_kernels.gnn_edge_reference(a1, W, b, gamma, beta,
                                               mean, var, train=False)
        np.testing.assert_allclose(np.asarray(xk), np.asarray(xr),
                                   rtol=1e-3, atol=1e-3)


class TestGnnPropagate:
    """Fully fused Propagate (edge build + chain + in-kernel d_p scatter)
    vs the jnp golden (interpret mode off-TPU)."""

    def _setup(self, rng, B=2, k=5, N=48, C=16):
        f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
        p = f(B, N, C)
        # distinct neighbours per row (like real kNN output): duplicate
        # edges create exact argmax ties, where the kernel deliberately
        # routes the max-pool cotangent to every tie while jnp.max's
        # autodiff splits it (documented gnn_edge behaviour).
        idx = jnp.asarray(np.argsort(
            rng.random((B, N, N)), axis=-1)[:, :, :k].astype(np.int32))
        W = f(C, C) * 0.3
        b = f(C) * 0.1
        gamma = jnp.ones(C) + f(C) * 0.05
        beta = f(C) * 0.05
        return p, idx, W, b, gamma, beta

    def test_train_parity(self, rng):
        p, idx, W, b, gamma, beta = self._setup(rng)
        xk, stk = pallas_kernels.gnn_propagate_train(p, idx, W, b, gamma,
                                                     beta)
        xr, str_ = pallas_kernels.gnn_propagate_reference(p, idx, W, b,
                                                          gamma, beta)
        np.testing.assert_allclose(np.asarray(xk), np.asarray(xr),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(stk), np.asarray(str_),
                                   rtol=1e-4, atol=1e-5)

    def test_matches_unfused_gnn_edge(self, rng):
        p, idx, W, b, gamma, beta = self._setup(rng)
        xk, stk = pallas_kernels.gnn_propagate_train(p, idx, W, b, gamma,
                                                     beta)
        pb = p.astype(jnp.bfloat16).astype(jnp.float32)
        a1 = jnp.swapaxes(
            (jnp_ref.grouping_operation(pb, idx) - p[:, :, None, :]).astype(
                jnp.bfloat16), 1, 2)
        xu, stu = pallas_kernels.gnn_edge_train(a1, W, b, gamma, beta)
        np.testing.assert_allclose(np.asarray(xk), np.asarray(xu),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(stk), np.asarray(stu),
                                   rtol=1e-6, atol=1e-7)

    def test_grad_parity(self, rng):
        p, idx, W, b, gamma, beta = self._setup(rng)
        ct = jnp.asarray(rng.standard_normal(
            (p.shape[0], p.shape[1], W.shape[1])).astype(np.float32))

        def loss(fn, p_, W_, b_, g_, be_, **kw):
            x = fn(p_, idx, W_, b_, g_, be_, **kw)[0]
            return jnp.sum(jnp.sin(x) * ct)

        gk = jax.grad(lambda *a: loss(pallas_kernels.gnn_propagate_train,
                                      *a),
                      argnums=(0, 1, 2, 3, 4))(p, W, b, gamma, beta)
        gr = jax.grad(lambda *a: loss(pallas_kernels.gnn_propagate_reference,
                                      *a, train=True),
                      argnums=(0, 1, 2, 3, 4))(p, W, b, gamma, beta)
        for name, a, r in zip(("p", "W", "b", "gamma", "beta"), gk, gr):
            a, r = np.asarray(a, np.float32), np.asarray(r, np.float32)
            nr = np.linalg.norm(r)
            assert np.linalg.norm(a - r) <= 2e-2 * nr + 1e-5, (
                f"d{name}: {np.linalg.norm(a - r):.3e} vs {nr:.3e}")

    def test_eval_parity(self, rng):
        p, idx, W, b, gamma, beta = self._setup(rng)
        C = p.shape[-1]
        mean = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))
        var = jnp.asarray(
            1.0 + 0.2 * np.abs(rng.standard_normal(C)).astype(np.float32))
        xk = pallas_kernels.gnn_propagate_eval(p, idx, W, b, gamma, beta,
                                               mean, var)
        xr = pallas_kernels.gnn_propagate_reference(p, idx, W, b, gamma,
                                                    beta, mean, var,
                                                    train=False)
        np.testing.assert_allclose(np.asarray(xk), np.asarray(xr),
                                   rtol=1e-3, atol=1e-3)


def test_knn_pallas_exact_dist(rng):
    """exact_dist=True emits the true fp32 squared distance at each selected
    column (the three_nn contract — CUDA three_nn returns exact dists),
    bypassing the packed key's index-bit quantization. Covers both the
    two-level fast path (N=512 -> 2 slabs) and the full-sweep path (N=256
    -> 1 slab falls back to extract_sweeps)."""
    for N in (512, 256):
        q = rng.random((2, 256, 3), dtype=np.float64).astype(np.float32)
        p = rng.random((2, N, 3), dtype=np.float64).astype(np.float32)
        sqd, idx = pallas_kernels.knn_pallas(
            jnp.asarray(q), jnp.asarray(p), 3, exact_dist=True
        )
        idx = np.asarray(idx)
        for b in range(2):
            sel = p[b][idx[b]]                       # (256, 3, 3)
            want = np.sum((q[b][:, None, :] - sel) ** 2, -1)
            np.testing.assert_allclose(np.asarray(sqd[b]), want,
                                       rtol=1e-6, atol=1e-7)


def test_three_nn_dispatch_exact(rng):
    """dispatch.three_nn must return exact sqrt distances at lane-aligned
    shapes (the in-kernel exact_dist path replaces the row-gather
    recompute)."""
    from mvp_benchmark_tpu.ops import dispatch

    t = rng.random((2, 256, 3), dtype=np.float64).astype(np.float32)
    s = rng.random((2, 512, 3), dtype=np.float64).astype(np.float32)
    dist, idx = dispatch.three_nn(jnp.asarray(t), jnp.asarray(s))
    gd, gi = jnp_ref.three_nn(jnp.asarray(t), jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(dist), np.asarray(gd),
                               rtol=1e-5, atol=1e-6)


def test_chamfer_grad_mxu_matches_xla(rng):
    """The one-hot MXU backward (the TPU path, gated off on CPU dispatch)
    must reproduce XLA's gather/scatter backward. hi+lo bf16 table split ->
    ~1e-6 relative of the fp32 formulation."""
    a, b = clouds(rng, B=2, N=256, M=128)
    d1, d2, i1, i2 = jnp_ref.chamfer_distance(a, b)
    g1 = rng.random(d1.shape).astype(np.float32)
    g2 = rng.random(d2.shape).astype(np.float32)
    a_j, b_j = jnp.asarray(a), jnp.asarray(b)
    g1_j, g2_j = jnp.asarray(g1), jnp.asarray(g2)

    da = pallas_kernels._chamfer_grad_mxu(a_j, b_j, i1, g1_j, i2, g2_j)
    db = pallas_kernels._chamfer_grad_mxu(b_j, a_j, i2, g2_j, i1, g1_j)

    b_sel = jnp.take_along_axis(b_j, i1[..., None], axis=1)
    a_sel = jnp.take_along_axis(a_j, i2[..., None], axis=1)
    diff1 = 2.0 * g1_j[..., None] * (a_j - b_sel)
    diff2 = 2.0 * g2_j[..., None] * (b_j - a_sel)
    scatter = jax.vmap(lambda acc, idx, upd: acc.at[idx].add(upd))
    want_da = diff1 + scatter(jnp.zeros_like(a_j), i2, -diff2)
    want_db = diff2 + scatter(jnp.zeros_like(b_j), i1, -diff1)
    # hi+lo bf16 split: ~1e-6 relative per term; segment sums over many-
    # member buckets accumulate to a few 1e-5 absolute worst-case.
    np.testing.assert_allclose(np.asarray(da), np.asarray(want_da),
                               rtol=1e-3, atol=5e-5)
    np.testing.assert_allclose(np.asarray(db), np.asarray(want_db),
                               rtol=1e-3, atol=5e-5)

    # exact=False (the bf16 activation policy's single-pass table): one
    # bf16 rounding of the table, ~2^-9 relative on the gradient.
    da1 = pallas_kernels._chamfer_grad_mxu(a_j, b_j, i1, g1_j, i2, g2_j,
                                           exact=False)
    # cancellation in (a - b[i1]) amplifies the per-term 2^-9: ~1e-2 abs
    # worst-case at unit-cube coordinates (the bf16 convergence study in
    # PERF.md covers the training impact).
    np.testing.assert_allclose(np.asarray(da1), np.asarray(want_da),
                               rtol=2e-2, atol=1.5e-2)

    # Hybrid backward (XLA gather + fused (N, 4) segment scatter): exact
    # fp32 formulation, must match the gather/scatter golden to fp32
    # reduction-order tolerance.
    da_h = pallas_kernels._chamfer_grad_hybrid(a_j, b_j, i1, g1_j, i2, g2_j)
    db_h = pallas_kernels._chamfer_grad_hybrid(b_j, a_j, i2, g2_j, i1, g1_j)
    np.testing.assert_allclose(np.asarray(da_h), np.asarray(want_da),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(db_h), np.asarray(want_db),
                               rtol=1e-5, atol=1e-5)


def test_fused_attention_value_width(rng):
    """fused_attention with a value width different from D (the svd_head
    correspondence path: v = lane-padded tgt) vs the dense formulation,
    values + gradients."""
    B, N, M, D, Dv = 2, 256, 128, 128, 128
    q = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, M, D)).astype(np.float32))
    v = jnp.asarray(
        np.pad(rng.standard_normal((B, M, 3)).astype(np.float32),
               ((0, 0), (0, 0), (0, Dv - 3))))
    scale = 1.0 / np.sqrt(D)

    def dense(q, k, v):
        s = jax.nn.softmax(
            jnp.einsum("bnd,bmd->bnm", q, k,
                       preferred_element_type=jnp.float32) * scale, axis=2)
        return jnp.einsum("bnm,bmc->bnc", s, v,
                          preferred_element_type=jnp.float32)

    out = pallas_kernels.fused_attention(q, k, v, scale)
    ref = dense(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

    gf = jax.grad(lambda q, k: jnp.sum(
        pallas_kernels.fused_attention(q, k, v, scale)[..., :3] ** 2),
        argnums=(0, 1))(q, k)
    gr = jax.grad(lambda q, k: jnp.sum(dense(q, k, v)[..., :3] ** 2),
                  argnums=(0, 1))(q, k)
    for a, b in zip(gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        scale_ = max(np.abs(b).max(), 1.0)
        assert (np.abs(a - b) / scale_ < 2e-2).mean() > 0.999


def test_fused_attention_wide_d_split_backward(rng):
    """D > 128 routes to the flash-style split backward (saved row stats,
    dQ over q-tiles / dK,dV over k-tiles). Values + all three gradients vs
    the dense formulation at a wide single-head shape (the svd_head
    correspondence: v = lane-padded points, D wide)."""
    B, N, M, D, Dv = 2, 256, 128, 256, 128
    q = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, M, D)).astype(np.float32))
    v = jnp.asarray(
        np.pad(rng.standard_normal((B, M, 3)).astype(np.float32),
               ((0, 0), (0, 0), (0, Dv - 3))))
    scale = 1.0 / np.sqrt(D)

    def dense(q, k, v):
        s = jax.nn.softmax(
            jnp.einsum("bnd,bmd->bnm", q, k,
                       preferred_element_type=jnp.float32) * scale, axis=2)
        return jnp.einsum("bnm,bmc->bnc", s, v,
                          preferred_element_type=jnp.float32)

    out = pallas_kernels.fused_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense(q, k, v)),
                               rtol=2e-2, atol=2e-2)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v)[..., :3] ** 2)

    gf = jax.grad(loss(lambda q, k, v: pallas_kernels.fused_attention(
        q, k, v, scale)), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(dense), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        scale_ = max(np.abs(b).max(), 1.0)
        assert (np.abs(a - b) / scale_ < 2e-2).mean() > 0.999


def test_fused_attention_bnhd_matches_bhnd(rng):
    """The projection-native (B, N, H, dk) entry must match the (BH, N, dk)
    kernel bit-for-bit (same math, head axis on the grid) — values and all
    gradients."""
    B, N, M, H, dk = 2, 256, 128, 3, 128
    q = jnp.asarray(rng.standard_normal((B, N, H, dk)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, M, H, dk)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, M, H, dk)).astype(np.float32))
    scale = 1.0 / np.sqrt(dk)

    def via_bhnd(q, k, v):
        t = lambda x: jnp.swapaxes(x, 1, 2).reshape(B * H, -1, dk)
        out = pallas_kernels.fused_attention(t(q), t(k), t(v), scale)
        return jnp.swapaxes(out.reshape(B, H, N, dk), 1, 2)

    out = pallas_kernels.fused_attention_bnhd(q, k, v, scale)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(via_bhnd(q, k, v)))

    loss = lambda fn: (lambda q, k, v: jnp.sum(fn(q, k, v) ** 2))
    ga = jax.grad(loss(lambda q, k, v: pallas_kernels.fused_attention_bnhd(
        q, k, v, scale)), argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(loss(via_bhnd), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_multi_dense_matches_separate_torch_dense(rng):
    """MultiDense must match separate TorchDense heads with the same
    kernels/biases to reduction-order rounding (XLA may tile the reduction
    differently for different output widths)."""
    import flax.linen as fnn
    from mvp_benchmark_tpu.models import layers as L

    x = jnp.asarray(rng.standard_normal((2, 64, 48)).astype(np.float32))
    md = L.MultiDense((8, 8, 32))
    vs = md.init(jax.random.PRNGKey(0), x)
    y = md.apply(vs, x)
    assert y.shape == (2, 64, 48)

    # Rebuild the three separate heads from MultiDense's own params.
    p = vs["params"]
    for i, (lo, hi) in enumerate([(0, 8), (8, 16), (16, 48)]):
        td = L.TorchDense(hi - lo)
        out = td.apply(
            {"params": {"kernel": p[f"kernel{i}"], "bias": p[f"bias{i}"]}}, x
        )
        np.testing.assert_allclose(np.asarray(y[..., lo:hi]),
                                   np.asarray(out), rtol=1e-5, atol=1e-6)


def test_em_bn_fast_matches_exact(rng):
    """_em_bn_fast (folded scale/shift) must match _em_bn's activation to
    f32 reassociation tolerance: relu(hhat*g + b) == relu(h*s + t) with
    s = g*rsqrt(var+eps), t = b - mu*s."""
    h = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32) * 3)
    st = jnp.asarray(np.stack([
        rng.standard_normal(32).astype(np.float32),
        rng.random(32).astype(np.float32) + 0.1,
    ]))
    g = jnp.asarray(rng.standard_normal((1, 32)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, 32)).astype(np.float32))

    class _Ref:
        def __init__(self, a):
            self._a = a

        def __getitem__(self, ix):
            return self._a[ix]

    hhat, a_exact = pallas_kernels._em_bn(h, _Ref(st), _Ref(g), _Ref(b))
    a_fast = pallas_kernels._em_bn_fast(h, _Ref(st), _Ref(g), _Ref(b))
    np.testing.assert_allclose(np.asarray(a_fast), np.asarray(a_exact),
                               rtol=1e-5, atol=1e-5)
    # hhat sanity: reconstructs a_exact.
    np.testing.assert_allclose(
        np.maximum(np.asarray(hhat) * np.asarray(g)[0] + np.asarray(b)[0],
                   0.0),
        np.asarray(a_exact), rtol=1e-6, atol=1e-6)
