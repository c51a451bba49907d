"""Golden parity tests for the geometry op library vs numpy brute force.

Ports the reference's own validation strategy (utils/metrics/CD/unit_test.py:
MSE < 1e-8 vs a dense python implementation + index consistency) to every op.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvp_benchmark_tpu import ops
from tests import util_np


def make_clouds(rng, B=3, N=64, M=48):
    a = rng.random((B, N, 3), dtype=np.float64).astype(np.float32)
    b = rng.random((B, M, 3), dtype=np.float64).astype(np.float32)
    return a, b


class TestChamfer:
    def test_matches_bruteforce(self, rng):
        a, b = make_clouds(rng)
        d1, d2, i1, i2 = jax.jit(ops.chamfer_distance)(a, b)
        g1, g2, _, _ = util_np.chamfer_np(a, b)
        # The reference parity bar: MSE < 1e-8 (unit_test.py:25-33).
        assert np.mean((np.asarray(d1) - g1) ** 2) < 1e-8
        assert np.mean((np.asarray(d2) - g2) ** 2) < 1e-8
        # Index consistency: gathered distance equals the min distance.
        for k in range(a.shape[0]):
            sel = b[k][np.asarray(i1[k])]
            got = np.sum((a[k] - sel) ** 2, -1)
            np.testing.assert_allclose(got, g1[k], rtol=1e-5, atol=1e-7)
            sel = a[k][np.asarray(i2[k])]
            got = np.sum((b[k] - sel) ** 2, -1)
            np.testing.assert_allclose(got, g2[k], rtol=1e-5, atol=1e-7)

    def test_gradients_match_formula(self, rng):
        """CUDA backward: d dist1_i / d a_i = 2 (a_i - b_argmin)."""
        a, b = make_clouds(rng, B=2, N=16, M=20)

        def loss(a_, b_):
            d1, d2, _, _ = ops.chamfer_distance(a_, b_)
            return jnp.sum(d1) + jnp.sum(d2)

        ga, gb = jax.grad(loss, argnums=(0, 1))(a, b)
        _, _, i1, i2 = ops.chamfer_distance(a, b)
        i1, i2 = np.asarray(i1), np.asarray(i2)
        exp_ga = np.zeros_like(a)
        exp_gb = np.zeros_like(b)
        for k in range(a.shape[0]):
            diff1 = a[k] - b[k][i1[k]]
            exp_ga[k] += 2 * diff1
            np.add.at(exp_gb[k], i1[k], -2 * diff1)
            diff2 = b[k] - a[k][i2[k]]
            exp_gb[k] += 2 * diff2
            np.add.at(exp_ga[k], i2[k], -2 * diff2)
        np.testing.assert_allclose(np.asarray(ga), exp_ga, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gb), exp_gb, rtol=1e-4, atol=1e-5)

    def test_identical_clouds_zero(self, rng):
        a, _ = make_clouds(rng)
        d1, d2, i1, i2 = ops.chamfer_distance(a, a)
        assert float(jnp.max(d1)) == 0.0
        assert float(jnp.max(d2)) == 0.0


class TestFPS:
    def test_matches_bruteforce(self, rng):
        a, _ = make_clouds(rng, B=4, N=100)
        idx = jax.jit(lambda x: ops.furthest_point_sample(x, 16))(a)
        gold = util_np.fps_np(a, 16)
        np.testing.assert_array_equal(np.asarray(idx), gold)

    def test_first_index_is_zero(self, rng):
        a, _ = make_clouds(rng)
        idx = ops.furthest_point_sample(a, 8)
        assert np.all(np.asarray(idx)[:, 0] == 0)

    def test_with_dist_variant(self, rng):
        a, _ = make_clouds(rng, B=2, N=50)
        D = np.stack([util_np.pairwise_sqdist(a[k], a[k]) for k in range(2)])
        idx = ops.furthest_point_sample_with_dist(
            jnp.asarray(D, jnp.float32), 12
        )
        gold = util_np.fps_np(a, 12)
        np.testing.assert_array_equal(np.asarray(idx), gold)


class TestBallQuery:
    @pytest.mark.parametrize("min_r,max_r", [(0.0, 0.2), (0.1, 0.25)])
    def test_matches_bruteforce(self, rng, min_r, max_r):
        a, b = make_clouds(rng, B=2, N=80, M=20)
        idx = jax.jit(
            lambda x, c: ops.ball_query(min_r, max_r, 8, x, c)
        )(a, b)
        gold = util_np.ball_query_np(min_r, max_r, 8, a, b)
        np.testing.assert_array_equal(np.asarray(idx), gold)

    def test_self_query_includes_self(self, rng):
        a, _ = make_clouds(rng, B=2, N=30)
        idx = ops.ball_query(0.0, 1e-6, 4, a, a)
        # Each point is at distance 0 of itself -> the row must contain itself.
        iota = np.arange(30)[None, :, None]
        assert np.all(np.any(np.asarray(idx) == iota, axis=-1))


class TestKNN:
    def test_knn_points(self, rng):
        a, b = make_clouds(rng, B=2, N=60, M=25)
        negd, idx = ops.knn_points(b, a, 5)  # query=b in database=a
        gold_d, gold_i = util_np.knn_np(b, a, 5)
        np.testing.assert_allclose(-np.asarray(negd), gold_d, rtol=1e-4, atol=1e-6)
        # indices may differ under fp32 near-ties; check gathered distances
        gat = np.take_along_axis(
            np.stack([util_np.pairwise_sqdist(b[k], a[k]) for k in range(2)]),
            np.asarray(idx, np.int64), axis=2)
        np.testing.assert_allclose(gat, gold_d, rtol=1e-4, atol=1e-6)

    def test_knn_indices_self_first(self, rng):
        a, _ = make_clouds(rng, B=2, N=40)
        idx = ops.knn_indices(a, 4)
        assert np.all(np.asarray(idx)[:, :, 0] == np.arange(40)[None, :])

    def test_knn_query_layout(self, rng):
        a, b = make_clouds(rng, B=2, N=60, M=25)
        idx = ops.knn_query(5, a, b)
        assert idx.shape == (2, 5, 25)

    def test_three_nn(self, rng):
        a, b = make_clouds(rng, B=2, N=30, M=40)
        dist, idx = ops.three_nn(a, b)
        gold_d, gold_i = util_np.knn_np(a, b, 3)
        np.testing.assert_allclose(
            np.asarray(dist), np.sqrt(gold_d), rtol=1e-4, atol=1e-6
        )


class TestGatherGroupInterpolate:
    def test_gather_points(self, rng):
        feats = rng.random((2, 10, 7), dtype=np.float64).astype(np.float32)
        idx = rng.integers(0, 10, (2, 4)).astype(np.int32)
        out = ops.gather_points(feats, idx)
        for b in range(2):
            np.testing.assert_array_equal(np.asarray(out[b]), feats[b][idx[b]])

    def test_grouping_operation(self, rng):
        feats = rng.random((2, 10, 7), dtype=np.float64).astype(np.float32)
        idx = rng.integers(0, 10, (2, 4, 3)).astype(np.int32)
        out = ops.grouping_operation(feats, idx)
        assert out.shape == (2, 4, 3, 7)
        for b in range(2):
            np.testing.assert_array_equal(np.asarray(out[b]), feats[b][idx[b]])

    def test_gather_backward_is_scatter_add(self, rng):
        feats = rng.random((1, 6, 2), dtype=np.float64).astype(np.float32)
        idx = np.array([[0, 0, 3]], np.int32)

        g = jax.grad(lambda f: jnp.sum(ops.gather_points(f, idx)))(feats)
        exp = np.zeros_like(feats)
        np.add.at(exp[0], idx[0], 1.0)
        np.testing.assert_allclose(np.asarray(g), exp)

    def test_three_interpolate(self, rng):
        feats = rng.random((2, 8, 5), dtype=np.float64).astype(np.float32)
        idx = rng.integers(0, 8, (2, 12, 3)).astype(np.int32)
        w = rng.random((2, 12, 3)).astype(np.float32)
        w = w / w.sum(-1, keepdims=True)
        out = ops.three_interpolate(feats, idx, w)
        for b in range(2):
            exp = (feats[b][idx[b]] * w[b][..., None]).sum(1)
            np.testing.assert_allclose(np.asarray(out[b]), exp, rtol=1e-5, atol=1e-6)

    def test_three_nn_upsampling_weights_sum_to_one(self, rng):
        a, b = make_clouds(rng, B=2, N=30, M=20)
        idx, w = ops.three_nn_upsampling(a, b)
        np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-5)


class TestGrouping:
    def test_query_and_group_ball(self, rng):
        xyz, centers = make_clouds(rng, B=2, N=64, M=8)
        feats = rng.random((2, 64, 6), dtype=np.float64).astype(np.float32)
        qg = ops.QueryAndGroup(max_radius=0.3, sample_num=16)
        out = qg(xyz, centers, feats)
        assert out.shape == (2, 8, 16, 9)  # 3 relative xyz + 6 features

    def test_query_and_group_knn(self, rng):
        xyz, centers = make_clouds(rng, B=2, N=64, M=8)
        qg = ops.QueryAndGroup(max_radius=None, sample_num=4)
        out = qg(xyz, centers)
        assert out.shape == (2, 8, 4, 3)

    def test_group_all(self, rng):
        xyz, _ = make_clouds(rng, B=2, N=64)
        feats = rng.random((2, 64, 5), dtype=np.float64).astype(np.float32)
        out = ops.GroupAll()(xyz, None, feats)
        assert out.shape == (2, 1, 64, 8)

    def test_points_sampler_modes(self, rng):
        xyz, _ = make_clouds(rng, B=2, N=64)
        feats = rng.random((2, 64, 4), dtype=np.float64).astype(np.float32)
        for mods, expected in [(["D-FPS"], 16), (["F-FPS"], 16), (["FS"], 32)]:
            sampler = ops.PointsSampler([16], mods, [-1])
            idx = sampler(xyz, feats)
            assert idx.shape == (2, expected)


class TestEdgePreserveSamplingReuse:
    def test_knn_idx_reuse_is_exact(self, rng):
        """edge_preserve_sampling(knn_idx=self-kNN) must be bit-identical to
        the recomputed path: sampled centers are a subset of the points, so
        their pk-NN rows ARE rows of the self-kNN table (ascending order,
        same kernel tie-breaking). Covers both the packed (N%128==0) and
        argmin-sweep kernel paths."""
        from mvp_benchmark_tpu.models import common

        for N in (128, 96):  # packed path / unaligned fallback path
            pts = rng.random((2, N, 3), dtype=np.float64).astype(np.float32)
            feats = rng.random((2, N, 6), dtype=np.float64).astype(np.float32)
            idx_full = ops.knn_indices(jnp.asarray(pts), 12)
            net_a, pi_a, pn_a, sp_a = common.edge_preserve_sampling(
                jnp.asarray(feats), jnp.asarray(pts), N // 2, 8
            )
            net_b, pi_b, pn_b, sp_b = common.edge_preserve_sampling(
                jnp.asarray(feats), jnp.asarray(pts), N // 2, 8,
                knn_idx=idx_full,
            )
            assert np.array_equal(np.asarray(pn_a), np.asarray(pn_b))
            assert np.array_equal(np.asarray(net_a), np.asarray(net_b))
            assert np.array_equal(np.asarray(pi_a), np.asarray(pi_b))
            assert np.array_equal(np.asarray(sp_a), np.asarray(sp_b))

    def test_narrow_knn_idx_falls_back(self, rng):
        """A knn_idx narrower than pk cannot be sliced — the full kNN runs."""
        from mvp_benchmark_tpu.models import common

        pts = rng.random((2, 128, 3), dtype=np.float64).astype(np.float32)
        feats = rng.random((2, 128, 6), dtype=np.float64).astype(np.float32)
        idx_narrow = ops.knn_indices(jnp.asarray(pts), 4)
        net_a, _, pn_a, _ = common.edge_preserve_sampling(
            jnp.asarray(feats), jnp.asarray(pts), 64, 8
        )
        net_b, _, pn_b, _ = common.edge_preserve_sampling(
            jnp.asarray(feats), jnp.asarray(pts), 64, 8, knn_idx=idx_narrow
        )
        assert np.array_equal(np.asarray(pn_a), np.asarray(pn_b))
        assert np.array_equal(np.asarray(net_a), np.asarray(net_b))
