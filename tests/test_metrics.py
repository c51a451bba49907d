"""Metric numerics tests: closed-form cases + parity with a fresh torch-cpu
implementation of the same published formulas (not reference code)."""

import math

import jax.numpy as jnp
import numpy as np

from mvp_benchmark_tpu import metrics
from tests import util_np


class TestCompletionMetrics:
    def test_calc_cd_closed_form(self):
        # Two clouds offset by d along x: every nearest distance is d^2.
        out = np.zeros((1, 4, 3), np.float32)
        gt = out + np.array([0.1, 0, 0], np.float32)
        cd_p, cd_t = metrics.calc_cd(jnp.asarray(out), jnp.asarray(gt))
        np.testing.assert_allclose(float(cd_p[0]), 0.1, rtol=1e-5)
        np.testing.assert_allclose(float(cd_t[0]), 2 * 0.01, rtol=1e-5)

    def test_calc_cd_matches_bruteforce(self, rng):
        out = rng.random((2, 32, 3)).astype(np.float32)
        gt = rng.random((2, 40, 3)).astype(np.float32)
        cd_p, cd_t, f1 = metrics.calc_cd(
            jnp.asarray(out), jnp.asarray(gt), calc_f1=True
        )
        d1, d2, _, _ = util_np.chamfer_np(gt, out)  # note (gt, output) order
        exp_p = (np.sqrt(d1).mean(1) + np.sqrt(d2).mean(1)) / 2
        exp_t = d1.mean(1) + d2.mean(1)
        p1 = (d1 < 1e-4).mean(1)
        p2 = (d2 < 1e-4).mean(1)
        with np.errstate(invalid="ignore"):
            exp_f = np.nan_to_num(2 * p1 * p2 / (p1 + p2))
        # 1e-4 parity bar (BASELINE.md): fp32 near-tie argmins may differ from
        # the float64 oracle by O(1e-4) in the sqrt-mean.
        np.testing.assert_allclose(np.asarray(cd_p), exp_p, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(cd_t), exp_t, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(f1), exp_f, rtol=1e-5, atol=1e-7)

    def test_calc_cd_multi_matches_separate_calls(self, rng):
        """The fused multi-output launch (VRCNet's 4-term loss) must equal
        per-output calc_cd, including the padded shorter prediction and
        gradients through the pad."""
        import jax

        gt = jnp.asarray(rng.random((2, 64, 3)).astype(np.float32))
        outs = [
            jnp.asarray(rng.random((2, 32, 3)).astype(np.float32)),
            jnp.asarray(rng.random((2, 64, 3)).astype(np.float32)),
            jnp.asarray(rng.random((2, 64, 3)).astype(np.float32)),
        ]
        multi = metrics.calc_cd_multi(outs, gt)
        for o, (cd_p_m, cd_t_m) in zip(outs, multi):
            cd_p, cd_t = metrics.calc_cd(o, gt)
            np.testing.assert_allclose(np.asarray(cd_p_m), np.asarray(cd_p),
                                       rtol=1e-5, atol=1e-7)
            np.testing.assert_allclose(np.asarray(cd_t_m), np.asarray(cd_t),
                                       rtol=1e-5, atol=1e-7)

        def loss_multi(os_, gt_):
            r = metrics.calc_cd_multi(list(os_), gt_)
            return sum(p.mean() + t.mean() for p, t in r)

        def loss_sep(os_, gt_):
            return sum(
                p.mean() + t.mean()
                for p, t in (metrics.calc_cd(o, gt_) for o in os_)
            )

        g_m = jax.grad(loss_multi)(tuple(outs), gt)
        g_s = jax.grad(loss_sep)(tuple(outs), gt)
        for a, b in zip(g_m, g_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_fscore_nan_guard(self):
        d = jnp.ones((1, 8)) * 10.0  # nothing under threshold
        f, p1, p2 = metrics.fscore(d, d)
        assert float(f[0]) == 0.0


class TestRegistrationMetrics:
    def test_rotation_error_closed_form(self):
        theta = 0.3
        R = np.array(
            [
                [math.cos(theta), -math.sin(theta), 0],
                [math.sin(theta), math.cos(theta), 0],
                [0, 0, 1],
            ],
            np.float32,
        )[None]
        I = np.eye(3, dtype=np.float32)[None]
        err = metrics.rotation_error(jnp.asarray(R), jnp.asarray(I))
        np.testing.assert_allclose(float(err[0]), math.degrees(theta), rtol=1e-4)
        geo = metrics.rotation_geodesic_error(jnp.asarray(R), jnp.asarray(I))
        np.testing.assert_allclose(float(geo[0]), theta, rtol=1e-4)

    def test_translation_error(self):
        t = jnp.asarray(np.array([[3.0, 4.0, 0.0]], np.float32))
        tg = jnp.zeros((1, 3))
        np.testing.assert_allclose(float(metrics.translation_error(t, tg)[0]), 5.0)

    def test_rmse_loss_identity(self, rng):
        pts = rng.random((2, 16, 3)).astype(np.float32)
        T = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        out = metrics.rmse_loss(jnp.asarray(pts), jnp.asarray(T), jnp.asarray(T))
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_quat2mat_identity(self):
        q = jnp.asarray(np.array([[0.0, 0, 0, 1.0]], np.float32))  # (x,y,z,w)
        R = metrics.quat2mat(q)
        np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-6)

    def test_rt_to_transformation(self, rng):
        R = np.eye(3, dtype=np.float32)[None]
        t = np.array([[[1.0], [2.0], [3.0]]], np.float32)
        T = metrics.rt_to_transformation(jnp.asarray(R), jnp.asarray(t))
        assert T.shape == (1, 4, 4)
        np.testing.assert_allclose(np.asarray(T[0, :3, 3]), [1, 2, 3])
        np.testing.assert_allclose(np.asarray(T[0, 3]), [0, 0, 0, 1])
