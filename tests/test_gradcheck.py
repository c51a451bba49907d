"""Numerical gradient checks (jax.test_util.check_grads) for the
differentiable ops — replaces the reference's hand-written CUDA backwards
with machine-checked derivatives (SURVEY.md §4 item 3)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from mvp_benchmark_tpu import ops


def _cloud(rng, *shape):
    return jnp.asarray(rng.random(shape, dtype=np.float64).astype(np.float32))


def test_chamfer_grads(rng):
    a = _cloud(rng, 1, 12, 3)
    b = _cloud(rng, 1, 15, 3)

    def f(a_, b_):
        d1, d2, _, _ = ops.chamfer_distance(a_, b_)
        return jnp.sum(d1 * 0.3) + jnp.sum(d2)

    # order=1 only: argmin switches make higher-order/large-eps checks
    # meaningless; eps small enough to stay within one assignment region.
    check_grads(f, (a, b), order=1, modes=["rev"], atol=1e-2, rtol=1e-2,
                eps=1e-3)


def test_three_interpolate_grads(rng):
    feats = _cloud(rng, 1, 8, 5)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 8, (1, 10, 3)),
                      jnp.int32)
    w = _cloud(rng, 1, 10, 3)

    def f(feats_):
        return jnp.sum(ops.three_interpolate(feats_, idx, w) ** 2)

    check_grads(f, (feats,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_gather_grads(rng):
    feats = _cloud(rng, 2, 9, 4)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 9, (2, 5)),
                      jnp.int32)

    def f(feats_):
        return jnp.sum(jnp.sin(ops.gather_points(feats_, idx)))

    check_grads(f, (feats,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_knn_points_dist_grads(rng):
    q = _cloud(rng, 1, 10, 3)
    p = _cloud(rng, 1, 14, 3)

    def f(q_, p_):
        negd, _ = ops.knn_points(q_, p_, 3)
        return jnp.sum(negd)

    check_grads(f, (q, p), order=1, modes=["rev"], atol=1e-2, rtol=1e-2,
                eps=1e-3)


def test_emd_grad_is_exact_fixed_assignment(rng):
    """EMD grad = 2(x1 - x2[assign]) holds exactly for a fixed assignment;
    finite differences agree when eps stays within the assignment region."""
    x1 = _cloud(rng, 1, 16, 3)
    x2 = _cloud(rng, 1, 16, 3)

    def f(a):
        d, _ = ops.emd_auction(a, x2, 0.05, 60)
        return jnp.sum(d)

    g = jax.grad(f)(x1)
    eps = 1e-4
    v = np.zeros_like(np.asarray(x1))
    v[0, 3, 1] = 1.0
    v = jnp.asarray(v)
    num = (f(x1 + eps * v) - f(x1 - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, v)), float(num),
                               rtol=5e-2, atol=1e-3)
