"""Smoke tests for all six models at tiny sizes: one train step (finite loss,
grads applied), one val step (metric shapes), one test/predict step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvp_benchmark_tpu.models import get_model
from mvp_benchmark_tpu.train import engine
from mvp_benchmark_tpu.train.config import Config

B, N = 2, 96


def _clouds(seed, n=N, b=B):
    rng = np.random.default_rng(seed)
    return rng.random((b, n, 3), dtype=np.float64).astype(np.float32)


COMPLETION_CFGS = {
    "pcn": Config(model_name="pcn", num_points=N, loss="cd", eval_emd=False,
                  lr=1e-4, optimizer="Adam", betas="0.9, 0.999",
                  weight_decay=0, num_coarse=N // 2),
    "ecg": Config(model_name="ecg", num_points=N, loss="cd", eval_emd=False,
                  lr=1e-4, optimizer="Adam", betas="0.9, 0.999",
                  weight_decay=0),
    "vrcnet": Config(model_name="vrcnet", num_points=N, loss="cd",
                     eval_emd=False, lr=1e-4, optimizer="Adam",
                     betas="0.9, 0.999", weight_decay=0,
                     layers="1, 1, 1, 1", knn_list="8",
                     distribution_loss="KLD", pk=10, local_folding=True,
                     points_label=True, num_coarse_raw=N // 2, num_fps=N,
                     num_coarse=N // 2),
}

REGISTRATION_CFGS = {
    "dcp": Config(model_name="dcp", lr=1e-3, optimizer="Adam",
                  betas="0.9, 0.999", weight_decay=0),
    "deepgmr": Config(model_name="deepgmr", lr=1e-3, optimizer="Adam",
                      betas="0.9, 0.999", weight_decay=0, use_rri=True,
                      rri_size=5, num_groups=8, use_tnet=False),
    "idam": Config(model_name="idam", lr=1e-3, optimizer="Adam",
                   betas="0.9, 0.999", weight_decay=0, descriptor_size=32,
                   num_iters=2, use_fpfh=False),
}


def _pcn_model_for(name, cfg):
    # cfg.num_coarse keeps num_coarse | num_points for the folding grid
    return get_model(name, cfg)


@pytest.mark.parametrize("name", list(COMPLETION_CFGS))
def test_completion_model_smoke(name):
    cfg = COMPLETION_CFGS[name]
    model = _pcn_model_for(name, cfg)
    x, gt = jnp.asarray(_clouds(1)), jnp.asarray(_clouds(2))

    ctx = engine.create_context(cfg, model, (x, gt))
    step = engine.make_train_step(model, ctx.tx, "completion")
    params, bs, opt = ctx.params, ctx.batch_stats, ctx.opt_state
    batch = {"inputs": x, "gt": gt}
    losses = []
    rng = jax.random.PRNGKey(0)
    for _ in range(3):
        rng, r = jax.random.split(rng)
        params, bs, opt, aux = step(params, bs, opt, batch,
                                    jnp.asarray(0.5), r)
        losses.append(float(aux["total_loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses

    # val path
    out = model.apply(
        {"params": params, **({"batch_stats": bs} if bs else {})},
        x, gt, prefix="val",
        rngs={"dropout": rng, "sample": rng},
    )
    assert out["cd_p"].shape == (B,)
    assert out["cd_t"].shape == (B,)
    assert out["f1"].shape == (B,)
    assert out["out2"].shape == (B, N, 3)

    # test path
    out = model.apply(
        {"params": params, **({"batch_stats": bs} if bs else {})},
        x, None, prefix="test",
        rngs={"dropout": rng, "sample": rng},
    )
    assert out["result"].shape == (B, N, 3)


@pytest.mark.parametrize("name", list(REGISTRATION_CFGS))
def test_registration_model_smoke(name):
    cfg = REGISTRATION_CFGS[name]
    model = get_model(name, cfg)
    src, tgt = jnp.asarray(_clouds(3)), jnp.asarray(_clouds(4))
    T_gt = jnp.tile(jnp.eye(4), (B, 1, 1))

    ctx = engine.create_context(cfg, model, (src, tgt, T_gt))
    step = engine.make_train_step(model, ctx.tx, "registration")
    params, bs, opt = ctx.params, ctx.batch_stats, ctx.opt_state
    batch = {"src": src, "tgt": tgt, "transform": T_gt}
    losses = []
    rng = jax.random.PRNGKey(0)
    for _ in range(3):
        rng, r = jax.random.split(rng)
        params, bs, opt, aux = step(params, bs, opt, batch,
                                    jnp.asarray(1.0), r)
        losses.append(float(aux["total_loss"]))
    assert all(np.isfinite(losses)), losses

    # predict path returns valid rigid transform
    variables = {"params": params}
    if bs:
        variables["batch_stats"] = bs
    T = model.apply(variables, src, tgt, None, prefix="test",
                    rngs={"dropout": rng, "sample": rng})
    T = np.asarray(T)
    assert T.shape == (B, 4, 4)
    R = T[:, :3, :3]
    np.testing.assert_allclose(
        np.einsum("bij,bkj->bik", R, R), np.tile(np.eye(3), (B, 1, 1)),
        atol=1e-4,
    )
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)


def test_vrcnet_mmd_distribution_loss():
    """MMD branch (reference vrcnet.py:495-501) trains with finite loss."""
    cfg = Config(**{**COMPLETION_CFGS["vrcnet"], "distribution_loss": "MMD"})
    model = get_model("vrcnet", cfg)
    x, gt = jnp.asarray(_clouds(3)), jnp.asarray(_clouds(4))
    ctx = engine.create_context(cfg, model, (x, gt))
    step = engine.make_train_step(model, ctx.tx, "completion")
    params, bs, opt = ctx.params, ctx.batch_stats, ctx.opt_state
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(2):
        rng, r = jax.random.split(rng)
        params, bs, opt, aux = step(params, bs, opt, {"inputs": x, "gt": gt},
                                    jnp.asarray(0.5), r)
        losses.append(float(aux["total_loss"]))
    assert all(np.isfinite(losses)), losses


def test_vrcnet_mmd_loss_properties():
    """mmd_loss(x, x) == 0 and mmd_loss(x, y) > 0 for separated batches."""
    from mvp_benchmark_tpu.models.vrcnet import mmd_loss

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32) + 5.0)
    assert abs(float(mmd_loss(x, x))) < 1e-6
    assert float(mmd_loss(x, y)) > 0.1


def test_fpfh_descriptor_properties():
    """FPFH: shape (B,N,33), finite, non-negative; a planar patch's normals
    align with the plane normal; descriptors are translation invariant."""
    from mvp_benchmark_tpu.models import fpfh

    rng = np.random.default_rng(0)
    B, N = 2, 64
    pts = rng.random((B, N, 3)).astype(np.float32) * 0.5
    pts[..., 2] = 0.0                      # z=0 plane
    normals = fpfh.estimate_normals(jnp.asarray(pts), radius=0.3, max_nn=16)
    nz = np.abs(np.asarray(normals)[..., 2])
    assert (nz > 0.99).mean() > 0.9, "plane normals should be ~z"

    feats = fpfh.fpfh_features(jnp.asarray(pts))
    f = np.asarray(feats)
    assert f.shape == (B, N, 33)
    assert np.isfinite(f).all() and (f >= -1e-5).all()

    # Translation invariance holds up to histogram bin-edge flips (floating
    # point jitter moves borderline pair angles across bin boundaries):
    # require bulk agreement, not elementwise equality.
    shifted = np.asarray(
        fpfh.fpfh_features(jnp.asarray(pts + np.float32([1., 2., 3.])))
    )
    bulk_close = np.abs(shifted - f) < 5.0      # bins live on a 0..100 scale
    assert bulk_close.mean() > 0.95, bulk_close.mean()


def test_idam_fpfh_branch_trains():
    """use_fpfh config key builds and runs (reference idam.py:196)."""
    cfg = Config(model_name="idam", lr=1e-3, optimizer="Adam",
                 betas="0.9, 0.999", weight_decay=0, descriptor_size=32,
                 num_iters=2, use_fpfh=True)
    model = get_model("idam", cfg)
    rng = np.random.default_rng(5)
    src = jnp.asarray(rng.random((B, N, 3), dtype=np.float64).astype(np.float32))
    tgt = src + 0.01
    T = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    ctx = engine.create_context(cfg, model, (src, tgt, T))
    step = engine.make_train_step(model, ctx.tx, "registration")
    params, bs, opt = ctx.params, ctx.batch_stats, ctx.opt_state
    params, bs, opt, aux = step(
        params, bs, opt, {"src": src, "tgt": tgt, "transform": T},
        jnp.asarray(1.0), jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(aux["total_loss"]))


def test_pcn_bf16_mode_parity():
    """bf16 activation mode (fp32 params + coordinate heads): loss curve
    tracks the fp32 run closely over a few steps."""
    from mvp_benchmark_tpu.models import layers as L

    def train_losses(dtype):
        L.set_compute_dtype(dtype)
        try:
            cfg = COMPLETION_CFGS["pcn"]
            model = get_model("pcn", cfg)
            x, gt = jnp.asarray(_clouds(1)), jnp.asarray(_clouds(2))
            ctx = engine.create_context(cfg, model, (x, gt))
            step = engine.make_train_step(model, ctx.tx, "completion")
            params, bs, opt = ctx.params, ctx.batch_stats, ctx.opt_state
            rng = jax.random.PRNGKey(0)
            out = []
            for _ in range(4):
                rng, r = jax.random.split(rng)
                params, bs, opt, aux = step(
                    params, bs, opt, {"inputs": x, "gt": gt},
                    jnp.asarray(0.5), r)
                out.append(float(aux["total_loss"]))
            return np.asarray(out)
        finally:
            L.set_compute_dtype(jnp.float32)

    f32 = train_losses(jnp.float32)
    b16 = train_losses(jnp.bfloat16)
    assert np.isfinite(b16).all()
    # Same trajectory within bf16 resolution-driven drift.
    np.testing.assert_allclose(b16, f32, rtol=0.05)


def test_rri_phi_diamond_key_matches_full_atan2():
    """The diamond-key top-2 selection in get_rri_features must reproduce
    the full-plane formulation (atan2+mod over all (k, k) pairs, then
    lax.top_k) that mirrors the reference's np.argpartition(psi, 1)[..., 1]
    (registration/model_utils.py:76-127)."""
    from jax import lax

    from mvp_benchmark_tpu import ops
    from mvp_benchmark_tpu.models import deepgmr

    rng = np.random.default_rng(3)
    k = 6
    # Random cloud + a structured (grid-surface) cloud: near-ties in psi.
    grid = np.stack(np.meshgrid(np.linspace(0.1, 1, 16),
                                np.linspace(0.1, 1, 16)), -1).reshape(-1, 2)
    surf = np.concatenate(
        [grid, (0.3 + 0.1 * np.sin(8 * grid[:, :1]))], axis=-1)
    for pts_np in (
        rng.random((2, 128, 3)).astype(np.float32),
        np.tile(surf[None].astype(np.float32), (2, 1, 1)),
    ):
        pts = jnp.asarray(pts_np)
        feat_new = deepgmr.get_rri_features(pts, k)
        B, S = pts.shape[:2]
        phi_new = feat_new.reshape(B, S, k, 4)[..., 3]

        # Full-plane golden (the pre-round-5 formulation).
        idx = ops.knn_indices(pts, k + 1)[..., 1:]
        q = ops.grouping_operation(pts, idx)
        p = jnp.broadcast_to(pts[:, :, None, :], q.shape)
        pn = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
        dot = jnp.sum(pn * (q / jnp.linalg.norm(q, axis=-1, keepdims=True)),
                      axis=-1, keepdims=True)
        T_q = q - dot * p
        cross = jnp.cross(T_q[:, :, None, :, :], T_q[:, :, :, None, :])
        sin_psi = jnp.sum(cross * pn[:, :, None, :, :], axis=-1)
        cos_psi = jnp.sum(
            T_q[:, :, None, :, :] * T_q[:, :, :, None, :], axis=-1)
        psi = jnp.mod(jnp.arctan2(sin_psi, cos_psi), 2.0 * jnp.pi)
        neg2, _ = lax.top_k(-psi, 2)
        phi_ref = -neg2[..., 1]

        np.testing.assert_allclose(
            np.asarray(phi_new), np.asarray(phi_ref), rtol=1e-5, atol=1e-5)


def test_diamond_key_monotone_in_angle():
    """_diamond_key must order exactly like atan2(s, c) mod 2pi: dense
    angle sweep incl. exact axis points, negative zeros, and (0, 0)."""
    from mvp_benchmark_tpu.models.deepgmr import _diamond_key

    ang = np.concatenate([
        np.linspace(0.0, 2 * np.pi, 4097, endpoint=False),
        [0.0, np.pi / 2, np.pi, 3 * np.pi / 2],
    ])
    s = np.sin(ang).astype(np.float32)
    c = np.cos(ang).astype(np.float32)
    # exact axis signs (sin(pi) is 1e-7, not 0 — set them exactly)
    s[-4:] = [0.0, 1.0, 0.0, -1.0]
    c[-4:] = [1.0, 0.0, -1.0, 0.0]
    psi = np.mod(np.arctan2(s, c), 2 * np.pi)
    key = np.asarray(_diamond_key(jnp.asarray(s), jnp.asarray(c)))
    # Strict co-monotonicity: sorting by key == sorting by psi.
    np.testing.assert_array_equal(np.argsort(key, kind="stable"),
                                  np.argsort(psi, kind="stable"))
    # Degenerate/edge inputs map like atan2: (0,0)->0, (-0,c)->0.
    edge_s = jnp.asarray([0.0, -0.0, 0.0], jnp.float32)
    edge_c = jnp.asarray([0.0, 1.0, 1.0], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(_diamond_key(edge_s, edge_c)), [0.0, 0.0, 0.0])
