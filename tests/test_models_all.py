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
