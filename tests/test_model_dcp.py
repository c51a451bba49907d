"""DCP end-to-end smoke tests: init, forward shapes, one train step reduces
the loss signal without NaNs, val path returns per-sample metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvp_benchmark_tpu.data.mvp import BatchSpec, MVPRegistrationDataset
from mvp_benchmark_tpu.models import get_model
from mvp_benchmark_tpu.train import engine
from mvp_benchmark_tpu.train.config import Config


@pytest.fixture(scope="module")
def cfg():
    return Config(
        model_name="dcp", batch_size=4, num_points=64, lr=1e-3,
        optimizer="Adam", betas="0.9, 0.999", weight_decay=0,
        max_angle=45.0, max_trans=0.5, manual_seed=1,
    )


@pytest.fixture(scope="module")
def setup(cfg):
    ds = MVPRegistrationDataset(
        "train", max_angle=45.0, max_trans=0.5, num_points=64,
        synthetic_size=8, seed=3,
    )
    batch = next(ds.batches(BatchSpec(4, shuffle=True, seed=0)))
    model = get_model("dcp", cfg)
    ctx = engine.create_context(
        cfg, model,
        (jnp.asarray(batch["src"]), jnp.asarray(batch["tgt"]),
         jnp.asarray(batch["transform"])),
    )
    return ds, batch, model, ctx


def test_forward_outputs(setup, cfg):
    _, batch, model, ctx = setup
    outs = model.apply(
        ctx.variables, jnp.asarray(batch["src"]), jnp.asarray(batch["tgt"]),
        jnp.asarray(batch["transform"]), prefix="val",
    )
    loss, r_err, t_err, rmse, mse = outs
    assert np.isfinite(float(loss))
    assert r_err.shape == (4,)
    assert np.all(np.asarray(r_err) >= 0) and np.all(np.asarray(r_err) <= 180)
    assert rmse.shape == (4,) and mse.shape == (4,)


def test_predict_transform_only(setup, cfg):
    _, batch, model, ctx = setup
    T = model.apply(
        ctx.variables, jnp.asarray(batch["src"]), jnp.asarray(batch["tgt"]),
        None, prefix="test",
    )
    T = np.asarray(T)
    assert T.shape == (4, 4, 4)
    # Rotation block must be orthonormal with det +1.
    R = T[:, :3, :3]
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (4, 1, 1)), atol=1e-4)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)
    np.testing.assert_array_equal(T[:, 3], np.tile([0, 0, 0, 1], (4, 1)))


def test_train_step_descends(setup, cfg):
    _, batch, model, ctx = setup
    step = engine.make_train_step(model, ctx.tx, "registration")
    params, bs, opt_state = ctx.params, ctx.batch_stats, ctx.opt_state
    inputs = {k: jnp.asarray(batch[k]) for k in ("src", "tgt", "transform")}
    losses = []
    rng = jax.random.PRNGKey(0)
    for i in range(5):
        rng, r = jax.random.split(rng)
        params, bs, opt_state, aux = step(
            params, bs, opt_state, inputs, jnp.asarray(1.0), r
        )
        losses.append(float(aux["total_loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
