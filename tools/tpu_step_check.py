#!/usr/bin/env python
"""Full-size single-step TPU validation for every model.

Compiles + runs ONE jitted train step per model at the reference batch size
and 2048 points on the attached chip; reports wall time and memory viability.
Evidence for the per-model 'runs at reference scale on one chip' claim.

Usage: python tools/tpu_step_check.py [model ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mvp_benchmark_tpu.models import get_model  # noqa: E402
from mvp_benchmark_tpu.train import engine  # noqa: E402
from mvp_benchmark_tpu.train.config import Config  # noqa: E402

N = 2048

COMPLETION = {
    "pcn": Config(model_name="pcn", num_points=N, num_coarse=1024, loss="cd",
                  eval_emd=False, lr=1e-4, optimizer="Adam",
                  betas="0.9, 0.999", weight_decay=0),
    "ecg": Config(model_name="ecg", num_points=N, loss="cd", eval_emd=False,
                  lr=1e-4, optimizer="Adam", betas="0.9, 0.999",
                  weight_decay=0),
    "vrcnet": Config(model_name="vrcnet", num_points=N, loss="cd",
                     eval_emd=False, lr=1e-4, optimizer="Adam",
                     betas="0.9, 0.999", weight_decay=0, layers="1, 1, 1, 1",
                     knn_list="16", distribution_loss="KLD", pk=10,
                     local_folding=True, points_label=True,
                     num_coarse_raw=1024, num_fps=2048, num_coarse=2048),
}
REGISTRATION = {
    "dcp": Config(model_name="dcp", lr=1e-3, optimizer="Adam",
                  betas="0.9, 0.999", weight_decay=0),
    "deepgmr": Config(model_name="deepgmr", lr=1e-3, optimizer="Adam",
                      betas="0.9, 0.999", weight_decay=0, use_rri=True,
                      rri_size=20, num_groups=16, use_tnet=False),
    "idam": Config(model_name="idam", lr=1e-3, optimizer="Adam",
                   betas="0.9, 0.999", weight_decay=0, descriptor_size=64,
                   num_iters=3, use_fpfh=False),
}


def check(name: str, batch_size: int = 32, steps: int = 10) -> dict:
    """One compiled train step at reference scale; returns timing facts.

    {"name", "batch_size", "loss", "compile_s", "ms_per_step"} — the step
    time is chained-sync (one scalar pull at the end forces the sequence).
    """
    rng = np.random.default_rng(0)
    kind = "completion" if name in COMPLETION else "registration"
    cfg = (COMPLETION.get(name) or REGISTRATION.get(name))
    import os as _os
    if _os.environ.get("BENCH_DTYPE"):
        cfg = Config(**{**cfg, "compute_dtype": _os.environ["BENCH_DTYPE"]})
    engine.apply_compute_dtype(cfg)
    model = get_model(name, cfg)
    if kind == "completion":
        x = jnp.asarray(rng.random((batch_size, N, 3), np.float32))
        gt = jnp.asarray(rng.random((batch_size, N, 3), np.float32))
        args = (x, gt)
        batch = {"inputs": x, "gt": gt}
    else:
        src = jnp.asarray(rng.random((batch_size, N, 3), np.float32))
        tgt = jnp.asarray(rng.random((batch_size, N, 3), np.float32))
        T = jnp.tile(jnp.eye(4), (batch_size, 1, 1))
        args = (src, tgt, T)
        batch = {"src": src, "tgt": tgt, "transform": T}

    t0 = time.time()
    ctx = engine.create_context(cfg, model, args)
    step = engine.make_train_step(model, ctx.tx, kind)
    params, bs, opt = ctx.params, ctx.batch_stats, ctx.opt_state
    key = jax.random.PRNGKey(0)
    params, bs, opt, aux = step(params, bs, opt, batch, jnp.asarray(0.5), key)
    loss = float(jax.block_until_ready(aux["total_loss"]))
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(steps):
        key, k = jax.random.split(key)
        params, bs, opt, aux = step(params, bs, opt, batch, jnp.asarray(0.5), k)
    # Chained steps: one scalar pull at the end forces the whole sequence
    # (block_until_ready is not a true sync through the remote tunnel).
    float(aux["total_loss"])
    dt = (time.time() - t0) / steps
    return {
        "name": name,
        "batch_size": batch_size,
        "loss": loss,
        "compile_s": compile_s,
        "ms_per_step": dt * 1000,
    }


if __name__ == "__main__":
    names = sys.argv[1:] or ["pcn", "dcp", "deepgmr", "idam", "ecg", "vrcnet"]
    for name in names:
        bs = 32
        while bs >= 4:
            try:
                r = check(name, bs)
                print(
                    f"RESULT {name} bs={bs}: loss={r['loss']:.4f} "
                    f"compile={r['compile_s']:.0f}s "
                    f"step={r['ms_per_step']:.1f}ms "
                    f"clouds/s={1000 * bs / r['ms_per_step']:.0f}",
                    flush=True,
                )
                break
            except Exception as e:
                print(f"RESULT {name} bs={bs}: FAILED {str(e)[:160]}",
                      flush=True)
                bs //= 2
