#!/usr/bin/env python
"""Component-level fwd+bwd timing for DCP on the attached chip.

Times each of DCP's three stages in isolation (DGCNN embedding x2,
Transformer pointer, svd_head+loss chain) so optimization effort lands on
the real cost center. Chained-sync like tools/tpu_step_check.py.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mvp_benchmark_tpu import metrics  # noqa: E402
from mvp_benchmark_tpu.models import dcp  # noqa: E402

B, N, D = 32, 2048, 512


def timeit(name, fn, *args):
    fn_j = jax.jit(fn)
    t0 = time.perf_counter()
    out = fn_j(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    steps = 10
    t0 = time.perf_counter()
    last = None
    for _ in range(steps):
        last = fn_j(*args)
    jax.block_until_ready(last)
    ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"{name:24s} compile={compile_s:6.1f}s  {ms:8.1f} ms")
    return ms


def main():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    emb_s = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    emb_t = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    T_gt = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))

    key = jax.random.PRNGKey(0)

    # --- DGCNN (applied twice, like the model) --------------------------
    m = dcp.DGCNN(D)
    vs = jax.jit(lambda: m.init(key, src, True))()

    def dgcnn_loss(params, src, tgt):
        a, _ = m.apply({"params": params, **{k: v for k, v in vs.items()
                                             if k != "params"}},
                       src, True, mutable=["batch_stats"])
        b, _ = m.apply({"params": params, **{k: v for k, v in vs.items()
                                             if k != "params"}},
                       tgt, True, mutable=["batch_stats"])
        return jnp.sum(a * a) + jnp.sum(b * b)

    timeit("DGCNN x2 fwd+bwd", jax.grad(dgcnn_loss), vs["params"], src, tgt)

    # --- Transformer ----------------------------------------------------
    tr = dcp.Transformer(D)
    vt = jax.jit(lambda: tr.init(key, emb_s, emb_t))()

    def tr_loss(params, a, b):
        x, y = tr.apply({"params": params}, a, b)
        return jnp.sum(x * x) + jnp.sum(y * y)

    timeit("Transformer fwd+bwd", jax.grad(tr_loss), vt["params"], emb_s,
           emb_t)

    # --- svd_head + loss chain ------------------------------------------
    def head_loss(emb_s, emb_t, src, tgt):
        R, t = dcp.svd_head(emb_s, emb_t, src, tgt)
        T_12 = metrics.rt_to_transformation(R, t[..., None])
        eye = jnp.broadcast_to(jnp.eye(4), T_gt.shape)
        mse = jnp.mean(
            (jnp.matmul(T_12, jnp.linalg.inv(T_gt),
                        precision=jax.lax.Precision.HIGHEST) - eye) ** 2)
        return mse

    timeit("svd_head+loss fwd+bwd",
           jax.grad(head_loss, argnums=(0, 1)), emb_s, emb_t, src, tgt)


if __name__ == "__main__":
    main()
