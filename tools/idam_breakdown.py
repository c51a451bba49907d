#!/usr/bin/env python
"""Component-level fwd+bwd timing for IDAM on the attached chip.

Isolates the GNN embedding (x2 + significance heads) from the 3-iteration
similarity-matrix stack so optimization effort lands on the real cost
center. Chained-sync like tools/tpu_step_check.py.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

sys.path.insert(0, ".")

from mvp_benchmark_tpu.models import idam, layers  # noqa: E402

B, N = 32, 2048
M = N // 6
EMB = 64


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
    print(f"{name:28s} compile={compile_s:6.1f}s  {ms:8.1f} ms")
    return ms


class SimLoop(nn.Module):
    """The 3-iteration similarity stack lifted out of idam.Model (train
    branch, losses included) with embeddings/points as inputs. Mirrors the
    model's fused ops.sim_mlp path."""

    num_iters: int = 3

    @nn.compact
    def __call__(self, src, tgt, src_embedding, tgt_embedding,
                 match_labels):
        from mvp_benchmark_tpu import ops
        from flax import linen as fnn

        train = True
        Bb, Mm = src.shape[0], src.shape[1]
        emb = src_embedding.shape[-1]
        loss = 0.0
        for i in range(self.num_iters):
            Wcat = self.param(f"sim{i}_Wcat", layers.torch_linear_init,
                              (2 * emb + 4, 32))
            W2 = self.param(f"sim{i}_W2", layers.torch_linear_init, (32, 32))
            b2 = self.param(f"sim{i}_b2", layers.torch_bias_init(32), (32,))
            W3 = self.param(f"sim{i}_W3", layers.torch_linear_init, (32, 32))
            W4 = self.param(f"sim{i}_W4", layers.torch_linear_init, (32, 1))
            b4 = self.param(f"sim{i}_b4", layers.torch_bias_init(32), (1,))
            g1 = self.param(f"sim{i}_scale1", fnn.initializers.ones, (32,))
            be1 = self.param(f"sim{i}_bias1", fnn.initializers.zeros, (32,))
            g2 = self.param(f"sim{i}_scale2", fnn.initializers.ones, (32,))
            be2 = self.param(f"sim{i}_bias2", fnn.initializers.zeros, (32,))
            ra = [self.variable("batch_stats", f"sim{i}_{nm}", init, (32,))
                  for nm, init in (("mean1", jnp.zeros), ("var1", jnp.ones),
                                   ("mean2", jnp.zeros), ("var2", jnp.ones))]
            sim, wmax, batch_stats = ops.sim_mlp(
                src, tgt, src_embedding, tgt_embedding,
                Wcat, W2, b2, W3, W4, b4, g1, be1, g2, be2,
                ra[0].value, ra[1].value, ra[2].value, ra[3].value, train)
            if train and batch_stats is not None and (
                self.is_mutable_collection("batch_stats")
            ):
                st1, st2 = batch_stats
                for v, new in zip(ra, (st1[0], st1[1], st2[0], st2[1])):
                    v.value = 0.9 * v.value + 0.1 * new
            weights = idam.ConvBlock((32, 1))(wmax, train).squeeze(-1)

            temp = jax.nn.softmax(sim, axis=-1)
            diag = jnp.diagonal(temp, axis1=1, axis2=2)
            loss = loss + jnp.sum(-jnp.log(diag) * match_labels) / (
                jnp.sum(match_labels))
            corr_idx = jnp.argmax(sim, axis=-1)
            src_corr = idam._batch_take(tgt, corr_idx)
            weight_labels = (
                corr_idx == jnp.arange(Mm)[None, :]).astype(jnp.float32)
            weight_loss = jnp.mean(
                jnp.maximum(weights, 0.0) - weights * weight_labels
                + jnp.log1p(jnp.exp(-jnp.abs(weights))))
            loss = loss + weight_loss
            weights = jax.nn.sigmoid(weights)
            med = idam._median_lower(weights, axis=-1)
            weights = weights * (weights >= med).astype(jnp.float32)
            weights = weights / (weights.sum(-1, keepdims=True) + 1e-8)
            R, t = idam.weighted_svd(src, src_corr, weights)
            R = lax.stop_gradient(R)
            t = lax.stop_gradient(t)
            src = jnp.einsum("bij,bnj->bni", R, src,
                             precision=lax.Precision.HIGHEST) + t[:, None, :]
        return loss


def main():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    # --- GNN x2 + significance heads ------------------------------------
    gnn = idam.GNN(EMB)
    sig = idam.ConvBlock((64, 32, 1))
    vg = jax.jit(lambda: gnn.init(key, src, True))()
    emb0 = jax.jit(lambda: gnn.apply(vg, src, True,
                                     mutable=["batch_stats"]))()[0]
    vs = jax.jit(lambda: sig.init(key, emb0, True))()

    def gnn_loss(pg, ps, src, tgt):
        col = {"params": pg, **{k: v for k, v in vg.items()
                                if k != "params"}}
        a, _ = gnn.apply(col, src, True, mutable=["batch_stats"])
        b, _ = gnn.apply(col, tgt, True, mutable=["batch_stats"])
        cols = {"params": ps, **{k: v for k, v in vs.items()
                                 if k != "params"}}
        sa, _ = sig.apply(cols, a, True, mutable=["batch_stats"])
        sb, _ = sig.apply(cols, b, True, mutable=["batch_stats"])
        return jnp.sum(sa * sa) + jnp.sum(sb * sb) + jnp.sum(a) + jnp.sum(b)

    timeit("GNN x2 + sig fwd+bwd", jax.grad(gnn_loss, argnums=(0, 1)),
           vg["params"], vs["params"], src, tgt)

    # --- similarity loop (3 iters, losses, SVD) -------------------------
    srcM = src[:, :M]
    tgtM = tgt[:, :M]
    embS = jnp.asarray(rng.standard_normal((B, M, EMB)).astype(np.float32))
    embT = jnp.asarray(rng.standard_normal((B, M, EMB)).astype(np.float32))
    labels = jnp.asarray((rng.random((B, M)) < 0.3).astype(np.float32))

    loop = SimLoop()
    vl = jax.jit(lambda: loop.init(key, srcM, tgtM, embS, embT, labels))()

    def loop_loss(params, s, t, es, et, lab):
        out, _ = loop.apply(
            {"params": params, **{k: v for k, v in vl.items()
                                  if k != "params"}},
            s, t, es, et, lab, mutable=["batch_stats"])
        return out

    timeit("sim-loop x3 fwd+bwd", jax.grad(loop_loss, argnums=(0, 3, 4)),
           vl["params"], srcM, tgtM, embS, embT, labels)


if __name__ == "__main__":
    main()
