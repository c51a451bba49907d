#!/usr/bin/env python
"""Fine-grained fwd+bwd attribution inside IDAM's GNN Propagate layers.

Splits one reference-scale Propagate (B=32, N=2048, k=12, C=64) into:
  - knn_indices (graph build, once per GNN call)
  - edge build: one-hot gather - center + bf16 cast + transpose (fwd+bwd)
  - fused chain: gnn_edge_train fwd+bwd on a precomputed edge tensor
  - the composition (edge build + chain) as the model runs it
Chained-sync protocol like tools/tpu_step_check.py.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mvp_benchmark_tpu import ops  # noqa: E402

B, N, K, C = 32, 2048, 12, 64


def timeit(name, fn, *args):
    fn_j = jax.jit(fn)
    t0 = time.perf_counter()
    out = fn_j(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    steps = 20
    t0 = time.perf_counter()
    last = None
    for _ in range(steps):
        last = fn_j(*args)
    jax.block_until_ready(last)
    ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"{name:36s} compile={compile_s:6.1f}s  {ms:8.2f} ms")
    return ms


def main():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    p = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    idx = jax.jit(lambda x: ops.knn_indices(x, K))(pts)
    W = jnp.asarray(rng.standard_normal((C, C)).astype(np.float32)) * 0.1
    b = jnp.zeros((C,))
    gamma = jnp.ones((C,))
    beta = jnp.zeros((C,))
    a1 = jnp.swapaxes(
        (ops.grouping_operation(p, idx) - p[:, :, None, :]).astype(
            jnp.bfloat16), 1, 2)

    timeit("knn_indices (x1)", lambda x: ops.knn_indices(x, K), pts)

    def edge_build(p_):
        e = (ops.grouping_operation(p_, idx) - p_[:, :, None, :]).astype(
            jnp.bfloat16)
        return jnp.swapaxes(e, 1, 2)

    timeit("edge build fwd", edge_build, p)
    timeit("edge build fwd+bwd",
           jax.grad(lambda p_: jnp.sum(edge_build(p_).astype(jnp.float32))),
           p)

    from mvp_benchmark_tpu.ops import pallas_kernels as pk

    timeit("gnn_edge chain fwd",
           lambda a: pk.gnn_edge_train(a, W, b, gamma, beta)[0], a1)
    timeit("gnn_edge chain fwd+bwd",
           jax.grad(lambda a: jnp.sum(
               pk.gnn_edge_train(a, W, b, gamma, beta)[0])), a1)

    def full(p_):
        a = edge_build(p_)
        return jnp.sum(pk.gnn_edge_train(a, W, b, gamma, beta)[0])

    timeit("edge build + chain fwd+bwd", jax.grad(full), p)

    # 10 Propagate layers/step (5 per GNN call x src,tgt) -> scale estimate
    print("(model runs 10 such layers + 2 knn_indices per step)")


if __name__ == "__main__":
    main()
