#!/usr/bin/env python
"""Microbench: chamfer fwd+bwd variants at VRCNet train scale.

Times (a) 4 separate chamfer losses vs (b) one batched calc_cd_multi call,
and (c) the XLA gather+scatter backward vs (d) the Pallas masked-reduce
backward, on the attached chip. Chained-sync protocol (one scalar pull).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mvp_benchmark_tpu.ops import pallas_kernels as pk  # noqa: E402
from mvp_benchmark_tpu.metrics import calc_cd, calc_cd_multi  # noqa: E402

B, N = 64, 2048
REPS = 20


def timeit(fn, *args):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.random((B, N, 3), np.float32))
    outs = [jnp.asarray(rng.random((B, n, 3), np.float32))
            for n in (1024, 2048, 2048, 2048)]

    def sep_loss(outs_, gt_):
        tot = 0.0
        for o in outs_:
            p, t = calc_cd(o, gt_)
            tot = tot + p.mean() + t.mean()
        return tot

    def multi_loss(outs_, gt_):
        r = calc_cd_multi(list(outs_), gt_)
        return sum(p.mean() + t.mean() for p, t in r)

    g_sep = jax.jit(jax.grad(sep_loss))
    g_multi = jax.jit(jax.grad(multi_loss))
    # Throwaway: the FIRST timed window of a process absorbs a transient
    # (PERF.md round-5 "per-process first-window artifact") — burn it.
    timeit(g_sep, tuple(outs), gt)
    print(f"f+b  separate : {timeit(g_sep, tuple(outs), gt):7.2f} ms", flush=True)
    print(f"f+b  batched  : {timeit(g_multi, tuple(outs), gt):7.2f} ms", flush=True)

    # Backward-only comparison at one (B, N) x (B, M) pair.
    a = jnp.asarray(rng.random((B, N, 3), np.float32))
    b = jnp.asarray(rng.random((B, N, 3), np.float32))
    d1, d2, i1, i2 = jax.jit(pk.chamfer_distance)(a, b)
    g1 = jnp.asarray(rng.random(d1.shape, np.float32))
    g2 = jnp.asarray(rng.random(d2.shape, np.float32))

    def bwd_xla(a_, b_, i1_, g1_, i2_, g2_):
        b_sel = jnp.take_along_axis(b_, i1_[..., None], axis=1)
        a_sel = jnp.take_along_axis(a_, i2_[..., None], axis=1)
        diff1 = 2.0 * g1_[..., None] * (a_ - b_sel)
        diff2 = 2.0 * g2_[..., None] * (b_ - a_sel)
        scatter = jax.vmap(lambda acc, idx, upd: acc.at[idx].add(upd))
        da = diff1 + scatter(jnp.zeros_like(a_), i2_, -diff2)
        db = diff2 + scatter(jnp.zeros_like(b_), i1_, -diff1)
        return da, db

    def bwd_pallas(a_, b_, i1_, g1_, i2_, g2_):
        da = pk._chamfer_bwd_dir(a_, b_, i1_, g1_, i2_, g2_)
        db = pk._chamfer_bwd_dir(b_, a_, i2_, g2_, i1_, g1_)
        return da, db

    print(f"bwd  xla      : "
          f"{timeit(jax.jit(bwd_xla), a, b, i1, g1, i2, g2):7.2f} ms", flush=True)
    print(f"bwd  pallas   : "
          f"{timeit(jax.jit(bwd_pallas), a, b, i1, g1, i2, g2):7.2f} ms", flush=True)

    # MXU one-hot backward (the production path), one direction (the
    # gt-side gradient is DCE'd in the train loss): exact hi+lo split vs
    # the bf16 policy's single-pass table.
    for exact in (True, False):
        f = jax.jit(functools.partial(pk._chamfer_grad_mxu, exact=exact))
        ms = timeit(f, a, b, i1, g1, i2, g2)
        print(f"bwd  mxu 1-dir exact={str(exact):5}: {ms:7.2f} ms",
              flush=True)

    # Hybrid backward (XLA row-gather + one (N, 4) segment scatter-add),
    # one direction — candidate replacement for the MXU one-hot path.
    f = jax.jit(pk._chamfer_grad_hybrid)
    print(f"bwd  hybrid 1-dir         : "
          f"{timeit(f, a, b, i1, g1, i2, g2):7.2f} ms", flush=True)

    # f+b at the train loss under each backward (4 losses, grad wrt
    # preds only — the production configuration).
    for exact in (True, False):
        pk.CHAMFER_MXU_EXACT = exact
        g = jax.jit(jax.grad(sep_loss))
        ms = timeit(g, tuple(outs), gt)
        print(f"f+b  separate (mxu exact={str(exact):5}): {ms:7.2f} ms",
              flush=True)
    pk.CHAMFER_MXU_EXACT = True
    pk.CHAMFER_BWD_HYBRID = True
    g = jax.jit(jax.grad(sep_loss))
    print(f"f+b  separate (hybrid bwd): {timeit(g, tuple(outs), gt):7.2f} ms",
          flush=True)
    pk.CHAMFER_BWD_HYBRID = False


if __name__ == "__main__":
    main()
