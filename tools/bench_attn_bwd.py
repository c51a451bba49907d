"""A/B: monolithic vs flash-split attention backward at DCP transformer shape."""
import functools, math, sys, time

sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from mvp_benchmark_tpu.ops import pallas_kernels as pk

BH, N, D = 128, 2048, 128
scale = 1.0 / math.sqrt(D)
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((BH, N, D), np.float32))
k = jnp.asarray(rng.standard_normal((BH, N, D), np.float32))
v = jnp.asarray(rng.standard_normal((BH, N, D), np.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fa_split(q, k, v, scale):
    return pk._attn_forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    o, m, l = pk._attn_forward(q, k, v, scale, save_stats=True)
    return o, (q, k, v, o, m, l)


def _bwd(scale, res, do):
    return pk._attn_bwd_split(scale, *res, do)


fa_split.defvjp(_fwd, _bwd)


def timed(f, *a, reps=20):
    o = f(*a); jax.block_until_ready(o)
    t = time.perf_counter()
    for _ in range(reps):
        o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t) / reps * 1e3


fwd_mono = jax.jit(lambda q, k, v: pk.fused_attention(q, k, v, scale))
fwd_split = jax.jit(lambda q, k, v: fa_split(q, k, v, scale))
g_mono = jax.jit(jax.grad(lambda q, k, v: pk.fused_attention(q, k, v, scale).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
g_split = jax.jit(jax.grad(lambda q, k, v: fa_split(q, k, v, scale).astype(jnp.float32).sum(), argnums=(0, 1, 2)))

gm = g_mono(q, k, v)
gs = g_split(q, k, v)
for a, b, nme in zip(gm, gs, "qkv"):
    d = float(jnp.max(jnp.abs(a - b)))
    r = d / float(jnp.max(jnp.abs(a)))
    print(f"grad d{nme}: max abs diff {d:.3e} rel {r:.3e}", flush=True)

print(f"fwd  mono {timed(fwd_mono, q, k, v):7.2f} ms   split {timed(fwd_split, q, k, v):7.2f} ms", flush=True)
print(f"f+b  mono {timed(g_mono, q, k, v):7.2f} ms   split {timed(g_split, q, k, v):7.2f} ms", flush=True)
