"""MVP-Benchmark-TPU: a TPU-native JAX framework for the MVP point-cloud benchmark.

Re-implements the capabilities of paul007pl/MVP_Benchmark (PyTorch + CUDA)
as an idiomatic JAX/XLA/Pallas stack:

- ``mvp_benchmark_tpu.ops``      — geometry op library (chamfer, EMD, FPS, kNN,
  ball query, gather/group, three_nn/interpolate) with Pallas TPU kernels and
  pure-jnp golden references (replaces the CUDA extensions under
  reference ``utils/metrics`` and ``utils/mm3d_pn2/ops``).
- ``mvp_benchmark_tpu.metrics``  — CD/EMD/F1 and rotation/translation/RMSE
  eval numerics matching the reference to 1e-4.
- ``mvp_benchmark_tpu.models``   — the six benchmark models (PCN, ECG, VRCNet;
  DCP, DeepGMR, IDAM) in flax.linen.
- ``mvp_benchmark_tpu.data``     — MVP HDF5 loaders + host-side augmentation.
- ``mvp_benchmark_tpu.parallel`` — device-mesh data parallelism (pjit/shard_map).
- ``mvp_benchmark_tpu.train``    — config, loops, meters, checkpointing,
  submission writers.
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persistent XLA compilation cache (first compiles on the TPU tunnel in
    this environment run minutes; reruns should not pay twice). Opt out with
    MVP_TPU_NO_COMP_CACHE=1."""
    import os

    if os.environ.get("MVP_TPU_NO_COMP_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "jax_comp_cache"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is best-effort; never block imports
        pass


_enable_compilation_cache()
