from mvp_benchmark_tpu.parallel.mesh import (
    get_mesh,
    make_mesh,
    shard_batch,
    replicate,
)

__all__ = ["get_mesh", "make_mesh", "shard_batch", "replicate"]
