"""Native (C++) host-runtime components.

``loader`` JIT-compiles the C++ data-loader core at first import (the same
pattern the reference uses for its CD/EMD CUDA extensions). Falls back to
numpy implementations when no compiler is available.
"""

from mvp_benchmark_tpu.native.loader import (
    gather_batch,
    is_available,
    se3_augment_batch,
)

__all__ = ["gather_batch", "is_available", "se3_augment_batch"]
