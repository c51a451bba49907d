"""Fused Pallas TPU kernels for the hot geometry ops.

Placeholder dispatch targets — replaced with real Pallas kernels further down
this build (chamfer tile kernel, VMEM-resident FPS). Until then the golden
jnp implementations run on TPU as well (XLA already fuses these reasonably).
"""

from mvp_benchmark_tpu.ops.jnp_ref import (  # noqa: F401
    chamfer_distance,
    furthest_point_sample,
)
