from mvp_benchmark_tpu.metrics.completion import (calc_cd, calc_cd_multi,
                                                  calc_emd, fscore)
from mvp_benchmark_tpu.metrics.registration import (
    quat2mat,
    rotation_error,
    rotation_geodesic_error,
    rmse_loss,
    rt_to_transformation,
    transform_point_cloud,
    translation_error,
)

__all__ = [
    "calc_cd",
    "calc_cd_multi",
    "calc_emd",
    "fscore",
    "quat2mat",
    "rotation_error",
    "rotation_geodesic_error",
    "rmse_loss",
    "rt_to_transformation",
    "transform_point_cloud",
    "translation_error",
]
