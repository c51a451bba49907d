"""Reference-name compatibility aliases.

The reference exports these names from ``utils/__init__.py:1-6``; code
written against it can import them here 1:1 (channels-last tensor layout —
see each target's docstring).
"""

from mvp_benchmark_tpu.metrics.completion import calc_cd, calc_emd, fscore
from mvp_benchmark_tpu.ops import (
    ball_query,
    chamfer_distance as cd,
    emd_auction as emd,
    furthest_point_sample,
    furthest_point_sample_with_dist,
    gather_points,
    GroupAll,
    grouping_operation,
    knn_query as knn,
    PointsSampler as Points_Sampler,
    QueryAndGroup,
    three_interpolate,
    three_nn,
)
from mvp_benchmark_tpu.models.layers import BatchNorm as NaiveSyncBatchNorm1d
from mvp_benchmark_tpu.models.layers import BatchNorm as NaiveSyncBatchNorm2d
from mvp_benchmark_tpu.models.pointnet2 import (
    PointFPModule,
    PointSAModule,
    PointSAModuleMSG,
)

group_points = grouping_operation

__all__ = [
    "calc_cd", "calc_emd", "fscore",
    "cd", "emd", "ball_query", "knn",
    "furthest_point_sample", "furthest_point_sample_with_dist",
    "gather_points", "group_points", "grouping_operation",
    "GroupAll", "QueryAndGroup", "Points_Sampler",
    "three_interpolate", "three_nn",
    "NaiveSyncBatchNorm1d", "NaiveSyncBatchNorm2d",
    "PointFPModule", "PointSAModule", "PointSAModuleMSG",
]
