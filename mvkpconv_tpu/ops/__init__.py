"""Device ops: TPU-native equivalents of the reference's CUDA/C++ layer.

Reference parity map (SURVEY.md §2.1):
  * ``knn``                  ↔ mvpnet/ops/cuda/knn_distance_kernel.cu
  * ``ball_query``           ↔ mvpnet/ops/cuda/ball_query_kernel.cu (+distance)
  * ``group_points``         ↔ mvpnet/ops/cuda/group_points_kernel.cu
  * ``farthest_point_sample``↔ mvpnet/ops/cuda/fps_kernel.cu
  * ``three_nn_interpolate`` ↔ mvpnet/ops/cuda/interpolate_kernel.cu
  * ``grid_subsample``       ↔ KPConv-PyTorch/cpp_wrappers/cpp_subsampling
  * ``radius_neighbors``     ↔ KPConv-PyTorch/cpp_wrappers/cpp_neighbors
  * ``pyramid.build_pyramid``↔ KPConv-PyTorch/datasets/common.py
                               segmentation_inputs{_sphere} (CPU-side in the
                               reference; fully on-device here)

All ops take/return fixed-shape arrays; padding uses the shadow convention
(coordinates ``SHADOW_COORD``, neighbor index == num_support).
"""

from mvkpconv_tpu.ops.common import SHADOW_COORD, masked_points, pairwise_sq_dists
from mvkpconv_tpu.ops.neighbors import ball_query, knn, radius_neighbors
from mvkpconv_tpu.ops.gather import (
    batch_index_select,
    group_points,
    group_points_packed,
)
from mvkpconv_tpu.ops.sampling import farthest_point_sample, grid_subsample
from mvkpconv_tpu.ops.interpolate import three_nn_interpolate
from mvkpconv_tpu.ops.unproject import points_to_pixel_knn, unproject_depth
from mvkpconv_tpu.ops import pyramid

__all__ = [
    "SHADOW_COORD",
    "masked_points",
    "pairwise_sq_dists",
    "knn",
    "ball_query",
    "radius_neighbors",
    "group_points",
    "group_points_packed",
    "batch_index_select",
    "farthest_point_sample",
    "grid_subsample",
    "three_nn_interpolate",
    "unproject_depth",
    "points_to_pixel_knn",
    "pyramid",
]
