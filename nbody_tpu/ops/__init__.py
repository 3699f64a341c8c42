from nbody_tpu.ops.pairwise import pallas_accelerations
from nbody_tpu.ops.knn import knn_neighbors, batched_knn_neighbors
from nbody_tpu.ops.radius import radius_neighbors
from nbody_tpu.ops.interpolate import trilinear_interpolate
from nbody_tpu.ops.segment import masked_mean, masked_sum

__all__ = [
    "pallas_accelerations",
    "knn_neighbors",
    "batched_knn_neighbors",
    "radius_neighbors",
    "trilinear_interpolate",
    "masked_mean",
    "masked_sum",
]
