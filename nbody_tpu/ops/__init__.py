from nbody_tpu.ops.pairwise import pallas_accelerations
from nbody_tpu.ops.treeforce import (
    BHPartition,
    bh_accelerations,
    build_bh_partition,
)
from nbody_tpu.ops.knn import knn_neighbors, batched_knn_neighbors
from nbody_tpu.ops.radius import radius_neighbors
from nbody_tpu.ops.interpolate import trilinear_interpolate
from nbody_tpu.ops.segment import masked_mean, masked_sum

__all__ = [
    "pallas_accelerations",
    "BHPartition",
    "bh_accelerations",
    "build_bh_partition",
    "knn_neighbors",
    "batched_knn_neighbors",
    "radius_neighbors",
    "trilinear_interpolate",
    "masked_mean",
    "masked_sum",
]
