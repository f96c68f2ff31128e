"""Dense reconstruction backends (reference src/core/{dense,dense_stereo,
mvs_patchmatch}.py): plane-sweep stereo, PatchMatch MVS, dense SIFT, plus
point-cloud filters and the multi-chip distributed drivers."""

from recon3d_tpu.dense.patchmatch import PatchMatchMVS, patchmatch_depth
from recon3d_tpu.dense.plane_sweep import (
    PlaneSweepReconstructor,
    create_combined_dense_cloud,
    sweep_depth_map,
)
from recon3d_tpu.dense.sift_dense import DenseSiftReconstructor
from recon3d_tpu.dense.filters import (
    knn_statistical_filter,
    radius_outlier_filter,
    voxel_downsample,
)

__all__ = [
    "PatchMatchMVS",
    "patchmatch_depth",
    "PlaneSweepReconstructor",
    "create_combined_dense_cloud",
    "sweep_depth_map",
    "DenseSiftReconstructor",
    "knn_statistical_filter",
    "radius_outlier_filter",
    "voxel_downsample",
]
