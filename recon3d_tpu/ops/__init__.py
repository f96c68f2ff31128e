"""Batched, jittable geometry / vision kernels (the L2 layer of the framework).

Everything in this package is shape-static, vmap-friendly, and differentiable
where meaningful. These kernels replace the OpenCV C++ substrate of the
reference (SURVEY.md §2 "native-substrate replacement list").
"""

from recon3d_tpu.ops.lie import so3_exp, so3_log, se3_exp, se3_log
from recon3d_tpu.ops.linalg import smallest_eigvec, nearest_rotation
from recon3d_tpu.ops.triangulate import (
    triangulate_dlt,
    triangulate_nview,
    validate_triangulation,
    reprojection_errors,
)
from recon3d_tpu.ops.epipolar import (
    fundamental_8point,
    essential_from_fundamental,
    decompose_essential,
    recover_pose,
    sampson_distance,
    epipolar_distance,
)

__all__ = [
    "so3_exp",
    "so3_log",
    "se3_exp",
    "se3_log",
    "smallest_eigvec",
    "nearest_rotation",
    "triangulate_dlt",
    "triangulate_nview",
    "validate_triangulation",
    "reprojection_errors",
    "fundamental_8point",
    "essential_from_fundamental",
    "decompose_essential",
    "recover_pose",
    "sampson_distance",
    "epipolar_distance",
]
