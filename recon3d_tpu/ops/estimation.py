"""High-level robust estimators built on the RANSAC harness.

These are the drop-in equivalents of the reference's OpenCV calls:
  - estimate_fundamental_ransac  <- cv.findFundamentalMat(FM_RANSAC, 2.0, .999)
    (reference features.py:195, sfm_pipeline.py:357, neural_matcher.py:182)
  - estimate_pose_pnp            <- cv.solvePnPRansac + cv.solvePnP refine
    (reference sfm_pipeline.py:567-595)
All are jittable with static hypothesis budgets.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from recon3d_tpu.ops.epipolar import fundamental_8point, sampson_distance
from recon3d_tpu.ops.ransac import ransac_with_refit, RansacResult
from recon3d_tpu.ops.pnp import pnp_ransac, PnPResult


class FundamentalResult(NamedTuple):
    F: jnp.ndarray
    inliers: jnp.ndarray
    num_inliers: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def estimate_fundamental_ransac(
    key: jax.Array,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    valid: jnp.ndarray,
    threshold_px: float = 2.0,
    num_hypotheses: int = 1024,
) -> FundamentalResult:
    """RANSAC fundamental matrix on padded correspondences.

    x1, x2: (N, 2) pixels, valid: (N,). 1024 hypotheses give > 0.999 success
    down to ~45% inlier ratio for 8-point samples; the final model is
    least-squares refit on all inliers (2 rounds).
    """

    def solver(mask):
        return fundamental_8point(x1, x2, mask)

    def residual_fn(F):
        return sampson_distance(F, x1, x2)

    res: RansacResult = ransac_with_refit(
        key, solver, residual_fn, valid, 8, num_hypotheses, threshold_px
    )
    return FundamentalResult(F=res.model, inliers=res.inliers, num_inliers=res.num_inliers)


@functools.partial(jax.jit, static_argnames=("num_hypotheses", "refine_iterations"))
def estimate_pose_pnp(
    key: jax.Array,
    K: jnp.ndarray,
    X: jnp.ndarray,
    x_px: jnp.ndarray,
    valid: jnp.ndarray,
    threshold_px: float = 8.0,
    num_hypotheses: int = 2048,
    refine_iterations: int = 8,
) -> PnPResult:
    """Jitted RANSAC-PnP + GN polish (see ops/pnp.py)."""
    return pnp_ransac(
        key,
        K,
        X,
        x_px,
        valid,
        num_hypotheses=num_hypotheses,
        threshold_px=threshold_px,
        refine_iterations=refine_iterations,
    )
