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

from recon3d_tpu.ops.epipolar import (
    fundamental_8point,
    sampson_distance,
    sampson_distance_batch,
)
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

    def sample_solver(idx):
        # gathered 8-point sample: (8, 2) systems instead of masked (N, 9);
        # fast null-space is fine here — hypotheses only vote, the winner
        # is exactly refit
        return fundamental_8point(
            x1[idx], x2[idx], jnp.ones(idx.shape[0]), fast=True
        )

    def residual_fn(F):
        return sampson_distance(F, x1, x2)

    def batch_residual_fn(Fs):
        return sampson_distance_batch(Fs, x1, x2)

    res: RansacResult = ransac_with_refit(
        key, solver, residual_fn, valid, 8, num_hypotheses, threshold_px,
        batch_residual_fn=batch_residual_fn, sample_solver=sample_solver,
    )
    return FundamentalResult(F=res.model, inliers=res.inliers, num_inliers=res.num_inliers)


@functools.partial(jax.jit, static_argnames=("num_hypotheses", "refine_iterations"))
def estimate_pose_pnp_wave(
    keys: jax.Array,
    K: jnp.ndarray,
    X: jnp.ndarray,
    x_px: jnp.ndarray,
    valid: jnp.ndarray,
    thresholds_px: jnp.ndarray,
    num_hypotheses: int = 2048,
    refine_iterations: int = 8,
) -> PnPResult:
    """Batched RANSAC-PnP: a whole registration WAVE in one dispatch.

    The reference registers one image at a time, attempting a cascade of
    RANSAC thresholds sequentially (sfm_pipeline.py:567-584). Over a
    high-latency device link each attempt is a full round-trip; here every
    eligible image x every cascade threshold solves simultaneously:

      keys (B,), X (B, N, 3), x_px (B, N, 2), valid (B, N),
      thresholds_px (T,)  ->  PnPResult with (B, T, ...) fields.

    The host then picks, per image, the tightest threshold whose inlier
    count passes the acceptance rule — identical semantics to the cascade,
    ~B*T fewer dispatches.
    """

    from recon3d_tpu.ops.pnp import pnp_ransac_multi

    def per_image(key, Xi, xi, vi):
        # One hypothesis batch per image, scored against the whole
        # threshold cascade (pnp_ransac_multi) — the previous per-threshold
        # vmap re-sampled and re-solved identical hypotheses T times.
        return pnp_ransac_multi(
            key, K, Xi, xi, vi, thresholds_px,
            num_hypotheses=num_hypotheses,
            refine_iterations=refine_iterations,
        )

    return jax.vmap(per_image)(keys, X, x_px, valid)


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
