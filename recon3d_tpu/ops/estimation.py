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
from recon3d_tpu.ops.lie import hat, so3_exp
from recon3d_tpu.ops.linalg import einsum_hp, matmul_hp
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


class HomographyResult(NamedTuple):
    H: jnp.ndarray
    inliers: jnp.ndarray
    num_inliers: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def estimate_homography_ransac(
    key: jax.Array,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    valid: jnp.ndarray,
    threshold_px: float = 3.0,
    num_hypotheses: int = 512,
) -> HomographyResult:
    """RANSAC homography on padded correspondences (4-point DLT samples,
    symmetric transfer distance). The consumer is the two-view degeneracy
    gate: if a single H explains (almost) all of a pair's F-inliers, the
    pair carries no parallax signal — pure rotation, a single plane, or
    self-similar texture producing a false wide-baseline match (measured:
    2x-rematched span>=129 probe pairs on the 300-view arc passed F-RANSAC
    with >= 20 "inliers" while their relative rotations were ~32 deg wrong)."""
    from recon3d_tpu.ops.epipolar import (
        homography_dlt, homography_transfer_distance,
    )
    from recon3d_tpu.ops.ransac import sample_indices

    idx = sample_indices(key, valid, num_hypotheses, 4)
    Hs = jax.vmap(
        lambda i: homography_dlt(
            x1[i], x2[i], jnp.ones(4, x1.dtype), fast=True
        )
    )(idx)
    res = jax.vmap(
        lambda Hm: homography_transfer_distance(Hm, x1, x2)
    )(Hs)  # (Hyp, N)
    valid_b = valid > 0
    inl = (res < threshold_px) & valid_b[None, :]
    counts = jnp.sum(inl, axis=-1)
    r2 = jnp.minimum(jnp.square(res), threshold_px * threshold_px)
    score = jnp.sum(jnp.where(valid_b[None, :], r2, 0.0), axis=-1)
    norm_score = score / (jnp.max(score) + 1e-12)
    best = jnp.argmax(counts.astype(jnp.float32) - 0.5 * norm_score)
    H = Hs[best]
    # one LS refit on the winner's inliers
    w = inl[best].astype(x1.dtype)
    enough = jnp.sum(w) >= 4
    H_ref = homography_dlt(x1, x2, w)
    H = jnp.where(enough, H_ref, H)
    r = homography_transfer_distance(H, x1, x2)
    inliers = (r < threshold_px) & valid_b
    return HomographyResult(H=H, inliers=inliers, num_inliers=jnp.sum(inliers))


class EssentialResult(NamedTuple):
    E: jnp.ndarray
    inliers: jnp.ndarray
    num_inliers: jnp.ndarray


def _refine_essential_manifold(
    E0: jnp.ndarray,
    K: jnp.ndarray,
    KinvT: jnp.ndarray,
    Kinv: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    weights: jnp.ndarray,
    valid_b: jnp.ndarray,
    threshold_px: float,
) -> jnp.ndarray:
    """LM refinement of E constrained to the essential manifold.

    Parameterizes E(w, dt) = [t']_x (exp(w) R0) with (R0, t0) from the
    cheirality-voted decomposition of E0 and t' = normalize(t0 + dt), and
    minimizes weighted PIXEL Sampson error over the 6 parameters (5 DoF —
    the translation-scale direction is flattened by the normalization, LM
    damping absorbs the null direction). This is the LO-RANSAC step the
    unconstrained 8-point refit cannot provide: at low correspondence
    counts an unconstrained rank-2 refit drifts off the essential manifold
    and recover_pose's projection then lands on a worse pose (measured:
    2.6 -> 22.1 deg on a 16-point scene), while the manifold step can only
    move within valid (R, t) geometry. The caller gates acceptance on the
    MSAC score, so this is never worse than the RANSAC winner.
    """
    from recon3d_tpu.ops.epipolar import recover_pose

    dt_ = E0.dtype
    R0, t0, _ = recover_pose(E0, x1, x2, K, weights)
    t0 = t0 / jnp.maximum(jnp.linalg.norm(t0), 1e-12)

    def E_of(params):
        w, dtv = params[:3], params[3:]
        Rn = so3_exp(w) @ R0
        tn = t0 + dtv
        tn = tn / jnp.maximum(jnp.linalg.norm(tn), 1e-12)
        return hat(tn) @ Rn

    def resid(params, w):
        F = matmul_hp(matmul_hp(KinvT, E_of(params)), Kinv)
        return sampson_distance(F, x1, x2) * w

    def lm_rounds(params, w, lam, n):
        for _ in range(n):
            J = jax.jacobian(resid)(params, w)
            rr = resid(params, w)
            JTJ = J.T @ J
            g = J.T @ rr
            step = jnp.linalg.solve(
                JTJ + lam * jnp.eye(6, dtype=dt_), g
            )
            new_params = params - step
            # accept only if the weighted SSE improves (scalar, traced)
            new_sse = jnp.sum(jnp.square(resid(new_params, w)))
            old_sse = jnp.sum(jnp.square(rr))
            better = jnp.isfinite(new_sse) & (new_sse < old_sse)
            params = jnp.where(better, new_params, params)
            lam = jnp.where(better, lam * 0.5, lam * 4.0)
        return params, lam

    params = jnp.zeros(6, dt_)
    lam = jnp.asarray(1e-4, dt_)
    params, lam = lm_rounds(params, weights, lam, 6)
    # re-estimate the inlier set once at the refined model, polish again
    r_mid = sampson_distance(
        matmul_hp(matmul_hp(KinvT, E_of(params)), Kinv), x1, x2
    )
    w2 = ((r_mid < threshold_px) & valid_b).astype(dt_)
    w2 = jnp.where(jnp.sum(w2) >= 5, w2, weights)
    params, _ = lm_rounds(params, w2, lam, 6)
    E = E_of(params)
    return E / jnp.maximum(jnp.linalg.norm(E.reshape(9)), 1e-12)


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def estimate_essential_ransac(
    key: jax.Array,
    K: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    valid: jnp.ndarray,
    threshold_px: float = 2.0,
    num_hypotheses: int = 512,
) -> EssentialResult:
    """RANSAC essential matrix with KNOWN intrinsics (Nistér 5-point).

    The reference estimates F then converts E = K^T F K
    (sfm_pipeline.py:357-369, geometry.py:128-135) — F's 7 DoF must be
    pinned down by the data where E has only 5, so at low correspondence
    counts / thin parallax the F route admits distortion the E route
    rejects, and an 8-point minimal sample is far less likely to be
    outlier-free than a 5-point one (25x at 50% inliers). Hypotheses are
    the <= 10 essential candidates per 5-sample from ops/essential5
    (num_hypotheses samples -> up to 10x models voting); the vote is MSAC
    on pixel Sampson distance via F = K^-T E K^-1, and the winner is
    LS-refit on its inlier set with the masked 8-point solve in normalized
    coordinates.

    The refit model is rank-2 but NOT symmetrically projected to equal
    singular values: the Frobenius-nearest essential matrix is measurably
    NOT the Sampson-nearest one (measured on a 256-pt scene, noise 0.5 px:
    rank-2 LS refit keeps 120/121 true inliers at 0.46 px median Sampson;
    forcing sv -> (s,s,0) drops it to 64 inliers at 1.97 px). recover_pose
    enforces the manifold exactly during decomposition (its SVD uses only
    U, Vt), so nothing downstream needs equal singular values.

    x1, x2: (N, 2) pixels; valid: (N,). Returns E scaled to ||E|| = 1.
    """
    from recon3d_tpu.ops.essential5 import nister_5point
    from recon3d_tpu.ops.ransac import sample_indices

    Kinv = jnp.linalg.inv(K)
    KinvT = Kinv.T

    def norm_pts(x):
        xh = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
        n = einsum_hp("ij,nj->ni", Kinv, xh)
        return n[..., :2] / jnp.maximum(n[..., 2:], 1e-12)

    x1n = norm_pts(x1)
    x2n = norm_pts(x2)

    def to_F(E):
        return matmul_hp(matmul_hp(KinvT, E), Kinv)

    def batch_residuals(Es):
        KinvT_b = jnp.broadcast_to(KinvT, Es.shape)
        Kinv_b = jnp.broadcast_to(Kinv, Es.shape)
        return sampson_distance_batch(
            matmul_hp(matmul_hp(KinvT_b, Es), Kinv_b), x1, x2
        )

    idx = sample_indices(key, valid, num_hypotheses, 5)
    Es, ok = jax.vmap(lambda i: nister_5point(x1n[i], x2n[i]))(idx)
    Es = Es.reshape(-1, 3, 3)
    ok = ok.reshape(-1)

    residuals = batch_residuals(Es)  # (10H, N)
    valid_b = valid > 0
    inl = (residuals < threshold_px) & valid_b & ok[:, None]
    r2 = jnp.minimum(jnp.square(residuals), threshold_px * threshold_px)
    score = jnp.sum(jnp.where(valid_b, r2, 0.0), axis=-1)
    counts = jnp.sum(inl, axis=-1)
    norm_score = score / (jnp.max(score) + 1e-12)
    best = jnp.argmax(
        jnp.where(ok, counts.astype(jnp.float32) - 0.5 * norm_score, -1.0)
    )
    E0 = Es[best]
    inliers0 = inl[best]

    def msac_of(E):
        r = sampson_distance(to_F(E), x1, x2)
        sc = jnp.sum(
            jnp.where(
                valid_b,
                jnp.minimum(jnp.square(r), threshold_px * threshold_px),
                0.0,
            )
        )
        return jnp.where(jnp.isfinite(sc), sc, jnp.inf)

    # Guarded local optimization (LO-RANSAC): build improvement candidates
    # and keep whichever has the best MSAC score — the winner itself always
    # competes, so refinement can never degrade the result (the previous
    # unconditional 8-point refit did: 2.6 -> 22.1 deg rotation error
    # measured on a 16-point scene).
    # Candidate 1: iterative unconstrained LS refit (masked normalized
    # 8-point, rank-2 enforced inside fundamental_8point).
    E1 = E0
    inliers = inliers0
    for _ in range(2):
        w = inliers.astype(jnp.float32) * (valid > 0)
        enough = jnp.sum(w) >= 8
        E_new = fundamental_8point(x1n, x2n, w)
        E1 = jnp.where(enough, E_new, E1)
        r = sampson_distance(to_F(E1), x1, x2)
        inliers = (r < threshold_px) & valid_b
    # Candidate 2: manifold-constrained LM from the winner's pose.
    E2 = _refine_essential_manifold(
        E0, K, KinvT, Kinv, x1, x2,
        inliers0.astype(jnp.float32), valid_b, threshold_px,
    )
    cands = jnp.stack([E0, E1, E2])
    scores3 = jnp.stack([msac_of(E0), msac_of(E1), msac_of(E2)])
    E = cands[jnp.argmin(scores3)]
    r = sampson_distance(to_F(E), x1, x2)
    inliers = (r < threshold_px) & valid_b

    return EssentialResult(
        E=E, inliers=inliers, num_inliers=jnp.sum(inliers)
    )


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
def estimate_pose_pnp_wave_indexed(
    keys: jax.Array,
    K: jnp.ndarray,
    P_table: jnp.ndarray,
    kp_flat: jnp.ndarray,
    pid_idx: jnp.ndarray,
    kp_idx: jnp.ndarray,
    thresholds_px: jnp.ndarray,
    num_hypotheses: int = 2048,
    refine_iterations: int = 8,
) -> PnPResult:
    """estimate_pose_pnp_wave with DEVICE-SIDE gathers.

    The dense formulation uploads (B, cap, 3) world points + (B, cap, 2)
    pixels per wave (~400 KB); over the tunneled link, mid-run relay
    backpressure inflates that to ~1.5 s/wave (measured: the same wave
    costs 0.25 s on an idle chip). Here the host uploads only int32 index
    tables (pid_idx, kp_idx — ~40% the bytes) plus the raw (P, 3) point
    table (tens of KB, pow-4 padded by the caller for shape stability);
    the keypoint table uploads ONCE per reconstruction (it is immutable
    after extraction) and the (B, cap, ...) operands materialize on
    device. pid_idx < 0 marks padded slots.

      keys (B,), P_table (P, 3), kp_flat (sumK, 2),
      pid_idx (B, cap) i32, kp_idx (B, cap) i32, thresholds_px (T,).
    """
    from recon3d_tpu.ops.pnp import pnp_ransac_multi

    valid = (pid_idx >= 0).astype(P_table.dtype)
    X = jnp.take(P_table, jnp.clip(pid_idx, 0, P_table.shape[0] - 1), axis=0)
    x_px = jnp.take(kp_flat, jnp.clip(kp_idx, 0, kp_flat.shape[0] - 1), axis=0)

    def per_image(key, Xi, xi, vi):
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
