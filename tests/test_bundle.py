"""Bundle adjustment tests: convergence from perturbed ground truth."""

import numpy as np
import pytest

from recon3d_tpu.sfm.bundle import bundle_adjust
from recon3d_tpu.config import BundleConfig
from tests.synthetic import make_scene, rotation_angle_deg, random_rotation


def _perturbed_problem(rng, n_cams=4, n_points=120, noise_px=0.3,
                       pose_noise=0.01, point_noise=0.02):
    scene = make_scene(rng, n_points=n_points, n_cams=n_cams, noise_px=noise_px)
    poses = {}
    for i in range(n_cams):
        dR = random_rotation(rng, pose_noise) if i > 0 else np.eye(3)
        dt = rng.normal(scale=pose_noise, size=3) if i > 0 else np.zeros(3)
        poses[i] = (
            (dR @ scene["Rs"][i]).astype(np.float32),
            (scene["ts"][i] + dt).astype(np.float32),
        )
    points = scene["X"] + rng.normal(scale=point_noise, size=scene["X"].shape)
    observations = [
        [(c, p) for c in range(n_cams)] for p in range(n_points)
    ]
    kp_xy = [scene["obs"][c].astype(np.float32) for c in range(n_cams)]
    return scene, poses, points.astype(np.float32), observations, kp_xy


def test_ba_reduces_error(rng):
    scene, poses, points, obs, kp_xy = _perturbed_problem(rng)
    new_poses, new_points, stats = bundle_adjust(
        scene["K"], poses, points, obs, kp_xy, BundleConfig(max_iterations=15)
    )
    assert stats["rms_after"] < 0.5, stats
    assert stats["rms_after"] < stats["rms_before"] * 0.2
    # camera 0 is the gauge anchor: unchanged
    np.testing.assert_allclose(new_poses[0][0], poses[0][0], atol=1e-6)
    # recovered rotations near ground truth
    for i in range(1, 4):
        assert rotation_angle_deg(new_poses[i][0], scene["Rs"][i]) < 0.3


def test_ba_motion_only_keeps_points(rng):
    scene, poses, points, obs, kp_xy = _perturbed_problem(rng, point_noise=0.0)
    new_poses, new_points, stats = bundle_adjust(
        scene["K"], poses, points, obs, kp_xy,
        BundleConfig(max_iterations=8, motion_only=True),
    )
    np.testing.assert_allclose(new_points, points, atol=1e-6)
    assert stats["rms_after"] < stats["rms_before"]


def test_ba_robust_to_outliers(rng):
    scene, poses, points, obs, kp_xy = _perturbed_problem(rng, noise_px=0.2)
    # corrupt 10% of observations of camera 2
    bad = rng.choice(len(points), size=len(points) // 10, replace=False)
    kp_xy[2] = kp_xy[2].copy()
    kp_xy[2][bad] += rng.uniform(30, 80, size=(len(bad), 2))
    new_poses, new_points, stats = bundle_adjust(
        scene["K"], poses, points, obs, kp_xy,
        BundleConfig(max_iterations=15, robust_delta_px=2.0),
    )
    for i in range(1, 4):
        assert rotation_angle_deg(new_poses[i][0], scene["Rs"][i]) < 0.5
