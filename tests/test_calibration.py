"""Calibration tests on exactly-rendered synthetic chessboards."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from recon3d_tpu.calib import (
    board_points,
    calibrate_camera_robust,
    calibrate_from_corners,
    find_chessboard,
    validate_calibration,
)
from recon3d_tpu.calib.calibrate import _project
from recon3d_tpu.camera import load_calibration
from tests.render import render_chessboard

PATTERN = (9, 6)
K_GT = np.array([[300.0, 0, 160.0], [0, 298.0, 120.0], [0, 0, 1]], np.float32)
DIST_GT = np.array([-0.12, 0.05, 0.001, -0.0015, 0.0], np.float32)


def _poses(n):
    """A spread of board poses: tilted, rotated, varying distance — resampled
    until every corner projects inside the image with a margin."""
    rng = np.random.default_rng(3)
    poses = []
    while len(poses) < n:
        rvec = np.array(
            [0.25 * rng.normal(), 0.25 * rng.normal(), 0.2 * rng.normal()],
            np.float32,
        )
        tvec = np.array(
            [-4.0 + 0.5 * rng.normal(), -2.5 + 0.4 * rng.normal(),
             10.0 + 1.5 * rng.normal()],
            np.float32,
        )
        gt = _gt_corners(rvec, tvec)
        if (
            (gt[:, 0] > 10).all() and (gt[:, 0] < 310).all()
            and (gt[:, 1] > 10).all() and (gt[:, 1] < 230).all()
        ):
            poses.append((rvec, tvec))
    return poses


@pytest.fixture(scope="module")
def boards():
    poses = _poses(12)
    images = [
        render_chessboard(K_GT, DIST_GT, r, t, image_size=(240, 320),
                          pattern=PATTERN)
        for r, t in poses
    ]
    return images, poses


def _gt_corners(rvec, tvec):
    cam = jnp.asarray(
        np.array([K_GT[0, 0], K_GT[1, 1], K_GT[0, 2], K_GT[1, 2],
                  *DIST_GT[:4]], np.float32)
    )
    X = jnp.asarray(board_points(PATTERN))
    return np.asarray(_project(cam, jnp.asarray(rvec), jnp.asarray(tvec), X))


def test_corner_detection_subpixel(boards):
    images, poses = boards
    found = 0
    errs = []
    for img, (r, t) in zip(images[:6], poses[:6]):
        c = find_chessboard(img, PATTERN)
        if c is None:
            continue
        found += 1
        gt = _gt_corners(r, t)
        # ordering may start from either board end; try both
        e1 = np.linalg.norm(c - gt, axis=1)
        e2 = np.linalg.norm(c[::-1] - gt, axis=1)
        errs.append(min(np.median(e1), np.median(e2)))
    assert found >= 5, f"detected only {found}/6 boards"
    assert np.median(errs) < 0.3, f"median corner err {np.median(errs):.3f} px"


def test_calibrate_from_gt_corners():
    """With exact corners the solver must recover K and dist almost exactly."""
    poses = _poses(10)
    corners = np.stack([_gt_corners(r, t) for r, t in poses])
    K, dist, rvecs, tvecs, rms = calibrate_from_corners(
        corners, board_points(PATTERN)
    )
    assert rms.max() < 0.05, f"rms {rms.max():.4f}"
    assert abs(K[0, 0] - K_GT[0, 0]) / K_GT[0, 0] < 0.005
    assert abs(K[1, 1] - K_GT[1, 1]) / K_GT[1, 1] < 0.005
    assert abs(K[0, 2] - K_GT[0, 2]) < 1.5
    assert abs(K[1, 2] - K_GT[1, 2]) < 1.5
    np.testing.assert_allclose(dist[:2], DIST_GT[:2], atol=0.01)


def test_calibrate_camera_robust_end_to_end(boards, tmp_path):
    images, _ = boards
    result = calibrate_camera_robust(
        images, PATTERN, error_threshold=0.5, min_images=6,
        output_dir=str(tmp_path), verbose=False,
    )
    assert result is not None
    K = result["K"]
    assert abs(K[0, 0] - K_GT[0, 0]) / K_GT[0, 0] < 0.02, K
    assert abs(K[1, 1] - K_GT[1, 1]) / K_GT[1, 1] < 0.02, K
    assert result["overall_rms"] < 0.5

    # .npz round-trips through the framework loader (reference format)
    cam = load_calibration(str(tmp_path / "calibration_data.npz"))
    np.testing.assert_allclose(np.asarray(cam.K), K, rtol=1e-6)
    assert os.path.exists(tmp_path / "calibration_data.txt")

    # validator: stored poses reproject onto re-detected corners
    used = result["used_indices"]
    errors = validate_calibration(
        [images[i] for i in used], K, result["dist"],
        result["rvecs"], result["tvecs"], PATTERN, verbose=False,
    )
    valid = errors[~np.isnan(errors)]
    assert len(valid) >= 4
    assert np.median(valid) < 1.0, f"validator median {np.median(valid):.3f}"


def test_solver_matches_opencv_on_same_corners(boards):
    """Feed identical detected corners to our Zhang+LM solver and to
    cv2.calibrateCamera: recovered intrinsics must agree closely (isolates
    the solver from the detector)."""
    cv2 = pytest.importorskip("cv2")
    images, _ = boards
    detected = [find_chessboard(img, PATTERN) for img in images[:8]]
    detected = [c for c in detected if c is not None]
    assert len(detected) >= 6
    corners = np.stack(detected)
    X = board_points(PATTERN)

    K_ours, dist_ours, _, _, rms_ours = calibrate_from_corners(corners, X)

    obj = [X.astype(np.float32)] * len(corners)
    img_pts = [c.reshape(-1, 1, 2).astype(np.float32) for c in corners]
    rms_cv, K_cv, dist_cv, _, _ = cv2.calibrateCamera(
        obj, img_pts, (320, 240), None, None,
        flags=cv2.CALIB_FIX_K3,
    )
    # both solvers converge to the same camera
    assert abs(K_ours[0, 0] - K_cv[0, 0]) / K_cv[0, 0] < 0.01
    assert abs(K_ours[1, 1] - K_cv[1, 1]) / K_cv[1, 1] < 0.01
    assert abs(K_ours[0, 2] - K_cv[0, 2]) < 2.0
    assert abs(K_ours[1, 2] - K_cv[1, 2]) < 2.0
    np.testing.assert_allclose(dist_ours[:2], np.ravel(dist_cv)[:2], atol=0.02)
    # and our residuals are at least as good
    assert rms_ours.mean() <= rms_cv * 1.1
