"""Robustness suite (VERDICT r2 #9): occlusion-heavy geometry, per-view
exposure/vignetting/noise, a distorted-capture e2e through the
undistort-at-load path, and degraded calibration boards.

The reference handles these regimes implicitly through OpenCV's battle-tested
frontends (sfm_pipeline.py registration cascade, calibrate.py); here each
gets an explicit rendered scenario with exact ground truth.
"""

import dataclasses

import numpy as np
import pytest

from recon3d_tpu.camera import Camera
from recon3d_tpu.config import ReconstructionConfig
from recon3d_tpu.io.dataset import image_set_from_arrays
from recon3d_tpu.sfm.pipeline import SfMPipeline
from tests.render import (
    apply_capture_degradations,
    occluded_scene_planes,
    render_views,
)
from tests.synthetic import rotation_angle_deg


def _tuned_config():
    cfg = ReconstructionConfig()
    return cfg.replace(
        sift=dataclasses.replace(
            cfg.sift, max_features=1024, contrast_threshold=0.012),
        match=dataclasses.replace(
            cfg.match, min_matches=15, ransac_hypotheses=512),
        sfm=dataclasses.replace(cfg.sfm, pnp_hypotheses=512),
    )


def _median_rel_rot_err(poses, Rs_gt):
    ids = sorted(poses.keys())
    errs = []
    for a, b in zip(ids[:-1], ids[1:]):
        R_est = np.asarray(poses[b].R) @ np.asarray(poses[a].R).T
        errs.append(rotation_angle_deg(R_est, Rs_gt[b] @ Rs_gt[a].T))
    return float(np.median(errs))


def _run_pipeline(scene, images=None, dist=None):
    cam = (
        Camera.from_matrix(scene["K"]) if dist is None
        else Camera.from_matrix(scene["K"], dist)
    )
    iset = image_set_from_arrays(
        scene["images"] if images is None else images, cam
    )
    pipe = SfMPipeline(config=_tuned_config())
    points, colors, poses = pipe.reconstruct(image_set=iset)
    return pipe, points, poses


def test_occlusion_heavy_sfm():
    """Floating panels occlude a different slice of the background from
    every view: matches carry occlusion-boundary outliers and per-pair
    covisibility shrinks. All cameras must still register accurately."""
    n = 8
    scene = render_views(
        n_views=n, image_size=(160, 192), arc_step=0.12,
        planes=occluded_scene_planes(),
    )
    pipe, points, poses = _run_pipeline(scene)
    assert len(poses) >= n - 1, f"registered {len(poses)}/{n}"
    assert pipe.stats["mean_reproj_px"] < 1.5
    assert _median_rel_rot_err(poses, scene["Rs"]) < 1.0


def test_exposure_vignette_noise_sfm():
    """Per-view exposure swings (0.65-1.35x), radial vignetting, and sensor
    noise: the descriptor/matching path must be photometric-invariant
    enough to register every view."""
    n = 6
    scene = render_views(n_views=n, image_size=(160, 192), arc_step=0.14)
    degraded = apply_capture_degradations(
        scene["images"], rng_seed=7, noise_sigma=0.02,
    )
    # the degradations must actually bite (images visibly differ)
    assert np.abs(degraded - scene["images"]).mean() > 0.02
    pipe, points, poses = _run_pipeline(scene, images=degraded)
    assert len(poses) >= n - 1, f"registered {len(poses)}/{n}"
    assert pipe.stats["mean_reproj_px"] < 1.8
    assert _median_rel_rot_err(poses, scene["Rs"]) < 1.5


def test_distorted_capture_e2e():
    """Images rendered through a k1/k2/p1 lens, reconstructed with the
    matching calibration: exercises the undistort-at-load kernel
    (io/dataset.py:165, ops/image.py undistort_image) end to end. Gates
    match the undistorted baseline; a skipped or wrong undistort leaves
    several-pixel residuals at the frame edges and fails them."""
    n = 6
    dist = np.array([0.12, -0.25, 0.004, 0.003, 0.0], np.float32)
    scene = render_views(
        n_views=n, image_size=(192, 256), arc_step=0.14, dist=dist,
    )
    pipe, points, poses = _run_pipeline(scene, dist=dist)
    assert len(poses) >= n - 1, f"registered {len(poses)}/{n}"
    assert pipe.stats["mean_reproj_px"] < 1.5
    assert _median_rel_rot_err(poses, scene["Rs"]) < 1.0


def test_distortion_render_sanity():
    """The distorted render really is distorted: pixels differ from the
    pinhole render away from the center, agree near it."""
    base = render_views(n_views=1, image_size=(192, 256), arc_step=0.0)
    dist = np.array([0.12, -0.25, 0.004, 0.003, 0.0], np.float32)
    warped = render_views(
        n_views=1, image_size=(192, 256), arc_step=0.0, dist=dist,
    )
    d = np.abs(base["images"][0] - warped["images"][0]).mean(-1)
    H, W = d.shape
    center = d[H // 2 - 20:H // 2 + 20, W // 2 - 20:W // 2 + 20]
    border = np.concatenate([d[:20].ravel(), d[-20:].ravel()])
    assert border.mean() > 5 * max(center.mean(), 1e-4)


@pytest.mark.slow
def test_global_sfm_300_views():
    """300-view arc through the global (averaging) pipeline: rotation/
    translation averaging and the recovery PnP pass at the scale the
    global formulation targets (VERDICT r2 #9).

    Gate calibration (measured, r3): at 96x128 / fast SIFT the scene
    yields ~54 weak features per image with ~1 px localization noise
    (GT poses + GT-triangulated tracks re-project at 0.97 px rms).
    Bundle-adjusting from GROUND-TRUTH init on this data lands at
    1.14 deg median consecutive relative-rotation error — that is the
    information-theoretic floor of the scenario, so the gate is
    floor x 1.3. The estimator measures 1.26 deg (was 1.62 before the
    constrained track builder + Schur block-Jacobi + V-scaled averaging
    iterations), so the gate catches a regression to the pre-fix state."""
    n = 300
    scene = render_views(n_views=n, image_size=(96, 128), arc_step=0.004)
    cam = Camera.from_matrix(scene["K"])
    iset = image_set_from_arrays(scene["images"], cam)
    pipe = SfMPipeline(config=ReconstructionConfig.fast())
    points, colors, poses = pipe.reconstruct_global(image_set=iset)
    assert len(poses) >= int(0.95 * n), f"registered {len(poses)}/{n}"
    assert len(points) > 350
    assert pipe.stats["mean_reproj_px"] < 1.2
    # Gate tightened 1.5 -> 1.45 after the round-4 estimator work (GNC
    # annealing in rotation averaging + gated long-span rematch): measured
    # 1.24-1.40 deg across runs vs the 1.14 deg GT-anchored floor
    # (docs/global_sfm.md round-4 section).
    assert _median_rel_rot_err(poses, scene["Rs"]) < 1.45


def test_calibration_on_degraded_boards():
    """Zhang calibration from boards with noise, vignetting, and strong
    perspective: intrinsics must still come back within a few percent
    (VERDICT r2 weak #6 — harder degradations than the clean renders)."""
    from recon3d_tpu.calib.calibrate import calibrate_camera_robust
    from tests.render import render_chessboard

    K_gt = np.array(
        [[260.0, 0, 160.0], [0, 258.0, 120.0], [0, 0, 1]], np.float64
    )
    dist_gt = np.array([0.08, -0.15, 0.0, 0.0, 0.0])
    rng = np.random.default_rng(3)
    # strong perspective: rotations up to ~40 deg off-axis
    views = [
        (np.array([0.15, 0.3, 0.05]), np.array([-4.2, -2.6, 9.0])),
        (np.array([-0.35, 0.2, 0.1]), np.array([-3.8, -3.0, 8.0])),
        (np.array([0.3, -0.45, 0.0]), np.array([-4.5, -2.2, 10.0])),
        (np.array([-0.2, -0.3, 0.2]), np.array([-4.0, -2.8, 9.5])),
        (np.array([0.55, 0.1, -0.1]), np.array([-4.3, -2.4, 11.0])),
        (np.array([0.0, 0.55, 0.15]), np.array([-3.6, -2.9, 10.5])),
        (np.array([-0.45, -0.1, -0.2]), np.array([-4.1, -2.5, 9.8])),
        (np.array([0.1, -0.2, 0.35]), np.array([-4.4, -2.7, 10.2])),
    ]
    imgs = []
    for rvec, tvec in views:
        img = render_chessboard(
            K_gt, dist_gt, rvec, tvec, image_size=(240, 320),
        )
        # degrade: vignette + noise (same model as capture degradations)
        img = apply_capture_degradations(
            img[None, ..., None].repeat(3, -1),
            rng_seed=int(rng.integers(1e6)),
            noise_sigma=0.015,
        )[0].mean(-1)
        imgs.append(img)
    result = calibrate_camera_robust(
        imgs, pattern=(9, 6), error_threshold=0.75, min_images=6,
        verbose=False,
    )
    assert result is not None, "detection failed on degraded boards"
    assert len(result["used_indices"]) >= 6
    K_est = np.asarray(result["K"])
    assert abs(K_est[0, 0] - K_gt[0, 0]) / K_gt[0, 0] < 0.04
    assert abs(K_est[1, 1] - K_gt[1, 1]) / K_gt[1, 1] < 0.04
    assert abs(K_est[0, 2] - K_gt[0, 2]) < 12.0
    assert abs(K_est[1, 2] - K_gt[1, 2]) < 12.0
    assert result["overall_rms"] < 1.0


def test_jpeg_defocus_capture_sfm():
    """Compression + optics degradations of a real sensor pipeline: every
    view JPEG-encoded at quality 60 (8x8 DCT block artifacts, chroma
    quantization) and a third of the views mildly defocused (Gaussian PSF
    sigma 1.2 px). SIFT's contrast gates and the NCC verification must
    tolerate both; registration and pose accuracy gates match the clean
    baseline's."""
    import io as _io

    from PIL import Image
    from scipy.ndimage import gaussian_filter

    n = 6
    scene = render_views(n_views=n, image_size=(192, 256), arc_step=0.14)
    rng = np.random.default_rng(11)
    degraded = []
    for v, img in enumerate(scene["images"]):
        im = img
        if v % 3 == 0:
            im = gaussian_filter(im, sigma=(1.2, 1.2, 0.0))
        buf = _io.BytesIO()
        Image.fromarray(
            (np.clip(im, 0, 1) * 255).astype(np.uint8)
        ).save(buf, format="JPEG", quality=60)
        back = np.asarray(Image.open(buf)).astype(np.float32) / 255.0
        degraded.append(back)
    degraded = np.stack(degraded)
    # the degradations must actually bite
    assert np.abs(degraded - scene["images"]).mean() > 0.005
    pipe, points, poses = _run_pipeline(scene, images=degraded)
    assert len(poses) >= n - 1, f"registered {len(poses)}/{n}"
    assert pipe.stats["mean_reproj_px"] < 1.8
    assert _median_rel_rot_err(poses, scene["Rs"]) < 1.5


@pytest.mark.slow
def test_long_span_accept_path():
    """The H/F + E-compat degeneracy gates must PASS genuine wide-baseline
    pairs, not only reject false ones (VERDICT r4 #6; docs/global_sfm.md
    round-5 section). On a multi-depth occluded arc the 2x rematch of
    failed long-span probes recovers pairs whose implied relative
    rotation matches ground truth — the accept path in the actual
    product matching stage, not a unit fixture."""
    from tests.render import occluded_scene_planes
    from recon3d_tpu.ops.epipolar import (
        essential_from_fundamental, recover_pose,
    )
    import jax.numpy as jnp

    n, arc = 24, 0.026
    scene = render_views(
        n_views=n, image_size=(96, 128), arc_step=arc,
        arc_offset=arc * n / 2, planes=occluded_scene_planes(),
    )
    cam = Camera.from_matrix(scene["K"])
    iset = image_set_from_arrays(scene["images"], cam)
    pipe = SfMPipeline(config=ReconstructionConfig.fast())
    pipe.set_image_set(iset)
    pipe.extract_features()
    pipe.match_image_pairs()

    w = pipe.config.sfm.match_window
    aux = [
        ((i, j), m) for (i, j), m in pipe.matches.items()
        if m.get("aux") and j - i >= 2 * w
    ]
    assert len(aux) >= 2, (
        f"no accepted long-span edges: {sorted(pipe.matches)}"
    )
    # every accepted edge's implied relative rotation must be genuine
    K = jnp.asarray(scene["K"])
    for (i, j), m in aux:
        E = essential_from_fundamental(
            jnp.asarray(np.asarray(m["F"], np.float32)), K
        )
        x1 = pipe.kp_xy[i][m["idx1"]]
        x2 = pipe.kp_xy[j][m["idx2"]]
        cap = 1 << int(np.ceil(np.log2(max(8, len(x1)))))
        x1p = np.zeros((cap, 2), np.float32)
        x2p = np.zeros((cap, 2), np.float32)
        mk = np.zeros(cap, np.float32)
        x1p[: len(x1)] = x1
        x2p[: len(x2)] = x2
        mk[: len(x1)] = 1
        R_est, _, _ = recover_pose(
            E, jnp.asarray(x1p), jnp.asarray(x2p), K, jnp.asarray(mk)
        )
        err = rotation_angle_deg(
            np.asarray(R_est), scene["Rs"][j] @ scene["Rs"][i].T
        )
        assert err < 12.0, f"accepted edge ({i},{j}) is false: {err:.1f} deg"
