"""End-to-end incremental SfM on a rendered synthetic scene.

Ground-truth poses let us check the whole pipeline: registration rate,
pose accuracy (up to global similarity), reprojection error, and PLY output.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from recon3d_tpu.camera import Camera
from recon3d_tpu.config import ReconstructionConfig
from recon3d_tpu.io.dataset import image_set_from_arrays
from recon3d_tpu.io.ply import load_ply
from recon3d_tpu.sfm.pipeline import SfMPipeline
from tests.render import render_views
from tests.synthetic import rotation_angle_deg
import dataclasses


@pytest.fixture(scope="module")
def sfm_result():
    scene = render_views(n_views=5, image_size=(160, 192), arc_step=0.14)
    cam = Camera.from_matrix(scene["K"])
    iset = image_set_from_arrays(scene["images"], cam)

    cfg = ReconstructionConfig()
    cfg = cfg.replace(
        # contrast threshold lowered: the synthetic value-noise texture is
        # smoother than natural images (cv2 SIFT also finds ~4x more at 0.01)
        sift=dataclasses.replace(cfg.sift, max_features=1024, contrast_threshold=0.012),
        match=dataclasses.replace(cfg.match, min_matches=15, ransac_hypotheses=512),
        sfm=dataclasses.replace(cfg.sfm, pnp_hypotheses=512),
    )
    pipe = SfMPipeline(config=cfg)
    points, colors, poses = pipe.reconstruct(image_set=iset)
    return scene, pipe, points, colors, poses


def test_all_cameras_registered(sfm_result):
    scene, pipe, points, colors, poses = sfm_result
    assert len(poses) == 5
    assert len(points) > 100
    assert colors.shape == points.shape


def test_reprojection_error_small(sfm_result):
    scene, pipe, *_ = sfm_result
    assert pipe.stats["mean_reproj_px"] < 1.5


def test_relative_rotations_match_ground_truth(sfm_result):
    """Estimated relative rotations should match GT (rotation is similarity-
    invariant, no alignment needed)."""
    scene, pipe, points, colors, poses = sfm_result
    ids = sorted(poses.keys())
    errs = []
    for a in ids:
        for b in ids:
            if a >= b:
                continue
            R_est = np.asarray(poses[b].R) @ np.asarray(poses[a].R).T
            R_gt = scene["Rs"][b] @ scene["Rs"][a].T
            errs.append(rotation_angle_deg(R_est, R_gt))
    assert np.median(errs) < 1.0, f"median relative rotation error {np.median(errs):.2f} deg"


def test_camera_centers_similarity_aligned(sfm_result):
    """Camera centers must match GT up to a global similarity (Umeyama)."""
    scene, pipe, points, colors, poses = sfm_result
    ids = sorted(poses.keys())
    C_est = np.stack([np.asarray(poses[i].center) for i in ids])
    C_gt = np.stack([-scene["Rs"][i].T @ scene["ts"][i] for i in ids])

    mu_e, mu_g = C_est.mean(0), C_gt.mean(0)
    E = C_est - mu_e
    G = C_gt - mu_g
    U, S, Vt = np.linalg.svd(E.T @ G)
    D = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
    R = U @ D @ Vt
    s = (S * np.diag(D)).sum() / (E**2).sum()
    aligned = s * E @ R + mu_g
    rms = np.sqrt(((aligned - C_gt) ** 2).sum(1).mean())
    scale = np.linalg.norm(C_gt - mu_g, axis=1).mean()
    assert rms / scale < 0.05, f"relative center RMS {rms / scale:.3f}"


def test_ply_output(sfm_result, tmp_path):
    scene, pipe, points, colors, poses = sfm_result
    p = tmp_path / "sparse.ply"
    pipe.save_ply(str(p))
    pts, cols = load_ply(str(p))
    assert pts.shape[0] == len(points)
    pipe.save_cameras_ply(str(tmp_path / "cams.ply"))
    cpts, ccols = load_ply(str(tmp_path / "cams.ply"))
    assert cpts.shape[0] == 2 * len(poses)
