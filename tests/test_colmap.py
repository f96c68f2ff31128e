"""COLMAP text-model writer/reader: quaternion math, roundtrip fidelity,
and the end-to-end export -> import -> dense-ready cycle.

Reference has no counterpart (tools/run_colmap.py only shells out to an
external COLMAP binary); this is framework-native interop.
"""

import numpy as np
import pytest

from recon3d_tpu.io.colmap import (
    load_colmap_text,
    quat_to_rotmat,
    rotmat_to_quat,
    save_colmap_text,
)


def _random_rotation(rng):
    A = rng.normal(size=(3, 3))
    Q, R = np.linalg.qr(A)
    Q *= np.sign(np.diag(R))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def test_quat_roundtrip(rng):
    for _ in range(50):
        R = _random_rotation(rng)
        q = rotmat_to_quat(R)
        assert abs(np.linalg.norm(q) - 1) < 1e-12
        assert q[0] >= 0
        np.testing.assert_allclose(quat_to_rotmat(q), R, atol=1e-10)
    # exact identity and 180-degree cases (trace <= -1 branch)
    np.testing.assert_allclose(
        quat_to_rotmat(rotmat_to_quat(np.eye(3))), np.eye(3), atol=1e-12
    )
    R180 = np.diag([1.0, -1.0, -1.0])
    np.testing.assert_allclose(
        quat_to_rotmat(rotmat_to_quat(R180)), R180, atol=1e-12
    )


@pytest.fixture
def small_model(rng, tmp_path):
    nC, nP = 4, 25
    K = np.array([[400.0, 0, 160], [0, 410.0, 120], [0, 0, 1]], np.float32)
    points = rng.uniform(-1, 1, (nP, 3)).astype(np.float64)
    points[:, 2] += 5.0
    colors = rng.integers(0, 256, (nP, 3)).astype(np.uint8)
    poses, kp_xy, observations = {}, [], [[] for _ in range(nP)]
    for c in range(nC):
        R = _random_rotation(rng) * 0.0 + np.eye(3)
        t = np.array([0.2 * c, 0.0, 0.0], np.float32)
        poses[c] = (np.eye(3, dtype=np.float32), t)
        # observe the first 20 points exactly (zero reprojection error)
        Xc = points[:20] + t
        uv = (Xc[:, :2] / Xc[:, 2:3]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
        kp_xy.append(uv.astype(np.float32))
        for p in range(20):
            observations[p].append((c, p))
    out = tmp_path / "model"
    save_colmap_text(
        str(out), K, (240, 320), poses, points, colors,
        observations=observations, kp_xy=kp_xy,
        names=[f"img_{c:03d}.png" for c in range(nC)],
    )
    return out, K, poses, points, colors, observations


def test_roundtrip_poses_points(small_model):
    out, K, poses, points, colors, observations = small_model
    m = load_colmap_text(str(out))
    assert len(m.cameras) == 1
    cam = m.cameras[1]
    assert cam.model == "PINHOLE" and (cam.width, cam.height) == (320, 240)
    np.testing.assert_allclose(cam.K(), K, rtol=1e-6)

    assert len(m.images) == len(poses)
    got = m.poses()
    for c, (R, t) in poses.items():
        Rg, tg = got[c + 1]  # COLMAP ids are 1-based
        np.testing.assert_allclose(Rg, R, atol=1e-9)
        np.testing.assert_allclose(tg, t, atol=1e-9)
        assert m.images[c + 1].name == f"img_{c:03d}.png"

    np.testing.assert_allclose(m.points, points, atol=1e-9)
    assert (m.colors == colors).all()


def test_tracks_and_errors(small_model):
    out, K, poses, points, colors, observations = small_model
    m = load_colmap_text(str(out))
    # observed points carry 4-image tracks and ~zero error
    for p in range(20):
        assert len(m.tracks[p]) == 4
        assert 0 <= m.errors[p] < 1e-3
    # unobserved points have empty tracks and error -1
    for p in range(20, 25):
        assert m.tracks[p] == []
        assert m.errors[p] == -1
    # 2D points in images.txt point back at the right 3D ids
    im = m.images[1]
    assert im.xys.shape == (20, 2)
    assert (im.point3d_ids == np.arange(1, 21)).all()
    # track (image_id, point2d_idx) agrees with the image's 2D list
    img_id, idx2d = m.tracks[3][0]
    assert m.images[img_id].point3d_ids[idx2d] == 4  # pid 3 -> COLMAP id 4


def test_pipeline_export_and_cli_import(tmp_path):
    """SfM -> save_colmap -> --from-colmap dense-ready import."""
    import dataclasses

    from tests.render import render_views
    from recon3d_tpu.camera import Camera
    from recon3d_tpu.config import ReconstructionConfig
    from recon3d_tpu.io.dataset import image_set_from_arrays
    from recon3d_tpu.sfm.pipeline import SfMPipeline

    scene = render_views(n_views=4, image_size=(160, 192), arc_step=0.14)
    cam = Camera.from_matrix(scene["K"])
    iset = image_set_from_arrays(scene["images"], cam)
    cfg = ReconstructionConfig()
    cfg = cfg.replace(
        sift=dataclasses.replace(
            cfg.sift, max_features=1024, contrast_threshold=0.012),
        match=dataclasses.replace(
            cfg.match, min_matches=15, ransac_hypotheses=512),
        sfm=dataclasses.replace(cfg.sfm, pnp_hypotheses=512),
    )
    pipe = SfMPipeline(config=cfg)
    points, colors, poses = pipe.reconstruct(image_set=iset)
    assert len(poses) >= 3

    out = tmp_path / "colmap_model"
    pipe.save_colmap(str(out))
    m = load_colmap_text(str(out))
    assert len(m.images) == len(poses)
    assert len(m.points) == len(points)
    # mean track error must match the pipeline's own reprojection stat scale
    tracked = m.errors[m.errors >= 0]
    assert len(tracked) > 50
    assert float(np.mean(tracked)) < 2.0
    # poses survive the roundtrip
    got = m.poses()
    for c in poses:
        R, t = np.asarray(poses[c].R), np.asarray(poses[c].t)
        np.testing.assert_allclose(got[c + 1][0], R, atol=1e-6)
        np.testing.assert_allclose(got[c + 1][1], t.reshape(3), atol=1e-6)


def test_image_with_no_tracked_points(tmp_path):
    """An image whose POINTS2D line is empty must not derail the parser."""
    K = np.array([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]], np.float32)
    poses = {0: (np.eye(3, dtype=np.float32), np.float32([0, 0, 0])),
             1: (np.eye(3, dtype=np.float32), np.float32([1, 0, 0]))}
    pts = np.array([[0, 0, 5.0]], np.float64)
    # only camera 0 observes the point; camera 1 has an empty 2D list
    obs = [[(0, 0)]]
    kp = [np.array([[50.0, 40.0]], np.float32), np.zeros((0, 2), np.float32)]
    out = tmp_path / "m"
    save_colmap_text(str(out), K, (80, 100), poses, pts, None,
                     observations=obs, kp_xy=kp, names=["a.png", "b.png"])
    m = load_colmap_text(str(out))
    assert len(m.images) == 2
    assert m.images[1].xys.shape == (1, 2)
    assert m.images[2].xys.shape == (0, 2)
    assert m.images[2].name == "b.png"
