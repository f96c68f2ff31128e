"""Geometry kernel tests: triangulation, epipolar estimation, pose recovery.

Checks against exact synthetic ground truth, plus OpenCV cross-validation
where available (the reference's substrate, so agreement = parity).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from recon3d_tpu.camera import projection_from_KRt
from recon3d_tpu.ops import (
    triangulate_dlt,
    triangulate_nview,
    validate_triangulation,
    fundamental_8point,
    essential_from_fundamental,
    decompose_essential,
    recover_pose,
    sampson_distance,
    epipolar_distance,
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
)
from tests.synthetic import make_scene, random_rotation, rotation_angle_deg


def _two_view(rng, **kw):
    scene = make_scene(rng, n_cams=2, **kw)
    K = jnp.asarray(scene["K"])
    P1 = projection_from_KRt(K, jnp.asarray(scene["Rs"][0]), jnp.asarray(scene["ts"][0]))
    P2 = projection_from_KRt(K, jnp.asarray(scene["Rs"][1]), jnp.asarray(scene["ts"][1]))
    return scene, K, P1, P2


def test_triangulate_dlt_exact(rng):
    scene, K, P1, P2 = _two_view(rng, n_points=100)
    X = triangulate_dlt(P1, P2, jnp.asarray(scene["obs"][0]), jnp.asarray(scene["obs"][1]))
    np.testing.assert_allclose(np.asarray(X), scene["X"], atol=1e-2)


def test_triangulate_nview_masked(rng):
    scene = make_scene(rng, n_points=50, n_cams=4)
    K = jnp.asarray(scene["K"])
    Ps = jnp.stack(
        [
            projection_from_KRt(K, jnp.asarray(R), jnp.asarray(t))
            for R, t in zip(scene["Rs"], scene["ts"])
        ]
    )
    xs = jnp.asarray(scene["obs"]).transpose(1, 0, 2)  # (N, V, 2)
    mask = jnp.ones((50, 4))
    X = triangulate_nview(Ps, xs, mask)
    np.testing.assert_allclose(np.asarray(X), scene["X"], atol=1e-2)
    # Masking out two views still works (2-view minimum)
    mask2 = jnp.asarray(np.tile([1.0, 1.0, 0.0, 0.0], (50, 1)))
    # corrupt masked observations to prove they're ignored
    xs_bad = xs.at[:, 2:].set(-1e4)
    X2 = triangulate_nview(Ps, xs_bad, mask2)
    np.testing.assert_allclose(np.asarray(X2), scene["X"], atol=5e-2)


def test_validate_triangulation_gates(rng):
    scene, K, P1, P2 = _two_view(rng, n_points=100)
    X = jnp.asarray(scene["X"])
    ok = validate_triangulation(
        K,
        jnp.asarray(scene["Rs"][0]),
        jnp.asarray(scene["ts"][0]),
        jnp.asarray(scene["Rs"][1]),
        jnp.asarray(scene["ts"][1]),
        X,
        jnp.asarray(scene["obs"][0]),
        jnp.asarray(scene["obs"][1]),
    )
    assert np.asarray(ok).mean() > 0.95
    # Points behind the cameras must fail cheirality.
    X_behind = X + jnp.array([0.0, 0.0, 100.0])
    ok2 = validate_triangulation(
        K,
        jnp.asarray(scene["Rs"][0]),
        jnp.asarray(scene["ts"][0]),
        jnp.asarray(scene["Rs"][1]),
        jnp.asarray(scene["ts"][1]),
        X_behind,
        jnp.asarray(scene["obs"][0]),
        jnp.asarray(scene["obs"][1]),
    )
    assert np.asarray(ok2).mean() < 0.05


def test_fundamental_8point_epipolar_constraint(rng):
    scene, K, P1, P2 = _two_view(rng, n_points=64)
    x1 = jnp.asarray(scene["obs"][0])
    x2 = jnp.asarray(scene["obs"][1])
    F = fundamental_8point(x1, x2, jnp.ones(64))
    d = sampson_distance(F, x1, x2)
    assert float(jnp.max(d)) < 1e-2
    d2 = epipolar_distance(F, x1, x2)
    assert float(jnp.max(d2)) < 1e-2


def test_fundamental_vs_opencv(rng):
    cv2 = pytest.importorskip("cv2")
    scene, K, P1, P2 = _two_view(rng, n_points=64, noise_px=0.3)
    x1 = np.asarray(scene["obs"][0], np.float64)
    x2 = np.asarray(scene["obs"][1], np.float64)
    F_cv, _ = cv2.findFundamentalMat(x1, x2, cv2.FM_8POINT)
    F_ours = np.asarray(
        fundamental_8point(jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32), jnp.ones(64))
    )
    F_cv = F_cv / np.linalg.norm(F_cv)
    F_ours = F_ours / np.linalg.norm(F_ours)
    if np.sign(F_cv[2, 2]) != np.sign(F_ours[2, 2]):
        F_ours = -F_ours
    np.testing.assert_allclose(F_ours, F_cv, atol=2e-3)


def test_recover_pose_direction(rng):
    scene, K, P1, P2 = _two_view(rng, n_points=64)
    x1 = jnp.asarray(scene["obs"][0])
    x2 = jnp.asarray(scene["obs"][1])
    F = fundamental_8point(x1, x2, jnp.ones(64))
    E = essential_from_fundamental(F, K)
    # Relative pose cam1 -> cam2
    R_rel_gt = scene["Rs"][1] @ scene["Rs"][0].T
    t_rel_gt = scene["ts"][1] - R_rel_gt @ scene["ts"][0]
    t_rel_gt /= np.linalg.norm(t_rel_gt)

    # recover_pose triangulates with P1 = K[I|0], so transform obs into cam1 frame
    R, t, front = recover_pose(E, x1, x2, K, jnp.ones(64))
    assert rotation_angle_deg(np.asarray(R), R_rel_gt) < 0.5
    cos = abs(np.dot(np.asarray(t), t_rel_gt))
    assert cos > 0.999
    assert np.asarray(front).mean() > 0.9


def test_decompose_essential_candidates(rng):
    scene, K, P1, P2 = _two_view(rng, n_points=32)
    F = fundamental_8point(
        jnp.asarray(scene["obs"][0]), jnp.asarray(scene["obs"][1]), jnp.ones(32)
    )
    E = essential_from_fundamental(F, K)
    Rs, ts = decompose_essential(E)
    assert Rs.shape == (4, 3, 3)
    dets = np.asarray(jnp.linalg.det(Rs))
    np.testing.assert_allclose(dets, 1.0, atol=1e-4)
    norms = np.asarray(jnp.linalg.norm(ts, axis=-1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(scale=0.8, size=(32, 3)), jnp.float32)
    R = so3_exp(w)
    dets = np.asarray(jnp.linalg.det(R))
    np.testing.assert_allclose(dets, 1.0, atol=1e-5)
    w2 = so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)


def test_so3_vs_opencv_rodrigues():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    for _ in range(5):
        w = rng.normal(scale=1.0, size=3)
        R_cv, _ = cv2.Rodrigues(w)
        R_ours = np.asarray(so3_exp(jnp.asarray(w, jnp.float32)))
        np.testing.assert_allclose(R_ours, R_cv, atol=1e-5)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(3)
    xi = jnp.asarray(rng.normal(scale=0.7, size=(16, 6)), jnp.float32)
    R, t = se3_exp(xi)
    xi2 = se3_log(R, t)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_homography_ransac_planar_vs_parallax(rng):
    """The H/F degeneracy gate's primitive: a planar (or false self-similar)
    pair is explained by one homography; a genuine 3D wide-baseline pair is
    not (pipeline._rematch_long_span's rejection rule)."""
    import jax

    from recon3d_tpu.ops.estimation import estimate_homography_ransac

    n = 128
    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], np.float32)
    R = np.array([[0.9689, 0, 0.2474], [0, 1, 0], [-0.2474, 0, 0.9689]])
    t = np.array([0.8, 0.1, 0.2])

    def project(X, Rm, tm):
        Xc = X @ Rm.T + tm
        return (Xc[:, :2] / Xc[:, 2:]) @ K[:2, :2].T + K[:2, 2]

    # planar scene: all points on z=4 plane -> H explains everything
    Xp = np.concatenate(
        [rng.uniform(-2, 2, size=(n, 2)), np.full((n, 1), 4.0)], axis=1
    )
    x1 = project(Xp, np.eye(3), np.zeros(3)) + rng.normal(scale=0.3, size=(n, 2))
    x2 = project(Xp, R, t) + rng.normal(scale=0.3, size=(n, 2))
    res_planar = estimate_homography_ransac(
        jax.random.PRNGKey(0), jnp.asarray(x1, jnp.float32),
        jnp.asarray(x2, jnp.float32), jnp.ones(n), threshold_px=3.0,
    )
    assert int(res_planar.num_inliers) > 0.9 * n

    # genuine 3D scene: depth spread -> one H cannot explain the matches
    X3 = np.concatenate(
        [rng.uniform(-2, 2, size=(n, 2)),
         rng.uniform(2.5, 8.0, size=(n, 1))], axis=1
    )
    x1 = project(X3, np.eye(3), np.zeros(3)) + rng.normal(scale=0.3, size=(n, 2))
    x2 = project(X3, R, t) + rng.normal(scale=0.3, size=(n, 2))
    res_3d = estimate_homography_ransac(
        jax.random.PRNGKey(0), jnp.asarray(x1, jnp.float32),
        jnp.asarray(x2, jnp.float32), jnp.ones(n), threshold_px=3.0,
    )
    assert int(res_3d.num_inliers) < 0.5 * n, int(res_3d.num_inliers)
