"""Camera/pose pytree tests (parity with reference camera.py behaviors)."""

import numpy as np
import jax
import jax.numpy as jnp

from recon3d_tpu.camera import Camera, CameraPose, stack_poses, projection_from_KRt
from tests.synthetic import make_scene


def test_project_unproject_roundtrip(rng):
    cam = Camera.create(fx=500.0, fy=510.0, cx=320.0, cy=240.0)
    pix = jnp.asarray(rng.uniform([0, 0], [640, 480], size=(100, 2)), jnp.float32)
    depth = jnp.asarray(rng.uniform(0.5, 10.0, size=100), jnp.float32)
    pts = cam.unproject(pix, depth)
    back = cam.project(pts)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pix), atol=1e-2)


def test_pose_center_and_projection(rng):
    scene = make_scene(rng, n_points=10, n_cams=3)
    poses = stack_poses(
        [CameraPose(R=jnp.asarray(R), t=jnp.asarray(t)) for R, t in zip(scene["Rs"], scene["ts"])]
    )
    # center = -R^T t
    for v in range(3):
        C = np.asarray(poses.center[v])
        expected = -scene["Rs"][v].T @ scene["ts"][v]
        np.testing.assert_allclose(C, expected, atol=1e-5)
    # projection via P = K[R|t] matches camera.project(transform)
    cam = Camera.from_matrix(scene["K"])
    P = projection_from_KRt(jnp.asarray(scene["K"]), poses.R, poses.t)
    X = jnp.asarray(scene["X"])
    Xh = jnp.concatenate([X, jnp.ones((X.shape[0], 1))], axis=1)
    proj_h = jnp.einsum("vij,nj->vni", P, Xh)
    proj = proj_h[..., :2] / proj_h[..., 2:3]
    np.testing.assert_allclose(np.asarray(proj), scene["obs"], atol=1e-2)


def test_pose_inverse_compose():
    rng = np.random.default_rng(0)
    from tests.synthetic import random_rotation

    R = jnp.asarray(random_rotation(rng), jnp.float32)
    t = jnp.asarray(rng.normal(size=3), jnp.float32)
    p = CameraPose(R=R, t=t)
    ident = p.compose(p.inverse())
    np.testing.assert_allclose(np.asarray(ident.R), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ident.t), 0, atol=1e-5)


def test_camera_is_pytree_and_vmappable():
    cams = Camera(
        K=jnp.stack([jnp.eye(3) * s for s in (1.0, 2.0)]),
        dist=jnp.zeros((2, 5)),
    )
    pts = jnp.ones((2, 4, 3))
    out = jax.vmap(lambda c, p: c.project(p))(cams, pts)
    assert out.shape == (2, 4, 2)


def test_scaled_intrinsics():
    cam = Camera.create(fx=100.0, fy=100.0, cx=50.0, cy=40.0)
    s = cam.scaled(0.25)
    assert np.isclose(float(s.fx), 25.0)
    assert np.isclose(float(s.cx), 12.5)
