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


def test_schur_step_matches_dense_solve(rng):
    """The Schur-reduced CG step equals the dense damped-normal-equations
    solution (gauge rows deleted) on a small problem."""
    import jax
    import jax.numpy as jnp

    from recon3d_tpu.sfm import bundle as B

    scene, poses, points, observations, kp_xy = _perturbed_problem(
        rng, n_cams=3, n_points=24)
    K = scene["K"]

    # build BAData exactly as bundle_adjust does (reuse its internals by
    # running zero LM iterations is not exposed; construct directly)
    cam_ids = sorted(poses.keys())
    oc, op, oxy = [], [], []
    for pid, obs in enumerate(observations):
        for (cam, kp) in obs:
            oc.append(cam)
            op.append(pid)
            oxy.append(kp_xy[cam][kp])
    O = len(oc)
    C, P = len(cam_ids), len(points)
    pt_start = np.searchsorted(op, np.arange(P), side="left").astype(np.int32)
    pt_end = np.searchsorted(op, np.arange(P), side="right").astype(np.int32)
    cam_perm = np.argsort(np.asarray(oc), kind="stable").astype(np.int32)
    oc_sorted = np.asarray(oc)[cam_perm]
    cam_start = np.searchsorted(oc_sorted, np.arange(C), side="left").astype(np.int32)
    cam_end = np.searchsorted(oc_sorted, np.arange(C), side="right").astype(np.int32)
    data = B.BAData(
        K=jnp.asarray(K, jnp.float32),
        R0=jnp.asarray(np.stack([poses[c][0] for c in cam_ids])),
        t0=jnp.asarray(np.stack([poses[c][1] for c in cam_ids]), jnp.float32),
        X0=jnp.asarray(points),
        obs_cam=jnp.asarray(oc, jnp.int32),
        obs_pt=jnp.asarray(op, jnp.int32),
        obs_xy=jnp.asarray(np.asarray(oxy), jnp.float32),
        obs_w=jnp.ones(O, jnp.float32),
        pt_start=jnp.asarray(pt_start), pt_end=jnp.asarray(pt_end),
        cam_perm=jnp.asarray(cam_perm),
        cam_start=jnp.asarray(cam_start), cam_end=jnp.asarray(cam_end),
    )
    params = B.BAParams(xi=jnp.zeros((C, 6)), dX=jnp.zeros((P, 3)))
    damping = jnp.float32(1e-3)
    delta = jnp.float32(1e9)  # no robustification: pure GN comparison

    cand, cost0, cost1 = B._lm_step(params, data, damping, delta,
                                    cg_iters=200)
    dx_schur = np.concatenate([
        np.asarray(cand.xi).reshape(-1), np.asarray(cand.dX).reshape(-1)
    ])

    # dense reference: J via jacfwd of the flat residual vector
    def res_flat(v):
        p = B.BAParams(xi=v[: C * 6].reshape(C, 6),
                       dX=v[C * 6:].reshape(P, 3))
        return B._residuals(p, data, jnp.ones(O))

    x0 = jnp.zeros(C * 6 + P * 3)
    J = np.asarray(jax.jacfwd(res_flat)(x0))
    r = np.asarray(res_flat(x0))
    H = J.T @ J
    g = J.T @ r
    lam = float(damping) * np.diag(H) + 1e-8
    A = H + np.diag(lam)
    free = np.ones(C * 6 + P * 3, bool)
    free[:6] = False  # gauge: camera 0 fixed
    dx = np.zeros(C * 6 + P * 3)
    dx[free] = np.linalg.solve(A[np.ix_(free, free)], -g[free])

    denom = max(np.linalg.norm(dx), 1e-9)
    assert np.linalg.norm(dx_schur - dx) / denom < 1e-3
    assert float(cost1) < float(cost0)


def test_ba_sharded_matches_single_device(rng):
    """Observation-sharded BA over the 8-device CPU mesh reproduces the
    single-device solve (VERDICT r2 #5: SURVEY §7 step 11 — the BA CG's
    data-parallel axis). psum changes float reduction order, so the
    comparison is tight-tolerance, not bitwise."""
    from recon3d_tpu.parallel.mesh import make_mesh

    scene, poses, points, obs, kp_xy = _perturbed_problem(
        rng, n_cams=6, n_points=200)
    cfg = BundleConfig(max_iterations=10)
    single_poses, single_points, s_single = bundle_adjust(
        scene["K"], poses, points, obs, kp_xy, cfg,
    )
    mesh = make_mesh()
    assert mesh.shape["data"] >= 2
    mesh_poses, mesh_points, s_mesh = bundle_adjust(
        scene["K"], poses, points, obs, kp_xy, cfg, mesh=mesh,
    )
    assert s_mesh["rms_after"] < 0.5
    assert abs(s_mesh["rms_after"] - s_single["rms_after"]) < 0.05
    np.testing.assert_allclose(mesh_points, single_points, atol=2e-3)
    for c in single_poses:
        np.testing.assert_allclose(
            mesh_poses[c][0], single_poses[c][0], atol=1e-4
        )
        np.testing.assert_allclose(
            mesh_poses[c][1], single_poses[c][1], atol=1e-3
        )


def _obs_to_log(observations):
    return np.asarray(
        [(pid, c, k) for pid, obs in enumerate(observations)
         for (c, k) in obs],
        np.int32,
    )


def test_ba_log_matches_list(rng):
    """bundle_adjust_log (device-resident append-only observation log,
    on-device point-major reorder) must reproduce bundle_adjust exactly:
    identical table content in identical reduction order."""
    from recon3d_tpu.sfm.bundle import bundle_adjust_log

    scene, poses, points, obs, kp_xy = _perturbed_problem(
        rng, n_cams=5, n_points=150)
    cfg = BundleConfig(max_iterations=10)
    list_poses, list_points, s_list = bundle_adjust(
        scene["K"], poses, points, obs, kp_xy, cfg,
    )
    kp_off = np.zeros(len(kp_xy) + 1, np.int64)
    np.cumsum([len(k) for k in kp_xy], out=kp_off[1:])
    kp_flat = np.concatenate([np.asarray(k, np.float32) for k in kp_xy])
    log_poses, log_points, s_log = bundle_adjust_log(
        scene["K"], poses, points, _obs_to_log(obs), (kp_flat, kp_off), cfg,
    )
    assert s_log["rms_after"] < 0.5
    assert abs(s_log["rms_after"] - s_list["rms_after"]) < 1e-4
    np.testing.assert_allclose(log_points, list_points, atol=1e-5)
    for c in list_poses:
        np.testing.assert_allclose(log_poses[c][0], list_poses[c][0], atol=1e-6)
        np.testing.assert_allclose(log_poses[c][1], list_poses[c][1], atol=1e-6)


def test_ba_log_incremental_cache(rng):
    """The tail-only upload path (cache hit, appended rows) and the
    shrink/rebuild fall-through (cache count > current log) both produce
    the same result as a cold full upload."""
    from recon3d_tpu.sfm.bundle import bundle_adjust_log

    scene, poses, points, obs, kp_xy = _perturbed_problem(
        rng, n_cams=5, n_points=150)
    cfg = BundleConfig(max_iterations=10)
    kp_off = np.zeros(len(kp_xy) + 1, np.int64)
    np.cumsum([len(k) for k in kp_xy], out=kp_off[1:])
    kp_flat = np.concatenate([np.asarray(k, np.float32) for k in kp_xy])
    kp_table = (kp_flat, kp_off)
    log = _obs_to_log(obs)

    cache = {}
    # call 1: cold upload of a prefix
    n1 = len(log) - 120
    obs1 = [[(c, k) for (c, k) in o] for o in obs]
    # prefix log must stay consistent: take the first n1 rows
    p1, _, s1 = bundle_adjust_log(
        scene["K"], poses, points, log[:n1], kp_table, cfg,
        device_cache=cache,
    )
    assert cache["log"]["count"] == n1
    # call 2: tail append path (cache hit)
    p2, x2, s2 = bundle_adjust_log(
        scene["K"], poses, points, log, kp_table, cfg,
        device_cache=cache,
    )
    assert cache["log"]["count"] == len(log)
    # reference: cold run on the full log
    p_ref, x_ref, s_ref = bundle_adjust_log(
        scene["K"], poses, points, log, kp_table, cfg,
    )
    np.testing.assert_allclose(x2, x_ref, atol=1e-6)
    for c in p_ref:
        np.testing.assert_allclose(p2[c][0], p_ref[c][0], atol=1e-7)
        np.testing.assert_allclose(p2[c][1], p_ref[c][1], atol=1e-7)
    # call 3: log SHRANK below the cached count at the same cap — must
    # fall through to a full upload (regression: previously an unbound-
    # variable NameError), and still match a cold run on the short log
    short = log[: n1 - 60]
    p3, x3, s3 = bundle_adjust_log(
        scene["K"], poses, points, short, kp_table, cfg,
        device_cache=cache,
    )
    p3r, x3r, s3r = bundle_adjust_log(
        scene["K"], poses, points, short, kp_table, cfg,
    )
    np.testing.assert_allclose(x3, x3r, atol=1e-6)
