"""P3P minimal solver + low-inlier-ratio PnP RANSAC (VERDICT r2 #3).

The reference's registration robustness comes from cv.solvePnPRansac's
P3P/EPNP branches (reference src/core/sfm_pipeline.py:567-584): a 3-point
minimal sample survives outlier contamination ~eps^-3 vs the 6-point DLT's
eps^-6. These tests pin (a) the closed-form quartic, (b) pose recovery from
clean triples, and (c) the end criterion — a registration that the 6-point
DLT pool alone fails at ~25% inlier ratio and the mixed DLT+P3P pool passes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recon3d_tpu.ops.pnp import (
    _quartic_roots,
    p3p_grunert,
    pnp_ransac_multi,
)


def _rot(rng, scale=0.5):
    """Random rotation via axis-angle (Rodrigues)."""
    w = rng.normal(size=3) * scale
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * (Kx @ Kx)


def test_quartic_roots_vs_numpy(rng):
    for _ in range(20):
        c = rng.normal(size=5)
        c[0] = np.sign(c[0]) * (abs(c[0]) + 0.3)
        roots, ok = _quartic_roots(*[jnp.float32(x) for x in c])
        got = np.sort(np.asarray(roots)[np.asarray(ok)])
        true = np.roots(c)
        true = np.sort(true[np.abs(true.imag) < 1e-6].real)
        assert len(got) == len(true)
        if len(true):
            np.testing.assert_allclose(got, true, rtol=2e-3, atol=2e-3)


def test_p3p_recovers_pose(rng):
    recovered = 0
    trials = 30
    for _ in range(trials):
        R = _rot(rng)
        t = rng.normal(size=3)
        t[2] = abs(t[2]) + 4.0
        X = rng.normal(size=(3, 3)) * 1.5
        Xc = X @ R.T + t
        if (Xc[:, 2] < 0.5).any():  # P3P assumes points in front
            continue
        xn = Xc[:, :2] / Xc[:, 2:3]
        models, valid = p3p_grunert(
            jnp.asarray(X, jnp.float32), jnp.asarray(xn, jnp.float32)
        )
        models, valid = np.asarray(models), np.asarray(valid)
        errs = [
            np.linalg.norm(m[:9].reshape(3, 3) - R) + np.linalg.norm(m[9:] - t)
            for m, v in zip(models, valid) if v
        ]
        if errs and min(errs) < 1e-2:
            recovered += 1
        trials_run = True
    assert recovered >= 0.9 * trials * 0.8  # nearly all valid trials recover


def _low_inlier_problem(rng, n=240, inlier_ratio=0.25):
    K = np.array([[400.0, 0, 160], [0, 400, 120], [0, 0, 1]], np.float32)
    R = _rot(rng, 0.4)
    t = rng.normal(size=3)
    t[2] = abs(t[2]) + 5.0
    n_in = int(n * inlier_ratio)
    # inlier 3D points in front of the camera
    X = np.zeros((n, 3), np.float32)
    x = np.zeros((n, 2), np.float32)
    count = 0
    while count < n_in:
        Xi = rng.normal(size=3) * 2.0
        Xc = R @ Xi + t
        if Xc[2] < 1.0:
            continue
        uv = K @ (Xc / Xc[2])
        if not (0 <= uv[0] < 320 and 0 <= uv[1] < 240):
            continue
        X[count] = Xi
        x[count] = uv[:2] + rng.normal(size=2) * 0.3
        count += 1
    # outliers: valid 3D points paired with unrelated pixels
    for i in range(n_in, n):
        Xi = rng.normal(size=3) * 2.0
        Xi[2] = abs(Xi[2])
        X[i] = Xi
        x[i] = [rng.uniform(0, 320), rng.uniform(0, 240)]
    perm = rng.permutation(n)
    return K, R, t, X[perm], x[perm], n_in


def _rot_err_deg(Ra, Rb):
    c = np.clip((np.trace(Ra.T @ Rb) - 1) / 2, -1, 1)
    return np.degrees(np.arccos(c))


def test_pnp_ransac_low_inlier_ratio(rng):
    """At ~25% inliers the 6-point-DLT-only pool fails (success prob per
    sample ~0.25^6 = 2.4e-4) while the mixed pool's P3P half succeeds
    (~0.25^3 = 1.6e-2 per triple). This is the registration regime the
    reference's SOLVEPNP_P3P branch exists for."""
    K, R, t, X, x, n_in = _low_inlier_problem(rng, inlier_ratio=0.25)
    thr = jnp.asarray([3.0], jnp.float32)
    valid = jnp.ones(len(X), jnp.float32)
    key = jax.random.PRNGKey(11)

    res_mixed = pnp_ransac_multi(
        key, jnp.asarray(K), jnp.asarray(X), jnp.asarray(x), valid, thr,
        num_hypotheses=1024, use_p3p=True,
    )
    R_m = np.asarray(res_mixed.R[0])
    assert int(res_mixed.num_inliers[0]) >= 0.8 * n_in
    assert _rot_err_deg(R_m, R) < 0.5
    np.testing.assert_allclose(np.asarray(res_mixed.t[0]), t, atol=0.05)

    res_dlt = pnp_ransac_multi(
        key, jnp.asarray(K), jnp.asarray(X), jnp.asarray(x), valid, thr,
        num_hypotheses=1024, use_p3p=False,
    )
    # the DLT-only pool must demonstrably fail here — if this ever starts
    # passing, raise the outlier ratio so the P3P test stays meaningful
    assert (
        int(res_dlt.num_inliers[0]) < 0.8 * n_in
        or _rot_err_deg(np.asarray(res_dlt.R[0]), R) > 0.5
    )


def test_pnp_ransac_high_inlier_unchanged(rng):
    """The mixed pool must not regress the easy (inlier-rich) regime."""
    K, R, t, X, x, n_in = _low_inlier_problem(rng, inlier_ratio=0.8)
    thr = jnp.asarray([3.0], jnp.float32)
    res = pnp_ransac_multi(
        jax.random.PRNGKey(0), jnp.asarray(K), jnp.asarray(X),
        jnp.asarray(x), jnp.ones(len(X), jnp.float32), thr,
        num_hypotheses=512,
    )
    assert int(res.num_inliers[0]) >= 0.9 * n_in
    assert _rot_err_deg(np.asarray(res.R[0]), R) < 0.2
    np.testing.assert_allclose(np.asarray(res.t[0]), t, atol=0.02)


def test_epnp_recovers_pose(rng):
    """Noise-free non-planar sample: one of EPnP's two null-space
    candidates recovers the exact pose."""
    from recon3d_tpu.ops.pnp import epnp

    hits = 0
    for _ in range(20):
        R = _rot(rng)
        t = rng.normal(size=3)
        t[2] = abs(t[2]) + 4.0
        X = rng.normal(size=(8, 3)) * 1.5
        Xc = X @ R.T + t
        if (Xc[:, 2] < 0.5).any():
            continue
        xn = Xc[:, :2] / Xc[:, 2:3]
        models, valid = epnp(
            jnp.asarray(X, jnp.float32), jnp.asarray(xn, jnp.float32)
        )
        models, valid = np.asarray(models), np.asarray(valid)
        best = 1e9
        for m, ok in zip(models, valid):
            if not ok:
                continue
            Rm = m[:9].reshape(3, 3)
            tm = m[9:]
            cos = np.clip((np.trace(Rm @ R.T) - 1) / 2, -1, 1)
            best = min(best, np.degrees(np.arccos(cos)) + np.linalg.norm(tm - t))
        if best < 0.5:
            hits += 1
    assert hits >= 15, hits


def test_epnp_wins_on_planar(rng):
    """PLANAR scene with noise: the 6-point DLT's projection-matrix null
    space is rank-deficient (a plane admits a projective ambiguity), while
    EPnP's control-point parameterization stays well-posed — the regime the
    reference covers with its SOLVEPNP_EPNP cascade branch
    (src/core/sfm_pipeline.py:567-584)."""
    from recon3d_tpu.ops.pnp import epnp, pnp_dlt

    wins_ep, wins_dlt = 0, 0
    for trial in range(12):
        r = np.random.default_rng(200 + trial)
        R = _rot(r)
        t = r.normal(size=3)
        t[2] = abs(t[2]) + 5.0
        # points on the z=0 world plane
        X = np.concatenate(
            [r.uniform(-2, 2, size=(16, 2)), np.zeros((16, 1))], axis=1
        )
        Xc = X @ R.T + t
        if (Xc[:, 2] < 0.5).any():
            continue
        xn = Xc[:, :2] / Xc[:, 2:3] + r.normal(scale=5e-4, size=(16, 2))

        def err_of(Rm, tm):
            cos = np.clip((np.trace(np.asarray(Rm) @ R.T) - 1) / 2, -1, 1)
            return np.degrees(np.arccos(cos))

        models, valid = epnp(
            jnp.asarray(X, jnp.float32), jnp.asarray(xn, jnp.float32)
        )
        e_ep = min(
            (err_of(m[:9].reshape(3, 3), m[9:])
             for m, ok in zip(np.asarray(models), np.asarray(valid)) if ok),
            default=180.0,
        )
        R_d, t_d = pnp_dlt(
            jnp.asarray(X, jnp.float32), jnp.asarray(xn, jnp.float32),
            jnp.ones(16),
        )
        e_dlt = err_of(R_d, np.asarray(t_d))
        if e_ep < 1.0:
            wins_ep += 1
        if e_dlt < 1.0:
            wins_dlt += 1
    # EPnP must be reliable on planar data; the DLT must NOT be (otherwise
    # this test guards nothing)
    assert wins_ep >= 9, (wins_ep, wins_dlt)
    assert wins_dlt <= wins_ep - 3, (wins_ep, wins_dlt)


def test_pnp_wave_indexed_matches_dense(rng):
    """estimate_pose_pnp_wave_indexed (device-side gathers from index
    tables) must reproduce estimate_pose_pnp_wave (dense operands) exactly
    — same keys, same hypothesis pool, same acceptance surface."""
    from recon3d_tpu.ops.estimation import (
        estimate_pose_pnp_wave, estimate_pose_pnp_wave_indexed,
    )

    B, cap, P = 4, 256, 512
    K = jnp.asarray([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]], jnp.float32)
    P_table = jnp.asarray(
        np.concatenate(
            [rng.normal(size=(P, 2)), rng.uniform(3, 8, size=(P, 1))], axis=1
        ).astype(np.float32)
    )
    kp_flat = jnp.asarray(
        rng.uniform(0, 320, size=(P * 2, 2)).astype(np.float32)
    )
    pid_idx = np.full((B, cap), -1, np.int32)
    kp_idx = np.zeros((B, cap), np.int32)
    counts = [60, 120, 200, 256]
    for b in range(B):
        n = counts[b]
        pid_idx[b, :n] = rng.choice(P, size=n, replace=False)
        kp_idx[b, :n] = rng.choice(P * 2, size=n, replace=False)
    thr = jnp.asarray([4.0, 8.0], jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(9), B)

    res_i = estimate_pose_pnp_wave_indexed(
        keys, K, P_table, kp_flat,
        jnp.asarray(pid_idx), jnp.asarray(kp_idx), thr,
        num_hypotheses=512,
    )
    # dense operands materialized on the host the way the old wave did
    Xd = np.asarray(P_table)[np.clip(pid_idx, 0, P - 1)]
    xd = np.asarray(kp_flat)[np.clip(kp_idx, 0, 2 * P - 1)]
    vd = (pid_idx >= 0).astype(np.float32)
    Xd[pid_idx < 0] = 0.0
    xd[pid_idx < 0] = 0.0
    res_d = estimate_pose_pnp_wave(
        keys, K, jnp.asarray(Xd), jnp.asarray(xd), jnp.asarray(vd), thr,
        num_hypotheses=512,
    )
    np.testing.assert_array_equal(
        np.asarray(res_i.num_inliers), np.asarray(res_d.num_inliers)
    )
    np.testing.assert_allclose(
        np.asarray(res_i.R), np.asarray(res_d.R), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res_i.t), np.asarray(res_d.t), atol=1e-6
    )
