"""Synthetic multi-view scene generation for tests and benchmarks.

The reference ships no tests (SURVEY.md §4); ground-truth synthetic scenes are
the backbone of this framework's test strategy: known K/R/t/X let every solver
be checked against exact answers.
"""

from __future__ import annotations

import numpy as np


def random_rotation(rng: np.random.Generator, max_angle: float = 0.5) -> np.ndarray:
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = rng.uniform(-max_angle, max_angle)
    K = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def make_scene(
    rng: np.random.Generator,
    n_points: int = 200,
    n_cams: int = 2,
    image_size=(640, 480),
    noise_px: float = 0.0,
    outlier_frac: float = 0.0,
):
    """Random points in a box observed by cameras on an arc looking at it.

    Returns dict with K, Rs (V,3,3), ts (V,3), X (N,3), obs (V,N,2),
    visible (V,N) — all observations are inside the image and in front of
    every camera (points re-sampled until so).
    """
    W, H = image_size
    f = 0.9 * W
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]])

    # Cameras on an arc of radius ~4 around origin, looking at the origin.
    Rs, ts = [], []
    for i in range(n_cams):
        theta = (i - (n_cams - 1) / 2.0) * (0.25 if n_cams > 1 else 0.0)
        C = np.array(
            [4.0 * np.sin(theta), 0.3 * rng.normal(), -4.0 * np.cos(theta)]
        )
        # look-at origin
        z = -C / np.linalg.norm(C)
        up = np.array([0.0, -1.0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=0)  # world->cam rows
        t = -R @ C
        Rs.append(R)
        ts.append(t)
    Rs = np.array(Rs)
    ts = np.array(ts)

    # Points in a box around the origin; resample any not visible everywhere.
    X = np.zeros((n_points, 3))
    need = np.ones(n_points, dtype=bool)
    for _ in range(200):
        if not need.any():
            break
        cand = rng.uniform([-1.2, -1.0, -1.2], [1.2, 1.0, 1.2], size=(need.sum(), 3))
        X[need] = cand
        ok = np.ones(n_points, dtype=bool)
        for R, t in zip(Rs, ts):
            Xc = X @ R.T + t
            ok &= Xc[:, 2] > 0.3
            uv = (Xc[:, :2] / Xc[:, 2:3]) * f + np.array([W / 2.0, H / 2.0])
            ok &= (uv[:, 0] > 5) & (uv[:, 0] < W - 5) & (uv[:, 1] > 5) & (uv[:, 1] < H - 5)
        need = ~ok

    obs = np.zeros((n_cams, n_points, 2))
    for v, (R, t) in enumerate(zip(Rs, ts)):
        Xc = X @ R.T + t
        uv = Xc[:, :2] / Xc[:, 2:3]
        obs[v, :, 0] = K[0, 0] * uv[:, 0] + K[0, 2]
        obs[v, :, 1] = K[1, 1] * uv[:, 1] + K[1, 2]

    if noise_px > 0:
        obs += rng.normal(scale=noise_px, size=obs.shape)

    n_out = int(outlier_frac * n_points)
    outlier_mask = np.zeros((n_cams, n_points), dtype=bool)
    if n_out > 0:
        for v in range(n_cams):
            idx = rng.choice(n_points, size=n_out, replace=False)
            obs[v, idx] = rng.uniform([0, 0], [W, H], size=(n_out, 2))
            outlier_mask[v, idx] = True

    return dict(
        K=K.astype(np.float32),
        Rs=Rs.astype(np.float32),
        ts=ts.astype(np.float32),
        X=X.astype(np.float32),
        obs=obs.astype(np.float32),
        outliers=outlier_mask,
        image_size=image_size,
    )


def rotation_angle_deg(R1: np.ndarray, R2: np.ndarray) -> float:
    """Geodesic angle between two rotations, degrees."""
    cos = (np.trace(R1.T @ R2) - 1) / 2
    return float(np.degrees(np.arccos(np.clip(cos, -1, 1))))
