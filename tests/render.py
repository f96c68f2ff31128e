"""Synthetic multi-view renderer for end-to-end tests and benchmarks.

Ray-casts a small scene of textured planes (a floor and two walls forming a
box corner) with smooth multi-octave value-noise textures. Texture is a
function of the surface point, so it is consistent across views — SIFT can
detect and match it, giving full ground-truth end-to-end SfM/MVS tests
without any real image data (the reference's sample images were stripped
from the snapshot).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from tests.synthetic import make_scene  # camera arc helper


@dataclass
class Plane:
    origin: np.ndarray   # point on plane
    u: np.ndarray        # in-plane axis 1 (unit)
    v: np.ndarray        # in-plane axis 2 (unit)
    half_u: float
    half_v: float
    seed: int

    @property
    def normal(self):
        n = np.cross(self.u, self.v)
        return n / np.linalg.norm(n)


def _value_noise(u: np.ndarray, v: np.ndarray, seed: int) -> np.ndarray:
    """Smooth multi-octave value noise over (u, v) in [-1, 1]."""
    rng = np.random.default_rng(seed)
    out = np.zeros_like(u)
    amp = 1.0
    for octv in range(7):
        res = 4 * 2**octv
        grid = rng.random((res + 1, res + 1))
        x = (u * 0.5 + 0.5) * res
        y = (v * 0.5 + 0.5) * res
        x0 = np.clip(np.floor(x).astype(int), 0, res - 1)
        y0 = np.clip(np.floor(y).astype(int), 0, res - 1)
        fx = x - x0
        fy = y - y0
        fx = fx * fx * (3 - 2 * fx)
        fy = fy * fy * (3 - 2 * fy)
        val = (
            grid[y0, x0] * (1 - fx) * (1 - fy)
            + grid[y0, x0 + 1] * fx * (1 - fy)
            + grid[y0 + 1, x0] * (1 - fx) * fy
            + grid[y0 + 1, x0 + 1] * fx * fy
        )
        out += amp * val
        amp *= 0.55
    out /= out.max() + 1e-9
    return out


def default_scene_planes() -> List[Plane]:
    e = np.eye(3)
    return [
        # back wall (z = +1.5), facing the cameras at z ~ -4
        Plane(np.array([0.0, 0.0, 1.5]), e[0], e[1], 2.5, 2.0, seed=11),
        # floor (y = +1.2)
        Plane(np.array([0.0, 1.2, 0.0]), e[0], e[2], 2.5, 2.0, seed=22),
        # side wall (x = -2.0)
        Plane(np.array([-2.0, 0.0, 0.0]), e[2], e[1], 2.0, 2.0, seed=33),
    ]


def occluded_scene_planes() -> List[Plane]:
    """The box-corner scene plus two small textured panels floating between
    the camera arc and the walls. They occlude a different slice of the
    background from every viewpoint — the occlusion-heavy robustness
    scenario (matches wide-baseline captures of cluttered scenes, which the
    reference's per-image PnP cascade must also survive)."""
    e = np.eye(3)
    return default_scene_planes() + [
        Plane(np.array([0.7, 0.1, -0.8]), e[0], e[1], 0.5, 0.4, seed=44),
        Plane(np.array([-0.9, -0.4, -0.3]), e[0], e[1], 0.4, 0.5, seed=55),
    ]


def render_views(
    n_views: int = 6,
    image_size: Tuple[int, int] = (192, 256),
    planes: List[Plane] | None = None,
    rng_seed: int = 0,
    arc_step: float = 0.12,
    arc_offset: float = 0.0,
    dist: np.ndarray | None = None,
    roll_step: float = 0.0,
):
    """Render n_views images of the box-corner scene from an arc of cameras.

    arc_offset shifts every camera angle (radians): negative thetas view the
    side wall edge-on and yield few SIFT features, so wide arcs should be
    biased positive (the north-star scenario uses offset = sweep/2).

    dist: optional OpenCV-convention distortion coefficients (k1 k2 p1 p2
    k3). When given, each pixel's ray is cast through the lens model — the
    rendered images are what a camera with (K, dist) captures, so the
    undistort-at-load path (io/dataset.py) can be tested end to end against
    exact ground truth.

    Returns dict with images (V, H, W, 3) float32, gray implied, K, Rs, ts,
    depth (V, H, W) ground-truth depth maps (0 where no hit).
    """
    planes = planes or default_scene_planes()
    H, W = image_size
    f = 0.9 * W
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]], np.float32)

    rng = np.random.default_rng(rng_seed)
    Rs, ts = [], []
    for i in range(n_views):
        theta = (i - (n_views - 1) / 2.0) * arc_step + arc_offset
        C = np.array([3.5 * np.sin(theta), -0.3 + 0.1 * rng.normal(), -3.5 * np.cos(theta)])
        z = -C / np.linalg.norm(C)  # look at origin
        up = np.array([0.0, -1.0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=0)
        if roll_step:
            # in-plane camera roll about the optical axis: view i rolls by
            # i * roll_step radians (stresses orientation invariance of the
            # feature frontend — handheld/drone-style captures)
            a = i * roll_step
            Rr = np.array([
                [np.cos(a), -np.sin(a), 0.0],
                [np.sin(a), np.cos(a), 0.0],
                [0.0, 0.0, 1.0],
            ])
            R = Rr @ R
        t = -R @ C
        Rs.append(R.astype(np.float32))
        ts.append(t.astype(np.float32))

    ys, xs = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5, indexing="ij")
    xn = (xs - K[0, 2]) / K[0, 0]
    yn = (ys - K[1, 2]) / K[1, 1]
    if dist is not None and np.any(np.abs(np.asarray(dist)) > 1e-12):
        # distorted capture: the pixel grid samples DISTORTED normalized
        # coords; the world ray goes through the undistorted ones (same
        # model as render_chessboard below)
        import jax.numpy as jnp

        from recon3d_tpu.ops.image import undistort_points

        und = np.asarray(
            undistort_points(
                jnp.asarray(np.stack([xn, yn], -1), jnp.float32),
                jnp.asarray(dist, jnp.float32),
                iterations=20,
            )
        )
        xn, yn = und[..., 0], und[..., 1]
    dirs_cam = np.stack(
        [xn, yn, np.ones_like(xs)], axis=-1
    )  # (H, W, 3)

    images = np.zeros((n_views, H, W, 3), np.float32)
    depths = np.zeros((n_views, H, W), np.float32)

    for vi, (R, t) in enumerate(zip(Rs, ts)):
        C = -R.T @ t
        dirs = dirs_cam @ R  # world-frame ray directions (unnormalized, z_cam=1)
        best_t = np.full((H, W), np.inf)
        shade = np.zeros((H, W))
        for p in planes:
            n = p.normal
            denom = dirs @ n
            tt = ((p.origin - C) @ n) / np.where(np.abs(denom) < 1e-9, 1e-9, denom)
            pt = C + tt[..., None] * dirs
            lu = (pt - p.origin) @ p.u
            lv = (pt - p.origin) @ p.v
            hit = (tt > 0.1) & (np.abs(lu) <= p.half_u) & (np.abs(lv) <= p.half_v)
            closer = hit & (tt < best_t)
            tex = _value_noise(
                np.where(closer, lu / p.half_u, 0.0),
                np.where(closer, lv / p.half_v, 0.0),
                p.seed,
            )
            shade = np.where(closer, 0.15 + 0.8 * tex, shade)
            best_t = np.where(closer, tt, best_t)
        img = np.repeat(shade[..., None], 3, axis=-1).astype(np.float32)
        # slight per-channel tint so colors are non-trivial
        img *= np.array([1.0, 0.95, 0.9], np.float32)
        images[vi] = img
        depths[vi] = np.where(np.isfinite(best_t), best_t, 0.0)

    return dict(
        images=images,
        K=K,
        Rs=np.array(Rs),
        ts=np.array(ts),
        depth=depths,
        image_size=image_size,
    )


def apply_capture_degradations(
    images: np.ndarray,
    rng_seed: int = 0,
    exposure_range: Tuple[float, float] = (0.65, 1.35),
    vignette_strength: float = 0.35,
    noise_sigma: float = 0.02,
) -> np.ndarray:
    """Per-view photometric degradations of a rendered stack: random
    exposure gain, cos^4-style radial vignetting, and additive Gaussian
    sensor noise. Models real capture variation that the matching frontend
    (NCC windows, SIFT contrast gates) must survive."""
    rng = np.random.default_rng(rng_seed)
    V, H, W = images.shape[:3]
    ys, xs = np.meshgrid(
        np.linspace(-1, 1, H), np.linspace(-1, 1, W), indexing="ij"
    )
    r2 = np.clip(xs * xs + ys * ys, 0, 1.0)
    out = np.empty_like(images)
    for v in range(V):
        gain = rng.uniform(*exposure_range)
        strength = vignette_strength * rng.uniform(0.5, 1.0)
        vig = (1.0 - strength * r2)[..., None]
        noisy = images[v] * gain * vig + rng.normal(
            scale=noise_sigma, size=images[v].shape
        )
        out[v] = np.clip(noisy, 0.0, 1.0)
    return out.astype(np.float32)


def render_chessboard(
    K: np.ndarray,
    dist: np.ndarray,
    rvec: np.ndarray,
    tvec: np.ndarray,
    image_size: Tuple[int, int] = (240, 320),
    pattern: Tuple[int, int] = (9, 6),
    blur_sigma: float = 0.8,
):
    """Render a chessboard (inner-corner `pattern`, unit squares at integer
    board coordinates) through the full K+distortion+pose model. Exact GT for
    calibration tests: the corner pixels are the distorted projections of the
    integer board points."""
    import jax
    import jax.numpy as jnp

    from recon3d_tpu.ops.image import undistort_points, gaussian_blur
    from recon3d_tpu.ops.lie import so3_exp

    H, W = image_size
    cols, rows = pattern
    R = np.asarray(so3_exp(jnp.asarray(rvec, jnp.float32)))

    ys, xs = np.meshgrid(np.arange(H) + 0.0, np.arange(W) + 0.0, indexing="ij")
    xn = (xs - K[0, 2]) / K[0, 0]
    yn = (ys - K[1, 2]) / K[1, 1]
    und = np.asarray(
        undistort_points(
            jnp.asarray(np.stack([xn, yn], -1), jnp.float32),
            jnp.asarray(dist, jnp.float32),
            iterations=20,
        )
    )
    d = np.concatenate([und, np.ones((H, W, 1))], axis=-1)  # camera-frame rays
    n = R[:, 2]  # board normal in camera frame
    denom = d @ n
    s = (np.asarray(tvec) @ n) / np.where(np.abs(denom) < 1e-9, 1e-9, denom)
    Xc = s[..., None] * d
    Xb = (Xc - tvec) @ R  # board frame (z ~ 0)
    u, v = Xb[..., 0], Xb[..., 1]
    inside = (u > -1) & (u < cols) & (v > -1) & (v < rows) & (s > 0)
    checker = ((np.floor(u) + np.floor(v)).astype(int) % 2 == 0)
    img = np.where(inside, np.where(checker, 0.95, 0.08), 0.5).astype(np.float32)
    img = np.asarray(gaussian_blur(jnp.asarray(img), blur_sigma))
    return img
