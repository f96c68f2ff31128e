"""Chessboard corner detection, TPU-native.

Replaces cv.findChessboardCorners + cv.cornerSubPix (reference
calibration.py:60-64): the dense response, non-max suppression, top-k
selection, and subpixel refinement are one jitted program; only the
O(corners) grid-ordering step runs on host.

Detector: chessboard X-corners are saddle points of the intensity surface,
so the response is the negated Hessian determinant  Ixy^2 - Ixx*Iyy  of a
Gaussian-smoothed image (large and positive exactly at saddles, ~0 on edges
and blobs). Subpixel refinement solves the 2x2 quadratic-fit step on the
response map, vmapped over corners.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from recon3d_tpu.ops.image import gaussian_blur

_HI = jax.lax.Precision.HIGHEST


class CornerCandidates(NamedTuple):
    xy: jnp.ndarray        # (K, 2) subpixel positions (x, y)
    response: jnp.ndarray  # (K,)
    valid: jnp.ndarray     # (K,) bool


def saddle_response(gray: jnp.ndarray, sigma: float = 1.5) -> jnp.ndarray:
    """Negated Hessian determinant of the smoothed image: positive at
    X-corners (saddles), ~0 elsewhere."""
    g = gaussian_blur(gray, sigma)
    gy, gx = jnp.gradient(g)
    gxy, gxx = jnp.gradient(gx)
    gyy, _ = jnp.gradient(gy)
    return gxy * gxy - gxx * gyy


def _nms(resp: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Keep only local maxima within a (2r+1)^2 window."""
    r = radius
    m = resp
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue
            m = jnp.maximum(m, jnp.roll(resp, (dy, dx), axis=(0, 1)))
    return resp >= m


@functools.partial(
    jax.jit,
    static_argnames=("max_corners", "nms_radius", "sigma", "rel_threshold"),
)
def detect_corners(
    gray: jnp.ndarray,
    max_corners: int = 128,
    nms_radius: int = 5,
    sigma: float = 1.5,
    rel_threshold: float = 0.15,
) -> CornerCandidates:
    """Detect up to max_corners saddle points with subpixel refinement.

    Returns padded CornerCandidates; `valid` marks entries above
    rel_threshold * max_response.
    """
    H, W = gray.shape
    resp = saddle_response(gray, sigma)
    # suppress the border (gradient edge effects)
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = (yy >= 4) & (yy < H - 4) & (xx >= 4) & (xx < W - 4)
    resp = jnp.where(inside & _nms(resp, nms_radius), resp, 0.0)

    flat = resp.reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_corners)
    iy = (idx // W).astype(jnp.float32)
    ix = (idx % W).astype(jnp.float32)
    valid = vals > rel_threshold * vals[0]

    # Subpixel: quadratic fit of the response around each peak.
    resp_s = gaussian_blur(resp, 1.0)

    def refine(y, x):
        yi = y.astype(jnp.int32)
        xi = x.astype(jnp.int32)

        def at(dy, dx):
            return resp_s[
                jnp.clip(yi + dy, 0, H - 1), jnp.clip(xi + dx, 0, W - 1)
            ]

        dxx = at(0, 1) + at(0, -1) - 2 * at(0, 0)
        dyy = at(1, 0) + at(-1, 0) - 2 * at(0, 0)
        dxy = 0.25 * (at(1, 1) + at(-1, -1) - at(1, -1) - at(-1, 1))
        gx = 0.5 * (at(0, 1) - at(0, -1))
        gy = 0.5 * (at(1, 0) - at(-1, 0))
        det = dxx * dyy - dxy * dxy
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        ox = -(dyy * gx - dxy * gy) / det
        oy = -(dxx * gy - dxy * gx) / det
        ox = jnp.clip(ox, -1.0, 1.0)
        oy = jnp.clip(oy, -1.0, 1.0)
        return jnp.stack([x + ox, y + oy])

    xy = jax.vmap(refine)(iy, ix)
    return CornerCandidates(xy=xy, response=vals, valid=valid)


def order_chessboard_corners(
    xy: np.ndarray,
    pattern: Tuple[int, int] = (9, 6),
    response: Optional[np.ndarray] = None,
) -> Optional[np.ndarray]:
    """Organize detected corner candidates into a (rows*cols, 2) grid in
    row-major board order (host-side, O(corners) — the analogue of the
    ordering cv.findChessboardCorners performs internally).

    Approach: greedy lattice growth. Seed at the candidate nearest the
    centroid, take its two most orthogonal nearest-neighbor directions as the
    initial basis, then BFS over integer lattice cells, predicting each new
    cell by local parallelogram extrapolation from already-placed neighbors
    and snapping to the nearest unused candidate. Local prediction tolerates
    the perspective foreshortening that breaks a single global basis fit.
    Returns None if no full cols x rows window is found.
    """
    cols, rows = pattern
    need = cols * rows
    n = len(xy)
    if n < need:
        return None

    d2 = ((xy[None, :, :] - xy[:, None, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)

    # seed: candidate nearest the cloud centroid
    seed = int(np.argmin(((xy - xy.mean(0)) ** 2).sum(-1)))
    order = np.argsort(d2[seed])
    v1 = xy[order[0]] - xy[seed]
    v2 = None
    for cand in order[1:6]:
        v = xy[cand] - xy[seed]
        cosang = abs(v @ v1) / (np.linalg.norm(v) * np.linalg.norm(v1) + 1e-12)
        if cosang < 0.5:  # roughly orthogonal in the image
            v2 = v
            break
    if v2 is None:
        return None

    # BFS lattice growth
    placed = {(0, 0): seed, (1, 0): int(order[0])}
    v2_idx = int(np.argmin(((xy - (xy[seed] + v2)) ** 2).sum(-1)))
    placed[(0, 1)] = v2_idx
    used = set(placed.values())
    frontier = list(placed.keys())

    def predict(cell):
        """Parallelogram/linear extrapolation from placed neighbors."""
        i, j = cell
        # parallelogram: p(i,j) = p(i-di,j) + p(i,j-dj) - p(i-di,j-dj)
        for di, dj in ((1, 1), (1, -1), (-1, 1), (-1, -1)):
            a, b, c = (i - di, j), (i, j - dj), (i - di, j - dj)
            if a in placed and b in placed and c in placed:
                return xy[placed[a]] + xy[placed[b]] - xy[placed[c]]
        # linear: p(i,j) = 2 p(i-di,j-dj) - p(i-2di,j-2dj) along an axis
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            a, b = (i - di, j - dj), (i - 2 * di, j - 2 * dj)
            if a in placed and b in placed:
                return 2 * xy[placed[a]] - xy[placed[b]]
        return None

    step = min(np.linalg.norm(v1), np.linalg.norm(v2))
    while frontier:
        cell = frontier.pop()
        i, j = cell
        for nb in ((i + 1, j), (i - 1, j), (i, j + 1), (i, j - 1)):
            if nb in placed:
                continue
            pred = predict(nb)
            if pred is None:
                continue
            k = int(np.argmin(((xy - pred) ** 2).sum(-1)))
            if k in used:
                continue
            if np.linalg.norm(xy[k] - pred) > 0.35 * step:
                continue
            placed[nb] = k
            used.add(k)
            frontier.append(nb)

    if len(placed) < need:
        return None

    # Find the best fully-populated cols x rows (or transposed) window.
    # The lattice usually extends past the inner corners (the board's outer
    # boundary also produces saddles), so several windows can be fully
    # populated; score each by total detector response — inner X-corners
    # (black/white on both diagonals) respond far stronger than boundary
    # corners against the background.
    if response is None:
        response = np.ones(len(xy))
    best = None
    best_score = -np.inf
    keys = np.array(list(placed.keys()))
    for (w, h) in ((cols, rows), (rows, cols)):
        for i0 in range(keys[:, 0].min(), keys[:, 0].max() - w + 2):
            for j0 in range(keys[:, 1].min(), keys[:, 1].max() - h + 2):
                want = [
                    (i0 + di, j0 + dj) for dj in range(h) for di in range(w)
                ]
                if not all(c in placed for c in want):
                    continue
                idx = [placed[c] for c in want]
                score = float(response[idx].sum())
                if score > best_score:
                    best_score = score
                    grid = xy[idx].reshape(h, w, 2)
                    if (w, h) != (cols, rows):
                        grid = np.transpose(grid, (1, 0, 2))[::-1]
                    best = _canonical_order(grid.reshape(rows, cols, 2))
    return best


def _canonical_order(grid: np.ndarray) -> np.ndarray:
    """Flip the (rows, cols, 2) grid so it reads left-to-right, top-to-bottom
    in image coordinates (deterministic output order, like OpenCV)."""
    rows, cols = grid.shape[:2]
    if grid[0, 0, 0] > grid[0, -1, 0]:
        grid = grid[:, ::-1]
    if grid[0, 0, 1] > grid[-1, 0, 1]:
        grid = grid[::-1]
    return grid.reshape(rows * cols, 2).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("half_window", "iterations"))
def refine_corners_gradient(
    gray: jnp.ndarray,
    xy: jnp.ndarray,
    half_window: int = 5,
    iterations: int = 4,
) -> jnp.ndarray:
    """Gradient-orthogonality subpixel refinement (cv.cornerSubPix's scheme,
    reference calibration.py:64): at a true corner q, every window gradient
    is orthogonal to (p - q), so q solves  (sum w g g^T) q = sum w g g^T p.
    Bilinear-sampled gradients, Gaussian window, fixed iteration count,
    vmapped over corners."""
    from recon3d_tpu.ops.image import bilinear_sample, central_gradients

    g = gaussian_blur(gray, 1.0)
    gx, gy = central_gradients(g)

    r = half_window
    oy, ox = jnp.meshgrid(
        jnp.arange(-r, r + 1, dtype=gray.dtype),
        jnp.arange(-r, r + 1, dtype=gray.dtype),
        indexing="ij",
    )
    w = jnp.exp(-(ox * ox + oy * oy) / (2.0 * (0.6 * r) ** 2)).reshape(-1)
    offsets = jnp.stack([ox, oy], axis=-1).reshape(-1, 2)  # (M, 2) (x, y)

    def one(q):
        def body(_, q):
            p = q[None, :] + offsets  # (M, 2)
            sx, okx = bilinear_sample(gx, p)
            sy, _ = bilinear_sample(gy, p)
            wm = w * okx.astype(gray.dtype)
            a11 = jnp.sum(wm * sx * sx)
            a12 = jnp.sum(wm * sx * sy)
            a22 = jnp.sum(wm * sy * sy)
            b1 = jnp.sum(wm * (sx * sx * p[:, 0] + sx * sy * p[:, 1]))
            b2 = jnp.sum(wm * (sx * sy * p[:, 0] + sy * sy * p[:, 1]))
            det = a11 * a22 - a12 * a12
            det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
            qn = jnp.stack(
                [(a22 * b1 - a12 * b2) / det, (a11 * b2 - a12 * b1) / det]
            )
            # reject divergent steps
            return jnp.where(jnp.linalg.norm(qn - q) < r, qn, q)

        return jax.lax.fori_loop(0, iterations, body, q)

    return jax.vmap(one)(xy)


def find_chessboard(
    gray: np.ndarray,
    pattern: Tuple[int, int] = (9, 6),
    sigma: float = 1.5,
) -> Optional[np.ndarray]:
    """Full detection: response + NMS + subpixel on device, ordering on host,
    gradient-orthogonality refinement of the ordered grid on device.

    Returns (rows*cols, 2) float32 corners in row-major board order, or None.
    """
    cols, rows = pattern
    gray_j = jnp.asarray(gray, jnp.float32)
    cand = detect_corners(
        gray_j,
        max_corners=max(2 * cols * rows, 128),
        sigma=sigma,
    )
    ok = np.asarray(cand.valid)
    xy = np.asarray(cand.xy)[ok]
    resp = np.asarray(cand.response)[ok]
    if len(xy) < cols * rows:
        return None
    grid = order_chessboard_corners(xy, pattern, response=resp)
    if grid is None:
        return None
    return np.asarray(
        refine_corners_gradient(gray_j, jnp.asarray(grid))
    ).astype(np.float32)
