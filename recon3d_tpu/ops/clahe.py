"""CLAHE — contrast-limited adaptive histogram equalization.

Replaces cv.createCLAHE (reference features.py:76, dense.py:75) with a fully
vectorized XLA formulation: per-tile 256-bin histograms via one-hot matmul
(MXU-friendly), clip + uniform redistribution, CDF lookup tables, and
bilinear blending of the 4 neighboring tile mappings per pixel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BINS = 256


@functools.partial(jax.jit, static_argnames=("grid", "clip_limit"))
def clahe(img: jnp.ndarray, clip_limit: float = 2.0, grid: int = 8) -> jnp.ndarray:
    """img: (H, W) float32 in [0, 1]; returns equalized image in [0, 1].

    H and W must be divisible by `grid` (callers pad-and-crop otherwise;
    the dataset loader sizes images to multiples of the tile grid).
    """
    H, W = img.shape
    th, tw = H // grid, W // grid
    n_px = th * tw

    q = jnp.clip((img * (_BINS - 1)).astype(jnp.int32), 0, _BINS - 1)
    tiles = q.reshape(grid, th, grid, tw).transpose(0, 2, 1, 3).reshape(grid * grid, n_px)

    # Histogram per tile: one-hot (T, n_px, BINS) summed -> (T, BINS).
    onehot = jax.nn.one_hot(tiles, _BINS, dtype=jnp.float32)
    hist = onehot.sum(axis=1)

    # Clip and redistribute excess uniformly (cv.CLAHE semantics).
    limit = jnp.maximum(clip_limit * n_px / _BINS, 1.0)
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / _BINS

    cdf = jnp.cumsum(hist, axis=1)
    cdf_min = cdf[:, :1]
    denom = jnp.maximum(cdf[:, -1:] - cdf_min, 1.0)
    lut = (cdf - cdf_min) / denom  # (T, BINS) in [0, 1]
    lut = lut.reshape(grid, grid, _BINS)

    # Bilinear blend of the 4 surrounding tile LUTs per pixel.
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    gy = jnp.clip(ys / th - 0.5, 0.0, grid - 1.0)
    gx = jnp.clip(xs / tw - 0.5, 0.0, grid - 1.0)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, grid - 2) if grid > 1 else jnp.zeros(H, jnp.int32)
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, grid - 2) if grid > 1 else jnp.zeros(W, jnp.int32)
    fy = (gy - y0).astype(jnp.float32) if grid > 1 else jnp.zeros(H, jnp.float32)
    fx = (gx - x0).astype(jnp.float32) if grid > 1 else jnp.zeros(W, jnp.float32)
    y1 = jnp.minimum(y0 + 1, grid - 1)
    x1 = jnp.minimum(x0 + 1, grid - 1)

    qf = q  # (H, W) bin index per pixel
    Y0 = y0[:, None]
    Y1 = y1[:, None]
    X0 = x0[None, :]
    X1 = x1[None, :]
    v00 = lut[Y0, X0, qf]
    v01 = lut[Y0, X1, qf]
    v10 = lut[Y1, X0, qf]
    v11 = lut[Y1, X1, qf]
    FY = fy[:, None]
    FX = fx[None, :]
    out = (
        v00 * (1 - FY) * (1 - FX)
        + v01 * (1 - FY) * FX
        + v10 * FY * (1 - FX)
        + v11 * FY * FX
    )
    return out
