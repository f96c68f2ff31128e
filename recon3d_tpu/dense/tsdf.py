"""TSDF fusion of per-view depth maps into a voxel volume — the mesh stage.

Capability beyond the reference (which stops at point clouds, README.md
output list): fuse the PatchMatch/plane-sweep depth maps into a truncated
signed distance volume and extract a triangle mesh (dense/mesh.py). The
volumetric integration is TPU-shaped: the whole voxel grid is projected
into every view as one batched computation under a lax.scan over views —
no per-voxel control flow, static shapes throughout — and the per-view
depth lookup reuses the gather-free MXU/Pallas sampling path
(ops/image.bilinear_sample_auto at snapped coordinates = nearest-neighbor,
correct across depth discontinuities where bilinear would blend surfaces).

Curless & Levoy volumetric integration; weights from the MVS confidence
maps so low-support depth pixels contribute proportionally less.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from recon3d_tpu.ops.image import bilinear_sample_auto


class TSDFVolume(NamedTuple):
    tsdf: np.ndarray    # (N, N, N) float32 in [-1, 1]
    weight: np.ndarray  # (N, N, N) float32 accumulated weights
    origin: np.ndarray  # (3,) world position of voxel (0,0,0) CENTER
    voxel: float        # voxel edge length (world units)
    trunc: float        # truncation distance (world units)


def bounds_from_points(
    points: np.ndarray, margin: float = 0.05
) -> Tuple[np.ndarray, np.ndarray]:
    """Robust (1st/99th percentile) axis-aligned bounds with relative margin."""
    lo = np.percentile(points, 1, axis=0)
    hi = np.percentile(points, 99, axis=0)
    pad = (hi - lo).max() * margin + 1e-6
    return lo - pad, hi + pad


@functools.partial(jax.jit, static_argnames=("n",))
def _integrate_views(
    depths: jnp.ndarray,   # (V, H, W)
    confs: jnp.ndarray,    # (V, H, W) >= 0; 0 = invalid pixel
    K: jnp.ndarray,        # (3, 3)
    Rs: jnp.ndarray,       # (V, 3, 3)
    ts: jnp.ndarray,       # (V, 3)
    origin: jnp.ndarray,   # (3,)
    voxel: jnp.ndarray,    # scalar
    trunc: jnp.ndarray,    # scalar
    n: int,
):
    """Fuse V depth maps into an (n, n, n) TSDF. One scan step per view:
    project all n^3 voxel centers, nearest-sample depth + confidence, and
    running-average the truncated SDF. Flattened (n^3,) layout keeps every
    op a big dense vector op."""
    idx = jnp.arange(n, dtype=jnp.float32)
    zz, yy, xx = jnp.meshgrid(idx, idx, idx, indexing="ij")
    X = origin[None, :] + voxel * jnp.stack(
        [xx.reshape(-1), yy.reshape(-1), zz.reshape(-1)], axis=-1
    )  # (M, 3) world voxel centers, x fastest

    def step(carry, view):
        tsdf, weight = carry
        depth, conf, R, t = view
        Xc = jnp.einsum("ij,mj->mi", R, X) + t[None, :]
        z = Xc[:, 2]
        u = K[0, 0] * Xc[:, 0] / z + K[0, 2]
        v = K[1, 1] * Xc[:, 1] / z + K[1, 2]
        # nearest-neighbor lookup: snapped coords make the bilinear tent a
        # one-hot — exact nearest, no blending across depth edges
        uv = jnp.stack([jnp.round(u), jnp.round(v)], axis=-1)
        d, valid = bilinear_sample_auto(depth, uv, fill=0.0)
        w_px, _ = bilinear_sample_auto(conf, uv, fill=0.0)
        sdf = (d - z) / trunc
        ok = (
            valid
            & (z > 1e-6)
            & (d > 1e-6)
            & (sdf > -1.0)  # integrate only up to one truncation band behind
            & jnp.isfinite(sdf)
        )
        w = jnp.where(ok, jnp.maximum(w_px, 0.0), 0.0)
        s = jnp.clip(sdf, -1.0, 1.0)
        new_w = weight + w
        tsdf = jnp.where(
            new_w > 0, (tsdf * weight + s * w) / jnp.maximum(new_w, 1e-12),
            tsdf,
        )
        return (tsdf, new_w), None

    M = n * n * n
    init = (jnp.ones(M, jnp.float32), jnp.zeros(M, jnp.float32))
    (tsdf, weight), _ = jax.lax.scan(step, init, (depths, confs, Rs, ts))
    return tsdf.reshape(n, n, n), weight.reshape(n, n, n)


def fuse_tsdf(
    depths: np.ndarray,
    confs: Optional[np.ndarray],
    K: np.ndarray,
    Rs: np.ndarray,
    ts: np.ndarray,
    bounds: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    resolution: int = 128,
    trunc_voxels: float = 3.0,
    min_conf: float = 0.0,
    sparse_points: Optional[np.ndarray] = None,
) -> TSDFVolume:
    """Fuse per-view depth maps into a TSDF volume.

    depths: (V, H, W) world-unit depths, 0 = invalid.
    confs:  (V, H, W) per-pixel weights (MVS consistency counts) or None.
    bounds: (lo, hi) world AABB; derived from sparse_points (or from the
            depth maps' backprojection) when omitted.
    resolution: voxels per axis. trunc_voxels: truncation in voxel units.
    """
    depths = np.asarray(depths, np.float32)
    V, H, W = depths.shape
    if confs is None:
        confs = (depths > 0).astype(np.float32)
    else:
        confs = np.where(
            np.asarray(confs, np.float32) >= min_conf,
            np.asarray(confs, np.float32), 0.0,
        ).astype(np.float32)
    confs = np.where(depths > 0, confs, 0.0)

    if bounds is None:
        if sparse_points is not None and len(sparse_points) >= 20:
            bounds = bounds_from_points(np.asarray(sparse_points))
        else:
            pts = _backproject_samples(depths, K, Rs, ts)
            if len(pts) < 8:
                raise ValueError("no valid depth pixels to bound the volume")
            bounds = bounds_from_points(pts)
    lo, hi = np.asarray(bounds[0], np.float64), np.asarray(bounds[1], np.float64)
    voxel = float((hi - lo).max() / (resolution - 1))
    trunc = trunc_voxels * voxel

    tsdf, weight = _integrate_views(
        jnp.asarray(depths),
        jnp.asarray(confs),
        jnp.asarray(K, jnp.float32),
        jnp.asarray(Rs, jnp.float32),
        jnp.asarray(ts, jnp.float32),
        jnp.asarray(lo, jnp.float32),
        jnp.float32(voxel),
        jnp.float32(trunc),
        n=int(resolution),
    )
    return TSDFVolume(
        tsdf=np.asarray(tsdf),
        weight=np.asarray(weight),
        origin=lo.astype(np.float32),
        voxel=voxel,
        trunc=trunc,
    )


def _backproject_samples(
    depths: np.ndarray, K: np.ndarray, Rs: np.ndarray, ts: np.ndarray,
    stride: int = 4,
) -> np.ndarray:
    """Host-side sparse backprojection of the depth maps (bounds estimate)."""
    V, H, W = depths.shape
    ys, xs = np.mgrid[0:H:stride, 0:W:stride]
    out = []
    Kinv = np.linalg.inv(np.asarray(K, np.float64))
    for v in range(V):
        d = depths[v, ys, xs]
        m = d > 0
        if not m.any():
            continue
        pix = np.stack([xs[m], ys[m], np.ones(m.sum())], axis=0)
        Xc = (Kinv @ pix) * d[m][None, :]
        Xw = Rs[v].T @ (Xc - ts[v][:, None])
        out.append(Xw.T)
    return np.concatenate(out, axis=0) if out else np.zeros((0, 3))
