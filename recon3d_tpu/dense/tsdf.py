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


def _accumulate_views(depths, confs, K, Rs, ts, origin, voxel, trunc, n,
                      axis_name=None):
    """Weighted-sum accumulation over views: returns (num, den) with
    num = sum_v w_v * clamp(sdf_v), den = sum_v w_v, each (n^3,).

    The weighted AVERAGE (Curless-Levoy) is order-independent, so this form
    serves both the single-device scan and the multi-chip path (local
    accumulation per view shard + one psum)."""
    idx = jnp.arange(n, dtype=jnp.float32)
    zz, yy, xx = jnp.meshgrid(idx, idx, idx, indexing="ij")
    X = origin[None, :] + voxel * jnp.stack(
        [xx.reshape(-1), yy.reshape(-1), zz.reshape(-1)], axis=-1
    )  # (M, 3) world voxel centers, x fastest

    def step(carry, view):
        num, den = carry
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
        return (num + s * w, den + w), None

    M = n * n * n
    init = (jnp.zeros(M, jnp.float32), jnp.zeros(M, jnp.float32))
    if axis_name is not None:
        # under shard_map the carry must be marked device-varying, or the
        # scan rejects the (unvarying init, varying output) type mismatch
        init = jax.lax.pcast(init, axis_name, to="varying")
    (num, den), _ = jax.lax.scan(step, init, (depths, confs, Rs, ts))
    return num, den


def _finalize(num, den, n):
    tsdf = jnp.where(den > 0, num / jnp.maximum(den, 1e-12), 1.0)
    return tsdf.reshape(n, n, n), den.reshape(n, n, n)


@functools.partial(jax.jit, static_argnames=("n",))
def _integrate_views(depths, confs, K, Rs, ts, origin, voxel, trunc, n):
    """Single-device fusion: scan-accumulate then finalize."""
    num, den = _accumulate_views(
        depths, confs, K, Rs, ts, origin, voxel, trunc, n
    )
    return _finalize(num, den, n)


@functools.lru_cache(maxsize=8)
def _sharded_integrate_program(mesh, n):
    """One jitted shard_map program per (mesh, resolution): a fresh closure
    per call would defeat jit's cache and recompile every fusion."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local(d, c, K_, R, t, o, vx, tr):
        num, den = _accumulate_views(
            d, c, K_, R, t, o, vx, tr, n, axis_name="data"
        )
        return jax.lax.psum(num, "data"), jax.lax.psum(den, "data")

    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P(), P("data"), P("data"),
                  P(), P(), P()),
        out_specs=(P(), P()),
    ))


def _integrate_views_sharded(
    mesh, depths, confs, K, Rs, ts, origin, voxel, trunc, n
):
    """Multi-chip fusion: the view axis shards over the mesh's 'data' axis
    (shard_map), each chip scan-accumulates its views against the full
    voxel grid, and ONE psum pair combines the partial sums over ICI.
    The reference integrates nothing (no volumetric stage at all); its
    per-view GPU loops (mvs_patchmatch.py:104-123) are the closest analog."""
    f = _sharded_integrate_program(mesh, n)
    num, den = f(depths, confs, K, Rs, ts, origin, voxel, trunc)
    return _finalize(num, den, n)


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
    mesh=None,
    timings: Optional[dict] = None,
) -> TSDFVolume:
    """Fuse per-view depth maps into a TSDF volume.

    depths: (V, H, W) world-unit depths, 0 = invalid.
    confs:  (V, H, W) per-pixel weights (MVS consistency counts) or None.
    bounds: (lo, hi) world AABB; derived from sparse_points (or from the
            depth maps' backprojection) when omitted.
    resolution: voxels per axis. trunc_voxels: truncation in voxel units.
    mesh: optional jax.sharding.Mesh — views shard over its 'data' axis
          (zero-weight padding views make V divisible; they contribute 0).
    """
    import time as _time

    tm = timings if timings is not None else {}
    _t = _time.time()
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

    tm["host_prep_s"] = _time.time() - _t
    _t = _time.time()
    args = (
        jnp.asarray(depths),
        jnp.asarray(confs),
        jnp.asarray(K, jnp.float32),
        jnp.asarray(Rs, jnp.float32),
        jnp.asarray(ts, jnp.float32),
        jnp.asarray(lo, jnp.float32),
        jnp.float32(voxel),
        jnp.float32(trunc),
    )
    if mesh is not None and mesh.shape.get("data", 1) > 1:
        nd = mesh.shape["data"]
        from recon3d_tpu.parallel.mesh import pad_to_multiple

        dp, _ = pad_to_multiple(depths, nd, axis=0)
        cp, _ = pad_to_multiple(confs, nd, axis=0)
        Rp, _ = pad_to_multiple(np.asarray(Rs, np.float32), nd, axis=0)
        tp, _ = pad_to_multiple(np.asarray(ts, np.float32), nd, axis=0)
        # padded views: depth 0 + conf 0 => zero weight everywhere; give
        # them identity rotations so the projection math stays finite
        Rp[V:] = np.eye(3, dtype=np.float32)
        tp[V:] = np.float32([0, 0, 1])
        tsdf, weight = _integrate_views_sharded(
            mesh,
            jnp.asarray(dp), jnp.asarray(cp), args[2],
            jnp.asarray(Rp), jnp.asarray(tp),
            args[5], args[6], args[7],
            n=int(resolution),
        )
    else:
        tsdf, weight = _integrate_views(*args, n=int(resolution))
    tm["upload_dispatch_s"] = _time.time() - _t
    _t = _time.time()
    vol = TSDFVolume(
        tsdf=np.asarray(tsdf),
        weight=np.asarray(weight),
        origin=lo.astype(np.float32),
        voxel=voxel,
        trunc=trunc,
    )
    tm["volume_fetch_s"] = _time.time() - _t
    return vol


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
