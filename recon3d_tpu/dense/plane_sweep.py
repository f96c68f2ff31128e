"""Plane-sweep multi-view stereo, TPU-native.

Capability parity with reference src/core/dense_stereo.py
(DenseStereoReconstructor :26-505): per reference view, sweep D fronto-
parallel inverse-depth planes, score each with NCC against K neighbor
views, count cross-view consistency, argmax over planes, back-project.

Redesign for TPU (not a port of the torch loops):
  - the reference's per-plane × per-neighbor Python loop (dense_stereo.py:
    265-304, 384 grid_sample calls/view) becomes ONE jitted scan over the
    plane axis with the neighbor axis vmapped — a single fused XLA program;
  - warps are plane-induced homographies evaluated in closed form (no
    per-plane meshgrid rebuild);
  - NCC windows use O(1) integral-image box sums (ops/image.box_filter)
    instead of ones-kernel conv2d;
  - per-view jobs are the multi-chip sharding axis (dense/distributed.py).
"""

from __future__ import annotations

import functools
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from recon3d_tpu.camera import Camera
from recon3d_tpu.config import PlaneSweepConfig
from recon3d_tpu.ops.image import bilinear_sample_auto, box_filter

_HI = jax.lax.Precision.HIGHEST


def _relative_pose(R_ref, t_ref, R_src, t_src):
    """(R, t) of src relative to ref: x_src = R x_ref + t."""
    R = jnp.matmul(R_src, R_ref.T, precision=_HI)
    t = t_src - jnp.einsum("ij,j->i", R, t_ref, precision=_HI)
    return R, t


def plane_homography(K, R_rel, t_rel, inv_depth):
    """Homography ref->src for the fronto-parallel plane z = 1/inv_depth
    (in the ref camera frame): H = K (R + t n^T * inv_depth) K^-1, n=e_z."""
    n = jnp.array([0.0, 0.0, 1.0], K.dtype)
    M = R_rel + jnp.outer(t_rel, n) * inv_depth
    Kinv = jnp.linalg.inv(K)
    return jnp.matmul(jnp.matmul(K, M, precision=_HI), Kinv, precision=_HI)


def _warp_by_homography(img, H, grid_h):
    """Sample img at H @ grid for all pixels. grid_h: (Ht, Wt, 3) homogeneous."""
    g = jnp.einsum("ij,hwj->hwi", H, grid_h, precision=_HI)
    z = g[..., 2]
    z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    coords = g[..., :2] / z[..., None]
    samp, ok = bilinear_sample_auto(img, coords)
    return samp, ok & (z > 0)


def _ncc(ref, src, ok, patch: int):
    """Windowed NCC between ref and warped src, invalid where warp failed."""
    w = ok.astype(ref.dtype)
    # masked means: normalize by valid count in window
    cnt = box_filter(w, patch) + 1e-6
    mr = box_filter(ref * w, patch) / cnt
    ms = box_filter(src * w, patch) / cnt
    mrs = box_filter(ref * src * w, patch) / cnt
    mrr = box_filter(ref * ref * w, patch) / cnt
    mss = box_filter(src * src * w, patch) / cnt
    cov = mrs - mr * ms
    var_r = jnp.maximum(mrr - mr * mr, 1e-8)
    var_s = jnp.maximum(mss - ms * ms, 1e-8)
    ncc = cov / jnp.sqrt(var_r * var_s)
    return jnp.where(ok, jnp.clip(ncc, -1.0, 1.0), -1.0)


@functools.partial(
    jax.jit, static_argnames=("num_depths", "patch", "min_views", "hierarchical")
)
def sweep_depth_map(
    ref_gray: jnp.ndarray,          # (H, W)
    src_grays: jnp.ndarray,         # (J, H, W)
    K: jnp.ndarray,                 # (3, 3) at working scale
    R_ref: jnp.ndarray,
    t_ref: jnp.ndarray,
    R_srcs: jnp.ndarray,            # (J, 3, 3)
    t_srcs: jnp.ndarray,            # (J, 3)
    depth_range: jnp.ndarray,       # (2,) = (dmin, dmax)
    num_depths: int = 64,
    patch: int = 5,
    ncc_threshold: float = 0.8,
    min_views: int = 3,
    hierarchical: bool = True,
):
    """One reference-view plane sweep. Returns (depth (H,W), consistency
    count (H,W), mean-NCC (H,W)).

    hierarchical=True (default) runs the full D-plane sweep at HALF
    resolution, upsamples the winning inverse depth, and re-scores a
    handful of per-pixel candidates around it at full resolution — the
    same algorithmic lever as coarse-to-fine PatchMatch: the exhaustive
    D x J scoring pays 1/4 the pixels, and the full-res polish costs
    ~5/D of a full sweep. hierarchical=False is the reference-shaped
    exhaustive sweep (dense_stereo.py:222-316 semantics) used as the
    accuracy yardstick in tests/test_plane_sweep.py."""
    if hierarchical and num_depths >= 16 and min(ref_gray.shape) >= 48:
        return _sweep_hier(
            ref_gray, src_grays, K, R_ref, t_ref, R_srcs, t_srcs,
            depth_range, num_depths, patch, ncc_threshold,
        )
    return _sweep_all_planes(
        ref_gray, src_grays, K, R_ref, t_ref, R_srcs, t_srcs,
        depth_range, num_depths, patch, ncc_threshold,
    )


def _sweep_all_planes(
    ref_gray, src_grays, K, R_ref, t_ref, R_srcs, t_srcs, depth_range,
    num_depths: int, patch: int, ncc_threshold: float,
):
    """Exhaustive sweep: every plane scored at the input resolution. The
    (D planes x J sources) work is one scan(vmap(...)) — fully fused."""
    H, W = ref_gray.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=ref_gray.dtype), jnp.arange(W, dtype=ref_gray.dtype),
        indexing="ij",
    )
    grid_h = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)  # (H, W, 3)

    Rrel = jax.vmap(lambda R, t: _relative_pose(R_ref, t_ref, R, t)[0])(R_srcs, t_srcs)
    trel = jax.vmap(lambda R, t: _relative_pose(R_ref, t_ref, R, t)[1])(R_srcs, t_srcs)

    inv_depths = jnp.linspace(1.0 / depth_range[1], 1.0 / depth_range[0], num_depths)

    # Scan over CHUNKS of planes, vmapping within the chunk: one plane per
    # scan step is only J*H*W warp samples of work — too little to hide the
    # per-step sequencing overhead (measured on-chip at the product's
    # 4-view batching: 4.83 -> 5.38 MP/s going from 1-plane to 8-plane
    # steps, which puts the sweep at the tent-warp kernel's MXU roofline;
    # 16/32-plane chunks regress — live-buffer pressure). The last chunk
    # pads by repeating the final plane (re-scoring a plane is a no-op for
    # the running max).
    chunk = min(8, num_depths)
    n_chunks = (num_depths + chunk - 1) // chunk
    pad = n_chunks * chunk - num_depths
    inv_chunks = jnp.concatenate(
        [inv_depths, jnp.broadcast_to(inv_depths[-1:], (pad,))]
    ).reshape(n_chunks, chunk)

    def eval_plane(inv_d):
        def one_src(src, Rr, tr):
            Hm = plane_homography(K, Rr, tr, inv_d)
            warped, ok = _warp_by_homography(src, Hm, grid_h)
            return _ncc(ref_gray, warped, ok, patch)

        nccs = jax.vmap(one_src)(src_grays, Rrel, trel)  # (J, H, W)
        count = jnp.sum(nccs > ncc_threshold, axis=0)
        mean_ncc = jnp.mean(jnp.maximum(nccs, 0.0), axis=0)
        score = count.astype(ref_gray.dtype) + 0.5 * mean_ncc  # tie-break
        return score, count, mean_ncc

    def chunk_score(carry, inv_ds):
        score, count, mean_ncc = jax.vmap(eval_plane)(inv_ds)  # (c, H, W)
        # Within-chunk argmax -> masked one-hot sums (not take_along_axis:
        # XLA lowers that to a ~20 M elem/s gather; selects are VPU work).
        ci = jnp.argmax(score, axis=0)
        onehot = ci[None] == jnp.arange(chunk)[:, None, None]
        c_score = jnp.max(score, axis=0)
        c_inv = jnp.sum(jnp.where(onehot, inv_ds[:, None, None], 0.0), axis=0)
        c_cnt = jnp.sum(jnp.where(onehot, count, 0), axis=0)
        c_ncc = jnp.sum(jnp.where(onehot, mean_ncc, 0.0), axis=0)
        best_score, best_inv, best_cnt, best_ncc = carry
        better = c_score > best_score
        carry = (
            jnp.where(better, c_score, best_score),
            jnp.where(better, c_inv, best_inv),
            jnp.where(better, c_cnt, best_cnt),
            jnp.where(better, c_ncc, best_ncc),
        )
        return carry, None

    init = (
        jnp.full((H, W), -jnp.inf, ref_gray.dtype),
        jnp.full((H, W), inv_depths[0], ref_gray.dtype),
        jnp.zeros((H, W), jnp.int32),
        jnp.zeros((H, W), ref_gray.dtype),
    )
    (best_score, best_inv, best_cnt, best_ncc), _ = jax.lax.scan(
        chunk_score, init, inv_chunks
    )
    depth = 1.0 / best_inv
    return depth, best_cnt, best_ncc


def _sweep_hier(
    ref_gray, src_grays, K, R_ref, t_ref, R_srcs, t_srcs, depth_range,
    num_depths: int, patch: int, ncc_threshold: float,
):
    """Coarse-to-fine sweep: exhaustive D-plane sweep at half resolution,
    then full-resolution re-scoring of per-pixel inverse-depth candidates
    around the upsampled winner (offsets of 0, ±0.5, ±1 plane spacings).

    Cost vs the exhaustive full-res sweep: D/4 + 5 plane-equivalents
    instead of D (~3x fewer warp+NCC evaluations at D=64). The candidate
    evaluation reuses PatchMatch's per-pixel warp machinery — a candidate
    *field* has a different depth per pixel, which a global plane
    homography cannot express."""
    from recon3d_tpu.dense.patchmatch import (
        _ncc_all,
        _rays_for,
        _warp_sources,
    )

    H, W = ref_gray.shape
    H2, W2 = H // 2, W // 2
    ref2 = jax.image.resize(ref_gray, (H2, W2), "linear")
    src2 = jax.vmap(lambda s: jax.image.resize(s, (H2, W2), "linear"))(
        src_grays
    )
    # intrinsics at the half scale under resize's half-pixel convention
    S = jnp.array(
        [[0.5, 0.0, -0.25], [0.0, 0.5, -0.25], [0.0, 0.0, 1.0]], K.dtype
    )
    d2, _, _ = _sweep_all_planes(
        ref2, src2, S @ K, R_ref, t_ref, R_srcs, t_srcs, depth_range,
        num_depths, patch, ncc_threshold,
    )

    inv_lo = 1.0 / depth_range[1]
    inv_hi = 1.0 / depth_range[0]
    step = (inv_hi - inv_lo) / (num_depths - 1)
    inv_full = jnp.clip(
        jax.image.resize(1.0 / d2, (H, W), "linear"), inv_lo, inv_hi
    )
    offsets = jnp.asarray([0.0, -1.0, -0.5, 0.5, 1.0], ref_gray.dtype) * step
    cands = jnp.clip(
        inv_full[None] + offsets[:, None, None], inv_lo, inv_hi
    )                                                       # (C, H, W)

    rays = _rays_for(K, H, W, ref_gray.dtype)

    def eval_inv(inv_field):
        warped, ok = _warp_sources(
            1.0 / inv_field, rays, R_ref, t_ref, R_srcs, t_srcs, K,
            src_grays, z_floor=depth_range[0] * 0.05,
        )
        ncc = _ncc_all(ref_gray, warped, ok, patch)         # (J, H, W)
        ncc = jnp.where(ok, ncc, -1.0)
        count = jnp.sum(ncc > ncc_threshold, axis=0)
        mean_ncc = jnp.mean(jnp.maximum(ncc, 0.0), axis=0)
        score = count.astype(ref_gray.dtype) + 0.5 * mean_ncc
        return score, count, mean_ncc

    score_c, count_c, ncc_c = jax.vmap(eval_inv)(cands)     # (C, H, W)
    ci = jnp.argmax(score_c, axis=0)
    onehot = ci[None] == jnp.arange(cands.shape[0])[:, None, None]
    best_inv = jnp.sum(jnp.where(onehot, cands, 0.0), axis=0)
    best_cnt = jnp.sum(jnp.where(onehot, count_c, 0), axis=0)
    best_ncc = jnp.sum(jnp.where(onehot, ncc_c, 0.0), axis=0)
    return 1.0 / best_inv, best_cnt, best_ncc


@functools.lru_cache(maxsize=8)
def _sweep_batch_program(num_depths: int, patch: int, ncc_threshold: float,
                         min_views: int):
    """Jitted vmapped sweep, memoized per config: a fresh jit-of-closure
    per reconstruct() call would re-trace the whole hierarchical sweep
    every run (multi-second toll on warm service requests)."""
    def fn(ref_g, src_g, K, R_refs, t_refs, R_srcs, t_srcs, dr):
        return jax.vmap(
            lambda rg, sg, Rr, tr, Rs_, ts_: sweep_depth_map(
                rg, sg, K, Rr, tr, Rs_, ts_, dr,
                num_depths=num_depths,
                patch=patch,
                ncc_threshold=ncc_threshold,
                min_views=min_views,
            )
        )(ref_g, src_g, R_refs, t_refs, R_srcs, t_srcs)

    return jax.jit(fn)


@functools.lru_cache(maxsize=1)
def _fuse_program():
    """Jitted vmapped depth-map back-projection (memoized, see above)."""
    return jax.jit(
        jax.vmap(
            backproject_depth, in_axes=(0, None, 0, 0, 0)
        )
    )


def backproject_depth(
    depth: jnp.ndarray, K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
    valid: jnp.ndarray,
):
    """Depth map -> world points (H*W, 3) + mask (reference dense_stereo.py
    :407-437). Invalid pixels produce zeros with mask False."""
    H, W = depth.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=depth.dtype), jnp.arange(W, dtype=depth.dtype),
        indexing="ij",
    )
    x = (xs - K[0, 2]) / K[0, 0] * depth
    y = (ys - K[1, 2]) / K[1, 1] * depth
    Xc = jnp.stack([x, y, depth], axis=-1).reshape(-1, 3)
    Xw = jnp.einsum("ji,nj->ni", R, Xc - t[None, :], precision=_HI)
    return Xw, valid.reshape(-1)


@functools.partial(jax.jit, static_argnames=("cap",))
def _compact_masked(pts: jnp.ndarray, mask: jnp.ndarray, cap: int):
    """Gather the masked rows of (N, 3) points into a fixed (cap, 3) buffer
    plus their flat indices (cap,). Device-side compaction: the fused point
    cloud is typically <10% of the depth-map pixels, so downloading only the
    compacted rows (instead of every (V, H*W, 3) slot) cuts the dominant
    fusion download by ~10x over a slow host<->device link."""
    idx = jnp.nonzero(mask.reshape(-1), size=cap, fill_value=-1)[0]
    good = idx >= 0
    taken = jnp.take(pts.reshape(-1, 3), jnp.maximum(idx, 0), axis=0)
    return taken, idx, good


def fused_points_compact(pts_b, mask_b, lo: int = 8192):
    """Host wrapper: count (one tiny download), bucket the capacity, compact
    on device, download only the compacted block. Returns (points (M, 3)
    float32 numpy, flat_indices (M,) numpy int)."""
    n = int(jnp.sum(mask_b))
    if n == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0,), np.int64)
    total = int(np.prod(mask_b.shape))
    cap = lo
    while cap < n and cap < total:
        cap *= 4
    cap = min(cap, total)
    taken, idx, good = _compact_masked(
        jnp.asarray(pts_b).reshape(-1, 3), jnp.asarray(mask_b), cap
    )
    goodn = np.asarray(good)
    return (
        np.asarray(taken)[goodn].astype(np.float32),
        np.asarray(idx)[goodn].astype(np.int64),
    )


def depth_range_from_poses(Rs: np.ndarray, ts: np.ndarray) -> Tuple[float, float]:
    """Depth bounds from the camera-center spread (reference :86-92)."""
    C = np.stack([-R.T @ t for R, t in zip(Rs, ts)])
    spread = np.linalg.norm(C - C.mean(0), axis=1).max() * 2 + 1e-6
    return 0.5 * spread, 20.0 * spread


def depth_range_from_sparse(
    points: np.ndarray, R: np.ndarray, t: np.ndarray
) -> Optional[Tuple[float, float]]:
    """1st/99th percentile of sparse depths x1.5 margin (reference
    mvs_patchmatch.py:141-165)."""
    if len(points) < 20:
        return None
    z = (points @ R.T + t)[:, 2]
    z = z[z > 1e-6]
    if len(z) < 20:
        return None
    lo, hi = np.percentile(z, [1, 99])
    return float(max(lo / 1.5, 1e-3)), float(hi * 1.5)


class PlaneSweepReconstructor:
    """Dense reconstruction via plane sweep (reference DenseStereoReconstructor).

    reconstruct(images, poses, ...) -> (points (N,3), colors (N,3) uint8).
    `images` is (V, H, W, 3) float32 [0,1] at full scale; `poses` a dict
    {idx: (R, t)} of registered cameras (numpy).
    """

    def __init__(self, camera: Camera, config: Optional[PlaneSweepConfig] = None):
        self.camera = camera
        self.config = config or PlaneSweepConfig()

    def _neighbors(self, ids: List[int], poses, k: int) -> Dict[int, List[int]]:
        C = {i: -poses[i][0].T @ poses[i][1] for i in ids}
        out = {}
        for i in ids:
            d = sorted(
                ((np.linalg.norm(C[i] - C[j]), j) for j in ids if j != i)
            )
            out[i] = [j for _, j in d[:k]]
        return out

    def reconstruct(
        self,
        images: np.ndarray,
        poses: Dict[int, Tuple[np.ndarray, np.ndarray]],
        sparse_points: Optional[np.ndarray] = None,
        max_ref_views: Optional[int] = None,
        mesh=None,
        return_maps: bool = False,
        host_small: Optional[np.ndarray] = None,
    ):
        """With return_maps=True, returns (points, colors, maps) — per-ref
        depth/consistency-count maps for the TSDF mesh stage (same contract
        as PatchMatchMVS.reconstruct). host_small: optional load-time
        prescaled (N, H*scale, W*scale, 3) color stack (see
        PatchMatchMVS.reconstruct for why it matters on tunneled hosts)."""
        cfg = self.config
        t0 = time.time()
        ids = sorted(poses.keys())
        V = len(ids)
        if V < 2:
            empty = np.zeros((0, 3), np.float32), np.zeros((0, 3), np.uint8)
            return (*empty, None) if return_maps else empty

        scale = cfg.scale
        Hs = int(images.shape[1] * scale)
        Ws = int(images.shape[2] * scale)
        K = np.asarray(self.camera.scaled(scale).K)

        # Downscale + gray on the HOST (see dense/patchmatch.py): only the
        # small gray planes below are device inputs, so full-res frames
        # never cross the link.
        from recon3d_tpu.io.hostimg import resize_batch_np, rgb_to_gray_np

        if host_small is not None and host_small.shape[1:3] == (Hs, Ws):
            small = np.asarray(host_small[ids], np.float32)
        else:
            small = resize_batch_np(images[ids], (Hs, Ws))
        grays = rgb_to_gray_np(small)
        id_row = {i: r for r, i in enumerate(ids)}

        Rs = np.stack([poses[i][0] for i in ids])
        ts = np.stack([poses[i][1] for i in ids])
        dr = depth_range_from_poses(Rs, ts)
        if sparse_points is not None:
            dr2 = depth_range_from_sparse(sparse_points, Rs[0], ts[0])
            if dr2:
                dr = dr2

        max_refs = max_ref_views or cfg.max_ref_views
        step = max(1, V // max_refs)
        ref_ids = [i for i in ids[::step]]
        neighbors = self._neighbors(ids, poses, cfg.num_neighbors)
        ref_ids = [i for i in ref_ids if len(neighbors[i]) >= 1]
        J = min(cfg.num_neighbors, V - 1)
        n_real_refs = len(ref_ids)
        # Multi-chip: the ref-view axis shards over the mesh's 'data' axis
        # (reference loops ref views serially on one GPU,
        # dense_stereo.py:105-130); pad with repeats so it divides the mesh,
        # padding rows are dropped before fusion below.
        n_data = mesh.shape.get("data", 1) if mesh is not None else 1
        if n_data > 1 and n_real_refs:
            pad_n = (-n_real_refs) % n_data
            ref_ids = ref_ids + [ref_ids[-1]] * pad_n

        # All reference views sweep as ONE vmapped batch (the reference
        # loops them serially on one GPU, dense_stereo.py:105-130); this is
        # also the multi-chip axis (dense/distributed.py).
        # ONE upload of the small gray stack; ref/source planes are
        # device-side gathers (the (R, J, h, w) source stack re-uploads each
        # gray J times otherwise).
        grays_d = jnp.asarray(grays)
        ref_g = jnp.take(
            grays_d, jnp.asarray([id_row[i] for i in ref_ids]), axis=0
        )
        src_g = jnp.take(
            grays_d,
            jnp.asarray(
                [[id_row[j] for j in neighbors[i][:J]] for i in ref_ids]
            ),
            axis=0,
        )
        R_refs = jnp.asarray(np.stack([poses[i][0] for i in ref_ids]))
        t_refs = jnp.asarray(np.stack([poses[i][1] for i in ref_ids]))
        R_srcs = jnp.asarray(
            np.stack([np.stack([poses[j][0] for j in neighbors[i][:J]]) for i in ref_ids])
        )
        t_srcs = jnp.asarray(
            np.stack([np.stack([poses[j][1] for j in neighbors[i][:J]]) for i in ref_ids])
        )
        Kj = jnp.asarray(K, jnp.float32)
        drj = jnp.asarray(dr, jnp.float32)

        if n_data > 1:
            from recon3d_tpu.parallel.mesh import data_sharding, replicated

            ref_g = jax.device_put(ref_g, data_sharding(mesh, ref_g.ndim, 0))
            src_g = jax.device_put(src_g, data_sharding(mesh, src_g.ndim, 0))
            R_refs = jax.device_put(R_refs, data_sharding(mesh, 3, 0))
            t_refs = jax.device_put(t_refs, data_sharding(mesh, 2, 0))
            R_srcs = jax.device_put(R_srcs, data_sharding(mesh, 4, 0))
            t_srcs = jax.device_put(t_srcs, data_sharding(mesh, 3, 0))
            Kj = jax.device_put(Kj, replicated(mesh))
            drj = jax.device_put(drj, replicated(mesh))

        sweep_b = _sweep_batch_program(
            cfg.num_depths, cfg.patch_size, cfg.ncc_threshold, cfg.min_views
        )
        depth_b, cnt_b, ncc_b = sweep_b(
            ref_g, src_g, Kj, R_refs, t_refs, R_srcs, t_srcs, drj
        )
        if len(ref_ids) != n_real_refs:  # drop mesh padding rows
            ref_ids = ref_ids[:n_real_refs]
            depth_b = depth_b[:n_real_refs]
            cnt_b = cnt_b[:n_real_refs]
            R_refs = R_refs[:n_real_refs]
            t_refs = t_refs[:n_real_refs]
        # Fusion: back-project every consistent pixel of every reference
        # view in ONE vmapped dispatch (kept on device until a single
        # download) — a per-view loop costs a round-trip per depth map.
        min_views_r = jnp.asarray(
            [min(cfg.min_views, len(neighbors[i])) for i in ref_ids],
            jnp.int32,
        )
        pts_b, mask_b = _fuse_program()(
            depth_b, Kj, R_refs, t_refs,
            cnt_b >= min_views_r[:, None, None],
        )
        # Device-side compaction (see fused_points_compact): only selected
        # points cross the link.
        points, sel_idx = fused_points_compact(pts_b, mask_b)
        if len(points) == 0:
            empty = np.zeros((0, 3), np.float32), np.zeros((0, 3), np.uint8)
            return (*empty, None) if return_maps else empty
        colors = (
            small[[id_row[i] for i in ref_ids]].reshape(-1, 3)[sel_idx] * 255
        ).astype(np.uint8)

        from recon3d_tpu.dense.filters import radius_outlier_filter, voxel_downsample

        points, colors = radius_outlier_filter(points, colors)
        points, colors = voxel_downsample(points, colors, cfg.voxel_size)
        print(f"[plane-sweep] {len(points)} points from {len(ref_ids)} ref views "
              f"({time.time() - t0:.1f}s)")
        if return_maps:
            maps = {
                "depth": np.asarray(depth_b),
                "conf": np.asarray(cnt_b).astype(np.float32),
                "K": np.asarray(K, np.float32),
                "Rs": np.asarray(R_refs),
                "ts": np.asarray(t_refs),
                "ids": list(ref_ids),
            }
            return points, colors, maps
        return points, colors


def create_combined_dense_cloud(
    camera: Camera,
    images: np.ndarray,
    poses: Dict[int, Tuple[np.ndarray, np.ndarray]],
    use_stereo: bool = True,
):
    """API-parity wrapper (reference dense_stereo.py:495-505): run the
    plane-sweep backend, or return empty arrays when disabled."""
    if use_stereo:
        return PlaneSweepReconstructor(camera).reconstruct(images, poses)
    return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.uint8)
