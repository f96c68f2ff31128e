"""PatchMatch multi-view stereo, TPU-native.

Capability parity with reference src/core/mvs_patchmatch.py (PatchMatchMVS
:38-588): per reference view, randomly initialize a depth(+normal) field,
alternate spatial propagation and random refinement against NCC photo-
consistency over K source views, compute a cross-view confidence, fuse all
views' confident pixels into a world point cloud, filter.

Redesign for TPU (not a port of the torch loops):
  - the reference evaluates candidate hypotheses one at a time (2 shifted maps
    + 8 random samples per iteration, mvs_patchmatch.py:415-491, each a full
    sequence of per-source grid_sample + conv2d calls); here every iteration
    evaluates its whole candidate set in ONE vmapped batch — (C, J, H, W) fused
    warp + NCC, so the MXU/VPU see large regular work;
  - propagation offers all four axis-aligned neighbors each iteration (the
    reference alternates two per direction) — strictly stronger and removes
    the data-dependent direction switch;
  - NCC windows use O(1) box sums (ops/image.box_filter) instead of ones-
    kernel conv2d (reference _ncc_cost :392-413);
  - randomness is explicit jax.random key threading (reference uses global
    torch.rand, :268-281,471-475);
  - whole per-view PatchMatch (init + all iterations + confidence) is a single
    jitted program — zero host round-trips per view (the reference transfers
    to/from device per stage, :235-257,318-320);
  - multiple reference views are batched through vmap (the multi-chip shard
    axis, see dense/distributed.py).

Cost semantics match the reference: each pixel is reprojected with its own
depth hypothesis into each source view and scored with windowed NCC on the
warped image. Average cost over valid views; pixels seen by <2 views get
+inf (reference :386-388).

Normals: the reference carries a random normal field as loop state
(propagated and refined alongside depth, :275-281) but its cost never reads
it (reference _compute_patch_cost :323-390 uses depth only), so that state
is selection-correlated noise that costs 3x the depth field's bytes in
every propagation/refinement/selection step. Here the loop state is depth
only, and the returned normal map is DERIVED from the converged depth field
(normals_from_depth: cross product of the backprojected surface tangents) —
geometrically meaningful where the reference's was decorative, and faster
(bench A/B in docs/perf_model.md).
"""

from __future__ import annotations

import functools
import time
from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from recon3d_tpu.camera import Camera
from recon3d_tpu.config import PatchMatchConfig
from recon3d_tpu.dense.plane_sweep import (
    backproject_depth,
    depth_range_from_poses,
    depth_range_from_sparse,
)
from recon3d_tpu.ops.image import bilinear_sample_auto, box_filter

_HI = jax.lax.Precision.HIGHEST
_BIG = 1e9  # stand-in for +inf that stays finite under where/argmin


class DepthNormalMap(NamedTuple):
    """Per-view PatchMatch output (reference mvs_patchmatch.py:30-36)."""

    depth: jnp.ndarray       # (H, W)
    normal: jnp.ndarray      # (H, W, 3), unit, camera frame
    confidence: jnp.ndarray  # (H, W) number of NCC-consistent source views
    cost: jnp.ndarray        # (H, W) final matching cost (1 - NCC, averaged)


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift a (H, W, ...) map by (dy, dx), replicating edges.

    Shifts are clamped to the map size: propagation uses steps up to 16,
    and an unclamped |dy| >= H would concatenate to the wrong shape (jit
    error) or, at |dy| == H, silently misalign."""
    dy = max(-(x.shape[0] - 1), min(x.shape[0] - 1, dy))
    dx = max(-(x.shape[1] - 1), min(x.shape[1] - 1, dx))
    if dy > 0:
        x = jnp.concatenate([x[:1]] * dy + [x[:-dy]], axis=0)
    elif dy < 0:
        x = jnp.concatenate([x[-dy:]] + [x[-1:]] * (-dy), axis=0)
    if dx > 0:
        x = jnp.concatenate([x[:, :1]] * dx + [x[:, :-dx]], axis=1)
    elif dx < 0:
        x = jnp.concatenate([x[:, -dx:]] + [x[:, -1:]] * (-dx), axis=1)
    return x


def _warp_sources(depth, rays, R_ref, t_ref, R_srcs, t_srcs, K, src_grays,
                  z_floor=1e-4):
    """Reproject every ref pixel at its depth into each source and sample.

    depth: (H, W); rays: (H, W, 3) = K^-1 [u v 1]^T.
    z_floor: minimum source-frame depth for a valid sample — must scale
    with the scene (SfM scale is arbitrary; a fixed floor rejected every
    pixel on small-scale reconstructions).
    Returns sampled (J, H, W) and validity (J, H, W).
    """
    Xc = rays * depth[..., None]                       # ref camera frame
    Xw = jnp.einsum("ji,hwj->hwi", R_ref, Xc - t_ref, precision=_HI)

    def one(src, R, t):
        Xs = jnp.einsum("ij,hwj->hwi", R, Xw, precision=_HI) + t
        z = Xs[..., 2]
        uv = Xs[..., :2] / jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)[..., None]
        px = jnp.stack(
            [K[0, 0] * uv[..., 0] + K[0, 2], K[1, 1] * uv[..., 1] + K[1, 2]],
            axis=-1,
        )
        samp, ok = bilinear_sample_auto(src, px)
        return samp, ok & (z > z_floor)

    return jax.vmap(one)(src_grays, R_srcs, t_srcs)


def _ncc_all(ref, warped, ok, patch: int):
    """Windowed NCC of ref against each warped source. (J, H, W) in [-1, 1].

    Dispatches to the fused Pallas kernel on TPU (ops/ncc.py) and the XLA
    box-filter formulation elsewhere."""
    from recon3d_tpu.ops.ncc import ncc_windowed

    return ncc_windowed(ref, warped, ok, patch)


def _eval_cost(depth, rays, ref_gray, src_grays, K, R_ref, t_ref,
               R_srcs, t_srcs, patch: int, z_floor=1e-4):
    """Photo-consistency cost of a depth hypothesis field.

    Returns (cost (H,W), ncc (J,H,W), valid (J,H,W)). Cost is mean (1 - NCC)
    over valid views; _BIG where <2 views see the point (reference :386-388).
    """
    warped, ok = _warp_sources(
        depth, rays, R_ref, t_ref, R_srcs, t_srcs, K, src_grays,
        z_floor=z_floor,
    )
    ncc = _ncc_all(ref_gray, warped, ok, patch)
    cnt = jnp.sum(ok, axis=0)
    total = jnp.sum(jnp.where(ok, 1.0 - ncc, 0.0), axis=0)
    cost = total / jnp.maximum(cnt, 1)
    cost = jnp.where(cnt >= 2, cost, _BIG)
    return cost, ncc, ok


def normals_from_depth(depth: jnp.ndarray, rays: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame surface normals of a depth field, (H, W, 3) unit.

    Central differences of the backprojected surface P = rays * depth give
    the tangents; their cross product is the normal, sign-fixed to face the
    camera (n . P < 0). Border pixels replicate (zero tangent) and fall back
    to the camera-facing (0, 0, -1)."""
    P = rays * depth[..., None]
    tu = _shift2d(P, 0, -1) - _shift2d(P, 0, 1)   # d/dx
    tv = _shift2d(P, -1, 0) - _shift2d(P, 1, 0)   # d/dy
    n = jnp.cross(tu, tv)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.where(norm > 1e-12, n / jnp.maximum(norm, 1e-12),
                  jnp.array([0.0, 0.0, -1.0], depth.dtype))
    # Face the camera: the camera sits at the origin looking down +z, so a
    # camera-facing normal has n . P < 0 at the surface point P.
    return jnp.where(jnp.sum(n * P, axis=-1, keepdims=True) > 0, -n, n)


def _smooth_field(key, shape, block: int = 8, dist: str = "uniform"):
    """Random field that is spatially smooth at window scale.

    Full-frame PatchMatch scores a candidate field with windowed NCC on the
    warped image, so a candidate is only meaningfully evaluated where it is
    locally coherent — iid per-pixel noise (as in reference :268-272,471-475)
    makes every NCC window straddle unrelated hypotheses and the evaluation
    is garbage even at the correct value. Sampling on a (H/block, W/block)
    grid and bilinearly upsampling keeps candidates coherent over the NCC
    window while still exploring independently across the image.

    shape: leading dims are batch, last two are (H, W).
    """
    H, W = shape[-2], shape[-1]
    coarse = shape[:-2] + (H // block + 2, W // block + 2)
    if dist == "uniform":
        f = jax.random.uniform(key, coarse, jnp.float32, -1.0, 1.0)
    else:
        f = jax.random.normal(key, coarse, jnp.float32)
    return jax.image.resize(f, shape, method="linear")


def _rays_for(K: jnp.ndarray, H: int, W: int, dtype) -> jnp.ndarray:
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=dtype), jnp.arange(W, dtype=dtype), indexing="ij",
    )
    pix_h = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)
    Kinv = jnp.linalg.inv(K)
    return jnp.einsum("ij,hwj->hwi", Kinv, pix_h, precision=_HI)


def _scale_K(K: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Intrinsics at a 1/factor downscale under the pixel-area (half-pixel
    center) convention jax.image.resize uses: u' = (u + 0.5)/f - 0.5."""
    f = jnp.asarray(float(factor), K.dtype)
    off = 0.5 / f - 0.5
    S = jnp.asarray(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], K.dtype
    )
    S = S.at[0, 0].set(1.0 / f).at[1, 1].set(1.0 / f)
    S = S.at[0, 2].set(off).at[1, 2].set(off)
    return S @ K


def _run_level(
    ref_gray, src_grays, K, R_ref, t_ref, R_srcs, t_srcs,
    dmin, dmax, key, depth0, iters: int, it_offset: int,
    num_samples: int, patch: int, steps,
):
    """`iters` PatchMatch rounds (propagation + refinement) at the level's
    resolution, starting from depth0. Returns (depth, rays, cost_fn).

    The refinement perturbation schedule continues across levels via
    it_offset (0.5^(sample + iteration) of the depth range), so full-res
    polish iterations probe small corrections around the upsampled coarse
    solution instead of re-exploring the whole range.
    """
    H, W = ref_gray.shape
    rays = _rays_for(K, H, W, ref_gray.dtype)

    cost_fn = functools.partial(
        _eval_cost,
        rays=rays, ref_gray=ref_gray, src_grays=src_grays, K=K,
        R_ref=R_ref, t_ref=t_ref, R_srcs=R_srcs, t_srcs=t_srcs, patch=patch,
        z_floor=dmin * 0.05,  # scale-relative near-camera validity floor
    )

    def keep_best(depth, cand_d):
        """Evaluate current map + (C, H, W) candidates in one vmap; keep the
        per-pixel argmin. The current map is re-scored each round rather than
        carrying its cost: after a per-pixel mix, window NCC of the assembled
        field differs from the stored pointwise min (a stale carried cost —
        as in reference :445-455 — blocks later genuine improvements)."""
        fields_d = jnp.concatenate([depth[None], cand_d], axis=0)
        costs = jax.vmap(lambda d: cost_fn(d)[0])(fields_d)   # (C+1, H, W)
        ci = jnp.argmin(costs, axis=0)                        # (H, W)
        # Masked sum instead of take_along_axis: XLA lowers the latter to a
        # gather (~20 M elem/s on this TPU); C+1 selects are pure VPU work.
        onehot = ci[None] == jnp.arange(fields_d.shape[0])[:, None, None]
        return jnp.sum(jnp.where(onehot, fields_d, 0.0), axis=0)

    # Multi-scale ("jump flooding") propagation offsets: good hypotheses
    # spread exponentially instead of 1 px/iteration (the reference's
    # shifted-map scheme :415-457 moves information only one pixel per
    # iteration — far too slow for a 3-iteration budget).
    shifts = [
        (dy * s, dx * s)
        for s in steps
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1))
    ]

    def iteration(depth, it):
        # One PatchMatch round as a scan body: compiled once, not unrolled.
        # Spatial propagation: all neighbor hypotheses in one batch.
        depth = keep_best(
            depth, jnp.stack([_shift2d(depth, dy, dx) for dy, dx in shifts])
        )

        # Random refinement, one batch (reference :459-491): sample s gets an
        # exponentially smaller perturbation range, so each iteration probes
        # coarse-to-fine simultaneously instead of one range per iteration.
        kd = jax.random.fold_in(key, it)
        scales = 0.5 ** (
            jnp.arange(num_samples, dtype=ref_gray.dtype) + it
        )  # (S,)
        dd = (
            _smooth_field(kd, (num_samples, H, W))
            * scales[:, None, None] * (dmax - dmin)
        )
        depth = keep_best(depth, jnp.clip(depth[None] + dd, dmin, dmax))
        return depth, None

    depth, _ = jax.lax.scan(
        iteration, depth0, jnp.arange(iters) + it_offset
    )
    return depth, rays, cost_fn


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_iterations", "num_samples", "patch", "ncc_threshold",
        "coarse_factor", "fine_iterations",
    ),
)
def patchmatch_depth(
    ref_gray: jnp.ndarray,      # (H, W)
    src_grays: jnp.ndarray,     # (J, H, W)
    K: jnp.ndarray,             # (3, 3) at working scale
    R_ref: jnp.ndarray,
    t_ref: jnp.ndarray,
    R_srcs: jnp.ndarray,        # (J, 3, 3)
    t_srcs: jnp.ndarray,        # (J, 3)
    depth_range: jnp.ndarray,   # (2,) = (dmin, dmax)
    key: jnp.ndarray,           # jax.random key
    num_iterations: int = 3,
    num_samples: int = 8,
    patch: int = 11,
    ncc_threshold: float = 0.6,
    coarse_factor: int = 4,
    fine_iterations: int = 1,
) -> DepthNormalMap:
    """One reference view of PatchMatch MVS as a single fused device program.

    Matches reference _patchmatch_cuda (mvs_patchmatch.py:225-321) capability:
    log-uniform random depth init, num_iterations x (spatial propagation +
    num_samples random refinements), final per-view NCC consistency count.

    Coarse-to-fine (round 3): the reference runs every candidate evaluation
    full-frame at the working resolution (mvs_patchmatch.py:287-308 — 31
    full-res field evaluations for its 3-iteration default). Here the
    num_iterations exploration rounds run at 1/coarse_factor resolution
    (each evaluation costs ~1/factor^2), the converged coarse field is
    bilinearly upsampled, and only `fine_iterations` short-radius polish
    rounds run at full resolution — severalfold fewer full-res evaluations
    for the same search power, since PatchMatch's exploration phase only
    needs window-scale (not pixel-scale) spatial coherence.
    coarse_factor=1 recovers the single-level formulation exactly.
    """
    H, W = ref_gray.shape
    dmin, dmax = depth_range[0], depth_range[1]
    k_init, k_coarse, k_fine = jax.random.split(key, 3)

    def log_uniform_init(k, shape):
        u = 0.5 * (_smooth_field(k, shape) + 1.0)
        return jnp.exp(u * (jnp.log(dmax) - jnp.log(dmin)) + jnp.log(dmin))

    if coarse_factor > 1 and min(H, W) >= 4 * coarse_factor:
        Hc, Wc = H // coarse_factor, W // coarse_factor
        ref_c = jax.image.resize(ref_gray, (Hc, Wc), method="linear")
        src_c = jax.image.resize(
            src_grays, (src_grays.shape[0], Hc, Wc), method="linear"
        )
        Kc = _scale_K(K, coarse_factor)
        depth_c, _, _ = _run_level(
            ref_c, src_c, Kc, R_ref, t_ref, R_srcs, t_srcs,
            dmin, dmax, k_coarse, log_uniform_init(k_init, (Hc, Wc)),
            iters=num_iterations, it_offset=0,
            num_samples=num_samples, patch=patch, steps=(1, 4, 16),
        )
        depth0 = jax.image.resize(depth_c, (H, W), method="linear")
        # Full-res polish: upsampled coarse error is local (<= a coarse
        # cell), so propagation only needs to reach coarse_factor/2 px
        # (two step radii, 8 shifts instead of the exploration level's 12)
        # and half the refinement samples — the schedule continues where
        # the coarse level stopped, so the dropped samples are the
        # sub-precision tail (0.5^(4+it) of the range and smaller).
        # Candidate evaluations at full resolution are the dominant cost;
        # this cuts the polish round from 22 to 14 of them.
        depth, rays, cost_fn = _run_level(
            ref_gray, src_grays, K, R_ref, t_ref, R_srcs, t_srcs,
            dmin, dmax, k_fine, depth0,
            iters=fine_iterations, it_offset=num_iterations,
            num_samples=max(num_samples // 2, 2), patch=patch,
            steps=(1, max(2, coarse_factor // 2)),
        )
    else:
        depth, rays, cost_fn = _run_level(
            ref_gray, src_grays, K, R_ref, t_ref, R_srcs, t_srcs,
            dmin, dmax, k_coarse, log_uniform_init(k_init, (H, W)),
            iters=num_iterations, it_offset=0,
            num_samples=num_samples, patch=patch, steps=(1, 4, 16),
        )

    # Final confidence: number of source views with NCC above threshold
    # (reference _compute_confidence :493-534).
    cost, ncc, ok = cost_fn(depth)
    confidence = jnp.sum((ncc > ncc_threshold) & ok, axis=0)
    return DepthNormalMap(
        depth=depth,
        normal=normals_from_depth(depth, rays),
        confidence=confidence,
        cost=cost,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_iterations", "num_samples", "patch", "ncc_threshold",
        "coarse_factor", "fine_iterations",
    ),
)
def patchmatch_depth_batch(
    ref_grays,    # (B, H, W)
    src_grays,    # (B, J, H, W)
    K,            # (3, 3) shared
    R_refs,       # (B, 3, 3)
    t_refs,       # (B, 3)
    R_srcss,      # (B, J, 3, 3)
    t_srcss,      # (B, J, 3)
    depth_ranges, # (B, 2)
    keys,         # (B,) PRNG keys
    num_iterations: int = 3,
    num_samples: int = 8,
    patch: int = 11,
    ncc_threshold: float = 0.6,
    coarse_factor: int = 4,
    fine_iterations: int = 1,
) -> DepthNormalMap:
    """Batch of reference views in one device program — the unit that
    dense/distributed.py shards over chips."""

    def one(rg, sg, Rr, tr, Rs_, ts_, dr, k):
        return patchmatch_depth(
            rg, sg, K, Rr, tr, Rs_, ts_, dr, k,
            num_iterations=num_iterations,
            num_samples=num_samples,
            patch=patch,
            ncc_threshold=ncc_threshold,
            coarse_factor=coarse_factor,
            fine_iterations=fine_iterations,
        )

    return jax.vmap(one)(
        ref_grays, src_grays, R_refs, t_refs, R_srcss, t_srcss,
        depth_ranges, keys,
    )


def select_source_views(
    ids: List[int],
    poses: Dict[int, Tuple[np.ndarray, np.ndarray]],
    scene_center: np.ndarray,
    k: int = 4,
    min_angle_deg: float = 5.0,
    max_angle_deg: float = 60.0,
) -> Dict[int, List[int]]:
    """Score candidate sources by baseline x triangulation-angle suitability
    (reference _select_source_views mvs_patchmatch.py:193-223): prefer large
    baselines whose viewing-ray angle at the scene center lies in
    [min_angle, max_angle]; keep the top k per reference view."""
    C = {i: -poses[i][0].T @ poses[i][1] for i in ids}
    out: Dict[int, List[int]] = {}
    for i in ids:
        vi = scene_center - C[i]
        vi = vi / (np.linalg.norm(vi) + 1e-12)
        scored = []
        for j in ids:
            if j == i:
                continue
            vj = scene_center - C[j]
            vj = vj / (np.linalg.norm(vj) + 1e-12)
            ang = np.degrees(np.arccos(np.clip(vi @ vj, -1.0, 1.0)))
            baseline = np.linalg.norm(C[i] - C[j])
            w = 1.0 if min_angle_deg <= ang <= max_angle_deg else 0.1
            scored.append((baseline * w, j))
        scored.sort(reverse=True)
        out[i] = [j for _, j in scored[:k]]
    return out


class PatchMatchMVS:
    """Dense reconstruction via PatchMatch MVS (reference PatchMatchMVS
    mvs_patchmatch.py:38-139).

    reconstruct(images, poses, sparse_points) -> (points (N,3) float32,
    colors (N,3) uint8). `images` is (V, H, W, 3) float32 [0,1] full scale;
    `poses` a dict {idx: (R, t)} of registered cameras (numpy).
    """

    def __init__(self, camera: Camera, config: Optional[PatchMatchConfig] = None):
        self.camera = camera
        self.config = config or PatchMatchConfig()

    def reconstruct(
        self,
        images: np.ndarray,
        poses: Dict[int, Tuple[np.ndarray, np.ndarray]],
        sparse_points: Optional[np.ndarray] = None,
        views_per_batch: int = 4,
        mesh=None,
        checkpointer=None,
        return_maps: bool = False,
        host_small: Optional[np.ndarray] = None,
    ):
        """With return_maps=True, returns (points, colors, maps) where maps
        carries the per-view depth/confidence maps and their geometry —
        the input the TSDF mesh stage (dense/tsdf.py) consumes.

        host_small: optional (N, H*scale, W*scale, 3) prescaled color stack
        indexed like `images` (ImageSet.small_color). Pass it when it was
        computed at load time: on single-vCPU tunneled-TPU hosts, numpy
        runs 10-50x slower for tens of seconds right after heavy device
        phases (a 0.33 s resize measured at 34-60 s here after the sparse
        stage), so the resize must not happen inside this stage."""
        cfg = self.config
        t0 = time.time()
        ids = sorted(poses.keys())
        V = len(ids)
        J = min(cfg.num_source_views, V - 1)
        if V < 3 or J < 2:
            empty = np.zeros((0, 3), np.float32), np.zeros((0, 3), np.uint8)
            return (*empty, None) if return_maps else empty

        scale = cfg.scale
        Hs = int(images.shape[1] * scale)
        Ws = int(images.shape[2] * scale)
        t_k0 = time.time()
        K = np.asarray(self.camera.scaled(scale).K, np.float32)
        t_kfetch = time.time() - t_k0

        # Downscale + gray on the HOST: the working scale is 0.25x, so the
        # device only ever needs the small gray planes (uploaded per batch
        # below). Shipping full-res frames to resize on-device costs ~16x
        # more link bytes than the data the stage actually consumes.
        from recon3d_tpu.io.hostimg import resize_batch_np, rgb_to_gray_np

        t_r0 = time.time()
        if host_small is not None and host_small.shape[1:3] == (Hs, Ws):
            small = np.asarray(host_small[ids], np.float32)
        else:
            small = resize_batch_np(images[ids], (Hs, Ws))
        t_resize = time.time() - t_r0
        grays = rgb_to_gray_np(small)
        row = {i: r for r, i in enumerate(ids)}

        Rs = np.stack([poses[i][0] for i in ids]).astype(np.float32)
        ts = np.stack([poses[i][1] for i in ids]).astype(np.float32)
        centers = np.stack([-R.T @ t for R, t in zip(Rs, ts)])
        scene_center = (
            np.median(sparse_points, axis=0)
            if sparse_points is not None and len(sparse_points) >= 20
            else centers.mean(0) + np.array([0.0, 0.0, 1.0])
        )
        sources = select_source_views(
            ids, poses, scene_center, k=J,
            min_angle_deg=cfg.min_triangulation_angle_deg,
            max_angle_deg=cfg.max_triangulation_angle_deg,
        )

        # Per-view depth ranges (reference _estimate_depth_range :141-165).
        ranges = []
        fallback = depth_range_from_poses(Rs, ts)
        for i in ids:
            dr = None
            if sparse_points is not None:
                dr = depth_range_from_sparse(sparse_points, *poses[i])
            ranges.append(dr or fallback)
        ranges = np.asarray(ranges, np.float32)

        t_prep = time.time() - t0
        if t_prep > 1.0:
            # Break down a slow prep: the K fetch is the stage's first
            # device->host sync (a cold tunnel link can stall minutes here),
            # the resize is the big host-side CPU cost.
            print(
                f"[patchmatch] prep {t_prep:.1f}s "
                f"(K fetch {t_kfetch:.1f}, resize {t_resize:.1f})"
            )
        key = jax.random.PRNGKey(cfg.seed)
        n_batches = (V + views_per_batch - 1) // views_per_batch
        keys_np = np.asarray(
            jax.random.split(key, n_batches * views_per_batch)
        )

        # Per-view depth checkpoints (VERDICT r1 #10): positions whose maps
        # are already on disk load instead of recompute; per-view keys are
        # pinned to the view's position so a resumed run reproduces the
        # uncheckpointed maps exactly.
        loaded: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        if checkpointer is not None:
            for v, i in enumerate(ids):
                dc = checkpointer.load_depth(i)
                if dc is not None:
                    loaded[v] = dc
            if loaded:
                print(f"[patchmatch] resumed {len(loaded)}/{V} "
                      "depth maps from checkpoint")
        todo = [v for v in range(V) if v not in loaded]

        use_mesh = mesh is not None and mesh.shape.get("data", 1) > 1
        if todo and not use_mesh and checkpointer is None:
            # Fast path (no checkpointing): outputs stay ON DEVICE through
            # fusion — concatenate + gather as TWO device ops (a per-view
            # host pull costs a round-trip per depth map).
            # Keep only depth + confidence per batch: holding the full
            # DepthNormalMap would pin the unused normal (B,H,W,3) and cost
            # buffers in HBM until fusion (~2.5x the needed footprint).
            batch_d: List[jnp.ndarray] = []
            batch_c: List[jnp.ndarray] = []
            real_rows: List[int] = []
            for pos, out in self._depth_batches(
                todo, ids, grays, sources, Rs, ts, ranges, K, keys_np,
                row, views_per_batch,
            ):
                base = len(batch_d) * views_per_batch
                real_rows.extend(base + r for r in range(len(pos)))
                batch_d.append(out.depth)
                batch_c.append(out.confidence)
            rows_j = jnp.asarray(np.asarray(real_rows, np.int32))
            depth_all = jnp.take(
                jnp.concatenate(batch_d, axis=0), rows_j, axis=0
            )
            conf_all = jnp.take(
                jnp.concatenate(batch_c, axis=0), rows_j, axis=0
            )
            pts, cols = self._fuse_and_filter(
                depth_all, conf_all, K, Rs, ts, small, row, ids, t0, t_prep, V
            )
            if return_maps:
                return pts, cols, self._maps_dict(
                    depth_all, conf_all, K, Rs, ts, ids)
            return pts, cols

        computed: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        if todo and use_mesh:
            # Multi-chip: ALL pending view jobs shard over the mesh's 'data'
            # axis in one call (the reference loops views serially on one
            # GPU, mvs_patchmatch.py:104-123).
            from recon3d_tpu.dense.distributed import distributed_patchmatch

            tids = [ids[v] for v in todo]
            out = distributed_patchmatch(
                grays[todo],
                np.stack([grays[[row[j] for j in sources[i]]] for i in tids]),
                K,
                Rs[todo], ts[todo],
                np.stack([Rs[[row[j] for j in sources[i]]] for i in tids]),
                np.stack([ts[[row[j] for j in sources[i]]] for i in tids]),
                ranges[todo],
                mesh=mesh,
                num_iterations=cfg.num_iterations,
                num_samples=cfg.num_refine_samples,
                patch=cfg.patch_size,
                ncc_threshold=cfg.ncc_confidence_threshold,
                keys=keys_np[todo],
                coarse_factor=cfg.coarse_factor,
                fine_iterations=cfg.fine_iterations,
            )
            d_np, c_np = np.asarray(out.depth), np.asarray(out.confidence)
            computed = {v: (d_np[k], c_np[k]) for k, v in enumerate(todo)}
        elif todo:
            # Single-device with checkpointing: pull each batch to host so
            # every finished view persists before the next batch runs.
            for pos, out in self._depth_batches(
                todo, ids, grays, sources, Rs, ts, ranges, K, keys_np,
                row, views_per_batch,
            ):
                d_np = np.asarray(out.depth)
                c_np = np.asarray(out.confidence)
                for r, v in enumerate(pos):
                    computed[v] = (d_np[r], c_np[r])
                    if checkpointer is not None:
                        checkpointer.save_depth(ids[v], d_np[r], c_np[r])

        if checkpointer is not None and use_mesh:
            for v, (d, c) in computed.items():
                checkpointer.save_depth(ids[v], d, c)

        maps = {**loaded, **computed}
        depth_all = jnp.asarray(np.stack([maps[v][0] for v in range(V)]))
        conf_all = jnp.asarray(np.stack([maps[v][1] for v in range(V)]))
        pts, cols = self._fuse_and_filter(
            depth_all, conf_all, K, Rs, ts, small, row, ids, t0, t_prep, V
        )
        if return_maps:
            return pts, cols, self._maps_dict(
                depth_all, conf_all, K, Rs, ts, ids)
        return pts, cols

    @staticmethod
    def _maps_dict(depth_all, conf_all, K, Rs, ts, ids):
        return {
            "depth": np.asarray(depth_all),
            "conf": np.asarray(conf_all),
            "K": np.asarray(K),
            "Rs": np.asarray(Rs),
            "ts": np.asarray(ts),
            "ids": list(ids),
        }

    def _depth_batches(
        self, positions, ids, grays, sources, Rs, ts, ranges, K, keys_np,
        row, views_per_batch,
    ):
        """Yield (real_positions, padded DepthNormalMap) per view batch.

        ONE upload of the whole small gray stack; per-batch ref/source
        planes are device-side gathers (a per-batch float32 upload costs
        ~5x the bytes over the link and a transfer stall per batch). Each
        view's PRNG key is keys_np[its position in ids], so any subset of
        positions (checkpoint resume) reproduces a full run's maps.
        """
        cfg = self.config
        grays_d = jnp.asarray(grays)
        for b0 in range(0, len(positions), views_per_batch):
            pos = positions[b0 : b0 + views_per_batch]
            padp = pos + [pos[-1]] * (views_per_batch - len(pos))
            bid = [ids[v] for v in padp]
            ref_g = jnp.take(grays_d, jnp.asarray(padp), axis=0)
            src_g = jnp.take(
                grays_d,
                jnp.asarray([[row[j] for j in sources[i]] for i in bid]),
                axis=0,
            )
            out = patchmatch_depth_batch(
                ref_g, src_g, jnp.asarray(K),
                jnp.asarray(Rs[padp]), jnp.asarray(ts[padp]),
                jnp.asarray(np.stack([Rs[[row[j] for j in sources[i]]] for i in bid])),
                jnp.asarray(np.stack([ts[[row[j] for j in sources[i]]] for i in bid])),
                jnp.asarray(ranges[padp]),
                jnp.asarray(keys_np[padp]),
                num_iterations=cfg.num_iterations,
                num_samples=cfg.num_refine_samples,
                patch=cfg.patch_size,
                ncc_threshold=cfg.ncc_confidence_threshold,
                coarse_factor=cfg.coarse_factor,
                fine_iterations=cfg.fine_iterations,
            )
            yield pos, out

    def _fuse_and_filter(
        self, depth_all, conf_all, K, Rs, ts, small, row, ids, t0, t_prep, V
    ):
        """Fusion + filtering shared by the single-device and mesh paths:
        back-project every confident pixel of every view in ONE vmapped call
        (reference _fuse_depth_maps :536-570 loops views), compact on device,
        then radius-filter + voxel-downsample."""
        cfg = self.config
        J = min(cfg.num_source_views, V - 1)
        min_views = min(cfg.min_views, J)
        t_depth = time.time() - t0 - t_prep
        from recon3d_tpu.dense.plane_sweep import _fuse_program

        pts_b, mask_b = _fuse_program()(
            depth_all, jnp.asarray(K),
            jnp.asarray(Rs), jnp.asarray(ts),
            conf_all >= min_views,
        )
        # Device-side compaction: download only the selected points (+ flat
        # indices for the host-side color lookup), not every depth-map slot.
        from recon3d_tpu.dense.plane_sweep import fused_points_compact

        points, sel_idx = fused_points_compact(pts_b, mask_b)
        colors = (
            small[[row[i] for i in ids]].reshape(-1, 3)[sel_idx] * 255
        ).astype(np.uint8)
        t_fuse = time.time() - t0 - t_prep - t_depth
        if len(points):
            from recon3d_tpu.dense.filters import (
                radius_outlier_filter,
                voxel_downsample,
            )

            points, colors = radius_outlier_filter(points, colors)
            points, colors = voxel_downsample(points, colors, cfg.voxel_size)
        t_filter = time.time() - t0 - t_prep - t_depth - t_fuse
        print(
            f"[patchmatch] {len(points)} points from {V} views "
            f"({time.time() - t0:.1f}s: prep {t_prep:.1f}, depth {t_depth:.1f}, "
            f"fuse {t_fuse:.1f}, filter {t_filter:.1f})"
        )
        return points.astype(np.float32), colors
