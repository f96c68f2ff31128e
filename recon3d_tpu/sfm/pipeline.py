"""Incremental structure-from-motion pipeline.

Capability parity with reference src/core/sfm_pipeline.py (SfMPipeline :28-938):
load -> extract -> match -> init-pair -> incremental registration loop ->
motion refinement -> normalization -> PLY. The host Python here is O(images)
control flow only (SURVEY.md §7 build plan, step 5); every hot operation is a
fixed-shape jitted kernel from recon3d_tpu.ops:

  reference (OpenCV/C++)                      here (XLA/TPU)
  ----------------------------------------    ---------------------------------
  FLANN per-pair loop (:188-208)              MXU distance-matrix matcher
  cv.findFundamentalMat RANSAC (:357)         vmapped 8-point hypothesis batch
  cv.solvePnPRansac x3 (:567-584)             vmapped 6-pt DLT batch + GN polish
  cv.triangulatePoints per pair (:635-693)    batched DLT + masked validation
  per-camera PnP "BA" (:694-776)              batched GN motion refinement

Dynamic-size state (tracks, observations) lives on the host in numpy; device
calls are padded to power-of-two buckets so jit caches stay small.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from recon3d_tpu.camera import Camera, CameraPose, load_calibration, projection_from_KRt
from recon3d_tpu.config import ReconstructionConfig
from recon3d_tpu.features.frontend import (
    FeatureExtractor,
    FeatureMatcher,
    feature_slice,
)
from recon3d_tpu.io.dataset import ImageSet, load_image_set
from recon3d_tpu.io.ply import save_ply, save_cameras_ply
from recon3d_tpu.ops.estimation import (
    estimate_pose_pnp_wave,
    estimate_pose_pnp_wave_indexed,
)
from recon3d_tpu.ops.epipolar import essential_from_fundamental, recover_pose
from recon3d_tpu.ops.pnp import refine_pose_gn, project_points
from recon3d_tpu.ops.triangulate import (
    triangulate_dlt,
    validate_triangulation,
    triangulation_angles,
    reprojection_errors,
)


def _pad_pow2(n: int, lo: int = 256, hi: int = 16384, factor: int = 4) -> int:
    """Pad a data-dependent size to a geometric bucket (default x4 growth).

    EVERY device-facing batch dimension in this pipeline goes through a
    bucket like this: XLA compiles one program per distinct shape, and over
    a high-latency tunnel a fresh 20-40 s compile per wave dwarfs the actual
    device time. Coarse x4 buckets keep the number of distinct programs to a
    handful per run (reused from the persistent compile cache across runs AND
    across scenes, since buckets are scene-independent); the padded slots are
    masked, cheap linear work."""
    c = lo
    while c < n and c < hi:
        c *= factor
    return c


# --------------------------------------------------------------------------
# Jitted helpers (fixed-shape, cached per padded size)


@jax.jit
def _triangulate_validated(
    K, R1, t1, R2, t2, x1, x2, mask, max_reproj, min_parallax, max_depth_factor
):
    P1 = projection_from_KRt(K, R1, t1)
    P2 = projection_from_KRt(K, R2, t2)
    X = triangulate_dlt(P1, P2, x1, x2)
    ok = validate_triangulation(
        K, R1, t1, R2, t2, X, x1, x2,
        max_reproj_px=max_reproj,
        min_parallax_deg=min_parallax,
        max_depth_factor=max_depth_factor,
    )
    C1 = -R1.T @ t1
    C2 = -R2.T @ t2
    parallax = triangulation_angles(C1, C2, X)
    return X, ok & (mask > 0), parallax


@jax.jit
def _refine_cameras_batch(K, Rs, ts, Xs, xs, ws):
    """All registered cameras refined in ONE dispatch (Rs (C,3,3), ts (C,3),
    Xs (C,N,3), xs (C,N,2), ws (C,N)) — per-camera calls over a high-latency
    device link cost ~0.2 s each in round trips alone."""
    return jax.vmap(
        lambda R, t, X, x, w: refine_pose_gn(K, R, t, X, x, w, iterations=6)
    )(Rs, ts, Xs, xs, ws)


@jax.jit
def _refine_cameras_with_errors(K, Rs, ts, Xs, xs, ws):
    """Motion refinement + before/after mean reprojection error, ONE dispatch.

    The observation tables don't change during motion-only refinement, so the
    whole "light BA" (reference sfm_pipeline.py:694-776: per-camera resolve +
    error printouts) is a single device program instead of uploading the
    padded observation stack once per sweep and once per error readout."""

    def errs(Rb, tb):
        e = jax.vmap(lambda R, t, X, x: reprojection_errors(K, R, t, X, x))(
            Rb, tb, Xs, xs
        )
        return jnp.sum(e * ws) / jnp.maximum(jnp.sum(ws), 1.0)

    before = errs(Rs, ts)
    Rn, tn = jax.vmap(
        lambda R, t, X, x, w: refine_pose_gn(K, R, t, X, x, w, iterations=12)
    )(Rs, ts, Xs, xs, ws)
    return Rn, tn, before, errs(Rn, tn)


@jax.jit
def _reproj_errors(K, R, t, X, x):
    return reprojection_errors(K, R, t, X, x)


@jax.jit
def _reproj_errors_batch(K, Rs, ts, Xs, xs):
    return jax.vmap(lambda R, t, X, x: reprojection_errors(K, R, t, X, x))(
        Rs, ts, Xs, xs
    )


@jax.jit
def _reproj_errors_gather(K, Rs, ts, cam_idx, X, x):
    """Per-element reprojection error with per-element camera (gathered from
    the registered-pose table). Lets link checks against MANY cameras run as
    one dispatch."""
    Rg = jnp.take(Rs, cam_idx, axis=0)
    tg = jnp.take(ts, cam_idx, axis=0)
    Xc = jnp.einsum("nij,nj->ni", Rg, X) + tg
    z = Xc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    uv = Xc[:, :2] / zs[:, None]
    u = K[0, 0] * uv[:, 0] + K[0, 1] * uv[:, 1] + K[0, 2]
    v = K[1, 1] * uv[:, 1] + K[1, 2]
    err = jnp.linalg.norm(jnp.stack([u, v], axis=-1) - x, axis=-1)
    return jnp.where(z > 1e-6, err, 1e9)


@functools.partial(
    jax.jit,
    static_argnames=("use_essential", "essential_hypotheses"),
)
def _init_candidates_batch(K, Fs, x1s, x2s, masks, max_reproj,
                           max_depth_factor, keys=None, use_essential=False,
                           essential_threshold_px=2.0,
                           essential_hypotheses=512):
    """Score every initial-pair candidate in ONE dispatch: E (direct 5-DoF
    RANSAC when use_essential, else K^T F K from the match-stage F), pose
    recovery, triangulation + validation, per-point parallax (reference
    find_best_initial_pair sfm_pipeline.py:331-433 runs this per candidate
    sequentially, always via the F route)."""

    def one(key, F, x1, x2, mask):
        if use_essential:
            # Re-estimate E on the (already F-verified) correspondences:
            # the 5-DoF model rejects the off-manifold distortion a 7-DoF F
            # can fit on thin-parallax pairs (ops/estimation.py,
            # tests/test_ransac.py::test_essential_beats_fundamental_*).
            from recon3d_tpu.ops.estimation import estimate_essential_ransac

            E = estimate_essential_ransac(
                key, K, x1, x2, mask,
                threshold_px=essential_threshold_px,
                num_hypotheses=essential_hypotheses,
            ).E
        else:
            E = essential_from_fundamental(F, K)
        R, t, front = recover_pose(E, x1, x2, K, mask)
        X, ok, parallax = _triangulate_validated(
            K, jnp.eye(3), jnp.zeros(3), R, t, x1, x2, mask,
            max_reproj, 0.5, max_depth_factor,
        )
        return R, t, ok, parallax

    if keys is None:
        keys = jnp.zeros((Fs.shape[0], 2), jnp.uint32)
    return jax.vmap(one)(keys, Fs, x1s, x2s, masks)


@jax.jit
def _triangulate_validated_batch(
    K, R1s, t1s, R2s, t2s, x1s, x2s, masks,
    max_reproj, min_parallax, max_depth_factor,
):
    """Vmapped pairwise triangulation: every partner pair of a newly
    registered image in ONE dispatch."""
    return jax.vmap(
        lambda R1, t1, R2, t2, x1, x2, m: _triangulate_validated(
            K, R1, t1, R2, t2, x1, x2, m,
            max_reproj, min_parallax, max_depth_factor,
        )
    )(R1s, t1s, R2s, t2s, x1s, x2s, masks)


class _PointStore:
    """Growable (N, dim) numpy array: amortized O(1) append, O(1) view.

    The reconstruction's point/color tables were Python lists of (3,) rows;
    every wave's device prep then paid an O(P) list->array conversion (and
    on this single-vCPU host that interpreter work lands inside the
    post-device-burst slowdown window, BASELINE.md caveat). A doubling
    buffer makes appends C-level and the full-table view free."""

    __slots__ = ("_buf", "_n", "_dim", "_dtype")

    def __init__(self, dim: int, dtype, data=None):
        self._dim = dim
        self._dtype = np.dtype(dtype)
        if data is None or len(data) == 0:
            self._buf = np.empty((256, dim), self._dtype)
            self._n = 0
        else:
            arr = np.asarray(data, self._dtype).reshape(-1, dim)
            self._buf = arr.copy()
            self._n = len(arr)

    def __len__(self) -> int:
        return self._n

    def append(self, row) -> int:
        if self._n == len(self._buf):
            grown = np.empty((2 * len(self._buf), self._dim), self._dtype)
            grown[: self._n] = self._buf
            self._buf = grown
        self._buf[self._n] = row
        self._n += 1
        return self._n - 1

    def view(self) -> np.ndarray:
        """Zero-copy (N, dim) view of the live rows (do not mutate)."""
        return self._buf[: self._n]

    def replace(self, data) -> None:
        if data is None or len(data) == 0:
            self._n = 0
            return
        arr = np.asarray(data, self._dtype).reshape(-1, self._dim)
        self._buf = arr.copy()
        self._n = len(arr)


class _LazyFeatureList:
    """Sequence view over stacked (V, ...) features: slices one image's
    arrays only when accessed (match-graph bridging needs a handful)."""

    def __init__(self, stacked, n: int):
        self._stacked = stacked
        self._n = n

    def __len__(self):
        return self._n

    def __getitem__(self, i):
        return feature_slice(self._stacked, i)


class SfMPipeline:
    """Incremental SfM (reference sfm_pipeline.py:28-86 constructor parity).

    Args:
      calibration_path: optional .npz (mtx, dist) file.
      fast_mode: fewer features / looser ratio (reference :54-62).
      neural_mode: use SuperPoint+LightGlue frontend instead of SIFT.
      config: full ReconstructionConfig (overrides fast_mode presets).
    """

    def __init__(
        self,
        calibration_path: Optional[str] = None,
        fast_mode: bool = False,
        neural_mode: bool = False,
        config: Optional[ReconstructionConfig] = None,
        mesh=None,
        prescale_hints: Tuple[float, ...] = (),
    ):
        self.config = config or (
            ReconstructionConfig.fast() if fast_mode else ReconstructionConfig()
        )
        # optional jax.sharding.Mesh: pair-matching chunks shard over its
        # 'data' axis (multi-chip hosts); None = single-device jit path
        self.mesh = mesh
        # Dense-stage working scales to prescale at LOAD time: host numpy
        # runs 10-50x slower for tens of seconds right after heavy device
        # phases on single-vCPU tunneled hosts, so the dense backends'
        # image prep must happen before the sparse stage touches the
        # device (ImageSet.small_color cache).
        self.prescale_hints = tuple(prescale_hints)
        self.camera: Optional[Camera] = (
            load_calibration(calibration_path) if calibration_path else None
        )
        self.neural_mode = neural_mode
        if neural_mode:
            from recon3d_tpu.neural.matcher import NeuralMatcher

            self.extractor = NeuralMatcher(self.config.neural)
            self.matcher = self.extractor
        else:
            self.extractor = FeatureExtractor(self.config.sift)
            self.matcher = FeatureMatcher(self.config.match)

        self._key = jax.random.PRNGKey(self.config.sfm.seed)
        self.reset()

    # -- state ------------------------------------------------------------

    def reset(self):
        self.image_set: Optional[ImageSet] = None
        self.features: List = []
        self.features_stacked = None
        self.kp_xy: List[np.ndarray] = []
        self._kp_cache = None
        # device copy of the concatenated keypoint table (uploaded once per
        # reconstruction for the indexed PnP wave; re-uploaded when the
        # table grows, e.g. after a long-span rematch appends keypoints)
        self._kp_flat_dev = None
        self.matches: Dict[Tuple[int, int], Dict[str, np.ndarray]] = {}
        self.poses: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self.registered: Set[int] = set()
        self.failed: Set[int] = set()
        self._pts = _PointStore(3, np.float32)
        self._cols = _PointStore(3, np.uint8)
        self.observations: List[List[Tuple[int, int]]] = []
        # Arrival-order (pid, cam, kp) log mirroring `observations` — feeds
        # the device-resident log BA (sfm/bundle.py bundle_adjust_log):
        # only rows appended since the previous BA call upload, and the
        # point-major table rebuild happens on device. Kept in sync by
        # _record_obs; bundle_adjustment_full detects external rewrites of
        # `observations` (global_sfm, drop_invalid_observations) by total
        # count and rebuilds.
        self._obs_log = _PointStore(3, np.int32)
        # Generation counter: every site that REASSIGNS/rebuilds
        # `observations` wholesale (drop_invalid_observations, global_sfm
        # track rebuild) must bump obs_generation; the log BA compares it
        # (not just total counts, which a rewrite can coincidentally
        # preserve) to decide whether the device-resident log is stale.
        self._obs_generation = 0
        self._obs_log_generation = 0
        self._ba_log_cache: Dict = {}
        self.kp_to_point: List[np.ndarray] = []
        # Incremental 2D-3D correspondence index: for each UNregistered
        # image, {kp -> point id} maintained as links are created (via
        # _note_kp_link) instead of rebuilt from every match pair per wave
        # (the reference rescans all pairs per candidate, :478-510 — O(V*E)
        # per wave; this is amortized O(E) over the whole run).
        self.corr: Dict[int, Dict[int, int]] = {}
        self._kp_links: Dict[int, Dict[int, List[Tuple[int, int]]]] = {}
        self.stats: Dict = {}

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # -- stage 1: load ------------------------------------------------------

    def load_images(self, image_dir: str, max_images: Optional[int] = None) -> ImageSet:
        """Load + resize + undistort (reference :87-124)."""
        self.image_set = load_image_set(
            image_dir,
            camera=self.camera,
            max_size=self.config.sfm.max_image_size,
            max_images=max_images,
        )
        self.camera = self.image_set.camera
        for s in self.prescale_hints:
            self.image_set.small_color(s)
        return self.image_set

    def set_image_set(self, image_set: ImageSet):
        """Inject a pre-loaded set (synthetic scenes, tests)."""
        self.image_set = image_set
        self.camera = image_set.camera

    # -- stage 2: features ----------------------------------------------------

    def extract_features(self):
        """Per-image feature extraction (reference :126-157)."""
        t0 = time.time()
        n = self.image_set.gray.shape[0]
        self.features = []
        self.kp_xy = []
        self._kp_cache = None
        if hasattr(self.extractor, "extract_batch"):
            # stacked (V, ...) device arrays; per-image views only on demand
            # (eagerly slicing every image costs hundreds of dispatches)
            tm: Dict[str, float] = {}
            stacked = self.extractor.extract_batch(
                self.image_set.gray, timings=tm
            )
            self.features_stacked = stacked
            self.features = _LazyFeatureList(stacked, n)
            # keypoint pull: the one host sync of the stage — it waits on
            # every describe program, then downloads (V,K,2)+(V,K) over
            # the device link. desc stays on device (matching reads it
            # there); timed separately so the stage wall-clock is
            # attributable (VERDICT r4 #2).
            t_pull = time.time()
            xy_all = np.asarray(stacked.xy)
            valid_all = np.asarray(stacked.valid)
            tm["kp_pull_sync_s"] = time.time() - t_pull
            self.stats["extract_detail_s"] = {
                k: round(v, 3) for k, v in tm.items()
            }
        else:  # neural frontend extracts per image
            feats = [
                self.extractor.extract(self.image_set.gray[i]) for i in range(n)
            ]
            self.features_stacked = None
            self.features = feats
            xy_all = np.asarray(jnp.stack([f.xy for f in feats]))
            valid_all = np.asarray(jnp.stack([f.valid for f in feats]))
        for r in range(n):
            self.kp_xy.append(xy_all[r])
            self.kp_to_point.append(
                np.full(xy_all.shape[1], -1, dtype=np.int64)
            )
        counts = valid_all.sum(1).astype(int).tolist()
        self.stats["extract_time"] = time.time() - t0
        self.stats["features_per_image"] = counts
        print(f"[sfm] extracted features: mean {np.mean(counts):.0f}/image "
              f"({self.stats['extract_time']:.1f}s)")

    # -- stage 3: matching ----------------------------------------------------

    def _candidate_pairs(self, n: int) -> List[Tuple[int, int]]:
        """Window + loop-closure + stride probes (reference :164-182)."""
        w = self.config.sfm.match_window
        pairs = set()
        for i in range(n):
            for j in range(i + 1, min(n, i + 1 + w)):
                pairs.add((i, j))
        if self.config.sfm.loop_closure and n > 2 * w:
            for i in range(w):
                for j in range(n - w, n):
                    if i < j:
                        pairs.add((i, j))
            # Stride probes DOUBLE until they span the sequence: large
            # scenes need mid-range anchor edges, not just 2w/4w. On a
            # 300-view arc the 4w=32 probes left only 17 long edges; the
            # rotation-averaging init bent ~10 deg (a bent local minimum
            # even full BA cannot escape), while spans up to n/2 anchor the
            # global shape for ~20 extra pairs (docs/global_sfm.md).
            stride = 2 * w
            while stride < n:
                for i in range(0, n - stride, max(1, stride // 2)):
                    pairs.add((i, i + stride))
                stride *= 2
        return sorted(pairs)

    def match_image_pairs(self):
        """Geometric matching of candidate pairs (reference :158-246).

        Both frontends match whole pair CHUNKS in one device program (the
        classical path vmaps the streaming matcher + F-RANSAC, frontend.py
        match_pairs_batched; the neural path vmaps LightGlue + F-RANSAC,
        neural/matcher.py match_pairs_batched) — the reference's per-pair
        FLANN/LightGlue loop (:188-208) becomes a batch axis."""
        t0 = time.time()
        n = len(self.features)
        pairs = self._candidate_pairs(n)
        kept = 0
        if pairs:
            if self.neural_mode:
                hw = self.image_set.gray.shape[1:3]
                results = self.matcher.match_pairs_batched(
                    self.features, pairs, self._next_key(), hw=hw,
                    mesh=self.mesh,
                )
            else:
                from recon3d_tpu.features.frontend import match_pairs_batched

                results = match_pairs_batched(
                    self.features_stacked, pairs, self._next_key(),
                    self.config.match, mesh=self.mesh,
                )
            for (i, j, idx1, idx2, F, n_inl, n_raw) in results:
                if (
                    n_raw >= self.config.match.min_matches
                    and n_inl >= self.config.match.min_matches
                ):
                    self.matches[(i, j)] = dict(
                        idx1=idx1,
                        idx2=idx2,
                        F=F,
                        n=len(idx1),
                    )
                    kept += 1
            if (
                self.config.match.long_span_rematch
                and not self.neural_mode
            ):
                kept += self._rematch_long_span(pairs)
        print(f"[sfm] matched {kept}/{len(pairs)} pairs "
              f"({time.time() - t0:.1f}s)")
        self._bridge_components(n)
        self._build_kp_links()
        self.stats["match_time"] = time.time() - t0
        self.stats["num_pairs"] = kept

    def _rematch_long_span(self, pairs) -> int:
        """Selective high-res re-matching of FAILED long-span probe pairs.

        On window-limited capture arcs the long-range edges are what anchor
        the global shape (the 300-view scenario bent ~10 deg without them,
        docs/global_sfm.md); at load resolution those pairs mostly fail.
        One 2x-upsampled SIFT pass over just the failed pairs' images adds
        a -1 octave of finer scales; recovered keypoints are appended to
        the per-image tables (scaled back to load-resolution pixels) so
        every downstream stage indexes them like any other keypoint, and
        the pair F is conjugated back to load-resolution coordinates.
        Returns the number of pairs recovered."""
        w = self.config.sfm.match_window
        mc = self.config.match
        H0, W0 = self.image_set.gray.shape[1:]
        if max(H0, W0) > mc.rematch_max_dim:
            return 0  # load res already covers the feature-scale floor
        failed = sorted(
            ((i, j) for (i, j) in pairs
             if j - i >= 2 * w and (i, j) not in self.matches),
            # SHORTEST span first: every candidate already spans >= 2x the
            # match window (a real global anchor), and recoverability falls
            # off steeply with viewpoint change — longest-first burned the
            # whole rematch budget on 50-90 deg spans that can never match
            # while the recoverable ~25 deg probes went unattempted
            # (measured on the 64-view occluded arc, round 5).
            key=lambda p: p[1] - p[0],
        )[: mc.rematch_max_pairs]
        if not failed:
            return 0
        import jax.image as jimage

        from recon3d_tpu.features.frontend import (
            FeatureExtractor, match_pairs_batched,
        )

        s = float(self.config.match.rematch_scale)
        imgs = sorted({i for p in failed for i in p})
        local = {g: l for l, g in enumerate(imgs)}
        gray = self.image_set.gray[imgs]
        H, W = gray.shape[1:]
        up = jimage.resize(
            jnp.asarray(gray), (len(imgs), int(H * s), int(W * s)),
            method="linear",
        )
        feats = FeatureExtractor(self.config.sift).extract_batch(up)
        res = match_pairs_batched(
            feats, [(local[i], local[j]) for (i, j) in failed],
            self._next_key(), self.config.match, mesh=self.mesh,
        )
        xy_up = np.asarray(feats.xy)       # upscaled-pixel coords
        valid_np = np.asarray(feats.valid)
        # resize uses half-pixel centers: x_up = s*x + (s-1)/2
        xy_load = (xy_up - (s - 1.0) / 2.0) / s
        # conjugate F back to load coords: F_load = S^T F_up S
        S = np.array(
            [[s, 0.0, (s - 1.0) / 2.0],
             [0.0, s, (s - 1.0) / 2.0],
             [0.0, 0.0, 1.0]], np.float32,
        )
        offset = {}
        remap = {}
        recovered = 0
        degenerate = 0
        mm = self.config.match.min_matches
        from recon3d_tpu.ops.estimation import estimate_homography_ransac

        for r, (i, j) in enumerate(failed):
            (_, _, idx1, idx2, F, n_inl, n_raw) = res[r]
            if n_raw < mm or n_inl < mm:
                continue
            # H/F degeneracy gate (COLMAP mapper policy): a single
            # homography explaining >= 80% of the F-inliers means the pair
            # carries no parallax signal — on self-similar texture the 2x
            # re-match happily "verifies" FALSE wide-baseline pairs whose
            # implied relative rotation is tens of degrees wrong (measured:
            # span>=129 probes, ~32 deg median error); those matches are
            # plane-to-plane and H-consistent, genuine wide-baseline pairs
            # of a 3D scene are not.
            cap2 = _pad_pow2(len(idx1), lo=64)
            ha = np.zeros((cap2, 2), np.float32)
            hb = np.zeros((cap2, 2), np.float32)
            hm = np.zeros(cap2, np.float32)
            ha[: len(idx1)] = xy_up[local[i]][idx1]
            hb[: len(idx2)] = xy_up[local[j]][idx2]
            hm[: len(idx1)] = 1.0
            hres = estimate_homography_ransac(
                self._next_key(), jnp.asarray(ha), jnp.asarray(hb),
                jnp.asarray(hm),
                threshold_px=self.config.match.ransac_threshold_px * s,
            )
            if int(hres.num_inliers) >= 0.8 * n_inl:
                degenerate += 1
                continue
            # Essential-compatibility gate: with K known, a geometrically
            # valid pair's F is (nearly) K^T-conjugate to an essential
            # matrix; project E = K^T F K to equal singular values and
            # require the inlier set to survive the projection. Random
            # texture correspondences that some 7-DoF F happens to fit are
            # not E-compatible and shed their "inliers" here. (Host numpy:
            # a 3x3 SVD + Sampson over <= a few hundred matches.)
            F_load = S.T @ F @ S
            Kn = np.asarray(self.camera.K, np.float64)
            E = Kn.T @ F_load @ Kn
            U, _, Vt = np.linalg.svd(E)
            F_e = np.linalg.inv(Kn).T @ (
                U @ np.diag([1.0, 1.0, 0.0]) @ Vt
            ) @ np.linalg.inv(Kn)
            a1 = np.concatenate(
                [xy_load[local[i]][idx1], np.ones((len(idx1), 1))], axis=1
            )
            b1 = np.concatenate(
                [xy_load[local[j]][idx2], np.ones((len(idx2), 1))], axis=1
            )
            Fx = a1 @ F_e.T
            Ftx = b1 @ F_e
            num = np.abs(np.sum(b1 * Fx, axis=1))
            den = np.sqrt(
                Fx[:, 0] ** 2 + Fx[:, 1] ** 2
                + Ftx[:, 0] ** 2 + Ftx[:, 1] ** 2
            )
            samp = num / np.maximum(den, 1e-12)
            thr = self.config.match.ransac_threshold_px
            if (samp < thr).sum() < max(mm, 0.7 * n_inl):
                degenerate += 1
                continue
            for g in (i, j):
                if g not in offset:
                    # Compact to VALID slots before appending: the padded
                    # table's invalid slots carry garbage coordinates, and
                    # appending them wholesale bloats the per-image kp/BA
                    # tables by the full padded capacity per image (ADVICE
                    # r4). idx1/idx2 remap through the compaction order.
                    keep = np.flatnonzero(valid_np[local[g]])
                    rm = np.full(valid_np.shape[1], -1, np.int64)
                    rm[keep] = np.arange(len(keep))
                    remap[g] = rm
                    offset[g] = len(self.kp_xy[g])
                    self.kp_xy[g] = np.concatenate(
                        [self.kp_xy[g], xy_load[local[g]][keep]]
                    )
                    self.kp_to_point[g] = np.concatenate([
                        self.kp_to_point[g],
                        np.full(len(keep), -1, np.int64),
                    ])
            # aux=True: pose-graph-only edge. Recovered keypoints carry ~2x
            # the localization noise of load-resolution ones (measured on
            # the 300-view arc: letting them into tracks/BA moved reproj
            # 0.78 -> 1.03 px and consecutive rel-rot 1.35 -> 1.77 deg);
            # as averaging-graph edges they anchor the global shape, which
            # is the thing long spans are uniquely good for.
            self.matches[(i, j)] = dict(
                idx1=remap[i][idx1] + offset[i],
                idx2=remap[j][idx2] + offset[j],
                F=S.T @ F @ S,
                n=len(idx1),
                aux=True,
            )
            recovered += 1
        if recovered or degenerate:
            self._kp_cache = None
            print(f"[sfm] long-span rematch: {recovered}/{len(failed)} "
                  f"failed probe pairs recovered at {s:.0f}x "
                  f"({degenerate} rejected as H-degenerate)")
        return recovered

    def _build_kp_links(self):
        """Per-camera reverse match index: kp -> [(partner image, partner
        kp)] over every kept match, powering the incremental correspondence
        propagation in _note_kp_link."""
        links: Dict[int, Dict[int, List[Tuple[int, int]]]] = {}
        for (a, b), m in self.matches.items():
            if m.get("aux"):
                continue  # pose-graph-only edges (see _rematch_long_span)
            la = links.setdefault(a, {})
            lb = links.setdefault(b, {})
            for ka, kb in zip(m["idx1"].tolist(), m["idx2"].tolist()):
                la.setdefault(ka, []).append((b, kb))
                lb.setdefault(kb, []).append((a, ka))
        self._kp_links = links

    def _components(self, n: int) -> List[Set[int]]:
        """Connected components of the match graph (reference :247-277)."""
        parent = list(range(n))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for (i, j) in self.matches:
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[ri] = rj
        comps: Dict[int, Set[int]] = {}
        for i in range(n):
            comps.setdefault(find(i), set()).add(i)
        return sorted(comps.values(), key=len, reverse=True)

    def _bridge_components(self, n: int):
        """Try to connect disconnected components (reference :278-296)."""
        comps = self._components(n)
        if len(comps) <= 1:
            return
        print(f"[sfm] match graph fragmented into {len(comps)} components; bridging")
        main = comps[0]
        for other in comps[1:]:
            candidates = sorted(
                ((i, j) if i < j else (j, i))
                for i in list(main)[:6]
                for j in list(other)[:6]
            )[:8]
            for (i, j) in candidates:
                if (i, j) in self.matches:
                    continue
                m, F, n_inl = self.matcher.match_pair_geometric(
                    self.features[i], self.features[j], self._next_key()
                )
                if n_inl >= self.config.match.min_matches:
                    mask = np.asarray(m.mask)
                    self.matches[(i, j)] = dict(
                        idx1=np.asarray(m.idx1)[mask],
                        idx2=np.asarray(m.idx2)[mask],
                        F=np.asarray(F),
                        n=int(mask.sum()),
                    )
                    main |= other
                    break

    # -- stage 4: initialization ------------------------------------------------

    def _pair_xy(self, i: int, j: int):
        m = self.matches[(i, j)]
        return self.kp_xy[i][m["idx1"]], self.kp_xy[j][m["idx2"]]

    def find_best_initial_pair(self) -> Optional[Tuple[int, int]]:
        """Score candidate init pairs by inliers x parallax gate
        (reference :331-433: parallax in [1.5, 40] deg, boost [3, 20])."""
        cfg = self.config.sfm
        # Parallax-diverse candidate slate: pure top-by-match-count fills
        # the batch with ADJACENT pairs on dense capture arcs, whose median
        # parallax all sits below the 1.5-deg init gate ("no valid initial
        # pair" on the 50-view north-star: every adjacent pair measured
        # 1.3-1.45 deg). Match count correlates with small baseline, so the
        # slate must also cover longer spans: half the batch is the global
        # top by count, the other half the best-matched pair PER SPAN for
        # increasing spans (the reference scans every pair sequentially,
        # :331-433; this keeps the one-dispatch batch while restoring its
        # coverage).
        by_count = sorted(
            (kv for kv in self.matches.items() if not kv[1].get("aux")),
            key=lambda kv: -kv[1]["n"],
        )
        if not by_count:
            return None
        B = 10
        best_per_span: Dict[int, Tuple] = {}
        for (i, j), m in by_count:
            best_per_span.setdefault(j - i, ((i, j), m))
        spans = sorted(best_per_span)
        ranked, seen = [], set()
        for kv in [best_per_span[s] for s in spans[: B // 2]] + by_count:
            if kv[0] not in seen:
                seen.add(kv[0])
                ranked.append(kv)
            if len(ranked) == B:
                break
        K = self.camera.K
        # fixed batch of 10 (pad with identity-F zero-mask rows) — one
        # compiled program regardless of how many candidates exist
        cap = _pad_pow2(max(len(m["idx1"]) for _, m in ranked))
        Fs = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
        Fs[: len(ranked)] = np.stack([m["F"] for _, m in ranked])
        x1p = np.zeros((B, cap, 2), np.float32)
        x2p = np.zeros((B, cap, 2), np.float32)
        maskp = np.zeros((B, cap), np.float32)
        for b, ((i, j), m) in enumerate(ranked):
            x1, x2 = self._pair_xy(i, j)
            x1p[b, : len(x1)] = x1
            x2p[b, : len(x2)] = x2
            maskp[b, : len(x1)] = 1
        Rb, tb, ok_b, par_b = _init_candidates_batch(
            K, jnp.asarray(Fs), jnp.asarray(x1p), jnp.asarray(x2p),
            jnp.asarray(maskp),
            cfg.max_reproj_error_px, cfg.max_depth_factor,
            keys=jax.random.split(self._next_key(), B),
            use_essential=cfg.init_essential,
            essential_threshold_px=cfg.init_essential_threshold_px,
            essential_hypotheses=cfg.init_essential_hypotheses,
        )
        Rb, tb = np.asarray(Rb), np.asarray(tb)
        ok_b, par_b = np.asarray(ok_b), np.asarray(par_b)

        best, best_score = None, 0.0
        for b, ((i, j), m) in enumerate(ranked):
            okn = ok_b[b]
            if okn.sum() < cfg.min_matches_init // 2:
                continue
            med_par = float(np.median(par_b[b][okn]))
            if not (cfg.min_parallax_init_deg <= med_par <= cfg.max_parallax_init_deg):
                continue
            boost = 2.0 if 3.0 <= med_par <= 20.0 else 1.0
            score = okn.sum() * boost
            if score > best_score:
                best_score = score
                best = (i, j, Rb[b], tb[b])
        if best is None:
            return None
        i, j, R, t = best
        self._init_R, self._init_t = R, t
        print(f"[sfm] initial pair ({i}, {j}), score {best_score:.0f}")
        return (i, j)

    def initialize(self, pair: Tuple[int, int]):
        """Seed the reconstruction from the initial pair (reference :435-477)."""
        i, j = pair
        cfg = self.config.sfm
        self.poses[i] = (np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        self.poses[j] = (self._init_R.astype(np.float32), self._init_t.astype(np.float32))
        self.registered = {i, j}
        self.corr.pop(i, None)
        self.corr.pop(j, None)
        self._add_triangulated(i, j)
        print(f"[sfm] initialized with {len(self.points3d)} points")

    # -- stage 5: incremental loop -----------------------------------------------

    def _points_as_array(self) -> np.ndarray:
        """The (P, 3) float32 point table — a zero-copy view of the growable
        store (read-only by convention). Earlier rounds paid an O(P)
        list->array conversion here on every wave hot-path call."""
        return self._pts.view()

    @property
    def points3d(self) -> np.ndarray:
        """(P, 3) float32 view of the point table. Assignment accepts an
        array or a list of (3,) rows (checkpoint restore, CLI injection)."""
        return self._pts.view()

    @points3d.setter
    def points3d(self, value):
        self._pts.replace(value)

    @property
    def point_colors(self) -> np.ndarray:
        """(P, 3) uint8 view of the per-point colors."""
        return self._cols.view()

    @point_colors.setter
    def point_colors(self, value):
        self._cols.replace(value)

    def _kp_table(self):
        """(kp_flat (sum N, 2) float32, kp_off (V+1,) int64): every image's
        keypoints concatenated, with per-image offsets. kp_xy is immutable
        after feature extraction, so this is built once and reused by every
        wave's link checks and by bundle adjustment prep (previously rebuilt
        O(scene) per call)."""
        if self._kp_cache is None:
            kp_off = np.zeros(len(self.kp_xy) + 1, np.int64)
            np.cumsum(
                np.fromiter(
                    (len(k) for k in self.kp_xy), np.int64,
                    count=len(self.kp_xy),
                ),
                out=kp_off[1:],
            )
            kp_flat = (
                np.concatenate(
                    [np.asarray(k, np.float32).reshape(-1, 2)
                     for k in self.kp_xy]
                )
                if self.kp_xy else np.zeros((0, 2), np.float32)
            )
            self._kp_cache = (kp_flat, kp_off)
        return self._kp_cache

    def _note_kp_link(self, cam: int, kp: int, pid: int):
        """Record that (cam, kp) now observes point pid, and propagate the
        2D-3D correspondence to every unregistered match partner of that
        keypoint. Every kp_to_point assignment goes through here, keeping
        self.corr current without any per-wave rescan."""
        self.kp_to_point[cam][kp] = pid
        for (j, kpj) in self._kp_links.get(cam, {}).get(int(kp), ()):
            if j not in self.registered:
                self.corr.setdefault(j, {}).setdefault(kpj, pid)

    def _record_obs(self, pid: int, cam: int, kp: int):
        """Append one observation to BOTH the per-point list and the
        arrival-order log (the log BA's append-only upload contract)."""
        self.observations[pid].append((cam, kp))
        self._obs_log.append((pid, cam, kp))

    def _rebuild_obs_log(self):
        """Reconstruct the arrival-order log from `observations` after an
        external rewrite (point renumbering in drop_invalid_observations /
        global_sfm) and invalidate the device-side log cache."""
        self._ba_log_cache.clear()
        rows = [
            (pid, c, k)
            for pid, obs in enumerate(self.observations)
            for (c, k) in obs
        ]
        self._obs_log = _PointStore(3, np.int32, data=rows if rows else None)
        self._obs_log_generation = self._obs_generation

    def _correspondences_2d3d(self, i: int):
        """2D-3D correspondences for an unregistered image: matched
        keypoints whose registered-partner side has a 3D point (reference
        rescans all pairs, :478-510; here it's the incrementally maintained
        self.corr index)."""
        return self.corr.get(i, {})

    def _corr_arrays(self, i: int, floor: Optional[int] = None):
        """(kps, pids) int64 arrays for image i, or None if too few."""
        corr = self._correspondences_2d3d(i)
        if len(corr) < (floor or self.config.sfm.pnp_min_correspondences):
            return None
        kps = np.fromiter(corr.keys(), dtype=np.int64)
        pids = np.fromiter(corr.values(), dtype=np.int64)
        return kps, pids

    def find_next_image(self) -> Optional[int]:
        cfg = self.config.sfm
        best, best_n = None, cfg.pnp_min_correspondences - 1
        for i in range(len(self.features)):
            if i in self.registered or i in self.failed:
                continue
            n = len(self._correspondences_2d3d(i))
            if n > best_n:
                best, best_n = i, n
        return best

    def _wave_candidates(self):
        """Eligible unregistered images, strongest first (reference picks ONE
        best image per round, :478-510; the wave loop takes the whole strong
        cohort). Weak candidates (<30% of the best correspondence count) are
        deferred, not attempted — they gain correspondences as triangulation
        widens and register in a later wave."""
        cfg = self.config.sfm
        out = []
        for i in range(len(self.features)):
            if i in self.registered or i in self.failed:
                continue
            c = self._corr_arrays(i)
            if c is not None:
                out.append((i, c[0], c[1]))
        out.sort(key=lambda t: -len(t[1]))
        if out:
            floor = max(cfg.pnp_min_correspondences, int(0.3 * len(out[0][1])))
            out = [t for t in out if len(t[1]) >= floor]
        return out

    def _register_wave(
        self,
        cands,
        min_corr: Optional[int] = None,
        min_inlier_frac: float = 0.25,
    ) -> List[int]:
        """PnP-register a wave of images in ONE device dispatch.

        cands: list of (image_id, kps, pids). Every image x every cascade
        threshold (reference :567-584) solves in a single batched program
        (ops/estimation.estimate_pose_pnp_wave); acceptance per image picks
        the tightest passing threshold, exactly like the sequential cascade.
        min_corr/min_inlier_frac override the acceptance floor — the rescue
        pass trades a lower absolute count for a stricter inlier fraction.
        Returns the accepted image ids (state updated)."""
        cfg = self.config.sfm
        if not cands:
            return []
        det = self.stats.setdefault(
            "register_detail_s",
            {"prep": 0.0, "dispatch": 0.0, "solve_fetch": 0.0,
             "accept": 0.0, "waves": 0, "wave_shapes": []},
        )
        tm = time.time()
        # Batch axis padded to a pow2 bucket: the wave size ramps 1,1,2,3,5...
        # and an unpadded batch would compile a fresh PnP program per wave.
        B = _pad_pow2(len(cands), lo=1, hi=1024)
        cap = _pad_pow2(max(len(k) for _, k, _ in cands))
        # Index-based wave (estimate_pose_pnp_wave_indexed): upload int32
        # index tables + the small (P, 3) point table instead of dense
        # (B, cap, 3)/(B, cap, 2) operands — mid-run the tunneled link's
        # relay backpressure makes upload bytes the register stage's
        # dominant cost (BASELINE.md sparse attribution).
        pid_idx = np.full((B, cap), -1, np.int32)
        kp_idx = np.zeros((B, cap), np.int32)
        kp_flat, kp_off = self._kp_table()
        P_arr = self._points_as_array()
        # pow-4 padded point table: stable shapes across waves
        P_cap = _pad_pow2(len(P_arr), lo=256)
        P_pad = np.zeros((P_cap, 3), np.float32)
        P_pad[: len(P_arr)] = P_arr
        for b, (i, kps, pids) in enumerate(cands):
            pid_idx[b, : len(pids)] = pids
            kp_idx[b, : len(kps)] = (kp_off[i] + np.asarray(kps)).astype(
                np.int32
            )
        thr = jnp.asarray(np.asarray(cfg.pnp_thresholds_px, np.float32))
        keys = jax.random.split(self._next_key(), B)
        # keypoint table: immutable after extraction — device copy cached
        kp_dev = self._kp_flat_dev
        if kp_dev is None or kp_dev.shape[0] != len(kp_flat):
            kp_dev = self._kp_flat_dev = jnp.asarray(kp_flat)
        det["prep"] += time.time() - tm
        tm = time.time()
        res = estimate_pose_pnp_wave_indexed(
            keys, self.camera.K,
            jnp.asarray(P_pad), kp_dev,
            jnp.asarray(pid_idx), jnp.asarray(kp_idx), thr,
            num_hypotheses=cfg.pnp_hypotheses,
        )
        det["dispatch"] = det.get("dispatch", 0.0) + (time.time() - tm)
        tm = time.time()
        Rb = np.asarray(res.R)               # (B, T, 3, 3)
        tb = np.asarray(res.t)               # (B, T, 3)
        n_inl_b = np.asarray(res.num_inliers)  # (B, T)
        inl_b = np.asarray(res.inliers)      # (B, T, cap)
        det["solve_fetch"] += time.time() - tm
        det["waves"] += 1
        det.setdefault("wave_shapes", []).append([int(B), int(cap)])
        tm = time.time()

        debug_dir = os.environ.get("RECON3D_DEBUG_REGISTER_DIR")
        accepted: List[int] = []
        for b, (i, kps, pids) in enumerate(cands):
            n = len(kps)
            need = max(
                min_corr or cfg.pnp_min_correspondences,
                int(min_inlier_frac * n),
            )
            if debug_dir:
                os.makedirs(debug_dir, exist_ok=True)
                np.savez(
                    os.path.join(debug_dir, f"reg_{i:03d}.npz"),
                    X=Xp[b], x=xp[b], valid=vp[b], K=np.asarray(self.camera.K),
                    n=n, need=need, n_inl=n_inl_b[b],
                )
            for ti in range(len(cfg.pnp_thresholds_px)):
                if int(n_inl_b[b, ti]) < need:
                    continue
                self.poses[i] = (
                    Rb[b, ti].astype(np.float32), tb[b, ti].astype(np.float32)
                )
                self.registered.add(i)
                self.corr.pop(i, None)  # index only serves unregistered images
                # touch only the accepted inlier links (array-side mask);
                # the interpreter loop is O(new links), not O(candidates)
                sel = (
                    np.asarray(inl_b[b, ti][:n], bool)
                    & (self.kp_to_point[i][kps] < 0)
                )
                for kp, pid in zip(
                    np.asarray(kps)[sel].tolist(),
                    np.asarray(pids)[sel].tolist(),
                ):
                    self._note_kp_link(i, kp, pid)
                    self._record_obs(pid, i, kp)
                accepted.append(i)
                break
        det["accept"] += time.time() - tm
        return accepted

    def register_image(self, i: int) -> bool:
        """PnP registration with threshold cascade (reference :512-633)."""
        c = self._corr_arrays(i)
        if c is None:
            return False
        return i in self._register_wave([(i, c[0], c[1])])

    def _add_triangulated(self, i: int, j: int):
        """Triangulate unassigned matches of a registered pair
        (reference :635-693). Also links matches where one side already
        has a 3D point."""
        cfg = self.config.sfm
        key = (i, j) if (i, j) in self.matches else (j, i)
        if key not in self.matches or self.matches[key].get("aux"):
            return 0
        m = self.matches[key]
        a, b = key
        kpa, kpb = m["idx1"], m["idx2"]
        pa = self.kp_to_point[a][kpa]
        pb = self.kp_to_point[b][kpb]

        # Link matches where one side already has a 3D point — but only if
        # that point reprojects into the new camera within the gate
        # (otherwise wrong links poison the track table and BA).
        def _link(from_pts, to_cam, to_kps, sel):
            if sel.sum() == 0:
                return
            pids = from_pts[sel]
            kps = to_kps[sel]
            X = self._points_as_array()[pids]
            x = self.kp_xy[to_cam][kps].astype(np.float32)
            cap = _pad_pow2(len(X))
            Xp = np.zeros((cap, 3), np.float32)
            xp = np.zeros((cap, 2), np.float32)
            Xp[: len(X)] = X
            xp[: len(x)] = x
            R, t = self.poses[to_cam]
            e = np.asarray(
                _reproj_errors(self.camera.K, jnp.asarray(R), jnp.asarray(t),
                               jnp.asarray(Xp), jnp.asarray(xp))
            )[: len(X)]
            good = e < cfg.max_reproj_error_px
            for kp, pid in zip(kps[good], pids[good]):
                if self.kp_to_point[to_cam][kp] < 0:
                    self._note_kp_link(to_cam, int(kp), int(pid))
                    self._record_obs(int(pid), to_cam, int(kp))

        _link(pa, b, kpb, (pa >= 0) & (pb < 0))
        _link(pb, a, kpa, (pb >= 0) & (pa < 0))

        fresh = (pa < 0) & (pb < 0)
        if fresh.sum() == 0:
            return 0
        ka = kpa[fresh]
        kb = kpb[fresh]
        x1 = self.kp_xy[a][ka].astype(np.float32)
        x2 = self.kp_xy[b][kb].astype(np.float32)
        cap = _pad_pow2(len(x1))
        x1p = np.zeros((cap, 2), np.float32)
        x2p = np.zeros((cap, 2), np.float32)
        maskp = np.zeros(cap, np.float32)
        x1p[: len(x1)] = x1
        x2p[: len(x2)] = x2
        maskp[: len(x1)] = 1

        Ra, ta = self.poses[a]
        Rb, tb = self.poses[b]
        X, ok, _ = _triangulate_validated(
            self.camera.K,
            jnp.asarray(Ra), jnp.asarray(ta), jnp.asarray(Rb), jnp.asarray(tb),
            jnp.asarray(x1p), jnp.asarray(x2p), jnp.asarray(maskp),
            cfg.max_reproj_error_px, cfg.min_parallax_deg, cfg.max_depth_factor,
        )
        Xn = np.asarray(X)
        okn = np.asarray(ok)[: len(x1)]

        color_img = self.image_set.color[a]
        Hh, Ww = color_img.shape[:2]
        created = 0
        for idx in np.nonzero(okn)[0]:
            if len(self._pts) >= cfg.max_points:
                break
            pid = self._pts.append(Xn[idx])
            u = int(np.clip(round(x1[idx, 0]), 0, Ww - 1))
            v = int(np.clip(round(x1[idx, 1]), 0, Hh - 1))
            self._cols.append((color_img[v, u] * 255).astype(np.uint8))
            self.observations.append([(a, int(ka[idx])), (b, int(kb[idx]))])
            self._obs_log.append((pid, a, int(ka[idx])))
            self._obs_log.append((pid, b, int(kb[idx])))
            self._note_kp_link(a, int(ka[idx]), pid)
            self._note_kp_link(b, int(kb[idx]), pid)
            created += 1
        return created

    def triangulate_new_points(self, i: int) -> int:
        """Triangulate image i against every registered partner (reference
        :635-693)."""
        return self._triangulate_images([i])

    def _triangulate_images(self, imgs: List[int]) -> int:
        """Triangulate every match pair touching the given newly registered
        images (reference :635-693) — ALL images' link checks and pair
        triangulations for the whole wave run as two batched dispatches."""
        cfg = self.config.sfm
        keys_set = set()
        for i in imgs:
            for j in self.registered:
                if j == i:
                    continue
                key = (i, j) if (i, j) in self.matches else (j, i)
                if key in self.matches and not self.matches[key].get("aux"):
                    keys_set.add(key)
        partners = sorted(keys_set)
        if not partners:
            return 0

        # ---- phase 1: batched link checks (one side already has a point)
        # Candidate links are kept as per-pair array segments and fused with
        # one concatenate — no per-link interpreter work until acceptance.
        pid_parts, cam_parts, kp_parts = [], [], []
        fresh_sets = []
        for (a, b) in partners:
            m = self.matches[(a, b)]
            kpa, kpb = m["idx1"], m["idx2"]
            pa = self.kp_to_point[a][kpa]
            pb = self.kp_to_point[b][kpb]
            for from_pts, to_cam, to_kps, sel in (
                (pa, b, kpb, (pa >= 0) & (pb < 0)),
                (pb, a, kpa, (pb >= 0) & (pa < 0)),
            ):
                if sel.any():
                    pid_parts.append(from_pts[sel])
                    cam_parts.append(
                        np.full(int(sel.sum()), to_cam, np.int64)
                    )
                    kp_parts.append(np.asarray(to_kps[sel], np.int64))
            fresh_sets.append((a, b, kpa[(pa < 0) & (pb < 0)], kpb[(pa < 0) & (pb < 0)]))

        link_pid = (
            np.concatenate(pid_parts) if pid_parts
            else np.zeros(0, np.int64)
        )
        link_cam = (
            np.concatenate(cam_parts) if cam_parts
            else np.zeros(0, np.int64)
        )
        link_kp = (
            np.concatenate(kp_parts) if kp_parts
            else np.zeros(0, np.int64)
        )
        if len(link_pid):
            cams = sorted(self.registered)
            cam_row = {c: r for r, c in enumerate(cams)}
            # camera table padded to a pow2 bucket (gather never hits pad rows)
            Ct = _pad_pow2(len(cams), lo=2, hi=4096)
            Rs = np.tile(np.eye(3, dtype=np.float32), (Ct, 1, 1))
            ts = np.zeros((Ct, 3), np.float32)
            Rs[: len(cams)] = np.stack([self.poses[c][0] for c in cams])
            ts[: len(cams)] = np.stack([self.poses[c][1] for c in cams])
            n = len(link_pid)
            cap = _pad_pow2(n)
            Xp = np.zeros((cap, 3), np.float32)
            xp = np.zeros((cap, 2), np.float32)
            ci = np.zeros(cap, np.int32)
            Xp[:n] = self._points_as_array()[link_pid]
            # one concatenated keypoint table + fancy index instead of a
            # per-link interpreter loop (cached: kp_xy is immutable here)
            kp_flat, kp_off = self._kp_table()
            xp[:n] = kp_flat[kp_off[link_cam] + link_kp]
            row_of = np.full(max(cams) + 1, -1, np.int64)
            row_of[np.asarray(cams, np.int64)] = np.arange(len(cams))
            ci[:n] = row_of[link_cam]
            # every link source camera must be registered (links are only
            # created against registered partners) — a -1 here would gather
            # a padded identity pose and silently pass garbage errors
            assert (ci[:n] >= 0).all(), "link references unregistered camera"
            e = np.asarray(
                _reproj_errors_gather(
                    self.camera.K, jnp.asarray(Rs), jnp.asarray(ts),
                    jnp.asarray(ci), jnp.asarray(Xp), jnp.asarray(xp),
                )
            )[:n]
            for k in np.nonzero(e < cfg.max_reproj_error_px)[0]:
                cam, kp, pid = (
                    int(link_cam[k]), int(link_kp[k]), int(link_pid[k])
                )
                if self.kp_to_point[cam][kp] < 0:
                    self._note_kp_link(cam, kp, pid)
                    self._record_obs(pid, cam, kp)

        # ---- phase 2: batched pairwise triangulation of fresh matches
        fresh_sets = [(a, b, ka, kb) for (a, b, ka, kb) in fresh_sets if len(ka)]
        if not fresh_sets:
            return 0
        # pair axis padded to a pow2 bucket (identity poses, zero masks)
        P = _pad_pow2(len(fresh_sets), lo=1, hi=4096)
        cap = _pad_pow2(max(len(ka) for _, _, ka, _ in fresh_sets))
        x1p = np.zeros((P, cap, 2), np.float32)
        x2p = np.zeros((P, cap, 2), np.float32)
        maskp = np.zeros((P, cap), np.float32)
        R1s = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
        t1s = np.zeros((P, 3), np.float32)
        R2s = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
        t2s = np.zeros((P, 3), np.float32)
        for r, (a, b, ka, kb) in enumerate(fresh_sets):
            x1p[r, : len(ka)] = self.kp_xy[a][ka]
            x2p[r, : len(kb)] = self.kp_xy[b][kb]
            maskp[r, : len(ka)] = 1
            R1s[r], t1s[r] = self.poses[a]
            R2s[r], t2s[r] = self.poses[b]
        X_b, ok_b, _ = _triangulate_validated_batch(
            self.camera.K,
            jnp.asarray(R1s), jnp.asarray(t1s),
            jnp.asarray(R2s), jnp.asarray(t2s),
            jnp.asarray(x1p), jnp.asarray(x2p), jnp.asarray(maskp),
            cfg.max_reproj_error_px, cfg.min_parallax_deg,
            cfg.max_depth_factor,
        )
        X_b = np.asarray(X_b)
        ok_b = np.asarray(ok_b)

        total = 0
        for r, (a, b, ka, kb) in enumerate(fresh_sets):
            color_img = self.image_set.color[a]
            Hh, Ww = color_img.shape[:2]
            x1 = self.kp_xy[a][ka]
            for idx in np.nonzero(ok_b[r][: len(ka)])[0]:
                if len(self._pts) >= cfg.max_points:
                    break
                # a fresh match may have been linked by an earlier pair in
                # this same batch — skip to keep tracks consistent
                if (
                    self.kp_to_point[a][ka[idx]] >= 0
                    or self.kp_to_point[b][kb[idx]] >= 0
                ):
                    continue
                pid = self._pts.append(X_b[r, idx])
                u = int(np.clip(round(x1[idx, 0]), 0, Ww - 1))
                v = int(np.clip(round(x1[idx, 1]), 0, Hh - 1))
                self._cols.append((color_img[v, u] * 255).astype(np.uint8))
                self.observations.append([(a, int(ka[idx])), (b, int(kb[idx]))])
                self._obs_log.append((pid, a, int(ka[idx])))
                self._obs_log.append((pid, b, int(kb[idx])))
                self._note_kp_link(a, int(ka[idx]), pid)
                self._note_kp_link(b, int(kb[idx]), pid)
                total += 1
        return total

    # -- stage 6: motion refinement (reference's "light BA", :694-776) ----------

    def _camera_obs_batch(self):
        """Stack every registered camera's observations into (C, cap, ...)
        arrays for single-dispatch batched refinement / error computation."""
        cams = [i for i in sorted(self.registered)
                if (self.kp_to_point[i] >= 0).sum() >= 6]
        if not cams:
            return None
        obs = []
        P_arr = self._points_as_array()
        for i in cams:
            kps = np.nonzero(self.kp_to_point[i] >= 0)[0]
            pids = self.kp_to_point[i][kps]
            X = P_arr[pids]
            x = self.kp_xy[i][kps].astype(np.float32)
            obs.append((X, x))
        cap = _pad_pow2(max(len(X) for X, _ in obs))
        # Camera axis padded to a pow2 bucket (zero-weight identity rows):
        # C grows every wave, and each distinct C would otherwise compile a
        # fresh fused refinement program.
        C = _pad_pow2(len(cams), lo=2, hi=4096)
        Xs = np.zeros((C, cap, 3), np.float32)
        xs = np.zeros((C, cap, 2), np.float32)
        ws = np.zeros((C, cap), np.float32)
        for r, (X, x) in enumerate(obs):
            Xs[r, : len(X)] = X
            xs[r, : len(x)] = x
            ws[r, : len(X)] = 1
        Rs = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
        ts = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (C, 1))
        Rs[: len(cams)] = np.stack([self.poses[i][0] for i in cams])
        ts[: len(cams)] = np.stack([self.poses[i][1] for i in cams])
        return cams, Rs, ts, Xs, xs, ws

    def bundle_adjustment_light(self, iterations: int = 2):
        """Motion-only refinement: re-optimize every camera against its
        observations (replaces the per-camera cv.solvePnP resolve loop,
        reference :730-762). The observation tables are fixed during
        motion-only refinement, so refinement AND the before/after error
        readout run as ONE device dispatch (`iterations` kept for API parity;
        the fused program runs 12 GN iterations)."""
        del iterations
        batch = self._camera_obs_batch()
        if batch is None:
            return
        cams, Rs, ts, Xs, xs, ws = batch
        Rn, tn, e0, e1 = _refine_cameras_with_errors(
            self.camera.K, jnp.asarray(Rs), jnp.asarray(ts),
            jnp.asarray(Xs), jnp.asarray(xs), jnp.asarray(ws),
        )
        Rn = np.asarray(Rn)
        tn = np.asarray(tn)
        for r, i in enumerate(cams):
            self.poses[i] = (Rn[r], tn[r])
        print(f"[sfm] motion refinement: reproj {float(e0):.3f} -> {float(e1):.3f} px")

    def bundle_adjustment_full(self, final: bool = False):
        """Full sparse LM bundle adjustment over all cameras and points
        (sfm/bundle.py) — the upgrade over the reference's PnP-resolve loop.

        final=False caps the LM at config.bundle.intermediate_max_iterations:
        mid-reconstruction BAs start near the previous optimum and only need
        to keep geometry consistent for the next waves; the final=True call
        runs the full budget."""
        if len(self.points3d) < 8 or len(self.registered) < 2:
            return
        from recon3d_tpu.sfm.bundle import bundle_adjust, bundle_adjust_log

        points = self._points_as_array()
        # Predict FINAL sizes from registration progress so the LM program
        # compiles once per run instead of once per x4 growth bucket:
        # points/observations grow roughly linearly with registered views.
        V_total = self.image_set.gray.shape[0] if self.image_set else 0
        V_reg = max(len(self.registered), 1)
        grow = max(V_total, V_reg) / V_reg
        n_obs = sum(len(o) for o in self.observations)
        hint = (V_total, int(len(points) * grow), int(n_obs * grow))
        max_iters = (
            None if final
            else self.config.bundle.intermediate_max_iterations
        )
        if self.mesh is None:
            # Single device: append-only log BA — the observation table
            # lives on device between calls, only new tail rows upload, and
            # the point-major reorder happens on device (bundle_adjust's
            # host table build + full re-upload dominated incremental BA
            # wall-clock on the tunneled host; BASELINE.md).
            if (
                self._obs_log_generation != self._obs_generation
                or len(self._obs_log) != n_obs
            ):
                self._rebuild_obs_log()  # observations were rewritten
            new_poses, new_points, stats = bundle_adjust_log(
                np.asarray(self.camera.K),
                self.poses,
                points,
                self._obs_log.view(),
                self._kp_table(),
                self.config.bundle,
                size_hint=hint,
                max_iterations=max_iters,
                device_cache=self._ba_log_cache,
            )
        else:
            new_poses, new_points, stats = bundle_adjust(
                np.asarray(self.camera.K),
                self.poses,
                points,
                self.observations,
                self.kp_xy,
                self.config.bundle,
                size_hint=hint,
                max_iterations=max_iters,
                kp_table=self._kp_table(),
                mesh=self.mesh,
            )
        self.poses = {c: (np.asarray(R), np.asarray(t)) for c, (R, t) in new_poses.items()}
        self.points3d = new_points.astype(np.float32)
        det = self.stats.setdefault(
            "ba_full_detail_s",
            {"prep": 0.0, "table": 0.0, "upload": 0.0,
             "solve_fetch": 0.0, "calls": 0},
        )
        det["prep"] += stats.get("prep_s", 0.0)
        det["table"] = det.get("table", 0.0) + stats.get("table_s", 0.0)
        det["upload"] = det.get("upload", 0.0) + stats.get("upload_s", 0.0)
        det["solve_fetch"] += stats.get("solve_fetch_s", 0.0)
        det["calls"] += 1
        print(f"[sfm] full BA: rms {stats.get('rms_before', 0):.3f} -> "
              f"{stats.get('rms_after', 0):.3f} px over {stats.get('num_obs', 0)} obs "
              f"({stats.get('iterations', 0)} iters, prep {stats.get('prep_s', 0):.2f}s"
              f" [table {stats.get('table_s', 0):.2f} upload {stats.get('upload_s', 0):.2f}], "
              f"solve {stats.get('solve_fetch_s', 0):.2f}s)")

    def _mean_reproj_error(self) -> float:
        batch = self._camera_obs_batch()
        if batch is None:
            return 0.0
        cams, Rs, ts, Xs, xs, ws = batch
        e = np.asarray(
            _reproj_errors_batch(
                self.camera.K, jnp.asarray(Rs), jnp.asarray(ts),
                jnp.asarray(Xs), jnp.asarray(xs),
            )
        )
        sel = ws > 0
        return float(e[sel].mean()) if sel.any() else 0.0

    # -- stage 7: full run --------------------------------------------------------

    def try_recover_images(self, rounds: int = 3):
        """Retry previously failed registrations (reference :778-789) — the
        whole retry set as one batched wave per round. Multiple rounds with
        fresh RANSAC keys: each acceptance triangulates new points, which can
        give the remaining failures enough 2D-3D correspondences (and a
        successful pose pass is itself stochastic in the hypothesis draw)."""
        for _ in range(rounds):
            retry = sorted(self.failed)
            if not retry:
                return
            self.failed.clear()
            cands = []
            for i in retry:
                c = self._corr_arrays(i)
                if c is not None:
                    cands.append((i, c[0], c[1]))
            accepted = self._register_wave(cands)
            if accepted:
                self._triangulate_images(accepted)
                self.bundle_adjustment_light()
                print(f"[sfm] recovered {accepted}")
            self.failed.update(set(retry) - set(accepted))
            if not accepted:
                return

    def _rescue_unregistered(self) -> int:
        """Last-chance recovery of views the MATCH stage starved (the 50-view
        parity scene's edge block: feature-poor views whose pair matches
        never reached pnp_min_correspondences, or whole blocks disconnected
        from the registered component — docs/parity_run.md).

        try_recover_images (and the reference's :778-789 loop) can only
        retry PnP on existing correspondences; these views need NEW
        correspondences. One finer-scale (rescue_scale x) extraction of the
        missing views + their window neighbors re-matches the local pairs:
        registered-registered rescue pairs triangulate fresh anchor points
        from known poses, correspondence propagation hands those points to
        the missing views, and relaxed-floor registration waves (lower
        absolute count, stricter inlier fraction) zipper the block in.
        Returns the number of views recovered."""
        cfg = self.config
        sfm = cfg.sfm
        if not sfm.rescue_unregistered or self.image_set is None:
            return 0
        n = len(self.features)
        missing = sorted(set(range(n)) - self.registered)
        if not missing or len(missing) > sfm.rescue_max_images:
            return 0
        if len(self.registered) < 2:
            return 0
        w = sfm.match_window
        involved = sorted({
            j
            for m in missing
            for j in range(max(0, m - w), min(n, m + w + 1))
        })
        if len(involved) > 2 * sfm.rescue_max_images:
            return 0
        local = {g: l for l, g in enumerate(involved)}
        pairs = [
            (i, j)
            for ai, i in enumerate(involved)
            for j in involved[ai + 1:]
            if j - i <= w
        ]
        if not pairs:
            return 0

        import jax.image as jimage

        from recon3d_tpu.features.frontend import (
            FeatureExtractor, match_pairs_batched,
        )

        H0, W0 = self.image_set.gray.shape[1:]
        s = float(sfm.rescue_scale)
        if max(H0, W0) * s > 2600:
            s = 1.0  # load res already near the feature-scale floor
        gray = self.image_set.gray[involved]
        if s != 1.0:
            up = jimage.resize(
                jnp.asarray(gray),
                (len(involved), int(H0 * s), int(W0 * s)),
                method="linear",
            )
            up = np.asarray(up)
        else:
            up = gray
        feats = FeatureExtractor(cfg.sift).extract_batch(up)
        res = match_pairs_batched(
            feats, [(local[i], local[j]) for (i, j) in pairs],
            self._next_key(), cfg.match, mesh=self.mesh,
        )
        xy_up = np.asarray(feats.xy)
        valid_np = np.asarray(feats.valid)
        xy_load = (xy_up - (s - 1.0) / 2.0) / s
        S = np.array(
            [[s, 0.0, (s - 1.0) / 2.0],
             [0.0, s, (s - 1.0) / 2.0],
             [0.0, 0.0, 1.0]], np.float32,
        )
        mm = max(8, cfg.match.min_matches // 2)
        offset: Dict[int, int] = {}
        remap: Dict[int, np.ndarray] = {}
        added = 0
        for r, (i, j) in enumerate(pairs):
            (_, _, idx1, idx2, F, n_inl, n_raw) = res[r]
            if n_inl < mm:
                continue
            for g in (i, j):
                if g not in offset:
                    # compact to valid slots; remap match indices through
                    # the compaction (same contract as _rematch_long_span)
                    keep = np.flatnonzero(valid_np[local[g]])
                    rm = np.full(valid_np.shape[1], -1, np.int64)
                    rm[keep] = np.arange(len(keep))
                    remap[g] = rm
                    offset[g] = len(self.kp_xy[g])
                    self.kp_xy[g] = np.concatenate(
                        [self.kp_xy[g], xy_load[local[g]][keep]]
                    )
                    self.kp_to_point[g] = np.concatenate([
                        self.kp_to_point[g],
                        np.full(len(keep), -1, np.int64),
                    ])
            i1 = remap[i][idx1] + offset[i]
            i2 = remap[j][idx2] + offset[j]
            key = (i, j)
            if key in self.matches and not self.matches[key].get("aux"):
                m0 = self.matches[key]
                m0["idx1"] = np.concatenate([m0["idx1"], i1])
                m0["idx2"] = np.concatenate([m0["idx2"], i2])
                m0["n"] = len(m0["idx1"])
            else:
                self.matches[key] = dict(
                    idx1=i1, idx2=i2, F=S.T @ F @ S, n=len(i1)
                )
            added += 1
        if not added:
            return 0
        self._kp_cache = None
        self._build_kp_links()
        # Anchor points: fresh finer-scale matches between REGISTERED rescue
        # pairs triangulate directly from their known poses; _note_kp_link
        # propagation hands the new points to the missing partners' corr.
        for (i, j) in pairs:
            if i in self.registered and j in self.registered:
                self._add_triangulated(i, j)
        floor = sfm.rescue_min_correspondences
        rescued: List[int] = []
        while True:
            cands = []
            for m in sorted(set(range(n)) - self.registered):
                c = self._corr_arrays(m, floor=floor)
                if c is not None:
                    cands.append((m, c[0], c[1]))
            if not cands:
                break
            accepted = self._register_wave(
                cands, min_corr=floor,
                min_inlier_frac=sfm.rescue_min_inlier_frac,
            )
            if not accepted:
                break
            self.failed.difference_update(accepted)
            self._triangulate_images(accepted)
            self.bundle_adjustment_light()
            rescued.extend(accepted)
        if rescued:
            print(f"[sfm] rescued {len(rescued)} starved views: "
                  f"{sorted(rescued)}")
        return len(rescued)

    def reconstruct(
        self,
        image_dir: Optional[str] = None,
        max_images: Optional[int] = None,
        image_set: Optional[ImageSet] = None,
    ):
        """Full pipeline (reference :791-882). Returns (points (P,3) float32,
        colors (P,3) uint8, poses {idx: CameraPose})."""
        t0 = time.time()
        if image_set is not None:
            self.set_image_set(image_set)
        elif image_dir is not None:
            self.load_images(image_dir, max_images)
        elif self.image_set is None:
            raise ValueError("need image_dir or image_set")
        self.stats["load_time"] = time.time() - t0

        self.extract_features()
        self.match_image_pairs()

        t_init = time.time()
        pair = self.find_best_initial_pair()
        if pair is None:
            raise RuntimeError("no valid initial pair found")
        self.initialize(pair)
        self.stats["init_time"] = time.time() - t_init
        t_incr = time.time()

        # Incremental loop in WAVES: where the reference registers one image
        # per round (:834-857), every eligible image PnPs in one batched
        # dispatch and all accepted images triangulate together — the round
        # count (and with it the dominant host<->device round-trip cost)
        # drops from O(images) to O(waves). Two guards keep wave registration
        # as accurate as sequential: (1) the wave size RAMPS with the number
        # of registered cameras, so early images — whose PnP points all come
        # from the thin initial-pair geometry — register nearly one-by-one
        # while late images (seen by many registered partners) batch wide;
        # (2) motion refinement runs after EVERY wave (it is one fused
        # dispatch), so the next wave's PnP sees polished poses.
        since_ba = 0
        wave_cap = max(1, self.config.sfm.registration_wave_size)
        tw = {"cands": 0.0, "register": 0.0, "triangulate": 0.0,
              "ba_light": 0.0, "ba_full": 0.0}
        while True:
            tm = time.time()
            cands = self._wave_candidates()
            tw["cands"] += time.time() - tm
            if not cands:
                break
            # Ramp doubles (1, 2, 4, 8, ...) but never exceeds 20% of the
            # scene per wave: each wave costs a fixed multi-round-trip toll
            # that dwarfs its ~57 ms device time (BASELINE.md sparse
            # attribution), so the 50-camera run's wave count matters more
            # than wave size (11 -> 7 waves at unchanged quality gates) —
            # but registering a large FRACTION of a small scene against
            # stale geometry measurably degrades it (16-view parity scene:
            # a 7-of-16 final wave moved aligned center error
            # 0.008 -> 0.035 of scene scale; the 20% cap restores parity).
            n_total = max(len(self.features), 1)
            ramp = min(
                max(1, len(self.registered) - 1),
                max(1, int(np.ceil(0.2 * n_total))),
            )
            wave = cands[: min(wave_cap, ramp)]
            tm = time.time()
            accepted = self._register_wave(wave)
            tw["register"] += time.time() - tm
            for i, _, _ in wave:
                if i not in self.registered:
                    self.failed.add(i)
                    print(f"[sfm] failed to register image {i}")
            if accepted:
                tm = time.time()
                n_new = self._triangulate_images(accepted)
                tw["triangulate"] += time.time() - tm
                since_ba += len(accepted)
                print(f"[sfm] registered wave {accepted} "
                      f"({len(self.registered)}/{len(self.features)}), +{n_new} points")
                tm = time.time()
                self.bundle_adjustment_light()
                tw["ba_light"] += time.time() - tm
                # Periodic FULL BA (points + poses): wave registration defers
                # the between-image geometry updates of the sequential order,
                # so drifted points must be re-solved, not just re-posed —
                # this is the reference's every-5-cameras "BA" (:855-857)
                # upgraded from motion-only to a true sparse LM solve.
                if since_ba >= self.config.sfm.ba_every_n_cameras:
                    tm = time.time()
                    self.bundle_adjustment_full()
                    tw["ba_full"] += time.time() - tm
                    since_ba = 0

        self.stats["incremental_time"] = time.time() - t_incr
        self.stats["incremental_breakdown_s"] = {
            k: round(v, 2) for k, v in tw.items()
        }
        t_ba = time.time()
        self.bundle_adjustment_light()
        self.try_recover_images()
        if self._rescue_unregistered():
            self.try_recover_images()
        self.bundle_adjustment_full(final=True)
        self.drop_invalid_observations()
        self._normalize_reconstruction()
        self.stats["final_ba_time"] = time.time() - t_ba

        elapsed = time.time() - t0
        self.stats["total_time"] = elapsed
        self.stats["num_points"] = len(self.points3d)
        self.stats["num_cameras"] = len(self.registered)
        self.stats["mean_reproj_px"] = self._mean_reproj_error()
        accounted = sum(
            self.stats.get(k, 0.0)
            for k in ("load_time", "extract_time", "match_time", "init_time",
                      "incremental_time", "final_ba_time")
        )
        print(
            f"[sfm] done: {len(self.points3d)} points, "
            f"{len(self.registered)}/{len(self.features)} cameras, "
            f"reproj {self.stats['mean_reproj_px']:.3f} px, {elapsed:.1f}s "
            f"(stages {accounted:.1f}s; load "
            f"{self.stats.get('load_time', 0.0):.1f}s; waves "
            f"{self.stats.get('incremental_breakdown_s')})"
        )

        points = self.points3d.copy()
        colors = self.point_colors.copy()
        poses = {
            i: CameraPose(R=jnp.asarray(R), t=jnp.asarray(t))
            for i, (R, t) in sorted(self.poses.items())
        }
        return points, colors, poses

    # -- stage 8: normalization + output ------------------------------------------

    def _normalize_reconstruction(self):
        """Median-center; scale so the 90th-percentile radius = normalize_scale
        (reference :884-914). Applied to points and camera centers."""
        if len(self.points3d) < 10:
            return
        P = self.points3d
        center = np.median(P, axis=0)
        r = np.linalg.norm(P - center, axis=1)
        p90 = np.percentile(r, 90)
        if p90 < 1e-9:
            return
        s = self.config.sfm.normalize_scale / p90
        self.points3d = ((P - center) * s).astype(np.float32)
        for i, (R, t) in self.poses.items():
            C = -R.T @ t
            Cn = (C - center) * s
            self.poses[i] = (R, (-R @ Cn).astype(np.float32))

    def drop_invalid_observations(self, max_px: float = 50.0):
        """Final sweep: drop observations that are behind their camera or
        grossly off (> max_px reprojection), then points left with < 2
        observations. The last full BA can push a tiny-parallax track
        behind its cameras (its depth is unconstrained); ONE such point
        poisons every mean-reprojection statistic (observed: 1.3e5 px mean
        from a single behind-camera point on a 150-view scene)."""
        K = np.asarray(self.camera.K, np.float64)
        new_points, new_obs, new_colors = [], [], []
        self.kp_to_point = [
            np.full(len(k), -1, np.int64) for k in self.kp_xy
        ]
        # Point ids are renumbered below; rebuild the unregistered-image
        # correspondence index too (global SfM runs its PnP recovery pass
        # AFTER this sweep and reads self.corr).
        self.corr = {}
        dropped = 0
        for pid, obs in enumerate(self.observations):
            X = np.asarray(self.points3d[pid], np.float64)
            kept = []
            for c, k in obs:
                if c not in self.poses:
                    continue
                R, t = self.poses[c]
                Xc = np.asarray(R, np.float64) @ X + np.asarray(
                    t, np.float64).reshape(3)
                if Xc[2] <= 1e-9:
                    continue
                uv = np.array([
                    K[0, 0] * Xc[0] / Xc[2] + K[0, 2],
                    K[1, 1] * Xc[1] / Xc[2] + K[1, 2],
                ])
                if np.linalg.norm(uv - self.kp_xy[c][k]) <= max_px:
                    kept.append((c, k))
            dropped += len(obs) - len(kept)
            if len(kept) >= 2:
                new_pid = len(new_points)
                new_points.append(self.points3d[pid])
                new_obs.append(kept)
                new_colors.append(self.point_colors[pid])
                for c, k in kept:
                    self._note_kp_link(c, k, new_pid)
        n_pts = len(self.points3d) - len(new_points)
        self.points3d = new_points
        self.observations = new_obs
        self._obs_generation += 1
        self.point_colors = new_colors
        if dropped or n_pts:
            print(f"[sfm] final sweep: -{dropped} obs, -{n_pts} points")

    def save_ply(self, path: str):
        """Write sparse cloud (reference :916-938)."""
        save_ply(path, self.points3d.copy(), self.point_colors.copy())

    def save_cameras_ply(self, path: str):
        poses = [
            CameraPose(R=jnp.asarray(R), t=jnp.asarray(t))
            for _, (R, t) in sorted(self.poses.items())
        ]
        if poses:
            from recon3d_tpu.camera import stack_poses

            save_cameras_ply(path, stack_poses(poses))

    def reconstruct_global(
        self,
        image_dir: Optional[str] = None,
        max_images: Optional[int] = None,
        image_set: Optional[ImageSet] = None,
    ):
        """Global SfM (sfm/global_sfm.py): rotation + translation averaging
        over the whole pose graph instead of incremental registration —
        capability beyond the reference. Same return contract as
        reconstruct()."""
        from recon3d_tpu.sfm.global_sfm import run_global_sfm

        t0 = time.time()
        if image_set is not None:
            self.set_image_set(image_set)
        elif image_dir is not None:
            self.load_images(image_dir, max_images)
        elif self.image_set is None:
            raise ValueError("need image_dir or image_set")
        self.stats["load_time"] = time.time() - t0
        self.extract_features()
        self.match_image_pairs()
        t_g = time.time()
        run_global_sfm(self)
        self.stats["global_solve_time"] = time.time() - t_g
        self.stats["total_time"] = time.time() - t0
        self.stats["num_points"] = len(self.points3d)
        self.stats["num_cameras"] = len(self.registered)
        self.stats["mean_reproj_px"] = self._mean_reproj_error()
        print(
            f"[sfm] global: {len(self.points3d)} points, "
            f"{len(self.registered)}/{len(self.features)} cameras, "
            f"reproj {self.stats['mean_reproj_px']:.3f} px, "
            f"{self.stats['total_time']:.1f}s"
        )
        points = self.points3d.copy()
        colors = self.point_colors.copy()
        poses = {
            i: CameraPose(R=jnp.asarray(R), t=jnp.asarray(t))
            for i, (R, t) in sorted(self.poses.items())
        }
        return points, colors, poses

    def save_colmap(self, out_dir: str):
        """Export the sparse model as a COLMAP text model (cameras.txt /
        images.txt / points3D.txt) with full 2D-3D tracks — consumable by
        COLMAP itself and the tools that read its format (nerfstudio,
        gsplat, ...). Capability the reference lacks: it can only shell out
        to an external COLMAP binary (tools/run_colmap.py parity module)."""
        from recon3d_tpu.io.colmap import save_colmap_text

        points = self.points3d.copy()
        colors = self.point_colors.copy()
        iset = self.image_set
        save_colmap_text(
            out_dir,
            K=np.asarray(self.camera.K),
            image_size=iset.gray.shape[1:3] if iset is not None else (0, 0),
            poses=self.poses,
            points=points,
            colors=colors,
            observations=self.observations,
            kp_xy=self.kp_xy,
            names=iset.names if iset is not None else None,
        )
