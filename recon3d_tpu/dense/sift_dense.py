"""Dense SIFT triangulation backend, TPU-native.

Capability parity with reference src/core/dense.py (DenseReconstructor
:18-315): extract a very large SIFT keypoint budget per view, match
windowed + loop-closure pairs with a relaxed ratio, triangulate each pair
with vectorized cheirality/parallax/reprojection gates, merge, then k-NN
statistical outlier removal and bbox-relative voxel dedup.

Redesign for TPU: extraction/matching/triangulation are the batched jitted
kernels from recon3d_tpu.ops (one fused program per stage) instead of the
reference's per-pair OpenCV loop (dense.py:105-173); the per-point Python
validity loop (dense.py:196-240) is one vectorized mask.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from recon3d_tpu.camera import Camera, projection_from_KRt
from recon3d_tpu.config import DenseSiftConfig, SiftConfig, MatchConfig
from recon3d_tpu.dense.filters import (
    bbox_voxel_downsample,
    knn_statistical_filter,
)
from recon3d_tpu.features.frontend import FeatureExtractor, FeatureMatcher
from recon3d_tpu.ops.triangulate import triangulate_dlt, validate_triangulation


def dense_pairs(n: int, window: int) -> List[Tuple[int, int]]:
    """Sequential window + loop-closure pair policy (reference dense.py:88-95):
    |i - j| <= window, or |i - j| >= n - window (ends meet)."""
    out = []
    for i in range(n):
        for j in range(i + 1, n):
            if j - i <= window or j - i >= n - window:
                out.append((i, j))
    return out


class DenseSiftReconstructor:
    """Dense reconstruction by exhaustive SIFT triangulation (reference
    DenseReconstructor dense.py:18-51).

    reconstruct(images, poses) -> (points (N,3) float32, colors (N,3) uint8).
    `images`: (V, H, W, 3) float32 [0,1]; `poses`: {idx: (R, t)} numpy.
    """

    def __init__(self, camera: Camera, config: Optional[DenseSiftConfig] = None):
        self.camera = camera
        self.config = config or DenseSiftConfig()
        cfg = self.config
        # Dense profile of the SIFT/matcher configs (reference dense.py:35-40:
        # huge feature budget, low contrast threshold, CLAHE clip 3.0,
        # relaxed ratio 0.85 :126-130).
        self._extractor = FeatureExtractor(
            SiftConfig(
                max_features=cfg.max_features,
                contrast_threshold=cfg.contrast_threshold,
                edge_threshold=20.0,
                sigma=1.4,
                clahe=True,
                clahe_clip=3.0,
            )
        )
        self._matcher = FeatureMatcher(
            MatchConfig(ratio=cfg.ratio, cross_check=True)
        )

    def reconstruct(
        self,
        images: np.ndarray,
        poses: Dict[int, Tuple[np.ndarray, np.ndarray]],
        pair_window: Optional[int] = None,
        seed: int = 0,
    ):
        cfg = self.config
        t0 = time.time()
        ids = sorted(poses.keys())
        V = len(ids)
        if V < 2:
            return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.uint8)

        K = jnp.asarray(np.asarray(self.camera.K), jnp.float32)

        # Gray on the host — extract_batch ships uint8 gray; full-res RGB
        # float32 never crosses the link (see io/hostimg.py).
        from recon3d_tpu.io.hostimg import rgb_to_gray_np

        grays = rgb_to_gray_np(images[ids])
        feats = self._extractor.extract_batch(grays)  # stacked (V, ...)
        xy_all = np.asarray(feats.xy)                 # one host pull

        window = pair_window or cfg.pair_window
        pairs = dense_pairs(V, window)
        key = jax.random.PRNGKey(seed)

        # all pairs matched in chunked single-dispatch batches
        from recon3d_tpu.features.frontend import match_pairs_batched

        results = match_pairs_batched(
            feats, pairs, key, self._matcher.config
        )

        all_pts, all_cols = [], []
        for (a, b, idx1, idx2, F, n_inl, n_raw) in results:
            if n_inl < 8:
                continue
            i, j = ids[a], ids[b]
            cap = 1 << max(8, int(np.ceil(np.log2(max(1, len(idx1))))))
            x1 = np.zeros((cap, 2), np.float32)
            x2 = np.zeros((cap, 2), np.float32)
            mask = np.zeros(cap, bool)
            x1[: len(idx1)] = xy_all[a][idx1]
            x2[: len(idx2)] = xy_all[b][idx2]
            mask[: len(idx1)] = True
            pts, cols = _triangulate_pair_xy(
                K,
                jnp.asarray(poses[i][0], jnp.float32),
                jnp.asarray(poses[i][1], jnp.float32),
                jnp.asarray(poses[j][0], jnp.float32),
                jnp.asarray(poses[j][1], jnp.float32),
                jnp.asarray(x1),
                jnp.asarray(x2),
                jnp.asarray(mask),
                jnp.asarray(images[i]),
                max_reproj_px=cfg.max_reproj_error_px,
                min_parallax_deg=cfg.min_parallax_deg,
            )
            keep = np.asarray(pts[..., 0] != np.inf)
            all_pts.append(np.asarray(pts)[keep])
            all_cols.append(np.asarray(cols)[keep])

        if not all_pts:
            return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.uint8)
        points = np.concatenate(all_pts).astype(np.float32)
        colors = (np.concatenate(all_cols) * 255).clip(0, 255).astype(np.uint8)

        points, colors = knn_statistical_filter(
            points, colors, k=cfg.knn_k, std_factor=cfg.knn_std_factor
        )
        points, colors = bbox_voxel_downsample(points, colors)
        print(
            f"[dense-sift] {len(points)} points from {len(pairs)} pairs "
            f"({time.time() - t0:.1f}s)"
        )
        return points, colors


@jax.jit
def _triangulate_pair_xy(
    K, R1, t1, R2, t2, x1, x2, mask, ref_image,
    max_reproj_px: float = 6.0,
    min_parallax_deg: float = 0.3,
):
    """Triangulate one matched pair with the reference's validity gates
    (dense.py:177-248: cheirality 0.1 < z < 50 handled by the generic depth
    gate, parallax, reprojection) + color lookup in the first image
    (:242-246). Invalid slots are marked +inf for host-side compaction."""
    P1 = projection_from_KRt(K, R1, t1)
    P2 = projection_from_KRt(K, R2, t2)
    X = triangulate_dlt(P1, P2, x1, x2)
    ok = mask & validate_triangulation(
        K, R1, t1, R2, t2, X, x1, x2,
        max_reproj_px=max_reproj_px,
        min_parallax_deg=min_parallax_deg,
        max_depth_factor=500.0,
    )
    # color from the reference image at the keypoint (reference :242-246)
    H, W = ref_image.shape[:2]
    u = jnp.clip(jnp.round(x1[:, 0]).astype(jnp.int32), 0, W - 1)
    v = jnp.clip(jnp.round(x1[:, 1]).astype(jnp.int32), 0, H - 1)
    cols = ref_image[v, u]
    X = jnp.where(ok[:, None], X, jnp.inf)
    return X, cols
