"""Classical feature frontend: SIFT extraction + geometric matching.

API parity with reference src/core/features.py: FeatureExtractor (:37-90,
CLAHE preprocessing + SIFT) and FeatureMatcher (:92-204, ratio + cross-check
+ F-RANSAC in match_pair_geometric). The compute is the batched TPU kernels
from recon3d_tpu.ops; this layer owns jit caching per image shape and the
host-facing API.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from recon3d_tpu.config import SiftConfig, MatchConfig
from recon3d_tpu.ops.sift import extract_sift, SiftFeatures
from recon3d_tpu.ops.clahe import clahe
from recon3d_tpu.ops.match import match_descriptors, MatchResult
from recon3d_tpu.ops.estimation import estimate_fundamental_ransac


class FeatureExtractor:
    """SIFT extractor with optional CLAHE preprocessing.

    One jitted kernel per distinct image shape (cached); call `extract`
    with (H, W) float32 grayscale in [0, 1].
    """

    def __init__(self, config: Optional[SiftConfig] = None):
        self.config = config or SiftConfig()
        self._jitted: Dict[Tuple[int, int], callable] = {}

    def _get_fn(self, shape: Tuple[int, int]):
        if shape not in self._jitted:
            cfg = self.config

            def fn(img):
                if cfg.clahe:
                    h, w = img.shape
                    g = cfg.clahe_grid
                    hh, ww = (h // g) * g, (w // g) * g
                    eq = clahe(img[:hh, :ww], cfg.clahe_clip, g)
                    img = jax.lax.dynamic_update_slice(img, eq, (0, 0))
                return extract_sift(
                    img,
                    max_features=cfg.max_features,
                    num_octaves=cfg.num_octaves,
                    scales=cfg.scales_per_octave,
                    sigma0=cfg.sigma,
                    contrast_threshold=cfg.contrast_threshold,
                    edge_threshold=cfg.edge_threshold,
                    descriptor_max_value=cfg.descriptor_max_value,
                )

            self._jitted[shape] = jax.jit(fn)
        return self._jitted[shape]

    def extract(self, image: np.ndarray) -> SiftFeatures:
        """image: (H, W) grayscale float32 [0,1] -> SiftFeatures (on device)."""
        img = jnp.asarray(image, jnp.float32)
        return self._get_fn(img.shape)(img)


class FeatureMatcher:
    """Descriptor matching + geometric verification.

    match():                ratio test + mutual cross-check (features.py:128-173)
    match_pair_geometric(): match + fundamental RANSAC; returns matches whose
                            mask marks geometric inliers and the F matrix
                            (features.py:175-204).
    """

    def __init__(self, config: Optional[MatchConfig] = None):
        self.config = config or MatchConfig()

    def match(self, f1: SiftFeatures, f2: SiftFeatures) -> MatchResult:
        return match_descriptors(
            f1.desc,
            f2.desc,
            f1.valid.astype(jnp.float32),
            f2.valid.astype(jnp.float32),
            ratio=self.config.ratio,
            cross_check=self.config.cross_check,
        )

    def match_pair_geometric(
        self,
        f1: SiftFeatures,
        f2: SiftFeatures,
        key: jax.Array,
        min_matches: Optional[int] = None,
    ):
        """Returns (match_result_with_inlier_mask, F, num_inliers).

        If fewer than min_matches raw matches survive, F is identity and the
        mask is all-false (caller drops the pair — reference features.py:183).
        """
        min_matches = min_matches or self.config.min_matches
        m = self.match(f1, f2)
        x1, x2, res = _verify_pair(
            f1.xy,
            f2.xy,
            m.idx2,
            m.mask,
            key,
            self.config.ransac_threshold_px,
            self.config.ransac_hypotheses,
        )
        enough = int(m.num_matches) >= min_matches
        inlier_mask = res.inliers & m.mask if enough else jnp.zeros_like(m.mask)
        out = MatchResult(idx1=m.idx1, idx2=m.idx2, distance=m.distance, mask=inlier_mask)
        return out, res.F, (int(res.num_inliers) if enough else 0)


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def _verify_pair(xy1, xy2, idx2, mask, key, threshold_px, num_hypotheses):
    x1 = jnp.where(mask[:, None], xy1, 0.0)
    x2 = jnp.where(mask[:, None], xy2[jnp.clip(idx2, 0, None)], 0.0)
    res = estimate_fundamental_ransac(
        key,
        x1,
        x2,
        mask.astype(jnp.float32),
        threshold_px=threshold_px,
        num_hypotheses=num_hypotheses,
    )
    return x1, x2, res
