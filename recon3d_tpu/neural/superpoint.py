"""SuperPoint keypoint detector + descriptor in Flax.

Replaces the torch SuperPoint inference of the reference
(neural_matcher.py:47-99, external pip package) with a JAX/Flax
implementation of the published architecture (DeTone et al., 2018):
VGG-style shared encoder, a 65-channel detector head (8x8 cells + dustbin),
and a 256-d descriptor head. Layer names/shapes match the public checkpoint
so torch weights can be converted when available
(recon3d_tpu.neural.weights); otherwise random init (documented — this
environment has no network egress to fetch weights).

TPU notes: NHWC conv layout, bf16-friendly activations, static max_keypoints
with validity masks instead of dynamic keypoint counts.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct


class SuperPointNet(nn.Module):
    """Backbone + heads. Input (B, H, W, 1) float32 in [0,1]; H, W % 8 == 0."""

    descriptor_dim: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        conv = lambda c, k, name: nn.Conv(c, (k, k), padding="SAME", name=name)
        pool = lambda y: nn.max_pool(y, (2, 2), strides=(2, 2))

        x = nn.relu(conv(64, 3, "conv1a")(x))
        x = nn.relu(conv(64, 3, "conv1b")(x))
        x = pool(x)
        x = nn.relu(conv(64, 3, "conv2a")(x))
        x = nn.relu(conv(64, 3, "conv2b")(x))
        x = pool(x)
        x = nn.relu(conv(128, 3, "conv3a")(x))
        x = nn.relu(conv(128, 3, "conv3b")(x))
        x = pool(x)
        x = nn.relu(conv(128, 3, "conv4a")(x))
        x = nn.relu(conv(128, 3, "conv4b")(x))

        # Detector head: 65 = 8x8 cell pixels + dustbin.
        cPa = nn.relu(conv(256, 3, "convPa")(x))
        logits = conv(65, 1, "convPb")(cPa)  # (B, H/8, W/8, 65)

        # Descriptor head (coarse, to be bilinearly sampled at keypoints).
        cDa = nn.relu(conv(256, 3, "convDa")(x))
        desc = conv(self.descriptor_dim, 1, "convDb")(cDa)
        # rsqrt(sum^2 + eps), NOT desc / max(||desc||, eps): a ReLU stack can
        # emit exactly-zero cells, where the norm's gradient is 0/0 = NaN —
        # one training step through that poisons the head parameters.
        desc = desc * jax.lax.rsqrt(
            jnp.sum(desc * desc, axis=-1, keepdims=True) + 1e-8
        )
        return logits, desc


def scores_from_logits(logits: jnp.ndarray) -> jnp.ndarray:
    """(B, Hc, Wc, 65) -> dense (B, H, W) keypoint probability map.

    Softmax over the 65 channels, drop the dustbin, depth-to-space 8x8.
    """
    prob = jax.nn.softmax(logits, axis=-1)[..., :64]
    B, Hc, Wc, _ = prob.shape
    prob = prob.reshape(B, Hc, Wc, 8, 8)
    prob = prob.transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)
    return prob


def simple_nms(scores: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Fast NMS: keep scores that equal the local max in a (2r+1)^2 window.

    Same scheme as the published implementation's max-pool NMS.
    """
    window = 2 * radius + 1
    mx = jax.lax.reduce_window(
        scores,
        -jnp.inf,
        jax.lax.max,
        (1, window, window),
        (1, 1, 1),
        "SAME",
    )
    return jnp.where(scores >= mx, scores, 0.0)


@struct.dataclass
class NeuralFeatures:
    """Padded keypoints for one image (reference neural_matcher.py:23-30).

    xy: (K, 2) pixels; score: (K,); desc: (K, D) L2-normalized; valid: (K,).
    """

    xy: jnp.ndarray
    score: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray


def detect_keypoints(
    scores: jnp.ndarray,
    desc_coarse: jnp.ndarray,
    max_keypoints: int,
    detection_threshold: float = 0.0005,
    nms_radius: int = 4,
    border: int = 4,
) -> NeuralFeatures:
    """(H, W) score map + (H/8, W/8, D) coarse descriptors -> padded features.

    NMS -> masked top-k (static capacity) -> bilinear descriptor sampling,
    replacing the dynamic thresholding of the torch implementation.
    """
    H, W = scores.shape
    s = simple_nms(scores[None], nms_radius)[0]
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    inb = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    s = jnp.where(inb, s, 0.0)

    flat = s.reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_keypoints)
    valid = vals > detection_threshold
    yi = idx // W
    xi = idx % W

    # Subpixel refinement: 1D quadratic fit per axis on the RAW score map
    # (NMS zeroes the neighbors, so refine on `scores`, not `s`). Offset
    # -d/(2*d2) clamped to +-0.5; flat/degenerate curvature -> 0.
    def _refine(axis_idx, other_idx, is_x):
        lo = jnp.maximum(axis_idx - 1, 0)
        hi = jnp.minimum(axis_idx + 1, (W if is_x else H) - 1)
        if is_x:
            sm1 = scores[other_idx, lo]
            s0 = scores[other_idx, axis_idx]
            sp1 = scores[other_idx, hi]
        else:
            sm1 = scores[lo, other_idx]
            s0 = scores[axis_idx, other_idx]
            sp1 = scores[hi, other_idx]
        d = 0.5 * (sp1 - sm1)
        d2 = sp1 - 2.0 * s0 + sm1
        off = jnp.where(d2 < -1e-12, -d / jnp.minimum(d2, -1e-12), 0.0)
        return jnp.clip(off, -0.5, 0.5)

    x = xi.astype(jnp.float32) + _refine(xi, yi, True)
    y = yi.astype(jnp.float32) + _refine(yi, xi, False)
    xy = jnp.stack([x, y], axis=-1)

    # Bilinear sample coarse descriptors at keypoint positions (in cell units).
    from recon3d_tpu.ops.image import bilinear_sample

    cell_xy = jnp.stack([(x + 0.5) / 8.0 - 0.5, (y + 0.5) / 8.0 - 0.5], axis=-1)
    desc, _ = bilinear_sample(desc_coarse, cell_xy)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)

    return NeuralFeatures(xy=xy, score=vals, desc=desc, valid=valid)


def neural_to_sift_features(feats: NeuralFeatures):
    """Adapter to the classical feature container (reference
    convert_neural_to_cv_keypoints, neural_matcher.py:207-221): wraps
    neural keypoints in a SiftFeatures so code written against the
    classical frontend consumes them unchanged. Scale/angle carry the same
    defaults the reference puts in its cv.KeyPoint (size 10, angle -1)."""
    from recon3d_tpu.ops.sift import SiftFeatures

    k = feats.xy.shape[0]
    return SiftFeatures(
        xy=feats.xy,
        scale=jnp.full((k,), 10.0, jnp.float32),
        angle=jnp.full((k,), -1.0, jnp.float32),
        response=feats.score,
        desc=feats.desc,
        valid=feats.valid,
    )
