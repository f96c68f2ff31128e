"""LightGlue feature matcher in Flax.

Replaces the torch LightGlue inference of the reference
(neural_matcher.py:101-147, external pip package) with a JAX/Flax
implementation of the published architecture (Lindenberger et al., 2023):
L transformer layers, each = self-attention (with 2D rotary positional
encoding of normalized keypoint positions) + bidirectional cross-attention,
followed by a matchability head and a sigmoid-log-double-softmax assignment.

Static-shape adaptations for XLA (SURVEY.md §7 "hard parts"):
  - the adaptive depth / point-pruning early exits of the original are
    removed; all L layers always run over padded keypoint sets with masks,
  - match extraction is mutual-argmax over the padded score matrix.
Layer structure matches the public checkpoint so torch weights can be
converted (recon3d_tpu.neural.weights); random init otherwise.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def normalize_keypoints(xy: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Center + scale keypoints to roughly [-1, 1] (shift-invariant encoding)."""
    h, w = hw
    size = jnp.array([w, h], dtype=xy.dtype)
    shift = size / 2.0
    scale = jnp.max(size) / 2.0
    return (xy - shift) / scale


def rotary_embed(xy: jnp.ndarray, freqs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2D rotary position encoding: xy (N, 2), freqs (2, F) -> cos/sin (N, 2F)."""
    ang = xy @ freqs  # (N, F)
    ang = jnp.concatenate([ang, ang], axis=-1)  # duplicate for pairs
    return jnp.cos(ang), jnp.sin(ang)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate feature pairs: x (H, N, D) with D even; cos/sin (N, D/2*2)."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    c = jnp.concatenate([cos[..., : d // 2], cos[..., : d // 2]], axis=-1)
    s = jnp.concatenate([sin[..., : d // 2], sin[..., : d // 2]], axis=-1)
    return x * c + rot * s


def _masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    logits = jnp.where(mask, logits, -1e9)
    return jax.nn.softmax(logits, axis=-1)


class Attention(nn.Module):
    """Multi-head attention over padded sets with key-validity masking."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q_in, k_in, v_in, k_valid, q_rot=None, k_rot=None):
        H = self.num_heads
        Dh = self.dim // H
        q = nn.Dense(self.dim, name="to_q")(q_in).reshape(-1, H, Dh).transpose(1, 0, 2)
        k = nn.Dense(self.dim, name="to_k")(k_in).reshape(-1, H, Dh).transpose(1, 0, 2)
        v = nn.Dense(self.dim, name="to_v")(v_in).reshape(-1, H, Dh).transpose(1, 0, 2)
        if q_rot is not None:
            q = apply_rotary(q, *q_rot)
            k = apply_rotary(k, *k_rot)
        att = jnp.einsum("hnd,hmd->hnm", q, k) / jnp.sqrt(Dh).astype(q.dtype)
        att = _masked_softmax(att, k_valid[None, None, :])
        out = jnp.einsum("hnm,hmd->hnd", att, v)
        out = out.transpose(1, 0, 2).reshape(-1, self.dim)
        return nn.Dense(self.dim, name="to_out")(out)


class MessageUpdate(nn.Module):
    """x <- x + MLP([x | message]) (LightGlue's residual update)."""

    dim: int

    @nn.compact
    def __call__(self, x, message):
        y = jnp.concatenate([x, message], axis=-1)
        y = nn.Dense(2 * self.dim, name="ffn1")(y)
        # exact GELU + torch LayerNorm eps: bit-parity with converted
        # public checkpoints (official ffn uses nn.GELU() / LN eps 1e-5)
        y = nn.LayerNorm(name="ln", epsilon=1e-5)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="ffn2")(y)
        return x + y


class LightGlueLayer(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x0, x1, v0, v1, rot0, rot1):
        # self-attention (rotary position)
        m0 = Attention(self.dim, self.num_heads, name="self_attn0")(
            x0, x0, x0, v0, q_rot=rot0, k_rot=rot0
        )
        m1 = Attention(self.dim, self.num_heads, name="self_attn1")(
            x1, x1, x1, v1, q_rot=rot1, k_rot=rot1
        )
        x0 = MessageUpdate(self.dim, name="self_upd0")(x0, m0)
        x1 = MessageUpdate(self.dim, name="self_upd1")(x1, m1)
        # bidirectional cross-attention (no positional encoding)
        c0 = Attention(self.dim, self.num_heads, name="cross_attn0")(x0, x1, x1, v1)
        c1 = Attention(self.dim, self.num_heads, name="cross_attn1")(x1, x0, x0, v0)
        x0 = MessageUpdate(self.dim, name="cross_upd0")(x0, c0)
        x1 = MessageUpdate(self.dim, name="cross_upd1")(x1, c1)
        return x0, x1


class LightGlueNet(nn.Module):
    """Full matcher: descriptors+positions of two padded sets -> assignment."""

    dim: int = 256
    num_heads: int = 4
    num_layers: int = 9

    @nn.compact
    def __call__(self, desc0, desc1, xy0n, xy1n, valid0, valid1):
        """desc: (N, D) L2-normalized; xy*n: normalized positions (N, 2);
        valid: (N,) bool. Returns (scores (N0+1? no — (N0, N1) log-assignment),
        matchability0 (N0,), matchability1 (N1,))."""
        # Shared weights across the two sets (official LightGlue convention):
        # applying the same module instance twice shares its parameters.
        input_proj = nn.Dense(self.dim, name="input_proj")
        x0 = input_proj(desc0)
        x1 = input_proj(desc1)

        Dh = self.dim // self.num_heads
        freqs = self.param(
            "rotary_freqs",
            nn.initializers.normal(1.0),
            (2, Dh // 2),
        )
        rot0 = rotary_embed(xy0n, freqs)
        rot1 = rotary_embed(xy1n, freqs)

        for i in range(self.num_layers):
            x0, x1 = LightGlueLayer(self.dim, self.num_heads, name=f"layer{i}")(
                x0, x1, valid0, valid1, rot0, rot1
            )

        # assignment head (weights shared across the two sets)
        final_proj = nn.Dense(self.dim, name="final_proj")
        f0 = final_proj(x0) / (self.dim**0.25)
        f1 = final_proj(x1) / (self.dim**0.25)
        sim = jnp.einsum("nd,md->nm", f0, f1)

        matchability = nn.Dense(1, name="matchability")
        m0 = matchability(x0)[..., 0]
        m1 = matchability(x1)[..., 0]

        # sigmoid-log-double-softmax (LightGlue eq. 8)
        pad0 = jnp.where(valid0, 0.0, -1e9)[:, None]
        pad1 = jnp.where(valid1, 0.0, -1e9)[None, :]
        z = sim + pad0 + pad1
        log_a0 = jax.nn.log_softmax(z, axis=1)
        log_a1 = jax.nn.log_softmax(z, axis=0)
        log_assign = (
            log_a0
            + log_a1
            + jax.nn.log_sigmoid(m0)[:, None]
            + jax.nn.log_sigmoid(m1)[None, :]
        )
        return log_assign, jax.nn.sigmoid(m0), jax.nn.sigmoid(m1)


class LightGlueMatches(NamedTuple):
    idx2: jnp.ndarray      # (N0,) match into set 1, -1 if none
    score: jnp.ndarray     # (N0,) assignment confidence
    mask: jnp.ndarray      # (N0,) bool


def extract_matches(
    log_assign: jnp.ndarray,
    valid0: jnp.ndarray,
    valid1: jnp.ndarray,
    threshold: float = 0.1,
) -> LightGlueMatches:
    """Mutual-argmax over the padded assignment matrix (torch impl parity)."""
    scores = jnp.exp(log_assign)
    scores = jnp.where(valid0[:, None] & valid1[None, :], scores, 0.0)
    nn0 = jnp.argmax(scores, axis=1)
    nn1 = jnp.argmax(scores, axis=0)
    mutual = nn1[nn0] == jnp.arange(scores.shape[0])
    best = jnp.max(scores, axis=1)  # == scores[i, nn0[i]] without the gather
    ok = mutual & (best > threshold) & valid0
    return LightGlueMatches(
        idx2=jnp.where(ok, nn0.astype(jnp.int32), -1), score=best, mask=ok
    )
