"""Fused tent-weight bilinear warp as a Pallas TPU kernel.

The XLA formulation of MXU bilinear sampling (ops/image.bilinear_sample_mxu)
materializes the tent-weight matrices Wy (P, H) and Wx (P, W) in HBM —
hundreds of MB per dense-stereo candidate evaluation, which bounds the
whole PatchMatch/plane-sweep pipeline on memory traffic. This kernel
builds the weights in VMEM per tile, feeds the MXU directly, and writes
only the (P,) samples back — HBM traffic drops from O(P*(H+W)) to O(P).
Values match the exact gather formulation to ~4e-3 (bf16 input rounding
in the MXU dot; exact=True pins Precision.HIGHEST at 2x end-to-end cost).

Layout note: weights are built TRANSPOSED — (H, 512) with the image axis
on sublanes and the sample axis on lanes — so the lane-major coordinate
vectors broadcast without relayouts, and the contraction is
(W, H) @ (H, 512) on the MXU against a pre-transposed image.

Replaces the reference's F.grid_sample call sites
(mvs_patchmatch.py:371, dense_stereo.py:295) at the TPU working scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# One grid step processes an (8, cols) block of samples: 8 unrolled rows of
# lane-resident samples each. The tile width is chosen PER CALL from the
# static sample count: padding waste dominates throughput (P=19.2k, the
# dense working scale, padded to 2x16384 tiles at cols=2048 wasted 41% of
# all warp work — measured 2.95 vs 3.26 MP/s end-to-end after the fix),
# while narrower tiles only pay a small per-grid-step overhead (cols=512
# measured 2% below cols=1280 at equal padding). Candidates are lane
# multiples, widest-first so ties go to the best-pipelined contraction.
_ROWS = 8
_COL_CANDIDATES = (2048, 1792, 1536, 1280, 1024, 768, 640, 512)


def _pick_cols(P: int) -> int:
    """Tile width minimizing padded sample count for a P-sample call."""
    def padded(c):
        tile = _ROWS * c
        return ((P + tile - 1) // tile) * tile

    return min(_COL_CANDIDATES, key=lambda c: (padded(c), -c))


def _tent_warp_kernel(imgT_ref, xs_ref, ys_ref, out_ref, *, cols, exact):
    """out[p] = sum_h sum_w tent(y_p - h) * img[h, w] * tent(x_p - w).

    Precision (both measured on a v5e chip, 2026-08-18): at JAX's DEFAULT
    matmul precision the TPU f32 dot rounds its inputs to bf16, so samples
    differ from the exact gather formulation by ~4e-3 * max|img| — noise-
    level for NCC photoconsistency over [0,1] images, and the dense-path
    default. Pinning Precision.HIGHEST (exact to 2e-7) costs 18% standalone
    but 2.0x END-TO-END on the PatchMatch bench (1.45 vs 2.92 MP/s: every
    candidate evaluation re-warps all source views, so the warp dominates
    once fused) — it is therefore opt-in via exact=True for parity tests,
    never the product default. An explicit bf16-input variant was also
    A/B-measured and rejected: +3% standalone, -3% end-to-end."""
    W, H = imgT_ref.shape
    prec = jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT
    ih = jax.lax.broadcasted_iota(jnp.int32, (H, cols), 0).astype(jnp.float32)
    iw = jax.lax.broadcasted_iota(jnp.int32, (W, cols), 0).astype(jnp.float32)
    imgT = imgT_ref[:]
    for r in range(_ROWS):
        y = ys_ref[0, r, :]                            # (512,) on lanes
        x = xs_ref[0, r, :]
        wyT = jnp.maximum(0.0, 1.0 - jnp.abs(ih - y[None, :]))   # (H, 512)
        rowsT = jnp.dot(imgT, wyT,
                        preferred_element_type=jnp.float32,
                        precision=prec)
        wxT = jnp.maximum(0.0, 1.0 - jnp.abs(iw - x[None, :]))   # (W, 512)
        out_ref[0, r, :] = jnp.sum(rowsT * wxT, axis=0)


import functools


@functools.partial(jax.jit, static_argnames=("interpret", "exact"))
def _tent_warp_flat(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray,
                    interpret: bool = False, exact: bool = False):
    """img (H, W) f32; xs, ys (P,) finite, pre-clipped to the image bounds.
    Returns (P,) bilinear samples. interpret=True runs the Pallas
    interpreter (any backend — used by the CPU test suite for parity);
    exact=True pins the MXU contraction to Precision.HIGHEST (see
    _tent_warp_kernel)."""
    H, W = img.shape
    P = xs.shape[0]
    cols = _pick_cols(P)
    tile = _ROWS * cols
    n_tiles = (P + tile - 1) // tile
    Pp = n_tiles * tile
    xs_p = jnp.pad(xs, (0, Pp - P)).reshape(n_tiles, _ROWS, cols)
    ys_p = jnp.pad(ys, (0, Pp - P)).reshape(n_tiles, _ROWS, cols)
    out = pl.pallas_call(
        functools.partial(_tent_warp_kernel, cols=cols, exact=exact),
        out_shape=jax.ShapeDtypeStruct((n_tiles, _ROWS, cols), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((W, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROWS, cols), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROWS, cols), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _ROWS, cols), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * Pp * H * (W + 1),
            transcendentals=0,
            bytes_accessed=4 * (H * W + 3 * Pp),
        ),
        interpret=interpret,
    )(img.T.astype(jnp.float32), xs_p, ys_p)
    return out.reshape(Pp)[:P]


def bilinear_sample_pallas(img: jnp.ndarray, coords: jnp.ndarray,
                           fill: float = 0.0, interpret: bool = False,
                           exact: bool = False):
    """Drop-in for ops.image.bilinear_sample (2D images): same validity
    semantics, Pallas tent-warp kernel underneath. Values match the gather
    formulation to ~4e-3 * max|img| at the default MXU precision, or to
    2e-7 with exact=True (2x slower end-to-end — parity-test use only)."""
    H, W = img.shape
    x = coords[..., 0]
    y = coords[..., 1]
    valid = (
        (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
        & jnp.isfinite(x) & jnp.isfinite(y)
    )
    xc = jnp.clip(jnp.where(jnp.isfinite(x), x, 0.0), 0, W - 1)
    yc = jnp.clip(jnp.where(jnp.isfinite(y), y, 0.0), 0, H - 1)
    shape = xc.shape
    out = _tent_warp_flat(
        img, xc.reshape(-1), yc.reshape(-1), interpret=interpret, exact=exact,
    ).reshape(shape)
    return jnp.where(valid, out, fill), valid
