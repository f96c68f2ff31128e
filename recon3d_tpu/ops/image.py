"""Image-space kernels: blur, resize, gradients, warping, undistortion.

Replaces the OpenCV image substrate of the reference (cv.resize/undistort,
sfm_pipeline.py:103-114; cv.remap, dense_stereo.py:390; cv.Sobel,
mvs_patchmatch.py:180-181) and torch's F.grid_sample
(mvs_patchmatch.py:371, dense_stereo.py:295) with XLA-native ops. All
functions are jittable with static shapes; images are float32 (H, W) or
(H, W, C) in [0, 1].
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) -> (H, W) luma (ITU-R BT.601, matching cv.COLOR_BGR2GRAY
    weights on RGB order)."""
    w = jnp.array([0.299, 0.587, 0.114], dtype=img.dtype)
    return img @ w


def gaussian_kernel1d(sigma: float, radius: int | None = None) -> np.ndarray:
    """Static host-side 1D Gaussian kernel (odd length 2*radius+1)."""
    if radius is None:
        radius = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _conv_sep_1d(img: jnp.ndarray, k: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Separable 1D convolution along `axis` of (H, W) with edge replication."""
    r = k.shape[0] // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (r, r)
    x = jnp.pad(img, pad, mode="edge")
    # express as conv_general_dilated on NCHW with 1 channel
    x4 = x[None, None]
    if axis == 0:
        kern = k.reshape(1, 1, -1, 1)
    else:
        kern = k.reshape(1, 1, 1, -1)
    out = jax.lax.conv_general_dilated(
        x4,
        kern.astype(img.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0, 0]


def gaussian_blur(img: jnp.ndarray, sigma: float, radius: int | None = None) -> jnp.ndarray:
    """Separable Gaussian blur of (H, W). Kernel is static (host-computed)."""
    if sigma <= 0:
        return img
    k = jnp.asarray(gaussian_kernel1d(sigma, radius))
    return _conv_sep_1d(_conv_sep_1d(img, k, 0), k, 1)


def downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """Decimate by 2 (take every other pixel) — pyramid octave step."""
    return img[::2, ::2]


def resize(img: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize (H, W[, C]) -> shape (h, w[, C])."""
    out_shape = shape + img.shape[2:]
    return jax.image.resize(img, out_shape, method="linear")


def sobel(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sobel gradients (gx, gy) of (H, W), same convention as cv.Sobel ksize=3."""
    # XLA convs are cross-correlations, so use cv.Sobel's kernels as-is.
    kd = jnp.asarray([-1.0, 0.0, 1.0], img.dtype)  # derivative
    ks = jnp.asarray([1.0, 2.0, 1.0], img.dtype)   # smoothing
    gx = _conv_sep_1d(_conv_sep_1d(img, ks, 0), kd, 1)
    gy = _conv_sep_1d(_conv_sep_1d(img, kd, 0), ks, 1)
    return gx, gy


def central_gradients(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradients (gx, gy), edge-replicated."""
    p = jnp.pad(img, 1, mode="edge")
    gx = 0.5 * (p[1:-1, 2:] - p[1:-1, :-2])
    gy = 0.5 * (p[2:, 1:-1] - p[:-2, 1:-1])
    return gx, gy


def bilinear_sample(
    img: jnp.ndarray, coords: jnp.ndarray, fill: float = 0.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bilinear sampling with validity mask — the F.grid_sample replacement.

    img:    (H, W) or (H, W, C).
    coords: (..., 2) as (x, y) pixel coordinates.
    Returns (samples (...,[C]), valid (...,)) where valid marks coords whose
    4-neighborhood is fully inside the image (matches grid_sample
    zeros-padding + explicit mask usage in the reference dense modules).
    """
    H, W = img.shape[0], img.shape[1]
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    valid = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1) & jnp.isfinite(x) & jnp.isfinite(y)

    x0c = jnp.clip(x0i, 0, W - 1)
    x1c = jnp.clip(x0i + 1, 0, W - 1)
    y0c = jnp.clip(y0i, 0, H - 1)
    y1c = jnp.clip(y0i + 1, 0, H - 1)

    v00 = img[y0c, x0c]
    v01 = img[y0c, x1c]
    v10 = img[y1c, x0c]
    v11 = img[y1c, x1c]

    if img.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    if img.ndim == 3:
        out = jnp.where(valid[..., None], out, fill)
    else:
        out = jnp.where(valid, out, fill)
    return out, valid


def bilinear_sample_mxu(
    img: jnp.ndarray, coords: jnp.ndarray, fill: float = 0.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather-free bilinear sampling for TPU: tent-weight matmuls on the MXU.

    Mathematically identical to bilinear_sample for 2D images (same values,
    same validity semantics) but expressed as dense linear algebra:

        out[p] = sum_h sum_w relu(1-|y_p-h|) * img[h, w] * relu(1-|x_p-w|)
               = ((Wy @ img) * Wx).sum(-1)

    The tent weights have exactly the two nonzero taps of linear
    interpolation per axis, so the contraction IS bilinear sampling. XLA
    lowers arbitrary-index gathers to ~20 M samples/s on TPU (measured,
    three orders of magnitude below HBM speed); the MXU runs the same
    sampling as matmuls at TFLOP/s rates. Worth it when H*W is small —
    cost is P*H*W flops vs P gathers — which is exactly the dense-stereo
    working resolution (scale 0.25 -> ~19k px maps).

    img: (H, W) only. coords: (..., 2) as (x, y).
    """
    H, W = img.shape[0], img.shape[1]
    x = coords[..., 0]
    y = coords[..., 1]
    valid = (
        (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
        & jnp.isfinite(x) & jnp.isfinite(y)
    )
    # Out-of-range / non-finite coords collapse to 0 so the weight rows stay
    # finite; their outputs are masked to `fill` below.
    xc = jnp.clip(jnp.where(jnp.isfinite(x), x, 0.0), 0, W - 1)
    yc = jnp.clip(jnp.where(jnp.isfinite(y), y, 0.0), 0, H - 1)

    shape = xc.shape
    P = 1
    for s in shape:
        P *= s
    xf = xc.reshape(P)
    yf = yc.reshape(P)
    iota_h = jnp.arange(H, dtype=img.dtype)
    iota_w = jnp.arange(W, dtype=img.dtype)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(yf[:, None] - iota_h[None, :]))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(xf[:, None] - iota_w[None, :]))
    rows = jnp.matmul(wy, img, precision=jax.lax.Precision.HIGHEST)
    out = jnp.sum(rows * wx, axis=-1).reshape(shape)
    return jnp.where(valid, out, fill), valid


# Below this pixel count the MXU tent-matmul formulation beats XLA's
# gather lowering on TPU (P*H*W flops vs P slow gathers); above it the
# quadratic flop cost takes over. 19.2k-px maps (the default dense working
# scale) sit comfortably below.
_MXU_SAMPLE_MAX_PIXELS = 128 * 512


def bilinear_sample_auto(
    img: jnp.ndarray, coords: jnp.ndarray, fill: float = 0.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """bilinear_sample with automatic TPU dispatch: MXU formulation for
    small 2D images, gather formulation otherwise.

    The Pallas path contracts at the MXU's DEFAULT precision (inputs
    rounded to bf16, f32 accumulate): ~4e-3 * max|img| sample error —
    noise-level for NCC photoconsistency — and the measured-fast choice.
    On-chip A/Bs (scripts/tpu_warp_ab.py + bench.py, v5e, 2026-08-18):
    Precision.HIGHEST costs 2.0x end-to-end PatchMatch (1.45 vs 2.92
    MP/s); an explicit bf16-input variant was +3% standalone but -3%
    end-to-end. Exact contraction stays available via
    warp_pallas.bilinear_sample_pallas(exact=True) for parity tests."""
    if (
        img.ndim == 2
        and img.shape[0] * img.shape[1] <= _MXU_SAMPLE_MAX_PIXELS
        and jax.default_backend() == "tpu"
    ):
        from recon3d_tpu.ops.warp_pallas import bilinear_sample_pallas

        return bilinear_sample_pallas(img, coords, fill)
    return bilinear_sample(img, coords, fill)


def distort_points(norm_xy: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Apply OpenCV 5-parameter distortion [k1,k2,p1,p2,k3] to normalized
    coordinates (..., 2)."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = norm_xy[..., 0], norm_xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(
    norm_xy_dist: jnp.ndarray, dist: jnp.ndarray, iterations: int = 8
) -> jnp.ndarray:
    """Invert the distortion model by fixed-point iteration (cv.undistortPoints
    uses the same scheme)."""

    def body(_, xy):
        d = distort_points(xy, dist)
        return xy + (norm_xy_dist - d)

    return jax.lax.fori_loop(0, iterations, body, norm_xy_dist)


@functools.partial(jax.jit, static_argnames=())
def undistort_image(img: jnp.ndarray, K: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Undistort an image so the pinhole model holds exactly afterwards.

    Same semantics as cv.undistort with identical camera matrix (reference
    sfm_pipeline.py:112-114): for each target pixel, apply the forward
    distortion to find the source pixel and bilinearly sample.
    """
    H, W = img.shape[0], img.shape[1]
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=img.dtype), jnp.arange(W, dtype=img.dtype), indexing="ij")
    nx = (xs - K[0, 2]) / K[0, 0]
    ny = (ys - K[1, 2]) / K[1, 1]
    d = distort_points(jnp.stack([nx, ny], axis=-1), dist)
    sx = d[..., 0] * K[0, 0] + K[0, 2]
    sy = d[..., 1] * K[1, 1] + K[1, 2]
    out, _ = bilinear_sample(img, jnp.stack([sx, sy], axis=-1))
    return out


def remap(img: jnp.ndarray, map_x: jnp.ndarray, map_y: jnp.ndarray) -> jnp.ndarray:
    """cv.remap equivalent: sample img at (map_x, map_y) per target pixel."""
    out, _ = bilinear_sample(img, jnp.stack([map_x, map_y], axis=-1))
    return out


def _box_filter_mxu(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """Clipped-window mean via banded ones-matrix matmuls on the MXU.

    box2d(img) = B_h @ img @ B_w with B[i, j] = 1 iff |i - j| <= r, then
    normalized by the true per-pixel overlap count. Identical values to
    the cumsum formulation, but matmuls instead of serial scans — on TPU
    the cumsum lowering was the hottest op left in the NCC chain.
    """
    H, W = img.shape[0], img.shape[1]
    r = size // 2
    ih = jnp.arange(H)
    iw = jnp.arange(W)
    Bh = (jnp.abs(ih[:, None] - ih[None, :]) <= r).astype(img.dtype)
    Bw = (jnp.abs(iw[:, None] - iw[None, :]) <= r).astype(img.dtype)
    if img.ndim == 2:
        s = jnp.matmul(
            jnp.matmul(Bh, img, precision=jax.lax.Precision.HIGHEST),
            Bw, precision=jax.lax.Precision.HIGHEST,
        )
    else:  # (H, W, C)
        s = jnp.einsum(
            "hi,iwc->hwc", Bh, img, precision=jax.lax.Precision.HIGHEST
        )
        s = jnp.einsum(
            "hwc,wj->hjc", s, Bw, precision=jax.lax.Precision.HIGHEST
        )
    cnt_h = jnp.sum(Bh, axis=1)
    cnt_w = jnp.sum(Bw, axis=1)
    cnt = cnt_h[:, None] * cnt_w[None, :]
    if img.ndim == 3:
        cnt = cnt[..., None]
    return s / cnt


def box_filter(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """Mean filter over a size x size window via padded cumulative sums.

    O(1) per pixel regardless of window size — replaces the ones-kernel
    conv2d NCC normalization of the reference (mvs_patchmatch.py:403-408).
    Edge handling: zero padding with per-pixel valid-count normalization
    (matches conv2d 'same' with ones kernel divided by window area? no —
    we normalize by the true overlap count, which is what NCC wants).

    On TPU, small images route to the MXU banded-matmul formulation
    (_box_filter_mxu) — same values, no serial scans.
    """
    H, W = img.shape[0], img.shape[1]
    if H * W <= _MXU_SAMPLE_MAX_PIXELS and jax.default_backend() == "tpu":
        return _box_filter_mxu(img, size)
    r = size // 2
    # integral image with leading zero row/col
    ii = jnp.pad(img, ((1, 0), (1, 0)) + ((0, 0),) * (img.ndim - 2)).cumsum(0).cumsum(1)
    ys = jnp.arange(H)
    xs = jnp.arange(W)
    y0 = jnp.clip(ys - r, 0, H)
    y1 = jnp.clip(ys + r + 1, 0, H)
    x0 = jnp.clip(xs - r, 0, W)
    x1 = jnp.clip(xs + r + 1, 0, W)
    s = (
        ii[y1[:, None], x1[None, :]]
        - ii[y0[:, None], x1[None, :]]
        - ii[y1[:, None], x0[None, :]]
        + ii[y0[:, None], x0[None, :]]
    )
    cnt = ((y1 - y0)[:, None] * (x1 - x0)[None, :]).astype(img.dtype)
    if img.ndim == 3:
        cnt = cnt[..., None]
    return s / cnt
