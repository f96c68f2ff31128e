"""SIFT feature detection + description, TPU-native.

Replaces cv.SIFT_create (reference features.py:52, dense.py:35) — the
largest single OpenCV dependency. The design is *not* a port of the
scalar DoG-pyramid walk; it is reformulated for wide vector hardware:

  - Gaussian / DoG pyramid: separable XLA convolutions, static octave count.
  - Extremum detection: one 3x3x3 reduce_window min/max over the whole DoG
    volume — every pixel tested in parallel (no candidate lists).
  - Candidate selection: masked top-k per octave (static capacity), so all
    downstream work is fixed-shape.
  - Subpixel refinement: batched 3x3 solves on gathered 27-neighborhoods.
  - Orientation + descriptor: per-keypoint patches sampled with one gather
    (nearest for the orientation histogram, bilinear for the rotated
    descriptor grid), then histogram binning expressed as einsums over
    precomputed soft-assignment tensors (runs on the MXU). Element gathers
    are the extractor's TPU bottleneck, so grid sizes are the smallest that
    preserve match quality (measured: 399 -> 118 ms/img at 480x640/8k
    features on v5e from the batched-conv pyramid + grid shrink + nearest
    orientation sampling, with tests/test_sift_vs_opencv.py unchanged).

Known deviations from OpenCV (documented, config-gated where relevant):
no initial 2x upsampling by default (`upsample` flag), single dominant
orientation per keypoint (OpenCV may emit multiple), one refinement step
instead of an iterative loop. Keypoint repeatability against OpenCV is
tested statistically (tests/test_sift.py), not bit-exactly — SURVEY.md §7.
"""

from __future__ import annotations

import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from recon3d_tpu.ops.image import (
    gaussian_blur,
    gaussian_kernel1d,
    downsample2,
    bilinear_sample,
    resize,
)

_HI = jax.lax.Precision.HIGHEST

N_ORI_BINS = 36
N_DESC_BINS = 8
DESC_GRID = 4          # 4x4 spatial cells
PATCH = 12             # descriptor sampling grid (12x12 samples, 3x3/cell —
                       # bilinear patch gathers dominate extraction time on
                       # TPU; 16x16 adds 78% more gathers for no measurable
                       # match-quality gain, tests/test_sift_vs_opencv.py)
ORI_PATCH = 10         # orientation sampling grid (10x10; the 36-bin
                       # histogram is smoothed, so denser sampling is noise)
LAMBDA_ORI = 1.5       # orientation Gaussian window = lambda_ori * sigma
LAMBDA_DESC = 3.0      # descriptor cell size = lambda_desc * sigma


@struct.dataclass
class SiftFeatures:
    """Padded keypoint set for one image (capacity K).

    xy:       (K, 2) pixel coordinates in the original image.
    scale:    (K,) sigma in original-image pixels.
    angle:    (K,) dominant orientation, radians.
    response: (K,) refined |DoG| response.
    desc:     (K, 128) L2-normalized descriptors.
    valid:    (K,) bool.
    """

    xy: jnp.ndarray
    scale: jnp.ndarray
    angle: jnp.ndarray
    response: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray

    @property
    def num_valid(self):
        return jnp.sum(self.valid)


# ---------------------------------------------------------------------------
# Pyramid


def _blur_stack(base: jnp.ndarray, deltas: List[float]) -> jnp.ndarray:
    """All blur levels of one octave in ONE separable conv pair.

    The incremental per-level scheme (blur level i-1 -> level i) issues
    2*(S+2) single-channel convs per octave — each a tiny VPU op whose
    overhead dominates (measured 104 ms/img of the 350 ms extraction).
    Blurring every level directly from the octave base (same math:
    Gaussian variances add) makes the level axis a conv output-channel
    axis: one C_out=S+2 horizontal conv + one depthwise vertical conv.
    Per-level kernels are zero-padded to the widest radius, which exactly
    reproduces each level's own edge-replicated padding.
    """
    ks = [gaussian_kernel1d(d) for d in deltas]
    R = max(kk.shape[0] // 2 for kk in ks)
    Wk = 2 * R + 1
    C = len(ks)
    K = np.zeros((C, Wk), np.float32)
    for i, kk in enumerate(ks):
        r = kk.shape[0] // 2
        K[i, R - r : R + r + 1] = kk
    Kj = jnp.asarray(K)

    xp = jnp.pad(base, ((0, 0), (R, R)), mode="edge")[None, None]
    h = jax.lax.conv_general_dilated(
        xp, Kj.reshape(C, 1, 1, Wk), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )  # (1, C, H, W)
    hp = jnp.pad(h, ((0, 0), (0, 0), (R, R), (0, 0)), mode="edge")
    v = jax.lax.conv_general_dilated(
        hp, Kj.reshape(C, 1, Wk, 1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST,
    )  # (1, C, H, W)
    return jnp.concatenate([base[None], v[0]], axis=0)


def build_pyramid(
    img: jnp.ndarray, num_octaves: int, scales: int, sigma0: float
) -> List[jnp.ndarray]:
    """Gaussian pyramid: per octave an (S+3, H_o, W_o) stack.

    Level i has absolute scale sigma0 * 2^(i/S) relative to the octave
    base; all levels of an octave blur directly from the base in one
    batched conv pair (_blur_stack); the next octave seeds from level S
    (scale 2*sigma0).
    """
    k = 2.0 ** (1.0 / scales)
    # assumed blur of the input image (OpenCV convention)
    sigma_init = 0.5
    base = gaussian_blur(img, math.sqrt(max(sigma0**2 - sigma_init**2, 0.01)))

    deltas = [
        math.sqrt(max((sigma0 * k**i) ** 2 - sigma0**2, 1e-6))
        for i in range(1, scales + 3)
    ]
    octaves = []
    current = base
    for _ in range(num_octaves):
        stack = _blur_stack(current, deltas)
        octaves.append(stack)
        current = downsample2(stack[scales])
    return octaves


# ---------------------------------------------------------------------------
# Detection


def _top_k(score: jnp.ndarray, k: int):
    """Top-k candidate selection, TPU-tuned.

    `lax.top_k` over a full DoG volume (~1.5M elements at octave 0) is a
    full sort on TPU — ~100 ms per octave, dominating extraction. TPU's
    native `approx_max_k` is an order of magnitude faster; candidates it
    misses (recall target 0.97) are weak near-duplicate extrema that the
    contrast threshold mostly discards anyway. Non-TPU backends keep the
    exact path (CPU tests stay bit-deterministic).
    """
    if jax.default_backend() == "cpu":
        return jax.lax.top_k(score, k)
    return jax.lax.approx_max_k(score, k, recall_target=0.97)


def _detect_octave(
    gauss: jnp.ndarray,
    octave_idx: int,
    k_cap: int,
    scales: int,
    sigma0: float,
    contrast_threshold: float,
    edge_threshold: float,
    upsample: bool,
):
    """Detect up to k_cap keypoints in one octave.

    Returns per-keypoint (xy_full, sigma_full, sigma_oct, level, response,
    valid) plus octave-local coords for sampling.
    """
    S = scales
    dog = gauss[1:] - gauss[:-1]  # (S+2, H, W)
    L, H, W = dog.shape

    # 3D extrema: a pixel is a candidate if it equals the 3x3x3 max (or min)
    # and clears the pre-threshold.
    mx = jax.lax.reduce_window(
        dog, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME"
    )
    mn = jax.lax.reduce_window(
        dog, jnp.inf, jax.lax.min, (3, 3, 3), (1, 1, 1), "SAME"
    )
    pre_thr = 0.5 * contrast_threshold / S
    is_ext = ((dog >= mx) | (dog <= mn)) & (jnp.abs(dog) > pre_thr)

    # Edge rejection via 2x2 spatial Hessian ratio.
    p = jnp.pad(dog, ((0, 0), (1, 1), (1, 1)), mode="edge")
    dxx = p[:, 1:-1, 2:] + p[:, 1:-1, :-2] - 2 * dog
    dyy = p[:, 2:, 1:-1] + p[:, :-2, 1:-1] - 2 * dog
    dxy = 0.25 * (p[:, 2:, 2:] + p[:, :-2, :-2] - p[:, 2:, :-2] - p[:, :-2, 2:])
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_threshold
    edge_ok = (det > 0) & (tr * tr * r < (r + 1) ** 2 * det)

    # Valid only in interior levels/pixels.
    lvl = jnp.arange(L)[:, None, None]
    ys = jnp.arange(H)[None, :, None]
    xs = jnp.arange(W)[None, None, :]
    border = 5
    interior = (
        (lvl >= 1)
        & (lvl <= S)
        & (ys >= border)
        & (ys < H - border)
        & (xs >= border)
        & (xs < W - border)
    )
    cand = is_ext & edge_ok & interior

    score = jnp.where(cand, jnp.abs(dog), -1.0).reshape(-1)
    vals, idx = _top_k(score, k_cap)
    valid = vals > 0

    li = idx // (H * W)
    yi = (idx % (H * W)) // W
    xi = idx % W

    # --- subpixel refinement on gathered 3x3x3 neighborhoods
    flat = dog.reshape(-1)

    def gather(dl, dy, dx):
        ii = (
            jnp.clip(li + dl, 0, L - 1) * (H * W)
            + jnp.clip(yi + dy, 0, H - 1) * W
            + jnp.clip(xi + dx, 0, W - 1)
        )
        return flat[ii]

    c = gather(0, 0, 0)
    gx = 0.5 * (gather(0, 0, 1) - gather(0, 0, -1))
    gy = 0.5 * (gather(0, 1, 0) - gather(0, -1, 0))
    gs = 0.5 * (gather(1, 0, 0) - gather(-1, 0, 0))
    hxx = gather(0, 0, 1) + gather(0, 0, -1) - 2 * c
    hyy = gather(0, 1, 0) + gather(0, -1, 0) - 2 * c
    hss = gather(1, 0, 0) + gather(-1, 0, 0) - 2 * c
    hxy = 0.25 * (gather(0, 1, 1) + gather(0, -1, -1) - gather(0, 1, -1) - gather(0, -1, 1))
    hxs = 0.25 * (gather(1, 0, 1) + gather(-1, 0, -1) - gather(1, 0, -1) - gather(-1, 0, 1))
    hys = 0.25 * (gather(1, 1, 0) + gather(-1, -1, 0) - gather(1, -1, 0) - gather(-1, 1, 0))

    Hm = jnp.stack(
        [
            jnp.stack([hxx, hxy, hxs], -1),
            jnp.stack([hxy, hyy, hys], -1),
            jnp.stack([hxs, hys, hss], -1),
        ],
        -2,
    )  # (K, 3, 3)
    g = jnp.stack([gx, gy, gs], -1)  # (K, 3)
    # damped solve for robustness on near-singular Hessians
    Hd = Hm + 1e-6 * jnp.eye(3)
    off = -jnp.linalg.solve(Hd, g[..., None])[..., 0]
    off = jnp.clip(off, -1.0, 1.0)
    d_hat = c + 0.5 * jnp.sum(g * off, axis=-1)

    contrast_ok = jnp.abs(d_hat) >= contrast_threshold / S
    off_ok = jnp.max(jnp.abs(off), axis=-1) <= 1.0
    valid = valid & contrast_ok & off_ok

    x_o = xi.astype(jnp.float32) + off[:, 0]
    y_o = yi.astype(jnp.float32) + off[:, 1]
    l_o = li.astype(jnp.float32) + off[:, 2]

    oct_scale = 2.0**octave_idx * (0.5 if upsample else 1.0)
    xy_full = jnp.stack([x_o, y_o], -1) * oct_scale
    sigma_oct = sigma0 * (2.0 ** (l_o / S))  # octave-local sigma (pixels of this octave)
    sigma_full = sigma_oct * oct_scale

    return dict(
        xy_full=xy_full,
        x_oct=x_o,
        y_oct=y_o,
        level=li,
        sigma_oct=sigma_oct,
        sigma_full=sigma_full,
        response=jnp.abs(d_hat),
        valid=valid,
    )


# ---------------------------------------------------------------------------
# Orientation + descriptor (patch-based, einsum binning)


def _sample_patches(
    gauss: jnp.ndarray,
    level: jnp.ndarray,
    cx: jnp.ndarray,
    cy: jnp.ndarray,
    radius: jnp.ndarray,
    angle: jnp.ndarray,
    n: int,
    interp: str = "bilinear",
):
    """Sample (K, n+2, n+2) patches (extra ring for central differences).

    Grid spans [-radius, radius] in octave pixels, rotated by `angle`.
    Gathers from the keypoint's own pyramid level via flat indexing.
    interp="nearest" quarters the gather count (element gathers are the
    TPU bottleneck of the whole extractor) — used for the orientation
    patch, whose smoothed 36-bin histogram is insensitive to sub-pixel
    interpolation.
    """
    L, H, W = gauss.shape
    m = n + 2
    lin = jnp.linspace(-1.0, 1.0, m) * (1.0 + 2.0 / n)  # extend for the ring
    gy, gx = jnp.meshgrid(lin, lin, indexing="ij")  # (m, m)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    # rotate grid, scale by radius
    px = (gx[None] * ca[:, None, None] - gy[None] * sa[:, None, None]) * radius[:, None, None]
    py = (gx[None] * sa[:, None, None] + gy[None] * ca[:, None, None]) * radius[:, None, None]
    sxc = cx[:, None, None] + px
    syc = cy[:, None, None] + py
    ok = (sxc >= 0) & (sxc <= W - 1) & (syc >= 0) & (syc <= H - 1)

    # gather from per-keypoint level: flatten levels into rows
    if interp == "nearest":
        xi = jnp.clip(jnp.round(sxc), 0.0, W - 1.0).astype(jnp.int32)
        yi = jnp.clip(jnp.round(syc), 0.0, H - 1.0).astype(jnp.int32)
        flat1 = gauss.reshape(-1)
        vals = flat1[(level[:, None, None] * H + yi) * W + xi]
        return vals, ok
    flat = gauss.reshape(L * H, W)
    row = level[:, None, None] * H + jnp.clip(syc, 0.0, H - 1.0)
    coords = jnp.stack([jnp.clip(sxc, 0.0, W - 1.0), row], axis=-1)
    vals, _ = bilinear_sample(flat, coords)
    return vals, ok


def _patch_gradients(patch: jnp.ndarray, ok: jnp.ndarray):
    """Central-difference gradients of (K, m, m) patches -> (K, n, n) mag/ori."""
    gx = 0.5 * (patch[:, 1:-1, 2:] - patch[:, 1:-1, :-2])
    gy = 0.5 * (patch[:, 2:, 1:-1] - patch[:, :-2, 1:-1])
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-16)
    ori = jnp.arctan2(gy, gx)  # [-pi, pi]
    valid = ok[:, 1:-1, 1:-1] & ok[:, 1:-1, 2:] & ok[:, 1:-1, :-2] & ok[:, 2:, 1:-1] & ok[:, :-2, 1:-1]
    return mag * valid, ori


@functools.lru_cache(maxsize=None)
def _gauss_window(n: int, sigma_frac: float) -> np.ndarray:
    lin = np.linspace(-1.0, 1.0, n)
    gy, gx = np.meshgrid(lin, lin, indexing="ij")
    return np.exp(-(gx**2 + gy**2) / (2 * sigma_frac**2)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _spatial_assignment(n: int, d: int) -> np.ndarray:
    """(n, n, d, d) bilinear soft-assignment of samples to descriptor cells."""
    lin = (np.arange(n) + 0.5) / n * d - 0.5  # cell-space coordinate
    w = np.zeros((n, d), np.float32)
    for i, c in enumerate(lin):
        c0 = int(np.floor(c))
        f = c - c0
        if 0 <= c0 < d:
            w[i, c0] += 1 - f
        if 0 <= c0 + 1 < d:
            w[i, c0 + 1] += f
    return np.einsum("ya,xb->yxab", w, w).astype(np.float32)


def _interp_peak_angle(hist: jnp.ndarray, peak: jnp.ndarray,
                       dtype) -> jnp.ndarray:
    """Parabolic-interpolated angle (radians) of histogram bin `peak`.

    One-hot sums instead of take_along_axis: XLA lowers the latter to a
    gather (~20 M elem/s on this TPU); 36-wide masked reductions are VPU.
    """
    cols = jnp.arange(N_ORI_BINS)
    hp = jnp.sum(jnp.where(cols == peak[:, None], hist, 0.0), axis=-1)
    hl = jnp.sum(jnp.where(cols == ((peak - 1) % N_ORI_BINS)[:, None],
                           hist, 0.0), axis=-1)
    hr = jnp.sum(jnp.where(cols == ((peak + 1) % N_ORI_BINS)[:, None],
                           hist, 0.0), axis=-1)
    denom = hl - 2 * hp + hr
    interp = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (hl - hr) / denom, 0.0)
    bin_f = peak.astype(dtype) + jnp.clip(interp, -0.5, 0.5)
    return bin_f / N_ORI_BINS * 2 * jnp.pi - jnp.pi


def _orientation(mag: jnp.ndarray, ori: jnp.ndarray):
    """Gradient orientations per keypoint from (K, n, n) grads.

    Returns (angle (K,), angle2 (K,), has2 (K,) bool): the dominant
    orientation plus the strongest SECONDARY local peak >= 0.8x the
    dominant one — OpenCV emits an extra keypoint at such peaks
    (reference features.py:52 relies on that behavior for rotation-rich
    captures); callers opt in via extract_sift(multi_orientation=True).
    """
    K, n, _ = mag.shape
    w = jnp.asarray(_gauss_window(n, 2.0 / 3.0))
    wm = mag * w[None]
    # soft-assign to 36 circular bins
    b = (ori + jnp.pi) / (2 * jnp.pi) * N_ORI_BINS  # [0, 36]
    b0 = jnp.floor(b)
    f = b - b0
    b0i = b0.astype(jnp.int32) % N_ORI_BINS
    b1i = (b0i + 1) % N_ORI_BINS
    oh0 = jax.nn.one_hot(b0i, N_ORI_BINS, dtype=mag.dtype) * ((1 - f) * wm)[..., None]
    oh1 = jax.nn.one_hot(b1i, N_ORI_BINS, dtype=mag.dtype) * (f * wm)[..., None]
    hist = (oh0 + oh1).sum(axis=(1, 2))  # (K, 36)

    # two passes of circular [1,4,6,4,1]/16 smoothing
    for _ in range(2):
        h = hist
        hist = (
            6 * h
            + 4 * (jnp.roll(h, 1, -1) + jnp.roll(h, -1, -1))
            + (jnp.roll(h, 2, -1) + jnp.roll(h, -2, -1))
        ) / 16.0

    peak = jnp.argmax(hist, axis=-1)
    angle = _interp_peak_angle(hist, peak, mag.dtype)

    # Secondary peak: strongest circular local max that is not the primary
    # bin and clears OpenCV's 0.8 * primary threshold.
    hp = jnp.max(hist, axis=-1)
    left = jnp.roll(hist, 1, -1)
    right = jnp.roll(hist, -1, -1)
    cols = jnp.arange(N_ORI_BINS)
    is_local_max = (hist > left) & (hist >= right)
    eligible = is_local_max & (cols[None] != peak[:, None]) & (
        hist >= 0.8 * hp[:, None]
    )
    sec_val = jnp.where(eligible, hist, -jnp.inf)
    peak2 = jnp.argmax(sec_val, axis=-1)
    has2 = jnp.isfinite(jnp.max(sec_val, axis=-1))
    angle2 = _interp_peak_angle(hist, peak2, mag.dtype)
    return angle, angle2, has2


def _descriptor(mag: jnp.ndarray, ori: jnp.ndarray, max_value: float) -> jnp.ndarray:
    """SIFT 4x4x8 descriptor from rotated-patch gradients (K, n, n)."""
    K, n, _ = mag.shape
    w = jnp.asarray(_gauss_window(n, 0.5))
    wm = mag * w[None]

    b = (ori + jnp.pi) / (2 * jnp.pi) * N_DESC_BINS
    b0 = jnp.floor(b)
    f = b - b0
    b0i = b0.astype(jnp.int32) % N_DESC_BINS
    b1i = (b0i + 1) % N_DESC_BINS
    ohist = (
        jax.nn.one_hot(b0i, N_DESC_BINS, dtype=mag.dtype) * ((1 - f) * wm)[..., None]
        + jax.nn.one_hot(b1i, N_DESC_BINS, dtype=mag.dtype) * (f * wm)[..., None]
    )  # (K, n, n, 8)

    spatial = jnp.asarray(_spatial_assignment(n, DESC_GRID))  # (n, n, 4, 4)
    desc = jnp.einsum("kyxb,yxcd->kcdb", ohist, spatial, precision=_HI)
    desc = desc.reshape(K, DESC_GRID * DESC_GRID * N_DESC_BINS)

    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
    desc = jnp.minimum(desc, max_value)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
    return desc


# ---------------------------------------------------------------------------
# Full extractor


def _octave_capacities(max_features: int, num_octaves: int) -> List[int]:
    """Static per-octave candidate capacities, proportional to pixel count."""
    weights = [4.0**-o for o in range(num_octaves)]
    total = sum(weights)
    caps = [max(128, int(round(max_features * w / total))) for w in weights]
    return caps


def _describe_octave(
    gauss: jnp.ndarray,
    det: dict,
    scales: int,
    descriptor_max_value: float,
    multi_orientation: bool,
    cap_sel: int | None = None,
):
    """Orientation + descriptor for one octave's detected candidates.

    cap_sel: when given, only the top-cap_sel candidates by
    (valid, response) are described — the two-phase fast path
    (detect_sift/describe_sift): detection capacity is a worst-case
    budget (e.g. 8034 slots) while typical images yield a few hundred
    keypoints, and orientation/descriptor cost is proportional to SLOTS,
    not keypoints (measured: 5.3 s -> 1.7 s for 50 images at 770 vs 8034
    slots). Returns a list of SiftFeatures parts (primary + optional
    secondary-orientation block).
    """
    cap_det = det["valid"].shape[0]
    if cap_sel is not None and cap_sel < cap_det:
        order = jnp.argsort(
            jnp.where(det["valid"], -det["response"], jnp.inf)
        )[:cap_sel]
        det = {k: v[order] for k, v in det.items()}
    S = scales
    lvl = jnp.clip(
        jnp.round(det["level"].astype(jnp.float32)).astype(jnp.int32),
        0, S + 2,
    )

    # Orientation from an unrotated patch (radius = 3 * lambda_ori * sigma).
    rad_ori = 3.0 * LAMBDA_ORI * det["sigma_oct"]
    patch, ok = _sample_patches(
        gauss, lvl, det["x_oct"], det["y_oct"], rad_ori,
        jnp.zeros_like(det["x_oct"]), ORI_PATCH, interp="nearest",
    )
    mag, ori = _patch_gradients(patch, ok)
    angle, angle2, has2 = _orientation(mag, ori)

    # Descriptor from a patch rotated by the dominant orientation.
    rad_desc = (
        LAMBDA_DESC * det["sigma_oct"] * (DESC_GRID + 1) * 0.5
        * math.sqrt(2.0)
    )
    dpatch, dok = _sample_patches(
        gauss, lvl, det["x_oct"], det["y_oct"], rad_desc, angle, PATCH,
        interp="nearest",
    )
    dmag, dori = _patch_gradients(dpatch, dok)
    desc = _descriptor(dmag, dori, descriptor_max_value)

    parts = [
        SiftFeatures(
            xy=det["xy_full"],
            scale=det["sigma_full"],
            angle=angle,
            response=det["response"],
            desc=desc,
            valid=det["valid"],
        )
    ]
    if multi_orientation:
        # Secondary-orientation keypoints: static 1/4-capacity slots,
        # filled by the strongest-response candidates with a qualifying
        # second peak; the rest of the slots carry valid=False. k2 derives
        # from the DETECTION capacity (clamped to the selection capacity)
        # so the two-phase path emits the same secondary set as
        # extract_sift: cap_sel always covers every valid candidate
        # (1.25x count headroom), so top-k2-by-response coincides.
        k2 = max(32, min(cap_det // 4, det["valid"].shape[0]))
        sec_ok = det["valid"] & has2
        sec_score = jnp.where(sec_ok, det["response"], -jnp.inf)
        idx2 = jnp.argsort(-sec_score)[:k2]
        dpatch2, dok2 = _sample_patches(
            gauss, lvl[idx2], det["x_oct"][idx2], det["y_oct"][idx2],
            rad_desc[idx2], angle2[idx2], PATCH, interp="nearest",
        )
        dmag2, dori2 = _patch_gradients(dpatch2, dok2)
        desc2 = _descriptor(dmag2, dori2, descriptor_max_value)
        parts.append(
            SiftFeatures(
                xy=det["xy_full"][idx2],
                scale=det["sigma_full"][idx2],
                angle=angle2[idx2],
                response=det["response"][idx2],
                desc=desc2,
                valid=sec_ok[idx2],
            )
        )
    return parts


def _finalize_features(parts) -> SiftFeatures:
    feats = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *parts
    )
    order = jnp.argsort(jnp.where(feats.valid, -feats.response, jnp.inf))
    return jax.tree_util.tree_map(lambda a: a[order], feats)


def detect_sift(
    img: jnp.ndarray,
    max_features: int = 8000,
    num_octaves: int = 4,
    scales: int = 3,
    sigma0: float = 1.6,
    contrast_threshold: float = 0.03,
    edge_threshold: float = 15.0,
    upsample: bool = False,
):
    """Detection phase of the two-phase SIFT path: Gaussian pyramid +
    per-octave extrema/refinement at full (worst-case) candidate
    capacities. Returns (pyramid, dets, counts) where counts (O,) is the
    per-octave valid-candidate count — the only value the host needs to
    fetch to pick the describe phase's slot buckets. Jit-compatible."""
    if upsample:
        img = resize(img, (img.shape[0] * 2, img.shape[1] * 2))
    min_side = min(img.shape[0], img.shape[1])
    num_octaves = min(num_octaves, max(1, int(math.log2(min_side / 16))))
    pyramid = build_pyramid(img, num_octaves, scales, sigma0)
    caps = _octave_capacities(max_features, num_octaves)
    dets = []
    for o, gauss in enumerate(pyramid):
        dets.append(
            _detect_octave(
                gauss, o, caps[o], scales, sigma0, contrast_threshold,
                edge_threshold, upsample,
            )
        )
    counts = jnp.stack([jnp.sum(d["valid"]) for d in dets])
    return tuple(pyramid), tuple(dets), counts


def describe_sift(
    pyramid,
    dets,
    caps_sel,
    scales: int = 3,
    descriptor_max_value: float = 0.2,
    multi_orientation: bool = False,
) -> SiftFeatures:
    """Describe phase of the two-phase SIFT path: per octave, the top
    caps_sel[o] candidates by (valid, response) get orientation +
    descriptors. caps_sel must be static (bucketed by the caller from
    detect_sift's counts). Jit-compatible."""
    parts = []
    for o, (gauss, det) in enumerate(zip(pyramid, dets)):
        parts.extend(
            _describe_octave(
                gauss, det, scales, descriptor_max_value,
                multi_orientation, cap_sel=int(caps_sel[o]),
            )
        )
    return _finalize_features(parts)


def extract_sift(
    img: jnp.ndarray,
    max_features: int = 8000,
    num_octaves: int = 4,
    scales: int = 3,
    sigma0: float = 1.6,
    contrast_threshold: float = 0.03,
    edge_threshold: float = 15.0,
    upsample: bool = False,
    descriptor_max_value: float = 0.2,
    multi_orientation: bool = False,
) -> SiftFeatures:
    """Detect + describe SIFT features of a grayscale image (H, W) in [0,1].

    Returns a SiftFeatures with capacity = sum of per-octave caps
    (>= max_features), sorted by validity then response. Jit-compatible for
    a fixed image shape.

    multi_orientation: emit an EXTRA keypoint at each secondary orientation
    peak >= 0.8x the dominant one, as OpenCV does (reference features.py:52)
    — improves repeatability on rotation-rich captures at ~25% extra
    descriptor cost (secondary slots are capped at 1/4 of each octave's
    capacity, strongest responses first; typically ~15% of keypoints carry
    a qualifying secondary peak).
    """
    pyramid, dets, _ = detect_sift(
        img, max_features, num_octaves, scales, sigma0,
        contrast_threshold, edge_threshold, upsample,
    )
    parts = []
    for gauss, det in zip(pyramid, dets):
        parts.extend(
            _describe_octave(
                gauss, det, scales, descriptor_max_value, multi_orientation,
            )
        )
    return _finalize_features(parts)
