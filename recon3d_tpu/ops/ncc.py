"""Fused windowed-NCC Pallas TPU kernel.

The hottest inner op of both dense backends (plane-sweep dense_stereo.py
:318-347 and PatchMatch mvs_patchmatch.py:392-413 in the reference) is
windowed normalized cross-correlation between the reference image and a
warped source. The XLA formulation (ops/image.box_filter x5) round-trips
five moment maps through HBM; this kernel keeps everything in VMEM and
writes only the final NCC map — one HBM read per input, one write per
output.

Window sums use shift-accumulate over a zero-padded VMEM buffer (patch is
small and static, so the adds fully unroll onto the VPU); masked means are
sum(x*w)/sum(w), numerically equivalent to the box_filter formulation in
dense/patchmatch._ncc_all (verified to ~1e-5 in tests/test_pallas_ncc.py).

Grid: one program per source view; each program owns full (H, W) planes.
At the dense backends' working scale (0.25x), a full plane is ~100-300 KB,
far under the ~16 MB VMEM budget; vmem_limit_bytes guards bigger inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _window_sum(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(2r+1)^2 windowed sum with zero padding, separable shift-accumulate."""
    H, W = x.shape
    xp = jnp.pad(x, ((r, r), (0, 0)))
    v = xp[0:H]
    for d in range(1, 2 * r + 1):
        v = v + xp[d : d + H]
    vp = jnp.pad(v, ((0, 0), (r, r)))
    h = vp[:, 0:W]
    for d in range(1, 2 * r + 1):
        h = h + vp[:, d : d + W]
    return h


def _ncc_kernel(ref_ref, src_ref, ok_ref, out_ref, *, r: int):
    ref = ref_ref[:]
    src = src_ref[0]
    w = ok_ref[0].astype(ref.dtype)

    sw = _window_sum(w, r) + 1e-6
    srw = _window_sum(ref * w, r)
    ssw = _window_sum(src * w, r)
    mr = srw / sw
    ms = ssw / sw
    cov = _window_sum(ref * src * w, r) / sw - mr * ms
    vr = jnp.maximum(_window_sum(ref * ref * w, r) / sw - mr * mr, 1e-8)
    vs = jnp.maximum(_window_sum(src * src * w, r) / sw - ms * ms, 1e-8)
    ncc = jnp.clip(cov * jax.lax.rsqrt(vr * vs), -1.0, 1.0)
    out_ref[0] = jnp.where(ok_ref[0], ncc, -1.0)


@functools.partial(jax.jit, static_argnames=("patch", "interpret"))
def ncc_windowed_fused(
    ref: jnp.ndarray,    # (H, W) float32
    src: jnp.ndarray,    # (J, H, W) float32 (warped sources)
    ok: jnp.ndarray,     # (J, H, W) bool
    patch: int = 11,
    interpret: bool = False,
) -> jnp.ndarray:
    """Masked windowed NCC of ref against each source plane -> (J, H, W).

    Semantics match dense.patchmatch._ncc_all: masked window means, -1.0
    where the source sample is invalid.
    """
    J, H, W = src.shape
    r = patch // 2
    kernel = functools.partial(_ncc_kernel, r=r)
    grid = (J,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((H, W), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, W), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((J, H, W), ref.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(14 * 1024 * 1024),
        ),
        interpret=interpret,
    )(ref, src, ok)


def ncc_windowed_xla(ref, src, ok, patch: int = 11):
    """XLA box-filter formulation (integral-image moment maps) — the
    non-TPU fallback and the numerical reference for the fused kernel."""
    from recon3d_tpu.ops.image import box_filter

    def one(s, m):
        w = m.astype(ref.dtype)
        cnt = box_filter(w, patch) + 1e-6
        mr = box_filter(ref * w, patch) / cnt
        ms = box_filter(s * w, patch) / cnt
        cov = box_filter(ref * s * w, patch) / cnt - mr * ms
        vr = jnp.maximum(box_filter(ref * ref * w, patch) / cnt - mr * mr, 1e-8)
        vs = jnp.maximum(box_filter(s * s * w, patch) / cnt - ms * ms, 1e-8)
        ncc = jnp.clip(cov / jnp.sqrt(vr * vs), -1.0, 1.0)
        return jnp.where(m, ncc, -1.0)

    return jax.vmap(one)(src, ok)


def ncc_windowed(ref, src, ok, patch: int = 11):
    """Dispatch. Default is the XLA formulation on every backend: measured on
    a v5e chip inside the PatchMatch candidate batch (bench.py config), the
    hand-written kernel reaches 45 MP/s vs 122 MP/s for XLA's own fusion of
    the integral-image moments — the kernel's O(patch) shift-adds lose to
    XLA's O(1) cumsum windows, and vmap-lifting the pallas_call grid adds
    overhead. Kept available (RECON3D_PALLAS_NCC=1) as the starting point
    for a future tiled/double-buffered version.
    """
    import os

    if (
        os.environ.get("RECON3D_PALLAS_NCC") == "1"
        and jax.default_backend() == "tpu"
    ):
        return ncc_windowed_fused(ref, src, ok, patch=patch)
    return ncc_windowed_xla(ref, src, ok, patch=patch)
