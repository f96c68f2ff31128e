"""Windowed normalized cross-correlation (the dense backends' inner op).

The hottest inner op of both dense backends (plane-sweep dense_stereo.py
:318-347 and PatchMatch mvs_patchmatch.py:392-413 in the reference) is
windowed NCC between the reference image and a warped source. Here it is
expressed as five box-filtered moment maps and left to XLA to fuse into
the surrounding candidate-evaluation program.

Why no hand-written Pallas kernel: a fused-NCC pallas_call was built and
A/B-measured on a v5e chip inside the PatchMatch candidate batch (bench.py
config) at ~2.7x slower than this XLA formulation. The loss is
structural, not a tuning artifact — the NCC consumes *warped* source
planes, and XLA fuses the warp, the moment box-filters, and the cost
reduction into one HBM pass over the candidate batch; a pallas_call
boundary in the middle forces the warped planes (J per candidate) to
materialize in HBM, costing more bandwidth than the kernel saves. A
winning kernel would have to subsume the whole backproject->warp->NCC
chain; that chain's warp half IS hand-written (ops/warp_pallas.py, which
feeds this NCC), and the combined path measures at the MXU roofline
(docs/perf_model.md), so there is nothing left for a bigger kernel to
recover.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ncc_windowed(ref, src, ok, patch: int = 11):
    """Masked windowed NCC of ref (H, W) against each source plane
    (J, H, W) -> (J, H, W); -1.0 where the source sample is invalid.

    Masked window means are sum(x*w)/sum(w) over the patch window
    (box_filter moment maps; XLA fuses the chain with the caller).
    """
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


# Backwards-compatible alias: callers that referenced the explicit XLA
# entry keep working.
ncc_windowed_xla = ncc_windowed
