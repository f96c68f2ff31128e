"""Windowed-NCC numerics (ops/ncc.py — the dense backends' inner op)."""

import numpy as np
import pytest

import jax.numpy as jnp

from recon3d_tpu.ops.ncc import ncc_windowed


@pytest.mark.parametrize("patch", [5, 11])
def test_ncc_windowed_semantics(patch):
    rng = np.random.default_rng(0)
    H, W, J = 48, 64, 3
    ref = rng.random((H, W)).astype(np.float32)
    src = np.stack([ref + rng.normal(scale=s, size=(H, W)).astype(np.float32)
                    for s in (0.01, 0.2, 1.0)])
    ok = rng.random((J, H, W)) > 0.1

    got = np.asarray(
        ncc_windowed(jnp.asarray(ref), jnp.asarray(src), jnp.asarray(ok),
                     patch)
    )
    assert got.shape == (J, H, W)
    # range and invalid-sample semantics
    assert (got >= -1.0 - 1e-5).all() and (got <= 1.0 + 1e-5).all()
    np.testing.assert_array_equal(got[~ok], -1.0)
    # an identical (up to tiny noise) source correlates near 1 away from
    # masked holes; heavy noise scores clearly lower
    m = ok.all(0)
    assert np.median(got[0][m]) > 0.9
    assert np.median(got[0][m]) > np.median(got[2][m])

    # exact-window check against a direct (slow) masked-NCC at one pixel
    r = patch // 2
    y, x = H // 2, W // 2
    pr = ref[y - r : y + r + 1, x - r : x + r + 1].ravel()
    ps = src[1, y - r : y + r + 1, x - r : x + r + 1].ravel()
    w = ok[1, y - r : y + r + 1, x - r : x + r + 1].ravel().astype(np.float64)
    sw = w.sum()
    mr, ms = (pr * w).sum() / sw, (ps * w).sum() / sw
    cov = (pr * ps * w).sum() / sw - mr * ms
    vr = (pr * pr * w).sum() / sw - mr * mr
    vs = (ps * ps * w).sum() / sw - ms * ms
    want = np.clip(cov / np.sqrt(max(vr * vs, 1e-8)), -1, 1)
    if ok[1, y, x]:
        np.testing.assert_allclose(got[1, y, x], want, atol=1e-3)
