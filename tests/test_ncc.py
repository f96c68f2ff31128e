"""Fused Pallas NCC kernel vs the XLA box-filter formulation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recon3d_tpu.ops.ncc import ncc_windowed_xla as _ncc_all
from recon3d_tpu.ops.ncc import ncc_windowed_fused


@pytest.mark.parametrize("patch", [5, 11])
def test_pallas_ncc_matches_xla(patch):
    rng = np.random.default_rng(0)
    H, W, J = 48, 64, 3
    ref = rng.random((H, W)).astype(np.float32)
    src = np.stack([ref + rng.normal(scale=s, size=(H, W)).astype(np.float32)
                    for s in (0.01, 0.2, 1.0)])
    ok = rng.random((J, H, W)) > 0.1

    want = np.asarray(_ncc_all(jnp.asarray(ref), jnp.asarray(src),
                               jnp.asarray(ok), patch))
    got = np.asarray(
        ncc_windowed_fused(
            jnp.asarray(ref), jnp.asarray(src), jnp.asarray(ok),
            patch=patch, interpret=True,  # CPU test env
        )
    )
    assert got.shape == (J, H, W)
    np.testing.assert_allclose(got, want, atol=2e-4)
    # correlated source scores higher than noise
    m = ok.all(0)
    assert np.median(got[0][m]) > np.median(got[2][m])
