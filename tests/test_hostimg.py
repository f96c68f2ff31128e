"""Host-side image helpers must numerically match their device kernels:
the loader and dense backends prep on the host (transfer-minimal path) while
tests/kernels use the jitted ops — any drift would silently change results
between the two paths."""

import numpy as np
import jax.numpy as jnp

from recon3d_tpu.io.hostimg import resize_batch_np, rgb_to_gray_np
from recon3d_tpu.ops.image import resize, rgb_to_gray


def test_gray_matches_device(rng):
    img = rng.random((3, 24, 32, 3)).astype(np.float32)
    host = rgb_to_gray_np(img)
    dev = np.stack([np.asarray(rgb_to_gray(jnp.asarray(im))) for im in img])
    np.testing.assert_allclose(host, dev, atol=1e-6)


def test_resize_matches_device_downscale(rng):
    img = rng.random((2, 48, 64, 3)).astype(np.float32)
    host = resize_batch_np(img, (12, 16))
    dev = np.stack([np.asarray(resize(jnp.asarray(im), (12, 16))) for im in img])
    np.testing.assert_allclose(host, dev, atol=1e-5)


def test_resize_matches_device_upscale(rng):
    img = rng.random((2, 20, 30)).astype(np.float32)  # gray, no channel dim
    host = resize_batch_np(img, (40, 60))
    dev = np.stack([np.asarray(resize(jnp.asarray(im), (40, 60))) for im in img])
    np.testing.assert_allclose(host, dev, atol=1e-5)
    assert host.shape == (2, 40, 60)


def test_resize_non_integer_ratio(rng):
    img = rng.random((1, 33, 47, 3)).astype(np.float32)
    host = resize_batch_np(img, (14, 20))
    dev = np.asarray(resize(jnp.asarray(img[0]), (14, 20)))
    np.testing.assert_allclose(host[0], dev, atol=1e-5)
