"""Image kernel tests: blur/sobel/sampling/undistort/CLAHE vs OpenCV."""

import numpy as np
import jax.numpy as jnp
import pytest

from recon3d_tpu.ops.image import (
    rgb_to_gray,
    gaussian_blur,
    bilinear_sample,
    distort_points,
    undistort_points,
    undistort_image,
    box_filter,
    sobel,
    resize,
)
from recon3d_tpu.ops.clahe import clahe


def _rand_img(rng, h=64, w=80):
    return rng.random((h, w)).astype(np.float32)


def test_gaussian_blur_vs_opencv(rng):
    cv2 = pytest.importorskip("cv2")
    img = _rand_img(rng)
    ours = np.asarray(gaussian_blur(jnp.asarray(img), 1.6))
    r = int(np.ceil(3 * 1.6))
    ref = cv2.GaussianBlur(img, (2 * r + 1, 2 * r + 1), 1.6, borderType=cv2.BORDER_REPLICATE)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_sobel_vs_opencv(rng):
    cv2 = pytest.importorskip("cv2")
    img = _rand_img(rng)
    gx, gy = sobel(jnp.asarray(img))
    ref_gx = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=3, borderType=cv2.BORDER_REPLICATE)
    ref_gy = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=3, borderType=cv2.BORDER_REPLICATE)
    # interior only (border conventions differ subtly)
    np.testing.assert_allclose(np.asarray(gx)[1:-1, 1:-1], ref_gx[1:-1, 1:-1], atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy)[1:-1, 1:-1], ref_gy[1:-1, 1:-1], atol=1e-4)


def test_bilinear_sample_identity_and_mask(rng):
    img = _rand_img(rng, 32, 32)
    ys, xs = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    coords = jnp.asarray(np.stack([xs, ys], -1), jnp.float32)
    out, valid = bilinear_sample(jnp.asarray(img), coords)
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)
    assert bool(valid.all())
    # out-of-bounds -> invalid + fill
    out2, valid2 = bilinear_sample(jnp.asarray(img), jnp.asarray([[100.0, 5.0], [-3.0, 2.0]]))
    assert not bool(valid2.any())
    np.testing.assert_allclose(np.asarray(out2), 0.0)


def test_bilinear_sample_vs_grid_sample_values(rng):
    img = _rand_img(rng, 40, 50)
    pts = rng.uniform([0, 0], [49, 39], size=(200, 2)).astype(np.float32)
    out, valid = bilinear_sample(jnp.asarray(img), jnp.asarray(pts))
    # manual bilinear reference
    x, y = pts[:, 0], pts[:, 1]
    x0, y0 = np.floor(x).astype(int), np.floor(y).astype(int)
    fx, fy = x - x0, y - y0
    x1, y1 = np.minimum(x0 + 1, 49), np.minimum(y0 + 1, 39)
    ref = (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x1] * fx * (1 - fy)
        + img[y1, x0] * (1 - fx) * fy
        + img[y1, x1] * fx * fy
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_distort_undistort_roundtrip(rng):
    dist = jnp.asarray([0.12, -0.4, 0.006, 0.003, 0.0], jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, size=(100, 2)), jnp.float32)
    d = distort_points(pts, dist)
    u = undistort_points(d, dist, iterations=20)
    np.testing.assert_allclose(np.asarray(u), np.asarray(pts), atol=1e-5)


def test_undistort_image_vs_opencv(rng):
    cv2 = pytest.importorskip("cv2")
    # Smooth image: isolates map correctness from OpenCV's fixed-point
    # interpolation of high-frequency content.
    ys, xs = np.meshgrid(np.arange(120), np.arange(160), indexing="ij")
    img = (0.5 + 0.3 * np.sin(xs / 9.0) * np.cos(ys / 7.0)).astype(np.float32)
    K = np.array([[150.0, 0, 80], [0, 150.0, 60], [0, 0, 1]], np.float32)
    dist = np.array([0.1, -0.2, 0.001, 0.002, 0.0], np.float32)
    ours = np.asarray(undistort_image(jnp.asarray(img), jnp.asarray(K), jnp.asarray(dist)))
    ref = cv2.undistort(img, K, dist)
    # compare interior (border extrapolation differs)
    diff = np.abs(ours[10:-10, 10:-10] - ref[10:-10, 10:-10])
    assert np.quantile(diff, 0.99) < 5e-3


def test_box_filter_matches_conv(rng):
    cv2 = pytest.importorskip("cv2")
    img = _rand_img(rng, 33, 47)
    ours = np.asarray(box_filter(jnp.asarray(img), 5))
    ref = cv2.blur(img, (5, 5), borderType=cv2.BORDER_ISOLATED)
    # cv2 BORDER_ISOLATED zero-pads but divides by full window; our version
    # divides by true count. Compare interior where they agree.
    np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2], atol=1e-5)


def test_clahe_improves_contrast_and_matches_range(rng):
    img = (0.4 + 0.05 * rng.random((128, 128))).astype(np.float32)  # low contrast
    out = np.asarray(clahe(jnp.asarray(img), clip_limit=2.0, grid=8))
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert out.std() > img.std() * 2  # contrast expanded


def test_clahe_vs_opencv(rng):
    cv2 = pytest.importorskip("cv2")
    img8 = (rng.random((128, 128)) * 255).astype(np.uint8)
    ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(img8) / 255.0
    ours = np.asarray(clahe(jnp.asarray(img8 / 255.0, jnp.float32), 2.0, 8))
    # Same algorithm family; implementations differ in interpolation details.
    corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert corr > 0.98


def test_rgb_gray_and_resize(rng):
    img = rng.random((40, 60, 3)).astype(np.float32)
    g = rgb_to_gray(jnp.asarray(img))
    assert g.shape == (40, 60)
    r = resize(jnp.asarray(img), (20, 30))
    assert r.shape == (20, 30, 3)


def test_bilinear_sample_mxu_matches_gather(rng):
    """The MXU tent-matmul sampler is value-identical to the gather
    formulation, including edge clipping, out-of-range masking, and
    non-finite coordinates."""
    from recon3d_tpu.ops.image import bilinear_sample, bilinear_sample_mxu

    img = jnp.asarray(rng.random((37, 53)).astype(np.float32))
    coords = (rng.random((5, 64, 2)) * np.array([60.0, 45.0]) - 4.0).astype(
        np.float32
    )
    coords[0, 0] = (np.nan, 3.0)
    coords[0, 1] = (np.inf, 3.0)
    coords[0, 2] = (52.0, 36.0)  # exact corner
    a, va = bilinear_sample(img, jnp.asarray(coords))
    b, vb = bilinear_sample_mxu(img, jnp.asarray(coords))
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bilinear_sample_pallas_matches_gather(rng):
    """The Pallas tent-warp kernel (interpret mode on CPU) is
    value-identical to the gather formulation."""
    from recon3d_tpu.ops.image import bilinear_sample
    from recon3d_tpu.ops.warp_pallas import bilinear_sample_pallas

    img = jnp.asarray(rng.random((37, 53)).astype(np.float32))
    coords = (rng.random((5, 64, 2)) * np.array([60.0, 45.0]) - 4.0).astype(
        np.float32
    )
    coords[0, 0] = (np.nan, 3.0)
    coords[0, 1] = (np.inf, 3.0)
    coords[0, 2] = (52.0, 36.0)
    a, va = bilinear_sample(img, jnp.asarray(coords))
    b, vb = bilinear_sample_pallas(img, jnp.asarray(coords), interpret=True)
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bilinear_sample_pallas_exact_on_large_coord_set(rng):
    """The f32 tent-warp kernel stays exact on a large coordinate set
    (multiple grid tiles, padding slots exercised)."""
    from recon3d_tpu.ops.image import bilinear_sample
    from recon3d_tpu.ops.warp_pallas import bilinear_sample_pallas

    img = jnp.asarray(rng.random((48, 64)).astype(np.float32))
    coords = (rng.random((4096, 2)) * np.array([63.0, 47.0])).astype(
        np.float32
    )
    a, va = bilinear_sample(img, jnp.asarray(coords))
    b, vb = bilinear_sample_pallas(img, jnp.asarray(coords), interpret=True)
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
