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


def test_calibrated_k_rescaled_to_working_resolution(tmp_path):
    """Provided intrinsics must be rescaled by the resize factor actually
    applied at load (regression: the factor was computed from the
    already-resized array, silently staying 1.0 — original-resolution K
    applied to downscaled images corrupts every dense-stage projection)."""
    from PIL import Image

    from recon3d_tpu.camera import Camera
    from recon3d_tpu.io.dataset import load_image_set

    rng = np.random.default_rng(1)
    d = tmp_path / "big_imgs"
    d.mkdir()
    for i in range(2):
        Image.fromarray(
            (rng.random((200, 400, 3)) * 255).astype(np.uint8)
        ).save(d / f"im_{i}.png")
    cam = Camera.create(fx=500.0, fy=510.0, cx=200.0, cy=100.0)
    iset = load_image_set(str(d), camera=cam, max_size=100)  # scale 0.25
    K = np.asarray(iset.camera.K)
    np.testing.assert_allclose(
        [K[0, 0], K[1, 1], K[0, 2], K[1, 2]],
        [125.0, 127.5, 50.0, 25.0], rtol=1e-6,
    )
    assert abs(iset.scale - 0.25) < 1e-9
    assert iset.color.shape[1:3] == (
        np.ceil(50 / 16) * 16, np.ceil(100 / 16) * 16)


def test_exif_focal_initialization(tmp_path):
    """JPEGs carrying FocalLengthIn35mmFilm initialize K from EXIF instead
    of the 1.2*maxdim guess; images without EXIF keep the fallback."""
    from PIL import Image

    from recon3d_tpu.io.dataset import load_image_set

    rng = np.random.default_rng(0)
    d = tmp_path / "exif_imgs"
    d.mkdir()
    e = Image.Exif()
    e[41989] = 50  # 50mm (35mm-equivalent)
    for i in range(2):
        img = Image.fromarray(
            (rng.random((96, 144, 3)) * 255).astype(np.uint8))
        img.save(d / f"im_{i}.jpg", exif=e)
    iset = load_image_set(str(d))
    f = float(np.asarray(iset.camera.K)[0, 0])
    assert abs(f - 50.0 * 144 / 36.0) < 1e-3  # 200 px

    d2 = tmp_path / "plain_imgs"
    d2.mkdir()
    for i in range(2):
        Image.fromarray(
            (rng.random((96, 144, 3)) * 255).astype(np.uint8)
        ).save(d2 / f"im_{i}.png")
    iset2 = load_image_set(str(d2))
    f2 = float(np.asarray(iset2.camera.K)[0, 0])
    assert abs(f2 - 1.2 * 144) < 1e-3


def test_imageset_small_color_cache(rng):
    """ImageSet.small_color: matches resize_batch_np, caches per scale, and
    the dense backends' host_small fast path consumes it (the load-time
    prescale that keeps host prep out of the post-device slowdown window,
    cli.py prescale hints)."""
    from recon3d_tpu.camera import Camera
    from recon3d_tpu.io.dataset import ImageSet

    color = rng.random((4, 48, 64, 3)).astype(np.float32)
    iset = ImageSet(
        gray=rgb_to_gray_np(color),
        color=color,
        camera=Camera.create(60.0, 60.0, 32.0, 24.0),
        names=[f"im{i}" for i in range(4)],
        sizes=np.tile([48, 64], (4, 1)),
    )
    s = iset.small_color(0.25)
    np.testing.assert_allclose(s, resize_batch_np(color, (12, 16)), atol=1e-6)
    assert iset.small_color(0.25) is s  # cached, not recomputed
    assert round(0.25, 6) in iset.prescaled
