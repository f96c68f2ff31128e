"""PLY reader/writer tests, incl. golden COLMAP files bundled with the reference."""

import os

import numpy as np
import pytest

from recon3d_tpu.io.ply import load_ply, save_ply, compute_scene_bounds

GOLDEN = {
    "squirrel": 7157,
    "kitchen": 10232,
    "room": 37830,
}


def test_ascii_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    cols = rng.integers(0, 256, size=(100, 3)).astype(np.uint8)
    p = tmp_path / "a.ply"
    save_ply(str(p), pts, cols)
    pts2, cols2 = load_ply(str(p))
    np.testing.assert_allclose(pts2, pts, atol=1e-5)
    np.testing.assert_array_equal(cols2, cols)


def test_binary_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    cols = rng.integers(0, 256, size=(1000, 3)).astype(np.uint8)
    p = tmp_path / "b.ply"
    save_ply(str(p), pts, cols, binary=True)
    pts2, cols2 = load_ply(str(p))
    np.testing.assert_array_equal(pts2, pts)
    np.testing.assert_array_equal(cols2, cols)


def test_nan_filtering(tmp_path):
    pts = np.array([[0, 0, 0], [np.nan, 1, 1], [2, 2, 2]], np.float32)
    p = tmp_path / "n.ply"
    save_ply(str(p), pts)
    pts2, _ = load_ply(str(p))
    assert pts2.shape[0] == 2


@pytest.mark.parametrize("scene,count", sorted(GOLDEN.items()))
def test_load_golden_colmap_ply(scene, count):
    path = f"/root/reference/data/samples/{scene}/colmap_reconstruction/sparse.ply"
    if not os.path.exists(path):
        pytest.skip("reference data not mounted")
    pts, cols = load_ply(path)
    assert pts.shape[0] <= count  # NaN rows may be dropped
    assert pts.shape[0] > 0.95 * count
    assert cols is not None and cols.shape == pts.shape
    mn, mx, center, diag = compute_scene_bounds(pts)
    assert diag > 0


def test_native_ply_fast_paths(tmp_path):
    """Native ASCII write/parse must agree with the numpy fallback exactly
    (modulo the 6-decimal format), and be active when the .so is present."""
    from recon3d_tpu.runtime.native import (
        native_available,
        native_ply_parse_ascii,
        native_ply_write_ascii,
    )
    from recon3d_tpu.io.ply import load_ply, save_ply

    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(1000, 3)) * 10).astype(np.float32)
    cols = rng.integers(0, 255, (1000, 3)).astype(np.uint8)
    p = str(tmp_path / "a.ply")
    save_ply(p, pts, cols)  # uses native when available
    rp, rc = load_ply(p)
    np.testing.assert_allclose(rp, pts, atol=1e-5)
    np.testing.assert_array_equal(rc, cols)

    if native_available():
        # direct write/parse roundtrip
        hdr = str(tmp_path / "b.ply")
        with open(hdr, "w") as f:
            f.write("")
        assert native_ply_write_ascii(hdr, pts, cols)
        out = native_ply_parse_ascii(hdr, 0, 1000, 6)
        assert out is not None
        np.testing.assert_allclose(out[:, :3], pts, atol=1e-5)
        np.testing.assert_array_equal(out[:, 3:].astype(np.uint8), cols)
