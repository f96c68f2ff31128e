"""Real-sensor regression gates on the reference's bundled photographs.

VERDICT r4 #4: everything quality-graded ran on rendered value-noise
scenes; the reference ships two real ~12 MP captures
(docs/images/kitchen_input.JPG, room_input.JPG) with real noise, JPEG
artifacts, and natural texture statistics. These tests pin measured
floors on one of them (full ours-vs-OpenCV tables: docs/real_photos.md,
scripts/real_photo_eval.py). Skipped when the reference checkout is
absent."""

import os

import numpy as np
import pytest

KITCHEN = "/root/reference/docs/images/kitchen_input.JPG"

pytestmark = pytest.mark.skipif(
    not os.path.exists(KITCHEN),
    reason="reference sample photographs not available",
)


@pytest.fixture(scope="module")
def kitchen_gray():
    from scripts.real_photo_eval import load_gray

    return load_gray(KITCHEN)  # 640x480 working resolution


@pytest.fixture(scope="module")
def kitchen_feats(kitchen_gray):
    from scripts.real_photo_eval import _ours_extract

    return _ours_extract(kitchen_gray)


def test_keypoint_count_floor_on_real_photo(kitchen_feats):
    """Measured 323 keypoints at the pipeline's settings (2026-08-21);
    the floor guards against silent detector regressions on real texture
    (rendered scenes would not catch a threshold-semantics drift that
    only real high-frequency content exposes)."""
    _, xy = kitchen_feats
    assert len(xy) >= 250, f"keypoint count collapsed: {len(xy)}"


def test_repeatability_floor_on_real_photo(kitchen_gray):
    """Rotation-15deg repeatability measured 0.756 on real sensor data
    (OpenCV SIFT: 0.708 on the same protocol). Floor at 0.65."""
    from scripts.real_photo_eval import (
        _ours_extract, _repeatability, _warp_image, _warps,
    )

    H = _warps(kitchen_gray.shape)["rot15"]
    warped = _warp_image(kitchen_gray, H)
    _, xy_a = _ours_extract(kitchen_gray)
    _, xy_b = _ours_extract(warped)
    rep, n = _repeatability(xy_a, xy_b, H, kitchen_gray.shape)
    assert n >= 200
    assert rep >= 0.65, f"repeatability {rep:.3f} under 15deg rotation"


def test_match_precision_floor_on_real_photo(kitchen_gray):
    """Crop-pair precision (exact-translation ground truth) measured
    0.950 with 120 verified matches (OpenCV: 0.972/353). Floors at
    0.85 / 60."""
    from scripts.real_photo_eval import eval_crop_precision

    (prec, n), _cv = eval_crop_precision(kitchen_gray)
    assert n >= 60, f"too few verified matches on real texture: {n}"
    assert prec >= 0.85, f"match precision {prec:.3f}"


def test_clahe_increases_yield_on_real_luminance(kitchen_gray):
    """CLAHE on real (unevenly lit) luminance must increase keypoint
    yield, as it does for the reference frontend (measured: 323 vs 243
    ours, 869 vs 616 OpenCV)."""
    from scripts.real_photo_eval import _ours_extract

    _, with_clahe = _ours_extract(kitchen_gray, clahe=True)
    _, without = _ours_extract(kitchen_gray, clahe=False)
    assert len(with_clahe) > len(without)
