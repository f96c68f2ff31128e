"""SIFT + matcher tests: properties, OpenCV repeatability, invariances.

Parity with OpenCV is statistical (keypoint repeatability, match quality),
not bit-exact — SIFT implementations legitimately differ (SURVEY.md §7).
"""

import functools

import numpy as np
import jax.numpy as jnp
import pytest

from recon3d_tpu.ops.sift import extract_sift
from recon3d_tpu.ops.match import match_descriptors, gather_matched_points

H, W = 160, 192
MAXF = 512


def _texture(seed=0, h=H, w=W):
    rng = np.random.default_rng(seed)
    img = rng.random((h, w)).astype(np.float32)
    try:
        import cv2

        img = cv2.GaussianBlur(img, (0, 0), 2.0)
    except ImportError:
        from scipy.ndimage import gaussian_filter

        img = gaussian_filter(img, 2.0)
    return (img - img.min()) / (img.max() - img.min())


@functools.lru_cache(maxsize=8)
def _extract_cached(seed):
    f = extract_sift(jnp.asarray(_texture(seed)), max_features=MAXF)
    return f


def test_sift_basic_properties():
    f = _extract_cached(0)
    v = np.asarray(f.valid)
    assert v.sum() > 100
    xy = np.asarray(f.xy)[v]
    assert xy[:, 0].min() >= 0 and xy[:, 0].max() < W
    assert xy[:, 1].min() >= 0 and xy[:, 1].max() < H
    norms = np.linalg.norm(np.asarray(f.desc)[v], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    assert np.asarray(f.scale)[v].min() >= 1.0
    # sorted by response among valid
    resp = np.asarray(f.response)[v]
    assert (np.diff(resp) <= 1e-6).all()


def test_sift_repeatability_vs_opencv():
    cv2 = pytest.importorskip("cv2")
    from scipy.spatial import cKDTree

    img = _texture(0)
    f = _extract_cached(0)
    v = np.asarray(f.valid)
    xy = np.asarray(f.xy)[v]

    sift = cv2.SIFT_create(nfeatures=MAXF, contrastThreshold=0.03, edgeThreshold=15, sigma=1.6)
    kps = sift.detect((img * 255).astype(np.uint8), None)
    cvxy = np.array([k.pt for k in kps])
    d, _ = cKDTree(cvxy).query(xy)
    assert (d < 2.0).mean() > 0.5
    d2, _ = cKDTree(xy).query(cvxy)
    assert (d2 < 2.0).mean() > 0.5


def test_sift_shift_invariance():
    """Keypoints of a shifted image are the originals, shifted."""
    from scipy.spatial import cKDTree

    img = _texture(3)
    dy, dx = 0, 16
    shifted = np.roll(img, (dy, dx), axis=(0, 1))
    f1 = extract_sift(jnp.asarray(img), max_features=MAXF)
    f2 = extract_sift(jnp.asarray(shifted), max_features=MAXF)
    xy1 = np.asarray(f1.xy)[np.asarray(f1.valid)]
    xy2 = np.asarray(f2.xy)[np.asarray(f2.valid)]
    # interior points only (roll wraps at borders)
    keep = (xy1[:, 0] < W - dx - 20) & (xy1[:, 0] > 20) & (xy1[:, 1] > 20) & (xy1[:, 1] < H - 20)
    pred = xy1[keep] + np.array([dx, dy])
    d, _ = cKDTree(xy2).query(pred)
    assert (d < 1.0).mean() > 0.8


def test_descriptor_matching_under_rotation():
    cv2 = pytest.importorskip("cv2")
    img = _texture(1)
    ang = 30.0
    M = cv2.getRotationMatrix2D((W / 2, H / 2), ang, 1.0)
    rot = cv2.warpAffine(img, M, (W, H))

    f1 = extract_sift(jnp.asarray(img), max_features=MAXF)
    f2 = extract_sift(jnp.asarray(rot), max_features=MAXF)
    m = match_descriptors(f1.desc, f2.desc, f1.valid, f2.valid, ratio=0.8)
    x1, x2 = gather_matched_points(f1.xy, f2.xy, m)
    mask = np.asarray(m.mask)
    assert mask.sum() > 40

    # ground-truth mapping of matched points
    x1n = np.asarray(x1)[mask]
    x2n = np.asarray(x2)[mask]
    x1h = np.concatenate([x1n, np.ones((len(x1n), 1))], axis=1)
    pred = x1h @ M.T
    err = np.linalg.norm(pred - x2n, axis=1)
    assert (err < 3.0).mean() > 0.7  # most matches geometrically correct


def test_multi_orientation_secondary_keypoints():
    """multi_orientation=True emits extra keypoints at secondary peaks:
    same location as a primary keypoint, angle from a different histogram
    bin (OpenCV behavior, reference features.py:52)."""
    from scipy.spatial import cKDTree

    img = _texture(2)
    f0 = extract_sift(jnp.asarray(img), max_features=MAXF)
    f1 = extract_sift(jnp.asarray(img), max_features=MAXF,
                      multi_orientation=True)
    assert len(np.asarray(f1.valid)) > len(np.asarray(f0.valid))
    n0 = int(np.asarray(f0.valid).sum())
    n1 = int(np.asarray(f1.valid).sum())
    assert n1 > n0  # some secondary peaks must fire on noise texture

    # every extra keypoint coincides with a primary one but differs in angle
    v1 = np.asarray(f1.valid)
    xy1 = np.asarray(f1.xy)[v1]
    ang1 = np.asarray(f1.angle)[v1]
    tree = cKDTree(xy1)
    dup_pairs = tree.query_pairs(1e-3, output_type="ndarray")
    assert len(dup_pairs) >= (n1 - n0) * 0.8
    if len(dup_pairs):
        dang = np.abs(ang1[dup_pairs[:, 0]] - ang1[dup_pairs[:, 1]])
        dang = np.minimum(dang, 2 * np.pi - dang)
        assert dang.min() > np.deg2rad(5.0)  # distinct orientation bins


def test_multi_orientation_rolled_pair():
    """On a 45-deg in-plane roll, multi-orientation matching must not lose
    correct matches vs single-orientation (it exists to stabilize pairs
    whose dominant-orientation vote flips between views)."""
    cv2 = pytest.importorskip("cv2")
    img = _texture(2)
    M = cv2.getRotationMatrix2D((W / 2, H / 2), 45.0, 1.0)
    rot = cv2.warpAffine(img, M, (W, H))
    counts = {}
    for mo in (False, True):
        f1 = extract_sift(jnp.asarray(img), max_features=MAXF,
                          multi_orientation=mo)
        f2 = extract_sift(jnp.asarray(rot), max_features=MAXF,
                          multi_orientation=mo)
        m = match_descriptors(f1.desc, f2.desc, f1.valid, f2.valid, ratio=0.8)
        x1, x2 = gather_matched_points(f1.xy, f2.xy, m)
        mask = np.asarray(m.mask)
        x1n = np.asarray(x1)[mask]
        x2n = np.asarray(x2)[mask]
        pred = np.concatenate([x1n, np.ones((len(x1n), 1))], 1) @ M.T
        counts[mo] = int((np.linalg.norm(pred - x2n, axis=1) < 3.0).sum())
    assert counts[True] >= counts[False] * 0.9
    assert counts[True] > 20


def test_match_descriptors_exact_and_ratio():
    rng = np.random.default_rng(0)
    d2 = rng.normal(size=(64, 128)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    perm = rng.permutation(64)
    d1 = d2[perm] + 0.01 * rng.normal(size=(64, 128)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    m = match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), jnp.ones(64), jnp.ones(64), ratio=0.9
    )
    mask = np.asarray(m.mask)
    assert mask.mean() > 0.95
    np.testing.assert_array_equal(np.asarray(m.idx2)[mask], perm[mask])

    # ambiguous descriptors (duplicated) must fail the ratio test
    d2_dup = np.concatenate([d2, d2], axis=0)
    m2 = match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2_dup), jnp.ones(64), jnp.ones(128), ratio=0.9
    )
    assert np.asarray(m2.mask).mean() < 0.1


def test_match_respects_validity():
    rng = np.random.default_rng(1)
    d = rng.normal(size=(32, 128)).astype(np.float32)
    valid2 = np.r_[np.ones(16), np.zeros(16)].astype(np.float32)
    m = match_descriptors(jnp.asarray(d), jnp.asarray(d), jnp.ones(32), jnp.asarray(valid2), ratio=1.0)
    idx2 = np.asarray(m.idx2)
    assert (idx2[np.asarray(m.mask)] < 16).all()


def test_two_phase_extract_matches_single_phase():
    """extract_batch's two-phase path (detect at worst-case capacity,
    describe at bucketed selection capacity) must produce exactly the
    single-phase extract()'s keypoints and descriptors — the selection
    keeps every valid candidate, only the dead padded slots shrink."""
    from tests.render import render_views
    from recon3d_tpu.features.frontend import FeatureExtractor

    scene = render_views(n_views=2, image_size=(240, 320), arc_step=0.1)
    gray = np.stack(
        [im.mean(-1) for im in scene["images"]]
    ).astype(np.float32)
    ex = FeatureExtractor()
    feats2 = ex.extract_batch(gray)
    xy2 = np.asarray(feats2.xy)
    v2 = np.asarray(feats2.valid)
    d2 = np.asarray(feats2.desc)
    u8 = np.clip(gray * 255.0, 0, 255).astype(np.uint8)
    for i in range(2):
        f1 = ex.extract(u8[i].astype(np.float32) / 255.0)
        xy1 = np.asarray(f1.xy)
        v1 = np.asarray(f1.valid)
        d1 = np.asarray(f1.desc)
        s1 = {tuple(np.round(p, 3)) for p in xy1[v1]}
        s2 = {tuple(np.round(p, 3)) for p in xy2[i][v2[i]]}
        assert s1 == s2, f"img {i}: {len(s1 ^ s2)} differing keypoints"
        m1 = {tuple(np.round(p, 3)): d for p, d in zip(xy1[v1], d1[v1])}
        m2 = {tuple(np.round(p, 3)): d
              for p, d in zip(xy2[i][v2[i]], d2[i][v2[i]])}
        for k in list(s1)[:64]:
            np.testing.assert_allclose(m1[k], m2[k], atol=1e-5)
