"""Quality gates for the bundled synthetic-pretrained neural checkpoints.

These tests run only when recon3d_tpu/neural/pretrained/*.npz exist
(produced by `python -m recon3d_tpu.neural.pretrain [--model lightglue]`,
committed to the repo so the neural path works with zero downloads — the
reference requires fetching published torch checkpoints,
neural_matcher.py:47-66). Both matcher backends are gated: "nn" (mutual-NN
on SuperPoint descriptors, higher recall) and "lightglue" (attention
matcher, higher precision).
"""

import os

import numpy as np
import pytest

import recon3d_tpu.neural as neural_pkg
from recon3d_tpu.config import NeuralConfig
from recon3d_tpu.neural.synthetic import (
    render_shapes,
    random_homography,
    warp_image,
    warp_points,
)

PRETRAINED = os.path.join(os.path.dirname(neural_pkg.__file__), "pretrained")
BUNDLED_SP = os.path.join(PRETRAINED, "superpoint_synthetic.npz")
BUNDLED_LG = os.path.join(PRETRAINED, "lightglue_synthetic.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(BUNDLED_SP), reason="bundled checkpoint not built yet"
)

MATCHERS = ["nn"] + (["lightglue"] if os.path.exists(BUNDLED_LG) else [])
# recall floor per matcher: NN is the high-recall path; the synthetic
# LightGlue is precision-calibrated and keeps fewer matches
MIN_MATCHES = {"nn": 10, "lightglue": 5}


def make_matcher(kind):
    from recon3d_tpu.neural.matcher import NeuralMatcher

    return NeuralMatcher(NeuralConfig(max_keypoints=512, matcher=kind))


def test_auto_matcher_selection():
    """auto resolves to nn without EXPLICIT lightglue weights: the bundled
    synthetic LightGlue under-recalls its own NN fallback on photographic
    texture (46-vs-79; the r4 view-pair retrain regressed to 26 —
    docs/neural_quality.md), so it must never silently replace the
    stronger backend. Explicit weights (published-checkpoint conversions)
    re-enable the attention matcher."""
    from recon3d_tpu.neural.matcher import NeuralMatcher

    m = NeuralMatcher(NeuralConfig())
    assert m.matcher_kind == "nn"
    if os.path.exists(BUNDLED_LG):
        m2 = NeuralMatcher(NeuralConfig(lightglue_weights=BUNDLED_LG))
        assert m2.matcher_kind == "lightglue"


def test_detector_finds_synthetic_corners():
    """Detected keypoints should lie near ground-truth corners (the corpus
    is the training distribution, so this is a sanity floor, not a
    generalization claim)."""
    matcher = make_matcher("nn")
    hits, total = 0, 0
    for seed in (11, 12, 13):
        img, corners = render_shapes(np.random.default_rng(seed), (128, 128))
        if len(corners) < 4:
            continue
        f = matcher.extract(img.astype(np.float32))
        xy = np.asarray(f.xy)[np.asarray(f.valid)]
        if len(xy) == 0:
            continue
        for c in corners:
            d = np.hypot(xy[:, 0] - c[0], xy[:, 1] - c[1]).min()
            total += 1
            hits += d <= 4.0
    assert total >= 10
    assert hits / total > 0.5, f"{hits}/{total} corners detected within 4px"


@pytest.mark.parametrize("kind", MATCHERS)
def test_matching_respects_homography(kind):
    """Matches on a warped pair follow the true homography."""
    matcher = make_matcher(kind)
    img, _ = render_shapes(np.random.default_rng(21), (128, 128))
    H = random_homography(
        np.random.default_rng(22), (128, 128),
        max_rot=0.25, max_scale=0.15, max_shift=0.08,
    )
    imgb = warp_image(img, H)
    fa = matcher.extract(img.astype(np.float32))
    fb = matcher.extract(imgb.astype(np.float32))
    res = matcher.match(fa, fb, hw=(128, 128))
    mask = np.asarray(res.mask)
    assert mask.sum() >= MIN_MATCHES[kind], int(mask.sum())
    xya = np.asarray(fa.xy)[mask]
    xyb = np.asarray(fb.xy)[np.asarray(res.idx2)[mask]]
    err = np.hypot(*(warp_points(H, xya) - xyb).T)
    # Most matches should be pixel-accurate correspondences.
    assert np.median(err) < 3.0, np.median(err)
    assert (err < 4.0).mean() > 0.6, (err < 4.0).mean()


@pytest.mark.parametrize("kind", MATCHERS)
def test_neural_sfm_end_to_end(kind):
    """Full neural SfM on an out-of-distribution ray-traced scene: the
    bundled synthetic-shapes checkpoints must register every camera
    (reference flagship path run_reconstruction.py --neural, which cannot
    run at all without downloaded torch checkpoints)."""
    import dataclasses

    from tests.render import render_views
    from recon3d_tpu import Camera
    from recon3d_tpu.sfm.pipeline import SfMPipeline
    from recon3d_tpu.config import ReconstructionConfig
    from recon3d_tpu.io.dataset import image_set_from_arrays

    scene = render_views(n_views=5, image_size=(128, 160))
    cam = Camera.from_matrix(scene["K"])
    iset = image_set_from_arrays(scene["images"], cam)
    cfg = ReconstructionConfig()
    cfg = cfg.replace(
        neural=dataclasses.replace(
            cfg.neural, max_keypoints=512, detection_threshold=2e-4,
            matcher=kind,
        ),
        match=dataclasses.replace(
            cfg.match, min_matches=12, ransac_hypotheses=512
        ),
        sfm=dataclasses.replace(
            cfg.sfm, pnp_hypotheses=512, min_matches_init=30
        ),
    )
    pipe = SfMPipeline(neural_mode=True, config=cfg)
    pts, cols, poses = pipe.reconstruct(image_set=iset)
    assert len(poses) == 5, len(poses)
    assert len(pts) > 50, len(pts)
    assert pipe._mean_reproj_error() < 3.0


def test_match_pair_geometric_yields_inliers():
    """The SfM-facing contract: enough F-RANSAC inliers on a warped pair
    (a homography is degenerate for F, but inliers must still be found on
    the epipolar-consistent correspondences)."""
    import jax

    matcher = make_matcher(MATCHERS[-1])
    img, _ = render_shapes(np.random.default_rng(31), (128, 128))
    H = random_homography(
        np.random.default_rng(32), (128, 128),
        max_rot=0.2, max_scale=0.1, max_shift=0.06,
    )
    imgb = warp_image(img, H)
    fa = matcher.extract(img.astype(np.float32))
    fb = matcher.extract(imgb.astype(np.float32))
    m, F, n_inl = matcher.match_pair_geometric(
        fa, fb, jax.random.PRNGKey(0), min_matches=5
    )
    assert n_inl >= 5, n_inl
