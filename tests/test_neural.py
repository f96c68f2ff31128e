"""SuperPoint / LightGlue / NeuralMatcher tests (architecture mechanics —
published weights are not downloadable in this environment, so quality
assertions are structural, not semantic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recon3d_tpu.config import NeuralConfig
from recon3d_tpu.neural.lightglue import (
    LightGlueNet,
    extract_matches,
    normalize_keypoints,
)
from recon3d_tpu.neural.matcher import NeuralMatcher
from recon3d_tpu.neural.superpoint import (
    SuperPointNet,
    detect_keypoints,
    scores_from_logits,
    simple_nms,
)


def test_superpoint_shapes():
    model = SuperPointNet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 1)))
    logits, desc = model.apply(params, jnp.ones((1, 64, 96, 1)) * 0.5)
    assert logits.shape == (1, 8, 12, 65)
    assert desc.shape == (1, 8, 12, 256)
    # descriptors are unit-norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(desc), axis=-1), 1.0, atol=1e-5
    )
    scores = scores_from_logits(logits)
    assert scores.shape == (1, 64, 96)
    assert (np.asarray(scores) >= 0).all() and (np.asarray(scores) <= 1).all()


def test_simple_nms_keeps_peaks():
    s = np.zeros((1, 32, 32), np.float32)
    s[0, 10, 10] = 1.0
    s[0, 11, 11] = 0.5   # suppressed by the stronger neighbor
    s[0, 25, 25] = 0.8
    out = np.asarray(simple_nms(jnp.asarray(s), radius=4))
    assert out[0, 10, 10] == 1.0 and out[0, 25, 25] == 0.8
    assert out[0, 11, 11] == 0.0


def test_detect_keypoints_topk_and_desc():
    rng = np.random.default_rng(0)
    H, W = 64, 96
    scores = rng.random((H, W)).astype(np.float32) * 0.01
    scores[20, 30] = 0.9
    scores[40, 70] = 0.8
    desc = rng.normal(size=(H // 8, W // 8, 64)).astype(np.float32)
    f = detect_keypoints(
        jnp.asarray(scores), jnp.asarray(desc),
        max_keypoints=16, detection_threshold=0.05,
    )
    xy = np.asarray(f.xy)
    assert f.xy.shape == (16, 2)
    assert np.asarray(f.valid).sum() == 2  # only the two strong peaks
    # Peaks land on the right pixels; subpixel quadratic refinement may
    # shift by <0.5 px toward the stronger random neighbor.
    np.testing.assert_allclose(xy[0], [30, 20], atol=0.5)
    np.testing.assert_allclose(xy[1], [70, 40], atol=0.5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(f.desc), axis=-1), 1.0, atol=1e-5
    )


def test_detect_keypoints_subpixel_recovers_offgrid_peak():
    """A Gaussian peak centered off-grid is localized to <0.2 px."""
    H, W = 64, 96
    cx, cy = 30.3, 20.2
    ys, xs = np.mgrid[0:H, 0:W]
    scores = 0.9 * np.exp(
        -((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * 1.2**2)
    ).astype(np.float32)
    desc = np.ones((H // 8, W // 8, 64), np.float32)
    f = detect_keypoints(
        jnp.asarray(scores), jnp.asarray(desc),
        max_keypoints=4, detection_threshold=0.05,
    )
    xy = np.asarray(f.xy)[np.asarray(f.valid)]
    assert len(xy) >= 1
    np.testing.assert_allclose(xy[0], [cx, cy], atol=0.2)


def test_extract_matches_mutual_argmax():
    # crafted assignment: 0<->1, 1<->0 mutual; 2 one-sided
    log_assign = jnp.log(
        jnp.asarray(
            [[0.05, 0.90, 0.01],
             [0.80, 0.05, 0.01],
             [0.70, 0.05, 0.02]]  # row 2 argmax col 0, but col 0 prefers row 1
        )
    )
    v = jnp.ones(3, bool)
    m = extract_matches(log_assign, v, v, threshold=0.1)
    idx2 = np.asarray(m.idx2)
    assert idx2[0] == 1 and idx2[1] == 0
    assert idx2[2] == -1  # not mutual
    # invalid keypoints never match
    m2 = extract_matches(log_assign, jnp.asarray([True, False, True]), v)
    assert np.asarray(m2.idx2)[1] == -1


def test_normalize_keypoints_range():
    xy = jnp.asarray([[0.0, 0.0], [640.0, 480.0], [320.0, 240.0]])
    n = np.asarray(normalize_keypoints(xy, (480, 640)))
    np.testing.assert_allclose(n[2], [0.0, 0.0], atol=1e-6)
    assert np.abs(n).max() <= 1.0 + 1e-6


def test_lightglue_forward_shapes():
    k, d = 32, 64
    net = LightGlueNet(dim=d, num_layers=2)
    key = jax.random.PRNGKey(0)
    desc0 = jax.random.normal(key, (k, d))
    desc1 = jax.random.normal(jax.random.PRNGKey(1), (k, d))
    xy = jax.random.uniform(key, (k, 2), minval=-1, maxval=1)
    valid = jnp.ones(k, bool)
    params = net.init(key, desc0, desc1, xy, xy, valid, valid)
    log_assign, m0, m1 = net.apply(params, desc0, desc1, xy, xy, valid, valid)
    assert log_assign.shape == (k, k)
    assert np.isfinite(np.asarray(log_assign)).all()


def test_neural_matcher_contract():
    """extract + match_pair_geometric obey the frontend contract that
    SfMPipeline relies on (same as classical FeatureMatcher)."""
    cfg = NeuralConfig(max_keypoints=128, lightglue_layers=2, descriptor_dim=64)
    nm = NeuralMatcher(cfg)
    rng = np.random.default_rng(0)
    img = rng.random((96, 128)).astype(np.float32)
    f1 = nm.extract(img)
    f2 = nm.extract(np.roll(img, 3, axis=1))
    assert f1.xy.shape == (128, 2) and f1.desc.shape == (128, 64)
    m, F, n_inl = nm.match_pair_geometric(
        f1, f2, jax.random.PRNGKey(0), min_matches=1_000_000
    )
    # with impossible min_matches, the pair must be rejected cleanly
    assert n_inl == 0 and not np.asarray(m.mask).any()
    assert F.shape == (3, 3)


def test_torch_weight_conversion_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from recon3d_tpu.neural.weights import load_superpoint_torch

    model = SuperPointNet()
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))

    # synthesize a torch state dict with the public layer names/shapes
    sd = {}
    chans = {
        "conv1a": (64, 1), "conv1b": (64, 64),
        "conv2a": (64, 64), "conv2b": (64, 64),
        "conv3a": (128, 64), "conv3b": (128, 128),
        "conv4a": (128, 128), "conv4b": (128, 128),
        "convPa": (256, 128), "convDa": (256, 128),
    }
    gen = torch.Generator().manual_seed(0)
    for name, (o, i) in chans.items():
        sd[f"{name}.weight"] = torch.randn(o, i, 3, 3, generator=gen)
        sd[f"{name}.bias"] = torch.randn(o, generator=gen)
    sd["convPb.weight"] = torch.randn(65, 256, 1, 1, generator=gen)
    sd["convPb.bias"] = torch.randn(65, generator=gen)
    sd["convDb.weight"] = torch.randn(256, 256, 1, 1, generator=gen)
    sd["convDb.bias"] = torch.randn(256, generator=gen)
    path = tmp_path / "sp.pth"
    torch.save(sd, path)

    params = load_superpoint_torch(str(path), template)
    # converted tree must run through the model
    logits, desc = model.apply(params, jnp.ones((1, 64, 64, 1)))
    assert logits.shape == (1, 8, 8, 65)
    # and actually contain the torch values (not the random template)
    w = np.asarray(params["params"]["conv1a"]["kernel"])
    np.testing.assert_allclose(
        w, sd["conv1a.weight"].numpy().transpose(2, 3, 1, 0), atol=1e-6
    )


def test_neural_batched_pair_matching():
    """match_pairs_batched returns the standard contract over pair chunks."""
    cfg = NeuralConfig(max_keypoints=64, lightglue_layers=2, descriptor_dim=64)
    nm = NeuralMatcher(cfg)
    rng = np.random.default_rng(0)
    feats = [nm.extract(rng.random((64, 96)).astype(np.float32))
             for _ in range(3)]
    pairs = [(0, 1), (0, 2), (1, 2)]
    out = nm.match_pairs_batched(feats, pairs, jax.random.PRNGKey(0),
                                 chunk=2, hw=(64, 96))
    assert len(out) == 3
    for (i, j, idx1, idx2, F, n_inl, n_raw) in out:
        assert (i, j) in pairs and F.shape == (3, 3)
        assert len(idx1) == len(idx2) == n_inl or n_inl >= len(idx1) - 1
        if len(idx1):
            assert idx1.max() < 64 and idx2.max() < 64


def test_explicit_lightglue_with_incompatible_config_raises():
    """matcher='lightglue' whose config cannot load any weights must refuse
    instead of silently matching with a random-init network (ADVICE r1)."""
    cfg = NeuralConfig(
        max_keypoints=64, lightglue_layers=2, descriptor_dim=64,
        matcher="lightglue",
    )
    nm = NeuralMatcher(cfg)
    img = np.random.default_rng(0).random((96, 128)).astype(np.float32)
    with pytest.raises(RuntimeError, match="lightglue"):
        nm.extract(img)
