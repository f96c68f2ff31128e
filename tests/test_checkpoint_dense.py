"""Per-view dense depth-map checkpointing (VERDICT r1 #10): a killed MVS
run resumes from its finished views and reproduces the uncheckpointed run
exactly."""

import os

import numpy as np
import pytest

from recon3d_tpu.camera import Camera
from recon3d_tpu.config import PatchMatchConfig
from recon3d_tpu.dense.patchmatch import PatchMatchMVS
from recon3d_tpu.runtime.checkpoint import StageCheckpointer
from tests.render import render_views


@pytest.fixture(scope="module")
def scene():
    return render_views(n_views=5, image_size=(96, 128), arc_step=0.12)


def _mvs(scene):
    cam = Camera.from_matrix(scene["K"])
    cfg = PatchMatchConfig(
        scale=1.0, num_iterations=2, patch_size=7, min_views=3,
        voxel_size=0.01,
    )
    poses = {i: (scene["Rs"][i], scene["ts"][i]) for i in range(5)}
    return PatchMatchMVS(cam, cfg), poses


def test_depth_checkpoint_roundtrip(tmp_path):
    ck = StageCheckpointer(str(tmp_path))
    assert ck.load_depth(3) is None
    d = np.random.default_rng(0).random((16, 24)).astype(np.float32)
    c = (d > 0.5).astype(np.float32) * 4
    ck.save_depth(3, d, c)
    d2, c2 = ck.load_depth(3)
    np.testing.assert_array_equal(d, d2)
    np.testing.assert_array_equal(c, c2)


def test_mvs_kill_and_resume_reproduces_fresh_run(scene, tmp_path):
    rec, poses = _mvs(scene)

    # Ground truth: a fresh run with no checkpointing (pure device path).
    p_fresh, c_fresh = rec.reconstruct(scene["images"], poses)
    assert len(p_fresh) > 500

    # Run WITH checkpointing: same output, and all 5 views persisted.
    ck = StageCheckpointer(str(tmp_path / "ck"))
    p_ck, c_ck = rec.reconstruct(scene["images"], poses, checkpointer=ck)
    np.testing.assert_allclose(p_ck, p_fresh, atol=1e-5)
    np.testing.assert_array_equal(c_ck, c_fresh)
    for i in range(5):
        assert os.path.exists(ck.depth_path(i))

    # Simulate a crash that lost the last two views: resume must recompute
    # ONLY those and still reproduce the fresh run bit-for-bit.
    os.unlink(ck.depth_path(3))
    os.unlink(ck.depth_path(4))
    p_res, c_res = rec.reconstruct(scene["images"], poses, checkpointer=ck)
    np.testing.assert_allclose(p_res, p_fresh, atol=1e-5)
    np.testing.assert_array_equal(c_res, c_fresh)

    # Fully checkpointed: a re-run computes nothing and still matches.
    p_all, _ = rec.reconstruct(scene["images"], poses, checkpointer=ck)
    np.testing.assert_allclose(p_all, p_fresh, atol=1e-5)
