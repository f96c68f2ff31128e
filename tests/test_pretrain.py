"""Synthetic SuperPoint pretraining: corpus, train step, checkpoint, NN path.

The reference cannot train its neural frontend at all (it only loads
published checkpoints, neural_matcher.py:47-66); these tests cover the
framework-native pretraining subsystem end to end at tiny scale.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recon3d_tpu.neural.synthetic import (
    render_shapes,
    cells_from_corners,
    labels65,
    random_homography,
    warp_points,
    warp_image,
    cell_correspondence,
    make_pair_batch,
    CELL,
    DUSTBIN,
)


def test_render_shapes_labels_consistent(rng):
    for seed in range(5):
        r = np.random.default_rng(seed)
        img, corners = render_shapes(r, (96, 96))
        assert img.shape == (96, 96) and img.dtype == np.float32
        assert img.min() >= 0.0 and img.max() <= 1.0
        cells = cells_from_corners(corners, (96, 96))
        assert cells.shape == (12, 12)
        # every labeled cell decodes back to a pixel near some corner
        for cy, cx in zip(*np.nonzero(cells != DUSTBIN)):
            v = cells[cy, cx]
            px = cx * CELL + (v % CELL)
            py = cy * CELL + (v // CELL)
            d = np.hypot(corners[:, 0] - px, corners[:, 1] - py).min()
            assert d < 1.0


def test_labels65_one_hot():
    cells = np.array([[0, DUSTBIN], [63, 7]], np.int32)
    lab = labels65(cells)
    assert lab.shape == (2, 2, 65)
    assert lab.sum() == 4.0
    assert lab[0, 1, DUSTBIN] == 1.0


def test_homography_warp_roundtrip(rng):
    r = np.random.default_rng(3)
    H = random_homography(r, (128, 128))
    pts = r.uniform(20, 100, (50, 2))
    back = warp_points(np.linalg.inv(H), warp_points(H, pts))
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_warp_image_matches_point_warp():
    """A bright dot warped by H lands where warp_points says it should."""
    r = np.random.default_rng(5)
    img = np.zeros((96, 96), np.float32)
    img[40, 30] = 1.0  # (x=30, y=40)
    H = random_homography(r, (96, 96))
    w = warp_image(img, H)
    tx, ty = warp_points(H, np.array([[30.0, 40.0]]))[0]
    if 2 <= tx < 94 and 2 <= ty < 94:
        yy, xx = np.unravel_index(np.argmax(w), w.shape)
        assert np.hypot(xx - tx, yy - ty) <= 1.5


def test_cell_correspondence_identity():
    idx, valid = cell_correspondence(np.eye(3), (64, 64))
    assert valid.all()
    np.testing.assert_array_equal(idx, np.arange(64))


def test_pair_batch_shapes():
    b = make_pair_batch(np.random.default_rng(0), 2, (64, 64))
    assert b["img_a"].shape == (2, 64, 64, 1)
    assert b["lab_b"].shape == (2, 8, 8, 65)
    assert b["corr_idx"].shape == (2, 64)
    assert b["corr_valid"].dtype == bool


def test_pair_train_step_decreases_loss():
    from recon3d_tpu.config import MeshConfig
    from recon3d_tpu.parallel.mesh import make_mesh
    from recon3d_tpu.neural.superpoint import SuperPointNet
    from recon3d_tpu.neural.train import TrainState, make_pair_train_step
    import optax

    mesh = make_mesh(MeshConfig(model_parallel=1))
    model = SuperPointNet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    tx = optax.adam(1e-3)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_pair_train_step(model, tx, mesh)
    rng = np.random.default_rng(0)
    losses = []
    with mesh:
        for i in range(8):
            b = {k: jnp.asarray(v)
                 for k, v in make_pair_batch(rng, 8, (64, 64)).items()}
            state, l = step(state, b)
            losses.append(float(np.asarray(l)[0]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_checkpoint_roundtrip(tmp_path):
    from recon3d_tpu.neural.superpoint import SuperPointNet
    from recon3d_tpu.neural.weights import save_params_npz, load_params_npz

    model = SuperPointNet()
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 1)))
    path = str(tmp_path / "sp.npz")
    save_params_npz(jax.device_get(params), path)
    loaded = load_params_npz(path, params)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(loaded)
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=2e-3
        )  # f16 storage


def test_nn_matcher_on_trained_descriptors():
    """Short pretraining makes mutual-NN matching on a warped pair beat
    chance by a wide margin (random-init descriptors give ~0 matches)."""
    import optax
    from recon3d_tpu.config import MeshConfig, NeuralConfig
    from recon3d_tpu.parallel.mesh import make_mesh
    from recon3d_tpu.neural.superpoint import SuperPointNet
    from recon3d_tpu.neural.train import TrainState, make_pair_train_step
    from recon3d_tpu.neural.matcher import NeuralMatcher

    mesh = make_mesh(MeshConfig(model_parallel=1))
    model = SuperPointNet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    tx = optax.adam(2e-3)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_pair_train_step(model, tx, mesh)
    rng = np.random.default_rng(1)
    with mesh:
        for i in range(30):
            b = {k: jnp.asarray(v)
                 for k, v in make_pair_batch(rng, 8, (64, 64)).items()}
            state, _ = step(state, b)

    m = NeuralMatcher(NeuralConfig(max_keypoints=256, matcher="nn"))
    m._ensure_params((96, 96))
    m._sp_params = jax.device_get(state.params)
    img, _ = render_shapes(np.random.default_rng(7), (96, 96))
    H = random_homography(np.random.default_rng(8), (96, 96),
                          max_rot=0.2, max_scale=0.1, max_shift=0.05)
    imgb = warp_image(img, H)
    fa = m.extract(img)
    fb = m.extract(imgb)
    res = m.match(fa, fb)
    mask = np.asarray(res.mask)
    xya = np.asarray(fa.xy)[mask]
    xyb = np.asarray(fb.xy)[np.asarray(res.idx2)[mask]]
    assert mask.sum() >= 10, int(mask.sum())
    # majority of NN matches should roughly agree with the ground-truth
    # homography (30 steps is a smoke test — the bundled checkpoint's
    # quality gate lives in test_neural_bundled.py)
    pred = warp_points(H, xya)
    err = np.hypot(*(pred - xyb).T)
    assert np.median(err) < 10.0, np.median(err)
