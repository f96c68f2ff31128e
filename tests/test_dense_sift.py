"""Dense SIFT backend tests on the rendered GT scene."""

import numpy as np
import pytest

from recon3d_tpu.camera import Camera
from recon3d_tpu.config import DenseSiftConfig
from recon3d_tpu.dense.sift_dense import DenseSiftReconstructor, dense_pairs
from tests.render import render_views, default_scene_planes


def test_dense_pairs_policy():
    # window pairs + loop closure (reference dense.py:88-95)
    ps = dense_pairs(10, 2)
    assert (0, 1) in ps and (0, 2) in ps and (0, 3) not in ps
    assert (0, 8) in ps and (0, 9) in ps and (1, 9) in ps  # ends meet
    assert all(i < j for i, j in ps)


def test_dense_sift_reconstruction():
    scene = render_views(n_views=4, image_size=(128, 160), arc_step=0.15)
    cam = Camera.from_matrix(scene["K"])
    cfg = DenseSiftConfig(max_features=2048, min_parallax_deg=0.3)
    rec = DenseSiftReconstructor(cam, cfg)
    poses = {i: (scene["Rs"][i], scene["ts"][i]) for i in range(4)}
    points, colors = rec.reconstruct(scene["images"], poses)
    assert len(points) > 200, f"too few dense points: {len(points)}"
    assert colors.shape == points.shape and colors.dtype == np.uint8

    # points must lie near GT surfaces
    dists = np.full(len(points), np.inf)
    for p in default_scene_planes():
        n = p.normal
        d_plane = np.abs((points - p.origin) @ n)
        lu = (points - p.origin) @ p.u
        lv = (points - p.origin) @ p.v
        on = (np.abs(lu) <= p.half_u + 0.1) & (np.abs(lv) <= p.half_v + 0.1)
        dists = np.where(on, np.minimum(dists, d_plane), dists)
    assert np.median(dists) < 0.05, f"median surf dist {np.median(dists):.3f}"
