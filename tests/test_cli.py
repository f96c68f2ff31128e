"""End-to-end CLI tests: PNGs on disk -> sparse (+ dense) PLY outputs."""

import os

import numpy as np
import pytest

from recon3d_tpu.cli import build_parser, main, resolve_dataset
from recon3d_tpu.io.ply import load_ply
from tests.render import render_views


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    scene = render_views(n_views=5, image_size=(128, 160), arc_step=0.15)
    for i, img in enumerate(scene["images"]):
        Image.fromarray((img * 255).astype(np.uint8)).save(d / f"im_{i:03d}.png")
    return str(d)


def test_parser_reference_flag_surface():
    # the reference's exact flags (run_reconstruction.py:24-44) must parse
    args = build_parser().parse_args(
        ["squirrel", "--neural", "--mvs", "--stereo", "--dense", "--combined",
         "--fast", "--max-images", "10", "--output", "/tmp/x"]
    )
    assert args.dataset == "squirrel" and args.max_images == 10
    assert args.mvs and args.stereo and args.dense and args.fast and args.neural


def test_resolve_dataset_errors():
    with pytest.raises(SystemExit):
        resolve_dataset("definitely/not/a/dir")


def test_cli_sparse_end_to_end(image_dir, tmp_path):
    out = tmp_path / "recon"
    stats = tmp_path / "stats.json"
    rc = main([image_dir, "--fast", "--output", str(out), "--seed", "1",
               "--stats-json", str(stats)])
    assert rc == 0
    pts, cols = load_ply(str(out / "sparse.ply"))
    assert len(pts) > 100, f"sparse cloud too small: {len(pts)}"
    cam_pts, _ = load_ply(str(out / "cameras.ply"))
    assert len(cam_pts) >= 8  # >=4 cameras x (center + forward)
    import json

    s = json.loads(stats.read_text())
    assert s["num_sparse_points"] == len(pts)
    assert s["num_cameras"] >= 4 and "stage_times_s" in s
    assert s["mean_reproj_px"] < 2.0


def test_cli_checkpoint_resume(image_dir, tmp_path):
    out1 = tmp_path / "r1"
    ck = tmp_path / "ckpt"
    rc = main([image_dir, "--fast", "--output", str(out1),
               "--checkpoint-dir", str(ck)])
    assert rc == 0
    assert (ck / "sparse_state.npz").exists()
    pts1, _ = load_ply(str(out1 / "sparse.ply"))

    # second run restores from the checkpoint instead of re-running SfM
    out2 = tmp_path / "r2"
    rc = main([image_dir, "--fast", "--output", str(out2),
               "--checkpoint-dir", str(ck)])
    assert rc == 0
    pts2, _ = load_ply(str(out2 / "sparse.ply"))
    np.testing.assert_allclose(pts1, pts2, atol=1e-5)


def test_cli_colmap_export_import(image_dir, tmp_path):
    """--export-colmap writes a loadable model; --from-colmap skips SfM and
    reproduces the same sparse output from it."""
    from recon3d_tpu.io.colmap import load_colmap_text

    out1 = tmp_path / "r_exp"
    rc = main([image_dir, "--fast", "--output", str(out1), "--seed", "1",
               "--export-colmap"])
    assert rc == 0
    model_dir = out1 / "sparse_colmap"
    m = load_colmap_text(str(model_dir))
    assert len(m.images) >= 4 and len(m.points) > 100
    # every exported image name exists on disk (the --from-colmap contract)
    for im in m.images.values():
        assert os.path.exists(os.path.join(image_dir, im.name))

    out2 = tmp_path / "r_imp"
    rc = main([image_dir, "--output", str(out2),
               "--from-colmap", str(model_dir)])
    assert rc == 0
    from recon3d_tpu.io.ply import load_ply as _load

    p1, _ = _load(str(out1 / "sparse.ply"))
    p2, _ = _load(str(out2 / "sparse.ply"))
    np.testing.assert_allclose(p2, p1, atol=1e-4)


@pytest.mark.slow
def test_cli_mesh_end_to_end(image_dir, tmp_path):
    """--mesh: images -> TSDF mesh.ply alongside the MVS cloud."""
    from recon3d_tpu.io.ply import load_mesh_ply

    out = tmp_path / "r_mesh"
    rc = main([image_dir, "--output", str(out), "--seed", "1",
               "--mesh", "--mesh-resolution", "96"])
    assert rc == 0
    assert (out / "dense_mvs.ply").exists()
    verts, faces, cols = load_mesh_ply(str(out / "mesh.ply"))
    assert len(verts) > 200 and len(faces) > 400
    assert cols is not None and cols.shape == verts.shape
    # faces index valid vertices
    assert faces.min() >= 0 and faces.max() < len(verts)
