"""Worker, GUI helpers, viewer renderer, and COLMAP wrapper tests."""

import os
from pathlib import Path

import numpy as np
import pytest

from recon3d_tpu.gui.app import (
    METHOD_PRESETS,
    collect_options,
    find_result_file,
)
from recon3d_tpu.gui.viewer import (
    orbit_drag,
    render_pointcloud,
    render_turntable,
    subsample_for_display,
)
from recon3d_tpu.io.ply import save_ply
from recon3d_tpu.runtime.worker import (
    ReconstructionWorker,
    build_command,
    sniff_status,
    status_step,
)
from recon3d_tpu.tools.run_colmap import (
    QUALITY_SETTINGS,
    build_stage_commands,
    find_colmap,
    run_colmap_reconstruction,
)


def test_build_command_mapping():
    # custom pipeline flag mapping (reference worker.py:74-94)
    cmd = build_command("/d", {"neural": True, "mvs": True, "max_images": 7})
    assert "recon3d_tpu.cli" in cmd and "--neural" in cmd and "--mvs" in cmd
    assert cmd[cmd.index("--max-images") + 1] == "7"
    cmd = build_command("/d", {})
    assert "--fast" in cmd  # sparse default
    cmd = build_command("/d", {"method": "colmap_sparse", "use_gpu": False})
    assert "recon3d_tpu.tools.run_colmap" in cmd
    assert "--sparse-only" in cmd and "--no-gpu" in cmd
    # mvs wins over stereo/dense, like the reference's elif chain
    cmd = build_command("/d", {"mvs": True, "stereo": True, "dense": True})
    assert "--mvs" in cmd and "--stereo" not in cmd and "--dense" not in cmd
    # combined outranks everything; devices pass through
    cmd = build_command("/d", {"combined": True, "mvs": True, "devices": 1})
    assert "--combined" in cmd and "--mvs" not in cmd
    assert cmd[cmd.index("--devices") + 1] == "1"


def test_sniff_status_keywords():
    assert "1/4" in sniff_status("extracting features from 10 images")
    assert "2/4" in sniff_status("[sfm] matching 45 pairs")
    assert "4/4" in sniff_status("[patchmatch] 1234 points")
    assert sniff_status("unrelated line") is None


def test_status_step_progression():
    """The GUI's 4-step progress bar follows the sniffed statuses in order
    (reference main_app.py progress bar semantics)."""
    lines = [
        "extracting features from 10 images",
        "[sfm] matching 45 pairs",
        "[sfm] registered image 3",
        "[patchmatch] 1234 points",
        "saved dense_mvs.ply",
    ]
    steps = [status_step(sniff_status(l)) for l in lines]
    assert steps == [1, 2, 3, 4, 4]
    assert status_step(None) is None and status_step("idle") is None


def test_collect_options_widget_mapping():
    """Headless core of the reference's widget->options mapping
    (main_app.py:202-246)."""
    o = collect_options({"method": "colmap_dense"}, quality="high",
                        use_gpu=False, max_images=50, output="/o")
    assert o["quality"] == "high" and o["use_gpu"] is False
    assert "max_images" not in o and o["output"] == "/o"
    o = collect_options({"neural": True, "mvs": True}, max_images=50)
    assert o["max_images"] == 50 and "quality" not in o
    # the reference's spinbox floor: <=5 means "all images"
    o = collect_options({}, max_images=5)
    assert "max_images" not in o


def test_orbit_drag_math():
    az, el = orbit_drag(30.0, 20.0, dx_px=100, dy_px=-50, deg_per_px=0.4)
    assert az == pytest.approx(70.0) and el == pytest.approx(0.0)
    # azimuth wraps, elevation clamps short of the poles
    az, _ = orbit_drag(350.0, 0.0, dx_px=50, dy_px=0)
    assert az == pytest.approx(10.0)
    _, el = orbit_drag(0.0, 80.0, dx_px=0, dy_px=100)
    assert el == 89.0


def test_worker_runs_subprocess(tmp_path):
    """The worker must spawn a real subprocess and stream its output; use a
    bad dataset so the CLI exits non-zero quickly."""
    logs, statuses, done = [], [], []
    w = ReconstructionWorker(
        on_log=logs.append, on_status=statuses.append, on_finished=done.append
    )
    ok = w.run(str(tmp_path / "missing_dir"), {})
    assert ok is False and done == [False]
    assert any("Executing:" in l for l in logs)


def test_method_presets_and_result_discovery(tmp_path):
    # reference's eight presets (main_app.py:79-86) + the combined preset
    assert len(METHOD_PRESETS) == 10
    assert find_result_file(str(tmp_path)) is None
    save_ply(str(tmp_path / "sparse.ply"), np.zeros((1, 3), np.float32))
    save_ply(str(tmp_path / "dense_mvs.ply"), np.zeros((1, 3), np.float32))
    # dense preferred over sparse (reference :285-293)
    assert find_result_file(str(tmp_path)).endswith("dense_mvs.ply")


def test_render_pointcloud_and_turntable(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(5000, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (5000, 3)).astype(np.uint8)
    img = render_pointcloud(pts, cols, image_size=(120, 160))
    assert img.shape == (120, 160, 3) and img.dtype == np.uint8
    # some points must have been splatted (image isn't all background)
    assert (img > 40).any()

    ply = str(tmp_path / "cloud.ply")
    save_ply(ply, pts, cols)
    paths = render_turntable(ply, str(tmp_path / "view"), n_frames=3,
                             image_size=(60, 80))
    assert len(paths) == 3 and all(os.path.exists(p) for p in paths)

    sub_p, sub_c = subsample_for_display(pts, cols, max_points=100)
    assert len(sub_p) == 100 and len(sub_c) == 100


def test_colmap_wrapper_gated(tmp_path):
    cmds = build_stage_commands(
        "colmap", Path("/tmp/x"), use_gpu=False, quality="high", dense=True
    )
    assert len(cmds) == 7  # 4 sparse + 3 dense stages
    assert cmds[0][1] == "feature_extractor"
    assert "--SiftExtraction.use_gpu" in cmds[0]
    assert any("16384" in c for c in cmds[0])  # high preset
    sparse_only = build_stage_commands(
        "colmap", Path("/tmp/x"), True, "low", dense=False
    )
    assert len(sparse_only) == 4
    if find_colmap() is None:
        # graceful degradation without the binary
        assert run_colmap_reconstruction(str(tmp_path), str(tmp_path / "o")) is False


def test_collect_options_mesh():
    from recon3d_tpu.gui.app import collect_options
    from recon3d_tpu.runtime.worker import build_command

    opts = collect_options({"mvs": True}, mesh=True, max_images=10)
    assert opts["mesh"] and opts["max_images"] == 10
    cmd = build_command("imgs", opts)
    assert "--mesh" in cmd and "--mvs" in cmd
    # COLMAP methods ignore the mesh checkbox (no such flag there)
    opts = collect_options({"method": "colmap_dense"}, mesh=True)
    assert "mesh" not in opts


def test_mesh_shaded_rendering(tmp_path):
    """mesh.ply renders as a SHADED surface: header detection, surface
    sampling, and brightness variation from the headlight."""
    import sys
    sys.path.insert(0, "tests")
    from tests.test_tsdf_mesh import _sphere_volume
    from recon3d_tpu.dense.mesh import extract_mesh
    from recon3d_tpu.io.ply import save_mesh_ply, save_ply
    from recon3d_tpu.gui.viewer import (
        is_mesh_ply,
        mesh_to_shaded_points,
        render_turntable,
    )

    verts, faces = extract_mesh(_sphere_volume(n=32))
    mp = tmp_path / "mesh.ply"
    save_mesh_ply(str(mp), verts, faces,
                  np.full((len(verts), 3), 200, np.uint8))
    pp = tmp_path / "pts.ply"
    save_ply(str(pp), verts)
    assert is_mesh_ply(str(mp)) and not is_mesh_ply(str(pp))

    pts, cols = mesh_to_shaded_points(verts, faces,
                                      np.full((len(verts), 3), 200, np.uint8),
                                      samples=20000)
    assert pts.shape == (20000, 3) and cols.shape == (20000, 3)
    # samples lie on the sphere surface
    rad = np.linalg.norm(pts, axis=1)
    assert np.abs(rad - 0.8).max() < 0.1
    # headlight shading varies across the surface
    assert cols.max() - cols.min() > 60

    paths = render_turntable(str(mp), str(tmp_path / "m"), n_frames=2,
                             image_size=(80, 100))
    from PIL import Image
    img = np.asarray(Image.open(paths[0]))
    # a solid disk of lit pixels, not sparse vertices
    lit = (img.max(axis=-1) > 40).mean()
    assert lit > 0.15


def test_zbuffer_nearest_wins():
    """The sort-free scatter-min z-buffer keeps the NEAREST point per
    pixel: two points projecting to the same pixel must show the closer
    one's color."""
    # two points stacked along the view ray of the default orbit camera
    # would need camera math; instead use many coincident xy at two depths
    rng = np.random.default_rng(1)
    near = rng.normal(scale=0.2, size=(500, 3)).astype(np.float32)
    far = near + np.float32([0, 0, 0])  # identical positions...
    far = far * 3.0  # ...scaled out radially -> farther from orbit camera
    pts = np.concatenate([far, near])
    cols = np.concatenate([
        np.full((500, 3), 255, np.uint8),   # far points white
        np.zeros((500, 3), np.uint8),       # near points black
    ])
    img = render_pointcloud(pts, cols, image_size=(100, 120), point_size=2)
    # center of frame: near (black) cluster must occlude the far (white) one
    c = img[40:60, 50:70]
    assert (c.max(axis=-1) < 100).sum() > (c.min(axis=-1) > 150).sum()


def test_interactive_cloud_lod():
    from recon3d_tpu.gui.viewer import InteractiveCloud, LOD_DRAG_POINTS

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(250_000, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (250_000, 3), dtype=np.uint8)
    cloud = InteractiveCloud(pts, cols)
    full_p, full_c = cloud.for_display(interacting=False)
    assert len(full_p) == 250_000
    lod_p, lod_c = cloud.for_display(interacting=True)
    assert len(lod_p) == LOD_DRAG_POINTS and len(lod_c) == LOD_DRAG_POINTS
    # LOD subset is precomputed once: identical arrays across drag frames
    lod_p2, _ = cloud.for_display(interacting=True)
    assert lod_p2 is lod_p
    # density slider composes with LOD
    half_p, _ = cloud.for_display(interacting=True, frac=0.5)
    assert len(half_p) == LOD_DRAG_POINTS // 2
    # small clouds skip subsampling entirely
    small = InteractiveCloud(pts[:1000], cols[:1000])
    sp, _ = small.for_display(interacting=True)
    assert sp is small.points


def test_mesh_surface_samples_reshade_consistency():
    """MeshSurfaceSamples.shaded == the one-shot mesh_to_shaded_points for
    the same seed, and re-shading at a new azimuth reuses the cached
    geometry (points identical, only colors change)."""
    import sys
    sys.path.insert(0, "tests")
    from tests.test_tsdf_mesh import _sphere_volume
    from recon3d_tpu.dense.mesh import extract_mesh
    from recon3d_tpu.gui.viewer import MeshSurfaceSamples, mesh_to_shaded_points

    verts, faces = extract_mesh(_sphere_volume(n=24))
    vcols = np.full((len(verts), 3), 180, np.uint8)
    samples = MeshSurfaceSamples(verts, faces, vcols, samples=5000, seed=3)
    p1, c1 = samples.shaded(30.0, 20.0)
    p_ref, c_ref = mesh_to_shaded_points(
        verts, faces, vcols, azimuth_deg=30.0, elevation_deg=20.0,
        samples=5000, seed=3,
    )
    np.testing.assert_array_equal(p1, p_ref)
    np.testing.assert_array_equal(c1, c_ref)
    p2, c2 = samples.shaded(120.0, 20.0)
    assert p2 is p1 or np.shares_memory(p2, p1)
    assert not np.array_equal(c1, c2)  # headlight moved with the camera
    # LOD prefix limit
    p3, c3 = samples.shaded(30.0, 20.0, limit=1000)
    assert len(p3) == 1000
    np.testing.assert_array_equal(p3, p1[:1000])


@pytest.mark.slow
def test_drag_render_under_budget():
    """Interactive orbit at the 1M-point display cap stays under the 50 ms
    redraw budget via the LOD path (VERDICT r2 item 10)."""
    from recon3d_tpu.gui.viewer import drag_render_benchmark

    r = drag_render_benchmark(n_points=1_000_000, frames=5)
    assert r["drag_ms"] < 50.0, f"drag redraw {r['drag_ms']:.1f} ms"
    # the settle frame draws the full cloud; just sanity-bound it
    assert r["full_ms"] < 2000.0
