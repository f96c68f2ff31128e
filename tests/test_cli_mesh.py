"""Multi-chip product wiring (VERDICT r1 #2): the CLI builds a mesh and the
dense/matching stages shard over it, producing the same outputs as the
single-device path (tested on the virtual 8-device CPU mesh)."""

import numpy as np
import pytest

import jax

from recon3d_tpu.cli import main
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


def test_match_pairs_batched_sharded_equals_single(rng):
    from recon3d_tpu.config import MatchConfig
    from recon3d_tpu.features.frontend import (
        FeatureExtractor,
        match_pairs_batched,
    )
    from recon3d_tpu.parallel.mesh import auto_mesh

    mesh = auto_mesh()
    assert mesh is not None and mesh.shape["data"] == 8

    ex = FeatureExtractor()
    scene = render_views(n_views=4, image_size=(96, 128), arc_step=0.2)
    feats = ex.extract_batch(np.stack([
        g.mean(-1) if g.ndim == 3 else g for g in scene["images"]
    ]).astype(np.float32))
    pairs = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    key = jax.random.PRNGKey(3)
    single = match_pairs_batched(feats, pairs, key)
    sharded = match_pairs_batched(feats, pairs, key, mesh=mesh)
    assert len(single) == len(sharded)
    for s, m in zip(single, sharded):
        assert s[0] == m[0] and s[1] == m[1]
        np.testing.assert_array_equal(s[2], m[2])  # inlier idx1
        np.testing.assert_array_equal(s[3], m[3])  # inlier idx2
        assert s[5] == m[5] and s[6] == m[6]       # n_inliers, n_raw


@pytest.mark.slow
def test_cli_dense_sharded_matches_single_device(image_dir, tmp_path):
    """Full CLI with --mvs --stereo: the auto-mesh (8 CPU devices) run must
    reproduce the forced single-device (--devices 1) run.

    The sparse POINTS must agree tightly (both runs converge to the same
    optimum). The dense products cannot be compared pointwise at fp
    tolerance: the mesh run's observation-sharded BA (sfm/bundle.py
    _lm_loop_mesh) reduces residuals in a different (psum) order, so its
    poses differ from the single-device run's at the last-ulp level, and
    the dense stages amplify that into small systematic shifts (plane-grid
    and argmin-pick changes of ~one depth step on near-tie pixels). The
    product contract is therefore SURFACE agreement: same point counts,
    same scene geometry, and a symmetric nearest-neighbor (chamfer)
    distance between the two clouds far below the dense sampling pitch."""
    out_m = tmp_path / "mesh"
    out_s = tmp_path / "single"
    base = [image_dir, "--mvs", "--stereo", "--seed", "1"]
    assert main(base + ["--output", str(out_m)]) == 0
    assert main(base + ["--output", str(out_s), "--devices", "1"]) == 0

    pm, cm = load_ply(str(out_m / "sparse.ply"))
    ps, cs = load_ply(str(out_s / "sparse.ply"))
    assert len(pm) == len(ps)
    # Tolerance set from measurement, not hope: one intermediate-budget
    # (6-iter) BA call diverges mesh-vs-single by <= 6e-5 absolute across
    # 6 seeds (psum reduction order; /tmp-reproducible via the
    # bundle_adjust mesh= path on identical inputs). A full CLI run chains
    # ~10 BA/registration stages whose decisions can amplify that, so the
    # sparse contract is 5e-3 on the scale-10 normalized scene (5e-4
    # relative — ~30x the measured per-call perturbation, far below any
    # geometric significance).
    np.testing.assert_allclose(pm, ps, atol=5e-3, err_msg="sparse.ply")
    np.testing.assert_array_equal(cm, cs)

    from scipy.spatial import cKDTree

    for name in ("dense_mvs.ply", "dense_stereo.ply"):
        pm, cm = load_ply(str(out_m / name))
        ps, cs = load_ply(str(out_s / name))
        n = min(len(pm), len(ps))
        assert abs(len(pm) - len(ps)) <= 0.02 * n, (
            f"{name}: {len(pm)} vs {len(ps)} points"
        )
        scale = float(np.linalg.norm(ps.max(0) - ps.min(0))) + 1e-6
        # symmetric chamfer: both clouds describe the same surface
        d_ms = cKDTree(ps).query(pm, k=1)[0] / scale
        d_sm = cKDTree(pm).query(ps, k=1)[0] / scale
        for d, tag in ((d_ms, "mesh->single"), (d_sm, "single->mesh")):
            assert np.median(d) < 2e-3, (
                f"{name} {tag}: median NN {np.median(d):.2e} of scale"
            )
            assert np.percentile(d, 95) < 2e-2, (
                f"{name} {tag}: p95 NN {np.percentile(d, 95):.2e}"
            )
        # scene geometry identical regardless of individual pick flips
        np.testing.assert_allclose(
            np.median(pm, axis=0), np.median(ps, axis=0),
            atol=0.05, err_msg=name,
        )
        np.testing.assert_allclose(
            np.percentile(pm, [5, 95], axis=0),
            np.percentile(ps, [5, 95], axis=0),
            atol=0.5, err_msg=name,
        )
