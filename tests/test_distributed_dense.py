"""Multi-chip dense backends on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from recon3d_tpu.dense.distributed import (
    distributed_patchmatch,
    distributed_plane_sweep,
)
from recon3d_tpu.dense.patchmatch import patchmatch_depth_batch
from recon3d_tpu.parallel.mesh import make_mesh
from tests.render import render_views

import jax.numpy as jnp


@pytest.fixture(scope="module")
def scene():
    return render_views(n_views=6, image_size=(64, 96), arc_step=0.12)


def _batch(scene, refs, J=3):
    gray = scene["images"].mean(-1)
    V = len(scene["images"])
    srcs = {
        r: [j for j in range(V) if j != r][:J] for r in refs
    }
    gt = scene["depth"]
    dr = np.stack(
        [[gt[r][gt[r] > 0].min() * 0.7, gt[r][gt[r] > 0].max() * 1.4] for r in refs]
    ).astype(np.float32)
    return dict(
        ref_grays=gray[refs].astype(np.float32),
        src_grays=np.stack([gray[srcs[r]] for r in refs]).astype(np.float32),
        K=scene["K"],
        R_refs=scene["Rs"][refs],
        t_refs=scene["ts"][refs],
        R_srcss=np.stack([scene["Rs"][srcs[r]] for r in refs]),
        t_srcss=np.stack([scene["ts"][srcs[r]] for r in refs]),
        depth_ranges=dr,
    )


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_distributed_patchmatch_matches_single_device(scene):
    """Sharding over the view axis matches the single-device result.

    PatchMatch's per-pixel argmin over candidate fields is a DISCRETE
    selection: per-shard XLA programs fuse differently from the 8-view
    program, and a last-ulp cost difference flips individual picks (the
    coarse-to-fine upsample then spreads a flipped coarse pixel over a
    4x4 fine block). Bitwise equality is therefore not the contract;
    near-total pixelwise agreement plus identical GT-depth quality is.
    """
    refs = [1, 2, 3, 4, 5]  # 5 views -> padded to 8 across the mesh
    b = _batch(scene, refs)
    mesh = make_mesh()
    out = distributed_patchmatch(
        b["ref_grays"], b["src_grays"], b["K"], b["R_refs"], b["t_refs"],
        b["R_srcss"], b["t_srcss"], b["depth_ranges"],
        seed=0, mesh=mesh, num_iterations=2, patch=7,
    )
    assert out.depth.shape == (5, 64, 96)
    # single-device reference: same keys (padded split then sliced)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)[:5]
    ref = patchmatch_depth_batch(
        jnp.asarray(b["ref_grays"]), jnp.asarray(b["src_grays"]),
        jnp.asarray(b["K"]), jnp.asarray(b["R_refs"]), jnp.asarray(b["t_refs"]),
        jnp.asarray(b["R_srcss"]), jnp.asarray(b["t_srcss"]),
        jnp.asarray(b["depth_ranges"]), keys,
        num_iterations=2, patch=7,
    )
    ref_d = np.asarray(ref.depth)
    rel = np.abs(out.depth - ref_d) / np.maximum(np.abs(ref_d), 1e-6)
    agree = rel < 2e-3
    assert agree.mean() > 0.9, f"only {agree.mean():.1%} pixels agree"
    # and the disagreements must not cost depth quality: confident pixels
    # of BOTH runs hit the same GT accuracy
    for depth, conf in ((out.depth, out.confidence),
                        (ref_d, np.asarray(ref.confidence))):
        for k, r in enumerate(refs):
            gt = scene["depth"][r]
            sel = (conf[k] >= 3) & (gt > 0)
            if sel.sum() < 100:
                continue
            err = np.abs(depth[k][sel] - gt[sel]) / gt[sel]
            assert np.median(err) < 0.05


def test_distributed_plane_sweep_runs_and_is_accurate(scene):
    refs = [2, 3]
    b = _batch(scene, refs)
    gt = scene["depth"]
    dmin = min(gt[r][gt[r] > 0].min() for r in refs) * 0.7
    dmax = max(gt[r][gt[r] > 0].max() for r in refs) * 1.4
    depth, cnt, ncc = distributed_plane_sweep(
        b["ref_grays"], b["src_grays"], b["K"], b["R_refs"], b["t_refs"],
        b["R_srcss"], b["t_srcss"],
        np.asarray([dmin, dmax], np.float32),
        mesh=make_mesh(), num_depths=64, patch=5, ncc_threshold=0.7,
    )
    assert depth.shape == (2, 64, 96)
    for bi, r in enumerate(refs):
        conf = (cnt[bi] >= 3) & (gt[r] > 0)
        assert conf.mean() > 0.2
        rel = np.abs(depth[bi][conf] - gt[r][conf]) / gt[r][conf]
        assert np.median(rel) < 0.06
