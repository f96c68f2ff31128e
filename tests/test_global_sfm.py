"""Global SfM: rotation averaging, translation averaging, and the full
pipeline against ground-truth rendered poses."""

import dataclasses

import numpy as np
import pytest

from recon3d_tpu.camera import Camera
from recon3d_tpu.config import ReconstructionConfig
from recon3d_tpu.io.dataset import image_set_from_arrays
from recon3d_tpu.sfm.global_sfm import (
    rotation_averaging,
    translation_averaging,
)
from recon3d_tpu.sfm.pipeline import SfMPipeline
from tests.render import render_views


def _rot_err_deg(Ra, Rb):
    c = (np.trace(Ra @ Rb.T) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def _ring_poses(V, rng):
    Rs, Cs = [], []
    for i in range(V):
        th = 0.5 * i / V
        R = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
             [-np.sin(th), 0, np.cos(th)]], np.float32)
        Rs.append(R)
        Cs.append(np.float32([2 * np.sin(th), 0.1 * i, -2 * np.cos(th)]))
    return np.stack(Rs), np.stack(Cs)


def test_rotation_averaging_exact_graph(rng):
    """Noise-free relative rotations -> exact absolute rotations."""
    V = 12
    Rs, _ = _ring_poses(V, rng)
    ei, ej, R_rel = [], [], []
    for i in range(V):
        for j in range(i + 1, min(i + 4, V)):
            ei.append(i)
            ej.append(j)
            R_rel.append(Rs[j] @ Rs[i].T)
    ei, ej = np.asarray(ei, np.int32), np.asarray(ej, np.int32)
    R_rel = np.stack(R_rel)
    w = np.ones(len(ei), np.float32)
    R, seen = rotation_averaging(ei, ej, R_rel, w, V)
    assert seen.all()
    # gauge: compare relative to camera 0
    for i in range(V):
        gt = Rs[i] @ Rs[0].T
        assert _rot_err_deg(R[i], gt) < 0.05


def test_rotation_averaging_noisy_graph(rng):
    """Per-edge rotation noise averages out (redundant graph)."""
    V = 10
    Rs, _ = _ring_poses(V, rng)
    ei, ej, R_rel = [], [], []
    for i in range(V):
        for j in range(i + 1, min(i + 5, V)):
            # ~1.1 deg of noise per edge
            ax = rng.normal(size=3) * 0.02
            th = np.linalg.norm(ax)
            k = ax / max(th, 1e-12)
            Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                           [-k[1], k[0], 0]])
            N = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx
            ei.append(i)
            ej.append(j)
            R_rel.append(N @ Rs[j] @ Rs[i].T)
    R, _ = rotation_averaging(
        np.asarray(ei, np.int32), np.asarray(ej, np.int32),
        np.stack(R_rel).astype(np.float32),
        np.ones(len(ei), np.float32), V,
    )
    errs = [_rot_err_deg(R[i], Rs[i] @ Rs[0].T) for i in range(V)]
    assert np.mean(errs) < 1.0


def test_translation_averaging_exact(rng):
    V = 10
    Rs, Cs = _ring_poses(V, rng)
    ei, ej, t_rel = [], [], []
    for i in range(V):
        for j in range(i + 1, min(i + 4, V)):
            # x_j = R_rel x_i + t_rel with d_world = -R_j^T t_rel
            d = Cs[j] - Cs[i]
            t = -Rs[j] @ d
            t /= np.linalg.norm(t)
            ei.append(i)
            ej.append(j)
            t_rel.append(t)
    C = translation_averaging(
        np.asarray(ei, np.int32), np.asarray(ej, np.int32),
        np.stack(t_rel).astype(np.float32), Rs,
        np.ones(len(ei), np.float32), V,
    )
    # compare up to global scale (centers known up to similarity)
    gt = Cs - Cs[0]
    s = np.sum(C * gt) / max(np.sum(C * C), 1e-12)
    err = np.linalg.norm(s * C - gt, axis=1)
    assert err.max() < 0.02 * np.linalg.norm(gt, axis=1).max()


@pytest.fixture(scope="module")
def global_result():
    scene = render_views(n_views=6, image_size=(160, 192), arc_step=0.14)
    cam = Camera.from_matrix(scene["K"])
    iset = image_set_from_arrays(scene["images"], cam)
    cfg = ReconstructionConfig()
    cfg = cfg.replace(
        sift=dataclasses.replace(
            cfg.sift, max_features=1024, contrast_threshold=0.012),
        match=dataclasses.replace(
            cfg.match, min_matches=15, ransac_hypotheses=512),
    )
    pipe = SfMPipeline(config=cfg)
    points, colors, poses = pipe.reconstruct_global(image_set=iset)
    return scene, pipe, points, colors, poses


def test_global_sfm_end_to_end(global_result):
    scene, pipe, points, colors, poses = global_result
    assert len(poses) == 6
    assert len(points) > 100
    assert pipe.stats["mean_reproj_px"] < 1.5


def test_global_sfm_pose_accuracy(global_result):
    scene, pipe, points, colors, poses = global_result
    # relative rotations against ground truth
    ids = sorted(poses.keys())
    for a, b in zip(ids[:-1], ids[1:]):
        Ra = np.asarray(poses[a].R)
        Rb = np.asarray(poses[b].R)
        gt = scene["Rs"][b] @ scene["Rs"][a].T
        assert _rot_err_deg(Rb @ Ra.T, gt) < 1.0


@pytest.mark.slow
def test_global_sfm_wider_scene():
    """20-view arc: global mode registers everything with sub-1.5-deg
    adjacent rotations — the regime (many views, strong graph) the
    averaging formulation targets."""
    scene = render_views(n_views=20, image_size=(160, 192), arc_step=0.05)
    cam = Camera.from_matrix(scene["K"])
    iset = image_set_from_arrays(scene["images"], cam)
    cfg = ReconstructionConfig()
    cfg = cfg.replace(
        sift=dataclasses.replace(
            cfg.sift, max_features=1024, contrast_threshold=0.012),
        match=dataclasses.replace(
            cfg.match, min_matches=15, ransac_hypotheses=512),
    )
    pipe = SfMPipeline(config=cfg)
    points, colors, poses = pipe.reconstruct_global(image_set=iset)
    assert len(poses) == 20
    assert len(points) > 200
    assert pipe.stats["mean_reproj_px"] < 1.5
    ids = sorted(poses.keys())
    errs = []
    for a, b in zip(ids[:-1], ids[1:]):
        Ra, Rb = np.asarray(poses[a].R), np.asarray(poses[b].R)
        gt = scene["Rs"][b] @ scene["Rs"][a].T
        errs.append(_rot_err_deg(Rb @ Ra.T, gt))
    assert np.median(errs) < 0.8 and max(errs) < 2.0


def test_translation_averaging_scales_to_150_cameras(rng):
    """The dense 3Vx3V normal-equation solve stays exact and fast at the
    realistic camera-count envelope. The path must carry curvature: on a
    NEAR-COLLINEAR track pairwise directions are almost parallel and
    longitudinal spacing is fundamentally unconstrained by direction-only
    constraints (a known degeneracy of translation averaging — the e2e
    solver recovers those via resection-intersection + BA instead)."""
    V = 150
    Rs, Cs = [], []
    for i in range(V):
        th = 2 * np.pi * i / V * 0.8
        R = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
             [-np.sin(th), 0, np.cos(th)]], np.float32)
        Rs.append(R)
        Cs.append(np.float32(
            [2 * np.sin(th), 0.3 * np.sin(3 * th), -2 * np.cos(th)]))
    Rs, Cs = np.stack(Rs), np.stack(Cs)
    ei, ej, t_rel = [], [], []
    for i in range(V):
        for j in range(i + 1, min(i + 6, V)):
            d = Cs[j] - Cs[i]
            t = -Rs[j] @ d
            t /= np.linalg.norm(t)
            ei.append(i)
            ej.append(j)
            t_rel.append(t)
    C = translation_averaging(
        np.asarray(ei, np.int32), np.asarray(ej, np.int32),
        np.stack(t_rel).astype(np.float32), Rs,
        np.ones(len(ei), np.float32), V,
    )
    gt = Cs - Cs[0]
    s = np.sum(C * gt) / max(np.sum(C * C), 1e-12)
    err = np.linalg.norm(s * C - gt, axis=1)
    assert err.max() < 0.03 * np.linalg.norm(gt, axis=1).max()
