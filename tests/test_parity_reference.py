"""Side-by-side parity vs the reference pipeline (VERDICT r1 #4, r2 #6).

Renders a scene to disk and runs BOTH /root/reference's SfMPipeline
(OpenCV, CPU — reference sfm_pipeline.py:791-882) and ours on the same
images + calibration, comparing registered cameras, similarity-aligned
pose error vs ground truth, and sparse reprojection RMS (the BASELINE.json
"within 1%" criterion; we assert ours is at least as good, not within 1%
worse).

Gate calibration (round 3): floors are ~2x the margins measured on the
16-view 240x320 run in docs/parity_run.md (ours 0.0079 rel-center /
0.269 deg / 0.389 px) — a 2x accuracy regression now FAILS this test
(round 2's floors were 4-8x the measured values and would have passed one).
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.parity_run import render_scene, run_ours, run_reference

cv2 = pytest.importorskip("cv2")

# ~2x the measured margins (docs/parity_run.md) — regression-sensitive.
CENTER_REL_FLOOR = 0.016
ROT_DEG_FLOOR = 0.55
REPROJ_PX_FLOOR = 0.8


@pytest.fixture(scope="module")
def parity_scene(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("parity")
    gt = render_scene(tmp / "scene", n_views=16, image_size=(192, 256))
    ref = run_reference(gt)
    return gt, ref


@pytest.mark.slow
def test_parity_vs_reference(parity_scene):
    gt, ref = parity_scene
    ours = run_ours(gt)

    # Coverage: register at least as many cameras as the reference.
    assert ours["cameras"] >= ref["cameras"]
    assert ours["cameras"] >= 15  # and nearly all of the 16 in absolute terms
    assert ours["points"] >= 150

    # Accuracy vs GT (similarity-aligned): match or beat the reference,
    # floors at ~2x our measured margins so a genuine 2x accuracy
    # regression fails even when the reference's own numbers are loose.
    assert ours["center_err_rel"] <= max(
        ref["center_err_rel"] * 1.01, CENTER_REL_FLOOR
    )
    assert ours["rel_rot_deg"] <= max(ref["rel_rot_deg"] * 1.01, ROT_DEG_FLOOR)

    # Sparse reprojection RMS over each pipeline's own observations.
    assert ours["reproj_rms_px"] <= max(
        ref["reproj_rms_px"] * 1.01, REPROJ_PX_FLOOR
    )


@pytest.mark.slow
def test_parity_global_sfm(parity_scene):
    """The --global-sfm path must hold the same parity bar (VERDICT r2 #6:
    the rotation/translation-averaging solver is a capability beyond the
    reference, but its output competes with the reference's incremental
    result on the same scene)."""
    gt, ref = parity_scene
    ours = run_ours(gt, mode="global")

    assert ours["cameras"] >= ref["cameras"]
    assert ours["cameras"] >= 15
    assert ours["points"] >= 150
    assert ours["center_err_rel"] <= max(
        ref["center_err_rel"] * 1.01, CENTER_REL_FLOOR
    )
    assert ours["rel_rot_deg"] <= max(ref["rel_rot_deg"] * 1.01, ROT_DEG_FLOOR)
    assert ours["reproj_rms_px"] <= max(
        ref["reproj_rms_px"] * 1.01, REPROJ_PX_FLOOR
    )


@pytest.mark.slow
def test_parity_50_views_camera_coverage():
    """The 50-view north-star arc: the round-4 published row registered 38
    cameras to the reference's 39 — one camera SHORT of the cameras>=ref
    contract this file enforces at 16 views (VERDICT r4 #5). The round-5
    rescue pass (finer-scale re-matching of starved views + relaxed-floor
    registration, sfm/pipeline.py _rescue_unregistered) wins back views
    10 and 11: measured 40/50 vs the reference's 39/50 at unchanged
    0.46 px reprojection. This test pins the 50-view contract so the
    coverage can't silently regress; the reference's own count is runtime-
    measured, not hard-coded."""
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        gt = render_scene(Path(tmp) / "scene", n_views=50,
                          image_size=(480, 640))
        ref = run_reference(gt)
        ours = run_ours(gt)

    assert ours["cameras"] >= ref["cameras"], (ours["cameras"], ref["cameras"])
    assert ours["cameras"] >= 40  # measured round 5; absolute floor
    assert ours["reproj_rms_px"] <= max(
        ref["reproj_rms_px"] * 1.01, REPROJ_PX_FLOOR
    )
