"""Side-by-side parity run: reference SfM (OpenCV/CPU) vs recon3d_tpu.

Renders a synthetic arc scene to disk with a known calibration, runs BOTH
pipelines on the same images (the reference's `SfMPipeline.reconstruct`,
/root/reference/src/core/sfm_pipeline.py:791-882, and this repo's), and
compares registered-camera count, similarity-aligned camera-center error,
mean pairwise relative-rotation error vs ground truth, sparse reprojection
RMS over each pipeline's own observations, point count, and wall-clock.

Usage:
    python scripts/parity_run.py [--views 12] [--height 240] [--width 320]
                                 [--workdir /tmp/parity_scene]
                                 [--md docs/parity_run.md] [--skip-reference]

The metric helpers (umeyama alignment, pose-error computation, reference
reprojection RMS) are imported by tests/test_parity_reference.py; the
__main__ path produces the documented table.
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")


def render_scene(workdir: Path, n_views: int, image_size) -> dict:
    """Render the arc scene to PNGs + calibration npz; returns GT dict."""
    sys.path.insert(0, str(REPO))
    from PIL import Image

    from tests.render import render_views

    workdir.mkdir(parents=True, exist_ok=True)
    img_dir = workdir / "images"
    img_dir.mkdir(exist_ok=True)
    scene = render_views(n_views=n_views, image_size=image_size,
                         arc_step=max(0.06, 0.72 / n_views))
    for i, img in enumerate(scene["images"]):
        Image.fromarray((img * 255).astype(np.uint8)).save(
            img_dir / f"view_{i:03d}.png"
        )
    np.savez(
        workdir / "calibration.npz",
        mtx=np.asarray(scene["K"], np.float64),
        dist=np.zeros(5),
    )
    return {
        "image_dir": str(img_dir),
        "calib": str(workdir / "calibration.npz"),
        "K": np.asarray(scene["K"]),
        "Rs": np.asarray(scene["Rs"]),
        "ts": np.asarray(scene["ts"]),
    }


def umeyama(src: np.ndarray, dst: np.ndarray):
    """Similarity (s, R, t) minimizing ||s R src + t - dst||^2 (closed form)."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_s = (xs**2).sum() / len(src)
    s = float(np.trace(np.diag(D) @ S) / max(var_s, 1e-12))
    t = mu_d - s * R @ mu_s
    return s, R, t


def pose_errors_vs_gt(poses: dict, gt_Rs: np.ndarray, gt_ts: np.ndarray):
    """(aligned mean center error, mean pairwise relative-rotation deg).

    `poses` maps image index -> object with .R/.t (both pipelines' pose
    types satisfy this). Centers align by Umeyama similarity (both
    pipelines normalize their reconstructions); rotations compare through
    pairwise relatives R_i R_j^T, which are similarity-invariant.
    """
    ids = sorted(poses.keys())
    est_R = np.array([np.asarray(poses[i].R, np.float64) for i in ids])
    est_C = np.array(
        [-np.asarray(poses[i].R, np.float64).T @ np.asarray(poses[i].t, np.float64)
         for i in ids]
    )
    gt_R = gt_Rs[ids].astype(np.float64)
    gt_C = np.array([-R.T @ t for R, t in
                     zip(gt_R, gt_ts[ids].astype(np.float64))])
    s, R, t = umeyama(est_C, gt_C)
    center_err = float(np.linalg.norm((s * est_C @ R.T + t) - gt_C, axis=1).mean())
    # scene scale reference: GT camera-center spread
    scale = float(np.linalg.norm(gt_C - gt_C.mean(0), axis=1).mean())

    rel_errs = []
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            rel_est = est_R[a] @ est_R[b].T
            rel_gt = gt_R[a] @ gt_R[b].T
            dR = rel_est @ rel_gt.T
            c = np.clip((np.trace(dR) - 1) / 2, -1, 1)
            rel_errs.append(np.degrees(np.arccos(c)))
    return center_err / max(scale, 1e-12), float(np.mean(rel_errs))


def reference_reproj_rms(pipeline) -> float:
    """Sparse reprojection RMS over the reference pipeline's own
    observations (its state after reconstruct(); the reference only prints
    this during BA, sfm_pipeline.py:725-776)."""
    errs = []
    K = pipeline.camera.K
    for pid, obs in pipeline.observations.items():
        if pid not in pipeline.points_3d:
            continue
        X = pipeline.points_3d[pid]
        for img_idx, kp_idx in obs:
            if img_idx not in pipeline.poses:
                continue
            pose = pipeline.poses[img_idx]
            Xc = pose.R @ X + pose.t
            if Xc[2] <= 1e-9:
                continue
            uv = K @ (Xc / Xc[2])
            x, y = pipeline._get_keypoint_pt(img_idx, kp_idx)
            errs.append((uv[0] - x) ** 2 + (uv[1] - y) ** 2)
    return float(np.sqrt(np.mean(errs))) if errs else float("nan")


def run_reference(gt: dict, max_images=None) -> dict:
    sys.path.insert(0, str(REFERENCE))
    from src.core.sfm_pipeline import SfMPipeline as RefPipeline

    t0 = time.time()
    buf = io.StringIO()
    with redirect_stdout(buf):
        pipe = RefPipeline(calibration_path=gt["calib"])
        points, colors, poses = pipe.reconstruct(gt["image_dir"], max_images)
    wall = time.time() - t0
    center_rel, rot_deg = pose_errors_vs_gt(poses, gt["Rs"], gt["ts"])
    return {
        "name": "reference (OpenCV, CPU)",
        "cameras": len(poses),
        "points": len(points),
        "reproj_rms_px": reference_reproj_rms(pipe),
        "center_err_rel": center_rel,
        "rel_rot_deg": rot_deg,
        "wall_s": wall,
    }


def run_ours(gt: dict, max_images=None, mode: str = "incremental",
             runs: int = 1) -> dict:
    """runs=2 reports the SECOND in-process run's wall-clock: every stage
    program is jit-cached and the tunnel's one-off first-fetch stall is
    already paid, so run 2 is the steady state a warm service sees (the
    reference has no compilation, so its run 1 is already steady)."""
    sys.path.insert(0, str(REPO))
    from recon3d_tpu.sfm.pipeline import SfMPipeline

    for r in range(max(runs, 1)):
        t0 = time.time()
        pipe = SfMPipeline(calibration_path=gt["calib"])
        if mode == "global":
            points, colors, poses = pipe.reconstruct_global(
                gt["image_dir"], max_images
            )
        else:
            points, colors, poses = pipe.reconstruct(
                gt["image_dir"], max_images
            )
        wall = time.time() - t0
        print(f"[parity] ours run {r + 1}/{runs}: {wall:.1f}s")
    center_rel, rot_deg = pose_errors_vs_gt(poses, gt["Rs"], gt["ts"])
    return {
        "name": "recon3d_tpu" + ("" if mode == "incremental" else f" ({mode})")
        + (" (steady-state)" if runs > 1 else ""),
        "cameras": len(poses),
        "points": len(points),
        "reproj_rms_px": float(pipe.stats["mean_reproj_px"]),
        "center_err_rel": center_rel,
        "rel_rot_deg": rot_deg,
        "wall_s": wall,
    }


def format_md(rows, n_views, image_size, platform) -> str:
    lines = [
        "# Parity run: reference vs recon3d_tpu",
        "",
        f"Same {n_views} rendered views ({image_size[0]}x{image_size[1]}, "
        "tests/render.py arc scene), same calibration file, both pipelines' "
        "default sparse settings. Reference is "
        "/root/reference src.core.sfm_pipeline (OpenCV, CPU); ours ran on "
        f"platform `{platform}`. Camera-center error is Umeyama-aligned and "
        "relative to the GT camera-center spread; rotation error is the mean "
        "over pairwise relative rotations; reprojection RMS is over each "
        "pipeline's own observation set.",
        "",
        "| pipeline | cameras | points | reproj RMS (px) | center err (rel) "
        "| rel-rot err (deg) | wall (s) |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['name']} | {r['cameras']}/{n_views} | {r['points']} "
            f"| {r['reproj_rms_px']:.3f} | {r['center_err_rel']:.4f} "
            f"| {r['rel_rot_deg']:.3f} | {r['wall_s']:.1f} |"
        )
    lines.append("")
    lines.append(
        "Wall-clock caveat: recon3d_tpu's number includes one-time JAX/XLA "
        "compilation of every stage program and (on the tunneled axon TPU) "
        "a first device-to-host fetch stall that can reach minutes — both "
        "one-off costs that amortize away on real (50+ image) scenes; see "
        "BASELINE.md for steady-state per-stage throughput. The accuracy "
        "columns are the parity criterion."
    )
    lines.append("")
    lines.append(f"Generated by scripts/parity_run.py on {time.strftime('%Y-%m-%d')}.")
    lines.append("")
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--workdir", type=str, default="/tmp/parity_scene")
    ap.add_argument("--md", type=str, default=None,
                    help="write the markdown table to this path")
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--runs", type=int, default=1,
                    help="ours runs this many times in-process; the LAST "
                    "run's wall-clock is reported (runs=2 -> steady state: "
                    "jit caches warm, first-fetch stall paid)")
    ap.add_argument("--platform", type=str, default=None,
                    help="force a JAX platform (e.g. cpu) — the axon "
                    "sitecustomize ignores JAX_PLATFORMS, so the override "
                    "must happen via jax.config after import")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    gt = render_scene(Path(args.workdir), args.views, (args.height, args.width))
    rows = []
    if not args.skip_reference:
        rows.append(run_reference(gt))
        print(json.dumps(rows[-1]))
    rows.append(run_ours(gt, runs=args.runs))
    print(json.dumps(rows[-1]))

    import jax

    md = format_md(rows, args.views, (args.height, args.width),
                   jax.default_backend())
    print(md)
    if args.md:
        Path(args.md).write_text(md)
        print(f"wrote {args.md}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
