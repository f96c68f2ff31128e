"""The north-star end-to-end scenario, pinned and reproducible.

Renders the canonical 50-view 480x640 box-corner scene (tests/render.py,
arc_step=0.035, arc_offset=0.8575 -> camera angles 0..1.72 rad, all views
facing textured walls), runs the product CLI `--mvs` on it, and reports the
stage table plus quality gates (registered cameras, reprojection error,
similarity-aligned pose error vs the render ground truth).

This is the "full 50-image dense PatchMatch reconstruction" scenario from
BASELINE.json / BASELINE.md; re-run it after perf work and fold the table
into BASELINE.md. Run 1 of a fresh process pays compile + the tunnel's
first-fetch stall; pass --runs 2 and report run 2 (steady state).

Usage: python scripts/northstar_run.py [--workdir /tmp/northstar] [--runs 2]
       [--keep] [--flags --mesh ...]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_VIEWS = 50
IMAGE_SIZE = (480, 640)
ARC_STEP = 0.035
ARC_OFFSET = ARC_STEP * (N_VIEWS - 1) / 2.0  # thetas 0 .. 1.715 rad


def render(workdir: Path) -> None:
    from PIL import Image

    from tests.render import render_views

    img_dir = workdir / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    scene = render_views(
        n_views=N_VIEWS, image_size=IMAGE_SIZE, arc_step=ARC_STEP,
        arc_offset=ARC_OFFSET,
    )
    for i, img in enumerate(scene["images"]):
        Image.fromarray((img * 255).astype(np.uint8)).save(
            img_dir / f"view_{i:03d}.png"
        )
    np.savez(
        workdir / "calibration.npz",
        mtx=np.asarray(scene["K"], np.float64), dist=np.zeros(5),
    )
    np.savez(workdir / "gt_poses.npz", Rs=scene["Rs"], ts=scene["ts"])


def umeyama(src: np.ndarray, dst: np.ndarray):
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var = (xs**2).sum() / len(src)
    s = float(np.trace(np.diag(D) @ S) / var) if var > 0 else 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def pose_errors(workdir: Path, stats: dict) -> dict:
    """Similarity-align estimated camera centers to GT; rotation + center
    errors over the registered subset."""
    gt = np.load(workdir / "gt_poses.npz")
    est = np.load(workdir / "recon" / "poses.npz")
    ids = est["image_ids"].astype(int)
    Rs_e, ts_e = est["Rs"], est["ts"]
    Rs_g, ts_g = gt["Rs"][ids], gt["ts"][ids]
    C_e = -np.einsum("vij,vi->vj", Rs_e, ts_e)
    C_g = -np.einsum("vij,vi->vj", Rs_g, ts_g)
    s, R, t = umeyama(C_e, C_g)
    center_err = np.linalg.norm((s * C_e @ R.T + t) - C_g, axis=1)
    rot_errs = []
    for Re, Rg in zip(Rs_e, Rs_g):
        dR = Rg @ (Re @ R.T).T
        c = np.clip((np.trace(dR) - 1) / 2, -1, 1)
        rot_errs.append(np.degrees(np.arccos(c)))
    return {
        "mean_center_err": float(center_err.mean()),
        "max_center_err": float(center_err.max()),
        "mean_rot_err_deg": float(np.mean(rot_errs)),
        "max_rot_err_deg": float(np.max(rot_errs)),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=str, default="/tmp/northstar_canon")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--keep", action="store_true",
                    help="reuse an existing rendered workdir")
    ap.add_argument("--in-process", action="store_true",
                    help="invoke the CLI main() in THIS process instead of "
                    "a subprocess per run: run 2+ then measures true "
                    "steady state (jit caches live, first-fetch stall and "
                    "per-program persistent-cache deserialization already "
                    "paid) — per-process overheads dominate the subprocess "
                    "numbers on the tunneled host (BASELINE.md)")
    ap.add_argument("--flags", nargs=argparse.REMAINDER, default=[],
                    help="extra CLI flags (default: --mvs)")
    args = ap.parse_args(argv)

    workdir = Path(args.workdir)
    if workdir.exists() and not args.keep:
        shutil.rmtree(workdir)
    if not (workdir / "images").exists():
        print("rendering scene ...")
        render(workdir)

    flags = args.flags or ["--mvs"]
    results = []
    for run in range(1, args.runs + 1):
        stats_path = workdir / f"stats_run{run}.json"
        cli_args = [
            str(workdir / "images"),
            *flags,
            "--calibration", str(workdir / "calibration.npz"),
            "--stats-json", str(stats_path),
            "--output", str(workdir / "recon"),
        ]
        t0 = time.time()
        if args.in_process:
            from recon3d_tpu.cli import main as cli_main

            rc = cli_main(cli_args)
        else:
            cmd = [sys.executable, "-m", "recon3d_tpu.cli", *cli_args]
            env = dict(os.environ)
            env["PYTHONPATH"] = os.pathsep.join(
                p for p in (env.get("PYTHONPATH", ""), str(REPO)) if p
            )
            rc = subprocess.run(cmd, env=env).returncode
        wall = time.time() - t0
        if rc != 0:
            print(f"run {run} FAILED rc={rc}")
            return 1
        stats = json.loads(stats_path.read_text())
        stats["wall_s"] = wall
        results.append(stats)
        print(f"run {run}: wall={wall:.1f}s cameras={stats['num_cameras']}"
              f"/{N_VIEWS} points={stats['num_points']} "
              f"reproj={stats['mean_reproj_px']:.3f}px")

    final = results[-1]
    if (workdir / "recon" / "poses.npz").exists():
        final["pose_errors"] = pose_errors(workdir, final)
    print(json.dumps(final, indent=2, default=float))

    ok = (final["num_cameras"] >= int(0.94 * N_VIEWS)
          and final["mean_reproj_px"] < 1.5)
    print("QUALITY GATE:", "PASS" if ok else "FAIL",
          f"({final['num_cameras']}/{N_VIEWS} cams, "
          f"{final['mean_reproj_px']:.3f} px)")
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
