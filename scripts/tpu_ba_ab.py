"""On-chip A/B: scatter-free bundle adjustment (HEAD) vs the jvp/vjp +
segment_sum formulation it replaced (extracted from git history).

Run on the real TPU: python scripts/tpu_ba_ab.py [--views 40 --points 4000]
"""

import argparse
import importlib.util
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OLD_COMMIT = "6eed90b^"  # parent of the scatter-free rewrite


def make_problem(nC, nP, obs_per_pt=5, seed=0):
    rng = np.random.default_rng(seed)
    K = np.array([[500., 0, 320], [0, 500., 240], [0, 0, 1]], np.float32)
    poses = {}
    for c in range(nC):
        th = 0.6 * np.pi * c / nC
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]], np.float32)
        poses[c] = (R, np.float32([0.1 * c, 0, 6]))
    X = rng.uniform(-2, 2, (nP, 3)).astype(np.float32)
    obs, kp = [], [[] for _ in range(nC)]
    for p in range(nP):
        cams = rng.choice(nC, size=obs_per_pt, replace=False)
        o = []
        for c in cams:
            R, t = poses[c]
            Xc = R @ X[p] + t
            if Xc[2] < 0.1:
                continue
            uv = K @ (Xc / Xc[2])
            o.append((int(c), len(kp[c])))
            kp[c].append(uv[:2] + rng.normal(0, 1.0, 2))
        obs.append(o)
    kp = [np.asarray(k, np.float32).reshape(-1, 2) for k in kp]
    Xn = X + rng.normal(0, 0.05, X.shape).astype(np.float32)
    return K, poses, Xn, obs, kp


def run(mod, tag, problem):
    from recon3d_tpu.config import BundleConfig

    K, poses, X, obs, kp = problem
    cfg = BundleConfig()
    t0 = time.perf_counter()
    _, _, st = mod.bundle_adjust(K, poses, X, obs, kp, cfg)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, _, st = mod.bundle_adjust(K, poses, X, obs, kp, cfg)
    t_warm = time.perf_counter() - t0
    print(f"{tag}: compile+run={t_first:.2f}s warm={t_warm:.2f}s "
          f"rms {st['rms_before']:.3f}->{st['rms_after']:.3f} "
          f"iters={st['iterations']} obs={st['num_obs']}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=40)
    ap.add_argument("--points", type=int, default=4000)
    args = ap.parse_args()
    problem = make_problem(args.views, args.points)

    old_src = subprocess.run(
        ["git", "show", f"{OLD_COMMIT}:recon3d_tpu/sfm/bundle.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    with tempfile.NamedTemporaryFile(
        "w", suffix=".py", delete=False
    ) as f:
        f.write(old_src)
        old_path = f.name
    spec = importlib.util.spec_from_file_location("old_bundle", old_path)
    old = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(old)
    run(old, "old (jvp/vjp + segment_sum)", problem)

    import recon3d_tpu.sfm.bundle as new
    run(new, "new (explicit blocks, scatter-free)", problem)


if __name__ == "__main__":
    main()
