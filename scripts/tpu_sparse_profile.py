"""Profile the sparse stage's device and host cost terms on the real TPU.

Three questions from the round-2 verdict / round-3 baseline re-measurement
(BASELINE.md: register solve_fetch ~46 s / 11 waves, ba_full prep ~28 s /
8 calls on the north-star run):

1. What does ONE warm PnP registration wave actually cost on-device at
   north-star shapes, and which component (sampling, minimal solves,
   residual scoring, GN polish) dominates?
2. What does bundle_adjust's host prep cost on an otherwise idle host
   (vs the ~3.5 s/call measured mid-run)?
3. The post-device-burst host slowdown (numpy 10-50x slower for tens of
   seconds after heavy device phases): reproduce it minimally and record
   the degradation curve + per-thread CPU attribution to identify the
   mechanism (tunnel relay thread draining? GC? memory pressure?).

Run SERIALLY on an idle host: concurrent CPU work contaminates every number
(measured: register solve 46 -> 115 s when pytest ran alongside).

Usage: python scripts/tpu_sparse_profile.py [--skip-burst]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp


def _force(x):
    """Force device completion: device-side reduce + host fetch (see
    BASELINE.md measurement note — block_until_ready is unreliable through
    the tunneled runtime)."""
    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32)))


def host_workload():
    """Fixed numpy workload (~0.1 s on an idle host): the probe for the
    post-burst slowdown."""
    a = np.random.default_rng(0).normal(size=(400, 4000)).astype(np.float32)
    t0 = time.time()
    for _ in range(3):
        b = np.argsort(a, axis=1)
        c = a[np.arange(a.shape[0])[:, None], b]
        a = np.tanh(c @ np.ones((4000, 64), np.float32)) @ np.ones(
            (64, 4000), np.float32
        ) * 1e-3
    return time.time() - t0


def thread_cpu_times():
    """{tid: (utime, stime)} in clock ticks for every thread of this
    process."""
    out = {}
    task_dir = Path("/proc/self/task")
    for tid in task_dir.iterdir():
        try:
            fields = (tid / "stat").read_text().rsplit(") ", 1)[1].split()
            name = (tid / "comm").read_text().strip()
            out[f"{tid.name}:{name}"] = (int(fields[11]), int(fields[12]))
        except (OSError, IndexError):
            pass
    return out


def profile_post_burst(report: dict):
    print("== post-device-burst host slowdown ==")
    base = [host_workload() for _ in range(3)]
    print(f"baseline host workload: {[f'{t:.3f}' for t in base]} s")

    # heavy device burst: PatchMatch-like warp work + a real fetch
    from recon3d_tpu.dense.patchmatch import patchmatch_depth

    H, W = 120, 160
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.random((H, W)), jnp.float32)
    srcs = jnp.asarray(rng.random((4, H, W)), jnp.float32)
    K = jnp.asarray([[100.0, 0, 80], [0, 100, 60], [0, 0, 1]], jnp.float32)
    Rr = jnp.eye(3)
    tr = jnp.zeros(3)
    Rs = jnp.tile(jnp.eye(3)[None], (4, 1, 1))
    ts_ = jnp.asarray(rng.normal(size=(4, 3)) * 0.1, jnp.float32)
    dr = jnp.asarray([1.0, 5.0], jnp.float32)

    t0 = time.time()
    out = patchmatch_depth(
        ref, srcs, K, Rr, tr, Rs, ts_, dr, jax.random.PRNGKey(0),
        num_iterations=3,
    )
    _force(out.depth)
    print(f"device burst (compile+run+fetch): {time.time() - t0:.1f}s")
    cpu_before = thread_cpu_times()

    curve = []
    t_burst_end = time.time()
    while time.time() - t_burst_end < 45:
        dt = host_workload()
        curve.append((round(time.time() - t_burst_end, 1), round(dt, 3)))
    cpu_after = thread_cpu_times()
    print("slowdown curve (s since burst, workload s):")
    print("  ", curve)
    tick = os.sysconf("SC_CLK_TCK")
    deltas = {}
    for k, (u1, s1) in cpu_after.items():
        u0, s0 = cpu_before.get(k, (0, 0))
        d = (u1 - u0 + s1 - s0) / tick
        if d > 0.5:
            deltas[k] = round(d, 1)
    print(f"thread CPU during probe window (>0.5 s): {deltas}")
    report["post_burst"] = {
        "baseline_s": base, "curve": curve, "thread_cpu_s": deltas,
    }


def profile_pnp_wave(report: dict):
    print("== PnP wave microbench (north-star shapes) ==")
    from recon3d_tpu.ops.estimation import estimate_pose_pnp_wave
    from recon3d_tpu.ops.pnp import pnp_ransac_multi
    from recon3d_tpu.ops.ransac import sample_indices

    rng = np.random.default_rng(1)
    K = jnp.asarray([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]], jnp.float32)
    res = {}
    for B, cap in ((2, 1024), (8, 4096)):
        X = rng.normal(size=(B, cap, 3)).astype(np.float32)
        X[..., 2] += 5
        x = rng.uniform(0, 640, size=(B, cap, 2)).astype(np.float32)
        v = (rng.random((B, cap)) < 0.6).astype(np.float32)
        thr = jnp.asarray([8.0, 10.0, 12.0], jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        args = (keys, K, jnp.asarray(X), jnp.asarray(x), jnp.asarray(v), thr)

        t0 = time.time()
        out = estimate_pose_pnp_wave(*args, num_hypotheses=2048)
        _force(out.num_inliers)
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            out = estimate_pose_pnp_wave(*args, num_hypotheses=2048)
            _force(out.num_inliers)
            times.append(time.time() - t0)
        warm = min(times)
        print(f"B={B} cap={cap}: compile+first {compile_s:.1f}s, "
              f"warm {warm:.3f}s {[f'{t:.3f}' for t in times]}")
        res[f"B{B}_cap{cap}"] = {"compile_s": round(compile_s, 1),
                                 "warm_s": round(warm, 3)}

    # component attribution at B=8, cap=4096 via single-image pieces
    from recon3d_tpu.ops.pnp import project_residuals_batch, refine_pose_gn

    cap = 4096
    Xi = jnp.asarray(rng.normal(size=(cap, 3)).astype(np.float32) + [0, 0, 5])
    xi = jnp.asarray(rng.uniform(0, 640, size=(cap, 2)).astype(np.float32))
    vi = jnp.ones(cap, jnp.float32)

    @jax.jit
    def just_sample(key):
        return sample_indices(key, vi, 2048, 6)

    @jax.jit
    def sample_and_residuals(key):
        from recon3d_tpu.ops.pnp import pnp_dlt
        Kinv = jnp.linalg.inv(K)
        xh = jnp.concatenate([xi, jnp.ones_like(xi[:, :1])], axis=1)
        xn = (Kinv @ xh.T).T[:, :2]
        idx = sample_indices(key, vi, 2048, 6)

        def solve_one(i):
            R, t = pnp_dlt(Xi[i], xn[i], jnp.ones(6), fast=True)
            return jnp.concatenate([R.reshape(9), t])

        models = jax.vmap(solve_one)(idx)
        return project_residuals_batch(K, models, Xi, xi)

    @jax.jit
    def just_polish(key):
        R0 = jnp.eye(3)
        t0_ = jnp.asarray([0.0, 0.0, 1.0])
        return jax.vmap(
            lambda _: refine_pose_gn(K, R0, t0_, Xi, xi, vi, iterations=8)[1]
        )(jnp.arange(3))

    for name, fn in (("sample_topk", just_sample),
                     ("sample+dlt+residuals", sample_and_residuals),
                     ("gn_polish_x3thr", just_polish)):
        fn(jax.random.PRNGKey(0))  # compile
        _force(fn(jax.random.PRNGKey(0)))
        t0 = time.time()
        for r in range(3):
            _force(fn(jax.random.PRNGKey(r)))
        dt = (time.time() - t0) / 3
        print(f"  {name}: {dt*1e3:.1f} ms")
        res[name + "_ms"] = round(dt * 1e3, 1)
    report["pnp_wave"] = res


def profile_ba_prep(report: dict):
    print("== bundle_adjust host prep on idle host ==")
    from recon3d_tpu.sfm.bundle import bundle_adjust
    from recon3d_tpu.config import BundleConfig

    rng = np.random.default_rng(2)
    nC, nP, obs_per_pt = 50, 2500, 7
    K = np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]], np.float32)
    poses = {}
    for c in range(nC):
        th = 0.03 * c
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]], np.float32)
        poses[c] = (R, np.asarray([0.1 * c, 0, 4.0], np.float32))
    points = rng.normal(size=(nP, 3)).astype(np.float32)
    kp_per_img = 8192
    kp_xy = [rng.uniform(0, 640, size=(kp_per_img, 2)).astype(np.float32)
             for _ in range(nC)]
    observations = []
    for p in range(nP):
        cams = rng.choice(nC, size=obs_per_pt, replace=False)
        observations.append(
            [(int(c), int(rng.integers(0, kp_per_img))) for c in cams]
        )
    cfg = BundleConfig()
    stats_list = []
    for rep in range(3):
        _, _, stats = bundle_adjust(
            K, poses, points, observations, kp_xy, cfg,
            max_iterations=2,
        )
        stats_list.append(
            {"prep_s": round(stats.get("prep_s", 0), 3),
             "solve_s": round(stats.get("solve_fetch_s", 0), 3)}
        )
        print(f"rep {rep}: {stats_list[-1]}")
    report["ba_prep_idle"] = stats_list

    # The log path the pipeline actually uses single-device: cold upload,
    # then tail-only appends (the incremental-loop shape).
    from recon3d_tpu.sfm.bundle import bundle_adjust_log

    kp_off = np.zeros(nC + 1, np.int64)
    np.cumsum([len(k) for k in kp_xy], out=kp_off[1:])
    kp_table = (np.concatenate(kp_xy), kp_off)
    log = np.asarray(
        [(p, c, k) for p, obs in enumerate(observations) for (c, k) in obs],
        np.int32,
    )
    cache = {}
    log_stats = []
    for rep, upto in enumerate((len(log) - 2048, len(log) - 1024, len(log))):
        _, _, stats = bundle_adjust_log(
            K, poses, points, log[:upto], kp_table, cfg,
            max_iterations=2, device_cache=cache,
        )
        log_stats.append(
            {"prep_s": round(stats.get("prep_s", 0), 3),
             "solve_s": round(stats.get("solve_fetch_s", 0), 3)}
        )
        print(f"log rep {rep} (O={upto}): {log_stats[-1]}")
    report["ba_log_idle"] = log_stats


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-burst", action="store_true")
    ap.add_argument("--out", type=str, default="/tmp/tpu_sparse_profile.json")
    args = ap.parse_args(argv)
    print(f"platform: {jax.default_backend()}")
    report = {}
    profile_pnp_wave(report)
    profile_ba_prep(report)
    if not args.skip_burst:
        profile_post_burst(report)
    Path(args.out).write_text(json.dumps(report, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
