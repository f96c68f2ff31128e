"""Per-stage throughput benchmarks (round-over-round regression tracking).

bench.py prints the single north-star JSON line (PatchMatch MP/s/chip) for
the driver; this tool measures every hot stage so regressions are visible
per component (VERDICT r1 #5):

- sift_extract_ms_per_image   batched SIFT on 480x640 frames
- match_pairs_per_s           streaming matcher + F-RANSAC verified pairs
- plane_sweep_mp_s            64-plane sweep depth-map pixels/s
- patchmatch_mp_s             bench.py's metric, same config

Prints one JSON line per metric; --md writes a markdown table.

Usage: python scripts/bench_stages.py [--md docs/bench_stages.md]
                                      [--platform cpu] [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _force(out):
    """Force completion of `out` by fetching a device-side scalar reduce.

    jax.block_until_ready does NOT reliably synchronize through the
    tunneled axon runtime (it returns after dispatch); only a host fetch
    proves the computation ran. Reducing on device first keeps the fetch
    to 4 bytes instead of shipping the arrays over the link.
    """
    import jax
    import jax.numpy as jnp

    leaves = [
        jnp.sum(l)
        for l in jax.tree_util.tree_leaves(out)
        if hasattr(l, "dtype")
    ]
    if leaves:
        float(jnp.asarray([jnp.asarray(s, jnp.float32) for s in leaves]).sum())


def _steady(fn, block=None, windows=3, reps=4):
    """Best-window steady-state seconds per call (compile excluded)."""
    _force(fn())  # warm-up / compile
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        _force(outs)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def bench_sift(quick=False):
    """Batched SIFT extraction, measured on RENDERED scene views (the
    product workload: a few hundred keypoints against the 8k budget, so
    the two-phase describe runs at small slot buckets). Until round 5
    this benchmarked pure value-noise images, which saturate every
    octave's detection cap and force worst-case describe buckets —
    that's why bench_stages' 137.8 ms/img never matched the north-star
    run's ~66 ms/img (VERDICT r4 #2: 'self-inconsistent published
    numbers'). The saturated case is still reported as sift_extract_max.
    """
    import jax

    from recon3d_tpu.features.frontend import FeatureExtractor
    from tests.render import render_views

    B = 4 if quick else 8
    scene = render_views(n_views=B, image_size=(480, 640), arc_step=0.08)
    imgs = np.stack(
        [im.mean(-1) for im in scene["images"]]
    ).astype(np.float32)
    ex = FeatureExtractor()
    dt = _steady(lambda: ex.extract_batch(imgs))

    rng = np.random.default_rng(0)
    noise = rng.random((B, 480, 640), np.float32)
    dt_max = _steady(lambda: ex.extract_batch(noise))
    return {"metric": "sift_extract", "value": round(dt / B * 1e3, 2),
            "unit": "ms/image",
            "saturated_ms_per_image": round(dt_max / B * 1e3, 2)}


def bench_match(quick=False):
    import jax

    from recon3d_tpu.features.frontend import (
        FeatureExtractor,
        match_pairs_batched,
    )
    from tests.render import render_views

    n = 6 if quick else 10
    scene = render_views(n_views=n, image_size=(480, 640), arc_step=0.08)
    grays = np.stack([im.mean(-1) for im in scene["images"]]).astype(np.float32)
    ex = FeatureExtractor()
    feats = ex.extract_batch(grays)
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]

    def run(tm=None):
        return match_pairs_batched(
            feats, pairs, jax.random.PRNGKey(0), chunk=len(pairs),
            timings=tm,
        )

    _force(run())  # compile
    t0 = time.perf_counter()
    reps = 3
    seg_reps = []
    for _ in range(reps):
        tm = {}
        _force(run(tm))
        seg_reps.append(tm)
    dt = (time.perf_counter() - t0) / reps
    # per-segment min/max across reps: attributes the stage's spread to
    # relay-side windows (fetch/pull) vs host compute (VERDICT r4 #7)
    segments = {
        k: [round(r[k], 3) for r in seg_reps] for k in seg_reps[0]
    }
    return {"metric": "match_verify", "value": round(len(pairs) / dt, 1),
            "unit": "pairs/s", "segments_s": segments}


def bench_plane_sweep(quick=False):
    import jax
    import jax.numpy as jnp

    from recon3d_tpu.dense.plane_sweep import sweep_depth_map

    # 4-view vmapped batch + 16 reps: the product path sweeps views as one
    # vmapped batch, and a single 19200-px view per dispatch measures the
    # tunnel's per-dispatch RTT, not device throughput (the old single-view
    # figure of 1.8 MP/s was that artifact; see docs/perf_model.md).
    rng = np.random.default_rng(0)
    Hs, Ws, J, V = 120, 160, 5, 4
    K = jnp.asarray(
        np.array([[125.0, 0, Ws / 2], [0, 125.0, Hs / 2], [0, 0, 1]],
                 np.float32)
    )
    refs = jnp.asarray(rng.random((V, Hs, Ws), np.float32))
    srcs = jnp.asarray(rng.random((V, J, Hs, Ws), np.float32))
    Rr = jnp.broadcast_to(jnp.eye(3), (V, 3, 3))
    tr = jnp.zeros((V, 3))
    Rsrc = jnp.broadcast_to(jnp.eye(3), (V, J, 3, 3))
    tsrc = jnp.asarray(np.broadcast_to(
        np.stack([[0.3 * (i + 1), 0, 0] for i in range(J)]).astype(np.float32),
        (V, J, 3),
    ))
    dr = jnp.broadcast_to(jnp.asarray([0.5, 10.0], jnp.float32), (V, 2))

    fn = jax.jit(
        lambda: jax.vmap(
            lambda a, b, c, d, e, g, h: sweep_depth_map(a, b, K, c, d, e, g, h)
        )(refs, srcs, Rr, tr, Rsrc, tsrc, dr)
    )
    dt = _steady(fn, reps=16)
    return {"metric": "plane_sweep", "value": round(Hs * Ws * V / 1e6 / dt, 2),
            "unit": "MP/s"}


def bench_patchmatch(quick=False):
    import bench

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    row = json.loads(buf.getvalue().strip().splitlines()[-1])
    return {"metric": "patchmatch_mvs", "value": row["value"],
            "unit": row["unit"], "vs_baseline": row.get("vs_baseline")}


def bench_bundle(quick=False):
    """Full-BA wall-clock at e2e scale (LM loop incl. robust reweighting,
    Schur-CG solves, accept/reject) — seconds per accepted LM iteration."""
    import time as _t

    from recon3d_tpu.config import BundleConfig
    from recon3d_tpu.sfm.bundle import bundle_adjust

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from tpu_ba_ab import make_problem

    nC, nP = (12, 1200) if quick else (40, 4000)
    problem = make_problem(nC, nP)
    cfg = BundleConfig()
    bundle_adjust(*problem, cfg)  # compile
    t0 = _t.perf_counter()
    _, _, st = bundle_adjust(*problem, cfg)
    dt = _t.perf_counter() - t0
    iters = max(st.get("iterations", 1), 1)
    return {"metric": "bundle_adjust_full",
            "value": round(dt / iters * 1e3, 1),
            "unit": f"ms/LM-iter ({nC}cam/{nP}pt)"}


def bench_tsdf(quick=False):
    """TSDF integration throughput: voxel-observations/s (one view's
    contribution to every voxel counts as resolution^3 observations)."""
    from recon3d_tpu.dense.tsdf import fuse_tsdf

    res = 64 if quick else 128
    V, H, W = 8, 120, 160
    rng = np.random.default_rng(0)
    K = np.array([[130.0, 0, W / 2], [0, 130.0, H / 2], [0, 0, 1]],
                 np.float32)
    depths = (rng.random((V, H, W)) * 2 + 2).astype(np.float32)
    Rs = np.broadcast_to(np.eye(3, dtype=np.float32), (V, 3, 3)).copy()
    ts = np.stack([np.float32([0.1 * i, 0, 0]) for i in range(V)])
    bounds = (np.float32([-2, -2, 1]), np.float32([2, 2, 5]))

    def run(tm=None):
        return fuse_tsdf(depths, None, K, Rs, ts, bounds=bounds,
                         resolution=res, timings=tm).tsdf

    run()  # compile (fuse_tsdf returns host arrays: already forced)
    t0 = time.perf_counter()
    reps = 3
    seg_reps = []
    for _ in range(reps):
        tm = {}
        run(tm)
        seg_reps.append(tm)
    dt = (time.perf_counter() - t0) / reps
    segments = {
        k: [round(r[k], 3) for r in seg_reps] for k in seg_reps[0]
    }
    return {"metric": "tsdf_integration",
            "value": round(V * res**3 / dt / 1e6, 1),
            "unit": f"Mvoxel-obs/s (res {res})", "segments_s": segments}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--md", type=str, default=None)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip", nargs="*", default=[],
                    choices=["sift", "match", "sweep", "patchmatch",
                             "bundle", "tsdf"])
    ap.add_argument("--repeat", type=int, default=1,
                    help="run each selected stage N times in-process "
                         "(stability check: the host-transient caveat in "
                         "BASELINE.md predicts >20%% spread for host-heavy "
                         "stages; the round-3 fix targets <=20%%)")
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    benches = [
        ("sift", bench_sift),
        ("match", bench_match),
        ("sweep", bench_plane_sweep),
        ("patchmatch", bench_patchmatch),
        ("bundle", bench_bundle),
        ("tsdf", bench_tsdf),
    ]
    rows = []
    for name, fn in benches:
        if name in args.skip:
            continue
        vals = []
        for rep in range(max(1, args.repeat)):
            row = fn(quick=args.quick)
            vals.append(row["value"])
            print(json.dumps(row))
        if len(vals) > 1:
            lo, hi = min(vals), max(vals)
            spread = (hi - lo) / max(abs(hi), 1e-9)
            print(json.dumps({
                "metric": f"{row['metric']}_stability",
                "runs": vals, "spread_pct": round(100 * spread, 1),
                "within_20pct": bool(spread <= 0.20),
            }))
        rows.append(row)

    if args.md:
        import jax

        lines = [
            "# Per-stage benchmarks",
            "",
            f"Platform `{jax.default_backend()}`, steady-state (compile "
            "excluded, best window). Regenerate with scripts/bench_stages.py.",
            "",
            "| stage | value | unit |",
            "|---|---|---|",
        ]
        for r in rows:
            lines.append(f"| {r['metric']} | {r['value']} | {r['unit']} |")
        lines += [
            "",
            "**Measurement note (important):** `jax.block_until_ready` does "
            "NOT reliably synchronize through the tunneled axon runtime — it "
            "can return after dispatch, before the device work ran. Timings "
            "taken with it (including the `BENCH_r01.json` figure of 256.9 "
            "MP/s and earlier per-stage claims like \"SIFT 118 ms/img\") "
            "measured dispatch latency, not compute. All numbers above force "
            "completion by fetching a device-side reduction of the outputs — "
            "see `_force()` in scripts/bench_stages.py.",
            "",
            f"Generated {time.strftime('%Y-%m-%d')}.",
            "",
        ]
        Path(args.md).write_text("\n".join(lines))
        print(f"wrote {args.md}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
