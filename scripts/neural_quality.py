"""Neural-vs-SIFT frontend quality on photographic-texture renders.

Evaluates SuperPoint (bundled synthetic-pretrained weights) against the
from-scratch SIFT on the tests/render.py value-noise scenes — a texture
distribution the neural weights were NOT trained on (their corpus is the
shapes dataset), so this measures generalization the way the reference's
published-weight path would face real photos (neural_matcher.py:101-147).

Metrics per view pair, using GT depth for correspondence:
- repeatability: fraction of detected keypoints in view A whose GT
  reprojection into view B lands within eps of a detected keypoint in B
  (covisible keypoints only; occlusions excluded via the depth map).
- match precision: fraction of each matcher's geometric-verified matches
  that agree with GT reprojection within eps.
- correct matches: absolute number of GT-consistent matches surviving
  verification (the quantity SfM registration actually consumes).

Usage: python scripts/neural_quality.py [--md docs/neural_quality.md]
                                        [--platform cpu]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

EPS_PX = 3.0


def gt_project(xy, depth_a, K, Ra, ta, Rb, tb):
    """Project pixels of view A into view B via GT depth.

    xy: (N, 2) pixels in A. Returns (uv_b (N,2), z_b (N,), has_depth (N,))
    — caller applies bounds/occlusion checks.
    """
    x = np.clip(np.round(xy[:, 0]).astype(int), 0, depth_a.shape[1] - 1)
    y = np.clip(np.round(xy[:, 1]).astype(int), 0, depth_a.shape[0] - 1)
    d = depth_a[y, x]
    has = d > 0
    rays = np.stack(
        [(xy[:, 0] - K[0, 2]) / K[0, 0], (xy[:, 1] - K[1, 2]) / K[1, 1],
         np.ones(len(xy))], -1,
    )
    Xc = rays * d[:, None]
    Xw = (Xc - ta) @ Ra  # R^T (Xc - t)
    Xb = Xw @ Rb.T + tb
    z = Xb[:, 2]
    uv = np.stack(
        [K[0, 0] * Xb[:, 0] / np.maximum(z, 1e-9) + K[0, 2],
         K[1, 1] * Xb[:, 1] / np.maximum(z, 1e-9) + K[1, 2]], -1,
    )
    return uv, z, has


def covisible_mask(uv, z, has, depth_b, tol=0.03):
    """In-bounds, positive-depth, and not occluded in view B."""
    H, W = depth_b.shape
    inb = (
        has & (z > 1e-6)
        & (uv[:, 0] >= 0) & (uv[:, 0] <= W - 1)
        & (uv[:, 1] >= 0) & (uv[:, 1] <= H - 1)
    )
    xb = np.clip(np.round(uv[:, 0]).astype(int), 0, W - 1)
    yb = np.clip(np.round(uv[:, 1]).astype(int), 0, H - 1)
    db = depth_b[yb, xb]
    vis = inb & (db > 0) & (np.abs(db - z) < tol * np.maximum(db, 1e-6))
    return vis


def repeatability(xy_a, valid_a, xy_b, valid_b, scene, a, b, eps=EPS_PX):
    """Fraction of A's covisible keypoints with a B keypoint within eps."""
    ka = np.asarray(xy_a)[np.asarray(valid_a) > 0]
    kb = np.asarray(xy_b)[np.asarray(valid_b) > 0]
    if len(ka) == 0 or len(kb) == 0:
        return 0.0, 0
    uv, z, has = gt_project(
        ka, scene["depth"][a], scene["K"],
        scene["Rs"][a], scene["ts"][a], scene["Rs"][b], scene["ts"][b],
    )
    vis = covisible_mask(uv, z, has, scene["depth"][b])
    if vis.sum() == 0:
        return 0.0, 0
    d = np.linalg.norm(uv[vis][:, None, :] - kb[None, :, :], axis=-1)
    return float((d.min(axis=1) <= eps).mean()), int(vis.sum())


def match_metrics(xy1, xy2, idx1, idx2, mask, scene, a, b, eps=EPS_PX):
    """(precision, n_correct, n_matches) of verified matches vs GT."""
    sel = np.asarray(mask) > 0
    if sel.sum() == 0:
        return 0.0, 0, 0
    p1 = np.asarray(xy1)[np.asarray(idx1)[sel]]
    p2 = np.asarray(xy2)[np.asarray(idx2)[sel]]
    uv, z, has = gt_project(
        p1, scene["depth"][a], scene["K"],
        scene["Rs"][a], scene["ts"][a], scene["Rs"][b], scene["ts"][b],
    )
    vis = covisible_mask(uv, z, has, scene["depth"][b])
    err = np.linalg.norm(uv - p2, axis=-1)
    correct = vis & (err <= eps)
    n = int(sel.sum())
    return float(correct.sum() / n), int(correct.sum()), n


def evaluate(pairs=((0, 1), (1, 2), (2, 3)), image_size=(192, 256),
             sp_weights=None, lg_weights=None):
    import jax

    from tests.render import render_views

    from recon3d_tpu.config import MatchConfig, NeuralConfig
    from recon3d_tpu.features.frontend import FeatureExtractor, FeatureMatcher
    from recon3d_tpu.neural.matcher import NeuralMatcher

    scene = render_views(n_views=4, image_size=image_size, arc_step=0.15)
    grays = [im.mean(-1).astype(np.float32) for im in scene["images"]]

    rows = {}

    # ---- SIFT frontend
    ex = FeatureExtractor()
    fm = FeatureMatcher(MatchConfig())
    sift_feats = [ex.extract(g) for g in grays]
    rep, prec, corr, tot = [], [], [], []
    for (a, b) in pairs:
        r, _ = repeatability(
            sift_feats[a].xy, sift_feats[a].valid,
            sift_feats[b].xy, sift_feats[b].valid, scene, a, b,
        )
        rep.append(r)
        m, F, n_inl = fm.match_pair_geometric(
            sift_feats[a], sift_feats[b], jax.random.PRNGKey(7)
        )
        p, c, n = match_metrics(
            sift_feats[a].xy, sift_feats[b].xy, m.idx1, m.idx2, m.mask,
            scene, a, b,
        )
        prec.append(p)
        corr.append(c)
        tot.append(n)
    rows["SIFT (ours)"] = (np.mean(rep), np.mean(prec), np.mean(corr), np.mean(tot))

    # ---- neural frontends (both matcher backends share SuperPoint kps)
    for kind in ("nn", "lightglue"):
        try:
            nm = NeuralMatcher(NeuralConfig(
                max_keypoints=1024, matcher=kind,
                superpoint_weights=sp_weights, lightglue_weights=lg_weights,
            ))
        except Exception as e:  # no bundled checkpoint for this backend
            print(f"[skip] {kind}: {e}")
            continue
        feats = [nm.extract(g) for g in grays]
        rep, prec, corr, tot = [], [], [], []
        for (a, b) in pairs:
            r, _ = repeatability(
                feats[a].xy, feats[a].valid,
                feats[b].xy, feats[b].valid, scene, a, b,
            )
            rep.append(r)
            m, F, n_inl = nm.match_pair_geometric(
                feats[a], feats[b], jax.random.PRNGKey(7)
            )
            p, c, n = match_metrics(
                feats[a].xy, feats[b].xy, m.idx1, m.idx2, m.mask,
                scene, a, b,
            )
            prec.append(p)
            corr.append(c)
            tot.append(n)
        rows[f"SuperPoint+{kind}"] = (
            np.mean(rep), np.mean(prec), np.mean(corr), np.mean(tot)
        )
    return rows


def format_md(rows) -> str:
    lines = [
        "# Neural frontend quality on photographic texture",
        "",
        "Value-noise rendered scenes (tests/render.py, 4 views, 192x256 — "
        "OUT of the neural weights' shapes training distribution), GT-depth "
        "correspondence, eps = 3 px. Repeatability = covisible keypoints of "
        "view A re-detected in view B; precision = GT-consistent fraction of "
        "geometric-verified matches; correct = absolute GT-consistent match "
        "count per pair (what SfM registration consumes). Mean over 3 "
        "adjacent pairs.",
        "",
        "| frontend | repeatability | match precision | correct matches | total matches |",
        "|---|---|---|---|---|",
    ]
    for name, (r, p, c, n) in rows.items():
        lines.append(f"| {name} | {r:.3f} | {p:.3f} | {c:.0f} | {n:.0f} |")
    lines += [
        "",
        "The bundled neural checkpoints are trained in-repo "
        "(recon3d_tpu/neural/pretrain.py): SuperPoint on the shapes corpus "
        "plus a homographic-adaptation phase on pseudo-labeled value-noise "
        "textures (which lifted texture repeatability 0.456 -> 0.66 and nn "
        "precision 0.64 -> 0.88); LightGlue on shapes+texture pairs with "
        "keypoint-density augmentation, with per-pair mutual-NN fallback "
        "when the attention matcher abstains. For published-weight quality "
        "load torch checkpoints via neural/weights.py (conversion proven "
        "in tests/test_weights.py).",
        "",
        f"Generated by scripts/neural_quality.py on {time.strftime('%Y-%m-%d')}.",
        "",
    ]
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--md", type=str, default=None)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--superpoint", type=str, default=None,
                    help="override SuperPoint checkpoint (.npz or torch .pth)")
    ap.add_argument("--lightglue", type=str, default=None,
                    help="override LightGlue checkpoint (.npz or torch .pth)")
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    rows = evaluate(sp_weights=args.superpoint, lg_weights=args.lightglue)
    md = format_md(rows)
    print(md)
    if args.md:
        Path(args.md).write_text(md)
        print(f"wrote {args.md}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
