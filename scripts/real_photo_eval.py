"""First real-sensor validation: our SIFT frontend vs OpenCV on the two
real photographs the reference bundles (docs/images/kitchen_input.JPG,
room_input.JPG — 12 MP phone captures with real noise, JPEG artifacts,
and natural texture statistics; VERDICT r4 #4).

Everything quality-graded so far ran on rendered value-noise scenes; this
script measures, on real sensor data:

  1. keypoint counts at the pipeline's detection settings,
  2. repeatability under synthetic warps OF THE REAL IMAGE (in-plane
     rotation, scale, projective), where the warp gives exact ground
     truth,
  3. match precision between two overlapping crops (pure translation =>
     exact GT correspondence), ours vs an OpenCV SIFT+BF+ratio pipeline,
  4. CLAHE behavior on real luminance (keypoint yield with/without).

Usage:  python scripts/real_photo_eval.py [--out docs/real_photos.md]
        (runs on whatever JAX platform is active; CPU is fine)
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REF_IMAGES = [
    Path("/root/reference/docs/images/kitchen_input.JPG"),
    Path("/root/reference/docs/images/room_input.JPG"),
]
WORK_MAX_DIM = 640  # the pipeline's load-time working resolution


def load_gray(path: Path, max_dim: int = WORK_MAX_DIM) -> np.ndarray:
    from PIL import Image

    im = Image.open(path).convert("L")
    w, h = im.size
    s = max_dim / max(w, h)
    im = im.resize((int(round(w * s)), int(round(h * s))), Image.BILINEAR)
    return np.asarray(im, np.float32) / 255.0


def _ours_extract(gray: np.ndarray, clahe: bool = True):
    from recon3d_tpu.config import SiftConfig
    from recon3d_tpu.features.frontend import FeatureExtractor

    ex = FeatureExtractor(SiftConfig(clahe=clahe))
    f = ex.extract(gray)
    xy = np.asarray(f.xy)[np.asarray(f.valid)]
    return f, xy


def _cv_extract(gray: np.ndarray, clahe: bool = True):
    import cv2

    g8 = (gray * 255).astype(np.uint8)
    if clahe:
        g8 = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(g8)
    sift = cv2.SIFT_create(nfeatures=8000, contrastThreshold=0.03,
                           edgeThreshold=15)
    kp, desc = sift.detectAndCompute(g8, None)
    return kp, desc, np.float32([k.pt for k in kp])


def _warp_image(gray: np.ndarray, H: np.ndarray) -> np.ndarray:
    import cv2

    h, w = gray.shape
    return cv2.warpPerspective(gray, H.astype(np.float32), (w, h),
                               flags=cv2.INTER_LINEAR)


def _apply_H(H: np.ndarray, xy: np.ndarray) -> np.ndarray:
    p = np.concatenate([xy, np.ones((len(xy), 1))], axis=1) @ H.T
    return p[:, :2] / np.maximum(p[:, 2:3], 1e-9)


def _repeatability(xy_a, xy_b, H, shape, tol=2.0):
    """Fraction of A-keypoints, projected into B by H and landing inside
    the frame, that have a B-keypoint within tol px."""
    proj = _apply_H(H, xy_a)
    h, w = shape
    inside = (
        (proj[:, 0] >= 8) & (proj[:, 0] < w - 8)
        & (proj[:, 1] >= 8) & (proj[:, 1] < h - 8)
    )
    proj = proj[inside]
    if len(proj) == 0 or len(xy_b) == 0:
        return 0.0, 0
    from scipy.spatial import cKDTree

    d, _ = cKDTree(xy_b).query(proj, k=1)
    return float((d <= tol).mean()), int(inside.sum())


def _warps(shape):
    import cv2

    h, w = shape
    c = (w / 2.0, h / 2.0)
    rot15 = np.eye(3)
    rot15[:2] = cv2.getRotationMatrix2D(c, 15.0, 1.0)
    scale08 = np.eye(3)
    scale08[:2] = cv2.getRotationMatrix2D(c, 0.0, 0.8)
    proj = np.array(
        [[1.0, 0.03, 5.0], [0.02, 1.0, -4.0], [4e-5, 3e-5, 1.0]]
    )
    return {"rot15": rot15, "scale0.8": scale08, "proj": proj}


def eval_repeatability(gray, tol=2.0):
    rows = {}
    for name, H in _warps(gray.shape).items():
        warped = _warp_image(gray, H)
        _, xy_a = _ours_extract(gray)
        _, xy_b = _ours_extract(warped)
        r_ours, n_ours = _repeatability(xy_a, xy_b, H, gray.shape, tol)
        _, _, cxy_a = _cv_extract(gray)
        _, _, cxy_b = _cv_extract(warped)
        r_cv, n_cv = _repeatability(cxy_a, cxy_b, H, gray.shape, tol)
        rows[name] = (r_ours, n_ours, r_cv, n_cv)
    return rows


def eval_crop_precision(gray, crop=(384, 512), shift=(64, 48), tol=2.0):
    """Two overlapping crops of the real photo: GT correspondence is the
    integer translation, so match precision is exact."""
    ch, cw = crop
    dy, dx = shift
    a = gray[:ch, :cw]
    b = gray[dy : dy + ch, dx : dx + cw]

    # ours: extract + ratio/cross-check + F-RANSAC (the pipeline's own path)
    import jax

    from recon3d_tpu.config import MatchConfig
    from recon3d_tpu.features.frontend import match_pairs_batched

    fa, _ = _ours_extract(a)
    fb, _ = _ours_extract(b)
    (_, _, idx1, idx2, _, n_inl, _) = match_pairs_batched(
        [fa, fb], [(0, 1)], jax.random.PRNGKey(0), MatchConfig()
    )[0]
    xa = np.asarray(fa.xy)[idx1]
    xb = np.asarray(fb.xy)[idx2]
    err = np.linalg.norm(xa - np.array([dx, dy]) - xb, axis=1)
    ours = (float((err <= tol).mean()) if len(err) else 0.0, len(err))

    # OpenCV: SIFT + BF ratio + F-RANSAC
    import cv2

    kpa, da, _ = _cv_extract(a)
    kpb, db, _ = _cv_extract(b)
    good = [
        m for m, n in cv2.BFMatcher().knnMatch(da, db, k=2)
        if m.distance < 0.75 * n.distance
    ]
    pa = np.float32([kpa[m.queryIdx].pt for m in good])
    pb = np.float32([kpb[m.trainIdx].pt for m in good])
    ncv, errcv = 0, np.array([])
    if len(pa) >= 8:
        _, inl = cv2.findFundamentalMat(pa, pb, cv2.FM_RANSAC, 2.0, 0.999)
        if inl is not None:
            keep = inl.ravel() == 1
            errcv = np.linalg.norm(
                pa[keep] - np.array([dx, dy]) - pb[keep], axis=1
            )
            ncv = int(keep.sum())
    cv = (float((errcv <= tol).mean()) if len(errcv) else 0.0, ncv)
    return ours, cv


def _sp_extract(gray: np.ndarray):
    """Bundled-SuperPoint keypoints on a real photo (pipeline settings)."""
    global _SP_MATCHER
    from recon3d_tpu.neural.matcher import NeuralMatcher

    if "_SP_MATCHER" not in globals():
        _SP_MATCHER = NeuralMatcher()
    f = _SP_MATCHER.extract(gray.astype(np.float32))
    xy = np.asarray(f.xy)[np.asarray(f.valid)]
    return f, xy


def eval_superpoint(gray: np.ndarray, tol=2.0):
    """Keypoint count + warp repeatability of the bundled SuperPoint on
    real sensor data (the round-5 scene-adapted detector)."""
    _, xy = _sp_extract(gray)
    rows = {"keypoints": len(xy)}
    for name, H in _warps(gray.shape).items():
        warped = _warp_image(gray, H)
        _, xy_b = _sp_extract(warped)
        r, n = _repeatability(xy, xy_b, H, gray.shape, tol)
        rows[f"repeatability {name}"] = f"{r:.3f} ({n} kps)"
    return rows


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="write a markdown report to this path")
    ap.add_argument("--superpoint", action="store_true",
                    help="also evaluate the bundled SuperPoint detector "
                         "on the real photos")
    args = ap.parse_args(argv)

    missing = [p for p in REF_IMAGES if not p.exists()]
    if missing:
        print(f"reference photos not found: {missing}", file=sys.stderr)
        return 1

    lines = []

    def emit(s=""):
        print(s)
        lines.append(s)

    emit("# Real-photograph validation (reference bundled JPGs)")
    emit()
    emit(f"Measured {time.strftime('%Y-%m-%d')} on the two real ~12 MP "
         f"captures the reference ships (`docs/images/kitchen_input.JPG`, "
         f"`room_input.JPG`), downscaled to max dim {WORK_MAX_DIM} (the "
         f"pipeline's working resolution). OpenCV column = "
         f"`cv2.SIFT_create(nfeatures=8000, contrast 0.03, edge 15)` + "
         f"CLAHE 2.0, BF ratio 0.75 + F-RANSAC — the reference's exact "
         f"frontend (src/core/features.py:52-90). Repeatability = fraction "
         f"of keypoints re-detected within 2 px under a known warp of the "
         f"real image; precision = fraction of geometrically verified "
         f"matches within 2 px of the exact translation between two "
         f"overlapping crops.")
    emit()

    for path in REF_IMAGES:
        name = path.stem
        gray = load_gray(path)
        emit(f"## {name} ({gray.shape[1]}x{gray.shape[0]})")
        emit()

        t0 = time.time()
        _, xy = _ours_extract(gray)
        t_ours = time.time() - t0
        _, xy_nc = _ours_extract(gray, clahe=False)
        t0 = time.time()
        _, _, cxy = _cv_extract(gray)
        t_cv = time.time() - t0
        _, _, cxy_nc = _cv_extract(gray, clahe=False)
        emit("| metric | ours | OpenCV |")
        emit("|---|---|---|")
        emit(f"| keypoints (CLAHE on) | {len(xy)} | {len(cxy)} |")
        emit(f"| keypoints (CLAHE off) | {len(xy_nc)} | {len(cxy_nc)} |")
        emit(f"| extract wall (this host, 1 image) | {t_ours:.2f}s "
             f"| {t_cv:.2f}s |")

        rep = eval_repeatability(gray)
        for wname, (r_o, n_o, r_c, n_c) in rep.items():
            emit(f"| repeatability {wname} | {r_o:.3f} ({n_o} kps) "
                 f"| {r_c:.3f} ({n_c} kps) |")

        (p_o, n_o), (p_c, n_c) = eval_crop_precision(gray)
        emit(f"| crop-pair match precision @2px | {p_o:.3f} "
             f"({n_o} verified) | {p_c:.3f} ({n_c} verified) |")
        emit()
        if args.superpoint:
            sp = eval_superpoint(gray)
            emit(f"Bundled SuperPoint on {name}: " + ", ".join(
                f"{k}={v}" for k, v in sp.items()
            ))
            emit()

    if args.out:
        Path(args.out).write_text("\n".join(lines) + "\n")
        print(f"\nreport -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
