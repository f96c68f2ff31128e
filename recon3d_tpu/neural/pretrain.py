"""Synthetic SuperPoint pretraining driver (MagicPoint recipe on TPU).

The reference's neural path is dead without the published torch checkpoints
(src/core/neural_matcher.py:47-66 downloads via the lightglue package); this
framework can *produce* its own detector+descriptor weights from synthetic
geometry, so `--neural` works out of the box in a zero-egress environment.

Run:
    python -m recon3d_tpu.neural.pretrain --steps 3000 \
        --out recon3d_tpu/neural/pretrained/superpoint_synthetic.npz

Data is generated host-side (numpy, recon3d_tpu.neural.synthetic) in
rounds: each round uploads a stacked set of compact uint8 batches once and
runs batches*epochs optimizer steps in a single device dispatch
(detector CE + homography-correspondence InfoNCE) — on a high-latency link
the transfer cadence, not compute, sets the wall-clock floor, so steps per
uploaded byte is the metric that matters.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def pseudo_label_images(
    score_fn,
    params,
    images,
    rng,
    hw,
    n_homo: int = 6,
    max_corners: int = 60,
    threshold: float = 0.01,
):
    """Homographic-adaptation pseudo-labels for unlabeled images.

    The classic MagicPoint->SuperPoint step: score each image under
    `n_homo` random homographies (one batched device dispatch for the whole
    stack), unwarp the score maps to the original frame, average, and keep
    the stable local maxima as corner labels. Labels sharpen as the model
    improves because each round re-labels with the current params.

    Returns a list of (N_i, 2) float32 corner arrays, one per image.
    """
    import numpy as _np

    import jax.numpy as jnp
    from scipy.ndimage import maximum_filter

    from recon3d_tpu.neural.synthetic import random_homography, warp_image

    B = len(images)
    stack, homos = [], []
    for im in images:
        stack.append(im)
        homos.append(None)  # identity view
        for _ in range(n_homo - 1):
            Hm = random_homography(rng, hw)
            stack.append(warp_image(im, Hm))
            homos.append(Hm)
    smaps = _np.asarray(
        score_fn(params, jnp.asarray(_np.stack(stack))[..., None])
    )
    labels = []
    for b in range(B):
        acc = smaps[b * n_homo].astype(_np.float64).copy()
        cnt = _np.ones(hw)
        for k in range(1, n_homo):
            Hm = homos[b * n_homo + k]
            Hinv = _np.linalg.inv(Hm)
            acc += warp_image(smaps[b * n_homo + k], Hinv)
            cnt += warp_image(_np.ones(hw, _np.float32), Hinv)
        avg = acc / _np.maximum(cnt, 1e-6)
        mx = maximum_filter(avg, size=5)
        cand = (avg >= mx) & (avg > threshold)
        ys, xs = _np.nonzero(cand)
        vals = avg[ys, xs]
        order = _np.argsort(-vals)[:max_corners]
        labels.append(
            _np.stack([xs[order], ys[order]], -1).astype(_np.float32)
        )
    return labels


def train(
    steps: int = 3000,
    batch: int = 32,
    hw=(128, 128),
    lr: float = 1e-3,
    seed: int = 0,
    out: str | None = None,
    desc_weight: float = 1.0,
    batches_per_round: int = 12,
    epochs_per_round: int = 16,
    adapt_steps: int = 0,
    texture_frac: float = 0.5,
    scene_frac: float = 0.0,
    init_weights: str | None = None,
):
    """Round-based training: each round generates `batches_per_round` fresh
    compact batches on the host, uploads them once, and runs
    `batches_per_round * epochs_per_round` optimizer steps in a single
    device dispatch (train.make_epoch_train_fn) — amortizing the
    host<->device link cost that dominates a step-at-a-time loop on a
    tunneled TPU."""
    import jax
    import jax.numpy as jnp
    import optax

    from recon3d_tpu.config import MeshConfig
    from recon3d_tpu.parallel.mesh import make_mesh
    from recon3d_tpu.neural.superpoint import SuperPointNet
    from recon3d_tpu.neural.train import TrainState, make_epoch_train_fn
    from recon3d_tpu.neural.synthetic import make_pair_batch_compact
    from recon3d_tpu.neural.weights import save_params_npz

    n_dev = jax.local_device_count()
    batch = ((max(batch, n_dev) + n_dev - 1) // n_dev) * n_dev  # dp-divisible
    mesh = make_mesh(MeshConfig(model_parallel=1))
    model = SuperPointNet()
    key = jax.random.PRNGKey(seed)
    params = model.init(key, jnp.zeros((1, hw[0], hw[1], 1), jnp.float32))
    if init_weights:
        # Warm start (e.g. the bundled checkpoint) so an adaptation-only
        # run (steps=0, adapt_steps>0) fine-tunes instead of re-learning
        # the corner detector from scratch.
        from recon3d_tpu.neural.weights import load_params_npz

        params = load_params_npz(init_weights, params)
    # Adam with a short warmup then cosine decay: the detector head's 65-way
    # softmax saturates with a fixed 1e-3 on this small corpus.
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=min(100, steps // 10 + 1),
        decay_steps=max(steps + adapt_steps, 2), end_value=lr * 0.05,
    )
    tx = optax.adam(sched)
    state = TrainState(
        params=params, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    steps_per_round = batches_per_round * epochs_per_round
    run = make_epoch_train_fn(
        model, tx, mesh, epochs=epochs_per_round, desc_weight=desc_weight
    )

    rng = np.random.default_rng(seed)
    t0 = time.time()
    done = 0
    with mesh:
        while done < steps:
            data = [
                make_pair_batch_compact(rng, batch, hw)
                for _ in range(batches_per_round)
            ]
            stacked = {
                k: jnp.asarray(np.stack([d[k] for d in data]))
                for k in data[0]
            }
            state, losses = run(state, stacked)
            done += steps_per_round
            l, det, dsc = np.asarray(losses[-1])
            print(
                f"[pretrain] step {done}/{steps} loss {l:.4f} "
                f"(det {det:.4f} desc {dsc:.4f}) "
                f"{done / (time.time() - t0):.2f} steps/s",
                flush=True,
            )

        # -- homographic-adaptation phase: mix pseudo-labeled value-noise
        # textures into the corpus (the shapes corpus has no photometric
        # texture, which is what real images are mostly made of — see
        # docs/neural_quality.md for the measured generalization gap).
        if adapt_steps:
            from recon3d_tpu.neural.superpoint import scores_from_logits
            from recon3d_tpu.neural.synthetic import (
                render_texture, render_view_pair,
            )

            score_fn = jax.jit(
                lambda p, x: scores_from_logits(model.apply(p, x)[0])
            )

            def _scene_image(r):
                # An in-domain SCENE frame: multi-plane 3D render with
                # perspective texture, shading, and depth discontinuities —
                # the appearance family the SfM eval actually measures
                # repeatability on (docs/neural_quality.md round 5: the
                # detector, not the matcher, binds neural quality; the
                # texture-only adaptation corpus never showed it a scene).
                sc = render_view_pair(r, hw)
                return sc["img_a"] if r.uniform() < 0.5 else sc["img_b"]

            done_a = 0
            while done_a < adapt_steps:
                data = []
                for _ in range(batches_per_round):
                    u = rng.uniform()
                    if u < scene_frac:
                        imgs = [_scene_image(rng) for _ in range(batch)]
                    elif u < scene_frac + texture_frac:
                        imgs = [render_texture(rng, hw) for _ in range(batch)]
                    else:
                        imgs = None
                    if imgs is not None:
                        corners = pseudo_label_images(
                            score_fn, state.params, imgs, rng, hw
                        )
                        queue = list(zip(imgs, corners))
                        data.append(make_pair_batch_compact(
                            rng, batch, hw, sampler=lambda r: queue.pop()
                        ))
                    else:
                        data.append(make_pair_batch_compact(rng, batch, hw))
                stacked = {
                    k: jnp.asarray(np.stack([d[k] for d in data]))
                    for k in data[0]
                }
                state, losses = run(state, stacked)
                done_a += steps_per_round
                l, det, dsc = np.asarray(losses[-1])
                print(
                    f"[pretrain-adapt] step {done_a}/{adapt_steps} "
                    f"loss {l:.4f} (det {det:.4f} desc {dsc:.4f})",
                    flush=True,
                )
    if out:
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        save_params_npz(jax.device_get(state.params), out)
        print(f"[pretrain] saved checkpoint -> {out}")
    return state


def _photometric_jitter(im: np.ndarray, rng) -> np.ndarray:
    """Independent per-view photometric augmentation: gamma, gain/bias,
    additive Gaussian noise, and an occasional box blur — the appearance
    changes a matcher sees between real views (exposure, sampling, defocus)
    that a homography warp alone never produces."""
    out = im.astype(np.float32)
    out = np.clip(out, 1e-4, 1.0) ** rng.uniform(0.7, 1.4)    # gamma
    out = out * rng.uniform(0.6, 1.3) + rng.uniform(-0.15, 0.15)
    if rng.uniform() < 0.5:
        out = out + rng.normal(scale=rng.uniform(0.01, 0.05),
                               size=out.shape).astype(np.float32)
    if rng.uniform() < 0.25:  # 3x3 box blur via separable running means
        k = np.ones(3, np.float32) / 3.0
        out = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), 1, out
        )
        out = np.apply_along_axis(
            lambda c: np.convolve(c, k, mode="same"), 0, out
        )
    return np.clip(out, 0.0, 1.0)


def train_lightglue(
    steps: int = 4096,
    batch: int = 16,
    hw=(128, 128),
    max_keypoints: int = 256,
    lr: float = 2e-4,
    seed: int = 0,
    out: str | None = None,
    batches_per_round: int = 8,
    epochs_per_round: int = 8,
    gt_radius_px: float = 3.0,
    detection_threshold: float = 2e-5,
    texture_frac: float = 0.0,
    view_pair_frac: float = 0.0,
    superpoint_weights: str | None = None,
):
    """Train LightGlue on synthetic homography pairs with features from the
    frozen bundled SuperPoint.

    view_pair_frac of the pairs are TRUE 3D renders (synthetic.render_view_pair:
    two cameras, parallax, occlusion) with depth-projected ground truth —
    the domain the matcher faces in SfM, where homography-only training
    measurably under-recalls (46 vs 79 correct matches,
    docs/neural_quality.md round 2).

    Per round: render pair images on the host, batch-extract SuperPoint
    features in one device dispatch (features stay device-resident; only
    the small xy/valid arrays come back to build ground-truth assignments),
    then run batches*epochs LightGlue optimizer steps in one dispatch."""
    import jax
    import jax.numpy as jnp
    import optax

    from recon3d_tpu.config import MeshConfig, NeuralConfig
    from recon3d_tpu.parallel.mesh import make_mesh
    from recon3d_tpu.neural.matcher import NeuralMatcher
    from recon3d_tpu.neural.lightglue import LightGlueNet, normalize_keypoints
    from recon3d_tpu.neural.superpoint import (
        scores_from_logits, detect_keypoints,
    )
    from recon3d_tpu.neural.train import TrainState, make_lightglue_train_fn
    from recon3d_tpu.neural.synthetic import (
        render_shapes, random_homography, warp_image, warp_points,
    )
    from recon3d_tpu.neural.weights import save_params_npz

    mesh = make_mesh(MeshConfig(model_parallel=1))
    # Frozen SuperPoint: the bundled checkpoint via NeuralMatcher's loader.
    # Training uses a LOWER detection threshold than inference: denser
    # keypoint sets give the assignment loss 3-5x more positives per pair.
    nm = NeuralMatcher(NeuralConfig(
        max_keypoints=max_keypoints, detection_threshold=detection_threshold,
        superpoint_weights=superpoint_weights,
    ))
    nm._ensure_params(hw)
    sp, sp_params = nm.sp, nm._sp_params
    cfg = nm.config

    @jax.jit
    def extract_batch(imgs):  # (B2, H, W) float32
        def one(img):
            logits, desc = sp.apply(sp_params, img[None, ..., None])
            return detect_keypoints(
                scores_from_logits(logits)[0], desc[0],
                max_keypoints=max_keypoints,
                detection_threshold=cfg.detection_threshold,
                nms_radius=cfg.nms_radius,
            )
        return jax.vmap(one)(imgs)

    lg = LightGlueNet(dim=cfg.descriptor_dim, num_layers=cfg.lightglue_layers)
    K, D = max_keypoints, cfg.descriptor_dim
    lg_params = lg.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((K, D)), jnp.zeros((K, D)),
        jnp.zeros((K, 2)), jnp.zeros((K, 2)),
        jnp.ones(K, bool), jnp.ones(K, bool),
    )
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=min(200, steps // 10 + 1),
        decay_steps=max(steps, 2), end_value=lr * 0.1,
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    state = TrainState(params=lg_params, opt_state=tx.init(lg_params),
                       step=jnp.zeros((), jnp.int32))
    run = make_lightglue_train_fn(lg, tx, mesh, epochs=epochs_per_round)

    rng = np.random.default_rng(seed)
    hw_arr = jnp.asarray(hw, jnp.float32)
    t0 = time.time()
    done = 0
    steps_per_round = batches_per_round * epochs_per_round
    with mesh:
        while done < steps:
            # -- host: render pair images for the whole round
            n_pairs = batches_per_round * batch
            imgs_a, imgs_b, geos = [], [], []
            for _ in range(n_pairs):
                if rng.uniform() < view_pair_frac:
                    # true 3D pair: parallax + occlusion, GT via depth
                    from recon3d_tpu.neural.synthetic import render_view_pair

                    sc = render_view_pair(rng, hw)
                    imgs_a.append(_photometric_jitter(sc["img_a"], rng))
                    imgs_b.append(_photometric_jitter(sc["img_b"], rng))
                    geos.append(("view", sc))
                    continue
                # texture_frac of the pairs are value-noise textures — no
                # corner labels needed here (GT assignments come from the
                # homography over *detected* keypoints), so the matcher
                # trains directly on photometric-texture keypoint layouts.
                if rng.uniform() < texture_frac:
                    from recon3d_tpu.neural.synthetic import render_texture

                    im = render_texture(rng, hw)
                else:
                    im, _ = render_shapes(rng, hw)
                Hm = random_homography(rng, hw)
                imgs_a.append(_photometric_jitter(im, rng))
                # Photometric augmentation on BOTH views (independent
                # draws): a pure geometric warp leaves the two views'
                # descriptors near-identical, so a matcher trained on warp
                # pairs never learns appearance change and its confidence
                # collapses on real renders (measured: 46 correct matches
                # vs its own NN fallback's 79, docs/neural_quality.md).
                imgs_b.append(_photometric_jitter(warp_image(im, Hm), rng))
                geos.append(("homo", Hm))
            stackab = np.stack(imgs_a + imgs_b)  # (2P, H, W)
            # -- device: one batched SuperPoint extraction
            feats = extract_batch(jnp.asarray(stackab))
            xy = np.asarray(feats.xy)        # (2P, K, 2)
            valid = np.asarray(feats.valid)  # (2P, K)
            # Density augmentation: thin each image's keypoint set by a
            # random survival rate so the matcher is trained across set
            # sizes — inference-time sets (sparse scenes, high detection
            # thresholds) are much smaller than the dense training sets,
            # and attention trained only on ~K-point sets degenerates on
            # 20-40-point sets (observed: 0 matches on sparse pairs).
            rate = np.where(
                rng.random((2 * n_pairs, 1)) < 0.5,
                rng.uniform(0.4, 1.0, (2 * n_pairs, 1)),
                1.0,
            )
            keep = rng.random((2 * n_pairs, K)) < rate
            valid = valid & keep
            # -- host: three-class ground-truth under each geometry
            # (>=0 partner, -1 confidently unmatchable, -2 ignore).
            # Round 4's two-class labels called every unmatched keypoint
            # unmatchable; measured on this corpus ~19 of ~32 negatives
            # per view pair are near-miss cases (a detection within
            # ignore_radius of the reprojection that just isn't the
            # mutual nearest) — punishing those trained the matchability
            # head to abstain on matchable texture (docs/neural_quality.md
            # round 5). Near-misses now contribute NO loss, on either side.
            ignore_radius = max(2.5 * gt_radius_px, 8.0)
            gt = np.full((n_pairs, K), -1, np.int32)
            ign1 = np.zeros((n_pairs, K), bool)
            for p in range(n_pairs):
                xa, xb = xy[p], xy[n_pairs + p]
                va, vb = valid[p], valid[n_pairs + p]
                kind, geo = geos[p]
                if kind == "view":
                    from recon3d_tpu.neural.synthetic import (
                        project_view_points,
                    )

                    proj, covis = project_view_points(
                        xa, geo["depth_a"], geo["depth_b"], geo["K"],
                        geo["Ra"], geo["ta"], geo["Rb"], geo["tb"],
                    )
                    va = va & covis  # occluded/out-of-view: no GT match
                else:
                    proj = warp_points(geo, xa)
                d = np.hypot(
                    proj[:, None, 0] - xb[None, :, 0],
                    proj[:, None, 1] - xb[None, :, 1],
                )
                d[~va] = np.inf
                d[:, ~vb] = np.inf
                j = np.argmin(d, 1)
                dj = d[np.arange(K), j]
                # mutual nearest within the radius -> unique matches
                back = np.argmin(d, 0)
                ok = (dj < gt_radius_px) & (back[j] == np.arange(K))
                gt[p, ok] = j[ok]
                # near-miss on side 0: some detection close to the
                # reprojection, but not a mutual match -> ignore
                gt[p, ~ok & (dj < ignore_radius)] = -2
                # near-miss on side 1: close to SOME reprojection but not
                # matched (the loss masks already-matched ones itself)
                dmin1 = d.min(axis=0)
                ign1[p] = dmin1 < ignore_radius
            # -- device: epoch-scan over the round's pairs
            sh = (batches_per_round, batch, K)
            data = dict(
                desc0=feats.desc[:n_pairs].reshape(sh + (D,)),
                desc1=feats.desc[n_pairs:].reshape(sh + (D,)),
                xy0n=jax.vmap(lambda a: normalize_keypoints(a, hw_arr))(
                    feats.xy[:n_pairs]
                ).reshape(sh + (2,)),
                xy1n=jax.vmap(lambda a: normalize_keypoints(a, hw_arr))(
                    feats.xy[n_pairs:]
                ).reshape(sh + (2,)),
                valid0=jnp.asarray(valid[:n_pairs]).reshape(sh),
                valid1=jnp.asarray(valid[n_pairs:]).reshape(sh),
                gt_idx=jnp.asarray(gt).reshape(sh),
                ignore1=jnp.asarray(ign1).reshape(sh),
            )
            state, losses = run(state, data)
            done += steps_per_round
            l, lp, lu = np.asarray(losses[-1])
            n_m = (gt >= 0).sum(1)
            print(
                f"[pretrain-lg] step {done}/{steps} loss {l:.4f} "
                f"(pos {lp:.4f} unmatch {lu:.4f}) "
                f"gt-matches/pair {n_m.mean():.0f} "
                f"{done / (time.time() - t0):.2f} steps/s",
                flush=True,
            )
    if out:
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        save_params_npz(jax.device_get(state.params), out)
        print(f"[pretrain-lg] saved checkpoint -> {out}")
    return state


def main(argv=None):
    p = argparse.ArgumentParser(description="SuperPoint synthetic pretraining")
    p.add_argument("--model", choices=("superpoint", "lightglue"),
                   default="superpoint")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=128, help="square image size")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--desc-weight", type=float, default=1.0)
    p.add_argument("--batches-per-round", type=int, default=12)
    p.add_argument("--epochs-per-round", type=int, default=16)
    p.add_argument("--adapt-steps", type=int, default=0,
                   help="homographic-adaptation steps on pseudo-labeled "
                   "value-noise textures after the shapes phase (superpoint)")
    p.add_argument("--texture-frac", type=float, default=0.5,
                   help="fraction of adaptation batches (superpoint) / "
                   "training pairs (lightglue) drawn from textures")
    p.add_argument("--view-pair-frac", type=float, default=0.0,
                   help="fraction of lightglue training pairs rendered as "
                   "true 3D view pairs (parallax + occlusion, depth GT)")
    p.add_argument("--scene-frac", type=float, default=0.0,
                   help="fraction of adaptation batches (superpoint) drawn "
                   "from in-domain multi-plane SCENE renders")
    p.add_argument("--init-weights", default=None,
                   help="warm-start superpoint training from this .npz "
                   "(use with --steps 0 for adaptation-only fine-tune)")
    p.add_argument("--superpoint", default=None,
                   help="frozen SuperPoint checkpoint for lightglue "
                   "training (default: the bundled one)")
    p.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "pretrained", "superpoint_synthetic.npz"
        ),
    )
    a = p.parse_args(argv)
    if a.model == "lightglue":
        out = a.out
        if out.endswith("superpoint_synthetic.npz"):  # the sp default
            out = os.path.join(
                os.path.dirname(out), "lightglue_synthetic.npz"
            )
        train_lightglue(
            steps=a.steps, batch=min(a.batch, 16), hw=(a.size, a.size),
            lr=a.lr if a.lr != 1e-3 else 2e-4, seed=a.seed, out=out,
            batches_per_round=a.batches_per_round,
            epochs_per_round=a.epochs_per_round,
            texture_frac=a.texture_frac,
            view_pair_frac=a.view_pair_frac,
            superpoint_weights=a.superpoint,
        )
    else:
        train(
            steps=a.steps, batch=a.batch, hw=(a.size, a.size), lr=a.lr,
            seed=a.seed, out=a.out, desc_weight=a.desc_weight,
            batches_per_round=a.batches_per_round,
            epochs_per_round=a.epochs_per_round,
            adapt_steps=a.adapt_steps, texture_frac=a.texture_frac,
            scene_frac=a.scene_frac, init_weights=a.init_weights,
        )


if __name__ == "__main__":
    main()
