"""Classical feature frontend: SIFT extraction + geometric matching.

API parity with reference src/core/features.py: FeatureExtractor (:37-90,
CLAHE preprocessing + SIFT) and FeatureMatcher (:92-204, ratio + cross-check
+ F-RANSAC in match_pair_geometric). The compute is the batched TPU kernels
from recon3d_tpu.ops; this layer owns jit caching per image shape and the
host-facing API.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from recon3d_tpu.config import SiftConfig, MatchConfig
from recon3d_tpu.ops.sift import (
    describe_sift,
    detect_sift,
    extract_sift,
    SiftFeatures,
)
from recon3d_tpu.ops.clahe import clahe
from recon3d_tpu.ops.match import match_descriptors, MatchResult
from recon3d_tpu.ops.estimation import estimate_fundamental_ransac


# Jitted extraction programs, keyed by (SiftConfig, kind, shape[, caps]).
# MODULE-level, not per-FeatureExtractor: the pipeline constructs a fresh
# extractor per run, and a per-instance cache made every reconstruction
# request re-trace + re-lower the largest programs in the whole framework
# (measured through the serve daemon: 15.4 s of a 18.4 s warm-request
# extraction stage was re-tracing/lowering, not compute — VERDICT r4 #2).
# SiftConfig is a frozen dataclass, so identical configs hash equal and
# the closures built from them are behaviorally identical.
_JIT_CACHE: Dict[tuple, callable] = {}


class FeatureExtractor:
    """SIFT extractor with optional CLAHE preprocessing.

    One jitted kernel per distinct (config, image shape), cached across
    instances; call `extract` with (H, W) float32 grayscale in [0, 1].
    """

    def __init__(self, config: Optional[SiftConfig] = None):
        self.config = config or SiftConfig()
        self._jitted = _JIT_CACHE

    def _get_fn(self, shape: Tuple[int, int]):
        shape = (self.config, "extract") + tuple(shape)
        if shape not in self._jitted:
            cfg = self.config

            def fn(img):
                if cfg.clahe:
                    h, w = img.shape
                    g = cfg.clahe_grid
                    hh, ww = (h // g) * g, (w // g) * g
                    eq = clahe(img[:hh, :ww], cfg.clahe_clip, g)
                    img = jax.lax.dynamic_update_slice(img, eq, (0, 0))
                return extract_sift(
                    img,
                    max_features=cfg.max_features,
                    num_octaves=cfg.num_octaves,
                    scales=cfg.scales_per_octave,
                    sigma0=cfg.sigma,
                    contrast_threshold=cfg.contrast_threshold,
                    edge_threshold=cfg.edge_threshold,
                    upsample=cfg.upsample,
                    descriptor_max_value=cfg.descriptor_max_value,
                    multi_orientation=cfg.multi_orientation,
                )

            self._jitted[shape] = jax.jit(fn)
        return self._jitted[shape]

    def extract(self, image: np.ndarray) -> SiftFeatures:
        """image: (H, W) grayscale float32 [0,1] -> SiftFeatures (on device)."""
        img = jnp.asarray(image, jnp.float32)
        return self._get_fn(img.shape)(img)

    def _preproc(self, img):
        cfg = self.config
        if cfg.clahe:
            h, w = img.shape
            g = cfg.clahe_grid
            hh, ww = (h // g) * g, (w // g) * g
            eq = clahe(img[:hh, :ww], cfg.clahe_clip, g)
            img = jax.lax.dynamic_update_slice(img, eq, (0, 0))
        return img

    def _get_detect_fn(self, shape: Tuple[int, int, int]):
        key = (self.config, "detect") + tuple(shape)
        if key not in self._jitted:
            cfg = self.config

            def fn(imgs_u8):
                def one(im):
                    return detect_sift(
                        self._preproc(im.astype(jnp.float32) / 255.0),
                        max_features=cfg.max_features,
                        num_octaves=cfg.num_octaves,
                        scales=cfg.scales_per_octave,
                        sigma0=cfg.sigma,
                        contrast_threshold=cfg.contrast_threshold,
                        edge_threshold=cfg.edge_threshold,
                        upsample=cfg.upsample,
                    )

                return jax.vmap(one)(imgs_u8)

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def _get_describe_fn(self, shape, caps_sel: Tuple[int, ...]):
        key = (self.config, "describe") + tuple(shape) + tuple(caps_sel)
        if key not in self._jitted:
            cfg = self.config

            def fn(pyramid, dets):
                def one(pyr_i, dets_i):
                    return describe_sift(
                        pyr_i, dets_i, caps_sel,
                        scales=cfg.scales_per_octave,
                        descriptor_max_value=cfg.descriptor_max_value,
                        multi_orientation=cfg.multi_orientation,
                    )

                return jax.vmap(one)(pyramid, dets)

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def extract_batch(
        self,
        images: np.ndarray,
        chunk: int = 16,
        max_inflight_chunks: int = 4,
        timings: Optional[Dict[str, float]] = None,
    ):
        """Batched extraction: (V, H, W) float32 [0,1] -> ONE stacked
        SiftFeatures whose arrays have a leading view axis (V, ...).

        TWO-PHASE: detection runs at the worst-case candidate capacity
        (max_features slots), then the host fetches only the per-octave
        valid COUNTS and describes at pow-2-bucketed selection capacities.
        Orientation/descriptor cost is proportional to slots, not
        keypoints, so typical scenes (a few hundred keypoints against an
        8k budget) describe ~10x fewer slots (measured 5.3 s -> 2.0 s for
        50 images, identical keypoints).

        Detect chunks are bounded at `max_inflight_chunks` before their
        describes run, so peak device memory is O(window) Gaussian
        pyramids, not O(V): each window dispatches its detects, fetches
        its counts, describes, and drops its pyramid references before
        the next window's detects start. Selection capacities are chosen
        per window; windows whose buckets differ are padded to the
        largest capacity on the host at the final concatenation (padding
        slots carry valid=False, so consumers are unaffected).

        Images ship as uint8 and chunks of `chunk` run as one vmapped device
        program; chunk outputs concatenate on device. Returning per-image
        slices instead would issue hundreds of tiny slice dispatches — fatal
        over a high-latency device link. Use feature_slice(feats, i) for a
        single image's view."""
        import time as _time

        tm = timings if timings is not None else {}
        tm.setdefault("host_prep_s", 0.0)
        tm.setdefault("detect_dispatch_s", 0.0)
        tm.setdefault("counts_sync_s", 0.0)
        tm.setdefault("describe_dispatch_s", 0.0)
        tm.setdefault("concat_s", 0.0)
        V = images.shape[0]
        _t = _time.time()
        u8 = np.clip(images * 255.0, 0, 255).astype(np.uint8)
        tm["host_prep_s"] += _time.time() - _t
        window = chunk * max(1, max_inflight_chunks)
        win_feats = []
        for w0 in range(0, V, window):
            wu8 = u8[w0 : w0 + window]
            det_chunks = []
            cnt_dev = []
            _t = _time.time()
            for c0 in range(0, wu8.shape[0], chunk):
                batch = wu8[c0 : c0 + chunk]
                nb = batch.shape[0]
                if nb < chunk:  # pad to the static chunk size
                    batch = np.concatenate(
                        [batch, np.repeat(batch[-1:], chunk - nb, axis=0)]
                    )
                pyr, dets, cnt = self._get_detect_fn(batch.shape)(
                    jnp.asarray(batch)
                )
                det_chunks.append((batch.shape, pyr, dets, nb))
                cnt_dev.append((cnt, nb))
            tm["detect_dispatch_s"] += _time.time() - _t
            # fetch counts only after the window's chunks have all
            # dispatched: a fetch inside the loop would serialize the
            # chunks' device work on the sync
            _t = _time.time()
            counts = np.concatenate(
                [np.asarray(c)[:nb] for c, nb in cnt_dev], axis=0
            )  # (Vw, O)
            tm["counts_sync_s"] += _time.time() - _t
            del cnt_dev
            caps_det = tuple(
                int(d["valid"].shape[-1]) for d in det_chunks[0][2]
            )
            # pow-2 buckets with 25% headroom, clipped to the detection
            # caps; one caps_sel per WINDOW so its chunk outputs share a
            # capacity and concatenate on device
            caps_sel = tuple(
                min(cap, max(128, 1 << int(np.ceil(np.log2(
                    max(counts[:, o].max(), 1) * 1.25 + 16
                )))))
                for o, cap in enumerate(caps_det)
            )
            chunks = []
            _t = _time.time()
            while det_chunks:
                # pop: release each chunk's pyramid/det buffers as soon as
                # its describe has dispatched (ADVICE r4: O(V) -> O(window)
                # peak device memory)
                shape, pyr, dets, nb = det_chunks.pop(0)
                feats = self._get_describe_fn(shape, caps_sel)(pyr, dets)
                del pyr, dets
                if nb < shape[0]:
                    feats = jax.tree.map(lambda a: a[:nb], feats)
                chunks.append(feats)
            tm["describe_dispatch_s"] += _time.time() - _t
            _t = _time.time()
            win_feats.append(
                chunks[0] if len(chunks) == 1
                else jax.tree.map(lambda *a: jnp.concatenate(a, axis=0), *chunks)
            )
            tm["concat_s"] += _time.time() - _t
        if len(win_feats) == 1:
            return win_feats[0]
        # Cross-window concatenation happens on the HOST: a wide N-operand
        # device concatenate compiles a fresh program per operand count,
        # and XLA:CPU was observed to abort compiling the 19-operand
        # variant deep into a long test session; at these scales the
        # arrays are host-sized anyway and numpy concatenation costs a
        # memcpy with no compile at all. Windows may carry different
        # selection capacities — pad each to the largest before stacking.
        kmax = max(int(f.valid.shape[1]) for f in win_feats)

        def _pad_concat(*arrs):
            padded = []
            for a in arrs:
                a = np.asarray(a)
                if a.shape[1] < kmax:
                    pad = [(0, 0)] * a.ndim
                    pad[1] = (0, kmax - a.shape[1])
                    a = np.pad(a, pad)
                padded.append(a)
            return jnp.asarray(np.concatenate(padded, axis=0))

        return jax.tree.map(_pad_concat, *win_feats)


def feature_slice(stacked, i: int):
    """One image's SiftFeatures view from a stacked (V, ...) batch."""
    return jax.tree.map(lambda a: a[i], stacked)


class FeatureMatcher:
    """Descriptor matching + geometric verification.

    match():                ratio test + mutual cross-check (features.py:128-173)
    match_pair_geometric(): match + fundamental RANSAC; returns matches whose
                            mask marks geometric inliers and the F matrix
                            (features.py:175-204).
    """

    def __init__(self, config: Optional[MatchConfig] = None):
        self.config = config or MatchConfig()

    def match(self, f1: SiftFeatures, f2: SiftFeatures) -> MatchResult:
        return match_descriptors(
            f1.desc,
            f2.desc,
            f1.valid.astype(jnp.float32),
            f2.valid.astype(jnp.float32),
            ratio=self.config.ratio,
            cross_check=self.config.cross_check,
        )

    def match_pair_geometric(
        self,
        f1: SiftFeatures,
        f2: SiftFeatures,
        key: jax.Array,
        min_matches: Optional[int] = None,
    ):
        """Returns (match_result_with_inlier_mask, F, num_inliers).

        If fewer than min_matches raw matches survive, F is identity and the
        mask is all-false (caller drops the pair — reference features.py:183).
        """
        min_matches = min_matches or self.config.min_matches
        m = self.match(f1, f2)
        x1, x2, res = _verify_pair(
            f1.xy,
            f2.xy,
            m.idx2,
            m.mask,
            key,
            self.config.ransac_threshold_px,
            self.config.ransac_hypotheses,
        )
        enough = int(m.num_matches) >= min_matches
        inlier_mask = res.inliers & m.mask if enough else jnp.zeros_like(m.mask)
        out = MatchResult(idx1=m.idx1, idx2=m.idx2, distance=m.distance, mask=inlier_mask)
        return out, res.F, (int(res.num_inliers) if enough else 0)


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def _verify_pair(xy1, xy2, idx2, mask, key, threshold_px, num_hypotheses):
    x1 = jnp.where(mask[:, None], xy1, 0.0)
    x2 = jnp.where(mask[:, None], xy2[jnp.clip(idx2, 0, None)], 0.0)
    res = estimate_fundamental_ransac(
        key,
        x1,
        x2,
        mask.astype(jnp.float32),
        threshold_px=threshold_px,
        num_hypotheses=num_hypotheses,
    )
    return x1, x2, res


@functools.partial(
    jax.jit, static_argnames=("ratio", "cross_check", "num_hypotheses")
)
def _match_verify_batch(
    desc,      # (V, K, D)
    valid,     # (V, K) float
    xy,        # (V, K, 2)
    pi,        # (P,) pair first-image indices
    pj,        # (P,)
    keys,      # (P,) PRNG keys
    threshold_px,
    ratio: float = 0.75,
    cross_check: bool = True,
    num_hypotheses: int = 1024,
):
    """Match + F-RANSAC for a whole batch of image pairs in ONE device
    program (SURVEY.md §7: the per-pair FLANN loop of the reference,
    sfm_pipeline.py:188-208, becomes a vmapped pair axis). Uses the
    streaming matcher so the distance matrices never materialize.

    Returns per-pair (idx2 (P,K), inlier_mask (P,K), F (P,3,3),
    num_inliers (P,), num_raw (P,))."""
    from recon3d_tpu.ops.match import match_descriptors_streaming

    def one(i, j, key):
        m = match_descriptors_streaming(
            desc[i], desc[j], valid[i], valid[j],
            ratio=ratio, cross_check=cross_check,
        )
        x1 = jnp.where(m.mask[:, None], xy[i], 0.0)
        x2 = jnp.where(
            m.mask[:, None], xy[j][jnp.clip(m.idx2, 0, None)], 0.0
        )
        res = estimate_fundamental_ransac(
            key, x1, x2, m.mask.astype(jnp.float32),
            threshold_px=threshold_px, num_hypotheses=num_hypotheses,
        )
        return (
            m.idx2,
            m.mask & res.inliers,
            res.F,
            res.num_inliers,
            m.num_matches,
        )

    return jax.vmap(one)(pi, pj, keys)


def match_pairs_batched(
    features,                 # list of SiftFeatures (shared capacity K)
    pairs,                    # list[(i, j)]
    key: jax.Array,
    config: Optional[MatchConfig] = None,
    chunk: int = 64,
    mesh=None,                # optional jax.sharding.Mesh: shard pair chunks
    timings: Optional[Dict[str, float]] = None,
):
    """Host-facing batched pair matching: stacks the per-image features once
    and runs _match_verify_batch over pair chunks.

    Features are first COMPACTED to the smallest power-of-2 capacity holding
    every image's valid keypoints: the extraction capacity is a worst-case
    budget (e.g. 8192) while typical images yield far fewer keypoints, and
    matching cost is quadratic in the padded size. idx1/idx2 in the returned
    tuples are translated back to original keypoint indices.

    `features` is either a stacked SiftFeatures with (V, K, ...) arrays
    (from FeatureExtractor.extract_batch) or a list of per-image features.

    Returns (i, j, idx1, idx2, F, n_inliers, n_raw) numpy tuples with idx1/
    idx2 the ORIGINAL keypoint indices of the geometric inliers; the caller
    applies min_matches gates."""
    import time as _time

    tm = timings if timings is not None else {}
    cfg = config or MatchConfig()
    _t = _time.time()
    if isinstance(features, (list, tuple)):
        features = jax.tree.map(lambda *a: jnp.stack(a), *features)
    # the one synchronous fetch of the prep: (V, K) validity bits
    valid_np = np.asarray(features.valid)
    tm["valid_fetch_s"] = _time.time() - _t
    _t = _time.time()
    counts = valid_np.sum(1).astype(int)
    K = valid_np.shape[1]
    C = 1 << max(8, int(np.ceil(np.log2(max(1, counts.max())))))
    C = min(C, K)
    # stable compaction: valid entries first, remember original indices
    order = np.argsort(~valid_np, axis=1, kind="stable")[:, :C]  # (V, C)
    oj = jnp.asarray(order)

    # one gathered compaction per field (device-side)
    row = jnp.arange(oj.shape[0])[:, None]
    desc = features.desc[row, oj]
    valid = features.valid[row, oj].astype(jnp.float32)
    xy = features.xy[row, oj]
    tm["compact_s"] = _time.time() - _t
    # Multi-chip: the pair axis of each chunk shards over the mesh's 'data'
    # axis (features replicate); XLA partitions the vmapped match+RANSAC
    # program so every chip verifies its own pair shard (SURVEY §7 step 11 —
    # the reference's serial per-pair loop, sfm_pipeline.py:188-208).
    n_data = mesh.shape["data"] if mesh is not None else 1
    if n_data > 1:
        from recon3d_tpu.parallel.mesh import data_sharding, replicated

        chunk = max(chunk, n_data) // n_data * n_data
        rep = replicated(mesh)
        desc = jax.device_put(desc, rep)
        valid = jax.device_put(valid, rep)
        xy = jax.device_put(xy, rep)
        pair_sh = data_sharding(mesh, 1, 0)
        key_sh = data_sharding(mesh, 2, 0)
    # Dispatch every chunk asynchronously, keep outputs ON DEVICE, then pull
    # each field once: over a high-latency link, per-chunk synchronous
    # downloads dominate (e.g. 28 chunk round-trips for ~450 pairs); one
    # concatenated download amortizes the latency to a single round trip.
    _t = _time.time()
    chunk_out = []
    for c0 in range(0, len(pairs), chunk):
        batch = pairs[c0 : c0 + chunk]
        nb = len(batch)
        padded = batch + [batch[-1]] * (chunk - nb)
        pi = jnp.asarray([p[0] for p in padded], jnp.int32)
        pj = jnp.asarray([p[1] for p in padded], jnp.int32)
        keys = jax.random.split(jax.random.fold_in(key, c0), chunk)
        if n_data > 1:
            pi = jax.device_put(pi, pair_sh)
            pj = jax.device_put(pj, pair_sh)
            keys = jax.device_put(keys, key_sh)
        res = _match_verify_batch(
            desc, valid, xy, pi, pj, keys,
            jnp.float32(cfg.ransac_threshold_px),
            ratio=cfg.ratio,
            cross_check=cfg.cross_check,
            num_hypotheses=cfg.ransac_hypotheses,
        )
        chunk_out.append(jax.tree.map(lambda a, n=nb: a[:n], res))
    tm["dispatch_s"] = _time.time() - _t
    _t = _time.time()
    idx2, inl, F, n_inl, n_raw = (
        np.asarray(jnp.concatenate(field, axis=0))
        for field in zip(*chunk_out)
    )
    tm["result_pull_s"] = _time.time() - _t
    _t = _time.time()
    out = []
    for r, (i, j) in enumerate(pairs):
        # translate compacted positions back to original keypoint ids
        sel = np.flatnonzero(inl[r])
        idx1_orig = order[i][sel]
        idx2_orig = order[j][np.clip(idx2[r][sel], 0, C - 1)]
        out.append(
            (i, j, idx1_orig, idx2_orig, F[r], int(n_inl[r]), int(n_raw[r]))
        )
    tm["translate_s"] = _time.time() - _t
    return out
