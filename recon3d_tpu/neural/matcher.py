"""NeuralMatcher: SuperPoint extraction + LightGlue matching, SfM-facing API.

Parity with reference src/core/neural_matcher.py (NeuralMatcher :32-205):
`extract(image) -> NeuralFeatures` and `match_pair_geometric(f1, f2, key)`
with the same contract as the classical FeatureMatcher (matches + F-RANSAC),
so SfMPipeline swaps frontends transparently (reference sfm_pipeline.py:41-50).

Weights: pass checkpoint paths via NeuralConfig (torch .pth files are
converted on load, recon3d_tpu.neural.weights). With no explicit weights,
SuperPoint auto-loads the bundled synthetic-pretrained checkpoint
(neural/pretrained/superpoint_synthetic.npz, produced by neural.pretrain)
and matching falls back to mutual-NN descriptor matching — so the neural
path works out of the box in a zero-egress environment; LightGlue engages
when its trained weights are supplied.
"""

from __future__ import annotations

import os

from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from recon3d_tpu.config import NeuralConfig, MatchConfig
from recon3d_tpu.neural.superpoint import (
    SuperPointNet,
    scores_from_logits,
    detect_keypoints,
    NeuralFeatures,
)
from recon3d_tpu.neural.lightglue import (
    LightGlueNet,
    normalize_keypoints,
    extract_matches,
)
from recon3d_tpu.ops.match import MatchResult
from recon3d_tpu.ops.estimation import estimate_fundamental_ransac


# Jitted SuperPoint/LightGlue programs shared across NeuralMatcher
# instances (keys carry the frozen NeuralConfig — see __init__ note).
_NEURAL_JIT_CACHE: Dict[tuple, callable] = {}


class NeuralMatcher:
    def __init__(self, config: Optional[NeuralConfig] = None,
                 match_config: Optional[MatchConfig] = None):
        self.config = config or NeuralConfig()
        self.match_config = match_config or MatchConfig()
        self.sp = SuperPointNet(descriptor_dim=self.config.descriptor_dim)
        self.lg = LightGlueNet(
            dim=self.config.descriptor_dim,
            num_layers=self.config.lightglue_layers,
        )
        self._sp_params = None
        self._lg_params = None
        # Module-level jit cache keyed by (frozen NeuralConfig, kind, sig):
        # the pipeline builds a fresh NeuralMatcher per run, and per-
        # instance caches re-trace SuperPoint/LightGlue on every warm
        # service request (same per-request toll as the SIFT frontend's —
        # features/frontend.py _JIT_CACHE). Params ship as call arguments,
        # so programs are shareable across instances with equal configs.
        self._extract_jit = _NEURAL_JIT_CACHE
        self._match_jit = _NEURAL_JIT_CACHE
        # "auto": LightGlue only when EXPLICIT trained weights were supplied
        # (converted published checkpoints via neural/weights.py). The
        # bundled in-repo synthetic checkpoint measurably UNDER-recalls its
        # own mutual-NN fallback on photographic texture (46 vs 79 correct
        # matches; a round-4 retrain on true 3D view pairs made it worse,
        # 26 — docs/neural_quality.md), so auto resolves to the stronger
        # backend; matcher="lightglue" still opts into the bundled
        # checkpoint explicitly.
        m = self.config.matcher
        self._bundled_lg = os.path.join(
            os.path.dirname(__file__), "pretrained", "lightglue_synthetic.npz"
        )
        has_lg = bool(self.config.lightglue_weights)
        self.matcher_kind = (
            m if m in ("lightglue", "nn") else ("lightglue" if has_lg else "nn")
        )

    # -- parameters ---------------------------------------------------------

    def _ensure_params(self, hw: Tuple[int, int]):
        if self._sp_params is not None:
            return
        key = jax.random.PRNGKey(0)
        h = (hw[0] // 8) * 8
        w = (hw[1] // 8) * 8
        dummy = jnp.zeros((1, max(h, 64), max(w, 64), 1), jnp.float32)
        self._sp_params = self.sp.init(key, dummy)
        k = self.config.max_keypoints
        d = self.config.descriptor_dim
        self._lg_params = self.lg.init(
            key,
            jnp.zeros((k, d)),
            jnp.zeros((k, d)),
            jnp.zeros((k, 2)),
            jnp.zeros((k, 2)),
            jnp.ones(k, bool),
            jnp.ones(k, bool),
        )
        if self.config.superpoint_weights:
            sp_path = self.config.superpoint_weights
            if sp_path.endswith(".npz"):
                from recon3d_tpu.neural.weights import load_params_npz

                self._sp_params = load_params_npz(sp_path, self._sp_params)
            else:
                from recon3d_tpu.neural.weights import load_superpoint_torch

                self._sp_params = load_superpoint_torch(
                    sp_path, self._sp_params
                )
        else:
            bundled = os.path.join(
                os.path.dirname(__file__), "pretrained",
                "superpoint_synthetic.npz",
            )
            if os.path.exists(bundled):
                from recon3d_tpu.neural.weights import load_params_npz

                try:
                    self._sp_params = load_params_npz(bundled, self._sp_params)
                except (KeyError, ValueError):
                    # non-default model config (e.g. descriptor_dim) — the
                    # bundled default-shape checkpoint does not apply
                    pass
        if self.config.lightglue_weights:
            lg_path = self.config.lightglue_weights
            if lg_path.endswith(".npz"):
                from recon3d_tpu.neural.weights import load_params_npz

                self._lg_params = load_params_npz(lg_path, self._lg_params)
            else:
                from recon3d_tpu.neural.weights import load_lightglue_torch

                self._lg_params = load_lightglue_torch(
                    lg_path, self._lg_params
                )
        elif os.path.exists(self._bundled_lg):
            from recon3d_tpu.neural.weights import load_params_npz

            try:
                self._lg_params = load_params_npz(
                    self._bundled_lg, self._lg_params
                )
            except (KeyError, ValueError) as e:
                if self.config.matcher == "auto":
                    self.matcher_kind = "nn"  # incompatible model config
                else:
                    # explicit matcher="lightglue" with no loadable weights
                    # would silently match with a random-init network —
                    # refuse instead of producing noise matches
                    raise RuntimeError(
                        "matcher='lightglue' requested but the bundled "
                        f"checkpoint does not fit this model config: {e}. "
                        "Pass lightglue_weights= or use matcher='auto'."
                    ) from e
        elif self.config.matcher == "lightglue":
            raise RuntimeError(
                "matcher='lightglue' requested but no weights are available "
                "(no lightglue_weights path and no bundled checkpoint)."
            )

    # -- extraction (reference neural_matcher.py:67-99) ----------------------

    def extract(self, image: np.ndarray) -> NeuralFeatures:
        """image: (H, W) grayscale float32 [0, 1] -> padded NeuralFeatures."""
        img = jnp.asarray(image, jnp.float32)
        hw = (self.config, "extract") + tuple(img.shape)
        self._ensure_params(tuple(img.shape))
        if hw not in self._extract_jit:
            cfg = self.config
            sp = self.sp

            def fn(params, img):
                h8 = (img.shape[0] // 8) * 8
                w8 = (img.shape[1] // 8) * 8
                x = img[:h8, :w8][None, ..., None]
                logits, desc = sp.apply(params, x)
                scores = scores_from_logits(logits)[0]
                return detect_keypoints(
                    scores,
                    desc[0],
                    max_keypoints=cfg.max_keypoints,
                    detection_threshold=cfg.detection_threshold,
                    nms_radius=cfg.nms_radius,
                )

            self._extract_jit[hw] = jax.jit(fn)
        return self._extract_jit[hw](self._sp_params, img)

    # -- matching (reference neural_matcher.py:101-205) -----------------------

    def match(self, f1: NeuralFeatures, f2: NeuralFeatures,
              hw: Optional[Tuple[int, int]] = None) -> MatchResult:
        self._ensure_params(hw or (1024, 1024))
        if self.matcher_kind == "nn":
            nn_key = (self.config, "nn")
            if nn_key not in _NEURAL_JIT_CACHE:
                from recon3d_tpu.ops.match import match_descriptors

                ratio = self.config.nn_ratio
                _NEURAL_JIT_CACHE[nn_key] = jax.jit(
                    lambda a, b: match_descriptors(
                        a.desc, b.desc, a.valid, b.valid, ratio=ratio
                    )
                )
            return _NEURAL_JIT_CACHE[nn_key](f1, f2)
        k = int(f1.xy.shape[0])
        sig = (self.config, "match", k, int(f2.xy.shape[0]))
        if sig not in self._match_jit:
            lg = self.lg
            threshold = self.config.lightglue_match_threshold

            def fn(params, f1: NeuralFeatures, f2: NeuralFeatures, hw):
                xy0n = normalize_keypoints(f1.xy, hw)
                xy1n = normalize_keypoints(f2.xy, hw)
                log_assign, m0, m1 = lg.apply(
                    params, f1.desc, f2.desc, xy0n, xy1n, f1.valid, f2.valid
                )
                mres = extract_matches(
                    log_assign, f1.valid, f2.valid,
                    threshold=threshold,
                )
                return mres

            self._match_jit[sig] = jax.jit(fn)
        hw_arr = jnp.asarray(hw or (1024, 1024), jnp.float32)
        m = self._match_jit[sig](self._lg_params, f1, f2, hw_arr)
        return MatchResult(
            idx1=jnp.arange(k, dtype=jnp.int32),
            idx2=m.idx2,
            distance=1.0 - m.score,
            mask=m.mask,
        )

    def match_pair_geometric(self, f1: NeuralFeatures, f2: NeuralFeatures,
                             key: jax.Array, min_matches: Optional[int] = None):
        """LightGlue matches + fundamental RANSAC (neural_matcher.py:149-205)."""
        min_matches = min_matches or self.match_config.min_matches

        def run(m):
            x1 = jnp.where(m.mask[:, None], f1.xy, 0.0)
            x2 = jnp.where(
                m.mask[:, None], f2.xy[jnp.clip(m.idx2, 0, None)], 0.0
            )
            res = estimate_fundamental_ransac(
                key,
                x1,
                x2,
                m.mask.astype(jnp.float32),
                threshold_px=self.match_config.ransac_threshold_px,
                num_hypotheses=self.match_config.ransac_hypotheses,
            )
            enough = int(m.num_matches) >= min_matches
            inlier_mask = (
                res.inliers & m.mask if enough else jnp.zeros_like(m.mask)
            )
            out = MatchResult(
                idx1=m.idx1, idx2=m.idx2, distance=m.distance,
                mask=inlier_mask,
            )
            return out, res.F, (int(res.num_inliers) if enough else 0)

        best = run(self.match(f1, f2))
        if (
            self.matcher_kind == "lightglue"
            and self.config.lightglue_nn_fallback
            and best[2] < min_matches
        ):
            # The attention matcher abstained on this pair — try plain
            # mutual-NN descriptor matching and keep the better verdict.
            from recon3d_tpu.ops.match import match_descriptors

            m_nn = match_descriptors(
                f1.desc, f2.desc, f1.valid, f2.valid,
                ratio=self.config.nn_ratio,
            )
            alt = run(m_nn)
            if alt[2] > best[2]:
                best = alt
        return best

    # -- batched pair matching (mirrors features.frontend.match_pairs_batched) --

    def _get_pairs_fn(self, sig):
        if not hasattr(self, "_pairs_jit"):
            self._pairs_jit = {}
        if sig not in self._pairs_jit:
            lg = self.lg
            mc = self.match_config
            kind = self.matcher_kind
            nn_ratio = self.config.nn_ratio
            lg_thr = self.config.lightglue_match_threshold

            nn_fallback = (
                kind == "lightglue" and self.config.lightglue_nn_fallback
            )

            @jax.jit
            def fn(params, desc, xy, valid, pi, pj, keys, hw):
                def verify(m, i, j, key):
                    x1 = jnp.where(m.mask[:, None], xy[i], 0.0)
                    x2 = jnp.where(
                        m.mask[:, None], xy[j][jnp.clip(m.idx2, 0, None)], 0.0
                    )
                    res = estimate_fundamental_ransac(
                        key, x1, x2, m.mask.astype(jnp.float32),
                        threshold_px=mc.ransac_threshold_px,
                        num_hypotheses=mc.ransac_hypotheses,
                    )
                    return (
                        m.idx2, m.mask & res.inliers, res.F,
                        res.num_inliers, jnp.sum(m.mask),
                    )

                def one(i, j, key):
                    if kind == "nn":
                        from recon3d_tpu.ops.match import match_descriptors

                        m = match_descriptors(
                            desc[i], desc[j], valid[i], valid[j],
                            ratio=nn_ratio,
                        )
                        return verify(m, i, j, key)
                    xy0n = normalize_keypoints(xy[i], hw)
                    xy1n = normalize_keypoints(xy[j], hw)
                    log_assign, m0, m1 = lg.apply(
                        params, desc[i], desc[j], xy0n, xy1n,
                        valid[i], valid[j],
                    )
                    m = extract_matches(
                        log_assign, valid[i], valid[j],
                        threshold=lg_thr,
                    )
                    out_lg = verify(m, i, j, key)
                    if not nn_fallback:
                        return out_lg
                    from recon3d_tpu.ops.match import match_descriptors

                    m_nn = match_descriptors(
                        desc[i], desc[j], valid[i], valid[j], ratio=nn_ratio
                    )
                    out_nn = verify(m_nn, i, j, key)
                    take_nn = out_nn[3] > out_lg[3]
                    return tuple(
                        jnp.where(take_nn, a, b)
                        for a, b in zip(out_nn, out_lg)
                    )

                return jax.vmap(one)(pi, pj, keys)

            self._pairs_jit[sig] = fn
        return self._pairs_jit[sig]

    def match_pairs_batched(self, features, pairs, key, chunk: int = 8,
                            hw=None, mesh=None):
        """All candidate pairs LightGlue-matched + F-verified in chunked
        single-dispatch batches. Same return contract as
        features.frontend.match_pairs_batched: (i, j, idx1, idx2, F,
        n_inliers, n_raw) with original keypoint indices.

        mesh: optional jax.sharding.Mesh — the pair axis of each chunk
        shards over the mesh's 'data' axis with features replicated, the
        same decomposition as the classical frontend (SURVEY §7 step 10/11:
        neural inference sharded over the pair axis; reference
        neural_matcher.py:101-147 runs pairs serially on one GPU)."""
        import numpy as np

        hw = jnp.asarray(hw or (1024, 1024), jnp.float32)
        self._ensure_params((int(hw[0]), int(hw[1])))
        desc = jnp.stack([f.desc for f in features])
        xy = jnp.stack([f.xy for f in features])
        valid = jnp.stack([f.valid for f in features])
        n_data = mesh.shape["data"] if mesh is not None else 1
        pair_sh = key_sh = None
        if n_data > 1:
            from recon3d_tpu.parallel.mesh import data_sharding, replicated

            chunk = max(chunk, n_data) // n_data * n_data
            rep = replicated(mesh)
            desc = jax.device_put(desc, rep)
            xy = jax.device_put(xy, rep)
            valid = jax.device_put(valid, rep)
            pair_sh = data_sharding(mesh, 1, 0)
            key_sh = data_sharding(mesh, 2, 0)
        fn = self._get_pairs_fn((int(desc.shape[1]), chunk))
        out = []
        for c0 in range(0, len(pairs), chunk):
            batch = pairs[c0 : c0 + chunk]
            padded = batch + [batch[-1]] * (chunk - len(batch))
            pi = jnp.asarray([p[0] for p in padded], jnp.int32)
            pj = jnp.asarray([p[1] for p in padded], jnp.int32)
            keys = jax.random.split(jax.random.fold_in(key, c0), chunk)
            if n_data > 1:
                pi = jax.device_put(pi, pair_sh)
                pj = jax.device_put(pj, pair_sh)
                keys = jax.device_put(keys, key_sh)
            idx2, inl, F, n_inl, n_raw = fn(
                self._lg_params, desc, xy, valid, pi, pj, keys, hw
            )
            idx2 = np.asarray(idx2)
            inl = np.asarray(inl)
            F = np.asarray(F)
            n_inl = np.asarray(n_inl)
            n_raw = np.asarray(n_raw)
            for r, (i, j) in enumerate(batch):
                sel = np.flatnonzero(inl[r])
                out.append(
                    (i, j, sel, idx2[r][sel], F[r],
                     int(n_inl[r]), int(n_raw[r]))
                )
        return out
