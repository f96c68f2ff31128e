"""Batched-hypothesis RANSAC harness.

Replaces the OpenCV RANSAC black boxes (cv.findFundamentalMat FM_RANSAC,
reference features.py:195 / sfm_pipeline.py:357; cv.solvePnPRansac,
sfm_pipeline.py:567-584) with the TPU-idiomatic formulation: all H minimal
samples are drawn at once, the minimal solver is vmapped over the hypothesis
axis, residuals are one (H, N) batched evaluation, and the winner is an
argmax over masked inlier counts. No data-dependent control flow — a fixed
hypothesis budget replaces OpenCV's adaptive termination (chosen so success
probability exceeds the reference's 0.999 confidence at its worst expected
inlier ratios).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class RansacResult(NamedTuple):
    model: jnp.ndarray       # best model parameters (solver-defined shape)
    inliers: jnp.ndarray     # (N,) bool inlier mask of the best model
    num_inliers: jnp.ndarray  # scalar int
    best_score: jnp.ndarray  # scalar float (MSAC score of the winner)


def sample_indices(
    key: jax.Array,
    valid: jnp.ndarray,
    num_hypotheses: int,
    sample_size: int,
) -> jnp.ndarray:
    """Draw `num_hypotheses` minimal samples (without replacement) from the
    valid entries of a padded array; returns indices (H, k).

    Implemented as Gumbel top-k over the validity logits — one fused
    (H, N) computation, no host loop. When fewer than k points are valid,
    the surplus picks land on arbitrary (possibly padded) slots — the
    resulting hypothesis is degenerate/garbage and simply loses the inlier
    vote, so callers must NOT rely on every returned index being valid.
    """
    n = valid.shape[-1]
    logits = jnp.where(valid > 0, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, (num_hypotheses, n)) + logits
    if jax.default_backend() == "cpu":
        _, idx = jax.lax.top_k(g, sample_size)  # (H, k)
        return idx
    # top_k sorts each row on TPU (~30 ms at 1024x8192 — it was the hottest
    # op left in the whole RANSAC dispatch). For minimal-sample k, exact
    # top-k is k iterated argmax+mask passes — plain reductions, ~ms.
    # (approx_max_k is NOT safe here: on heavily-padded rows its bucketed
    # selection can return -inf (invalid) slots, poisoning the minimal
    # sample with padding points — observed as wave-registration failures.)
    return _topk_indices_iterative(g, sample_size)


def _topk_indices_iterative(g: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact top-k indices of each row via k argmax+mask passes (no sort)."""
    rows = jnp.arange(g.shape[0])
    picks = []
    for _ in range(k):
        m = jnp.argmax(g, axis=-1)
        picks.append(m)
        g = g.at[rows, m].set(-jnp.inf)
    return jnp.stack(picks, axis=-1)


def sample_masks(
    key: jax.Array,
    valid: jnp.ndarray,
    num_hypotheses: int,
    sample_size: int,
) -> jnp.ndarray:
    """Mask form of sample_indices: float (H, N) with ones at the sample."""
    n = valid.shape[-1]
    idx = sample_indices(key, valid, num_hypotheses, sample_size)
    masks = jnp.zeros((num_hypotheses, n), dtype=jnp.float32)
    rows = jnp.repeat(jnp.arange(num_hypotheses), sample_size)
    masks = masks.at[rows, idx.reshape(-1)].set(1.0)
    # Rows with fewer than sample_size valid points keep only valid ones.
    return masks * (valid > 0)


def ransac(
    key: jax.Array,
    solver: Callable[[jnp.ndarray], jnp.ndarray],
    residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
    valid: jnp.ndarray,
    sample_size: int,
    num_hypotheses: int,
    threshold: float,
    batch_residual_fn: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    sample_solver: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
) -> RansacResult:
    """Generic batched RANSAC.

    solver(sample_mask (N,)) -> model; vmapped over H hypothesis masks.
    residual_fn(model) -> (N,) residuals; vmapped over models — unless
    batch_residual_fn(models) -> (H, N) is given, which evaluates all
    hypotheses in one MXU-shaped call (vmap of a tiny-contraction einsum
    lowers to VPU broadcast work; see epipolar.sampson_distance_batch).
    valid: (N,) validity of padded data points.
    Scoring is MSAC (truncated quadratic), which dominates plain inlier
    counting at equal cost.
    """
    if sample_solver is not None:
        # Minimal solver on the GATHERED k-point sample: the mask-based
        # solver builds (H, N, ...) design matrices over the full padded
        # set when only k points per hypothesis are non-zero — at
        # 1024x8192 that materialization dominates the dispatch.
        idx = sample_indices(key, valid, num_hypotheses, sample_size)
        models = jax.vmap(sample_solver)(idx)
    else:
        masks = sample_masks(key, valid, num_hypotheses, sample_size)
        models = jax.vmap(solver)(masks)  # pytree with leading H axis
    if batch_residual_fn is not None:
        residuals = batch_residual_fn(models)  # (H, N)
    else:
        residuals = jax.vmap(residual_fn)(models)  # (H, N)

    valid_b = valid > 0
    inl = (residuals < threshold) & valid_b
    # MSAC score: sum of min(r^2, thr^2) over valid points (lower is better).
    r2 = jnp.minimum(jnp.square(residuals), threshold * threshold)
    score = jnp.sum(jnp.where(valid_b, r2, 0.0), axis=-1)
    counts = jnp.sum(inl, axis=-1)
    # Primary: maximize inliers; tie-break: minimize MSAC score.
    norm_score = score / (jnp.max(score) + 1e-12)
    best = jnp.argmax(counts.astype(jnp.float32) - 0.5 * norm_score)

    best_model = jax.tree_util.tree_map(lambda m: m[best], models)
    return RansacResult(
        model=best_model,
        inliers=inl[best],
        num_inliers=counts[best],
        best_score=score[best],
    )


def ransac_with_refit(
    key: jax.Array,
    solver: Callable[[jnp.ndarray], jnp.ndarray],
    residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
    valid: jnp.ndarray,
    sample_size: int,
    num_hypotheses: int,
    threshold: float,
    refit_rounds: int = 2,
    batch_residual_fn: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    sample_solver: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
) -> RansacResult:
    """RANSAC + iterative least-squares refit on the inlier set.

    Mirrors OpenCV's internal "LMedS polish": after the vote, the solver is
    re-run with the full inlier mask (weighted), then inliers re-evaluated.
    refit_rounds is static (unrolled) — typically 1-2.
    """
    res = ransac(key, solver, residual_fn, valid, sample_size, num_hypotheses,
                 threshold, batch_residual_fn=batch_residual_fn,
                 sample_solver=sample_solver)
    model, inliers = res.model, res.inliers

    for _ in range(refit_rounds):
        w = inliers.astype(jnp.float32) * (valid > 0)
        # Guard: keep previous model if the inlier set collapsed.
        enough = jnp.sum(w) >= sample_size
        new_model = solver(w)
        model = jax.tree_util.tree_map(
            lambda new, old: jnp.where(enough, new, old), new_model, model
        )
        r = residual_fn(model)
        inliers = (r < threshold) & (valid > 0)

    return RansacResult(
        model=model,
        inliers=inliers,
        num_inliers=jnp.sum(inliers),
        best_score=res.best_score,
    )
