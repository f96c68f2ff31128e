"""Brute-force descriptor matching with ratio test + mutual cross-check.

Replaces cv.FlannBasedMatcher's KD-tree ANN (reference features.py:107-171).
On TPU, the idiomatic formulation is exact: one (N, M) distance matrix via a
descriptor matmul on the MXU, top-2 per row for Lowe's ratio test, and a
mutual-argmin mask for the cross-check. Exact matching is *better* than
FLANN's approximate search at the same or lower cost on this hardware.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


class MatchResult(NamedTuple):
    """Padded pairwise matches.

    idx1, idx2: (N,) — for each keypoint in image 1, the matched keypoint in
                image 2 (or -1). `mask` marks surviving matches; `distance`
                is the L2 descriptor distance.
    """

    idx1: jnp.ndarray
    idx2: jnp.ndarray
    distance: jnp.ndarray
    mask: jnp.ndarray

    @property
    def num_matches(self):
        return jnp.sum(self.mask)


@functools.partial(jax.jit, static_argnames=("cross_check",))
def match_descriptors(
    d1: jnp.ndarray,
    d2: jnp.ndarray,
    valid1: jnp.ndarray,
    valid2: jnp.ndarray,
    ratio: float = 0.75,
    cross_check: bool = True,
) -> MatchResult:
    """d1: (N, D), d2: (M, D) with validity masks. Returns MatchResult.

    Squared L2 distances computed as ||a||^2 + ||b||^2 - 2ab with the cross
    term on the MXU; invalid rows/cols are pushed to +inf.
    """
    n1 = jnp.sum(d1 * d1, axis=-1)
    n2 = jnp.sum(d2 * d2, axis=-1)
    cross = jnp.matmul(d1, d2.T, precision=_HI)
    d2sq = n1[:, None] + n2[None, :] - 2.0 * cross
    d2sq = jnp.maximum(d2sq, 0.0)

    big = jnp.inf
    d2sq = jnp.where(valid2[None, :] > 0, d2sq, big)
    d2sq = jnp.where(valid1[:, None] > 0, d2sq, big)

    # top-2 smallest along axis 1 (negate for top_k)
    neg = -d2sq
    vals, idx = jax.lax.top_k(neg, 2)  # (N, 2)
    best = -vals[:, 0]
    second = -vals[:, 1]
    nn = idx[:, 0]

    # Lowe ratio on true (non-squared) distances: d1 < ratio * d2
    ratio_ok = best < (ratio * ratio) * second

    ok = ratio_ok & (valid1 > 0) & jnp.isfinite(best)

    if cross_check:
        # mutual nearest: argmin over rows for each column
        back = jnp.argmin(d2sq, axis=0)  # (M,)
        mutual = back[nn] == jnp.arange(d1.shape[0])
        ok = ok & mutual

    idx1 = jnp.arange(d1.shape[0], dtype=jnp.int32)
    idx2 = jnp.where(ok, nn.astype(jnp.int32), -1)
    return MatchResult(
        idx1=idx1,
        idx2=idx2,
        distance=jnp.sqrt(jnp.where(jnp.isfinite(best), best, 0.0)),
        mask=ok,
    )


def gather_matched_points(
    xy1: jnp.ndarray, xy2: jnp.ndarray, match: MatchResult
):
    """Matched coordinate arrays (N, 2), (N, 2) with invalid rows zeroed.

    Keeps the padded shape — downstream RANSAC consumes the mask.
    """
    x1 = jnp.where(match.mask[:, None], xy1, 0.0)
    x2 = jnp.where(match.mask[:, None], xy2[jnp.clip(match.idx2, 0, None)], 0.0)
    return x1, x2


def match_descriptors_streaming(
    d1: jnp.ndarray,
    d2: jnp.ndarray,
    valid1: jnp.ndarray,
    valid2: jnp.ndarray,
    ratio: float = 0.75,
    cross_check: bool = True,
    block: int = 1024,
) -> MatchResult:
    """match_descriptors without materializing the (N, M) distance matrix.

    Scans over column blocks of d2, keeping a running top-2 per row (for the
    ratio test) and a per-column row-argmin (for the cross-check). Peak
    memory is O(N * block) instead of O(N * M) — at the default 8k-keypoint
    budget that is 32 MB instead of 256 MB per pair, which is what makes
    vmapping many pairs into one device program possible.
    """
    N, D = d1.shape
    M = d2.shape[0]
    nb = (M + block - 1) // block
    Mp = nb * block
    pad = Mp - M
    d2p = jnp.pad(d2, ((0, pad), (0, 0)))
    v2p = jnp.pad(valid2, (0, pad))
    d2b = d2p.reshape(nb, block, D)
    v2b = v2p.reshape(nb, block)

    n1 = jnp.sum(d1 * d1, axis=-1)
    big = jnp.float32(1e30)

    def step(carry, blk):
        best, second, nn = carry
        db, vb, base = blk
        n2 = jnp.sum(db * db, axis=-1)
        cross = jnp.matmul(d1, db.T, precision=_HI)  # (N, B)
        dd = jnp.maximum(n1[:, None] + n2[None, :] - 2.0 * cross, 0.0)
        dd = jnp.where(vb[None, :] > 0, dd, big)

        # block top-2 per row via min + masked second-min: lax.top_k sorts
        # each row on TPU (~40 ms/pair at 8k keypoints); two plain
        # reductions are memory-bound and ~30x cheaper.
        i1loc = jnp.argmin(dd, axis=1)
        b1 = jnp.min(dd, axis=1)  # == dd[argmin] without the gather
        cols = jnp.arange(dd.shape[1], dtype=jnp.int32)
        dd2 = jnp.where(cols[None, :] == i1loc[:, None], big, dd)
        b2 = jnp.min(dd2, axis=1)
        i1 = base + i1loc

        # merge (best, second) with (b1, b2): new best/second of the union
        nbest = jnp.minimum(best, b1)
        nsecond = jnp.minimum(
            jnp.maximum(best, b1), jnp.minimum(second, b2)
        )
        nnn = jnp.where(b1 < best, i1, nn)

        # per-column row-argmin of this block (for mutual cross-check)
        col_arg = jnp.argmin(
            jnp.where(valid1[:, None] > 0, dd, big), axis=0
        ).astype(jnp.int32)
        return (nbest, nsecond, nnn), col_arg

    base_idx = (jnp.arange(nb) * block).astype(jnp.int32)
    init = (
        jnp.full((N,), big),
        jnp.full((N,), big),
        jnp.zeros((N,), jnp.int32),
    )
    (best, second, nn), col_args = jax.lax.scan(
        step, init, (d2b, v2b, base_idx)
    )
    back = col_args.reshape(-1)[:M]  # (M,) row index minimizing each column

    ratio_ok = best < (ratio * ratio) * second
    ok = ratio_ok & (valid1 > 0) & (best < big)
    if cross_check:
        mutual = back[jnp.clip(nn, 0, M - 1)] == jnp.arange(N)
        ok = ok & mutual

    idx1 = jnp.arange(N, dtype=jnp.int32)
    idx2 = jnp.where(ok, nn, -1)
    return MatchResult(
        idx1=idx1,
        idx2=idx2,
        distance=jnp.sqrt(jnp.where(best < big, best, 0.0)),
        mask=ok,
    )
