"""Global Structure-from-Motion: rotation + translation averaging.

A capability the reference does not have (its SfM is strictly incremental,
sfm_pipeline.py:791-882): solve ALL camera rotations simultaneously by
chordal averaging over the pairwise pose graph, place all camera centers
by a linear direction-consistency solve, triangulate every feature track
in one batched N-view DLT, and polish with the full sparse bundle adjuster.

Why it fits TPU: every stage is one batched device program —
  - relative poses: E pairs recover_pose'd in ONE vmapped dispatch
    (padded correspondence tables),
  - rotation averaging: a lax.scan of segment-summed 3x3 matmuls +
    batched SO(3) projection — no per-camera host loop,
  - track triangulation: ONE vmapped masked N-view DLT over all tracks.
Incremental SfM is O(waves) of host round trips; global is O(1) dispatches
followed by one LM solve. On wide, well-connected capture rigs it also
avoids drift accumulation.

Use: `python -m recon3d_tpu.cli <imgs> --global-sfm` or
`run_global_sfm(pipeline)` after load/extract/match.
"""

from __future__ import annotations

import time
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from recon3d_tpu.ops.epipolar import essential_from_fundamental, recover_pose
from recon3d_tpu.ops.linalg import nearest_rotation
from recon3d_tpu.ops.triangulate import (
    reprojection_errors,
    triangulate_nview,
)

_MAX_PAIR_CORR = 512  # correspondences per pair fed to recover_pose
_MAX_TRACK_OBS = 24   # cap per-track observations in the padded DLT table


# -- stage 1: relative poses over the match graph -----------------------------


def relative_poses(pipeline):
    """Batched two-view geometry for every verified pair.

    Returns (ei, ej, R_rel (E,3,3), t_rel (E,3), w (E,)) with the convention
    x_j = R_rel x_i + t_rel (t unit norm), w = cheirality-inlier count.
    """
    K = jnp.asarray(pipeline.camera.K, jnp.float32)
    pairs = sorted(pipeline.matches.keys())
    E = len(pairs)
    if E == 0:
        raise RuntimeError("no verified pairs for global SfM")
    P = _MAX_PAIR_CORR
    x1 = np.zeros((E, P, 2), np.float32)
    x2 = np.zeros((E, P, 2), np.float32)
    msk = np.zeros((E, P), np.float32)
    Fs = np.zeros((E, 3, 3), np.float32)
    for e, (i, j) in enumerate(pairs):
        m = pipeline.matches[(i, j)]
        a = pipeline.kp_xy[i][m["idx1"]][:P]
        b = pipeline.kp_xy[j][m["idx2"]][:P]
        x1[e, : len(a)] = a
        x2[e, : len(b)] = b
        msk[e, : len(a)] = 1.0
        Fs[e] = m["F"]

    @jax.jit
    def solve(Fs, x1, x2, msk):
        Es = essential_from_fundamental(Fs, K)
        return jax.vmap(
            lambda Ee, a, b, mm: recover_pose(Ee, a, b, K, mm)
        )(Es, x1, x2, msk)

    R_rel, t_rel, front = solve(
        jnp.asarray(Fs), jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(msk)
    )
    w = np.asarray(jnp.sum(front, axis=-1), np.float32)
    ei = np.asarray([p[0] for p in pairs], np.int32)
    ej = np.asarray([p[1] for p in pairs], np.int32)
    keep = w >= 8  # pairs whose cheirality vote is too thin are unreliable
    if not keep.any():
        raise RuntimeError(
            "global SfM: no reliable pairs (every two-view cheirality vote "
            "< 8) — the scene is too low-parallax/low-texture for pose "
            "averaging; use the incremental pipeline"
        )
    return (
        ei[keep], ej[keep],
        np.asarray(R_rel)[keep], np.asarray(t_rel)[keep], w[keep],
    )


# -- stage 2: rotation averaging ----------------------------------------------


def _spanning_tree_init(ei, ej, R_rel, w, V) -> np.ndarray:
    """Compose rotations along a max-weight spanning tree (host BFS)."""
    order = np.argsort(-w)
    adj: Dict[int, List[Tuple[int, int, bool]]] = {v: [] for v in range(V)}
    for e in order:
        i, j = int(ei[e]), int(ej[e])
        adj[i].append((j, e, False))  # R_j = R_rel[e] @ R_i
        adj[j].append((i, e, True))   # R_i = R_rel[e].T @ R_j
    R = np.tile(np.eye(3, dtype=np.float32), (V, 1, 1))
    seen = np.zeros(V, bool)
    deg = np.bincount(ei, minlength=V) + np.bincount(ej, minlength=V)
    root = int(np.argmax(deg))
    seen[root] = True
    stack = [root]
    while stack:
        u = stack.pop()
        for v, e, rev in adj[u]:
            if seen[v]:
                continue
            seen[v] = True
            R[v] = (R_rel[e].T if rev else R_rel[e]) @ R[u]
            stack.append(v)
    return R, seen


def rotation_averaging(ei, ej, R_rel, w, V, iters: int | None = None):
    """Robust chordal averaging: R_i <- proj_SO3(weighted sum of neighbor
    predictions), with per-iteration Cauchy reweighting from the edge
    residuals ||R_rel R_i - R_j||_F — two-view geometry on low-texture /
    low-parallax pairs produces multi-degree outlier edges that plain L2
    would average in (measured: 7.6 deg edges -> 3.9 deg camera error;
    robust: < 1 deg). One jitted lax.scan. Returns (R (V,3,3), seen).

    iters defaults to max(64, V): BCD information flows one graph hop per
    iteration, so a 300-view arc needs ~V rounds to equilibrate (measured:
    64 iters left 0.7 deg of recoverable global bend vs 256). Each round
    is one segment_sum over the edge list — cheap at any V this solver
    targets."""
    if iters is None:
        iters = max(64, V)
    R0, seen = _spanning_tree_init(ei, ej, R_rel, w, V)
    ei_j = jnp.asarray(ei, jnp.int32)
    ej_j = jnp.asarray(ej, jnp.int32)
    Rr = jnp.asarray(R_rel)
    w0 = jnp.asarray(w / max(w.max(), 1e-6))
    deg = jnp.asarray(
        (np.bincount(ei, weights=w, minlength=V)
         + np.bincount(ej, weights=w, minlength=V)) > 0
    )

    @jax.jit
    def run(R):
        def step(R, k):
            pred_j = jnp.einsum("eab,ebc->eac", Rr, R[ei_j])       # for ej
            pred_i = jnp.einsum("eba,ebc->eac", Rr, R[ej_j])       # R^T via eba
            resid = jnp.linalg.norm(
                (pred_j - R[ej_j]).reshape(len(ei), -1), axis=-1
            )
            # Cauchy weights around the current consensus scale; the floor
            # keeps well-fitting graphs (resid ~ 0) at full weight.
            # Graduated non-convexity: sigma starts 8x wide and anneals to
            # 1x over the first half of the schedule. The spanning-tree
            # init composes ADJACENT edges, so a window-limited arc starts
            # bent; the few long-span edges that could unbend it disagree
            # with that consensus by exactly the accumulated drift, and an
            # immediately-tight Cauchy kernel suppresses them as outliers
            # (measured on the 300-view arc: aligned absolute rotation
            # error stuck at ~33 deg median; annealing lets the long edges
            # pull first, then tightens against true outliers).
            anneal = 1.0 + 7.0 * jnp.square(
                jnp.maximum(1.0 - 2.0 * k / jnp.maximum(iters, 1), 0.0)
            )
            sigma = jnp.maximum(jnp.median(resid), 0.02) * anneal
            wr = (w0 * sigma**2 / (sigma**2 + resid**2))[:, None, None]
            M = (
                jax.ops.segment_sum(wr * pred_j, ej_j, num_segments=V)
                + jax.ops.segment_sum(wr * pred_i, ei_j, num_segments=V)
            )
            Rn = nearest_rotation(M)
            Rn = jnp.where(deg[:, None, None], Rn, R)
            return Rn, None

        R, _ = jax.lax.scan(
            step, R, jnp.arange(iters, dtype=jnp.float32), length=iters
        )
        # gauge: camera 0 (or the first connected camera) = identity
        return jnp.einsum("vab,cb->vac", R, R[0])

    return np.asarray(run(jnp.asarray(R0))), seen


# -- stage 3: translation averaging -------------------------------------------


def translation_averaging(ei, ej, t_rel, R, w, V) -> np.ndarray:
    """Camera centers from pairwise directions (host linear algebra — the
    system is 3V x 3V with V at most a few hundred).

    Block-coordinate descent on the jointly convex program
    min_{C,s} sum_e w_e ||(C_j - C_i) - s_e d_e||^2 s.t. s_e >= 1, where
    d_e = -R_j^T t_rel (world direction C_i -> C_j). Outlier directions are
    handled upstream (cheirality-weight gate) and downstream (robust BA +
    resection rounds), not here."""
    E = len(ei)
    # float64 throughout: the projector Laplacian's informative spectrum
    # reaches ~1e-9 on long chains (soft bending modes); float32 direction
    # noise (~1e-7) would mix the near-degenerate lowest eigenvectors
    d = -np.einsum(
        "eba,eb->ea", R[ej].astype(np.float64), t_rel.astype(np.float64)
    )
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)

    we = w / max(w.max(), 1e-6)

    # Alternating least squares (Govindu-style): given per-edge scales s_e,
    # minimize sum_e w_e ||(C_j - C_i) - s_e d_e||^2 — a plain block graph
    # Laplacian solve, superbly conditioned (unlike both the soft-scale-row
    # and the projector-eigenvector formulations: the first loses 18% shape
    # on long chains, the second collapses camera subsets on noisy small
    # graphs). Then update s_e = d_e.(C_j - C_i) with a positivity floor
    # that prevents the collapse mode, and iterate.
    L = np.zeros((V, V))
    for e in range(E):
        i, j = int(ei[e]), int(ej[e])
        L[i, i] += we[e]
        L[j, j] += we[e]
        L[i, j] -= we[e]
        L[j, i] -= we[e]
    Lr = L[1:, 1:]  # gauge: C_0 = 0

    # Block-coordinate descent on the JOINTLY CONVEX program
    #   min_{C, s}  sum_e w_e ||(C_j - C_i) - s_e d_e||^2   s.t. s_e >= 1
    # (the s >= 1 constraint is the standard anti-collapse scale gauge of
    # LUD/BATA-style solvers; both half-steps are exact minimizations, so
    # BCD converges to the global optimum — exact data recovers the truth
    # scaled so its smallest edge spacing is 1). L is fixed: prefactor.
    Lr_inv = np.linalg.inv(Lr + 1e-12 * np.eye(V - 1))
    s = np.ones(E)
    C = np.zeros((V, 3))
    for _ in range(500):
        rhs = np.zeros((V, 3))
        contrib = (we * s)[:, None] * d
        np.add.at(rhs, ej, contrib)
        np.add.at(rhs, ei, -contrib)
        C = np.concatenate([np.zeros((1, 3)), Lr_inv @ rhs[1:]], axis=0)
        proj = np.einsum("ea,ea->e", C[ej] - C[ei], d)
        s_new = np.maximum(proj, 1.0)
        delta = np.max(np.abs(s_new - s)) / max(np.max(s_new), 1e-12)
        s = s_new
        if delta < 1e-12:
            break
    return C


# -- stage 4: tracks ----------------------------------------------------------


def build_tracks(pipeline, max_tracks: int):
    """Constrained union-find over matched keypoints -> tracks
    [(cam, kp), ...].

    A match only merges two tracks when their image sets are DISJOINT;
    conflicting merges are skipped. Plain union-find followed by
    drop-if-ambiguous (COLMAP's mapper policy on its raw form) lets one
    bad geometric-survivor correspondence glue two long tracks into a
    component with duplicate images that must then be discarded wholesale
    — measured on a 300-view arc: 60 glued components swallowed 10,175 of
    ~16k matched keypoints, leaving 281 usable tracks out of thousands.
    Constrained merging keeps every clean prefix instead."""
    counts = [len(k) for k in pipeline.kp_xy]
    base = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    total = int(base[-1])
    parent = np.arange(total, dtype=np.int64)
    imgset: dict = {}  # root -> set of image ids (created lazily on merge)

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    for (i, j), m in pipeline.matches.items():
        if m.get("aux"):
            continue  # pose-graph-only long-span edges (pipeline
            # _rematch_long_span): their recovered keypoints are too noisy
            # for triangulated tracks
        na = base[i] + np.asarray(m["idx1"], np.int64)
        nb = base[j] + np.asarray(m["idx2"], np.int64)
        for a, b in zip(na.tolist(), nb.tolist()):
            ra, rb = find(a), find(b)
            if ra == rb:
                continue
            sa = imgset.get(ra)
            sb = imgset.get(rb)
            if sa is None:
                sa = {i}  # singleton root: node a is one of image i's kps
            if sb is None:
                sb = {j}
            if sa & sb:
                continue  # conflict: would put two keypoints in one image
            # union by size (set size == component size for matched kps)
            if len(sa) < len(sb):
                ra, rb, sa, sb = rb, ra, sb, sa
            parent[rb] = ra
            sa |= sb
            imgset[ra] = sa
            imgset.pop(rb, None)

    roots = np.array([find(a) for a in range(total)])
    order = np.argsort(roots, kind="stable")
    tracks = []
    img_of = np.searchsorted(base, order, side="right") - 1
    kp_of = order - base[img_of]
    bounds = np.nonzero(np.diff(roots[order]))[0] + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [total]])
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        cams = img_of[s:e]
        if len(np.unique(cams)) != e - s:  # unreachable under the invariant
            continue
        tracks.append(list(zip(cams.tolist(), kp_of[s:e].tolist())))
        if len(tracks) >= max_tracks:
            break
    return tracks


# -- orchestration -------------------------------------------------------------


def run_global_sfm(pipeline) -> None:
    """Solve poses + points globally and write them into the pipeline's
    state (poses/registered/points3d/observations/kp_to_point/colors), so
    every downstream stage (BA, dense, exports, stats) works unchanged."""
    cfg = pipeline.config
    t0 = time.time()
    V = len(pipeline.kp_xy)

    ei, ej, R_rel, t_rel, w = relative_poses(pipeline)
    print(f"[global] {len(ei)} reliable pairs over {V} images")

    R, seen = rotation_averaging(ei, ej, R_rel, w, V)
    C = translation_averaging(ei, ej, t_rel, R, w, V)

    connected = np.zeros(V, bool)
    connected[np.unique(np.concatenate([ei, ej]))] = True
    connected &= seen
    pipeline.poses = {
        int(i): (
            R[i].astype(np.float32),
            (-R[i] @ C[i]).astype(np.float32),
        )
        for i in range(V) if connected[i]
    }
    pipeline.registered = set(pipeline.poses.keys())
    print(f"[global] averaged {len(pipeline.poses)} camera poses "
          f"({time.time() - t0:.1f}s)")

    # tracks -> padded table for the batched masked N-view DLT
    tracks = build_tracks(pipeline, max_tracks=cfg.sfm.max_points)
    tracks = [
        [(c, k) for c, k in tr if connected[c]] for tr in tracks
    ]
    tracks = [tr for tr in tracks if len(tr) >= 2]
    # Cap observations per track (COLMAP-style): the padded DLT table is
    # (T, Vmax, ...), so one feature tracked through most of a large scene
    # would inflate EVERY track's row to its length — quadratic memory for
    # a table whose real observation count is ~mean-track-length smaller.
    # Evenly-spaced subsampling keeps the camera spread (baseline diversity).
    tracks = [
        tr if len(tr) <= _MAX_TRACK_OBS
        else [tr[int(v)] for v in
              np.linspace(0, len(tr) - 1, _MAX_TRACK_OBS).round()]
        for tr in tracks
    ]
    T = len(tracks)
    if T == 0:
        raise RuntimeError("global SfM: no multi-view tracks")
    Vmax = max(len(tr) for tr in tracks)
    cam_idx = np.zeros((T, Vmax), np.int32)
    xs = np.zeros((T, Vmax, 2), np.float32)
    msk = np.zeros((T, Vmax), np.float32)
    for t, tr in enumerate(tracks):
        for v, (c, k) in enumerate(tr):
            cam_idx[t, v] = c
            xs[t, v] = pipeline.kp_xy[c][k]
            msk[t, v] = 1.0
    table = (tracks, cam_idx, xs, msk)

    # Alternate triangulation and full BA: the first pass triangulates from
    # the averaged poses (loose 2x gate), BA refines, re-triangulation from
    # the refined poses recovers observations the loose geometry lost and
    # tightens X — without it, LM trades rotation against translation on
    # thin tracks (measured: up to 6.7 deg camera-rotation error on the
    # 6-view GT scene; < 1 deg with the alternation).
    # The first gate must be LOOSE: averaged poses carry a few degrees of
    # error, and a tight gate would keep exactly the observations consistent
    # with that error (measured: cameras kept 21/100+ obs and BA locked the
    # wrong pose in). The Huber-robust BA absorbs the outliers the loose
    # gate admits; each round then re-triangulates and tightens.
    _solve_points(pipeline, table, cfg.sfm.max_reproj_error_px * 6.0)
    print(f"[global] {len(pipeline.points3d)} points from {T} tracks "
          f"({time.time() - t0:.1f}s)")
    # Resection-intersection rounds: motion-only refinement (each camera
    # snaps to the current cloud in one fused dispatch) alternated with
    # re-triangulation. Decoupling the camera solves pulls the few-degree
    # averaging errors out of the shallow joint basin that full LM settles
    # into from this init (measured: 5.8 -> <1 deg on the GT scene).
    for _ in range(3):
        pipeline.bundle_adjustment_light()
        _solve_points(pipeline, table, cfg.sfm.max_reproj_error_px * 3.0)
    pipeline.bundle_adjustment_full(final=True)
    _solve_points(pipeline, table, cfg.sfm.max_reproj_error_px * 2.0)
    pipeline.bundle_adjustment_full(final=True)
    pipeline.drop_invalid_observations(cfg.sfm.max_reproj_error_px)
    pipeline.bundle_adjustment_full(final=True)
    # cameras outside the averaged pose graph (disconnected / too few
    # cheirality inliers) get a second chance through the incremental
    # machinery: batched PnP against the global points
    pipeline.failed = set(
        i for i in range(V) if i not in pipeline.registered
    )
    if pipeline.failed:
        pipeline.try_recover_images()
        pipeline.bundle_adjustment_full(final=True)
    # final cheirality/reproj sweep: the last BA can push a tiny-parallax
    # track behind its cameras (depth unconstrained); drop it rather than
    # report it (a single behind-camera point blows up the mean-reproj stat)
    pipeline.drop_invalid_observations(cfg.sfm.max_reproj_error_px)
    pipeline._normalize_reconstruction()


@jax.jit
def _triangulate_gate(K, P_all, Rs, ts, cam_idx, xs, msk, gate_px):
    """One vmapped masked N-view DLT + per-observation reprojection /
    cheirality gates. Module-level jit: the repeated triangulate/BA rounds
    reuse ONE compiled program (gate_px is a traced scalar)."""
    Ps = jnp.take(P_all, cam_idx, axis=0)  # (T, Vmax, 3, 4)
    X = jax.vmap(triangulate_nview)(Ps, xs, msk)
    Rg = jnp.take(Rs, cam_idx, axis=0)
    tg = jnp.take(ts, cam_idx, axis=0)
    e = jax.vmap(
        lambda Rv, tv, Xp, xv: reprojection_errors(
            K, Rv, tv, Xp[None].repeat(Rv.shape[0], 0), xv
        ).reshape(-1)
    )(Rg, tg, X, xs)
    z = (jnp.einsum("tvab,tb->tva", Rg, X) + tg)[..., 2]
    ok = (e <= gate_px) & (z > 1e-6) & (msk > 0)
    return X, ok


def _solve_points(pipeline, table, gate_px: float) -> None:
    """Triangulate every track with the CURRENT poses (one vmapped masked
    N-view DLT) and rewrite the pipeline's point/observation state."""
    tracks, cam_idx, xs, msk = table
    V = len(pipeline.kp_xy)
    K = np.asarray(pipeline.camera.K, np.float32)
    Rs = np.stack([
        np.asarray(pipeline.poses[i][0]) if i in pipeline.poses
        else np.eye(3, dtype=np.float32)
        for i in range(V)
    ]).astype(np.float32)
    ts = np.stack([
        np.asarray(pipeline.poses[i][1]).reshape(3) if i in pipeline.poses
        else np.float32([0, 0, 1])
        for i in range(V)
    ]).astype(np.float32)
    P_all = (K[None] @ np.concatenate([Rs, ts[:, :, None]], axis=2)).astype(
        np.float32
    )

    X, ok_obs = _triangulate_gate(
        jnp.asarray(K), jnp.asarray(P_all), jnp.asarray(Rs), jnp.asarray(ts),
        jnp.asarray(cam_idx), jnp.asarray(xs), jnp.asarray(msk),
        jnp.float32(gate_px),
    )
    X = np.asarray(X)
    ok_obs = np.asarray(ok_obs)
    keep = ok_obs.sum(axis=1) >= 2

    pipeline.points3d = []
    pipeline.point_colors = []
    pipeline.observations = []
    pipeline._obs_generation += 1  # wholesale rewrite: stale device log
    pipeline.kp_to_point = [
        np.full(len(k), -1, np.int64) for k in pipeline.kp_xy
    ]
    # Rebuild the 2D-3D correspondence index from scratch: routing every
    # assignment through _note_kp_link propagates point ids to UNREGISTERED
    # match partners, which is what try_recover_images' batched PnP reads
    # when recovering cameras outside the averaged pose graph.
    pipeline.corr = {}
    color_img = pipeline.image_set.color if pipeline.image_set else None
    H = color_img.shape[1] if color_img is not None else 0
    W = color_img.shape[2] if color_img is not None else 0
    for t in np.nonzero(keep)[0]:
        obs = [
            (int(c), int(k))
            for v, (c, k) in enumerate(tracks[t]) if ok_obs[t, v]
        ]
        if len(obs) < 2:
            continue
        pid = len(pipeline._pts)
        for c, k in obs:
            pipeline._note_kp_link(c, k, pid)
        pipeline._pts.append(X[t].astype(np.float32))
        pipeline.observations.append(obs)
        if color_img is not None:
            c0, k0 = obs[0]
            x, y = pipeline.kp_xy[c0][k0]
            xi = min(max(int(round(x)), 0), W - 1)
            yi = min(max(int(round(y)), 0), H - 1)
            pipeline._cols.append(
                (color_img[c0, yi, xi] * 255).astype(np.uint8)
            )
        else:
            pipeline._cols.append(np.full(3, 180, np.uint8))
