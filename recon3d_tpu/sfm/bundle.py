"""Sparse bundle adjustment: Schur-reduced Levenberg-Marquardt with CG.

The reference has no true BA — its "bundle_adjustment_light" re-solves each
camera with PnP, never moving points (sfm_pipeline.py:694-776). This module
is the real thing (SURVEY.md §7 step 6), designed for TPU:

  - per-observation (2,6)/(2,3) Jacobian blocks from one vmapped jacfwd,
  - point blocks eliminated analytically (batched closed-form 3x3
    inverses) and preconditioned CG on the Schur-reduced camera system
    ("Bundle Adjustment in the Large" RCS recipe),
  - every J/J^T contraction is gathers + einsums + contiguous cumsum
    segment reductions — zero XLA scatters (the slowest op class on TPU),
  - Huber robustification via IRLS weights,
  - cameras parameterized as se(3) increments on the linearization point,
  - gauge fixed by freezing camera 0 (and the scale by damping).

Everything is fixed-shape: observations padded to capacity with weights.
Exposes full BA and motion-only mode (points frozen — parity with the
reference's behavior).
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from recon3d_tpu.config import BundleConfig
from recon3d_tpu.ops.lie import se3_exp

_HI = jax.lax.Precision.HIGHEST


class BAData(NamedTuple):
    K: jnp.ndarray        # (3, 3)
    R0: jnp.ndarray       # (C, 3, 3) linearization poses
    t0: jnp.ndarray       # (C, 3)
    X0: jnp.ndarray       # (P, 3) linearization points
    obs_cam: jnp.ndarray  # (O,) int32
    obs_pt: jnp.ndarray   # (O,) int32 — sorted ascending over the real rows
    obs_xy: jnp.ndarray   # (O, 2)
    obs_w: jnp.ndarray    # (O,) 0/1 validity
    # Scatter-free segment-reduction indices (XLA scatter-adds are the
    # slowest op class on TPU; every J^T contraction instead uses cumsum +
    # boundary differences over contiguous segments). Points are contiguous
    # because the observation table is built point-major; cameras get a
    # host-precomputed sort permutation.
    pt_start: jnp.ndarray   # (P,) int32 — [start, end) rows of point p
    pt_end: jnp.ndarray     # (P,) int32
    cam_perm: jnp.ndarray   # (O,) int32 — permutation sorting rows by camera
    cam_start: jnp.ndarray  # (C,) int32
    cam_end: jnp.ndarray    # (C,) int32


class BAParams(NamedTuple):
    xi: jnp.ndarray       # (C, 6) se3 increments
    dX: jnp.ndarray       # (P, 3) point increments


def _apply_increment(xi, R0, t0):
    dR, dt = se3_exp(xi)
    R = jnp.matmul(dR, R0, precision=_HI)
    t = jnp.einsum("cij,cj->ci", dR, t0, precision=_HI) + dt
    return R, t


def _residuals(params: BAParams, data: BAData, robust_w: jnp.ndarray) -> jnp.ndarray:
    """Weighted residual vector (O*2,)."""
    R, t = _apply_increment(params.xi, data.R0, data.t0)
    X = data.X0 + params.dX
    Rg = jnp.take(R, data.obs_cam, axis=0)
    tg = jnp.take(t, data.obs_cam, axis=0)
    Xg = jnp.take(X, data.obs_pt, axis=0)
    Xc = jnp.einsum("oij,oj->oi", Rg, Xg, precision=_HI) + tg
    z = Xc[:, 2:3]
    z = jnp.where(jnp.abs(z) < 1e-6, jnp.where(z < 0, -1e-6, 1e-6), z)
    uv = Xc[:, :2] / z
    K = data.K
    u = K[0, 0] * uv[:, 0] + K[0, 1] * uv[:, 1] + K[0, 2]
    v = K[1, 1] * uv[:, 1] + K[1, 2]
    r = jnp.stack([u, v], axis=1) - data.obs_xy
    w = (data.obs_w * robust_w)[:, None]
    return (r * w).reshape(-1)


def _robust_weights(params: BAParams, data: BAData, delta: float) -> jnp.ndarray:
    """IRLS Huber weights sqrt(w(||r||)) from the current residuals."""
    r = _residuals(params, data, jnp.ones_like(data.obs_w)).reshape(-1, 2)
    n = jnp.linalg.norm(r, axis=1)
    w = jnp.where(n <= delta, 1.0, delta / jnp.maximum(n, 1e-12))
    return jnp.sqrt(w)


def _reduce_contiguous(y: jnp.ndarray, start: jnp.ndarray,
                       end: jnp.ndarray) -> jnp.ndarray:
    """Segment sums of y (O, D) whose segments occupy contiguous row ranges
    [start_s, end_s): exclusive cumsum + two boundary gathers — no scatter.
    Rows outside every segment (zero-weight padding) contribute nothing as
    long as their values are zero, which the w-multiplied Jacobians are."""
    c = jnp.cumsum(y, axis=0)
    c = jnp.concatenate([jnp.zeros((1,) + y.shape[1:], y.dtype), c], axis=0)
    return jnp.take(c, end, axis=0) - jnp.take(c, start, axis=0)


def _reduce_pt(data: BAData, y: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Sum per-observation rows into point rows (table is point-major).

    Under shard_map (axis set) each shard reduces its local contiguous
    segments, then one psum over the mesh axis completes the sum — the
    observation table is the data-parallel axis of sharded BA."""
    out = _reduce_contiguous(y, data.pt_start, data.pt_end)
    return jax.lax.psum(out, axis) if axis else out


def _reduce_cam(data: BAData, y: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Sum per-observation rows into camera rows via the sort permutation."""
    out = _reduce_contiguous(
        jnp.take(y, data.cam_perm, axis=0), data.cam_start, data.cam_end
    )
    return jax.lax.psum(out, axis) if axis else out


def _sum_scalar(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    s = jnp.sum(x)
    return jax.lax.psum(s, axis) if axis else s


def _obs_res_one(xi_c, dX_p, Rc0, tc0, Xp0, xy, w, K):
    """Weighted 2-vector residual of one observation."""
    dR, dt = se3_exp(xi_c)
    R = jnp.matmul(dR, Rc0, precision=_HI)
    t = jnp.einsum("ij,j->i", dR, tc0, precision=_HI) + dt
    X = Xp0 + dX_p
    Xc = jnp.einsum("ij,j->i", R, X, precision=_HI) + t
    # Sign-preserving clamp, identical to _residuals: cost0/cost1 and the
    # LM accept/reject decision must come from ONE objective.
    z = jnp.where(
        jnp.abs(Xc[2]) < 1e-6,
        jnp.where(Xc[2] < 0, -1e-6, 1e-6),
        Xc[2],
    )
    uv = Xc[:2] / z
    u = K[0, 0] * uv[0] + K[0, 1] * uv[1] + K[0, 2]
    v = K[1, 1] * uv[1] + K[1, 2]
    return (jnp.stack([u, v]) - xy) * w


def _per_obs_jacobians(params, data, robust_w):
    """Per-observation residuals and Jacobian blocks.

    Returns (r (O, 2), Jc (O, 2, 6), Jp (O, 2, 3)) — the explicit
    Gauss-Newton blocks every J/J^T application contracts against, so the
    CG loop needs only gathers, einsums, and contiguous reductions."""
    args = (
        jnp.take(params.xi, data.obs_cam, axis=0),
        jnp.take(params.dX, data.obs_pt, axis=0),
        jnp.take(data.R0, data.obs_cam, axis=0),
        jnp.take(data.t0, data.obs_cam, axis=0),
        jnp.take(data.X0, data.obs_pt, axis=0),
        data.obs_xy,
        data.obs_w * robust_w,
    )
    f = lambda *a: _obs_res_one(*a, data.K)
    r = jax.vmap(f)(*args)
    Jc, Jp = jax.vmap(jax.jacfwd(f, argnums=(0, 1)))(*args)
    return r, Jc, Jp


def _inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate / det) — XLA's generic
    linalg.inv lowers small batched inverses to LU loops on TPU."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    Cc = d * h - e * g
    det = a * A + b * B + c * Cc
    det = jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
        jnp.stack([Cc, -(a * h - b * g), a * e - b * d], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]


@functools.partial(
    jax.jit, static_argnames=("cg_iters", "motion_only", "axis")
)
def _lm_step(
    params: BAParams,
    data: BAData,
    damping: jnp.ndarray,
    delta: float,
    cg_iters: int = 40,
    motion_only: bool = False,
    axis=None,
):
    """One LM iteration via the Schur-reduced camera system ("Bundle
    Adjustment in the Large" RCS): eliminate all point blocks analytically
    (their damped 3x3 Hessians invert in closed form), run preconditioned
    CG on the 6C-dim camera system, back-substitute the point step. Jitted
    as ONE device program (CG under lax.scan).

    Why this shape for TPU:
      - the Jacobian is materialized ONCE per LM step as per-observation
        (2,6)/(2,3) blocks; every Schur matvec is gathers + einsums +
        contiguous segment reductions (no scatters — see _reduce_cam),
      - the CG space drops from 6C+3P to 6C (P >> C in SfM) and its
        conditioning improves enough that the same iteration budget
        actually converges,
      - motion_only is the same program with C^{-1} = 0 (points frozen),
      - axis names a shard_map mesh axis for observation-parallel BA: each
        device holds a contiguous slice of the observation table (with its
        own per-shard segment indices); every J^T reduction and cost sum
        psums over the axis, parameters stay replicated, and the CG loop
        runs identically on every device.
    """
    C = params.xi.shape[0]
    P = params.dX.shape[0]
    robust_w = jax.lax.stop_gradient(_robust_weights(params, data, delta))

    free_cam = jnp.concatenate([jnp.zeros(1), jnp.ones(C - 1)])  # gauge: cam0 fixed
    fc6 = jnp.repeat(free_cam, 6).reshape(C, 6)

    r0_obs, Jc, Jp = _per_obs_jacobians(params, data, robust_w)
    cost0 = 0.5 * _sum_scalar(r0_obs * r0_obs, axis)

    # gradient halves
    g_c = _reduce_cam(
        data, jnp.einsum("oij,oi->oj", Jc, r0_obs, precision=_HI), axis
    ) * fc6                                                     # (C, 6)
    g_p = _reduce_pt(
        data, jnp.einsum("oij,oi->oj", Jp, r0_obs, precision=_HI), axis
    )                                                           # (P, 3)

    # per-point damped Hessian blocks and their closed-form inverses
    Cp = _reduce_pt(
        data, jnp.einsum("oia,oib->oab", Jp, Jp, precision=_HI), axis
    )                                                           # (P, 3, 3)
    diag_p = jnp.einsum("paa->pa", Cp)
    Cp = Cp + damping * jax.vmap(jnp.diag)(diag_p) + 1e-8 * jnp.eye(3)
    if motion_only:
        Cinv = jnp.zeros_like(Cp)
    else:
        Cinv = _inv3x3(Cp)

    diag_c = _reduce_cam(
        data, jnp.einsum("oia,oia->oa", Jc, Jc), axis
    ) * fc6
    lam_c = damping * diag_c + 1e-8                             # (C, 6)

    def B_apply(xc):  # camera-camera block (undamped)
        u = jnp.einsum(
            "oij,oj->oi", Jc, jnp.take(xc, data.obs_cam, axis=0),
            precision=_HI,
        )
        return _reduce_cam(
            data, jnp.einsum("oij,oi->oj", Jc, u, precision=_HI), axis
        )

    def E_apply(xp):  # camera <- point coupling
        u = jnp.einsum(
            "oij,oj->oi", Jp, jnp.take(xp, data.obs_pt, axis=0),
            precision=_HI,
        )
        return _reduce_cam(
            data, jnp.einsum("oij,oi->oj", Jc, u, precision=_HI), axis
        )

    def Et_apply(xc):  # point <- camera coupling
        u = jnp.einsum(
            "oij,oj->oi", Jc, jnp.take(xc, data.obs_cam, axis=0),
            precision=_HI,
        )
        return _reduce_pt(
            data, jnp.einsum("oij,oi->oj", Jp, u, precision=_HI), axis
        )

    def S_apply(xc):  # Schur complement: B + lam - E Cinv E^T
        xc = xc * fc6
        y = B_apply(xc) + lam_c * xc
        t = jnp.einsum("pab,pb->pa", Cinv, Et_apply(xc), precision=_HI)
        return (y - E_apply(t)) * fc6

    # RHS: v - E Cinv w with v = -g_c, w = -g_p
    w_p = jnp.einsum("pab,pb->pa", Cinv, -g_p, precision=_HI)
    b = (-g_c - E_apply(w_p)) * fc6

    # Block-Jacobi preconditioner on the EXACT 6x6 diagonal blocks of the
    # Schur complement (Ceres' SCHUR_JACOBI): each (camera, point) pair
    # occupies exactly one observation row, so S_cc = sum_o JcᵀJc + lam -
    # sum_o (JcᵀJp) Cinv (JpᵀJc) assembles per-observation and reduces over
    # the camera segments. Scalar Jacobi needs O(graph diameter) CG
    # iterations on chain-shaped capture arcs (measured: a 300-camera arc
    # made NO accepted LM steps at 24 CG iterations); the exact block
    # diagonal restores convergence there and cuts the budget elsewhere.
    E_o = jnp.einsum("oia,oib->oab", Jc, Jp, precision=_HI)       # (O, 6, 3)
    Cinv_o = jnp.take(Cinv, data.obs_pt, axis=0)                  # (O, 3, 3)
    ECE_o = jnp.einsum(
        "oab,obc,odc->oad", E_o, Cinv_o, E_o, precision=_HI
    )                                                             # (O, 6, 6)
    B_o = jnp.einsum("oia,oib->oab", Jc, Jc, precision=_HI)
    S_blk = _reduce_cam(
        data, (B_o - ECE_o).reshape(-1, 36), axis
    ).reshape(C, 6, 6)
    S_blk = S_blk + jax.vmap(jnp.diag)(lam_c)
    # Gauge-fixed / observation-free cameras: their CG coordinates must stay
    # exactly zero; an identity block keeps the inverse benign there.
    live = (free_cam > 0) & (jnp.sum(diag_c, axis=-1) > 0)
    S_blk = jnp.where(live[:, None, None], S_blk, jnp.eye(6, dtype=S_blk.dtype))
    M_blk = jnp.linalg.inv(S_blk)                                 # (C, 6, 6)

    def M_apply(r):
        return jnp.einsum("cab,cb->ca", M_blk, r, precision=_HI) * fc6

    def cg_body(carry, _):
        x, r, z, p = carry
        Ap = S_apply(p)
        rz = jnp.sum(r * z)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-12)
        x = x + alpha * p
        r_new = r - alpha * Ap
        z_new = M_apply(r_new)
        beta = jnp.sum(r_new * z_new) / jnp.maximum(rz, 1e-12)
        p = z_new + beta * p
        return (x, r_new, z_new, p), None

    z0 = M_apply(b)
    (dc, *_), _ = jax.lax.scan(
        cg_body, (jnp.zeros_like(b), b, z0, z0), None, length=cg_iters
    )
    dc = dc * fc6

    # back-substitute the point step: dp = Cinv (w - E^T dc)
    dp = jnp.einsum(
        "pab,pb->pa", Cinv, -g_p - Et_apply(dc), precision=_HI
    )

    cand = BAParams(xi=params.xi + dc, dX=params.dX + dp)
    r1 = _residuals(cand, data, robust_w)
    cost1 = 0.5 * _sum_scalar(r1 * r1, axis)
    return cand, cost0, cost1


@functools.partial(
    jax.jit, static_argnames=("cg_iters", "motion_only", "axis")
)
def _lm_loop(
    data: BAData,
    damping0: jnp.ndarray,
    delta: jnp.ndarray,
    max_iters: jnp.ndarray = 20,
    cg_iters: int = 40,
    motion_only: bool = False,
    axis=None,
):
    """Full LM optimization (accept/reject + damping schedule) in one jitted
    while_loop. Returns (R, t, X, accepted_iterations)."""
    C = data.R0.shape[0]
    P = data.X0.shape[0]

    def cond(carry):
        R0, t0, X0, damping, it, done = carry
        return (it < max_iters) & jnp.logical_not(done)

    def body(carry):
        R0, t0, X0, damping, it, done = carry
        d = data._replace(R0=R0, t0=t0, X0=X0)
        params = BAParams(xi=jnp.zeros((C, 6)), dX=jnp.zeros((P, 3)))
        cand, cost0, cost1 = _lm_step(
            params, d, damping, delta,
            cg_iters=cg_iters, motion_only=motion_only, axis=axis,
        )
        accept = cost1 < cost0
        Rn, tn = _apply_increment(cand.xi, R0, t0)
        R0 = jnp.where(accept, Rn, R0)
        t0 = jnp.where(accept, tn, t0)
        X0 = jnp.where(accept, X0 + cand.dX, X0)
        converged = accept & (
            (cost0 - cost1) / jnp.maximum(cost0, 1e-12) < 1e-5
        )
        damping = jnp.where(
            accept, jnp.maximum(damping * 0.5, 1e-8), damping * 4.0
        )
        diverged = jnp.logical_not(accept) & (damping > 1e4)
        return (
            R0, t0, X0, damping,
            it + accept.astype(jnp.int32),
            converged | diverged,
        )

    R, t, X, _, iters, _ = jax.lax.while_loop(
        cond, body,
        (data.R0, data.t0, data.X0, damping0, jnp.int32(0), jnp.bool_(False)),
    )
    return R, t, X, iters


@functools.lru_cache(maxsize=8)
def _lm_mesh_program(mesh, cg_iters: int, motion_only: bool):
    """One jitted shard_map LM program per (mesh, cg_iters, motion_only).
    Memoized at module level: a fresh jit-of-closure per BA call would
    re-trace the whole LM loop every bundle adjustment (a multi-second
    toll per call on warm steady-state runs)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    obs = P("data")
    obs2 = P("data", None)
    in_specs = (
        BAData(
            K=P(), R0=P(), t0=P(), X0=P(),
            obs_cam=obs, obs_pt=obs, obs_xy=obs2, obs_w=obs,
            pt_start=obs2, pt_end=obs2,
            cam_perm=obs, cam_start=obs2, cam_end=obs2,
        ),
        P(), P(), P(),
    )

    def fn(data, damping0, delta, max_iters):
        # per-shard index tables arrive as (1, P)/(1, C): drop the shard dim
        d = data._replace(
            pt_start=data.pt_start[0], pt_end=data.pt_end[0],
            cam_start=data.cam_start[0], cam_end=data.cam_end[0],
        )
        return _lm_loop(
            d, damping0, delta, max_iters,
            cg_iters=cg_iters, motion_only=motion_only, axis="data",
        )

    sharded = jax.jit(
        shard_map(
            fn, mesh=mesh, in_specs=in_specs,
            out_specs=(P(), P(), P(), P()),
        )
    )
    return sharded, in_specs


def _lm_loop_mesh(
    mesh,
    data_host: dict,
    damping0,
    delta,
    max_iters,
    cg_iters: int,
    motion_only: bool,
):
    """Observation-sharded LM loop over a device mesh ('data' axis).

    Each device holds a contiguous slice of the padded observation table
    with its own per-shard segment indices (built by bundle_adjust);
    parameters are replicated and every reduction psums (see _lm_step's
    axis docs). This is the SURVEY §7 step-11 sharding of the BA CG:
    observation-partitioned data parallelism, the same decomposition as
    distributed PatchMatch's view axis.
    """
    from jax.sharding import NamedSharding

    sharded, in_specs = _lm_mesh_program(mesh, cg_iters, motion_only)
    data = BAData(**{
        k: jax.device_put(
            jnp.asarray(v),
            NamedSharding(mesh, getattr(in_specs[0], k)),
        )
        for k, v in data_host.items()
    })
    return sharded(data, damping0, delta, max_iters)


def _shard_obs_indices(
    n_shards: int, cap: int, O: int, oc_full: np.ndarray,
    pt_start: np.ndarray, pt_end: np.ndarray, C: int,
):
    """Per-shard segment-reduction indices for an observation table split
    into n contiguous slices of cap/n rows.

    Point segments stay contiguous inside each slice (the table is
    point-major), so per-shard bounds are the global bounds clipped into
    the slice. Cameras get a per-shard stable sort; padded rows (w=0) sort
    into camera 0's segment and contribute exact zeros."""
    Oc = cap // n_shards
    starts = np.arange(n_shards, dtype=np.int64) * Oc
    ps = (np.clip(pt_start[None, :], starts[:, None], starts[:, None] + Oc)
          - starts[:, None]).astype(np.int32)
    pe = (np.clip(pt_end[None, :], starts[:, None], starts[:, None] + Oc)
          - starts[:, None]).astype(np.int32)
    perms, cs, ce = [], [], []
    for s in range(n_shards):
        loc = oc_full[starts[s]: starts[s] + Oc]
        p = np.argsort(loc, kind="stable").astype(np.int32)
        srt = loc[p]
        cs.append(np.searchsorted(srt, np.arange(C), "left").astype(np.int32))
        ce.append(np.searchsorted(srt, np.arange(C), "right").astype(np.int32))
        perms.append(p)
    return (
        ps, pe, np.concatenate(perms), np.stack(cs), np.stack(ce),
    )


def bundle_adjust(
    K: np.ndarray,
    poses: Dict[int, Tuple[np.ndarray, np.ndarray]],
    points: np.ndarray,
    observations: List[List[Tuple[int, int]]],
    kp_xy: List[np.ndarray],
    config: Optional[BundleConfig] = None,
    size_hint: Optional[Tuple[int, int, int]] = None,
    max_iterations: Optional[int] = None,
    kp_table: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    mesh=None,
):
    """Host wrapper: builds the padded observation table from pipeline state,
    runs the LM loop, returns (poses', points', stats).

    kp_table: optional precomputed (kp_flat, kp_off) concatenation of kp_xy
    (SfMPipeline._kp_table) — saves an O(total keypoints) rebuild per call.

    mesh: optional jax.sharding.Mesh — the LM solve shards its observation
    table over the mesh's 'data' axis (_lm_loop_mesh); None keeps the
    single-device program.

    max_iterations overrides config.max_iterations for this call (the
    iteration cap is a traced scalar, so overriding costs no recompile —
    used by the pipeline to cap mid-reconstruction BAs).

    observations[p] = [(cam_id, kp_id), ...]; kp_xy[cam] = (K, 2) pixels.

    size_hint = (nC, nP, nO) predicted FINAL sizes. Buckets are sized to
    max(actual, hint), so an incremental pipeline that can extrapolate its
    final scene size compiles the LM program ONCE instead of once per x4
    growth bucket (compiles dominate BA wall-clock on a growing scene; the
    padded-slot compute they buy costs far less warm time).
    """
    import time as _time

    t_prep0 = _time.time()
    config = config or BundleConfig()
    hC, hP, hO = size_hint or (0, 0, 0)
    cam_ids = sorted(poses.keys())
    cam_row = {c: i for i, c in enumerate(cam_ids)}
    nC = len(cam_ids)
    nP = len(points)
    if nC < 2 or nP < 8:
        return poses, points, {"iterations": 0}
    # Pad cameras and points to pow2 buckets so the (expensive to compile)
    # LM while_loop program is reused across BA calls as the reconstruction
    # grows. Padded cameras are identity with no observations (their
    # gradient is exactly zero, so CG leaves them untouched); padded points
    # sit at the origin, also observation-free.
    def _bucket(n, lo):  # x4 growth: few distinct compiles, cache-friendly
        c = lo
        while c < n:
            c *= 4
        return c

    C = _bucket(max(nC, hC), 4)
    P = _bucket(max(nP, hP), 256)

    # Flatten the per-point observation lists in C-level passes (fromiter +
    # repeat + table lookups). The interpreter double-loop this replaces ran
    # once per BA call right after a device burst — squarely inside the
    # single-vCPU host's 10-50x post-burst slowdown window (BASELINE.md).
    import itertools

    n_pts_obs = len(observations)
    counts = np.fromiter(
        (len(o) for o in observations), np.int64, count=n_pts_obs
    )
    O_all = int(counts.sum())
    if O_all == 0:
        return poses, points, {"iterations": 0}
    flat = np.fromiter(
        itertools.chain.from_iterable(
            itertools.chain.from_iterable(observations)
        ),
        np.int64, count=2 * O_all,
    ).reshape(-1, 2)
    cams_f, kps_f = flat[:, 0], flat[:, 1]
    # cam id -> row lookup table; rows for cameras absent from `poses`
    # stay -1 and their observations are dropped (as the loop did).
    size = int(max(int(cams_f.max()), max(cam_ids))) + 1
    row_of = np.full(size, -1, np.int64)
    row_of[np.asarray(cam_ids, np.int64)] = np.arange(nC, dtype=np.int64)
    # A negative camera id would WRAP through the fancy index (row_of[-1]
    # is a valid row) and silently map to the wrong camera — gate on >= 0
    # explicitly, then on the camera being present in `poses`.
    keep = (cams_f >= 0) & (row_of[np.clip(cams_f, 0, size - 1)] >= 0)
    oc_arr = row_of[cams_f[keep]].astype(np.int32)
    op_arr = np.repeat(
        np.arange(n_pts_obs, dtype=np.int64), counts
    )[keep].astype(np.int32)
    # gather pixels through one concatenated keypoint table
    if kp_table is not None:
        kp_flat, kp_off = kp_table
    else:
        kp_off = np.zeros(len(kp_xy) + 1, np.int64)
        np.cumsum(
            np.fromiter((len(k) for k in kp_xy), np.int64, count=len(kp_xy)),
            out=kp_off[1:],
        )
        kp_flat = (
            np.concatenate(
                [np.asarray(k, np.float32).reshape(-1, 2) for k in kp_xy]
            )
            if kp_xy else np.zeros((0, 2), np.float32)
        )
    # an out-of-range keypoint id would silently read an adjacent camera's
    # segment of kp_flat — fail loudly instead
    kp_counts = np.diff(kp_off)
    assert (kps_f[keep] >= 0).all() and (
        kps_f[keep] < kp_counts[cams_f[keep]]
    ).all(), "observation keypoint id out of range for its camera"
    oxy_arr = kp_flat[kp_off[cams_f[keep]] + kps_f[keep]]
    O = int(oc_arr.shape[0])
    if O == 0:  # all observations reference cameras absent from `poses`
        return poses, points, {"iterations": 0}
    cap = _bucket(max(O, hO), 256)  # observation axis: same x4 bucket scheme
    n_data = mesh.shape.get("data", 1) if mesh is not None else 1
    if cap % max(n_data, 1):  # sharded obs axis must divide the mesh
        cap = ((cap + n_data - 1) // n_data) * n_data
    obs_cam = np.zeros(cap, np.int32)
    obs_pt = np.zeros(cap, np.int32)
    obs_xy = np.zeros((cap, 2), np.float32)
    obs_w = np.zeros(cap, np.float32)
    obs_cam[:O] = oc_arr
    obs_pt[:O] = op_arr
    obs_xy[:O] = oxy_arr
    obs_w[:O] = 1.0

    # Scatter-free reduction indices (see BAData): the table is point-major,
    # so point segments are contiguous; cameras get a stable sort
    # permutation. Padded rows (w=0 => zero Jacobians) sit outside every
    # real segment and are harmless wherever the permutation leaves them.
    pt_start = np.searchsorted(op_arr, np.arange(P), side="left").astype(np.int32)
    pt_end = np.searchsorted(op_arr, np.arange(P), side="right").astype(np.int32)
    cam_perm = np.concatenate([
        np.argsort(oc_arr, kind="stable"),
        np.arange(O, cap),
    ]).astype(np.int32)
    oc_sorted = oc_arr[cam_perm[:O]]
    cam_start = np.searchsorted(oc_sorted, np.arange(C), side="left").astype(np.int32)
    cam_end = np.searchsorted(oc_sorted, np.arange(C), side="right").astype(np.int32)

    R0 = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    t0 = np.zeros((C, 3), np.float32)
    t0[:, 2] = 1.0
    R0[:nC] = np.stack([poses[c][0] for c in cam_ids])
    t0[:nC] = np.stack([poses[c][1] for c in cam_ids])
    X0 = np.zeros((P, 3), np.float32)
    X0[:nP] = points
    t_table = _time.time() - t_prep0

    t_up0 = _time.time()
    data = BAData(
        K=jnp.asarray(K, jnp.float32),
        R0=jnp.asarray(R0),
        t0=jnp.asarray(t0),
        X0=jnp.asarray(X0),
        obs_cam=jnp.asarray(obs_cam),
        obs_pt=jnp.asarray(obs_pt),
        obs_xy=jnp.asarray(obs_xy),
        obs_w=jnp.asarray(obs_w),
        pt_start=jnp.asarray(pt_start),
        pt_end=jnp.asarray(pt_end),
        cam_perm=jnp.asarray(cam_perm),
        cam_start=jnp.asarray(cam_start),
        cam_end=jnp.asarray(cam_end),
    )
    params = BAParams(xi=jnp.zeros((C, 6)), dX=jnp.zeros((P, 3)))

    # robust_w=1 here; padded slots still contribute zero because
    # _residuals multiplies by data.obs_w internally. NOT fetched here:
    # a float() now would block on everything still queued on the device
    # and misattribute that wait to "prep" — it's pulled with the results.
    r_init = _residuals(params, data, jnp.ones_like(data.obs_w))
    rms0_dev = jnp.sqrt(jnp.sum(r_init**2) / max(O, 1))
    t_upload = _time.time() - t_up0
    t_prep = _time.time() - t_prep0

    # The whole accept/reject LM loop runs on-device as ONE program: with a
    # high-latency device link, 20 host-driven steps cost ~1 s of round
    # trips each; a lax.while_loop costs one dispatch.
    t_solve0 = _time.time()
    lm_args = (
        jnp.asarray(config.init_damping, jnp.float32),
        jnp.asarray(config.robust_delta_px, jnp.float32),
        jnp.asarray(
            config.max_iterations if max_iterations is None
            else max_iterations,
            jnp.int32,
        ),
    )
    if n_data > 1:
        ps, pe, perm, cs, ce = _shard_obs_indices(
            n_data, cap, O, obs_cam, pt_start, pt_end, C,
        )
        data_host = dict(
            K=K.astype(np.float32), R0=R0, t0=t0, X0=X0,
            obs_cam=obs_cam, obs_pt=obs_pt, obs_xy=obs_xy, obs_w=obs_w,
            pt_start=ps, pt_end=pe,
            cam_perm=perm, cam_start=cs, cam_end=ce,
        )
        R_f, t_f, X_f, iters_f = _lm_loop_mesh(
            mesh, data_host, *lm_args,
            cg_iters=config.cg_iterations,
            motion_only=config.motion_only,
        )
    else:
        R_f, t_f, X_f, iters_f = _lm_loop(
            data, *lm_args,
            cg_iters=config.cg_iterations,
            motion_only=config.motion_only,
        )
    data = data._replace(R0=R_f, t0=t_f, X0=X_f)
    iters = int(iters_f)

    R_final = np.asarray(data.R0)
    t_final = np.asarray(data.t0)
    new_poses = {c: (R_final[i], t_final[i]) for c, i in cam_row.items()}
    new_points = np.asarray(data.X0)[:nP]
    r_fin = _residuals(params, data, jnp.ones_like(data.obs_w))
    rms1 = float(jnp.sqrt(jnp.sum(r_fin**2) / max(O, 1)))
    rms0 = float(rms0_dev)
    stats = {
        "iterations": iters, "rms_before": rms0, "rms_after": rms1,
        "num_obs": O, "prep_s": round(t_prep, 3),
        "table_s": round(t_table, 3), "upload_s": round(t_upload, 3),
        "solve_fetch_s": round(_time.time() - t_solve0, 3),
    }
    return new_poses, new_points, stats


# ---------------------------------------------------------------------------
# Log-based BA: device-resident observation table, tail-only uploads
# ---------------------------------------------------------------------------
#
# bundle_adjust() above re-uploads the WHOLE padded observation table every
# call; on the tunneled host that upload dominated full-BA wall-clock
# (measured 37.7 s of a 45.5 s incremental-BA total over 8 calls on the
# north-star run, stats_run2.json). During the incremental loop the
# observation set is APPEND-ONLY, so the pipeline keeps an arrival-order
# log of (pid, cam_id, kp_id) rows and this path:
#   - caches the (cap,)-padded log on device across calls,
#   - uploads only the new tail rows (pow2 tail buckets -> few compiles),
#   - rebuilds the point-major ordering and all scatter-free segment index
#     tables ON DEVICE inside the jitted program (argsort + searchsorted of
#     ~64k rows is trivia next to the LM solve; re-uploading host-computed
#     tables is not).


@functools.partial(jax.jit, static_argnames=())
def _log_tail_update(dev: jnp.ndarray, tail: jnp.ndarray,
                     start: jnp.ndarray) -> jnp.ndarray:
    """Write `tail` rows into device-cached `dev` at row `start` (dynamic)."""
    return jax.lax.dynamic_update_slice(dev, tail, (start, jnp.int32(0)))


@functools.partial(
    jax.jit, static_argnames=("cg_iters", "motion_only")
)
def _lm_loop_from_log(
    K, R0, t0, X0,
    log_cam, log_pid, log_xy,  # (cap,) i32 raw cam ids / (cap,) i32 / (cap, 2)
    n_obs,                     # scalar i32: valid log rows
    row_of,                    # (S,) i32: camera id -> camera row, -1 absent
    damping0, delta, max_iters,
    cg_iters: int = 24, motion_only: bool = False,
):
    """Build BAData from the raw arrival-order log on device, then run the
    LM while_loop. Returns (R, t, X, iters, rms_before, rms_after, n_used)."""
    cap = log_cam.shape[0]
    C = R0.shape[0]
    P = X0.shape[0]
    rows = jnp.take(row_of, jnp.clip(log_cam, 0, row_of.shape[0] - 1), axis=0)
    valid = (
        (jnp.arange(cap) < n_obs) & (rows >= 0) & (log_cam >= 0)
        & (log_pid >= 0) & (log_pid < P)
    )
    # point-major reorder: invalid/padded rows get key P and sort last,
    # outside every [pt_start, pt_end) segment
    sort_key = jnp.where(valid, log_pid, P)
    perm = jnp.argsort(sort_key, stable=True)
    obs_pt_key = jnp.take(sort_key, perm, axis=0)
    obs_cam = jnp.take(jnp.where(valid, rows, 0), perm, axis=0).astype(jnp.int32)
    obs_xy = jnp.take(log_xy, perm, axis=0)
    obs_w = jnp.take(valid, perm, axis=0).astype(jnp.float32)
    pts = jnp.arange(P)
    pt_start = jnp.searchsorted(obs_pt_key, pts, side="left").astype(jnp.int32)
    pt_end = jnp.searchsorted(obs_pt_key, pts, side="right").astype(jnp.int32)
    cam_key = jnp.where(obs_w > 0, obs_cam, C)
    cam_perm = jnp.argsort(cam_key, stable=True).astype(jnp.int32)
    cam_sorted = jnp.take(cam_key, cam_perm, axis=0)
    cams = jnp.arange(C)
    cam_start = jnp.searchsorted(cam_sorted, cams, side="left").astype(jnp.int32)
    cam_end = jnp.searchsorted(cam_sorted, cams, side="right").astype(jnp.int32)
    data = BAData(
        K=K, R0=R0, t0=t0, X0=X0,
        obs_cam=obs_cam,
        obs_pt=jnp.minimum(obs_pt_key, P - 1).astype(jnp.int32),
        obs_xy=obs_xy, obs_w=obs_w,
        pt_start=pt_start, pt_end=pt_end,
        cam_perm=cam_perm, cam_start=cam_start, cam_end=cam_end,
    )
    params = BAParams(xi=jnp.zeros((C, 6)), dX=jnp.zeros((P, 3)))
    ones = jnp.ones_like(obs_w)
    n_used = jnp.maximum(jnp.sum(obs_w), 1.0)
    rms0 = jnp.sqrt(jnp.sum(_residuals(params, data, ones) ** 2) / n_used)
    R_f, t_f, X_f, iters = _lm_loop(
        data, damping0, delta, max_iters,
        cg_iters=cg_iters, motion_only=motion_only,
    )
    d_fin = data._replace(R0=R_f, t0=t_f, X0=X_f)
    rms1 = jnp.sqrt(jnp.sum(_residuals(params, d_fin, ones) ** 2) / n_used)
    return R_f, t_f, X_f, iters, rms0, rms1, n_used


def bundle_adjust_log(
    K: np.ndarray,
    poses: Dict[int, Tuple[np.ndarray, np.ndarray]],
    points: np.ndarray,
    obs_log: np.ndarray,
    kp_table: Tuple[np.ndarray, np.ndarray],
    config: Optional[BundleConfig] = None,
    size_hint: Optional[Tuple[int, int, int]] = None,
    max_iterations: Optional[int] = None,
    device_cache: Optional[dict] = None,
):
    """bundle_adjust over an APPEND-ONLY observation log (single device).

    obs_log: (O, 3) int32 rows (pid, cam_id, kp_id) in arrival order — the
    pipeline appends a row whenever it records an observation. The padded
    log lives on device between calls (device_cache, mutated in place);
    only rows added since the previous call upload. Same contract and stats
    keys as bundle_adjust.
    """
    import time as _time

    t_prep0 = _time.time()
    config = config or BundleConfig()
    hC, hP, hO = size_hint or (0, 0, 0)
    cam_ids = sorted(poses.keys())
    cam_row = {c: i for i, c in enumerate(cam_ids)}
    nC = len(cam_ids)
    nP = len(points)
    O = int(len(obs_log))
    if nC < 2 or nP < 8 or O == 0:
        return poses, points, {"iterations": 0}

    def _bucket(n, lo):
        c = lo
        while c < n:
            c *= 4
        return c

    C = _bucket(max(nC, hC), 4)
    P = _bucket(max(nP, hP), 256)
    cap = _bucket(max(O, hO), 256)

    # row_of is a traced arg of the jitted log solve: pad it to the same
    # pow-4 bucket scheme as C so its shape (and the compiled program) stays
    # stable as cameras are added instead of retracing every call.
    row_need = max(int(obs_log[:, 1].max()), max(cam_ids)) + 1
    row_of = np.full(_bucket(max(row_need, hC), 4), -1, np.int32)
    row_of[np.asarray(cam_ids, np.int64)] = np.arange(nC, dtype=np.int32)
    R0 = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    t0 = np.zeros((C, 3), np.float32)
    t0[:, 2] = 1.0
    R0[:nC] = np.stack([poses[c][0] for c in cam_ids])
    t0[:nC] = np.stack([poses[c][1] for c in cam_ids])
    X0 = np.zeros((P, 3), np.float32)
    X0[:nP] = points
    t_table = _time.time() - t_prep0

    t_up0 = _time.time()
    kp_flat, kp_off = kp_table
    cache = device_cache if device_cache is not None else {}
    cached = cache.get("log")
    uploaded = False
    if (
        cached is not None and cached["cap"] == cap
        and cached["count"] <= O
    ):
        count = cached["count"]
        delta = O - count
        tail_cap = _bucket(max(delta, 1), 256)
        if delta == 0:
            dev_cam, dev_pid, dev_xy = (
                cached["cam"], cached["pid"], cached["xy"]
            )
            uploaded = True
        elif count + tail_cap <= cap:
            new = obs_log[count:O]
            tc = np.zeros(tail_cap, np.int32)
            tp = np.zeros(tail_cap, np.int32)
            txy = np.zeros((tail_cap, 2), np.float32)
            tp[:delta] = new[:, 0]
            tc[:delta] = new[:, 1]
            txy[:delta] = kp_flat[kp_off[new[:, 1]] + new[:, 2]]
            start = jnp.asarray(count, jnp.int32)
            dev_cam = _log_tail_update(
                cached["cam"][:, None], jnp.asarray(tc)[:, None], start
            )[:, 0]
            dev_pid = _log_tail_update(
                cached["pid"][:, None], jnp.asarray(tp)[:, None], start
            )[:, 0]
            dev_xy = _log_tail_update(cached["xy"], jnp.asarray(txy), start)
            uploaded = True
        # else: tail bucket would overflow the cap -> full upload below
    if not uploaded:
        # any cache-miss condition (no cache, cap change, log shrank, tail
        # overflow) falls through to a full upload
        full_cam = np.zeros(cap, np.int32)
        full_pid = np.zeros(cap, np.int32)
        full_xy = np.zeros((cap, 2), np.float32)
        full_pid[:O] = obs_log[:, 0]
        full_cam[:O] = obs_log[:, 1]
        full_xy[:O] = kp_flat[kp_off[obs_log[:O, 1]] + obs_log[:O, 2]]
        dev_cam = jnp.asarray(full_cam)
        dev_pid = jnp.asarray(full_pid)
        dev_xy = jnp.asarray(full_xy)
    cache["log"] = {
        "cap": cap, "count": O, "cam": dev_cam, "pid": dev_pid, "xy": dev_xy,
    }
    t_upload = _time.time() - t_up0
    t_prep = _time.time() - t_prep0

    t_solve0 = _time.time()
    R_f, t_f, X_f, iters_f, rms0_d, rms1_d, n_used_d = _lm_loop_from_log(
        jnp.asarray(K, jnp.float32), jnp.asarray(R0), jnp.asarray(t0),
        jnp.asarray(X0), dev_cam, dev_pid, dev_xy,
        jnp.asarray(O, jnp.int32), jnp.asarray(row_of),
        jnp.asarray(config.init_damping, jnp.float32),
        jnp.asarray(config.robust_delta_px, jnp.float32),
        jnp.asarray(
            config.max_iterations if max_iterations is None
            else max_iterations, jnp.int32,
        ),
        cg_iters=config.cg_iterations,
        motion_only=config.motion_only,
    )
    R_final = np.asarray(R_f)
    t_final = np.asarray(t_f)
    new_poses = {c: (R_final[i], t_final[i]) for c, i in cam_row.items()}
    new_points = np.asarray(X_f)[:nP]
    stats = {
        "iterations": int(iters_f),
        "rms_before": float(rms0_d), "rms_after": float(rms1_d),
        "num_obs": int(n_used_d), "prep_s": round(t_prep, 3),
        "table_s": round(t_table, 3), "upload_s": round(t_upload, 3),
        "solve_fetch_s": round(_time.time() - t_solve0, 3),
    }
    return new_poses, new_points, stats
