"""Nistér 5-point essential matrix solver, TPU-native.

The reference never solves E minimally — it estimates a 7-DoF F with
OpenCV RANSAC and converts E = K^T F K (sfm_pipeline.py:357-369,
geometry.py:128-135). A minimal 5-point solver is strictly stronger for
the init pair: at 50% inlier ratio an all-inlier 5-sample is ~25x more
likely than an 8-sample, and the model family is constrained to the
essential manifold from the start (SURVEY §7 step 3 "5-point-or-8-point").

Formulation (Nistér, "An efficient solution to the five-point relative
pose problem", PAMI 2004), mapped to TPU constraints:

- Null space of the 5x9 epipolar constraint matrix via batched COMPLETE
  QR of Q^T (XLA-native); the last 4 columns are the orthonormal basis
  (X, Y, Z, W), so E = x X + y Y + z Z + W.
- det(E) = 0 and the 9 trace constraints (2 E E^T - tr(E E^T) I) E = 0
  are trilinear forms in E's 9 entries; their coefficient tensors are
  precomputed ONCE at import (numpy dict polynomials), so the runtime
  expansion over the 20 cubic monomials of (x, y, z) is a single einsum
  against a (10, 9, 9, 9) constant — MXU-shaped and tiny to compile
  (the unrolled polynomial-cube formulation compiled ~14 min on TPU).
- The 10x20 system reduces by ONE batched 10x10 solve (MXU) instead of
  pivoted Gauss-Jordan.
- The degree-10 polynomial in z is solved with Durand-Kerner (Weierstrass)
  iteration in complex64 — TPU has no nonsymmetric `eig`, but DK is pure
  elementwise complex arithmetic, vmappable over hypotheses, with a fixed
  iteration count (no data-dependent control flow).

Every sample yields up to 10 candidate E's + validity flags; invalid
candidates are replaced by a dead model whose Sampson residuals are huge,
so they simply lose the RANSAC vote (same pattern as ops/pnp.py P3P).
"""

from __future__ import annotations

import math as _math

import jax
import jax.numpy as jnp
import numpy as np

from recon3d_tpu.ops.linalg import einsum_hp

# Nistér / OpenCV five-point column ordering of the 20 cubic monomials.
_MONO = [
    (3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1),
    (2, 0, 0), (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0),
    (1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
    (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0),
]

_DK_ITERS = 60
_DEAD_E = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                   np.float32)  # Sampson num=1, den=0 -> ~1e6 px residual


def _constraint_tensors():
    """Static coefficient tensors of the 10 cubic constraints.

    Each constraint (det(E) and the nine entries of
    (2 E E^T - tr(E E^T) I) E) is a trilinear form in the 9 entries of E:
    P(E) = sum_{abc} c_abc E_a E_b E_c. Precomputing c once (numpy dict
    polynomial arithmetic at import) turns the runtime monomial expansion
    into ONE einsum against a (10, 9, 9, 9) constant — the previous
    unrolled polynomial-cube arithmetic (_pmul over (4,4,4) cubes) traced
    into thousands of HLO ops and compiled for ~14 minutes on TPU for the
    vmapped RANSAC program.

    Returns (C (10, 9, 9, 9) float64, M (64, 20) float64) where M maps
    products m_i m_j m_k of m = (x, y, z, 1) onto the 20 cubic monomial
    columns of the Nister ordering (_MONO).
    """
    # polynomial over E entries: dict {sorted entry-index tuple: coeff}
    def pmulq(p, q):
        out = {}
        for ka, va in p.items():
            for kb, vb in q.items():
                k = tuple(sorted(ka + kb))
                out[k] = out.get(k, 0.0) + va * vb
        return out

    def padd(p, q, s=1.0):
        out = dict(p)
        for k, v in q.items():
            out[k] = out.get(k, 0.0) + s * v
        return out

    E = [[{(3 * r + c,): 1.0} for c in range(3)] for r in range(3)]
    # det(E)
    def minor(a, b, c, d):
        return padd(pmulq(a, b), pmulq(c, d), -1.0)

    det = padd(
        padd(
            pmulq(E[0][0], minor(E[1][1], E[2][2], E[1][2], E[2][1])),
            pmulq(E[0][1], minor(E[1][0], E[2][2], E[1][2], E[2][0])),
            -1.0,
        ),
        pmulq(E[0][2], minor(E[1][0], E[2][1], E[1][1], E[2][0])),
    )
    eet = [[None] * 3 for _ in range(3)]
    for r in range(3):
        for c in range(3):
            acc = {}
            for k in range(3):
                acc = padd(acc, pmulq(E[r][k], E[c][k]))
            eet[r][c] = acc
    tr = padd(padd(eet[0][0], eet[1][1]), eet[2][2])
    cons = []
    for r in range(3):
        for c in range(3):
            acc = {}
            for k in range(3):
                T_rk = padd(
                    {k2: 2.0 * v for k2, v in eet[r][k].items()},
                    tr if r == k else {}, -1.0,
                )
                acc = padd(acc, pmulq(T_rk, E[k][c]))
            cons.append(acc)

    C = np.zeros((10, 9, 9, 9), np.float64)
    for q, poly in enumerate([det] + cons):
        for key, v in poly.items():
            a, b, c = key  # degree exactly 3
            # symmetrize over the distinct permutations
            perms = {(a, b, c), (a, c, b), (b, a, c),
                     (b, c, a), (c, a, b), (c, b, a)}
            for p in perms:
                C[q][p] += v / len(perms)

    # monomial map: m = (x, y, z, 1); product m_i m_j m_k -> _MONO column
    mono_col = {m: i for i, m in enumerate(_MONO)}
    M = np.zeros((64, 20), np.float64)
    for i in range(4):
        for j in range(4):
            for k in range(4):
                exps = [0, 0, 0]
                for ax in (i, j, k):
                    if ax < 3:
                        exps[ax] += 1
                M[i * 16 + j * 4 + k, mono_col[tuple(exps)]] = 1.0
    return C, M


_C_TENSOR, _MONO_MAP = _constraint_tensors()

# Shift for the root-finding chart: q(v) = p(v + delta). Arbitrary value,
# only needs to avoid being a root of p itself (measure zero); shifting
# keeps a root of p at z = 0 from zeroing q's constant term, which would
# degenerate the reversal chart. _SHIFT_MAT[k, j] = C(j, k) delta^(j-k).
_DELTA = 0.11937766
_SHIFT_MAT = np.array(
    [[(_math.comb(j, k) * _DELTA ** (j - k)) if j >= k else 0.0
      for j in range(11)] for k in range(11)], np.float32,
)


def _conv1(a, b):
    """1D polynomial product, ascending coefficients, static lengths."""
    la, lb = a.shape[-1], b.shape[-1]
    out = jnp.zeros(a.shape[:-1] + (la + lb - 1,), a.dtype)
    for i in range(la):
        out = out.at[..., i:i + lb].add(a[..., i:i + 1] * b)
    return out


def _epipolar_rows(x1n: jnp.ndarray, x2n: jnp.ndarray) -> jnp.ndarray:
    """(5, 9) constraint rows for x2^T E x1 = 0 (row-major vec(E))."""
    u1, v1 = x1n[:, 0], x1n[:, 1]
    u2, v2 = x2n[:, 0], x2n[:, 1]
    ones = jnp.ones_like(u1)
    return jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1
    )


def nister_5point(x1n: jnp.ndarray, x2n: jnp.ndarray):
    """All essential matrices through 5 normalized correspondences.

    x1n, x2n: (5, 2) in NORMALIZED camera coordinates.
    Returns (Es (20, 3, 3) with ||E||_F = 1, valid (20,) bool) — the <= 10
    essential matrices appear among the 20 gated candidates (10 from each
    root-finding chart; overlap near |u| = 1 just duplicates a model, which
    is harmless under a RANSAC vote). Invalid slots hold a dead model with
    huge Sampson residuals. vmap over a leading hypothesis axis for RANSAC.
    """
    dt = x1n.dtype
    Q = _epipolar_rows(x1n, x2n)  # (5, 9)
    # Orthonormal null basis: complete QR of Q^T; last 4 columns.
    qf, _ = jnp.linalg.qr(Q.T, mode="complete")  # (9, 9)
    basis = qf[:, 5:9].T.reshape(4, 3, 3)  # X, Y, Z, W

    # The 10 cubic constraints (det + trace) as trilinear forms over E's 9
    # entries, assembled via the precomputed static tensor: with
    # E = x X + y Y + z Z + W, the monomial coefficients are
    # G_qijk = C_qabc B_ia B_jb B_kc for B = (X, Y, Z, W) flattened — two
    # small einsums instead of unrolled polynomial-cube arithmetic (which
    # compiled for ~14 min on TPU; see _constraint_tensors).
    B = basis.reshape(4, 9)
    G = jnp.einsum(
        "qabc,ia,jb,kc->qijk",
        jnp.asarray(_C_TENSOR, dt), B, B, B,
        precision=jax.lax.Precision.HIGHEST,
    )  # (10, 4, 4, 4)
    A = jnp.einsum(
        "qm,mn->qn", G.reshape(10, 64), jnp.asarray(_MONO_MAP, dt),
        precision=jax.lax.Precision.HIGHEST,
    )  # (10, 20)

    # Reduce [A1 | A2] -> [I | Ar]: one 10x10 solve (vs Gauss-Jordan).
    Ar = jnp.linalg.solve(A[:, :10], A[:, 10:])  # (10, 10)
    a_ok = jnp.all(jnp.isfinite(Ar))
    Ar = jnp.where(a_ok, Ar, 0.0)
    # Row i: mono_i + x*(Ar[i,0] z^2 + Ar[i,1] z + Ar[i,2])
    #                + y*(Ar[i,3] z^2 + Ar[i,4] z + Ar[i,5])
    #                + (Ar[i,6] z^3 + Ar[i,7] z^2 + Ar[i,8] z + Ar[i,9]) = 0
    # Pair (x^2 z, x^2)=(4,5), (y^2 z, y^2)=(6,7), (xyz, xy)=(8,9): subtract
    # z*(second row) from the first to eliminate the leading monomial:
    #   x*alpha(z) + y*beta(z) + gamma(z) = 0.
    def row_polys(i):
        # ascending coefficient vectors: p,q degree 2; r degree 3
        p = jnp.stack([Ar[i, 2], Ar[i, 1], Ar[i, 0]])
        q = jnp.stack([Ar[i, 5], Ar[i, 4], Ar[i, 3]])
        r = jnp.stack([Ar[i, 9], Ar[i, 8], Ar[i, 7], Ar[i, 6]])
        return p, q, r

    def zshift(v):  # multiply by z: prepend zero
        return jnp.concatenate([jnp.zeros((1,), v.dtype), v])

    L = []
    for hi, lo in ((4, 5), (8, 9), (6, 7)):
        ph, qh, rh = row_polys(hi)
        pl, ql, rl = row_polys(lo)
        alpha = jnp.concatenate([ph, jnp.zeros((1,), dt)]) - zshift(pl)  # deg 3
        beta = jnp.concatenate([qh, jnp.zeros((1,), dt)]) - zshift(ql)  # deg 3
        gamma = jnp.concatenate([rh, jnp.zeros((1,), dt)]) - zshift(rl)  # deg 4
        L.append((alpha, beta, gamma))

    (a1, b1, g1), (a2, b2, g2), (a3, b3, g3) = L
    # det of the 3x3 polynomial matrix -> degree-10 polynomial in z.
    poly = (
        _conv1(a1, _conv1(b2, g3) - _conv1(b3, g2))
        - _conv1(b1, _conv1(a2, g3) - _conv1(a3, g2))
        + _conv1(g1, _conv1(a2, b3) - _conv1(a3, b2))
    )  # (11,) ascending

    # --- Degree-10 root finding without `eig` (TPU has none) ---
    # Roots can span 3+ orders of magnitude (measured |z| in [0.03, 40] on
    # random poses), far beyond what one Durand-Kerner run from the unit
    # circle resolves in complex64. Four standard measures combine to
    # cover it: (1) shift z = v + delta so the constant term is generically
    # nonzero (a root AT zero otherwise kills the reversal chart — observed
    # on real poses); (2) substitute v = s*u with s = (|q0|/|q10|)^(1/10),
    # which puts the GEOMETRIC MEAN of the root magnitudes at |u| = 1
    # (half the roots inside the unit disk, half outside); (3) run DK on
    # both q(u) and its REVERSAL u^10 q(1/u) — each resolves its own half
    # of the disk, the union covers all 10 roots (as 20 gated candidates);
    # (4) polish every candidate with independent Newton steps on its own
    # well-conditioned side.
    q = jnp.asarray(_SHIFT_MAT, dt) @ poly  # coefficients of p(v + delta)
    lead = q[10]
    tail = q[0]
    amax = jnp.max(jnp.abs(q))
    lead_ok = jnp.abs(lead) > 1e-7 * jnp.maximum(amax, 1e-30)
    tail_ok = jnp.abs(tail) > 1e-7 * jnp.maximum(amax, 1e-30)
    s = jnp.where(
        lead_ok & tail_ok,
        (jnp.abs(tail) / jnp.maximum(jnp.abs(lead), 1e-30)) ** 0.1,
        1.0,
    )
    # q_u coefficients: q_i * s^i, then monic; reversal is index-flip.
    pu = q * s ** jnp.arange(11, dtype=dt)
    pu = pu / jnp.where(jnp.abs(pu[10]) > 1e-30, pu[10], 1.0)
    pr_ = pu[::-1]
    pr_ = pr_ / jnp.where(jnp.abs(pr_[10]) > 1e-30, pr_[10], 1.0)

    k = jnp.arange(10, dtype=jnp.float32)
    roots0 = (0.4 + 0.9j) ** k.astype(jnp.complex64)
    eye = jnp.eye(10, dtype=bool)

    def horner(c, z):
        acc = jnp.ones_like(z)  # monic
        for i in range(9, -1, -1):
            acc = acc * z + c[i].astype(jnp.complex64)
        return acc

    def dhorner(c, z):
        acc = jnp.full_like(z, 10.0 + 0.0j)
        for i in range(9, 0, -1):
            acc = acc * z + i * c[i].astype(jnp.complex64)
        return acc

    def dk_roots(c):
        def step(_, r):
            prv = horner(c, r)
            diff = r[:, None] - r[None, :]
            denom = jnp.prod(jnp.where(eye, 1.0 + 0.0j, diff), axis=1)
            return r - prv / jnp.where(
                jnp.abs(denom) > 1e-20, denom, 1.0 + 0.0j
            )

        r = jax.lax.fori_loop(0, _DK_ITERS, step, roots0)
        for _ in range(6):  # independent Newton polish per root
            dp = dhorner(c, r)
            r = r - horner(c, r) / jnp.where(
                jnp.abs(dp) > 1e-20, dp, 1.0 + 0.0j
            )
        return r

    u_fwd = dk_roots(pu)          # accurate where |u| <~ 1
    w_rev = dk_roots(pr_)         # roots of reversal; u = 1/w, |w| <~ 1
    u_bwd = 1.0 / jnp.where(jnp.abs(w_rev) > 1e-12, w_rev, 1e-12 + 0.0j)

    def gate(c, r, in_disk):
        resid = jnp.abs(horner(c, jnp.real(r).astype(jnp.complex64)))
        near_real = jnp.abs(jnp.imag(r)) <= 1e-3 * (1.0 + jnp.abs(jnp.real(r)))
        return near_real & (resid < 1e-2 * (1.0 + jnp.abs(jnp.real(r))) ** 10) & in_disk

    ok_fwd = gate(pu, u_fwd, jnp.abs(u_fwd) <= 1.25)
    ok_bwd = gate(pr_, w_rev, jnp.abs(w_rev) <= 1.25)
    roots = (
        jnp.concatenate([u_fwd, u_bwd]) * s.astype(jnp.complex64) + _DELTA
    )
    z = jnp.real(roots)
    is_real = jnp.concatenate([ok_fwd, ok_bwd]) & jnp.isfinite(z)

    # Back-substitute x, y per root from two of the three equations,
    # picking the better-conditioned pair.
    def peval(cfs, zz):
        acc = jnp.zeros_like(zz)
        for i in range(cfs.shape[-1] - 1, -1, -1):
            acc = acc * zz + cfs[i]
        return acc

    A1, B1, G1 = peval(a1, z), peval(b1, z), peval(g1, z)
    A2, B2, G2 = peval(a2, z), peval(b2, z), peval(g2, z)
    A3, B3, G3 = peval(a3, z), peval(b3, z), peval(g3, z)
    d12 = A1 * B2 - A2 * B1
    d13 = A1 * B3 - A3 * B1
    use13 = jnp.abs(d13) > jnp.abs(d12)
    dd = jnp.where(use13, d13, d12)
    xs = jnp.where(
        use13, B1 * G3 - B3 * G1, B1 * G2 - B2 * G1
    ) / jnp.where(jnp.abs(dd) > 1e-20, dd, 1.0)
    ys = jnp.where(
        use13, G1 * A3 - G3 * A1, G1 * A2 - G2 * A1
    ) / jnp.where(jnp.abs(dd) > 1e-20, dd, 1.0)

    coef = jnp.stack([xs, ys, z, jnp.ones_like(z)], axis=-1)  # (20, 4)
    Es = einsum_hp("rc,cij->rij", coef, basis)  # (20, 3, 3)
    nrm = jnp.linalg.norm(Es.reshape(20, 9), axis=-1)
    valid = (
        is_real & a_ok & (jnp.abs(dd) > 1e-12)
        & (nrm > 1e-12) & jnp.all(jnp.isfinite(Es.reshape(20, 9)), axis=-1)
    )
    Es = Es / jnp.maximum(nrm, 1e-12)[:, None, None]
    dead = jnp.asarray(_DEAD_E, dt)
    Es = jnp.where(valid[:, None, None], Es, dead)
    return Es, valid
