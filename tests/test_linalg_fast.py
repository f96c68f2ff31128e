"""Numerical validation of the TPU-fast linear-algebra formulations.

On TPU, batched `eigh`/`svd` of tiny matrices run iterative solvers
(~50 ms per 1024 on v5e) and dominate every RANSAC dispatch, so the
hypothesis solvers use analytic/iterative replacements (ops/linalg.py).
These tests pin their accuracy against the exact dense solvers on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recon3d_tpu.ops.linalg import (
    eigh3x3,
    _smallest_eigvec_fast,
    _nearest_rotation_polar,
)


def random_spd(rng, n, batch):
    A = rng.standard_normal((batch, n, n)).astype(np.float32)
    return A @ A.transpose(0, 2, 1)


def test_eigh3x3_matches_numpy(rng):
    A = random_spd(rng, 3, 256)
    w, V = jax.jit(eigh3x3)(jnp.asarray(A))
    w = np.asarray(w)
    V = np.asarray(V)
    wr = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(w, wr, rtol=1e-3, atol=1e-3)
    # each column is an eigenvector: ||A v - w v|| small relative to ||A||
    for k in range(3):
        r = np.einsum("bij,bj->bi", A, V[:, :, k]) - w[:, k, None] * V[:, :, k]
        rel = np.linalg.norm(r, axis=1) / np.linalg.norm(A, axis=(1, 2))
        assert np.quantile(rel, 0.99) < 5e-3, (k, rel.max())
    # orthonormal columns
    G = np.einsum("bik,bil->bkl", V, V)
    np.testing.assert_allclose(
        G, np.broadcast_to(np.eye(3), G.shape), atol=2e-3
    )


def test_power_iteration_null_space(rng):
    """Rank-deficient A^T A from 8-point-style systems: the power iterate
    must align with the exact null direction."""
    B = 256
    A8 = rng.standard_normal((B, 8, 9)).astype(np.float32)
    AtA = np.einsum("bni,bnj->bij", A8, A8)
    v = np.asarray(jax.jit(_smallest_eigvec_fast)(jnp.asarray(AtA)))
    _, vecs = np.linalg.eigh(AtA)
    v_ref = vecs[..., 0]
    dots = np.abs(np.sum(v * v_ref, axis=1))
    assert np.quantile(dots, 0.95) > 0.99999, np.quantile(dots, 0.95)
    assert dots.min() > 0.999, dots.min()


def test_nearest_rotation_polar_matches_svd(rng):
    M = rng.standard_normal((256, 3, 3)).astype(np.float32)
    # include near-rotation matrices (the common case in pose solves)
    q = np.linalg.qr(rng.standard_normal((128, 3, 3)))[0].astype(np.float32)
    M = np.concatenate([M, q + 0.05 * rng.standard_normal(q.shape).astype(np.float32)])
    R = np.asarray(_nearest_rotation_polar(jnp.asarray(M)))
    # exact reference
    U, _, Vt = np.linalg.svd(M)
    det = np.linalg.det(U @ Vt)
    D = np.stack([np.ones_like(det), np.ones_like(det), det], -1)
    R_ref = (U * D[:, None, :]) @ Vt
    assert (np.linalg.det(R) > 0.99).all()
    # valid rotations
    G = np.einsum("bij,bik->bjk", R, R)
    np.testing.assert_allclose(
        G, np.broadcast_to(np.eye(3), G.shape), atol=3e-3
    )
    # angle between R and R_ref small except near-degenerate M
    tr = np.einsum("bij,bij->b", R, R_ref)
    cos = np.clip((tr - 1) / 2, -1, 1)
    ang = np.degrees(np.arccos(cos))
    assert np.quantile(ang, 0.9) < 1.0, np.quantile(ang, 0.9)


def test_rank2_projection_matches_svd(rng):
    """F - (F v3) v3^T equals the SVD rank-2 truncation."""
    F = rng.standard_normal((128, 3, 3)).astype(np.float32)
    w, V = eigh3x3(jnp.asarray(np.einsum("bji,bjk->bik", F, F)))
    v3 = np.asarray(V)[..., :, 0]
    Fv3 = np.einsum("bij,bj->bi", F, v3)
    F2 = F - Fv3[..., :, None] * v3[..., None, :]
    U, S, Vt = np.linalg.svd(F)
    S2 = S.copy()
    S2[:, 2] = 0
    F2_ref = (U * S2[:, None, :]) @ Vt
    # compare up to the norm of F
    rel = np.linalg.norm(F2 - F2_ref, axis=(1, 2)) / np.linalg.norm(F, axis=(1, 2))
    assert np.quantile(rel, 0.95) < 2e-3, np.quantile(rel, 0.95)


def test_sampson_batch_matches_vmap(rng):
    from recon3d_tpu.ops.epipolar import (
        sampson_distance,
        sampson_distance_batch,
    )

    F = jnp.asarray(rng.standard_normal((64, 3, 3)).astype(np.float32))
    x1 = jnp.asarray(rng.random((200, 2)).astype(np.float32) * 500)
    x2 = jnp.asarray(rng.random((200, 2)).astype(np.float32) * 500)
    ref = np.asarray(jax.vmap(lambda f: sampson_distance(f, x1, x2))(F))
    got = np.asarray(sampson_distance_batch(F, x1, x2))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_pnp_dlt_fast_matches_exact_ill_conditioned(rng):
    """Minimal 6-point DLT on OFF-CENTER world points: both null-space
    paths must recover the true pose. Without internal world-point
    normalization the raw DLT normal matrix is ill-conditioned in f32 and
    the fast (Cholesky inverse-iteration) path silently broke incremental
    registration (48/50 -> 23/50 cameras)."""
    from recon3d_tpu.ops.pnp import pnp_dlt

    ok = 0
    for trial in range(20):
        r = np.random.default_rng(trial)
        # off-center cloud, viewed close enough for a wide angular spread
        X = (r.random((6, 3)) * 4 + [10.0, -6.0, 12.0]).astype(np.float32)
        c = X.mean(0)
        # camera placed near the cloud, looking at its center
        C = c + np.array([3.0, 2.0, -5.0], np.float32)
        z = (c - C) / np.linalg.norm(c - C)
        up = np.array([0.0, 1.0, 0.0])
        xax = np.cross(up, z); xax /= np.linalg.norm(xax)
        yax = np.cross(z, xax)
        Rm = np.stack([xax, yax, z]).astype(np.float32)
        t = (-Rm @ C).astype(np.float32)
        Xc = X @ Rm.T + t
        assert (Xc[:, 2] > 0.5).all()
        xn = (Xc[:, :2] / Xc[:, 2:]).astype(np.float32)
        w = jnp.ones(6)
        for fast in (False, True):
            Rg, tg = pnp_dlt(jnp.asarray(X), jnp.asarray(xn), w, fast=fast)
            tr = np.clip((np.trace(np.asarray(Rg) @ Rm.T) - 1) / 2, -1, 1)
            assert np.degrees(np.arccos(tr)) < 0.5, (trial, fast)
            np.testing.assert_allclose(
                np.asarray(tg), t, rtol=2e-2, atol=5e-2
            )
        ok += 1
    assert ok == 20


def test_eigh3x3_exactly_isotropic():
    """Scaled-identity input: eigenvalues must be exact (not NaN from the
    0/0 Cardano term) and the eigenvector fallback must return a full
    orthonormal triad, not three copies of e_x (ADVICE r1)."""
    for s in [1.0, 2.0, 7.5]:
        w, V = jax.jit(eigh3x3)(s * jnp.eye(3))
        np.testing.assert_allclose(np.asarray(w), s, atol=1e-5)
        G = np.asarray(V).T @ np.asarray(V)
        np.testing.assert_allclose(G, np.eye(3), atol=1e-5)


def test_nearest_rotation_polar_identity_and_scaled_rotation(rng):
    """M that is exactly a scaled rotation must map to that rotation (the
    old isotropic fallback returned a near-zero matrix)."""
    from recon3d_tpu.ops.lie import so3_exp

    Rs = np.asarray(so3_exp(jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)))
    Ms = np.concatenate([np.eye(3)[None], 3.0 * Rs]).astype(np.float32)
    out = np.asarray(_nearest_rotation_polar(jnp.asarray(Ms)))
    expect = np.concatenate([np.eye(3)[None], Rs]).astype(np.float32)
    np.testing.assert_allclose(out, expect, atol=5e-3)
