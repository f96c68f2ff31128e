"""TSDF fusion + marching-tetrahedra mesh extraction.

Ground-truth geometry throughout: analytic sphere SDFs and ray-traced
sphere depth maps, plus the box-corner renderer's exact depth maps.
"""

import numpy as np
import pytest

from recon3d_tpu.dense.mesh import extract_mesh, mesh_vertex_colors
from recon3d_tpu.dense.tsdf import TSDFVolume, fuse_tsdf
from recon3d_tpu.io.ply import load_mesh_ply, save_mesh_ply


def _sphere_volume(n=48, r=0.8, trunc_frac=0.08):
    """Analytic clamped-SDF sphere volume centered in a [-1,1]^3 grid."""
    lo = np.float32([-1.0, -1.0, -1.0])
    voxel = 2.0 / (n - 1)
    idx = np.arange(n, dtype=np.float32)
    zz, yy, xx = np.meshgrid(idx, idx, idx, indexing="ij")
    X = lo[0] + voxel * xx
    Y = lo[1] + voxel * yy
    Z = lo[2] + voxel * zz
    d = np.sqrt(X * X + Y * Y + Z * Z) - r
    trunc = 2.0 * trunc_frac
    tsdf = np.clip(d / trunc, -1, 1).astype(np.float32)
    return TSDFVolume(
        tsdf=tsdf, weight=np.ones_like(tsdf), origin=lo,
        voxel=voxel, trunc=trunc,
    )


def test_marching_tets_sphere_geometry():
    r = 0.8
    vol = _sphere_volume(n=48, r=r)
    verts, faces = extract_mesh(vol, min_weight=0.5)
    assert len(verts) > 500 and len(faces) > 1000

    # every vertex sits on the sphere to sub-voxel accuracy
    rad = np.linalg.norm(verts, axis=1)
    assert np.abs(rad - r).max() < 0.75 * vol.voxel

    # total area matches 4*pi*r^2 (tet meshes overtessellate but must not
    # change the surface measure)
    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1).sum()
    assert abs(area - 4 * np.pi * r * r) / (4 * np.pi * r * r) < 0.03

    # watertight: every undirected edge is shared by exactly two faces
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
    )
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()

    # orientation: normals point toward positive SDF (outward)
    nrm = np.cross(e1, e2)
    cent = (verts[faces[:, 0]] + verts[faces[:, 1]] + verts[faces[:, 2]]) / 3
    assert (np.einsum("ij,ij->i", nrm, cent) > 0).mean() > 0.999


def _sphere_depth_maps(n_views=8, H=96, W=128, r=0.8, dist=3.0):
    f = 0.9 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    Rs, ts, depths = [], [], []
    ys, xs = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5, indexing="ij")
    pix = np.stack(
        [(xs - K[0, 2]) / K[0, 0], (ys - K[1, 2]) / K[1, 1], np.ones_like(xs)],
        axis=-1,
    )
    for i in range(n_views):
        th = 2 * np.pi * i / n_views
        C = np.array([dist * np.sin(th), 0.3, -dist * np.cos(th)])
        z = -C / np.linalg.norm(C)
        up = np.array([0.0, -1.0, 0.0])
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=0)
        t = -R @ C
        w = pix @ R  # R^T applied to each pixel ray: (H, W, 3)
        a = np.einsum("hwc,hwc->hw", w, w)
        b = 2 * np.einsum("hwc,c->hw", w, C)
        c = C @ C - r * r
        disc = b * b - 4 * a * c
        hit = disc > 0
        s = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a), 0.0)
        depths.append(np.where(hit & (s > 0), s, 0.0).astype(np.float32))
        Rs.append(R.astype(np.float32)); ts.append(t.astype(np.float32))
    return np.stack(depths), K, np.stack(Rs), np.stack(ts)


def test_tsdf_fusion_sphere_depths():
    r = 0.8
    depths, K, Rs, ts = _sphere_depth_maps(r=r)
    vol = fuse_tsdf(
        depths, None, K, Rs, ts,
        bounds=(np.float32([-1.1] * 3), np.float32([1.1] * 3)),
        resolution=64, trunc_voxels=3.0,
    )
    assert vol.weight.max() >= 2  # overlapping views accumulate
    verts, faces = extract_mesh(vol, min_weight=1.0)
    assert len(verts) > 500
    rad = np.linalg.norm(verts, axis=1)
    # fused surface on the sphere to ~a voxel (8 views, quantization + ring
    # coverage gap at the poles tolerated via percentile)
    err = np.abs(rad - r)
    assert np.percentile(err, 95) < 1.5 * vol.voxel


def test_tsdf_auto_bounds_and_colors():
    depths, K, Rs, ts = _sphere_depth_maps(n_views=6)
    vol = fuse_tsdf(depths, None, K, Rs, ts, resolution=48)
    verts, faces = extract_mesh(vol)
    assert len(verts) > 100
    pts = np.array([[0, 0, 0.8], [0, 0, -0.8]], np.float32)
    cols = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    vc = mesh_vertex_colors(verts, pts, cols)
    assert vc.shape == (len(verts), 3)
    front = verts[:, 2] > 0.3
    assert (vc[front] == [255, 0, 0]).all()


def test_tsdf_from_rendered_scene():
    """Exact depth maps from the box-corner renderer -> surface mesh whose
    vertices lie on the true scene geometry."""
    from tests.render import render_views

    scene = render_views(n_views=6, image_size=(96, 128), arc_step=0.16)
    depths = scene["depth"].astype(np.float32)
    vol = fuse_tsdf(
        depths, None, scene["K"], np.stack(scene["Rs"]),
        np.stack(scene["ts"]), resolution=96, trunc_voxels=2.5,
    )
    verts, faces = extract_mesh(vol, min_weight=1.0)
    assert len(verts) > 1000 and len(faces) > 2000
    # verify against the true depth of view 0: project mesh vertices and
    # compare depth (visible subset)
    K, R, t = scene["K"], scene["Rs"][0], scene["ts"][0]
    Xc = verts @ R.T + t
    z = Xc[:, 2]
    u = np.round(K[0, 0] * Xc[:, 0] / z + K[0, 2]).astype(int)
    v = np.round(K[1, 1] * Xc[:, 1] / z + K[1, 2]).astype(int)
    H, W = depths.shape[1:]
    m = (z > 0) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    d = depths[0][v[m], u[m]]
    vis = d > 0
    # visible vertices: within a couple voxels of the true surface depth
    # (only where the vertex is the NEAREST surface along the ray)
    close = np.abs(z[m][vis] - d[vis]) < 2.5 * vol.voxel
    assert close.mean() > 0.55  # occluded back-surfaces excluded


def test_mesh_ply_roundtrip(tmp_path):
    vol = _sphere_volume(n=24)
    verts, faces = extract_mesh(vol)
    cols = np.full((len(verts), 3), [10, 200, 30], np.uint8)
    for binary in (True, False):
        p = tmp_path / f"m_{binary}.ply"
        save_mesh_ply(str(p), verts, faces, cols, binary=binary)
        v2, f2, c2 = load_mesh_ply(str(p))
        np.testing.assert_allclose(v2, verts, atol=1e-4)
        assert (f2 == faces).all()
        assert (c2 == cols).all()


def test_tsdf_sharded_matches_single_device():
    """fuse_tsdf(mesh=8 CPU devices) == single-device fusion (one psum of
    order-independent weighted sums; only float summation order differs)."""
    import jax
    from recon3d_tpu.parallel.mesh import make_mesh
    from recon3d_tpu.config import MeshConfig

    depths, K, Rs, ts = _sphere_depth_maps(n_views=6, H=48, W=64)
    bounds = (np.float32([-1.1] * 3), np.float32([1.1] * 3))
    single = fuse_tsdf(depths, None, K, Rs, ts, bounds=bounds, resolution=40)
    mesh = make_mesh(MeshConfig(model_parallel=1),
                     devices=jax.devices()[:8])
    shard = fuse_tsdf(depths, None, K, Rs, ts, bounds=bounds, resolution=40,
                      mesh=mesh)
    np.testing.assert_allclose(shard.weight, single.weight, atol=1e-5)
    np.testing.assert_allclose(shard.tsdf, single.tsdf, atol=1e-5)


def test_native_nearest_index_exact():
    """Grid-hash NN matches brute force exactly (when the library built)."""
    from recon3d_tpu.runtime.native import native_nearest_index

    rng = np.random.default_rng(7)
    ref = rng.normal(size=(3000, 3)).astype(np.float32)
    q = rng.normal(size=(500, 3)).astype(np.float32) * 1.5  # some far out
    idx = native_nearest_index(q, ref)
    if idx is None:
        pytest.skip("native library unavailable")
    d = np.linalg.norm(q[:, None, :] - ref[None, :, :], axis=-1)
    brute = np.argmin(d, axis=1)
    # ties can differ in index; compare distances
    np.testing.assert_allclose(
        d[np.arange(len(q)), idx], d[np.arange(len(q)), brute], rtol=1e-6
    )
