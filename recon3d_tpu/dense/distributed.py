"""Multi-chip dense reconstruction: per-view depth-map jobs sharded over a
device mesh.

The reference computes per-view depth maps in a serial Python loop on one GPU
(mvs_patchmatch.py:104-123, dense_stereo.py:105-130). Here the reference-view
axis is a sharded array axis over the mesh's 'data' dimension: every chip
PatchMatches / plane-sweeps its shard of views in parallel, with the images
and camera arrays placed once (replicated or sharded) and XLA handling any
ICI movement. Fusion concatenates on host (point counts are data-dependent).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from recon3d_tpu.dense.patchmatch import DepthNormalMap, patchmatch_depth_batch
from recon3d_tpu.dense.plane_sweep import sweep_depth_map
from recon3d_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    pad_to_multiple,
    replicated,
)


def _put(mesh: Mesh, x, shard_axis: Optional[int] = 0):
    arr = jnp.asarray(x)
    sh = (
        data_sharding(mesh, arr.ndim, shard_axis)
        if shard_axis is not None
        else replicated(mesh)
    )
    return jax.device_put(arr, sh)


def distributed_patchmatch(
    ref_grays: np.ndarray,     # (B, H, W)
    src_grays: np.ndarray,     # (B, J, H, W)
    K: np.ndarray,             # (3, 3)
    R_refs: np.ndarray,        # (B, 3, 3)
    t_refs: np.ndarray,        # (B, 3)
    R_srcss: np.ndarray,       # (B, J, 3, 3)
    t_srcss: np.ndarray,       # (B, J, 3)
    depth_ranges: np.ndarray,  # (B, 2)
    seed: int = 0,
    mesh: Optional[Mesh] = None,
    num_iterations: int = 3,
    num_samples: int = 8,
    patch: int = 11,
    ncc_threshold: float = 0.6,
    keys: Optional[np.ndarray] = None,  # (B, key) explicit per-view keys
    coarse_factor: int = 4,
    fine_iterations: int = 1,
) -> DepthNormalMap:
    """PatchMatch a batch of reference views sharded over the mesh.

    The view axis B is padded to a multiple of the data-mesh size and sharded;
    each chip runs patchmatch_depth_batch on its shard. Returns host-side
    DepthNormalMap with the padding stripped. Pass `keys` to pin the per-view
    PRNG stream (PatchMatchMVS does, so mesh and single-device runs produce
    identical depth maps); otherwise keys derive from `seed`.
    """
    mesh = mesh or make_mesh()
    n_data = mesh.shape["data"]
    B = ref_grays.shape[0]

    arrays = {}
    for name, x in (
        ("ref_grays", ref_grays), ("src_grays", src_grays),
        ("R_refs", R_refs), ("t_refs", t_refs),
        ("R_srcss", R_srcss), ("t_srcss", t_srcss),
        ("depth_ranges", depth_ranges),
    ):
        padded, _ = pad_to_multiple(np.asarray(x), n_data, axis=0)
        arrays[name] = _put(mesh, padded, 0)
    Bp = arrays["ref_grays"].shape[0]
    if keys is None:
        keys_host = np.asarray(jax.random.split(jax.random.PRNGKey(seed), Bp))
    else:
        keys_host, _ = pad_to_multiple(np.asarray(keys)[:B], n_data, axis=0)
    keys = _put(mesh, keys_host, 0)
    Kd = _put(mesh, K, None)

    with mesh:
        out = patchmatch_depth_batch(
            arrays["ref_grays"], arrays["src_grays"], Kd,
            arrays["R_refs"], arrays["t_refs"],
            arrays["R_srcss"], arrays["t_srcss"],
            arrays["depth_ranges"], keys,
            num_iterations=num_iterations,
            num_samples=num_samples,
            patch=patch,
            ncc_threshold=ncc_threshold,
            coarse_factor=coarse_factor,
            fine_iterations=fine_iterations,
        )
    return DepthNormalMap(*(np.asarray(a)[:B] for a in out))


def distributed_plane_sweep(
    ref_grays: np.ndarray,     # (B, H, W)
    src_grays: np.ndarray,     # (B, J, H, W)
    K: np.ndarray,
    R_refs: np.ndarray,
    t_refs: np.ndarray,
    R_srcss: np.ndarray,
    t_srcss: np.ndarray,
    depth_range: np.ndarray,   # (2,) shared
    mesh: Optional[Mesh] = None,
    num_depths: int = 64,
    patch: int = 5,
    ncc_threshold: float = 0.8,
    min_views: int = 3,
):
    """Plane-sweep a batch of reference views sharded over the mesh.

    Returns (depth (B,H,W), count (B,H,W), mean_ncc (B,H,W)) on host.
    """
    mesh = mesh or make_mesh()
    n_data = mesh.shape["data"]
    B = ref_grays.shape[0]

    arrays = {}
    for name, x in (
        ("ref_grays", ref_grays), ("src_grays", src_grays),
        ("R_refs", R_refs), ("t_refs", t_refs),
        ("R_srcss", R_srcss), ("t_srcss", t_srcss),
    ):
        padded, _ = pad_to_multiple(np.asarray(x), n_data, axis=0)
        arrays[name] = _put(mesh, padded, 0)
    Kd = _put(mesh, K, None)
    dr = _put(mesh, depth_range, None)

    from recon3d_tpu.dense.plane_sweep import _sweep_batch_program

    sweep = _sweep_batch_program(num_depths, patch, ncc_threshold, min_views)
    with mesh:
        depth, cnt, ncc = sweep(
            arrays["ref_grays"], arrays["src_grays"], Kd,
            arrays["R_refs"], arrays["t_refs"],
            arrays["R_srcss"], arrays["t_srcss"], dr,
        )
    return (
        np.asarray(depth)[:B], np.asarray(cnt)[:B], np.asarray(ncc)[:B]
    )
