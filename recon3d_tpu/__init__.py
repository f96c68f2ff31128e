"""recon3d_tpu — a TPU-native 3D reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
dackey-wav/3d-reconstruction-tool (reference: /root/reference/src/__init__.py:9-15):
incremental structure-from-motion, dense multi-view stereo (plane-sweep and
PatchMatch), classical (SIFT) and neural (SuperPoint+LightGlue) matching
frontends, camera calibration, and PLY point-cloud I/O.

Design principles (TPU-first, not a port):
  - All hot compute is batched, statically shaped, and jitted; per-item Python
    loops in the reference become vmapped/scanned batch axes.
  - RANSAC = vmapped minimal solvers over hypothesis batches.
  - Multi-chip scaling via jax.sharding.Mesh + NamedSharding over views/pairs/
    hypotheses, collectives over ICI.
  - Host-side runtime (PLY I/O, voxel hashing) has a native C++ fast path.
"""

import os as _os

# Persistent XLA compilation cache: incremental SfM compiles a few dozen
# distinct kernels (per padded shape bucket); caching them across processes
# turns every run after the first into a near-zero-compile run. Opt out with
# RECON3D_NO_COMPILE_CACHE=1.
if (
    not _os.environ.get("RECON3D_NO_COMPILE_CACHE")
    # CPU-only runs (tests, virtual meshes) skip the cache: CPU compiles are
    # fast, and AOT artifacts are machine-feature-specific (a cache written
    # by a different host risks SIGILL on load).
    and "cpu" not in _os.environ.get("JAX_PLATFORMS", "").lower()
):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "RECON3D_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "recon3d_tpu", "xla"),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

from recon3d_tpu.camera import Camera, CameraPose, load_calibration
from recon3d_tpu.config import ReconstructionConfig
from recon3d_tpu.sfm.pipeline import SfMPipeline
from recon3d_tpu.io.ply import load_ply, save_ply, save_cameras_ply
from recon3d_tpu.dense.patchmatch import PatchMatchMVS
from recon3d_tpu.dense.plane_sweep import PlaneSweepReconstructor
from recon3d_tpu.dense.sift_dense import DenseSiftReconstructor

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "CameraPose",
    "load_calibration",
    "ReconstructionConfig",
    "SfMPipeline",
    "PatchMatchMVS",
    "PlaneSweepReconstructor",
    "DenseSiftReconstructor",
    "load_ply",
    "save_ply",
    "save_cameras_ply",
]
