"""Device mesh construction and sharding helpers.

The framework's distributed substrate (SURVEY.md §2 "parallelism
strategies"): the reference has no multi-device code at all; here every
embarrassingly-parallel axis it expresses as a Python loop (views, pairs,
hypotheses, depth planes) becomes an array axis sharded over a
jax.sharding.Mesh, with XLA inserting ICI collectives.

Mesh layout: ('data', 'model').
  data  — views / pairs / RANSAC-hypothesis batches / depth-map jobs.
  model — tensor parallelism inside the neural matchers (attention heads,
          descriptor channels).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recon3d_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    config: Optional[MeshConfig] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, config.model_parallel)
    dp = config.data_parallel if config.data_parallel > 0 else n // mp
    dp = max(1, min(dp, n // mp))
    used = dp * mp
    arr = np.asarray(devices[:used]).reshape(dp, mp)
    return Mesh(arr, (config.data_axis, config.model_axis))


def auto_mesh(min_devices: int = 2) -> Optional[Mesh]:
    """Product-facing mesh discovery: a pure data-parallel mesh over every
    available device when there is more than one, else None.

    The CLI calls this so `--mvs`/`--stereo` per-view jobs and pair-matching
    chunks shard across chips automatically (reference equivalents are the
    serial loops at mvs_patchmatch.py:104-123 / sfm_pipeline.py:188-208);
    single-chip hosts keep the plain jit path with zero mesh overhead.
    """
    devices = jax.devices()
    if len(devices) < min_devices:
        return None
    return make_mesh(MeshConfig(model_parallel=1), devices=devices)


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard array axis `axis` over the data mesh axis, replicate the rest."""
    spec = [None] * ndim
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Pad a host array so axis size is divisible by `multiple`.

    Returns (padded, original_size). Sharded batch axes must divide the mesh.
    """
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return np.pad(x, pad), n


def shard_batch(x, mesh: Mesh, axis: int = 0):
    """device_put a host array with its batch axis sharded over 'data'."""
    import jax.numpy as jnp

    arr = jnp.asarray(x)
    return jax.device_put(arr, data_sharding(mesh, arr.ndim, axis))
