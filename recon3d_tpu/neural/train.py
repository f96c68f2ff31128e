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


def _descriptor_loss_corr(desc_a, desc_b, corr_idx, corr_valid):
    """InfoNCE with true homography correspondence.

    desc_*: (B, Hc, Wc, D); corr_idx (B, N=Hc*Wc) flat index of the B-view
    cell each A-view cell maps to under the pair homography; corr_valid
    masks out-of-bounds cells. Positives are the corresponding cells; all
    other cells of the same image pair are negatives.
    """
    B, Hc, Wc, D = desc_a.shape
    a = desc_a.reshape(B, Hc * Wc, D)
    b = desc_b.reshape(B, Hc * Wc, D)
    # rsqrt(sum^2 + eps), NOT x / max(||x||, eps): a ReLU stack can emit an
    # exactly-zero descriptor cell, where the norm's gradient is 0/0 = NaN
    # and one step poisons the parameters.
    a = a * jax.lax.rsqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-8)
    b = b * jax.lax.rsqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-8)
    sim = jnp.einsum("bnd,bmd->bnm", a, b) / 0.1
    logp = jax.nn.log_softmax(sim, axis=-1)
    pos = jnp.take_along_axis(logp, corr_idx[:, :, None], axis=-1)[..., 0]
    w = corr_valid.astype(jnp.float32)
    return -jnp.sum(pos * w) / jnp.maximum(jnp.sum(w), 1.0)


def make_pair_train_step(model: SuperPointNet, tx, mesh: Mesh,
                         desc_weight: float = 1.0):
    """Jitted homography-pair train step (detector CE on both views +
    correspondence InfoNCE), batch sharded over the 'data' axis.

    Feed it recon3d_tpu.neural.synthetic.make_pair_batch batches. Used by
    neural.pretrain to produce the bundled synthetic SuperPoint checkpoint.
    """
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))

    def loss_fn(params, batch):
        logits_a, desc_a = model.apply(params, batch["img_a"])
        logits_b, desc_b = model.apply(params, batch["img_b"])
        det = _detector_loss(logits_a, batch["lab_a"]) + _detector_loss(
            logits_b, batch["lab_b"]
        )
        dsc = _descriptor_loss_corr(
            desc_a, desc_b, batch["corr_idx"], batch["corr_valid"]
        )
        return det + desc_weight * dsc, (det, dsc)

    @functools.partial(
        jax.jit,
        in_shardings=(None, batch_sh),
        donate_argnums=(0,),
    )
    def train_step(state: TrainState, batch):
        (loss, (det, dsc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            jnp.stack([loss, det, dsc]),
        )

    return train_step


def make_epoch_train_fn(model: SuperPointNet, tx, mesh: Mesh,
                        epochs: int = 4, desc_weight: float = 1.0):
    """Jitted multi-epoch trainer: `epochs` passes over a pre-uploaded
    stacked dataset of compact batches in ONE dispatch (lax.scan over
    steps). Over a high-latency host<->device link this amortizes the
    per-step upload + dispatch cost that a step-at-a-time loop pays
    (recon3d_tpu.neural.pretrain uploads one dataset per round, then runs
    D*epochs optimizer steps device-side).

    `data` leaves are (D, B, ...) compact batches from
    synthetic.make_pair_batch_compact stacked on axis 0 (uint8 images,
    int8 cell labels) — decoded to float/one-hot on device.
    """
    data_sh = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P(None, DATA_AXIS)), {
            "img_a": 0, "img_b": 0, "cells_a": 0, "cells_b": 0,
            "corr_idx": 0, "corr_valid": 0,
        },
    )

    def decode(cb):
        return dict(
            img_a=cb["img_a"].astype(jnp.float32) / 255.0,
            img_b=cb["img_b"].astype(jnp.float32) / 255.0,
            lab_a=jax.nn.one_hot(cb["cells_a"].astype(jnp.int32), 65),
            lab_b=jax.nn.one_hot(cb["cells_b"].astype(jnp.int32), 65),
            corr_idx=cb["corr_idx"],
            corr_valid=cb["corr_valid"],
        )

    def loss_fn(params, batch):
        logits_a, desc_a = model.apply(params, batch["img_a"])
        logits_b, desc_b = model.apply(params, batch["img_b"])
        det = _detector_loss(logits_a, batch["lab_a"]) + _detector_loss(
            logits_b, batch["lab_b"]
        )
        dsc = _descriptor_loss_corr(
            desc_a, desc_b, batch["corr_idx"], batch["corr_valid"]
        )
        return det + desc_weight * dsc, (det, dsc)

    @functools.partial(
        jax.jit,
        in_shardings=(None, data_sh),
        donate_argnums=(0,),
    )
    def run(state: TrainState, data):
        D = data["img_a"].shape[0]

        def body(st, i):
            cb = jax.tree_util.tree_map(lambda x: x[i % D], data)
            (loss, (det, dsc)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(st.params, decode(cb))
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return (
                TrainState(params=params, opt_state=opt_state,
                           step=st.step + 1),
                jnp.stack([loss, det, dsc]),
            )

        state, losses = jax.lax.scan(
            body, state, jnp.arange(D * epochs, dtype=jnp.int32)
        )
        return state, losses

    return run


def _lightglue_loss(log_assign, m0, m1, gt_idx, valid0, valid1,
                    ignore1=None):
    """LightGlue supervision (Lindenberger et al. 2023, eq. 9) with a
    three-class label scheme.

    log_assign (N0, N1) soft-assignment log-probs; m0/m1 matchability
    probabilities; gt_idx (N0,) index into set 1: >= 0 ground-truth
    partner, -1 confidently UNMATCHABLE (occluded / out of view / no
    detection anywhere near the reprojection), -2 IGNORE (a detection
    sits near — but not mutually-nearest within — the reprojection, so
    the point is plausibly matchable and SuperPoint merely localized its
    partner elsewhere). ignore1 (N1,) optionally marks set-1 keypoints to
    exclude from the unmatchable term.

    Round-4's two-class labels called every unmatched keypoint
    unmatchable; with ~19 of the ~32 negatives per view pair actually
    being near-miss cases (measured, docs/neural_quality.md round 5),
    the matchability head was trained to abstain on matchable texture —
    the exact under-recall the quality table shows. Ignored points
    contribute NO loss.
    """
    matched = (gt_idx >= 0) & valid0
    pos = jnp.take_along_axis(
        log_assign, jnp.clip(gt_idx, 0)[:, None], axis=1
    )[:, 0]
    n_pos = jnp.maximum(jnp.sum(matched), 1.0)
    loss_pos = -jnp.sum(jnp.where(matched, pos, 0.0)) / n_pos

    un0 = valid0 & (gt_idx == -1)
    # which set-1 keypoints are matched by someone (scatter-add: a False
    # .set() at the clipped index 0 would clobber a real hit there)
    hit1 = (
        jnp.zeros(m1.shape[0], jnp.int32)
        .at[jnp.clip(gt_idx, 0)]
        .add(matched.astype(jnp.int32))
        > 0
    )
    un1 = valid1 & ~hit1
    if ignore1 is not None:
        un1 = un1 & ~ignore1
    eps = 1e-6
    loss_un = (
        -jnp.sum(jnp.where(un0, jnp.log(1.0 - m0 + eps), 0.0))
        / jnp.maximum(jnp.sum(un0), 1.0)
        - jnp.sum(jnp.where(un1, jnp.log(1.0 - m1 + eps), 0.0))
        / jnp.maximum(jnp.sum(un1), 1.0)
    ) * 0.5
    return loss_pos + loss_un, loss_pos, loss_un


def make_lightglue_train_fn(lg_model, tx, mesh: Mesh, epochs: int = 4):
    """Jitted multi-epoch LightGlue trainer over pre-extracted SuperPoint
    feature pairs (one dispatch per round, like make_epoch_train_fn).

    data leaves (D, B, ...): desc0/desc1 (D, B, K, dim), xy0n/xy1n
    (D, B, K, 2) normalized coords, valid0/valid1 (D, B, K) bool,
    gt_idx (D, B, K) int32 (>=0 partner, -1 unmatchable, -2 ignore),
    ignore1 (D, B, K) bool (set-1 near-miss exclusions). Features come
    from the frozen (bundled) SuperPoint — only LightGlue params train.
    """
    data_sh = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P(None, DATA_AXIS)), {
            "desc0": 0, "desc1": 0, "xy0n": 0, "xy1n": 0,
            "valid0": 0, "valid1": 0, "gt_idx": 0, "ignore1": 0,
        },
    )

    def pair_loss(params, cb):
        def one(desc0, desc1, xy0n, xy1n, valid0, valid1, gt, ign1):
            log_assign, m0, m1 = lg_model.apply(
                params, desc0, desc1, xy0n, xy1n, valid0, valid1
            )
            return _lightglue_loss(log_assign, m0, m1, gt, valid0, valid1,
                                   ignore1=ign1)

        l, lp, lu = jax.vmap(one)(
            cb["desc0"], cb["desc1"], cb["xy0n"], cb["xy1n"],
            cb["valid0"], cb["valid1"], cb["gt_idx"], cb["ignore1"],
        )
        return jnp.mean(l), (jnp.mean(lp), jnp.mean(lu))

    @functools.partial(
        jax.jit, in_shardings=(None, data_sh), donate_argnums=(0,)
    )
    def run(state: TrainState, data):
        D = data["desc0"].shape[0]

        def body(st, i):
            cb = jax.tree_util.tree_map(lambda x: x[i % D], data)
            (loss, (lp, lu)), grads = jax.value_and_grad(
                pair_loss, has_aux=True
            )(st.params, cb)
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return (
                TrainState(params=params, opt_state=opt_state,
                           step=st.step + 1),
                jnp.stack([loss, lp, lu]),
            )

        state, losses = jax.lax.scan(
            body, state, jnp.arange(D * epochs, dtype=jnp.int32)
        )
        return state, losses

    return run


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
