"""Train state + optimizer + the jittable train step.

Rebuild of the reference training runtime (``utils/solver.py:19-215``),
redesigned functionally for XLA:

- Adam with torch-default betas/eps (the reference's solver never forwards the
  config's betas/eps keys — see ``make_optimizer``) and the triangular cyclic
  LR, both pure functions of the step (``solver.py:40-46``).
- BN running stats updated with the scheduled momentum OUTSIDE the module
  (torch semantics ``running = (1-m)*running + m*batch``; reference mutates
  module momentum per-iteration via BNMomentumScheduler, ``solver.py:48-49``).
- Frozen world-enhancer: gradient subtree zeroed via ``optax.multi_transform``
  (reference filters ``requires_grad`` params, ``train.py:116-118`` +
  ``solver.py:40-43``). Note the reference still updates frozen BNs' running
  stats (the module stays in train mode) — we match that.
- The reference computes syn/real losses separately and weights by batch size
  (``solver.py:180-182``); since every loss term is a batch mean, that weighted
  sum equals the loss of the concatenated batch, so one forward + one loss is
  mathematically identical — and one fused XLA graph.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from istnet_tpu.train.schedules import bn_momentum, cyclic_triangular_lr

Array = jax.Array
PyTree = Any


class TrainState(flax.struct.PyTreeNode):
    step: Array
    params: PyTree
    batch_stats: PyTree
    opt_state: PyTree


def _freeze_label_tree(params: PyTree, frozen_prefix: str | None) -> PyTree:
    """Label each top-level param subtree 'frozen' or 'trainable'."""
    def label(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return "frozen" if frozen_prefix is not None and top == frozen_prefix else "trainable"
    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(cfg, iters_per_epoch: int, params: PyTree,
                   frozen_prefix: str | None = None):
    """Adam + cyclic LR, with an optionally-frozen top-level subtree.

    NOTE: the reference configs carry ``optimizer.betas``/``eps`` keys but its
    solver NEVER passes them — ``optim.Adam(params, lr=..., weight_decay=...)``
    (``utils/solver.py:40-43``) trains with torch defaults (0.9, 0.999, 1e-8).
    We reproduce the actual training behavior; the config keys are accepted
    only via the explicit ``adam_betas``/``adam_eps`` overrides.
    """
    opt = cfg.optimizer
    max_epoch = cfg.max_epoch
    step_size_up = max(1, int(max_epoch * iters_per_epoch / 6))  # solver.py:45

    def lr_schedule(step):
        return cyclic_triangular_lr(step, base_lr=1e-5, max_lr=1e-3,
                                    step_size_up=step_size_up)

    betas = opt.get("adam_betas", (0.9, 0.999))  # torch Adam defaults
    adam = optax.adam(
        learning_rate=lr_schedule,
        b1=float(betas[0]),
        b2=float(betas[1]),
        eps=float(opt.get("adam_eps", 1e-8)),
    )
    wd = float(opt.get("weight_decay", 0.0))
    if wd:
        adam = optax.chain(optax.add_decayed_weights(wd), adam)
    if frozen_prefix is None:
        return adam, lr_schedule
    labels = _freeze_label_tree(params, frozen_prefix)
    tx = optax.multi_transform(
        {"trainable": adam, "frozen": optax.set_to_zero()}, labels)
    return tx, lr_schedule


def create_train_state(params: PyTree, batch_stats: PyTree, tx) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params))


def ema_batch_stats(running: PyTree, batch: PyTree, momentum: Array) -> PyTree:
    """running = (1-m)*running + m*batch (torch BN momentum semantics)."""
    return jax.tree_util.tree_map(
        lambda r, b: (1.0 - momentum) * r + momentum * b, running, batch)


def make_train_step(model, loss_fn: Callable, tx, bn_cfg,
                    augment_fn: Callable | None = None,
                    preprocess_fn: Callable | None = None) -> Callable:
    """Build the jittable train step.

    loss_fn(end_points, batch) -> (total, parts_dict).
    augment_fn(batch, rng) -> batch, applied on device inside the step (the
    "on-device augmentation" path, istnet_tpu.data.device_augment).
    preprocess_fn(raw_batch, rng) -> {"inputs", "labels"}: when set, ``batch``
    is the RAW collated batch (TrainingDataset(device_preprocess=True)) and
    the whole input pipeline (depth fill, crop, sample, jitter, ColorJitter,
    qo) runs on device inside this same jitted program, sharded with the
    batch (data.device_preprocess.make_train_preprocess).
    Returns step(state, batch, dropout_rng) -> (state, metrics).
    """

    def train_step(state: TrainState, batch: dict, dropout_rng) -> tuple[TrainState, dict]:
        if preprocess_fn is not None:
            pre_rng, dropout_rng = jax.random.split(dropout_rng)
            batch = preprocess_fn(batch, pre_rng)
        if augment_fn is not None:
            aug_rng, dropout_rng = jax.random.split(dropout_rng)
            batch = augment_fn(batch, aug_rng)

        def compute_loss(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["inputs"], train=True, mutable=["bn_batch"],
                rngs={"dropout": dropout_rng})
            total, parts = loss_fn(out, batch["labels"])
            return total, (parts, mut)

        (loss, (parts, mut)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        m = bn_momentum(state.step,
                        bn_mom=float(bn_cfg.bn_momentum),
                        bn_decay=float(bn_cfg.bn_decay),
                        decay_step=int(bn_cfg.decay_step),
                        clip=float(bn_cfg.bnm_clip))
        batch_stats = ema_batch_stats(state.batch_stats, mut["bn_batch"], m)

        new_state = TrainState(step=state.step + 1, params=params,
                               batch_stats=batch_stats, opt_state=opt_state)
        metrics = {k: v for k, v in parts.items()}
        metrics["loss"] = loss
        return new_state, metrics

    return train_step
