"""Pure jitted train/val steps — the TPU replacement for the reference's
autocast/GradScaler/DDP hot loop (ref distillation/nnunetv2/training/
nnUNetTrainer/nnUNetTrainer.py:973-1118).

No GradScaler: bf16 has fp32 range, so loss scaling is unnecessary. No DDP
wrapper: the step is jitted with the batch sharded over the mesh 'data' axis and
params replicated; XLA inserts the gradient all-reduce. Grad clip + weight decay
+ momentum live in the optax chain (optimizers.py).
"""
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .losses import (dc_and_bce_loss, dc_and_ce_loss, deep_supervision_weights,
                     deep_supervised_loss, hard_tp_fp_fn)


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def split_trainable(variables):
    """Split a flax variables dict into (trainable, aux_state): aux_state
    carries non-differentiable collections (batch_stats for BatchStatsNorm
    networks — see models/blocks.py); empty for the InstanceNorm default."""
    if isinstance(variables, dict) and "params" in variables and len(variables) > 1:
        aux = {k: v for k, v in variables.items() if k != "params"}
        return {"params": variables["params"]}, aux
    return variables, {}


def create_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    trainable, _ = split_trainable(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=optimizer.init(trainable))


def make_loss_fn(*, has_regions: bool, has_ignore: bool,
                 ignore_label: Optional[int], batch_dice: bool) -> Callable:
    """(logits, target) -> scalar, matching nnUNetTrainer._build_loss (ref :391-425)."""
    if has_regions:
        def loss_fn(logits, target):
            return dc_and_bce_loss(logits, target, batch_dice=batch_dice,
                                   has_ignore=has_ignore)
    else:
        def loss_fn(logits, target):
            return dc_and_ce_loss(logits, target, batch_dice=batch_dice,
                                  ignore_label=ignore_label if has_ignore else None)
    return loss_fn


def make_train_step(network, optimizer: optax.GradientTransformation, *,
                    has_regions: bool = False, has_ignore: bool = False,
                    ignore_label: Optional[int] = None, batch_dice: bool = False,
                    n_ds_levels: int = 1, compute_dtype=jnp.bfloat16) -> Callable:
    """Returns step(state, data, targets) -> (state, loss).

    data: (B, *patch, C). targets: tuple of n_ds_levels arrays, highest res first
    ((B, *S_l) int labels or (B, *S_l, R[+1]) region maps).
    """
    base_loss = make_loss_fn(has_regions=has_regions, has_ignore=has_ignore,
                             ignore_label=ignore_label, batch_dice=batch_dice)
    ds_w = tuple(deep_supervision_weights(n_ds_levels).tolist()) \
        if n_ds_levels > 1 else (1.0,)

    def loss_of(trainable, aux, data, targets):
        if aux:  # batch_stats network: train-mode apply, collect updated stats
            outputs, new_aux = network.apply(
                {**trainable, **aux}, data.astype(compute_dtype),
                deep_supervision=n_ds_levels > 1, mutable=list(aux.keys()))
        else:
            outputs = network.apply(trainable, data.astype(compute_dtype),
                                    deep_supervision=n_ds_levels > 1)
            new_aux = aux
        if n_ds_levels == 1:
            outputs = (outputs,)
        return deep_supervised_loss(base_loss, outputs, targets, ds_w), new_aux

    def step(state: TrainState, data, targets) -> Tuple[TrainState, jnp.ndarray]:
        trainable, aux = split_trainable(state.params)
        (loss, new_aux), grads = jax.value_and_grad(loss_of, has_aux=True)(
            trainable, aux, data, targets)
        updates, new_opt = optimizer.update(grads, state.opt_state, trainable)
        new_params = {**optax.apply_updates(trainable, updates), **new_aux}
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt), loss

    return step


def make_val_step(network, *, num_heads: int, has_regions: bool = False,
                  has_ignore: bool = False, ignore_label: Optional[int] = None,
                  batch_dice: bool = False, n_ds_levels: int = 1,
                  compute_dtype=jnp.bfloat16) -> Callable:
    """Returns step(params, data, targets) -> (loss, tp, fp, fn) where tp/fp/fn
    are per-foreground-class sums for the online pseudo-dice
    (ref nnUNetTrainer.validation_step:1020-1118)."""
    base_loss = make_loss_fn(has_regions=has_regions, has_ignore=has_ignore,
                             ignore_label=ignore_label, batch_dice=batch_dice)
    ds_w = tuple(deep_supervision_weights(n_ds_levels).tolist()) \
        if n_ds_levels > 1 else (1.0,)

    def step(params, data, targets):
        outputs = network.apply(params, data.astype(compute_dtype),
                                deep_supervision=n_ds_levels > 1)
        if n_ds_levels == 1:
            outputs = (outputs,)
        loss = deep_supervised_loss(base_loss, outputs, targets, ds_w)
        tp, fp, fn = hard_tp_fp_fn(outputs[0], targets[0], num_heads,
                                   ignore_label=ignore_label if has_ignore else None,
                                   regions=has_regions)
        if not has_regions:
            tp, fp, fn = tp[1:], fp[1:], fn[1:]  # drop background
        return loss, tp, fp, fn

    return step
