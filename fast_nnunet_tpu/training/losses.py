"""Segmentation losses, jit-friendly and layout-native (B, *spatial, K).

Behavioral parity targets:
- MemoryEfficientSoftDiceLoss (ref distillation/nnunetv2/training/loss/dice.py:58-119):
  per-class sums without materializing a one-hot target. We go further on TPU:
  intersect/sum_gt are computed with a segment-sum over the integer labelmap
  (a scatter-add), so nothing of shape (..., K) beyond the logits ever exists.
- RobustCrossEntropyLoss / TopKLoss (loss/robust_ce_loss.py:6-33)
- DC_and_CE_loss / DC_and_BCE_loss (loss/compound_losses.py:8-107), including
  the ignore-label masking semantics
- DeepSupervisionWrapper weights 1/2^i, lowest-res weight 0, normalized
  (nnUNetTrainer.py:409-423, deep_supervision.py:4-25)

Under a data-sharded jit, the sums over the batch axis are global (XLA inserts
the all-reduce), which reproduces the reference's AllGatherGrad DDP semantics
for batch_dice without any explicit collectives (utilities/ddp_allgather.py).
"""
from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


# ---------------------------------------------------------------- dice ingredients
def _flatten_spatial(x: Array, channels_last: bool) -> Array:
    if channels_last:
        return x.reshape(x.shape[0], -1, x.shape[-1])  # (B, N, K)
    return x.reshape(x.shape[0], -1)  # (B, N)


def _per_class_sums_from_labels(probs: Array, labels: Array, num_classes: int,
                                loss_mask: Optional[Array]) -> Tuple[Array, Array, Array]:
    """probs (B, N, K) fp32, labels (B, N) int -> (intersect, sum_pred, sum_gt)
    each (B, K). Memory-efficient: scatter-adds instead of one-hot."""
    if loss_mask is not None:
        m = loss_mask.astype(probs.dtype)
        probs_m = probs * m[..., None]
        gt_vals = m
    else:
        probs_m = probs
        gt_vals = jnp.ones(labels.shape, probs.dtype)

    labels = labels.astype(jnp.int32)
    gathered = jnp.take_along_axis(probs_m, labels[..., None], axis=-1)[..., 0]

    def seg(vals, labs):
        return jax.ops.segment_sum(vals, labs, num_segments=num_classes)

    intersect = jax.vmap(seg)(gathered, labels)        # (B, K)
    sum_gt = jax.vmap(seg)(gt_vals, labels)            # (B, K)
    sum_pred = probs_m.sum(axis=1)                     # (B, K)
    return intersect, sum_pred, sum_gt


def _per_class_sums_from_onehot(probs: Array, target: Array,
                                loss_mask: Optional[Array]) -> Tuple[Array, Array, Array]:
    """probs/target (B, N, K); target may be overlapping regions."""
    t = target.astype(probs.dtype)
    if loss_mask is not None:
        m = loss_mask.astype(probs.dtype)[..., None]
        intersect = (probs * t * m).sum(axis=1)
        sum_pred = (probs * m).sum(axis=1)
        sum_gt = (t * m).sum(axis=1)
    else:
        intersect = (probs * t).sum(axis=1)
        sum_pred = probs.sum(axis=1)
        sum_gt = t.sum(axis=1)
    return intersect, sum_pred, sum_gt


def soft_dice_loss(logits: Array, target: Array, loss_mask: Optional[Array] = None,
                   apply_nonlin: str = "softmax", batch_dice: bool = False,
                   do_bg: bool = False, smooth: float = 1e-5) -> Array:
    """logits (B, *S, K); target (B, *S) int labelmap or (B, *S, K) one-hot/regions;
    loss_mask (B, *S) (1 = include). Returns -mean dice (scalar)."""
    num_classes = logits.shape[-1]
    x = logits.astype(jnp.float32)
    if apply_nonlin == "softmax":
        probs = jax.nn.softmax(x, axis=-1)
    elif apply_nonlin == "sigmoid":
        probs = jax.nn.sigmoid(x)
    elif apply_nonlin is None or apply_nonlin == "none":
        probs = x
    else:
        raise ValueError(apply_nonlin)

    probs_f = _flatten_spatial(probs, True)
    mask_f = _flatten_spatial(loss_mask, False) if loss_mask is not None else None
    if target.ndim == logits.ndim and target.shape[-1] == num_classes:
        tgt_f = _flatten_spatial(target, True)
        intersect, sum_pred, sum_gt = _per_class_sums_from_onehot(probs_f, tgt_f, mask_f)
    else:
        tgt_f = _flatten_spatial(target, False)
        intersect, sum_pred, sum_gt = _per_class_sums_from_labels(
            probs_f, tgt_f, num_classes, mask_f)

    if batch_dice:
        # global across batch — and across data-parallel shards under pjit
        intersect = intersect.sum(0)
        sum_pred = sum_pred.sum(0)
        sum_gt = sum_gt.sum(0)

    if not do_bg:
        intersect = intersect[..., 1:]
        sum_pred = sum_pred[..., 1:]
        sum_gt = sum_gt[..., 1:]

    dc = (2 * intersect + smooth) / jnp.clip(sum_gt + sum_pred + smooth, 1e-8)
    return -dc.mean()


# ---------------------------------------------------------------- cross entropy
def _per_voxel_ce(logits: Array, labels: Array) -> Array:
    """(B, *S, K) fp32 logits, (B, *S) int labels -> (B, *S) CE."""
    x = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(x, axis=-1)
    picked = jnp.take_along_axis(x, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return lse - picked


def robust_cross_entropy(logits: Array, labels: Array,
                         ignore_index: Optional[int] = None) -> Array:
    """Mean CE over non-ignored voxels (torch CrossEntropyLoss ignore_index parity)."""
    if ignore_index is None:
        return _per_voxel_ce(logits, labels).mean()
    mask = (labels != ignore_index)
    safe = jnp.where(mask, labels, 0)
    ce = _per_voxel_ce(logits, safe)
    denom = jnp.clip(mask.sum(), 1)
    return jnp.where(mask, ce, 0.0).sum() / denom


def topk_cross_entropy(logits: Array, labels: Array, k_percent: float = 10.0,
                       ignore_index: Optional[int] = None,
                       label_smoothing: float = 0.0) -> Array:
    """Mean over the k% hardest voxels (ref TopKLoss; ignored voxels get CE 0 so
    they never enter the top-k unless everything is ignored). label_smoothing
    follows torch CrossEntropyLoss: (1-eps)*nll + eps*mean_c(-log p_c)."""
    def voxel_ce(lg, lb):
        ce = _per_voxel_ce(lg, lb)
        if label_smoothing > 0.0:
            x = lg.astype(jnp.float32)
            logp = x - jax.nn.logsumexp(x, axis=-1, keepdims=True)
            ce = (1.0 - label_smoothing) * ce \
                + label_smoothing * (-logp.mean(-1))
        return ce

    if ignore_index is not None:
        mask = labels != ignore_index
        safe = jnp.where(mask, labels, 0)
        ce = jnp.where(mask, voxel_ce(logits, safe), 0.0)
    else:
        ce = voxel_ce(logits, labels)
    flat = ce.reshape(-1)
    n_keep = max(1, int(flat.shape[0] * k_percent / 100))
    top, _ = jax.lax.top_k(flat, n_keep)
    return top.mean()


def binary_cross_entropy_with_logits(logits: Array, target: Array,
                                     loss_mask: Optional[Array] = None) -> Array:
    x = logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    per = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if loss_mask is None:
        return per.mean()
    m = loss_mask.astype(jnp.float32)[..., None]
    return (per * m).sum() / jnp.clip((m * jnp.ones_like(per)).sum(), 1e-8)


# ---------------------------------------------------------------- compound losses
def dc_and_ce_loss(logits: Array, target: Array, *, batch_dice: bool,
                   ignore_label: Optional[int] = None, weight_ce: float = 1.0,
                   weight_dice: float = 1.0, smooth: float = 1e-5) -> Array:
    """Label-based training loss (ref compound_losses.py:8-56): dice excludes
    background; CE over all classes; ignore-label voxels are masked from dice and
    skipped by CE."""
    if ignore_label is not None:
        mask = (target != ignore_label)
        target_dice = jnp.where(mask, target, 0)
        dc = soft_dice_loss(logits, target_dice, loss_mask=mask, batch_dice=batch_dice,
                            do_bg=False, smooth=smooth)
        num_fg = mask.sum()
        ce = robust_cross_entropy(logits, target, ignore_index=ignore_label)
        ce = jnp.where(num_fg > 0, ce, 0.0)
    else:
        dc = soft_dice_loss(logits, target, batch_dice=batch_dice, do_bg=False,
                            smooth=smooth)
        ce = robust_cross_entropy(logits, target)
    return weight_ce * ce + weight_dice * dc


def dc_and_bce_loss(logits: Array, target_regions: Array, *, batch_dice: bool,
                    has_ignore: bool = False, weight_ce: float = 1.0,
                    weight_dice: float = 1.0, smooth: float = 1e-5) -> Array:
    """Region-based training loss (ref compound_losses.py:59-107). target_regions
    is (B, *S, R) one-hot region maps; when has_ignore, the LAST channel is the
    ignore mask (1 = ignore) and is stripped off here."""
    if has_ignore:
        mask = 1.0 - target_regions[..., -1]
        target = target_regions[..., :-1]
    else:
        mask = None
        target = target_regions
    dc = soft_dice_loss(logits, target, loss_mask=mask, apply_nonlin="sigmoid",
                        batch_dice=batch_dice, do_bg=True, smooth=smooth)
    ce = binary_cross_entropy_with_logits(logits, target, loss_mask=mask)
    return weight_ce * ce + weight_dice * dc


# ---------------------------------------------------------------- deep supervision
def deep_supervision_weights(n_outputs: int) -> np.ndarray:
    """1/2^i per resolution, lowest-res weight zeroed, normalized to sum 1."""
    w = np.array([1 / (2 ** i) for i in range(n_outputs)])
    if n_outputs > 1:
        w[-1] = 0
    return w / w.sum()


def deep_supervised_loss(loss_fn: Callable, outputs: Sequence[Array],
                         targets: Sequence[Array],
                         weights: Optional[Sequence[float]] = None) -> Array:
    if weights is None:
        weights = deep_supervision_weights(len(outputs))
    total = 0.0
    for w, o, t in zip(weights, outputs, targets):
        if w != 0.0:
            total = total + w * loss_fn(o, t)
    return total


# ---------------------------------------------------------------- online metrics
def hard_tp_fp_fn(logits: Array, target: Array, num_classes: int,
                  ignore_label: Optional[int] = None,
                  regions: bool = False) -> Tuple[Array, Array, Array]:
    """Per-class hard tp/fp/fn for the online pseudo-dice
    (ref nnUNetTrainer.validation_step:1020-1118). Returns (K,) or (R,) arrays
    (background included for labels; caller slices [1:])."""
    if regions:
        pred = (jax.nn.sigmoid(logits.astype(jnp.float32)) > 0.5)
        if ignore_label is not None:
            m = (1.0 - target[..., -1])[..., None]
            t = target[..., :-1].astype(jnp.float32)
        else:
            m = jnp.ones(logits.shape[:-1] + (1,), jnp.float32)
            t = target.astype(jnp.float32)
        p = pred.astype(jnp.float32) * m
        t = t * m
        tp = (p * t).sum(axis=tuple(range(t.ndim - 1)))
        fp = (p * (1 - t)).sum(axis=tuple(range(t.ndim - 1)))
        fn = ((1 - p) * m * t).sum(axis=tuple(range(t.ndim - 1)))
        return tp, fp, fn

    pred = logits.argmax(-1).astype(jnp.int32)
    if ignore_label is not None:
        mask = (target != ignore_label)
        tgt = jnp.where(mask, target, 0).astype(jnp.int32)
        valid = mask
    else:
        tgt = target.astype(jnp.int32)
        valid = jnp.ones_like(tgt, dtype=bool)

    pred_f = pred.reshape(-1)
    tgt_f = tgt.reshape(-1)
    valid_f = valid.reshape(-1).astype(jnp.float32)

    tp = jax.ops.segment_sum(valid_f * (pred_f == tgt_f), tgt_f, num_segments=num_classes)
    gt_count = jax.ops.segment_sum(valid_f, tgt_f, num_segments=num_classes)
    pred_count = jax.ops.segment_sum(valid_f, pred_f, num_segments=num_classes)
    fn = gt_count - tp
    fp = pred_count - tp
    return tp, fp, fn
