"""Optimizers reproducing the reference's update rules in optax.

Default: SGD, nesterov momentum 0.99, weight decay 3e-5 (applied to the raw
gradient before momentum, torch-SGD style), global-norm grad clip 12
(ref nnUNetTrainer.configure_optimizers / train_step:973-1003). Variants: Adam/
AdamW (ref training/nnUNetTrainer/variants/optimizer/) used by the Primus
trainers with separate warmup schedules.
"""
from typing import Callable, Optional, Union

import optax


def nnunet_sgd(learning_rate: Union[float, Callable], momentum: float = 0.99,
               weight_decay: float = 3e-5, nesterov: bool = True,
               grad_clip: float = 12.0) -> optax.GradientTransformation:
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay:
        # torch SGD: g <- g + wd * p, *before* the momentum buffer update
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def nnunet_adamw(learning_rate: Union[float, Callable], weight_decay: float = 5e-2,
                 b1: float = 0.9, b2: float = 0.98, eps: float = 1e-8,
                 grad_clip: Optional[float] = 1.0) -> optax.GradientTransformation:
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def nnunet_adam(learning_rate: Union[float, Callable],
                grad_clip: Optional[float] = 12.0) -> optax.GradientTransformation:
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(optax.scale_by_adam())
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)
