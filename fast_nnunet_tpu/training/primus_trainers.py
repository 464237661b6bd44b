"""Primus transformer trainers (ref distillation/nnunetv2/training/nnUNetTrainer/
primus/primus_trainers.py:18-324): AdamW (betas 0.9/0.98) with linear warmup,
higher weight decay, no deep supervision, NaN watchdog on the train step."""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.primus import Primus
from .optimizers import nnunet_adamw
from .schedules import linear_warmup_poly
from .train_step import TrainState, make_loss_fn
from .losses import deep_supervision_weights, deep_supervised_loss
from .trainer import NNUNetTrainer


class AbstractPrimusTrainer(NNUNetTrainer):
    embed_dim: int = 396
    depth: int = 12
    num_heads: int = 6
    patch_embed_size: Tuple[int, int, int] = (8, 8, 8)

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.enable_deep_supervision = False
        self.initial_lr = 3e-4
        self.weight_decay = 5e-2
        self.warmup_epochs = 50

    def _init_args(self) -> dict:
        # the checkpoint is self-describing: the predictor rebuilds the
        # Primus from these dims instead of the plans' CNN architecture
        # (ref predict_from_raw_data.py:89-104 — trainer_name drives the
        # build; recording dims also covers ad-hoc subclasses)
        args = super()._init_args()
        args["primus_arch"] = {
            "embed_dim": int(self.embed_dim), "depth": int(self.depth),
            "num_heads": int(self.num_heads),
            "patch_embed_size": [int(p) for p in self.patch_embed_size]}
        return args

    def build_network_architecture(self):
        return Primus(
            input_channels=self.num_input_channels,
            embed_dim=self.embed_dim,
            patch_embed_size=self.patch_embed_size,
            num_classes=self.label_manager.num_segmentation_heads,
            depth=self.depth,
            num_heads=self.num_heads,
            patch_size=tuple(self.configuration_manager.patch_size),
            drop_path_rate=0.2,
            scale_attn_inner=True,
            init_values=0.1,
            dtype=self.compute_dtype)

    def configure_optimizer(self, total_steps: int):
        warmup_steps = self.warmup_epochs * self.num_iterations_per_epoch
        return nnunet_adamw(
            linear_warmup_poly(self.initial_lr, total_steps, warmup_steps),
            weight_decay=self.weight_decay, b1=0.9, b2=0.98, grad_clip=1.0)

    def initialize(self):
        super().initialize()
        # NaN watchdog (ref primus_trainers.py:85-116): skip the update when the
        # loss is non-finite instead of poisoning the params
        base_loss = make_loss_fn(
            has_regions=self.label_manager.has_regions,
            has_ignore=self.label_manager.has_ignore_label,
            ignore_label=self.label_manager.ignore_label,
            batch_dice=self.configuration_manager.batch_dice)
        network = self.network
        optimizer = self.optimizer
        compute_dtype = self.compute_dtype

        def loss_of(params, data, targets):
            out = network.apply(params, data.astype(compute_dtype),
                                deep_supervision=False)
            return base_loss(out, targets[0])

        def step(state, data, targets):
            loss, grads = jax.value_and_grad(loss_of)(state.params, data, targets)
            finite = jnp.isfinite(loss)
            updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old), new_params,
                state.params)
            new_opt = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old)
                if hasattr(new, "shape") else new, new_opt, state.opt_state)
            return TrainState(step=state.step + 1, params=new_params,
                              opt_state=new_opt), loss

        self._jit_train_step = jax.jit(step, donate_argnums=(0,))


class nnUNet_Primus_S_Trainer(AbstractPrimusTrainer):
    embed_dim, depth, num_heads = 396, 12, 6


class nnUNet_Primus_B_Trainer(AbstractPrimusTrainer):
    embed_dim, depth, num_heads = 792, 12, 12


class nnUNet_Primus_M_Trainer(AbstractPrimusTrainer):
    embed_dim, depth, num_heads = 864, 16, 12


class nnUNet_Primus_L_Trainer(AbstractPrimusTrainer):
    embed_dim, depth, num_heads = 1056, 24, 16


# -------- fixed-batch / fixed-patch convenience variants (ref :203-324) ------
def _override_config(trainer, batch_size=None, patch_size=None):
    cfg = trainer.configuration_manager.configuration
    if batch_size is not None:
        cfg["batch_size"] = batch_size
    if patch_size is not None:
        cfg["patch_size"] = list(patch_size)


class nnUNet_Primus_M_Trainer_BS8(nnUNet_Primus_M_Trainer):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        _override_config(self, batch_size=8)


class nnUNet_Primus_M_Trainer_BS8_2e4(nnUNet_Primus_M_Trainer):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.initial_lr = 2e-4
        _override_config(self, batch_size=8)


class nnUNet_Trainer_BS8(NNUNetTrainer):
    """Plain conv-UNet trainer at batch size 8 (ref :230-244)."""
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        _override_config(self, batch_size=8)


class _Primus_S_96_BS1(nnUNet_Primus_S_Trainer):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        _override_config(self, batch_size=1, patch_size=(96, 96, 96))


class _Primus_B_96_BS1(nnUNet_Primus_B_Trainer):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        _override_config(self, batch_size=1, patch_size=(96, 96, 96))


class _Primus_M_96_BS1(nnUNet_Primus_M_Trainer):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        _override_config(self, batch_size=1, patch_size=(96, 96, 96))


class _Primus_L_48_BS1(nnUNet_Primus_L_Trainer):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        _override_config(self, batch_size=1, patch_size=(48, 48, 48))
