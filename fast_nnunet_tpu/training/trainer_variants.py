"""Trainer variants (capability parity with distillation/nnunetv2/training/
nnUNetTrainer/variants/**, SURVEY §2.3 T2): epoch presets, augmentation
variants, loss variants, optimizer variants, deep-supervision toggle, and the
benchmark trainers used as speed tests."""
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .augment import TrainingAugmenter, ValidationAugmenter
from .augment_da5 import DA5TrainingAugmenter
from .losses import (deep_supervision_weights, deep_supervised_loss,
                     robust_cross_entropy, soft_dice_loss, topk_cross_entropy)
from .optimizers import nnunet_adam, nnunet_adamw, nnunet_sgd
from .schedules import linear_warmup_poly, poly_lr_jax
from .trainer import NNUNetTrainer


# --------------------------------------------------------------- epochs presets
def _epochs_variant(n: int):
    class _T(NNUNetTrainer):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.num_epochs = n
    _T.__name__ = f"NNUNetTrainer_{n}epochs"
    _T.__qualname__ = _T.__name__
    return _T


NNUNetTrainer_1epochs = _epochs_variant(1)
NNUNetTrainer_1epoch = NNUNetTrainer_1epochs  # alias
NNUNetTrainer_5epochs = _epochs_variant(5)
NNUNetTrainer_10epochs = _epochs_variant(10)
NNUNetTrainer_50epochs = _epochs_variant(50)
NNUNetTrainer_100epochs = _epochs_variant(100)
NNUNetTrainer_250epochs = _epochs_variant(250)
NNUNetTrainer_2000epochs = _epochs_variant(2000)
NNUNetTrainer_4000epochs = _epochs_variant(4000)
NNUNetTrainer_8000epochs = _epochs_variant(8000)


# --------------------------------------------------------------- augmentation
class NNUNetTrainerNoMirroring(NNUNetTrainer):
    """No mirroring during training or TTA (ref variants/data_augmentation/
    nnUNetTrainerNoMirroring.py:29)."""

    def _make_training_transform(self, patch_size, rotation, mirror_axes, dummy_2d,
                                 lm, ds_scales):
        self.inference_allowed_mirroring_axes = ()
        return super()._make_training_transform(
            patch_size, rotation, (), dummy_2d, lm, ds_scales)


class NNUNetTrainer_onlyMirror01(NNUNetTrainer):
    """Mirror only the first two spatial axes (ref :60-80)."""

    def _make_training_transform(self, patch_size, rotation, mirror_axes, dummy_2d,
                                 lm, ds_scales):
        axes = tuple(a for a in mirror_axes if a < 2)
        self.inference_allowed_mirroring_axes = axes
        return super()._make_training_transform(
            patch_size, rotation, axes, dummy_2d, lm, ds_scales)


class NNUNetTrainerNoDA(NNUNetTrainer):
    """Validation-style transforms during training (ref variants/data_augmentation/
    nnUNetTrainerNoDA.py)."""

    def _make_training_transform(self, patch_size, rotation, mirror_axes, dummy_2d,
                                 lm, ds_scales):
        self.inference_allowed_mirroring_axes = ()
        return ValidationAugmenter(
            patch_size, regions=lm.foreground_regions if lm.has_regions else None,
            ignore_label=lm.ignore_label, ds_scales=ds_scales)


class NNUNetTrainerDA5(NNUNetTrainer):
    """Strong augmentation — TRANSFORM-FOR-TRANSFORM replay of the
    reference pipeline (ref variants/data_augmentation/nnUNetTrainerDA5.py:
    39-292): see training/augment_da5.DA5TrainingAugmenter. The initial
    patch size uses the DA5 scale envelope (0.7, 1.43) (ref :67-71).
    FNN_DA5_CONDENSED=1 opts into the cheap 6-family condensed variant."""

    def _configure_rotation_dummyDA_mirroring_and_initial_patch_size(
            self, patch_size):
        from .augment_da5 import \
            configure_da5_rotation_dummyDA_mirroring_and_initial_patch_size
        return configure_da5_rotation_dummyDA_mirroring_and_initial_patch_size(
            patch_size)

    def _make_training_transform(self, patch_size, rotation, mirror_axes, dummy_2d,
                                 lm, ds_scales):
        import os
        from .augment_da5 import DA5CondensedAugmenter
        cls = DA5CondensedAugmenter if os.environ.get(
            "FNN_DA5_CONDENSED", "0") == "1" else DA5TrainingAugmenter
        return cls(
            patch_size, rotation, mirror_axes,
            use_mask_for_norm=self.configuration_manager.use_mask_for_norm,
            dummy_2d=dummy_2d,
            regions=lm.foreground_regions if lm.has_regions else None,
            ignore_label=lm.ignore_label, ds_scales=ds_scales,
            cascade_labels=lm.foreground_labels if self.is_cascaded else None)


# --------------------------------------------------------------- deep supervision
class NNUNetTrainerNoDeepSupervision(NNUNetTrainer):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.enable_deep_supervision = False


# --------------------------------------------------------------- loss variants
class _LossOverrideTrainer(NNUNetTrainer):
    loss_kind = "dc_ce"

    def initialize(self):
        super().initialize()
        from .train_step import make_train_step, make_val_step
        kind = self.loss_kind
        lm = self.label_manager
        batch_dice = self.configuration_manager.batch_dice
        ignore = lm.ignore_label if lm.has_ignore_label else None

        def base_loss(logits, target):
            if kind == "ce":
                return robust_cross_entropy(logits, target, ignore_index=ignore)
            if kind == "dice":
                if ignore is not None:
                    mask = target != ignore
                    return soft_dice_loss(logits, jnp.where(mask, target, 0),
                                          loss_mask=mask, batch_dice=batch_dice,
                                          do_bg=False)
                return soft_dice_loss(logits, target, batch_dice=batch_dice,
                                      do_bg=False)
            if kind == "topk10":
                return topk_cross_entropy(logits, target, 10.0, ignore_index=ignore)
            if kind == "topk10_ls01":
                return topk_cross_entropy(logits, target, 10.0, ignore_index=ignore,
                                          label_smoothing=0.1)
            if kind == "dc_topk10":
                d = soft_dice_loss(logits, target, batch_dice=batch_dice, do_bg=False)
                return d + topk_cross_entropy(logits, target, 10.0,
                                              ignore_index=ignore)
            if kind == "dc_ce_nosmooth":
                from .losses import dc_and_ce_loss
                return dc_and_ce_loss(logits, target, batch_dice=batch_dice,
                                      ignore_label=ignore, smooth=0.0)
            raise ValueError(kind)

        n_ds = len(self._get_deep_supervision_scales() or [None])
        ds_w = tuple(deep_supervision_weights(n_ds).tolist()) if n_ds > 1 else (1.0,)
        network = self.network
        optimizer = self.optimizer
        compute_dtype = self.compute_dtype

        import optax
        from .train_step import TrainState

        def loss_of(params, data, targets):
            outputs = network.apply(params, data.astype(compute_dtype),
                                    deep_supervision=n_ds > 1)
            if n_ds == 1:
                outputs = (outputs,)
            return deep_supervised_loss(base_loss, outputs, targets, ds_w)

        def step(state, data, targets):
            loss, grads = jax.value_and_grad(loss_of)(state.params, data, targets)
            updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(step=state.step + 1, params=new_params,
                              opt_state=new_opt), loss

        self._jit_train_step = jax.jit(step, donate_argnums=(0,))


class NNUNetTrainerCELoss(_LossOverrideTrainer):
    loss_kind = "ce"


class NNUNetTrainerDiceLoss(_LossOverrideTrainer):
    loss_kind = "dice"


class NNUNetTrainerTopk10Loss(_LossOverrideTrainer):
    loss_kind = "topk10"


class NNUNetTrainerDiceTopK10Loss(_LossOverrideTrainer):
    loss_kind = "dc_topk10"


# --------------------------------------------------------------- optimizers
class NNUNetTrainerAdam(NNUNetTrainer):
    def configure_optimizer(self, total_steps: int):
        return nnunet_adam(poly_lr_jax(3e-4, total_steps))


class NNUNetTrainerAdan(NNUNetTrainer):
    """Adan optimizer with the poly schedule (ref variants/optimizer/
    nnUNetTrainerAdan.py:12-46; lr presets 1e-3/3e-4/1e-1 as subclasses)."""

    def configure_optimizer(self, total_steps: int):
        import optax
        return optax.chain(
            optax.clip_by_global_norm(12.0),
            optax.adan(poly_lr_jax(self.initial_lr, total_steps),
                       weight_decay=self.weight_decay))


class NNUNetTrainerAdan1en3(NNUNetTrainerAdan):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.initial_lr = 1e-3


class NNUNetTrainerAdan3en4(NNUNetTrainerAdan):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.initial_lr = 3e-4


class NNUNetTrainerAdan1en1(NNUNetTrainerAdan):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.initial_lr = 1e-1


class NNUNetTrainerAdamW(NNUNetTrainer):
    def configure_optimizer(self, total_steps: int):
        return nnunet_adamw(poly_lr_jax(3e-4, total_steps))


class NNUNetTrainer_warmup(NNUNetTrainer):
    """Linear warmup then poly decay (ref variants/lr_schedule/
    nnUNetTrainer_warmup.py:13-77: warmup_all stage with Lin_incr LR, then
    the poly-offset schedule reusing the same SGD so momentum carries over —
    a single optax chain with a piecewise schedule is exactly that)."""
    warmup_epochs = 50

    def configure_optimizer(self, total_steps: int):
        warmup_steps = self.warmup_epochs * self.num_iterations_per_epoch
        return nnunet_sgd(linear_warmup_poly(self.initial_lr, total_steps,
                                             warmup_steps),
                          momentum=0.99, weight_decay=self.weight_decay,
                          nesterov=True, grad_clip=12.0)


class NNUNetTrainerCosAnneal(NNUNetTrainer):
    """Cosine-annealed SGD over num_epochs (ref variants/lr_schedule/
    nnUNetTrainerCosAnneal.py:7-13; no warmup, T_max = num_epochs)."""

    def configure_optimizer(self, total_steps: int):
        from .schedules import linear_warmup_cosine
        return nnunet_sgd(linear_warmup_cosine(self.initial_lr, total_steps, 0),
                          momentum=0.99, weight_decay=self.weight_decay,
                          nesterov=True, grad_clip=12.0)


# --------------------------------------------------------------- benchmarking
class NNUNetTrainerBenchmark_5epochs(NNUNetTrainer):
    """Speed test: 5 epochs, fold 0 only, no checkpoints; records the fastest
    epoch time keyed by environment into benchmark_result.json (ref variants/
    benchmarking/nnUNetTrainerBenchmark_5epochs.py:10-70)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.num_epochs = 5
        self.crashed_with_oom = False

    def save_checkpoint(self, filename: str) -> None:
        pass  # benchmark runs don't checkpoint

    def run_training(self):
        try:
            super().run_training()
        except (RuntimeError, MemoryError) as e:
            if "RESOURCE_EXHAUSTED" in str(e) or isinstance(e, MemoryError):
                self.crashed_with_oom = True
                self.print_to_log_file("Not enough memory!")
            else:
                raise
        finally:
            self._write_benchmark_result()

    def _write_benchmark_result(self):
        import json
        import platform
        import socket

        from ..utils.io import join, isfile, load_json, save_json
        fname = join(self.output_folder, "benchmark_result.json")
        starts = self.logger.logging["epoch_start_timestamps"]
        ends = self.logger.logging["epoch_end_timestamps"]
        times = [e - s for s, e in zip(starts, ends) if s and e]
        fastest = float(np.min(times)) if times else None
        entry = {
            "fastest_epoch": fastest,
            "crashed_with_oom": self.crashed_with_oom,
            "hostname": socket.gethostname(),
            "devices": [str(d) for d in jax.devices()],
            "jax_version": jax.__version__,
            "python": platform.python_version(),
            "num_iterations_per_epoch": self.num_iterations_per_epoch,
            "trainer": self.__class__.__name__,
        }
        existing = load_json(fname) if isfile(fname) else {}
        key = f"{entry['hostname']}__{'_'.join(entry['devices'])[:60]}"
        existing[key] = entry
        save_json(existing, fname, sort_keys=False)


class NNUNetTrainerBenchmark_5epochs_noDataLoading(NNUNetTrainerBenchmark_5epochs):
    """Feeds one cached dummy batch every iteration to isolate device compute
    from the input pipeline (ref nnUNetTrainerBenchmark_5epochs_noDataLoading.py).

    The device conversion is memoized per cached batch: the reference's
    per-iteration ``.to(device)`` is free over PCIe, but re-uploading the same
    batch through a dev tunnel would make this variant measure transfer — the
    one thing it exists NOT to measure."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self._device_batch_cache = {}

    def _batch_to_device(self, batch: dict):
        key = id(batch)
        if key not in self._device_batch_cache:
            self._device_batch_cache[key] = super()._batch_to_device(batch)
        return self._device_batch_cache[key]

    def get_dataloaders(self):
        super().get_dataloaders()
        real_train = self.dataloader_train
        real_val = self.dataloader_val
        cached_train = next(real_train)
        cached_val = next(real_val)
        real_train.shutdown()
        real_val.shutdown()

        class _Const:
            def __init__(self, batch):
                self._b = batch

            def __next__(self):
                return self._b

            def __iter__(self):
                return self

            def shutdown(self):
                pass

        self.dataloader_train = _Const(cached_train)
        self.dataloader_val = _Const(cached_val)
        return self.dataloader_train, self.dataloader_val


# --------------------------------------------------------------- sampling/geometry
class NNUNetTrainer_probabilisticOversampling(NNUNetTrainer):
    """Per-sample Bernoulli(0.33) fg forcing instead of the deterministic
    last-third rule (ref variants/sampling/nnUNetTrainer_probabilisticOversampling.py)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.probabilistic_oversampling = True


class NNUNetTrainer_probabilisticOversampling_033(NNUNetTrainer_probabilisticOversampling):
    pass


class NNUNetTrainer_probabilisticOversampling_010(NNUNetTrainer_probabilisticOversampling):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.oversample_foreground_percent = 0.10


class NNUNetTrainer_probabilisticOversampling_050(NNUNetTrainer_probabilisticOversampling):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.oversample_foreground_percent = 0.50


class NNUNetTrainerNoDummy2D(NNUNetTrainer):
    """Disable dummy-2D augmentation on anisotropic patches (ref variants/
    data_augmentation nnUNetTrainer_noDummy2DDA)."""

    def _make_training_transform(self, patch_size, rotation, mirror_axes, dummy_2d,
                                 lm, ds_scales):
        return super()._make_training_transform(
            patch_size, rotation, mirror_axes, False, lm, ds_scales)


class NNUNetTrainerDAOrd0(NNUNetTrainer):
    """Nearest-neighbor (order-0) spatial resampling for data during augmentation
    (ref variants/data_augmentation nnUNetTrainerDAOrd0) — cheaper host DA."""

    def _make_training_transform(self, patch_size, rotation, mirror_axes, dummy_2d,
                                 lm, ds_scales):
        return TrainingAugmenter(
            patch_size, rotation, mirror_axes,
            use_mask_for_norm=self.configuration_manager.use_mask_for_norm,
            dummy_2d=dummy_2d,
            regions=lm.foreground_regions if lm.has_regions else None,
            ignore_label=lm.ignore_label, ds_scales=ds_scales,
            cascade_labels=lm.foreground_labels if self.is_cascaded else None,
            spatial_data_order=0)


# ------------------------------------------------- remaining reference names
# Every class the reference registers (SURVEY §2.3 T2) resolves here too, so
# `-tr <name>` commands port verbatim.

def _with_epochs(base, n, name):
    cls = type(name, (base,), {})
    def __init__(self, *a, _n=n, **kw):
        base.__init__(self, *a, **kw)
        self.num_epochs = _n
    cls.__init__ = __init__
    return cls


NNUNetTrainer_20epochs = _epochs_variant(20)
NNUNetTrainer_500epochs = _epochs_variant(500)
NNUNetTrainer_750epochs = _epochs_variant(750)
NNUNetTrainer_250epochs_NoMirroring = _with_epochs(
    NNUNetTrainerNoMirroring, 250, "NNUNetTrainer_250epochs_NoMirroring")
NNUNetTrainer_2000epochs_NoMirroring = _with_epochs(
    NNUNetTrainerNoMirroring, 2000, "NNUNetTrainer_2000epochs_NoMirroring")
NNUNetTrainer_4000epochs_NoMirroring = _with_epochs(
    NNUNetTrainerNoMirroring, 4000, "NNUNetTrainer_4000epochs_NoMirroring")
NNUNetTrainer_8000epochs_NoMirroring = _with_epochs(
    NNUNetTrainerNoMirroring, 8000, "NNUNetTrainer_8000epochs_NoMirroring")
NNUNetTrainer_onlyMirror01_1500ep = _with_epochs(
    NNUNetTrainer_onlyMirror01, 1500, "NNUNetTrainer_onlyMirror01_1500ep")
NNUNetTrainerDA5_10epochs = _with_epochs(
    NNUNetTrainerDA5, 10, "NNUNetTrainerDA5_10epochs")
NNUNetTrainerCELoss_5epochs = _with_epochs(
    NNUNetTrainerCELoss, 5, "NNUNetTrainerCELoss_5epochs")

# our spatial augmentation already interpolates seg with order 0 (the thing
# the reference's DASegOrd0 variants change), so these are behavioral aliases
NNUNetTrainer_DASegOrd0 = type("NNUNetTrainer_DASegOrd0", (NNUNetTrainer,), {})
NNUNetTrainer_DASegOrd0_NoMirroring = type(
    "NNUNetTrainer_DASegOrd0_NoMirroring", (NNUNetTrainerNoMirroring,), {})
NNUNetTrainer_onlyMirror01_DASegOrd0 = type(
    "NNUNetTrainer_onlyMirror01_DASegOrd0", (NNUNetTrainer_onlyMirror01,), {})
NNUNetTrainer_noDummy2DDA = type(
    "NNUNetTrainer_noDummy2DDA", (NNUNetTrainerNoDummy2D,), {})


class NNUNetTrainerDA5ord0(NNUNetTrainerDA5):
    """DA5 with order-0 spatial resampling for BOTH data and seg (ref
    nnUNetTrainerDA5ord0:461-513: order_data=0, order_seg=0)."""

    def _make_training_transform(self, patch_size, rotation, mirror_axes, dummy_2d,
                                 lm, ds_scales):
        aug = super()._make_training_transform(patch_size, rotation, mirror_axes,
                                               dummy_2d, lm, ds_scales)
        aug.spatial_data_order = aug.data_order = 0
        aug.seg_order = 0
        return aug


class NNUNetTrainerDA5Segord0(NNUNetTrainerDA5):
    """DA5 with order-0 SEG resampling only (ref nnUNetTrainerDA5Segord0:
    688-780: order_data stays 3, order_seg=0)."""

    def _make_training_transform(self, patch_size, rotation, mirror_axes, dummy_2d,
                                 lm, ds_scales):
        aug = super()._make_training_transform(patch_size, rotation, mirror_axes,
                                               dummy_2d, lm, ds_scales)
        aug.seg_order = 0
        return aug


class NNUNetTrainer_onlyMirror01_DA5(NNUNetTrainerDA5):
    """DA5 pipeline with mirroring restricted to axes (0, 1)
    (ref variants/data_augmentation/nnUNetTrainerDA5.py onlyMirror01_DA5)."""

    def _make_training_transform(self, patch_size, rotation, mirror_axes, dummy_2d,
                                 lm, ds_scales):
        self.inference_allowed_mirroring_axes = (0, 1)
        return super()._make_training_transform(patch_size, rotation, (0, 1),
                                                dummy_2d, lm, ds_scales)


class NNUNetTrainerTopk10LossLS01(_LossOverrideTrainer):
    """TopK-10 CE with label smoothing 0.1 (ref variants/loss/
    nnUNetTrainerTopkLoss.py:30-37)."""
    loss_kind = "topk10_ls01"


class NNUNetTrainerDiceCELoss_noSmooth(_LossOverrideTrainer):
    """DC+CE with dice smooth term 0 (ref variants/loss/
    nnUNetTrainerDiceCELoss_noSmooth.py)."""
    loss_kind = "dc_ce_nosmooth"


# reference nnUNetTrainerAdam is AdamW(amsgrad=True); VanillaAdam is plain
# Adam — both on the poly schedule of self.initial_lr (ref variants/optimizer/
# nnUNetTrainerAdam.py:8-60)
class NNUNetTrainerVanillaAdam(NNUNetTrainer):
    def configure_optimizer(self, total_steps: int):
        import optax
        return optax.chain(
            optax.clip_by_global_norm(12.0),
            optax.adam(poly_lr_jax(self.initial_lr, total_steps)))


class NNUNetTrainerVanillaAdam1en3(NNUNetTrainerVanillaAdam):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.initial_lr = 1e-3


class NNUNetTrainerVanillaAdam3en4(NNUNetTrainerVanillaAdam):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.initial_lr = 3e-4


class NNUNetTrainerAdam1en3(NNUNetTrainerAdam):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.initial_lr = 1e-3


class NNUNetTrainerAdam3en4(NNUNetTrainerAdam):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.initial_lr = 3e-4


class NNUNetTrainerAdanCosAnneal(NNUNetTrainerAdan):
    """Adan + cosine annealing (ref nnUNetTrainerAdan.py:49)."""

    def configure_optimizer(self, total_steps: int):
        import optax
        from .schedules import linear_warmup_cosine
        return optax.chain(
            optax.clip_by_global_norm(12.0),
            optax.adan(linear_warmup_cosine(self.initial_lr, total_steps, 0),
                       weight_decay=self.weight_decay))


class NNUNetTrainerBN(NNUNetTrainer):
    """BatchNorm instead of InstanceNorm (ref variants/network_architecture/
    nnUNetTrainerBN.py:8-35 swaps norm_op to the matching BatchNorm class).
    BatchStatsNorm keeps torch-parity running averages in a mutable
    batch_stats collection: the jitted train step threads it through
    TrainState.params (see train_step.split_trainable), checkpoints carry it,
    and eval/inference normalizes with the stored running statistics."""

    def build_network_architecture(self):
        import copy
        from ..models.factory import build_network_from_arch_dict
        arch = copy.deepcopy(
            self.configuration_manager.configuration["architecture"])
        kw = arch.get("arch_kwargs", arch)
        if "norm_op" not in kw:
            raise RuntimeError("'norm_op' not found in arch kwargs — this does "
                               "not look like a default nnU-Net architecture")
        kw["norm_op"] = "torch.nn.modules.batchnorm.BatchNorm3d"
        kw["norm_op_kwargs"] = {"eps": 1e-5, "affine": True}
        return build_network_from_arch_dict(
            arch, self.num_input_channels,
            self.label_manager.num_segmentation_heads,
            dtype=self.compute_dtype)
