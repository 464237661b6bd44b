"""Knowledge-distillation trainer — Fast-nnUNet's novel module.

Parity target: distillation/nnunetv2/training/nnUNetTrainer/variants/
nnUNetDistillationTrainer.py:295-1200. Loads a frozen N-fold teacher ensemble,
builds a width-reduced Lite student (max(f//r, 8) features, ResEnc block
strategies), and trains with

    total = (1 - alpha) * seg_loss + alpha * KL(student/T || mean_teacher/T) * T^2

with the teacher ensemble's highest-resolution logits averaged per step
(ref :760-857) and optional training-data fold rotation (ref :458-522).

TPU design differences (improvements, same math):
- teacher folds are STACKED params reduced with a lax.scan *inside* the jitted
  train step — one fused step instead of the reference's N sequential
  synchronized teacher forwards per iteration (SURVEY §7 step 7)
- teachers run in the same bf16 compute dtype as the student by default; the KL
  is computed in fp32 (the reference forces fp32 teachers, ref :589-601)
"""
from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.factory import build_network_from_arch_dict, get_network_from_plans
from ..models.students import build_student_arch_kwargs
from ..core.plans import PlansManager
from ..utils.io import isfile, join, load_json, subdirs
from .checkpoint import load_checkpoint as load_ckpt_file
from .checkpoint import restore_params, restore_params_partial, save_checkpoint
from .losses import deep_supervision_weights, deep_supervised_loss
from .train_step import (TrainState, create_train_state, make_loss_fn,
                         split_trainable)
from .trainer import NNUNetTrainer


def distillation_loss(student_logits, teacher_logits, temperature: float):
    """KL(softmax(t/T) || softmax(s/T)) * T^2, mean over ALL elements (torch
    F.kl_div(log_student, teacher_probs, reduction='mean') parity, ref :277-293)."""
    s = student_logits.astype(jnp.float32) / temperature
    t = teacher_logits.astype(jnp.float32) / temperature
    log_ps = jax.nn.log_softmax(s, axis=-1)
    pt = jax.nn.softmax(t, axis=-1)
    log_pt = jax.nn.log_softmax(t, axis=-1)
    kl_elem = pt * (log_pt - log_ps)
    return kl_elem.mean() * (temperature ** 2)


def make_distill_train_step(student_net, teacher_net, optimizer, *,
                            alpha: float, temperature: float,
                            has_regions: bool = False, has_ignore: bool = False,
                            ignore_label: Optional[int] = None,
                            batch_dice: bool = False, n_ds_levels: int = 1,
                            n_teachers: int = 1, compute_dtype=jnp.bfloat16):
    """step(state, teacher_params_stacked, data, targets) ->
    (state, total, seg_loss, distill_loss)."""
    base_loss = make_loss_fn(has_regions=has_regions, has_ignore=has_ignore,
                             ignore_label=ignore_label, batch_dice=batch_dice)
    ds_w = tuple(deep_supervision_weights(n_ds_levels).tolist()) \
        if n_ds_levels > 1 else (1.0,)

    def teacher_forward(teacher_stacked, data):
        def one(params):
            out = teacher_net.apply(params, data.astype(compute_dtype),
                                    deep_supervision=False)
            return out.astype(jnp.float32)

        if n_teachers == 1:
            return one(jax.tree_util.tree_map(lambda a: a[0], teacher_stacked))

        def body(carry, params):
            return carry + one(params), None

        first = one(jax.tree_util.tree_map(lambda a: a[0], teacher_stacked))
        rest = jax.tree_util.tree_map(lambda a: a[1:], teacher_stacked)
        total, _ = jax.lax.scan(body, first, rest)
        return total / n_teachers

    def loss_of(trainable, aux, teacher_stacked, data, targets):
        if aux:  # batch_stats student: train-mode apply, collect updated stats
            outputs, new_aux = student_net.apply(
                {**trainable, **aux}, data.astype(compute_dtype),
                deep_supervision=n_ds_levels > 1, mutable=list(aux.keys()))
        else:
            outputs = student_net.apply(trainable, data.astype(compute_dtype),
                                        deep_supervision=n_ds_levels > 1)
            new_aux = aux
        if n_ds_levels == 1:
            outputs = (outputs,)
        seg_loss = deep_supervised_loss(base_loss, outputs, targets, ds_w)
        teacher_logits = jax.lax.stop_gradient(
            teacher_forward(teacher_stacked, data))
        dloss = distillation_loss(outputs[0], teacher_logits, temperature)
        total = (1.0 - alpha) * seg_loss + alpha * dloss
        return total, (seg_loss, dloss, new_aux)

    def step(state: TrainState, teacher_stacked, data, targets):
        trainable, aux = split_trainable(state.params)
        (total, (seg_loss, dloss, new_aux)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(trainable, aux, teacher_stacked, data, targets)
        updates, new_opt = optimizer.update(grads, state.opt_state, trainable)
        new_params = {**optax.apply_updates(trainable, updates), **new_aux}
        return (TrainState(step=state.step + 1, params=new_params,
                           opt_state=new_opt), total, seg_loss, dloss)

    return step


class NNUNetDistillationTrainer(NNUNetTrainer):
    def __init__(self, plans, configuration: str, fold: int, dataset_json: dict,
                 device=None,
                 teacher_model_folder: Optional[str] = None,
                 teacher_fold: Union[int, Sequence[int]] = (0, 1, 2, 3, 4),
                 teacher_checkpoint_name: str = "checkpoint_final.fnnx",
                 alpha: float = 0.3, temperature: float = 3.0,
                 feature_reduction_factor: int = 2,
                 block_reduction_strategy: str = "reduce",
                 rotate_training_folds: bool = False,
                 rotate_folds_frequency: int = 50,
                 student_plans_identifier: str = "nnUNetPlans"):
        super().__init__(plans, configuration, fold, dataset_json, device)
        self.teacher_model_folder = teacher_model_folder
        self.teacher_fold = list(teacher_fold) if isinstance(
            teacher_fold, (list, tuple)) else [teacher_fold]
        self.teacher_checkpoint_name = teacher_checkpoint_name
        self.alpha = alpha
        self.temperature = temperature
        self.feature_reduction_factor = feature_reduction_factor
        self.block_reduction_strategy = block_reduction_strategy
        self.rotate_training_folds = rotate_training_folds
        self.rotate_folds_frequency = rotate_folds_frequency
        self.initial_fold = fold
        self.all_available_folds = None
        self.fold_rotation_counter = 0
        self.student_plans_identifier = student_plans_identifier

        self.teacher_network = None
        self.teacher_params_stacked = None
        self.logger.logging.setdefault("train_seg_losses", [])
        self.logger.logging.setdefault("train_distill_losses", [])

    # ------------------------------------------------------------------ student
    def build_network_architecture(self):
        arch = self.configuration_manager.configuration["architecture"]
        student_kwargs = build_student_arch_kwargs(
            arch["arch_kwargs"], self.feature_reduction_factor,
            self.block_reduction_strategy)
        return get_network_from_plans(
            arch["network_class_name"], student_kwargs, (),
            self.num_input_channels, self.label_manager.num_segmentation_heads,
            dtype=self.compute_dtype, remat=self._use_remat(),
            norm_onepass=True)

    # ------------------------------------------------------------------ teachers
    def load_teacher_model(self) -> None:
        if self.teacher_model_folder is None:
            raise ValueError("teacher_model_folder is not set")
        tm_plans_file = join(self.teacher_model_folder, "plans.json")
        teacher_plans = PlansManager(tm_plans_file)
        teacher_cfg = teacher_plans.get_configuration(self.configuration_name)
        # teachers run inside the jitted distill step (forward-only) — the
        # one-pass norm saves their full-res stats relayouts too; logits
        # shift ~1e-6 rel vs the serving form, harmless under softmax(T)
        self.teacher_network = build_network_from_arch_dict(
            teacher_cfg.configuration["architecture"], self.num_input_channels,
            self.label_manager.num_segmentation_heads, dtype=self.compute_dtype,
            norm_onepass=True)

        patch = tuple(self.configuration_manager.patch_size)
        example = jnp.zeros((1, *patch, self.num_input_channels))
        template = self.teacher_network.init(jax.random.PRNGKey(0), example,
                                             deep_supervision=False)
        template = jax.device_get(template)

        fold_params = []
        for f in self.teacher_fold:
            ckpt_path = join(self.teacher_model_folder, f"fold_{f}",
                             self.teacher_checkpoint_name)
            if not isfile(ckpt_path):
                alt = join(self.teacher_model_folder, f"fold_{f}",
                           "checkpoint_best.fnnx")
                if isfile(alt):
                    ckpt_path = alt
                else:
                    raise FileNotFoundError(f"No teacher checkpoint for fold {f} "
                                            f"in {self.teacher_model_folder}")
            ckpt = load_ckpt_file(ckpt_path)
            fold_params.append(restore_params(template, ckpt["network_weights"]))
        self.teacher_params_stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *fold_params)
        self.print_to_log_file(
            f"Loaded {len(fold_params)} frozen teacher fold(s) "
            f"{self.teacher_fold} from {self.teacher_model_folder}")

    @staticmethod
    def detect_available_teacher_folds(teacher_model_folder: str,
                                       checkpoint_names=("checkpoint_final.fnnx",
                                                         "checkpoint_best.fnnx")
                                       ) -> List[int]:
        """Scan fold_* dirs containing a usable checkpoint
        (ref fast_nnunet_distillation_train.py:111-132)."""
        folds = []
        for d in subdirs(teacher_model_folder, prefix="fold_", join_path=False):
            try:
                f = int(d.split("_")[1])
            except (IndexError, ValueError):
                continue
            if any(isfile(join(teacher_model_folder, d, c))
                   for c in checkpoint_names):
                folds.append(f)
        return sorted(folds)

    # ------------------------------------------------------------------ setup
    def initialize(self) -> None:
        super().initialize()
        self.initialize_fold_rotation()
        self.load_teacher_model()

        n_ds = len(self._get_deep_supervision_scales() or [None])
        step = make_distill_train_step(
            self.network, self.teacher_network, self.optimizer,
            alpha=self.alpha, temperature=self.temperature,
            has_regions=self.label_manager.has_regions,
            has_ignore=self.label_manager.has_ignore_label,
            ignore_label=self.label_manager.ignore_label,
            batch_dice=self.configuration_manager.batch_dice,
            n_ds_levels=n_ds, n_teachers=len(self.teacher_fold),
            compute_dtype=self.compute_dtype)
        self._jit_distill_step = jax.jit(step, donate_argnums=(0,))
        self.print_to_log_file(
            f"Distillation: alpha={self.alpha} T={self.temperature} "
            f"r={self.feature_reduction_factor} "
            f"block_strategy={self.block_reduction_strategy} "
            f"teachers={self.teacher_fold}")

    def initialize_fold_rotation(self) -> None:
        if not self.rotate_training_folds:
            return
        split_file = join(self.preprocessed_dataset_folder_base, "splits_final.json")
        if not isfile(split_file):
            self.print_to_log_file("splits_final.json missing; fold rotation off")
            self.rotate_training_folds = False
            return
        self.all_available_folds = list(range(len(load_json(split_file))))
        self.print_to_log_file(
            f"Fold rotation over {self.all_available_folds} every "
            f"{self.rotate_folds_frequency} epochs")

    def update_fold_for_next_rotation(self) -> bool:
        """Rotate the student's *training data* fold on schedule (ref :481-522)."""
        if not self.rotate_training_folds or self.all_available_folds is None:
            return False
        if self.current_epoch == 0 or \
                (self.current_epoch % self.rotate_folds_frequency) != 0:
            return False
        idx = self.all_available_folds.index(self.fold)
        next_fold = self.all_available_folds[(idx + 1) % len(self.all_available_folds)]
        if self.fold_rotation_counter >= len(self.all_available_folds):
            next_fold = self.initial_fold
            self.fold_rotation_counter = 0
        if next_fold == self.fold:
            return False
        self.print_to_log_file(f"Rotating training fold {self.fold} -> {next_fold}")
        self.fold = next_fold
        self.fold_rotation_counter += 1
        if self.dataloader_train is not None:
            self.dataloader_train.shutdown()
            self.dataloader_val.shutdown()
        self.get_dataloaders()
        return True

    # ------------------------------------------------------------------ loop hooks
    def run_training(self) -> None:
        import time
        self.on_train_start()
        try:
            for epoch in range(self.current_epoch, self.num_epochs):
                self.update_fold_for_next_rotation()
                self.logger.log("epoch_start_timestamps", time.time(), epoch)
                totals, segs, dists = [], [], []
                for _ in range(self.num_iterations_per_epoch):
                    batch = next(self.dataloader_train)
                    data, targets = self._batch_to_device(batch)
                    self.train_state, total, seg_l, d_l = self._jit_distill_step(
                        self.train_state, self.teacher_params_stacked, data, targets)
                    totals.append(total)
                    segs.append(seg_l)
                    dists.append(d_l)
                self.logger.log("train_losses",
                                float(np.mean([float(x) for x in totals])), epoch)
                self.logger.logging["train_seg_losses"].append(
                    float(np.mean([float(x) for x in segs])))
                self.logger.logging["train_distill_losses"].append(
                    float(np.mean([float(x) for x in dists])))
                self.logger.log("lrs", self.initial_lr, epoch)

                val_losses, tps, fps, fns = [], [], [], []
                for _ in range(self.num_val_iterations_per_epoch):
                    batch = next(self.dataloader_val)
                    data, targets = self._batch_to_device(batch)
                    loss, tp, fp, fn = self._jit_val_step(
                        self.train_state.params, data, targets)
                    val_losses.append(float(loss))
                    tps.append(np.asarray(tp))
                    fps.append(np.asarray(fp))
                    fns.append(np.asarray(fn))
                self.on_validation_epoch_end(val_losses, tps, fps, fns, epoch)
                self.on_epoch_end(epoch)
                seg_m = self.logger.logging["train_seg_losses"][-1]
                d_m = self.logger.logging["train_distill_losses"][-1]
                self.print_to_log_file(
                    f"  seg_loss {seg_m:.4f}  distill_loss {d_m:.4f}")
        finally:
            self.on_train_end()

    # ------------------------------------------------------------------ ckpt
    def _init_args(self) -> dict:
        args = super()._init_args()
        args.update({
            "teacher_model_folder": self.teacher_model_folder,
            "teacher_fold": self.teacher_fold,
            "teacher_checkpoint_name": self.teacher_checkpoint_name,
            "alpha": self.alpha, "temperature": self.temperature,
            "feature_reduction_factor": self.feature_reduction_factor,
            "block_reduction_strategy": self.block_reduction_strategy,
            "rotate_training_folds": self.rotate_training_folds,
            "rotate_folds_frequency": self.rotate_folds_frequency,
            "student_plans_identifier": self.student_plans_identifier,
        })
        return args

    def load_student_checkpoint(self, filename: str) -> Tuple[int, int]:
        """Tolerant partial restore for continue-training across architecture
        tweaks; reports the compatibility ratio (ref :1008-1165)."""
        if not self.was_initialized:
            self.initialize()
        ckpt = load_ckpt_file(filename)
        params, n_loaded, n_total = restore_params_partial(
            jax.device_get(self.train_state.params), ckpt["network_weights"])
        from ..parallel.mesh import replicate
        params = replicate(self.mesh, params)
        self.train_state = TrainState(step=self.train_state.step, params=params,
                                      opt_state=self.train_state.opt_state)
        self.current_epoch = ckpt.get("current_epoch", 0)
        self._best_ema = ckpt.get("_best_ema")
        if ckpt.get("logging"):
            self.logger.load_checkpoint(ckpt["logging"])
        self.print_to_log_file(
            f"Partial checkpoint load: {n_loaded}/{n_total} tensors matched "
            f"({100.0 * n_loaded / max(n_total, 1):.1f}%)")
        return n_loaded, n_total


class NNUNetDistillationTrainerDA5(NNUNetDistillationTrainer):
    """Distillation with the DA5 strong-augmentation pipeline for small datasets
    (ref nnUNetDistillationTrainer.py:1168-1200; +2-5% robustness on <100 cases,
    docs/Distillation.md:294-299)."""

    def _make_training_transform(self, patch_size, rotation, mirror_axes, dummy_2d,
                                 lm, ds_scales):
        from .augment_da5 import DA5TrainingAugmenter
        return DA5TrainingAugmenter(
            patch_size, rotation, mirror_axes,
            use_mask_for_norm=self.configuration_manager.use_mask_for_norm,
            dummy_2d=dummy_2d,
            regions=lm.foreground_regions if lm.has_regions else None,
            ignore_label=lm.ignore_label, ds_scales=ds_scales)
