"""Training entry point (nnUNetv2_train parity, ref distillation/nnunetv2/run/
run_training.py:32-268). No mp.spawn/NCCL: multi-device data parallelism is a
mesh inside one process (single-controller JAX); multi-host training is
multi-controller JAX — every host runs this same command with -num_hosts /
-coordinator / -process_id (or TPU-pod auto-detection), jax.distributed wires
the hosts, the mesh spans all global devices, and each host loads its shard of
the global batch (parallel/distributed.py)."""
import argparse
import importlib
from typing import Optional, Union

import jax

from ..training.trainer import NNUNetTrainer
from ..utils.io import isfile, join, load_json
from ..utils.misc import maybe_convert_to_dataset_name

TRAINER_REGISTRY = {}


def register_trainer(cls):
    TRAINER_REGISTRY[cls.__name__] = cls
    return cls


def find_trainer_class(name: str):
    """Resolve a trainer class by name — OUR spelling (`NNUNetTrainer*`) or
    the reference's (`nnUNetTrainer*`, `nnUNetDistillationTrainer*`; ref
    distillation/nnunetv2/run/run_training.py:214-268), so every reference
    `-tr <name>` command line is drop-in."""
    from ..training import trainer as _t
    from ..training import distill as _d
    from ..training import trainer_variants as _v
    from ..training import primus_trainers as _p
    from ..utils.misc import trainer_spelling_variants
    for cand in trainer_spelling_variants(name):
        if cand in TRAINER_REGISTRY:
            return TRAINER_REGISTRY[cand]
        for mod in (_t, _d, _v, _p):
            if hasattr(mod, cand):
                return getattr(mod, cand)
    raise RuntimeError(f"Unknown trainer class {name}")


def get_trainer_from_args(dataset_name_or_id, configuration: str, fold,
                          trainer_name: str = "NNUNetTrainer",
                          plans_identifier: str = "nnUNetPlans",
                          **trainer_kwargs) -> NNUNetTrainer:
    from ..paths import get_preprocessed_folder
    dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)
    preprocessed = join(get_preprocessed_folder(), dataset_name)
    plans_file = join(preprocessed, plans_identifier + ".json")
    assert isfile(plans_file), (
        f"Plans missing: {plans_file}. Run plan_and_preprocess first.")
    plans = load_json(plans_file)
    dataset_json = load_json(join(preprocessed, "dataset.json"))
    trainer_class = find_trainer_class(trainer_name)
    return trainer_class(plans=plans, configuration=configuration, fold=fold,
                         dataset_json=dataset_json, **trainer_kwargs)


def maybe_load_checkpoint(trainer: NNUNetTrainer, continue_training: bool,
                          validation_only: bool,
                          val_best: bool = False) -> None:
    """checkpoint_final -> latest -> best, same precedence as the reference
    (run_training.py:70-98); --val_best validates the best-EMA checkpoint
    instead (ref :84-90)."""
    if not (continue_training or validation_only):
        return
    expected = None
    names = ("checkpoint_best.fnnx",) if val_best and validation_only else \
        ("checkpoint_final.fnnx", "checkpoint_latest.fnnx",
         "checkpoint_best.fnnx")
    for name in names:
        if isfile(join(trainer.output_folder, name)):
            expected = join(trainer.output_folder, name)
            break
    if expected is None:
        if validation_only:
            raise RuntimeError("Cannot run validation: no checkpoint found in "
                               f"{trainer.output_folder}")
        print("No checkpoint found, starting fresh.")
        return
    trainer.load_checkpoint(expected)


def load_pretrained_weights(trainer: NNUNetTrainer, fname: str,
                            verbose: bool = False) -> None:
    """Transfer weights from a pretrained checkpoint before training: matching
    is by (translated) name + shape and segmentation heads are skipped, like
    the reference (run/load_pretrained_weights.py:7-69). Accepts both torch
    .pth checkpoints (translated via utils.torch_import) and our .fnnx."""
    from ..parallel.mesh import replicate
    from ..training.checkpoint import load_checkpoint as load_fnnx
    from ..training.checkpoint import restore_params_partial
    from ..training.train_step import TrainState

    if not trainer.was_initialized:
        trainer.initialize()
    template = jax.device_get(trainer.train_state.params)
    if fname.endswith((".fnnx", ".pkl")):
        ckpt = load_fnnx(fname)
        params, n_loaded, n_total = restore_params_partial(
            template, ckpt["network_weights"])
        print(f"Pretrained weights: {n_loaded}/{n_total} tensors matched")
    else:
        from ..utils.torch_import import (import_torch_weights,
                                          load_torch_network_weights)
        sd = load_torch_network_weights(fname)
        params, report = import_torch_weights(template, sd,
                                              skip_seg_layers=True)
        print(f"Pretrained torch weights: {len(report['converted'])} converted, "
              f"{len(report['skipped_seg'])} seg layers skipped, "
              f"{len(report['unmatched'])} unmatched, "
              f"{len(report['shape_mismatch'])} shape mismatches")
        if verbose and report["unmatched"]:
            print("unmatched:", report["unmatched"])
    trainer.train_state = TrainState(
        step=trainer.train_state.step,
        params=replicate(trainer.mesh, params),
        opt_state=trainer.train_state.opt_state)


def run_training(dataset_name_or_id, configuration: str, fold,
                 trainer_name: str = "NNUNetTrainer",
                 plans_identifier: str = "nnUNetPlans",
                 pretrained_weights: str = None,
                 continue_training: bool = False,
                 only_run_validation: bool = False,
                 disable_checkpointing: bool = False,
                 val_best: bool = False,
                 export_validation_probabilities: bool = False,
                 num_hosts: int = 1,
                 coordinator_address: str = None,
                 process_id: int = None,
                 **trainer_kwargs):
    if num_hosts > 1 or coordinator_address is not None:
        # multi-controller JAX: every host runs this same command with its own
        # -process_id; the mesh then spans all global devices and each host
        # loads its shard of the global batch (the TPU answer to the
        # reference's mp.spawn+NCCL, ref run/run_training.py:101-113). On TPU
        # pods with cluster auto-detection, all three args may be omitted.
        from ..parallel.distributed import initialize_distributed
        initialize_distributed(coordinator_address=coordinator_address,
                               num_processes=num_hosts if num_hosts > 1 else None,
                               process_id=process_id)
    if fold != "all":
        fold = int(fold)
    trainer = get_trainer_from_args(dataset_name_or_id, configuration, fold,
                                    trainer_name, plans_identifier,
                                    **trainer_kwargs)
    trainer.disable_checkpointing = disable_checkpointing
    if pretrained_weights is not None:
        if continue_training:
            raise RuntimeError("-pretrained_weights and --c are mutually "
                               "exclusive (same as the reference CLI)")
        load_pretrained_weights(trainer, pretrained_weights)
    maybe_load_checkpoint(trainer, continue_training, only_run_validation,
                          val_best)
    if not only_run_validation:
        trainer.run_training()
    trainer.perform_actual_validation(export_validation_probabilities)
    return trainer


def run_training_entry():
    parser = argparse.ArgumentParser(description="fast-nnunet-tpu training")
    parser.add_argument("dataset_name_or_id")
    parser.add_argument("configuration")
    parser.add_argument("fold", help="0..4 or 'all'")
    parser.add_argument("-tr", default="NNUNetTrainer")
    parser.add_argument("-p", default="nnUNetPlans")
    parser.add_argument("-pretrained_weights", default=None,
                        help="checkpoint to transfer weights from before "
                             "training (torch .pth or our .fnnx); seg heads "
                             "are skipped for .pth")
    parser.add_argument("--c", action="store_true", dest="continue_training")
    parser.add_argument("--val", action="store_true", dest="validation_only")
    parser.add_argument("--npz", action="store_true",
                        help="export validation probabilities")
    parser.add_argument("--val_best", action="store_true",
                        help="with --val: validate checkpoint_best instead of "
                             "final/latest (ref run_training.py:239-243)")
    parser.add_argument("--disable_checkpointing", action="store_true",
                        help="do not write any checkpoints (benchmarking)")
    parser.add_argument("-device", default="tpu",
                        help="accepted for CLI parity (tpu|cpu); set "
                             "JAX_PLATFORMS to actually switch backends")
    parser.add_argument("-num_gpus", type=int, default=1,
                        help="accepted for CLI parity; the mesh uses all visible "
                             "devices automatically")
    parser.add_argument("-num_hosts", type=int, default=1,
                        help="multi-host training: number of participating "
                             "hosts (each runs this command with its own "
                             "-process_id)")
    parser.add_argument("-coordinator", default=None,
                        help="host:port of process 0's jax.distributed "
                             "coordinator (omit on TPU pods with cluster "
                             "auto-detection)")
    parser.add_argument("-process_id", type=int, default=None,
                        help="this host's rank in [0, num_hosts)")
    args = parser.parse_args()
    run_training(args.dataset_name_or_id, args.configuration, args.fold,
                 trainer_name=args.tr, plans_identifier=args.p,
                 pretrained_weights=args.pretrained_weights,
                 continue_training=args.continue_training,
                 only_run_validation=args.validation_only,
                 disable_checkpointing=args.disable_checkpointing,
                 val_best=args.val_best,
                 export_validation_probabilities=args.npz,
                 num_hosts=args.num_hosts,
                 coordinator_address=args.coordinator,
                 process_id=args.process_id)


if __name__ == "__main__":
    run_training_entry()
