"""Training-throughput benchmark on the real chip (round-4 VERDICT #2).

The reference ships benchmark trainers precisely to record epoch time per
device (ref distillation/nnunetv2/training/nnUNetTrainer/variants/benchmarking/
nnUNetTrainerBenchmark_5epochs.py:10-70 and the _noDataLoading variant that
feeds one cached batch to isolate device compute from the input pipeline).
This script runs OUR pair on a synthetic bone_turbo-scale dataset
(patch 160x96x96, 61 classes, batch 2, the full teacher-width PlainConvUNet
[32,64,128,256,320,320] — ref engine/config/fast_nnunet_bone_turbo.ini) and
records:

  - sec/epoch for NNUNetTrainerBenchmark_5epochs (full pipeline: host
    augmentation feed -> H2D -> jitted step) and _noDataLoading (cached
    device batch -> jitted step);
  - the feed-vs-compute attribution: the delta IS the input pipeline, plus a
    direct timing of PatchSampler.generate_batch on this host;
  - benchmark_result.json in each trainer's output folder (reference
    contract) and a combined JSON on stdout.

Box caveats recorded with the numbers: this dev box has ONE contended CPU
core (production training hosts have dozens), and H2D rides the dev tunnel
at 15-40 MB/s (production PCIe/ICI is ~3 orders faster). The noDataLoading
number is the clean device-throughput figure; the feed delta bounds how many
DA workers a production host needs to keep the chip fed.

Usage (TPU):
    python experiments/bench_train.py [--iters 250] [--val_iters 50]
        [--feed_iters 25] [--epochs 5] [--cases 4] [--out results.json]
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BONE_TURBO_TEACHER_ARCH = {
    "network_class_name":
        "dynamic_network_architectures.architectures.unet.PlainConvUNet",
    "arch_kwargs": {
        "n_stages": 6,
        "features_per_stage": [32, 64, 128, 256, 320, 320],
        "conv_op": "torch.nn.modules.conv.Conv3d",
        "kernel_sizes": [[3, 3, 3]] * 6,
        "strides": [[1, 1, 1]] + [[2, 2, 2]] * 5,
        "n_conv_per_stage": [2] * 6,
        "n_conv_per_stage_decoder": [2] * 5,
        "conv_bias": True,
        "norm_op": "torch.nn.modules.instancenorm.InstanceNorm3d",
        "norm_op_kwargs": {"eps": 1e-5, "affine": True},
        "dropout_op": None, "dropout_op_kwargs": None,
        "nonlin": "torch.nn.LeakyReLU", "nonlin_kwargs": {"inplace": True},
    },
    "_kw_requires_import": ["conv_op", "norm_op", "dropout_op", "nonlin"],
}

N_CLASSES = 61  # incl. background (bone_turbo num_class=61)
PATCH = [160, 96, 96]
CASE_SHAPE = (200, 140, 140)


def _apply_tiny():
    """CPU smoke config: validates the harness end-to-end in seconds."""
    global N_CLASSES, PATCH, CASE_SHAPE
    N_CLASSES = 3
    PATCH = [16, 16, 16]
    CASE_SHAPE = (24, 20, 20)
    BONE_TURBO_TEACHER_ARCH["arch_kwargs"].update(
        n_stages=3, features_per_stage=[8, 16, 32],
        kernel_sizes=[[3, 3, 3]] * 3,
        strides=[[1, 1, 1]] + [[2, 2, 2]] * 2,
        n_conv_per_stage=[2] * 3, n_conv_per_stage_decoder=[2] * 2)


def build_dataset(pre_root: str, ds_name: str, n_cases: int, seed: int = 0):
    """Write preprocessed bone_turbo-scale cases directly (the benchmark
    measures the trainer hot loop, not the preprocessor)."""
    from fast_nnunet_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from fast_nnunet_tpu.training.dataset import NpyCaseDataset
    from fast_nnunet_tpu.utils.io import maybe_mkdir_p, join

    folder = join(pre_root, ds_name, "nnUNetPlans_3d_fullres")
    maybe_mkdir_p(folder)
    rng = np.random.RandomState(seed)
    for i in range(n_cases):
        data = rng.randn(1, *CASE_SHAPE).astype(np.float32)
        seg = np.zeros((1, *CASE_SHAPE), np.int8)
        # one random cuboid per foreground class; data correlates with the
        # label so the loss has structure to fit
        for c in range(1, N_CLASSES):
            sz = rng.randint(6, 16, size=3)
            lo = [rng.randint(0, CASE_SHAPE[d] - sz[d]) for d in range(3)]
            sl = (0,) + tuple(slice(lo[d], lo[d] + sz[d]) for d in range(3))
            seg[sl] = c
            data[sl] += 0.05 * c
        props = {
            "class_locations": DefaultPreprocessor._sample_foreground_locations(
                seg, list(range(1, N_CLASSES))),
            "spacing": [2.0, 0.9765625, 0.9765625],
        }
        NpyCaseDataset.save_case(data, seg, props, join(folder, f"case_{i:03d}"))
    return folder


def build_plans(ds_name: str) -> dict:
    return {
        "dataset_name": ds_name,
        "plans_name": "nnUNetPlans",
        "original_median_spacing_after_transp": [2.0, 0.9765625, 0.9765625],
        "original_median_shape_after_transp": list(CASE_SHAPE),
        "image_reader_writer": "NiftiIO",
        "transpose_forward": [0, 1, 2],
        "transpose_backward": [0, 1, 2],
        "configurations": {
            "3d_fullres": {
                "data_identifier": "nnUNetPlans_3d_fullres",
                "preprocessor_name": "DefaultPreprocessor",
                "batch_size": 2,
                "patch_size": PATCH,
                "median_image_size_in_voxels": list(CASE_SHAPE),
                "spacing": [2.0, 0.9765625, 0.9765625],
                "normalization_schemes": ["CTNormalization"],
                "use_mask_for_norm": [False],
                "resampling_fn_data": "resample_data_or_seg_to_shape",
                "resampling_fn_data_kwargs": {
                    "is_seg": False, "order": 3, "order_z": 0,
                    "force_separate_z": None},
                "resampling_fn_seg": "resample_data_or_seg_to_shape",
                "resampling_fn_seg_kwargs": {
                    "is_seg": True, "order": 1, "order_z": 0,
                    "force_separate_z": None},
                "resampling_fn_probabilities": "resample_data_or_seg_to_shape",
                "resampling_fn_probabilities_kwargs": {
                    "is_seg": False, "order": 1, "order_z": 0,
                    "force_separate_z": None},
                "architecture": BONE_TURBO_TEACHER_ARCH,
                "batch_dice": False,
            },
        },
    }


def build_dataset_json(ds_name: str, n_cases: int) -> dict:
    return {
        "name": ds_name,
        "labels": {"background": 0,
                   **{f"struct_{c}": c for c in range(1, N_CLASSES)}},
        "numTraining": n_cases,
        "file_ending": ".nii.gz",
        "channel_names": {"0": "CT"},
    }


def time_host_batch(trainer, n: int = 3) -> float:
    """Direct cost of one augmented batch on this host (generate_batch runs
    the full transform pipeline in-process)."""
    sampler = getattr(trainer.dataloader_train, "sampler", None)
    if sampler is None:
        return float("nan")
    rng = np.random.RandomState(99)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sampler.generate_batch(rng)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def run_variant(name: str, plans, dataset_json, iters: int, val_iters: int,
                epochs: int, trace_dir: str = None):
    os.environ["FNNT_ITERS_PER_EPOCH"] = str(iters)
    os.environ["FNNT_VAL_ITERS_PER_EPOCH"] = str(val_iters)
    from fast_nnunet_tpu.run.run_training import find_trainer_class
    cls = find_trainer_class(name)
    trainer = cls(plans, "3d_fullres", 0, dataset_json)
    trainer.num_epochs = epochs

    import jax
    t0 = time.perf_counter()
    if trace_dir:
        # trace epoch 2 only: steady state, post-compile
        orig_epoch_hook = trainer.logger.log

        def hooked(key, value, epoch):
            if key == "epoch_start_timestamps" and epoch == 2:
                jax.profiler.start_trace(trace_dir)
            if key == "epoch_end_timestamps" and epoch == 2:
                try:
                    jax.profiler.stop_trace()
                except RuntimeError:
                    pass
            return orig_epoch_hook(key, value, epoch)

        trainer.logger.log = hooked
    trainer.run_training()
    wall = time.perf_counter() - t0

    starts = trainer.logger.logging["epoch_start_timestamps"]
    ends = trainer.logger.logging["epoch_end_timestamps"]
    times = [e - s for s, e in zip(starts, ends) if s and e]
    host_batch = time_host_batch(trainer) if "noDataLoading" not in name else None
    # free the feed threads before the next variant starts
    for dl in (trainer.dataloader_train, trainer.dataloader_val):
        if dl is not None and hasattr(dl, "shutdown"):
            dl.shutdown()
    return {
        "trainer": name,
        "epoch_times": [round(t, 3) for t in times],
        "fastest_epoch_s": round(float(np.min(times)), 3) if times else None,
        "total_wall_s": round(wall, 2),
        "iters_per_epoch": iters,
        "val_iters_per_epoch": val_iters,
        "sec_per_train_iter_fastest": round(float(np.min(times)) / (iters + val_iters), 4)
        if times else None,
        "host_batch_median_s": round(host_batch, 3) if host_batch else None,
        "output_folder": trainer.output_folder,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=250,
                    help="train iters/epoch for the noDataLoading variant "
                         "(reference contract: 250)")
    ap.add_argument("--val_iters", type=int, default=50)
    ap.add_argument("--feed_iters", type=int, default=25,
                    help="train iters/epoch for the host-fed variant (this "
                         "box has 1 core; sec/iter extrapolates)")
    ap.add_argument("--feed_val_iters", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--cases", type=int, default=4)
    ap.add_argument("--variant", choices=["both", "feed", "nodata"],
                    default="both")
    ap.add_argument("--out", default="experiments/bench_train_result.json")
    ap.add_argument("--trace_dir", default=None,
                    help="jax.profiler trace dir for epoch 2 of noDataLoading")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU-safe smoke config (tiny shapes)")
    args = ap.parse_args()

    import jax
    if args.tiny:
        _apply_tiny()
        if os.environ.get("JAX_PLATFORMS"):
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    root = tempfile.mkdtemp(prefix="fnn_train_bench_")
    ds_name = "Dataset987_TrainBench"
    for sub in ("raw", "preprocessed", "results"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    os.environ["nnUNet_raw"] = os.path.join(root, "raw")
    os.environ["nnUNet_preprocessed"] = os.path.join(root, "preprocessed")
    os.environ["nnUNet_results"] = os.path.join(root, "results")

    print(f"[bench_train] building {args.cases} synthetic preprocessed cases "
          f"({CASE_SHAPE}, {N_CLASSES} classes) ...", flush=True)
    build_dataset(os.environ["nnUNet_preprocessed"], ds_name, args.cases)
    plans = build_plans(ds_name)
    dataset_json = build_dataset_json(ds_name, args.cases)

    results = {"devices": [str(d) for d in jax.devices()],
               "backend": jax.default_backend(),
               "patch_size": PATCH, "num_classes": N_CLASSES,
               "batch_size": 2, "host_cores": os.cpu_count(),
               "variants": []}

    if args.variant in ("both", "nodata"):
        print("[bench_train] NNUNetTrainerBenchmark_5epochs_noDataLoading "
              f"({args.iters}+{args.val_iters} iters x {args.epochs} epochs)",
              flush=True)
        r = run_variant("NNUNetTrainerBenchmark_5epochs_noDataLoading", plans,
                        dataset_json, args.iters, args.val_iters, args.epochs,
                        trace_dir=args.trace_dir)
        results["variants"].append(r)
        print(json.dumps(r, indent=1), flush=True)

    if args.variant in ("both", "feed"):
        print("[bench_train] NNUNetTrainerBenchmark_5epochs (host-fed, "
              f"{args.feed_iters}+{args.feed_val_iters} iters x {args.epochs} "
              "epochs)", flush=True)
        r = run_variant("NNUNetTrainerBenchmark_5epochs", plans, dataset_json,
                        args.feed_iters, args.feed_val_iters, args.epochs)
        results["variants"].append(r)
        print(json.dumps(r, indent=1), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[bench_train] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
