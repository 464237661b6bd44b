"""Deployable model export — the TPU analogue of the reference's ONNX/TensorRT
chain (ref distillation/fast_nnunet_distillation_export_onnx.py:56-604 and
fast_nnunet_resenc_distillation_export_onnx.py:81-785).

Where the reference emits ONNX (then trtexec compiles to a TensorRT engine), we
emit a **StableHLO artifact via jax.export**: a self-contained, version-stable
serialized computation (weights baked in) that any PJRT runtime (TPU, CPU, GPU)
can load without Python model code — plus a JSON metadata sidecar carrying the
full inference config (patch size, spacing, normalization, labels), which is
what the C++ engine and the fast-inference module consume (ref
inference/config/3d_fullres/sample_config.json and
engine/config/fast_nnunet_bone_turbo.ini).

The reference validates ONNX-vs-torch numerics after export; we do the same:
deserialize the artifact and compare against the native forward.
"""
import argparse
import json
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from ..core.plans import PlansManager
from ..core.labels import determine_num_input_channels
from ..training.checkpoint import load_checkpoint, restore_params
from ..utils.io import join, load_json, maybe_mkdir_p, save_json
from ..utils.misc import get_output_folder, maybe_convert_to_dataset_name


def export_model_folder_to_artifact(
        model_training_output_dir: str, fold, output_folder: str,
        checkpoint_name: str = "checkpoint_final.fnnx",
        batch_size: int = 8,
        validate: bool = True,
        dtype: str = "bfloat16",
        bake_mirroring: bool = False) -> str:
    """Export one fold of a trained model folder to
    <output_folder>/{model.stablehlo, model_config.json, weights.npz}."""
    import jax
    import jax.export as jexport
    import jax.numpy as jnp
    from ..models.factory import build_network_from_arch_dict, get_network_from_plans
    from ..models.students import build_student_arch_kwargs

    dataset_json = load_json(join(model_training_output_dir, "dataset.json"))
    plans_manager = PlansManager(join(model_training_output_dir, "plans.json"))
    ckpt = load_checkpoint(join(model_training_output_dir, f"fold_{fold}",
                                checkpoint_name))
    init_args = ckpt.get("init_args", {})
    configuration_name = init_args.get("configuration", "3d_fullres")
    cfg = plans_manager.get_configuration(configuration_name)
    label_manager = plans_manager.get_label_manager(dataset_json)
    num_in = determine_num_input_channels(plans_manager, cfg, dataset_json)
    num_out = label_manager.num_segmentation_heads
    compute_dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

    arch = cfg.configuration["architecture"]
    trainer_name = ckpt.get("trainer_name", "NNUNetTrainer")
    if "Distillation" in trainer_name:
        kwargs = build_student_arch_kwargs(
            arch["arch_kwargs"], init_args.get("feature_reduction_factor", 2),
            init_args.get("block_reduction_strategy", "reduce"))
        network = get_network_from_plans(arch["network_class_name"], kwargs, (),
                                         num_in, num_out, dtype=compute_dtype)
    else:
        network = build_network_from_arch_dict(arch, num_in, num_out,
                                               dtype=compute_dtype)

    patch = tuple(cfg.patch_size)
    template = jax.device_get(network.init(
        jax.random.PRNGKey(0), np.zeros((1, *patch, num_in), np.float32),
        deep_supervision=False))
    params = restore_params(template, ckpt["network_weights"])

    # bake weights in (like ONNX initializers): close over params
    mirror_axes = tuple(ckpt.get("inference_allowed_mirroring_axes") or []) \
        if bake_mirroring else ()

    def forward(x):
        if not mirror_axes:
            return network.apply(params, x, deep_supervision=False)
        # bake mirror-TTA into the artifact: flips-average inside the traced
        # computation, so PJRT consumers (the C++ engine) get test-time
        # mirroring without any native code
        import itertools
        import jax.numpy as jnp
        combos = [c for r in range(len(mirror_axes) + 1)
                  for c in itertools.combinations(mirror_axes, r)]
        acc = None
        for combo in combos:
            axes = tuple(a + 1 for a in combo)
            xin = jnp.flip(x, axes) if combo else x
            out = network.apply(params, xin, deep_supervision=False)
            out = jnp.flip(out, axes) if combo else out
            acc = out if acc is None else acc + out
        return acc / len(combos)

    in_shape = jax.ShapeDtypeStruct((batch_size, *patch, num_in), compute_dtype)
    exported = jexport.export(jax.jit(forward))(in_shape)
    blob = exported.serialize()

    maybe_mkdir_p(output_folder)
    artifact_path = join(output_folder, "model.stablehlo")
    with open(artifact_path, "wb") as f:
        f.write(blob)

    # raw StableHLO module bytecode alongside the jax.export blob: this is
    # what a bare PJRT runtime (libtpu / the C++ engine's pjrt_backend)
    # compiles directly via PJRT_Client_Compile(format="mlir") — the TPU
    # analogue of the reference handing its ONNX file to trtexec
    with open(join(output_folder, "model_pjrt.mlir"), "wb") as f:
        f.write(exported.mlir_module_serialized)

    # metadata sidecar: everything the native engine / inferencer needs
    norm_props = plans_manager.foreground_intensity_properties_per_channel
    meta = {
        "framework": "fast-nnunet-tpu",
        "artifact": "model.stablehlo",
        "pjrt_artifact": "model_pjrt.mlir",
        "input_layout": "B * spatial * C (channels-last)",
        "input_shape": [batch_size, *patch, num_in],
        "compute_dtype": dtype,
        "patch_size": list(patch),
        "target_spacing": cfg.spacing,
        "transpose_forward": plans_manager.transpose_forward,
        "transpose_backward": plans_manager.transpose_backward,
        "normalization_schemes": cfg.normalization_schemes,
        "intensity_properties": norm_props,
        "num_classes": num_out,
        "labels": dataset_json["labels"],
        "regions_class_order": dataset_json.get("regions_class_order"),
        "file_ending": dataset_json.get("file_ending", ".nii.gz"),
        "tile_step_size": 0.5,
        "use_gaussian": True,
        "use_mirroring": bool(mirror_axes),
        # True = flips-average already traced into the artifact: consumers
        # must NOT add their own test-time mirroring on top
        "mirroring_baked_into_artifact": bool(mirror_axes),
        "inference_allowed_mirroring_axes":
            list(ckpt.get("inference_allowed_mirroring_axes") or []),
        "trainer_name": trainer_name,
        "configuration": configuration_name,
        "fold": fold,
    }
    save_json(meta, join(output_folder, "model_config.json"), sort_keys=False)

    if validate:
        rel = validate_exported_artifact(artifact_path, forward,
                                         (batch_size, *patch, num_in),
                                         compute_dtype)
        print(f"Export validation: max relative deviation {rel:.2e}")
    print(f"Exported fold {fold} -> {artifact_path}")
    return artifact_path


def validate_exported_artifact(artifact_path: str, reference_fn,
                               input_shape: Sequence[int], compute_dtype) -> float:
    """Reload the artifact and compare against the native forward closure —
    including any baked-in mirror-TTA (the reference's onnxruntime parity
    check, ref export_onnx.py:476-503)."""
    import jax.export as jexport
    import jax.numpy as jnp

    with open(artifact_path, "rb") as f:
        restored = jexport.deserialize(f.read())
    x = (np.random.RandomState(0).rand(*input_shape).astype(np.float32) - 0.5)
    xa = jnp.asarray(x, compute_dtype)
    got = np.asarray(restored.call(xa), np.float32)
    want = np.asarray(reference_fn(xa), np.float32)
    denom = np.abs(want).max() + 1e-6
    rel = float(np.abs(got - want).max() / denom)
    if rel > 1e-2:
        raise RuntimeError(f"Exported artifact deviates from native forward "
                           f"(max rel {rel:.3e})")
    return rel


def export_entry():
    parser = argparse.ArgumentParser(
        description="export a trained (distilled) model to a StableHLO artifact")
    parser.add_argument("-d", required=True, help="dataset name or id")
    parser.add_argument("-f", type=int, default=0, help="fold")
    parser.add_argument("-c", default="3d_fullres")
    parser.add_argument("-tr", default="NNUNetDistillationTrainer")
    parser.add_argument("-p", default="nnUNetPlans")
    parser.add_argument("-o", default=None, help="output folder")
    parser.add_argument("-chk", default="checkpoint_final.fnnx")
    parser.add_argument("-b", type=int, default=8,
                        help="tile batch size baked into the artifact "
                             "(8 fills the MXU at distilled widths — the "
                             "measured 2.5x round-1 win; the Python and C++ "
                             "serving paths both read it from input_shape)")
    parser.add_argument("--no_validate", action="store_true")
    parser.add_argument("--tta", action="store_true",
                        help="bake mirror-TTA (flips-average over the "
                             "training mirror axes) into the artifact")
    args = parser.parse_args()
    model_folder = get_output_folder(args.d, args.tr, args.p, args.c)
    out = args.o or join(model_folder, f"fold_{args.f}", "export")
    export_model_folder_to_artifact(model_folder, args.f, out, args.chk, args.b,
                                    not args.no_validate,
                                    bake_mirroring=args.tta)


# reference CLI names (distillation/setup.py:11-18) map onto the same exporter
distillation_export_entry = export_entry
resenc_distillation_export_entry = export_entry
