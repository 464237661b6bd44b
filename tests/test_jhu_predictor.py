"""JHU AbdomenAtlas benchmark output structure (ref distillation/nnunetv2/
inference/JHU_inference.py): per case a predictions/ folder with one binary
uint8 file per foreground class named by its label name."""
import numpy as np
import pytest

from fast_nnunet_tpu.core.plans import PlansManager
from fast_nnunet_tpu.imageio.nifti import read_nifti, write_nifti
from fast_nnunet_tpu.inference.jhu_predictor import JHUPredictor, jhu_predict_entry
from fast_nnunet_tpu.utils.io import isfile, join, maybe_mkdir_p

from .test_plans import make_plans


def _small_plans():
    plans = make_plans()
    cfg = plans["configurations"]["3d_fullres"]
    cfg["patch_size"] = [16, 16, 16]
    arch = cfg["architecture"]["arch_kwargs"]
    arch.update(n_stages=2, features_per_stage=[4, 8],
                kernel_sizes=[[3, 3, 3]] * 2,
                strides=[[1, 1, 1], [2, 2, 2]],
                n_conv_per_stage=[1, 1], n_conv_per_stage_decoder=[1])
    return plans


def _predictor():
    import jax
    import jax.numpy as jnp
    from fast_nnunet_tpu.models.factory import build_network_from_arch_dict

    plans = _small_plans()
    pm = PlansManager(plans)
    cfg = pm.get_configuration("3d_fullres")
    dataset_json = {"labels": {"background": 0, "liver": 1, "spleen": 2},
                    "file_ending": ".nii.gz",
                    "channel_names": {"0": "CT"}}
    net = build_network_from_arch_dict(
        cfg.configuration["architecture"], 1, 3, dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1)),
                      deep_supervision=False)
    p = JHUPredictor(use_mirroring=False, verbose=False)
    p.manual_initialization(net, pm, cfg, [params], dataset_json,
                            "NNUNetTrainer", ())
    return p


def test_jhu_class_file_structure(tmp_path):
    p = _predictor()
    img = (np.random.RandomState(0).rand(20, 18, 16) * 300).astype(np.float32)
    case_in = str(tmp_path / "in" / "caseA")
    maybe_mkdir_p(case_in)
    ct = join(case_in, "ct.nii.gz")
    write_nifti(ct, img, spacing=(1.0, 1.0, 1.0))
    out = str(tmp_path / "out" / "caseA")

    p.predict_cases_to_class_folders([[ct]], [out])

    for name in ("liver", "spleen"):
        f = join(out, "predictions", f"{name}.nii.gz")
        assert isfile(f), f"missing {f}"
        mask, _ = read_nifti(f)
        assert mask.shape == img.shape
        assert set(np.unique(mask)) <= {0, 1}
    # binary class files are disjoint (argmax semantics)
    liver, _ = read_nifti(join(out, "predictions", "liver.nii.gz"))
    spleen, _ = read_nifti(join(out, "predictions", "spleen.nii.gz"))
    assert not np.any(liver.astype(bool) & spleen.astype(bool))
