import os

import numpy as np
import pytest

from fast_nnunet_tpu.planning.topology import (get_pool_and_conv_props,
                                               pad_shape_to_divisible)

from .helpers import make_synthetic_dataset, set_nnunet_paths


def test_topology_isotropic_128():
    num_pool, strides, kernels, patch, must_div = get_pool_and_conv_props(
        (1.0, 1.0, 1.0), (128, 128, 128), 4, 999999)
    assert num_pool == [5, 5, 5]
    assert patch == (128, 128, 128)
    assert strides == ((1, 1, 1),) + ((2, 2, 2),) * 5
    assert len(kernels) == 6
    assert all(k == (3, 3, 3) for k in kernels)
    np.testing.assert_array_equal(must_div, [32, 32, 32])


def test_topology_anisotropic():
    # thick-slice CT: z pools less, kernel starts at 1 on z until near-isotropy
    num_pool, strides, kernels, patch, _ = get_pool_and_conv_props(
        (5.0, 1.0, 1.0), (20, 160, 160), 4, 999999)
    assert num_pool[0] < num_pool[1] == num_pool[2]
    assert kernels[0][0] == 1  # anisotropic axis starts with kernel 1
    assert kernels[-1] == (3, 3, 3)  # bottleneck always 3
    # patch padded to divisibility
    assert all(p % d == 0 for p, d in zip(patch, 2 ** np.array(num_pool)))


def test_topology_stage_count_consistency():
    num_pool, strides, kernels, patch, _ = get_pool_and_conv_props(
        (1.0, 1.0, 1.0), (64, 64, 64), 4, 999999)
    assert len(strides) == len(kernels)  # stages incl. bottleneck


def test_pad_shape():
    np.testing.assert_array_equal(pad_shape_to_divisible((100, 128), (32, 32)),
                                  [128, 128])
    np.testing.assert_array_equal(pad_shape_to_divisible((128,), (32,)), [128])


@pytest.fixture(scope="module")
def synth_env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nnunet_env"))
    raw, pre, res = set_nnunet_paths(None, root)
    ds = make_synthetic_dataset(raw)
    return {"raw": raw, "pre": pre, "res": res, "ds": ds}


def test_fingerprint_plan_preprocess_e2e(synth_env):
    from fast_nnunet_tpu.planning.fingerprint import DatasetFingerprintExtractor
    from fast_nnunet_tpu.planning.planner import ExperimentPlanner
    from fast_nnunet_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from fast_nnunet_tpu.core.plans import PlansManager
    from fast_nnunet_tpu.training.dataset import NpyCaseDataset
    from fast_nnunet_tpu.utils.io import join, load_json

    fp = DatasetFingerprintExtractor("Dataset995_Synth", num_processes=1).run()
    assert len(fp["spacings"]) == 6
    assert "0" in fp["foreground_intensity_properties_per_channel"]
    assert fp["foreground_intensity_properties_per_channel"]["0"]["std"] > 0

    plans = ExperimentPlanner("Dataset995_Synth").plan_experiment()
    assert "3d_fullres" in plans["configurations"]
    assert "2d" in plans["configurations"]
    cfg = plans["configurations"]["3d_fullres"]
    # tiny dataset: patch covers the whole (resampled) median shape
    assert all(p >= s for p, s in zip(
        cfg["patch_size"], [int(x) for x in cfg["median_image_size_in_voxels"]]))
    assert cfg["architecture"]["arch_kwargs"]["n_stages"] == len(
        cfg["architecture"]["arch_kwargs"]["strides"])

    # preprocess single-process
    pp = DefaultPreprocessor()
    pp.run("Dataset995_Synth", "3d_fullres", num_processes=1)
    out = join(synth_env["pre"], "Dataset995_Synth", cfg["data_identifier"])
    ds = NpyCaseDataset(out)
    assert len(ds) == 6
    data, seg, props = ds.load_case(ds.keys()[0])
    assert data.ndim == 4 and seg.ndim == 4
    assert data.dtype == np.float32
    assert "class_locations" in props
    assert 1 in props["class_locations"] or 2 in props["class_locations"]
    # spacing transposed + resampled shape consistency
    assert "shape_before_cropping" in props
    assert "bbox_used_for_cropping" in props


def test_preprocess_normalization_applied(synth_env):
    from fast_nnunet_tpu.core.plans import PlansManager
    from fast_nnunet_tpu.training.dataset import NpyCaseDataset
    from fast_nnunet_tpu.utils.io import join, load_json

    plans = PlansManager(join(synth_env["pre"], "Dataset995_Synth",
                              "nnUNetPlans.json"))
    cfg = plans.get_configuration("3d_fullres")
    out = join(synth_env["pre"], "Dataset995_Synth", cfg.data_identifier)
    ds = NpyCaseDataset(out)
    data, _, _ = ds.load_case(ds.keys()[0])
    # CT normalization subtracts the fg mean: data should straddle zero
    assert data.min() < 0 < data.max()


def test_resenc_planner(synth_env):
    from fast_nnunet_tpu.planning.resenc_planner import nnUNetPlannerResEncL
    plans = nnUNetPlannerResEncL("Dataset995_Synth").plan_experiment()
    kw = plans["configurations"]["3d_fullres"]["architecture"]["arch_kwargs"]
    assert "n_blocks_per_stage" in kw
    assert plans["plans_name"] == "nnUNetResEncUNetLPlans"
    assert plans["configurations"]["3d_fullres"]["architecture"][
        "network_class_name"].endswith("ResidualEncoderUNet")
