import numpy as np
import pytest

from fast_nnunet_tpu.core.plans import PlansManager


def make_plans():
    return {
        "dataset_name": "Dataset999_Test",
        "plans_name": "nnUNetPlans",
        "original_median_spacing_after_transp": [1.0, 1.0, 1.0],
        "original_median_shape_after_transp": [64, 64, 64],
        "image_reader_writer": "SimpleITKIO",
        "transpose_forward": [0, 1, 2],
        "transpose_backward": [0, 1, 2],
        "experiment_planner_used": "ExperimentPlanner",
        "label_manager": "LabelManager",
        "foreground_intensity_properties_per_channel": {
            "0": {"mean": 0.0, "std": 1.0, "percentile_00_5": -1.0, "percentile_99_5": 1.0}},
        "configurations": {
            "3d_fullres": {
                "data_identifier": "nnUNetPlans_3d_fullres",
                "preprocessor_name": "DefaultPreprocessor",
                "batch_size": 2,
                "patch_size": [32, 32, 32],
                "median_image_size_in_voxels": [64, 64, 64],
                "spacing": [1.0, 1.0, 1.0],
                "normalization_schemes": ["ZScoreNormalization"],
                "use_mask_for_norm": [False],
                "resampling_fn_data": "resample_data_or_seg_to_shape",
                "resampling_fn_data_kwargs": {"is_seg": False, "order": 3, "order_z": 0,
                                              "force_separate_z": None},
                "resampling_fn_seg": "resample_data_or_seg_to_shape",
                "resampling_fn_seg_kwargs": {"is_seg": True, "order": 1, "order_z": 0,
                                             "force_separate_z": None},
                "resampling_fn_probabilities": "resample_data_or_seg_to_shape",
                "resampling_fn_probabilities_kwargs": {"is_seg": False, "order": 1,
                                                       "order_z": 0, "force_separate_z": None},
                "batch_dice": True,
                "architecture": {
                    "network_class_name":
                        "dynamic_network_architectures.architectures.unet.PlainConvUNet",
                    "arch_kwargs": {
                        "n_stages": 3,
                        "features_per_stage": [32, 64, 128],
                        "conv_op": "torch.nn.modules.conv.Conv3d",
                        "kernel_sizes": [[3, 3, 3]] * 3,
                        "strides": [[1, 1, 1], [2, 2, 2], [2, 2, 2]],
                        "n_conv_per_stage": [2, 2, 2],
                        "n_conv_per_stage_decoder": [2, 2],
                        "conv_bias": True,
                        "norm_op": "torch.nn.modules.instancenorm.InstanceNorm3d",
                        "norm_op_kwargs": {"eps": 1e-05, "affine": True},
                        "dropout_op": None,
                        "dropout_op_kwargs": None,
                        "nonlin": "torch.nn.LeakyReLU",
                        "nonlin_kwargs": {"inplace": True},
                    },
                    "_kw_requires_import": ["conv_op", "norm_op", "dropout_op", "nonlin"],
                },
            },
            "3d_lowres": {
                "inherits_from": "3d_fullres",
                "spacing": [2.0, 2.0, 2.0],
                "batch_dice": False,
                "next_stage": "3d_cascade_fullres",
            },
            "3d_cascade_fullres": {
                "inherits_from": "3d_fullres",
                "previous_stage": "3d_lowres",
            },
        },
    }


def test_basic_properties():
    pm = PlansManager(make_plans())
    assert pm.dataset_name == "Dataset999_Test"
    assert pm.available_configurations == ["3d_fullres", "3d_lowres", "3d_cascade_fullres"]
    cfg = pm.get_configuration("3d_fullres")
    assert cfg.batch_size == 2
    assert cfg.patch_size == [32, 32, 32]
    assert cfg.batch_dice is True
    assert cfg.n_stages == 3
    assert cfg.pool_op_kernel_sizes == [[1, 1, 1], [2, 2, 2], [2, 2, 2]]
    assert cfg.previous_stage_name is None


def test_inheritance():
    pm = PlansManager(make_plans())
    lowres = pm.get_configuration("3d_lowres")
    assert lowres.spacing == [2.0, 2.0, 2.0]          # overridden
    assert lowres.patch_size == [32, 32, 32]           # inherited
    assert lowres.batch_dice is False                  # overridden
    assert lowres.next_stage_names == ["3d_cascade_fullres"]
    cascade = pm.get_configuration("3d_cascade_fullres")
    assert cascade.previous_stage_name == "3d_lowres"
    assert cascade.spacing == [1.0, 1.0, 1.0]


def test_inheritance_cycle_detection():
    plans = make_plans()
    plans["configurations"]["a"] = {"inherits_from": "b"}
    plans["configurations"]["b"] = {"inherits_from": "a"}
    pm = PlansManager(plans)
    with pytest.raises(RuntimeError):
        pm.get_configuration("a")


def test_missing_configuration():
    pm = PlansManager(make_plans())
    with pytest.raises(ValueError):
        pm.get_configuration("2d")


def test_label_manager_from_dataset_json():
    pm = PlansManager(make_plans())
    dj = {"labels": {"background": 0, "fg": 1}, "numTraining": 10}
    lm = pm.get_label_manager(dj)
    assert lm.num_segmentation_heads == 2


def test_resampling_fn_resolution():
    pm = PlansManager(make_plans())
    cfg = pm.get_configuration("3d_fullres")
    fn = cfg.resampling_fn_data
    data = np.random.RandomState(0).rand(1, 8, 8, 8).astype(np.float32)
    out = fn(data, (16, 16, 16), (1.0, 1.0, 1.0), (0.5, 0.5, 0.5))
    assert out.shape == (1, 16, 16, 16)
