"""Reference-spelling interop (round-5 VERDICT #3): every trainer class
name the reference's CLI accepts must resolve here too, and result folders
written under the reference's `nnUNetTrainer__<plans>__<config>` naming
(ref utilities/file_path_utilities.py:11-27) must be found by folder
resolution. The class list below is the complete set of concrete trainer
classes in the reference tree (ref distillation/nnunetv2/training/
nnUNetTrainer/**, run/run_training.py:214-268)."""
import os

import pytest

from fast_nnunet_tpu.run.run_training import find_trainer_class
from fast_nnunet_tpu.utils.misc import get_output_folder

# every concrete trainer class in the reference tree (grep
# "class nnUNet..." over distillation/nnunetv2/training, round 5)
REFERENCE_TRAINER_NAMES = [
    "nnUNetDistillationTrainer",
    "nnUNetDistillationTrainerDA5",
    "nnUNetTrainer",
    "nnUNetTrainerAdam",
    "nnUNetTrainerAdam1en3",
    "nnUNetTrainerAdam3en4",
    "nnUNetTrainerAdan",
    "nnUNetTrainerAdan1en1",
    "nnUNetTrainerAdan1en3",
    "nnUNetTrainerAdan3en4",
    "nnUNetTrainerAdanCosAnneal",
    "nnUNetTrainerBN",
    "nnUNetTrainerBenchmark_5epochs",
    "nnUNetTrainerBenchmark_5epochs_noDataLoading",
    "nnUNetTrainerCELoss",
    "nnUNetTrainerCELoss_5epochs",
    "nnUNetTrainerCosAnneal",
    "nnUNetTrainerDA5",
    "nnUNetTrainerDA5Segord0",
    "nnUNetTrainerDA5_10epochs",
    "nnUNetTrainerDA5ord0",
    "nnUNetTrainerDiceCELoss_noSmooth",
    "nnUNetTrainerDiceLoss",
    "nnUNetTrainerDiceTopK10Loss",
    "nnUNetTrainerNoDA",
    "nnUNetTrainerNoDeepSupervision",
    "nnUNetTrainerNoMirroring",
    "nnUNetTrainerTopk10Loss",
    "nnUNetTrainerTopk10LossLS01",
    "nnUNetTrainerVanillaAdam",
    "nnUNetTrainerVanillaAdam1en3",
    "nnUNetTrainerVanillaAdam3en4",
    "nnUNetTrainer_100epochs",
    "nnUNetTrainer_10epochs",
    "nnUNetTrainer_1epoch",
    "nnUNetTrainer_2000epochs",
    "nnUNetTrainer_2000epochs_NoMirroring",
    "nnUNetTrainer_20epochs",
    "nnUNetTrainer_250epochs",
    "nnUNetTrainer_250epochs_NoMirroring",
    "nnUNetTrainer_4000epochs",
    "nnUNetTrainer_4000epochs_NoMirroring",
    "nnUNetTrainer_500epochs",
    "nnUNetTrainer_50epochs",
    "nnUNetTrainer_5epochs",
    "nnUNetTrainer_750epochs",
    "nnUNetTrainer_8000epochs",
    "nnUNetTrainer_8000epochs_NoMirroring",
    "nnUNetTrainer_DASegOrd0",
    "nnUNetTrainer_DASegOrd0_NoMirroring",
    "nnUNetTrainer_noDummy2DDA",
    "nnUNetTrainer_onlyMirror01",
    "nnUNetTrainer_onlyMirror01_1500ep",
    "nnUNetTrainer_onlyMirror01_DA5",
    "nnUNetTrainer_onlyMirror01_DASegOrd0",
    "nnUNetTrainer_probabilisticOversampling",
    "nnUNetTrainer_probabilisticOversampling_010",
    "nnUNetTrainer_probabilisticOversampling_033",
    "nnUNetTrainer_warmup",
    "nnUNet_Primus_B_Trainer",
    "nnUNet_Primus_L_Trainer",
    "nnUNet_Primus_M_Trainer",
    "nnUNet_Primus_M_Trainer_BS8",
    "nnUNet_Primus_M_Trainer_BS8_2e4",
    "nnUNet_Primus_S_Trainer",
    "nnUNet_Trainer_BS8",
]


@pytest.mark.parametrize("name", REFERENCE_TRAINER_NAMES)
def test_every_reference_trainer_name_resolves(name):
    cls = find_trainer_class(name)
    assert isinstance(cls, type), name


def test_our_spellings_still_resolve():
    for name in ("NNUNetTrainer", "NNUNetTrainerDA5",
                 "NNUNetDistillationTrainer", "NNUNetTrainer_5epochs"):
        assert isinstance(find_trainer_class(name), type)


def test_unknown_trainer_still_raises():
    with pytest.raises(RuntimeError, match="Unknown trainer"):
        find_trainer_class("nnUNetTrainerDoesNotExist")


def test_output_folder_finds_reference_named_results(tmp_path, monkeypatch):
    """A results tree written by the REFERENCE (lowercase folder names)
    must be found when asked for with our spelling, and vice versa."""
    results = tmp_path / "results"
    ds = "Dataset001_Test"
    ref_folder = results / ds / "nnUNetTrainer__nnUNetPlans__3d_fullres"
    ref_folder.mkdir(parents=True)
    monkeypatch.setenv("nnUNet_results", str(results))
    got = get_output_folder(ds, "NNUNetTrainer", "nnUNetPlans", "3d_fullres")
    assert got == str(ref_folder)
    # with a fold suffix too
    got = get_output_folder(ds, "NNUNetTrainer", "nnUNetPlans", "3d_fullres",
                            fold=0)
    assert got == os.path.join(str(ref_folder), "fold_0")
    # our-spelling folder preferred when it exists
    our_folder = results / ds / "NNUNetTrainer__nnUNetPlans__3d_fullres"
    our_folder.mkdir()
    got = get_output_folder(ds, "NNUNetTrainer", "nnUNetPlans", "3d_fullres")
    assert got == str(our_folder)
    # asking with the reference spelling finds the reference folder
    got = get_output_folder(ds, "nnUNetTrainer", "nnUNetPlans", "3d_fullres")
    assert got == str(ref_folder)
    # neither exists -> canonical name as passed (write path unchanged)
    got = get_output_folder(ds, "NNUNetTrainerDA5", "nnUNetPlans",
                            "3d_fullres")
    assert got.endswith("NNUNetTrainerDA5__nnUNetPlans__3d_fullres")


def test_teacher_folder_resolution_accepts_reference_naming(tmp_path,
                                                            monkeypatch):
    from fast_nnunet_tpu.run.distillation_train import _resolve_teacher_folder
    results = tmp_path / "results"
    ds = "Dataset002_T"
    ref_folder = results / ds / "nnUNetTrainer__nnUNetPlans__3d_fullres"
    ref_folder.mkdir(parents=True)
    monkeypatch.setenv("nnUNet_results", str(results))
    got = _resolve_teacher_folder(ds, "3d_fullres", None)
    assert got == str(ref_folder)
