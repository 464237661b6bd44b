"""Multi-host training smoke test: 2 simulated hosts x 2 CPU devices each over
a localhost jax.distributed coordinator (the TPU answer to the reference's
mp.spawn+NCCL multi-GPU path, ref run/run_training.py:101-113). Verifies the
global mesh spans both hosts, per-host batch slicing works, replicated state
stays in sync (identical losses on both ranks), and only rank 0 writes files.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from .helpers import make_synthetic_dataset, set_nnunet_paths


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_multihost_training_two_processes(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mh"))
    raw, pre, res = set_nnunet_paths(None, root)
    make_synthetic_dataset(raw, "Dataset988_MH", n_cases=5, shape=(18, 20, 16))

    from fast_nnunet_tpu.planning.fingerprint import DatasetFingerprintExtractor
    from fast_nnunet_tpu.planning.planner import ExperimentPlanner
    from fast_nnunet_tpu.preprocessing.preprocessor import DefaultPreprocessor
    from fast_nnunet_tpu.utils.io import isfile, join, save_json

    DatasetFingerprintExtractor("Dataset988_MH", num_processes=1).run()
    plans = ExperimentPlanner("Dataset988_MH").plan_experiment()
    # 4 global devices (2 hosts x 2) need a divisible global batch
    plans["configurations"]["3d_fullres"]["batch_size"] = 4
    save_json(plans, join(pre, "Dataset988_MH", "nnUNetPlans.json"),
              sort_keys=False)
    DefaultPreprocessor().run("Dataset988_MH", "3d_fullres", num_processes=1)

    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "FNNT_NUM_EPOCHS": "1", "FNNT_ITERS_PER_EPOCH": "2",
        "FNNT_VAL_ITERS_PER_EPOCH": "1",
        "nnUNet_raw": raw, "nnUNet_preprocessed": pre, "nnUNet_results": res,
    })
    procs = [subprocess.Popen(
        [sys.executable, "-m", "tests.multihost_child", coordinator, str(i)],
        env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, f"rank {i} failed:\n{out}"
        assert f"RANK{i}_OK" in out, out

    # replicated train state: both ranks must report the identical global loss
    losses = []
    for i, out in enumerate(outs):
        line = [ln for ln in out.splitlines()
                if ln.startswith(f"RANK{i}_TRAIN_LOSS")][0]
        losses.append(float(line.split()[1]))
    assert np.isfinite(losses).all()
    assert losses[0] == pytest.approx(losses[1], abs=1e-5), losses

    # rank 0 wrote the results; exactly one checkpoint set exists
    out_folder = join(res, "Dataset988_MH",
                      "NNUNetTrainer__nnUNetPlans__3d_fullres", "fold_0")
    assert isfile(join(out_folder, "checkpoint_final.fnnx"))
    assert isfile(join(out_folder, "validation", "summary.json"))
