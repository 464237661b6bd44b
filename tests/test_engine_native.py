"""Native C++ engine: build, unit tests, CLI, and live HTTP integration with the
Python serving daemon."""
import json
import os
import socket
import subprocess
import threading
import time

import numpy as np
import pytest

ENGINE_DIR = os.path.join(os.path.dirname(__file__), "..", "engine")
BUILD_DIR = os.path.join(ENGINE_DIR, "build")


@pytest.fixture(scope="module")
def built_engine():
    if not os.path.isfile(os.path.join(BUILD_DIR, "fast_nnunet_engine")):
        subprocess.run(["cmake", "-B", "build", "-G", "Ninja"], cwd=ENGINE_DIR,
                       check=True, capture_output=True)
        subprocess.run(["cmake", "--build", "build"], cwd=ENGINE_DIR, check=True,
                       capture_output=True)
    return BUILD_DIR


def test_native_unit_tests(built_engine):
    r = subprocess.run([os.path.join(built_engine, "engine_tests")],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "all OK" in r.stdout


def test_cli_null_backend(built_engine, tmp_path):
    from fast_nnunet_tpu.imageio.nifti import read_nifti, write_nifti
    img = (np.random.RandomState(0).rand(16, 18, 14) * 500).astype(np.float32)
    ct = str(tmp_path / "ct.nii.gz")
    write_nifti(ct, img, spacing=(1.0, 1.0, 2.0))
    ini = str(tmp_path / "model.ini")
    with open(ini, "w") as f:
        f.write("[model]\nnum_class=3\n[input]\npatch_size=8x8x8\n"
                "target_spacing=(1.0,1.0,1.0)\n"
                "[preprocessing]\nmean=250\nstd=150\nlower_bound=0\n"
                "upper_bound=500\n")
    out = str(tmp_path / "mask.nii.gz")
    r = subprocess.run([os.path.join(built_engine, "fast_nnunet_engine"),
                        "--config", ini, "--input", ct, "--output", out],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    mask, hdr = read_nifti(out)
    assert mask.shape == img.shape  # original geometry restored
    assert (mask == 0).all()        # null backend => background


def test_cli_http_integration(built_engine, tmp_path):
    """C++ engine -> HTTP -> Python serving daemon -> jitted engine -> C++."""
    import jax
    import jax.numpy as jnp
    from fast_nnunet_tpu.fast_inference.inferencer import FastnnUNetInferencer
    from fast_nnunet_tpu.fast_inference.rest_api import FastnnUNetAPI
    from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
    from fast_nnunet_tpu.models.factory import get_network_from_plans
    from fast_nnunet_tpu.imageio.nifti import read_nifti, write_nifti

    kw = {"n_stages": 2, "features_per_stage": [4, 8],
          "kernel_sizes": [[3, 3, 3]] * 2, "strides": [[1, 1, 1], [2, 2, 2]],
          "n_conv_per_stage": [1, 1], "n_conv_per_stage_decoder": [1],
          "nonlin": "torch.nn.LeakyReLU"}
    net = get_network_from_plans("PlainConvUNet", kw, (), 1, 3)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 1)),
                      deep_supervision=False)

    inferencer = FastnnUNetInferencer()
    inferencer.engine = SlidingWindowEngine(net, (8, 8, 8), 3, shape_bucket=4,
                                            compute_dtype=jnp.float32,
                                            tile_batch=2)
    inferencer._params = [params]

    # free port
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    api = FastnnUNetAPI(inferencer, "127.0.0.1", port)
    api.run(blocking=False)
    time.sleep(0.3)
    try:
        img = (np.random.RandomState(1).rand(12, 12, 12) * 400).astype(np.float32)
        ct = str(tmp_path / "ct.nii.gz")
        write_nifti(ct, img, spacing=(1.0, 1.0, 1.0))
        ini = str(tmp_path / "model.ini")
        with open(ini, "w") as f:
            f.write("[model]\nnum_class=3\n[input]\npatch_size=8x8x8\n"
                    "target_spacing=(1.0,1.0,1.0)\n"
                    "[preprocessing]\nmean=200\nstd=120\nlower_bound=0\n"
                    "upper_bound=400\n")
        out = str(tmp_path / "mask.nii.gz")
        r = subprocess.run(
            [os.path.join(built_engine, "fast_nnunet_engine"), "--config", ini,
             "--input", ct, "--output", out, "--endpoint", f"127.0.0.1:{port}"],
            capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr
        mask, _ = read_nifti(out)
        assert mask.shape == img.shape
        assert set(np.unique(mask)) <= {0, 1, 2}
    finally:
        api.shutdown()
