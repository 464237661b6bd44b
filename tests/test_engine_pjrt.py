"""In-process PJRT backend of the native engine: C++ -> PJRT C API -> StableHLO
executable, no Python daemon (the TPU analogue of the reference engine running
TensorRT in-process, ref engine/fast_nnunet.cpp:17-27).

The engine binary dlopens a PJRT plugin; in CI that is the pyshim
(libfnn_pjrt_pyshim.so, the PJRT ABI over jax's CPU runtime); on a TPU host it
would be libtpu.so. Either way the C++ side is identical: compile
model_pjrt.mlir, drive the sliding window, gaussian-accumulate, argmax."""
import os
import subprocess

import numpy as np
import pytest

ENGINE_DIR = os.path.join(os.path.dirname(__file__), "..", "engine")
BUILD_DIR = os.path.join(ENGINE_DIR, "build")

KW = {"n_stages": 2, "features_per_stage": [4, 8],
      "kernel_sizes": [[3, 3, 3]] * 2, "strides": [[1, 1, 1], [2, 2, 2]],
      "n_conv_per_stage": [1, 1], "n_conv_per_stage_decoder": [1],
      "nonlin": "torch.nn.LeakyReLU"}
PATCH = (8, 8, 8)
K = 3


@pytest.fixture(scope="module")
def built_engine():
    if not os.path.isfile(os.path.join(BUILD_DIR, "fast_nnunet_engine")):
        subprocess.run(["cmake", "-B", "build", "-G", "Ninja"], cwd=ENGINE_DIR,
                       check=True, capture_output=True)
        subprocess.run(["cmake", "--build", "build"], cwd=ENGINE_DIR, check=True,
                       capture_output=True)
    return BUILD_DIR


@pytest.fixture(scope="module")
def shim(built_engine):
    path = os.path.join(built_engine, "libfnn_pjrt_pyshim.so")
    if not os.path.isfile(path):
        pytest.skip("pyshim not built (no Python dev environment)")
    return path


def _shim_env():
    """Environment for the engine subprocess: the embedded interpreter needs
    the venv's site-packages but must NOT pull in the axon sitecustomize
    (which would register the tunnel backend inside the engine process)."""
    import sysconfig
    env = dict(os.environ)
    env["PYTHONPATH"] = sysconfig.get_paths()["purelib"]
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _make_model(tmp_path):
    import jax
    import jax.export as jexport
    import jax.numpy as jnp
    from fast_nnunet_tpu.models.factory import get_network_from_plans

    net = get_network_from_plans("PlainConvUNet", KW, (), 1, K,
                                 dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, *PATCH, 1)),
                      deep_supervision=False)

    def forward(x):
        return net.apply(params, x, deep_supervision=False)

    exported = jexport.export(jax.jit(forward))(
        jax.ShapeDtypeStruct((1, *PATCH, 1), jnp.float32))
    artifact = str(tmp_path / "model_pjrt.mlir")
    with open(artifact, "wb") as f:
        f.write(exported.mlir_module_serialized)
    return net, params, artifact


def test_pjrt_backend_matches_python_predictor(built_engine, shim, tmp_path):
    """C++ PJRT sliding window must reproduce the Python engine's mask
    voxel-for-voxel (identical fp32 network, same gaussian + tile grid)."""
    import jax.numpy as jnp
    from fast_nnunet_tpu.imageio.nifti import read_nifti, write_nifti
    from fast_nnunet_tpu.inference.engine import SlidingWindowEngine

    net, params, artifact = _make_model(tmp_path)

    img = (np.random.RandomState(1).rand(14, 12, 11) * 400).astype(np.float32)
    ct = str(tmp_path / "ct.nii.gz")
    write_nifti(ct, img, spacing=(1.0, 1.0, 1.0))
    ini = str(tmp_path / "model.ini")
    with open(ini, "w") as f:
        f.write("[model]\nnum_class=3\n[input]\npatch_size=8x8x8\n"
                "target_spacing=(1.0,1.0,1.0)\n"
                "[preprocessing]\nmean=200\nstd=120\nlower_bound=0\n"
                "upper_bound=400\n"
                "[inference]\nstep_size=0.5\nuse_gaussian=true\n")
    out = str(tmp_path / "mask.nii.gz")
    r = subprocess.run(
        [os.path.join(built_engine, "fast_nnunet_engine"), "--config", ini,
         "--input", ct, "--output", out, "--pjrt", shim, "--artifact",
         artifact, "--fp32-input"],
        capture_output=True, text=True, timeout=600, env=_shim_env())
    assert r.returncode == 0, r.stdout + r.stderr
    mask, _ = read_nifti(out)
    assert mask.shape == img.shape

    # python reference: same preprocessing (identity resample at equal
    # spacing, clip+zscore), fp32 engine, same tile grid + gaussian
    pre = (np.clip(img, 0, 400) - 200.0) / 120.0
    engine = SlidingWindowEngine(net, PATCH, K, tile_step_size=0.5,
                                 use_gaussian=True, mirror_axes=(),
                                 compute_dtype=jnp.float32,
                                 acc_dtype=jnp.float32, shape_bucket=1,
                                 tile_batch=1)
    want = np.asarray(engine.predict_segmentation(params, pre[None]))
    agreement = float((mask == want).mean())
    assert agreement > 0.995, f"only {agreement:.4f} voxel agreement"


@pytest.mark.slow
def test_pjrt_backend_tile_batching(built_engine, shim, tmp_path):
    """tile_batch=2 in the INI with a -b 2 artifact: batched device calls
    (last batch padded by repeating a tile) must give the same mask as the
    per-tile path."""
    import jax
    import jax.export as jexport
    import jax.numpy as jnp
    from fast_nnunet_tpu.imageio.nifti import read_nifti, write_nifti
    from fast_nnunet_tpu.models.factory import get_network_from_plans

    net = get_network_from_plans("PlainConvUNet", KW, (), 1, K,
                                 dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, *PATCH, 1)),
                      deep_supervision=False)

    def forward(x):
        return net.apply(params, x, deep_supervision=False)

    arts = {}
    for b in (1, 2):
        exported = jexport.export(jax.jit(forward))(
            jax.ShapeDtypeStruct((b, *PATCH, 1), jnp.float32))
        arts[b] = str(tmp_path / f"model_b{b}.mlir")
        with open(arts[b], "wb") as f:
            f.write(exported.mlir_module_serialized)

    img = (np.random.RandomState(2).rand(14, 12, 11) * 400).astype(np.float32)
    ct = str(tmp_path / "ct.nii.gz")
    write_nifti(ct, img, spacing=(1.0, 1.0, 1.0))

    masks = {}
    for b in (1, 2):
        ini = str(tmp_path / f"model_b{b}.ini")
        with open(ini, "w") as f:
            f.write("[model]\nnum_class=3\n[input]\npatch_size=8x8x8\n"
                    "target_spacing=(1.0,1.0,1.0)\n"
                    "[preprocessing]\nmean=200\nstd=120\nlower_bound=0\n"
                    "upper_bound=400\n"
                    f"[inference]\nstep_size=0.5\ntile_batch={b}\n")
        out = str(tmp_path / f"mask_b{b}.nii.gz")
        r = subprocess.run(
            [os.path.join(built_engine, "fast_nnunet_engine"), "--config",
             ini, "--input", ct, "--output", out, "--pjrt", shim,
             "--artifact", arts[b], "--fp32-input"],
            capture_output=True, text=True, timeout=600, env=_shim_env())
        assert r.returncode == 0, r.stdout + r.stderr
        masks[b], _ = read_nifti(out)
    np.testing.assert_array_equal(masks[1], masks[2])


def test_pjrt_backend_missing_plugin_errors_cleanly(built_engine, tmp_path):
    from fast_nnunet_tpu.imageio.nifti import write_nifti
    img = np.zeros((10, 10, 10), np.float32)
    ct = str(tmp_path / "ct.nii.gz")
    write_nifti(ct, img, spacing=(1.0, 1.0, 1.0))
    ini = str(tmp_path / "model.ini")
    with open(ini, "w") as f:
        f.write("[model]\nnum_class=2\n[input]\npatch_size=8x8x8\n"
                "target_spacing=(1.0,1.0,1.0)\n[preprocessing]\nmean=0\n"
                "std=1\nlower_bound=-1\nupper_bound=1\n")
    r = subprocess.run(
        [os.path.join(built_engine, "fast_nnunet_engine"), "--config", ini,
         "--input", ct, "--output", str(tmp_path / "m.nii.gz"),
         "--pjrt", "/nonexistent/plugin.so", "--artifact", "/nonexistent.mlir"],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 1
    assert "dlopen" in r.stderr


@pytest.mark.slow
def test_pjrt_backend_golden_checkpoint(built_engine, shim, tmp_path):
    """The C++ PJRT engine must reproduce the Python engine's mask on the
    committed TRAINED golden checkpoint (tests/fixtures/golden_ckpt) — the
    cross-round guard for the native path. Compared against the Python
    engine on the same INI-style pipeline (clip+zscore, no crop): the
    golden expected_mask.nii.gz itself goes through crop_to_nonzero and is
    pinned by tests/test_golden_checkpoint.py instead."""
    import jax
    import jax.export as jexport
    import jax.numpy as jnp
    from fast_nnunet_tpu.imageio.nifti import read_nifti
    from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
    from fast_nnunet_tpu.inference.predictor import NNUNetPredictor
    from fast_nnunet_tpu.utils.io import load_json

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "golden_ckpt")
    model = os.path.join(fix, "model")
    if not os.path.isdir(model):
        pytest.skip("golden checkpoint fixture missing")

    pred = NNUNetPredictor(use_mirroring=False)
    pred.initialize_from_trained_model_folder(model, use_folds=[0])
    pred.engine.compute_dtype = jnp.float32
    net = pred.network
    params = pred.list_of_parameters[0]
    patch = tuple(pred.configuration_manager.patch_size)

    def forward(x):
        return net.apply(params, x, deep_supervision=False)

    exported = jexport.export(jax.jit(forward))(
        jax.ShapeDtypeStruct((1, *patch, 1), jnp.float32))
    artifact = str(tmp_path / "model_pjrt.mlir")
    with open(artifact, "wb") as f:
        f.write(exported.mlir_module_serialized)

    plans = load_json(os.path.join(model, "plans.json"))
    ip = plans["foreground_intensity_properties_per_channel"]["0"]
    # plans spacing is in READ (k,j,i) order; the C++ engine works in disk
    # (i,j,k) order — reverse so the identity-resample case stays identity
    spacing_cfg = list(pred.configuration_manager.spacing)[::-1]

    ini = str(tmp_path / "model.ini")
    with open(ini, "w") as f:
        f.write(f"[model]\nnum_class={pred.label_manager.num_segmentation_heads}\n"
                f"[input]\npatch_size={'x'.join(str(p) for p in patch)}\n"
                f"target_spacing=({','.join(str(s) for s in spacing_cfg)})\n"
                f"[preprocessing]\nmean={ip['mean']}\nstd={ip['std']}\n"
                f"lower_bound={ip['percentile_00_5']}\n"
                f"upper_bound={ip['percentile_99_5']}\n"
                f"[inference]\nstep_size=0.5\nuse_gaussian=true\n")

    ct = os.path.join(fix, "input_0000.nii.gz")
    out = str(tmp_path / "mask.nii.gz")
    r = subprocess.run(
        [os.path.join(built_engine, "fast_nnunet_engine"), "--config", ini,
         "--input", ct, "--output", out, "--pjrt", shim, "--artifact",
         artifact, "--fp32-input"],
        capture_output=True, text=True, timeout=600, env=_shim_env())
    assert r.returncode == 0, r.stdout + r.stderr
    mask = read_nifti(out)[0]

    # python reference on the identical INI pipeline, in DISK axis order
    # (the golden patch is cubic, so the grid is order-symmetric)
    raw = read_nifti(ct)[0].astype(np.float32)
    pre = (np.clip(raw, ip["percentile_00_5"], ip["percentile_99_5"])
           - ip["mean"]) / ip["std"]
    eng = SlidingWindowEngine(net, patch, 3, tile_step_size=0.5,
                              use_gaussian=True, compute_dtype=jnp.float32,
                              acc_dtype=jnp.float32, shape_bucket=1,
                              tile_batch=1)
    want = np.asarray(eng.predict_segmentation(params, pre[None]))
    agree = float((mask == want).mean())
    assert agree > 0.999, f"C++/python golden agreement: {agree:.4f}"
    assert len(np.unique(mask)) >= 3, "trained golden net must segment"


@pytest.mark.slow
def test_pjrt_backend_air_skip(built_engine, shim, tmp_path):
    """skip_air_tiles=true drops all-air tiles: air-only corners come out
    background, the body region matches the unskipped run."""
    from fast_nnunet_tpu.imageio.nifti import read_nifti, write_nifti

    net, params, artifact = _make_model(tmp_path)

    img = np.full((30, 26, 22), -1000.0, np.float32)
    img[2:12, 2:12, 2:12] = (np.random.RandomState(3).rand(10, 10, 10)
                             * 400).astype(np.float32)
    ct = str(tmp_path / "ct.nii.gz")
    write_nifti(ct, img, spacing=(1.0, 1.0, 1.0))

    masks = {}
    for skip in ("false", "true"):
        ini = str(tmp_path / f"model_{skip}.ini")
        with open(ini, "w") as f:
            f.write("[model]\nnum_class=3\n[input]\npatch_size=8x8x8\n"
                    "target_spacing=(1.0,1.0,1.0)\n"
                    "[preprocessing]\nmean=200\nstd=120\nlower_bound=0\n"
                    "upper_bound=400\n"
                    f"[inference]\nstep_size=0.5\nskip_air_tiles={skip}\n")
        out = str(tmp_path / f"mask_{skip}.nii.gz")
        r = subprocess.run(
            [os.path.join(built_engine, "fast_nnunet_engine"), "--config",
             ini, "--input", ct, "--output", out, "--pjrt", shim,
             "--artifact", artifact, "--fp32-input"],
            capture_output=True, text=True, timeout=600, env=_shim_env())
        assert r.returncode == 0, r.stdout + r.stderr
        masks[skip], _ = read_nifti(out)

    assert masks["true"][-6:, -6:, -6:].max() == 0  # all-air far corner
    body = (masks["true"] == masks["false"])[2:12, 2:12, 2:12]
    assert body.mean() > 0.95, f"air-skip body agreement {body.mean()}"
