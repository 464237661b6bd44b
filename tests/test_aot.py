"""Serialized-executable (AOT) cache — the TRT saveEngine analogue
(ref docs/Engine.md:91). A second process/engine must LOAD the compiled
sweep from disk and produce identical output; an unsupported backend or a
corrupt artifact must silently fall back to compiling."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_nnunet_tpu.inference.aot import aot_compile, program_key


@pytest.fixture(autouse=True)
def _no_persistent_compile_cache():
    """serialize_executable of an executable that was itself DESERIALIZED
    from the persistent XLA compile cache loses its buffer-definition
    events on the CPU backend ('Buffer Definition Event: Function ... not
    found' at execution) — so the AOT round-trip tests must compile fresh.
    Production is unaffected: aot.py loads its own artifact (never
    re-serializing a cache hit), and the TPU path deserializes fine."""
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    yield
    jax.config.update("jax_compilation_cache_dir", prev)
from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
from fast_nnunet_tpu.models.factory import get_network_from_plans
from fast_nnunet_tpu.models.s2d import make_s2d_engine_net

KW = {"n_stages": 2, "features_per_stage": [4, 8],
      "kernel_sizes": [[3, 3, 3]] * 2, "strides": [[1, 1, 1], [2, 2, 2]],
      "n_conv_per_stage": [2, 2], "n_conv_per_stage_decoder": [2],
      "nonlin": "torch.nn.LeakyReLU"}


def _engine(s2d, cache):
    return SlidingWindowEngine(
        s2d, (8, 8, 8), 3, shape_bucket=4, compute_dtype=jnp.float32,
        sweep_acc_dtype=jnp.float32, tile_batch=4, use_s2d_sweep=True,
        aot_cache=cache, max_accumulator_bytes=1)


def test_aot_sweep_roundtrip(tmp_path):
    net = get_network_from_plans("PlainConvUNet", KW, (), 1, 3,
                                 dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 1)),
                      deep_supervision=False)
    s2d = make_s2d_engine_net(net, KW, 3, dtype=jnp.float32)
    sp = s2d.convert_params(params)
    vol = np.random.RandomState(3).rand(1, 24, 12, 12).astype(np.float32)

    cache = str(tmp_path / "aot")
    seg1 = _engine(s2d, cache).predict_segmentation(sp, vol)
    arts = os.listdir(cache)
    # CPU/TPU backends serialize; if a backend ever can't, the dir is empty
    # and the load path below still must agree via the compile fallback.
    # (AOT-vs-no-cache numerics identity is pinned separately by the s2d
    # suite + golden checkpoint, so no third fresh compile here.)
    seg2 = _engine(s2d, cache).predict_segmentation(sp, vol)  # load path
    np.testing.assert_array_equal(seg1, seg2)
    if arts:
        assert arts[0].startswith("s2d_sweep-")


def test_aot_corrupt_artifact_falls_back(tmp_path):
    @jax.jit
    def f(x):
        return x * 2 + 1

    x = jnp.arange(8.0)
    cache = str(tmp_path / "aot")
    c1 = aot_compile(f, (x,), cache, tag="t")
    files = os.listdir(cache)
    if files:  # poison the artifact; load must fall back to compile
        with open(os.path.join(cache, files[0]), "wb") as fh:
            fh.write(b"garbage")
        c2 = aot_compile(f, (x,), cache, tag="t")
        np.testing.assert_array_equal(np.asarray(c2(x)), np.asarray(c1(x)))


def test_program_key_ignores_source_locations():
    """Comment-only / line-shift edits must not invalidate a multi-minute
    compile: the key hashes StableHLO WITHOUT loc metadata."""

    def f(x):
        return x * 2 + 1

    def g(x):
        # same computation, different source line => different loc metadata
        return x * 2 + 1

    x = jnp.arange(8.0)
    kf = program_key(jax.jit(f).lower(x))
    kg = program_key(jax.jit(g).lower(x))
    assert kf == kg
    kh = program_key(jax.jit(lambda x: x * 3 + 1).lower(x))
    assert kh != kf
