"""Space-to-depth inference transform: must be EXACT (same math, new layout).
See fast_nnunet_tpu/models/s2d.py for the derivation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_nnunet_tpu.models.factory import get_network_from_plans
from fast_nnunet_tpu.models.s2d import (S2DPlainConvUNet, depth_to_space,
                                        expand_kernel_downsample,
                                        expand_kernel_stride1,
                                        make_s2d_engine_net, space_to_depth)


def _arch(n_stages=3, features=(8, 16, 32), n_conv=(2, 2, 2), n_dec=(2, 2)):
    return {"n_stages": n_stages, "features_per_stage": list(features),
            "kernel_sizes": [[3, 3, 3]] * n_stages,
            "strides": [[1, 1, 1]] + [[2, 2, 2]] * (n_stages - 1),
            "n_conv_per_stage": list(n_conv),
            "n_conv_per_stage_decoder": list(n_dec),
            "nonlin": "torch.nn.LeakyReLU"}


def test_space_to_depth_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 6, 4, 5),
                    jnp.float32)
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x)), x)


def test_expand_kernel_stride1_exact():
    """The s2d conv must equal the full-res conv on random data."""
    rng = np.random.RandomState(1)
    W = rng.randn(3, 3, 3, 3, 5).astype(np.float32) * 0.2
    x = rng.randn(1, 8, 10, 6, 3).astype(np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(W), (1, 1, 1),
        ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    got = jax.lax.conv_general_dilated(
        space_to_depth(jnp.asarray(x)), jnp.asarray(expand_kernel_stride1(W)),
        (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    np.testing.assert_allclose(np.asarray(depth_to_space(got)),
                               np.asarray(ref), atol=1e-5)


def test_expand_kernel_downsample_exact():
    rng = np.random.RandomState(2)
    W = rng.randn(3, 3, 3, 4, 6).astype(np.float32) * 0.2
    x = rng.randn(1, 8, 10, 6, 4).astype(np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(W), (2, 2, 2),
        ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    got = jax.lax.conv_general_dilated(
        space_to_depth(jnp.asarray(x)),
        jnp.asarray(expand_kernel_downsample(W)), (1, 1, 1),
        ((1, 0), (1, 0), (1, 0)),
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("n_stages,features,n_conv,n_dec", [
    (3, (8, 16, 32), (2, 2, 2), (2, 2)),
    pytest.param(2, (4, 8), (2, 2), (2,), marks=pytest.mark.slow),
    pytest.param(4, (4, 8, 16, 32), (1, 2, 2, 2), (2, 2, 1),
                 marks=pytest.mark.slow),
])
def test_s2d_unet_matches_plain(n_stages, features, n_conv, n_dec):
    arch = _arch(n_stages, features, n_conv, n_dec)
    K = 5
    net = get_network_from_plans("PlainConvUNet", arch, (), 1, K,
                                 dtype=jnp.float32)
    x = jnp.asarray(
        np.random.RandomState(3).rand(2, 16, 16, 32, 1) * 2 - 1, jnp.float32)
    params = net.init(jax.random.PRNGKey(4), x, deep_supervision=False)
    ref = np.asarray(net.apply(params, x, deep_supervision=False))

    s2d = make_s2d_engine_net(net, arch, K, dtype=jnp.float32)
    assert s2d is not None
    sp = s2d.convert_params(params)
    got = np.asarray(jax.jit(
        lambda p, x: s2d.apply(p, x, deep_supervision=False))(sp, x))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-4)


def test_s2d_unsupported_architectures():
    arch = _arch()
    arch["strides"] = [[1, 1, 1], [1, 2, 2], [2, 2, 2]]  # anisotropic downsample
    assert make_s2d_engine_net(None, arch, 2) is None
    arch2 = _arch()
    arch2["kernel_sizes"][0] = [1, 3, 3]
    assert make_s2d_engine_net(None, arch2, 2) is None
