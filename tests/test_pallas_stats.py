"""One-pass Pallas InstanceNorm stats (ops/pallas_stats.py): kernel moments
vs numpy, and the s2d net with use_pallas_stats on vs off (interpret mode on
CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_nnunet_tpu.ops.pallas_stats import spatial_sum_sumsq


@pytest.mark.parametrize("shape", [(2, 8, 10, 12, 16),   # tail (S=960<1024)
                                   (1, 16, 16, 8, 24),    # S=2048, two blocks
                                   (3, 5, 7, 3, 130)])    # odd sizes, C>128
def test_kernel_moments_match_numpy(shape):
    rng = np.random.RandomState(0)
    x = rng.randn(*shape).astype(np.float32) * 3 + 1.5
    s, q = spatial_sum_sumsq(jnp.asarray(x), interpret=True)
    B, C = shape[0], shape[-1]
    flat = x.reshape(B, -1, C).astype(np.float64)
    np.testing.assert_allclose(np.asarray(s), flat.sum(1), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(q), (flat * flat).sum(1), rtol=2e-5)


def test_kernel_bf16_accumulates_f32():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 64, 64, 4, 8), jnp.bfloat16)
    s, q = spatial_sum_sumsq(x, interpret=True)
    assert s.dtype == jnp.float32 and q.dtype == jnp.float32
    ref = np.asarray(x, np.float64).reshape(1, -1, 8)
    np.testing.assert_allclose(np.asarray(s), ref.sum(1), rtol=1e-2)


@pytest.mark.slow
def test_s2d_net_pallas_stats_matches_default():
    """Full s2d forward, use_pallas_stats on vs off: same masks, close
    logits (single-pass E[x^2] variance vs two-pass, f32 both ways)."""
    from fast_nnunet_tpu.models.factory import get_network_from_plans
    from fast_nnunet_tpu.models.s2d import make_s2d_engine_net

    kw = {"n_stages": 3, "features_per_stage": [8, 16, 32],
          "kernel_sizes": [[3, 3, 3]] * 3,
          "strides": [[1, 1, 1]] + [[2, 2, 2]] * 2,
          "n_conv_per_stage": [2] * 3, "n_conv_per_stage_decoder": [2] * 2,
          "nonlin": "torch.nn.LeakyReLU"}
    K = 4
    net = get_network_from_plans("PlainConvUNet", kw, (), 1, K,
                                 dtype=jnp.float32)
    # 32^3 full-res -> 16^3 = 4096 half-res voxels: at the threshold, so the
    # stage-0/decoder norms really take the pallas path
    x = jnp.asarray(np.random.RandomState(2).randn(1, 32, 32, 32, 1),
                    jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x, deep_supervision=False)

    outs = {}
    for flag in (False, True):
        s2d = make_s2d_engine_net(net, kw, K, dtype=jnp.float32,
                                  use_pallas_stats=flag)
        sp = s2d.convert_params(params)
        outs[flag] = np.asarray(s2d.apply(sp, x))
    np.testing.assert_allclose(outs[True], outs[False], rtol=5e-3, atol=5e-4)


def test_instance_norm_pallas_grouped_exact():
    """_instance_norm(pallas_stats=True) vs the default grouped pooling on a
    size above the 4096-voxel threshold."""
    from fast_nnunet_tpu.models.s2d import _instance_norm

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 16, 16, 32, 16).astype(np.float32) * 2 + 1)
    scale = jnp.asarray(rng.rand(2).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(2).astype(np.float32))
    ref = np.asarray(_instance_norm(x, scale, bias, 1e-5, groups=8))
    got = np.asarray(_instance_norm(x, scale, bias, 1e-5, groups=8,
                                    pallas_stats=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_instance_norm_pallas_groups1_exact():
    from fast_nnunet_tpu.models.s2d import _instance_norm

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 32, 16, 16, 8).astype(np.float32) - 0.7)
    scale = jnp.asarray(np.ones(8, np.float32))
    bias = jnp.asarray(np.zeros(8, np.float32))
    ref = np.asarray(_instance_norm(x, scale, bias, 1e-5, groups=1))
    got = np.asarray(_instance_norm(x, scale, bias, 1e-5, groups=1,
                                    pallas_stats=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
