"""Pallas grouped-argmax finalize (ops/pallas_finalize.py): kernel numerics
vs the XLA reshape+argmax, and the s2d sweep with use_pallas_finalize on
(interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_nnunet_tpu.ops.pallas_finalize import grouped_argmax


@pytest.mark.parametrize("dtype,c8p", [(jnp.float32, 128),  # padded lanes
                                       (jnp.bfloat16, 40)])  # exact 8K
def test_kernel_matches_xla_argmax(dtype, c8p):
    K = 5
    rng = np.random.RandomState(0)
    acc = np.zeros((4, 16, 16, c8p), np.float32)
    acc[..., :8 * K] = rng.randn(4, 16, 16, 8 * K)
    acc = jnp.asarray(acc, dtype)
    for n_rows in (2, 4):
        got = np.asarray(grouped_argmax(acc, K, n_rows, y_block=8,
                                        interpret=True))
        ref = np.asarray(acc[:n_rows, ..., :8 * K], np.float32)
        ref = ref.reshape(n_rows, 16, 16, 8, K).argmax(-1)
        np.testing.assert_array_equal(got, ref.transpose(0, 3, 1, 2))


def test_kernel_ties_take_first():
    K = 3
    acc = np.zeros((1, 8, 8, 24), np.float32)  # all-equal groups -> class 0
    got = np.asarray(grouped_argmax(jnp.asarray(acc), K, 1, y_block=8,
                                    interpret=True))
    assert (got == 0).all()


def test_engine_s2d_sweep_pallas_finalize_matches_default():
    from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
    from fast_nnunet_tpu.models.factory import get_network_from_plans
    from fast_nnunet_tpu.models.s2d import make_s2d_engine_net

    kw = {"n_stages": 3, "features_per_stage": [8, 16, 32],
          "kernel_sizes": [[3, 3, 3]] * 3,
          "strides": [[1, 1, 1]] + [[2, 2, 2]] * 2,
          "n_conv_per_stage": [2] * 3, "n_conv_per_stage_decoder": [2] * 2,
          "nonlin": "torch.nn.LeakyReLU"}
    K = 4
    patch = (16, 16, 32)
    net = get_network_from_plans("PlainConvUNet", kw, (), 1, K,
                                 dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, *patch, 1)),
                      deep_supervision=False)
    s2d = make_s2d_engine_net(net, kw, K, dtype=jnp.float32)
    sp = s2d.convert_params(params)
    vol = (np.random.RandomState(1).rand(1, 40, 40, 64)
           .astype(np.float32) - 0.5)

    def run(**flags):
        eng = SlidingWindowEngine(
            s2d, patch, K, shape_bucket=8, compute_dtype=jnp.float32,
            sweep_acc_dtype=jnp.float32, tile_batch=2, use_s2d_sweep=True,
            **flags)
        return eng.predict_segmentation(sp, vol)

    ref = run()
    got = run(use_pallas_finalize=True)
    np.testing.assert_array_equal(got, ref)
