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


@pytest.mark.slow
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
    # BOTH kernels on => cyclic accumulator mode (no physical shift);
    # fp32 accumulation on the pallas-accumulate path can legitimately
    # differ from the bf16-carried XLA logits within rounding, so compare
    # masks with the same agreement contract as the accumulate kernel tests
    cyc = run(use_pallas_finalize=True, use_pallas_s2d=True)
    assert (cyc == ref).mean() > 0.999


def test_cyclic_finalize_zeroes_and_rebases():
    """grouped_argmax with n_zero: consumed rows are zeroed in place and the
    modular row mapping reads the right physical rows."""
    K = 3
    rng = np.random.RandomState(5)
    acc = jnp.asarray(rng.randn(4, 8, 8, 24).astype(np.float32))
    # base 1: virtual rows 0..2 are physical 1,2,3
    cls, acc2 = grouped_argmax(acc, K, 3, row_base=1, n_zero=2, y_block=8,
                               interpret=True)
    ref = np.asarray(acc)[[1, 2, 3]].reshape(3, 8, 8, 8, K).argmax(-1)
    np.testing.assert_array_equal(np.asarray(cls),
                                  ref.transpose(0, 3, 1, 2))
    a2 = np.asarray(acc2)
    assert (a2[[1, 2]] == 0).all()            # virtual rows 0,1 zeroed
    np.testing.assert_array_equal(a2[[0, 3]], np.asarray(acc)[[0, 3]])
