"""Fused gaussian-multiply scatter-accumulate kernel: interpret-mode
correctness on CPU (items must be pairwise disjoint — the engine's coset
batching guarantees this on the real path)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_nnunet_tpu.ops.pallas_kernels import fused_scatter_accumulate

pytestmark = pytest.mark.slow


def reference(acc, logits, gauss, coords, n_real):
    out = np.array(acc, np.float32)
    px, py, pz, C = logits.shape[1:]
    for b in range(n_real):
        x, y, z = (int(c) for c in coords[b])
        out[x:x + px, y:y + py, z:z + pz] += (
            logits[b].astype(np.float32) * gauss[..., None])
    return out


def _gauss_flat(gauss, C, dtype):
    px, py, pz = gauss.shape
    return jnp.asarray(
        np.broadcast_to(gauss[..., None], (px, py, pz, C)).reshape(
            px, py, pz * C), dtype)


def test_fused_scatter_matches_reference():
    rng = np.random.RandomState(0)
    acc = rng.rand(48, 48, 48, 8).astype(np.float32)
    logits = rng.rand(3, 16, 16, 16, 8).astype(np.float32)
    gauss = rng.rand(16, 16, 16).astype(np.float32)
    coords = np.array([[0, 0, 0], [16, 16, 16], [32, 32, 32]], np.int32)
    got = fused_scatter_accumulate(
        jnp.asarray(acc), jnp.asarray(logits),
        _gauss_flat(gauss, 8, jnp.float32), jnp.asarray(coords), 3,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               reference(acc, logits, gauss, coords, 3),
                               rtol=1e-5)


def test_fused_scatter_respects_n_real():
    rng = np.random.RandomState(1)
    acc = np.zeros((32, 32, 32, 8), np.float32)
    logits = np.ones((4, 16, 16, 16, 8), np.float32)
    gauss = np.ones((16, 16, 16), np.float32)
    # items 2,3 are padding that duplicates item 1's coords — must be skipped
    coords = np.array([[0, 0, 0], [16, 16, 16], [16, 16, 16], [16, 16, 16]],
                      np.int32)
    got = np.asarray(fused_scatter_accumulate(
        jnp.asarray(acc), jnp.asarray(logits),
        _gauss_flat(gauss, 8, jnp.float32), jnp.asarray(coords), 2,
        interpret=True))
    assert (got[0:16, 0:16, 0:16] == 1).all()
    assert (got[16:32, 16:32, 16:32] == 1).all()
    assert got.sum() == 2 * 16 ** 3 * 8


def test_fused_scatter_bf16_weight_channel():
    """The engine's usage: bf16 accumulator, channel K is a constant-1 logit
    so the weight sum accumulates in the same pass."""
    rng = np.random.RandomState(2)
    K = 5
    C = 8
    acc = np.zeros((32, 32, 32, C), np.float32)
    logits_k = rng.rand(2, 16, 16, 16, K).astype(np.float32)
    lg = np.concatenate(
        [logits_k, np.ones((2, 16, 16, 16, 1), np.float32),
         np.zeros((2, 16, 16, 16, C - K - 1), np.float32)], -1)
    gauss = (rng.rand(16, 16, 16) + 0.5).astype(np.float32)
    coords = np.array([[0, 0, 0], [0, 16, 16]], np.int32)
    got = np.asarray(fused_scatter_accumulate(
        jnp.asarray(acc, jnp.bfloat16), jnp.asarray(lg, jnp.bfloat16),
        _gauss_flat(gauss, C, jnp.bfloat16), jnp.asarray(coords), 2,
        interpret=True)).astype(np.float32)
    want = reference(acc, lg, gauss, coords, 2)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    # weight channel accumulated the gaussian itself
    np.testing.assert_allclose(got[0:16, 0:16, 0:16, K], gauss, rtol=2e-2,
                               atol=2e-2)
    assert (got[..., K + 1:] == 0).all()


def test_fused_scatter_single_item():
    rng = np.random.RandomState(3)
    acc = rng.rand(16, 16, 16, 8).astype(np.float32)
    logits = rng.rand(1, 16, 16, 16, 8).astype(np.float32)
    gauss = rng.rand(16, 16, 16).astype(np.float32)
    coords = np.zeros((1, 3), np.int32)
    got = np.asarray(fused_scatter_accumulate(
        jnp.asarray(acc), jnp.asarray(logits),
        _gauss_flat(gauss, 8, jnp.float32), jnp.asarray(coords), 1,
        interpret=True))
    np.testing.assert_allclose(got, reference(acc, logits, gauss, coords, 1),
                               rtol=1e-5)


def test_engine_pallas_sweep_matches_xla():
    """Engine-level: the Pallas sweep (quantized grid + coset batches +
    fused kernel, interpret mode on CPU) against the XLA sweep on the same
    quantized grid."""
    from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
    from fast_nnunet_tpu.models.factory import get_network_from_plans

    kw = {"n_stages": 2, "features_per_stage": [4, 8],
          "kernel_sizes": [[3, 3, 3]] * 2, "strides": [[1, 1, 1], [2, 2, 2]],
          "n_conv_per_stage": [1, 1], "n_conv_per_stage_decoder": [1],
          "nonlin": "torch.nn.LeakyReLU"}
    net = get_network_from_plans("PlainConvUNet", kw, (), 1, 3)
    patch = (32, 32, 32)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, *patch, 1)),
                      deep_supervision=False)
    vol = np.random.RandomState(11).rand(1, 48, 48, 48).astype(np.float32)

    eng_p = SlidingWindowEngine(net, patch, 3, shape_bucket=16,
                                compute_dtype=jnp.float32,
                                acc_dtype=jnp.float32,
                                sweep_acc_dtype=jnp.float32, tile_batch=2,
                                use_pallas_accumulate=True)
    seg_pallas = eng_p.predict_segmentation_sweep(params, vol)

    eng_x = SlidingWindowEngine(net, patch, 3, shape_bucket=16,
                                compute_dtype=jnp.float32,
                                acc_dtype=jnp.float32,
                                sweep_acc_dtype=jnp.float32, tile_batch=2)
    # force the same quantized grid for the XLA reference
    eng_x.use_pallas_accumulate = True
    orig = eng_x._accumulate_batch.__func__

    def xla_only(self, a, vol_, coords_b, valid_b, forward, stacked_params,
                 gaussian, acc_dtype, in_channels, x_offset=None,
                 use_pallas=False, acc_x_offset=None):
        B = coords_b.shape[0]
        mask = (jnp.arange(B) < valid_b).astype(jnp.float32) \
            if valid_b.ndim == 0 else valid_b
        return orig(self, a, vol_, coords_b, mask, forward, stacked_params,
                    gaussian, acc_dtype, in_channels, x_offset=x_offset,
                    use_pallas=False, acc_x_offset=acc_x_offset)

    import types
    eng_x._accumulate_batch = types.MethodType(xla_only, eng_x)
    seg_xla = eng_x.predict_segmentation_sweep(params, vol)

    agree = (seg_pallas == seg_xla).mean()
    assert agree == 1.0, f"pallas/xla sweep agreement {agree}"
