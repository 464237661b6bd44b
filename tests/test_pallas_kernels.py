"""Pallas scatter-accumulate kernel: interpret-mode correctness on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_nnunet_tpu.ops.pallas_kernels import scatter_accumulate

pytestmark = pytest.mark.slow


def reference_scatter(acc, contrib, coords):
    out = np.array(acc)
    B = contrib.shape[0]
    for b in range(B):
        x, y, z = (int(c) for c in coords[b])
        px, py, pz = contrib.shape[1:4]
        out[x:x + px, y:y + py, z:z + pz] += contrib[b]
    return out


def test_scatter_accumulate_matches_reference():
    rng = np.random.RandomState(0)
    acc = rng.rand(48, 48, 48, 8).astype(np.float32)
    contrib = rng.rand(3, 16, 16, 16, 8).astype(np.float32)
    coords = np.array([[0, 0, 0], [16, 16, 16], [32, 32, 32]], np.int32)
    got = scatter_accumulate(jnp.asarray(acc), jnp.asarray(contrib),
                             jnp.asarray(coords), interpret=True)
    want = reference_scatter(acc, contrib, coords)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_scatter_accumulate_overlapping_tiles():
    acc = np.zeros((48, 32, 32, 8), np.float32)
    contrib = np.ones((2, 32, 32, 32, 8), np.float32)
    coords = np.array([[0, 0, 0], [16, 0, 0]], np.int32)  # overlap rows 16..32
    got = np.asarray(scatter_accumulate(jnp.asarray(acc), jnp.asarray(contrib),
                                        jnp.asarray(coords), interpret=True))
    assert (got[0:16] == 1).all()
    assert (got[16:32] == 2).all()   # both tiles contributed
    assert (got[32:48] == 1).all()


def test_scatter_accumulate_bf16():
    rng = np.random.RandomState(1)
    acc = jnp.zeros((16, 16, 16, 8), jnp.bfloat16)
    contrib = jnp.asarray(rng.rand(1, 16, 16, 16, 8), jnp.bfloat16)
    coords = jnp.asarray([[0, 0, 0]], jnp.int32)
    got = scatter_accumulate(acc, contrib, coords, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(contrib[0], np.float32), rtol=1e-2)


def _tiny_net(patch, K=2):
    from fast_nnunet_tpu.models.factory import get_network_from_plans
    kw = {"n_stages": 2, "features_per_stage": [4, 8],
          "kernel_sizes": [[3, 3, 3]] * 2, "strides": [[1, 1, 1], [2, 2, 2]],
          "n_conv_per_stage": [1, 1], "n_conv_per_stage_decoder": [1],
          "nonlin": "torch.nn.LeakyReLU"}
    net = get_network_from_plans("PlainConvUNet", kw, (), 1, K)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, *patch, 1)),
                      deep_supervision=False)
    return net, params


def test_engine_pallas_falls_back_for_tiny_patches():
    """Patches whose in-plane stride can't reach 16 use the XLA path -> exact."""
    from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
    net, params = _tiny_net((8, 8, 8))
    vol = np.random.RandomState(0).rand(1, 16, 12, 12).astype(np.float32)
    base = SlidingWindowEngine(net, (8, 8, 8), 2, shape_bucket=4,
                               compute_dtype=jnp.float32, tile_batch=4)
    pall = SlidingWindowEngine(net, (8, 8, 8), 2, shape_bucket=4,
                               compute_dtype=jnp.float32, tile_batch=4,
                               use_pallas_accumulate=True)
    np.testing.assert_allclose(pall.predict_logits(params, vol),
                               base.predict_logits(params, vol),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(pall.predict_segmentation_sweep(params, vol),
                                  base.predict_segmentation_sweep(params, vol))


def test_engine_pallas_sweep_active():
    """Patch 32: aligned stride 16 == reference target -> the Pallas sweep runs
    (interpret mode on CPU) and agrees with the XLA sweep away from grid edges."""
    from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
    net, params = _tiny_net((32, 32, 32))
    vol = np.random.RandomState(1).rand(1, 48, 40, 40).astype(np.float32)
    base = SlidingWindowEngine(net, (32, 32, 32), 2, shape_bucket=8,
                               compute_dtype=jnp.float32, tile_batch=2)
    pall = SlidingWindowEngine(net, (32, 32, 32), 2, shape_bucket=8,
                               compute_dtype=jnp.float32, tile_batch=2,
                               use_pallas_accumulate=True)
    sweep_p = pall.predict_segmentation_sweep(params, vol)
    sweep_b = base.predict_segmentation_sweep(params, vol)
    assert sweep_p.shape == sweep_b.shape
    agree = (sweep_p == sweep_b).mean()
    assert agree > 0.9, f"pallas/xla sweep agreement too low: {agree}"
