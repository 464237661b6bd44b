"""Multi-chip slab-parallel inference on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
from fast_nnunet_tpu.inference.sharded import predict_segmentation_multichip
from fast_nnunet_tpu.models.factory import get_network_from_plans
from fast_nnunet_tpu.parallel.mesh import make_mesh

PATCH = (8, 8, 8)
K = 3


@pytest.fixture(scope="module")
def net_and_params():
    kw = {"n_stages": 2, "features_per_stage": [4, 8],
          "kernel_sizes": [[3, 3, 3]] * 2, "strides": [[1, 1, 1], [2, 2, 2]],
          "n_conv_per_stage": [1, 1], "n_conv_per_stage_decoder": [1],
          "nonlin": "torch.nn.LeakyReLU"}
    net = get_network_from_plans("PlainConvUNet", kw, (), 1, K)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, *PATCH, 1)),
                      deep_supervision=False)
    return net, params


def test_multichip_matches_single_chip_sweep(net_and_params):
    net, params = net_and_params
    assert jax.device_count() >= 8
    mesh = make_mesh(n_data=1, n_space=8)
    space_mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("space",))

    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                              compute_dtype=jnp.float32, tile_batch=4)
    vol = np.random.RandomState(0).rand(1, 40, 12, 12).astype(np.float32)
    seg_multi = predict_segmentation_multichip(eng, params, vol, space_mesh)
    seg_single = eng.predict_segmentation_sweep(params, vol)
    assert seg_multi.shape == (40, 12, 12)
    agree = (seg_multi == seg_single).mean()
    assert agree > 0.995, f"multichip/singlechip agreement {agree}"


def test_multichip_small_volume(net_and_params):
    net, params = net_and_params
    space_mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("space",))
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                              compute_dtype=jnp.float32, tile_batch=2)
    vol = np.random.RandomState(1).rand(1, 10, 9, 9).astype(np.float32)
    seg = predict_segmentation_multichip(eng, params, vol, space_mesh)
    ref = eng.predict_segmentation_sweep(params, vol)
    assert seg.shape == (10, 9, 9)
    assert (seg == ref).mean() > 0.99
