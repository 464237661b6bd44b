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


def _halo_rows(n_devices: int, owned_per_dev: int, halo: int, n_rows: int):
    """Rows whose sums take a different ADDITION ORDER on the sharded path:
    the first `halo` rows of every device d>=1 receive their left-neighbor
    tiles via the ppermute'd partial sum (added last) instead of in x-ascending
    tile order. The tile grid and gaussian weights are identical, so any
    disagreement is float non-associativity flipping near-tie argmaxes, and it
    is confined to exactly these rows."""
    rows = np.zeros(n_rows, bool)
    for d in range(1, n_devices):
        lo = d * owned_per_dev
        rows[lo:min(lo + halo, n_rows)] = True
    return rows


def test_multichip_matches_single_chip_sweep(net_and_params):
    net, params = net_and_params
    assert jax.device_count() >= 8
    space_mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("space",))

    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                              compute_dtype=jnp.float32, tile_batch=4)
    vol = np.random.RandomState(0).rand(1, 40, 12, 12).astype(np.float32)
    seg_multi = predict_segmentation_multichip(eng, params, vol, space_mesh)
    seg_single = eng.predict_segmentation_sweep(params, vol)
    assert seg_multi.shape == (40, 12, 12)
    # identical grid + weights -> exact outside the halo rows; see _halo_rows
    stride = PATCH[0] // 2
    n_d = int(np.ceil(40 / (8 * stride)))  # owned tile rows per device
    halo = _halo_rows(8, n_d * stride, PATCH[0] - stride, 40)
    np.testing.assert_array_equal(seg_multi[~halo], seg_single[~halo])
    agree_halo = (seg_multi[halo] == seg_single[halo]).mean()
    assert agree_halo > 0.99, f"halo-row agreement {agree_halo}"


def test_multichip_small_volume(net_and_params):
    net, params = net_and_params
    space_mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("space",))
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                              compute_dtype=jnp.float32, tile_batch=2)
    vol = np.random.RandomState(1).rand(1, 10, 9, 9).astype(np.float32)
    seg = predict_segmentation_multichip(eng, params, vol, space_mesh)
    ref = eng.predict_segmentation_sweep(params, vol)
    assert seg.shape == (10, 9, 9)
    stride = PATCH[0] // 2
    n_d = int(np.ceil(max(10, PATCH[0]) / (4 * stride)))
    halo = _halo_rows(4, n_d * stride, PATCH[0] - stride, 10)
    np.testing.assert_array_equal(seg[~halo], ref[~halo])
    if halo.any():
        assert (seg[halo] == ref[halo]).mean() > 0.99
