"""Multi-chip slab-parallel inference on the virtual 8-device CPU mesh.

The sharded path uses the SAME reference-exact tile grid and gaussian weights
as the single-chip sweep — tiles are only assigned to devices. The one
remaining source of disagreement is float addition ORDER on halo rows: a row
that receives contributions from a left-neighbor tile gets them as a
ppermute'd partial sum added last, instead of in x-ascending tile order.
Same terms, different order -> ~1-ulp differences that can flip a near-tie
argmax. Tests therefore assert bit-exactness on every row whose tiles all
live on one device, and a >=99% bound on the (precisely computed) halo rows.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
from fast_nnunet_tpu.inference.sharded import predict_segmentation_multichip
from fast_nnunet_tpu.models.factory import get_network_from_plans
from fast_nnunet_tpu.ops.sliding_window import compute_steps_for_sliding_window

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


def _halo_rows(n_devices: int, x_extent: int, tile_step: float = 0.5):
    """Rows that receive cross-device (ppermute'd, added-last) contributions:
    for each slab boundary, the rows past it covered by tiles starting left
    of it. Mirrors sharded.py's slab ownership (owned = ceil(x / D))."""
    x_tight = max(x_extent, PATCH[0])
    starts = compute_steps_for_sliding_window((x_tight,), PATCH[:1],
                                              tile_step)[0]
    owned = int(np.ceil(x_tight / n_devices))
    rows = np.zeros(x_extent, bool)
    for d in range(1, n_devices):
        boundary = d * owned
        spill_end = max((s + PATCH[0] for s in starts if s < boundary),
                        default=0)
        rows[boundary:min(spill_end, x_extent)] = True
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
    halo = _halo_rows(8, 40)
    np.testing.assert_array_equal(seg_multi[~halo], seg_single[~halo])
    if halo.any():
        agree_halo = (seg_multi[halo] == seg_single[halo]).mean()
        assert agree_halo > 0.99, f"halo-row agreement {agree_halo}"


def test_multichip_small_volume(net_and_params):
    """x smaller than D*patch: overhangs span multiple slabs, exercising the
    multi-hop halo forwarding."""
    net, params = net_and_params
    space_mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("space",))
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                              compute_dtype=jnp.float32, tile_batch=2)
    vol = np.random.RandomState(1).rand(1, 10, 9, 9).astype(np.float32)
    seg = predict_segmentation_multichip(eng, params, vol, space_mesh)
    ref = eng.predict_segmentation_sweep(params, vol)
    assert seg.shape == (10, 9, 9)
    halo = _halo_rows(4, 10)
    np.testing.assert_array_equal(seg[~halo], ref[~halo])
    if halo.any():
        assert (seg[halo] == ref[halo]).mean() > 0.99


@pytest.mark.slow
def test_multichip_nonuniform_grid_exact_outside_halo(net_and_params):
    """x = 26 yields the reference's non-uniform starts (0,4,7,11,14,18);
    the sharded path must place tiles identically to the single-chip sweep."""
    net, params = net_and_params
    space_mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("space",))
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=1,
                              compute_dtype=jnp.float32, tile_batch=2)
    vol = np.random.RandomState(5).rand(1, 26, 13, 18).astype(np.float32)
    seg = predict_segmentation_multichip(eng, params, vol, space_mesh)
    ref = eng.predict_segmentation_sweep(params, vol)
    halo = _halo_rows(8, 26)
    np.testing.assert_array_equal(seg[~halo], ref[~halo])
    if halo.any():
        assert (seg[halo] == ref[halo]).mean() > 0.99


def test_multichip_halo_exact_bit_identical(net_and_params):
    """halo_exact=True: the wavefront ordering makes multi-chip output
    voxel-IDENTICAL to the single-chip sweep on every row, halo included —
    the opt-in validation mode (serving keeps the parallel reassociating
    default)."""
    net, params = net_and_params
    space_mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("space",))
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                              compute_dtype=jnp.float32, tile_batch=4)
    vol = np.random.RandomState(0).rand(1, 40, 12, 12).astype(np.float32)
    seg_multi = predict_segmentation_multichip(eng, params, vol, space_mesh,
                                               halo_exact=True)
    seg_single = eng.predict_segmentation_sweep(params, vol)
    np.testing.assert_array_equal(seg_multi, seg_single)


def test_multichip_halo_exact_multihop(net_and_params):
    """Exact mode with overhangs spanning multiple slabs (relay case)."""
    net, params = net_and_params
    space_mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("space",))
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                              compute_dtype=jnp.float32, tile_batch=2)
    vol = np.random.RandomState(1).rand(1, 10, 9, 9).astype(np.float32)
    seg = predict_segmentation_multichip(eng, params, vol, space_mesh,
                                         halo_exact=True)
    ref = eng.predict_segmentation_sweep(params, vol)
    np.testing.assert_array_equal(seg, ref)


@pytest.mark.slow
def test_multichip_default_is_parallel_not_wavefront(net_and_params):
    """Serialization canary: the DEFAULT multichip mode must run device
    slabs in parallel. halo_exact intentionally wavefront-serializes (one
    device active per stage), so its steady-state wall must be clearly
    slower than the default's on the same volume — if this inverts or
    equalizes, someone serialized the serving path. Wall-clock on the CPU
    mesh is noisy; best-of-3 with a generous 1.2x threshold."""
    import time

    net, params = net_and_params
    space_mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("space",))
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                              compute_dtype=jnp.float32, tile_batch=4)
    vol = np.random.RandomState(0).rand(1, 96, 24, 24).astype(np.float32)

    def best_of(fn, n=3):
        fn()  # compile + warmup
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    t_fast = best_of(lambda: predict_segmentation_multichip(
        eng, params, vol, space_mesh))
    t_exact = best_of(lambda: predict_segmentation_multichip(
        eng, params, vol, space_mesh, halo_exact=True))
    assert t_fast < t_exact * 1.2, \
        f"default multichip ({t_fast:.2f}s) not faster than the " \
        f"wavefront-serialized exact mode ({t_exact:.2f}s) - serialized?"


@pytest.mark.slow
def test_multichip_s2d_matches_single_chip_s2d():
    """Slab-parallel s2d sweep == single-chip s2d sweep away from halo rows
    (same even-floored grid, same block-layout accumulation)."""
    from fast_nnunet_tpu.inference.sharded import \
        predict_segmentation_multichip_s2d
    from fast_nnunet_tpu.models.s2d import make_s2d_engine_net

    kw = {"n_stages": 2, "features_per_stage": [4, 8],
          "kernel_sizes": [[3, 3, 3]] * 2, "strides": [[1, 1, 1], [2, 2, 2]],
          "n_conv_per_stage": [2, 2], "n_conv_per_stage_decoder": [2],
          "nonlin": "torch.nn.LeakyReLU"}
    K2 = 3
    net = get_network_from_plans("PlainConvUNet", kw, (), 1, K2,
                                 dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(2), jnp.zeros((1, 8, 8, 8, 1)),
                      deep_supervision=False)
    s2d = make_s2d_engine_net(net, kw, K2, dtype=jnp.float32)
    sp = s2d.convert_params(params)

    assert jax.device_count() >= 8
    space_mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("space",))
    eng = SlidingWindowEngine(s2d, (8, 8, 8), K2, shape_bucket=4,
                              compute_dtype=jnp.float32,
                              sweep_acc_dtype=jnp.float32, tile_batch=4,
                              use_s2d_sweep=True)
    vol = np.random.RandomState(3).rand(1, 40, 12, 12).astype(np.float32)
    seg_multi = predict_segmentation_multichip_s2d(eng, sp, vol, space_mesh)
    seg_single = eng.predict_segmentation_sweep_s2d(sp, vol)
    assert seg_multi.shape == (40, 12, 12)
    # same even grid + fp32 accumulation: halo reassociation is the only
    # diff source; with fp32 everywhere it should be essentially exact
    agree = (seg_multi == seg_single).mean()
    assert agree > 0.999, f"multichip s2d agreement {agree}"
    # non-halo rows bit-exact; s2d slab ownership rounds `owned` UP TO EVEN
    # and uses the even-floored grid, so recompute boundaries accordingly
    owned = -(-40 // 8)
    owned += owned % 2
    starts = [s - s % 2
              for s in compute_steps_for_sliding_window((40,), (8,), 0.5)[0]]
    halo = np.zeros(40, bool)
    for d in range(1, 8):
        boundary = d * owned
        spill = max((s + 8 for s in starts if s < boundary), default=0)
        halo[boundary:min(spill, 40)] = True
    np.testing.assert_array_equal(seg_multi[~halo], seg_single[~halo])

    # exact mode: every row bit-identical, halo included
    seg_exact = predict_segmentation_multichip_s2d(eng, sp, vol, space_mesh,
                                                   halo_exact=True)
    np.testing.assert_array_equal(seg_exact, seg_single)
