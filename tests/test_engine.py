import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_nnunet_tpu.inference.engine import SlidingWindowEngine, _flip_combos
from fast_nnunet_tpu.models.factory import get_network_from_plans
from fast_nnunet_tpu.ops.sliding_window import (
    compute_gaussian, compute_steps_for_sliding_window, tile_coords_from_steps)

PATCH = (8, 8, 8)
K = 2


@pytest.fixture(scope="module")
def tiny_net_and_params():
    kw = {"n_stages": 2, "features_per_stage": [4, 8],
          "kernel_sizes": [[3, 3, 3]] * 2, "strides": [[1, 1, 1], [2, 2, 2]],
          "n_conv_per_stage": [1, 1], "n_conv_per_stage_decoder": [1],
          "nonlin": "torch.nn.LeakyReLU"}
    net = get_network_from_plans("PlainConvUNet", kw, (), 1, K)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, *PATCH, 1)),
                      deep_supervision=False)
    params2 = net.init(jax.random.PRNGKey(7), jnp.zeros((1, *PATCH, 1)),
                       deep_supervision=False)
    return net, params, params2


def naive_sliding_window(net, params, volume, patch, step, mirror_axes=()):
    """Reference implementation: plain python loops + numpy accumulation."""
    spatial = volume.shape[1:]
    tight = tuple(max(s, p) for s, p in zip(spatial, patch))
    vol = np.zeros(tight + (volume.shape[0],), np.float32)
    vol[tuple(slice(0, s) for s in spatial)] = np.moveaxis(volume, 0, -1)
    g = compute_gaussian(patch).astype(np.float32)
    steps = compute_steps_for_sliding_window(tight, patch, step)
    coords = tile_coords_from_steps(steps)
    acc = np.zeros(tight + (K,), np.float32)
    w = np.zeros(tight, np.float32)
    combos = _flip_combos(mirror_axes)
    for c in coords:
        sl = tuple(slice(int(ci), int(ci) + p) for ci, p in zip(c, patch))
        x = vol[sl][None]
        out = 0
        for combo in combos:
            axes = tuple(a + 1 for a in combo)
            xin = np.flip(x, axes) if combo else x
            o = np.asarray(net.apply(params, jnp.asarray(xin), deep_supervision=False))
            out = out + (np.flip(o, axes) if combo else o)
        out = out[0] / len(combos)
        acc[sl] += out * g[..., None]
        w[sl] += g
    logits = acc / w[..., None]
    logits = logits[tuple(slice(0, s) for s in spatial)]
    return np.moveaxis(logits, -1, 0)


def test_engine_matches_naive(tiny_net_and_params):
    net, params, _ = tiny_net_and_params
    eng = SlidingWindowEngine(net, PATCH, K, tile_step_size=0.5, shape_bucket=4,
                              compute_dtype=jnp.float32)
    vol = np.random.RandomState(0).rand(1, 12, 11, 9).astype(np.float32)
    got = eng.predict_logits(params, vol)
    want = naive_sliding_window(net, params, vol, PATCH, 0.5)
    assert got.shape == (K, 12, 11, 9)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_engine_volume_smaller_than_patch(tiny_net_and_params):
    net, params, _ = tiny_net_and_params
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4, compute_dtype=jnp.float32)
    vol = np.random.RandomState(1).rand(1, 5, 6, 7).astype(np.float32)
    got = eng.predict_logits(params, vol)
    want = naive_sliding_window(net, params, vol, PATCH, 0.5)
    assert got.shape == (K, 5, 6, 7)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_engine_mirroring(tiny_net_and_params):
    net, params, _ = tiny_net_and_params
    eng = SlidingWindowEngine(net, PATCH, K, mirror_axes=(0, 1, 2), shape_bucket=4,
                              compute_dtype=jnp.float32)
    vol = np.random.RandomState(2).rand(1, 9, 9, 9).astype(np.float32)
    got = eng.predict_logits(params, vol)
    want = naive_sliding_window(net, params, vol, PATCH, 0.5, mirror_axes=(0, 1, 2))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-3)


@pytest.mark.slow
def test_engine_fold_ensembling_is_logit_mean(tiny_net_and_params):
    net, params, params2 = tiny_net_and_params
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4, compute_dtype=jnp.float32)
    vol = np.random.RandomState(3).rand(1, 10, 10, 10).astype(np.float32)
    both = eng.predict_logits([params, params2], vol)
    single1 = eng.predict_logits(params, vol)
    single2 = eng.predict_logits(params2, vol)
    np.testing.assert_allclose(both, (single1 + single2) / 2, atol=2e-4, rtol=2e-3)


def test_engine_chunked_equals_unchunked(tiny_net_and_params):
    net, params, _ = tiny_net_and_params
    vol = np.random.RandomState(4).rand(1, 24, 10, 10).astype(np.float32)
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4, compute_dtype=jnp.float32)
    full = eng.predict_logits(params, vol)
    eng_small = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                                    compute_dtype=jnp.float32,
                                    max_accumulator_bytes=12 * 12 * 12 * 3 * 4)
    chunked = eng_small.predict_logits(params, vol)
    np.testing.assert_allclose(chunked, full, atol=2e-4, rtol=2e-3)


def test_engine_no_gaussian(tiny_net_and_params):
    net, params, _ = tiny_net_and_params
    eng = SlidingWindowEngine(net, PATCH, K, use_gaussian=False, shape_bucket=4,
                              compute_dtype=jnp.float32)
    vol = np.random.RandomState(5).rand(1, 12, 12, 12).astype(np.float32)
    got = eng.predict_logits(params, vol)
    assert got.shape == (K, 12, 12, 12)
    assert np.isfinite(got).all()


def test_predict_segmentation(tiny_net_and_params):
    net, params, _ = tiny_net_and_params
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4, compute_dtype=jnp.float32)
    vol = np.random.RandomState(6).rand(1, 9, 9, 9).astype(np.float32)
    seg = eng.predict_segmentation(params, vol)
    assert seg.shape == (9, 9, 9)
    assert set(np.unique(seg)) <= {0, 1}


def test_sweep_matches_logits_argmax(tiny_net_and_params):
    net, params, _ = tiny_net_and_params
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                              compute_dtype=jnp.float32)
    # x = 16: starts {0, 4, 8} with stride 4 uniform == reference spread (0,4,8)
    vol = np.random.RandomState(7).rand(1, 16, 12, 12).astype(np.float32)
    seg_sweep = eng.predict_segmentation_sweep(params, vol)
    seg_ref = eng.predict_logits(params, vol).argmax(0)
    assert seg_sweep.shape == (16, 12, 12)
    agree = (seg_sweep == seg_ref).mean()
    assert agree > 0.99, f"sweep/logits argmax agreement too low: {agree}"


def test_sweep_grid_exact_nonuniform_x(tiny_net_and_params):
    """x = 26 with patch 8 yields the reference's evenly-spread non-uniform
    starts (0,4,7,11,14,18): the single-jit sweep must place tiles exactly
    there — every voxel matches the logits path bit-for-bit."""
    net, params, _ = tiny_net_and_params
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=1,
                              compute_dtype=jnp.float32,
                              sweep_acc_dtype=jnp.float32)
    vol = np.random.RandomState(31).rand(1, 26, 13, 18).astype(np.float32)
    seg_sweep = eng.predict_segmentation_sweep(params, vol)
    seg_ref = eng.predict_logits(params, vol).argmax(0)
    np.testing.assert_array_equal(seg_sweep, seg_ref)


def test_sweep_single_chunk(tiny_net_and_params):
    net, params, _ = tiny_net_and_params
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                              compute_dtype=jnp.float32)
    vol = np.random.RandomState(8).rand(1, 6, 6, 6).astype(np.float32)
    seg = eng.predict_segmentation_sweep(params, vol)
    ref = eng.predict_logits(params, vol).argmax(0)
    np.testing.assert_array_equal(seg, ref)


@pytest.mark.slow
def test_sweep_fold_ensembled(tiny_net_and_params):
    net, params, params2 = tiny_net_and_params
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                              compute_dtype=jnp.float32)
    vol = np.random.RandomState(9).rand(1, 16, 10, 10).astype(np.float32)
    seg = eng.predict_segmentation_sweep([params, params2], vol)
    ref = eng.predict_logits([params, params2], vol).argmax(0)
    assert (seg == ref).mean() > 0.99


def test_coset_sweep_matches_plain_sweep(tiny_net_and_params):
    """Coset decomposition must reproduce the uniform-grid sweep exactly when
    the grids coincide (vol 16^3, patch 8, step 0.5)."""
    net, params, _ = tiny_net_and_params
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                              compute_dtype=jnp.float32)
    vol = np.random.RandomState(11).rand(1, 16, 16, 16).astype(np.float32)
    seg_coset = eng.predict_segmentation_coset(params, vol)
    seg_sweep = eng.predict_segmentation_sweep(params, vol)
    np.testing.assert_array_equal(seg_coset, seg_sweep)


def test_coset_sweep_odd_extents(tiny_net_and_params):
    """Non-multiple extents exercise the padding/cropping paths; compare against
    a naive python accumulation on the SAME uniform grid (the reference-spread
    grid places tiles differently, which an untrained net amplifies)."""
    net, params, _ = tiny_net_and_params
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                              compute_dtype=jnp.float32)
    vol = np.random.RandomState(12).rand(1, 21, 13, 18).astype(np.float32)
    seg = eng.predict_segmentation_coset(params, vol)
    assert seg.shape == (21, 13, 18)

    p, s = 8, 4

    def uniform_grid(extent):
        tight = max(extent, p)
        n = int(np.ceil((tight - p) / s)) + 1 if tight > p else 1
        ce, co = (n + 1) // 2, n // 2
        needed = max(ce * p, (s + co * p) if co else 0)
        return [k * s for k in range(n)], needed

    nx = int(np.ceil((21 - p) / s)) + 1
    sx, xpad = [k * s for k in range(nx)], (nx - 1) * s + p
    sy, ypad = uniform_grid(13)
    sz, zpad = uniform_grid(18)
    ypad, zpad = max(ypad, 16), max(zpad, 20)  # shape_bucket roundup of tight
    volp = np.zeros((xpad, ypad, zpad, 1), np.float32)
    volp[:21, :13, :18, 0] = vol[0]
    g = compute_gaussian(PATCH).astype(np.float32)
    acc = np.zeros((xpad, ypad, zpad, K), np.float32)
    w = np.zeros((xpad, ypad, zpad, 1), np.float32)
    for x0 in sx:
        for y0 in sy:
            for z0 in sz:
                patch = volp[x0:x0 + p, y0:y0 + p, z0:z0 + p][None]
                out = np.asarray(net.apply(params, jnp.asarray(patch),
                                           deep_supervision=False))[0]
                acc[x0:x0 + p, y0:y0 + p, z0:z0 + p] += out * g[..., None]
                w[x0:x0 + p, y0:y0 + p, z0:z0 + p] += g[..., None]
    ref = (acc / np.maximum(w, 1e-30)).argmax(-1)[:21, :13, :18]
    np.testing.assert_array_equal(seg, ref)


@pytest.mark.slow
def test_coset_sweep_fold_ensembled(tiny_net_and_params):
    net, params, params2 = tiny_net_and_params
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                              compute_dtype=jnp.float32)
    vol = np.random.RandomState(13).rand(1, 16, 16, 16).astype(np.float32)
    seg = eng.predict_segmentation_coset([params, params2], vol)
    ref = eng.predict_segmentation_sweep([params, params2], vol)
    np.testing.assert_array_equal(seg, ref)


@pytest.mark.slow
def test_streamed_sweep_is_grid_exact(tiny_net_and_params):
    """Host-driven streamed sweep (per-chunk jit + strip prefetch) uses the
    reference's evenly-spread x grid, so it must exactly reproduce the
    grid-exact logits path — including on x extents that are NOT multiples of
    the uniform stride (regression: the old uniform-stride grid ran the last
    tiles partly on past-the-end zero padding)."""
    net, params, params2 = tiny_net_and_params
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                              compute_dtype=jnp.float32)
    # 26 is not a multiple of the stride: even-spread starts differ from uniform
    vol = np.random.RandomState(21).rand(1, 26, 13, 18).astype(np.float32)
    ref = eng.predict_logits(params, vol).argmax(0)
    out = eng.predict_segmentation_sweep_streamed(params, vol)
    np.testing.assert_array_equal(out, ref)
    # fold-ensembled
    ref2 = eng.predict_logits([params, params2], vol).argmax(0)
    out2 = eng.predict_segmentation_sweep_streamed([params, params2], vol)
    np.testing.assert_array_equal(out2, ref2)
    # single-x-chunk volumes fall back to the single-jit path
    vol1 = np.random.RandomState(22).rand(1, 7, 13, 18).astype(np.float32)
    np.testing.assert_array_equal(
        eng.predict_segmentation_sweep_streamed(params, vol1),
        eng.predict_segmentation_sweep(params, vol1))


@pytest.mark.slow
def test_streamed_sweep_matches_plain_sweep_when_grids_coincide(
        tiny_net_and_params):
    """On stride-aligned x extents the even-spread grid equals the uniform
    grid, so streamed and single-jit sweeps must be bit-identical."""
    net, params, _ = tiny_net_and_params
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                              compute_dtype=jnp.float32)
    stride = max(1, int(PATCH[0] * 0.5))
    x = PATCH[0] + 3 * stride  # (x - p0) % stride == 0 -> grids coincide
    vol = np.random.RandomState(24).rand(1, x, 13, 18).astype(np.float32)
    np.testing.assert_array_equal(
        eng.predict_segmentation_sweep_streamed(params, vol),
        eng.predict_segmentation_sweep(params, vol))


def test_predict_segmentation_dispatches_sweep(tiny_net_and_params):
    """Over-budget accumulators take the single-jit sweep by default; the
    per-chunk streamed variant is opt-in (use_streamed_sweep=True)."""
    net, params, _ = tiny_net_and_params
    vol = np.random.RandomState(23).rand(1, 26, 13, 18).astype(np.float32)

    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                              compute_dtype=jnp.float32,
                              max_accumulator_bytes=64)
    called = {}
    orig = eng.predict_segmentation_sweep
    eng.predict_segmentation_sweep = \
        lambda *a, **k: called.setdefault("sweep", True) or orig(*a, **k)
    eng.predict_segmentation(params, vol)
    assert called.get("sweep")

    eng2 = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                               compute_dtype=jnp.float32,
                               max_accumulator_bytes=64,
                               use_streamed_sweep=True)
    called2 = {}
    orig2 = eng2.predict_segmentation_sweep_streamed
    eng2.predict_segmentation_sweep_streamed = \
        lambda *a, **k: called2.setdefault("streamed", True) or orig2(*a, **k)
    eng2.predict_segmentation(params, vol)
    assert called2.get("streamed")


@pytest.fixture(scope="module")
def tiny_2d_net_and_params():
    kw = {"n_stages": 2, "features_per_stage": [4, 8],
          "kernel_sizes": [[3, 3]] * 2, "strides": [[1, 1], [2, 2]],
          "n_conv_per_stage": [1, 1], "n_conv_per_stage_decoder": [1],
          "conv_op": "torch.nn.modules.conv.Conv2d",
          "nonlin": "torch.nn.LeakyReLU"}
    net = get_network_from_plans("PlainConvUNet", kw, (), 1, K)
    params = net.init(jax.random.PRNGKey(3), jnp.zeros((1, 8, 8, 1)),
                      deep_supervision=False)
    return net, params


def test_2d_engine_over_3d_volume(tiny_2d_net_and_params):
    """A 2D-config engine given a 3D volume must predict each slice with the
    2D tile grid (ref predict_from_raw_data.py:506-538) — per-slice results
    must match running the 2D engine on that slice alone."""
    net, params = tiny_2d_net_and_params
    eng = SlidingWindowEngine(net, (8, 8), K, tile_step_size=0.5,
                              shape_bucket=4, compute_dtype=jnp.float32,
                              tile_batch=4)
    vol = np.random.RandomState(31).rand(1, 5, 13, 11).astype(np.float32)
    logits = eng.predict_logits(params, vol)
    assert logits.shape == (K, 5, 13, 11)
    for d in range(5):
        ref = eng.predict_logits(params, vol[:, d])
        np.testing.assert_allclose(logits[:, d], ref, rtol=2e-5, atol=2e-5)
    seg = eng.predict_segmentation(params, vol)
    np.testing.assert_array_equal(seg, logits.argmax(0))


def test_2d_engine_over_3d_volume_mirroring(tiny_2d_net_and_params):
    """2d-over-slices with in-plane mirror TTA: mirror axes shift to the
    in-plane axes of the companion 3D engine."""
    net, params = tiny_2d_net_and_params
    eng = SlidingWindowEngine(net, (8, 8), K, tile_step_size=0.5,
                              shape_bucket=4, compute_dtype=jnp.float32,
                              mirror_axes=(0, 1), tile_batch=2)
    vol = np.random.RandomState(32).rand(1, 3, 9, 10).astype(np.float32)
    logits = eng.predict_logits(params, vol)
    for d in range(3):
        ref = eng.predict_logits(params, vol[:, d])
        np.testing.assert_allclose(logits[:, d], ref, rtol=2e-5, atol=2e-5)


def test_engine_chunked_memmap_fp16(tiny_net_and_params, monkeypatch):
    """Bounded-memory probabilities: memmap-backed fp16 host merge with
    on-device fp16 conversion before the fetch must stay close to the fp32
    in-RAM path (round-2 VERDICT weak #5)."""
    net, params, _ = tiny_net_and_params
    vol = np.random.RandomState(5).rand(1, 24, 10, 10).astype(np.float32)
    eng = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                              compute_dtype=jnp.float32,
                              max_accumulator_bytes=12 * 12 * 12 * 3 * 4)
    full = eng.predict_logits(params, vol)

    monkeypatch.setenv("FNN_LOGITS_HOST_DTYPE", "float16")
    monkeypatch.setenv("FNN_LOGITS_HOST_BYTES", "1")  # force the memmap
    eng2 = SlidingWindowEngine(net, PATCH, K, shape_bucket=4,
                               compute_dtype=jnp.float32,
                               max_accumulator_bytes=12 * 12 * 12 * 3 * 4)
    lo = eng2.predict_logits(params, vol)
    assert isinstance(lo, np.memmap) and lo.dtype == np.float16
    # fp16 stores gaussian-WEIGHTED sums: voxels whose every covering tile
    # contributes only far-tail weight (literal volume corners; weight sums
    # < ~1e-4) underflow — inherent to 16-bit weighted accumulation (the
    # reference's fp16 x10 path shares it, ref predict_from_raw_data.py:
    # 587-590). Compare where the weight is non-negligible: with step 0.5
    # that is every voxel within patch/4 of some tile center, i.e. all but
    # the extreme corners.
    from fast_nnunet_tpu.ops.sliding_window import (
        compute_gaussian, compute_steps_for_sliding_window,
        tile_coords_from_steps)
    g = compute_gaussian(PATCH).astype(np.float32)
    w = np.zeros(vol.shape[1:], np.float32)
    for c in tile_coords_from_steps(compute_steps_for_sliding_window(
            vol.shape[1:], PATCH, 0.5)):
        sl = tuple(slice(int(x), int(x) + p) for x, p in zip(c, PATCH))
        w[sl] += g
    covered = w > 1e-3
    assert covered.mean() > 0.5  # tiny patch => very peaked gaussian
    np.testing.assert_allclose(np.asarray(lo, np.float32)[:, covered],
                               full[:, covered], atol=5e-3, rtol=5e-3)
    agree = (np.asarray(lo).argmax(0) == full.argmax(0))[covered].mean()
    assert agree > 0.999
    import os
    path = getattr(eng2, "_logits_memmap_path", None)
    assert path and os.path.exists(path)
    os.unlink(path)
