"""Fused Pallas s2d accumulate (ops/pallas_s2d.py): kernel numerics vs the
XLA reference ops, and engine-level mask equality vs the XLA s2d sweep.

Interpret mode on CPU (the engine flips it automatically off-TPU); the same
code path compiles with Mosaic on hardware — the A/B lives in
docs/Performance.md.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fast_nnunet_tpu.ops.pallas_s2d import fused_head_gauss_accumulate


def _assert_fma_close(out, ref):
    # XLA fuses the gaussian multiply into the accumulator add (FMA, one
    # rounding); the numpy reference rounds twice — agreement is to the
    # last f32 ulp, not bit-exact
    np.testing.assert_allclose(out, ref, rtol=2e-6, atol=2e-6)


def _reference(acc, feats, g_s2d, w, b, coords_h, n_real):
    """The kernel's contract, op for op: seg-head dot with explicit f32
    accumulation (bf16 inputs), f32 bias add, fp32 gaussian multiply, fp32
    accumulation."""
    acc = np.asarray(acc, np.float32).copy()
    B, p0h, pyh, pzh, f8 = feats.shape
    c8 = acc.shape[-1]
    K = c8 // 8
    for t in range(int(n_real)):
        x = jnp.asarray(feats[t], jnp.bfloat16)
        y = jnp.dot(x, jnp.asarray(w, jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        y = np.asarray(y + jnp.asarray(b, jnp.bfloat16).astype(jnp.float32))
        gw = np.repeat(np.asarray(g_s2d, np.float32), K, axis=-1)
        contrib = y * gw
        y0, z0 = int(coords_h[t, 0]), int(coords_h[t, 1])
        acc[:, y0:y0 + pyh, z0:z0 + pzh, :] += contrib
    return acc


def _mk(B=3, n_real=2, p0h=4, pyh=4, pzh=8, K=3, F=2, Yh=16, Zh=24, seed=0):
    rng = np.random.RandomState(seed)
    c8, f8 = 8 * K, 8 * F
    acc = rng.randn(p0h, Yh, Zh, c8).astype(np.float32)
    feats = rng.randn(B, p0h, pyh, pzh, f8).astype(np.float32)
    g = np.abs(rng.randn(p0h, pyh, pzh, 8)).astype(np.float32)
    w = (rng.randn(f8, c8) * 0.3).astype(np.float32)
    b = (rng.randn(c8) * 0.1).astype(np.float32)
    # disjoint tiles: distinct y rows at the same z (and an ignored padded one
    # overlapping tile 0 — the count must exclude it)
    coords = np.array([[0, 8], [4, 8], [0, 8]][:B], np.int32)
    return acc, feats, g, w, b, coords, n_real


def test_kernel_matches_reference_ops():
    acc, feats, g, w, b, coords, n_real = _mk()
    out = fused_head_gauss_accumulate(
        jnp.asarray(acc), jnp.asarray(feats, jnp.bfloat16), jnp.asarray(g),
        jnp.asarray(w, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16),
        jnp.asarray(coords), jnp.int32(n_real), interpret=True)
    ref = _reference(acc, feats.astype(jnp.bfloat16), g,
                     w.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                     coords, n_real)
    _assert_fma_close(np.asarray(out), ref)


def test_kernel_skips_padded_slots():
    acc, feats, g, w, b, coords, _ = _mk()
    one = fused_head_gauss_accumulate(
        jnp.asarray(acc), jnp.asarray(feats, jnp.bfloat16), jnp.asarray(g),
        jnp.asarray(w, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16),
        jnp.asarray(coords), jnp.int32(1), interpret=True)
    ref = _reference(acc, feats.astype(jnp.bfloat16), g,
                     w.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                     coords, 1)
    _assert_fma_close(np.asarray(one), ref)


def test_kernel_inside_jit_with_traced_count():
    acc, feats, g, w, b, coords, n_real = _mk(seed=3)

    @jax.jit
    def run(a, f, n):
        return fused_head_gauss_accumulate(
            a, f, jnp.asarray(g), jnp.asarray(w, jnp.bfloat16),
            jnp.asarray(b, jnp.bfloat16), jnp.asarray(coords), n,
            interpret=True)

    out = run(jnp.asarray(acc), jnp.asarray(feats, jnp.bfloat16),
              jnp.int32(n_real))
    ref = _reference(acc, feats.astype(jnp.bfloat16), g,
                     w.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                     coords, n_real)
    _assert_fma_close(np.asarray(out), ref)


# ---------------------------------------------------------------- engine level
@pytest.fixture(scope="module")
def small_s2d():
    from fast_nnunet_tpu.models.factory import get_network_from_plans
    from fast_nnunet_tpu.models.s2d import make_s2d_engine_net

    kw = {"n_stages": 2, "features_per_stage": [8, 16],
          "kernel_sizes": [[3, 3, 3]] * 2,
          "strides": [[1, 1, 1], [2, 2, 2]],
          "n_conv_per_stage": [1, 1], "n_conv_per_stage_decoder": [1],
          "conv_bias": True,
          "norm_op": "torch.nn.modules.instancenorm.InstanceNorm3d",
          "norm_op_kwargs": {"eps": 1e-5, "affine": True},
          "nonlin": "torch.nn.LeakyReLU",
          "nonlin_kwargs": {"inplace": True}}
    K = 3
    net = get_network_from_plans("PlainConvUNet", kw, (), 1, K,
                                 dtype=jnp.bfloat16)
    patch = (8, 8, 16)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, *patch, 1), jnp.bfloat16),
                      deep_supervision=False)
    s2d = make_s2d_engine_net(net, kw, K, dtype=jnp.bfloat16)
    assert s2d is not None
    return s2d, s2d.convert_params(params), patch, K


def _engine(s2d, patch, K, **kw):
    from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
    return SlidingWindowEngine(
        s2d, patch, K, tile_step_size=0.5, use_gaussian=True, mirror_axes=(),
        compute_dtype=jnp.bfloat16, acc_dtype=jnp.float32,
        shape_bucket=8, tile_batch=3, max_accumulator_bytes=0,
        use_s2d_sweep=True, **kw)


def _xla_sweep_same_grid(engine, params, vol):
    """Run the XLA s2d sweep on the Pallas path's EXACT grid, batching and
    accumulation order (mirrors predict_segmentation_sweep_s2d's host prep,
    converting disjoint-batch counts to the XLA path's validity masks).
    The only remaining numeric delta is the seg-head dot's rounding point
    (the kernel rounds the f32 accumulator to bf16 where XLA CPU may keep
    f32 under fusion), so masks are compared by agreement fraction."""
    from fast_nnunet_tpu.ops.sliding_window import tile_coords_from_steps

    spatial = vol.shape[1:]
    vol_shape, steps = engine.s2d_sweep_plan(spatial)
    vp = np.zeros(vol_shape + (vol.shape[0],), np.float32)
    vp[tuple(slice(0, s) for s in spatial)] = np.moveaxis(vol, 0, -1)
    coords_yz = tile_coords_from_steps(steps[1:])
    coords_full = np.concatenate(
        [np.zeros((len(coords_yz), 1), np.int32), coords_yz], axis=1)
    coords_b, counts = engine._batched_coords_phase(coords_full)
    B = coords_b.shape[1]
    valid = (np.arange(B)[None, :] < counts[:, None]).astype(np.float32)
    sweep = engine._build_sweep_runner_s2d(
        vol_shape, tuple(steps[0]), len(coords_b), 1, vol.shape[0],
        use_pallas=False)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[params])
    seg = sweep(stacked, jnp.asarray(vp.astype(jnp.bfloat16)),
                jnp.asarray(coords_b), jnp.asarray(valid))
    return np.asarray(seg)[tuple(slice(0, s) for s in spatial)]


def test_engine_pallas_s2d_matches_xla_same_grid(small_s2d):
    """The Pallas path must reproduce the fp32-accumulator XLA s2d sweep on
    the same grid, batching and addition order (up to the head dot's
    rounding point — see _xla_sweep_same_grid)."""
    s2d, params, patch, K = small_s2d
    rng = np.random.RandomState(1)
    vol = rng.randn(1, 12, 12, 24).astype(np.float32)

    pal = _engine(s2d, patch, K, use_pallas_s2d=True)
    out = pal.predict_segmentation_sweep_s2d(params, vol)
    ref = _xla_sweep_same_grid(pal, params, vol)
    assert out.shape == ref.shape
    agree = (out == ref).mean()
    assert agree >= 0.999, f"mask agreement {agree:.5f}"


def test_engine_pallas_s2d_aligned_tail(small_s2d):
    """A volume needing a rounded-up z tail start (26 - 16 = 10 -> 16) still
    covers every voxel (tail tiles read the zero plane padding) and agrees
    with the XLA sweep on the same uniform grid."""
    s2d, params, patch, K = small_s2d
    rng = np.random.RandomState(2)
    vol = rng.randn(1, 12, 14, 26).astype(np.float32)

    pal = _engine(s2d, patch, K, use_pallas_s2d=True)
    out = pal.predict_segmentation_sweep_s2d(params, vol)
    assert out.shape == vol.shape[1:]
    ref = _xla_sweep_same_grid(pal, params, vol)
    agree = (out == ref).mean()
    assert agree >= 0.999, f"mask agreement {agree:.5f}"


def test_engine_pallas_s2d_agrees_with_default_path(small_s2d):
    """Different grid (uniform+tail vs evenly-spread), same model: the two
    serving paths must agree except at gaussian-weighting boundary voxels."""
    s2d, params, patch, K = small_s2d
    rng = np.random.RandomState(3)
    vol = rng.randn(1, 14, 14, 28).astype(np.float32)

    base = _engine(s2d, patch, K, sweep_acc_dtype=jnp.float32)
    pal = _engine(s2d, patch, K, use_pallas_s2d=True)
    a = base.predict_segmentation_sweep_s2d(params, vol)
    b = pal.predict_segmentation_sweep_s2d(params, vol)
    agree = (a == b).mean()
    # an UNTRAINED net's logits are near-uniform, so shifting the gaussian
    # centers (different tile grid) legitimately flips many argmaxes; this
    # is a smoke-level floor — the same-grid tests above carry the exactness
    assert agree >= 0.90, f"mask agreement {agree:.4f} across grids"
