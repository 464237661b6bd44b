import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_nnunet_tpu.models.factory import get_network_from_plans
from fast_nnunet_tpu.models.students import (
    apply_block_strategy, build_lite_student, reduce_features)
from fast_nnunet_tpu.models.estimator import compute_conv_feature_map_size


ARCH_3D = {
    "n_stages": 3,
    "features_per_stage": [8, 16, 32],
    "conv_op": "torch.nn.modules.conv.Conv3d",
    "kernel_sizes": [[3, 3, 3]] * 3,
    "strides": [[1, 1, 1], [2, 2, 2], [2, 2, 2]],
    "n_conv_per_stage": [2, 2, 2],
    "n_conv_per_stage_decoder": [2, 2],
    "conv_bias": True,
    "norm_op": "torch.nn.modules.instancenorm.InstanceNorm3d",
    "norm_op_kwargs": {"eps": 1e-5, "affine": True},
    "dropout_op": None,
    "dropout_op_kwargs": None,
    "nonlin": "torch.nn.LeakyReLU",
    "nonlin_kwargs": {"inplace": True},
}


def _make(arch_name="dynamic_network_architectures.architectures.unet.PlainConvUNet",
          kw=None, in_ch=1, n_classes=3):
    return get_network_from_plans(arch_name, kw or ARCH_3D, (), in_ch, n_classes)


@pytest.fixture(scope="module")
def plain_net_and_params():
    net = _make()
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = net.init(jax.random.PRNGKey(0), x, deep_supervision=True)
    return net, params


def test_plain_unet_forward_shapes(plain_net_and_params):
    net, params = plain_net_and_params
    x = jnp.zeros((1, 16, 16, 16, 1))
    out = net.apply(params, x)
    assert out.shape == (1, 16, 16, 16, 3)
    ds = net.apply(params, x, deep_supervision=True)
    assert isinstance(ds, tuple) and len(ds) == 2
    assert ds[0].shape == (1, 16, 16, 16, 3)
    assert ds[1].shape == (1, 8, 8, 8, 3)


@pytest.mark.slow
def test_plain_unet_anisotropic_strides():
    kw = dict(ARCH_3D)
    kw["strides"] = [[1, 1, 1], [1, 2, 2], [2, 2, 2]]
    kw["kernel_sizes"] = [[1, 3, 3], [3, 3, 3], [3, 3, 3]]
    net = _make(kw=kw)
    x = jnp.zeros((1, 4, 16, 8, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (1, 4, 16, 8, 3)


@pytest.mark.slow
def test_resenc_forward():
    kw = dict(ARCH_3D)
    del kw["n_conv_per_stage"]
    kw["n_blocks_per_stage"] = [1, 2, 2]
    kw["n_conv_per_stage_decoder"] = [1, 1]
    net = get_network_from_plans(
        "dynamic_network_architectures.architectures.unet.ResidualEncoderUNet",
        kw, (), 2, 4)
    x = jnp.zeros((1, 8, 8, 8, 2))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (1, 8, 8, 8, 4)


@pytest.mark.slow
def test_2d_network():
    kw = {
        "n_stages": 3, "features_per_stage": [8, 16, 32],
        "conv_op": "torch.nn.modules.conv.Conv2d",
        "kernel_sizes": [[3, 3]] * 3, "strides": [[1, 1], [2, 2], [2, 2]],
        "n_conv_per_stage": [2, 2, 2], "n_conv_per_stage_decoder": [2, 2],
        "norm_op": "torch.nn.modules.instancenorm.InstanceNorm2d",
        "nonlin": "torch.nn.LeakyReLU",
    }
    net = _make(kw=kw)
    x = jnp.zeros((2, 24, 24, 1))
    params = net.init(jax.random.PRNGKey(0), x, deep_supervision=True)
    out = net.apply(params, x)
    assert out.shape == (2, 24, 24, 3)


def test_ds_flag_does_not_change_params(plain_net_and_params):
    net, params = plain_net_and_params
    x = jnp.zeros((1, 16, 16, 16, 1))
    p2 = net.init(jax.random.PRNGKey(0), x, deep_supervision=False)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)


def test_instance_norm_scale_invariance(plain_net_and_params):
    net, params = plain_net_and_params
    x = np.random.RandomState(0).rand(1, 16, 16, 16, 1).astype(np.float32)
    out1 = net.apply(params, jnp.asarray(x))
    out2 = net.apply(params, jnp.asarray(x * 5.0))
    c = np.corrcoef(np.asarray(out1).ravel(), np.asarray(out2).ravel())[0, 1]
    assert c > 0.99


def test_bf16_compute_dtype():
    net = _make()
    x = jnp.zeros((1, 8, 8, 8, 1), jnp.bfloat16)
    net16 = net.clone(dtype=jnp.bfloat16)
    params = net16.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_leaves(params)[0].dtype == jnp.float32  # fp32 params
    out = net16.apply(params, x)
    assert out.dtype == jnp.float32  # logits cast back at the heads


def test_feature_reduction():
    assert reduce_features([32, 64, 128, 256, 320, 320], 2) == (16, 32, 64, 128, 160, 160)
    assert reduce_features([32, 64], 8) == (8, 8)


def test_block_strategies():
    blocks = [1, 3, 4, 6, 6, 6]
    assert apply_block_strategy(blocks, "reduce") == (1, 1, 2, 3, 3, 3)
    assert apply_block_strategy(blocks, "keep") == (1, 3, 4, 6, 6, 6)
    assert apply_block_strategy(blocks, "increase") == (2, 4, 5, 7, 7, 7)
    assert apply_block_strategy(blocks, "adaptive") == (1, 3, 4, 3, 3, 3)
    with pytest.raises(ValueError):
        apply_block_strategy(blocks, "bogus")


@pytest.mark.slow
def test_student_fewer_params():
    x = jnp.zeros((1, 8, 8, 8, 1))
    teacher = _make()
    student = build_lite_student(
        "dynamic_network_architectures.architectures.unet.PlainConvUNet",
        ARCH_3D, 1, 3, reduction_factor=2)
    pt = teacher.init(jax.random.PRNGKey(0), x)
    ps = student.init(jax.random.PRNGKey(0), x)
    nt = sum(p.size for p in jax.tree_util.tree_leaves(pt))
    ns = sum(p.size for p in jax.tree_util.tree_leaves(ps))
    assert ns < nt * 0.35  # ~4x fewer (width/2 => params/4, floor at 8 features)


def test_estimator_tiny_golden():
    # hand-computed: 2 stages, feat (8, 16), strides ((1,1,1),(2,2,2)), 2 convs/stage,
    # patch 8^3, 3 classes, decoder 2 convs, DS on.
    kw = {"n_stages": 2, "features_per_stage": [8, 16],
          "kernel_sizes": [[3, 3, 3]] * 2, "strides": [[1, 1, 1], [2, 2, 2]],
          "n_conv_per_stage": [2, 2], "n_conv_per_stage_decoder": [2]}
    # encoder: stage0: 2 convs @ 8ch * 512 vox = 8192; stage1: 2 convs @16ch*64 = 2048
    # decoder: transpconv 8ch@512=4096; 2 convs 8ch@512=8192; seg head 3ch@512=1536
    expected = 8192 + 2048 + 4096 + 8192 + 1536
    got = compute_conv_feature_map_size("PlainConvUNet", kw, (8, 8, 8), 3, True)
    assert got == expected


def test_estimator_resenc_counts_skip():
    kw = {"n_stages": 2, "features_per_stage": [8, 8],
          "kernel_sizes": [[3, 3, 3]] * 2, "strides": [[1, 1, 1], [2, 2, 2]],
          "n_blocks_per_stage": [1, 1], "n_conv_per_stage_decoder": [1]}
    # stem 8*512=4096; stage0 (no skip) 2*8*512=8192; stage1 (skip) 3*8*64=1536
    # decoder: transpconv 4096 + conv 4096 + head 1536
    expected = 4096 + 8192 + 1536 + 4096 + 4096 + 1536
    got = compute_conv_feature_map_size("ResidualEncoderUNet", kw, (8, 8, 8), 3, True)
    assert got == expected


RESENC_3D = {
    "n_stages": 3,
    "features_per_stage": [8, 16, 32],
    "conv_op": "torch.nn.modules.conv.Conv3d",
    "kernel_sizes": [[3, 3, 3]] * 3,
    "strides": [[1, 1, 1], [2, 2, 2], [2, 2, 2]],
    "n_blocks_per_stage": [1, 2, 2],
    "n_conv_per_stage_decoder": [1, 1],
    "conv_bias": True,
    "norm_op": "torch.nn.modules.instancenorm.InstanceNorm3d",
    "norm_op_kwargs": {"eps": 1e-5, "affine": True},
    "dropout_op": None,
    "dropout_op_kwargs": None,
    "nonlin": "torch.nn.LeakyReLU",
    "nonlin_kwargs": {"inplace": True},
}


@pytest.mark.parametrize("arch_name,kw", [
    ("dynamic_network_architectures.architectures.unet.PlainConvUNet", ARCH_3D),
    pytest.param(
        "dynamic_network_architectures.architectures.unet.ResidualEncoderUNet",
        RESENC_3D, marks=pytest.mark.slow),  # distinct remat'd block path,
        # same property; grad-compiles are the fast suite's budget hog
])
def test_remat_same_params_outputs_grads(arch_name, kw):
    """Stage-level activation checkpointing (remat=True) must be a pure
    memory/time trade: identical param tree, and forward/gradients equal up
    to float reassociation (XLA fuses the remat'd graph differently, so
    values differ at ~1e-6 rel in f32 — shape-dependent; verified ~1e-13
    in f64, i.e. rounding, not a graph bug)."""
    x = np.random.RandomState(0).randn(1, 12, 12, 12, 1).astype(np.float32)

    def build(remat):
        net = get_network_from_plans(arch_name, kw, (), 1, 3, remat=remat)
        # jit init/fwd/grad: one compile each (persistently cached) instead
        # of thousands of eager per-op dispatches every run
        params = jax.jit(net.init)(jax.random.PRNGKey(0), jnp.asarray(x))

        def loss(p):
            out = net.apply(p, jnp.asarray(x))
            return jnp.mean(out.astype(jnp.float32) ** 2)

        fwd = jax.jit(lambda p: net.apply(p, jnp.asarray(x)))
        return params, fwd(params), jax.jit(jax.grad(loss))(params)

    p0, y0, g0 = build(False)
    p1, y1, g1 = build(True)
    assert jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: jnp.array_equal(a, b), p0, p1))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_remat_partial_modes_match():
    """remat="encoder"/"light" (partial checkpointing — the memory ladder for
    different HBM sizes, models/unet.py UNetDecoder) must build the identical
    param tree and the identical function as remat=True."""
    x = np.random.RandomState(1).randn(1, 12, 12, 12, 1).astype(np.float32)
    arch = "dynamic_network_architectures.architectures.unet.PlainConvUNet"

    def build(remat):
        net = get_network_from_plans(arch, ARCH_3D, (), 1, 3, remat=remat)
        params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
        return params, net.apply(params, jnp.asarray(x), deep_supervision=True)

    p_ref, y_ref = build(True)
    for mode in ("encoder", "light"):
        p, y = build(mode)
        assert jax.tree_util.tree_all(
            jax.tree.map(lambda a, b: jnp.array_equal(a, b), p_ref, p))
        for a, b in zip(y_ref, y):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)


def test_norm_onepass_matches_twopass():
    """The training builds' one-pass folded InstanceNorm (norm_onepass=True,
    blocks.InstanceNorm.onepass — the measured 12-18% train-step win on TPU)
    must produce the same param tree as the serving form and the same function
    to float-rounding: checkpoints trained with it restore into the default
    two-pass inference build unchanged."""
    x = np.random.RandomState(2).randn(1, 12, 12, 12, 1).astype(np.float32)
    arch = "dynamic_network_architectures.architectures.unet.PlainConvUNet"
    net2 = get_network_from_plans(arch, ARCH_3D, (), 1, 3, norm_onepass=False)
    net1 = get_network_from_plans(arch, ARCH_3D, (), 1, 3, norm_onepass=True)
    p2 = net2.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p1 = net1.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: jnp.array_equal(a, b), p1, p2))
    y2 = net2.apply(p2, jnp.asarray(x), deep_supervision=True)
    y1 = net1.apply(p2, jnp.asarray(x), deep_supervision=True)  # cross-load
    for a, b in zip(y1, y2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
