"""Torch checkpoint import: voxel-level parity against a real torch UNet.

Builds a torch PlainConvUNet with the reference's module naming (dnA-style:
encoder.stages.S.convs.B.{conv,norm}, decoder.transpconvs.S, decoder.seg_layers.S
— ref distillation/nnunetv2/run/load_pretrained_weights.py matches these keys),
imports its state_dict into our flax UNet, and compares forward outputs.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from fast_nnunet_tpu.models.factory import get_network_from_plans
from fast_nnunet_tpu.utils.torch_import import (import_torch_weights,
                                                torch_tensor_to_jax,
                                                translate_torch_key)

FEATURES = [4, 8, 16]
STRIDES = [[1, 1, 1], [2, 2, 2], [2, 2, 2]]
N_CONV = [2, 2, 2]
N_CONV_DEC = [2, 2]
K = 3


class _CDNR(torch.nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv = torch.nn.Conv3d(cin, cout, 3, stride, padding=1)
        self.norm = torch.nn.InstanceNorm3d(cout, eps=1e-5, affine=True)
        self.nonlin = torch.nn.LeakyReLU(0.01)

    def forward(self, x):
        return self.nonlin(self.norm(self.conv(x)))


class _Stacked(torch.nn.Module):
    def __init__(self, cin, cout, n, stride):
        super().__init__()
        self.convs = torch.nn.Sequential(
            _CDNR(cin, cout, stride),
            *[_CDNR(cout, cout, 1) for _ in range(n - 1)])

    def forward(self, x):
        return self.convs(x)


class _TorchUNet(torch.nn.Module):
    """Standard UNet wired exactly like the reference architecture, with the
    reference's parameter naming, for import parity testing."""

    class _Enc(torch.nn.Module):
        def __init__(self):
            super().__init__()
            chans = [1] + FEATURES
            self.stages = torch.nn.ModuleList(
                [_Stacked(chans[i], chans[i + 1], N_CONV[i], STRIDES[i][0])
                 for i in range(len(FEATURES))])

        def forward(self, x):
            skips = []
            for st in self.stages:
                x = st(x)
                skips.append(x)
            return skips

    class _Dec(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.transpconvs = torch.nn.ModuleList()
            self.stages = torch.nn.ModuleList()
            self.seg_layers = torch.nn.ModuleList()
            for s in range(1, len(FEATURES)):
                below = FEATURES[-s]
                skip = FEATURES[-(s + 1)]
                stride = STRIDES[-s][0]
                self.transpconvs.append(
                    torch.nn.ConvTranspose3d(below, skip, stride, stride))
                self.stages.append(_Stacked(2 * skip, skip, N_CONV_DEC[s - 1], 1))
                self.seg_layers.append(torch.nn.Conv3d(skip, K, 1))

        def forward(self, skips):
            x = skips[-1]
            for s, (up, st) in enumerate(zip(self.transpconvs, self.stages)):
                x = st(torch.cat([up(x), skips[-(s + 2)]], dim=1))
            return self.seg_layers[-1](x)

    def __init__(self):
        super().__init__()
        self.encoder = self._Enc()
        self.decoder = self._Dec()

    def forward(self, x):
        return self.decoder(self.encoder(x))


def _our_net():
    kw = {"n_stages": 3, "features_per_stage": FEATURES,
          "kernel_sizes": [[3, 3, 3]] * 3, "strides": STRIDES,
          "n_conv_per_stage": N_CONV, "n_conv_per_stage_decoder": N_CONV_DEC,
          "nonlin": "torch.nn.LeakyReLU", "norm_op": "torch.nn.InstanceNorm3d"}
    return get_network_from_plans("PlainConvUNet", kw, (), 1, K,
                                  dtype=jnp.float32)


def test_transpconv_orientation():
    tt = torch.nn.ConvTranspose3d(4, 3, 2, 2)
    x = np.random.RandomState(0).rand(1, 4, 6, 6, 6).astype(np.float32)
    with torch.no_grad():
        ref = tt(torch.from_numpy(x)).numpy()
    import flax.linen as nn
    mod = nn.ConvTranspose(features=3, kernel_size=(2, 2, 2), strides=(2, 2, 2),
                           padding="VALID")
    kernel = torch_tensor_to_jax(("decoder", "transpconv_0", "kernel"), tt.weight)
    params = {"params": {"kernel": jnp.asarray(kernel),
                         "bias": jnp.asarray(tt.bias.detach().numpy())}}
    out = np.moveaxis(np.asarray(mod.apply(params, jnp.asarray(np.moveaxis(x, 1, -1)))), -1, 1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_key_translation():
    assert translate_torch_key("encoder.stages.0.convs.1.conv.weight") == \
        ("encoder", "stage_0", "block_1", "conv", "kernel")
    assert translate_torch_key("encoder.stages.2.convs.0.norm.weight") == \
        ("encoder", "stage_2", "block_0", "norm", "scale")
    assert translate_torch_key("module.decoder.transpconvs.1.weight") == \
        ("decoder", "transpconv_1", "kernel")
    assert translate_torch_key("decoder.seg_layers.0.bias") == \
        ("decoder", "seg_head_0", "bias")
    # residual encoder variants (both ConvDropoutNormReLU and raw-conv layouts)
    assert translate_torch_key("encoder.stages.1.blocks.0.conv1.conv.weight") == \
        ("encoder", "stage_1_block_0", "conv1", "kernel")
    assert translate_torch_key("encoder.stages.1.blocks.0.norm2.bias") == \
        ("encoder", "stage_1_block_0", "norm2", "bias")
    assert translate_torch_key("encoder.stages.1.blocks.0.skip.0.weight") == \
        ("encoder", "stage_1_block_0", "skip_conv", "kernel")
    assert translate_torch_key("encoder.stem.convs.0.norm.bias") == \
        ("encoder", "stem", "norm", "bias")
    assert translate_torch_key("some.unknown.thing") is None


def test_plain_unet_forward_parity():
    tnet = _TorchUNet()
    # non-default weights so parity is meaningful
    gen = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in tnet.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.2)

    net = _our_net()
    template = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 1)),
                        deep_supervision=False)
    params, report = import_torch_weights(template, tnet.state_dict())
    assert not report["unmatched"], report["unmatched"]
    assert not report["shape_mismatch"], report["shape_mismatch"]
    assert not report["missing_in_template"], report["missing_in_template"]
    n_leaves = len(jax.tree_util.tree_leaves(template))
    assert len(report["converted"]) == n_leaves

    x = np.random.RandomState(1).rand(2, 1, 16, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)).numpy()  # (2, K, 16,16,16)
    ours = np.asarray(net.apply(params, jnp.asarray(np.moveaxis(x, 1, -1)),
                                deep_supervision=False))
    np.testing.assert_allclose(np.moveaxis(ours, -1, 1), ref,
                               atol=2e-4, rtol=2e-4)


def test_skip_seg_layers():
    tnet = _TorchUNet()
    net = _our_net()
    template = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 1)),
                        deep_supervision=False)
    before = jax.device_get(template)
    params, report = import_torch_weights(template, tnet.state_dict(),
                                          skip_seg_layers=True)
    assert len(report["skipped_seg"]) == 2 * len(N_CONV_DEC)
    # seg heads untouched, everything else converted
    np.testing.assert_array_equal(
        np.asarray(params["params"]["decoder"]["seg_head_0"]["kernel"]),
        np.asarray(before["params"]["decoder"]["seg_head_0"]["kernel"]))
