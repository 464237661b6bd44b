"""Building blocks: conv + instance-norm + leaky-ReLU stacks and residual blocks.

TPU-first re-design of the reference's dynamic_network_architectures building
blocks (used via distillation/nnunetv2/utilities/get_network_from_plans.py):
channels-last (B, *spatial, C) layout so the channel dim rides the TPU lane
dimension and XLA can fuse the norm+nonlin into the conv epilogue. Convs use
explicit symmetric padding k//2 (the torch convention nnUNet assumes), which
keeps window placement identical to the reference for odd kernels.

Normalization statistics are always computed in fp32 even under bf16 compute —
instance-norm in low precision is the main Dice-parity risk (SURVEY §7 hard
part (d)).
"""
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .init import he_normal_init

Array = jnp.ndarray


def _same_padding(kernel_size: Sequence[int]) -> Tuple[Tuple[int, int], ...]:
    return tuple((k // 2, k // 2) for k in kernel_size)


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over spatial dims (torch
    InstanceNorm{2,3}d parity: eps, affine, no running stats).

    ``onepass=True`` (training builds; norm_kind="instance1p") computes the
    stats in one pass — E[x^2]-E[x]^2, clamped >= 0 — with f32-accumulating
    reduces that read the (bf16) input directly, and applies the norm as a
    folded per-channel affine y = x*a + b. This keeps XLA from relayouting a
    full-resolution f32 tensor into a C-in-lanes (4x-padded at C=32) layout
    around the stats in BOTH the forward and the remat'd backward: measured
    986 -> 864 ms/step at bone_turbo teacher scale on v5e (docs/
    Performance.md round-5, "copy bucket" series). The mean is bit-identical
    to the two-pass form (same f32 accumulation order class); var and the
    folded apply differ at ~1e-6 rel. Inference builds keep the canonical
    two-pass form below so serving numerics stay bit-stable — and because
    one-pass stats measured NEGATIVE for the inference sweep program
    (models/s2d.py:184-186), the two contexts genuinely want different forms.
    """
    eps: float = 1e-5
    affine: bool = True
    onepass: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        orig_dtype = x.dtype
        spatial_axes = tuple(range(1, x.ndim - 1))
        if self.onepass:
            mean = jnp.mean(x, axis=spatial_axes, keepdims=True,
                            dtype=jnp.float32)
            m2 = jnp.mean(jnp.square(x.astype(jnp.float32)),
                          axis=spatial_axes, keepdims=True, dtype=jnp.float32)
            var = jnp.maximum(m2 - mean * mean, 0.0)
            inv = jax.lax.rsqrt(var + self.eps)
            if self.affine:
                c = x.shape[-1]
                scale = self.param("scale", nn.initializers.ones, (c,),
                                   jnp.float32)
                bias = self.param("bias", nn.initializers.zeros, (c,),
                                  jnp.float32)
                a = inv * scale
                b = bias - mean * a
            else:
                a, b = inv, -mean * inv
            return (x.astype(jnp.float32) * a + b).astype(orig_dtype)
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=spatial_axes, keepdims=True)
        var = x32.var(axis=spatial_axes, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            y = y * scale + bias
        return y.astype(orig_dtype)


class BatchStatsNorm(nn.Module):
    """BatchNorm with running averages (torch BatchNorm3d parity, backing
    NNUNetTrainerBN — ref variants/network_architecture/nnUNetTrainerBN.py:8-35
    swaps norm_op to the matching BatchNorm class).

    Train/eval mode is inferred from collection mutability instead of a flag
    threaded through every module signature: when the caller applies with
    ``mutable=["batch_stats"]`` (the jitted train step does), the CURRENT
    batch's statistics normalize and the running averages update with torch's
    rule ``ra = (1 - momentum) * ra + momentum * batch`` (variance update uses
    the unbiased estimate, normalization the biased one — exactly torch). A
    plain ``apply`` (val step, sliding-window engine, export) normalizes with
    the stored running averages — torch ``.eval()`` semantics.

    Under the data-sharded jitted step the batch mean/var reduce over the
    GLOBAL batch (XLA inserts the cross-device collective) — i.e. SyncBN
    rather than torch DDP's per-device stats; same expectation, lower variance.
    Statistics are kept and computed in fp32 regardless of compute dtype."""
    eps: float = 1e-5
    affine: bool = True
    momentum: float = 0.1  # torch convention: weight of the NEW batch statistic

    @nn.compact
    def __call__(self, x: Array) -> Array:
        orig_dtype = x.dtype
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        training = self.is_mutable_collection("batch_stats")
        x32 = x.astype(jnp.float32)
        if training:
            axes = tuple(range(x.ndim - 1))  # batch + spatial
            mean = x32.mean(axis=axes)
            var = x32.var(axis=axes)
            if not self.is_initializing():
                n = np.prod([x.shape[a] for a in axes])
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            y = y * scale + bias
        return y.astype(orig_dtype)


def _norm(kind: str, eps: float, name: str, affine: bool = True):
    if kind == "batch":
        return BatchStatsNorm(eps=eps, affine=affine, name=name)
    if kind == "instance1p":  # training builds (see InstanceNorm.onepass)
        return InstanceNorm(eps=eps, affine=affine, name=name, onepass=True)
    return InstanceNorm(eps=eps, affine=affine, name=name)


class ConvDropoutNormReLU(nn.Module):
    """conv -> (dropout) -> instance norm -> leaky relu, the nnU-Net unit block."""
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    conv_bias: bool = True
    norm_eps: float = 1e-5
    norm_affine: bool = True
    norm_kind: str = "instance"
    nonlin_negative_slope: float = 0.01
    dropout_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        x = nn.Conv(self.features,
                    kernel_size=tuple(self.kernel_size),
                    strides=tuple(self.strides),
                    padding=_same_padding(self.kernel_size),
                    use_bias=self.conv_bias,
                    kernel_init=he_normal_init(self.nonlin_negative_slope),
                    dtype=self.dtype,
                    name="conv")(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = _norm(self.norm_kind, self.norm_eps, "norm", self.norm_affine)(x)
        return nn.leaky_relu(x, negative_slope=self.nonlin_negative_slope)


class StackedConvBlocks(nn.Module):
    """n sequential ConvDropoutNormReLU blocks; the first carries the stride."""
    n_convs: int
    features: int
    kernel_size: Sequence[int]
    initial_strides: Sequence[int]
    conv_bias: bool = True
    norm_eps: float = 1e-5
    norm_kind: str = "instance"
    nonlin_negative_slope: float = 0.01
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ones = (1,) * len(self.kernel_size)
        for i in range(self.n_convs):
            x = ConvDropoutNormReLU(
                features=self.features,
                kernel_size=self.kernel_size,
                strides=self.initial_strides if i == 0 else ones,
                conv_bias=self.conv_bias,
                norm_eps=self.norm_eps,
                norm_kind=self.norm_kind,
                nonlin_negative_slope=self.nonlin_negative_slope,
                dtype=self.dtype,
                name=f"block_{i}")(x)
        return x


class BasicResBlockD(nn.Module):
    """Residual block (dynamic_network_architectures BasicBlockD semantics):
    conv(stride)-norm-relu-conv-norm, plus a 1x1(-strided) conv+norm skip when
    shape or channels change; leaky-relu after the sum."""
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    conv_bias: bool = True
    norm_eps: float = 1e-5
    norm_kind: str = "instance"
    nonlin_negative_slope: float = 0.01
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ones = (1,) * len(self.kernel_size)
        needs_skip_conv = (tuple(self.strides) != ones) or (x.shape[-1] != self.features)

        y = nn.Conv(self.features, tuple(self.kernel_size), strides=tuple(self.strides),
                    padding=_same_padding(self.kernel_size), use_bias=self.conv_bias,
                    kernel_init=he_normal_init(self.nonlin_negative_slope),
                    dtype=self.dtype, name="conv1")(x)
        y = _norm(self.norm_kind, self.norm_eps, "norm1")(y)
        y = nn.leaky_relu(y, negative_slope=self.nonlin_negative_slope)
        y = nn.Conv(self.features, tuple(self.kernel_size), strides=ones,
                    padding=_same_padding(self.kernel_size), use_bias=self.conv_bias,
                    kernel_init=he_normal_init(self.nonlin_negative_slope),
                    dtype=self.dtype, name="conv2")(y)
        y = _norm(self.norm_kind, self.norm_eps, "norm2")(y)

        if needs_skip_conv:
            skip = nn.Conv(self.features, ones, strides=tuple(self.strides),
                           padding="VALID", use_bias=False,
                           kernel_init=he_normal_init(self.nonlin_negative_slope),
                           dtype=self.dtype, name="skip_conv")(x)
            skip = _norm(self.norm_kind, self.norm_eps, "skip_norm")(skip)
        else:
            skip = x
        return nn.leaky_relu(y + skip, negative_slope=self.nonlin_negative_slope)
