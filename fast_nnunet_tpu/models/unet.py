"""U-Net architectures: PlainConvUNet and ResidualEncoderUNet.

Capability parity with the reference's model zoo (instantiated through
distillation/nnunetv2/utilities/get_network_from_plans.py:9-43 from plans
arch_kwargs), designed TPU-first: channels-last layout, rank-agnostic (2D/3D),
deep supervision as a call-time flag (all head params always exist so
checkpoints are independent of the flag), fp32 params with optional bf16
compute dtype.

Forward contract: input (B, *spatial, C_in); output logits (B, *spatial, K)
or, with deep_supervision=True, a tuple of logits highest-resolution first
(one per decoder stage) — same ordering as the reference trainer expects for
its DS loss weights (nnUNetTrainer.py:409-423).
"""
from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BasicResBlockD, ConvDropoutNormReLU, StackedConvBlocks, _same_padding
from .init import he_normal_init

Array = jnp.ndarray


def _as_tuples(x, n_stages: int, dim: int):
    """Normalize kernel_sizes/strides specs (int | seq[int] | seq[seq[int]])."""
    if isinstance(x, int):
        return tuple((x,) * dim for _ in range(n_stages))
    x = list(x)
    if all(isinstance(i, int) for i in x):
        if len(x) == dim and n_stages == dim:
            # ambiguous; interpret as per-stage scalar list (nnUNet never hits this
            # since it always writes nested lists)
            return tuple((int(i),) * dim for i in x)
        if len(x) == n_stages:
            return tuple((int(i),) * dim for i in x)
        raise ValueError(f"Cannot interpret spec {x} for {n_stages} stages / dim {dim}")
    return tuple(tuple(int(j) for j in i) for i in x)


class PlainConvEncoder(nn.Module):
    n_stages: int
    features_per_stage: Sequence[int]
    kernel_sizes: Sequence[Sequence[int]]
    strides: Sequence[Sequence[int]]
    n_conv_per_stage: Sequence[int]
    conv_bias: bool = True
    norm_eps: float = 1e-5
    norm_kind: str = "instance"
    nonlin_negative_slope: float = 0.01
    dtype: Optional[jnp.dtype] = None
    remat: Union[bool, str] = False  # False | True | "encoder"

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, ...]:
        # stage-level activation checkpointing: only stage boundaries (the
        # skips) stay live through backward; intra-stage conv/norm/relu
        # activations are recomputed. At bone_turbo training scale
        # (batch 2 x 160x96x96, features [32..320]) the full-graph backward
        # wants ~32 GB of HLO temps vs the v5e's 16 GB HBM; remat fits it.
        Stack = nn.remat(StackedConvBlocks) if self.remat else StackedConvBlocks
        skips = []
        for s in range(self.n_stages):
            x = Stack(
                n_convs=self.n_conv_per_stage[s],
                features=self.features_per_stage[s],
                kernel_size=self.kernel_sizes[s],
                initial_strides=self.strides[s],
                conv_bias=self.conv_bias,
                norm_eps=self.norm_eps,
                norm_kind=self.norm_kind,
                nonlin_negative_slope=self.nonlin_negative_slope,
                dtype=self.dtype,
                name=f"stage_{s}")(x)
            skips.append(x)
        return tuple(skips)


class ResidualEncoder(nn.Module):
    n_stages: int
    features_per_stage: Sequence[int]
    kernel_sizes: Sequence[Sequence[int]]
    strides: Sequence[Sequence[int]]
    n_blocks_per_stage: Sequence[int]
    conv_bias: bool = True
    norm_eps: float = 1e-5
    norm_kind: str = "instance"
    nonlin_negative_slope: float = 0.01
    dtype: Optional[jnp.dtype] = None
    remat: Union[bool, str] = False  # False | True | "encoder"

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, ...]:
        dim = len(self.kernel_sizes[0])
        # block-level activation checkpointing (see PlainConvEncoder)
        Block = nn.remat(BasicResBlockD) if self.remat else BasicResBlockD
        # stem: one plain conv block to features[0], stride 1 (DNA ResidualEncoder)
        x = ConvDropoutNormReLU(
            features=self.features_per_stage[0],
            kernel_size=self.kernel_sizes[0],
            strides=(1,) * dim,
            conv_bias=self.conv_bias,
            norm_eps=self.norm_eps,
                norm_kind=self.norm_kind,
            nonlin_negative_slope=self.nonlin_negative_slope,
            dtype=self.dtype,
            name="stem")(x)
        skips = []
        for s in range(self.n_stages):
            for b in range(self.n_blocks_per_stage[s]):
                x = Block(
                    features=self.features_per_stage[s],
                    kernel_size=self.kernel_sizes[s],
                    strides=self.strides[s] if b == 0 else (1,) * dim,
                    conv_bias=self.conv_bias,
                    norm_eps=self.norm_eps,
                norm_kind=self.norm_kind,
                    nonlin_negative_slope=self.nonlin_negative_slope,
                    dtype=self.dtype,
                    name=f"stage_{s}_block_{b}")(x)
            skips.append(x)
        return tuple(skips)


class UNetDecoder(nn.Module):
    """Transpconv upsampling + skip concat + conv stacks + per-stage seg heads."""
    num_classes: int
    features_per_stage: Sequence[int]   # encoder features, stage 0 = highest res
    kernel_sizes: Sequence[Sequence[int]]
    strides: Sequence[Sequence[int]]
    n_conv_per_stage_decoder: Sequence[int]
    conv_bias: bool = True
    norm_eps: float = 1e-5
    norm_kind: str = "instance"
    nonlin_negative_slope: float = 0.01
    dtype: Optional[jnp.dtype] = None
    remat: Union[bool, str] = False  # False | True | "encoder"

    @nn.compact
    def __call__(self, skips: Tuple[Array, ...], deep_supervision: bool = False
                 ) -> Union[Array, Tuple[Array, ...]]:
        n_stages_encoder = len(skips)
        dim = len(self.kernel_sizes[0])
        # stage-level activation checkpointing (see PlainConvEncoder).
        # remat="encoder" checkpoints the encoder only; remat="light"
        # additionally checkpoints the full-resolution decoder stage (the
        # largest activations) but keeps the lower-resolution decoder stages
        # live. Memory ladder measured at bone_turbo teacher scale on a
        # 16 GB v5e (docs/Performance.md round-5): True fits; "light" fits;
        # "encoder" OOMs at 18.2 G; False OOMs at ~32 G. Throughput is the
        # same for True and "light" (993 vs 986 ms/step) — the step's layout
        # copies come from the InstanceNorm f32 relayout, not the barriers —
        # so True stays the default and "light" is the knob for bigger-HBM
        # parts where saved decoder activations may pay off.
        remat_full = self.remat is True
        remat_fullres_only = self.remat == "light"
        StackR = nn.remat(StackedConvBlocks)
        lres_input = skips[-1]
        seg_outputs = []
        for s in range(1, n_stages_encoder):
            features_below = self.features_per_stage[-s]          # noqa: F841 (doc)
            features_skip = self.features_per_stage[-(s + 1)]
            stride = tuple(self.strides[-s])
            x = nn.ConvTranspose(
                features=features_skip,
                kernel_size=stride,
                strides=stride,
                padding="VALID",
                use_bias=self.conv_bias,
                kernel_init=he_normal_init(self.nonlin_negative_slope),
                dtype=self.dtype,
                name=f"transpconv_{s - 1}")(lres_input)
            x = jnp.concatenate([x, skips[-(s + 1)].astype(x.dtype)], axis=-1)
            use_remat = remat_full or (remat_fullres_only
                                       and s == n_stages_encoder - 1)
            Stack = StackR if use_remat else StackedConvBlocks
            x = Stack(
                n_convs=self.n_conv_per_stage_decoder[s - 1],
                features=features_skip,
                kernel_size=self.kernel_sizes[-(s + 1)],
                initial_strides=(1,) * dim,
                conv_bias=self.conv_bias,
                norm_eps=self.norm_eps,
                norm_kind=self.norm_kind,
                nonlin_negative_slope=self.nonlin_negative_slope,
                dtype=self.dtype,
                name=f"stage_{s - 1}")(x)
            # seg head params must exist for every stage regardless of the DS flag
            # so checkpoints round-trip; heads are cheap 1x1 convs.
            seg = nn.Conv(self.num_classes, (1,) * dim, strides=(1,) * dim,
                          padding="VALID", use_bias=True,
                          kernel_init=he_normal_init(self.nonlin_negative_slope),
                          dtype=self.dtype, name=f"seg_head_{s - 1}")(x)
            seg_outputs.append(seg.astype(jnp.float32))
            lres_input = x

        seg_outputs = seg_outputs[::-1]  # highest resolution first
        if deep_supervision:
            return tuple(seg_outputs)
        return seg_outputs[0]


class PlainConvUNet(nn.Module):
    """The nnU-Net workhorse (and, width-reduced, the LiteNNUNetStudent —
    ref nnUNetDistillationTrainer.py:74-177)."""
    input_channels: int
    n_stages: int
    features_per_stage: Sequence[int]
    kernel_sizes: Sequence
    strides: Sequence
    n_conv_per_stage: Sequence[int]
    num_classes: int
    n_conv_per_stage_decoder: Sequence[int]
    conv_bias: bool = True
    norm_eps: float = 1e-5
    norm_kind: str = "instance"
    nonlin_negative_slope: float = 0.01
    dim: int = 3
    dtype: Optional[jnp.dtype] = None
    remat: Union[bool, str] = False  # False | True | "encoder"

    def setup(self):
        ks = _as_tuples(self.kernel_sizes, self.n_stages, self.dim)
        st = _as_tuples(self.strides, self.n_stages, self.dim)
        self.encoder = PlainConvEncoder(
            n_stages=self.n_stages, features_per_stage=self.features_per_stage,
            kernel_sizes=ks, strides=st, n_conv_per_stage=self.n_conv_per_stage,
            conv_bias=self.conv_bias, norm_eps=self.norm_eps,
            norm_kind=self.norm_kind,
            nonlin_negative_slope=self.nonlin_negative_slope, dtype=self.dtype,
            remat=self.remat)
        self.decoder = UNetDecoder(
            num_classes=self.num_classes, features_per_stage=self.features_per_stage,
            kernel_sizes=ks, strides=st,
            n_conv_per_stage_decoder=self.n_conv_per_stage_decoder,
            conv_bias=self.conv_bias, norm_eps=self.norm_eps,
            norm_kind=self.norm_kind,
            nonlin_negative_slope=self.nonlin_negative_slope, dtype=self.dtype,
            remat=self.remat)

    def __call__(self, x: Array, deep_supervision: bool = False):
        skips = self.encoder(x)
        return self.decoder(skips, deep_supervision=deep_supervision)


class ResidualEncoderUNet(nn.Module):
    """ResEnc U-Net (and, reduced, the LiteResEncStudent —
    ref nnUNetDistillationTrainer.py:180-274)."""
    input_channels: int
    n_stages: int
    features_per_stage: Sequence[int]
    kernel_sizes: Sequence
    strides: Sequence
    n_blocks_per_stage: Sequence[int]
    num_classes: int
    n_conv_per_stage_decoder: Sequence[int]
    conv_bias: bool = True
    norm_eps: float = 1e-5
    norm_kind: str = "instance"
    nonlin_negative_slope: float = 0.01
    dim: int = 3
    dtype: Optional[jnp.dtype] = None
    remat: Union[bool, str] = False  # False | True | "encoder"

    def setup(self):
        ks = _as_tuples(self.kernel_sizes, self.n_stages, self.dim)
        st = _as_tuples(self.strides, self.n_stages, self.dim)
        self.encoder = ResidualEncoder(
            n_stages=self.n_stages, features_per_stage=self.features_per_stage,
            kernel_sizes=ks, strides=st, n_blocks_per_stage=self.n_blocks_per_stage,
            conv_bias=self.conv_bias, norm_eps=self.norm_eps,
            norm_kind=self.norm_kind,
            nonlin_negative_slope=self.nonlin_negative_slope, dtype=self.dtype,
            remat=self.remat)
        self.decoder = UNetDecoder(
            num_classes=self.num_classes, features_per_stage=self.features_per_stage,
            kernel_sizes=ks, strides=st,
            n_conv_per_stage_decoder=self.n_conv_per_stage_decoder,
            conv_bias=self.conv_bias, norm_eps=self.norm_eps,
            norm_kind=self.norm_kind,
            nonlin_negative_slope=self.nonlin_negative_slope, dtype=self.dtype,
            remat=self.remat)

    def __call__(self, x: Array, deep_supervision: bool = False):
        skips = self.encoder(x)
        return self.decoder(skips, deep_supervision=deep_supervision)
