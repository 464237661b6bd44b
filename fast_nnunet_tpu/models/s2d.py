"""Space-to-depth inference transform for PlainConvUNet — the TPU answer to
TensorRT's kernel auto-tuning on narrow-channel stages.

XLA pads conv channels to the MXU's 128 lanes, so the full-resolution stages
of a distilled student (C = 8..32) run at a *lane-padded floor*: a
(96,96,160,16)->16 3^3 conv costs like a 128-wide one (measured 5.8 ms on
v5e; experiments/bench_s2d_conv.py). Space-to-depth re-expresses the same
math one octave down: group 2x2x2 voxel blocks into channels, so the stage-0
convs become (48,48,80,128)->128 3^3 convs (measured 2.6 ms — 2.2x, and 2.4x
at the sweep's B=8 operating point).

The transform is EXACT (same function, re-parameterized):

- full-res stride-1 3^3 conv  -> half-res stride-1 3^3 conv, 8Ci -> 8Co
  (kernel taps redistributed across block offsets; out-of-window taps zero)
- full-res stride-2 3^3 conv  -> half-res stride-1 2^3 conv, 8Ci -> Co
  (the downsample; output grid == the s2d block grid)
- k=2 s=2 transposed conv     -> half-res 1^3 conv, Ci -> 8Co
- 1^3 seg head                -> per-offset grouped matmul
- InstanceNorm over full-res spatial == norm over (half-res spatial x 8
  offsets) per logical channel; LeakyReLU is elementwise in any layout.

Only the outermost octave is transformed: at C=32+ the conv is already at or
near lane width and s2d shows no win (stage-1 measured 1.06x).

Inference-only (used by the sliding-window engine / export); training keeps
the plain layout. Requires even patch dims (nnU-Net patches always are).
"""
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

_OFFSETS = [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]


def _olin(o) -> int:
    return (o[0] * 2 + o[1]) * 2 + o[2]


# ------------------------------------------------------------------ layout ops
def space_to_depth(x: Array) -> Array:
    """(B, X, Y, Z, C) -> (B, X/2, Y/2, Z/2, 8C), offset-major channel groups."""
    B, X, Y, Z, C = x.shape
    x = x.reshape(B, X // 2, 2, Y // 2, 2, Z // 2, 2, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(B, X // 2, Y // 2, Z // 2, 8 * C)


def depth_to_space(x: Array) -> Array:
    """Inverse of space_to_depth."""
    B, X2, Y2, Z2, C8 = x.shape
    C = C8 // 8
    x = x.reshape(B, X2, Y2, Z2, 2, 2, 2, C)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, X2 * 2, Y2 * 2, Z2 * 2, C)


# ------------------------------------------------------------ kernel transforms
def expand_kernel_stride1(W: np.ndarray) -> np.ndarray:
    """(3,3,3,Ci,Co) full-res stride-1 -> (3,3,3,8Ci,8Co) half-res stride-1.

    y[2P+o] = sum_t x[2P+o+t-1] W[t]; writing o+t-1 = 2d + o2 maps each
    (o, t) pair to s2d tap d+1 and input offset group o2."""
    W = np.asarray(W)
    Ci, Co = W.shape[3], W.shape[4]
    out = np.zeros((3, 3, 3, 8, Ci, 8, Co), W.dtype)
    for o in _OFFSETS:
        for t in np.ndindex(3, 3, 3):
            u = np.array(t) - 1 + np.array(o)
            d, o2 = u // 2, u % 2
            out[d[0] + 1, d[1] + 1, d[2] + 1, _olin(o2), :, _olin(o), :] = W[t]
    return out.reshape(3, 3, 3, 8 * Ci, 8 * Co)


def expand_kernel_downsample(W: np.ndarray) -> np.ndarray:
    """(3,3,3,Ci,Co) full-res stride-2 -> (2,2,2,8Ci,Co) half-res stride-1
    with per-axis padding (1, 0). y[P] = sum_t x[2P+t-1] W[t]; t-1 = 2d+o2."""
    W = np.asarray(W)
    Ci, Co = W.shape[3], W.shape[4]
    out = np.zeros((2, 2, 2, 8, Ci, Co), W.dtype)
    for t in np.ndindex(3, 3, 3):
        u = np.array(t) - 1
        d, o2 = u // 2, u % 2
        out[d[0] + 1, d[1] + 1, d[2] + 1, _olin(o2), :, :] = W[t]
    return out.reshape(2, 2, 2, 8 * Ci, Co)


def expand_kernel_transpconv(K: np.ndarray) -> np.ndarray:
    """(2,2,2,Ci,Co) k=2 s=2 transposed conv -> (1,1,1,Ci,8Co) half-res conv:
    each input voxel emits one full-res 2^3 block (= one s2d channel group).
    flax/lax conv_transpose applies the kernel mirrored: out[2P+o] uses tap
    K[1-o] (verified by impulse response)."""
    K = np.asarray(K)
    Ci, Co = K.shape[3], K.shape[4]
    out = np.zeros((1, 1, 1, Ci, 8, Co), K.dtype)
    for o in _OFFSETS:
        out[0, 0, 0, :, _olin(o), :] = K[1 - o[0], 1 - o[1], 1 - o[2]]
    return out.reshape(1, 1, 1, Ci, 8 * Co)


def tile_bias(b: np.ndarray) -> np.ndarray:
    """Per-logical-channel bias -> per-(offset, channel) bias."""
    return np.tile(np.asarray(b), 8)


def expand_seg_head(W: np.ndarray) -> np.ndarray:
    """(1,1,1,F,K) 1^3 seg head -> block-diagonal (8F, 8K) matmul applied to
    the flat offset-major activations. Measured on hardware (round 3): the
    grouped form `x.reshape(..., 8, F) @ W` makes XLA lay the result out with
    K (61 -> 128 lanes, 2.1x pad) minor and then pay a whole-tensor layout
    copy + per-tile slice fusions (~2.5 s of the 15.9 s sweep device time);
    the dense block-diagonal matmul emits the flat (…, 8K) layout the
    accumulator wants directly. The extra structural-zero MACs are free —
    convolutions are 0.3% of sweep device time."""
    W = np.asarray(W)
    F, K = W.shape[3], W.shape[4]
    out = np.zeros((8 * F, 8 * K), W.dtype)
    for o in range(8):
        out[o * F:(o + 1) * F, o * K:(o + 1) * K] = W[0, 0, 0]
    return out


# ------------------------------------------------------------------ forward ops
def _conv(x: Array, kernel: Array, bias: Optional[Array], strides, padding,
          dtype) -> Array:
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), jnp.asarray(kernel, dtype), tuple(strides), padding,
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    if bias is not None:
        y = y + jnp.asarray(bias, dtype)
    return y


def _transpconv(x: Array, kernel: Array, bias: Optional[Array], strides,
                dtype) -> Array:
    y = jax.lax.conv_transpose(
        x.astype(dtype), jnp.asarray(kernel, dtype), tuple(strides), "VALID",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    if bias is not None:
        y = y + jnp.asarray(bias, dtype)
    return y


def _instance_norm(x: Array, scale: Array, bias: Array, eps: float,
                   groups: int = 1, pallas_stats: bool = False) -> Array:
    """InstanceNorm over spatial dims; with groups=8, channels are (offset,
    logical) pairs and statistics pool over the offset axis too, exactly
    reproducing full-resolution InstanceNorm in the s2d layout.

    pallas_stats=True computes the two moments with the one-HBM-pass Pallas
    kernel (ops/pallas_stats.py) instead of XLA's reduce fusions — the
    round-3 trace prices those at ~1% of HBM bandwidth on the big full-res
    activations (see the kernel docstring). Small activations (< 4096
    spatial voxels) keep the XLA path: per-call overhead would dominate."""
    orig = x.dtype
    B = x.shape[0]
    c8 = x.shape[-1]
    c = c8 // groups
    n_spatial = 1
    for d in x.shape[1:-1]:
        n_spatial *= int(d)
    if pallas_stats and n_spatial >= 4096:
        from ..ops.pallas_stats import spatial_sum_sumsq
        interpret = jax.default_backend() not in ("tpu", "axon")
        s, q = spatial_sum_sumsq(x, interpret=interpret)     # (B, c8) f32
        n = n_spatial * groups
        s = s.reshape(B, groups, c).sum(1)
        q = q.reshape(B, groups, c).sum(1)
        mean_g = s / n                                       # (B, c)
        var_g = jnp.maximum(q / n - mean_g * mean_g, 0.0)
        shape = (B,) + (1,) * (x.ndim - 2) + (c8,)
        m = jnp.tile(mean_g, (1, groups)).reshape(shape)
        r = jnp.tile(jax.lax.rsqrt(var_g + eps), (1, groups)).reshape(shape)
        y = (x.astype(jnp.float32) - m) * r
        y = y * jnp.tile(jnp.asarray(scale), groups) \
            + jnp.tile(jnp.asarray(bias), groups)
        return y.astype(orig)
    if groups == 1:
        x32 = x.astype(jnp.float32).reshape(B, -1, groups, c)
        # measured on hardware (round 3): the E[x]/E[x^2] single-pass variant
        # did NOT fuse into one read on this XLA version and profiled slower
        # (reduce fusions 1.9 -> 3.8 s) — keep mean/var
        mean = x32.mean(axis=(1, 2), keepdims=True)
        var = x32.var(axis=(1, 2), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        y = y * scale + bias
        return y.reshape(x.shape).astype(orig)
    # grouped stats in the NATIVE (..., groups*c) layout: per-channel spatial
    # reductions (which XLA fuses into the producing conv) pooled over the
    # offset axis on (B, C)-sized scalars. The former (B, S, groups, c)
    # reshape split the channel dim below lane width and forced a whole-
    # activation fp32 relayout copy per norm (traced ~0.2 s each, round 3).
    # Pooling identities: E over (S x G) = mean over G of per-channel means;
    # Var = E_g[var_c + mean_c^2] - mean_g^2.
    x32 = x.astype(jnp.float32)
    red = tuple(range(1, x.ndim - 1))
    mean_c = x32.mean(red)                                    # (B, G*c)
    var_c = x32.var(red)                                      # (B, G*c)
    mean_g = mean_c.reshape(B, groups, c).mean(1)             # (B, c)
    var_g = ((var_c + mean_c * mean_c).reshape(B, groups, c).mean(1)
             - mean_g * mean_g)
    shape = (B,) + (1,) * (x.ndim - 2) + (c8,)
    m = jnp.tile(mean_g, (1, groups)).reshape(shape)
    r = jnp.tile(jax.lax.rsqrt(var_g + eps), (1, groups)).reshape(shape)
    y = (x32 - m) * r
    y = y * jnp.tile(jnp.asarray(scale), groups) \
        + jnp.tile(jnp.asarray(bias), groups)
    return y.astype(orig)


def _lrelu(x: Array, slope: float) -> Array:
    return jnp.where(x >= 0, x, x * slope)


# ------------------------------------------------------------------ the module
class S2DPlainConvUNet:
    """Inference-time s2d re-parameterization of a trained PlainConvUNet.

    Duck-types the network protocol the sliding-window engine needs
    (``apply(params, x, deep_supervision=False)``); consumes the params tree
    produced by :meth:`convert_params` (the original tree with the outer-octave
    kernels re-laid-out)."""

    def __init__(self, n_stages: int, features_per_stage: Sequence[int],
                 n_conv_per_stage: Sequence[int],
                 n_conv_per_stage_decoder: Sequence[int],
                 num_classes: int, strides: Sequence[Sequence[int]],
                 kernel_sizes: Sequence[Sequence[int]],
                 norm_eps: float = 1e-5, nonlin_negative_slope: float = 0.01,
                 dtype=jnp.bfloat16, use_pallas_stats: bool = False):
        self.n_stages = n_stages
        self.features = list(features_per_stage)
        self.n_conv = list(n_conv_per_stage)
        self.n_conv_dec = list(n_conv_per_stage_decoder)
        self.num_classes = num_classes
        self.strides = [tuple(s) for s in strides]
        self.kernels = [tuple(k) for k in kernel_sizes]
        self.eps = norm_eps
        self.slope = nonlin_negative_slope
        self.dtype = dtype
        self.use_pallas_stats = use_pallas_stats

    # -------------------------------------------------------------- eligibility
    @staticmethod
    def supports(arch_kwargs: dict) -> bool:
        """True when the outer octave matches the transformable pattern."""
        try:
            ks = [tuple(k) for k in arch_kwargs["kernel_sizes"]]
            st = [tuple(s) for s in arch_kwargs["strides"]]
        except (KeyError, TypeError):
            return False
        return (len(ks[0]) == 3 and ks[0] == (3, 3, 3) and ks[1] == (3, 3, 3)
                and st[0] == (1, 1, 1) and st[1] == (2, 2, 2)
                and len(st) >= 2)

    # ---------------------------------------------------------- params convert
    def convert_params(self, params) -> dict:
        """Original flax params tree -> s2d tree (host-side, once per fold)."""
        p = jax.device_get(params)["params"]
        enc, dec = p["encoder"], p["decoder"]
        out_enc, out_dec = {}, {}

        for s in range(self.n_stages):
            stage = dict(enc[f"stage_{s}"])
            if s == 0:
                stage = {f"block_{i}": self._convert_block(
                    stage[f"block_{i}"], expand_kernel_stride1, tile=True)
                    for i in range(self.n_conv[0])}
            elif s == 1:
                stage = dict(stage)
                stage["block_0"] = self._convert_block(
                    stage["block_0"], expand_kernel_downsample, tile=False)
            out_enc[f"stage_{s}"] = stage

        last = self.n_stages - 2  # decoder indices of the full-res stage
        for name, val in dec.items():
            if name == f"transpconv_{last}":
                val = dict(val)
                val["kernel"] = expand_kernel_transpconv(val["kernel"])
                if "bias" in val:
                    val["bias"] = tile_bias(val["bias"])
            elif name == f"stage_{last}":
                val = {f"block_{i}": self._convert_block(
                    val[f"block_{i}"], expand_kernel_stride1, tile=True)
                    for i in range(self.n_conv_dec[last])}
            elif name == f"seg_head_{last}":
                val = dict(val)
                val["kernel"] = expand_seg_head(val["kernel"])
                if "bias" in val:
                    val["bias"] = tile_bias(val["bias"])
            out_dec[name] = val

        return {"params": {"encoder": out_enc, "decoder": out_dec}}

    @staticmethod
    def _convert_block(blk, kernel_fn, tile: bool):
        conv = dict(blk["conv"])
        conv["kernel"] = kernel_fn(conv["kernel"])
        if tile and "bias" in conv:
            conv["bias"] = tile_bias(conv["bias"])
        return {"conv": conv, "norm": blk["norm"]}

    # ------------------------------------------------------------------ forward
    def _block(self, x, blk, strides, padding, groups):
        x = _conv(x, blk["conv"]["kernel"], blk["conv"].get("bias"),
                  strides, padding, self.dtype)
        x = _instance_norm(x, blk["norm"]["scale"], blk["norm"]["bias"],
                           self.eps, groups=groups,
                           pallas_stats=self.use_pallas_stats)
        return _lrelu(x, self.slope)

    def apply(self, params, x: Array, deep_supervision: bool = False,
              s2d_output: bool = False, return_features: bool = False) -> Array:
        """s2d_output=True returns the seg head's HALF-RES (B, X/2, Y/2, Z/2,
        8K) tensor (offset-major groups) without the final depth_to_space —
        the s2d-domain sweep accumulates in this layout directly, so the
        8K = 488-channel accumulator lane-pads only 488->512 (1.05x)
        instead of the full-res (K+1)=62 -> 128 (2.1x)."""
        assert not deep_supervision, "s2d transform is inference-only"
        assert all(d % 2 == 0 for d in x.shape[1:4]), \
            f"s2d needs even spatial dims, got {x.shape}"
        p = params["params"]
        enc, dec = p["encoder"], p["decoder"]
        same3 = ((1, 1), (1, 1), (1, 1))

        x = space_to_depth(x)
        # stage 0 (s2d domain)
        for i in range(self.n_conv[0]):
            x = self._block(x, enc["stage_0"][f"block_{i}"], (1, 1, 1),
                            same3, groups=8)
        skip0 = x
        # stage 1: transformed downsample block, then plain blocks
        x = self._block(x, enc["stage_1"]["block_0"], (1, 1, 1),
                        ((1, 0), (1, 0), (1, 0)), groups=1)
        for i in range(1, self.n_conv[1]):
            x = self._block(x, enc["stage_1"][f"block_{i}"], (1, 1, 1),
                            self._same(self.kernels[1]), groups=1)
        skips = [None, x]  # skip0 kept separately in s2d layout
        # stages 2..
        for s in range(2, self.n_stages):
            for i in range(self.n_conv[s]):
                x = self._block(x, enc[f"stage_{s}"][f"block_{i}"],
                                self.strides[s] if i == 0 else (1, 1, 1),
                                self._same(self.kernels[s]), groups=1)
            skips.append(x)

        # decoder: plain until the full-res stage
        last = self.n_stages - 2
        for s in range(1, self.n_stages):
            d = s - 1
            if d < last:
                stride = self.strides[-s]
                x = _transpconv(x, dec[f"transpconv_{d}"]["kernel"],
                                dec[f"transpconv_{d}"].get("bias"), stride,
                                self.dtype)
                x = jnp.concatenate([x, skips[-(s + 1)].astype(x.dtype)], -1)
                for i in range(self.n_conv_dec[d]):
                    x = self._block(x, dec[f"stage_{d}"][f"block_{i}"],
                                    (1, 1, 1),
                                    self._same(self.kernels[-(s + 1)]),
                                    groups=1)
            else:
                # full-res stage, executed in the s2d domain
                x = _conv(x, dec[f"transpconv_{d}"]["kernel"],
                          dec[f"transpconv_{d}"].get("bias"), (1, 1, 1),
                          "VALID", self.dtype)
                x = _concat_grouped(x, skip0.astype(x.dtype))
                for i in range(self.n_conv_dec[d]):
                    x = self._block(x, dec[f"stage_{d}"][f"block_{i}"],
                                    (1, 1, 1), same3, groups=8)
                if return_features:
                    # pre-seg-head s2d activations (B, X/2, Y/2, Z/2, 8F).
                    # The 1^3 seg head commutes with tile slicing, so the
                    # sliding-window engine applies it PER TILE via
                    # :meth:`seg_head_apply` — materializing (B, ..., 8F)
                    # bf16 features instead of (B, ..., 8K) fp32 logits
                    # (0.38 vs 2.9 GB at bone_turbo scale) stops XLA from
                    # rematerializing the head matmul once per tile slice
                    # (traced: 7 remat copies, ~2.6 s device, round 3)
                    return x
                seg = _seg_head_grouped(
                    x, dec[f"seg_head_{d}"]["kernel"],
                    dec[f"seg_head_{d}"].get("bias"), self.num_classes)
                # stay in compute dtype: the engine casts to its accumulator
                # dtype anyway, and a fp32 (B,96,96,160,61) temp is ~3 GB HBM
                if s2d_output:
                    return seg
                return depth_to_space(seg)
        raise AssertionError("unreachable")

    def seg_head_apply(self, params, feats: Array) -> Array:
        """Apply the (block-diagonal) 1^3 seg head to pre-head s2d
        activations of any leading shape: (..., 8F) -> (..., 8K)."""
        kernel, bias = self.seg_head_params(params)
        return _seg_head_grouped(feats, kernel, bias, self.num_classes)

    def seg_head_params(self, params):
        """(kernel (8F, 8K), bias (8K,) or None) of the expanded
        block-diagonal seg head — the engine's fused Pallas accumulate
        (ops/pallas_s2d.py) applies the head inside its kernel."""
        last = self.n_stages - 2
        hd = params["params"]["decoder"][f"seg_head_{last}"]
        return hd["kernel"], hd.get("bias")

    @staticmethod
    def _same(kernel) -> Tuple[Tuple[int, int], ...]:
        return tuple((k // 2, k // 2) for k in kernel)


def _concat_grouped(a: Array, b: Array) -> Array:
    """Concat two s2d tensors along the LOGICAL channel axis (within each
    offset group)."""
    sp = a.shape[:-1]
    a8 = a.reshape(*sp, 8, a.shape[-1] // 8)
    b8 = b.reshape(*sp, 8, b.shape[-1] // 8)
    return jnp.concatenate([a8, b8], -1).reshape(
        *sp, a.shape[-1] + b.shape[-1])


def _seg_head_grouped(x: Array, kernel: Array, bias, num_classes: int) -> Array:
    """1^3 seg head: (..., 8F) -> (..., 8K) via the block-diagonal matmul
    prepared by :func:`expand_seg_head` (flat layout in, flat layout out)."""
    y = x @ jnp.asarray(kernel, x.dtype)
    if bias is not None:
        y = y + jnp.asarray(bias, x.dtype)
    return y


def make_s2d_engine_net(network, arch_kwargs: dict, num_classes: int,
                        dtype=jnp.bfloat16, use_pallas_stats=None):
    """Build the s2d companion of a PlainConvUNet from its arch kwargs.
    Returns None when the architecture doesn't match the transformable
    pattern (callers fall back to the plain network).

    use_pallas_stats: compute InstanceNorm moments with the one-pass Pallas
    kernel (ops/pallas_stats.py); None reads FNN_PALLAS_STATS (default off)."""
    if not S2DPlainConvUNet.supports(arch_kwargs):
        return None
    if use_pallas_stats is None:
        import os
        use_pallas_stats = os.environ.get("FNN_PALLAS_STATS", "0") == "1"
    return S2DPlainConvUNet(
        n_stages=arch_kwargs["n_stages"],
        features_per_stage=arch_kwargs["features_per_stage"],
        n_conv_per_stage=arch_kwargs["n_conv_per_stage"],
        n_conv_per_stage_decoder=arch_kwargs["n_conv_per_stage_decoder"],
        num_classes=num_classes,
        strides=arch_kwargs["strides"],
        kernel_sizes=arch_kwargs["kernel_sizes"],
        dtype=dtype, use_pallas_stats=use_pallas_stats)
