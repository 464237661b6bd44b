"""Primus: pure-transformer 3D segmentation (capability parity with the
reference's Primus S/B/M/L trainers, ref distillation/nnunetv2/training/
nnUNetTrainer/primus/primus_trainers.py:18-324, which use
dynamic_network_architectures.architectures.primus.Primus).

TPU-native design: 8^3 patch-embed tokens feed standard pre-LN transformer
blocks (MHSA with qk layer-scaling, SwiGLU MLP, LayerScale, stochastic depth),
with 3D axial rotary position embeddings; the decoder is a light transposed-conv
stack back to full resolution. Attention shapes are MXU-friendly: token count =
prod(patch)/512 (e.g. 2048 for 128^3), head dims multiples of 64 where the
configs allow.
"""
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jnp.ndarray


def _rope_freqs(dim: int, length: int, base: float = 100.0) -> np.ndarray:
    """(length, dim/2) angles for one axis."""
    half = dim // 2
    inv = 1.0 / (base ** (np.arange(half) / max(half, 1)))
    t = np.arange(length)
    return np.outer(t, inv)  # (length, half)


def make_3d_rope(grid: Tuple[int, int, int], head_dim: int) -> np.ndarray:
    """Axial 3D RoPE: the head dim is split into 3 equal parts (padded), each
    rotated by its axis coordinate. Returns (tokens, head_dim/2) angles."""
    part = head_dim // 6 * 2  # per-axis rotary dim (even)
    angles = []
    for ax, g in enumerate(grid):
        a = _rope_freqs(part, g)  # (g, part/2)
        shape = [1, 1, 1, a.shape[1]]
        shape[ax] = g
        a = a.reshape(shape)
        a = np.broadcast_to(a, (*grid, a.shape[-1]))
        angles.append(a.reshape(-1, a.shape[-1]))
    full = np.concatenate(angles, axis=-1)  # (tokens, 3*part/2)
    pad = head_dim // 2 - full.shape[-1]
    if pad > 0:
        full = np.concatenate([full, np.zeros((full.shape[0], pad))], -1)
    return full  # (tokens, head_dim//2)


def apply_rope(x: Array, angles: Array) -> Array:
    """x: (B, T, H, hd); angles: (T, hd/2)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    cos = jnp.cos(angles)[None, :, None, :]
    sin = jnp.sin(angles)[None, :, None, :]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], -1)


class EvaAttention(nn.Module):
    embed_dim: int
    num_heads: int
    scale_attn_inner: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, rope_angles: Optional[Array]) -> Array:
        B, T, C = x.shape
        H = self.num_heads
        hd = C // H
        qkv = nn.Dense(3 * C, use_bias=True, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, T, 3, H, hd), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]  # (B, T, H, hd)
        if self.scale_attn_inner:
            # qk-norm (EVA02-style inner scaling): normalize q/k per head
            q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6)
            k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-6)
            scale = self.param("attn_temperature", nn.initializers.constant(10.0),
                               (H, 1, 1), jnp.float32)
        else:
            scale = 1.0 / math.sqrt(hd)
        if rope_angles is not None:
            q = apply_rope(q, rope_angles)
            k = apply_rope(k, rope_angles)
        attn = jnp.einsum("bthd,bshd->bhts", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn * (scale if isinstance(scale, float) else scale[None])
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v)
        out = out.reshape(B, T, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwiGLU(nn.Module):
    embed_dim: int
    hidden_ratio: float = 8 / 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        hidden = int(self.embed_dim * self.hidden_ratio / 64) * 64 or 64
        a = nn.Dense(hidden, dtype=self.dtype, name="w1")(x)
        b = nn.Dense(hidden, dtype=self.dtype, name="w2")(x)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="w3")(
            nn.silu(a) * b)


class PrimusBlock(nn.Module):
    embed_dim: int
    num_heads: int
    init_values: float = 0.1
    drop_path_rate: float = 0.0
    scale_attn_inner: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, rope_angles, *, deterministic: bool = True) -> Array:
        ls1 = self.param("ls1", nn.initializers.constant(self.init_values),
                         (self.embed_dim,), jnp.float32)
        ls2 = self.param("ls2", nn.initializers.constant(self.init_values),
                         (self.embed_dim,), jnp.float32)
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = EvaAttention(self.embed_dim, self.num_heads, self.scale_attn_inner,
                        self.dtype, name="attn")(h, rope_angles)
        x = x + self._drop_path(h * ls1, deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = SwiGLU(self.embed_dim, dtype=self.dtype, name="mlp")(h)
        x = x + self._drop_path(h * ls2, deterministic)
        return x

    def _drop_path(self, x: Array, deterministic: bool) -> Array:
        if deterministic or self.drop_path_rate == 0.0:
            return x
        keep = 1.0 - self.drop_path_rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1))
        return x * mask / keep


class Primus(nn.Module):
    """input (B, *patch, C_in) -> logits (B, *patch, K). Patch size must be
    divisible by the token size (8 by default), like the reference."""
    input_channels: int
    embed_dim: int
    patch_embed_size: Tuple[int, int, int]
    num_classes: int
    depth: int
    num_heads: int
    patch_size: Tuple[int, int, int]
    drop_path_rate: float = 0.2
    scale_attn_inner: bool = True
    init_values: float = 0.1
    use_rope: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, deep_supervision: bool = False,
                 *, deterministic: bool = True):
        pe = tuple(self.patch_embed_size)
        grid = tuple(p // e for p, e in zip(self.patch_size, pe))
        assert all(p % e == 0 for p, e in zip(self.patch_size, pe)), \
            f"patch {self.patch_size} not divisible by token size {pe}"

        # patch embed
        h = nn.Conv(self.embed_dim, kernel_size=pe, strides=pe, padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        B = h.shape[0]
        tokens = h.reshape(B, -1, self.embed_dim)

        pos = self.param("pos_embed",
                         nn.initializers.truncated_normal(0.02),
                         (1, tokens.shape[1], self.embed_dim), jnp.float32)
        tokens = tokens + pos.astype(tokens.dtype)

        hd = self.embed_dim // self.num_heads
        rope = jnp.asarray(make_3d_rope(grid, hd), jnp.float32) \
            if self.use_rope else None

        for i in range(self.depth):
            rate = self.drop_path_rate * i / max(self.depth - 1, 1)
            tokens = PrimusBlock(self.embed_dim, self.num_heads,
                                 self.init_values, rate, self.scale_attn_inner,
                                 self.dtype, name=f"block_{i}")(
                tokens, rope, deterministic=deterministic)
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm")(tokens)

        # decoder: token grid -> transposed-conv upsampling to full resolution
        h = tokens.reshape(B, *grid, self.embed_dim)
        ch = self.embed_dim
        up_total = pe
        n_ups = int(np.log2(max(up_total)))
        for i in range(n_ups):
            stride = tuple(2 if (u >> i) > 1 else 1 for u in up_total)
            ch = max(ch // 2, 32)
            h = nn.ConvTranspose(ch, kernel_size=stride, strides=stride,
                                 padding="VALID", dtype=self.dtype,
                                 name=f"up_{i}")(h)
            h = nn.LayerNorm(dtype=self.dtype, name=f"up_norm_{i}")(h)
            h = nn.gelu(h)
        logits = nn.Conv(self.num_classes, (1, 1, 1), padding="VALID",
                         dtype=self.dtype, name="seg_head")(h)
        logits = logits.astype(jnp.float32)
        if deep_supervision:
            return (logits,)
        return logits
