"""Pallas TPU kernel for InstanceNorm statistics: one-pass per-(batch,
channel) spatial sum + sum-of-squares at HBM bandwidth.

Why: the round-3 device trace of the s2d sweep attributes ~2.7 s of the
11.1 s device time to reduce fusions, and the compiled HLO's own cost model
prices each full-res stat reduce at ~21 ms (`convert_reduce_fusion`,
f32[8,128] out of a (8,48,48,80,128) bf16 activation) — ~1% of the chip's
HBM bandwidth for what is a single streaming pass. XLA emits the mean and
the variance as separate multi-pass reduction trees and does not fuse them
into the producing convolution on this backend (the round-3 MXU-Gram and
single-pass E[x^2] experiments both traced SLOWER — see
docs/Performance.md). This kernel streams the activation once through VMEM
(double-buffered block DMA) and accumulates both moments in f32 on the VPU.

Numerics: sums accumulate in f32 over bf16 inputs (strictly at-or-above the
XLA path, which also converts to f32 before reducing). Variance is then
E[x^2] - E[x]^2 on (B, C)-sized scalars — the same cancellation class the
shipped grouped-pooling identity already uses (models/s2d.py
`_instance_norm`: Var = E_g[var_c + mean_c^2] - mean_g^2).

Ref role: the reference's InstanceNorm runs inside cuDNN/TensorRT fused
blocks (SURVEY §2.2 C1/C4); this is the TPU-native equivalent of that
fusion for the stat pass.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, s_ref, q_ref, *, S: int, bs: int, B: int):
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, j == 0))
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)
        q_ref[...] = jnp.zeros_like(q_ref)

    xf = x_ref[0].astype(jnp.float32)  # (bs, C)
    if S % bs:
        # tail block: rows past S are undefined padding — zero them out
        rows = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 0) + j * bs
        xf = jnp.where(rows < S, xf, 0.0)
    # outputs live as ONE (B, C) VMEM block across the whole grid (Mosaic's
    # tile rule forbids (1, C) sub-blocks: the second-minor dim must be a
    # multiple of 8 or the full array extent — hardware lowering rejected
    # the per-row block spec). Accumulate into row b via a one-hot mask;
    # (B, C) is tiny (tile_batch x channels) so the masked add is free.
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0) == b
              ).astype(jnp.float32)
    s_ref[...] += onehot * jnp.sum(xf, axis=0)[None, :]
    q_ref[...] += onehot * jnp.sum(xf * xf, axis=0)[None, :]


def spatial_sum_sumsq(x: jnp.ndarray, *, interpret: bool = False):
    """Per-(batch, channel) sum and sum-of-squares over all spatial dims.

    x: (B, *spatial, C), any float dtype (bf16 expected on the hot path).
    Returns (sum, sumsq), both (B, C) float32, computed in one HBM pass.
    """
    B, C = x.shape[0], x.shape[-1]
    S = 1
    for d in x.shape[1:-1]:
        S *= int(d)
    x2 = x.reshape(B, S, C)
    # block rows: multiple of the sublane tile; large enough to amortize DMA
    bs = min(-(-S // 8) * 8, 1024)
    grid = (B, -(-S // bs))
    kernel = functools.partial(_kernel, S=S, bs=bs, B=B)
    s, q = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, bs, C), lambda b, j: (b, j, 0))],
        out_specs=[pl.BlockSpec((B, C), lambda b, j: (0, 0)),
                   pl.BlockSpec((B, C), lambda b, j: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, C), jnp.float32)],
        interpret=interpret,
    )(x2)
    return s, q
