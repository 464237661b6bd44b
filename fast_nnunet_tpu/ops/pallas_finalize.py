"""Pallas TPU kernel for the s2d sweep's finalize: per-offset argmax over the
flat offset-major accumulator, with NO relayout copy.

Why: XLA lowers `acc.reshape(n, Yh, Zh, 8, K).argmax(-1)` by first copying
the whole accumulator slice into a Zh-minor layout (the compiled HLO prices
that copy at ~44 ms and the variadic argmax reduce at ~23 ms per chunk —
~0.8 s of the 11.1 s sweep). The reduced dim (K = 61 classes) lives INSIDE
the flat 8K-lane dim at offsets o*K..(o+1)*K, so the argmax can run directly
on the native (…, 8K) layout: per offset group, mask lanes outside the group
to -inf with a lane-iota window (no unaligned lane slicing, no DMA
constraints) and take max + first-match-min-index over the full lane width.

Output layout is (n, 8, Yh, Zh) uint8 — offset planes in a leading dim so
the kernel writes whole (Yh, Zh) blocks; the engine's depth-to-space revert
transposes from there exactly as it did from (n, Yh, Zh, 8) (offset
linearization o = (dx*2+dy)*2+dz, models/s2d.py:_olin).

Works on both accumulator flavors: bf16 (the default XLA sweep) and f32
padded to a 128-multiple lane count (the fused Pallas accumulate path,
ops/pallas_s2d.py — pad lanes hold exactly 0 and are excluded by the group
window, never by data values).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(acc_ref, out_ref, *, K: int, c8p: int, yb: int, Zh: int):
    x = acc_ref[0]                                     # (yb, Zh, c8p)
    lane = jax.lax.broadcasted_iota(jnp.int32, (yb, Zh, c8p), 2)
    neg = jnp.finfo(x.dtype).min
    for o in range(8):
        lo = o * K
        win = (lane >= lo) & (lane < lo + K)
        g = jnp.where(win, x, neg)
        m = jnp.max(g, axis=-1, keepdims=True)
        # first-match index within the group (ties -> lowest class, matching
        # jnp.argmax); non-max / out-of-window lanes propose K
        idx = jnp.where(win & (g == m), lane - lo, K)
        out_ref[0, o] = jnp.min(idx, axis=-1).astype(jnp.uint8)


def grouped_argmax(acc: jnp.ndarray, num_classes: int, n_rows: int,
                   *, y_block: int = 8, interpret: bool = False
                   ) -> jnp.ndarray:
    """Per-offset argmax over a flat offset-major s2d accumulator.

    acc: (p0h, Yh, Zh, c8p) bf16/f32, lanes [o*K, (o+1)*K) = class logits of
         offset group o; lanes >= 8K are padding (ignored).
    num_classes: K.
    n_rows: leading rows to finalize (static; rows beyond are not read).
    Returns (n_rows, 8, Yh, Zh) uint8 argmax classes.
    """
    p0h, Yh, Zh, c8p = acc.shape
    assert 8 * num_classes <= c8p and n_rows <= p0h
    assert Yh % y_block == 0, (Yh, y_block)
    kernel = functools.partial(_kernel, K=num_classes, c8p=c8p, yb=y_block,
                               Zh=Zh)
    return pl.pallas_call(
        kernel,
        grid=(n_rows, Yh // y_block),
        in_specs=[pl.BlockSpec((1, y_block, Zh, c8p),
                               lambda i, j: (i, j, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, y_block, Zh),
                               lambda i, j: (i, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct((n_rows, 8, Yh, Zh), jnp.uint8),
        interpret=interpret,
    )(acc)
