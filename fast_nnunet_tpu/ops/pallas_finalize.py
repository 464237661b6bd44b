"""Pallas TPU kernel for the s2d sweep's finalize: per-offset argmax over the
flat offset-major accumulator, with NO relayout copy — plus the cyclic-
accumulator bookkeeping that deletes the per-chunk shift entirely.

Why: XLA lowers `acc.reshape(n, Yh, Zh, 8, K).argmax(-1)` by first copying
the whole accumulator slice into a Zh-minor layout (the compiled HLO prices
that copy at ~44 ms and the variadic argmax reduce at ~23 ms per chunk) and
then pays a pad+slice concatenate (~78 ms/chunk) to roll the accumulator
down between chunks — together ~1.7 s of the 11.1 s sweep. The reduced dim
(K = 61 classes) lives INSIDE the flat 8K-lane dim at offsets o*K..(o+1)*K,
so the argmax can run directly on the native (…, 8K) layout: per offset
group, mask lanes outside the group to -inf with a lane-iota window (no
unaligned lane slicing, no DMA constraints) and take max +
first-match-min-index over the full lane width.

Cyclic accumulator: with `row_base`/`n_zero`, virtual row i reads physical
row (row_base + i) % p0h (dynamic block index via scalar prefetch), and the
first n_zero virtual rows — the ones the sweep retires this chunk — are
written back as zeros through an aliased accumulator output. The engine then
advances row_base instead of physically shifting 3-6 GB of accumulator
(ops/pallas_s2d.py's accumulate kernel applies the same modular row
mapping).

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


def _kernel(scal_ref, acc_ref, cls_ref, *maybe_acc_out,
            K: int, c8p: int, yb: int, Zh: int):
    x = acc_ref[0]                                     # (yb, Zh, c8p)
    xf = x.astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (yb, Zh, c8p), 2)
    for o in range(8):
        lo = o * K
        win = (lane >= lo) & (lane < lo + K)
        g = jnp.where(win, xf, jnp.float32(-3.4e38))
        m = jnp.max(g, axis=-1, keepdims=True)
        # first-match argmax WITHOUT the `g == m` broadcast compare: Mosaic
        # cannot relayout the i1 mask of a compare against a lane-reduced
        # (replicated-layout) operand ("Invalid relayout: non-singleton
        # logical dimension is replicated in destination but not in source",
        # v5e hardware; interpret mode doesn't exercise layouts). Arithmetic
        # instead: diff = m - g is >= 0 and == 0 exactly at max positions;
        # TPUs flush subnormals, so any non-tie diff is a NORMAL f32
        # (>= 1.18e-38) and two 1e20 factors saturate it past 1 — step is 0
        # at ties, 1 elsewhere, reproducing jnp.argmax's lowest-index rule.
        # The clamp sits BETWEEN the factors: XLA constant-folds
        # `x * 1e20 * 1e20` to `x * inf` and `0 * inf` is NaN at the very
        # positions we care about
        step = jnp.minimum(jnp.minimum((m - g) * 1e20, 1.0) * 1e20, 1.0)
        idxf = (lane - lo).astype(jnp.float32) + step * K
        idxf = jnp.where(win, idxf, jnp.float32(K))
        # Mosaic has no f32->u8 cast; go through i32 (hardware-verified)
        cls_ref[0, o] = jnp.min(idxf, axis=-1).astype(jnp.int32).astype(
            jnp.uint8)
    if maybe_acc_out:
        # retire consumed rows: zero the first n_zero VIRTUAL rows in place
        # (aliased output); later rows write back unchanged
        n_zero = scal_ref[1]
        zero = pl.program_id(0) < n_zero
        maybe_acc_out[0][0] = jnp.where(zero, jnp.zeros_like(x), x)


def grouped_argmax(acc: jnp.ndarray, num_classes: int, n_rows: int,
                   row_base=0, n_zero=None, *, y_block: int = 8,
                   interpret: bool = False):
    """Per-offset argmax over a flat offset-major s2d accumulator.

    acc: (p0h, Yh, Zh, c8p) bf16/f32, lanes [o*K, (o+1)*K) = class logits of
         offset group o; lanes >= 8K are padding (ignored).
    num_classes: K.
    n_rows: leading VIRTUAL rows to finalize (static; others are not read).
    row_base: scalar int32 — virtual row i is physical (row_base + i) % p0h.
    n_zero: when not None (dynamic scalar ok), also zero the first n_zero
            virtual rows and return (cls, new_acc); the caller must use the
            returned accumulator (aliased buffer).
    Returns (n_rows, 8, Yh, Zh) uint8 argmax classes (+ acc when zeroing).
    """
    p0h, Yh, Zh, c8p = acc.shape
    assert 8 * num_classes <= c8p and n_rows <= p0h
    assert Yh % y_block == 0, (Yh, y_block)
    zeroing = n_zero is not None
    scal = jnp.stack([jnp.asarray(row_base, jnp.int32).reshape(()),
                      jnp.asarray(n_zero if zeroing else 0,
                                  jnp.int32).reshape(())])
    kernel = functools.partial(_kernel, K=num_classes, c8p=c8p, yb=y_block,
                               Zh=Zh)

    def acc_map(i, j, s):
        return (jax.lax.rem(s[0] + i, p0h), j, 0, 0)

    out_shape = [jax.ShapeDtypeStruct((n_rows, 8, Yh, Zh), jnp.uint8)]
    out_specs = [pl.BlockSpec((1, 8, y_block, Zh),
                              lambda i, j, s: (i, 0, j, 0))]
    aliases = {}
    if zeroing:
        out_shape.append(jax.ShapeDtypeStruct(acc.shape, acc.dtype))
        out_specs.append(pl.BlockSpec((1, y_block, Zh, c8p), acc_map))
        aliases = {1: 1}  # acc input (after the scalar operand) -> output 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_rows, Yh // y_block),
        in_specs=[pl.BlockSpec((1, y_block, Zh, c8p), acc_map)],
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        # explicit headroom: Mosaic's scoped demand (per-offset temporaries
        # x 8 groups + pipelined blocks) exceeds an undersized default and
        # fails the custom call's XLA stack allocation (v5e round-4 probe)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scal, acc)
    return tuple(out) if zeroing else out[0]
