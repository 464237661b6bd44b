"""Pallas TPU kernels for the sliding-window hot path.

scatter_accumulate_zc: adds a batch of gaussian-weighted tile contributions into
the fused-channel accumulator at dynamic tile coordinates. This replaces the
chain of XLA dynamic_slice + add + dynamic_update_slice pairs in
inference/engine.py (the CUDA-kernel role of the reference's accumulation, ref
SURVEY §2.2 C4): each accumulator region is DMA'd HBM->VMEM once, updated on the
VPU, and written back once; the sequential TPU Pallas grid makes overlapping
tiles race-free.

Layout trick (the part that makes Mosaic happy without memory bloat): the
accumulator is stored with Z and channels FLATTENED into the minor dim,
(X, Y, Z*C). Mosaic requires sliced minor-dim offsets/extents to be multiples
of 128 (lane tiling): with C padded to a multiple of 8 and all z tile starts
multiples of 16 (the engine quantizes its grid), z0*C and pz*C are multiples of
128 — so C only pads (K+1) -> ceil/8*8 (e.g. 62 -> 64, 3% overhead) instead of
lane-padding to 128 (which doubles HBM for 61 classes and OOMs a v5e).
Sublane (Y) offsets are multiples of 16 by the same grid quantization.
"""
import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _divisor_at_most(n: int, cap: int, align: int = 1) -> int:
    best = 1
    for d in range(1, n + 1):
        if n % d == 0 and d <= cap and d % align == 0:
            best = max(best, d)
    return best


def _pick_sub(px: int, py: int, minor: int, itemsize: int,
              budget_bytes: int = 3 * 1024 * 1024,
              offset_align: int = 16) -> Tuple[int, int]:
    """(x_sub, y_sub) so one (x_sub, y_sub, minor) block stays under budget
    (~4 such buffers coexist: scratch + double-buffered contrib + margin)."""
    bytes_per_xy = minor * itemsize
    x_sub, y_sub = px, py
    while x_sub * y_sub * bytes_per_xy > budget_bytes and x_sub > 1:
        x_sub = _divisor_at_most(px, x_sub - 1)
    while x_sub * y_sub * bytes_per_xy > budget_bytes and y_sub > offset_align:
        cand = _divisor_at_most(py, y_sub - 1, offset_align)
        if cand == y_sub or cand < offset_align:
            break
        y_sub = cand
    return x_sub, y_sub


def _scatter_kernel(coords_ref, acc_in, contrib_ref, acc_out, scratch, sem,
                    *, offset_align: int, channels: int):
    # acc_in is aliased to acc_out (same HBM buffer); operate through acc_out
    del acc_in
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    x_sub, y_sub, minor = scratch.shape

    # Mosaic must statically prove tiled-dim offsets divisible; the engine
    # guarantees spatial coords are multiples of offset_align and channels is a
    # multiple of 8, so z0*channels is a multiple of 128
    x0 = pl.multiple_of(coords_ref[b, 0], offset_align) + i * x_sub
    y0 = pl.multiple_of(coords_ref[b, 1], offset_align) + j * y_sub
    zc0 = pl.multiple_of(coords_ref[b, 2] * channels, 128)

    region = acc_out.at[pl.ds(x0, x_sub), pl.ds(y0, y_sub), pl.ds(zc0, minor)]
    load = pltpu.make_async_copy(region, scratch, sem)
    load.start()
    load.wait()
    scratch[...] = scratch[...] + contrib_ref[0]
    store = pltpu.make_async_copy(scratch, region, sem)
    store.start()
    store.wait()


def scatter_accumulate(acc: jnp.ndarray, contrib: jnp.ndarray,
                       coords: jnp.ndarray, *, interpret: bool = False,
                       offset_align: int = 16) -> jnp.ndarray:
    """acc (X, Y, Z, C) += contrib (B, px, py, pz, C) at coords (B, 3).

    Returns the updated acc with the SAME (X, Y, Z, C) shape (internally
    flattened to (X, Y, Z*C) for the kernel). Overlapping tiles are handled
    correctly (sequential grid). contrib must already include validity masking.
    Requirements (the engine enforces both):
    - spatial tile coordinates are multiples of offset_align (>= 16)
    - C is a multiple of 8 (pad channels before calling)
    """
    B, px, py, pz, C = contrib.shape
    X, Y, Z, C2 = acc.shape
    assert C == C2 and coords.shape == (B, 3)
    assert C % 8 == 0, "pad channels to a multiple of 8 for the Pallas path"
    itemsize = jnp.dtype(acc.dtype).itemsize
    minor = pz * C
    x_sub, y_sub = _pick_sub(px, py, minor, itemsize, offset_align=offset_align)
    n_x = px // x_sub
    n_y = py // y_sub

    acc_flat = acc.reshape(X, Y, Z * C)
    contrib_flat = contrib.astype(acc.dtype).reshape(B, px, py, minor)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # coords
        grid=(B, n_x, n_y),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # acc stays in HBM
            pl.BlockSpec((1, x_sub, y_sub, minor),
                         lambda b, i, j, coords_ref: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((x_sub, y_sub, minor), acc.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_scatter_kernel, offset_align=offset_align,
                               channels=C)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(acc_flat.shape, acc.dtype),
        input_output_aliases={1: 0},  # acc (first tensor after prefetch) -> out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(coords, acc_flat, contrib_flat)
    return out.reshape(X, Y, Z, C)
