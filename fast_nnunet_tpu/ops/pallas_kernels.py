"""Pallas TPU kernels for the sliding-window hot path.

scatter_accumulate: adds a batch of gaussian-weighted tile contributions into
the fused (K+1)-channel accumulator at dynamic tile coordinates. This replaces
the chain of XLA dynamic_slice + add + dynamic_update_slice pairs in
inference/engine.py (the CUDA-kernel role of the reference's accumulation, ref
SURVEY §2.2 C4): each accumulator region is DMA'd HBM->VMEM once, updated on
the VPU, and written back once — no whole-buffer copies; the sequential TPU
Pallas grid makes overlapping tiles race-free.

Constraints honored (Mosaic):
- DMA slice offsets on tiled dims must be provably aligned -> callers pass
  coordinates that are multiples of `offset_align` and the kernel declares it
  with pl.multiple_of.
- the minor (channel) dim of sliced memrefs must be a multiple of 128 -> the
  engine lane-pads the accumulator channels.
- VMEM is ~16 MB and BlockSpec inputs are double-buffered -> sub-block over
  (x, y) so ~4 block-sized buffers fit.
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
    """Largest divisor of n that is <= cap and a multiple of align (or 1)."""
    best = 1
    for d in range(1, n + 1):
        if n % d == 0 and d <= cap and d % align == 0:
            best = max(best, d)
    return best


def _pick_sub(px: int, py: int, pz: int, channels: int, itemsize: int,
              budget_bytes: int = 3 * 1024 * 1024,
              offset_align: int = 16) -> Tuple[int, int]:
    """(x_sub, y_sub) so one (x_sub, y_sub, pz, C) block stays under budget
    (~4 such buffers coexist: scratch + double-buffered contrib + margin)."""
    bytes_per_xy = pz * channels * itemsize
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
                    *, offset_align: int):
    # acc_in is aliased to acc_out (same HBM buffer); operate through acc_out
    del acc_in
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    x_sub, y_sub = scratch.shape[0], scratch.shape[1]

    # Mosaic must statically prove tiled-dim offsets divisible by the sublane
    # tiling; the caller guarantees coords are multiples of offset_align
    x0 = pl.multiple_of(coords_ref[b, 0], offset_align) + i * x_sub
    y0 = pl.multiple_of(coords_ref[b, 1], offset_align) + j * y_sub
    z0 = pl.multiple_of(coords_ref[b, 2], offset_align)
    pz = scratch.shape[2]

    region = acc_out.at[pl.ds(x0, x_sub), pl.ds(y0, y_sub), pl.ds(z0, pz), :]
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
    """acc (X,Y,Z,C) += contrib (B,px,py,pz,C) at coords (B,3). Returns acc.

    Overlapping tiles are handled correctly (sequential TPU grid). The contrib
    must already include the validity masking (invalid tiles contribute zeros).
    ALL tile coordinates must be multiples of offset_align (Mosaic sublane
    tiling provability) — the engine quantizes its tile grid accordingly.
    """
    B, px, py, pz, C = contrib.shape
    assert coords.shape == (B, 3)
    itemsize = jnp.dtype(acc.dtype).itemsize
    x_sub, y_sub = _pick_sub(px, py, pz, C, itemsize,
                             offset_align=offset_align)
    n_x = px // x_sub
    n_y = py // y_sub

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # coords
        grid=(B, n_x, n_y),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # acc stays in HBM
            pl.BlockSpec((1, x_sub, y_sub, pz, C),
                         lambda b, i, j, coords_ref: (b, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((x_sub, y_sub, pz, C), acc.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_scatter_kernel, offset_align=offset_align)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        input_output_aliases={1: 0},  # acc (first tensor after prefetch) -> out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(coords, acc, contrib.astype(acc.dtype))
