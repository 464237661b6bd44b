"""Pallas TPU kernels for the sliding-window hot path.

scatter_accumulate: adds a batch of gaussian-weighted tile contributions into
the fused (K+1)-channel accumulator at dynamic tile coordinates. This replaces
the chain of XLA dynamic_slice + add + dynamic_update_slice pairs in
inference/engine.py (the CUDA-kernel role of the reference's accumulation, ref
SURVEY §2.2 C4): each accumulator region is DMA'd HBM->VMEM once, updated on
the VPU, and written back once — no whole-buffer copies, explicit double-buffer
-free sequential grid (TPU Pallas grids execute sequentially, so overlapping
tiles are race-free).

Layout: acc (X, Y, Z, C) with C = num_classes + 1 (fused weight channel);
contrib (B, px, py, pz, C) precomputed by XLA (logits * gaussian ++ gaussian);
coords (B, 3) tile starts. The grid tiles (B, x-subblocks, channel-blocks) so
each step's working set fits VMEM.
"""
import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_sub(px: int, py: int, pz: int, channels: int, itemsize: int,
              budget_bytes: int = 5 * 1024 * 1024) -> Tuple[int, int]:
    """(x_sub, c_block) so that scratch + the (double-buffered) contrib block fit
    the 16 MB VMEM: Mosaic pipelines BlockSpec inputs with 2 buffers, so the
    real footprint is ~3x one block — budget accordingly."""
    c_block = channels
    x_sub = px
    while 2 * x_sub * py * pz * c_block * itemsize > budget_bytes:
        if x_sub > 1:
            # halve along x first (keeps the 128-lane channel dim intact)
            for d in range(x_sub - 1, 0, -1):
                if px % d == 0 and d < x_sub:
                    x_sub = d
                    break
            else:
                x_sub = 1
        elif c_block > 128:
            c_block = max(128, c_block // 2)
        else:
            break
    return x_sub, c_block


def _scatter_kernel(coords_ref, acc_in, contrib_ref, acc_out, scratch, sem,
                    *, offset_align: int):
    # acc_in is aliased to acc_out (same HBM buffer); operate through acc_out
    del acc_in
    b = pl.program_id(0)
    i = pl.program_id(1)
    x_sub = scratch.shape[0]

    # Mosaic must statically prove tiled-dim offsets divisible by the sublane
    # tiling; the caller guarantees coords are multiples of offset_align
    x0 = pl.multiple_of(coords_ref[b, 0], offset_align) + i * x_sub
    y0 = pl.multiple_of(coords_ref[b, 1], offset_align)
    z0 = pl.multiple_of(coords_ref[b, 2], offset_align)
    py, pz = scratch.shape[1], scratch.shape[2]

    region = acc_out.at[pl.ds(x0, x_sub), pl.ds(y0, py), pl.ds(z0, pz), :]
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
    x_sub, c_block = _pick_sub(px, py, pz, C, itemsize)
    assert c_block == C, "channel blocking not needed for supported configs"
    n_x = px // x_sub

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # coords
        grid=(B, n_x),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # acc stays in HBM
            pl.BlockSpec((1, x_sub, py, pz, C),
                         lambda b, i, coords_ref: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((x_sub, py, pz, C), acc.dtype),
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
