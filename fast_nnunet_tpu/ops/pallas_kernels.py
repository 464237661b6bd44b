"""Pallas TPU kernel for the sliding-window hot path: fused gaussian-multiply
scatter-accumulate (the CUDA-kernel role of the reference's accumulation, ref
SURVEY §2.2 C4).

``fused_scatter_accumulate`` adds a batch of tile logits, multiplied by the
gaussian importance map on the VPU, into the accumulator at dynamic tile
coordinates — replacing XLA's per-tile dynamic_slice + multiply + add +
dynamic_update_slice chain. Design points (v2; v1 measured 52.7 s vs the XLA
path's 34.5 s and taught these lessons):

- **No contrib materialization.** v1 required the caller to materialize
  ``logits * gaussian`` (+ weight channel concat) in HBM — ~1.5 GB of extra
  write+read per batch step. v2 reads the network's logits directly and does
  the multiply in VMEM; the weight-sum channel rides as a constant-1 logit
  channel appended by the caller.
- **Double-buffered DMA pipeline.** v1 issued load→add→store sequentially per
  subblock (~1.5k unpipelined 2 MB DMAs per batch). v2 overlaps the next
  subblock's loads with the current one's compute+store, using two scratch
  slots and per-slot semaphores. This requires every item in one call to
  touch a DISJOINT accumulator region — the engine groups tiles into
  same-coset batches (tiles >= one patch apart) and passes the real-item
  count instead of padding masks.
- **Channel-flattened minor layout.** The accumulator is viewed as
  (X, Y, Z*C). With C a multiple of 8 and z tile starts multiples of 16 (the
  engine quantizes its grid on this path), z0*C and pz*C are multiples of
  128, so C pads (K+1) -> ceil/8*8 (62 -> 64, 3%) instead of the XLA layout's
  lane pad to 128 (2.1x HBM for 61 classes — what OOMs a v5e at 512^3).
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
              budget_bytes: int = 1536 * 1024,
              offset_align: int = 16) -> Tuple[int, int]:
    """(x_sub, y_sub) so one (x_sub, y_sub, minor) block stays under budget
    (5 such buffers coexist: 2 acc + 2 logits + 1 gaussian)."""
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


def _fused_kernel(coords_ref, nreal_ref, acc_in, logits_ref, gauss_ref,
                  acc_out, acc_buf, log_buf, g_buf, acc_sem, log_sem,
                  store_sem, g_sem, *, offset_align: int, channels: int,
                  x_sub: int, y_sub: int, n_x: int, n_y: int):
    # acc_in is aliased to acc_out (same HBM buffer); operate through acc_out
    del acc_in
    minor = acc_buf.shape[-1]
    n_real = nreal_ref[0]

    def region(b, i, j):
        x0 = pl.multiple_of(coords_ref[b, 0], 1) + i * x_sub
        y0 = pl.multiple_of(coords_ref[b, 1], offset_align) + j * y_sub
        zc0 = pl.multiple_of(coords_ref[b, 2] * channels, 128)
        return acc_out.at[pl.ds(x0, x_sub), pl.ds(y0, y_sub),
                          pl.ds(zc0, minor)]

    def loads(b, i, j, slot):
        pltpu.make_async_copy(region(b, i, j), acc_buf.at[slot],
                              acc_sem.at[slot]).start()
        pltpu.make_async_copy(
            logits_ref.at[b, pl.ds(i * x_sub, x_sub),
                          pl.ds(j * y_sub, y_sub), :],
            log_buf.at[slot], log_sem.at[slot]).start()

    def wait_loads(slot):
        pltpu.make_async_copy(acc_buf.at[slot], acc_buf.at[slot],
                              acc_sem.at[slot]).wait()
        pltpu.make_async_copy(log_buf.at[slot], log_buf.at[slot],
                              log_sem.at[slot]).wait()

    def subblock_body(ij, _):
        i = ij // n_y
        j = ij % n_y
        # gaussian block: loaded once per subblock, reused for every tile
        g_dma = pltpu.make_async_copy(
            gauss_ref.at[pl.ds(i * x_sub, x_sub), pl.ds(j * y_sub, y_sub), :],
            g_buf, g_sem)
        g_dma.start()
        g_dma.wait()

        @pl.when(n_real > 0)
        def _():
            loads(0, i, j, 0)  # prologue

        def tile_body(b, _):
            slot = jax.lax.rem(b, 2)
            other = 1 - slot

            # the other slot's last store must land before we reload into it
            @pl.when(b >= 1)
            def _():
                pltpu.make_async_copy(acc_buf.at[other], acc_buf.at[other],
                                      store_sem.at[other]).wait()

            @pl.when(b + 1 < n_real)
            def _():
                loads(b + 1, i, j, other)

            wait_loads(slot)
            acc_buf[slot] = acc_buf[slot] + log_buf[slot] * g_buf[...]
            pltpu.make_async_copy(acc_buf.at[slot], region(b, i, j),
                                  store_sem.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_real, tile_body, 0)

        # epilogue: every iteration waited its predecessor's store, so only
        # the final store is still in flight
        @pl.when(n_real > 0)
        def _():
            last = jax.lax.rem(n_real - 1, 2)
            pltpu.make_async_copy(acc_buf.at[last], acc_buf.at[last],
                                  store_sem.at[last]).wait()
        return 0

    jax.lax.fori_loop(0, n_x * n_y, subblock_body, 0)


def fused_scatter_accumulate(acc: jnp.ndarray, logits: jnp.ndarray,
                             gauss_flat: jnp.ndarray, coords: jnp.ndarray,
                             n_real, *, interpret: bool = False,
                             offset_align: int = 16) -> jnp.ndarray:
    """acc (X, Y, Z, C) += logits[b] * gauss at coords[b] for b < n_real.

    logits: (B, px, py, pz, C) in acc.dtype — the network output with the
    weight channel as a constant-1 logit and channels padded to C.
    gauss_flat: (px, py, pz*C) in acc.dtype — gaussian broadcast over the
    flattened minor dim (same value for all C of a voxel).
    coords: (B, 3) int32. n_real: scalar int32 — items beyond it are ignored.

    Requirements (the engine enforces all):
    - items < n_real touch pairwise DISJOINT accumulator regions (same-coset
      batches) — this is what makes the DMA pipeline race-free
    - y/z tile coordinates are multiples of offset_align (>= 16)
    - C is a multiple of 8
    """
    B, px, py, pz, C = logits.shape
    X, Y, Z, C2 = acc.shape
    assert C == C2 and coords.shape == (B, 3)
    assert C % 8 == 0, "pad channels to a multiple of 8 for the Pallas path"
    assert gauss_flat.shape == (px, py, pz * C)
    itemsize = jnp.dtype(acc.dtype).itemsize
    minor = pz * C
    x_sub, y_sub = _pick_sub(px, py, minor, itemsize,
                             offset_align=offset_align)
    n_x = px // x_sub
    n_y = py // y_sub

    acc_flat = acc.reshape(X, Y, Z * C)
    logits_flat = logits.astype(acc.dtype).reshape(B, px, py, minor)
    nreal_arr = jnp.asarray(n_real, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # coords, n_real
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # acc stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # logits stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # gaussian stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, x_sub, y_sub, minor), acc.dtype),  # acc slots
            pltpu.VMEM((2, x_sub, y_sub, minor), acc.dtype),  # logits slots
            pltpu.VMEM((x_sub, y_sub, minor), acc.dtype),     # gaussian
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_fused_kernel, offset_align=offset_align,
                               channels=C, x_sub=x_sub, y_sub=y_sub,
                               n_x=n_x, n_y=n_y)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(acc_flat.shape, acc.dtype),
        input_output_aliases={2: 0},  # acc (first tensor after prefetch) -> out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(coords, nreal_arr, acc_flat, logits_flat, gauss_flat)
    return out.reshape(X, Y, Z, C)
