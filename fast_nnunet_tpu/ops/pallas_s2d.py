"""Pallas TPU kernel for the s2d-domain sweep hot loop: fused seg-head matmul
+ gaussian multiply + accumulator read-modify-write (the CUDA-kernel role of
the reference engine's accumulation, ref SURVEY §2.2 C4; ref
engine/fast_nnunet.cpp tile loop).

Round-3 trace attribution of the 11.1 s s2d sweep shows the accumulate stage
dominates: per-tile fp32 logits materialization + layout copies + DUS chains
(misc fusions 2.90 s, copies 1.90 s, DUS 1.67 s) against a ~0.8 s HBM-traffic
floor. This kernel replaces, per tile, the XLA sequence

    y   = seg_head(features_tile)          # (…, 8F) bf16 -> (…, 8K) bf16
    c   = (y.astype(f32) * g)[…]           # fp32 gaussian multiply
    acc = DUS(acc, DS(acc) + c)            # read-modify-write

with a single VMEM-resident pass: features blocks are DMA'd in, the
block-diagonal 1^3 head runs on the MXU, the gaussian expands to the
(…, 8K) lanes via a tiny (N, 8) @ (8, 8K) MXU dot (no HBM-resident expanded
gaussian), and the accumulator block is read, updated, and written back —
double-buffered so the next block's loads overlap this block's compute and
store.

Design requirements (the engine's pallas-s2d grid enforces all):
- tiles within one call touch pairwise-DISJOINT accumulator regions (the
  engine groups tiles into same-coset batches over a uniform-stride grid) —
  this is what makes the DMA pipeline race-free; padded slots are excluded
  via the real-item count, never via masking
- half-res z tile offsets are multiples of 8 (fp32 sublane tile) — the
  uniform grid's half-res z strides are pz/2 (and the tail offset is even
  *pz/2-aligned), all multiples of 8 for bone_turbo's pz = 160
- the accumulator is fp32 (sublane alignment for bf16 would need 16-aligned
  half-res offsets, which a patch-96 grid cannot provide; fp32 accumulation
  is also strictly more accurate than the default bf16 sweep accumulator)

Numerics: the head dot runs bf16 x bf16 with an EXPLICIT f32 MXU
accumulator (XLA's allow-excess-precision pass gives the nominal-bf16 XLA
path the same f32 carry under fusion), bias and gaussian multiply in f32,
accumulation in f32 — strictly at-or-above the XLA path's precision. Masks
agree with the XLA sweep on the same grid except where the top-2 logits sit
within bf16 rounding of each other (tested >= 99.9%).
"""
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(coords_ref, nreal_ref, acc_in, feats_ref, g_ref, w_ref, b_ref,
            e_ref, acc_out,
            acc_buf, x_buf, gexp_buf, g_buf, acc_sem, x_sem, store_sem,
            g_sem,
            *, p0h: int, pyh: int, pzh: int, c8: int, f8: int, pyh_c: int):
    # acc_in is aliased to acc_out (same HBM buffer); operate through acc_out
    del acc_in
    n_real = nreal_ref[0]
    # cyclic accumulator: virtual tile row i lives at physical row
    # (row_base + i) % p0h — lets the engine retire finalized rows by bumping
    # the base instead of physically shifting the accumulator (see
    # ops/pallas_finalize.py and the engine's s2d sweep runner)
    row_base = nreal_ref[1]
    # the tile plane is processed in y-chunks of pyh_c rows: Mosaic's scoped
    # VMEM demand (pipelined acc/feature slots + gexp + dot temporaries)
    # scales with the chunk's voxel count, and a whole 48x80 bone_turbo tile
    # overflows the v5e's VMEM stack at compile time (round-4 hardware
    # bisection: 48x80 fails, 24x80/48x40 pass) — see _Y_CHUNK_VOX
    n_chunks = pyh // pyh_c
    n_vox = pyh_c * pzh

    def region(b, i, yc):
        yh0 = pl.multiple_of(coords_ref[b, 0] + yc * pyh_c, 1)
        zh0 = pl.multiple_of(coords_ref[b, 1], 8)
        ip = jax.lax.rem(row_base + i, p0h)
        return acc_out.at[ip, pl.ds(yh0, pyh_c), pl.ds(zh0, pzh), :]

    def loads(b, i, yc, slot):
        pltpu.make_async_copy(region(b, i, yc), acc_buf.at[slot],
                              acc_sem.at[slot]).start()
        pltpu.make_async_copy(
            feats_ref.at[b, i, pl.ds(yc * pyh_c, pyh_c)], x_buf.at[slot],
            x_sem.at[slot]).start()

    def wait_loads(slot):
        pltpu.make_async_copy(acc_buf.at[slot], acc_buf.at[slot],
                              acc_sem.at[slot]).wait()
        pltpu.make_async_copy(x_buf.at[slot], x_buf.at[slot],
                              x_sem.at[slot]).wait()

    def row_chunk(i, yc):
        # the gaussian lives in HBM, 128-lane padded (zeros in lanes 8..127:
        # Mosaic HBM DMA slices must be 128-lane aligned), and only this
        # chunk's (pyh_c, pzh, 128) slice is DMA'd in: a VMEM-resident g
        # would be wholly lane-padded — 151 MB for the bone_turbo tile, THE
        # VMEM overflow the round-4 hardware bisection chased (demand scaled
        # with pzh, not with the chunk voxel count)
        pltpu.make_async_copy(
            g_ref.at[i, pl.ds(yc * pyh_c, pyh_c)], g_buf, g_sem).start()
        pltpu.make_async_copy(g_buf, g_buf, g_sem).wait()
        # gaussian lane expansion for this x-row chunk: (N, 128) @ (128, 8K)
        # one-hot group embedding (rows 8..127 are zero, matching g's zero
        # pad lanes) — MXU does the "repeat each g_k over its 61-lane class
        # group" for free, instead of a 360 MB HBM-resident table. HIGHEST
        # precision: the MXU's default f32 path rounds inputs to bf16; the
        # 3-pass split is EXACT for a one-hot right operand
        gexp_buf[...] = jax.lax.dot(
            g_buf[...].reshape(n_vox, 128), e_ref[...],
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32).reshape(pyh_c, pzh, c8)

        @pl.when(n_real > 0)
        def _():
            loads(0, i, yc, 0)  # prologue

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
                loads(b + 1, i, yc, other)

            wait_loads(slot)
            # block-diagonal 1^3 seg head with EXPLICIT f32 accumulation:
            # XLA's allow-excess-precision pass elides the nominal
            # f32->bf16->f32 converts around _seg_head_grouped's bf16 dot
            # under fusion anyway (verified in interpret mode), so f32 is
            # both the honest contract and the more accurate one; bias adds
            # in f32 (bf16-valued)
            y = jnp.dot(x_buf[slot].reshape(n_vox, f8), w_ref[...],
                        preferred_element_type=jnp.float32)
            y = y + b_ref[0].astype(jnp.float32)
            acc_buf[slot] = acc_buf[slot] + \
                y.reshape(pyh_c, pzh, c8) * gexp_buf[...]
            pltpu.make_async_copy(acc_buf.at[slot], region(b, i, yc),
                                  store_sem.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_real, tile_body, 0)

        # every iteration waited its predecessor's store, so only the final
        # store is still in flight
        @pl.when(n_real > 0)
        def _():
            last = jax.lax.rem(n_real - 1, 2)
            pltpu.make_async_copy(acc_buf.at[last], acc_buf.at[last],
                                  store_sem.at[last]).wait()

    def row_body(i, _):
        # DYNAMIC chunk loop: a static Python unroll duplicates every dot/
        # elementwise temporary per chunk instance on Mosaic's VMEM stack,
        # which re-overflows exactly like the unchunked kernel did
        jax.lax.fori_loop(0, n_chunks,
                          lambda yc, c: (row_chunk(i, yc), c)[1], 0)
        return 0

    jax.lax.fori_loop(0, p0h, row_body, 0)


def fused_head_gauss_accumulate(acc: jnp.ndarray, feats: jnp.ndarray,
                                g_s2d: jnp.ndarray, w: jnp.ndarray,
                                b: jnp.ndarray, coords_h: jnp.ndarray,
                                n_real, row_base=0, *,
                                interpret: bool = False) -> jnp.ndarray:
    """acc[.., yh0_t:+pyh, zh0_t:+pzh, :] += seg_head(feats[t]) * gaussian
    for every tile t < n_real.

    acc:      (p0h, Yh, Zh, 8K) float32 — half-res offset-major accumulator
    feats:    (B, p0h, pyh, pzh, 8F) bfloat16 — pre-seg-head s2d activations
    g_s2d:    (p0h, pyh, pzh, 8) float32 — s2d-domain gaussian importance map
    w:        (8F, 8K) bfloat16 — block-diagonal seg head (expand_seg_head)
    b:        (8K,) bfloat16 — tiled seg-head bias
    coords_h: (B, 2) int32 — per-tile (yh0, zh0) half-res offsets; zh0 must
              be a multiple of 8; tiles < n_real must be pairwise disjoint
    n_real:   scalar int32 — tiles beyond it are ignored (padding)
    row_base: scalar int32 — cyclic row origin: virtual tile row i maps to
              physical accumulator row (row_base + i) % p0h
    """
    B, p0h, pyh, pzh, f8 = feats.shape
    P0, Y, Z, c8p = acc.shape
    c8 = w.shape[1]
    assert P0 == p0h and coords_h.shape == (B, 2), (feats.shape, acc.shape)
    assert w.shape == (f8, c8) and b.shape == (c8,)
    assert g_s2d.shape[:3] == (p0h, pyh, pzh) and g_s2d.shape[3] in (8, 128)
    assert acc.dtype == jnp.float32 and g_s2d.dtype == jnp.float32
    # Mosaic HBM->VMEM DMA requires 128-lane-aligned slices, so the gaussian
    # rides HBM padded to 128 lanes (zeros beyond lane 8). Callers on a hot
    # path should pre-pad once and pass (p0h, pyh, pzh, 128) directly.
    if g_s2d.shape[3] == 8:
        g_s2d = jnp.concatenate(
            [g_s2d, jnp.zeros(g_s2d.shape[:3] + (120,), g_s2d.dtype)],
            axis=-1)
    assert c8 % 8 == 0
    # Mosaic DMAs slice the lane dim only at 128-multiples: the accumulator
    # carries its channels padded to c8p = ceil(8K/128)*128 (the engine pads
    # [8K real | zeros]; finalize argmaxes acc[..., :8K]). Pad the head and
    # embedding to match — zero weight/bias/gaussian columns keep the pad
    # lanes at exactly 0.
    assert c8p == c8 or c8p == -(-c8 // 128) * 128, (c8, c8p)
    if c8p != c8:
        w = jnp.concatenate(
            [w, jnp.zeros((f8, c8p - c8), w.dtype)], axis=-1)
        b = jnp.concatenate([b, jnp.zeros((c8p - c8,), b.dtype)])
    # one-hot group embedding: row k spans class-group k's lanes; rows
    # 8..127 stay zero (they meet the gaussian's zero pad lanes)
    e = np.zeros((128, c8p), np.float32)
    kk = c8 // 8
    for k in range(8):
        e[k, k * kk:(k + 1) * kk] = 1.0
    nreal_arr = jnp.stack([jnp.asarray(n_real, jnp.int32).reshape(()),
                           jnp.asarray(row_base, jnp.int32).reshape(())])

    # largest y-chunk whose voxel count keeps Mosaic's scoped VMEM demand
    # (pipelined slots + gexp + dot temporaries, all proportional to
    # pyh_c * pzh) inside the v5e stack: 48x80 tiles OOM at compile, 24x80
    # and 48x40 compile (round-4 hardware bisection)
    _Y_CHUNK_VOX = 1920
    pyh_c = next((d for d in range(pyh, 0, -1)
                  if pyh % d == 0 and d * pzh <= _Y_CHUNK_VOX), pyh)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # coords, n_real
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # acc stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),      # feats stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),      # gaussian in HBM (8-lane
            #   minor would pad 16x in VMEM; chunks are DMA'd per row)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # head weight resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # head bias resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # group embedding
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, pyh_c, pzh, c8p), jnp.float32),   # acc slots
            pltpu.VMEM((2, pyh_c, pzh, f8), jnp.bfloat16),   # feature slots
            pltpu.VMEM((pyh_c, pzh, c8p), jnp.float32),      # gexp chunk
            pltpu.VMEM((pyh_c, pzh, 128), jnp.float32),      # gaussian chunk
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_kernel, p0h=p0h, pyh=pyh, pzh=pzh,
                               c8=c8p, f8=f8, pyh_c=pyh_c)
    # a flat 100 MB limit, NOT a computed estimate: Mosaic's actual scoped
    # demand includes dot/elementwise temporaries well beyond the declared
    # scratch buffers, and an undersized vmem_limit_bytes fails XLA's stack
    # allocation for the whole custom call ("Ran out of memory in memory
    # space vmem" at bone_turbo's 48x80 half-res tile — v5e round-4 probe)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        input_output_aliases={2: 0},  # acc (first tensor after prefetch)
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(coords_h, nreal_arr, acc, feats, g_s2d, w, b.reshape(1, c8p),
      jnp.asarray(e))
