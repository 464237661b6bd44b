"""Multi-chip sliding-window inference: volume slabs over the mesh 'space' axis.

The TPU answer to "how does a 512^3 CT scale beyond one chip": the x-axis tile
grid is partitioned into per-device slabs; every device accumulates ONLY its own
tiles (zero redundant compute) into a local slab accumulator, forwards the
overhanging tail rows along the ICI ring with ``ppermute`` (one hop per slab the
overhang spans — one hop in the common case), adds the halo received from its
left neighbor, and finalizes (argmax) its owned rows on device. D2H is the
sharded uint8 segmentation only.

Grid-exact: the tile grid is the reference's evenly-spread sliding-window
placement on EVERY axis (identical to the single-chip sweep and to
``predict_logits``) — tiles are only *assigned* to devices, never moved, so
every voxel receives exactly the same set of gaussian-weighted contributions.

Exactness contract: rows outside the slab-boundary halo regions are
BIT-IDENTICAL to the single-chip sweep (same contributions, same addition
order). Inside a halo region the per-voxel sum combines the neighbor's
subtotal with the local subtotal, which reassociates the floating-point
additions relative to the single-chip x-ascending order; logits differ by
~1 ulp and argmax can flip on near-ties (tests/test_sharded.py pins >= 99%
agreement on halo rows, 100% elsewhere). True bit-exactness requires the
receiver to fold the incoming halo in BEFORE its own tiles — with owned
rows (x_tight / D) smaller than the patch extent every local tile overlaps
the halo, so that ordering wavefront-serializes the devices and forfeits
the parallelism this path exists for; the reassociation is the designed
trade for serving. ``halo_exact=True`` opts into exactly that wavefront
ordering for validation runs: multi-chip output is then voxel-identical to
the single-chip sweep (tests/test_sharded.py pins 100% agreement) at
single-chip-like latency.

There is no analogue in the reference — it is single-GPU for inference — this is
where the TPU design wins the end-to-end latency target (BASELINE.json: <5 s for
512^3 on v5e-8).
"""
from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.sliding_window import compute_steps_for_sliding_window, tile_coords_from_steps
from .engine import SlidingWindowEngine, _round_up


def _exact_wavefront_accumulate(acc0, run_tiles, owned_rows: int,
                                halo_rows: int, D: int, axis_name: str,
                                perm_right):
    """BIT-EXACT halo accumulation: serialize the devices into a wavefront so
    every voxel's floating-point additions happen in the single-chip
    (x-ascending) order. Stage s: device s folds the halo received from its
    left neighbor into rows [0, halo) FIRST (0 + x == x bit-exactly — no
    local contribution has touched those rows yet), then accumulates its own
    tiles, then forwards its overhang rows [owned, ext) right. Rows received
    beyond a device's owned extent land in its overhang and relay on the next
    stage, preserving global order for halos spanning multiple slabs.

    This trades away the slab parallelism (each stage runs one device's tiles
    while the others idle in the untaken lax.cond branch) — it exists so
    validation runs can pin multi-chip output voxel-identical to the
    single-chip sweep; serving uses the parallel reassociating mode."""
    idx = jax.lax.axis_index(axis_name)
    inbox0 = jnp.zeros((halo_rows,) + acc0.shape[1:], acc0.dtype)

    def stage(s, carry):
        acc, inbox = carry
        active = idx == s
        acc = acc.at[:halo_rows].add(inbox)
        acc = jax.lax.cond(active, run_tiles, lambda a: a, acc)
        tail = jax.lax.ppermute(
            jnp.where(active, acc[owned_rows:], 0), axis_name, perm_right)
        acc = jnp.where(active, acc.at[owned_rows:].set(0), acc)
        inbox = tail * (idx == s + 1).astype(acc.dtype)
        return acc, inbox

    acc, _ = jax.lax.fori_loop(0, D, stage, (acc0, inbox0))
    return acc


def predict_segmentation_multichip(engine: SlidingWindowEngine, params_list,
                                   volume: np.ndarray, mesh: Mesh,
                                   axis_name: str = "space",
                                   halo_exact: bool = False) -> np.ndarray:
    """volume (C, *spatial) -> argmax segmentation, slab-parallel over the mesh.

    Requires a 1D device axis named `axis_name` in `mesh`.

    ``halo_exact=True`` opts into the bit-exact validation mode: devices
    serialize into a wavefront (see :func:`_exact_wavefront_accumulate`) so
    the output is voxel-identical to the single-chip sweep even on halo rows
    — at the cost of the parallelism (use for parity pinning, not serving).
    """
    if not isinstance(params_list, (list, tuple)):
        params_list = [params_list]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)
    n_folds = len(params_list)

    D = mesh.shape[axis_name]
    spatial = volume.shape[1:]
    in_channels = volume.shape[0]
    patch = engine.patch_size
    p0 = patch[0]

    x_tight = max(spatial[0], p0)
    tight_rest = tuple(max(s, p) for s, p in zip(spatial[1:], patch[1:]))
    # reference-exact tile grid on every axis (== single-chip sweep)
    steps = compute_steps_for_sliding_window((x_tight, *tight_rest), patch,
                                             engine.tile_step_size)
    starts_x = [int(s) for s in steps[0]]
    coords_yz = tile_coords_from_steps(steps[1:])

    # slab ownership: device d owns global rows [d*owned, (d+1)*owned); a tile
    # is accumulated by the device owning its start row, and its up-to-p0-row
    # overhang is forwarded along the ring (n_hops = ceil(p0 / owned))
    owned = int(np.ceil(x_tight / D))
    halo = p0  # local accumulator extent past the owned rows
    ext = owned + halo
    x_padded = D * owned + halo
    n_hops = int(np.ceil(halo / owned)) if D > 1 else 0

    # per-device tiles (counts vary by +-1 per slab; pad to the max)
    B = engine.tile_batch
    per_dev = [[] for _ in range(D)]
    for gx in starts_x:
        d = min(gx // owned, D - 1)
        for yz in coords_yz:
            per_dev[d].append((gx - d * owned, int(yz[0]), int(yz[1])))
    max_real = max(len(t) for t in per_dev)
    n_tiles = max(B, _round_up(max_real, B))
    coords_all = np.zeros((D, n_tiles, 3), np.int32)
    valid_all = np.zeros((D, n_tiles), np.float32)
    for d, tiles in enumerate(per_dev):
        for i, c in enumerate(tiles):
            coords_all[d, i] = c
            valid_all[d, i] = 1.0
    coords_all = coords_all.reshape(D, -1, B, 3)
    valid_all = valid_all.reshape(D, -1, B)

    plane = tuple(_round_up(t, engine.shape_bucket) for t in tight_rest)

    # volume slabs: device d needs rows [d*owned, d*owned + ext)
    vol_sharded = np.zeros((D, ext, *plane, in_channels), np.float32)
    vol_cl = np.zeros((x_padded, *plane, in_channels), np.float32)
    vol_cl[tuple(slice(0, s) for s in spatial)] = np.moveaxis(volume, 0, -1)
    for d in range(D):
        x0 = d * owned
        vol_sharded[d] = vol_cl[x0:x0 + ext]

    K = engine.num_classes
    acc_dtype = engine.sweep_acc_dtype
    gaussian = engine._gaussian_for(acc_dtype)
    forward = engine._tile_step_fn(n_folds)

    perm_right = [(i, (i + 1) % D) for i in range(D)]

    def device_fn(params, vol_local, coords, valid):
        # shard_map gives each device its (1, ...) shard; drop the leading axis
        vol_local = vol_local[0]
        coords = coords[0]
        valid = valid[0]
        acc0 = jnp.zeros((ext, *plane, K + 1), acc_dtype)  # fused logits+weight

        def body(a, cv):
            cb, vb = cv
            return engine._accumulate_batch(a, vol_local, cb, vb, forward,
                                            params, gaussian, acc_dtype,
                                            in_channels), None

        def run_tiles(a):
            a, _ = jax.lax.scan(body, a, (coords, valid))
            return a

        if halo_exact and D > 1:
            acc = _exact_wavefront_accumulate(acc0, run_tiles, owned, halo,
                                              D, axis_name, perm_right)
        else:
            acc = run_tiles(acc0)

            # forward the overhang [owned, ext) along the ring: each hop
            # sends the current overhang right, zeroes it locally (no
            # re-send), and adds the received rows at local [0, halo) —
            # contributions still beyond the receiver's owned rows land back
            # in the overhang and ride the next hop. The wrap from the
            # ring's end carries only zeros (no tiles extend past the padded
            # volume), but device 0 masks it anyway.
            idx = jax.lax.axis_index(axis_name)
            keep = (idx > 0).astype(acc.dtype)
            for _ in range(n_hops):
                tail = jax.lax.ppermute(acc[owned:], axis_name, perm_right)
                acc = acc.at[owned:].set(0)
                acc = acc.at[:halo].add(tail * keep)

        # argmax(a / w) == argmax(a): the weight sum is a positive per-voxel
        # scalar shared across classes, so skip the fp32 divide entirely
        seg = acc[:owned, ..., :K].argmax(-1).astype(jnp.uint8)
        return seg[None]  # re-add the sharded leading axis

    run = jax.jit(jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False))

    seg = run(stacked, jnp.asarray(vol_sharded), jnp.asarray(coords_all),
              jnp.asarray(valid_all))
    seg = np.asarray(seg).reshape(D * owned, *plane)
    return seg[tuple(slice(0, s) for s in spatial)]


def predict_segmentation_multichip_s2d(engine: SlidingWindowEngine,
                                       params_list, volume: np.ndarray,
                                       mesh: Mesh,
                                       axis_name: str = "space",
                                       halo_exact: bool = False) -> np.ndarray:
    """Slab-parallel version of the s2d-domain sweep — the fastest
    single-chip path (engine.predict_segmentation_sweep_s2d) scaled over the
    mesh. Same structure as predict_segmentation_multichip (tiles assigned
    by start row, overhang forwarded right along the ICI ring) but the
    accumulator lives in the space-to-depth block layout
    (interleaved (offset, K+1) groups at half resolution, ~1.03x lane pad), and the
    finalize is per-offset-group argmax + uint8 depth_to_space per device.

    Requires an S2DPlainConvUNet engine network, even patch dims, no
    mirror-TTA; tile starts are the even-floored evenly-spread grid (same
    placement contract as the single-chip s2d sweep). The halo-row float
    reassociation contract matches predict_segmentation_multichip's
    docstring."""
    assert not engine.mirror_axes, "s2d sweep does not support mirror-TTA"
    patch = engine.patch_size
    assert all(p % 2 == 0 for p in patch)
    if not isinstance(params_list, (list, tuple)):
        params_list = [params_list]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)
    n_folds = len(params_list)

    D = mesh.shape[axis_name]
    spatial = volume.shape[1:]
    in_channels = volume.shape[0]
    p0 = patch[0]
    p0h, pyh, pzh = p0 // 2, patch[1] // 2, patch[2] // 2
    K = engine.num_classes
    C8 = 8 * K  # offset-major logits only; finalize never reads weights

    x_tight = _round_up(max(spatial[0], p0), 2)
    tight_rest = tuple(_round_up(max(s, p), 2)
                       for s, p in zip(spatial[1:], patch[1:]))
    steps = engine._even_floor_steps((x_tight, *tight_rest))
    starts_x = [int(s) for s in steps[0]]
    coords_yz = tile_coords_from_steps(steps[1:])

    # slab ownership in EVEN rows so s2d blocks never straddle a boundary
    owned = _round_up(int(np.ceil(x_tight / D)), 2)
    halo = p0
    ext = owned + halo
    x_padded = D * owned + halo
    n_hops = int(np.ceil(halo / owned)) if D > 1 else 0
    owned_h, halo_h, ext_h = owned // 2, halo // 2, ext // 2

    B = engine.tile_batch
    per_dev = [[] for _ in range(D)]
    for gx in starts_x:
        d = min(gx // owned, D - 1)
        for yz in coords_yz:
            per_dev[d].append((gx - d * owned, int(yz[0]), int(yz[1])))
    max_real = max(len(t) for t in per_dev)
    n_tiles = max(B, _round_up(max_real, B))
    coords_all = np.zeros((D, n_tiles, 3), np.int32)
    valid_all = np.zeros((D, n_tiles), np.float32)
    for d, tiles in enumerate(per_dev):
        for i, c in enumerate(tiles):
            coords_all[d, i] = c
            valid_all[d, i] = 1.0
    coords_all = coords_all.reshape(D, -1, B, 3)
    valid_all = valid_all.reshape(D, -1, B)

    plane = tuple(_round_up(_round_up(t, engine.shape_bucket), 2)
                  for t in tight_rest)
    plane_h = (plane[0] // 2, plane[1] // 2)

    np_dtype = jnp.bfloat16 \
        if jnp.dtype(engine.compute_dtype) == jnp.bfloat16 \
        else np.dtype(jnp.dtype(engine.compute_dtype).name)
    vol_sharded = np.zeros((D, ext, *plane, in_channels), np.float32)
    vol_cl = np.zeros((x_padded, *plane, in_channels), np.float32)
    vol_cl[tuple(slice(0, s) for s in spatial)] = np.moveaxis(volume, 0, -1)
    for d in range(D):
        x0 = d * owned
        vol_sharded[d] = vol_cl[x0:x0 + ext]
    vol_sharded = vol_sharded.astype(np_dtype)

    acc_dtype = engine.sweep_acc_dtype
    g = engine._gaussian_for(acc_dtype)
    g_s2d = g.reshape(p0h, 2, pyh, 2, pzh, 2).transpose(
        0, 2, 4, 1, 3, 5).reshape(p0h, pyh, pzh, 8)
    use_features = n_folds == 1  # same contract as the single-chip sweep
    network = engine.network
    forward = engine._tile_step_fn(n_folds, s2d_output=True,
                                   s2d_features=use_features)
    compute_dtype = engine.compute_dtype

    perm_right = [(i, (i + 1) % D) for i in range(D)]

    def device_fn(params, vol_local, coords, valid):
        vol_local = vol_local[0]
        coords = coords[0]
        valid = valid[0]
        acc0 = jnp.zeros((ext_h, *plane_h, C8), acc_dtype)

        def body(a, cv):
            cb, vb = cv
            patches = [jax.lax.dynamic_slice(
                vol_local, (cb[b][0], cb[b][1], cb[b][2], 0),
                patch + (in_channels,)) for b in range(B)]
            x = jnp.stack(patches).astype(compute_dtype)
            out = forward(params, x)
            if use_features:
                single = jax.tree_util.tree_map(lambda a: a[0], params)
            for b in range(B):
                y = (network.seg_head_apply(single, out[b]).astype(jnp.float32)
                     if use_features else out[b])
                y = y.reshape(p0h, pyh, pzh, 8, K)
                gw = (g_s2d * vb[b])[..., None]
                contrib = (y * gw).astype(acc_dtype).reshape(
                    p0h, pyh, pzh, C8)
                start = (cb[b][0] // 2, cb[b][1] // 2, cb[b][2] // 2, 0)
                cur = jax.lax.dynamic_slice(a, start, (p0h, pyh, pzh, C8))
                a = jax.lax.dynamic_update_slice(a, cur + contrib, start)
            return a, None

        def run_tiles(a):
            a, _ = jax.lax.scan(body, a, (coords, valid))
            return a

        if halo_exact and D > 1:
            acc = _exact_wavefront_accumulate(acc0, run_tiles, owned_h,
                                              halo_h, D, axis_name,
                                              perm_right)
        else:
            acc = run_tiles(acc0)
            idx = jax.lax.axis_index(axis_name)
            keep = (idx > 0).astype(acc.dtype)
            for _ in range(n_hops):
                tail = jax.lax.ppermute(acc[owned_h:], axis_name, perm_right)
                acc = acc.at[owned_h:].set(0)
                acc = acc.at[:halo_h].add(tail * keep)

        r = acc[:owned_h].reshape(owned_h, *plane_h, 8, K)
        cls8 = r.argmax(-1).astype(jnp.uint8)
        cls8 = cls8.reshape(owned_h, *plane_h, 2, 2, 2).transpose(
            0, 3, 1, 4, 2, 5)
        return cls8.reshape(owned, *plane)[None]

    run = jax.jit(jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False))

    seg = run(stacked, jnp.asarray(vol_sharded), jnp.asarray(coords_all),
              jnp.asarray(valid_all))
    seg = np.asarray(seg).reshape(D * owned, *plane)
    return seg[tuple(slice(0, s) for s in spatial)]
