"""Multi-chip sliding-window inference: volume slabs over the mesh 'space' axis.

The TPU answer to "how does a 512^3 CT scale beyond one chip": the x-axis tile
grid is partitioned into per-device slabs; every device accumulates ONLY its own
tiles (zero redundant compute) into a local slab accumulator, sends the
overhanging tail rows to its right neighbor with ONE ``ppermute`` (rides the ICI
ring), adds the halo it received from its left neighbor, and finalizes
(divide + argmax) its owned rows on device. D2H is the sharded uint8
segmentation only.

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


def predict_segmentation_multichip(engine: SlidingWindowEngine, params_list,
                                   volume: np.ndarray, mesh: Mesh,
                                   axis_name: str = "space") -> np.ndarray:
    """volume (C, *spatial) -> argmax segmentation, slab-parallel over the mesh.

    Uses the uniform-stride x grid (same convention as the single-chip rolling
    sweep). Requires a 1D device axis named `axis_name` in `mesh`.
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
    stride = max(1, int(p0 * engine.tile_step_size))
    halo = p0 - stride

    x_tight = max(spatial[0], p0)
    # same x grid as the single-chip sweep: starts k*stride, k < n_starts
    n_starts = int(np.ceil((x_tight - p0) / stride)) + 1
    last_start = (n_starts - 1) * stride
    # owned rows per device: n_d * stride; coverage requires D*n_d*stride >= X
    n_d = int(np.ceil(max(x_tight, last_start + p0) / (D * stride)))
    x_owned_total = D * n_d * stride
    x_padded = x_owned_total + halo  # room for the last tiles to overhang

    # in-plane grid: reference steps
    tight_rest = tuple(max(s, p) for s, p in zip(spatial[1:], patch[1:]))
    steps_rest = compute_steps_for_sliding_window(tight_rest, patch[1:],
                                                  engine.tile_step_size)
    coords_yz = tile_coords_from_steps(steps_rest)

    # per-device tiles: local x row = j*stride (j < n_d); global start =
    # (d*n_d + j)*stride. Tiles fully beyond the tight extent are invalid.
    B = engine.tile_batch
    per_dev_coords, per_dev_valid = [], []
    for d in range(D):
        cs, vs = [], []
        for j in range(n_d):
            gx = (d * n_d + j) * stride
            v = 1.0 if gx <= last_start else 0.0  # exact single-chip grid
            for yz in coords_yz:
                cs.append((j * stride, int(yz[0]), int(yz[1])))
                vs.append(v)
        cs = np.asarray(cs, np.int32)
        vs = np.asarray(vs, np.float32)
        n_real = len(cs)
        n_tiles = _round_up(n_real, B)
        if n_tiles > n_real:
            cs = np.concatenate([cs, np.repeat(cs[-1:], n_tiles - n_real, 0)])
            vs = np.concatenate([vs, np.zeros(n_tiles - n_real, np.float32)])
        per_dev_coords.append(cs.reshape(-1, B, 3))
        per_dev_valid.append(vs.reshape(-1, B))
    coords_all = np.stack(per_dev_coords)   # (D, nb, B, 3)
    valid_all = np.stack(per_dev_valid)     # (D, nb, B)

    plane = tuple(_round_up(t, engine.shape_bucket) for t in tight_rest)
    ext = n_d * stride + halo  # local slab extent incl. overhang

    # volume slabs: device d needs rows [d*n_d*stride, d*n_d*stride + ext)
    vol_sharded = np.zeros((D, ext, *plane, in_channels), np.float32)
    vol_cl = np.zeros((x_padded, *plane, in_channels), np.float32)
    vol_cl[tuple(slice(0, s) for s in spatial)] = np.moveaxis(volume, 0, -1)
    for d in range(D):
        x0 = d * n_d * stride
        vol_sharded[d] = vol_cl[x0:x0 + ext]

    K = engine.num_classes
    acc_dtype = engine.sweep_acc_dtype
    gaussian = engine._gaussian_for(acc_dtype)
    forward = engine._tile_step_fn(n_folds)
    owned = n_d * stride

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

        acc, _ = jax.lax.scan(body, acc0, (coords, valid))

        # send the overhang [owned, ext) right; receive from the left into [0, halo)
        if halo > 0 and D > 1:
            tail = jax.lax.ppermute(acc[owned:], axis_name, perm_right)
            idx = jax.lax.axis_index(axis_name)
            # device 0 has no left neighbor: the ring wraps, so mask it out
            keep = (idx > 0).astype(acc.dtype)
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
