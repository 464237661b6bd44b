"""Compressed, cache-tuned preprocessed-case storage (.fnnz).

The reference's default store is blosc2 with chunk/block sizes tuned to the
patch size so random patch reads stay cache-resident (ref distillation/
nnunetv2/training/dataloading/nnunet_dataset.py:209-298). blosc2 is not in
this image; the same goal — decompress only the bytes a patch read touches —
is met with a brick-chunked zstd container:

- the (C, *spatial) array is split into spatial BRICKS (channels never split);
  brick dims start at the next power of two of half the patch dims, then the
  largest axis halves until a brick fits the target budget (1 MiB, ~L2-sized,
  one zstd frame per brick decompresses in one pass)
- a random patch read touches at most ceil(patch/brick)+1 ~= 3 bricks per
  axis, bounding read amplification while keeping frames big enough for good
  zstd ratios and few syscalls
- one self-describing file per case: JSON header (shape, dtype, brick grid,
  frame offsets) + zstd frames; lazy reads via BrickReader.__getitem__

Opt-in via nnUNetv2_preprocess -store fnnz (or FNNT_STORE=fnnz); training
auto-detects the store from the files present (infer_dataset_class).
"""
import json
import os
import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import zstandard as _zstd
except ImportError:  # pragma: no cover - zstandard is in the image
    _zstd = None

_MAGIC = b"FNNZ1\n"
_TARGET_BRICK_BYTES = 1 << 20
_COMPRESS_LEVEL = 3


def compute_brick_shape(image_shape: Sequence[int],
                        patch_size: Optional[Sequence[int]],
                        bytes_per_voxel: int,
                        target_bytes: int = _TARGET_BRICK_BYTES) -> Tuple[int, ...]:
    """Spatial brick dims for (C, *spatial) arrays (channels ride along)."""
    c = image_shape[0]
    spatial = list(image_shape[1:])
    if patch_size is None or len(patch_size) != len(spatial):
        patch_size = spatial
    brick = []
    for img, p in zip(spatial, patch_size):
        half = max(8, int(p) // 2)
        brick.append(int(min(img, 1 << max(3, (half - 1).bit_length()))))
    # shrink the largest axis until the brick fits the cache budget
    while int(np.prod(brick)) * c * bytes_per_voxel > target_bytes \
            and max(brick) > 8:
        brick[int(np.argmax(brick))] //= 2
    return tuple(max(1, b) for b in brick)


def _brick_grid(spatial: Sequence[int], brick: Sequence[int]) -> List[int]:
    return [(s + b - 1) // b for s, b in zip(spatial, brick)]


def _byte_shuffle(buf: np.ndarray) -> bytes:
    """blosc-style byte transposition: group the i-th byte of every element
    together so zstd sees long runs of slowly-varying high bytes (floats
    barely compress without this)."""
    return buf.reshape(-1).view(np.uint8).reshape(-1, buf.itemsize).T.tobytes()


def _byte_unshuffle(raw: bytes, dtype: np.dtype) -> np.ndarray:
    u8 = np.frombuffer(raw, np.uint8).reshape(dtype.itemsize, -1)
    return np.ascontiguousarray(u8.T).reshape(-1).view(dtype)


def write_fnnz(path: str, array: np.ndarray,
               patch_size: Optional[Sequence[int]] = None) -> None:
    assert _zstd is not None, "zstandard unavailable"
    array = np.ascontiguousarray(array)
    brick = compute_brick_shape(array.shape, patch_size, array.itemsize)
    grid = _brick_grid(array.shape[1:], brick)
    comp = _zstd.ZstdCompressor(level=_COMPRESS_LEVEL)

    frames, offsets, pos = [], [], 0
    for idx in np.ndindex(*grid):
        sl = (slice(None),) + tuple(
            slice(i * b, min((i + 1) * b, s))
            for i, b, s in zip(idx, brick, array.shape[1:]))
        frame = comp.compress(_byte_shuffle(np.ascontiguousarray(array[sl])))
        frames.append(frame)
        offsets.append([pos, len(frame)])
        pos += len(frame)

    header = json.dumps({
        "shape": list(array.shape), "dtype": np.dtype(array.dtype).str,
        "brick": list(brick), "offsets": offsets, "shuffle": True,
    }).encode()
    tmp = path + ".part"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        for frame in frames:
            f.write(frame)
    os.replace(tmp, path)


class BrickReader:
    """Lazy numpy-like view over a .fnnz file: basic slicing decompresses only
    the bricks the requested region overlaps."""

    def __init__(self, path: str):
        assert _zstd is not None, "zstandard unavailable"
        self._path = path
        with open(path, "rb") as f:
            magic = f.read(len(_MAGIC))
            assert magic == _MAGIC, f"not a fnnz file: {path}"
            (hlen,) = struct.unpack("<I", f.read(4))
            hdr = json.loads(f.read(hlen).decode())
            self._payload_start = f.tell()
        self.shape = tuple(hdr["shape"])
        self.dtype = np.dtype(hdr["dtype"])
        self._brick = tuple(hdr["brick"])
        self._offsets = hdr["offsets"]
        self._shuffle = bool(hdr.get("shuffle", False))
        self._grid = _brick_grid(self.shape[1:], self._brick)

    @property
    def ndim(self) -> int:
        return len(self.shape)

    def __array__(self, dtype=None, copy=None):
        out = self[(slice(None),) * self.ndim]
        return out.astype(dtype) if dtype is not None else out

    def _frame(self, lin: int) -> np.ndarray:
        off, length = self._offsets[lin]
        with open(self._path, "rb") as f:
            f.seek(self._payload_start + off)
            raw = f.read(length)
        raw = _zstd.ZstdDecompressor().decompress(raw)
        if self._shuffle:
            return _byte_unshuffle(raw, self.dtype)
        return np.frombuffer(raw, self.dtype)

    def __getitem__(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        assert all(isinstance(i, slice) for i in idx) and len(idx) <= self.ndim, \
            "BrickReader supports basic slice indexing only"
        idx = idx + (slice(None),) * (self.ndim - len(idx))
        bounds = [i.indices(s) for i, s in zip(idx, self.shape)]
        assert all(step == 1 for _, _, step in bounds), "step slicing unsupported"
        lo = [b[0] for b in bounds]
        hi = [b[1] for b in bounds]
        out = np.empty([max(0, h - l) for l, h in zip(lo, hi)], self.dtype)
        if out.size == 0:
            return out

        c = self.shape[0]
        ranges = [range(l // b, (h - 1) // b + 1)
                  for l, h, b in zip(lo[1:], hi[1:], self._brick)]
        for idx_b in np.ndindex(*[len(r) for r in ranges]):
            bcoord = [r[i] for r, i in zip(ranges, idx_b)]
            bstart = [bc * b for bc, b in zip(bcoord, self._brick)]
            bshape = [min(b, s - st) for b, s, st in
                      zip(self._brick, self.shape[1:], bstart)]
            lin = int(np.ravel_multi_index(bcoord, self._grid))
            brick = self._frame(lin).reshape(c, *bshape)
            # intersection in global coords
            glo = [max(l, st) for l, st in zip(lo[1:], bstart)]
            ghi = [min(h, st + bs) for h, st, bs in zip(hi[1:], bstart, bshape)]
            src = (slice(lo[0], hi[0]),) + tuple(
                slice(a - st, b - st) for a, b, st in zip(glo, ghi, bstart))
            dst = (slice(None),) + tuple(
                slice(a - l, b - l) for a, b, l in zip(glo, ghi, lo[1:]))
            out[dst] = brick[src]
        return out


class ZstdCaseDataset:
    """Drop-in sibling of NpyCaseDataset over .fnnz files."""
    suffix_data = ".fnnz"
    suffix_seg = "_seg.fnnz"
    suffix_props = ".pkl"

    def __init__(self, folder: str, identifiers: Optional[List[str]] = None):
        self.folder = folder
        if identifiers is None:
            identifiers = self.get_identifiers(folder)
        self.identifiers = list(identifiers)

    @classmethod
    def get_identifiers(cls, folder: str) -> List[str]:
        from ..utils.io import subfiles
        files = subfiles(folder, suffix=cls.suffix_data, join_path=False)
        return sorted(f[: -len(cls.suffix_data)] for f in files
                      if not f.endswith(cls.suffix_seg))

    def __len__(self):
        return len(self.identifiers)

    def keys(self):
        return list(self.identifiers)

    @classmethod
    def save_case(cls, data: np.ndarray, seg: Optional[np.ndarray],
                  properties: dict, output_filename_truncated: str,
                  patch_size: Optional[Sequence[int]] = None) -> None:
        from ..utils.io import save_pickle
        write_fnnz(output_filename_truncated + cls.suffix_data,
                   np.ascontiguousarray(data, dtype=np.float32), patch_size)
        if seg is not None:
            seg_dtype = np.int16 if (seg.max() > 127 or seg.min() < -128) \
                else np.int8
            write_fnnz(output_filename_truncated + cls.suffix_seg,
                       np.ascontiguousarray(seg, dtype=seg_dtype), patch_size)
        save_pickle(properties, output_filename_truncated + cls.suffix_props)

    def load_case(self, identifier: str, mmap: bool = True):
        from ..utils.io import load_pickle
        base = os.path.join(self.folder, identifier)
        data = BrickReader(base + self.suffix_data)
        seg_path = base + self.suffix_seg
        seg = BrickReader(seg_path) if os.path.isfile(seg_path) else None
        if not mmap:  # eager full read
            data = np.asarray(data)
            seg = np.asarray(seg) if seg is not None else None
        properties = load_pickle(base + self.suffix_props)
        return data, seg, properties

    def load_properties(self, identifier: str) -> dict:
        from ..utils.io import load_pickle
        return load_pickle(os.path.join(self.folder, identifier)
                           + self.suffix_props)
