"""Self-contained NIfTI-1 I/O in pure numpy (neither nibabel nor SimpleITK is a
dependency of this framework; capability parity with the reference's
SimpleITKIO/NibabelIO, ref distillation/nnunetv2/imageio/simpleitk_reader_writer.py
and nibabel_reader_writer.py).

Axis convention: on-disk NIfTI data is Fortran-ordered (i fastest). We expose
arrays as (k, j, i) with spacing (pixdim3, pixdim2, pixdim1) — the same reversal
the reference gets from SimpleITK's GetArrayFromImage, so downstream spacing
math matches the reference voxel-for-voxel. The full header is kept in
properties for geometry-exact round trips.
"""
import gzip
import os
import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .base import BaseReaderWriter
from ..utils import fastgz

_DTYPE_BY_CODE = {
    2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32, 64: np.float64,
    256: np.int8, 512: np.uint16, 768: np.uint32, 1024: np.int64, 1280: np.uint64,
}
_CODE_BY_DTYPE = {np.dtype(v): k for k, v in _DTYPE_BY_CODE.items()}

HEADER_SIZE = 348


def _open(fname: str, mode: str = "rb"):
    if fname.endswith(".gz"):
        if "w" in mode:
            # compresslevel 1: segmentation masks and CT volumes are highly
            # redundant, so level 1 compresses nearly as well as the default
            # 9 but an order of magnitude faster — gzip WRITE was 51.7 s of a
            # 75.6 s end-to-end 512^3 serve at level 9 (round-3 e2e bench);
            # FNN_GZIP_LEVEL overrides for archival outputs
            level = int(os.environ.get("FNN_GZIP_LEVEL", 1))
            return gzip.open(fname, mode, compresslevel=level)
        return gzip.open(fname, mode)
    return open(fname, mode)


def _read_payload(fname: str) -> np.ndarray:
    """Whole file -> decompressed bytes as a uint8 array. The libdeflate
    one-shot path (utils/fastgz.py) is ~3x faster than stdlib gzip on the
    single serving core and hands back a writable buffer we own."""
    if fname.endswith(".gz"):
        with open(fname, "rb") as f:
            raw = f.read()
        dec = fastgz.gzip_decompress(raw)
        if dec is None:  # no libdeflate on this host: stdlib fallback
            dec = np.frombuffer(gzip.decompress(raw), np.uint8)
        return dec
    return np.fromfile(fname, np.uint8)


def read_nifti(fname: str) -> Tuple[np.ndarray, dict]:
    """Returns (data in on-disk (i, j, k[, t]) index order, header dict).

    The array is Fortran-ordered — a zero-copy view over the decompressed
    buffer for native-endian unscaled files (the hot CT path: a 236 MB
    512x512x450 read dropped 5.3 s -> 0.9 s when the astype +
    ascontiguousarray copies were cut). Values/shape are identical to a
    C-order copy; index order is unchanged. It may be read-only — callers
    that mutate must copy (every in-repo caller already does)."""
    payload = _read_payload(fname)
    raw = payload  # header + voxels share the buffer
    hdr = raw[:HEADER_SIZE].tobytes()
    sizeof_hdr = struct.unpack("<i", hdr[:4])[0]
    if sizeof_hdr == 348:
        endian = "<"
    elif struct.unpack(">i", hdr[:4])[0] == 348:
        endian = ">"
    else:
        raise ValueError(f"{fname}: not a NIfTI-1 file (sizeof_hdr != 348). "
                         "NIfTI-2 is not supported yet.")

    def unpack(fmt, offset, count=1):
        size = struct.calcsize(endian + fmt * count)
        return struct.unpack(endian + fmt * count, hdr[offset:offset + size])

    dim = unpack("h", 40, 8)
    datatype = unpack("h", 70)[0]
    pixdim = unpack("f", 76, 8)
    vox_offset = int(unpack("f", 108)[0])
    scl_slope = unpack("f", 112)[0]
    scl_inter = unpack("f", 116)[0]
    qform_code = unpack("h", 252)[0]
    sform_code = unpack("h", 254)[0]
    quatern = unpack("f", 256, 6)  # b, c, d, qoffset x/y/z
    srow_x = unpack("f", 280, 4)
    srow_y = unpack("f", 296, 4)
    srow_z = unpack("f", 312, 4)
    magic = hdr[344:348]
    if magic[:2] not in (b"n+", b"ni"):
        raise ValueError(f"{fname}: bad NIfTI magic {magic!r}")

    ndim = dim[0]
    shape = tuple(max(1, d) for d in dim[1:1 + max(ndim, 3)])
    if datatype not in _DTYPE_BY_CODE:
        raise ValueError(f"{fname}: unsupported NIfTI datatype code {datatype}")
    dtype = np.dtype(_DTYPE_BY_CODE[datatype]).newbyteorder(endian)

    count = int(np.prod(shape))
    offset = max(vox_offset, HEADER_SIZE + 4 if magic[:2] == b"n+" else HEADER_SIZE)
    data = raw[offset:offset + count * dtype.itemsize].view(dtype)
    data = data.reshape(shape, order="F")
    if dtype != dtype.newbyteorder("="):
        # non-native byte order: one copy to native
        data = data.astype(dtype.newbyteorder("="))
    if scl_slope not in (0.0, 1.0) or scl_inter != 0.0:
        slope = scl_slope if scl_slope != 0 else 1.0
        data = data * np.float32(slope) + np.float32(scl_inter)

    header = {
        "dim": list(dim), "datatype": int(datatype), "pixdim": list(pixdim),
        "scl_slope": float(scl_slope), "scl_inter": float(scl_inter),
        "qform_code": int(qform_code), "sform_code": int(sform_code),
        "quatern": list(quatern),
        "srow_x": list(srow_x), "srow_y": list(srow_y), "srow_z": list(srow_z),
        "endian": endian,
    }
    return data, header


def _affine_from_header(h: dict) -> np.ndarray:
    if h["sform_code"] > 0:
        return np.array([h["srow_x"], h["srow_y"], h["srow_z"], [0, 0, 0, 1]],
                        dtype=np.float64)
    # qform / fallback: quaternion rotation * pixdim scaling
    b, c, d, ox, oy, oz = h["quatern"]
    a2 = max(0.0, 1.0 - b * b - c * c - d * d)
    a = np.sqrt(a2)
    R = np.array([
        [a * a + b * b - c * c - d * d, 2 * (b * c - a * d), 2 * (b * d + a * c)],
        [2 * (b * c + a * d), a * a + c * c - b * b - d * d, 2 * (c * d - a * b)],
        [2 * (b * d - a * c), 2 * (c * d + a * b), a * a + d * d - b * b - c * c]])
    qfac = -1.0 if h["pixdim"][0] < 0 else 1.0
    scales = np.array([h["pixdim"][1], h["pixdim"][2], h["pixdim"][3] * qfac])
    aff = np.eye(4)
    aff[:3, :3] = R * scales
    aff[:3, 3] = [ox, oy, oz]
    return aff


def write_nifti(fname: str, data: np.ndarray, header: Optional[dict] = None,
                spacing: Optional[Sequence[float]] = None) -> None:
    """data in on-disk (i, j, k) index order. Either a header dict (round-trip) or
    a spacing (i, j, k order) for fresh files."""
    data = np.asarray(data)
    if data.dtype == bool:
        data = data.astype(np.uint8)
    if np.dtype(data.dtype) not in _CODE_BY_DTYPE:
        data = data.astype(np.float32)
    code = _CODE_BY_DTYPE[np.dtype(data.dtype)]
    ndim = data.ndim
    dim = [ndim] + list(data.shape) + [1] * (7 - ndim)

    if header is not None:
        pixdim = list(header["pixdim"])
        qform_code, sform_code = header["qform_code"], header["sform_code"]
        quatern = header["quatern"]
        srow_x, srow_y, srow_z = header["srow_x"], header["srow_y"], header["srow_z"]
    else:
        spacing = list(spacing) if spacing is not None else [1.0] * 3
        pixdim = [1.0] + spacing[:3] + [1.0] * (7 - 3)
        qform_code, sform_code = 0, 1
        quatern = [0.0] * 6
        srow_x = [spacing[0], 0, 0, 0]
        srow_y = [0, spacing[1], 0, 0]
        srow_z = [0, 0, spacing[2], 0]

    hdr = bytearray(HEADER_SIZE)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, *dim)
    struct.pack_into("<h", hdr, 70, code)
    struct.pack_into("<h", hdr, 72, data.dtype.itemsize * 8)  # bitpix
    struct.pack_into("<8f", hdr, 76, *pixdim)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)    # scl_slope
    struct.pack_into("<f", hdr, 116, 0.0)    # scl_inter
    struct.pack_into("<h", hdr, 252, qform_code)
    struct.pack_into("<h", hdr, 254, sform_code)
    struct.pack_into("<6f", hdr, 256, *quatern)
    struct.pack_into("<4f", hdr, 280, *srow_x)
    struct.pack_into("<4f", hdr, 296, *srow_y)
    struct.pack_into("<4f", hdr, 312, *srow_z)
    hdr[344:348] = b"n+1\x00"

    flat = np.asfortranarray(data).reshape(-1, order="F").view(np.uint8)
    head = bytes(hdr) + b"\x00\x00\x00\x00"
    if fname.endswith(".gz"):
        level = int(os.environ.get("FNN_GZIP_LEVEL", 1))
        # two gzip members (header+offset, then the voxel payload view):
        # concatenated members are standard gzip, every reader (stdlib,
        # zlib gzread, nibabel, our fastgz) handles them, and skipping the
        # single-buffer assembly saves a full memcpy of the payload
        # (0.6 s of the 118 MB e2e mask write)
        b1 = fastgz.gzip_compress(np.frombuffer(head, np.uint8), level)
        b2 = fastgz.gzip_compress(flat, level)
        if b1 is not None and b2 is not None:
            with open(fname, "wb") as f:
                f.write(b1)
                f.write(b2)
            return
    with _open(fname, "wb") as f:
        f.write(head)
        f.write(flat.tobytes())


class NiftiIO(BaseReaderWriter):
    """(C, X, Y, Z) with X=k, Y=j, Z=i (reversed on-disk order) and spacing
    reversed to match — the reference's SimpleITK convention."""
    supported_file_endings = [".nii", ".nii.gz"]

    def read_images(self, image_fnames: Sequence[str],
                    dtype=np.float32) -> Tuple[np.ndarray, dict]:
        """dtype=None keeps the on-disk dtype (e.g. int16 CT HU) — the turbo
        serving path normalizes on device, so reading as float32 would only
        quadruple host memory traffic and H2D bytes."""
        images, spacings, headers = [], [], []
        for f in image_fnames:
            data, hdr = read_nifti(f)
            if data.ndim == 4:  # 4D volume file: channels are the 4th dim
                chans = [data[..., t].transpose(2, 1, 0) for t in range(data.shape[3])]
                sp = hdr["pixdim"][1:4][::-1]
            elif data.ndim == 3:
                chans = [data.transpose(2, 1, 0)]
                sp = hdr["pixdim"][1:4][::-1]
            elif data.ndim == 2:
                chans = [data.transpose(1, 0)]
                sp = hdr["pixdim"][1:3][::-1]
            else:
                raise ValueError(f"{f}: unsupported ndim {data.ndim}")
            images.extend(chans)
            spacings.append([abs(s) if s != 0 else 1.0 for s in sp])
            headers.append(hdr)

        if not self._check_all_same([i.shape for i in images]):
            raise RuntimeError(f"Image channels have mismatched shapes: "
                               f"{[i.shape for i in images]} ({image_fnames})")
        if not self._check_all_same(spacings):
            raise RuntimeError(f"Image channels have mismatched spacings: {spacings}")

        data = np.stack(images)
        if dtype is not None:
            data = data.astype(dtype, copy=False)
        if data.ndim == 3:  # 2D natural case: (C, X, Y) -> fake Z
            data = data[:, None]
            spacing = [999.0] + list(spacings[0])[:2]
        else:
            spacing = list(spacings[0])
        props = {
            "spacing": spacing,
            "nifti_header": headers[0],
            "affine": _affine_from_header(headers[0]).tolist(),
        }
        return data, props

    def read_seg(self, seg_fname: str) -> Tuple[np.ndarray, dict]:
        data, props = self.read_images([seg_fname])
        return data, props

    def write_seg(self, seg: np.ndarray, output_fname: str, properties: dict) -> None:
        hdr = properties.get("nifti_header")
        if seg.ndim == 3 and seg.shape[0] == 1 and len(properties.get("spacing", [])) == 3 \
                and properties["spacing"][0] == 999.0:
            seg = seg[0]  # fake-Z 2D case
        if seg.ndim == 2:
            seg_disk = seg.transpose(1, 0)
        else:
            seg_disk = seg.transpose(2, 1, 0)  # back to (i, j, k)
        dtype = np.uint8 if seg.max() < 255 else np.uint16
        if hdr is not None:
            hdr = dict(hdr)
            hdr_dim = [seg_disk.ndim] + list(seg_disk.shape) + [1] * (7 - seg_disk.ndim)
            hdr["dim"] = hdr_dim
            write_nifti(output_fname, seg_disk.astype(dtype), header=hdr)
        else:
            spacing = properties["spacing"][::-1]
            write_nifti(output_fname, seg_disk.astype(dtype), spacing=spacing)


# alias matching reference plans files ("SimpleITKIO" is the registered default)
class SimpleITKIO(NiftiIO):
    pass


class NibabelIO(NiftiIO):
    pass


# ------------------------------------------------------------- RAS reorient
def io_orientation(affine: np.ndarray):
    """For each voxel axis (disk order i, j, k), the closest world axis and its
    sign — the nibabel io_orientation contract (ref imageio/nibabel_reader_writer.py
    NibabelIOWithReorient canonicalizes with nib.as_closest_canonical)."""
    R = np.asarray(affine, np.float64)[:3, :3]
    ornt = []
    used = set()
    for j in range(3):
        col = R[:, j]
        for ax in np.argsort(-np.abs(col)):
            if int(ax) not in used:
                break
        used.add(int(ax))
        ornt.append((int(ax), 1.0 if col[int(ax)] >= 0 else -1.0))
    return ornt


def apply_orientation(arr: np.ndarray, ornt) -> np.ndarray:
    """Disk-order (i, j, k) array -> RAS-ordered (r, a, s) array."""
    perm = [0, 0, 0]
    for j, (ax, _) in enumerate(ornt):
        perm[ax] = j
    out = np.transpose(arr, perm)
    for a in range(3):
        if ornt[perm[a]][1] < 0:
            out = np.flip(out, axis=a)
    return out


def invert_orientation(arr: np.ndarray, ornt) -> np.ndarray:
    """RAS-ordered array -> original disk order (exact inverse of
    apply_orientation)."""
    perm = [0, 0, 0]
    for j, (ax, _) in enumerate(ornt):
        perm[ax] = j
    for a in range(3):
        if ornt[perm[a]][1] < 0:
            arr = np.flip(arr, axis=a)
    return np.transpose(arr, np.argsort(perm))


class NiftiIOWithReorient(NiftiIO):
    """Reads with reorientation to closest-canonical RAS (so mixed-orientation
    datasets align anatomically) and restores the original orientation +
    header on write — the role of the reference's NibabelIOWithReorient /
    SimpleITKIOWithReorient readers."""

    def read_images(self, image_fnames: Sequence[str],
                    dtype=np.float32) -> Tuple[np.ndarray, dict]:
        images, spacings, headers, ornts = [], [], [], []
        for f in image_fnames:
            data, hdr = read_nifti(f)
            if data.ndim != 3:
                # 2D/4D: no orientation handling needed/defined; plain path
                return NiftiIO.read_images(self, image_fnames, dtype=dtype)
            ornt = io_orientation(_affine_from_header(hdr))
            ras = apply_orientation(data, ornt)
            # materialize NOW: np.stack over doubly-transposed (+flipped)
            # views walks the array in the worst possible stride order
            # (measured 33 s for one 512x512x450 CT vs 0.4 s for numpy's
            # dedicated transpose-copy here)
            images.append(np.ascontiguousarray(
                ras.transpose(2, 1, 0)))  # internal (S, A, R)
            perm = [0, 0, 0]
            for j, (ax, _) in enumerate(ornt):
                perm[ax] = j
            sp_ras = [abs(hdr["pixdim"][1 + perm[a]]) or 1.0 for a in range(3)]
            spacings.append(sp_ras[::-1])
            headers.append(hdr)
            ornts.append(ornt)

        if not self._check_all_same([i.shape for i in images]):
            raise RuntimeError(f"Image channels have mismatched shapes after "
                               f"reorientation: {[i.shape for i in images]} "
                               f"({image_fnames})")
        if not self._check_all_same(spacings):
            raise RuntimeError(f"Image channels have mismatched spacings: {spacings}")
        data = np.stack(images)
        if dtype is not None:
            data = data.astype(dtype, copy=False)
        props = {
            "spacing": list(spacings[0]),
            "nifti_header": headers[0],
            "affine": _affine_from_header(headers[0]).tolist(),
            "reorientation": [list(o) for o in ornts[0]],
        }
        return data, props

    def write_seg(self, seg: np.ndarray, output_fname: str, properties: dict) -> None:
        ornt = properties.get("reorientation")
        if ornt is None:
            return NiftiIO.write_seg(self, seg, output_fname, properties)
        ornt = [(int(a), float(s)) for a, s in ornt]
        ras = seg.transpose(2, 1, 0)  # internal (S, A, R) -> (R, A, S)
        disk = invert_orientation(ras, ornt)
        hdr = dict(properties["nifti_header"])
        hdr["dim"] = [3] + list(disk.shape) + [1, 1, 1, 1]
        dtype = np.uint8 if seg.max() < 255 else np.uint16
        write_nifti(output_fname, np.ascontiguousarray(disk).astype(dtype),
                    header=hdr)


class SimpleITKIOWithReorient(NiftiIOWithReorient):
    pass


class NibabelIOWithReorient(NiftiIOWithReorient):
    pass
