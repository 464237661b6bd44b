import os

import numpy as np
import pytest

from fast_nnunet_tpu.imageio.nifti import NiftiIO, read_nifti, write_nifti
from fast_nnunet_tpu.imageio.natural_image import NaturalImage2DIO
from fast_nnunet_tpu.imageio.registry import (
    determine_reader_writer_from_dataset_json, find_reader_writer_by_name)


def test_nifti_roundtrip_raw(tmp_path):
    data = np.random.RandomState(0).randint(0, 1000, (7, 9, 11)).astype(np.int16)
    f = str(tmp_path / "x.nii.gz")
    write_nifti(f, data, spacing=(1.5, 0.7, 3.0))
    back, hdr = read_nifti(f)
    np.testing.assert_array_equal(back, data)
    np.testing.assert_allclose(hdr["pixdim"][1:4], [1.5, 0.7, 3.0], rtol=1e-6)


def test_nifti_uncompressed(tmp_path):
    data = np.random.RandomState(1).rand(4, 5, 6).astype(np.float32)
    f = str(tmp_path / "x.nii")
    write_nifti(f, data, spacing=(1, 1, 1))
    back, _ = read_nifti(f)
    np.testing.assert_allclose(back, data)


def test_readerwriter_convention(tmp_path):
    # (i, j, k) on disk with spacing (si, sj, sk) -> array (k, j, i), spacing reversed
    data = np.zeros((4, 5, 6), np.float32)
    data[1, 2, 3] = 7.0
    f = str(tmp_path / "img_0000.nii.gz")
    write_nifti(f, data, spacing=(0.5, 1.0, 2.0))
    io = NiftiIO()
    arr, props = io.read_images([f])
    assert arr.shape == (1, 6, 5, 4)
    assert arr[0, 3, 2, 1] == 7.0
    assert props["spacing"] == [2.0, 1.0, 0.5]


def test_write_seg_roundtrip_geometry(tmp_path):
    io = NiftiIO()
    img = np.random.RandomState(2).rand(8, 6, 4).astype(np.float32)
    f = str(tmp_path / "case_0000.nii.gz")
    write_nifti(f, img, spacing=(1.0, 2.0, 3.0))
    arr, props = io.read_images([f])
    seg = (arr[0] > 0.5).astype(np.uint8)
    out = str(tmp_path / "seg.nii.gz")
    io.write_seg(seg, out, props)
    seg_back, props2 = io.read_seg(out)
    np.testing.assert_array_equal(seg_back[0], seg)
    assert props2["spacing"] == props["spacing"]


def test_multichannel_consistency_check(tmp_path):
    io = NiftiIO()
    f1 = str(tmp_path / "a_0000.nii.gz")
    f2 = str(tmp_path / "a_0001.nii.gz")
    write_nifti(f1, np.zeros((4, 4, 4), np.float32), spacing=(1, 1, 1))
    write_nifti(f2, np.zeros((4, 4, 5), np.float32), spacing=(1, 1, 1))
    with pytest.raises(RuntimeError):
        io.read_images([f1, f2])


def test_4d_nifti_channels(tmp_path):
    data = np.random.RandomState(3).rand(4, 5, 6, 2).astype(np.float32)
    f = str(tmp_path / "x.nii.gz")
    write_nifti(f, data, spacing=(1, 1, 1))
    arr, props = NiftiIO().read_images([f])
    assert arr.shape == (2, 6, 5, 4)
    np.testing.assert_allclose(arr[1], data[..., 1].transpose(2, 1, 0))


def test_scl_slope_applied(tmp_path):
    import struct
    data = np.ones((2, 2, 2), np.int16) * 10
    f = str(tmp_path / "x.nii")
    write_nifti(f, data, spacing=(1, 1, 1))
    raw = bytearray(open(f, "rb").read())
    struct.pack_into("<f", raw, 112, 2.0)   # scl_slope
    struct.pack_into("<f", raw, 116, -5.0)  # scl_inter
    open(f, "wb").write(bytes(raw))
    back, _ = read_nifti(f)
    np.testing.assert_allclose(back, 15.0)


def test_natural_image_io(tmp_path):
    from PIL import Image
    arr = np.random.RandomState(4).randint(0, 255, (10, 12), np.uint8)
    f = str(tmp_path / "img.png")
    Image.fromarray(arr).save(f)
    io = NaturalImage2DIO()
    data, props = io.read_images([f])
    assert data.shape == (1, 1, 10, 12)
    assert props["spacing"] == (999.0, 1.0, 1.0)
    out = str(tmp_path / "seg.png")
    io.write_seg((data[0] > 128).astype(np.uint8), out, props)
    seg, _ = io.read_seg(out)
    assert set(np.unique(seg)) <= {0, 1}


def test_registry():
    assert find_reader_writer_by_name("SimpleITKIO").__name__ in ("SimpleITKIO", "NiftiIO")
    dj = {"file_ending": ".nii.gz"}
    assert determine_reader_writer_from_dataset_json(dj).supported_file_endings
    dj2 = {"overwrite_image_reader_writer": "NaturalImage2DIO", "file_ending": ".png"}
    assert determine_reader_writer_from_dataset_json(dj2) is NaturalImage2DIO


def test_nrrd_roundtrip(tmp_path):
    from fast_nnunet_tpu.imageio.nrrd import NrrdIO, read_nrrd, write_nrrd
    data = np.random.RandomState(5).randint(0, 200, (6, 7, 8)).astype(np.int16)
    f = str(tmp_path / "x.nrrd")
    write_nrrd(f, data, spacing=(1.5, 0.7, 3.0))
    back, hdr = read_nrrd(f)
    np.testing.assert_array_equal(back, data)
    np.testing.assert_allclose(hdr["_spacing"], [1.5, 0.7, 3.0], rtol=1e-6)

    io = NrrdIO()
    arr, props = io.read_images([f])
    assert arr.shape == (1, 8, 7, 6)
    assert props["spacing"] == [3.0, 0.7, 1.5]
    out = str(tmp_path / "seg.nrrd")
    io.write_seg((arr[0] > 100).astype(np.uint8), out, props)
    seg, props2 = io.read_seg(out)
    assert seg.shape == (1, 8, 7, 6)
    assert props2["spacing"] == props["spacing"]


def test_mha_roundtrip(tmp_path):
    from fast_nnunet_tpu.imageio.mha import MhaIO, read_mha, write_mha
    data = np.random.RandomState(6).randint(-100, 400, (5, 6, 7)).astype(np.int16)
    f = str(tmp_path / "x.mha")
    write_mha(f, data, spacing=(0.8, 1.2, 2.5))
    back, hdr = read_mha(f)
    np.testing.assert_array_equal(back, data)
    np.testing.assert_allclose(hdr["_spacing"], [0.8, 1.2, 2.5])
    io = MhaIO()
    arr, props = io.read_images([f])
    assert arr.shape == (1, 7, 6, 5)
    assert props["spacing"] == [2.5, 1.2, 0.8]
    out = str(tmp_path / "seg.mha")
    io.write_seg((arr[0] > 100).astype(np.uint8), out, props)
    seg, p2 = io.read_seg(out)
    assert seg.shape == (1, 7, 6, 5) and p2["spacing"] == props["spacing"]


def test_tiff3d_roundtrip(tmp_path):
    from fast_nnunet_tpu.imageio.tiff import Tiff3DIO
    import json
    vol = np.random.RandomState(7).randint(0, 255, (5, 8, 9)).astype(np.uint8)
    f = str(tmp_path / "x.tif")
    Tiff3DIO().write_seg(vol, f, {"spacing": [2.0, 1.0, 1.0]})
    io = Tiff3DIO()
    arr, props = io.read_images([f])
    assert arr.shape == (1, 5, 8, 9)
    np.testing.assert_array_equal(arr[0].astype(np.uint8), vol)
    assert props["spacing"] == [2.0, 1.0, 1.0]


def test_reorient_io_ras_and_restore(tmp_path):
    """A volume saved in a flipped/permuted orientation must read identically
    (in RAS) to its identity-affine twin, and seg write-back must restore the
    original disk layout + header."""
    from fast_nnunet_tpu.imageio.nifti import (NiftiIOWithReorient,
                                               apply_orientation,
                                               invert_orientation,
                                               io_orientation)

    rng = np.random.RandomState(0)
    vol_ras = rng.rand(5, 6, 7).astype(np.float32)  # disk (i,j,k) = RAS

    # identity-affine file
    f_ras = str(tmp_path / "ras.nii.gz")
    write_nifti(f_ras, vol_ras, spacing=(1.0, 2.0, 3.0))

    # the same anatomy stored PSL-ish: permute (k,j,i) and flip two axes;
    # affine must map that disk layout back to the same world coordinates
    disk = np.transpose(vol_ras, (2, 1, 0))[::-1, :, ::-1]
    hdr = read_nifti(f_ras)[1]
    hdr = dict(hdr)
    hdr["dim"] = [3] + list(disk.shape) + [1, 1, 1, 1]
    hdr["pixdim"] = [1.0, 3.0, 2.0, 1.0, 1, 1, 1, 1]
    hdr["sform_code"] = 1
    # disk axis 0 = -S (flip of world z), axis 1 = +A, axis 2 = -R
    hdr["srow_x"] = [0, 0, -1.0, 0]
    hdr["srow_y"] = [0, 2.0, 0, 0]
    hdr["srow_z"] = [-3.0, 0, 0, 0]
    f_rot = str(tmp_path / "rot.nii.gz")
    write_nifti(f_rot, np.ascontiguousarray(disk), header=hdr)

    io = NiftiIOWithReorient()
    d_ras, p_ras = io.read_images([f_ras])
    d_rot, p_rot = io.read_images([f_rot])
    np.testing.assert_array_equal(d_ras[0], d_rot[0])
    assert p_ras["spacing"] == p_rot["spacing"] == [3.0, 2.0, 1.0]

    # orientation helpers are exact inverses
    ornt = io_orientation(np.array(p_rot["affine"]))
    arr = rng.rand(4, 5, 6)
    np.testing.assert_array_equal(invert_orientation(apply_orientation(arr, ornt), ornt), arr)

    # seg write-back restores the on-disk layout of the rotated file
    seg = (d_rot[0] > 0.5).astype(np.uint8)
    f_seg = str(tmp_path / "seg.nii.gz")
    io.write_seg(seg, f_seg, p_rot)
    seg_disk, seg_hdr = read_nifti(f_seg)
    expected_disk = np.transpose((vol_ras > 0.5), (2, 1, 0))[::-1, :, ::-1]
    np.testing.assert_array_equal(seg_disk, expected_disk.astype(np.uint8))
    assert list(seg_hdr["srow_x"]) == [0, 0, -1.0, 0]

    # registry resolves the reference names to the real reorienting class
    from fast_nnunet_tpu.imageio.registry import find_reader_writer_by_name
    assert issubclass(find_reader_writer_by_name("NibabelIOWithReorient"),
                      NiftiIOWithReorient)
    assert issubclass(find_reader_writer_by_name("SimpleITKIOWithReorient"),
                      NiftiIOWithReorient)


# ---------------------------------------------------------------- fastgz
def test_fastgz_roundtrip_and_stdlib_interop():
    """libdeflate codec: our compress <-> stdlib, stdlib compress <-> our
    decompress, multi-member files, and the no-library fallback contract."""
    import gzip as _gzip
    from fast_nnunet_tpu.utils import fastgz

    rng = np.random.RandomState(3)
    payload = rng.randint(0, 255, size=300_000, dtype=np.uint8)
    payload[1000:200_000] = 7  # compressible middle

    if not fastgz.available():
        assert fastgz.gzip_compress(payload) is None
        assert fastgz.gzip_decompress(b"\x1f\x8b") is None
        pytest.skip("libdeflate not on this host (fallback contract checked)")

    blob = fastgz.gzip_compress(payload, level=1)
    assert _gzip.decompress(blob) == payload.tobytes()

    std_blob = _gzip.compress(payload.tobytes(), compresslevel=1)
    out = fastgz.gzip_decompress(std_blob)
    assert out is not None and out.tobytes() == payload.tobytes()

    # multi-member (bgzf-style concatenation) + trailing zero pad
    two = blob + std_blob + b"\x00" * 37
    out2 = fastgz.gzip_decompress(two)
    assert out2.tobytes() == payload.tobytes() * 2

    # Fortran-order ndarray source: compress must read the buffer as laid out
    arr = np.asfortranarray(rng.randn(40, 30, 20).astype(np.float32))
    flat = arr.reshape(-1, order="F")
    assert _gzip.decompress(fastgz.gzip_compress(flat)) == flat.tobytes()


def test_nifti_gz_roundtrip_matches_uncompressed(tmp_path):
    """write_nifti/.gz (libdeflate path) and read_nifti stay bit-exact with
    the uncompressed path, including non-trivial affine and int16 data."""
    rng = np.random.RandomState(5)
    data = rng.randint(-900, 2000, size=(33, 21, 17), dtype=np.int16)
    hdr = {"pixdim": [1.0, 0.7, 0.9, 1.3, 0, 0, 0, 0],
           "srow_x": [0.7, 0, 0, -10.0], "srow_y": [0, 0.9, 0, 4.0],
           "srow_z": [0, 0, 1.3, 2.5], "sform_code": 1, "qform_code": 0,
           "quatern": [0.0] * 6}
    from fast_nnunet_tpu.imageio.nifti import read_nifti, write_nifti
    p_gz = str(tmp_path / "a.nii.gz")
    p_raw = str(tmp_path / "a.nii")
    write_nifti(p_gz, data, hdr)
    write_nifti(p_raw, data, hdr)
    d1, h1 = read_nifti(p_gz)
    d2, h2 = read_nifti(p_raw)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(d1, data)
    assert h1["srow_x"] == h2["srow_x"]  # header f32 round-trips identically
    np.testing.assert_allclose(h1["srow_x"], [0.7, 0.0, 0.0, -10.0], rtol=1e-6)
