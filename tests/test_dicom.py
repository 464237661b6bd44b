"""DICOM series reader: synthetic slices are encoded byte-by-byte here
(independent of the parser) in both explicit and implicit VR little endian,
then read back through DicomIO (ref engine/fast_nnunet.cpp:5-24 — the
fast_nnunet_dicom_convertor contract)."""
import os
import struct

import numpy as np
import pytest

from fast_nnunet_tpu.imageio.dicom import (DicomIO, convert_dicom_to_nifti,
                                           read_dicom_series)


def _el_explicit(group, elem, vr, value: bytes) -> bytes:
    if len(value) % 2:
        value += b"\x00" if vr not in (b"UI",) else b"\x00"
    if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
        return struct.pack("<HH2sHI", group, elem, vr, 0, len(value)) + value
    return struct.pack("<HH2sH", group, elem, vr, len(value)) + value


def _el_implicit(group, elem, value: bytes) -> bytes:
    if len(value) % 2:
        value += b"\x00"
    return struct.pack("<HHI", group, elem, len(value)) + value


def _write_slice(path, z, pixels: np.ndarray, explicit: bool,
                 slope=2.0, intercept=-1024.0):
    rows, cols = pixels.shape
    ts = b"1.2.840.10008.1.2.1" if explicit else b"1.2.840.10008.1.2"
    meta = _el_explicit(0x0002, 0x0010, b"UI", ts + (b"\x00" if len(ts) % 2 else b""))
    body = b""
    enc = (lambda g, e, vr, v: _el_explicit(g, e, vr, v)) if explicit else \
          (lambda g, e, vr, v: _el_implicit(g, e, v))
    body += enc(0x0018, 0x0050, b"DS", b"2.5")
    body += enc(0x0020, 0x0013, b"IS", str(z + 1).encode())
    body += enc(0x0020, 0x0032, b"DS", f"-100\\-120\\{z * 2.5}".encode())
    body += enc(0x0020, 0x0037, b"DS", b"1\\0\\0\\0\\1\\0")
    body += enc(0x0028, 0x0002, b"US", struct.pack("<H", 1))
    body += enc(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    body += enc(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    body += enc(0x0028, 0x0030, b"DS", b"0.75\\0.5")
    body += enc(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    body += enc(0x0028, 0x0103, b"US", struct.pack("<H", 1))  # signed
    body += enc(0x0028, 0x1052, b"DS", str(intercept).encode())
    body += enc(0x0028, 0x1053, b"DS", str(slope).encode())
    body += enc(0x7FE0, 0x0010, b"OW", pixels.astype("<i2").tobytes())
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM")
        f.write(meta)
        f.write(body)


@pytest.mark.parametrize("explicit", [True, False])
def test_read_series(tmp_path, explicit):
    rng = np.random.RandomState(0)
    raw = [rng.randint(-200, 3000, (12, 16)).astype(np.int16) for _ in range(5)]
    d = str(tmp_path / "series")
    os.makedirs(d)
    # write shuffled so sorting by position is exercised
    for i, z in enumerate([3, 0, 4, 1, 2]):
        _write_slice(os.path.join(d, f"im{i:03d}.dcm"), z, raw[z], explicit)

    vol, props = read_dicom_series(d)
    assert vol.shape == (5, 12, 16)
    assert props["spacing"] == [2.5, 0.75, 0.5]
    for z in range(5):
        np.testing.assert_allclose(vol[z], raw[z] * 2.0 - 1024.0)


def test_dicomio_and_nifti_conversion(tmp_path):
    rng = np.random.RandomState(1)
    d = str(tmp_path / "series")
    os.makedirs(d)
    raw = [rng.randint(0, 1000, (8, 10)).astype(np.int16) for _ in range(3)]
    for z in range(3):
        _write_slice(os.path.join(d, f"s{z}.dcm"), z, raw[z], True)

    io = DicomIO()
    data, props = io.read_images([d])
    assert data.shape == (1, 3, 8, 10)
    assert data.dtype == np.float32

    out = str(tmp_path / "vol.nii.gz")
    convert_dicom_to_nifti(d, out)
    from fast_nnunet_tpu.imageio.nifti import NiftiIO
    img, p = NiftiIO().read_images([out])
    assert img.shape == (1, 3, 8, 10)
    assert np.allclose(p["spacing"], props["spacing"])
    np.testing.assert_allclose(img[0], data[0])

    # write_seg emits NIfTI next to DICOM input
    seg = (data[0] > 0).astype(np.uint8)
    io.write_seg(seg, str(tmp_path / "mask"), props)
    m, mp = NiftiIO().read_seg(str(tmp_path / "mask.nii.gz"))
    np.testing.assert_array_equal(m[0], seg)


def test_rejects_compressed_transfer_syntax(tmp_path):
    path = str(tmp_path / "jpeg.dcm")
    ts = b"1.2.840.10008.1.2.4.90"  # JPEG 2000
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM")
        f.write(_el_explicit(0x0002, 0x0010, b"UI", ts))
    with pytest.raises(RuntimeError, match="transfer syntax"):
        read_dicom_series([path])
