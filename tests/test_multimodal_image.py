"""Unit tests for the BMP codec (milan_spark.operators.multimodal):
round-trip, row padding, top-down pixel arrays, nearest-neighbor resize,
and error contracts. Pure-Python — no Spark session needed."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from milan_spark.operators import multimodal as M


def _grad(h, w, seed=0):
    y = np.arange(h).reshape(h, 1, 1)
    x = np.arange(w).reshape(1, w, 1)
    c = np.arange(3).reshape(1, 1, 3)
    return ((seed + y * 31 + x * 5 + c * 3) % 256).astype(np.uint8)


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5])  # covers every stride-pad case
def test_bmp_round_trip_all_paddings(w):
    px = _grad(3, w, seed=w)
    dec = M.decode_image(M.encode_bmp(px))
    assert dec["width"] == w and dec["height"] == 3
    assert np.array_equal(dec["pixels"], px)


def test_bmp_encoder_layout_is_spec_compliant():
    # 2x2 RGB: stride pads 6 bytes to 8; rows bottom-up; channels BGR
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8
    )
    raw = M.encode_bmp(px)
    assert raw[:2] == b"BM"
    (data_off,) = struct.unpack_from("<I", raw, 10)
    assert data_off == 54
    assert len(raw) == 54 + 8 * 2
    # first stored row is the BOTTOM image row, first pixel BGR of RGB(0,0,255)
    assert raw[54:57] == bytes([255, 0, 0])
    # second stored row starts after the 8-byte stride: top row, BGR of red
    assert raw[54 + 8 : 54 + 8 + 3] == bytes([0, 0, 255])


def test_bmp_top_down_height_negative():
    px = _grad(2, 3, seed=9)
    raw = bytearray(M.encode_bmp(px[::-1]))  # encoder writes bottom-up...
    struct.pack_into("<i", raw, 22, -2)  # ...negative height flips to top-down
    dec = M.decode_image(bytes(raw))
    assert dec["height"] == 2
    assert np.array_equal(dec["pixels"], px[::-1][::-1])


def test_bmp_error_contracts():
    with pytest.raises(ValueError):
        M.decode_image(b"xx")
    with pytest.raises(ValueError):
        M.decode_image(b"BM" + bytes(100))  # zero width/height → truncated
    raw = bytearray(M.encode_bmp(_grad(2, 2)))
    struct.pack_into("<I", raw, 30, 1)  # BI_RLE8 compression
    with pytest.raises(NotImplementedError):
        M.decode_image(bytes(raw))
    truncated = M.encode_bmp(_grad(4, 4))[:-8]
    with pytest.raises(ValueError):
        M.decode_image(truncated)


def test_resize_nearest_neighbor_exact():
    px = _grad(4, 6, seed=3)
    out = M.decode_image(M.resize_image(M.encode_bmp(px), 3, 2))
    yi = (np.arange(2) * 4) // 2
    xi = (np.arange(3) * 6) // 3
    assert np.array_equal(out["pixels"], px[yi][:, xi])
    # upsample too (2x2 → 5x5)
    small = _grad(2, 2, seed=7)
    up = M.decode_image(M.resize_image(M.encode_bmp(small), 5, 5))
    assert up["width"] == up["height"] == 5
    assert np.array_equal(up["pixels"][0, 0], small[0, 0])
    assert np.array_equal(up["pixels"][4, 4], small[1, 1])


def test_compressed_format_guard_is_loud_without_pil():
    """Non-BMP payloads route to the optional Pillow tier; without the lib
    the guard raises NotImplementedError naming the dependency (never a
    silent wrong decode, never a bare ImportError)."""
    if M.pil_available():
        import pytest as _pytest

        _pytest.skip("Pillow installed — the decode path is tested below")
    png_magic = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
    with pytest.raises(NotImplementedError, match="Pillow"):
        M.decode_image(png_magic)
    with pytest.raises(NotImplementedError, match="Pillow"):
        M.encode_png(_grad(2, 2))


def test_png_roundtrip_matches_bmp_path():
    """With Pillow present, the lossless PNG round-trip must produce the
    exact pixels the stdlib BMP codec produces (skipped when absent)."""
    if not M.pil_available():
        import pytest as _pytest

        _pytest.skip("Pillow not installed in this environment")
    px = _grad(5, 3, seed=11)
    dec = M.decode_image(M.encode_png(px))
    assert dec["width"] == 3 and dec["height"] == 5
    assert np.array_equal(dec["pixels"], px)
    assert np.array_equal(M.decode_image(M.encode_bmp(px))["pixels"], dec["pixels"])
