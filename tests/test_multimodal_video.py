"""Unit tests for the AVI codec (milan_spark.operators.multimodal):
round-trip, RIFF tree walk, frame sampling, and error contracts.
Pure-Python — no Spark session needed."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from milan_spark.operators import multimodal as M


def _frames(nf, h, w, seed=0):
    f = np.arange(nf).reshape(nf, 1, 1, 1)
    y = np.arange(h).reshape(1, h, 1, 1)
    x = np.arange(w).reshape(1, 1, w, 1)
    c = np.arange(3).reshape(1, 1, 1, 3)
    return ((seed + f * 13 + y * 31 + x * 5 + c * 3) % 256).astype(np.uint8)


@pytest.mark.parametrize("w", [1, 2, 3, 4])  # every row-padding case
def test_avi_round_trip_all_paddings(w):
    fr = _frames(3, 2, w, seed=w)
    dec = M.decode_video(M.encode_avi(list(fr)))
    assert (dec["width"], dec["height"], dec["n_frames"]) == (w, 2, 3)
    for got, want in zip(dec["frames"], fr):
        assert np.array_equal(got, want)


def test_avi_layout_is_riff_spec():
    raw = M.encode_avi(list(_frames(2, 2, 2)), fps=10)
    assert raw[:4] == b"RIFF" and raw[8:12] == b"AVI "
    (riff_size,) = struct.unpack_from("<I", raw, 4)
    assert riff_size == len(raw) - 8
    # hdrl list precedes movi; avih carries dims and frame count
    assert raw.find(b"hdrl") < raw.find(b"movi")
    avih_at = raw.find(b"avih") + 8
    vals = struct.unpack_from("<14I", raw, avih_at)
    assert (vals[4], vals[8], vals[9]) == (2, 2, 2)  # frames, width, height
    assert raw.count(b"00db") == 2


def test_sample_frames_every_n():
    fr = _frames(7, 2, 2, seed=5)
    raw = M.encode_avi(list(fr))
    sampled = M.sample_frames(raw, every_n=3)
    assert [i for i, _ in sampled] == [0, 3, 6]
    for i, got in sampled:
        assert np.array_equal(got, fr[i])


def test_avi_error_contracts():
    with pytest.raises(ValueError):
        M.decode_video(b"xx")
    with pytest.raises(ValueError):
        M.decode_video(b"RIFF\x04\x00\x00\x00WAVE")  # RIFF but not AVI
    # missing avih: a movi list alone is rejected
    body = b"LIST" + struct.pack("<I", 4) + b"movi"
    with pytest.raises(ValueError):
        M.decode_video(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body)
    truncated = M.encode_avi(list(_frames(2, 4, 4)))[:-8]
    with pytest.raises(ValueError):
        M.decode_video(truncated)


def test_avi_encoder_rejects_bad_frames():
    with pytest.raises(ValueError):
        M.encode_avi([])
    with pytest.raises(ValueError):
        M.encode_avi([np.zeros((2, 2, 3), np.uint8), np.zeros((3, 2, 3), np.uint8)])
