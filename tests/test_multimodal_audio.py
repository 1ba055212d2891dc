"""WAV codec (operators/multimodal.py): round-trip, chunk-walk robustness
(extra chunks, odd-size word alignment), and error contracts."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from milan_spark.operators.multimodal import decode_audio, encode_wav_pcm16


def test_roundtrip():
    samples = np.array([0, 1, -1, 32767, -32768, 12345], dtype=np.int16)
    payload = encode_wav_pcm16(samples, rate=16000)
    dec = decode_audio(payload)
    assert dec["rate"] == 16000
    assert dec["channels"] == 1
    assert np.array_equal(dec["samples"], samples)


def test_extra_and_odd_sized_chunks_are_skipped():
    samples = np.array([7, -7, 7], dtype=np.int16)
    payload = encode_wav_pcm16(samples, rate=8000)
    # splice an odd-sized LIST chunk (with pad byte) between fmt and data
    head, rest = payload[:12], payload[12:]
    fmt_chunk = rest[: 8 + 16]
    data_chunk = rest[8 + 16 :]
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded to even
    spliced = head + fmt_chunk + junk + data_chunk
    total = len(spliced) - 8
    spliced = b"RIFF" + struct.pack("<I", total) + spliced[8:]
    dec = decode_audio(spliced)
    assert np.array_equal(dec["samples"], samples)


def test_rejects_non_wav():
    with pytest.raises(ValueError):
        decode_audio(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    with pytest.raises(ValueError):
        decode_audio(None)


def test_rejects_non_pcm16():
    samples = np.array([1, 2], dtype=np.int16)
    payload = bytearray(encode_wav_pcm16(samples))
    # flip audio_format to 3 (IEEE float) inside the fmt chunk
    payload[20:22] = struct.pack("<H", 3)
    with pytest.raises(NotImplementedError):
        decode_audio(bytes(payload))
