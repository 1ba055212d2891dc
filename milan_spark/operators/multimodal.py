"""Multimodal column plumbing for LLM data pipelines (SURVEY.md §7 phase 6).

Images/audio/video are opaque ``binary`` payload columns with a typed
metadata struct alongside. The Spark-side plumbing — schemas, Arrow batch
shapes, mapInPandas operators, partition sizing — is real and tested. The
AUDIO, IMAGE, and VIDEO codecs are all real: :func:`decode_audio` parses
RIFF/WAVE 16-bit PCM, :func:`decode_image` parses uncompressed 24-bit BMP,
and :func:`decode_video` parses AVI with uncompressed 24-bit DIB frames —
all with stdlib struct + numpy (no external library). Compressed formats
(JPEG/MP3/H.264) would need PIL/ffmpeg and raise clearly from the same
entry points; the uncompressed-container paths are exercised end-to-end by
oracle-checked catalog queries (:func:`audio_features`,
:func:`image_features`/:func:`resize_images`,
:func:`video_frame_features`).

Layout convention:
    payload  BINARY                 -- raw encoded bytes
    meta     STRUCT<modality:string, byte_len:long, mime:string>

At scale: payload columns dominate row size — keep
``spark.sql.files.maxPartitionBytes`` small enough that a partition of
payloads fits executor memory, and push metadata-only predicates so parquet
row groups of payload bytes are skipped entirely (column pruning means a
metadata query never reads the payload pages).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 4


def attach_binary_payload(df: DataFrame, content_col: str, modality: str = "text", mime: str = "text/plain") -> DataFrame:
    """Pack a content column into the payload+meta multimodal layout."""
    payload = F.col(content_col).cast("binary")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.length(payload).cast("long").alias("byte_len"),
            F.lit(mime).alias("mime"),
        ),
    )


def encode_bmp(pixels) -> bytes:
    """Minimal 24-bit uncompressed BMP encoder (BITMAPFILEHEADER +
    BITMAPINFOHEADER, BI_RGB) — stdlib struct + numpy, the inverse of
    :func:`decode_image`. Input is an (H, W, 3) uint8 RGB array; output is a
    bottom-up BGR pixel array with rows padded to 4-byte boundaries, i.e. a
    file any BMP reader accepts."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_bmp expects an (H, W, 3) RGB array")
    h, w = px.shape[:2]
    row = w * 3
    stride = (row + 3) & ~3
    img_size = stride * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row] = px[::-1, :, ::-1].reshape(h, row)  # bottom-up, RGB→BGR
    return header + info + rows.tobytes()


def pil_available() -> bool:
    """Whether the optional Pillow dependency is importable (compressed
    image formats — JPEG/PNG/WebP — route through it; the stdlib BMP codec
    is the always-on path)."""
    try:
        from PIL import Image  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_image_pil(payload: bytes) -> dict:
    """Optional-dependency tier: decode any Pillow-supported compressed
    format to the same ``{width, height, pixels}`` contract as the stdlib
    BMP path. Raises ``NotImplementedError`` (not ImportError) when Pillow
    is absent so callers see the same loud format guard either way."""
    try:
        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "compressed image formats need the optional Pillow dependency; "
            "only uncompressed 24-bit BI_RGB BMP decodes with the stdlib codec"
        ) from None
    import io

    import numpy as np

    with Image.open(io.BytesIO(payload)) as im:
        rgb = np.asarray(im.convert("RGB"), dtype=np.uint8)
    h, w = rgb.shape[:2]
    return {"width": w, "height": h, "pixels": np.ascontiguousarray(rgb)}


def encode_png(pixels) -> bytes:
    """PNG encoder via the optional Pillow dependency (lossless, so codec
    round-trips stay integer-exact and oracle-checkable). Raises
    ``NotImplementedError`` when Pillow is absent."""
    try:
        from PIL import Image
    except ImportError:
        raise NotImplementedError("encode_png needs the optional Pillow dependency") from None
    import io

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(px, mode="RGB").save(buf, format="PNG")
    return buf.getvalue()


def decode_image(payload: bytes) -> dict:
    """REAL image decode: uncompressed 24-bit BMP decodes with stdlib
    ``struct`` + numpy (always available); any other format — JPEG/PNG/WebP,
    or exotic BMP variants — routes through the optional Pillow tier
    (:func:`_decode_image_pil`), which raises a loud ``NotImplementedError``
    when the library is absent. The stdlib path validates the 'BM' magic and
    BI_RGB/24-bit format, handles bottom-up (positive height) and top-down
    (negative height) pixel arrays and 4-byte row padding. Returns
    ``{width, height, pixels: (H, W, 3) uint8 RGB array}``."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 16:
        raise ValueError("empty or truncated image payload")
    if payload[:2] != b"BM":
        return _decode_image_pil(payload)
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMPs are not supported")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    _planes, bits = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0 or bits != 24:
        # RLE/16-bit/paletted BMPs: Pillow handles them when installed
        return _decode_image_pil(payload)
    top_down = h_signed < 0
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    if w <= 0 or h == 0 or len(payload) < data_off + stride * h:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(payload, np.uint8, stride * h, data_off).reshape(h, stride)
    rgb = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
    if not top_down:
        rgb = rgb[::-1]
    return {"width": w, "height": h, "pixels": np.ascontiguousarray(rgb)}


def encode_wav_pcm16(samples, rate: int = 8000, channels: int = 1) -> bytes:
    """Minimal RIFF/WAVE encoder for 16-bit PCM — stdlib only. The inverse of
    :func:`decode_audio`; used to synthesize real WAV payloads in tests and
    oracle queries."""
    import struct

    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block_align, block_align, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_audio(payload: bytes) -> dict:
    """REAL audio decode for RIFF/WAVE 16-bit PCM — stdlib ``struct`` +
    numpy, no external codec needed (compressed formats would need
    soundfile/ffmpeg; this parses the container format a training pipeline
    most often stores raw audio in). Walks the chunk list (tolerating extra
    chunks), validates PCM/16-bit, and returns
    ``{rate, channels, samples: np.int16 array (frames × channels flattened)}``.
    """
    import struct

    import numpy as np

    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE payload missing fmt/data chunk")
    audio_format, channels, rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError("only 16-bit PCM WAV is supported without external codecs")
    return {"rate": rate, "channels": channels, "samples": np.frombuffer(data, dtype="<i2")}


def encode_avi(frames, fps: int = 25) -> bytes:
    """Minimal AVI encoder for uncompressed 24-bit DIB video — stdlib struct
    + numpy, the inverse of :func:`decode_video`. ``frames`` is a sequence of
    (H, W, 3) uint8 RGB arrays (all the same shape). Emits the standard RIFF
    'AVI ' layout: LIST hdrl (avih + LIST strl (strh 'vids'/'DIB ' + strf
    BITMAPINFOHEADER)) then LIST movi with one '00db' chunk per frame, each a
    bottom-up BGR pixel array with 4-byte-padded rows (the BMP pixel layout,
    sans file header)."""
    import struct

    import numpy as np

    fr = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not fr or any(f.ndim != 3 or f.shape[2] != 3 for f in fr) or len({f.shape for f in fr}) != 1:
        raise ValueError("encode_avi expects 1+ equally-shaped (H, W, 3) RGB frames")
    h, w = fr[0].shape[:2]
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    def dib(px: "np.ndarray") -> bytes:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
        return rows.tobytes()

    avih = struct.pack(
        "<14I", 1_000_000 // fps, frame_size * fps, 0, 0, len(fr), 0, 1, frame_size, w, h, 0, 0, 0, 0
    )
    strh = struct.pack("<4s4sIHHIIIIIIIi4H", b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, len(fr), frame_size, 10_000, 0, 0, 0, w, h)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", dib(f)) for f in fr))
    return b"RIFF" + struct.pack("<I", 4 + len(hdrl) + len(movi)) + b"AVI " + hdrl + movi


def _riff_chunks(buf: bytes, pos: int, end: int):
    """Walk a RIFF chunk sequence yielding (fourcc, body_start, body_size);
    LIST chunks yield their list-kind as fourcc with the inner body span."""
    import struct

    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body, nxt = pos + 8, pos + 8 + size + (size & 1)  # word-aligned
        if cid == b"LIST" and size >= 4:
            yield buf[body : body + 4], body + 4, size - 4
        else:
            yield cid, body, size
        pos = nxt


def decode_video(payload: bytes) -> dict:
    """REAL video decode for AVI with uncompressed 24-bit DIB frames —
    stdlib ``struct`` + numpy (compressed codecs would need ffmpeg; this
    parses the container + raw frame layout). Walks the RIFF tree: 'avih'
    gives dimensions, the 'movi' list's '00db'/'00dc' chunks are bottom-up
    BGR frames with padded rows. Returns
    ``{width, height, n_frames, frames: [(H, W, 3) uint8 RGB, ...]}``."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    w = h = None
    frames: list = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h
        for cc, body, size in _riff_chunks(payload, pos, end):
            if cc in (b"hdrl", b"strl", b"movi"):
                walk(body, body + size)
            elif cc == b"avih" and size >= 40:
                vals = struct.unpack_from("<14I", payload, body)
                w, h = vals[8], vals[9]
            elif cc in (b"00db", b"00dc"):
                frames.append((body, size))

    walk(12, len(payload))
    if w is None or not w or not h:
        raise ValueError("AVI payload missing avih header")
    stride = (w * 3 + 3) & ~3
    out = []
    for body, size in frames:
        if size < stride * h:
            raise ValueError("truncated AVI frame chunk")
        rows = np.frombuffer(payload, np.uint8, stride * h, body).reshape(h, stride)
        out.append(np.ascontiguousarray(rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]))
    return {"width": w, "height": h, "n_frames": len(out), "frames": out}


def sample_frames(payload: bytes, every_n: int = 10) -> list:
    """REAL video frame sampling through :func:`decode_video`: every n-th
    frame of an uncompressed-DIB AVI, as (frame_no, (H, W, 3) uint8 RGB)
    tuples. Compressed codecs still need ffmpeg — this covers the container
    + raw-frame path the WAV/BMP codecs established."""
    dec = decode_video(payload)
    return [(i, dec["frames"][i]) for i in range(0, dec["n_frames"], every_n)]


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """REAL image resize: decode BMP, nearest-neighbor sample to
    (width, height) with exact integer index math (out row y reads in row
    ⌊y·H/height⌋), re-encode. Pure numpy — deterministic and
    oracle-checkable in SQL with the same floor-division formula."""
    import numpy as np

    dec = decode_image(payload)
    yi = (np.arange(height, dtype=np.int64) * dec["height"]) // height
    xi = (np.arange(width, dtype=np.int64) * dec["width"]) // width
    return encode_bmp(dec["pixels"][yi][:, xi])


def _fake_features(payload: bytes) -> list[int]:
    """Deterministic stand-in for a decoded-feature vector: byte-level stats
    (length, first, last, checksum mod 997). Keeps the full Arrow/mapInPandas
    path real while the codec is stubbed."""
    if payload is None or len(payload) == 0:
        return [0, 0, 0, 0]
    return [len(payload), payload[0], payload[-1], sum(payload) % 997]


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over payload batches.

    This is the shape a real decoder runs in: Arrow record batches stream
    through Python once, emitting fixed-width feature vectors; no shuffle is
    introduced (narrow transformation), so it pipelines with the scan.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_features)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": feats,
                    "byte_len": [f[0] for f in feats],
                    "checksum": [f[3] for f in feats],
                }
            )

    schema = f"{id_col} long, features array<long>, byte_len long, checksum long"
    return df.select(id_col, "payload").mapInPandas(run, schema=schema)


def audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas audio feature extraction through the REAL WAV codec
    (:func:`decode_audio`): per payload — sample count, rate, peak amplitude,
    and total energy (sum of squares; int16² × count < 2⁶³, so the int64 sum
    is exact and oracle-checkable). Narrow: pipelines with the scan, same
    batch shape a soundfile-based decoder would use."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {id_col: [], "n_samples": [], "sample_rate": [], "peak": [], "energy": []}
            for rid, payload in zip(pdf[id_col], pdf["payload"]):
                dec = decode_audio(payload)
                s = dec["samples"].astype(np.int64)
                rows[id_col].append(rid)
                rows["n_samples"].append(len(s))
                rows["sample_rate"].append(dec["rate"])
                rows["peak"].append(int(np.abs(s).max()) if len(s) else 0)
                rows["energy"].append(int((s * s).sum()))
            yield pd.DataFrame(rows)

    schema = f"{id_col} long, n_samples long, sample_rate long, peak long, energy long"
    return df.select(id_col, "payload").mapInPandas(run, schema=schema)


def image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas image feature extraction through the REAL BMP codec
    (:func:`decode_image`): per payload — width, height, exact int64 pixel
    sum/max, and a channel-weighted sum (R·1 + G·2 + B·3 per pixel) that is
    sensitive to BGR↔RGB ordering, so a channel-swap bug in the decoder
    breaks the oracle hash. Narrow: pipelines with the scan."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {id_col: [], "width": [], "height": [], "px_sum": [], "px_max": [], "wsum": []}
            for rid, payload in zip(pdf[id_col], pdf["payload"]):
                dec = decode_image(payload)
                px = dec["pixels"].astype(np.int64)
                rows[id_col].append(rid)
                rows["width"].append(dec["width"])
                rows["height"].append(dec["height"])
                rows["px_sum"].append(int(px.sum()))
                rows["px_max"].append(int(px.max()))
                rows["wsum"].append(int((px * np.array([1, 2, 3])).sum()))
            yield pd.DataFrame(rows)

    schema = f"{id_col} long, width long, height long, px_sum long, px_max long, wsum long"
    return df.select(id_col, "payload").mapInPandas(run, schema=schema)


def resize_images(df: DataFrame, width: int, height: int, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas resize through the REAL BMP codec: decode → nearest
    neighbor → re-encode per payload, refreshed meta. Narrow; fixed-size
    output rows make downstream partition sizing exact."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": pdf["payload"].map(lambda p: resize_image(p, width, height)),
                }
            )

    out = df.select(id_col, "payload").mapInPandas(run, schema=f"{id_col} long, payload binary")
    return out.withColumn(
        "meta",
        F.struct(
            F.lit("image").alias("modality"),
            F.length("payload").cast("long").alias("byte_len"),
            F.lit("image/bmp").alias("mime"),
        ),
    )


def video_frame_features(df: DataFrame, every_n: int = 2, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas frame sampling through the REAL AVI codec
    (:func:`sample_frames`): every n-th frame decodes to exact int64 pixel
    stats — one output ROW per sampled frame (the exploding row shape a real
    video pipeline has; output rows ≫ input rows, so partition sizing is by
    payload bytes / every_n). ``wsum`` weights channels 1/2/3, catching
    BGR↔RGB bugs like the image path."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {id_col: [], "frame_no": [], "width": [], "height": [], "px_sum": [], "wsum": []}
            for rid, payload in zip(pdf[id_col], pdf["payload"]):
                for fno, frame in sample_frames(payload, every_n):
                    px = frame.astype(np.int64)
                    rows[id_col].append(rid)
                    rows["frame_no"].append(fno)
                    rows["height"].append(frame.shape[0])
                    rows["width"].append(frame.shape[1])
                    rows["px_sum"].append(int(px.sum()))
                    rows["wsum"].append(int((px * np.array([1, 2, 3])).sum()))
            yield pd.DataFrame(rows)

    schema = f"{id_col} long, frame_no long, width long, height long, px_sum long, wsum long"
    return df.select(id_col, "payload").mapInPandas(run, schema=schema)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real resize: tile/truncate the payload to
    exactly width*height bytes. Preserves the real operator's contract —
    fixed output size, pure function of (payload, w, h) — so the Spark
    plumbing (schema, batch shape, partition sizing) is exercised for real;
    swap :func:`resize_image` in when an imaging library is present."""
    n = width * height
    if not payload:
        return bytes(n)
    reps = -(-n // len(payload))
    return (payload * reps)[:n]


def resize_payloads(df: DataFrame, width: int, height: int, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas resize over payload batches: (id, payload) → (id, resized
    payload + refreshed meta). Narrow — pipelines with the scan; output rows
    are fixed-size so downstream partition sizing is exact
    (rows_per_partition = maxPartitionBytes / (width*height))."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": pdf["payload"].map(lambda p: _fake_resize(p, width, height)),
                }
            )

    out = df.select(id_col, "payload").mapInPandas(run, schema=f"{id_col} long, payload binary")
    return out.withColumn(
        "meta",
        F.struct(
            F.lit("image").alias("modality"),
            F.length("payload").cast("long").alias("byte_len"),
            F.lit("image/raw").alias("mime"),
        ),
    )


def sample_frame_payloads(
    df: DataFrame, frame_bytes: int, every_n: int, id_col: str = "doc_id"
) -> DataFrame:
    """mapInPandas frame sampling: the payload is treated as a sequence of
    fixed-size frames; every n-th frame is emitted as one output ROW
    (id, frame_no, frame) — the exploding shape a real video pipeline needs
    (output rows ≫ input rows), so this is where
    ``spark.sql.files.maxPartitionBytes`` matters most: a partition's output
    is its payload bytes / every_n. Deterministic fake of the ffmpeg path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for rid, payload in zip(pdf[id_col], pdf["payload"]):
                if payload is None:
                    continue
                total = len(payload) // frame_bytes
                for fno in range(0, total, every_n):
                    ids.append(rid)
                    nos.append(fno)
                    frames.append(payload[fno * frame_bytes : (fno + 1) * frame_bytes])
            yield pd.DataFrame({id_col: ids, "frame_no": nos, "frame": frames})

    return df.select(id_col, "payload").mapInPandas(
        run, schema=f"{id_col} long, frame_no long, frame binary"
    )


def image_dhash(df: DataFrame, id_col: str = "doc_id", grid: int = 8) -> DataFrame:
    """Perceptual difference-hash (dHash) through the REAL BMP codec: decode
    → integer luma (R + 2·G + B, exact int64) → nearest-neighbor sample onto
    a ``grid``×``grid`` lattice (the same floor-division index math as
    :func:`resize_image`, y_src = (y·H) // grid) → one bit per horizontal
    neighbor pair (lum[y][x] < lum[y][x+1]) → a grid·(grid−1)-bit int64
    (8×7 = 56 bits, sign-safe).

    The hash reads ONLY the sampled lattice pixels, so byte-level noise
    anywhere else in the payload leaves it unchanged — that invariance, not
    compression, is what makes it a NEAR-dup key: perceptually-identical
    renders collide exactly, and the downstream dedup is a plain hash
    groupBy (map-side combinable, payloads never shuffle). Narrow: one
    Arrow pass fused with the scan, emitting 16 bytes/row.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for rid, payload in zip(pdf[id_col], pdf["payload"]):
                dec = decode_image(payload)
                px = dec["pixels"].astype(np.int64)
                h, w = px.shape[0], px.shape[1]
                lum = px[:, :, 0] + 2 * px[:, :, 1] + px[:, :, 2]
                ys = (np.arange(grid) * h) // grid
                xs = (np.arange(grid) * w) // grid
                lat = lum[np.ix_(ys, xs)]
                bits = (lat[:, :-1] < lat[:, 1:]).astype(np.int64)
                weights = 1 << np.arange(grid * (grid - 1), dtype=np.int64)
                ids.append(rid)
                hashes.append(int((bits.reshape(-1) * weights).sum()))
            yield pd.DataFrame({id_col: ids, "dhash": hashes})

    return df.select(id_col, "payload").mapInPandas(
        run, schema=f"{id_col} long, dhash long"
    )


def dhash_dup_groups(hashes: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Perceptual duplicate groups: ONE map-side-combinable groupBy of the
    56-bit hashes — the image payloads themselves never cross a shuffle.
    Output: (dhash, n_docs, min_doc, max_doc) per group."""
    return hashes.groupBy("dhash").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(id_col).alias("min_doc"),
        F.max(id_col).alias("max_doc"),
    )
