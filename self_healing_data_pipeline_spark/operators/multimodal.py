"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.11).

Design: media travel as opaque ``binary`` columns with typed metadata
structs alongside (the Spark-native pattern — same as spark.ml's image
schema and HuggingFace's datasets-on-Spark layout). All Spark-side
plumbing (schema, partition sizing, Arrow batch shape, UDF signatures) is
real and tested. Decode is REAL for every fixture format, with no codec
library: PNG pixels (stdlib zlib + scanline unfilter, this module), GIF
pixels (LZW, ``operators/codecs.py``), baseline-JPEG pixels (canonical
Huffman + 8×8 IDCT, ``operators/codecs.py``), uncompressed BMP, WAV PCM
samples, and AVI raw frames. The only remaining stub boundary is
genuinely-exotic variants (progressive JPEG, chroma-subsampled scans,
compressed audio/video codecs like MP3/H.264), where decoders return
None per row / raise ``NotImplementedError`` at the dispatch level —
swapping in a library decoder changes ONLY the inner function body.

Scale notes: binary payloads dominate row size, so
``spark.sql.files.maxPartitionBytes`` governs rows/task; mapInPandas
streams Arrow record batches, so executor memory is bounded by batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``), not partition size —
that is why decode/feature-extract use mapInPandas, not collect-and-loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_entropy", T.DoubleType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        # real-pixel statistics (png/gif/jpeg/bmp decode); None only for
        # malformed payloads or unsupported variants
        T.StructField("pixel_mean", T.DoubleType(), True),
        T.StructField("pixel_entropy", T.DoubleType(), True),
    ]
)


def decode_pixels(payload: bytes | None):
    """REAL pixel decode across all four fixture formats, no codec
    library: PNG (:func:`decode_png_pixels`), GIF (LZW), baseline JPEG
    (canonical Huffman + IDCT), uncompressed BMP (the latter three in
    ``operators/codecs.py``; JPEG covers 4:4:4, 4:2:0 subsampling AND
    progressive SOF2 AND arithmetic-coded SOF9 and restart intervals
    in all scan kinds, PNG covers Adam7 interlacing). Returns an
    ``(h, w[, ch])`` uint8 array, or None for malformed payloads."""
    from self_healing_data_pipeline_spark.operators.codecs import (
        decode_bmp_pixels,
        decode_gif_pixels,
        decode_jpeg_pixels,
    )

    fmt, _, _ = parse_image_dims(payload)
    if fmt == "png":
        return decode_png_pixels(payload)
    if fmt == "gif":
        return decode_gif_pixels(payload)
    if fmt == "jpeg":
        return decode_jpeg_pixels(payload)
    if fmt == "bmp":
        return decode_bmp_pixels(payload)
    return None


def decode_image(payload: bytes):
    """Image pixel decode (raising form of :func:`decode_pixels`).
    PNG/GIF/JPEG/BMP all decode for real — JPEG baseline, progressive
    AND arithmetic-coded (SOF9, round 8), 4:4:4 and 4:2:0, restart
    intervals in all scan kinds; PNG sequential and Adam7 — so every
    codec boundary flagged since round 4 is closed: only unknown
    formats and malformed payloads raise."""
    px = decode_pixels(payload)
    if px is not None:
        return px
    fmt, _, _ = parse_image_dims(payload)
    raise NotImplementedError(
        f"{fmt or 'unknown'} payload did not decode: unknown format or "
        "malformed bytes — wire a codec library here; the Spark plumbing "
        "and the real decode paths show the full shape"
    )


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


#: Adam7 pass lattice: (x0, y0, dx, dy) per pass (RFC 2083 §2.6).
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_unfilter(raw, height: int, stride: int, ch: int):
    """Undo per-scanline filters for one (sub-)image: ``raw`` is the
    ``height × (stride+1)`` filtered bytes (filter byte + scanline);
    returns the reconstructed ``(height, stride)`` uint8 array, or None
    on an unknown filter type."""
    import numpy as np

    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        ftype = raw[y, 0]
        line = raw[y, 1:].astype(np.int32)
        above = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up: fully vectorized
            rec = (line + above) & 0xFF
        elif ftype in (1, 3, 4):
            # Sub / Average / Paeth need the already-reconstructed left
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                up = above[x]
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) >> 1
                else:  # Paeth
                    ul = above[x - ch] if x >= ch else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = (
                        left if pa <= pb and pa <= pc else up if pb <= pc else ul
                    )
                rec[x] = (line[x] + pred) & 0xFF
        else:
            return None
        out[y] = rec
    return out


def decode_png_pixels(payload: bytes | None):
    """REAL PNG pixel decode with only the stdlib: concatenate IDAT
    chunks, ``zlib.decompress``, undo the per-scanline filter (0=None,
    1=Sub, 2=Up, 3=Average, 4=Paeth — RFC 2083 §6), de-interlace Adam7
    images (each of the 7 passes is its own independently-filtered
    sub-image scattered onto the output lattice), and expand PLTE
    indices for paletted images. Returns a ``(height, width, channels)``
    uint8 numpy array, or None for non-PNG / unsupported variants
    (bit depths other than 8).

    Per-payload work is O(pixels); inside the Arrow-batched mapInPandas
    kernel that keeps memory bounded by batch size at any table size."""
    import struct
    import zlib

    import numpy as np

    if not payload or len(payload) < 8:
        return None
    b = bytes(payload)
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    i, n = 8, len(b)
    while i + 8 <= n:
        (clen,) = struct.unpack(">I", b[i : i + 4])
        ctype = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + clen]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">IIBBBBB", data[:13])
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + clen  # len + type + data + crc
    if (
        not idat
        or width is None
        or bit_depth != 8
        or interlace not in (0, 1)
        or color_type not in _PNG_CHANNELS
    ):
        return None
    ch = _PNG_CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * ch
    if interlace == 0:
        if len(raw) != height * (stride + 1):
            return None
        out = _png_unfilter(raw.reshape(height, stride + 1), height, stride, ch)
        if out is None:
            return None
        px = out.reshape(height, width, ch)
    else:  # Adam7
        px = np.zeros((height, width, ch), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            pstride = pw * ch
            need = ph * (pstride + 1)
            if pos + need > len(raw):
                return None
            sub = _png_unfilter(
                raw[pos : pos + need].reshape(ph, pstride + 1), ph, pstride, ch
            )
            if sub is None:
                return None
            px[y0::dy, x0::dx] = sub.reshape(ph, pw, ch)
            pos += need
        if pos != len(raw):
            return None
    if color_type == 3:
        if palette is None:
            return None
        px = palette[px[:, :, 0]]
    return px


def parse_image_dims(
    payload: bytes | None,
) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) from raw image bytes — pure struct parsing,
    no codec: PNG IHDR, JPEG SOF marker scan, GIF screen descriptor, BMP
    info header. Unknown/short payloads → (None, None, None).
    """
    import struct

    if not payload or len(payload) < 10:
        return (None, None, None)
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h)
    if b[:2] == b"\xff\xd8":
        # Walk marker segments to the first SOFn (0xC0-0xCF minus the
        # huffman/arithmetic tables C4/C8/CC): precision(1) height(2)
        # width(2) follow the 2-byte segment length.
        i, n = 2, len(b)
        while i + 9 <= n:
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker == 0xFF:
                # 0xFF fill bytes before a marker are legal padding
                # (ITU T.81 §B.1.1.2): consume one byte at a time so the
                # real marker byte is read next, instead of treating the
                # pad as a marker and mis-reading a segment length.
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9:  # EOI
                break
            seglen = int.from_bytes(b[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                return ("jpeg", w, h)
            i += 2 + seglen
        return ("jpeg", None, None)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h)
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return ("bmp", w, abs(h))  # negative h = top-down row order
    return (None, None, None)


def png_bytes(width: int, height: int) -> bytes:
    """Minimal PNG: valid signature + IHDR (correct CRC) + IEND. Pixel
    data omitted — header-accurate fixture for dimension parsing."""
    import struct
    import zlib

    ihdr = b"IHDR" + struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    iend = b"IEND"
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + ihdr
        + struct.pack(">I", zlib.crc32(ihdr) & 0xFFFFFFFF)
        + struct.pack(">I", 0)
        + iend
        + struct.pack(">I", zlib.crc32(iend) & 0xFFFFFFFF)
    )


_PNG_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _png_filter_rows(flat, ch: int, filters=None) -> bytearray:
    """Apply per-scanline filters to one (sub-)image: ``flat`` is the
    ``(h, stride)`` int32 pixel-byte array; returns filter-byte-prefixed
    scanlines. Filters cycle 0..4 by default so round-trips exercise all
    five types."""
    import numpy as np

    h, stride = flat.shape
    if filters is None:
        filters = [y % 5 for y in range(h)]
    raw = bytearray()
    for y in range(h):
        line = flat[y]
        above = flat[y - 1] if y else np.zeros(stride, np.int32)
        left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
        ul = np.concatenate([np.zeros(ch, np.int32), above[:-ch]])
        f = filters[y]
        if f == 0:
            enc = line
        elif f == 1:
            enc = line - left
        elif f == 2:
            enc = line - above
        elif f == 3:
            enc = line - ((left + above) >> 1)
        else:  # Paeth predictor
            p = left + above - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - above), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, above, ul)
            )
            enc = line - pred
        raw.append(f)
        raw += (enc & 0xFF).astype(np.uint8).tobytes()
    return raw


def png_bytes_with_pixels(pixels, filters=None, interlace: bool = False) -> bytes:
    """Full PNG encoder for an ``(h, w, ch)`` uint8 array (stdlib only):
    per-row scanline filters (cycling 0..4 by default so a decode
    round-trip exercises ALL five filter types), optional Adam7
    interlacing (``interlace=True`` — the 7 passes are extracted on the
    standard lattice and filtered independently, per RFC 2083 §2.6),
    zlib-deflated IDAT, correct CRCs. The decode twin is
    :func:`decode_png_pixels`; together they give a pixel-exact
    round-trip witness for tests, interlaced or not."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if interlace:
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            raw += _png_filter_rows(
                sub.reshape(sub.shape[0], sub.shape[1] * ch).astype(np.int32),
                ch,
                filters,
            )
    else:
        raw = _png_filter_rows(
            px.reshape(h, w * ch).astype(np.int32), ch, filters
        )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", w, h, 8, _PNG_COLOR_TYPE[ch], 0, 0, 1 if interlace else 0
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def jpeg_bytes(width: int, height: int) -> bytes:
    """Minimal JPEG: SOI + JFIF APP0 + SOF0 (carrying the dimensions) +
    EOI. Scan data omitted — header-accurate fixture."""
    import struct

    app0 = b"JFIF\x00" + bytes(9)
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    return (
        b"\xff\xd8"
        + b"\xff\xe0"
        + struct.pack(">H", 2 + len(app0))
        + app0
        + b"\xff\xc0"
        + struct.pack(">H", 2 + len(sof0))
        + sof0
        + b"\xff\xd9"
    )


def _deterministic_fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature vector: byte-histogram moments.
    Lets the full pipeline (schema, batching, downstream joins) run and be
    asserted on without a codec."""
    import numpy as np

    if payload is None or len(payload) == 0:
        return [0.0] * dim
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype("float64")
    total = hist.sum()
    return list((hist / total).astype("float32")) if total else [0.0] * dim


def extract_features(media: DataFrame, use_fake_decoder: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each iteration sees a bounded pandas batch, never a
    whole partition — the memory-safe shape for 100 MB+ payload rows.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            if use_fake_decoder:
                feats = payloads.map(_deterministic_fake_feature)
            else:  # pragma: no cover - requires codec
                feats = payloads.map(lambda b: decode_image(b))
            dims = payloads.map(parse_image_dims)
            ent, px_mean, px_ent = [], [], []
            for b in payloads:
                if not b:
                    ent.append(0.0)
                    px_mean.append(None)
                    px_ent.append(None)
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                p = np.bincount(arr, minlength=256) / len(arr)
                nz = p[p > 0]
                ent.append(float(-(nz * np.log2(nz)).sum()))
                px = decode_pixels(b)  # real pixels (png/gif/jpeg/bmp)
                if px is None:
                    px_mean.append(None)
                    px_ent.append(None)
                else:
                    px_mean.append(float(px.mean()))
                    pp = np.bincount(px.reshape(-1), minlength=256) / px.size
                    pnz = pp[pp > 0]
                    px_ent.append(float(-(pnz * np.log2(pnz)).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "byte_entropy": ent,
                    "format": dims.map(lambda d: d[0]),
                    "width": dims.map(lambda d: d[1]).astype("Int32"),
                    "height": dims.map(lambda d: d[2]).astype("Int32"),
                    "feature": feats,
                    "pixel_mean": px_mean,
                    "pixel_entropy": px_ent,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame
    timestamps (the decode of each frame is the stubbed step). The
    explode happens engine-side so frame tasks distribute."""
    n_frames = (F.col("meta.duration_ms") / F.lit(every_ms)).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))),
        )
        .withColumn("frame_ts_ms", F.col("frame_ts_ms") * every_ms)
        .select("media_id", "frame_ts_ms", "payload", "meta")
    )


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bits", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
    ]
)


def wav_bytes(
    sample_rate: int, n_samples: int, channels: int = 1, seed: int = 0
) -> bytes:
    """Valid RIFF/WAVE file with 16-bit PCM: correct fmt/data chunks and a
    deterministic sawtooth signal — REAL audio bytes (PCM needs no codec),
    so downstream decode/feature extraction is genuine, not faked."""
    import struct

    import numpy as np

    idx = np.arange(n_samples * channels, dtype=np.int64) + seed
    samples = (((idx % 256) - 128) * 100).astype("<i2")
    data = samples.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def parse_wav_meta(
    payload: bytes | None,
) -> tuple[str | None, int | None, int | None, int | None, int | None]:
    """(format, sample_rate, channels, bits, duration_ms) from RIFF/WAVE
    bytes — pure chunk-walk struct parsing, no codec. Non-WAV or
    truncated payloads → all-None."""
    import struct

    if not payload or len(payload) < 12:
        return (None, None, None, None, None)
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return (None, None, None, None, None)
    sr = ch = bits = byte_rate = data_len = None
    i, n = 12, len(b)
    while i + 8 <= n:
        cid = b[i : i + 4]
        clen = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 8 + 16 <= n:
            _af, ch, sr, byte_rate, _ba, bits = struct.unpack(
                "<HHIIHH", b[i + 8 : i + 24]
            )
        elif cid == b"data":
            data_len = min(clen, n - i - 8)
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    dur = (
        int(data_len * 1000 // byte_rate)
        if data_len is not None and byte_rate
        else None
    )
    return ("wav", sr, ch, bits, dur)


def decode_pcm(payload: bytes):
    """REAL audio decode for 16-bit PCM WAV (raw samples need no codec
    library — unlike the image pixel path, this one is fully functional).
    Returns an int16 numpy array, or None for non-WAV payloads."""
    import struct

    import numpy as np

    if not payload or len(payload) < 12 or bytes(payload[:4]) != b"RIFF":
        return None
    b = bytes(payload)
    i, n = 12, len(b)
    while i + 8 <= n:
        cid = b[i : i + 4]
        clen = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"data":
            raw = b[i + 8 : i + 8 + clen]
            return np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2")
        i += 8 + clen + (clen & 1)
    return None


def extract_audio_features(media: DataFrame) -> DataFrame:
    """mapInPandas audio feature extraction: header metadata via
    parse_wav_meta plus signal statistics (RMS, normalized peak) from the
    REAL PCM decode. Same Arrow-batched memory bound as extract_features."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            metas = pdf["payload"].map(parse_wav_meta)
            rms, peak = [], []
            for b in pdf["payload"]:
                s = decode_pcm(b)
                if s is None or len(s) == 0:
                    rms.append(None)
                    peak.append(None)
                    continue
                # exact-integer inner form (round-11 oracle promotion):
                # sum of squared int16 samples is an exact int64
                # (|s| <= 32768, n bounded), so rms/peak reduce to ONE
                # correctly-rounded divide + sqrt and an exact
                # power-of-two scale — bit-reproducible regardless of
                # summation order, and replayable as SQL arithmetic
                # (a float64 running mean of x*x is not: each square
                # rounds, so the sum depends on order)
                s64 = s.astype("int64")
                sum_sq = int((s64 * s64).sum())
                rms.append(float(np.sqrt(sum_sq / len(s64)) / 32768.0))
                peak.append(float(int(np.abs(s64).max()) / 32768.0))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ).astype("int64"),
                    "format": metas.map(lambda m: m[0]),
                    "sample_rate": metas.map(lambda m: m[1]).astype("Int32"),
                    "channels": metas.map(lambda m: m[2]).astype("Int32"),
                    "bits": metas.map(lambda m: m[3]).astype("Int32"),
                    "duration_ms": metas.map(lambda m: m[4]).astype("Int32"),
                    "rms": rms,
                    "peak": peak,
                }
            )

    return media.mapInPandas(batches, schema=AUDIO_FEATURE_SCHEMA)


VIDEO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("frame_ms", T.IntegerType(), True),
        T.StructField("n_sampled", T.IntegerType(), True),
        T.StructField("mean_intensity", T.DoubleType(), True),
    ]
)


def avi_bytes(
    width: int, height: int, n_frames: int, fps: int = 10, seed: int = 0
) -> bytes:
    """Valid RIFF/AVI container holding UNCOMPRESSED 24-bit DIB frames
    ('00db' chunks) — like the WAV path, raw frames need no codec, so
    frame sampling and pixel statistics downstream are REAL, not faked.
    Layout: RIFF('AVI ') → LIST(hdrl){avih} → LIST(movi){00db…}; the
    56-byte avih carries µs/frame, total frames, and dimensions."""
    import struct

    import numpy as np

    frame_len = width * height * 3
    frames = []
    for f in range(n_frames):
        # deterministic gradient that changes per frame and per seed
        idx = np.arange(frame_len, dtype=np.int64)
        frames.append(((idx + 7 * f + seed) % 256).astype(np.uint8).tobytes())
    usec_per_frame = 1_000_000 // max(fps, 1)
    avih = struct.pack(
        "<14I",
        usec_per_frame, 0, 0, 0, n_frames, 0, 1, frame_len,
        width, height, 0, 0, 0, 0,
    )
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih)) + b"hdrl" + (
        b"avih" + struct.pack("<I", len(avih)) + avih
    )
    movi_body = b"".join(
        b"00db" + struct.pack("<I", len(fr)) + fr for fr in frames
    )
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_meta(
    payload: bytes | None,
) -> tuple[str | None, int | None, int | None, int | None, int | None]:
    """(format, width, height, n_frames, frame_ms) from RIFF/AVI bytes —
    pure chunk-walk struct parsing (same discipline as parse_wav_meta).
    Non-AVI or truncated payloads → all-None."""
    import struct

    if not payload or len(payload) < 12:
        return (None, None, None, None, None)
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return (None, None, None, None, None)
    i, n = 12, len(b)
    while i + 8 <= n:
        cid = b[i : i + 4]
        clen = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"LIST" and b[i + 8 : i + 12] == b"hdrl":
            j, jn = i + 12, min(i + 8 + clen, n)
            while j + 8 <= jn:
                sub = b[j : j + 4]
                slen = struct.unpack("<I", b[j + 4 : j + 8])[0]
                if sub == b"avih" and j + 8 + 40 <= n:
                    vals = struct.unpack("<10I", b[j + 8 : j + 48])
                    usec, n_frames, w, h = vals[0], vals[4], vals[8], vals[9]
                    return ("avi", w, h, n_frames, usec // 1000)
                j += 8 + slen + (slen & 1)
        i += 8 + clen + (clen & 1)
    return ("avi", None, None, None, None)


def sample_video_frames(payload: bytes | None, every_k: int = 2):
    """REAL frame sampling from uncompressed AVI: walks the movi list and
    yields (frame_index, pixel_sum, n_pixels) for every k-th '00db'
    frame — the statistics come from the actual frame bytes. Sums are
    EXACT int64 (round-11 oracle promotion: downstream means reduce to
    one correctly-rounded division of exact integers, bit-reproducible
    and replayable as SQL arithmetic; a per-frame float mean folded
    into a mean-of-means rounds differently per engine)."""
    import struct

    import numpy as np

    if not payload or len(payload) < 12 or bytes(payload[:4]) != b"RIFF":
        return []
    b = bytes(payload)
    out = []
    i, n = 12, len(b)
    while i + 8 <= n:
        cid = b[i : i + 4]
        clen = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"LIST" and b[i + 8 : i + 12] == b"movi":
            j, jn, f = i + 12, min(i + 8 + clen, n), 0
            while j + 8 <= jn:
                sub = b[j : j + 4]
                slen = struct.unpack("<I", b[j + 4 : j + 8])[0]
                if sub == b"00db":
                    if f % every_k == 0:
                        fr = np.frombuffer(
                            b[j + 8 : j + 8 + slen], dtype=np.uint8
                        )
                        if len(fr):
                            out.append(
                                (f, int(fr.astype(np.int64).sum()), len(fr))
                            )
                    f += 1
                j += 8 + slen + (slen & 1)
            break
        i += 8 + clen + (clen & 1)
    return out


def extract_video_features(media: DataFrame, every_k: int = 2) -> DataFrame:
    """mapInPandas video feature extraction: container metadata via
    parse_avi_meta plus mean pixel intensity over every k-th frame from
    the REAL raw-frame decode. Arrow-batched; memory bounded by batch
    size × payload size, never partition size."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            metas = pdf["payload"].map(parse_avi_meta)
            n_sampled, mean_int = [], []
            for b in pdf["payload"]:
                s = sample_video_frames(b, every_k)
                n_sampled.append(len(s))
                # exact-int fold: sampled frames share one size, so the
                # mean over all sampled pixels equals the mean of frame
                # means — computed as ONE correctly-rounded division of
                # exact integers (bit-identical to the SQL oracle)
                tot = sum(x for _, x, _ in s)
                cnt = sum(c for _, _, c in s)
                mean_int.append(float(tot / cnt) if cnt else None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"]
                    .map(lambda b: len(b) if b is not None else 0)
                    .astype("int64"),
                    "format": metas.map(lambda m: m[0]),
                    "width": metas.map(lambda m: m[1]),
                    "height": metas.map(lambda m: m[2]),
                    "n_frames": metas.map(lambda m: m[3]),
                    "frame_ms": metas.map(lambda m: m[4]),
                    "n_sampled": n_sampled,
                    "mean_intensity": mean_int,
                }
            )

    return media.mapInPandas(batches, VIDEO_FEATURE_SCHEMA)
