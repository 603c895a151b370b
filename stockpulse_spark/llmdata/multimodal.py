"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched mapInPandas
kernels.

Decode is REAL at two levels, with no imaging library:

- metadata: `decode_image` parses the PNG IHDR chunk, the JPEG
  SOF0/1/2 frame header, or the GIF logical screen descriptor straight
  from the header bytes — width, height, channels;
- pixels: `decode_png_pixels` fully decodes 8-bit truecolor PNGs with
  stdlib zlib — chunk walk + CRC32 verification, IDAT inflate, and
  per-scanline unfilter across all five PNG filter types — and
  `png_channel_features` turns the raw pixels into channel mean/stddev
  feature vectors.  JPEG/video decode (a DCT/codec dependency) remains
  the one documented external-encoder hook.

Spark-side design, sized for 100 TB:

- payloads travel as parquet BINARY; Spark never materializes them on
  the driver;
- mapInPandas streams Arrow record batches through the kernel, so peak
  memory is one batch (spark.sql.execution.arrow.maxRecordsPerBatch),
  not one partition;
- at 100 TB, partition by content-size histogram (repartitionByRange
  on byte_len) so one batch of 4K videos doesn't OOM an executor that
  was sized for thumbnails.
"""

from __future__ import annotations

from collections.abc import Iterator

import hashlib

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, byte_len long, format string, width int, height int, "
    "channels int, n_frames int, decode_ok boolean"
)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# PNG color type → sample channels (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_image(payload: bytes) -> dict:
    """Parse media container headers with no external libraries.

    Supports PNG (signature + IHDR), JPEG (SOI + SOF0/SOF1/SOF2 scan)
    and GIF (87a/89a logical screen descriptor). Returns
    ``{format, width, height, channels, n_frames}``; raises ValueError
    for anything truncated, misaligned, or unrecognized — callers route
    those rows to `decode_ok = false` instead of failing the job.
    """
    if payload[:8] == _PNG_MAGIC:
        # 8B signature, 4B chunk length, 4B "IHDR", 4B width, 4B height,
        # 1B bit depth, 1B color type (spec §11.2.2)
        if len(payload) < 26 or payload[12:16] != b"IHDR":
            raise ValueError("PNG: truncated or first chunk not IHDR")
        width = int.from_bytes(payload[16:20], "big")
        height = int.from_bytes(payload[20:24], "big")
        channels = _PNG_CHANNELS.get(payload[25])
        if width == 0 or height == 0 or channels is None:
            raise ValueError("PNG: invalid IHDR")
        return {
            "format": "PNG", "width": width, "height": height,
            "channels": channels, "n_frames": 1,
        }
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                raise ValueError("JPEG: lost marker alignment")
            marker = payload[i + 1]
            # standalone markers carry no length field
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9 or marker == 0xDA:  # EOI / start of scan
                break
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seg_len < 2:
                raise ValueError("JPEG: bad segment length")
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2 frame header
                seg = payload[i + 4 : i + 2 + seg_len]
                if len(seg) < 6:
                    raise ValueError("JPEG: truncated SOF")
                height = int.from_bytes(seg[1:3], "big")
                width = int.from_bytes(seg[3:5], "big")
                if width == 0 or height == 0:
                    raise ValueError("JPEG: zero frame dimension")
                return {
                    "format": "JPEG", "width": width, "height": height,
                    "channels": seg[5], "n_frames": 1,
                }
            i += 2 + seg_len
        raise ValueError("JPEG: no SOF marker before scan/end")
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 10:
            raise ValueError("GIF: truncated screen descriptor")
        return {
            "format": "GIF",
            "width": int.from_bytes(payload[6:8], "little"),
            "height": int.from_bytes(payload[8:10], "little"),
            "channels": 3,
            "n_frames": 1,
        }
    raise ValueError("unsupported or malformed media payload")


# ---------------------------------------------------------------------------
# Real PNG codec (stdlib only: zlib + struct).  Encoder writes 8-bit
# truecolor non-interlaced PNGs with a DIFFERENT filter type per
# scanline (y % 5), so any decoder that round-trips them must implement
# the full PNG filter set (None/Sub/Up/Average/Paeth, spec §9).  The
# decoder walks chunks, verifies every CRC32, inflates the IDAT stream
# and unfilters scanline-by-scanline — corruption anywhere (CRC, zlib
# stream, filter byte, stream length) raises ValueError.

import struct
import zlib


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """Encode raw RGB bytes (height*width*3) as a real PNG.

    Scanline y uses filter type y % 5 — deliberately cycling the whole
    filter set so `decode_png_pixels` is a genuine full decoder, not a
    filter-0 special case."""
    bpp = 3
    if len(pixels) != width * height * bpp:
        raise ValueError("pixel buffer size mismatch")
    out = bytearray()
    prev = bytes(width * bpp)
    for y in range(height):
        line = pixels[y * width * bpp : (y + 1) * width * bpp]
        t = y % 5
        out.append(t)
        for i in range(len(line)):
            left = line[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if t == 0:
                pred = 0
            elif t == 1:
                pred = left
            elif t == 2:
                pred = up
            elif t == 3:
                pred = (left + up) >> 1
            else:
                pred = _paeth(left, up, ul)
            out.append((line[i] - pred) & 0xFF)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Full pixel-level PNG decode with no imaging library: chunk walk
    with CRC32 verification, IDAT concatenation + zlib inflate, then
    per-scanline unfilter (all five PNG filter types, Paeth included).
    Returns (width, height, channels, raw_pixels).  Supports 8-bit
    truecolor non-interlaced (the encoder's output and the common
    web-scrape case); anything else — or any corruption — raises
    ValueError so callers can dead-letter the row."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    idat = bytearray()
    saw_end = False
    while pos + 12 <= len(payload):
        clen = int.from_bytes(payload[pos : pos + 4], "big")
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        if len(data) != clen:
            raise ValueError("PNG: truncated chunk")
        crc = int.from_bytes(payload[pos + 8 + clen : pos + 12 + clen], "big")
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG: CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            width, height = struct.unpack(">II", data[:8])
            bit_depth, color_type, _comp, _filt, interlace = data[8:13]
            if bit_depth != 8 or color_type != 2 or interlace != 0:
                raise ValueError("PNG: only 8-bit truecolor non-interlaced")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            saw_end = True
            break
        pos += 12 + clen
    if width is None or not idat or not saw_end:
        raise ValueError("PNG: missing IHDR/IDAT/IEND")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"PNG: corrupt IDAT stream ({e})") from e
    bpp = 3
    stride = width * bpp
    if len(raw) != height * (1 + stride):
        raise ValueError("PNG: inflated stream length mismatch")
    pixels = bytearray(height * stride)
    prev = bytes(stride)
    for y in range(height):
        t = raw[y * (1 + stride)]
        if t > 4:
            raise ValueError(f"PNG: invalid filter type {t}")
        f = raw[y * (1 + stride) + 1 : (y + 1) * (1 + stride)]
        line = bytearray(stride)
        for i in range(stride):
            left = line[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if t == 0:
                pred = 0
            elif t == 1:
                pred = left
            elif t == 2:
                pred = up
            elif t == 3:
                pred = (left + up) >> 1
            else:
                pred = _paeth(left, up, ul)
            line[i] = (f[i] + pred) & 0xFF
        pixels[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return width, height, bpp, bytes(pixels)


def png_channel_features(payload: bytes) -> dict:
    """Decoded-pixel features: per-channel mean and population stddev,
    normalized to [0,1].  This is the real replacement for the md5
    stand-in — wrong inflate, wrong unfilter, or wrong channel order
    changes the numbers and fails the oracle."""
    import numpy as np

    w, h, ch, pix = decode_png_pixels(payload)
    a = np.frombuffer(pix, dtype=np.uint8).reshape(-1, ch).astype(np.float64)
    mu = a.mean(axis=0) / 255.0
    sd = a.std(axis=0) / 255.0
    return {
        "width": w,
        "height": h,
        "feature_vec": [*mu.tolist(), *sd.tolist()],
    }


PNG_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, decode_ok boolean, "
    "feature_vec array<double>"
)


def attach_png_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Testdata shim generating REAL PNGs: pixel (x, y, channel c) has
    value (doc_id + 31*y + 7*x + 83*c) % 256, width = doc_id % 32 + 4,
    height = (doc_id*7) % 32 + 4.  The closed form lets an
    engine-independent oracle recompute per-channel statistics
    analytically, while the Spark side must genuinely zlib-inflate and
    unfilter the encoded bytes to recover them (the encoder cycles all
    five PNG filter types)."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            ids = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                w = d % 32 + 4
                h = (d * 7) % 32 + 4
                y, x, c = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                )
                pix = ((d + 31 * y + 7 * x + 83 * c) % 256).astype(np.uint8)
                payloads.append(encode_png(w, h, pix.tobytes()))
                ids.append(d)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    # spread the id frame before the Python encode kernel (optimization
    # r11): the upstream scan is one parquet split, so the whole
    # payload synthesis otherwise runs in a single Python task
    spark = df.sparkSession
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(kernel, schema="doc_id long, payload binary")
    )


def extract_png_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas kernel: real PNG payload → decoded-pixel features
    (per-channel mean + population stddev, normalized).  Rows that fail
    decode (corrupt CRC/IDAT/filter) become decode_ok=false with NULL
    features — the dead-letter convention — instead of failing the job."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                base = dict(doc_id=int(doc_id))
                try:
                    feats = png_channel_features(bytes(payload))
                    rows.append(dict(**base, decode_ok=True, **feats))
                except ValueError:
                    rows.append(
                        dict(
                            **base, width=None, height=None,
                            decode_ok=False, feature_vec=None,
                        )
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, "payload").mapInPandas(
        kernel, schema=PNG_FEATURE_SCHEMA
    )


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata shim: treat utf-8 text bytes as the opaque media
    payload (real pipelines read the binary column from parquet)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def attach_image_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Testdata shim generating REAL image containers, entirely
    JVM-side: even doc_ids get a valid PNG signature + IHDR chunk, odd
    doc_ids a valid JPEG SOI + SOF0 frame header, each followed by the
    utf-8 text bytes standing in for compressed pixel data. Dimensions
    are a deterministic function of the id (width = id % 512 + 16,
    height = id*7 % 512 + 16) so an engine-independent oracle can
    recompute them — while `decode_image` genuinely parses them back
    out of the header bytes."""
    did = F.col(id_col)
    w, h = did % 512 + 16, (did * 7) % 512 + 16
    # PNG: signature, IHDR length 13, "IHDR", w, h, bit depth 8,
    # color type 2 (truecolor), compression/filter/interlace 0, CRC
    # (unchecked by header parsers) — 33 bytes total.
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A0000000D49484452"),
        F.lpad(F.hex(w), 8, "0"),
        F.lpad(F.hex(h), 8, "0"),
        F.lit("080200000000000000"),
    )
    # JPEG: SOI, SOF0 marker, length 17, precision 8, h, w, 3
    # components with standard ids/sampling — 21 bytes total.
    jpeg_hex = F.concat(
        F.lit("FFD8FFC0001108"),
        F.lpad(F.hex(h), 4, "0"),
        F.lpad(F.hex(w), 4, "0"),
        F.lit("03011100021101031101"),
    )
    header = F.unhex(F.when(did % 2 == 0, png_hex).otherwise(jpeg_hex))
    # coalesce: a NULL text must still yield a decodable container
    # (header + empty body), not a NULL payload that would crash the
    # Arrow kernel with bytes(None); oracles mirror with
    # coalesce(text, '')
    return df.withColumn(
        "payload",
        F.concat(
            header,
            F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8"),
        ),
    )


def extract_media_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas kernel: payload binary → typed metadata row via the
    real header parser. Malformed/unrecognized payloads yield a
    `decode_ok = false` row with NULL metadata instead of failing the
    job — the dead-letter convention, same as the streaming decode.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                data = bytes(payload)
                base = dict(doc_id=int(doc_id), byte_len=len(data))
                try:
                    meta = decode_image(data)
                    rows.append(dict(**base, **meta, decode_ok=True))
                except ValueError:
                    rows.append(
                        dict(
                            **base, format=None, width=None, height=None,
                            channels=None, n_frames=None, decode_ok=False,
                        )
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, "payload").mapInPandas(kernel, schema=MEDIA_META_SCHEMA)


FRAME_SAMPLE_SCHEMA = (
    "doc_id LONG, frame_idx INT, frame_len INT, frame_md5 STRING"
)

FRAME_BYTES = 512


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    every: int = 2,
    frame_bytes: int = FRAME_BYTES,
) -> DataFrame:
    """Video-style frame sampling over opaque binary payloads: slice
    the byte stream into fixed frames, keep every k-th one, fingerprint
    each with md5 over its hex encoding (hex-domain so an
    engine-independent oracle can recompute the digest without blob
    slicing support).

    This is the frame-sample stage of a video curation pipeline — the
    Spark-side plumbing (Arrow batch shape, typed output schema,
    one-to-many row expansion inside mapInPandas) is exactly what a
    real codec kernel needs; the decode itself stays a byte-level
    slice because the container here is synthetic (the
    attach_image_payload shim). One output row per sampled frame."""
    import binascii

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                data = bytes(payload)
                for i in range(0, -(-len(data) // frame_bytes), every):
                    frame = data[i * frame_bytes : (i + 1) * frame_bytes]
                    if not frame:
                        break
                    rows.append(
                        dict(
                            doc_id=int(doc_id),
                            frame_idx=i,
                            frame_len=len(frame),
                            frame_md5=hashlib.md5(
                                binascii.hexlify(frame).upper()
                            ).hexdigest(),
                        )
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, "payload").mapInPandas(
        kernel, schema=FRAME_SAMPLE_SCHEMA
    )


# ---------------------------------------------------------------------------
# Real WAV/PCM audio codec (stdlib only: struct).  Same design as the
# PNG path: the testdata shim writes genuine RIFF/WAVE containers whose
# PCM samples are a closed-form function of doc_id, the Spark kernel
# truly parses chunks and decodes 16-bit little-endian PCM, and the
# DuckDB oracle recomputes the audio statistics analytically — a wrong
# chunk walk, wrong endianness, or wrong sample width fails the hash.

AUDIO_FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, n_samples int, decode_ok boolean, "
    "rms double, zero_crossings int, peak int"
)


def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Minimal-but-valid WAV: RIFF header, PCM fmt chunk (mono,
    16-bit), data chunk."""
    import array

    pcm = array.array("h", samples)
    if sys_byteorder_big():
        pcm.byteswap()
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def sys_byteorder_big() -> bool:
    import sys

    return sys.byteorder == "big"


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Parse RIFF/WAVE and decode mono 16-bit PCM samples.

    Walks the chunk list (fmt must precede data, as written by every
    real encoder), validates the RIFF size field, the PCM format tag,
    channel count, bit depth, and that the data chunk length matches
    a whole number of samples. Returns (sample_rate, samples);
    raises ValueError on any corruption."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    if len(payload) < 12 or struct.unpack("<I", payload[4:8])[0] != len(payload) - 8:
        raise ValueError("WAV: RIFF size field mismatch")
    pos = 12
    sample_rate = None
    samples = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        clen = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        data = payload[pos + 8 : pos + 8 + clen]
        if len(data) != clen:
            raise ValueError("WAV: truncated chunk")
        if tag == b"fmt ":
            if clen < 16:
                raise ValueError("WAV: short fmt chunk")
            audio_fmt, channels, sample_rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", data[:16]
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("WAV: only mono 16-bit PCM supported")
        elif tag == b"data":
            if sample_rate is None:
                raise ValueError("WAV: data chunk before fmt")
            if clen % 2:
                raise ValueError("WAV: data length not sample-aligned")
            import array

            pcm = array.array("h")
            pcm.frombytes(data)
            if sys_byteorder_big():
                pcm.byteswap()
            samples = pcm.tolist()
        pos += 8 + clen + (clen % 2)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("WAV: missing fmt or data chunk")
    return sample_rate, samples


def wav_audio_features(payload: bytes) -> dict:
    """Decoded-PCM features: RMS amplitude, zero-crossing count
    (consecutive samples with strictly opposite signs), peak absolute
    amplitude."""
    import math

    rate, s = decode_wav(payload)
    n = len(s)
    rms = math.sqrt(sum(v * v for v in s) / n) if n else 0.0
    zc = sum(
        1 for i in range(1, n) if (s[i - 1] < 0 < s[i]) or (s[i] < 0 < s[i - 1])
    )
    return {
        "sample_rate": rate,
        "n_samples": n,
        "rms": rms,
        "zero_crossings": zc,
        "peak": max((abs(v) for v in s), default=0),
    }


def attach_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Testdata shim generating REAL WAV containers: doc d carries
    n = d % 256 + 16 mono 16-bit samples with
    sample[i] = ((d * 7919 + i * 31) % 2048) - 1024 at 8 kHz — a
    closed form the oracle can integrate analytically while the Spark
    side must genuinely parse RIFF chunks and decode PCM bytes."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                n = d % 256 + 16
                samples = [((d * 7919 + i * 31) % 2048) - 1024 for i in range(n)]
                ids.append(d)
                payloads.append(encode_wav(8000, samples))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    # spread the id frame before the Python encode kernel (optimization
    # r11): the upstream scan is one parquet split, so the whole
    # payload synthesis otherwise runs in a single Python task
    spark = df.sparkSession
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(kernel, schema="doc_id long, payload binary")
    )


def extract_audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas kernel: WAV payload → decoded audio features, with
    the dead-letter convention for corrupt containers."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                base = dict(doc_id=int(doc_id))
                try:
                    feats = wav_audio_features(bytes(payload))
                    rows.append(dict(**base, decode_ok=True, **feats))
                except ValueError:
                    rows.append(
                        dict(
                            **base, sample_rate=None, n_samples=None,
                            decode_ok=False, rms=None,
                            zero_crossings=None, peak=None,
                        )
                    )
            yield pd.DataFrame(rows)

    out = df.select(id_col, "payload").mapInPandas(
        kernel,
        schema=(
            "doc_id long, sample_rate int, n_samples int, rms double, "
            "zero_crossings int, peak int, decode_ok boolean"
        ),
    )
    return out.select(
        "doc_id", "sample_rate", "n_samples", "decode_ok",
        "rms", "zero_crossings", "peak",
    )


# ---------------------------------------------------------------------------
# Real image resize over decoded pixels (the remaining multimodal verb:
# decode / feature-extract / RESIZE / frame-sample).

RESIZE_SCHEMA = (
    "doc_id long, out_w int, out_h int, decode_ok boolean, "
    "resized_mean double, checksum double"
)


def box_downsample_2x(width: int, height: int, pixels: bytes) -> list[float]:
    """2x2 box-filter downsample of raw RGB bytes: output pixel (x,y,c)
    is the float mean of the four source samples of its block (odd
    trailing rows/columns are cropped, the common convention).  Returns
    the resized samples in row-major (y, x, channel) order — exact
    quarter-fraction doubles, so an engine-independent oracle can
    recompute them bit-for-bit."""
    out_w, out_h = width // 2, height // 2
    if out_w == 0 or out_h == 0:
        raise ValueError("resize: image smaller than the box filter")
    stride = width * 3
    out = []
    for y in range(out_h):
        r0, r1 = 2 * y * stride, (2 * y + 1) * stride
        for x in range(out_w):
            i0, i1 = r0 + 2 * x * 3, r0 + (2 * x + 1) * 3
            j0, j1 = r1 + 2 * x * 3, r1 + (2 * x + 1) * 3
            for c in range(3):
                out.append(
                    (pixels[i0 + c] + pixels[i1 + c]
                     + pixels[j0 + c] + pixels[j1 + c]) / 4.0
                )
    return out


def resize_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas kernel: PNG payload → decode → 2x box downsample →
    (out dims, resized mean, position-weighted checksum).  The checksum
    Σ v_k · (k+1) over row-major resized samples pins every value AND
    its position, so a transposed, channel-swapped, or off-by-one
    resize fails the oracle even when the mean survives."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                base = dict(doc_id=int(doc_id))
                try:
                    w, h, _ch, pix = decode_png_pixels(bytes(payload))
                    rs = box_downsample_2x(w, h, pix)
                    rows.append(
                        dict(
                            **base, out_w=w // 2, out_h=h // 2,
                            decode_ok=True,
                            resized_mean=sum(rs) / len(rs),
                            checksum=sum(v * (k + 1) for k, v in enumerate(rs)),
                        )
                    )
                except ValueError:
                    rows.append(
                        dict(
                            **base, out_w=None, out_h=None, decode_ok=False,
                            resized_mean=None, checksum=None,
                        )
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, "payload").mapInPandas(kernel, schema=RESIZE_SCHEMA)


SILENCE_SCHEMA = (
    "doc_id long, seg_idx int, start_idx int, end_idx int, seg_len int"
)


def silence_segments(
    df: DataFrame, id_col: str = "doc_id", threshold: int = 256, min_len: int = 4
) -> DataFrame:
    """Silence detection over decoded PCM: maximal runs of consecutive
    samples with |v| < threshold, at least min_len long — the segment
    step of a speech-curation pipeline (VAD stands here).  One-to-many
    mapInPandas expansion: decode the WAV, scan the run-length
    structure, emit one row per silence segment (seg_idx orders them,
    start/end are sample indices, end exclusive)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    _rate, s = decode_wav(bytes(payload))
                except ValueError:
                    continue  # corrupt audio carries no segments
                seg_idx = 0
                run_start = None
                for i, v in enumerate(s + [threshold]):  # sentinel ends runs
                    if abs(v) < threshold and i < len(s):
                        if run_start is None:
                            run_start = i
                    elif run_start is not None:
                        if i - run_start >= min_len:
                            rows.append(
                                dict(
                                    doc_id=int(doc_id), seg_idx=seg_idx,
                                    start_idx=run_start, end_idx=i,
                                    seg_len=i - run_start,
                                )
                            )
                            seg_idx += 1
                        run_start = None
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "seg_idx", "start_idx", "end_idx", "seg_len"],
            )

    return df.select(id_col, "payload").mapInPandas(kernel, schema=SILENCE_SCHEMA)
