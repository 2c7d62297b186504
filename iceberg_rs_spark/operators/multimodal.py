"""Multimodal columns (SURVEY.md north-star): image/audio/video as
opaque ``binary`` columns + typed metadata, with decode / feature
extraction as Arrow-batched pandas stages over ``mapInPandas``.

``decode_image`` is a real pure-Python decoder for the two
self-describing uncompressed formats (BMP with BITMAPINFOHEADER, and
binary PPM "P6") — no external codecs needed, so the decode path
executes for real in this container. Exotic formats (JPEG/PNG/...)
would slot in behind the same signature when PIL is available; until
then they raise ValueError. A deterministic fake decoder
(``fake=True``) remains for plumbing tests that feed arbitrary bytes.
Everything Spark-side — schema, partitioning, UDF signature, Arrow
batch shape — is identical either way (tests/test_operators.py).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of the extracted features appended by decode_and_featurize
FEATURE_FIELDS = T.StructType(
    [
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: the testdata has no binary media, so we treat
    the utf-8 bytes of ``text`` as the opaque payload — the engine-side
    plumbing (binary column + typed metadata struct) is identical to a
    real image/audio column."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("image/fake").alias("content_type"),
            F.length(F.col(text_col)).cast("long").alias("content_length"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real image decode: dimensions
    derived from the byte content (stable across runs/engines)."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    channels = 3
    return width, height, channels


def _decode_bmp(payload: bytes) -> tuple[int, int, int]:
    """Minimal BMP (BITMAPINFOHEADER) parse: width/height/channels from
    the 54-byte header. Raises ValueError on a malformed header."""
    if len(payload) < 54:
        raise ValueError("BMP truncated: header needs 54 bytes")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:  # BI_RGB only: the row-stride validation below
        # is meaningless for RLE8/BITFIELDS payloads
        raise ValueError(f"BMP compression {compression} unsupported (BI_RGB only)")
    if width <= 0 or bpp % 8 != 0 or bpp == 0:
        raise ValueError(f"BMP malformed: width={width} bpp={bpp}")
    height = abs(height)  # negative height = top-down rows
    channels = bpp // 8
    row = (width * channels + 3) // 4 * 4  # rows padded to 4 bytes
    pixel_offset = struct.unpack_from("<I", payload, 10)[0]
    if len(payload) < pixel_offset + row * height:
        raise ValueError("BMP truncated: pixel data short")
    return width, height, channels


def _decode_ppm(payload: bytes) -> tuple[int, int, int]:
    """Binary PPM ("P6"): ASCII header 'P6 <w> <h> <maxval>' then raw
    RGB bytes. Comments (#...) allowed per the netpbm spec."""
    tokens: list[bytes] = []
    i = 2  # past magic
    while len(tokens) < 3 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    if len(tokens) < 3:
        raise ValueError("PPM truncated header")
    width, height = int(tokens[0]), int(tokens[1])
    if width <= 0 or height <= 0:
        raise ValueError(f"PPM malformed: {width}x{height}")
    if len(payload) < i + 1 + width * height * 3:
        raise ValueError("PPM truncated: pixel data short")
    return width, height, 3


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, int]:
    """(width, height, n_channels) of an encoded image. Real decode for
    BMP and binary PPM; ``fake=True`` routes arbitrary bytes through
    the deterministic stub instead (for plumbing tests)."""
    if fake:
        return _fake_decode(payload)
    payload = bytes(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    raise ValueError(
        f"unsupported image format (magic {payload[:2]!r}); "
        "supported here: BMP, binary PPM"
    )


def synth_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic uncompressed 24-bit BMP — a *real* image file any
    viewer opens, generated without codecs (used as fixture payload)."""
    row = (width * 3 + 3) // 4 * 4
    size = 54 + row * height
    header = (
        b"BM"
        + struct.pack("<IHHI", size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, row * height, 2835, 2835, 0, 0)
    )
    body = bytearray()
    for y in range(height):
        line = bytearray()
        for x in range(width):
            v = (x * 7 + y * 13 + seed) % 256
            line += bytes((v, (v * 3) % 256, (v * 5) % 256))
        line += b"\x00" * (row - len(line))
        body += line
    return header + bytes(body)


def attach_image_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter with *real* images: a deterministic 24-bit BMP
    per row (dimensions derived from the id), attached as the opaque
    binary payload + typed metadata. Pandas-UDF batch generation —
    executor-side, Arrow transfer, no driver involvement."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def make_bmp(ids: pd.Series) -> pd.Series:
        return ids.apply(
            lambda i: synth_bmp(16 + int(i) % 32, 16 + (int(i) // 32) % 32, seed=int(i))
        )

    return df.withColumn("payload", make_bmp(F.col(id_col))).withColumn(
        "media_meta",
        F.struct(
            F.lit("image/bmp").alias("content_type"),
            F.length(F.col("payload")).cast("long").alias("content_length"),
        ),
    )


def decode_and_featurize(df: DataFrame, payload_col: str = "payload", fake: bool = True) -> DataFrame:
    """mapInPandas decode stage: Arrow batches in, original columns +
    feature columns out. This is the real scale shape — executor-side
    Python, vectorized transfer, no driver involvement."""
    out_schema = T.StructType(list(df.schema.fields) + list(FEATURE_FIELDS.fields))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            dims = [decode_image(p, fake=fake) for p in payloads]
            pdf = pdf.copy()
            pdf["byte_len"] = [len(p) for p in payloads]
            pdf["width"] = [d[0] for d in dims]
            pdf["height"] = [d[1] for d in dims]
            pdf["n_channels"] = [d[2] for d in dims]
            yield pdf

    return df.mapInPandas(decode_batches, schema=out_schema)


def frame_sample_plan(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame-sampling *plan* shape: one row per sampled frame
    index (the decode itself is the stub above). Demonstrates the
    explode-based fan-out used for per-frame feature extraction."""
    n_frames = (F.col("media_meta.content_length") / 100).cast("int") + 1
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_nth))),
    )


def _bmp_pixel_rows(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Decode a 24-bit BI_RGB BMP into (width, height, rows), where
    rows are in WRITTEN (file) order with the 4-byte padding stripped.
    Validation is _decode_bmp's; this adds only the pixel copy."""
    payload = bytes(payload)
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    width, height, channels = _decode_bmp(payload)
    if channels != 3:
        raise ValueError(f"pixel ops support 24-bit BMP only, got {channels * 8}bpp")
    stride = (width * 3 + 3) // 4 * 4
    off = struct.unpack_from("<I", payload, 10)[0]
    rows = [
        payload[off + y * stride : off + y * stride + width * 3]
        for y in range(height)
    ]
    return width, height, rows


def resize_image(payload: bytes, dst_w: int, dst_h: int) -> bytes:
    """Nearest-neighbor resize of a 24-bit BMP, re-encoded as BMP —
    the thumbnailing stage of an image-curation pipeline, pure Python
    so it runs for real in this container. Source pixel for dst (x, y)
    is (x * w // dst_w, y * h // dst_h) in written-row coordinates."""
    w, h, rows = _bmp_pixel_rows(payload)
    stride = (dst_w * 3 + 3) // 4 * 4
    size = 54 + stride * dst_h
    header = (
        b"BM"
        + struct.pack("<IHHI", size, 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, dst_w, dst_h, 1, 24, 0, stride * dst_h, 2835, 2835, 0, 0
        )
    )
    body = bytearray()
    for y in range(dst_h):
        src_row = rows[y * h // dst_h]
        line = bytearray()
        for x in range(dst_w):
            sx = x * w // dst_w
            line += src_row[sx * 3 : sx * 3 + 3]
        line += b"\x00" * (stride - len(line))
        body += line
    return header + bytes(body)


def resize_and_featurize(
    df: DataFrame,
    payload_col: str = "payload",
    dst_w: int = 8,
    dst_h: int = 8,
    sample_xy: tuple[int, int] = (4, 4),
) -> DataFrame:
    """mapInPandas resize stage: decode → nearest-neighbor resize →
    BMP re-encode → decode AGAIN and sample one pixel of the result.
    The round trip inside the executor proves the re-encoded payload
    is a valid image, and the sampled pixel is arithmetically
    derivable for synthetic fixtures, so the whole pixel path is
    oracle-checkable. Arrow batches, no driver involvement."""
    out_fields = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("rs_payload", T.BinaryType()),
            T.StructField("rs_width", T.IntegerType()),
            T.StructField("rs_height", T.IntegerType()),
            T.StructField("rs_byte_len", T.LongType()),
            T.StructField("px0", T.IntegerType()),
            T.StructField("px1", T.IntegerType()),
            T.StructField("px2", T.IntegerType()),
        ]
    )
    sx, sy = sample_xy

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            resized = [resize_image(p, dst_w, dst_h) for p in pdf[payload_col]]
            dims = [_bmp_pixel_rows(p) for p in resized]  # re-decode round trip
            out["rs_payload"] = resized
            out["rs_width"] = [d[0] for d in dims]
            out["rs_height"] = [d[1] for d in dims]
            out["rs_byte_len"] = [len(p) for p in resized]
            px = [d[2][sy][sx * 3 : sx * 3 + 3] for d in dims]
            out["px0"] = [p[0] for p in px]
            out["px1"] = [p[1] for p in px]
            out["px2"] = [p[2] for p in px]
            yield out

    return df.mapInPandas(resize_batches, schema=out_fields)


# --- audio (WAV/PCM) ------------------------------------------------------


def synth_wav(n_samples: int, sample_rate: int = 8000, seed: int = 0) -> bytes:
    """Deterministic 16-bit mono PCM WAV (RIFF) — a *real* audio file,
    generated without codecs. Sample i = ((i*7919 + seed*104729) %
    65536) - 32768, reproducible arithmetically by the oracle."""
    import numpy as np

    i = np.arange(n_samples, dtype=np.int64)
    samples = ((i * 7919 + seed * 104729) % 65536 - 32768).astype("<i2")
    data = samples.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def _decode_wav(payload: bytes):
    """Minimal RIFF/WAVE parse for 16-bit PCM: returns (n_channels,
    sample_rate, samples int16 ndarray). Raises ValueError on
    malformed/truncated/compressed payloads."""
    import numpy as np

    payload = bytes(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    if len(payload) < 44:
        raise ValueError("WAV truncated: header needs 44 bytes")
    # walk chunks (fmt may not be first in the wild)
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            if len(body) < size:
                raise ValueError("WAV truncated: data chunk short")
            data = body
        pos += 8 + size + (size % 2)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (format={audio_format}, bits={bits})")
    if len(data) % (2 * channels) != 0:
        raise ValueError("WAV truncated: data not a whole number of frames")
    return channels, rate, np.frombuffer(data, dtype="<i2")


def attach_audio_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter with *real* audio: a deterministic PCM clip per
    row (length derived from the id), as binary payload + typed
    metadata. Pandas-UDF batch generation, executor-side."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def make_wav(ids: pd.Series) -> pd.Series:
        return ids.apply(
            lambda i: synth_wav(400 + int(i) % 400, sample_rate=8000, seed=int(i))
        )

    return df.withColumn("payload", make_wav(F.col(id_col))).withColumn(
        "media_meta",
        F.struct(
            F.lit("audio/wav").alias("content_type"),
            F.length(F.col("payload")).cast("long").alias("content_length"),
        ),
    )


def audio_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas audio feature extraction: decode PCM and compute the
    classic clip statistics — duration, peak amplitude, RMS, zero
    crossings — vectorized in numpy per Arrow batch. Every feature is
    integer-deterministic (RMS is the IEEE sqrt of an exactly-
    representable integer mean), so the whole signal path is
    oracle-checkable."""
    import numpy as np

    out_fields = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("peak", T.IntegerType()),
            T.StructField("n_zero_cross", T.LongType()),
            T.StructField("rms", T.DoubleType()),
        ]
    )

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, counts, durs, peaks, zcs, rmss = [], [], [], [], [], []
            for p in pdf[payload_col]:
                _ch, rate, s = _decode_wav(p)
                s64 = s.astype(np.int64)
                n = len(s)
                rates.append(rate)
                counts.append(n)
                durs.append(n * 1000 // rate)
                peaks.append(int(np.abs(s64).max()) if n else 0)
                pos = s64 >= 0
                zcs.append(int((pos[1:] != pos[:-1]).sum()) if n > 1 else 0)
                rmss.append(float(np.sqrt((s64 * s64).sum() / n)) if n else 0.0)
            out = pdf.copy()
            out["sample_rate"] = rates
            out["n_samples"] = counts
            out["duration_ms"] = durs
            out["peak"] = peaks
            out["n_zero_cross"] = zcs
            out["rms"] = rmss
            yield out

    return df.mapInPandas(feature_batches, schema=out_fields)


# --- video (frame container) ----------------------------------------------


def synth_video(n_frames: int, width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic toy video container: b"VID0" + u32 frame count,
    then length-prefixed BMP frames (frame k encoded with seed+k). A
    stand-in for a real container with the same access pattern —
    sequential frame records an extractor walks."""
    out = bytearray(b"VID0" + struct.pack("<I", n_frames))
    for k in range(n_frames):
        frame = synth_bmp(width, height, seed=seed + k)
        out += struct.pack("<I", len(frame)) + frame
    return bytes(out)


def _video_frames(payload: bytes) -> list[bytes]:
    payload = bytes(payload)
    if payload[:4] != b"VID0":
        raise ValueError("not a VID0 payload")
    (n,) = struct.unpack_from("<I", payload, 4)
    frames, pos = [], 8
    for _ in range(n):
        if pos + 4 > len(payload):
            raise ValueError("video truncated: frame header short")
        (ln,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        if pos + ln > len(payload):
            raise ValueError("video truncated: frame body short")
        frames.append(payload[pos : pos + ln])
        pos += ln
    return frames


def attach_video_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter with *real* frame data: a VID0 clip per row
    (frame count and geometry derived from the id)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def make_vid(ids: pd.Series) -> pd.Series:
        return ids.apply(
            lambda i: synth_video(
                4 + int(i) % 5, 16 + int(i) % 8, 16, seed=int(i) * 31
            )
        )

    return df.withColumn("payload", make_vid(F.col(id_col))).withColumn(
        "media_meta",
        F.struct(
            F.lit("video/vid0").alias("content_type"),
            F.length(F.col("payload")).cast("long").alias("content_length"),
        ),
    )


def sample_frames_and_featurize(
    df: DataFrame,
    payload_col: str = "payload",
    every_nth: int = 2,
    sample_xy: tuple[int, int] = (3, 5),
) -> DataFrame:
    """mapInPandas frame sampling: walk the container, keep every Nth
    frame, decode each kept BMP and sample one pixel — the fan-out
    shape (one input row → one row per sampled frame) used for
    per-frame feature extraction. Output rows carry (frame_idx,
    n_frames, frame dims, sampled pixel)."""
    out_fields = T.StructType(
        [f for f in df.schema.fields if f.name != payload_col]
        + [
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("f_width", T.IntegerType()),
            T.StructField("f_height", T.IntegerType()),
            T.StructField("px0", T.IntegerType()),
            T.StructField("px1", T.IntegerType()),
            T.StructField("px2", T.IntegerType()),
        ]
    )
    sx, sy = sample_xy
    keep_cols = [f.name for f in df.schema.fields if f.name != payload_col]

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                frames = _video_frames(r[payload_col])
                for k in range(0, len(frames), every_nth):
                    w, h, rws = _bmp_pixel_rows(frames[k])
                    px = rws[sy][sx * 3 : sx * 3 + 3]
                    rows.append(
                        {
                            **{c: r[c] for c in keep_cols},
                            "n_frames": len(frames),
                            "frame_idx": k,
                            "f_width": w,
                            "f_height": h,
                            "px0": px[0],
                            "px1": px[1],
                            "px2": px[2],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=keep_cols
                + ["n_frames", "frame_idx", "f_width", "f_height", "px0", "px1", "px2"],
            )

    return df.mapInPandas(frame_batches, schema=out_fields)


def synth_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic binary PPM ("P6") holding the SAME pixels as
    ``synth_bmp(width, height, seed)``: BMP stores BGR rows bottom-up
    with 4-byte padding, PPM stores RGB rows top-down unpadded — two
    different containers, one image."""
    header = f"P6 {width} {height} 255\n".encode()
    body = bytearray()
    for y in range(height - 1, -1, -1):  # BMP row 0 is the BOTTOM row
        for x in range(width):
            v = (x * 7 + y * 13 + seed) % 256
            body += bytes(((v * 5) % 256, (v * 3) % 256, v))  # RGB of BGR(v,3v,5v)
    return header + bytes(body)


def decode_pixels(payload: bytes) -> bytes:
    """Container-independent pixel extraction: decode a 24-bit BMP or
    binary PPM to canonical top-down row-major RGB bytes. Two files
    hold the same image iff their decoded_pixels are equal — the basis
    for content dedup that container metadata, row padding, and row
    order cannot fool."""
    payload = bytes(payload)
    if payload[:2] == b"BM":
        width, height, rows = _bmp_pixel_rows(payload)
        out = bytearray()
        for row in reversed(rows):  # bottom-up file order -> top-down
            for x in range(width):
                b, g, r = row[x * 3], row[x * 3 + 1], row[x * 3 + 2]
                out += bytes((r, g, b))
        return bytes(out)
    if payload[:2] == b"P6":
        width, height, _ = _decode_ppm(payload)
        # _decode_ppm validated the header; find the pixel offset again
        i = 2
        seen = 0
        while seen < 3:
            c = payload[i : i + 1]
            if c == b"#":
                while payload[i : i + 1] != b"\n":
                    i += 1
            elif c.isspace():
                i += 1
            else:
                while not payload[i : i + 1].isspace():
                    i += 1
                seen += 1
        i += 1  # single whitespace after maxval
        return payload[i : i + width * height * 3]
    raise ValueError(f"unsupported image format (magic {payload[:2]!r})")


def attach_mixed_container_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter for cross-container dedup: rows pair up by
    ``id // 2`` carrying the SAME image — even ids as BMP, odd ids as
    the pixel-identical PPM. Dimensions and pattern seed derive from
    the pair id, so distinct pairs are distinct images."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def make_payload(ids: pd.Series) -> pd.Series:
        def make(i: int) -> bytes:
            pair = i // 2
            w, h = 16 + pair % 32, 16 + (pair // 32) % 32
            if i % 2 == 0:
                return synth_bmp(w, h, seed=pair)
            return synth_ppm(w, h, seed=pair)

        return ids.apply(lambda i: make(int(i)))

    return df.withColumn("payload", make_payload(F.col(id_col))).withColumn(
        "container",
        F.when(F.col(id_col) % 2 == 0, F.lit("bmp")).otherwise(F.lit("ppm")),
    )


def pixel_hash(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas stage adding ``pixel_md5`` — md5 of the canonical
    decoded RGB bytes. Executor-side Arrow batches; the hash is 32
    hex chars per row, so the downstream dedup groupBy shuffles tiny
    keys regardless of image size."""
    import hashlib

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("pixel_md5", T.StringType())]
    )

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["pixel_md5"] = [
                hashlib.md5(decode_pixels(p)).hexdigest() for p in pdf[payload_col]
            ]
            yield pdf

    return df.mapInPandas(hash_batches, schema=out_schema)
