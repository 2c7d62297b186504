"""Multimodal columns (SURVEY.md north-star): image/audio/video as
opaque ``binary`` columns + typed metadata, with decode / feature
extraction as Arrow-batched pandas stages over ``mapInPandas``.

The actual codecs (PIL/ffmpeg/...) are NOT in this container, so the
decode step is STUBBED: ``decode_image`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder
derives (width, height, n_channels) from the bytes. Everything
Spark-side — schema, partitioning, UDF signature, Arrow batch shape —
is real and tested (tests/test_operators.py).
"""

from __future__ import annotations

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


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, int]:
    if not fake:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "pass fake=True for the deterministic stub decoder"
        )
    return _fake_decode(payload)


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
