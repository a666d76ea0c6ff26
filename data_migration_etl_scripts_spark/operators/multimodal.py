"""Multimodal (image/audio/video) column plumbing.

Contract: media travel as opaque ``binary`` columns with typed
metadata (``media_type``, ``width``/``height``/``duration_ms``…), and
per-item compute runs as Arrow-batched Pandas functions via
``mapInPandas`` — the only operator family in this engine where Python
touches the hot path, because pixel/sample decoding is genuinely not
expressible in Spark SQL.

The actual codec work (PIL/ffmpeg/torchaudio) is NOT available in this
environment, so the decode kernels are stubbed two ways:

- ``decoder="fake"`` (default): a deterministic md5-seeded fake that
  produces stable pseudo-features — lets every piece of Spark-side
  plumbing (schema, batching, partitioning, fan-out) run and be tested
  for real.
- ``decoder="real"``: raises NotImplementedError at the first batch,
  marking exactly where a PIL/ffmpeg kernel plugs in.

Scale design: mapInPandas streams Arrow batches, so peak memory per
task is one batch of decoded media, not a partition; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` small (e.g. 64) for
large blobs, and repartition upstream so blobs of similar size
co-locate (size skew = straggler tasks).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta_json", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_features(content: bytes | None, dim: int) -> list[float] | None:
    """Deterministic pseudo-embedding: md5-chained floats in [0,1)."""
    if content is None:
        return None
    out: list[float] = []
    seed = hashlib.md5(content).digest()
    while len(out) < dim:
        seed = hashlib.md5(seed).digest()
        out.append(int.from_bytes(seed[:4], "big") / 2**32)
    return out[:dim]


def extract_features(
    df: DataFrame,
    dim: int = 16,
    decoder: str = "fake",
    batch_size: int = 64,
) -> DataFrame:
    """binary content -> fixed-dim feature vector via mapInPandas.

    ``df`` must carry MEDIA_SCHEMA columns. Output: FEATURE_SCHEMA.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decoding needs PIL/ffmpeg — plug the codec kernel in here"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(lambda b: None if b is None else len(b)),
                    "feature": pdf["content"].map(lambda b: _fake_features(b, dim)),
                }
            )

    sized = df.sparkSession.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    _ = sized  # documented knob; leave session value in control
    return df.select("media_id", "media_type", "content").mapInPandas(
        kernel, schema=FEATURE_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def resize_images(
    df: DataFrame, width: int = 224, height: int = 224, decoder: str = "fake"
) -> DataFrame:
    """Image resize kernel: binary -> binary at (width, height).

    ``decoder="real"`` marks the PIL plug-point; the fake produces a
    deterministic content-derived payload of plausible size so batch
    shapes, memory profile, and schema are exercised for real.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real image resize needs PIL — plug the codec kernel in here"
                )

            def fake_resize(b):
                if b is None:
                    return None
                seed = hashlib.md5(bytes(b) + f":{width}x{height}".encode()).digest()
                reps = max(1, (width * height) // (16 * 64))  # ~bytes/64 payload
                return seed * reps

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "content": pdf["content"].map(fake_resize),
                }
            )

    return df.select("media_id", "content").mapInPandas(kernel, schema=RESIZED_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("mfcc", T.ArrayType(T.FloatType()), True),
    ]
)


def audio_features(df: DataFrame, n_mfcc: int = 13, decoder: str = "fake") -> DataFrame:
    """Audio feature kernel: binary -> (duration, mfcc-like vector).

    ``decoder="real"`` marks the torchaudio/librosa plug-point."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real audio decode needs torchaudio/librosa — plug in here"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_ms": pdf["content"].map(
                        lambda b: None if b is None else len(b) * 8
                    ),
                    "mfcc": pdf["content"].map(lambda b: _fake_features(b, n_mfcc)),
                }
            )

    return df.select("media_id", "content").mapInPandas(
        kernel, schema=AUDIO_FEATURE_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explodes per-video sample timestamps
    from metadata (duration_ms in meta_json) WITHOUT decoding — the
    downstream decode kernel receives (media_id, sample_ms) pairs.
    Spark-side: pure JSON + sequence, no Python."""
    duration = F.get_json_object("meta_json", "$.duration_ms").cast("long")
    samples = F.sequence(F.lit(0), F.coalesce(duration, F.lit(0)), F.lit(every_ms))
    return df.select(
        "media_id",
        F.explode(samples).alias("sample_ms"),
    )


def synthetic_media(spark, n: int = 64, dim_hint: int = 0) -> DataFrame:
    """Deterministic fake media table for tests/benches (no codecs).

    Generated entirely JVM-side (range -> md5 -> unhex), never via
    driver createDataFrame: shipping binary rows through Py4J is
    seconds-slow and degrades badly in long-lived sessions. Few
    partitions: mapInPandas pays a Python-worker spinup per task, so a
    tiny table fanned over local[32] costs ~10s of pure startup.
    """
    df = spark.range(n).select(F.col("id").alias("media_id"))
    media_type = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("media_id") % 3).cast("int") + 1,
    )
    seed_hex = F.md5(F.concat(F.lit("media:"), F.col("media_id").cast("string")))
    content = F.unhex(F.expr(
        "repeat(md5(concat('media:', CAST(media_id AS STRING))), CAST(4 + media_id % 5 AS INT))"
    ))
    meta = F.when(
        media_type == "video",
        F.concat(F.lit('{"duration_ms": '), (1000 * (F.col("media_id") % 7)).cast("string"), F.lit("}")),
    ).otherwise(F.lit("{}"))
    _ = seed_hex  # inlined in the SQL repeat above
    return df.select(
        "media_id",
        media_type.alias("media_type"),
        content.alias("content"),
        meta.alias("meta_json"),
    ).coalesce(max(1, n // 64))
