"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct. The Spark
side — schema, partition-friendly layout, Arrow-batched UDF signatures — is
real and tested; the actual codec calls are STUBBED (this container has no
image/audio libraries): ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic hash-derived feature vector is
produced so the distributed plumbing can be exercised end-to-end.

At scale: media bytes stay columnar in parquet; ``mapInPandas`` streams Arrow
batches so a 100 MB image batch never materializes as Python row objects;
feature extraction parallelizes per file-split with no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),      # image|audio|video
    T.StructField("content", T.BinaryType(), True),    # opaque bytes
    T.StructField("meta", T.StructType([
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("digest", T.StringType(), True),
    T.StructField("features", T.ArrayType(T.FloatType()), True),
])


def _fake_features(content: bytes, n: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: bytes -> tiny float vector."""
    digest = hashlib.md5(content).digest()
    return [digest[i] / 255.0 for i in range(n)]


def decode_image(content: bytes):  # pragma: no cover - stub by design
    """Real image decode. STUB: no imaging library in this environment."""
    raise NotImplementedError(
        "image decoding requires an imaging library (e.g. Pillow); "
        "use extract_features(..., fake=True) for plumbing tests")


def attach_binary(df: DataFrame, source_col: str, media_id_col: str,
                  kind: str = "image") -> DataFrame:
    """Wrap an existing column's bytes (or utf-8 of a string) as media rows."""
    content = F.col(source_col).cast("binary")
    return df.select(
        F.col(media_id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        content.alias("content"),
        F.struct(
            F.lit("raw").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(df: DataFrame, fake: bool = False,
                     n_features: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over media rows via mapInPandas.

    ``fake=False`` routes through the real decoder (stubbed -> raises);
    ``fake=True`` produces deterministic hash features, exercising the same
    batch path.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = pdf["content"]
            feats, digests, sizes = [], [], []
            for content in contents:
                data = bytes(content) if content is not None else b""
                if not fake:
                    decode_image(data)  # raises NotImplementedError
                feats.append(_fake_features(data, n_features))
                digests.append(hashlib.md5(data).hexdigest())
                sizes.append(len(data))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "digest": digests,
                "features": feats,
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media, frame_ts) to decode.

    Demonstrates the fan-out shape (sequence + explode, no UDF); actual frame
    decode would be a mapInPandas over this plan joined back to content.
    """
    n = F.greatest((F.col("meta.duration_ms") / every_ms).cast("long"), F.lit(1))
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n - 1)).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
