"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.11).

Design: media travel as opaque ``binary`` columns with typed metadata
structs alongside (the Spark-native pattern — same as spark.ml's image
schema and HuggingFace's datasets-on-Spark layout). All Spark-side
plumbing (schema, partition sizing, Arrow batch shape, UDF signatures) is
real and tested; the actual codec calls are STUBBED behind
``NotImplementedError`` / a deterministic fake because media libraries
(PIL/ffmpeg/torchaudio) are not available in this environment. Swapping in
a real decoder changes ONLY the inner function body.

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
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image(payload: bytes) -> object:
    """STUB: real implementation would be PIL.Image.open(io.BytesIO(...)).
    Media codecs are unavailable in this environment."""
    raise NotImplementedError(
        "image decoding requires a codec library (e.g. PIL); "
        "wire it here — the Spark plumbing around this call is complete"
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
            ent = []
            for b in payloads:
                if not b:
                    ent.append(0.0)
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                p = np.bincount(arr, minlength=256) / len(arr)
                nz = p[p > 0]
                ent.append(float(-(nz * np.log2(nz)).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "byte_entropy": ent,
                    "feature": feats,
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
