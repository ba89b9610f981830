"""Multimodal (binary) column plumbing.

The reference only ever passes media transiently as base64 data-URLs to
its LLM endpoint (app/main.py:88, 702-707, cap of 5 images at
main.py:703). Here media is a first-class ``binary`` column with typed
metadata (schemas.MEDIA) and the processing stages a training-data
pipeline needs: decode, feature-extract, resize, frame-sample — all as
Arrow-batched Pandas UDFs over ``mapInPandas``.

The image/audio codec libraries are NOT in this container, so the
decode kernels are STUBBED: ``decode_media`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder (byte
statistics standing in for pixels) exercises the full Spark plumbing —
schema, batching, partitioning — which IS real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("feat_std", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def data_url_to_binary(col):
    """base64 data-URL (main.py:702-707 wire shape) → binary payload +
    mime, as pure column expressions."""
    c = F.col(col) if isinstance(col, str) else col
    mime = F.regexp_extract(c, r"^data:([^;]+);base64,", 1)
    payload = F.unbase64(F.regexp_replace(c, r"^data:[^,]+,", ""))
    return F.struct(mime.alias("mime"), payload.alias("payload"))


def decode_media(df: DataFrame, fake: bool = False, batch_size: int = 64) -> DataFrame:
    """Decode + feature-extract binary media via mapInPandas.

    Real decode needs PIL/ffmpeg — not installed here — so without
    ``fake=True`` the kernel raises NotImplementedError AT EXECUTION
    TIME (the plan itself builds fine). With ``fake=True`` a
    deterministic stand-in computes byte-level statistics so tests can
    assert the schema, batch shape, and distribution of the pipeline.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires PIL/ffmpeg (not in this container); "
                    "pass fake=True for the deterministic test decoder"
                )
            out = []
            for _, row in pdf.iterrows():
                payload = row["payload"] or b""
                arr = np.frombuffer(payload, dtype=np.uint8)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "n_bytes": int(arr.size),
                        "feat_mean": float(arr.mean()) if arr.size else 0.0,
                        "feat_std": float(arr.std()) if arr.size else 0.0,
                        "width": row.get("width"),
                        "height": row.get("height"),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.mapInPandas(kernel, DECODED_SCHEMA)


def cap_media_per_doc(df: DataFrame, doc_col: str = "doc_id", n: int = 5) -> DataFrame:
    """The reference's 5-image cap (main.py:703) as top-N-per-group."""
    from market_insights_app_spark.operators.pagination import top_k_per_group

    return top_k_per_group(df, [doc_col], [F.col("media_id").asc()], n)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (sequence + explode — JVM-side); the actual frame decode
    is the stubbed kernel above."""
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
    )
