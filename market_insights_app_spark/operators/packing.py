"""Sequence packing for LLM training — assign documents to fixed
token-budget bins (context windows) in a deterministic global order.

The primitive is an exact global prefix sum. The naive Spark spelling —
``SUM(x) OVER (ORDER BY k)`` with no PARTITION BY — collapses the whole
table into ONE partition and dies at scale. ``global_running_sum``
computes the same result distributed:

1. range-repartition by the order column (partitions hold contiguous
   key ranges),
2. within-partition running sum via a window PARTITIONed on the
   physical partition id (parallel, no global collapse),
3. per-partition totals (one row per partition) prefix-summed on a
   single tiny partition and broadcast-joined back as offsets.

Cost: two data shuffles + one broadcast of <num_partitions> rows,
instead of one shuffle into a single reducer. The result is identical
to the single-partition window (differential oracle: ★seq_pack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_running_sum(
    df: DataFrame, order_col: str, value_col: str, out_col: str = "cumsum"
) -> DataFrame:
    """Exact inclusive prefix sum of ``value_col`` in global
    ``order_col`` order, without a single-partition window.
    ``order_col`` must be unique (ties would make any engine's prefix
    sum order-ambiguous)."""
    part = df.repartitionByRange(order_col).sortWithinPartitions(order_col)
    local = part.withColumn("__pid", F.spark_partition_id())
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = local.withColumn("__local", F.sum(value_col).over(w_local))
    # one row per partition — a single-partition window here is FINE
    # (thousands of rows, not billions)
    w_off = (
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        local.groupBy("__pid")
        .agg(F.sum(value_col).alias("__psum"))
        .withColumn("__offset", F.sum("__psum").over(w_off) - F.col("__psum"))
        .select("__pid", "__offset")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__local") + F.col("__offset"))
        .drop("__pid", "__local")
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into fixed token-count chunks with overlap —
    the context-window chunking stage of a training/RAG pipeline.
    Chunk k covers tokens [k*step, k*step + chunk_size) with
    step = chunk_size - overlap; the final chunk may be short.

    Pure expressions, zero shuffle: tokenize once, generate the start
    offsets with ``sequence`` and ``posexplode`` them — the row
    explosion happens map-side where the document already lives, so at
    100 TB this is a scan + narrow transform whose output partitioning
    follows the input. Output: (doc_id, chunk_idx, chunk_text,
    chunk_tokens).

    A start offset is emitted only while the PREVIOUS chunk has not
    already reached the end of the document (upper bound
    ``n - chunk_size + step - 1``): a tail shorter than the overlap is
    fully contained in the previous chunk and emitting it would
    duplicate content in a RAG index.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    step = chunk_size - overlap
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - chunk_size + step - 1, F.lit(0)),
        F.lit(step),
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            toks.alias("__toks"),
            F.size(toks).alias("__n"),
            F.posexplode(starts).alias("chunk_idx", "__start"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.array_join(
                F.slice("__toks", F.col("__start") + 1, chunk_size), " "
            ).alias("chunk_text"),
            F.least(F.lit(chunk_size), F.col("__n") - F.col("__start")).alias(
                "chunk_tokens"
            ),
        )
    )


def pack_greedy(
    df: DataFrame,
    order_col: str,
    size_col: str,
    target: int,
    bin_col: str = "bin",
) -> DataFrame:
    """Greedy sequence packing: walk documents in ``order_col`` order,
    filling context windows of ``target`` tokens; a document belongs to
    the bin its first token lands in (bin = floor(exclusive-prefix-sum
    / target)). Deterministic, engine-portable, and O(n) — no per-bin
    state machine."""
    cum = global_running_sum(df, order_col, size_col, out_col="__cs")
    prev = F.col("__cs") - F.col(size_col)
    return cum.withColumn(
        bin_col, F.floor(prev / F.lit(float(target))).cast("long")
    ).drop("__cs")
