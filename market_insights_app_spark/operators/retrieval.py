"""Lexical + hybrid text retrieval over the corpus — BM25 scoring and
reciprocal-rank fusion (RRF) with embedding cosine ranks.

The reference app retrieves context by recency/top-N only
(main.js:193-203 head-caps); a training-data / RAG pipeline needs
content retrieval. Both operators here are pure DataFrame
compositions:

- ``bm25_scores``: the postings for the (tiny) query-term set are
  isolated by an ``isin`` predicate at the scan — the only shuffles
  are groupBys on (doc, term) and term, each proportional to the
  matching postings, never the corpus. Corpus-level stats (N, avgdl)
  arrive as one broadcast 1-row aggregate; the per-term IDF table is
  |query| rows, broadcast.
- ``rrf_fuse``: full-outer join of two ranked lists (each already
  top-k'd, so both sides are small) — at 100 TB the inputs are the
  k-row outputs of bm25/ANN retrieval, not corpus-sized.

Determinism contract: scores are rounded before any ordering and ties
break on the id column, so ranks replay identically on any engine —
the DuckDB twins hash-match end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from market_insights_app_spark.functions import text as TX

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 score of every document containing >=1 query term.

    score(d) = sum over query terms t of
        idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    with the Lucene-style non-negative idf
        ln(1 + (N - df + 0.5) / (df + 0.5)).
    """
    terms = [t.lower() for t in query_terms]
    toks = docs.select(
        F.col(id_col),
        F.explode(TX.norm_tokens(text_col)).alias("term"),
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    # corpus stats: one row, broadcast everywhere it's needed
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    hits = toks.filter(F.col("term").isin(terms))
    tf = hits.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
    )
    scored = (
        tf.join(dl, id_col)
        .join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(F.sum("contrib"), 6).alias("bm25")
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k BM25 retrieval for a free-text query (whitespace-tokenized,
    lowercased). Deterministic: rounded score desc, id asc."""
    terms = [t for t in query.lower().split() if t]
    return (
        bm25_scores(docs, terms, id_col=id_col, text_col=text_col)
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )


def rank_by(df: DataFrame, score_col: str, id_col: str) -> DataFrame:
    """Dense 1-based rank: score desc, id asc tiebreak. Input is a
    top-k result (small), so the single-partition window is bounded."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return df.withColumn("rank", F.row_number().over(w))


def rrf_fuse(
    lexical: DataFrame,
    semantic: DataFrame,
    lex_score: str = "bm25",
    sem_score: str = "cosine",
    id_col: str = "doc_id",
    sem_id_col: str = "vec_id",
    k_rrf: int = 60,
    k: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion of a lexical and a semantic top-k list:
    rrf(d) = 1/(k_rrf + rank_lex(d)) + 1/(k_rrf + rank_sem(d)), with a
    missing-side contribution of 0 (full-outer semantics)."""
    lex = rank_by(lexical, lex_score, id_col).select(
        F.col(id_col).alias("id"), F.col("rank").alias("r_lex")
    )
    sem = rank_by(semantic, sem_score, sem_id_col).select(
        F.col(sem_id_col).alias("id"), F.col("rank").alias("r_sem")
    )
    fused = lex.join(sem, "id", "outer").select(
        F.col("id").alias(id_col),
        "r_lex",
        "r_sem",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(k_rrf) + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(k_rrf) + F.col("r_sem")), F.lit(0.0)
            ),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), F.col(id_col).asc()).limit(k)
