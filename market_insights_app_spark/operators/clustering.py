"""Distributed k-means (Lloyd's) over an embedding column — the
centroid trainer behind IVF-style ANN (operators/similarity.py) and a
corpus-organization primitive (topic buckets, SemDeDup pre-clustering).

Classic scalable shape: centroids live on the driver (k × dim doubles
— bounded, like the 16-row IVF centroid collect the round-2 audit
accepted), the assignment step is a shuffle-free scan-stage map, and
the update step is ONE groupBy producing k rows. Per iteration: one
scan + one bounded exchange — at 100 TB each Lloyd iteration is a
single pass, exactly how MLlib's KMeans schedules it, but expressed in
DataFrame ops with a deterministic contract:

- init = the k vectors with the smallest ids (no RNG);
- distances computed in doubles in index order (bit-identical across
  engines), rounded to 9 dp before the argmin so near-ties resolve the
  same everywhere; ties break toward the lower cluster id;
- updated centroids rounded to 6 dp so the engine-specific summation
  order inside avg() cannot leak into the next iteration.

That contract is what lets a DuckDB oracle replay the FULL two-
iteration pipeline hash-exactly (plans/textml.py ``kmeans_assign``).

Two assignment paths, switched on k (``LARGE_K`` boundary):

- k ≤ LARGE_K — ONE JVM expression: the whole centroid set is a single
  nested-array literal and the argmin is ``array_min(transform(C, (c,
  i) -> struct(d2(v, c), i)))``.  Expression-tree size is O(1) in k
  (one Literal node + one shared lambda), so planning/codegen cost no
  longer grows with k — this replaced a k-separate-subtree design that
  spent ~10 s in codegen at k=8/dim=64 and would have died at the
  planner near k≈10³.
- k > LARGE_K — web-scale corpora need k ≈ √n (10⁴–10⁵); even a
  single literal of 10⁵×dim doubles bloats every serialized task.  The
  centroid matrix instead ships as an ``SparkContext.broadcast`` numpy
  array and assignment is an Arrow-batched ``mapInPandas`` argmin
  (||x||² − 2xCᵀ + ||c||² in float64) — still shuffle-free, O(1) plan
  size, one broadcast per fleet.  Distances are rounded to the same
  9 dp and ties break to the lower cluster id, but numpy's pairwise
  summation can differ from the sequential fold in the last ulp, so
  near-tie assignments are deterministic only per-path; the oracle-
  gated queries all use the exact small-k path.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Above this k, assignment switches from the literal-expression path to
# the broadcast-numpy mapInPandas path (see module docstring).
LARGE_K = 128

# Centroid-tile width for the broadcast-numpy argmin.  The naive
# kernel materializes the full (batch, k) score matrix — at
# batch=10⁴/k=10⁴ that is an 800 MB array per worker per batch, and 32
# workers churning 25 GB/wave thrash every cache level: the r13
# 1M×64/k=10⁴ profile measured the full-matrix assignment at 121.7 s
# vs 7.1 s with 512-wide centroid tiles and a running (best, bestv)
# min (T=2048 was already 25.0 s — the win is cache residency, not
# FLOPs, which are identical).  Ties still resolve to the LOWEST
# cluster id: within a tile argmin takes the first minimum, and the
# cross-tile update is a strict <, so an exact fp tie keeps the
# earlier (lower-id) tile's winner.
ASSIGN_TILE = 512


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _d2(vec: Column, cent: Column) -> Column:
    """Squared L2 distance between two array<double> columns —
    index-ordered fold (deterministic, engine-portable)."""
    return F.aggregate(
        F.zip_with(vec, cent, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cents_literal(centroids: list[list[float]]) -> Column:
    """The whole centroid set as ONE array<array<double>> literal,
    built from a single SQL string.  ``F.lit(nested_list)`` (and a
    fortiori per-element ``F.lit``) walks the structure element by
    element over py4j — ~2 s of pure driver overhead at k=8/dim=64,
    growing with k·dim; one parsed string is O(1) py4j calls.  The
    ``D`` suffix pins every element to DOUBLE (bare decimals parse as
    DECIMAL in Spark SQL); ``repr`` round-trips the exact bits."""
    body = ",".join(
        "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")" for c in centroids
    )
    return F.expr(f"array({body})")


def _best_struct(vec: Column, centroids: list[list[float]]) -> Column:
    """struct(d, c) of the nearest centroid: argmin via array_min over
    (rounded dist2, cluster) structs — lexicographic min = smallest
    distance, ties to the lower cluster id.  The centroid set is ONE
    nested-array literal, so the expression tree is O(1) in k."""
    cents = _cents_literal(centroids)
    pairs = F.transform(
        cents,
        lambda c, i: F.struct(
            F.round(_d2(vec, c), 9).alias("d"), i.cast("int").alias("c")
        ),
    )
    return F.array_min(pairs)


def _tile_best(np, X, C, c_norms, tile: int = ASSIGN_TILE):
    """(best cluster id, best −2x·c+‖c‖² score) per row of ``X``,
    computed over ``tile``-wide centroid slices with a running min —
    never materializing the full (batch, k) score matrix (see
    ASSIGN_TILE for the measured 17× cache effect).  Scores are
    UNROUNDED: np.round over the full matrix costs ~100 ns/element,
    dwarfing the matmul, and rounding only matters for exact fp
    near-ties, which this beyond-oracle path does not promise across
    engines anyway (callers round the one output vector they emit).
    Ties resolve to the lowest cluster id (first-min argmin within a
    tile, strict < across tiles)."""
    m = len(X)
    best = np.zeros(m, dtype=np.int64)
    bestv = np.full(m, np.inf)
    rows = np.arange(m)
    for s in range(0, len(C), tile):
        e = min(s + tile, len(C))
        S = X @ C[s:e].T
        S *= -2.0
        S += c_norms[None, s:e]
        loc = S.argmin(axis=1)
        locv = S[rows, loc]
        upd = locv < bestv
        best[upd] = loc[upd] + s
        bestv[upd] = locv[upd]
    return best, bestv


def _assign_pandas(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
    keep_vec: bool = False,
) -> DataFrame:
    """Broadcast-centroid assignment for large k: the k×dim matrix
    rides one SparkContext.broadcast, argmin runs vectorized in numpy
    per Arrow batch.  Shuffle-free; plan size independent of k.
    ``keep_vec`` carries the (double-cast) vector through, so callers
    that need (cluster, vector) pairs — the Lloyd mean update, the
    SemDeDup self-join — don't pay an n×n join back to the source."""
    import numpy as np
    import pandas as pd

    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(np.asarray(centroids, dtype=np.float64))
    schema = f"{id_col} long, cluster int, dist2 double"
    if keep_vec:
        schema += f", {vec_col} array<double>"

    def part(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        C = bc.value                      # (k, dim)
        c_norms = (C * C).sum(axis=1)     # (k,)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # stack of per-row numpy arrays (Arrow hands back ndarray
            # cells) — no .tolist() detour through boxed Python floats
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            best, bestv = _tile_best(np, X, C, c_norms)
            d2 = np.maximum((X * X).sum(axis=1) + bestv, 0.0)
            out = {
                id_col: pdf[id_col].astype("int64"),
                "cluster": best.astype("int32"),
                "dist2": np.round(d2, 9),
            }
            if keep_vec:
                out[vec_col] = pdf[vec_col]
            yield pd.DataFrame(out)

    src = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias(vec_col))
    return src.mapInPandas(part, schema=schema)


def _partial_means_pandas(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
) -> DataFrame:
    """One Lloyd mean-update pass for large k: assignment AND per-
    partition (cluster, count, sum-vector) accumulation fused into a
    single mapInPandas — no per-row output ever leaves the scan stage,
    so the only exchange is ≤ partitions × k tiny partial rows (vs a
    full n-row shuffle + dim separate JVM aggregates).  The caller
    finishes the reduction."""
    import numpy as np
    import pandas as pd

    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(np.asarray(centroids, dtype=np.float64))

    def part(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        C = bc.value
        k, dim = C.shape
        c_norms = (C * C).sum(axis=1)
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            best, _ = _tile_best(np, X, C, c_norms)
            # sorted-run reduction: np.add.at's unbuffered scatter is
            # ~100× slower than reduceat over contiguous runs
            order = np.argsort(best, kind="stable")
            bs = best[order]
            starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
            counts_run = np.diff(np.r_[starts, len(bs)])
            labels = bs[starts]
            counts[labels] += counts_run
            sums[labels] += np.add.reduceat(X[order], starts, axis=0)
        hit = np.nonzero(counts)[0]
        if len(hit):
            yield pd.DataFrame(
                {
                    "cluster": hit.astype("int32"),
                    "cnt": counts[hit],
                    "sums": list(sums[hit]),
                }
            )

    src = df.select(_as_double(F.col(vec_col)).alias(vec_col))
    return src.mapInPandas(
        part, schema="cluster int, cnt long, sums array<double>"
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, dist2) — nearest centroid per vector.  Exact
    literal-expression path for k ≤ LARGE_K, broadcast-numpy path
    above (see module docstring for the determinism contract)."""
    if len(centroids) > LARGE_K:
        return _assign_pandas(df, centroids, id_col, vec_col)
    best = _best_struct(_as_double(F.col(vec_col)), centroids)
    return df.select(
        F.col(id_col),
        best["c"].alias("cluster"),
        best["d"].alias("dist2"),
    )


def _reduce_partial_means(partials: DataFrame) -> dict[int, list[float]]:
    """Finish the Lloyd mean update from (cluster, cnt, sums) partials:
    one applyInPandas reduction per cluster (≤ partitions×k tiny rows in
    the exchange), means rounded to 6 dp like the JVM avg() path."""
    import numpy as np
    import pandas as pd

    def reduce_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        total = np.stack(pdf["sums"].to_numpy()).sum(axis=0)
        mean = np.round(total / pdf["cnt"].sum(), 6)
        return pd.DataFrame(
            {"cluster": pdf["cluster"].iloc[:1], "mean": [list(mean)]}
        )

    rows = (
        partials.groupBy("cluster")
        .applyInPandas(reduce_group, schema="cluster int, mean array<double>")
        .collect()
    )
    return {r["cluster"]: [float(x) for x in r["mean"]] for r in rows}


def heuristic_k(n: int, cap: int = 100_000) -> int:
    """k ≈ √n — the SemDeDup scaling rule that keeps expected cluster
    size (and the per-cluster quadratic cosine term) bounded as the
    corpus grows.  Capped so a pathological count cannot explode the
    centroid table."""
    return max(1, min(cap, int(math.isqrt(max(1, n)))))


def kmeans_fit(
    df: DataFrame,
    k: int | None = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd's algorithm, ``iters`` iterations, deterministic init =
    the k vectors with the smallest ids.  ``k=None`` → ``heuristic_k``
    (≈√n).  Returns the centroid list.

    The projected vector frame is persisted for the fit's lifetime —
    init + ``iters`` mean-updates are ``iters``+1 Spark jobs over the
    SAME data, and without the cache each job would rescan the source
    (measured: the rescans, not the math, dominated at sf0.1).

    Empty clusters keep their previous centroid (cannot occur on
    iteration 1: every init vector is at distance 0 from itself)."""
    vecs = df.select(
        F.col(id_col).alias("__id"), _as_double(F.col(vec_col)).alias("__v")
    ).persist()
    try:
        if k is None:
            k = heuristic_k(vecs.count())
        init_rows = vecs.orderBy(F.col("__id").asc()).limit(k).select("__v").collect()
        if not init_rows:
            # empty corpus (an empty filter result is routine at scale)
            # -> no clusters; callers map [] to an empty result frame
            # instead of killing the job
            return []
        if len(init_rows) < k:
            # fewer vectors than clusters (a tiny filtered shard):
            # clamp k to n — each point seeds its own cluster, Lloyd is
            # a no-op fixpoint — rather than aborting the whole job.
            # Requesting k=8 on an 8+-vector corpus is unaffected.
            k = len(init_rows)
        cents: list[list[float]] = [[float(x) for x in r[0]] for r in init_rows]
        dim = len(cents[0])
        for _ in range(iters):
            if k > LARGE_K:
                # fused assign+accumulate pass (see _partial_means_pandas):
                # exchange is partials only, never the n-row corpus
                partials = _partial_means_pandas(vecs, cents, "__v")
                got = _reduce_partial_means(partials)
            else:
                # one pass: label via the O(1)-size argmin expression,
                # then one k-row groupBy.  The per-dimension mean
                # aggregates are ONE parsed SQL string — building dim
                # separate round(avg(...)) Column objects walked py4j
                # element by element (~0.6 s of pure driver overhead
                # per iteration at dim=64, measured r13); the parsed
                # expressions are identical, so the plan and every
                # aggregate value are unchanged.
                assigned = vecs.select(
                    _best_struct(F.col("__v"), cents)["c"].alias("cluster"),
                    "__v",
                )
                mean_sql = "array(" + ",".join(
                    f"round(avg(`__v`[{i}]),6)" for i in range(dim)
                ) + ")"
                means = assigned.groupBy("cluster").agg(
                    F.expr(mean_sql).alias("__m")
                )
                got = {
                    r["cluster"]: list(r["__m"]) for r in means.collect()
                }
            cents = [got.get(i, cents[i]) for i in range(k)]
        return cents
    finally:
        vecs.unpersist()


def kmeans_assign(
    df: DataFrame,
    k: int | None = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit + final assignment: (id, cluster, dist2 rounded to 6dp).
    ``k=None`` → ≈√n (heuristic_k)."""
    cents = kmeans_fit(df, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    if not cents:  # empty corpus -> empty assignment, same schema
        return df.select(
            F.col(id_col),
            F.lit(0).cast("int").alias("cluster"),
            F.lit(0.0).alias("dist2"),
        ).limit(0)
    out = assign_clusters(df, cents, id_col, vec_col)
    return out.select(
        id_col, "cluster", F.round("dist2", 6).alias("dist2")
    )
