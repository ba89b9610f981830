"""Distributed k-means (Lloyd's) over an embedding column — the
centroid trainer behind IVF-style ANN (operators/similarity.py) and a
corpus-organization primitive (topic buckets, dedup pre-clustering).

Classic scalable shape: centroids live on the driver (k × dim doubles
— bounded, like the 16-row IVF centroid collect the round-2 audit
accepted), the assignment step is a pure scan-stage expression (argmin
over k literal arrays, no shuffle, no UDF), and the update step is ONE
groupBy producing k rows. Per iteration: one scan + one bounded
exchange — at 100 TB each Lloyd iteration is a single pass, exactly
how MLlib's KMeans schedules it, but expressed in DataFrame ops with a
deterministic contract:

- init = the k vectors with the smallest ids (no RNG);
- distances computed in doubles in index order (bit-identical across
  engines), rounded to 9 dp before the argmin so near-ties resolve the
  same everywhere; ties break toward the lower cluster id;
- updated centroids rounded to 6 dp so the engine-specific summation
  order inside avg() cannot leak into the next iteration.

That contract is what lets a DuckDB oracle replay the FULL two-
iteration pipeline hash-exactly (plans/textml.py ``kmeans_assign``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _dist2(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a literal centroid — index-ordered
    summation (deterministic, engine-portable)."""
    arr = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, arr, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, dist2) — nearest centroid per vector. Argmin via
    array_min over (rounded dist2, cluster) structs: lexicographic min
    = smallest distance, ties to the lower cluster id."""
    vec = _as_double(F.col(vec_col))
    pairs = F.array(
        *[
            F.struct(
                F.round(_dist2(vec, c), 9).alias("d"),
                F.lit(i).alias("c"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    best = F.array_min(pairs)
    return df.select(
        F.col(id_col),
        best["c"].alias("cluster"),
        best["d"].alias("dist2"),
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd's algorithm, ``iters`` iterations, deterministic init =
    the k vectors with the smallest ids. Returns the centroid list.

    Empty clusters keep their previous centroid (cannot occur on
    iteration 1: every init vector is at distance 0 from itself)."""
    init_rows = (
        df.orderBy(F.col(id_col).asc()).limit(k).select(vec_col).collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"kmeans_fit: need >= {k} vectors, got {len(init_rows)}")
    cents: list[list[float]] = [[float(x) for x in r[0]] for r in init_rows]
    dim = len(cents[0])
    for _ in range(iters):
        # single pass: cluster label + the vector in one scan-stage
        # select (no join back), then one k-row groupBy
        vec = _as_double(F.col(vec_col))
        pairs = F.array(
            *[
                F.struct(F.round(_dist2(vec, c), 9).alias("d"), F.lit(i).alias("c"))
                for i, c in enumerate(cents)
            ]
        )
        assigned = df.select(
            F.array_min(pairs)["c"].alias("cluster"), vec.alias("__v")
        )
        means = assigned.groupBy("cluster").agg(
            *[F.round(F.avg(F.col("__v")[i]), 6).alias(f"c{i}") for i in range(dim)]
        )
        got = {
            r["cluster"]: [r[f"c{i}"] for i in range(dim)]
            for r in means.collect()
        }
        cents = [got.get(i, cents[i]) for i in range(k)]
    return cents


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit + final assignment: (id, cluster, dist2 rounded to 6dp)."""
    cents = kmeans_fit(df, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    out = assign_clusters(df, cents, id_col, vec_col)
    return out.select(
        id_col, "cluster", F.round("dist2", 6).alias("dist2")
    )
