"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``market_insights_app_spark`` (see
SURVEY.md §2 for the operator inventory each query restates).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the GET /prices
    restatement (filter + range + desc sort with tiebreaker + limit,
    reference db.py:271-302)."""
    from market_insights_app_spark.plans.core import q_prices_filter_range_limit
    from market_insights_app_spark.session import tune_for_oracle

    tune_for_oracle(spark)
    return q_prices_filter_range_limit(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from market_insights_app_spark.plans.registry import QUERIES
    from market_insights_app_spark.session import tune_for_oracle

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_for_oracle(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; keys without an entry get the driver's weaker
    rows-only check (approximate/LSH operators — see plans/registry)."""
    from market_insights_app_spark.plans.registry import ORACLES

    return dict(ORACLES)
