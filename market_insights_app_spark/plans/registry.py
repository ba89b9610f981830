"""Query registry — the single source of truth consumed by
``__spark_entry__.py`` (driver contract) and the parity tests.

``QUERIES[name]`` : (spark, sf_dir) -> DataFrame  (Spark plan)
``ORACLES[name]``  : DuckDB ANSI-SQL twin (absent ⇒ rows-only check —
                     LSH-family / approximate operators, verified in
                     tests/ against Python references instead).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from market_insights_app_spark.plans import core, textml
from market_insights_app_spark.plans.core_oracles import CORE_ORACLES
from market_insights_app_spark.plans.textml import TEXTML_ORACLES

QueryFn = Callable[[SparkSession, str], DataFrame]


def _collect(module) -> dict[str, QueryFn]:
    return {
        name[2:]: fn
        for name, fn in vars(module).items()
        if name.startswith("q_") and callable(fn)
    }


QUERIES: dict[str, QueryFn] = {**_collect(core), **_collect(textml)}

ORACLES: dict[str, str] = {**CORE_ORACLES, **TEXTML_ORACLES}

# every oracle key must have a query
_missing = set(ORACLES) - set(QUERIES)
assert not _missing, f"oracle without query: {_missing}"
