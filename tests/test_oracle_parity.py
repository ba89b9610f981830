"""Differential parity: every registered query vs its DuckDB oracle —
a local replica of the driver's CORRECTNESS gate (row count + column
set + order-insensitive stringified-value multiset).
"""

from __future__ import annotations

import math

import pytest

from market_insights_app_spark.plans.registry import ORACLES, QUERIES
from tests.conftest import SF_ORACLE


def canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, stringify
    values (floats via repr of rounded), sort row tuples."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_ORACLE)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    ddf = duck.sql(ORACLES[name])
    drows = ddf.fetchall()
    dcols = [d[0] for d in ddf.description]
    assert sorted(scols) == sorted(dcols), f"{name}: column sets differ"
    assert len(srows) == len(drows), f"{name}: row counts {len(srows)} vs {len(drows)}"
    sc, dc = canon(srows, scols), canon(drows, dcols)
    mism = [i for i, (a, b) in enumerate(zip(sc, dc)) if a != b][:5]
    assert sc == dc, f"{name}: first mismatches at {mism}: " + "; ".join(
        f"spark={sc[i]} duck={dc[i]}" for i in mism
    )
