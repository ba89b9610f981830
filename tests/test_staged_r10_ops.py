"""r10-staged query/oracle pairs (plans/textml.py STAGED_ORACLES):
hard_negatives, kfold_column, temperature_mixture — direct
Spark<->DuckDB parity at the oracle SF, the local twin of the driver
gate each will face on registration.  The unicode and degenerate
sweeps pick the staged names up automatically
(test_unicode_parity.py / test_degenerate_inputs.py)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.test_oracle_parity import canon

STAGED = ["hard_negatives", "kfold_column", "temperature_mixture"]


@pytest.mark.parametrize("name", STAGED)
def test_staged_parity(name, spark, duck):
    from market_insights_app_spark.plans import textml

    fn = getattr(textml, f"staged_q_{name}")
    sdf = fn(spark, SF_ORACLE)
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(textml.STAGED_ORACLES[name])
    drows = rel.fetchall()
    dcols = [d[0] for d in rel.description]
    assert sorted(sdf.columns) == sorted(dcols), name
    assert len(srows) == len(drows) > 0, name
    sc, dc = canon(srows, sdf.columns), canon(drows, dcols)
    mism = [i for i, (a, b) in enumerate(zip(sc, dc)) if a != b][:3]
    assert sc == dc, f"{name}: " + "; ".join(
        f"spark={sc[i]} duck={dc[i]}" for i in mism
    )


def test_staged_hard_negatives_shape(spark):
    """Ranks are 1..k dense per anchor and labels always differ from
    the anchor's (anchor label = anchor_id mod 7 by construction)."""
    from market_insights_app_spark.plans.textml import staged_q_hard_negatives

    rows = staged_q_hard_negatives(spark, SF_ORACLE).collect()
    assert rows
    by_anchor: dict = {}
    for r in rows:
        by_anchor.setdefault(r.anchor_id, []).append(r)
        assert r.label != r.anchor_id % 7
        assert r.vec_id != r.anchor_id
    for aid, grp in by_anchor.items():
        assert sorted(x.rank for x in grp) == list(range(1, len(grp) + 1))
        assert len(grp) <= 5


def test_staged_kfold_uniform_and_group_pure(spark):
    """fold_by_source is constant within a source (the leakage-safe
    law) and fold_by_doc spreads across all 5 folds."""
    from market_insights_app_spark.plans.textml import staged_q_kfold_column

    rows = staged_q_kfold_column(spark, SF_ORACLE).collect()
    per_source: dict = {}
    folds = set()
    for r in rows:
        per_source.setdefault(r.source, set()).add(r.fold_by_source)
        folds.add(r.fold_by_doc)
    assert all(len(v) == 1 for v in per_source.values())
    assert folds == set(range(5))


def test_staged_temperature_mixture_shares(spark):
    """alpha=0.5 up-weights small sources RELATIVE to their size: the
    surviving share of the smallest source must exceed the share of
    the largest (the temperature contract), and no group is empty."""
    from pyspark.sql import functions as F

    from market_insights_app_spark.plans.textml import (
        staged_q_temperature_mixture,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    before = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    after: dict = {}
    for r in staged_q_temperature_mixture(spark, SF_ORACLE).collect():
        after[r.source] = after.get(r.source, 0) + 1
    assert set(after) == set(before)
    small = min(before, key=before.get)
    large = max(before, key=before.get)
    if before[small] < before[large]:
        assert after[small] / before[small] > after[large] / before[large]
