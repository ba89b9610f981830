"""Plan gates for the bucketed storage layout (sources/bucketed.py):
the whole point of paying the write-time shuffle is that subsequent
joins/aggregations on the bucket key plan WITHOUT an Exchange — assert
exactly that, plus result correctness vs the unbucketed frames.

The join gates disable broadcast (otherwise the planner happily
broadcasts these small test tables, which also avoids a shuffle but
proves nothing about bucketing): with broadcast off, the only way the
SortMergeJoin can appear WITHOUT a hash-partition Exchange on either
side is the catalog-reported bucket layout."""

from __future__ import annotations

import io
from contextlib import contextmanager, redirect_stdout

import pytest
from pyspark.sql import functions as F

from market_insights_app_spark.sources.bucketed import (
    drop_bucketed,
    read_bucketed,
    write_bucketed,
)
from market_insights_app_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@contextmanager
def no_broadcast(spark):
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.fixture(scope="module")
def bucketed_events(spark):
    ev = load_table(spark, SF_ORACLE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    write_bucketed(
        ev, "t_bucket_events", ["user_id"], n_buckets=8,
        sort_cols=["user_id", "event_id"],
    )
    yield read_bucketed(spark, "t_bucket_events")
    drop_bucketed(spark, "t_bucket_events")


def test_bucketed_self_join_has_no_exchange(spark, bucketed_events):
    l = bucketed_events.alias("l")
    r = bucketed_events.alias("r")
    joined = l.join(r, "user_id").select(
        "user_id", F.col("l.event_id"), F.col("r.value")
    )
    with no_broadcast(spark):
        tree = plan_of(joined).split("\n\n")[0]
    assert "Exchange" not in tree, tree
    assert "SortMergeJoin" in tree or "ShuffledHashJoin" in tree, tree


def test_bucketed_groupby_has_no_exchange(spark, bucketed_events):
    agg = bucketed_events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
    )
    tree = plan_of(agg).split("\n\n")[0]
    assert "Exchange" not in tree, tree
    assert tree.count("HashAggregate") == 2  # partial + final, no shuffle


def test_bucketed_join_matches_unbucketed_results(spark, bucketed_events):
    ev = load_table(spark, SF_ORACLE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    expect = sorted(
        tuple(r)
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = sorted(
        tuple(r)
        for r in bucketed_events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got == expect


def test_bucketed_two_table_join_no_exchange(spark, bucketed_events):
    """Two DIFFERENT tables bucketed identically on the join key:
    the fact-to-fact co-located join pattern."""
    agg = (
        load_table(spark, SF_ORACLE, "events")
        .groupBy("user_id")
        .agg(F.avg("value").alias("avg_v"))
    )
    write_bucketed(agg, "t_bucket_user_avg", ["user_id"], n_buckets=8)
    try:
        dim = read_bucketed(spark, "t_bucket_user_avg")
        joined = bucketed_events.join(dim, "user_id").select(
            "user_id", "event_id", "avg_v"
        )
        with no_broadcast(spark):
            tree = plan_of(joined).split("\n\n")[0]
        assert "Exchange" not in tree, tree
    finally:
        drop_bucketed(spark, "t_bucket_user_avg")
