"""Warm-path integration: streaming ingest → ACID table → incremental
view maintenance, composed from the repo's own pieces.

The shape a production metrics path runs continuously:

1. micro-batches land in a :class:`~market_insights_app_spark.storage.
   txnlog.TxnTable` through ``streaming_merge_sink`` — each batch is
   one atomic MERGE, restarts are exactly-once via (app, batch_id)
   transaction markers;
2. a materialized SUM/COUNT aggregate is maintained INCREMENTALLY:
   for each new table version, the CDC feed comes from
   ``snapshot_diff`` over the commit log's own time travel (no change
   stream needed — the log IS the change stream), folds to per-group
   deltas (``agg_delta``) and merges into the materialized view
   (``incremental_agg_update``).  The 100 TB base is never rescanned;
   only commit-sized deltas move.

The maintenance invariant — materialized view == full recompute from
the latest snapshot, at EVERY version — is what the integration test
pins, including across a schema-evolving commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from market_insights_app_spark.operators.reconcile import (
    agg_delta,
    incremental_agg_update,
    snapshot_diff,
)
from market_insights_app_spark.storage.txnlog import TxnTable


def maintain_agg_over_versions(
    table: TxnTable,
    group_col: str,
    value_col: str,
    from_version: int,
    to_version: int,
    base_agg: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Roll the materialized (group, sum, cnt) aggregate forward from
    ``from_version`` to ``to_version`` one commit at a time, using the
    commit log's time travel as the CDC source.  Returns the updated
    aggregate (columns: group_col, sum_<value_col>, cnt).

    Per step the work is: diff of two snapshots keyed on ``key_cols``
    (at scale the diff join prunes to directories the commit touched —
    the log records them), a touched-group-sized delta, and a
    delta-sized merge into the view.  Nothing rescans the base."""
    agg = base_agg
    for v in range(from_version + 1, to_version + 1):
        old = table.read(version=v - 1)
        new = table.read(version=v)
        shared = [c for c in old.columns if c in new.columns]
        diff = snapshot_diff(
            old.select(*shared),
            new.select(*shared),
            key_cols=key_cols,
            compare_cols=[c for c in (group_col, value_col) if c in shared],
        )
        delta = agg_delta(diff, group_col=group_col, value_col=value_col)
        agg = incremental_agg_update(
            agg, delta, group_col=group_col,
            sum_col=f"sum_{value_col}", cnt_col="cnt",
        )
    return agg
