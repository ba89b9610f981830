"""Data-quality expectation checks — the Deequ/Great-Expectations-style
gate a production pipeline runs before publishing a table.  The
reference has no analogue (its SQLite schema enforces only UNIQUE and
FK constraints at write time, db.py:44,106); at 100 TB validation must
instead be a read-side analytical pass with an auditable report.

Design: every ROW-LEVEL rule (not-null, range, accepted values)
compiles to one ``sum(violation-indicator)`` expression, and ALL of
them evaluate in a single map-side-combining aggregate over one scan —
adding a rule costs one expression, never a pass.  Set-level rules
need their own shapes: uniqueness is one groupBy on the key (count of
excess rows), referential integrity is one left-anti join against the
parent key set.  The report unions these tiny (one row per rule)
frames; nothing row-sized ever reaches the driver.

Output: ``(rule, violations, status)`` with status pass|fail —
the sign-off artifact a scheduler gates on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report(pairs: list[tuple[str, Column]], df: DataFrame) -> DataFrame:
    """One aggregate pass -> long-format (rule, violations) rows."""
    agg = df.agg(
        *[F.coalesce(F.sum(c.cast("long")), F.lit(0)).alias(f"v{i}") for i, (_, c) in enumerate(pairs)]
    )
    structs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"), F.col(f"v{i}").alias("violations")
            )
            for i, (name, _) in enumerate(pairs)
        ]
    )
    return agg.select(F.explode(structs).alias("r")).select(
        "r.rule", "r.violations"
    )


def validate_table(
    df: DataFrame,
    not_null: list[str] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    accepted: dict[str, list[str]] | None = None,
    unique: list[str] | None = None,
    foreign_key: tuple[str, DataFrame, str] | None = None,
) -> DataFrame:
    """Evaluate an expectation suite; returns one row per rule:
    ``(rule, violations, status)``.

    - ``not_null=[c…]`` — NULL count per column;
    - ``ranges={c: (lo, hi)}`` — rows outside [lo, hi] (NULLs are not
      range violations — they are the not-null rule's job);
    - ``accepted={c: [v…]}`` — rows whose value is neither NULL nor in
      the accepted set;
    - ``unique=[c…]`` — rows in excess of one per distinct key;
    - ``foreign_key=(child_col, parent_df, parent_col)`` — child rows
      (with non-NULL key) that match no parent row.
    """
    pairs: list[tuple[str, Column]] = []
    for c in not_null or []:
        pairs.append((f"not_null({c})", F.col(c).isNull()))
    for c, (lo, hi) in (ranges or {}).items():
        pairs.append(
            (
                f"in_range({c},{lo},{hi})",
                F.col(c).isNotNull()
                & ((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))),
            )
        )
    for c, vals in (accepted or {}).items():
        pairs.append(
            (
                f"accepted_values({c})",
                F.col(c).isNotNull() & ~F.col(c).isin(vals),
            )
        )
    parts: list[DataFrame] = []
    if pairs:
        parts.append(_report(pairs, df))
    if unique:
        excess = (
            df.groupBy(*[F.col(c) for c in unique])
            .agg(F.count(F.lit(1)).alias("__n"))
            .agg(
                F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("violations")
            )
            .select(
                F.lit(f"unique({','.join(unique)})").alias("rule"), "violations"
            )
        )
        parts.append(excess)
    if foreign_key is not None:
        child_col, parent, parent_col = foreign_key
        orphans = (
            df.select(F.col(child_col).alias("__k"))
            .filter(F.col("__k").isNotNull())
            .join(
                parent.select(F.col(parent_col).alias("__k")).distinct(),
                on="__k",
                how="left_anti",
            )
            .agg(F.count(F.lit(1)).alias("violations"))
            .select(
                F.lit(f"foreign_key({child_col})").alias("rule"), "violations"
            )
        )
        parts.append(orphans)
    if not parts:
        raise ValueError("validate_table: no rules given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule",
        "violations",
        F.when(F.col("violations") == 0, F.lit("pass"))
        .otherwise(F.lit("fail"))
        .alias("status"),
    )
