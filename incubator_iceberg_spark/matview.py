"""Incremental materialized aggregate maintenance (changelog-driven IVM).

The reference exposes the building blocks — incremental appends (S3) and
the row-level changelog — but leaves materialized-view maintenance to the
engine above it.  This module composes them Spark-first into exact
incremental view maintenance for COUNT/SUM aggregates (the self-
maintainable class: every changelog delta folds in with addition —
MIN/MAX are deliberately out, a delete of the current extremum is not
incrementally recoverable).

Contract:
- the MV holds (group_cols, n_rows, sum_<c>...) with sums over
  INT64-valued columns (pre-scale floats to cents/micros first — exact
  arithmetic is what makes refresh == full-rebuild bit-for-bit);
- group columns must be non-null (the MERGE matches with plain
  equality, the SQL GROUP BY convention for dimension keys), and sum
  columns must be non-null (SQL SUM's null-skipping is not
  incrementally foldable — pre-coalesce nullable measures);
- refresh reads only the changelog of (last-refreshed, current] —
  inserts fold in with +, deletes with −; groups reaching n_rows == 0
  are deleted; unseen groups insert.  Work is O(changed rows), never
  O(table);
- refresh is one MERGE, so it inherits snapshot isolation + commit
  retries, and a replayed refresh is idempotent via the stored
  ``mv.base-snapshot-id`` watermark (same exactly-once shape as the
  streaming sink).

Scale: the changelog shuffle is bounded by each snapshot's touched
files; the delta aggregate is map-side combined on the group key; the
MERGE joins delta (small) against the MV (grouped cardinality, not raw
rows) with the dynamic file filter pruning untouched MV files.
"""

from __future__ import annotations

from typing import Optional

from incubator_iceberg_spark.schema import Schema

PROP_BASE_TABLE = "mv.base-table"
PROP_BASE_SNAPSHOT = "mv.base-snapshot-id"
PROP_GROUP_COLS = "mv.group-cols"
PROP_SUM_COLS = "mv.sum-cols"


def _agg_df(df, group_cols, sum_cols):
    from pyspark.sql import functions as F

    return (df.groupBy(*group_cols)
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 *[F.sum(F.col(c).cast("long")).alias(f"sum_{c}")
                   for c in sum_cols]))


def create_agg_mv(catalog, mv_name: str, base_table, group_cols: list,
                  sum_cols: list, spark=None):
    """Create and fully build an aggregate MV over ``base_table``,
    pinned to its current snapshot."""
    spark = spark or base_table.spark
    base_df = base_table.to_df(spark)
    for c in sum_cols:
        t = dict(base_df.select(*sum_cols).dtypes)[c]
        if t not in ("int", "bigint", "smallint", "tinyint"):
            raise ValueError(
                f"sum column {c!r} must be integer-typed (got {t}); "
                f"pre-scale floats to cents/micros for exact maintenance")
    df = _agg_df(base_df, group_cols, sum_cols)
    mv = catalog.create_table(
        mv_name, Schema.from_spark(df.schema),
        properties={
            PROP_BASE_TABLE: base_table.name,
            PROP_BASE_SNAPSHOT: str(base_table.metadata.current_snapshot_id),
            PROP_GROUP_COLS: ",".join(group_cols),
            PROP_SUM_COLS: ",".join(sum_cols),
        })
    if df.limit(1).count():
        mv.append(df)
    return mv


def refresh_agg_mv(mv, base_table, spark=None) -> dict:
    """Fold the base table's changelog since the stored watermark into
    the MV with one MERGE; advance the watermark."""
    from pyspark.sql import functions as F

    from incubator_iceberg_spark import row_ops
    from incubator_iceberg_spark.changelog import changelog

    spark = spark or mv.spark
    last = int(mv.metadata.properties[PROP_BASE_SNAPSHOT])
    cur = base_table.metadata.current_snapshot_id
    if cur == last:
        return {"refreshed": False, "groups_changed": 0}
    group_cols = mv.metadata.properties[PROP_GROUP_COLS].split(",")
    sum_cols = [c for c in mv.metadata.properties[PROP_SUM_COLS].split(",")
                if c]

    ch = changelog(base_table, spark, from_snapshot_id=last)
    sign = F.when(F.col("_change_type") == "insert",
                  F.lit(1).cast("long")).otherwise(F.lit(-1).cast("long"))
    delta = (ch.groupBy(*group_cols)
             .agg(F.sum(sign).alias("d_n"),
                  *[F.sum(sign * F.col(c).cast("long")).alias(f"d_sum_{c}")
                    for c in sum_cols]))
    # a group whose inserts and deletes cancel exactly still emits a
    # zero delta row — drop it before the MERGE
    keep = F.col("d_n") != 0
    for c in sum_cols:
        keep = keep | (F.coalesce(F.col(f"d_sum_{c}"), F.lit(0)) != 0)
    # persisted: the empty-delta check would otherwise recompute the
    # whole changelog diff again inside the MERGE
    delta = delta.filter(keep).persist()
    n_groups = delta.count()
    if n_groups == 0:
        delta.unpersist()
        mv.update_properties({PROP_BASE_SNAPSHOT: str(cur)})
        return {"refreshed": True, "groups_changed": 0}

    updates = {"n_rows": "t.n_rows + s.d_n"}
    updates.update({f"sum_{c}": f"t.sum_{c} + s.d_sum_{c}"
                    for c in sum_cols})
    inserts = {c: f"s.{c}" for c in group_cols}
    inserts["n_rows"] = "s.d_n"
    inserts.update({f"sum_{c}": f"s.d_sum_{c}" for c in sum_cols})
    row_ops.merge_into(
        mv, delta, on=group_cols,
        when_matched=[
            row_ops.WhenMatched(condition="t.n_rows + s.d_n = 0",
                                delete=True),
            row_ops.WhenMatched(update=updates),
        ],
        when_not_matched=[row_ops.WhenNotMatched(insert=inserts)],
        spark=spark)
    delta.unpersist()
    mv.update_properties({PROP_BASE_SNAPSHOT: str(cur)})
    return {"refreshed": True, "groups_changed": n_groups}
