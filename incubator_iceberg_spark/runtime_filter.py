"""Runtime filtering: dimension-driven file pruning for engine-table joins.

The classic 100 TB star-join problem: ``fact JOIN dim ON fact.k = dim.k``
with a selective predicate on ``dim``.  Catalyst pushes the *dim* filter
fine, but nothing tells the *fact* scan which keys survive — so the scan
reads every file and the join throws 99% of the rows away.  Spark solves
this for its own tables with Dynamic Partition Pruning; Iceberg's Spark
integration solves it at the FILE level by re-filtering the scan with the
join keys at runtime (the later `SupportsRuntimeFiltering` evolution of
the incubator's SparkBatchScan.java:66 pushed-filter plumbing; see also
spark3/src/main/java/org/apache/iceberg/spark/source/SparkBatchScan.java:89
stats-based planning this reuses).

This module is the engine-side analog: evaluate the dim side FIRST (it is
small by star-schema assumption), derive a planning predicate from its
distinct join keys, and hand that predicate to the normal scan planner —
partition pruning, metrics (min/max) pruning, and manifest pruning all
apply, so files whose key range cannot intersect the dim keys are never
read.  The subsequent broadcast join enforces exact semantics; the
runtime filter is purely an I/O reducer and can never change results.

Scale shape: ONE small job on the dim side (distinct + conditional
collect, capped), then the usual planned scan + broadcast hash join — no
shuffle of the fact side at all.  When the dim has more distinct keys
than ``max_in_keys`` the predicate degrades to the [min, max] range —
still prunes sorted/clustered fact layouts — and the join stays correct
regardless.
"""

from __future__ import annotations

from . import expressions as E


def runtime_key_filter(dim_df, dim_col: str, fact_col: str,
                       max_in_keys: int = 1000):
    """Build a planning predicate on ``fact_col`` from the dim side's
    distinct keys: an IN set when ≤ ``max_in_keys`` survive, else the
    [min, max] range.  Returns (expression, n_distinct_or_None).
    AlwaysFalse when the dim side is empty (planner prunes everything)."""
    from pyspark.sql import functions as F

    agg = (dim_df.select(F.col(dim_col).alias("__k"))
                 .filter(F.col("__k").isNotNull())
                 .agg(F.min("__k").alias("mn"), F.max("__k").alias("mx"),
                      F.count_distinct(F.col("__k")).alias("nd"))
                 .collect()[0])
    if agg["nd"] == 0:
        return E.always_false(), 0
    if agg["nd"] <= max_in_keys:
        keys = [r[0] for r in
                dim_df.select(dim_col).filter(F.col(dim_col).isNotNull())
                      .distinct().collect()]
        return E.in_(fact_col, keys), agg["nd"]
    return E.and_(E.gt_eq(fact_col, agg["mn"]),
                  E.lt_eq(fact_col, agg["mx"])), agg["nd"]


def runtime_filtered_join(table, dim_df, fact_col: str, dim_col: str,
                          spark=None, how: str = "inner",
                          max_in_keys: int = 1000, select=None):
    """Join an engine ``table`` (fact side) with a small ``dim_df`` on
    ``fact_col = dim_col``, planning the fact scan with a runtime
    predicate derived from the dim keys so non-matching files are pruned
    before any bytes are read.  The dim side is broadcast — the fact side
    never shuffles.  Exactly equivalent to the plain join.

    Only join types where dropping non-matching FACT rows is sound are
    allowed (inner / left_semi): a left-outer fact side must keep its
    unmatched rows, which file pruning would silently delete."""
    from pyspark.sql import functions as F

    if how not in ("inner", "left_semi", "leftsemi", "semi"):
        raise ValueError(
            f"runtime_filtered_join prunes fact files by dim keys, which is "
            f"only sound for inner/semi joins; got how={how!r}")
    flt, _nd = runtime_key_filter(dim_df, dim_col, fact_col, max_in_keys)
    fact = table.to_df(spark, filter=flt, select=select)
    return fact.join(F.broadcast(dim_df),
                     on=fact[fact_col] == dim_df[dim_col], how=how)
