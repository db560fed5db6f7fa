"""Multi-objective analytics: exact 2-D skyline (Pareto frontier).

The skyline of a set under two maximize-objectives is every row not
strictly dominated by another (dominator ≥ in both dimensions, > in at
least one).  The classic distributed algorithm: a LOCAL skyline per
block first (any partition of the rows — each local skyline is a
superset-preserving filter, since a dominator within a block also
dominates globally), then the global skyline over the few survivors.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _skyline_pass(df, x: str, y: str, part_cols):
    """Keep rows of ``df`` not strictly dominated within each partition
    group (no group: global).  Integer x required (the RANGE frame's
    ``x' > x`` bound is value-based).

    Rule: with m1 = max(y) over rows with x' > x (same group) and
    m2 = max(y) over rows with x' = x:  a row survives iff
    (m1 is NULL or y > m1) and y = m2 — equal points are NOT dominators
    (both survive), a higher-y twin at the same x is."""
    wgt = (Window.partitionBy(*part_cols).orderBy(F.col(x).desc())
           .rangeBetween(Window.unboundedPreceding, -1))
    weq = Window.partitionBy(*(list(part_cols) + [x]))
    return (df.withColumn("__m1", F.max(y).over(wgt))
            .withColumn("__m2", F.max(y).over(weq))
            .filter((F.col("__m1").isNull() | (F.col(y) > F.col("__m1")))
                    & (F.col(y) == F.col("__m2")))
            .drop("__m1", "__m2"))


def skyline2d(df, x_col: str, y_col: str, id_col: str, salt: int = 64):
    """Exact skyline maximizing (x_col, y_col), both integer-valued.

    Scale shape: pass 1 computes a local skyline inside ``salt``
    hash-groups of the id (window-partition parallel — each group's
    survivors are a superset of its global-skyline members, so nothing
    is lost); pass 2 runs the same filter globally over the
    O(salt · frontier) survivors.  No all-pairs join anywhere; the
    oracle is the NOT EXISTS dominance definition, which must agree
    exactly."""
    base = df.select(F.col(id_col).alias("id"),
                     F.col(x_col).cast("long").alias("x"),
                     F.col(y_col).cast("long").alias("y"))
    salted = base.withColumn("__g", F.pmod(F.hash(F.col("id")),
                                           F.lit(int(salt))))
    local = _skyline_pass(salted, "x", "y", ["__g"]).drop("__g")
    out = _skyline_pass(local, "x", "y", [])
    return out.select(F.col("id").alias(id_col),
                      F.col("x").alias(x_col), F.col("y").alias(y_col))
