"""Skew mitigation helpers (SURVEY brief: 'skewed keys → salting or AQE
skew-join').

AQE's skew-join handles most shuffle-join skew automatically
(spark.sql.adaptive.skewJoin.enabled, on by default in session.get_spark).
These helpers cover the cases AQE can't re-plan:

- ``salted_aggregate`` — two-stage aggregation for hot grouping keys
  (partial agg over (key, salt), then final agg over key).  AQE cannot
  split a single hot reduce key; salting can.
- ``salted_join`` — replicate the small side N ways and salt the big
  side's hot keys so one executor doesn't own the whole hot key.
"""

from __future__ import annotations


def salted_aggregate(df, group_cols, agg_exprs: dict, salt_buckets: int = 16):
    """Two-stage groupBy for skewed keys.  ``agg_exprs``: out_col →
    ("sum"|"count"|"min"|"max", in_col).  Algebraic aggs only (they
    re-combine); avg must be derived as sum/count by the caller."""
    from pyspark.sql import functions as F

    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id()
                                            + F.monotonically_increasing_id(),
                                            F.lit(salt_buckets)))
    partial_aggs, final_aggs = [], []
    for out, (fn, col) in agg_exprs.items():
        if fn == "sum":
            partial_aggs.append(F.sum(col).alias(f"__p_{out}"))
            final_aggs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "count":
            partial_aggs.append(F.count(col).alias(f"__p_{out}"))
            final_aggs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            partial_aggs.append(F.min(col).alias(f"__p_{out}"))
            final_aggs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            partial_aggs.append(F.max(col).alias(f"__p_{out}"))
            final_aggs.append(F.max(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate: {fn}")
    partial = salted.groupBy(*group_cols, "__salt").agg(*partial_aggs)
    return partial.groupBy(*group_cols).agg(*final_aggs)


def salted_join(big_df, small_df, on, salt_buckets: int = 8, how: str = "inner"):
    """Equi-join where ``big_df`` has skewed join keys: the big side gets a
    random salt in [0, N), the small side is replicated N times (explode),
    and the join key becomes (key, salt) — the hot key's rows spread over N
    reducers instead of one.  ``on``: list of join column names."""
    from pyspark.sql import functions as F

    on = [on] if isinstance(on, str) else list(on)
    big = big_df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id(),
                                    F.spark_partition_id()),
                         F.lit(salt_buckets)).cast("int"))
    small = small_df.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])))
    joined = big.join(small, on + ["__salt"], how)
    return joined.drop("__salt")
