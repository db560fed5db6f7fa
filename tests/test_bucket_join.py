"""Storage-partitioned bucket join (SparkBatchScan.java:89
outputPartitioning seam): two tables bucket-partitioned by the same
transform join WITHOUT any shuffle exchange — bucket-local broadcast
joins over manifest-planned co-located file groups."""

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark.bucket_join import bucket_join
from incubator_iceberg_spark.schema import Schema


def _tables(warehouse, spark, n=8):
    fact = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("v"))
    dim = spark.range(0, 500).select(
        F.col("id").alias("k"),
        F.concat(F.lit("d"), F.col("id")).alias("name"))
    ta = warehouse.create_table("db.bj_fact", Schema.from_spark(fact.schema),
                                partition_by=[f"bucket({n}, k)"])
    ta.append(fact)
    tb = warehouse.create_table("db.bj_dim", Schema.from_spark(dim.schema),
                                partition_by=[f"bucket({n}, k)"])
    tb.append(dim)
    return ta, tb, fact, dim


def test_bucket_join_matches_plain_join(warehouse, spark):
    ta, tb, fact, dim = _tables(warehouse, spark)
    got = bucket_join(ta, tb, "k").orderBy("k", "v")
    want = fact.join(dim, "k").orderBy("k", "v")
    assert [tuple(r) for r in got.collect()] == \
        [tuple(r) for r in want.collect()]


def test_bucket_join_plans_no_shuffle(warehouse, spark):
    ta, tb, _, _ = _tables(warehouse, spark)
    plan = bucket_join(ta, tb, "k")._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastExchange" in plan


def test_bucket_join_applies_mor_deletes(warehouse, spark):
    ta, tb, fact, dim = _tables(warehouse, spark)
    ta.delete_where("k % 10 = 0", mode="merge-on-read")
    got = bucket_join(ta, tb, "k")
    want = fact.filter("k % 10 != 0").join(dim, "k")
    assert got.count() == want.count()
    assert got.filter("k % 10 = 0").count() == 0


def test_bucket_join_rejects_mismatched_buckets(warehouse, spark):
    fact = spark.range(10).select(F.col("id").alias("k"))
    ta = warehouse.create_table("db.bj8", Schema.from_spark(fact.schema),
                                partition_by=["bucket(8, k)"])
    tb = warehouse.create_table("db.bj16", Schema.from_spark(fact.schema),
                                partition_by=["bucket(16, k)"])
    ta.append(fact)
    tb.append(fact)
    with pytest.raises(ValueError, match="bucket counts differ"):
        bucket_join(ta, tb, "k")


def test_bucket_join_rejects_unbucketed(warehouse, spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    ta = warehouse.create_table("db.bj_nob", Schema.from_spark(df.schema))
    ta.append(df)
    tb = warehouse.create_table("db.bj_b", Schema.from_spark(df.schema),
                                partition_by=["bucket(8, k)"])
    tb.append(df)
    with pytest.raises(ValueError, match="not bucket-partitioned"):
        bucket_join(ta, tb, "k")


def test_bucket_join_column_pruning_and_filters(warehouse, spark):
    ta, tb, fact, dim = _tables(warehouse, spark)
    got = bucket_join(ta, tb, "k", select_a=["k", "v"], select_b=["name"],
                      filter_a="k < 100")
    assert sorted(got.columns) == ["k", "name", "v"]
    want = fact.filter("k < 100").join(dim, "k")
    assert got.count() == want.count()


# -- scale guards (r5 verdict item 4) ---------------------------------------

def test_bucket_join_oversize_build_raises(warehouse, spark):
    """A build slice over the broadcast budget must raise BEFORE any
    data is read — a typed, actionable error instead of an executor
    OOM mid-query."""
    from incubator_iceberg_spark.bucket_join import BucketBuildOversize
    ta, tb, _, _ = _tables(warehouse, spark)
    with pytest.raises(BucketBuildOversize, match="broadcast_budget_bytes"):
        bucket_join(ta, tb, "k", broadcast_budget_bytes=1)


def test_bucket_join_oversize_shuffle_fallback_correct(warehouse, spark):
    """on_oversize='shuffle' degrades oversized branches to bucket-local
    shuffle joins — results identical, only that branch's slices move."""
    ta, tb, fact, dim = _tables(warehouse, spark)
    got = bucket_join(ta, tb, "k", broadcast_budget_bytes=1,
                      on_oversize="shuffle").orderBy("k", "v")
    want = fact.join(dim, "k").orderBy("k", "v")
    assert [tuple(r) for r in got.collect()] == \
        [tuple(r) for r in want.collect()]


def test_bucket_join_branch_batching_bounds_plan(warehouse, spark):
    """max_union_branches packs many buckets into few branches: the plan
    carries exactly that many broadcast joins (bounded driver fan-out)
    and still no shuffle exchange; results unchanged."""
    ta, tb, fact, dim = _tables(warehouse, spark, n=8)
    got = bucket_join(ta, tb, "k", max_union_branches=2)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("BroadcastExchange") == 2
    want = fact.join(dim, "k")
    assert got.count() == want.count()


def test_bucket_join_default_budget_happy_path_unchanged(warehouse, spark):
    """Defaults keep the original shape: tiny tables broadcast, plan
    pins no shuffle exchange (guard engages only over budget)."""
    ta, tb, fact, dim = _tables(warehouse, spark)
    got = bucket_join(ta, tb, "k")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastExchange" in plan
    assert got.count() == fact.join(dim, "k").count()
