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
