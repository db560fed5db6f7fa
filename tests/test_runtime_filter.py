"""Runtime filtering (runtime_filter.py): dim-driven file pruning must
reduce planned files on bucket-partitioned and range-clustered layouts
while never changing join results (the later SupportsRuntimeFiltering
evolution of reference SparkBatchScan.java:66)."""

from pyspark.sql import functions as F

from incubator_iceberg_spark.runtime_filter import (
    runtime_filtered_join, runtime_key_filter)
from incubator_iceberg_spark.schema import Schema


def _dim(orders):
    return (orders.filter("o_orderpriority = '1-URGENT' "
                          "and o_orderkey % 50 = 0")
                  .select("o_orderkey", "o_orderpriority"))


def _ref(li, dim):
    return sorted(map(tuple,
                      li.join(dim, li.l_orderkey == dim.o_orderkey)
                        .groupBy("o_orderpriority")
                        .agg(F.count("*").alias("n"),
                             F.sum(F.floor(F.col("l_extendedprice") * 100)
                                   .cast("long")).alias("cents"))
                        .collect()))


def test_bucket_partitioned_fact_prunes_files_and_matches(
        spark, warehouse, lineitem, orders):
    t = warehouse.create_table("db.li_rf", Schema.from_spark(lineitem.schema),
                               partition_by=["bucket(16, l_orderkey)"])
    t.append(lineitem)
    dim = _dim(orders)

    flt, nd = runtime_key_filter(dim, "o_orderkey", "l_orderkey")
    total = len(t.new_scan(spark).plan_files())
    pruned = len(t.new_scan(spark).filter(flt).plan_files())
    # the IN set projects through the bucket transform: at most nd buckets
    assert pruned <= min(nd, total)
    assert pruned < total

    out = runtime_filtered_join(t, dim, "l_orderkey", "o_orderkey", spark)
    got = sorted(map(tuple,
                     out.groupBy("o_orderpriority")
                        .agg(F.count("*").alias("n"),
                             F.sum(F.floor(F.col("l_extendedprice") * 100)
                                   .cast("long")).alias("cents"))
                        .collect()))
    assert got == _ref(lineitem, dim)


def test_range_clustered_fact_prunes_by_metrics(spark, warehouse,
                                                lineitem, orders):
    t = warehouse.create_table("db.li_rf2", Schema.from_spark(lineitem.schema))
    t.append(lineitem.repartitionByRange(16, "l_orderkey")
                     .sortWithinPartitions("l_orderkey"))
    dim = _dim(orders)
    flt, nd = runtime_key_filter(dim, "o_orderkey", "l_orderkey")
    total = len(t.new_scan(spark).plan_files())
    pruned = len(t.new_scan(spark).filter(flt).plan_files())
    assert pruned < total          # tight per-file bounds: min/max pruning


def test_range_fallback_above_cap_still_correct(spark, warehouse,
                                                lineitem, orders):
    t = warehouse.create_table("db.li_rf3", Schema.from_spark(lineitem.schema),
                               partition_by=["bucket(16, l_orderkey)"])
    t.append(lineitem)
    dim = _dim(orders)
    # cap of 2 forces the [min, max] range predicate
    flt, nd = runtime_key_filter(dim, "o_orderkey", "l_orderkey",
                                 max_in_keys=2)
    assert nd > 2
    out = runtime_filtered_join(t, dim, "l_orderkey", "o_orderkey", spark,
                                max_in_keys=2)
    got = sorted(map(tuple,
                     out.groupBy("o_orderpriority")
                        .agg(F.count("*").alias("n"),
                             F.sum(F.floor(F.col("l_extendedprice") * 100)
                                   .cast("long")).alias("cents"))
                        .collect()))
    assert got == _ref(lineitem, dim)


def test_empty_dim_prunes_everything(spark, warehouse, lineitem, orders):
    t = warehouse.create_table("db.li_rf4", Schema.from_spark(lineitem.schema),
                               partition_by=["bucket(16, l_orderkey)"])
    t.append(lineitem)
    dim = _dim(orders).filter("o_orderkey < 0")
    flt, nd = runtime_key_filter(dim, "o_orderkey", "l_orderkey")
    assert nd == 0
    assert len(t.new_scan(spark).filter(flt).plan_files()) == 0
    out = runtime_filtered_join(t, dim, "l_orderkey", "o_orderkey", spark)
    assert out.count() == 0


def test_left_join_keeps_unmatched_fact_rows_unpruned(
        spark, warehouse, lineitem, orders):
    """A LEFT join's fact side must NOT be pruned by the dim keys —
    runtime_filtered_join only supports pruning-compatible join types."""
    t = warehouse.create_table("db.li_rf5", Schema.from_spark(lineitem.schema))
    t.append(lineitem)
    dim = _dim(orders)
    import pytest
    with pytest.raises(ValueError, match="inner|semi"):
        runtime_filtered_join(t, dim, "l_orderkey", "o_orderkey", spark,
                              how="left")


def test_runtime_filter_applies_mor_deletes_on_pruned_scan(
        spark, warehouse, lineitem, orders):
    """The planning predicate prunes fact FILES; delete application must
    still run on the surviving files (a pruned scan that skips the
    delete-relevance pass would resurrect rows)."""
    t = warehouse.create_table("db.li_rf6", Schema.from_spark(lineitem.schema),
                               partition_by=["bucket(16, l_orderkey)"])
    t.append(lineitem)
    # MoR-delete a slice of rows that the dim WILL select
    t.delete_where("l_orderkey % 100 = 0 AND l_linenumber = 1",
                   mode="merge-on-read")
    dim = _dim(orders)
    out = runtime_filtered_join(t, dim, "l_orderkey", "o_orderkey", spark)
    got = sorted(map(tuple,
                     out.groupBy("o_orderpriority")
                        .agg(F.count("*").alias("n"),
                             F.sum(F.floor(F.col("l_extendedprice") * 100)
                                   .cast("long")).alias("cents"))
                        .collect()))
    li_after = lineitem.filter(
        "NOT (l_orderkey % 100 = 0 AND l_linenumber = 1)")
    assert got == _ref(li_after, dim)
