"""Tier 3: Python Data Source surface — spark.read.format('iiws') batch
reads with pruning + Structured Streaming micro-batches over snapshots."""

import os

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark.schema import Schema


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from incubator_iceberg_spark import sources
    sources.register(spark)


def test_batch_read_via_format(warehouse, orders, spark):
    t = warehouse.create_table("db.ds1", Schema.from_spark(orders.schema))
    t.append(orders)
    df = spark.read.format("iiws").option("path", t.location).load()
    assert df.count() == orders.count()
    assert set(df.columns) == set(orders.columns)
    got = df.agg(F.sum("o_totalprice")).collect()[0][0]
    want = orders.agg(F.sum("o_totalprice")).collect()[0][0]
    assert abs(got - want) < 1e-6


def test_batch_read_filter_option(warehouse, orders, spark):
    t = warehouse.create_table("db.ds2", Schema.from_spark(orders.schema))
    t.append(orders)
    df = (spark.read.format("iiws").option("path", t.location)
          .option("filter", "o_totalprice > 200000").load())
    assert df.count() == orders.filter("o_totalprice > 200000").count()


def test_batch_read_snapshot_option(warehouse, orders, spark):
    t = warehouse.create_table("db.ds3", Schema.from_spark(orders.schema))
    t.append(orders.limit(100))
    s1 = t.metadata.current_snapshot_id
    t.append(orders.limit(40))
    df = (spark.read.format("iiws").option("path", t.location)
          .option("snapshot_id", str(s1)).load())
    assert df.count() == 100


def test_streaming_micro_batches(warehouse, orders, spark, tmp_path):
    t = warehouse.create_table("db.ds4", Schema.from_spark(orders.schema))
    t.append(orders.filter("o_orderkey % 2 = 0"))
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def run_stream():
        q = (spark.readStream.format("iiws").option("path", t.location).load()
             .writeStream.format("parquet")
             .option("path", out_dir).option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_stream()
    evens = orders.filter("o_orderkey % 2 = 0").count()
    assert spark.read.parquet(out_dir).count() == evens

    # new snapshot → restart from checkpoint delivers ONLY the delta
    t.append(orders.filter("o_orderkey % 2 != 0"))
    run_stream()
    assert spark.read.parquet(out_dir).count() == orders.count()
    # no duplicates on one more restart with nothing new
    run_stream()
    assert spark.read.parquet(out_dir).count() == orders.count()
