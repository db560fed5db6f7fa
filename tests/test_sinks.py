"""Tier 3: Python Data Source WRITE surface — df.write.format('iiws')
batch append/overwrite and writeStream.format('iiws') exactly-once sink
(S9/S12 via the DataSource API; SparkWrite.java:92-249, 398-411)."""

import os

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark.schema import Schema


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from incubator_iceberg_spark import sources
    sources.register(spark)


def test_batch_write_append_unpartitioned(warehouse, orders, spark):
    t = warehouse.create_table("db.w1", Schema.from_spark(orders.schema))
    orders.write.format("iiws").option("path", t.location).mode("append").save()
    t.refresh()
    assert t.to_df().count() == orders.count()
    got = t.to_df().agg(F.sum("o_totalprice")).collect()[0][0]
    want = orders.agg(F.sum("o_totalprice")).collect()[0][0]
    assert abs(got - want) < 1e-6
    # a second append accumulates (and footer stats make pruning work)
    orders.limit(50).write.format("iiws").option("path", t.location) \
        .mode("append").save()
    t.refresh()
    assert t.to_df().count() == orders.count() + 50


def test_batch_write_partitioned_fanout_prunes(warehouse, orders, spark):
    """Executor-side fanout computes the same transform values as the
    Spark write path: partition pruning works on the written table."""
    t = warehouse.create_table("db.w2", Schema.from_spark(orders.schema),
                               partition_by=["month(o_orderdate)"])
    orders.write.format("iiws").option("path", t.location).mode("append").save()
    t.refresh()
    assert t.to_df().count() == orders.count()
    all_files = len(t.new_scan().plan_files())
    pruned = len(t.new_scan().filter(
        "o_orderdate >= TIMESTAMP '1997-06-01'").plan_files())
    assert 0 < pruned < all_files, (pruned, all_files)
    want = orders.filter("o_orderdate >= TIMESTAMP '1997-06-01'").count()
    assert t.to_df(filter="o_orderdate >= TIMESTAMP '1997-06-01'").count() == want


def test_batch_write_bucket_partition_parity(warehouse, orders, spark):
    """Bucket fanout (python murmur3) lands rows in the same buckets as
    the Spark-side write path (bit-exact bucket transform)."""
    t1 = warehouse.create_table("db.w3a", Schema.from_spark(orders.schema),
                                partition_by=[("o_orderkey", "bucket[4]")])
    t2 = warehouse.create_table("db.w3b", Schema.from_spark(orders.schema),
                                partition_by=[("o_orderkey", "bucket[4]")])
    sample = orders.limit(300)
    sample.write.format("iiws").option("path", t1.location).mode("append").save()
    t1.refresh()
    t2.append(sample)
    p1 = {(r["partition"]["o_orderkey_bucket"], r["record_count"])
          for r in t1.metadata_table("partitions").collect()}
    p2 = {(r["partition"]["o_orderkey_bucket"], r["record_count"])
          for r in t2.metadata_table("partitions").collect()}
    assert p1 == p2


def test_batch_write_overwrite_mode(warehouse, orders, spark):
    t = warehouse.create_table("db.w4", Schema.from_spark(orders.schema))
    t.append(orders)
    repl = orders.limit(25)
    repl.write.format("iiws").option("path", t.location).mode("overwrite").save()
    t.refresh()
    assert t.to_df().count() == 25
    # one atomic snapshot: history shows overwrite on top of append
    ops = [s.operation for s in t.metadata.snapshots]
    assert ops[-1] == "overwrite"


def test_stream_write_exactly_once(warehouse, orders, spark, tmp_path):
    """writeStream.format('iiws'): micro-batches append with epoch
    markers; a replayed epoch is skipped (no duplicates)."""
    src = warehouse.create_table("db.w5src", Schema.from_spark(orders.schema))
    src.append(orders.filter("o_orderkey % 2 = 0"))
    dst = warehouse.create_table("db.w5dst", Schema.from_spark(orders.schema))
    ck = str(tmp_path / "ck")

    def run_stream():
        q = (spark.readStream.format("iiws").option("path", src.location).load()
             .writeStream.format("iiws")
             .option("path", dst.location)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_stream()
    dst.refresh()
    evens = orders.filter("o_orderkey % 2 = 0").count()
    assert dst.to_df().count() == evens
    # restart with nothing new → no duplicates
    run_stream()
    dst.refresh()
    assert dst.to_df().count() == evens
    # new data → only the delta arrives
    src.append(orders.filter("o_orderkey % 2 != 0"))
    run_stream()
    dst.refresh()
    assert dst.to_df().count() == orders.count()
    # epoch markers present on streaming commits
    from incubator_iceberg_spark.streaming import EPOCH_KEY
    assert any(EPOCH_KEY in s.summary for s in dst.metadata.snapshots)


def test_stream_writer_replayed_epoch_skipped_unit(warehouse, orders, spark):
    """Driver-level dedup: committing the same batchId twice appends once
    (the foreachBatch-retry path, StreamingWriter.java:62-67)."""
    import pyarrow as pa
    from incubator_iceberg_spark.sinks import IcebergStreamWriter, _TaskWriter

    t = warehouse.create_table("db.w6", Schema.from_spark(orders.schema))
    w = IcebergStreamWriter(t.location, {"query_id": "qx"})
    pdf = orders.limit(40).toPandas()

    def staged():
        batch = pa.RecordBatch.from_pandas(pdf, preserve_index=False)
        return w._task().write_batches(iter([batch]))

    w.commit([staged()], 0)
    w.commit([staged()], 0)  # replay of epoch 0: skipped
    w.commit([staged()], 1)
    t.refresh()
    assert t.to_df().count() == 80


def test_batch_write_to_branch(warehouse, orders, spark):
    """option('branch', ...): the DS append lands on the branch, main is
    untouched (branch-scoped writes parity with Table.append(branch=))."""
    t = warehouse.create_table("db.wbr", Schema.from_spark(orders.schema))
    t.append(orders.limit(60))
    t.create_branch("dev")
    orders.limit(25).write.format("iiws").option("path", t.location) \
        .option("branch", "dev").mode("append").save()
    t.refresh()
    assert t.to_df().count() == 60  # main unchanged
    assert t.to_df(ref="dev").count() == 85


def test_epoch_marker_folds_into_data_commit(warehouse, orders, spark):
    """r10: the exactly-once sinks commit the epoch-marker property
    ATOMICALLY with the data snapshot (extra_properties) — one pointer
    swap per epoch, not two — and the folded marker is monotone (a
    lower value never regresses a higher concurrent one)."""
    from incubator_iceberg_spark import snapshots as SN
    from incubator_iceberg_spark import streaming as ST
    t = warehouse.create_table("db.fold", Schema.from_spark(orders.schema))
    v0 = t.ops.current_version()
    assert ST.append_exactly_once(t, orders.limit(10), epoch_id=1,
                                  query_id="q", spark=spark)
    t.refresh()
    assert t.ops.current_version() == v0 + 1, \
        "epoch marker must ride the data commit, not a second swap"
    key = "streaming.max-committed-epoch.q"
    assert t.metadata.properties[key] == "1"
    # upsert-MoR epoch: same single-swap shape
    v1 = t.ops.current_version()
    assert ST.upsert_mor_exactly_once(t, orders.limit(5), epoch_id=2,
                                      on=["o_orderkey"], query_id="q",
                                      spark=spark)
    t.refresh()
    assert t.ops.current_version() == v1 + 1
    assert t.metadata.properties[key] == "2"
    # monotone: folding a LOWER epoch (a stale retry racing a faster
    # sink instance) keeps the higher committed value
    t.metadata = SN.append_files(t.ops, [], extra_summary={"x": "1"},
                                 extra_properties={key: "1"})
    assert t.metadata.properties[key] == "2"
    # non-epoch keys are plain set
    t.metadata = SN.append_files(t.ops, [], extra_summary={"x": "2"},
                                 extra_properties={"my.prop": "v"})
    assert t.metadata.properties["my.prop"] == "v"
