"""Tier 3: Structured Streaming on top of the engine — windowed aggregation
with watermarks for late data, exactly-once sink via epoch dedup, and the
upsert shorthand (F6 streaming fixture semantics)."""

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark.schema import Schema


def test_windowed_agg_with_watermark_foreachbatch(warehouse, spark, sf_dir, tmp_path):
    """rate-limited file stream → watermarked tumbling window → engine
    exactly-once sink (the Spark-native streaming story over our tables)."""
    from incubator_iceberg_spark import streaming as STR
    from incubator_iceberg_spark.io import load_table

    events = load_table(spark, sf_dir, "events")
    src_dir = str(tmp_path / "stream_src")
    # three files = three micro-batches with maxFilesPerTrigger=1
    for i in range(3):
        events.filter(f"event_id % 3 = {i}").coalesce(1).write.mode("append").parquet(src_dir)

    sink = warehouse.create_table(
        "db.win_sink",
        "window_start timestamp, event_type string, n long")

    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir)
              .withWatermark("ts", "1 hour")
              .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
              .agg(F.count("*").alias("n"))
              .select(F.col("w.start").alias("window_start"), "event_type", "n"))

    def write_batch(batch_df, epoch_id):
        # complete-mode snapshot per epoch: last write wins via epoch dedup
        STR.append_exactly_once(sink, batch_df, epoch_id, query_id="win")

    q = (stream.writeStream.outputMode("complete").foreachBatch(write_batch)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    sink.refresh()
    # the FINAL epoch's complete output must equal the batch ground truth
    last_epoch = STR.last_committed_epoch(sink, "win")
    assert last_epoch is not None
    final = None
    for s in sink.metadata.snapshots:
        if s.summary.get("streaming.epoch-id") == str(last_epoch):
            final = s
    # read only the rows appended by the final epoch
    from incubator_iceberg_spark.scan import TableScan
    df = TableScan(sink, spark).appends_between(final.parent_id, final.snapshot_id).to_df()
    want = (events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n"))
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, want.collect()))


def test_upsert_with_identifier_fields(warehouse, orders, spark):
    t = warehouse.create_table("db.ups", Schema.from_spark(orders.schema),
                               identifier_fields=["o_orderkey"])
    t.append(orders)
    src = (orders.limit(50).withColumn("o_orderstatus", F.lit("U"))
           .unionByName(orders.limit(10).withColumn(
               "o_orderkey", F.col("o_orderkey") + 777000000)))
    t.upsert(src)
    assert t.to_df().count() == orders.count() + 10
    assert t.to_df(filter="o_orderstatus = 'U'").count() == 50


def test_upsert_requires_keys(warehouse, orders):
    t = warehouse.create_table("db.ups2", Schema.from_spark(orders.schema))
    t.append(orders.limit(10))
    with pytest.raises(ValueError):
        t.upsert(orders.limit(5))


def test_streaming_upsert_sink_exactly_once(warehouse, spark, sf_dir, tmp_path):
    """CDC-apply sink: stream key-value updates into a table via
    foreach_batch_upserter; replayed epochs are no-ops."""
    from pyspark.sql import functions as F
    from incubator_iceberg_spark import streaming as STR
    from incubator_iceberg_spark.io import load_table
    from incubator_iceberg_spark.schema import Schema

    orders = load_table(spark, sf_dir, "orders")
    base = orders.limit(200)
    t = warehouse.create_table("db.upsink", Schema.from_spark(base.schema))
    t.append(base)

    # stream of updates: same keys, doubled price + 20 brand-new keys
    upd = (base.limit(50).withColumn("o_totalprice", F.col("o_totalprice") * 2)
           .unionByName(base.limit(20).withColumn(
               "o_orderkey", F.col("o_orderkey") + 3_000_000)))
    src_dir = str(tmp_path / "cdc_src")
    upd.write.parquet(src_dir)
    stream = spark.readStream.schema(upd.schema).parquet(src_dir)
    q = (stream.writeStream
         .foreachBatch(STR.foreach_batch_upserter(t, on=["o_orderkey"]))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    t.refresh()
    assert t.to_df().count() == 220
    doubled = t.to_df().join(base.limit(50).select("o_orderkey", F.col("o_totalprice").alias("old")),
                             "o_orderkey").filter("abs(o_totalprice - 2*old) < 1e-6")
    assert doubled.count() == 50
    # epoch replay: re-running the same epoch id must be a no-op
    before = t.metadata.current_snapshot_id
    assert STR.upsert_exactly_once(t, upd, epoch_id=0, on=["o_orderkey"]) is False
    assert t.refresh().metadata.current_snapshot_id == before


def test_streaming_cdc_apply_sink(warehouse, spark, sf_dir, tmp_path):
    """Full CDC sink through a REAL writeStream.foreachBatch: one stream
    carrying inserts, updates and deletes; deletes remove rows, absent-key
    deletes are ignored, replays are no-ops."""
    from pyspark.sql import functions as F

    from incubator_iceberg_spark import streaming as STR
    from incubator_iceberg_spark.io import load_table
    from incubator_iceberg_spark.schema import Schema

    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter("o_orderkey % 2 = 0").limit(100)
    t = warehouse.create_table("db.cdcsink", Schema.from_spark(base.schema))
    t.append(base)
    keys = [r["o_orderkey"] for r in
            base.select("o_orderkey").orderBy("o_orderkey").collect()]
    upd_keys, del_keys = keys[:20], keys[20:30]

    cdc = (base.filter(F.col("o_orderkey").isin(upd_keys))
           .withColumn("o_totalprice", F.col("o_totalprice") * 2)
           .withColumn("op", F.lit("U"))
           .unionByName(base.filter(F.col("o_orderkey").isin(del_keys))
                        .withColumn("op", F.lit("D")))
           .unionByName(base.limit(15)
                        .withColumn("o_orderkey",
                                    F.col("o_orderkey") + 9_000_000)
                        .withColumn("op", F.lit("I")))
           .unionByName(base.limit(5)
                        .withColumn("o_orderkey",
                                    F.col("o_orderkey") + 8_000_000)
                        .withColumn("op", F.lit("D"))))  # absent keys
    src_dir = str(tmp_path / "cdc_src")
    cdc.write.parquet(src_dir)
    stream = spark.readStream.schema(cdc.schema).parquet(src_dir)
    q = (stream.writeStream
         .foreachBatch(STR.foreach_batch_cdc_applier(t, on=["o_orderkey"]))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    t.refresh()
    got = t.to_df()
    assert got.count() == 100 - 10 + 15
    assert got.filter(F.col("o_orderkey").isin(del_keys)).count() == 0
    assert got.filter("o_orderkey > 8000000 and o_orderkey < 9000000").count() == 0
    doubled = got.join(
        base.filter(F.col("o_orderkey").isin(upd_keys))
        .select("o_orderkey", F.col("o_totalprice").alias("old")),
        "o_orderkey").filter("abs(o_totalprice - 2*old) < 1e-6")
    assert doubled.count() == 20
    # replay: same epoch id again is a no-op commit-wise
    before = t.metadata.current_snapshot_id
    assert STR.cdc_apply_exactly_once(t, cdc, epoch_id=0,
                                      on=["o_orderkey"]) is False
    assert t.refresh().metadata.current_snapshot_id == before


def test_cdc_within_batch_last_wins(warehouse, spark, sf_dir):
    """order_col resolves same-key ops inside one batch: delete then
    re-insert lands as the re-insert; insert then delete lands deleted."""
    from pyspark.sql import functions as F

    from incubator_iceberg_spark import streaming as STR
    from incubator_iceberg_spark.schema import Schema

    t = warehouse.create_table(
        "db.cdclastwins",
        Schema.from_spark(spark.createDataFrame([], "k long, v string").schema))
    t.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                                   "k long, v string"))
    batch = spark.createDataFrame(
        [(1, "a", "D", 1), (1, "a2", "I", 2),     # delete → re-insert: wins
         (2, "b2", "U", 1), (2, "b", "D", 2),     # update → delete: gone
         (4, "d", "I", 1), (4, "d2", "U", 2)],    # insert → update: v=d2
        "k long, v string, op string, seq int")
    assert STR.cdc_apply_exactly_once(t, batch, epoch_id=0, on=["k"],
                                      order_col="seq")
    got = {r["k"]: r["v"] for r in t.to_df().collect()}
    assert got == {1: "a2", 3: "c", 4: "d2"}


def test_streaming_exact_dedup_dropduplicates(warehouse, spark, sf_dir, tmp_path):
    """Streaming exact dedup: dropDuplicates on the content hash across
    micro-batches (state-backed) feeding the exactly-once sink — the
    final table holds one row per distinct text even when duplicates
    span batches."""
    from incubator_iceberg_spark import streaming as STR
    from incubator_iceberg_spark.functions.dedup import content_hash

    docs = spark.createDataFrame(
        [(i, ["alpha text", "beta text", "gamma text"][i % 3]) for i in range(30)],
        "doc_id long, text string")
    src_dir = str(tmp_path / "dd_src")
    for i in range(3):  # duplicates deliberately span the 3 micro-batches
        docs.filter(f"doc_id % 3 = {i}").coalesce(1) \
            .write.mode("append").parquet(src_dir)

    sink = warehouse.create_table("db.dd_sink", "doc_id long, text string")
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir)
              .withColumn("__h", content_hash("text"))
              .dropDuplicates(["__h"])
              .drop("__h"))

    def write_batch(batch_df, epoch_id):
        STR.append_exactly_once(sink, batch_df, epoch_id, query_id="dd")

    q = (stream.writeStream.outputMode("append").foreachBatch(write_batch)
         .option("checkpointLocation", str(tmp_path / "dd_ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    sink.refresh()
    rows = sink.to_df().collect()
    assert len(rows) == 3  # one per distinct text across ALL batches
    assert {r["text"] for r in rows} == {"alpha text", "beta text", "gamma text"}
