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


def test_catalyst_filter_pushdown_prunes_files(warehouse, orders, spark):
    """A plain DataFrame .filter() (no filter option) reaches metadata
    pruning through DataSourceReader.pushFilters: fewer input partitions
    (= planned files) than a full scan, same rows as the oracle."""
    t = warehouse.create_table("db.dspush", Schema.from_spark(orders.schema),
                               partition_by=["month(o_orderdate)"])
    t.append(orders)
    base = spark.read.format("iiws").option("path", t.location).load()
    all_parts = base.rdd.getNumPartitions()
    filtered = (spark.read.format("iiws").option("path", t.location).load()
                .filter(F.col("o_orderdate") >= F.lit("1997-06-01").cast("timestamp")))
    pruned_parts = filtered.rdd.getNumPartitions()
    assert pruned_parts < all_parts, (pruned_parts, all_parts)
    want = orders.filter("o_orderdate >= TIMESTAMP '1997-06-01'").count()
    assert filtered.count() == want


def test_pushdown_with_in_and_null_filters(warehouse, orders, spark):
    t = warehouse.create_table("db.dspush2", Schema.from_spark(orders.schema))
    t.append(orders)
    df = spark.read.format("iiws").option("path", t.location).load()
    got = df.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
                    & F.col("o_custkey").isNotNull()).count()
    want = orders.filter("o_orderpriority IN ('1-URGENT','2-HIGH') "
                         "AND o_custkey IS NOT NULL").count()
    assert got == want


def test_ds_read_applies_position_deletes(warehouse, orders, spark):
    """v2 position deletes are applied by the Python Data Source reader
    (executor-side pyarrow mask) — result matches the to_df path."""
    t = warehouse.create_table("db.dspd", Schema.from_spark(orders.schema))
    t.append(orders)
    path = t.new_scan().plan_files()[0][0]
    pos = spark.createDataFrame([(path, i) for i in range(5)],
                                "file_path string, pos long")
    t.add_position_deletes(pos)
    df = spark.read.format("iiws").option("path", t.location).load()
    assert df.count() == orders.count() - 5
    got = {r["o_orderkey"] for r in df.collect()}
    want = {r["o_orderkey"] for r in t.to_df().collect()}
    assert got == want


def test_ds_read_applies_equality_deletes_with_seq_scoping(warehouse, orders, spark):
    """Equality deletes anti-join in the DS reader; rows re-appended AFTER
    the delete (higher sequence number) survive."""
    t = warehouse.create_table("db.dsed", Schema.from_spark(orders.schema))
    base = orders.limit(200)
    t.append(base)
    keys = [r["o_orderkey"] for r in base.select("o_orderkey").collect()[:7]]
    t.add_equality_deletes(
        spark.createDataFrame([(k,) for k in keys], "o_orderkey long"),
        ["o_orderkey"])
    readd = base.filter(F.col("o_orderkey").isin(keys[:3]))
    t.append(readd)  # newer seq: these 3 keys come back
    df = spark.read.format("iiws").option("path", t.location).load()
    assert df.count() == 200 - 7 + 3
    got = {r["o_orderkey"] for r in df.collect()}
    want = {r["o_orderkey"] for r in t.to_df().collect()}
    assert got == want
    # filters still compose on top of delete application
    hit = df.filter(F.col("o_orderkey").isin(keys)).count()
    assert hit == 3


def test_to_arrow_applies_deletes(warehouse, orders, spark):
    """S14 local read honors v2 delete files too."""
    t = warehouse.create_table("db.arrd", Schema.from_spark(orders.schema))
    t.append(orders.limit(150))
    path = t.new_scan().plan_files()[0][0]
    t.add_position_deletes(spark.createDataFrame(
        [(path, 0)], "file_path string, pos long"))
    keys = [r["o_orderkey"] for r in
            t.to_df().select("o_orderkey").limit(4).collect()]
    t.add_equality_deletes(
        spark.createDataFrame([(k,) for k in keys], "o_orderkey long"),
        ["o_orderkey"])
    at = t.to_arrow()
    assert at.num_rows == t.to_df().count()
    assert set(at["o_orderkey"].to_pylist()) == \
        {r["o_orderkey"] for r in t.to_df().collect()}


def test_sqlfacade_select_over_table_with_deletes(warehouse, orders, spark):
    """SQL facade SELECT uses the pushdown DS view even with live v2
    deletes (the reader applies them)."""
    from incubator_iceberg_spark import sqlfacade
    t = warehouse.create_table("db.sqld", Schema.from_spark(orders.schema))
    t.append(orders.limit(300))
    keys = [r["o_orderkey"] for r in
            orders.limit(300).select("o_orderkey").collect()[:11]]
    t.add_equality_deletes(
        spark.createDataFrame([(k,) for k in keys], "o_orderkey long"),
        ["o_orderkey"])
    out = sqlfacade.execute(
        warehouse, spark,
        "SELECT COUNT(*) AS n FROM db.sqld WHERE o_totalprice >= 0")
    n = out.collect()[0]["n"]
    assert n == t.to_df().filter("o_totalprice >= 0").count()


def test_ds_row_group_splitting_with_pos_deletes(warehouse, orders, spark, tmp_path):
    """Large parquet files split into per-row-group input partitions
    (TableScanUtil 128 MB analog, forced via option for testability);
    position deletes use absolute row indices across the slice offsets."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from incubator_iceberg_spark import procedures

    pdf = orders.limit(400).toPandas()
    ext = tmp_path / "big"
    ext.mkdir()
    path = str(ext / "multi_rg.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path,
                   row_group_size=100)  # 4 row groups
    t = warehouse.create_table("db.rgsplit", Schema.from_spark(orders.schema))
    procedures.add_files(t, str(ext), spark=spark)

    base = spark.read.format("iiws").option("path", t.location)
    whole = base.load()
    assert whole.rdd.getNumPartitions() == 1  # small file: no auto split
    split = (spark.read.format("iiws").option("path", t.location)
             .option("split_row_groups", "true").load())
    assert split.rdd.getNumPartitions() == 4  # one per row group
    assert split.count() == 400
    assert {r["o_orderkey"] for r in split.collect()} == \
        {r["o_orderkey"] for r in whole.collect()}

    # absolute positions 0, 150, 399 land in row groups 0, 1, 3
    pos = spark.createDataFrame([(path, 0), (path, 150), (path, 399)],
                                "file_path string, pos long")
    t.add_position_deletes(pos)
    split2 = (spark.read.format("iiws").option("path", t.location)
              .option("split_row_groups", "true").load())
    assert split2.count() == 397
    deleted = {int(pdf.iloc[i]["o_orderkey"]) for i in (0, 150, 399)}
    survivors = {r["o_orderkey"] for r in split2.collect()}
    assert deleted.isdisjoint(survivors)


def test_stream_reader_file_index_offsets_rate_limit(warehouse, orders, spark):
    """(snapshot_id, file_index) offsets: max_files_per_trigger caps each
    micro-batch and a batch may stop mid-snapshot; the file sequence is
    checkpoint-stable and replay-safe."""
    from incubator_iceberg_spark.sources import (
        IcebergStreamReader, _append_file_chain)

    t = warehouse.create_table("db.dsrl", Schema.from_spark(orders.schema))
    # snapshot 1: 3 files; snapshot 2: 2 files
    t.append(orders.limit(90).repartition(3))
    t.append(orders.limit(40).repartition(2))
    _pos, flat = _append_file_chain(t.metadata)
    assert len(flat) == 5

    r = IcebergStreamReader(t.location, {"max_files_per_trigger": "2"})
    off = r.initialOffset()
    seen_files = []
    batches = 0
    while True:
        end = r.latestOffset()
        parts = r.partitions(off, end)
        if not parts:
            break
        seen_files.extend(p.path for p in parts)
        batches += 1
        off = end
    assert batches == 3  # 2 + 2 + 1 files
    assert len(seen_files) == 5
    assert len(set(seen_files)) == 5  # no file delivered twice
    # replaying a checkpointed range returns exactly the same slice
    r2 = IcebergStreamReader(t.location, {"max_files_per_trigger": "2"})
    first_end = None
    # recompute the first capped offset on a fresh reader: start known
    r2._pos = 0
    first_end = r2.latestOffset()
    replay = r2.partitions(r.initialOffset(), first_end)
    assert [p.path for p in replay] == seen_files[:2]


def test_stream_reader_legacy_snapshot_offset_compat(warehouse, orders, spark):
    """Old {"snapshot_id"} checkpoints (no file_index) mean the snapshot
    was fully consumed: only later appends are delivered."""
    from incubator_iceberg_spark.sources import IcebergStreamReader

    t = warehouse.create_table("db.dslegacy", Schema.from_spark(orders.schema))
    t.append(orders.limit(50))
    s1 = t.metadata.current_snapshot_id
    t.append(orders.limit(30).repartition(2))
    r = IcebergStreamReader(t.location, {})
    parts = r.partitions({"snapshot_id": s1}, r.latestOffset())
    assert len(parts) == 2  # only snapshot 2's files


def test_ds_read_ref_option(warehouse, orders, spark):
    """option('ref', branch-or-tag): the DS read resolves the ref's
    snapshot, matching to_df(ref=...)."""
    t = warehouse.create_table("db.dsref", Schema.from_spark(orders.schema))
    t.append(orders.limit(70))
    t.create_tag("v1")
    t.append(orders.limit(30))
    df = (spark.read.format("iiws").option("path", t.location)
          .option("ref", "v1").load())
    assert df.count() == 70
    assert spark.read.format("iiws").option("path", t.location).load().count() == 100


def test_ds_reader_plans_under_distributed_mode(warehouse, spark):
    """The DSv2 python planner runs in a session-less worker: it must
    FORCE local planning when read.plan-mode=distributed (or metadata
    exceeds the local threshold) instead of silently planning an empty
    scan."""
    from incubator_iceberg_spark.schema import Schema

    df = spark.createDataFrame([(i, f"p{i}") for i in range(200)],
                               "id long, payload string")
    t = warehouse.create_table("db.dsdist", Schema.from_spark(df.schema),
                               properties={"read.plan-mode": "distributed"})
    t.append(df)
    out = (spark.read.format("iiws")
           .option("path", t.location).load())
    assert out.count() == 200
    assert out.filter("id < 50").count() == 50
