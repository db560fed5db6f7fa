"""Tier 2/3: table round trips — append/scan/prune, time travel,
incremental, overwrite, snapshots (mirrors TestFastAppend, TestSelect,
TestPartitionedWrites, core TestTables scenarios)."""

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark.schema import Schema


def _ingest(warehouse, name, df, **kw):
    t = warehouse.create_table(name, Schema.from_spark(df.schema), **kw)
    t.append(df)
    return t


def test_append_scan_roundtrip(warehouse, orders):
    t = _ingest(warehouse, "db.o", orders)
    assert t.to_df().count() == orders.count()
    got = t.to_df().orderBy("o_orderkey").collect()
    want = orders.orderBy("o_orderkey").collect()
    assert got == want


def test_filter_matches_plain_spark(warehouse, lineitem):
    t = _ingest(warehouse, "db.li", lineitem, partition_by=["month(l_shipdate)"])
    cond = "l_shipdate >= TIMESTAMP '1997-06-01' AND l_discount > 0.05"
    assert t.to_df(filter=cond).count() == lineitem.filter(cond).count()


def test_partition_pruning_skips_files(warehouse, lineitem):
    t = _ingest(warehouse, "db.li2", lineitem, partition_by=["month(l_shipdate)"])
    all_files = len(t.new_scan().plan_files())
    pruned = len(t.new_scan().filter("l_shipdate >= TIMESTAMP '2001-01-01'").plan_files())
    assert 0 < pruned < all_files / 3


def test_metrics_pruning_on_unpartitioned(warehouse, orders, spark):
    # many files via repartition → bounds should skip most for a point lookup
    t = warehouse.create_table("db.o2", Schema.from_spark(orders.schema))
    t.append(orders.repartition(8, "o_orderkey"))
    key = orders.select("o_orderkey").first()[0]
    pruned = len(t.new_scan().filter(f"o_orderkey = {key}").plan_files())
    total = len(t.new_scan().plan_files())
    assert total == 8 and pruned <= total  # bounds overlap-dependent, sanity only


def test_bucket_partition_prunes_equality(warehouse, orders):
    t = _ingest(warehouse, "db.ob", orders, partition_by=[("o_orderkey", "bucket[8]")])
    key = orders.select("o_orderkey").first()[0]
    files = t.new_scan().filter(f"o_orderkey = {key}").plan_files()
    all_files = t.new_scan().plan_files()
    assert len(files) < len(all_files)
    assert t.to_df(filter=f"o_orderkey = {key}").count() == \
        orders.filter(F.col("o_orderkey") == key).count()


def test_time_travel_and_incremental(warehouse, orders):
    t = _ingest(warehouse, "db.tt", orders.filter("o_orderkey % 2 = 0"))
    s1 = t.metadata.current_snapshot_id
    t.append(orders.filter("o_orderkey % 2 != 0"))
    s2 = t.metadata.current_snapshot_id
    evens = orders.filter("o_orderkey % 2 = 0").count()
    odds = orders.filter("o_orderkey % 2 != 0").count()
    assert t.to_df(snapshot_id=s1).count() == evens
    assert t.to_df().count() == evens + odds
    assert t.new_scan().appends_between(s1, s2).to_df().count() == odds
    # as-of-timestamp resolves to the first snapshot
    snap1 = t.metadata.snapshot_by_id(s1)
    assert t.to_df(as_of_timestamp_ms=snap1.timestamp_ms).count() == evens


def test_incremental_read_survives_later_compaction(warehouse, spark):
    """Regression: appends_between must plan from each append snapshot's
    OWN manifest list.  Planning from the final snapshot's list silently
    returned ZERO rows once a compaction rewrote the appended files (the
    ADDED entries the incremental filter looks for are replaced by the
    rewrite's) — data loss for incremental consumers AND the streaming
    micro-batch source, which shares this path."""
    df = spark.range(0, 100).selectExpr("id", "id % 7 as v")
    t = _ingest(warehouse, "db.inc_compact", df.filter("id < 50"))
    s1 = t.metadata.current_snapshot_id
    t.append(df.filter("id >= 50").repartition(4))
    res = t.rewrite_data_files(min_input_files=2)
    assert res["rewritten_files"] >= 2  # the compaction really rewrote
    t.refresh()
    s3 = t.metadata.current_snapshot_id
    got = t.new_scan().appends_between(s1, s3).to_df()
    assert got.count() == 50
    assert got.agg(F.sum("id")).collect()[0][0] == sum(range(50, 100))
    # distributed planning path takes the same per-snapshot manifests
    t.update_properties({"read.plan-mode": "distributed"})
    t.refresh()
    assert t.new_scan().appends_between(s1, s3).to_df().count() == 50
    # a range holding ONLY the compaction yields no rows
    assert t.new_scan().appends_between(s3, s3).to_df().count() == 0


def test_incremental_range_validates_ancestry(warehouse, spark):
    """appends_between must refuse a range it cannot reconstruct: a
    `from` expired past the retained chain, or one that was never an
    ancestor, silently returned a WRONG range before (reference
    SnapshotUtil.snapshotIdsBetween throws on broken ancestry).  The
    boundary case — `from` is the (expired) parent of the oldest
    retained snapshot — stays valid: the walk terminates AT it."""
    df = spark.range(0, 40).selectExpr("id")
    t = _ingest(warehouse, "db.inc_exp", df.filter("id < 10"))
    s1 = t.metadata.current_snapshot_id
    t.append(df.filter("id >= 10 and id < 20"))
    s2 = t.metadata.current_snapshot_id
    t.append(df.filter("id >= 20 and id < 30"))
    t.append(df.filter("id >= 30"))
    s4 = t.metadata.current_snapshot_id
    t.expire_snapshots(older_than_ms=None, retain_last=2)
    t.refresh()
    assert t.new_scan().appends_between(s2, s4).to_df().count() == 20
    with pytest.raises(ValueError, match="reconstructable ancestor"):
        t.new_scan().appends_between(s1, s4).to_df()
    with pytest.raises(ValueError, match="reconstructable ancestor"):
        t.new_scan().appends_between(123456789, s4).to_df()
    # from=None = "from the beginning": after expiry that is the oldest
    # RETAINED ancestry (what a fresh streaming consumer can still read)
    assert t.new_scan().appends_between(None, s4).to_df().count() == 20


def test_overwrite_by_filter(warehouse, orders, spark):
    t = _ingest(warehouse, "db.ow", orders)
    repl = orders.filter("o_orderstatus = 'F'").withColumn(
        "o_totalprice", F.lit(0.0))
    t.overwrite(repl, "o_orderstatus = 'F'")
    assert t.to_df().count() == orders.count()
    assert t.to_df(filter="o_orderstatus = 'F'") \
        .agg(F.sum("o_totalprice")).collect()[0][0] == 0.0


def test_dynamic_partition_overwrite(warehouse, orders):
    t = _ingest(warehouse, "db.dyn", orders, partition_by=["month(o_orderdate)"])
    repl = (orders.filter("o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-03-01'")
            .withColumn("o_orderpriority", F.lit("REPLACED")))
    t.dynamic_overwrite(repl)
    assert t.to_df().count() == orders.count()
    assert t.to_df(filter="o_orderpriority = 'REPLACED'").count() == repl.count()


def test_rollback_and_set_current(warehouse, orders):
    t = _ingest(warehouse, "db.rb", orders.limit(100))
    s1 = t.metadata.current_snapshot_id
    t.append(orders.limit(50))
    assert t.to_df().count() == 150
    t.rollback_to_snapshot(s1)
    assert t.to_df().count() == 100


def test_wap_stage_and_cherry_pick(warehouse, orders):
    t = warehouse.create_table("db.wap", Schema.from_spark(orders.schema),
                               properties={"write.wap.enabled": "true"})
    t.append(orders.limit(10))
    staged = t.wap_append(orders.limit(5), wap_id="audit-1")
    # current unchanged until publish
    assert t.to_df().count() == 10
    t.cherry_pick(staged)
    assert t.to_df().count() == 15


def test_snapshot_metadata_tables(warehouse, orders, spark):
    t = _ingest(warehouse, "db.meta", orders, partition_by=["month(o_orderdate)"])
    t.append(orders.limit(10))
    snaps = t.metadata_table("snapshots")
    assert snaps.count() == 2
    assert set(r["operation"] for r in snaps.collect()) == {"append"}
    files = t.metadata_table("files")
    assert files.select(F.sum("record_count")).collect()[0][0] == orders.count() + 10
    parts = t.metadata_table("partitions")
    assert parts.count() > 0
    hist = t.metadata_table("history")
    assert hist.count() == 2


def test_stats_collected_in_manifests(warehouse, orders, spark):
    t = _ingest(warehouse, "db.stats", orders)
    entries = t.metadata_table("entries")
    row = entries.select("lower_bounds", "upper_bounds", "null_counts",
                         "record_count").first()
    assert row["lower_bounds"]["o_orderkey"] is not None
    assert row["upper_bounds"]["o_totalprice"] is not None
    assert row["record_count"] > 0


def test_sort_order_applied(warehouse, orders):
    t = warehouse.create_table("db.sorted", Schema.from_spark(orders.schema),
                               sort_by=["o_totalprice desc"])
    t.append(orders)
    # verify per-file local ordering via first file's content
    path = t.new_scan().plan_files()[0][0]
    df = t.spark.read.parquet(path)
    vals = [r[0] for r in df.select("o_totalprice").collect()]
    assert vals == sorted(vals, reverse=True)


def test_residual_groups_skip_row_filter(warehouse, lineitem, spark):
    """P9: interior month partitions of a month-range filter get residual
    TRUE (no per-row date comparison); results stay identical."""
    import incubator_iceberg_spark.expressions as X
    from incubator_iceberg_spark import py_eval as PE
    from incubator_iceberg_spark.scan import parse_predicate

    t = warehouse.create_table("db.resid", Schema.from_spark(lineitem.schema),
                               partition_by=["month(l_shipdate)"],
                               properties={"read.use-residuals": "true"})
    t.append(lineitem)
    cond = ("l_shipdate >= TIMESTAMP '1997-01-15' AND "
            "l_shipdate < TIMESTAMP '1997-04-15'")
    got = t.to_df(filter=cond).count()
    want = lineitem.filter(cond).count()
    assert got == want

    # interior month (Feb 1997, ordinal 325) strictly satisfies the range
    bound = X.bind(t.schema(), parse_predicate(cond))
    res = PE.residual_for(bound, t.spec(), {"l_shipdate_month": 325})
    assert isinstance(res, X.AlwaysTrue)
    # boundary month (Jan 1997, 324) keeps the lower-bound comparison
    res_b = PE.residual_for(bound, t.spec(), {"l_shipdate_month": 324})
    assert not isinstance(res_b, (X.AlwaysTrue, X.AlwaysFalse))


def test_distributed_stats_collection(warehouse, orders, spark, monkeypatch):
    """Above the file-count threshold, footer stats collect via a
    mapInPandas Spark job on executors — results must match driver-side."""
    from incubator_iceberg_spark import write as W

    monkeypatch.setattr(W, "DRIVER_STATS_MAX_FILES", 2)
    t = warehouse.create_table("db.dstats", Schema.from_spark(orders.schema))
    t.append(orders.repartition(8))  # 8 files > threshold → distributed path
    entries = t.new_scan().plan_entries_local()
    assert len(entries) == 8
    for e in entries:
        assert e["record_count"] > 0
        assert e["lower_bounds"]["o_orderkey"] is not None
        assert e["upper_bounds"]["o_orderdate"] is not None
    # pruning works off the distributed-collected stats
    hi = orders.agg(F.max("o_orderkey")).collect()[0][0]
    assert t.new_scan().filter(f"o_orderkey > {hi}").plan_files() == []
    assert t.to_df().count() == orders.count()


def test_distributed_plan_mode(warehouse, lineitem, orders, spark):
    """read.plan-mode=distributed forces manifest-DataFrame planning (the
    100 TB path) — pruning, scans, deletes and merges must behave
    identically to the driver-local planner."""
    t = warehouse.create_table("db.distplan", Schema.from_spark(lineitem.schema),
                               partition_by=["month(l_shipdate)"],
                               properties={"read.plan-mode": "distributed"})
    t.append(lineitem)
    assert t.new_scan().plan_entries_local() is None  # forced off
    cond = "l_shipdate >= TIMESTAMP '1998-01-01' AND l_discount > 0.05"
    assert t.to_df(filter=cond).count() == lineitem.filter(cond).count()
    pruned = len(t.new_scan().filter("l_shipdate >= TIMESTAMP '2001-01-01'").plan_files())
    total = len(t.new_scan().plan_files())
    assert 0 < pruned < total
    # row ops through the DF planner
    res = t.delete_where("l_shipdate < TIMESTAMP '1996-01-01'")
    want = lineitem.filter("l_shipdate >= TIMESTAMP '1996-01-01'").count()
    assert t.to_df().count() == want
    t.update({"l_returnflag": "'X'"}, "l_discount > 0.09")
    got = t.to_df(filter="l_returnflag = 'X'").count()
    assert got == lineitem.filter(
        "l_shipdate >= TIMESTAMP '1996-01-01' AND l_discount > 0.09").count()


def test_nested_struct_bounds_prune_files(warehouse, spark):
    """Struct-leaf stats (dotted paths) flow from Parquet footers into
    manifests and prune files on nested predicates."""
    from pyspark.sql import functions as F
    from incubator_iceberg_spark.schema import Schema
    df = spark.range(0, 400).select(
        F.col("id"),
        F.struct(F.col("id").alias("col1"),
                 F.concat(F.lit("s"), F.col("id")).alias("col3")).alias("nested"))
    t = warehouse.create_table("db.nested_bounds", Schema.from_spark(df.schema))
    for lo in range(0, 400, 100):
        t.append(df.filter((F.col("id") >= lo) & (F.col("id") < lo + 100)).coalesce(1))
    all_files = len(t.new_scan().plan_files())
    pruned = len(t.new_scan().filter("nested.col1 >= 300").plan_files())
    assert pruned < all_files
    assert t.to_df(filter="nested.col1 >= 300").count() == 100
    row = t.metadata_table("files").select("lower_bounds").first()
    assert "nested.col1" in row["lower_bounds"].asDict()


def test_orc_bounds_prune_files(warehouse, orders, spark):
    """ORC writes collect column bounds via a Spark stats job, so metrics
    pruning skips ORC files just like Parquet ones."""
    from incubator_iceberg_spark.schema import Schema
    t = warehouse.create_table("db.orc_bounds", Schema.from_spark(orders.schema),
                               properties={"write.format.default": "orc"})
    half = orders.count() // 2
    lo = orders.orderBy("o_orderkey").limit(half)
    hi = orders.orderBy(F.desc("o_orderkey")).limit(half)
    t.append(lo.coalesce(1))
    t.append(hi.coalesce(1))
    split = orders.orderBy(F.desc("o_orderkey")).limit(1).collect()[0]["o_orderkey"]
    all_files = len(t.new_scan().plan_files())
    pruned = len(t.new_scan().filter(f"o_orderkey >= {split}").plan_files())
    assert pruned < all_files, (pruned, all_files)
    row = t.metadata_table("files").select("lower_bounds", "null_counts").first()
    assert row["lower_bounds"]["o_orderkey"] is not None


def test_changelog_row_level_diff(warehouse, orders, spark):
    """CDC scan: append → delete → update yields exactly the net row
    changes; compaction (replace) contributes nothing."""
    from incubator_iceberg_spark.schema import Schema
    t = warehouse.create_table("db.cdc", Schema.from_spark(orders.schema))
    t.append(orders)
    s0 = t.metadata.current_snapshot_id
    t.delete_where("o_totalprice > 250000")
    t.update({"o_orderstatus": "'X'"}, "o_orderkey % 100 = 0")
    t.rewrite_data_files(min_input_files=2)  # replace snapshot: no changes
    cl = t.changelog(from_snapshot_id=s0)
    deleted = orders.filter("o_totalprice > 250000").count()
    updated = orders.filter(
        "o_totalprice <= 250000 AND o_orderkey % 100 = 0 AND o_orderstatus != 'X'").count()
    assert cl.filter("_change_type = 'delete'").count() == deleted + updated
    assert cl.filter("_change_type = 'insert'").count() == updated
    # the update commit's ordinal follows the delete commit's
    assert cl.select("_change_ordinal").distinct().count() == 2
    # full-range changelog (from=None) includes the initial append
    full = t.changelog()
    assert full.filter("_change_type = 'insert'").count() == orders.count() + updated


def test_changelog_update_images(warehouse, orders, spark):
    """changelog_with_updates: a CoW UPDATE's delete+insert halves pair
    into update_preimage/update_postimage per identifier key within one
    commit; pure deletes/inserts keep their types; MoR deletes pair the
    same way; ambiguous keys (2 inserts, 1 delete) are left unpaired."""
    from pyspark.sql import functions as F

    from incubator_iceberg_spark.schema import Schema
    t = warehouse.create_table("db.cdc_upd", Schema.from_spark(orders.schema))
    t.append(orders)
    s0 = t.metadata.current_snapshot_id
    # commit 1: CoW update (delete+insert pairs), commit 2: pure delete
    # (MoR), commit 3: pure insert
    t.update({"o_totalprice": "o_totalprice * 2"}, "o_orderkey % 7 = 0")
    t.delete_where("o_orderkey % 5 = 0 AND o_orderkey % 7 != 0",
                   mode="merge-on-read")
    fresh = orders.limit(10).withColumn("o_orderkey",
                                        F.col("o_orderkey") + 7_000_000)
    t.append(fresh)
    cl = t.changelog_with_updates(identifier_cols=["o_orderkey"],
                                  from_snapshot_id=s0)
    n_upd = orders.filter("o_orderkey % 7 = 0").count()
    n_del = orders.filter("o_orderkey % 5 = 0 AND o_orderkey % 7 != 0").count()
    got = {r["_change_type"]: r["n"] for r in
           cl.groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
    assert got == {"update_preimage": n_upd, "update_postimage": n_upd,
                   "delete": n_del, "insert": 10}, got
    # pre-images carry the OLD price, post-images the doubled one
    pre = cl.filter("_change_type = 'update_preimage'")
    post = cl.filter("_change_type = 'update_postimage'")
    j = (pre.select("o_orderkey", F.col("o_totalprice").alias("old"))
         .join(post.select("o_orderkey", F.col("o_totalprice").alias("new")),
               "o_orderkey"))
    assert j.filter("abs(new - 2*old) > 1e-6").count() == 0
    # identifier fields default: set on the table, omit the arg
    t2 = warehouse.create_table(
        "db.cdc_upd2", Schema.from_spark(orders.schema),
        identifier_fields=["o_orderkey"])
    t2.append(orders.limit(20))
    s1 = t2.metadata.current_snapshot_id
    t2.update({"o_orderstatus": "'Z'"}, "o_orderkey % 2 = 0")
    cl2 = t2.changelog_with_updates(from_snapshot_id=s1)
    assert cl2.filter("_change_type LIKE 'update_%'").count() > 0
    assert cl2.filter("_change_type IN ('insert','delete')").count() == 0


def test_changelog_update_images_ambiguous_keys(warehouse, spark):
    """Duplicate identifier keys in one commit must NOT pair: with two
    inserts and one delete for a key in the same snapshot, all three
    keep their plain types (never guess which insert is the post-image)."""
    from incubator_iceberg_spark.schema import Schema
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    t = warehouse.create_table("db.cdc_amb", Schema.from_spark(df.schema))
    t.append(df)
    s0 = t.metadata.current_snapshot_id
    # one commit: overwrite id=1 with TWO rows sharing the key
    t.overwrite(spark.createDataFrame([(1, "x"), (1, "y")],
                                      "id long, v string"), "id = 1")
    cl = t.changelog_with_updates(identifier_cols=["id"],
                                  from_snapshot_id=s0)
    rows = {(r["id"], r["v"], r["_change_type"]) for r in cl.collect()}
    assert rows == {(1, "a", "delete"), (1, "x", "insert"),
                    (1, "y", "insert")}, rows


def test_changelog_update_images_null_keys_never_pair(warehouse, spark):
    """A delete and an insert that both carry a NULL identifier are two
    unrelated rows, not an update — NULL keys stay plain typed."""
    from incubator_iceberg_spark.schema import Schema
    df = spark.createDataFrame([(None, "old"), (7, "keep")],
                               "id long, v string")
    t = warehouse.create_table("db.cdc_null", Schema.from_spark(df.schema))
    t.append(df)
    s0 = t.metadata.current_snapshot_id
    t.overwrite(spark.createDataFrame([(None, "new")], "id long, v string"),
                "id IS NULL")
    cl = t.changelog_with_updates(identifier_cols=["id"],
                                  from_snapshot_id=s0)
    rows = {(r["v"], r["_change_type"]) for r in cl.collect()}
    assert rows == {("old", "delete"), ("new", "insert")}, rows


def test_fast_count_and_min_max_metadata_only(warehouse, orders, spark):
    from incubator_iceberg_spark.schema import Schema
    t = warehouse.create_table("db.fastagg", Schema.from_spark(orders.schema),
                               partition_by=["month(o_orderdate)"])
    t.append(orders)
    n = orders.count()
    assert t.fast_count() == n
    # partition-aligned predicate: strictly decidable per file
    want = orders.filter("o_orderdate >= TIMESTAMP '1997-01-01'").count()
    assert t.fast_count("o_orderdate >= TIMESTAMP '1997-01-01'") == want
    # row-level predicate: files only MIGHT match → not answerable
    assert t.fast_count("o_totalprice > 100000") is None
    lo, hi = t.fast_min_max("o_orderkey")
    row = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
    assert (lo, hi) == (row[0], row[1])
    assert t.fast_min_max("o_orderpriority") is None  # string: truncated bounds
    # v2 deletes void metadata-only answers
    t.add_equality_deletes(orders.limit(5).select("o_orderkey"), ["o_orderkey"])
    assert t.fast_count() is None
    assert t.fast_min_max("o_orderkey") is None


def test_count_non_null_pushdown(warehouse, orders, spark):
    """COUNT(col) from manifest value/null counts: aligned predicates
    fold entirely from metadata; NULLs are excluded exactly; delete
    debt falls back to scanning but stays exact."""
    from incubator_iceberg_spark.schema import Schema
    base = orders.withColumn(
        "maybe", F.when(F.col("o_orderkey") % 7 == 0,
                        F.col("o_totalprice")))
    t = warehouse.create_table("db.cnn", Schema.from_spark(base.schema),
                               partition_by=["month(o_orderdate)"])
    t.append(base)
    want_all = base.filter("maybe IS NOT NULL").count()
    r = t.count_non_null("maybe")
    assert r["count"] == want_all and r["scanned_files"] == 0
    aligned = "o_orderdate >= TIMESTAMP '1997-01-01'"
    want = base.filter(aligned).filter("maybe IS NOT NULL").count()
    r = t.count_non_null("maybe", aligned)
    assert r["count"] == want and r["scanned_files"] == 0
    # row-level predicate: partial files scan, result still exact
    want = base.filter("o_totalprice > 100000") \
               .filter("maybe IS NOT NULL").count()
    r = t.count_non_null("maybe", "o_totalprice > 100000")
    assert r["count"] == want and r["scanned_files"] > 0
    # delete debt: conservative fallback, exact
    t.delete_where("o_orderkey % 11 = 0", mode="merge-on-read")
    live = base.filter("NOT (o_orderkey % 11 = 0)")
    r = t.count_non_null("maybe", aligned)
    assert r["count"] == live.filter(aligned) \
        .filter("maybe IS NOT NULL").count()
    assert r["metadata_only_files"] == 0
    # SQL facade routes COUNT(col) through the pushdown
    from incubator_iceberg_spark import sqlfacade
    got = sqlfacade.execute(
        warehouse, spark,
        "SELECT COUNT(maybe) AS c FROM db.cnn").collect()[0]["c"]
    assert got == live.filter("maybe IS NOT NULL").count()
    with pytest.raises(ValueError):
        t.count_non_null("nope")


def test_count_non_null_nested_column_takes_scan_path(warehouse, spark):
    """record_count may stand in for a missing value_count ONLY for a
    top-level primitive: an array column holds 0..N values per row, so
    substituting record_count would silently overcount — those files
    must take the scan path instead (table.py count_non_null guard)."""
    from incubator_iceberg_spark.schema import Schema
    base = spark.range(0, 100).select(
        F.col("id"),
        F.when(F.col("id") % 4 != 0,
               F.array(F.col("id"), F.col("id") * 2)).alias("vals"))
    t = warehouse.create_table("db.cnn_nested", Schema.from_spark(base.schema))
    t.append(base)
    want = base.filter("vals IS NOT NULL").count()
    r = t.count_non_null("vals")
    assert r["count"] == want == 75
    # the array column has no per-column value_counts, and record_count
    # substitution is barred for it: the file must have been scanned
    assert r["scanned_files"] > 0 and r["metadata_only_files"] == 0
    # top-level primitive on the same table still folds from metadata
    r = t.count_non_null("id")
    assert r["count"] == 100 and r["scanned_files"] == 0


def test_nested_bounds_prune_in_distributed_plan_mode(warehouse, spark):
    """The Spark-job planner resolves dotted bounds-struct field names
    (getField('nested.col1')) the same as the driver-local planner."""
    from pyspark.sql import functions as F
    from incubator_iceberg_spark.schema import Schema
    df = spark.range(0, 400).select(
        F.col("id"), F.struct(F.col("id").alias("col1")).alias("nested"))
    t = warehouse.create_table("db.nested_dist", Schema.from_spark(df.schema),
                               properties={"read.plan-mode": "distributed"})
    for lo in range(0, 400, 100):
        t.append(df.filter((F.col("id") >= lo) & (F.col("id") < lo + 100)).coalesce(1))
    assert len(t.new_scan().filter("nested.col1 >= 300").plan_files()) \
        < len(t.new_scan().plan_files())
    assert t.to_df(filter="nested.col1 >= 300").count() == 100


def test_metrics_modes_per_column(warehouse, orders, spark):
    """P17 MetricsModes: none drops counts+bounds, counts drops bounds
    only, full keeps untruncated bounds, truncate(N) shortens strings —
    and queries stay correct (pruning just degrades gracefully)."""
    from incubator_iceberg_spark.schema import Schema

    t = warehouse.create_table(
        "db.mmodes", Schema.from_spark(orders.schema),
        properties={
            "write.metadata.metrics.column.o_orderpriority": "none",
            "write.metadata.metrics.column.o_orderstatus": "counts",
            "write.metadata.metrics.column.o_totalprice": "full",
            "write.metadata.metrics.default": "truncate(4)",
        })
    t.append(orders)
    entry = t.new_scan().plan_entries_local()[0]
    lo, hi = entry["lower_bounds"], entry["upper_bounds"]
    assert lo.get("o_orderpriority") is None  # none: no bounds
    assert (entry.get("value_counts") or {}).get("o_orderpriority") is None
    assert lo.get("o_orderstatus") is None  # counts: counts but no bounds
    assert (entry.get("value_counts") or {}).get("o_orderstatus") is not None
    assert lo.get("o_totalprice") is not None  # full: bounds kept
    # queries on degraded columns remain correct (row filter still applies)
    want = orders.filter("o_orderpriority = '1-URGENT'").count()
    assert t.to_df(filter="o_orderpriority = '1-URGENT'").count() == want
    want = orders.filter("o_orderstatus = 'O'").count()
    assert t.to_df(filter="o_orderstatus = 'O'").count() == want
    # truncation to 4 chars still prunes correctly on the default columns
    want = orders.filter("o_totalprice > 200000").count()
    assert t.to_df(filter="o_totalprice > 200000").count() == want


def test_data_and_delete_files_metadata_tables(warehouse, orders, spark):
    from incubator_iceberg_spark.schema import Schema

    t = warehouse.create_table("db.mt_split", Schema.from_spark(orders.schema))
    t.append(orders)
    t.delete_where("o_orderkey % 50 = 0", mode="merge-on-read")
    data = t.metadata_table("data_files")
    dels = t.metadata_table("delete_files")
    n_all = t.metadata_table("files").count()
    assert data.count() + dels.count() == n_all
    assert dels.count() >= 1
    want_deleted = orders.filter("o_orderkey % 50 = 0").count()
    assert sum(r["record_count"] for r in dels.collect()) == want_deleted


def test_range_distribution_clusters_sort_key(warehouse, orders, spark):
    """O1: sort_by + range distribution writes files with non-overlapping
    sort-key bounds (repartitionByRange includes the sort columns, the
    SparkWrite requiredOrdering analog)."""
    from incubator_iceberg_spark.schema import Schema
    t = warehouse.create_table(
        "db.range_sorted", Schema.from_spark(orders.schema),
        sort_by=["o_custkey"],
        properties={"write.distribution-mode": "range",
                    "write.distribution.partition-count": "6"})
    t.append(orders)
    ents = [e for e in t.new_scan().plan_entries_local()
            if (e.get("content") or 0) == 0]
    rng = sorted((e["lower_bounds"]["o_custkey"],
                  e["upper_bounds"]["o_custkey"]) for e in ents)
    assert len(rng) > 1
    assert all(l2 >= u1 for (_, u1), (l2, _) in zip(rng, rng[1:]))
    assert t.to_df().count() == orders.count()


def test_plan_tasks_combines_small_files(warehouse, orders, spark):
    """planTasks (TableScanUtil analog): many small files combine into
    few tasks, bounded by the open-file-cost weighting — never one task
    per file, never one giant task."""
    from incubator_iceberg_spark.schema import Schema
    t = warehouse.create_table("db.tasks_small", Schema.from_spark(orders.schema))
    for i in range(8):
        t.append(orders.filter(f"o_orderkey % 8 = {i}"))
    n_files = len(t.new_scan().plan_files())
    assert n_files >= 8
    tasks = t.new_scan().plan_tasks()
    # 8+ tiny files at 4 MB open cost pack 32 per 128 MB task
    assert 1 <= len(tasks) < n_files or n_files <= 1
    covered = {s["file_path"] for g in tasks for s in g}
    assert len(covered) == n_files


def test_plan_tasks_splits_large_files_and_packs_lookback(warehouse, orders, spark):
    from incubator_iceberg_spark.schema import Schema
    t = warehouse.create_table("db.tasks_split", Schema.from_spark(orders.schema),
                               properties={
                                   "read.split.target-size": "4096",
                                   "read.split.open-file-cost": "1024",
                                   "read.split.planning-lookback": "2"})
    t.append(orders)
    sizes = {e["file_path"]: e["file_size_bytes"]
             for e in t.new_scan().plan_entries_local()}
    tasks = t.new_scan().plan_tasks()
    # every byte of every file covered exactly once, contiguous ranges
    per_file: dict = {}
    for g in tasks:
        for s in g:
            per_file.setdefault(s["file_path"], []).append(
                (s["start"], s["length"]))
    for path, spans in per_file.items():
        spans.sort()
        assert spans[0][0] == 0
        assert all(a + ln == b for (a, ln), (b, _) in zip(spans, spans[1:]))
        assert sum(ln for _, ln in spans) == sizes[path]
        # no split exceeds the target size
        assert all(ln <= 4096 for _, ln in spans)
    # packing respects the target: no task's weight exceeds it (single
    # oversized splits excepted, impossible here since split==target)
    for g in tasks:
        if len(g) > 1:
            assert sum(max(s["length"], 1024) for s in g) <= 4096


def test_incremental_read_survives_manifest_merge(warehouse, spark):
    """Regression: when fast-append pressure triggers the small-manifest
    merge, the merging commit's OWN entries must stay status=ADDED in
    the combined manifest (only previously-committed entries flip to
    EXISTING) — flipping them all made that commit's rows invisible to
    incremental scans and the streaming source."""
    df = spark.range(0, 10).selectExpr("id")
    t = _ingest(warehouse, "db.inc_merge", df.limit(0),
                properties={"commit.manifest.min-count-to-merge": "4"})
    s0 = t.metadata.current_snapshot_id
    for i in range(6):  # crosses the merge threshold more than once
        t.append(spark.range(i * 10, i * 10 + 10).selectExpr("id")
                 .coalesce(1))
    t.refresh()
    cur = t.metadata.current_snapshot_id
    got = t.new_scan().appends_between(s0, cur).to_df()
    assert got.count() == 60
    assert got.agg(F.sum("id")).collect()[0][0] == sum(range(60))
    t.update_properties({"read.plan-mode": "distributed"})
    t.refresh()
    assert t.new_scan().appends_between(s0, cur).to_df().count() == 60


def test_randomized_predicates_match_raw_spark(warehouse, spark):
    """Fuzz the pruning stack end-to-end: random predicates over tables
    holding NULLs, NaNs, negative numbers, and duplicate strings must
    return EXACTLY the rows raw Spark returns on the same data —
    metrics/partition pruning may only ever skip files with no matching
    rows.  Seeded, so failures reproduce."""
    import random
    rng = random.Random(99)
    rows = []
    for i in range(400):
        k = rng.randrange(-3, 5)
        s = rng.choice(["alpha", "beta", "gamma", "be", "", "Zeta"])
        d = rng.choice([None, float("nan"), -1.5, 0.0, 2.25, 1e6,
                        rng.uniform(-10, 10)])
        rows.append((i, k, s, d))
    df = spark.createDataFrame(rows, "id long, k long, s string, d double")

    preds = []
    for _ in range(18):
        c = []
        for _ in range(rng.randrange(1, 3)):
            c.append(rng.choice([
                f"k = {rng.randrange(-3, 5)}",
                f"k > {rng.randrange(-4, 4)}",
                f"id <= {rng.randrange(0, 400)}",
                f"s = '{rng.choice(['alpha', 'be', '', 'Zeta'])}'",
                f"s LIKE '{rng.choice(['al', 'be', 'Z'])}%'",
                "s IN ('alpha', 'be')",
                f"d > {rng.choice([-2, 0, 3])}",
                f"d <= {rng.choice([-1, 2.25])}",
                "d IS NULL",
                "d IS NOT NULL",
            ]))
        preds.append(f" {rng.choice(['AND', 'OR'])} ".join(c))

    for variant, part, props in (
            ("plain", None, None), ("ident", ["k"], None),
            ("bucket", [("id", "bucket[4]")], None),
            # same predicates through the DISTRIBUTED planner path
            ("ident_dist", ["k"], {"read.plan-mode": "distributed"})):
        from incubator_iceberg_spark.schema import Schema
        t = warehouse.create_table(f"db.fuzz_{variant}",
                                   Schema.from_spark(df.schema),
                                   partition_by=part,
                                   properties=props)
        t.append(df.repartition(6))
        total_files = len(t.new_scan().plan_files())
        for p in preds:
            want = {r.id for r in df.filter(p).collect()}
            got = {r.id for r in t.to_df(filter=p).collect()}
            assert got == want, (
                f"{variant}: predicate {p!r}: engine {len(got)} rows vs "
                f"raw spark {len(want)}; diff sample "
                f"{sorted(got ^ want)[:5]}")
        assert total_files >= 4  # the fuzz actually spans multiple files


def test_randomized_timestamp_partition_predicates(warehouse, spark):
    """Seeded timestamp fuzz over month()/day() partition transforms:
    boundary-sensitive range predicates (µs extremes included) must
    match raw Spark exactly — the transform-ordinal projection and
    bounds pruning may only skip files with no matching rows."""
    import datetime
    import random
    rng = random.Random(123)
    rows = []
    for i in range(300):
        ts = datetime.datetime(1996 + rng.randrange(0, 3),
                               rng.randrange(1, 13), rng.randrange(1, 28),
                               rng.randrange(0, 24), 30, 15,
                               rng.choice([0, 1, 999999]))
        rows.append((i, ts, rng.uniform(-100, 100)))
    df = spark.createDataFrame(rows, "id long, ts timestamp, v double")
    preds = []
    for _ in range(8):
        y, m, d = (1996 + rng.randrange(0, 3), rng.randrange(1, 13),
                   rng.randrange(1, 28))
        lit = f"TIMESTAMP '{y:04d}-{m:02d}-{d:02d} 12:00:00'"
        preds.append(rng.choice([
            f"ts >= {lit}", f"ts < {lit}", f"ts = {lit}",
            f"ts >= {lit} OR v > 50",
        ]))
    for variant, part, props in (("month", ["month(ts)"], None),
                                 ("day", ["day(ts)"], None),
                                 ("month_dist", ["month(ts)"],
                                  {"read.plan-mode": "distributed"})):
        t = warehouse.create_table(f"db.tsfuzz_{variant}",
                                   Schema.from_spark(df.schema),
                                   partition_by=part, properties=props)
        t.append(df.repartition(4))
        for p in preds:
            want = {r.id for r in df.filter(p).collect()}
            got = {r.id for r in t.to_df(filter=p).collect()}
            assert got == want, f"{variant}: {p!r}: diff {sorted(got ^ want)[:4]}"


def test_count_non_null_struct_leaf_folds_from_metadata(warehouse, spark):
    """A struct-nested primitive leaf has exactly one value slot per row
    (structs don't repeat), so COUNT(meta.author) folds from the nested
    dotted-path value/null counts with zero data files read — while a
    leaf under a LIST still takes the scan path (0..N values per row)."""
    from incubator_iceberg_spark.schema import Schema
    df = spark.createDataFrame(
        [(1, ("alice", 7)), (2, (None, 8)), (3, ("bob", 9))],
        "id long, meta struct<author: string, n: long>")
    t = warehouse.create_table("db.cnn_struct", Schema.from_spark(df.schema))
    t.append(df)
    r = t.count_non_null("meta.author")
    assert r["count"] == 2 and r["scanned_files"] == 0
    r = t.count_non_null("meta.n")
    assert r["count"] == 3 and r["scanned_files"] == 0
    # filtered variant still folds where the predicate is file-strict
    r = t.count_non_null("meta.author", "id >= 1")
    assert r["count"] == 2 and r["scanned_files"] == 0
