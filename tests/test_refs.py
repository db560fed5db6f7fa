"""Tier 2/3: branch & tag refs — SnapshotRef analog (create_branch/
create_tag/drop_ref, branch writes, scan-at-ref, fast-forward, ref-aware
snapshot expiry)."""

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark import metadata as MD
from incubator_iceberg_spark.schema import Schema


def _ingest(warehouse, name, df, **kw):
    t = warehouse.create_table(name, Schema.from_spark(df.schema), **kw)
    t.append(df)
    return t


def test_branch_write_isolated_from_main(warehouse, orders):
    t = _ingest(warehouse, "db.br1", orders.filter("o_orderkey % 2 = 0"))
    n_main = t.to_df().count()
    t.create_branch("audit")
    t.append(orders.filter("o_orderkey % 2 != 0"), branch="audit")
    # main unchanged; branch sees both halves
    assert t.to_df().count() == n_main
    assert t.to_df(ref="audit").count() == orders.count()
    # second branch append stacks on the branch head, not main
    extra = orders.limit(10).withColumn("o_orderkey", F.col("o_orderkey") + 5_000_000)
    t.append(extra, branch="audit")
    assert t.to_df(ref="audit").count() == orders.count() + 10
    assert t.to_df().count() == n_main


def test_fast_forward_main_to_branch(warehouse, orders):
    t = _ingest(warehouse, "db.br2", orders.filter("o_orderkey % 2 = 0"))
    t.create_branch("staging")
    t.append(orders.filter("o_orderkey % 2 != 0"), branch="staging")
    t.fast_forward("main", "staging")
    assert t.to_df().count() == orders.count()
    # reloaded table agrees (persisted through metadata swap)
    t2 = warehouse.load_table("db.br2")
    assert t2.to_df().count() == orders.count()


def test_fast_forward_rejects_non_ancestor(warehouse, orders):
    t = _ingest(warehouse, "db.br3", orders.limit(50))
    t.create_branch("b")
    # diverge: commit to main AFTER branching
    t.append(orders.limit(5).withColumn("o_orderkey", F.col("o_orderkey") + 9_000_000))
    with pytest.raises(MD.ValidationException):
        t.fast_forward("main", "b")  # b's head is behind main, not ahead


def test_tag_pins_snapshot_and_rejects_writes(warehouse, orders):
    t = _ingest(warehouse, "db.tag1", orders.filter("o_orderkey % 2 = 0"))
    n1 = t.to_df().count()
    t.create_tag("v1")
    t.append(orders.filter("o_orderkey % 2 != 0"))
    assert t.to_df().count() == orders.count()
    assert t.to_df(ref="v1").count() == n1
    with pytest.raises(MD.ValidationException):
        t.append(orders.limit(1), branch="v1")


def test_expire_keeps_ref_reachable_snapshots(warehouse, orders):
    t = _ingest(warehouse, "db.exref", orders.limit(100))
    s1 = t.metadata.current_snapshot_id
    t.create_tag("keepme", s1)
    t.append(orders.limit(50).withColumn("o_orderkey", F.col("o_orderkey") + 1_000_000))
    t.append(orders.limit(50).withColumn("o_orderkey", F.col("o_orderkey") + 2_000_000))
    t.expire_snapshots(older_than_ms=MD.now_ms() + 10_000, retain_last=1)
    # tagged snapshot survived expiry and still reads
    assert t.metadata.snapshot_by_id(s1) is not None
    assert t.to_df(ref="keepme").count() == 100
    # drop the tag → expiry may reclaim it
    t.drop_ref("keepme")
    t.expire_snapshots(older_than_ms=MD.now_ms() + 10_000, retain_last=1)
    assert t.metadata.snapshot_by_id(s1) is None


def test_refs_metadata_table(warehouse, orders):
    t = _ingest(warehouse, "db.refmeta", orders.limit(20))
    t.create_branch("dev")
    t.create_tag("v0")
    rows = {r["name"]: r for r in t.metadata_table("refs").collect()}
    assert rows["main"]["type"] == "branch"
    assert rows["dev"]["type"] == "branch"
    assert rows["v0"]["type"] == "tag"
    assert rows["dev"]["snapshot_id"] == t.metadata.current_snapshot_id


def test_concurrent_branch_and_main_writers(warehouse, orders, spark):
    """Branch commits and main commits race through the same optimistic
    swap; all land, neither clobbers the other."""
    import threading
    t0 = _ingest(warehouse, "db.brconc", orders.limit(10))
    t0.create_branch("side")
    errs = []

    def main_writer(k):
        try:
            h = warehouse.load_table("db.brconc")
            h.append(orders.limit(5).withColumn(
                "o_orderkey", F.col("o_orderkey") + 100000 * k))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def branch_writer(k):
        try:
            h = warehouse.load_table("db.brconc")
            h.append(orders.limit(3).withColumn(
                "o_orderkey", F.col("o_orderkey") + 900000 * k), branch="side")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = ([threading.Thread(target=main_writer, args=(k,)) for k in (1, 2)]
               + [threading.Thread(target=branch_writer, args=(k,)) for k in (1, 2)])
    [th.start() for th in threads]
    [th.join() for th in threads]
    assert not errs
    t = warehouse.load_table("db.brconc")
    assert t.to_df().count() == 10 + 2 * 5
    assert t.to_df(ref="side").count() == 10 + 2 * 3


def test_branch_reads_after_schema_evolution(warehouse, orders):
    """Schema evolves AFTER branching: the branch head predates the new
    column; scans at the branch still read its snapshot correctly, and
    new branch appends use the evolved schema."""
    t = _ingest(warehouse, "db.brevo", orders.limit(100))
    t.create_branch("b")
    t.update_schema().add_column("o_channel", "string").commit()
    # branch read at old snapshot: column list follows CURRENT schema
    # with nulls for the new column (field-ID projection)
    df = t.to_df(ref="b")
    assert df.count() == 100
    if "o_channel" in df.columns:
        assert df.filter("o_channel IS NOT NULL").count() == 0
    # append to the branch post-evolution
    from pyspark.sql import functions as F
    t.append(orders.limit(10).withColumn("o_orderkey", F.col("o_orderkey") + 777000)
             .withColumn("o_channel", F.lit("b-era")), branch="b")
    got = t.to_df(ref="b")
    assert got.count() == 110
    assert got.filter("o_channel = 'b-era'").count() == 10


def test_cherry_pick_across_schema_rename(warehouse, spark):
    """An orphaned (rolled-back-past) append written under the OLD schema
    cherry-picks cleanly onto a table that renamed a column since: the
    entries keep their write-schema id, field-ID projection renders them
    under the new name, and filtered scans on the new name see them."""
    from incubator_iceberg_spark.schema import Schema
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    t = warehouse.create_table("db.cp_rename", Schema.from_spark(df.schema))
    t.append(df)
    s1 = t.metadata.current_snapshot_id
    t.append(spark.createDataFrame([(10, "x"), (11, "y")],
                                   "id long, name string"))
    s2 = t.metadata.current_snapshot_id
    t.set_current_snapshot(s1)
    t.update_schema().rename_column("name", "label").commit()
    t.append(spark.createDataFrame([(3, "c")], "id long, label string"))
    t.cherry_pick(s2)
    rows = {r["id"]: r["label"] for r in t.to_df().collect()}
    assert rows == {1: "a", 2: "b", 3: "c", 10: "x", 11: "y"}
    assert t.to_df(filter="label = 'x'").count() == 1


def test_cherry_pick_across_spec_evolution(warehouse, spark):
    """Cherry-picked old-spec entries keep their partition tuples; scans
    union both eras and prune each under its own spec."""
    from incubator_iceberg_spark.schema import Schema
    df = spark.createDataFrame([(i, i % 4) for i in range(20)],
                               "id long, grp long")
    t = warehouse.create_table("db.cp_spec", Schema.from_spark(df.schema),
                               partition_by=["grp"])
    t.append(df)
    s1 = t.metadata.current_snapshot_id
    t.append(spark.createDataFrame([(100 + i, i % 4) for i in range(8)],
                                   "id long, grp long"))
    s2 = t.metadata.current_snapshot_id
    t.set_current_snapshot(s1)
    t.update_spec([("id", "bucket[4]")])
    t.cherry_pick(s2)
    assert t.to_df().count() == 28
    assert t.to_df(filter="grp = 2").count() == 7
    assert t.to_df(filter="id >= 100").count() == 8


def test_cherry_pick_visible_to_incremental_reads(warehouse, spark):
    """Found by probing: cherry-picked entries kept the SOURCE commit's
    snapshot-id stamp, so the incremental filter (status=ADDED AND
    snapshot_id=committing id) never matched them — WAP-published rows
    silently vanished from appends_between and the streaming source.
    The entries must be re-stamped with the new commit."""
    from incubator_iceberg_spark.schema import Schema
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    t = warehouse.create_table("db.cp_inc", Schema.from_spark(df.schema))
    t.append(df)
    s1 = t.metadata.current_snapshot_id
    t.append(spark.createDataFrame([(10, "x")], "id long, s string"))
    s2 = t.metadata.current_snapshot_id
    t.set_current_snapshot(s1)
    t.append(spark.createDataFrame([(2, "b")], "id long, s string"))
    s3 = t.metadata.current_snapshot_id
    t.cherry_pick(s2)
    s4 = t.metadata.current_snapshot_id
    assert sorted(r["id"] for r in
                  t.new_scan().appends_between(s3, s4).to_df().collect()) \
        == [10]
    assert sorted(r["id"] for r in
                  t.new_scan().appends_between(s1, s4).to_df().collect()) \
        == [2, 10]


def test_cherry_pick_takes_new_sequence_number(warehouse, spark):
    """Re-applied files take the NEW commit's data sequence: an equality
    delete committed before the cherry-pick must NOT kill the re-added
    rows (the reference's sequence-number semantics for re-commits)."""
    from incubator_iceberg_spark.schema import Schema
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    t = warehouse.create_table("db.cp_seq", Schema.from_spark(df.schema))
    t.append(df)
    s1 = t.metadata.current_snapshot_id
    t.append(spark.createDataFrame([(10, "x")], "id long, s string"))
    s2 = t.metadata.current_snapshot_id
    t.set_current_snapshot(s1)
    # an eq delete on id=10 lands BEFORE the cherry-pick re-applies it
    t.add_equality_deletes(spark.createDataFrame([(10,)], "id long"), ["id"])
    t.cherry_pick(s2)
    assert sorted(r["id"] for r in t.to_df().collect()) == [1, 10]


def test_cherry_pick_of_ancestor_refuses(warehouse, spark):
    """Re-applying an already-published snapshot silently DUPLICATED its
    rows; the already-applied ancestor guard must refuse instead."""
    from incubator_iceberg_spark.metadata import ValidationException
    from incubator_iceberg_spark.schema import Schema
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    t = warehouse.create_table("db.cp_dup", Schema.from_spark(df.schema))
    t.append(df)
    t.append(spark.createDataFrame([(2, "b")], "id long, s string"))
    s2 = t.metadata.current_snapshot_id
    with pytest.raises(ValidationException, match="ancestor"):
        t.cherry_pick(s2)
    assert sorted(r["id"] for r in t.to_df().collect()) == [1, 2]
