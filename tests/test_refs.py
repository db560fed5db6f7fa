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
