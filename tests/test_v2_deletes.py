"""Tier 3: format-v2 delete files — position + equality deletes applied on
read (J3; mirrors TestPositionFilter / TestEqualityFilter / DeleteFileIndex
sequence-scoping tests)."""

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark.schema import Schema


def _ingest(warehouse, name, df, **kw):
    t = warehouse.create_table(name, Schema.from_spark(df.schema), **kw)
    t.append(df)
    return t


def test_position_deletes(warehouse, orders, spark):
    t = _ingest(warehouse, "db.pd", orders)
    # delete rows 0 and 1 of the first data file
    path = t.new_scan().plan_files()[0][0]
    pos = spark.createDataFrame([(path, 0), (path, 1)], "file_path string, pos long")
    t.add_position_deletes(pos)
    assert t.to_df().count() == orders.count() - 2
    # deleted rows are exactly the first two of that file
    survivors = {r["o_orderkey"] for r in t.to_df().collect()}
    first_two = {r["o_orderkey"] for r in
                 spark.read.parquet(path).limit(2).collect()}
    assert first_two.isdisjoint(survivors)


def test_equality_deletes(warehouse, orders, spark):
    t = _ingest(warehouse, "db.ed", orders)
    victims = orders.filter("o_orderkey % 100 = 0").select("o_orderkey")
    t.add_equality_deletes(victims, ["o_orderkey"])
    want = orders.filter("o_orderkey % 100 != 0").count()
    assert t.to_df().count() == want
    assert t.to_df(filter="o_orderkey % 100 = 0").count() == 0


def test_equality_delete_write_coalesces_input_splits(warehouse, orders, spark):
    """The eq-keys write must not inherit the upstream split count: a
    keys DF spread over many partitions still lands as ONE advisory-
    sized eq file (REBALANCE before the write), so planning cost stays
    bounded by key bytes, not by the source scan's parallelism."""
    t = _ingest(warehouse, "db.ed_coalesce", orders)
    victims = (orders.filter("o_orderkey % 100 = 0")
               .select("o_orderkey").repartition(8))
    t.add_equality_deletes(victims, ["o_orderkey"])
    from incubator_iceberg_spark.manifests import EQUALITY_DELETES
    from incubator_iceberg_spark.scan import TableScan
    _data, dels = TableScan(t, spark)._plan_split()
    eq_entries = [e for e in dels
                  if (e.get("content") or 0) == EQUALITY_DELETES]
    assert len(eq_entries) == 1
    # semantics unchanged by the layout
    assert t.to_df().count() == orders.filter("o_orderkey % 100 != 0").count()


def test_equality_delete_sequence_scoping(warehouse, orders, spark):
    """Rows appended AFTER the equality delete are NOT affected."""
    t = _ingest(warehouse, "db.seq", orders.limit(100))
    keys = [r["o_orderkey"] for r in orders.limit(100).select("o_orderkey").collect()[:5]]
    t.add_equality_deletes(
        spark.createDataFrame([(k,) for k in keys], "o_orderkey long"), ["o_orderkey"])
    assert t.to_df().count() == 95
    # re-append the same 5 keys: newer sequence number → survive the delete
    readd = orders.limit(100).filter(F.col("o_orderkey").isin(keys))
    t.append(readd)
    assert t.to_df().count() == 100


def test_position_deletes_with_filter_and_timetravel(warehouse, orders, spark):
    t = _ingest(warehouse, "db.pdt", orders)
    s1 = t.metadata.current_snapshot_id
    path = t.new_scan().plan_files()[0][0]
    pos = spark.createDataFrame([(path, i) for i in range(10)],
                                "file_path string, pos long")
    t.add_position_deletes(pos)
    # filters still apply on top of delete application
    cond = "o_totalprice > 0"
    assert t.to_df(filter=cond).count() == orders.count() - 10
    # time travel BEFORE the delete sees all rows
    assert t.to_df(snapshot_id=s1).count() == orders.count()


def test_compaction_after_deletes_preserves_result(warehouse, orders, spark):
    t = _ingest(warehouse, "db.cd", orders)
    victims = orders.filter("o_orderkey % 7 = 0").select("o_orderkey")
    t.add_equality_deletes(victims, ["o_orderkey"])
    want = t.to_df().count()
    # CoW delete of everything matching a predicate rewrites files and the
    # result stays stable
    assert want == orders.filter("o_orderkey % 7 != 0").count()


def test_compaction_applies_delete_files(warehouse, orders, spark):
    """Compaction must not resurrect rows hidden by delete files."""
    t = _ingest(warehouse, "db.cdel", orders.limit(0))
    for i in range(4):
        t.append(orders.filter(f"o_orderkey % 4 = {i}"))
    victims = orders.filter("o_orderkey % 10 = 0").select("o_orderkey")
    t.add_equality_deletes(victims, ["o_orderkey"])
    want = orders.filter("o_orderkey % 10 != 0").count()
    assert t.to_df().count() == want
    res = t.rewrite_data_files(min_input_files=2)
    assert res["rewritten_files"] > 0
    assert t.to_df().count() == want  # still gone after rewrite


def test_cow_delete_applies_delete_files(warehouse, orders, spark):
    """CoW DELETE rewrite must not resurrect eq-deleted rows."""
    t = _ingest(warehouse, "db.cowdel", orders)
    keys = orders.filter("o_orderkey % 11 = 0").select("o_orderkey")
    t.add_equality_deletes(keys, ["o_orderkey"])
    n_after_eq = t.to_df().count()
    t.delete_where("o_totalprice > 200000")
    want = orders.filter("o_orderkey % 11 != 0 AND o_totalprice <= 200000").count()
    assert t.to_df().count() == want


def test_update_applies_delete_files(warehouse, orders, spark):
    t = _ingest(warehouse, "db.upddel", orders)
    keys = orders.filter("o_orderkey % 13 = 0").select("o_orderkey")
    t.add_equality_deletes(keys, ["o_orderkey"])
    t.update({"o_orderstatus": "'X'"}, "o_totalprice < 50000")
    # eq-deleted rows must not reappear via the update rewrite
    assert t.to_df().count() == orders.filter("o_orderkey % 13 != 0").count()
    assert t.to_df(filter="o_orderkey % 13 = 0").count() == 0


def test_merge_applies_delete_files(warehouse, orders, spark):
    from incubator_iceberg_spark.row_ops import WhenMatched
    t = _ingest(warehouse, "db.mrgdel", orders)
    keys = orders.filter("o_orderkey % 17 = 0").select("o_orderkey")
    t.add_equality_deletes(keys, ["o_orderkey"])
    src = orders.limit(200).select("o_orderkey")
    t.merge(src, on=["o_orderkey"],
            when_matched=[WhenMatched(update={"o_orderstatus": "'M'"})])
    assert t.to_df().count() == orders.filter("o_orderkey % 17 != 0").count()
    assert t.to_df(filter="o_orderkey % 17 = 0").count() == 0


def test_remove_dangling_deletes(warehouse, orders, spark):
    t = _ingest(warehouse, "db.dangle", orders.limit(0))
    for i in range(4):
        t.append(orders.filter(f"o_orderkey % 4 = {i}"))
    t.add_equality_deletes(
        orders.filter("o_orderkey % 10 = 0").select("o_orderkey"), ["o_orderkey"])
    want = orders.filter("o_orderkey % 10 != 0").count()
    # still referenced: nothing to remove yet
    assert t.remove_dangling_deletes()["removed_delete_files"] == 0
    # compaction applies + supersedes the delete (new files, higher seq)
    t.rewrite_data_files(min_input_files=2)
    res = t.remove_dangling_deletes()
    assert res["removed_delete_files"] >= 1
    assert t.to_df().count() == want
    # no delete entries remain in the scan plan
    _data, dels = t.new_scan()._plan_split()
    assert dels == []


def test_rewrite_position_deletes_compacts_and_drops_dead(warehouse, orders, spark):
    """Many small position-delete files → one consolidated file; tuples
    referencing compacted-away data files are dropped; reads unchanged."""
    from incubator_iceberg_spark import manifests as MF
    t = _ingest(warehouse, "db.posrw", orders.coalesce(2))
    files = [p for p, _ in t.new_scan().plan_files()]
    # three separate delete commits → three pos-delete files
    for k in range(3):
        pos = spark.createDataFrame([(files[0], i) for i in range(k * 5, k * 5 + 5)],
                                    "file_path string, pos long").coalesce(1)
        t.add_position_deletes(pos)
    want = t.to_df().count()
    _data, dels = t.new_scan()._plan_split()
    assert len([e for e in dels if e["content"] == MF.POSITION_DELETES]) == 3
    res = t.rewrite_position_deletes()
    assert res["rewritten_delete_files"] == 3
    assert res["added_delete_files"] == 1
    assert res["kept_tuples"] == 15 and res["dropped_tuples"] == 0
    _data, dels = t.new_scan()._plan_split()
    assert len([e for e in dels if e["content"] == MF.POSITION_DELETES]) == 1
    assert t.to_df().count() == want

    # compact the data: old paths die; delete tuples become dead weight
    for i in range(4):
        t.append(orders.limit(10).coalesce(1))
    t.rewrite_data_files(min_input_files=2)
    res = t.rewrite_position_deletes()
    # every tuple referenced a rewritten (dead) path or lost seq scope
    assert res["kept_tuples"] == 0 and res["added_delete_files"] == 0
    _data, dels = t.new_scan()._plan_split()
    assert len([e for e in dels if e["content"] == MF.POSITION_DELETES]) == 0


def test_delete_mor_writes_position_deletes(warehouse, orders, spark):
    """Merge-on-read DELETE: matching rows vanish from reads without any
    data-file rewrite — only delete files are added."""
    t = _ingest(warehouse, "db.mor_del", orders)
    files_before = {p for p, *_ in t.new_scan().plan_files()}
    res = t.delete_where("o_orderkey % 37 = 0", mode="merge-on-read")
    assert res["mode"] == "merge-on-read"
    assert res["delete_files_written"] >= 1
    # data files untouched (no CoW rewrite)
    files_after = {p for p, *_ in t.new_scan().plan_files()}
    assert files_after == files_before
    want = orders.filter("o_orderkey % 37 != 0")
    assert t.to_df().count() == want.count()
    got = {r["o_orderkey"] for r in t.to_df().collect()}
    assert got == {r["o_orderkey"] for r in want.collect()}


def test_delete_mor_strict_files_still_metadata_drop(warehouse, orders, spark):
    """A partition-aligned MoR delete should still drop whole files via
    metadata, not enumerate every row position."""
    t = _ingest(warehouse, "db.mor_del_strict", orders,
                partition_by=["year(o_orderdate)"])
    res = t.delete_where("o_orderdate >= TIMESTAMP '1997-01-01'",
                         mode="merge-on-read")
    assert res["deleted_files"] >= 1
    assert res["delete_files_written"] == 0
    want = orders.filter("o_orderdate < TIMESTAMP '1997-01-01'").count()
    assert t.to_df().count() == want


def test_delete_mor_via_table_property(warehouse, orders, spark):
    t = _ingest(warehouse, "db.mor_prop", orders)
    t.update_properties({"write.delete.mode": "merge-on-read"})
    res = t.delete_where("o_totalprice > 250000")
    assert res["mode"] == "merge-on-read"
    assert t.to_df().count() == orders.filter("o_totalprice <= 250000").count()


def test_update_mor_one_rowdelta_commit(warehouse, orders, spark):
    t = _ingest(warehouse, "db.mor_upd", orders)
    files_before = {p for p, *_ in t.new_scan().plan_files()}
    snaps_before = len(t.snapshots())
    res = t.update({"o_orderpriority": "'X-URGENT'"},
                   "o_totalprice < 50000", mode="merge-on-read")
    assert res["mode"] == "merge-on-read"
    assert res["delete_files_written"] >= 1 and res["staged_files"] >= 1
    assert len(t.snapshots()) == snaps_before + 1  # one atomic RowDelta
    # original data files still live (plus the new update files)
    files_after = {p for p, *_ in t.new_scan().plan_files()}
    assert files_before <= files_after
    # result matches SQL UPDATE semantics
    got = t.to_df().groupBy("o_orderpriority").count().collect()
    n_updated = orders.filter("o_totalprice < 50000").count()
    assert {r["o_orderpriority"]: r["count"] for r in got}["X-URGENT"] >= 1
    assert t.to_df().filter(
        "o_totalprice < 50000 AND o_orderpriority != 'X-URGENT'").count() == 0
    assert t.to_df().count() == orders.count()


def test_update_mor_then_compaction_resolves(warehouse, orders, spark):
    """Compaction after MoR delete+update folds the delete files away and
    preserves the visible result."""
    t = _ingest(warehouse, "db.mor_compact", orders)
    t.delete_where("o_orderkey % 50 = 0", mode="merge-on-read")
    t.update({"o_totalprice": "o_totalprice * 2"},
             "o_orderkey % 7 = 0", mode="merge-on-read")
    before = {(r["o_orderkey"], r["o_totalprice"])
              for r in t.to_df().collect()}
    t.rewrite_data_files()
    after = {(r["o_orderkey"], r["o_totalprice"])
             for r in t.to_df().collect()}
    assert before == after


def test_mor_delete_writes_far_fewer_bytes_than_cow(warehouse, orders, spark):
    """The point of merge-on-read: a ~1%-selectivity delete writes >=5x
    fewer bytes than the CoW rewrite of every touched file."""
    t_cow = _ingest(warehouse, "db.bytes_cow", orders)
    t_mor = _ingest(warehouse, "db.bytes_mor", orders)
    pred = "o_orderkey % 97 = 0"  # ~1% of rows, touches every file
    t_cow.delete_where(pred, mode="copy-on-write")
    t_mor.delete_where(pred, mode="merge-on-read")
    cow_bytes = int(t_cow.current_snapshot().summary["added-files-size"])
    mor_bytes = int(t_mor.current_snapshot().summary["added-files-size"])
    assert mor_bytes > 0
    assert cow_bytes >= 5 * mor_bytes, (cow_bytes, mor_bytes)
    # and both end in the same visible state
    assert t_cow.to_df().count() == t_mor.to_df().count()


def test_concurrent_mor_deletes_both_commit(warehouse, orders, spark):
    """Two merge-on-read deletes race: both only ADD delete files (no data
    files removed), so the conflict validator lets the loser retry and the
    final state applies both predicates."""
    import threading

    t = _ingest(warehouse, "db.mor_race", orders)
    preds = ["o_orderkey % 31 = 0", "o_orderkey % 37 = 0"]
    errs = []

    def run(p):
        try:
            # separate Table handles: each writer refreshes independently
            warehouse.load_table("db.mor_race").delete_where(
                p, mode="merge-on-read")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=run, args=(p,)) for p in preds]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    want = orders.filter(
        "o_orderkey % 31 != 0 AND o_orderkey % 37 != 0").count()
    assert warehouse.load_table("db.mor_race").to_df().count() == want


def test_changelog_sees_mor_deletes(warehouse, orders, spark):
    """CDC changelog over a merge-on-read delete: the net diff between
    snapshots must report the position-deleted rows as 'delete' changes
    even though no data file was rewritten."""
    t = _ingest(warehouse, "db.mor_cdc", orders)
    s1 = t.metadata.current_snapshot_id
    t.delete_where("o_orderkey % 100 = 0", mode="merge-on-read")
    ch = t.changelog(from_snapshot_id=s1).collect()
    deleted = {r["o_orderkey"] for r in ch if r["_change_type"] == "delete"}
    want = {r["o_orderkey"] for r in
            orders.filter("o_orderkey % 100 = 0").collect()}
    assert deleted == want
    # the RowDelta commit emits ONLY deletes (no rewrite side-effects)
    assert all(r["_change_type"] == "delete" for r in ch)


def test_changelog_sees_mor_update(warehouse, orders, spark):
    """MoR UPDATE (position deletes + new data files in one RowDelta
    commit) shows as delete+insert pairs of only the changed rows."""
    t = _ingest(warehouse, "db.mor_cdc_upd", orders)
    s1 = t.metadata.current_snapshot_id
    t.update({"o_orderpriority": "'Z-TEST'"}, "o_orderkey % 500 = 0",
             mode="merge-on-read")
    ch = t.changelog(from_snapshot_id=s1).collect()
    want = {r["o_orderkey"] for r in
            orders.filter("o_orderkey % 500 = 0").collect()}
    dels = {r["o_orderkey"] for r in ch if r["_change_type"] == "delete"}
    ins = {r["o_orderkey"] for r in ch if r["_change_type"] == "insert"}
    assert dels == want and ins == want
    assert all(r["o_orderpriority"] == "Z-TEST" for r in ch
               if r["_change_type"] == "insert")
    assert all(r["o_orderpriority"] != "Z-TEST" for r in ch
               if r["_change_type"] == "delete")


def test_mor_delete_no_matching_rows_writes_nothing(warehouse, orders, spark):
    """Stats admit a file but no row matches: no empty delete files, no
    pointless snapshot."""
    t = _ingest(warehouse, "db.mor_empty", orders)
    snaps = len(t.snapshots())
    lo = orders.agg(F.min("o_totalprice")).collect()[0][0]
    hi = orders.agg(F.max("o_totalprice")).collect()[0][0]
    mid = (float(lo) + float(hi)) / 2
    res = t.delete_where(
        f"o_totalprice > {mid} AND o_totalprice < {mid}",  # unsatisfiable
        mode="merge-on-read")
    assert res["delete_files_written"] == 0
    assert res["deleted_rows"] == 0
    assert len(t.snapshots()) == snaps
    assert t.to_df().count() == orders.count()


def test_mor_update_no_matching_rows_writes_nothing(warehouse, orders, spark):
    t = _ingest(warehouse, "db.morupd_empty", orders)
    snaps = len(t.snapshots())
    res = t.update({"o_orderstatus": "'Q'"},
                   "o_totalprice < 0", mode="merge-on-read")
    assert res["delete_files_written"] == 0 and res["staged_files"] == 0
    assert len(t.snapshots()) == snaps


def test_snapshot_summary_separates_delete_content(warehouse, orders, spark):
    """SnapshotSummary semantics (core/.../SnapshotSummary.java): a
    RowDelta delete commit must NOT inflate data-file/record totals; delete
    content gets its own added-delete-files / added-position-deletes /
    added-equality-deletes keys and running totals."""
    t = _ingest(warehouse, "db.sumsplit", orders)
    base = t.current_snapshot().summary
    n = orders.count()
    assert int(base["total-records"]) == n
    assert int(base.get("total-delete-files", 0)) == 0

    victims = orders.filter("o_orderkey % 100 = 0").select("o_orderkey")
    n_victims = victims.count()
    t.add_equality_deletes(victims, ["o_orderkey"])
    s = t.current_snapshot().summary
    # data totals unchanged by a delete-file commit
    assert int(s["total-records"]) == n
    assert int(s["total-data-files"]) == int(base["total-data-files"])
    assert int(s["added-data-files"]) == 0
    assert int(s["added-records"]) == 0
    # delete accounting present and correct
    assert int(s["added-delete-files"]) >= 1
    assert int(s["added-equality-deletes"]) == n_victims
    assert int(s["total-delete-files"]) == int(s["added-delete-files"])
    assert int(s["total-equality-deletes"]) == n_victims

    path = t.new_scan().plan_files()[0][0]
    pos = spark.createDataFrame([(path, 0), (path, 1)],
                                "file_path string, pos long")
    t.add_position_deletes(pos)
    s2 = t.current_snapshot().summary
    assert int(s2["total-records"]) == n
    assert int(s2["added-position-deletes"]) == 2
    assert int(s2["total-position-deletes"]) == 2
    assert int(s2["total-equality-deletes"]) == n_victims
    assert int(s2["total-delete-files"]) == (int(s["total-delete-files"])
                                             + int(s2["added-delete-files"]))


def test_position_deletes_metadata_table(warehouse, spark):
    """PositionDeletesTable analog: contents of live delete files, empty
    before any MoR delete, exact (path, pos) tuples after."""
    from incubator_iceberg_spark.schema import Schema

    df = spark.createDataFrame([(i, f"p{i}") for i in range(100)],
                               "id long, payload string")
    t = warehouse.create_table("db.posmeta", Schema.from_spark(df.schema))
    t.append(df.orderBy("id").coalesce(1))
    empty = t.metadata_table("position_deletes")
    assert empty.columns == ["file_path", "pos", "delete_file_path"]
    assert empty.count() == 0

    t.delete_where("id % 10 = 3", mode="merge-on-read")
    rows = t.metadata_table("position_deletes").collect()
    assert sorted(r.pos for r in rows) == [3, 13, 23, 33, 43, 53, 63, 73, 83, 93]
    data_paths = {r.file_path for r in rows}
    data, dels = t.new_scan()._plan_split()
    live = {e["file_path"] for e in data}
    assert data_paths <= live
    assert all(r.delete_file_path not in live for r in rows)


def test_equality_deletes_survive_column_rename(warehouse, spark):
    """Regression: eq-delete parquets hold WRITE-TIME column names; the
    readers resolved them by CURRENT name, so after rename_column the
    key column read as all-NULL — deleted rows resurrected (and
    NULL-keyed rows vanished instead).  Both readers now resolve the
    delete columns by POSITION in equality_ids order (field-id
    semantics, like the data side's _project_to_current)."""
    from incubator_iceberg_spark import deletes as DEL
    from incubator_iceberg_spark.schema import Schema
    df = spark.range(0, 20).selectExpr("id", "cast(id % 5 as long) as v")
    t = warehouse.create_table("db.eq_ren", Schema.from_spark(df.schema))
    t.append(df)
    DEL.add_equality_deletes(
        t, spark.createDataFrame([(2,)], "v long"), ["v"], spark)
    t.refresh()
    t.update_schema().rename_column("v", "w").commit()
    t.refresh()
    got = t.to_df()
    assert got.count() == 16
    assert got.filter("w = 2").count() == 0
    # filter binding on the renamed name goes through the engine scan
    assert t.to_df(filter="w = 3").count() == 4
    # the JVM-free local path projects to current names and applies the
    # same deletes
    arr = t.to_arrow()
    assert arr.column_names == ["id", "w"]
    assert arr.num_rows == 16
    import pyarrow.compute as pc
    assert (pc.sum(pc.equal(arr["w"], 2)).as_py() or 0) == 0


def test_time_travel_uses_snapshot_schema_for_binding(warehouse, spark):
    """Time travel to a pre-rename snapshot binds filters against (and
    renders) THAT snapshot's schema; the current-snapshot scan uses the
    current schema even though DDL doesn't create snapshots."""
    from incubator_iceberg_spark.schema import Schema
    df = spark.range(0, 10).selectExpr("id", "cast(id % 5 as long) as v")
    t = warehouse.create_table("db.tt_ren", Schema.from_spark(df.schema))
    t.append(df)
    s_old = t.metadata.current_snapshot_id
    t.update_schema().rename_column("v", "w").commit()
    t.refresh()
    tt = t.to_df(snapshot_id=s_old, filter="v = 2")
    assert tt.columns == ["id", "v"] and tt.count() == 2
    assert t.to_df(filter="w = 2").count() == 2


@pytest.mark.parametrize("plan_mode", ["auto", "distributed", "dv",
                                       "spaced"])
def test_randomized_filtered_scans_with_mor_debt(warehouse, spark,
                                                 plan_mode, tmp_path):
    """Fuzz the delete-application stack: after a sequence of
    merge-on-read deletes, every filtered scan must equal raw Spark
    applied to (base minus deleted) — deleted rows may never resurrect
    under any filter (the r4 partition-pruning resurrection class), and
    live rows may never vanish.  The 'dv' variant runs the same drive
    with write.delete.format=dv: every delete lands as deletion-vector
    bitmaps and both the Spark and pyarrow read paths must agree.  The
    'spaced' variant runs the same drive in a warehouse whose path
    URI-escapes (round-8 resurrection class: escaped `_metadata` paths
    vs raw manifest paths)."""
    import random
    from incubator_iceberg_spark.schema import Schema
    if plan_mode == "spaced":
        from incubator_iceberg_spark import Catalog
        warehouse = Catalog(str(tmp_path / "wh space" / "x"), spark)
    rng = random.Random(7)
    rows = [(i, i % 12, ["red", "blue", "green"][i % 3],
             float(i % 50)) for i in range(600)]
    df = spark.createDataFrame(rows, "id long, m long, c string, v double")
    props = ({"read.plan-mode": plan_mode} if plan_mode == "distributed"
             else {"write.delete.format": "dv"} if plan_mode == "dv"
             else None)
    t = warehouse.create_table(f"db.fuzz_mor_{plan_mode}",
                               Schema.from_spark(df.schema),
                               partition_by=["m"], properties=props)
    t.append(df.repartition(4))

    deletes = ["c = 'red' AND m = 3", "v >= 40", "id % 97 = 5", "m = 7"]
    live = df
    for p in deletes:
        t.delete_where(p, mode="merge-on-read")
        live = live.where(f"NOT coalesce(({p}), false)")
    t.refresh()
    if plan_mode == "dv":
        from incubator_iceberg_spark import delete_vectors as DV
        from incubator_iceberg_spark.scan import TableScan
        dels = TableScan(t, spark)._plan_split()[1]
        assert dels and all(DV.is_dv_entry(e) for e in dels), dels

    filters = ["m = 3", "m >= 6", "c = 'red'", "v < 10", "id BETWEEN 100 AND 300",
               "m = 7 OR c = 'blue'", "v >= 40 OR id < 50", None]
    for q in filters:
        want = {r.id for r in (live.filter(q) if q else live).collect()}
        got = {r.id for r in (t.to_df(filter=q) if q else t.to_df()).collect()}
        assert got == want, (f"filter {q!r}: {len(got)} vs {len(want)}; "
                             f"diff {sorted(got ^ want)[:6]}")
    # and the local (pyarrow) path agrees on the full table
    arr_ids = set(t.to_arrow()["id"].to_pylist())
    assert arr_ids == {r.id for r in live.collect()}


# ------------------------------------------------- eq -> pos conversion

def test_convert_equality_deletes_preserves_scan(spark, warehouse, orders):
    from incubator_iceberg_spark.scan import TableScan
    from incubator_iceberg_spark.schema import Schema
    t = warehouse.create_table("db.cv1", Schema.from_spark(orders.schema),
                               partition_by=["month(o_orderdate)"])
    t.append(orders)
    t.add_equality_deletes(orders.filter("o_orderkey % 37 = 0")
                           .select("o_orderkey"), ["o_orderkey"])
    # rows appended AFTER the eq delete must survive conversion (the eq
    # delete never applied to them: strict sequence scoping)
    survivors = orders.filter("o_orderkey % 37 = 0").limit(5)
    t.append(survivors)
    before = sorted(r["o_orderkey"]
                    for r in t.to_df().select("o_orderkey").collect())
    res = t.convert_equality_deletes()
    assert res["converted_eq_files"] == 1 and res["converted_tuples"] > 0
    after = sorted(r["o_orderkey"]
                   for r in t.to_df().select("o_orderkey").collect())
    assert after == before
    _d, dels = TableScan(t, spark)._plan_split()
    assert all((e.get("content") or 0) == 1 for e in dels)  # pos only
    # arrow path agrees
    import collections
    assert (collections.Counter(t.to_arrow().column("o_orderkey").to_pylist())
            == collections.Counter(after))


def test_convert_equality_deletes_across_rename(spark, warehouse, orders):
    """Eq-delete parquets hold WRITE-TIME column names; conversion after a
    rename must still resolve them positionally (field-id semantics) or
    the deleted rows resurrect as positions are computed against NULLs."""
    from incubator_iceberg_spark.schema import Schema
    t = warehouse.create_table("db.cv2", Schema.from_spark(orders.schema))
    t.append(orders)
    t.add_equality_deletes(orders.filter("o_orderkey % 37 = 0")
                           .select("o_orderkey"), ["o_orderkey"])
    t.update_schema().rename_column("o_orderkey", "order_key").commit()
    before = sorted(r["order_key"]
                    for r in t.to_df().select("order_key").collect())
    assert not any(k % 37 == 0 for k in before)
    res = t.convert_equality_deletes()
    assert res["converted_tuples"] > 0
    after = sorted(r["order_key"]
                   for r in t.to_df().select("order_key").collect())
    assert after == before


def test_convert_equality_deletes_noop_without_eq_files(spark, warehouse,
                                                        orders):
    from incubator_iceberg_spark.schema import Schema
    t = warehouse.create_table("db.cv3", Schema.from_spark(orders.schema))
    t.append(orders)
    snap = t.metadata.current_snapshot_id
    res = t.convert_equality_deletes()
    assert res == {"converted_eq_files": 0, "added_pos_files": 0,
                   "converted_tuples": 0}
    assert t.metadata.current_snapshot_id == snap  # no empty commit


def test_pos_delete_broadcast_gate_fallback(warehouse, orders, spark,
                                            monkeypatch):
    """Above BROADCAST_MAX_DELETE_TUPLES the pos/DV anti-join must stop
    broadcasting (multi-million-position DV debt would blow broadcast
    memory) and fall back to a shuffle anti-join — same rows either
    way.  Pinned by forcing the threshold to 0 and comparing against
    the broadcast path's result and the expected predicate."""
    from incubator_iceberg_spark import deletes as DEL

    t = warehouse.create_table("db.bgate", Schema.from_spark(orders.schema))
    t.append(orders.limit(400))
    t.delete_where("o_orderkey % 3 = 0", mode="merge-on-read")

    want = sorted(r["o_orderkey"] for r in orders.limit(400)
                  .filter("o_orderkey % 3 != 0").collect())
    got_bcast = sorted(r["o_orderkey"] for r in t.to_df().collect())
    assert got_bcast == want

    # un-gated: the FORCED anti-join broadcast hint is in the plan
    # (other intentional hints exist, e.g. the per-file seq-stamp map —
    # count them so only the anti-join's hint is asserted away)
    hinted = t.to_df()._jdf.queryExecution().analyzed().toString()
    n_hints = hinted.count("ResolvedHint")
    assert n_hints >= 1, hinted[:2000]

    monkeypatch.setattr(DEL, "BROADCAST_MAX_DELETE_TUPLES", 0)
    df = t.to_df()
    got_shuffle = sorted(r["o_orderkey"] for r in df.collect())
    assert got_shuffle == want
    # gated: exactly the anti-join's forced hint is gone — Catalyst
    # chooses the strategy (at this toy scale it may still broadcast on
    # its own; at the multi-million-tuple scale the gate exists for, it
    # picks a shuffle join)
    ungated = df._jdf.queryExecution().analyzed().toString()
    assert ungated.count("ResolvedHint") == n_hints - 1, ungated[:2000]


def test_eq_delete_broadcast_gate_fallback(warehouse, orders, spark,
                                           monkeypatch):
    """Above BROADCAST_MAX_DELETE_TUPLES the EQUALITY-delete anti-join
    must stop broadcasting (the upsert-MoR sink accrues ~2M keys per
    epoch of eq debt; a 100-epoch backlog would broadcast ~200M keys)
    and fall back to a shuffle anti-join — same rows either way.
    Mirror of test_pos_delete_broadcast_gate_fallback."""
    from incubator_iceberg_spark import deletes as DEL

    t = _ingest(warehouse, "db.eqgate", orders.limit(400))
    victims = orders.limit(400).filter("o_orderkey % 3 = 0") \
        .select("o_orderkey")
    t.add_equality_deletes(victims, ["o_orderkey"])

    want = sorted(r["o_orderkey"] for r in orders.limit(400)
                  .filter("o_orderkey % 3 != 0").collect())
    got_bcast = sorted(r["o_orderkey"] for r in t.to_df().collect())
    assert got_bcast == want

    hinted = t.to_df()._jdf.queryExecution().analyzed().toString()
    n_hints = hinted.count("ResolvedHint")
    assert n_hints >= 1, hinted[:2000]

    monkeypatch.setattr(DEL, "BROADCAST_MAX_DELETE_TUPLES", 0)
    df = t.to_df()
    got_shuffle = sorted(r["o_orderkey"] for r in df.collect())
    assert got_shuffle == want
    # gated: exactly the eq anti-join's forced hint is gone
    ungated = df._jdf.queryExecution().analyzed().toString()
    assert ungated.count("ResolvedHint") == n_hints - 1, ungated[:2000]


def test_eq_delete_multi_commit_single_scan(warehouse, orders, spark):
    """Multi-epoch eq debt (same equality_ids, same footer schema) must
    collapse into ONE multi-path scan with per-file sequence stamped via
    the broadcast map — not an O(#files) unionByName plan tree (mirror
    of the pos-side fix; the upsert-MoR sink accrues one eq file per
    epoch, so the read path sees many same-schema eq files)."""
    t = _ingest(warehouse, "db.eqms", orders.limit(300))
    for m in (0, 1, 2):
        victims = orders.limit(300).filter(f"o_orderkey % 5 = {m}") \
            .select("o_orderkey")
        t.add_equality_deletes(victims, ["o_orderkey"])
    want = sorted(r["o_orderkey"] for r in orders.limit(300)
                  .filter("o_orderkey % 5 >= 3").collect())
    df = t.to_df()
    got = sorted(r["o_orderkey"] for r in df.collect())
    assert got == want
    # three eq commits, zero Union nodes: one multi-path relation
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan, plan[:3000]


def test_eq_debt_maintenance_advisory(warehouse, orders, spark, monkeypatch):
    """Eq debt past the broadcast gate (or of unknown size) surfaces a
    MaintenanceAdvisory event recommending convert_equality_deletes —
    the scan itself still completes via the shuffle path.  Below-gate
    debt emits nothing."""
    from incubator_iceberg_spark import deletes as DEL
    from incubator_iceberg_spark import events as EVT

    t = _ingest(warehouse, "db.eqadv", orders.limit(300))
    t.add_equality_deletes(
        orders.limit(300).filter("o_orderkey % 3 = 0").select("o_orderkey"),
        ["o_orderkey"])

    got = []
    EVT.register(got.append)
    try:
        n_ok = t.to_df().count()  # below gate: no advisory
        advisories = [e for e in got
                      if isinstance(e, EVT.MaintenanceAdvisory)]
        assert not advisories

        monkeypatch.setattr(DEL, "BROADCAST_MAX_DELETE_TUPLES", 0)
        n_shuffle = t.to_df().count()
        assert n_shuffle == n_ok
        advisories = [e for e in got
                      if isinstance(e, EVT.MaintenanceAdvisory)]
        assert advisories, got
        adv = advisories[-1]
        assert adv.kind == "convert_equality_deletes"
        assert adv.table_location == t.metadata.location
        assert adv.debt_tuples and adv.debt_tuples > 0
        assert "convert_equality_deletes" in adv.detail
    finally:
        EVT.unregister(got.append)


def test_eq_delete_planning_reads_no_footers(warehouse, spark, monkeypatch):
    """Engine-written eq-delete files carry a write-time schema
    fingerprint in their manifest entry (eq_schema_fp) — the planner
    must build their read schema from manifest metadata ALONE, like the
    reference's DeleteFileIndex (DeleteFileIndex.java:65-123).  One
    pyarrow footer read per accrued file is one object-store round trip
    each at plan time."""
    import pyarrow.parquet as pq
    from incubator_iceberg_spark import deletes as DEL
    from incubator_iceberg_spark import manifests as MF
    from incubator_iceberg_spark.scan import TableScan

    base = spark.range(2000).select(F.col("id"), (F.col("id") % 10).alias("v"))
    t = warehouse.create_table("db.eqfp", Schema.from_spark(base.schema))
    t.append(base)
    for m in (7, 11):  # two commits, two eq files
        t.add_equality_deletes(
            spark.createDataFrame([(i,) for i in range(0, 2000, m)],
                                  "id long"), ["id"])

    calls = []
    real = pq.read_schema

    def counting(*a, **k):
        calls.append(a)
        return real(*a, **k)

    monkeypatch.setattr(pq, "read_schema", counting)
    exp = 2000 - len([i for i in range(2000) if i % 7 == 0 or i % 11 == 0])
    assert t.to_df().count() == exp
    assert calls == [], f"planner read {len(calls)} footers"

    # fallback: entries WITHOUT the fingerprint (imported / pre-r9
    # manifests) still plan via one footer read per file
    data, dels = TableScan(t, spark)._plan_split()
    eq = [dict(e) for e in dels
          if (e.get("content") or 0) == MF.EQUALITY_DELETES]
    assert eq and all(e.get("eq_schema_fp") for e in eq)
    for e in eq:
        e.pop("eq_schema_fp")
    groups = list(DEL.load_eq_delete_groups(spark, eq, t.metadata.schema()))
    assert len(calls) == len(eq)  # footer read per fingerprint-less file
    (cols, eq_df, total_rc), = groups
    assert cols == ["id"]
    assert eq_df.count() == len([i for i in range(2000) if i % 7 == 0]) \
        + len([i for i in range(2000) if i % 11 == 0])
