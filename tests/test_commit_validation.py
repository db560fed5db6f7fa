"""Commit-time conflict validation under writer races (SURVEY §7 names
MERGE/rewrite-under-concurrent-commits the hardest correctness surface).

Deterministic interleavings of the two races the reference guards with
dedicated validations:

- validateNoNewDeleteFiles (MergingSnapshotProducer / RewriteFiles):
  commits that carry rows forward into new files (compaction, CoW
  delete/update/merge) must abort when a delete file landed after their
  read point — the carried rows take a higher data sequence number and
  would escape the delete (silent resurrection).
- validateDataFilesExist (BaseRowDelta.java:69-100): a RowDelta commit
  whose position deletes reference data files must abort when a
  concurrent commit rewrote one of them — the deletes would target dead
  paths.

Each test builds the race by holding a STALE table handle while a second
handle commits, then asserts the stale commit aborts with
ValidationException and the table is left in the consistent state.
"""

import pytest

from incubator_iceberg_spark.metadata import ValidationException
from incubator_iceberg_spark.schema import Schema


def _make_table(warehouse, spark, name, n=400, files=4):
    df = spark.createDataFrame(
        [(i, i % 8, f"p{i}") for i in range(n)],
        "id long, grp long, payload string")
    t = warehouse.create_table(name, Schema.from_spark(df.schema))
    for f in range(files):
        t.append(df.filter(df.id % files == f).repartition(1))
    return t


def _reload(warehouse, name):
    return warehouse.load_table(name)


def test_compaction_aborts_on_concurrent_mor_delete(warehouse, spark):
    t_stale = _make_table(warehouse, spark, "db.c_v_mor")
    expected_after_delete = t_stale.to_df().filter("grp != 3").count()

    # a second writer lands a merge-on-read delete AFTER t_stale's read point
    t2 = _reload(warehouse, "db.c_v_mor")
    res = t2.delete_where("grp = 3", mode="merge-on-read")
    assert res["delete_files_written"] > 0

    with pytest.raises(ValidationException, match="delete file"):
        t_stale.rewrite_data_files(min_input_files=2)

    # the abort left the delete intact — no resurrected rows
    t3 = _reload(warehouse, "db.c_v_mor")
    assert t3.to_df().count() == expected_after_delete
    # and a FRESH compaction (which applies the delete) succeeds
    out = t3.rewrite_data_files(min_input_files=2)
    assert out["rewritten_files"] > 0
    assert _reload(warehouse, "db.c_v_mor").to_df().count() == expected_after_delete


def test_cow_delete_aborts_on_concurrent_eq_delete(warehouse, spark):
    t_stale = _make_table(warehouse, spark, "db.cow_v_eq")

    t2 = _reload(warehouse, "db.cow_v_eq")
    victims = spark.createDataFrame([(7,)], "id long")
    t2.add_equality_deletes(victims, ["id"])

    # CoW delete of a DIFFERENT predicate still carries kept rows forward —
    # including id=7's file — so it must abort, not resurrect id=7
    with pytest.raises(ValidationException, match="delete file"):
        t_stale.delete_where("grp = 1", mode="copy-on-write")

    t3 = _reload(warehouse, "db.cow_v_eq")
    assert t3.to_df().filter("id = 7").count() == 0
    # fresh handle sees the delete and succeeds
    t3.delete_where("grp = 1", mode="copy-on-write")
    final = _reload(warehouse, "db.cow_v_eq").to_df()
    assert final.filter("id = 7").count() == 0
    assert final.filter("grp = 1").count() == 0


def test_mor_delete_aborts_when_targets_compacted(warehouse, spark):
    t_stale = _make_table(warehouse, spark, "db.mor_v_c")

    t2 = _reload(warehouse, "db.mor_v_c")
    out = t2.rewrite_data_files(min_input_files=2)
    assert out["rewritten_files"] > 0

    # position deletes planned against the PRE-compaction file paths would
    # reference dead files; the commit must abort (either the conflicting-
    # append check on the compacted files' overlapping bounds, or
    # validateDataFilesExist on the dead paths — both are correct aborts)
    with pytest.raises(ValidationException):
        t_stale.delete_where("grp = 2", mode="merge-on-read")

    t3 = _reload(warehouse, "db.mor_v_c")
    assert t3.to_df().filter("grp = 2").count() == 50
    t3.delete_where("grp = 2", mode="merge-on-read")
    assert _reload(warehouse, "db.mor_v_c").to_df().filter("grp = 2").count() == 0


def test_update_mor_aborts_when_targets_compacted(warehouse, spark):
    t_stale = _make_table(warehouse, spark, "db.umor_v_c")
    t2 = _reload(warehouse, "db.umor_v_c")
    t2.rewrite_data_files(min_input_files=2)

    with pytest.raises(ValidationException):
        t_stale.update({"payload": "'boom'"}, "grp = 4", mode="merge-on-read")

    t3 = _reload(warehouse, "db.umor_v_c")
    assert t3.to_df().filter("payload = 'boom'").count() == 0


def test_append_never_conflicts_with_compaction(warehouse, spark):
    """Appends add disjoint files — both orders must commit cleanly."""
    t_stale = _make_table(warehouse, spark, "db.app_v_c")
    extra = spark.createDataFrame([(10_000 + i, -1, "x") for i in range(10)],
                                  "id long, grp long, payload string")

    t2 = _reload(warehouse, "db.app_v_c")
    t2.append(extra.repartition(1))

    out = t_stale.rewrite_data_files(min_input_files=2)
    assert out["rewritten_files"] > 0
    assert _reload(warehouse, "db.app_v_c").to_df().count() == 410


def test_validate_data_files_exist_direct(warehouse, spark):
    """validateDataFilesExist in isolation: a commit requiring a data file
    that is not live in the table must abort regardless of conflict
    filters (BaseRowDelta.validateDataFilesExist)."""
    from incubator_iceberg_spark import snapshots as SN

    t = _make_table(warehouse, spark, "db.vdfe", n=40, files=1)
    with pytest.raises(ValidationException, match="no longer live"):
        SN.overwrite_files(t.ops, [], set(),
                           required_data_files={"/w/data/never-existed.parquet"})


def test_pos_delete_targets_bounds_pruning():
    from incubator_iceberg_spark.row_ops import _pos_delete_targets

    cands = ["/w/data/a.parquet", "/w/data/m.parquet", "/w/data/z.parquet"]
    entries = [{"lower_bounds": {"file_path": "/w/data/a.parquet"},
                "upper_bounds": {"file_path": "/w/data/m.parquet"}}]
    assert _pos_delete_targets(entries, cands) == {
        "/w/data/a.parquet", "/w/data/m.parquet"}
    # truncated upper bound: prefix compare keeps the covered path
    entries = [{"lower_bounds": {"file_path": "/w/data/m"},
                "upper_bounds": {"file_path": "/w/data/m"}}]
    assert _pos_delete_targets(entries, cands) == {"/w/data/m.parquet"}
    # missing bounds → conservative: everything
    assert _pos_delete_targets([{}], cands) == set(cands)


def test_pos_delete_path_bounds_survive_manifest(warehouse, spark):
    """The referenced-path range of a position-delete file must survive
    the manifest round-trip (ref_lower_bound/ref_upper_bound columns) so
    delete scoping prunes: a delete that references only file A is never
    applied when reading file B (DeleteFileIndex referenced-data-file
    stats).  Without it, at 100 TB every pos-delete file is merge-applied
    to every data file."""
    from incubator_iceberg_spark.deletes import scope_deletes_for_file
    from incubator_iceberg_spark.scan import TableScan

    df = spark.createDataFrame([(i, f"p{i}") for i in range(100)],
                               "id long, payload string")
    t = warehouse.create_table("db.scoping", Schema.from_spark(df.schema))
    t.append(df.filter("id < 50").repartition(1))
    t.append(df.filter("id >= 50").repartition(1))
    t.delete_where("id = 10", mode="merge-on-read")

    t = warehouse.load_table("db.scoping")
    data, dels = TableScan(t, t.spark)._plan_split()
    assert len(data) == 2 and len(dels) == 1
    e = dels[0]
    assert (e.get("lower_bounds") or {}).get("file_path"), \
        "referenced-path bounds lost on manifest round-trip"

    schema = t.metadata.schema()
    scoped = {d["file_path"]: scope_deletes_for_file(d, dels, schema)[0]
              for d in data}
    n_applied = sum(bool(v) for v in scoped.values())
    assert n_applied == 1, f"delete applied to {n_applied} files, want 1: {scoped}"
    # and the result is still correct
    assert t.to_df().count() == 99
    assert t.to_df().filter("id = 10").count() == 0


def test_eq_delete_value_bounds_scoping(warehouse, spark):
    """An equality delete whose value range provably misses a data file's
    range is never applied to it (DeleteFileIndex canContainEqDeletes
    stats check) — and NULL=NULL matching keeps both-nullable columns
    conservative."""
    from incubator_iceberg_spark.deletes import scope_deletes_for_file
    from incubator_iceberg_spark.scan import TableScan

    df = spark.createDataFrame([(i, f"p{i}") for i in range(100)],
                               "id long, payload string")
    t = warehouse.create_table("db.eqscope", Schema.from_spark(df.schema))
    t.append(df.filter("id < 50").repartition(1))
    t.append(df.filter("id >= 50").repartition(1))
    t.add_equality_deletes(
        spark.createDataFrame([(90,), (95,)], "id long"), ["id"])

    t = warehouse.load_table("db.eqscope")
    data, dels = TableScan(t, t.spark)._plan_split()
    schema = t.metadata.schema()
    applied = {d["file_path"]: scope_deletes_for_file(d, dels, schema)[1]
               for d in data}
    n_applied = sum(bool(v) for v in applied.values())
    assert n_applied == 1, f"eq delete applied to {n_applied} files, want 1"
    assert t.to_df().count() == 98


def test_filter_relevant_deletes_prefilter():
    from incubator_iceberg_spark.deletes import filter_relevant_deletes
    from incubator_iceberg_spark import manifests as MF
    from incubator_iceberg_spark import schema as S

    schema = S.Schema([S.NestedField(1, "id", S.LongType())])
    data = [{"file_path": "/d/b.parquet", "sequence_number": 5,
             "lower_bounds": {"id": 100}, "upper_bounds": {"id": 199},
             "null_counts": {"id": 0}}]
    dels = [
        # pos delete referencing only /d/a.* — path range misses
        {"content": MF.POSITION_DELETES, "sequence_number": 6,
         "lower_bounds": {"file_path": "/d/a.parquet"},
         "upper_bounds": {"file_path": "/d/a.parquet"}},
        # pos delete older than every data file — seq-scoped out
        {"content": MF.POSITION_DELETES, "sequence_number": 4,
         "lower_bounds": {"file_path": "/d/b.parquet"},
         "upper_bounds": {"file_path": "/d/b.parquet"}},
        # eq delete with disjoint value range
        {"content": MF.EQUALITY_DELETES, "sequence_number": 6,
         "equality_ids": [1], "lower_bounds": {"id": 0},
         "upper_bounds": {"id": 50}, "null_counts": {"id": 0}},
        # eq delete overlapping — KEPT
        {"content": MF.EQUALITY_DELETES, "sequence_number": 6,
         "equality_ids": [1], "lower_bounds": {"id": 150},
         "upper_bounds": {"id": 160}, "null_counts": {"id": 0}},
        # pos delete covering the file — KEPT
        {"content": MF.POSITION_DELETES, "sequence_number": 6,
         "lower_bounds": {"file_path": "/d/b.parquet"},
         "upper_bounds": {"file_path": "/d/b.parquet"}},
    ]
    kept = filter_relevant_deletes(data, dels, schema)
    assert len(kept) == 2
    assert kept[0]["lower_bounds"].get("id") == 150
    assert kept[1]["lower_bounds"].get("file_path") == "/d/b.parquet"


def test_scan_prefilters_irrelevant_deletes(warehouse, spark):
    """On a filtered scan of an UNPARTITIONED MoR table (no partition
    pruning to lean on), position-delete files whose referenced-path
    range misses every planned data file are pruned driver-side before
    the anti-join (filter_relevant_deletes): the shuffled delete set
    scales with the SCAN's delete debt, not the table's.  (Partitioned
    tables get this for free earlier — plan-time partition pruning drops
    foreign-partition delete entries, pinned below.)"""
    from incubator_iceberg_spark.deletes import filter_relevant_deletes
    from incubator_iceberg_spark.scan import TableScan, parse_predicate

    df = spark.createDataFrame([(i, f"p{i}") for i in range(400)],
                               "id long, payload string")
    t = warehouse.create_table("db.prefilt", Schema.from_spark(df.schema))
    for lo in (0, 100, 200, 300):
        t.append(df.filter(f"id >= {lo} AND id < {lo + 100}").repartition(1))
    # position deletes referencing ONLY the first file's rows
    t.delete_where("id < 100 AND id % 7 = 0", mode="merge-on-read")
    t = warehouse.load_table("db.prefilt")
    schema = t.metadata.schema()

    far = TableScan(t, t.spark, row_filter=parse_predicate("id >= 300"))
    data, dels = far._plan_split()
    assert dels, "unpartitioned planning surfaces the table's delete files"
    assert filter_relevant_deletes(data, dels, schema) == [], \
        "deletes referencing other files must be prefiltered out"

    near = TableScan(t, t.spark, row_filter=parse_predicate("id < 50"))
    data1, dels1 = near._plan_split()
    assert filter_relevant_deletes(data1, dels1, schema), \
        "the touched file's deletes must survive the prefilter"

    # correctness unchanged
    assert t.to_df(filter="id >= 300").count() == 100
    assert t.to_df(filter="id < 100").count() == 100 - 15


def test_partition_scoped_deletes_prune_by_partition(warehouse, spark):
    """Position deletes written by the MoR paths are PARTITION-SCOPED
    (each delete file belongs to the referenced data files\' partition,
    like the reference\'s delete files): a scan of an untouched partition
    never plans them, the touched partition plans exactly its own, and
    GLOBAL deletes (add_position_deletes API, no partition recorded)
    always survive planning."""
    from incubator_iceberg_spark.scan import TableScan, parse_predicate

    df = spark.createDataFrame([(i, i % 8, f"p{i}") for i in range(400)],
                               "id long, grp long, payload string")
    t = warehouse.create_table("db.prefilt_p", Schema.from_spark(df.schema),
                               partition_by=["grp"])
    t.append(df)
    t.delete_where("grp < 2 AND id % 7 = 0", mode="merge-on-read")
    t = warehouse.load_table("db.prefilt_p")
    # scoped: entries carry their partition tuple
    _, all_dels = t.new_scan()._plan_split()
    assert all_dels and all(
        (e.get("partition") or {}).get("grp") is not None for e in all_dels)
    # untouched partition: pruned at PLAN time
    _, dels7 = TableScan(t, t.spark,
                         row_filter=parse_predicate("grp = 7"))._plan_split()
    assert dels7 == []
    # touched partition: only its own delete files planned
    _, dels1 = TableScan(t, t.spark,
                         row_filter=parse_predicate("grp = 1"))._plan_split()
    assert dels1 and all(e["partition"]["grp"] == 1 for e in dels1)
    assert t.to_df(filter="grp = 7").count() == 50
    assert t.to_df(filter="grp = 1 AND id % 7 = 0").count() == 0
    assert t.to_df(filter="grp = 1").count() == 50 - 7

    # a GLOBAL delete (no partition scope) must survive every scan\'s plan
    victim = t.new_scan().plan_entries_local(force=True)
    dfile = [e for e in victim if (e.get("content") or 0) == 0
             and e["partition"]["grp"] == 7][0]
    t.add_position_deletes(spark.createDataFrame(
        [(dfile["file_path"], 0)], "file_path string, pos long"))
    t = warehouse.load_table("db.prefilt_p")
    _, dels3 = TableScan(t, t.spark,
                         row_filter=parse_predicate("grp = 3"))._plan_split()
    assert any((e.get("partition") or {}).get("grp") is None for e in dels3), \
        "global position deletes must never be partition-pruned"
    assert t.to_df(filter="grp = 7").count() == 49


def test_range_filtered_scan_applies_mor_deletes(warehouse, spark):
    """The bug this round's fix closes: a month()-partitioned table with
    merge-on-read deletes must apply them on a PARTITION-FILTERED scan
    (the null-partition delete entries were range-pruned away)."""
    import datetime

    df = spark.createDataFrame(
        [(i, datetime.datetime(2024, 1 + i % 6, 1 + i % 28), f"p{i}")
         for i in range(600)],
        "id long, ts timestamp, payload string")
    t = warehouse.create_table("db.rangemor", Schema.from_spark(df.schema),
                               partition_by=["month(ts)"])
    t.append(df)
    t.delete_where("id % 5 = 0", mode="merge-on-read")
    t = warehouse.load_table("db.rangemor")
    got = t.to_df(
        filter="ts >= TIMESTAMP '2024-03-01' AND ts < TIMESTAMP '2024-04-01'")
    expect = [r for i in range(600)
              if (1 + i % 6) == 3 and i % 5 != 0 for r in [i]]
    assert got.count() == len(expect)
    assert t.to_df().count() == 480


def test_row_ops_after_rollback_do_not_spuriously_conflict(warehouse, spark):
    """Found by the lifecycle fuzz gate: conflict validation must walk the
    CURRENT ANCESTRY, not the flat snapshot log.  After a rollback, the
    rolled-back-past snapshots still sit in the log with higher sequence
    numbers — but they are orphans, not concurrent commits, and a fresh
    CoW/MoR op reading at the rolled-back head must succeed."""
    t = _make_table(warehouse, spark, "db.rb_noconflict", n=200, files=2)
    s1 = t.metadata.current_snapshot_id
    df2 = spark.createDataFrame([(10_000 + i, i % 8, "x") for i in range(50)],
                                "id long, grp long, payload string")
    t.append(df2)
    t.set_current_snapshot(s1)

    # all three carried-rows commit paths must go through cleanly
    t.delete_where("grp = 1")                       # CoW
    t.delete_where("grp = 2", mode="merge-on-read")  # RowDelta
    out = t.rewrite_data_files(min_input_files=1)    # RewriteFiles
    assert out.get("rewritten_files", 0) >= 0
    got = t.to_df().filter("grp IN (1, 2)").count()
    assert got == 0
    assert t.to_df().filter("id >= 10000").count() == 0  # rollback held


def test_stale_op_aborts_when_base_rolled_back_past(warehouse, spark):
    """The conservative side of the ancestry walk: an op whose READ POINT
    was rolled back past by a concurrent writer cannot prove conflict-
    freedom (its base is no longer an ancestor) and must abort, matching
    the reference's cannot-determine-history error."""
    t_stale = _make_table(warehouse, spark, "db.rb_stale", n=200, files=2)
    s1 = t_stale.metadata.current_snapshot_id
    t2 = _reload(warehouse, "db.rb_stale")
    df2 = spark.createDataFrame([(10_000, 0, "x")],
                                "id long, grp long, payload string")
    t2.append(df2)
    s2 = t2.metadata.current_snapshot_id
    t_stale.metadata = t_stale.ops.refresh()  # read point = s2
    t2.set_current_snapshot(s1)               # concurrent rollback past s2

    with pytest.raises(ValidationException, match="ancestry|history"):
        t_stale.delete_where("grp = 3")


def test_retried_commit_restamps_entry_snapshot_identity(warehouse, spark):
    """A commit that loses the version race re-applies under a FRESH
    snapshot id and sequence number.  The manifest entries must carry the
    COMMITTED identity, not the failed attempt's — a stale stamp makes the
    entries invisible to validateNoNewDeleteFiles (entry.snapshot_id no
    longer matches any live snapshot), so a concurrent compaction would
    rebase past the retried MoR delete and resurrect its rows (signature
    caught by the randomized concurrent stress gate)."""
    from incubator_iceberg_spark import manifests as MF
    from incubator_iceberg_spark import snapshots as SN

    t = _make_table(warehouse, spark, "db.retry_stamp")
    stale_compactor = _reload(warehouse, "db.retry_stamp")
    other = _reload(warehouse, "db.retry_stamp")
    extra = spark.createDataFrame(
        [(10_000 + i, 99, "x") for i in range(4)],
        "id long, grp long, payload string")

    real_commit = t.ops.commit
    fired = {"n": 0}

    def racing_commit(base_version, updated):
        if fired["n"] == 0:
            fired["n"] += 1
            other.append(extra)  # wins the version race -> forces a retry
        return real_commit(base_version, updated)

    t.ops.commit = racing_commit
    try:
        res = t.delete_where("grp = 3", mode="merge-on-read")
    finally:
        t.ops.commit = real_commit
    assert fired["n"] == 1
    assert res["delete_files_written"] > 0

    snap = t.metadata.current_snapshot()
    added = list(SN._added_entries_of(snap))
    del_entries = [e for e in added
                   if (e.get("content") or MF.DATA) != MF.DATA]
    # before the fix the retried commit's entries kept the failed
    # attempt's snapshot id and _added_entries_of yielded nothing
    assert del_entries, "retried commit's delete entries lost their snapshot id"
    for e in added:
        assert e["snapshot_id"] == snap.snapshot_id
        assert e["sequence_number"] == snap.sequence_number

    # end-to-end: a compaction planned BEFORE the retried delete must
    # still see the delete files and abort instead of resurrecting rows
    with pytest.raises(ValidationException, match="delete file"):
        stale_compactor.rewrite_data_files(min_input_files=2)
    assert _reload(warehouse, "db.retry_stamp").to_df() \
        .filter("grp = 3").count() == 0
