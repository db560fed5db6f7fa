"""Tier 3: commit-protocol stress — concurrent writers in SEPARATE
processes race the atomic hard-link swap (threads share the GIL and an
interpreter; processes are the honest test of HadoopTableOperations-style
optimistic concurrency)."""

import os
import subprocess
import sys

import pytest

from incubator_iceberg_spark.schema import Schema

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import sys, json
sys.path.insert(0, {repo!r})
from incubator_iceberg_spark.metadata import TableOperations
from incubator_iceberg_spark import snapshots as SN

# pure-metadata appends (no Spark in the worker: the race is the commit)
ops = TableOperations({loc!r})
for i in range({n_commits}):
    SN.append_files(ops, [{{
        "file_path": f"/fake/{{'{tag}'}}-{{i}}.parquet",
        "file_format": "parquet",
        "record_count": 10,
        "file_size_bytes": 100,
        "value_counts": None,
        "null_counts": None,
        "lower_bounds": None,
        "upper_bounds": None,
    }}])
print("done")
"""


def test_multiprocess_commit_race(warehouse, spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    t = warehouse.create_table("db.race", Schema.from_spark(df.schema))
    loc = t.location

    workers = []
    for w in range(4):
        code = WORKER.format(repo=REPO, loc=loc, n_commits=5, tag=f"w{w}")
        workers.append(subprocess.Popen([sys.executable, "-c", code],
                                        stdout=subprocess.PIPE,
                                        stderr=subprocess.PIPE))
    for p in workers:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, err.decode()[:2000]
        assert b"done" in out

    t.refresh()
    # every one of the 20 commits must have landed, linearized
    assert len(t.snapshots()) == 20
    seqs = sorted(s.sequence_number for s in t.snapshots())
    assert seqs == list(range(1, 21))
    # all fake files present exactly once in the final state
    entries = t.new_scan().plan_entries_local()
    paths = [e["file_path"] for e in entries]
    assert len(paths) == 20 and len(set(paths)) == 20
    # version chain is contiguous: v1..v21 metadata files exist
    md_dir = os.path.join(loc, "metadata")
    versions = sorted(int(f[1:].split(".")[0]) for f in os.listdir(md_dir)
                      if f.endswith(".metadata.json"))
    assert versions == list(range(1, 22))


def test_reader_never_sees_partial_state(warehouse, spark):
    """Snapshot isolation under concurrent appends: a reader loading the
    table mid-commit always sees a consistent snapshot (every load's
    total-records summary matches its snapshot count)."""
    import threading
    from incubator_iceberg_spark import Catalog

    df = spark.createDataFrame([(i, "x") for i in range(100)], "id long, s string")
    t = warehouse.create_table("db.iso", Schema.from_spark(df.schema))
    t.append(df)
    stop = threading.Event()
    errors = []

    def writer():
        try:
            for _ in range(5):
                tt = Catalog(warehouse.warehouse, spark).load_table("db.iso")
                tt.append(df)
        except Exception as e:
            errors.append(e)
        finally:
            stop.set()

    def reader():
        while not stop.is_set():
            tt = Catalog(warehouse.warehouse, spark).load_table("db.iso")
            snap = tt.current_snapshot()
            if snap is None:
                continue
            total = int(snap.summary.get("total-records", -1))
            n_appends = 0
            cur = snap
            while cur is not None:
                n_appends += 1
                cur = tt.metadata.snapshot_by_id(cur.parent_id) \
                    if cur.parent_id is not None else None
            if total != n_appends * 100:
                errors.append(AssertionError(
                    f"inconsistent snapshot: total={total}, appends={n_appends}"))
                return

    wt = threading.Thread(target=writer)
    rt = threading.Thread(target=reader)
    wt.start(); rt.start()
    wt.join(); rt.join()
    assert not errors, errors[0]
    assert t.refresh().to_df().count() == 600


def test_append_racing_rename_keeps_staging_schema(warehouse, spark):
    """Regression: staged entries record the schema their files were
    PHYSICALLY written under.  The commit-time default stamped the
    refreshed base's schema instead, so an append whose commit retried
    past a concurrent rename_column had its files projected under the
    NEW name — the renamed column read as all-NULL for those rows."""
    from incubator_iceberg_spark.schema import Schema
    df = spark.range(0, 10).selectExpr("id", "cast(id % 5 as long) as v")
    t = warehouse.create_table("db.ddl_race", Schema.from_spark(df.schema))
    t.append(df)
    writer = warehouse.load_table("db.ddl_race")
    ddl = warehouse.load_table("db.ddl_race")
    ddl.update_schema().rename_column("v", "w").commit()
    # stale handle: stages under the old schema, commit rebases past the
    # rename
    writer.append(spark.range(100, 105).selectExpr(
        "id", "cast(1 as long) as v"))
    t.refresh()
    got = t.to_df()
    assert got.count() == 15
    assert got.filter("w = 1").count() == 7  # 2 original + 5 raced-in


def test_append_racing_spec_evolution_keeps_staging_spec(warehouse, spark):
    """Regression: staged entries carry the spec their files were
    PHYSICALLY partitioned under.  Defaulting to the refreshed base's
    spec serialized the staged partition tuple under the NEW spec's
    struct — the tuple nulled out, and bucket pruning then silently
    dropped the raced-in file from filtered scans."""
    from incubator_iceberg_spark.schema import Schema
    df = spark.range(0, 40).selectExpr("id", "cast(id % 4 as long) as grp")
    t = warehouse.create_table("db.spec_race", Schema.from_spark(df.schema),
                               partition_by=["grp"])
    t.append(df)
    writer = warehouse.load_table("db.spec_race")
    warehouse.load_table("db.spec_race").update_spec(["bucket(4, id)"])
    writer.append(spark.range(100, 110).selectExpr(
        "id", "cast(1 as long) as grp"))
    t.refresh()
    raced = [e for e in t.new_scan().plan_entries_local(force=True)
             if (e.get("partition") or {}).get("grp") == 1
             and e.get("spec_id") == 0]
    assert len(raced) == 2  # original grp=1 file + the raced-in one
    assert t.to_df(filter="id = 105").count() == 1
    assert t.to_df(filter="grp = 1").count() == 20


def test_dynamic_overwrite_racing_spec_evolution_is_spec_scoped(
        warehouse, spark):
    """Regression: replace_partitions matched positional tuples against
    the REBASED base's spec, so a dynamic overwrite racing a spec
    evolution could collide tuples across specs (old grp=1 == new
    bucket=1) and drop an unrelated partition's files.  Matching is now
    scoped to the write-time spec's manifests (reference
    BaseReplacePartitions keys replaced partitions by (spec_id, tuple))."""
    from incubator_iceberg_spark.schema import Schema
    df = spark.range(0, 40).selectExpr("id", "cast(id % 4 as long) as grp")
    t = warehouse.create_table("db.dyn_race", Schema.from_spark(df.schema),
                               partition_by=["grp"])
    t.append(df)
    writer = warehouse.load_table("db.dyn_race")
    warehouse.load_table("db.dyn_race").update_spec(["bucket(4, id)"])
    other = warehouse.load_table("db.dyn_race")
    other.append(spark.range(1000, 1040).selectExpr(
        "id", "cast(9 as long) as grp"))  # new-spec files, bucket tuples
    # stale writer replaces grp=1 under the OLD spec; bucket partitions
    # whose tuple value collides (bucket==1) must be untouched
    writer.dynamic_overwrite(spark.range(500, 505).selectExpr(
        "id", "cast(1 as long) as grp"))
    t.refresh()
    assert t.to_df(filter="grp = 1").count() == 5      # replaced
    assert t.to_df(filter="grp = 9").count() == 40     # untouched
    assert t.to_df().count() == 30 + 5 + 40
