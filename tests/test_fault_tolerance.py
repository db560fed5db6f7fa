"""Tier 1.5: commit-protocol fault tolerance — crashed writers must never
leave a table unreadable or uncommittable (HadoopTableOperations
version-hint recovery, HadoopTableOperations.java:126-168)."""

import os

from incubator_iceberg_spark.schema import Schema


def _ingest(warehouse, name, df):
    t = warehouse.create_table(name, Schema.from_spark(df.schema))
    t.append(df)
    return t


def test_stale_version_hint_recovers(warehouse, orders, spark):
    """Crash AFTER metadata rename but BEFORE hint update: the hint lags;
    readers probe forward and see the committed version."""
    t = _ingest(warehouse, "db.ft1", orders.limit(80))
    t.append(orders.limit(40))
    hint = t.ops.version_hint_path()
    with open(hint, "w") as f:
        f.write("1")  # rewind the hint to v1 (commit of v2+ "crashed" pre-hint)
    t2 = warehouse.load_table("db.ft1", spark=spark)
    assert t2.to_df().count() == 120  # probe found the real latest version
    # and the next commit lands on top of the REAL latest, not the hint
    t2.append(orders.limit(10))
    assert t2.to_df().count() == 130
    vers = sorted(int(n[1:n.index(".")]) for n in os.listdir(t.ops.metadata_dir)
                  if n.startswith("v") and n.endswith(".metadata.json"))
    assert vers == sorted(set(vers))  # no version was overwritten


def test_missing_version_hint_recovers(warehouse, orders, spark):
    t = _ingest(warehouse, "db.ft2", orders.limit(60))
    os.unlink(t.ops.version_hint_path())
    t2 = warehouse.load_table("db.ft2", spark=spark)
    assert t2.to_df().count() == 60
    t2.append(orders.limit(15))
    assert t2.to_df().count() == 75


def test_orphan_tmp_metadata_ignored(warehouse, orders, spark):
    """Crash BEFORE the atomic rename leaves a .tmp-*.json — readers and
    later commits are unaffected."""
    t = _ingest(warehouse, "db.ft3", orders.limit(50))
    junk = os.path.join(t.ops.metadata_dir, ".tmp-deadbeef.json")
    with open(junk, "w") as f:
        f.write("{not even json")
    t2 = warehouse.load_table("db.ft3", spark=spark)
    assert t2.to_df().count() == 50
    t2.append(orders.limit(5))
    assert t2.to_df().count() == 55


def test_future_orphan_metadata_version_wins_probe(warehouse, orders, spark):
    """A fully-renamed metadata file one version ahead of the hint IS the
    committed truth (rename is the commit point): probing surfaces it."""
    t = _ingest(warehouse, "db.ft4", orders.limit(30))
    v = t.ops.current_version()
    t.append(orders.limit(20))  # v+1 exists, hint says v+1
    with open(t.ops.version_hint_path(), "w") as f:
        f.write(str(v))  # hint rolled back; v+1 file still present
    t2 = warehouse.load_table("db.ft4", spark=spark)
    assert t2.ops.current_version() == v + 1
    assert t2.to_df().count() == 50


def test_metadata_previous_versions_cleanup(warehouse, spark):
    """write.metadata.previous-versions-max + delete-after-commit
    (TableProperties.java:128-133): commit-heavy tables must not
    accumulate one superseded metadata JSON per commit forever."""
    import glob
    import os
    from incubator_iceberg_spark.schema import Schema
    df = spark.createDataFrame([(1,)], "id long")
    t = warehouse.create_table(
        "db.mdclean", Schema.from_spark(df.schema),
        properties={"write.metadata.previous-versions-max": "5",
                    "write.metadata.delete-after-commit.enabled": "true"})
    for i in range(15):
        t.append(spark.createDataFrame([(i,)], "id long"))
    mdir = os.path.join(t.location, "metadata")
    files = sorted(glob.glob(os.path.join(mdir, "v*.metadata.json")))
    assert len(files) <= 6, files  # current + 5 previous
    # the metadata log tracks exactly the retained previous versions
    assert len(t.metadata.metadata_log) <= 5
    # table stays fully readable, and a COLD reader with no hint file
    # still finds the head even though v1..vN were unlinked
    assert t.to_df().count() == 15
    os.unlink(os.path.join(mdir, "version-hint.text"))
    t2 = warehouse.load_table("db.mdclean")
    assert t2.to_df().count() == 15


def test_metadata_retained_by_default(warehouse, spark):
    """Without the opt-in flag every version stays on disk (stale readers
    are why the reference defaults deletion off)."""
    import glob
    import os
    from incubator_iceberg_spark.schema import Schema
    df = spark.createDataFrame([(1,)], "id long")
    t = warehouse.create_table("db.mdkeep", Schema.from_spark(df.schema))
    for i in range(8):
        t.append(spark.createDataFrame([(i,)], "id long"))
    files = glob.glob(os.path.join(t.location, "metadata", "v*.metadata.json"))
    assert len(files) == 9  # create + 8 appends, all retained
