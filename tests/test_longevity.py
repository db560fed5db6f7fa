"""Commit-count longevity pins (r10 verdict #5, compact CI version of
tools/longevity_probe.py): the metadata JSON grows with the snapshot
log and is rewritten per commit — the two reclamation levers must
actually reclaim.

Reference: core/.../TableMetadata.java previousFiles truncation under
write.metadata.previous-versions-max, TableProperties
METADATA_DELETE_AFTER_COMMIT_ENABLED, and RemoveSnapshots pruning the
snapshot log.
"""

import os

from incubator_iceberg_spark import snapshots as SN
from incubator_iceberg_spark.schema import Schema


def _md_size(t) -> int:
    v = t.ops.current_version()
    return os.path.getsize(t.ops.metadata_path(v))


def _md_dir_jsons(t) -> list:
    return sorted(n for n in os.listdir(t.ops.metadata_dir)
                  if n.endswith(".metadata.json"))


def test_expire_reclaims_metadata_size_and_version_files(warehouse, spark):
    df = spark.range(10).selectExpr(
        "id", "CAST(id AS STRING) AS s").coalesce(1)
    t = warehouse.create_table(
        "db.lng", Schema.from_spark(df.schema),
        properties={
            "write.metadata.previous-versions-max": "5",
            "write.metadata.delete-after-commit.enabled": "true",
        })
    entries = t._stage(df, spark)
    t.metadata = SN.append_files(t.ops, entries)
    for _ in range(199):
        t.metadata = SN.append_files(t.ops, entries)

    grown = _md_size(t)
    assert len(t.metadata.snapshots) == 200
    # lever 2 (previous-versions-max + delete-after-commit) bounds the
    # metadata DIRECTORY while the table is still growing: 5 previous
    # versions + the current one, not one JSON per commit
    assert len(_md_dir_jsons(t)) <= 6 + 1  # +1 slack for the create

    # lever 1: expire prunes the snapshot log -> the NEXT metadata JSON
    # is a fraction of the grown one, and loads/commits reset
    res = t.expire_snapshots(retain_last=1)
    assert res["expired_snapshots"] == 199
    t.metadata = SN.append_files(t.ops, entries)
    shrunk = _md_size(t)
    assert shrunk < grown / 10, (shrunk, grown)
    assert len(t.metadata.snapshots) == 2  # kept head + new append
    # the table still reads: every registered copy of the file counts
    assert t.to_df().count() == 10 * 201

    # metadata-log truncation: at most previous-versions-max entries
    assert len(t.metadata.metadata_log) <= 5


def test_metadata_log_unbounded_without_delete_flag(warehouse, spark):
    """Without delete-after-commit the DIRECTORY keeps every version
    (the reference's default — stale readers need the files), but the
    IN-JSON metadata log still truncates to previous-versions-max."""
    df = spark.range(5).selectExpr("id").coalesce(1)
    t = warehouse.create_table(
        "db.lng2", Schema.from_spark(df.schema),
        properties={"write.metadata.previous-versions-max": "3"})
    entries = t._stage(df, spark)
    for _ in range(12):
        t.metadata = SN.append_files(t.ops, entries)
    assert len(_md_dir_jsons(t)) == 13  # every version retained on disk
    assert len(t.metadata.metadata_log) <= 3
