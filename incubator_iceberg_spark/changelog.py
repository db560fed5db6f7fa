"""Changelog (CDC) scan: row-level insert/delete diff between snapshots.

The reference snapshot (v0.11-era) exposes file-level incremental reads
(appendsBetween, S3); later Iceberg adds a `changes` metadata table.  This
module computes the row-level equivalent Spark-first:

For each non-`replace` snapshot in the ancestry range (from, to]:
  added  = rows of data files that entered the live set at that snapshot
  removed = rows of data files that left it
  inserts = added EXCEPT ALL removed      (multiset difference)
  deletes = removed EXCEPT ALL added

The EXCEPT ALL pair cancels rows that were merely rewritten (copy-on-write
carries untouched rows into new files), so UPDATE shows as delete+insert
of only the changed rows.  `replace` (compaction) snapshots are skipped —
they don't change table contents.  The shuffle is bounded by the touched
files of each snapshot, never the whole table.

Limitations (documented): v2 delete-file commits (RowDelta) change
contents without changing data files — their effect is not reflected
here; map-typed columns can't go through EXCEPT ALL (Spark restriction).

Output columns: table columns (current schema) + `_change_type`
('insert' | 'delete') + `_change_snapshot_id` + `_change_ordinal`
(commit order within the requested range, 0-based).
"""

from __future__ import annotations

from typing import Optional

from incubator_iceberg_spark import manifests as MF


def _live_data_entries(snapshot) -> dict:
    """path → normalized entry for live DATA files of one snapshot."""
    out: dict = {}
    if snapshot is None:
        return out
    for row in MF.read_manifest_list_arrow(snapshot.manifest_list).to_pylist():
        for e in MF.read_manifest_arrow(row["manifest_path"]).to_pylist():
            if e.get("status") == MF.DELETED:
                continue
            if (e.get("content") or 0) != MF.DATA:
                continue
            out[e["file_path"]] = MF.normalize_entry(e)
    return out


def changelog(table, spark=None, from_snapshot_id: Optional[int] = None,
              to_snapshot_id: Optional[int] = None):
    """Row-level changes in (from_snapshot_id, to_snapshot_id]; from=None
    means from table creation, to=None means current."""
    from pyspark.sql import functions as F

    from incubator_iceberg_spark.scan import read_entries

    spark = spark or table.spark
    md = table.metadata
    schema = md.schema()

    end_id = to_snapshot_id if to_snapshot_id is not None else md.current_snapshot_id
    chain = []  # newest → oldest, stopping at from_snapshot_id (exclusive)
    cur = md.snapshot_by_id(end_id) if end_id is not None else None
    while cur is not None and cur.snapshot_id != from_snapshot_id:
        chain.append(cur)
        cur = md.snapshot_by_id(cur.parent_id) if cur.parent_id is not None else None
    if from_snapshot_id is not None and cur is None:
        raise ValueError(
            f"snapshot {from_snapshot_id} is not an ancestor of {end_id}")

    empty_schema = schema.to_spark() \
        .add("_change_type", "string") \
        .add("_change_snapshot_id", "long") \
        .add("_change_ordinal", "integer")
    out = spark.createDataFrame([], empty_schema)

    ordinal = 0
    for snap in reversed(chain):  # oldest first
        if snap.operation == "replace":
            continue
        parent = md.snapshot_by_id(snap.parent_id) if snap.parent_id is not None else None
        live_now = _live_data_entries(snap)
        live_before = _live_data_entries(parent)
        added = [e for p, e in live_now.items() if p not in live_before]
        removed = [e for p, e in live_before.items() if p not in live_now]
        if not added and not removed:
            continue
        cols = [f.name for f in schema.fields]
        added_df = read_entries(spark, md, added, [], schema).select(*cols)
        removed_df = read_entries(spark, md, removed, [], schema).select(*cols)
        ins = added_df.exceptAll(removed_df).withColumn("_change_type", F.lit("insert"))
        dels = removed_df.exceptAll(added_df).withColumn("_change_type", F.lit("delete"))
        step = (ins.unionByName(dels)
                .withColumn("_change_snapshot_id", F.lit(snap.snapshot_id))
                .withColumn("_change_ordinal", F.lit(ordinal)))
        out = out.unionByName(step)
        ordinal += 1
    return out
