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

RowDelta (v2 delete-file) commits are handled since round 2: a snapshot
that ADDS delete files without touching data files still changes the
visible rows, so the data files those new delete files can affect
(sequence- and bounds-scoped via ``scope_deletes_for_file``) are read on
both sides WITH each side's live delete files applied — merge-on-read
DELETE shows its rows as 'delete', MoR UPDATE as delete+insert, exactly
like their copy-on-write counterparts.

Limitation (documented): map-typed columns can't go through EXCEPT ALL
(Spark restriction).

Output columns: table columns (current schema) + `_change_type`
('insert' | 'delete') + `_change_snapshot_id` + `_change_ordinal`
(commit order within the requested range, 0-based).
"""

from __future__ import annotations

from typing import Optional

from incubator_iceberg_spark import manifests as MF


def _live_entries(snapshot) -> tuple:
    """(data: path → normalized entry, deletes: [entries]) live at one
    snapshot."""
    data: dict = {}
    dels: list = []
    if snapshot is None:
        return data, dels
    for row in MF.read_manifest_list_arrow(snapshot.manifest_list).to_pylist():
        for e in MF.read_manifest_arrow(row["manifest_path"]).to_pylist():
            if e.get("status") == MF.DELETED:
                continue
            if (e.get("content") or 0) != MF.DATA:
                dels.append(MF.normalize_entry(e))
            else:
                data[e["file_path"]] = MF.normalize_entry(e)
    return data, dels


def changelog(table, spark=None, from_snapshot_id: Optional[int] = None,
              to_snapshot_id: Optional[int] = None):
    """Row-level changes in (from_snapshot_id, to_snapshot_id]; from=None
    means from table creation, to=None means current."""
    from pyspark.sql import functions as F

    from incubator_iceberg_spark import deletes as DEL
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
        data_now, dels_now = _live_entries(snap)
        data_before, dels_before = _live_entries(parent)
        added = [e for p, e in data_now.items() if p not in data_before]
        removed = [e for p, e in data_before.items() if p not in data_now]
        # RowDelta: data files whose visible rows change because this
        # commit added delete files that cover them (seq/bounds-scoped)
        before_del_paths = {e["file_path"] for e in dels_before}
        new_dels = [e for e in dels_now
                    if e["file_path"] not in before_del_paths]
        affected = []
        if new_dels:
            for p, e in data_now.items():
                if p not in data_before:
                    continue  # added files are diffed anyway
                pos, eq = DEL.scope_deletes_for_file(e, new_dels, schema)
                if pos or eq:
                    affected.append(p)
        if not added and not removed and not affected:
            continue
        cols = [f.name for f in schema.fields]
        now_entries = added + [data_now[p] for p in affected]
        before_entries = removed + [data_before[p] for p in affected]
        # each side applies ITS OWN live delete files, so already-deleted
        # rows never resurrect into the diff
        added_df = read_entries(spark, md, now_entries, dels_now,
                                schema).select(*cols)
        removed_df = read_entries(spark, md, before_entries, dels_before,
                                  schema).select(*cols)
        ins = added_df.exceptAll(removed_df).withColumn("_change_type", F.lit("insert"))
        dels = removed_df.exceptAll(added_df).withColumn("_change_type", F.lit("delete"))
        step = (ins.unionByName(dels)
                .withColumn("_change_snapshot_id", F.lit(snap.snapshot_id))
                .withColumn("_change_ordinal", F.lit(ordinal)))
        out = out.unionByName(step)
        ordinal += 1
    return out


def changelog_with_updates(table, spark=None, identifier_cols=None,
                           from_snapshot_id: Optional[int] = None,
                           to_snapshot_id: Optional[int] = None):
    """CDC view with UPDATE images — the semantics of the reference
    family's create_changelog_view(compute_updates) / ChangelogIterator:
    within ONE commit, a delete and an insert sharing the identifier
    columns are the two halves of an update, re-typed
    ``update_preimage`` / ``update_postimage``; everything else stays
    insert/delete.  Downstream CDC consumers (matview IVM, audit sinks,
    Kafka-style emitters) need the pre/post pairing to apply or display
    changes keyed by row identity.

    ``identifier_cols`` defaults to the table's identifier fields.
    Pairing is per (key, _change_snapshot_id) via one window — shuffle
    on the key only, sized by the range's changed rows, never the
    table.  A key with multiple inserts or deletes in one commit stays
    insert/delete (identifier uniqueness is the caller's contract;
    ambiguous pairs are never guessed).  Carryover rows (copy-on-write
    rewrites of untouched rows) were already cancelled by the base
    changelog's EXCEPT ALL, matching the reference's
    remove_carryovers=true default."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    schema = table.metadata.schema()
    if identifier_cols is None:
        identifier_cols = [schema.field_path(i)
                           for i in schema.identifier_field_ids]
        if not identifier_cols:
            raise ValueError(
                "no identifier fields on table; pass identifier_cols=[...]")
    for c in identifier_cols:
        if schema.find_field(c) is None:
            raise ValueError(f"identifier column not in schema: {c}")

    ch = changelog(table, spark=spark, from_snapshot_id=from_snapshot_id,
                   to_snapshot_id=to_snapshot_id)
    w = Window.partitionBy("_change_snapshot_id",
                           *[F.col(c) for c in identifier_cols])
    n_ins = F.sum(F.when(F.col("_change_type") == "insert", 1)
                  .otherwise(0)).over(w)
    n_del = F.sum(F.when(F.col("_change_type") == "delete", 1)
                  .otherwise(0)).over(w)
    # NULL identifiers never pair: the window groups NULL keys together,
    # but two unrelated rows with NULL keys are not one update (the
    # reference forbids null identifier fields outright — we keep the
    # rows and just leave them plain insert/delete)
    keys_ok = None
    for c in identifier_cols:
        nn = F.col(c).isNotNull()
        keys_ok = nn if keys_ok is None else (keys_ok & nn)
    paired = (n_ins == 1) & (n_del == 1) & keys_ok
    return ch.withColumn(
        "_change_type",
        F.when(paired & (F.col("_change_type") == "delete"),
               F.lit("update_preimage"))
        .when(paired & (F.col("_change_type") == "insert"),
              F.lit("update_postimage"))
        .otherwise(F.col("_change_type")))
