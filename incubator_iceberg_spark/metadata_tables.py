"""Metadata tables (S13; core/.../MetadataTableType.java:25-33).

Each is a DataFrame view over the table's own metadata Parquet — the
reference serves these through StaticDataTask (StaticDataTask.java:34);
here they are literally ``spark.read.parquet`` + DataFrame ops:

snapshots, history, manifests, entries, files, partitions,
all_manifests, all_entries, all_data_files, refs
"""

from __future__ import annotations

from incubator_iceberg_spark import manifests as MF


METADATA_TABLE_KINDS = frozenset({
    "snapshots", "history", "manifests", "entries", "files", "data_files",
    "delete_files", "partitions", "all_manifests", "all_entries",
    "all_data_files", "position_deletes", "refs",
})


def metadata_table(table, kind: str, spark):
    kind = kind.lower()
    fn = {
        "snapshots": _snapshots,
        "history": _history,
        "manifests": _manifests,
        "entries": _entries,
        "files": _files,
        "data_files": _data_files,
        "delete_files": _delete_files,
        "partitions": _partitions,
        "all_manifests": _all_manifests,
        "all_entries": _all_entries,
        "all_data_files": _all_data_files,
        "position_deletes": _position_deletes,
        "refs": _refs,
    }.get(kind)
    if fn is None:
        raise ValueError(f"unknown metadata table: {kind}")
    return fn(table, spark)


def _snapshots(table, spark):
    md = table.metadata
    rows = [
        {
            "committed_at": s.timestamp_ms,
            "snapshot_id": s.snapshot_id,
            "parent_id": s.parent_id,
            "operation": s.operation,
            "manifest_list": s.manifest_list,
            "summary": {k: str(v) for k, v in s.summary.items()},
        }
        for s in md.snapshots
    ]
    schema = ("committed_at long, snapshot_id long, parent_id long, "
              "operation string, manifest_list string, summary map<string,string>")
    return spark.createDataFrame(rows, schema)


def _history(table, spark):
    md = table.metadata
    ancestors = set()
    cur = md.current_snapshot()
    while cur is not None:
        ancestors.add(cur.snapshot_id)
        cur = md.snapshot_by_id(cur.parent_id) if cur.parent_id else None
    rows = [
        {
            "made_current_at": h["timestamp-ms"],
            "snapshot_id": h["snapshot-id"],
            "parent_id": (md.snapshot_by_id(h["snapshot-id"]).parent_id
                          if md.snapshot_by_id(h["snapshot-id"]) else None),
            "is_current_ancestor": h["snapshot-id"] in ancestors,
        }
        for h in md.snapshot_log
    ]
    return spark.createDataFrame(
        rows, "made_current_at long, snapshot_id long, parent_id long, "
              "is_current_ancestor boolean")


def _manifest_list_df(table, spark, snapshot=None):
    snap = snapshot or table.metadata.current_snapshot()
    if snap is None:
        return None
    return MF.read_manifest_list_df(spark, snap.manifest_list)


def _manifests(table, spark, snapshot=None):
    df = _manifest_list_df(table, spark, snapshot)
    if df is None:
        return spark.createDataFrame([], "manifest_path string")
    return df


def _entries(table, spark, snapshot=None):
    from pyspark.sql import functions as F
    md = table.metadata
    snap = snapshot or md.current_snapshot()
    if snap is None:
        return spark.createDataFrame([], "file_path string")
    mlist = MF.read_manifest_list_arrow(snap.manifest_list)
    paths = mlist.column("manifest_path").to_pylist()
    df = MF.read_entries_df(spark, paths)
    if df is None:
        return spark.createDataFrame([], "file_path string")
    return df


def _files(table, spark, snapshot=None):
    from pyspark.sql import functions as F
    df = _entries(table, spark, snapshot)
    if "status" not in df.columns:
        return df
    return df.filter(F.col("status") != MF.DELETED)


def _data_files(table, spark, snapshot=None):
    """Live DATA files only (DataFilesTable analog)."""
    from pyspark.sql import functions as F
    df = _files(table, spark, snapshot)
    if "content" not in df.columns:
        return df
    return df.filter(F.coalesce(F.col("content"), F.lit(0)) == MF.DATA)


def _delete_files(table, spark, snapshot=None):
    """Live position/equality DELETE files only (DeleteFilesTable
    analog) — the per-file view of the delete debt `partitions`
    aggregates."""
    from pyspark.sql import functions as F
    df = _files(table, spark, snapshot)
    if "content" not in df.columns:
        return df.limit(0)
    return df.filter(F.coalesce(F.col("content"), F.lit(0)) != MF.DATA)


def _position_deletes(table, spark):
    """PositionDeletesTable (core/.../PositionDeletesTable.java): the
    CONTENTS of the live position-delete files — (file_path, pos,
    delete_file_path) rows — the inspection surface for delete debt and
    the input RewritePositionDeleteFiles plans over.  Reads the delete
    parquet files directly as one distributed scan."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from incubator_iceberg_spark import deletes as DEL
    from incubator_iceberg_spark.scan import TableScan

    from incubator_iceberg_spark import delete_vectors as DV

    _, dels = TableScan(table, spark)._plan_split()
    pos = [e for e in dels
           if (e.get("content") or 0) == MF.POSITION_DELETES]
    paths = [e["file_path"] for e in pos if not DV.is_dv_entry(e)]
    dvs = [e for e in pos if DV.is_dv_entry(e)]
    base = DEL.POS_DELETE_SCHEMA.to_spark()
    out = None
    if paths:
        out = (spark.read.schema(base).parquet(*paths)
               .withColumn("delete_file_path",
                           DEL._decoded_meta_path_col()))
    if dvs:
        # deletion vectors surface DECODED: the contents table is the
        # inspection/rewrite-planning surface and must show true tuples
        dv_rows = (DV.read_dv_pos_df(spark, dvs, with_source=True)
                   .drop("___del_seq"))
        out = dv_rows if out is None else out.unionByName(dv_rows)
    if out is None:
        empty = StructType(list(base.fields)).add("delete_file_path", "string")
        return spark.createDataFrame([], empty)
    return out


def _partitions(table, spark):
    """core/.../PartitionsTable.java:49-76: record_count + file_count per
    partition — a groupBy over the entries DF (A2).  Data and delete files
    are split out (DeleteFileIndex.java:65-123 exposure): the
    *_delete_* columns surface live delete-file DEBT per partition so
    users can decide when to compact deletes
    (rewrite_position_deletes / remove_dangling_deletes)."""
    from pyspark.sql import functions as F
    df = _files(table, spark)
    content = (F.coalesce(F.col("content"), F.lit(0))
               if "content" in df.columns else F.lit(0))
    is_data = content == MF.DATA
    is_pos = content == MF.POSITION_DELETES
    is_eq = content == MF.EQUALITY_DELETES
    size = (F.col("file_size_bytes") if "file_size_bytes" in df.columns
            else F.lit(None).cast("long"))
    # every aggregate coalesced: a global agg over ZERO rows yields NULL
    # sums, and the pre-split count(*) contract was 0
    aggs = [
        F.coalesce(F.sum(F.when(is_data, F.col("record_count"))),
                   F.lit(0)).alias("record_count"),
        F.coalesce(F.sum(is_data.cast("long")), F.lit(0)).alias("file_count"),
        F.coalesce(F.sum(F.when(is_data, size)), F.lit(0))
            .alias("total_data_file_size_in_bytes"),
        F.coalesce(F.sum(is_pos.cast("long")), F.lit(0))
            .alias("position_delete_file_count"),
        F.coalesce(F.sum(F.when(is_pos, F.col("record_count"))),
                   F.lit(0)).alias("position_delete_record_count"),
        F.coalesce(F.sum(is_eq.cast("long")), F.lit(0))
            .alias("equality_delete_file_count"),
        F.coalesce(F.sum(F.when(is_eq, F.col("record_count"))),
                   F.lit(0)).alias("equality_delete_record_count"),
        F.coalesce(F.sum(F.when(is_pos | is_eq, size)), F.lit(0))
            .alias("total_delete_file_size_in_bytes"),
    ]
    if "partition" not in df.columns:
        return df.agg(*aggs)
    return df.groupBy("partition").agg(*aggs)


def _all_manifests(table, spark):
    md = table.metadata
    parts = [_manifests(table, spark, s) for s in md.snapshots]
    parts = [p for p in parts if p is not None]
    if not parts:
        return spark.createDataFrame([], "manifest_path string")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out.dropDuplicates(["manifest_path"])


def _all_entries(table, spark):
    md = table.metadata
    paths = set()
    for s in md.snapshots:
        for p in MF.read_manifest_list_arrow(s.manifest_list).column("manifest_path").to_pylist():
            paths.add(p)
    df = MF.read_entries_df(spark, sorted(paths))
    if df is None:
        return spark.createDataFrame([], "file_path string")
    return df


def _all_data_files(table, spark):
    from pyspark.sql import functions as F
    df = _all_entries(table, spark)
    if "status" not in df.columns:
        return df
    return (df.filter(F.col("status") != MF.DELETED)
            .filter(F.col("content") == MF.DATA)
            .dropDuplicates(["file_path"]))


def _refs(table, spark):
    md = table.metadata
    rows = [{"name": "main", "type": "branch", "snapshot_id": md.current_snapshot_id}]
    for name in (md.refs or {}):
        r = md.ref(name)
        rows.append({"name": name, "type": r["type"], "snapshot_id": r["snapshot-id"]})
    return spark.createDataFrame(rows, "name string, type string, snapshot_id long")
