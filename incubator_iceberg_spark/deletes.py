"""Format-v2 delete files (M8 in SURVEY.md §7; §2.4 J3).

Position deletes  — parquet rows (file_path string, pos long): row `pos`
                    of data file `file_path` is deleted.  Applied as a
                    left-anti join on (file, row_index) using Spark's
                    ``_metadata`` lineage columns (DeleteFileIndex.java:65-123,
                    deletes/Deletes.java:46-125 re-expressed).
Equality deletes  — parquet rows holding the equality columns; any data row
                    matching on those columns is deleted.  Applied as a
                    left-anti join on the equality columns.

Sequence-number scoping (DeleteFileIndex semantics):
- a position delete applies to data files with sequence_number <= its own;
- an equality delete applies to data files with sequence_number < its own
  (rows written together with the delete are NOT affected).

Write path: ``add_position_deletes`` / ``add_equality_deletes`` commit a
RowDelta-style snapshot (C6) with content=1/2 manifest entries; the data
plane applies them on every subsequent scan until compaction rewrites the
affected files.
"""

from __future__ import annotations

import os
import uuid
from typing import Optional

from incubator_iceberg_spark import manifests as MF
from incubator_iceberg_spark import schema as S
from incubator_iceberg_spark import snapshots as SN
from incubator_iceberg_spark import write as W

POS_DELETE_SCHEMA = S.Schema([
    S.NestedField(2147483546, "file_path", S.StringType(), required=True),
    S.NestedField(2147483545, "pos", S.LongType(), required=True),
])


def _write_delete_parquet(spark, table_location: str, df, schema: S.Schema) -> list:
    """Write delete rows as parquet under data/; return raw entry dicts."""
    staging = os.path.join(table_location, "data", "deletes-" + uuid.uuid4().hex)
    W.align_to_schema(df, schema).write.mode("errorifexists").parquet(staging)
    files = W._list_parquet_files(staging)
    stats = [W.footer_stats(p, schema) for p in files]
    entries = []
    for st in stats:
        entries.append({
            "file_path": st["file_path"],
            "file_format": "parquet",
            "record_count": st["record_count"],
            "file_size_bytes": st["file_size_bytes"],
            "value_counts": st["value_counts"],
            "null_counts": st["null_counts"],
            "lower_bounds": st["lower_bounds"],
            "upper_bounds": st["upper_bounds"],
        })
    return entries


def add_position_deletes(table, pos_df, spark=None):
    """Commit position deletes: DataFrame of (file_path, pos).  file_path
    must match manifest-recorded data file paths (plain paths, no scheme)."""
    spark = spark or table.spark
    entries = _write_delete_parquet(spark, table.location, pos_df, POS_DELETE_SCHEMA)
    for e in entries:
        e["content"] = MF.POSITION_DELETES
        # bounds keyed by delete-file columns, not table columns → they
        # don't participate in table-column metrics pruning
    table.metadata = SN.append_files(table.ops, entries, operation="delete")
    return table


def add_equality_deletes(table, del_df, equality_cols, spark=None):
    """Commit equality deletes: any data row equal to a delete row on
    ``equality_cols`` (written before the delete) is removed."""
    spark = spark or table.spark
    schema = table.metadata.schema()
    fields = []
    for c in equality_cols:
        f = schema.find_field(c)
        if f is None:
            raise ValueError(f"equality column not in schema: {c}")
        fields.append(f)
    del_schema = S.Schema(fields)
    entries = _write_delete_parquet(spark, table.location,
                                    del_df.select(*equality_cols), del_schema)
    for e in entries:
        e["content"] = MF.EQUALITY_DELETES
        e["equality_ids"] = [f.field_id for f in fields]
    table.metadata = SN.append_files(table.ops, entries, operation="delete")
    return table


def apply_delete_files(spark, data_df, data_seq_by_file: dict,
                       delete_entries: list, table_schema: S.Schema):
    """J3: anti-join pos/eq delete files onto a data DataFrame that carries
    ``_file``/``_pos`` lineage columns.  ``data_seq_by_file`` maps plain
    file paths → sequence numbers for scoping."""
    from pyspark.sql import functions as F

    if not delete_entries:
        return data_df

    # normalize lineage file uri → manifest-style plain path, attach seq
    seq_rows = [(k, v) for k, v in data_seq_by_file.items()]
    seq_df = spark.createDataFrame(seq_rows, "___path string, ___seq long")
    df = data_df.withColumn(
        "___path", F.regexp_replace(F.col("_file"), "^file:/*", "/"))
    df = df.join(F.broadcast(seq_df), "___path", "left")

    pos_entries = [e for e in delete_entries if e.get("content") == MF.POSITION_DELETES]
    eq_entries = [e for e in delete_entries if e.get("content") == MF.EQUALITY_DELETES]

    if pos_entries:
        pos_df = None
        for e in pos_entries:
            part = spark.read.schema(POS_DELETE_SCHEMA.to_spark()) \
                .parquet(e["file_path"]) \
                .withColumn("___del_seq", F.lit(e.get("sequence_number") or 0))
            pos_df = part if pos_df is None else pos_df.unionByName(part)
        cond = ((df["___path"] == pos_df["file_path"])
                & (df["_pos"] == pos_df["pos"])
                & (pos_df["___del_seq"] >= df["___seq"]))
        df = df.join(F.broadcast(pos_df), cond, "left_anti")

    if eq_entries:
        by_ids: dict = {}
        for e in eq_entries:
            by_ids.setdefault(tuple(e.get("equality_ids") or ()), []).append(e)
        for ids, group in by_ids.items():
            cols = [table_schema.field_path(i) for i in ids]
            cols = [c for c in cols if c is not None]
            if not cols:
                continue
            fields = [table_schema.find_field(i) for i in ids]
            del_schema = S.Schema([f for f in fields if f is not None])
            eq_df = None
            for e in group:
                part = spark.read.schema(del_schema.to_spark()) \
                    .parquet(e["file_path"]) \
                    .withColumn("___del_seq", F.lit(e.get("sequence_number") or 0))
                eq_df = part if eq_df is None else eq_df.unionByName(part)
            cond = None
            for c in cols:
                piece = df[c].eqNullSafe(eq_df[c])
                cond = piece if cond is None else (cond & piece)
            cond = cond & (eq_df["___del_seq"] > df["___seq"])
            df = df.join(F.broadcast(eq_df), cond, "left_anti")

    return df.drop("___path", "___seq")
