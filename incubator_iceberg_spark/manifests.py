"""Manifests as Parquet, metadata-as-DataFrames.

The reference stores manifest lists + manifests as Avro with binary-encoded
bounds (core/.../ManifestReader.java:53, ManifestWriter.java,
api/.../ManifestFile.java:32-230).  We store both as **Parquet with natively
typed stats columns** so pruning is plain DataFrame filters (SURVEY.md §1.1):

manifest entry row (one per data file; DataFile.java:40-79 analog):
  status int (0 existing / 1 added / 2 deleted), snapshot_id long,
  sequence_number long, content int (0 data / 1 pos-del / 2 eq-del),
  file_path string, file_format string, spec_id int, schema_id int,
  partition struct<...>, record_count long, file_size_bytes long,
  value_counts/null_counts/nan_counts map<string,long>,
  lower_bounds/upper_bounds struct<col: source-type>  (strings truncated to
  16 chars, upper bounds incremented — MetricsModes truncate(16) parity)

manifest-list row (one per manifest; ManifestFile.java analog):
  manifest_path, manifest_length, partition_spec_id, added_snapshot_id,
  sequence_number, min_sequence_number,
  added_files_count/existing_files_count/deleted_files_count,
  added_rows_count/existing_rows_count/deleted_rows_count,
  partitions struct<pfield: struct<contains_null bool, lower T, upper T>>
  (GenericPartitionFieldSummary.java analog — powers the manifest evaluator)
"""

from __future__ import annotations

import os
import uuid
from datetime import date, datetime, timezone
from decimal import Decimal
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq

from incubator_iceberg_spark import schema as S
from incubator_iceberg_spark.partitioning import PartitionSpec

# entry status (ManifestEntry.Status)
EXISTING, ADDED, DELETED = 0, 1, 2

#: schema_id sentinel for Hive-layout imports (add_files
#: partition_from_path=True): the data files do NOT contain the
#: identity-partition source columns — the read path serves them as
#: constants from the entry's partition tuple (the reference's
#: PartitionUtil.constantsMap / Spark import of Hive-partitioned dirs)
HIVE_IMPORT_SCHEMA_ID = -2
# file content (api/.../FileContent.java)
DATA, POSITION_DELETES, EQUALITY_DELETES = 0, 1, 2

TRUNCATE_LENGTH = 16  # MetricsModes.java:34-84 default truncate(16)


def metrics_mode_for(properties, col_name: str):
    """Per-column metrics collection mode (MetricsModes.java:34-84):
    ``write.metadata.metrics.column.<col>`` overrides
    ``write.metadata.metrics.default``; values none | counts |
    truncate(N) | full.  Returns (kind, truncate_length)."""
    import re
    props = properties or {}
    raw = (props.get(f"write.metadata.metrics.column.{col_name}")
           or props.get("write.metadata.metrics.default")
           or f"truncate({TRUNCATE_LENGTH})").strip().lower()
    if raw in ("none", "counts", "full"):
        return (raw, None)
    m = re.match(r"truncate\((\d+)\)$", raw)
    if m:
        return ("truncate", int(m.group(1)))
    raise ValueError(f"bad metrics mode {raw!r} for column {col_name}")


#: write.metadata.metrics.max-inferred-column-defaults (TableProperties
#: parity): the default metrics mode is INFERRED for at most this many
#: stats columns; later columns collect no metrics unless explicitly
#: configured.  Without the cap the stats plane grows O(#columns ×
#: #files): at 100 TB a 1000-column table spends more manifest bytes on
#: bounds nobody filters by than on the file listing itself, and every
#: plan-time manifest read decodes all of it.
MAX_INFERRED_COLUMN_DEFAULTS = 100


def metrics_modes(properties, stats_cols) -> dict:
    """Effective per-column metrics modes for a manifest write, with the
    wide-schema cap: an explicit ``write.metadata.metrics.column.<col>``
    always applies; the (explicit or built-in) default mode applies only
    to the first N stats columns in schema order, N =
    ``write.metadata.metrics.max-inferred-column-defaults`` (100).
    Columns past the cap get ("none", None) — no counts, no bounds."""
    props = properties or {}
    raw_cap = props.get("write.metadata.metrics.max-inferred-column-defaults")
    cap = MAX_INFERRED_COLUMN_DEFAULTS if raw_cap is None else int(raw_cap)
    out = {}
    for i, f in enumerate(stats_cols):
        if i >= cap and \
                f"write.metadata.metrics.column.{f.name}" not in props:
            out[f.name] = ("none", None)
        else:
            out[f.name] = metrics_mode_for(props, f.name)
    return out


def _bounds_columns(stats_cols, modes: Optional[dict]) -> list:
    """Stats columns that carry lower/upper bounds in the manifest's
    bounds structs.  ``modes=None`` (read side) keeps every stats column
    — the superset layout old and new manifests both align to via
    concat_entries_tables; on the write side none/counts columns are
    dropped from the struct entirely, so a capped wide table's manifest
    stores (and plan-time decodes) only the bounded prefix."""
    if modes is None:
        return list(stats_cols)
    return [f for f in stats_cols
            if modes[f.name][0] in ("truncate", "full")]


def arrow_type(t: S.Type) -> pa.DataType:
    if isinstance(t, S.BooleanType):
        return pa.bool_()
    if isinstance(t, S.IntegerType):
        return pa.int32()
    if isinstance(t, (S.LongType, S.TimeType)):
        return pa.int64()
    if isinstance(t, S.FloatType):
        return pa.float32()
    if isinstance(t, S.DoubleType):
        return pa.float64()
    if isinstance(t, S.DateType):
        return pa.date32()
    if isinstance(t, S.TimestampType):
        return pa.timestamp("us", tz="UTC") if t.with_zone else pa.timestamp("us")
    if isinstance(t, (S.StringType, S.UUIDType)):
        return pa.string()
    if isinstance(t, (S.BinaryType, S.FixedType)):
        return pa.binary()
    if isinstance(t, S.DecimalType):
        return pa.decimal128(t.precision, t.scale)
    raise TypeError(f"no arrow type for {t}")


def _stats_columns(table_schema: S.Schema):
    """Primitive columns eligible for bounds stats: top-level plus
    struct-nested leaves as dotted paths (matching Parquet footer column
    paths, so nested predicates prune files too).  List/map subtrees are
    excluded — multi-valued per row, bounds aren't one-value-per-row."""
    import dataclasses
    out = []

    def walk(struct, prefix):
        for f in struct.fields:
            path = prefix + f.name
            if f.type.is_primitive:
                out.append(f if not prefix else dataclasses.replace(f, name=path))
            elif isinstance(f.type, S.StructType):
                walk(f.type, path + ".")

    walk(table_schema.struct, "")
    return out


def truncate_lower(v, length: int = TRUNCATE_LENGTH):
    if isinstance(v, str) and len(v) > length:
        return v[:length]
    if isinstance(v, bytes) and len(v) > length:
        return v[:length]
    return v


def truncate_upper(v, length: int = TRUNCATE_LENGTH):
    """Truncate an upper bound, incrementing the last unit so the result is
    still >= every value with that prefix (UnicodeUtil.truncateStringMax
    analog).  Returns None when increment is impossible (keep no bound)."""
    if isinstance(v, str):
        if len(v) <= length:
            return v
        trunc = v[:length]
        chars = list(trunc)
        for i in range(len(chars) - 1, -1, -1):
            cp = ord(chars[i])
            if cp < 0x10FFFF:
                chars[i] = chr(cp + 1)
                return "".join(chars[: i + 1])
        return None
    if isinstance(v, bytes):
        if len(v) <= length:
            return v
        b = bytearray(v[:length])
        for i in range(len(b) - 1, -1, -1):
            if b[i] < 0xFF:
                b[i] += 1
                return bytes(b[: i + 1])
        return None
    return v


def _norm_ts(v, t: S.Type):
    """Normalize values for arrow arrays (tz-aware for timestamptz)."""
    if v is None:
        return None
    if isinstance(t, S.TimestampType):
        if isinstance(v, datetime):
            if t.with_zone and v.tzinfo is None:
                return v.replace(tzinfo=timezone.utc)
            if not t.with_zone and v.tzinfo is not None:
                return v.astimezone(timezone.utc).replace(tzinfo=None)
        return v
    if isinstance(t, S.DateType) and isinstance(v, datetime):
        return v.date()
    return v


def entry_arrow_schema(table_schema: S.Schema, spec: PartitionSpec,
                       properties: Optional[dict] = None) -> pa.schema:
    fields = [
        pa.field("status", pa.int32()),
        pa.field("snapshot_id", pa.int64()),
        pa.field("sequence_number", pa.int64()),
        pa.field("content", pa.int32()),
        pa.field("file_path", pa.string()),
        pa.field("file_format", pa.string()),
        pa.field("spec_id", pa.int32()),
        pa.field("schema_id", pa.int32()),
        pa.field("record_count", pa.int64()),
        pa.field("file_size_bytes", pa.int64()),
        pa.field("value_counts", pa.map_(pa.string(), pa.int64())),
        pa.field("null_counts", pa.map_(pa.string(), pa.int64())),
        pa.field("nan_counts", pa.map_(pa.string(), pa.int64())),
        # v2 equality deletes: field ids the delete rows match on
        pa.field("equality_ids", pa.list_(pa.int32())),
        # equality-delete entries: the WRITE-TIME schema of the delete
        # parquet (engine-schema JSON).  Lets the planner bucket + build
        # read schemas with ZERO footer round trips (the reference's
        # DeleteFileIndex plans from manifest metadata alone,
        # core/.../DeleteFileIndex.java:65-123); absent on imported or
        # pre-r9 files, which fall back to a driver pyarrow footer read.
        pa.field("eq_schema_fp", pa.string()),
        # position-delete entries only: the referenced-data-file path range
        # (the delete file's file_path column bounds — DeleteFileIndex's
        # referenced-data-file stat).  The bounds struct below is keyed by
        # TABLE columns, so without these the path range would be lost on
        # the manifest round-trip and every pos-delete file would have to
        # be applied to every data file.
        pa.field("ref_lower_bound", pa.string()),
        pa.field("ref_upper_bound", pa.string()),
    ]
    stats_cols = _stats_columns(table_schema)
    # properties=None (read side / legacy callers) keeps the full
    # superset layout; a write with properties drops none/counts columns
    # from the bounds structs (metrics modes P17 + the wide-schema cap)
    bounds_cols = _bounds_columns(
        stats_cols,
        metrics_modes(properties, stats_cols) if properties is not None
        else None)
    if bounds_cols:
        bounds_struct = pa.struct([pa.field(f.name, arrow_type(f.type)) for f in bounds_cols])
        fields.append(pa.field("lower_bounds", bounds_struct))
        fields.append(pa.field("upper_bounds", bounds_struct))
    if spec.is_partitioned:
        pt = spec.partition_type()
        fields.append(pa.field("partition", pa.struct(
            [pa.field(f.name, arrow_type(f.type)) for f in pt.fields])))
    return pa.schema(fields)


def write_manifest(metadata_dir: str, entries: list, table_schema: S.Schema,
                   spec: PartitionSpec, snapshot_id: int, sequence_number: int,
                   properties: Optional[dict] = None) -> dict:
    """Write one manifest Parquet; returns its manifest-list row (with
    per-manifest partition summaries, A5 in SURVEY.md §2.5).  Per-column
    metrics modes (P17) apply here: none drops counts+bounds, counts
    drops bounds, truncate(N)/full control bound truncation; the
    max-inferred-column-defaults cap turns every stats column past the
    cap (schema order) to none unless explicitly configured."""
    path = os.path.join(metadata_dir, f"manifest-{uuid.uuid4().hex}.parquet")
    schema = entry_arrow_schema(table_schema, spec, properties=properties)
    stats_cols = _stats_columns(table_schema)
    modes = metrics_modes(properties, stats_cols)
    bounds_cols = _bounds_columns(stats_cols, modes)

    def col(name, getter):
        return [getter(e) for e in entries]

    arrays, names = [], []
    for fname in ["status", "snapshot_id", "sequence_number", "content",
                  "file_path", "file_format", "spec_id", "schema_id",
                  "record_count", "file_size_bytes"]:
        names.append(fname)
        arrays.append(pa.array(col(fname, lambda e, k=fname: e.get(k)),
                               type=schema.field(fname).type))
    for fname in ["value_counts", "null_counts", "nan_counts"]:
        names.append(fname)
        vals = [[(k, v) for k, v in (e.get(fname) or {}).items()
                 if modes.get(k, ("truncate", None))[0] != "none"] or None
                for e in entries]
        arrays.append(pa.array(vals, type=pa.map_(pa.string(), pa.int64())))
    names.append("equality_ids")
    arrays.append(pa.array([e.get("equality_ids") for e in entries],
                           type=pa.list_(pa.int32())))
    names.append("eq_schema_fp")
    arrays.append(pa.array([e.get("eq_schema_fp") for e in entries],
                           type=pa.string()))

    def ref_bound(e, which):
        if (e.get("content") or DATA) != POSITION_DELETES:
            return None
        v = e.get(f"ref_{which}_bound")
        if v is not None:
            return v
        b = e.get(f"{which}_bounds")
        return b.get("file_path") if isinstance(b, dict) else None

    for which in ("lower", "upper"):
        names.append(f"ref_{which}_bound")
        arrays.append(pa.array([ref_bound(e, which) for e in entries],
                               type=pa.string()))
    if bounds_cols:
        for bname, trunc in (("lower_bounds", truncate_lower), ("upper_bounds", truncate_upper)):
            names.append(bname)
            structs = []
            for e in entries:
                b = e.get(bname) or {}
                row = {}
                for f in bounds_cols:
                    kind, length = modes[f.name]
                    if kind == "full":
                        row[f.name] = _norm_ts(b.get(f.name), f.type)
                    else:
                        row[f.name] = _norm_ts(
                            trunc(b.get(f.name), length or TRUNCATE_LENGTH),
                            f.type)
                structs.append(row)
            arrays.append(pa.array(structs, type=schema.field(bname).type))
    if spec.is_partitioned:
        names.append("partition")
        pt = spec.partition_type()
        structs = []
        for e in entries:
            p = e.get("partition") or {}
            structs.append({f.name: _norm_ts(p.get(f.name), f.type) for f in pt.fields})
        arrays.append(pa.array(structs, type=schema.field("partition").type))

    tbl = pa.Table.from_arrays(arrays, names=names)
    pq.write_table(tbl, path, compression="zstd")

    # ---- manifest-list row with partition summaries ----------------------
    live = [e for e in entries if e.get("status") != DELETED]
    added = [e for e in entries if e.get("status") == ADDED]
    existing = [e for e in entries if e.get("status") == EXISTING]
    deleted = [e for e in entries if e.get("status") == DELETED]
    summaries = {}
    if spec.is_partitioned:
        pt = spec.partition_type()
        for f in pt.fields:
            vals = [(e.get("partition") or {}).get(f.name) for e in live]
            non_null = [v for v in vals if v is not None]
            summaries[f.name] = {
                "contains_null": any(v is None for v in vals),
                "lower": _norm_ts(min(non_null), f.type) if non_null else None,
                "upper": _norm_ts(max(non_null), f.type) if non_null else None,
            }
    seqs = [e.get("sequence_number") or 0 for e in entries] or [sequence_number]
    return {
        "manifest_path": path,
        "manifest_length": os.path.getsize(path),
        "partition_spec_id": spec.spec_id,
        "added_snapshot_id": snapshot_id,
        "sequence_number": sequence_number,
        "min_sequence_number": min(seqs),
        # partition-summary pruning is DATA pruning: a manifest holding
        # live delete entries (null partition tuples, delete-schema
        # bounds) must never be summary-pruned or its deletes silently
        # stop applying to filtered scans.  Planners keep flagged
        # manifests unconditionally (missing flag → conservative keep).
        "has_deletes": any((e.get("content") or 0) != DATA for e in live),
        "added_files_count": len(added),
        "existing_files_count": len(existing),
        "deleted_files_count": len(deleted),
        "added_rows_count": sum(e.get("record_count") or 0 for e in added),
        "existing_rows_count": sum(e.get("record_count") or 0 for e in existing),
        "deleted_rows_count": sum(e.get("record_count") or 0 for e in deleted),
        "partitions": summaries,
    }


def write_manifests_distributed(spark, metadata_dir: str, entries: list,
                                table_schema: S.Schema, spec: PartitionSpec,
                                snapshot_id: int, sequence_number: int,
                                entries_per_manifest: int = 50_000,
                                properties: Optional[dict] = None) -> list:
    """Executor-side manifest writing for huge commits (the 100 TB path —
    importing or appending 10⁵-10⁶ files would serialize on the driver).

    Entries are sorted by partition tuple and chunked; each Spark task
    writes ONE manifest Parquet via the same ``write_manifest`` code the
    driver uses (identical layout + per-manifest partition summaries, so
    manifests cluster by partition and manifest-level pruning stays sharp)
    and returns its manifest-list row.  Parallel analog of
    BaseRewriteManifestsSparkAction.java:80-132's repartition+write."""
    import json
    import math

    from incubator_iceberg_spark.write import _stats_json_default, _stats_obj_hook

    if spec.is_partitioned:
        part_names = [f.name for f in spec.partition_type().fields]

        def key(e):
            p = e.get("partition") or {}
            # None sorts first; tuple of (is_null, value-as-sortable)
            return tuple((p.get(n) is None, p.get(n)) for n in part_names)

        try:
            entries = sorted(entries, key=key)
        except TypeError:
            pass  # mixed un-orderable partition values: keep input order
    n_chunks = max(1, math.ceil(len(entries) / entries_per_manifest))
    size = math.ceil(len(entries) / n_chunks)
    chunks = [entries[i * size:(i + 1) * size] for i in range(n_chunks)]
    schema_json = json.dumps(table_schema.to_json())
    spec_json = json.dumps(spec.to_json())
    props = dict(properties or {})
    payload = [(json.dumps(c, default=_stats_json_default),) for c in chunks if c]

    def write_chunk(batches):
        import pandas as pd
        from incubator_iceberg_spark import manifests as M2
        from incubator_iceberg_spark.partitioning import PartitionSpec as PS
        from incubator_iceberg_spark.schema import Schema as Sch
        sch = Sch.from_json(json.loads(schema_json))
        sp = PS.from_json(json.loads(spec_json), sch)
        for pdf in batches:
            rows = []
            for raw in pdf["chunk"]:
                es = json.loads(raw, object_hook=_stats_obj_hook)
                row = M2.write_manifest(metadata_dir, es, sch, sp,
                                        snapshot_id, sequence_number,
                                        properties=props)
                rows.append(json.dumps(row, default=_stats_json_default))
            yield pd.DataFrame({"row": rows})

    df = spark.createDataFrame(payload, "chunk string") \
        .repartition(min(len(payload), 256))
    out = df.mapInPandas(write_chunk, "row string").collect()
    return [json.loads(r["row"], object_hook=_stats_obj_hook) for r in out]


def manifest_list_arrow_schema(specs_by_id: dict) -> pa.schema:
    fields = [
        pa.field("manifest_path", pa.string()),
        pa.field("manifest_length", pa.int64()),
        pa.field("partition_spec_id", pa.int32()),
        pa.field("added_snapshot_id", pa.int64()),
        pa.field("sequence_number", pa.int64()),
        pa.field("min_sequence_number", pa.int64()),
        pa.field("added_files_count", pa.int32()),
        pa.field("existing_files_count", pa.int32()),
        pa.field("deleted_files_count", pa.int32()),
        pa.field("added_rows_count", pa.int64()),
        pa.field("existing_rows_count", pa.int64()),
        pa.field("deleted_rows_count", pa.int64()),
        # True when the manifest holds live delete-content entries —
        # exempts it from partition-summary pruning (null → keep)
        pa.field("has_deletes", pa.bool_()),
    ]
    # union of partition-field summaries across specs (fields keyed by
    # name).  UnknownTransform fields are SKIPPED: their declared type
    # (string fallback) can't serialize the stored values, and pruning
    # is off for them anyway — a missing summary is a conservative keep.
    from incubator_iceberg_spark import transforms as TR
    summary_fields: dict[str, pa.DataType] = {}
    for spec in specs_by_id.values():
        for pf, f in zip(spec.fields, spec.partition_type().fields):
            if isinstance(pf.transform, TR.UnknownTransform):
                continue
            summary_fields.setdefault(f.name, pa.struct([
                pa.field("contains_null", pa.bool_()),
                pa.field("lower", arrow_type(f.type)),
                pa.field("upper", arrow_type(f.type)),
            ]))
    if summary_fields:
        fields.append(pa.field("partitions", pa.struct(
            [pa.field(n, t) for n, t in summary_fields.items()])))
    return pa.schema(fields)


def write_manifest_list(metadata_dir: str, snapshot_id: int, manifest_rows: list,
                        specs_by_id: dict) -> str:
    path = os.path.join(metadata_dir, f"snap-{snapshot_id}-{uuid.uuid4().hex}.parquet")
    schema = manifest_list_arrow_schema(specs_by_id)
    arrays, names = [], []
    for f in schema:
        names.append(f.name)
        if f.name == "partitions":
            vals = []
            for m in manifest_rows:
                s = m.get("partitions") or {}
                vals.append({sub.name: s.get(sub.name) for sub in f.type})
            arrays.append(pa.array(vals, type=f.type))
        else:
            arrays.append(pa.array([m.get(f.name) for m in manifest_rows], type=f.type))
    pq.write_table(pa.Table.from_arrays(arrays, names=names), path, compression="zstd")
    return path


def normalize_entry(e: dict) -> dict:
    """Arrow map columns come back from ``to_pylist`` as [(k, v), ...];
    normalize to dicts in place.  Position-delete entries get their
    referenced-path range re-injected as ``bounds["file_path"]`` so
    delete scoping (deletes.scope_deletes_for_file) and commit
    validation can prune on it."""
    for k in ("value_counts", "null_counts", "nan_counts"):
        v = e.get(k)
        if isinstance(v, list):
            e[k] = dict(v) if v else None
    if (e.get("content") or DATA) == POSITION_DELETES:
        for which in ("lower", "upper"):
            v = e.get(f"ref_{which}_bound")
            if v is not None:
                b = e.get(f"{which}_bounds")
                if not isinstance(b, dict):
                    b = {}
                    e[f"{which}_bounds"] = b
                b.setdefault("file_path", v)
    return e


def read_manifest_list_arrow(path: str) -> pa.Table:
    return pq.read_table(path)


def read_manifest_arrow(path: str) -> pa.Table:
    return pq.read_table(path)


def read_entries_df(spark, manifest_paths: list):
    """Manifest entries as a Spark DataFrame (schema-merged across schema
    versions — struct bounds may gain fields over time)."""
    if not manifest_paths:
        return None
    return spark.read.option("mergeSchema", "true").parquet(*manifest_paths)


def _align_arrow(col, target: "pa.DataType"):
    """Align a (possibly chunked) arrow array written under an older table
    schema to the current entries layout: structs gain null children for
    new stats columns, widened primitives are cast (int32→int64 etc.)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if arr.type.equals(target):
        return arr
    if pa.types.is_struct(target) and pa.types.is_struct(arr.type):
        present = {arr.type.field(i).name for i in range(arr.type.num_fields)}
        children = [
            _align_arrow(arr.field(f.name), f.type) if f.name in present
            else pa.nulls(len(arr), f.type)
            for f in target
        ]
        mask = arr.is_null() if arr.null_count else None
        return pa.StructArray.from_arrays(children, fields=list(target), mask=mask)
    return arr.cast(target)


def _unify_types(a: "pa.DataType", b: "pa.DataType") -> "pa.DataType":
    """Union layout of two manifest column types written under different
    table-schema versions: structs merge their field sets recursively
    (bounds/partition structs gain leaves as DDL lands), numerics keep
    the wider width; otherwise the newer layout wins and _align_arrow
    casts."""
    if a.equals(b):
        return a
    if pa.types.is_struct(a) and pa.types.is_struct(b):
        fields: dict = {}
        order: list = []
        for src in (a, b):
            for f in src:
                if f.name not in fields:
                    fields[f.name] = f
                    order.append(f.name)
                else:
                    fields[f.name] = pa.field(
                        f.name, _unify_types(fields[f.name].type, f.type))
        return pa.struct([fields[n] for n in order])
    if (pa.types.is_integer(a) and pa.types.is_integer(b)) or \
            (pa.types.is_floating(a) and pa.types.is_floating(b)):
        return a if a.bit_width >= b.bit_width else b
    return b


def concat_entries_tables(tabs: list) -> "pa.Table":
    """Concat manifest-entry arrow tables that may span table-schema
    versions: pa.concat_tables(promote_options='permissive') refuses
    struct columns whose field sets differ (bounds structs grow with
    DDL), so align every table to the unified layout first."""
    tabs = [t for t in tabs if t is not None and len(t)]
    if not tabs:
        return None
    if len(tabs) == 1:
        return tabs[0]
    fields: dict = {}
    order: list = []
    for t in tabs:
        for f in t.schema:
            if f.name not in fields:
                fields[f.name] = f
                order.append(f.name)
            elif not fields[f.name].type.equals(f.type):
                fields[f.name] = pa.field(
                    f.name, _unify_types(fields[f.name].type, f.type))
    target = pa.schema([fields[n] for n in order])
    aligned = []
    for t in tabs:
        cols = [_align_arrow(t.column(f.name), f.type)
                if f.name in t.column_names else pa.nulls(len(t), f.type)
                for f in target]
        aligned.append(pa.Table.from_arrays(cols, schema=target))
    return pa.concat_tables(aligned)


def read_entries_df_from_mlist(spark, mlist_df, table_schema: S.Schema,
                               spec: PartitionSpec):
    """Distributed manifest-entry scan (SURVEY §3.1 metadata-scale
    contract).  Takes the already-summary-filtered manifest-LIST
    DataFrame and reads each manifest parquet inside an executor task
    (mapInArrow), aligning every file to the current (schema, spec)
    entries layout.  The manifest-path list therefore never materializes
    on the driver — at 10^5-10^6 manifests the only driver
    materialization left in planning is the final pruned file list that
    scan._plan_split streams.  Reference contract:
    core/src/main/java/org/apache/iceberg/ManifestGroup.java:191-245
    (planFiles streams entries manifest-by-manifest off-driver)."""
    target = entry_arrow_schema(table_schema, spec)

    def _read(batches):
        import pyarrow.parquet as pq
        for batch in batches:
            for path in batch.column(0).to_pylist():
                t = pq.read_table(path)
                cols = [
                    _align_arrow(t.column(f.name), f.type)
                    if f.name in t.column_names
                    else pa.nulls(t.num_rows, f.type)
                    for f in target
                ]
                yield from pa.Table.from_arrays(cols, schema=target).to_batches()

    paths = mlist_df.select("manifest_path")
    n_slots = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # round-robin the path rows so manifest decode parallelizes; the
    # manifest list itself is one small file (1 input partition)
    paths = paths.repartition(n_slots)
    return paths.mapInArrow(_read, schema=_spark_schema_for(target))


def _spark_schema_for(arrow_schema: pa.schema):
    """Spark StructType for an arrow schema via an empty-table round-trip
    (public API only — no pyspark internals)."""
    from pyspark.sql.pandas.types import from_arrow_schema
    return from_arrow_schema(arrow_schema)


def read_manifest_list_df(spark, path: str):
    return spark.read.parquet(path)
