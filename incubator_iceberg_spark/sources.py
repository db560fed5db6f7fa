"""Spark Python Data Source integration (pyspark ≥4): the engine's tables
as a first-class ``spark.read.format(...)`` / ``spark.readStream`` source.

The reference exposes tables through DSv2 (SparkTable capabilities
BATCH_READ / MICRO_BATCH_READ, spark3/.../SparkTable.java:70-76;
SparkMicroBatchStream.java:75-132).  PySpark 4's Python Data Source API is
the Python-native equivalent surface:

    spark.dataSource.register(IcebergPyDataSource)
    df  = spark.read.format("iiws").option("filter", "id > 5").load(loc)
    sdf = spark.readStream.format("iiws").load(loc)   # snapshot micro-batches

Batch reads plan with the driver-side planner (metadata pruning via the
``filter`` option) and read Parquet on EXECUTORS via pyarrow, one input
partition per data file, yielding Arrow record batches.  The streaming
reader's offsets are snapshot ids (MicroBatches.java:37-53 semantics);
each micro-batch is the incremental append slice.

Scale note: this surface exists for Structured Streaming integration and
API parity.  The high-throughput batch path remains ``Table.to_df`` (JVM
vectorized Parquet scan); v2 delete files are applied there, not here.
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

FORMAT_NAME = "iiws"


class _FileSlice(InputPartition):
    def __init__(self, path: str, fmt: str, rename: list, add_null: list,
                 casts: dict, row_filter=None):
        self.path = path
        self.fmt = fmt
        self.rename = rename  # [(file_col, out_col)] in output order
        self.add_null = add_null  # [(out_col, arrow_type_str)]
        self.casts = casts  # out_col -> arrow type str
        self.row_filter = row_filter  # bound Expression (picklable dataclasses)


def _load_metadata(location: str):
    from incubator_iceberg_spark.metadata import TableOperations

    md = TableOperations(location).refresh()
    if md is None:
        raise ValueError(f"not an engine table: {location}")
    return md


class _Shim:
    def __init__(self, md):
        self.metadata = md


def _plan(md, row_filter=None, snapshot_id=None, incremental=None):
    from incubator_iceberg_spark.scan import TableScan, parse_predicate

    scan = TableScan(_Shim(md), None)
    if snapshot_id is not None:
        scan = scan.use_snapshot(int(snapshot_id))
    if incremental is not None:
        scan = scan.appends_between(*incremental)
    if row_filter:
        scan = scan.filter(parse_predicate(row_filter))
    entries = scan.plan_entries_local()
    return [e for e in (entries or []) if (e.get("content") or 0) == 0]


def _slices(md, entries, row_filter=None) -> list:
    current = md.schema()
    bound = None
    if row_filter:
        from incubator_iceberg_spark import expressions as X
        from incubator_iceberg_spark.scan import parse_predicate
        bound = X.bind(current, parse_predicate(row_filter))
    out = []
    for e in entries:
        schema_id = e.get("schema_id", current.schema_id)
        fs = md.schema_by_id(schema_id) if any(
            s.schema_id == schema_id for s in md.schemas) else current
        rename, add_null, casts = [], [], {}
        from incubator_iceberg_spark import manifests as MF
        for f in current.fields:
            old = fs.find_field(f.field_id)
            if old is None:
                add_null.append((f.name, str(MF.arrow_type(f.type))))
            else:
                rename.append((fs.field_path(f.field_id), f.name))
                if old.type != f.type:
                    casts[f.name] = str(MF.arrow_type(f.type))
        out.append(_FileSlice(e["file_path"], e.get("file_format") or "parquet",
                              rename, add_null, casts, row_filter=bound))
    return out


def _read_slice(part: _FileSlice):
    """Executor-side: one file → arrow record batches projected to the
    current schema (field-ID rename / null-fill / promotion cast)."""
    import pyarrow as pa

    if part.fmt == "orc":
        import pyarrow.orc as po
        tbl = po.ORCFile(part.path).read(columns=[c for c, _ in part.rename])
    else:
        import pyarrow.parquet as pq
        tbl = pq.read_table(part.path, columns=[c for c, _ in part.rename])
    cols, names = [], []
    for file_col, out_col in part.rename:
        arr = tbl.column(file_col)
        if out_col in part.casts:
            import pyarrow.compute as pc
            arr = pc.cast(arr, part.casts[out_col])
        cols.append(arr)
        names.append(out_col)
    for out_col, type_str in part.add_null:
        cols.append(pa.nulls(tbl.num_rows, type=_arrow_type_from_str(type_str)))
        names.append(out_col)
    projected = pa.table(dict(zip(names, cols)))
    if part.row_filter is not None:
        from incubator_iceberg_spark.py_eval import arrow_mask
        mask = arrow_mask(projected, part.row_filter)
        if mask is not None:
            projected = projected.filter(mask)
    yield from projected.to_batches(max_chunksize=8192)


def _arrow_type_from_str(s: str):
    import pyarrow as pa

    basic = {"string": pa.string(), "int32": pa.int32(), "int64": pa.int64(),
             "float": pa.float32(), "double": pa.float64(), "bool": pa.bool_(),
             "date32[day]": pa.date32(), "binary": pa.binary(),
             "timestamp[us, tz=UTC]": pa.timestamp("us", tz="UTC"),
             "timestamp[us]": pa.timestamp("us")}
    if s in basic:
        return basic[s]
    if s.startswith("decimal128("):
        p, sc = s[len("decimal128("):-1].split(",")
        return pa.decimal128(int(p), int(sc))
    return pa.string()


class IcebergBatchReader(DataSourceReader):
    def __init__(self, location: str, options: dict):
        md = _load_metadata(location)
        entries = _plan(md, row_filter=options.get("filter"),
                        snapshot_id=options.get("snapshot_id"))
        self._parts = _slices(md, entries, row_filter=options.get("filter"))

    def partitions(self):
        return self._parts

    def read(self, partition: _FileSlice):
        yield from _read_slice(partition)


class IcebergStreamReader(DataSourceStreamReader):
    """Offsets are snapshot ids; each batch = appends in (start, end]
    (SparkMicroBatchStream semantics; non-append snapshots skipped)."""

    def __init__(self, location: str, options: dict):
        self.location = location
        self.options = options

    def initialOffset(self) -> dict:
        start = self.options.get("from_snapshot_id")
        return {"snapshot_id": int(start) if start is not None else -1}

    def latestOffset(self) -> dict:
        md = _load_metadata(self.location)
        cur = md.current_snapshot_id
        return {"snapshot_id": cur if cur is not None else -1}

    def partitions(self, start: dict, end: dict):
        s, e = start.get("snapshot_id"), end.get("snapshot_id")
        if e is None or e == -1 or s == e:
            return []
        md = _load_metadata(self.location)
        entries = _plan(md, incremental=(None if s in (None, -1) else s, e))
        return _slices(md, entries)

    def read(self, partition: _FileSlice):
        yield from _read_slice(partition)

    def commit(self, end: dict) -> None:
        pass


class IcebergPyDataSource(DataSource):
    """``spark.dataSource.register(IcebergPyDataSource)`` then read with
    format 'iiws'.  The load path (or option 'path') is the table
    location; options: filter, snapshot_id, from_snapshot_id."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        location = self.options.get("path")
        if not location:
            raise ValueError("option 'path' (table location) is required")
        return _load_metadata(location).schema().to_spark()

    def reader(self, schema) -> DataSourceReader:
        return IcebergBatchReader(self.options["path"], dict(self.options))

    def streamReader(self, schema) -> DataSourceStreamReader:
        return IcebergStreamReader(self.options["path"], dict(self.options))


def register(spark) -> None:
    try:
        spark.dataSource.register(IcebergPyDataSource)
    except Exception as e:  # already registered in this session
        if "already" not in str(e).lower():
            raise
