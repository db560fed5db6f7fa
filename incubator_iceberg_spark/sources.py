"""Spark Python Data Source integration (pyspark ≥4): the engine's tables
as a first-class ``spark.read.format(...)`` / ``spark.readStream`` source.

The reference exposes tables through DSv2 (SparkTable capabilities
BATCH_READ / MICRO_BATCH_READ, spark3/.../SparkTable.java:70-76;
SparkMicroBatchStream.java:75-132).  PySpark 4's Python Data Source API is
the Python-native equivalent surface:

    spark.dataSource.register(IcebergPyDataSource)
    df  = spark.read.format("iiws").option("filter", "id > 5").load(loc)
    sdf = spark.readStream.format("iiws").load(loc)   # snapshot micro-batches
    df.write.format("iiws").option("path", loc).mode("append").save()
    sdf.writeStream.format("iiws").option("path", loc2).start()  # exactly-once

Batch reads plan with the driver-side planner (metadata pruning via the
``filter`` option) and read Parquet on EXECUTORS via pyarrow, one input
partition per data file, yielding Arrow record batches.  The streaming
reader's offsets are snapshot ids (MicroBatches.java:37-53 semantics);
each micro-batch is the incremental append slice.

Scale note: this surface exists for Structured Streaming integration and
API parity.  The high-throughput batch path remains ``Table.to_df`` (JVM
vectorized Parquet scan).  v2 delete files ARE applied here too: each
file slice carries its sequence-scoped position/equality delete files and
the executor applies them pyarrow-side (position mask before projection,
equality anti-joins after).
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
                 casts: dict, row_filter=None, pos_dels=None, eq_dels=None,
                 row_groups=None, row_offset: int = 0):
        self.path = path
        self.fmt = fmt
        self.rename = rename  # [(file_col, out_col)] in output order
        self.add_null = add_null  # [(out_col, arrow_type_str)]
        self.casts = casts  # out_col -> arrow type str
        self.row_filter = row_filter  # bound Expression (picklable dataclasses)
        self.pos_dels = pos_dels or []  # position-delete parquet paths
        self.eq_dels = eq_dels or []  # [(path, (current col name, ...))]
        self.row_groups = row_groups  # None = whole file; else [rg index]
        self.row_offset = row_offset  # absolute row index of slice start


# parquet files larger than this split into per-row-group input
# partitions (TableScanUtil.java:43-64 split-at-128MB analog) so a few
# huge files still parallelize across executors
SPLIT_TARGET_BYTES = 128 * 1024 * 1024


def _load_metadata(location: str):
    from incubator_iceberg_spark.metadata import TableOperations

    md = TableOperations(location).refresh()
    if md is None:
        raise ValueError(f"not an engine table: {location}")
    return md


class _Shim:
    def __init__(self, md):
        self.metadata = md


def _filter_to_expr(f):
    """Spark DataSource Filter → engine Expression — the P16 bridge
    (SparkFilters.java:72-103 analog, Python Data Source flavor).
    Returns None for filters the algebra can't express (Spark re-applies
    them post-scan either way)."""
    from pyspark.sql import datasource as DSF

    from incubator_iceberg_spark import expressions as X

    if isinstance(f, DSF.Not):
        child = _filter_to_expr(f.child)
        return X.not_(child) if child is not None else None
    attr = getattr(f, "attribute", None)
    if not attr:
        return None
    col = ".".join(attr)
    if isinstance(f, DSF.EqualTo):
        return X.eq(col, f.value)
    if isinstance(f, DSF.EqualNullSafe):
        return X.is_null(col) if f.value is None else X.eq(col, f.value)
    if isinstance(f, DSF.GreaterThan):
        return X.gt(col, f.value)
    if isinstance(f, DSF.GreaterThanOrEqual):
        return X.gt_eq(col, f.value)
    if isinstance(f, DSF.LessThan):
        return X.lt(col, f.value)
    if isinstance(f, DSF.LessThanOrEqual):
        return X.lt_eq(col, f.value)
    if isinstance(f, DSF.In):
        return X.in_(col, list(f.value))
    if isinstance(f, DSF.IsNull):
        return X.is_null(col)
    if isinstance(f, DSF.IsNotNull):
        return X.not_null(col)
    if isinstance(f, DSF.StringStartsWith):
        return X.starts_with(col, f.value)
    return None


def _combined_filter(option_filter, pushed_exprs):
    """AND of the option-string filter and Catalyst-pushed expressions."""
    from incubator_iceberg_spark import expressions as X
    from incubator_iceberg_spark.scan import parse_predicate

    parts = list(pushed_exprs or [])
    if option_filter:
        parts.append(parse_predicate(option_filter))
    if not parts:
        return None
    return X.and_(*parts) if len(parts) > 1 else parts[0]


def _plan(md, row_filter=None, snapshot_id=None, incremental=None):
    """(data entries, delete entries) for the scan — driver-side planner."""
    from incubator_iceberg_spark.scan import TableScan

    scan = TableScan(_Shim(md), None)
    if snapshot_id is not None:
        scan = scan.use_snapshot(int(snapshot_id))
    if incremental is not None:
        scan = scan.appends_between(*incremental)
    if row_filter is not None:
        scan = scan.filter(row_filter)
    # force: this planner runs in a session-less DSv2 python worker, so
    # there is no distributed fallback — a None here would silently plan
    # an EMPTY scan for any table past the local-plan size threshold
    entries = scan.plan_entries_local(force=True)
    data = [e for e in (entries or []) if (e.get("content") or 0) == 0]
    dels = [e for e in (entries or []) if (e.get("content") or 0) != 0]
    return data, dels


def _split_row_groups(entry: dict, force: bool):
    """[(rg_index, abs_row_offset)] when the file should split into
    per-row-group slices, else None.  Only files above SPLIT_TARGET_BYTES
    pay the footer read (driver-side, few such files), unless forced."""
    size = entry.get("file_size_bytes") or 0
    if not force and size < SPLIT_TARGET_BYTES:
        return None
    import pyarrow.parquet as pq
    try:
        meta = pq.ParquetFile(entry["file_path"]).metadata
    except OSError:
        return None
    if meta.num_row_groups <= 1:
        return None
    out, offset = [], 0
    for i in range(meta.num_row_groups):
        out.append((i, offset))
        offset += meta.row_group(i).num_rows
    return out


def _slices(md, entries, row_filter=None, delete_entries=None,
            split_force: bool = False) -> list:
    current = md.schema()
    bound = None
    if row_filter is not None:
        from incubator_iceberg_spark import expressions as X
        bound = X.bind(current, row_filter)
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
                if old.type != f.type or f.type.is_primitive:
                    # primitives always carry the expected arrow type:
                    # imported files may hold a different physical flavor
                    # (ns timestamps, int32 dates) than the schema says
                    casts[f.name] = str(MF.arrow_type(f.type))
        pos_dels, eq_dels = ([], [])
        if delete_entries:
            from incubator_iceberg_spark import deletes as DEL
            pos_dels, eq_dels = DEL.scope_deletes_for_file(
                e, delete_entries, current)
        fmt = e.get("file_format") or "parquet"
        groups = _split_row_groups(e, split_force) if fmt == "parquet" else None
        if groups:
            for rg, offset in groups:
                out.append(_FileSlice(e["file_path"], fmt, rename, add_null,
                                      casts, row_filter=bound,
                                      pos_dels=pos_dels, eq_dels=eq_dels,
                                      row_groups=[rg], row_offset=offset))
        else:
            out.append(_FileSlice(e["file_path"], fmt, rename, add_null,
                                  casts, row_filter=bound,
                                  pos_dels=pos_dels, eq_dels=eq_dels))
    return out


def _read_slice(part: _FileSlice):
    """Executor-side: one file → arrow record batches projected to the
    current schema (field-ID rename / null-fill / promotion cast), with v2
    delete files applied (position mask in original row order, then
    equality anti-joins on current-schema names — DeleteFilter.java:57-151
    semantics, pyarrow flavor)."""
    import pyarrow as pa

    if part.fmt == "orc":
        import pyarrow.orc as po
        tbl = po.ORCFile(part.path).read(columns=[c for c, _ in part.rename])
    elif part.row_groups is not None:
        import pyarrow.parquet as pq
        tbl = pq.ParquetFile(part.path).read_row_groups(
            part.row_groups, columns=[c for c, _ in part.rename])
    else:
        import pyarrow.parquet as pq
        tbl = pq.read_table(part.path, columns=[c for c, _ in part.rename])
    if part.pos_dels:
        from incubator_iceberg_spark.deletes import arrow_apply_pos_deletes
        tbl = arrow_apply_pos_deletes(tbl, part.path, part.pos_dels,
                                      row_offset=part.row_offset)
    cols, names = [], []
    for file_col, out_col in part.rename:
        arr = tbl.column(file_col)
        if out_col in part.casts:
            want = _arrow_type_from_str(part.casts[out_col])
            if arr.type != want:
                import pyarrow.compute as pc
                arr = pc.cast(arr, want)
        cols.append(arr)
        names.append(out_col)
    for out_col, type_str in part.add_null:
        cols.append(pa.nulls(tbl.num_rows, type=_arrow_type_from_str(type_str)))
        names.append(out_col)
    projected = pa.table(dict(zip(names, cols)))
    if part.eq_dels:
        from incubator_iceberg_spark.deletes import arrow_apply_eq_deletes
        projected = arrow_apply_eq_deletes(projected, part.eq_dels)
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
    """Plans lazily so Catalyst-pushed filters (pushFilters, called before
    partitions) participate in metadata pruning — the DSv2
    SparkScanBuilder.pushFilters flow (SparkScanBuilder.java:100-127),
    Python Data Source flavor."""

    def __init__(self, location: str, options: dict):
        self._location = location
        self._options = options
        self._pushed: list = []
        self._parts = None

    def pushFilters(self, filters):
        for f in filters:
            e = _filter_to_expr(f)
            if e is not None:
                self._pushed.append(e)
            # report every filter as unhandled: the engine prunes files and
            # masks rows with them, Spark re-verifies — never drop a filter
            yield f

    def partitions(self):
        if self._parts is None:
            md = _load_metadata(self._location)
            expr = _combined_filter(self._options.get("filter"), self._pushed)
            snap_id = self._options.get("snapshot_id")
            ref = self._options.get("ref")
            if ref is not None and snap_id is None:
                r = md.ref(ref)
                if r is None:
                    raise ValueError(f"unknown ref: {ref}")
                snap_id = r["snapshot-id"]
            entries, dels = _plan(md, row_filter=expr, snapshot_id=snap_id)
            force = str(self._options.get("split_row_groups", "")).lower() == "true"
            self._parts = _slices(md, entries, row_filter=expr,
                                  delete_entries=dels, split_force=force)
        return self._parts

    def read(self, partition: _FileSlice):
        yield from _read_slice(partition)


def _append_file_chain(md):
    """Ordered streaming file list: (chain_pos_by_sid, flat) where flat =
    [(snapshot_id, entry)] of ADDED data entries for every append snapshot
    root→current, each snapshot's files sorted by path.  Committed
    snapshots are immutable, so this ordering is checkpoint-stable — the
    basis for (snapshot_id, file_index) offsets (MicroBatches.java:37-53 /
    StreamingOffset semantics)."""
    chain = []
    cur = md.current_snapshot()
    while cur is not None:
        chain.append(cur)
        cur = md.snapshot_by_id(cur.parent_id) if cur.parent_id is not None else None
    chain.reverse()
    pos_by_sid = {s.snapshot_id: i for i, s in enumerate(chain)}
    flat = []
    for s in chain:
        if s.operation != "append":
            continue
        entries, _d = _plan(md, incremental=(s.parent_id, s.snapshot_id))
        for e in sorted(entries, key=lambda e: e["file_path"]):
            flat.append((s.snapshot_id, e))
    return pos_by_sid, flat


def _offset_position(pos_by_sid, flat, off: dict) -> int:
    """Flat-list index of an offset.  ``file_index`` absent (legacy
    snapshot-granularity checkpoints) means the whole snapshot was
    consumed; unknown snapshot ids mean the beginning."""
    sid = off.get("snapshot_id")
    if sid in (None, -1):
        return 0
    if sid not in pos_by_sid:
        return 0
    spos = pos_by_sid[sid]
    idx = off.get("file_index")
    before = sum(1 for fsid, _e in flat if pos_by_sid[fsid] < spos)
    own = sum(1 for fsid, _e in flat if fsid == sid)
    return before + (own if idx is None else min(int(idx), own))


def _position_offset(pos_by_sid, flat, position: int) -> dict:
    if position <= 0:
        return {"snapshot_id": -1, "file_index": 0}
    sid = flat[position - 1][0]
    consumed_of_sid = sum(1 for fsid, _e in flat[:position] if fsid == sid)
    return {"snapshot_id": sid, "file_index": consumed_of_sid}


class IcebergStreamReader(DataSourceStreamReader):
    """Offsets are (snapshot_id, file_index) — the reference's
    SparkMicroBatchStream/StreamingOffset shape — so a batch can stop
    mid-snapshot.  ``max_files_per_trigger`` caps each micro-batch (the
    MicroBatches.generate size-capping analog); non-append snapshots are
    skipped.  Legacy {"snapshot_id"} checkpoints load as whole-snapshot
    positions."""

    def __init__(self, location: str, options: dict):
        self.location = location
        self.options = options
        mft = options.get("max_files_per_trigger")
        self.max_files = int(mft) if mft is not None else None
        self._pos = None  # flat position of the last offset handed out

    def initialOffset(self) -> dict:
        start = self.options.get("from_snapshot_id")
        off = {"snapshot_id": int(start) if start is not None else -1,
               "file_index": None if start is not None else 0}
        # fresh query (no checkpoint): the start position is known, so
        # rate limiting applies from the very first batch
        try:
            md = _load_metadata(self.location)
            pos_by_sid, flat = _append_file_chain(md)
            self._pos = _offset_position(pos_by_sid, flat, off)
        except Exception:
            self._pos = None
        return off

    def latestOffset(self) -> dict:
        md = _load_metadata(self.location)
        if md.current_snapshot_id is None:
            return {"snapshot_id": -1, "file_index": 0}
        pos_by_sid, flat = _append_file_chain(md)
        if self.max_files is None or self._pos is None:
            # uncapped, or first call after a restart (checkpointed start
            # unknown until partitions()): one catch-up batch to latest
            target = len(flat)
        else:
            target = min(self._pos + self.max_files, len(flat))
        self._pos = target
        return _position_offset(pos_by_sid, flat, target)

    def partitions(self, start: dict, end: dict):
        md = _load_metadata(self.location)
        if md.current_snapshot_id is None:
            return []
        pos_by_sid, flat = _append_file_chain(md)
        p0 = _offset_position(pos_by_sid, flat, start)
        p1 = _offset_position(pos_by_sid, flat, end)
        self._pos = max(self._pos or 0, p1)
        if p1 <= p0:
            return []
        entries = [e for _sid, e in flat[p0:p1]]
        # append slices carry no deletes (append snapshots only)
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

    def writer(self, schema, overwrite: bool):
        from incubator_iceberg_spark.sinks import IcebergBatchWriter
        return IcebergBatchWriter(self.options["path"], overwrite,
                                  dict(self.options))

    def streamWriter(self, schema, overwrite: bool):
        from incubator_iceberg_spark.sinks import IcebergStreamWriter
        return IcebergStreamWriter(self.options["path"], dict(self.options))


def register(spark) -> None:
    # runtime conf gating DataSourceReader.pushFilters (off by default)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(IcebergPyDataSource)
    except Exception as e:  # already registered in this session
        if "already" not in str(e).lower():
            raise
