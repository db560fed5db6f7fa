"""Catalog + Table: the user-facing API surface.

Catalog is the HadoopCatalog analog (S15; core/.../hadoop/HadoopCatalog.java):
a warehouse directory of ``namespace/table`` directories, each with
``metadata/`` (versioned JSON + Parquet manifests) and ``data/``.

Table mirrors the reference's Table interface factories
(api/.../Table.java:54-273): scans, appends/overwrites, row-level ops,
snapshot management, schema/spec evolution, maintenance actions, metadata
tables.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Iterable, Optional, Union

from incubator_iceberg_spark import expressions as X
from incubator_iceberg_spark import metadata as MD
from incubator_iceberg_spark import snapshots as SN
from incubator_iceberg_spark import write as W
from incubator_iceberg_spark.metadata import TableMetadata, TableOperations
from incubator_iceberg_spark.partitioning import PartitionSpec
from incubator_iceberg_spark.scan import TableScan, parse_predicate
from incubator_iceberg_spark.schema import Schema


class NoSuchTableError(Exception):
    pass


class TableAlreadyExistsError(Exception):
    pass


class Catalog:
    """Filesystem catalog: ``warehouse/namespace/table``."""

    def __init__(self, warehouse: str, spark=None):
        self.warehouse = os.path.abspath(warehouse)
        self.spark = spark
        os.makedirs(self.warehouse, exist_ok=True)

    def _table_location(self, name: str) -> str:
        parts = name.split(".")
        return os.path.join(self.warehouse, *parts)

    def create_table(self, name: str, schema, partition_by=None,
                     properties: Optional[dict] = None,
                     sort_by=None, identifier_fields=None, spark=None) -> "Table":
        location = self._table_location(name)
        ops = TableOperations(location)
        if ops.refresh() is not None:
            raise TableAlreadyExistsError(name)
        schema = _as_schema(schema)
        if identifier_fields:
            ids = []
            for n in identifier_fields:
                f = schema.find_field(n)
                if f is None:
                    raise ValueError(f"identifier field not in schema: {n}")
                ids.append(f.field_id)
            schema = Schema(schema.fields, schema_id=schema.schema_id,
                            identifier_field_ids=ids)
        from incubator_iceberg_spark import views as V
        if V.view_exists(self, name):
            raise TableAlreadyExistsError(f"{name} exists as a view")
        parts = name.split(".")
        for j in range(1, len(parts)):
            if V.view_exists(self, ".".join(parts[:j])):
                raise TableAlreadyExistsError(
                    f"{name}: ancestor {'.'.join(parts[:j])} is a view")
        spec = (PartitionSpec.build(schema, partition_by)
                if partition_by else PartitionSpec.unpartitioned(schema))
        md = TableMetadata.new(location, schema, spec, properties)
        if sort_by:
            md.sort_orders = [_as_sort_order(schema, sort_by, order_id=1)]
            md.default_sort_order_id = 1

        def apply(base):
            if base is not None:
                raise TableAlreadyExistsError(name)
            return md

        MD.run_with_retries(ops, apply, retries=0)
        return Table(name, ops, spark or self.spark)

    def load_table(self, name: str, spark=None) -> "Table":
        ops = TableOperations(self._table_location(name))
        if ops.refresh() is None:
            raise NoSuchTableError(name)
        return Table(name, ops, spark or self.spark)

    def table_exists(self, name: str) -> bool:
        return TableOperations(self._table_location(name)).refresh() is not None

    def drop_table(self, name: str, purge: bool = True) -> bool:
        loc = self._table_location(name)
        if not os.path.exists(os.path.join(loc, "metadata")):
            return False
        if not self.table_exists(name):
            return False  # e.g. a VIEW lives here — use drop_view
        if purge:
            # follow the metadata graph (DeleteReachableFiles) so files the
            # table owns OUTSIDE its location (add_files imports) go too
            try:
                from incubator_iceberg_spark import maintenance
                maintenance.delete_reachable_files(
                    self.load_table(name, spark=self.spark))
            except Exception:
                pass  # unreadable metadata: fall through to dir removal
            shutil.rmtree(loc, ignore_errors=True)
        else:
            shutil.rmtree(os.path.join(loc, "metadata"), ignore_errors=True)
        return True

    def create_namespace(self, namespace: str) -> None:
        os.makedirs(os.path.join(self.warehouse, *namespace.split(".")),
                    exist_ok=True)

    def list_namespaces(self) -> list:
        out = []
        for entry in sorted(os.listdir(self.warehouse)):
            p = os.path.join(self.warehouse, entry)
            if os.path.isdir(p) and not os.path.isdir(os.path.join(p, "metadata")):
                out.append(entry)
        return out

    def drop_namespace(self, namespace: str) -> bool:
        """Drop an EMPTY namespace directory (r10, REST-catalog parity)."""
        import shutil
        p = os.path.join(self.warehouse, *namespace.split("."))
        if not os.path.isdir(p):
            return False
        if self.list_tables(namespace):
            raise ValueError(f"namespace {namespace} is not empty")
        if self.list_views(namespace):
            # list_tables excludes .view-metadata.json — without this a
            # views-only namespace would pass the emptiness check and
            # rmtree would silently delete the views (r10 advice #2)
            raise ValueError(f"namespace {namespace} is not empty")
        shutil.rmtree(p)
        return True

    def list_tables(self, namespace: str = "") -> list:
        root = os.path.join(self.warehouse, *namespace.split(".")) if namespace else self.warehouse
        out = []
        for dirpath, dirs, _files in os.walk(root):
            mdir = os.path.join(dirpath, "metadata")
            if os.path.isdir(mdir):
                rel = os.path.relpath(dirpath, self.warehouse)
                if any(n.endswith(".metadata.json")
                       and not n.endswith(".view-metadata.json")
                       for n in os.listdir(mdir)):
                    out.append(rel.replace(os.sep, "."))
                dirs.clear()
        return sorted(out)

    # -- views (views.py: versioned SQL over engine tables) -----------

    def create_view(self, name: str, sql: str, spark=None,
                    replace: bool = False, properties=None):
        from incubator_iceberg_spark import views as V
        return V.create_view(self, name, sql, spark=spark or self.spark,
                             replace=replace, properties=properties)

    def load_view(self, name: str):
        from incubator_iceberg_spark import views as V
        return V.load_view(self, name)

    def view_exists(self, name: str) -> bool:
        from incubator_iceberg_spark import views as V
        return V.view_exists(self, name)

    def drop_view(self, name: str) -> bool:
        from incubator_iceberg_spark import views as V
        return V.drop_view(self, name)

    def list_views(self, namespace: str = "") -> list:
        from incubator_iceberg_spark import views as V
        return V.list_views_under(self.warehouse, namespace)

    def create_table_as_select(self, name: str, df, partition_by=None,
                               properties: Optional[dict] = None, spark=None) -> "Table":
        """CTAS (C10 staged create: data written before the table commit
        becomes visible — single atomic metadata swap)."""
        schema = Schema.from_spark(df.schema)
        t = self.create_table(name, schema, partition_by=partition_by,
                              properties=properties, spark=spark)
        t.append(df)
        return t


def _as_schema(schema) -> Schema:
    if isinstance(schema, Schema):
        return schema
    try:
        import pyspark.sql.types as T
        if isinstance(schema, T.StructType):
            return Schema.from_spark(schema)
    except ImportError:
        pass
    if isinstance(schema, str):
        import pyspark.sql.types as T
        return Schema.from_spark(T.StructType.fromDDL(schema))
    raise TypeError(f"cannot build schema from {schema!r}")


def _as_sort_order(schema: Schema, sort_by, order_id: int = 1) -> MD.SortOrder:
    """Parse sort terms: ``col [ASC|DESC] [NULLS FIRST|NULLS LAST]``
    (the full orderField shape of IcebergSqlExtensions.g4:91-97; bare
    ``col`` = asc nulls-first, matching the reference's defaults)."""
    fields = []
    for item in ([sort_by] if isinstance(sort_by, str) else list(sort_by)):
        direction, null_order = "asc", None
        name = item
        if isinstance(item, str):
            m = re.match(
                r"^\s*(.*?)(?:\s+(asc|desc))?(?:\s+nulls\s+(first|last))?"
                r"\s*$", item, re.IGNORECASE)
            name = m.group(1).strip()
            if m.group(2):
                direction = m.group(2).lower()
            if m.group(3):
                null_order = f"nulls-{m.group(3).lower()}"
        f = schema.find_field(name)
        if f is None:
            raise ValueError(f"sort column not found: {name}")
        if null_order is None:
            # reference default: asc -> nulls-first, desc -> nulls-last
            null_order = "nulls-first" if direction == "asc" else "nulls-last"
        fields.append(MD.SortField(f.field_id, direction, null_order))
    return MD.SortOrder(order_id, tuple(fields))


def _arrow_project_to_schema(tbl, file_schema: Schema, current: Schema):
    """Arrow-side field-ID projection (scan._project_to_current analog
    for the JVM-free path): map a file's top-level columns to the
    current schema by field id — renames resolve to the file's old
    name, added columns become NULL, type promotions cast.  Nested
    (struct-internal) renames are out of scope for the local path."""
    if file_schema.schema_id == current.schema_id:
        return tbl
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql.pandas.types import to_arrow_schema

    tgt = to_arrow_schema(current.to_spark())
    cols, names = [], []
    for f in current.fields:
        path = file_schema.field_path(f.field_id)
        want = tgt.field(f.name).type
        top = path.split(".")[0] if path else None
        if top is None or top not in tbl.column_names:
            cols.append(pa.nulls(tbl.num_rows, type=want))
        else:
            arr = tbl[top]
            if arr.type != want:
                arr = pc.cast(arr, want)
            cols.append(arr)
        names.append(f.name)
    return pa.table(dict(zip(names, cols)))


class Table:
    def __init__(self, name: str, ops: TableOperations, spark=None):
        self.name = name
        self.ops = ops
        self.spark = spark
        self.metadata: TableMetadata = ops.refresh()

    # -- basics ------------------------------------------------------------
    def refresh(self) -> "Table":
        self.metadata = self.ops.refresh()
        return self

    @property
    def location(self) -> str:
        return self.metadata.location

    def schema(self) -> Schema:
        return self.metadata.schema()

    def spec(self) -> PartitionSpec:
        return self.metadata.spec()

    def properties(self) -> dict:
        return dict(self.metadata.properties)

    def snapshots(self) -> list:
        return list(self.metadata.snapshots)

    def current_snapshot(self):
        return self.metadata.current_snapshot()

    def history(self) -> list:
        return self.metadata.history()

    def update_properties(self, updates: dict) -> "Table":
        def apply(base):
            import dataclasses
            md = dataclasses.replace(base)
            props = dict(base.properties)
            for k, v in updates.items():
                if v is None:
                    props.pop(k, None)
                else:
                    props[k] = str(v)
            md.properties = props
            md.last_updated_ms = MD.now_ms()
            return md

        self.metadata = MD.run_with_retries(self.ops, apply)
        return self

    # -- reads -------------------------------------------------------------
    def find_files(self, filter=None, spark=None) -> list:
        """A4 FindFiles (core/.../FindFiles.java:33-151): data-file entry
        dicts (path, partition, stats) matching an optional filter."""
        scan = self.new_scan(spark)
        if filter is not None:
            scan = scan.filter(filter)
        data, _dels = scan._plan_split()
        return data

    def new_scan(self, spark=None) -> TableScan:
        return TableScan(self, spark or self.spark)

    def to_df(self, spark=None, filter=None, select=None, snapshot_id=None,
              as_of_timestamp_ms=None, ref=None):
        scan = self.new_scan(spark)
        if ref is not None:
            r = self.metadata.ref(ref)
            if r is None:
                raise ValueError(f"unknown ref: {ref}")
            scan = scan.use_snapshot(r["snapshot-id"])
        if snapshot_id is not None:
            scan = scan.use_snapshot(snapshot_id)
        if as_of_timestamp_ms is not None:
            scan = scan.as_of_time(as_of_timestamp_ms)
        if filter is not None:
            scan = scan.filter(filter)
        if select:
            scan = scan.select(*select)
        return scan.to_df()

    # -- writes (S9/S10/S11) -------------------------------------------------
    def _stage(self, df, spark=None):
        spark = spark or self.spark or df.sparkSession
        md = self.metadata
        known = {f.name.lower() for f in md.schema().fields}
        extra = [c for c in df.columns if c.lower() not in known]
        if extra:
            raise ValueError(
                f"input has columns not in the table schema: {extra}; "
                f"use append(df, merge_schema=True) to evolve the schema, "
                f"or drop them")
        mode = md.properties.get(MD.WRITE_DISTRIBUTION_MODE)
        target = md.property(MD.WRITE_TARGET_FILE_SIZE, MD.WRITE_TARGET_FILE_SIZE_DEFAULT)
        fmt = md.properties.get("write.format.default", "parquet")
        nan = md.properties.get("write.metrics.nan-counts", "false") == "true"
        dist_n = md.properties.get("write.distribution.partition-count")
        return W.stage_write(spark, md.location, df, md.schema(), md.spec(),
                             sort_order=md.sort_order(), distribution_mode=mode,
                             target_file_size=target, file_format=fmt,
                             nan_counts=nan,
                             distribution_partitions=int(dist_n) if dist_n else None,
                             properties=md.properties)

    def append(self, df, spark=None, extra_summary: Optional[dict] = None,
               branch: Optional[str] = None,
               merge_schema: bool = False,
               extra_properties: Optional[dict] = None) -> "Table":
        """S9 batch append.  ``merge_schema=True`` union-by-names the
        input's schema into the table first (new columns added as
        optional, legal type promotions applied — UnionByNameVisitor.java
        analog, the write-time flavor of Spark's ``mergeSchema`` /
        ``write.spark.accept-any-schema``); existing rows render NULL for
        the new columns, and inputs missing existing optional columns
        write NULL there (align_to_schema)."""
        if merge_schema:
            from incubator_iceberg_spark import schema as S

            def needs(f, cur):
                mine = cur.find_field(f.name)
                if mine is None:
                    return True
                if mine.type == f.type:
                    return False
                if S.is_promotion_allowed(mine.type, f.type):
                    return True
                # narrower input (int into long etc.) upcasts in
                # align_to_schema; anything else would silently
                # cast-corrupt (string→int = NULLs), so refuse
                if S.is_promotion_allowed(f.type, mine.type):
                    return False
                raise ValueError(
                    f"merge_schema: column {f.name!r} has incompatible "
                    f"type {f.type} (table: {mine.type})")

            # Retry loop against concurrent schema evolution.  Two races
            # are handled, both found by the stress gate's op mix:
            # - a concurrent IDENTICAL union: the schema commit aborts
            #   with "column exists" against the refreshed base →
            #   refresh and re-evaluate (nothing left to do);
            # - a concurrent RENAME: a batch column named for the
            #   call-time schema (cur0) that the current schema knows
            #   under a new name is an existing field, not a new one —
            #   remap it by FIELD-ID before deciding what to union
            #   (treating it as new both forks the column and silently
            #   NULLs the renamed one).
            cur0 = self.metadata.schema()  # schema the batch was built for

            def remap(df):
                cur = self.metadata.schema()
                for c in df.columns:
                    if cur.find_field(c) is None:
                        f0 = cur0.find_field(c)
                        fn = (cur.find_field(f0.field_id)
                              if f0 is not None else None)
                        if fn is not None:
                            df = df.withColumnRenamed(c, fn.name)
                return df

            for _ in range(5):
                cur = self.metadata.schema()
                df = remap(df)
                src = S.Schema.from_spark(df.schema)
                if not any(needs(f, cur) for f in src.fields):
                    break
                try:
                    self.update_schema().union_by_name(src).commit()
                    break
                except ValueError as e:
                    if "exists" not in str(e):
                        raise
                    self.refresh()
            else:
                raise ValueError(
                    "merge_schema: schema union kept conflicting with "
                    "concurrent evolution after 5 attempts")
            # a successful union commit may itself have rebased past a
            # concurrent rename — remap once more against the final schema
            df = remap(df)
        entries = self._stage(df, spark)
        self.metadata = SN.append_files(self.ops, entries,
                                        extra_summary=extra_summary,
                                        branch=branch,
                                        extra_properties=extra_properties)
        return self

    def overwrite(self, df, overwrite_filter, spark=None) -> "Table":
        """S11 overwrite-by-filter: atomically delete rows matching the
        filter and append the new data (BaseOverwriteFiles.java:50-131)."""
        from incubator_iceberg_spark import row_ops
        expr = parse_predicate(overwrite_filter) if isinstance(overwrite_filter, str) \
            else overwrite_filter
        entries = self._stage(df, spark)
        row_ops.delete_where(self, expr, spark=spark or self.spark,
                             extra_added_entries=entries, operation="overwrite")
        return self

    def dynamic_overwrite(self, df, spark=None) -> "Table":
        """S10 INSERT OVERWRITE dynamic partitions (SparkWrite.java:264-273)."""
        spec = self.metadata.spec()
        entries = self._stage(df, spark)
        names = [f.name for f in spec.partition_type().fields]
        tuples = {tuple((e.get("partition") or {}).get(n) for n in names)
                  for e in entries}
        # pass the WRITE-TIME spec: the commit may rebase past a
        # concurrent spec evolution and the tuples only mean anything
        # under the spec they were computed with
        self.metadata = SN.replace_partitions(self.ops, entries, tuples,
                                              spec_id=spec.spec_id)
        return self

    # -- row-level ops (§2.8) ----------------------------------------------
    def _row_op_mode(self, prop: str, mode) -> str:
        """copy-on-write (default) vs merge-on-read, resolved like the
        reference's write.delete.mode / write.update.mode table properties
        (TableProperties.java DELETE_MODE/UPDATE_MODE)."""
        m = mode or self.metadata.properties.get(prop, "copy-on-write")
        if m not in ("copy-on-write", "merge-on-read"):
            raise ValueError(f"unknown {prop}: {m!r}")
        return m

    def delete_where(self, condition, spark=None, mode: Optional[str] = None) -> dict:
        from incubator_iceberg_spark import row_ops
        expr = parse_predicate(condition) if isinstance(condition, str) else condition
        if self._row_op_mode("write.delete.mode", mode) == "merge-on-read":
            return row_ops.delete_where_mor(self, expr, spark=spark or self.spark)
        return row_ops.delete_where(self, expr, spark=spark or self.spark)

    def update(self, assignments: dict, condition=None, spark=None,
               mode: Optional[str] = None) -> dict:
        from incubator_iceberg_spark import row_ops
        expr = (parse_predicate(condition) if isinstance(condition, str)
                else condition) if condition is not None else X.always_true()
        if self._row_op_mode("write.update.mode", mode) == "merge-on-read":
            return row_ops.update_mor(self, assignments, expr,
                                      spark=spark or self.spark)
        return row_ops.update(self, assignments, expr, spark=spark or self.spark)

    def merge(self, source_df, on, when_matched=None, when_not_matched=None,
              when_not_matched_by_source=None, spark=None,
              evolve_schema: bool = False) -> dict:
        from incubator_iceberg_spark import row_ops
        return row_ops.merge_into(self, source_df, on,
                                  when_matched=when_matched,
                                  when_not_matched=when_not_matched,
                                  when_not_matched_by_source=when_not_matched_by_source,
                                  spark=spark or self.spark,
                                  evolve_schema=evolve_schema)

    def upsert(self, source_df, on=None, spark=None) -> dict:
        """MERGE shorthand: update matched rows, insert the rest.  Join
        keys default to the table's identifier fields (row identity,
        Schema.java:208 identifierFieldIds)."""
        from incubator_iceberg_spark.row_ops import WhenMatched, WhenNotMatched
        if on is None:
            schema = self.metadata.schema()
            on = [schema.field_path(i) for i in schema.identifier_field_ids]
            if not on:
                raise ValueError(
                    "no identifier fields on table; pass on=[...] explicitly")
        return self.merge(source_df, on=on,
                          when_matched=[WhenMatched.update_all()],
                          when_not_matched=[WhenNotMatched.insert_all()],
                          spark=spark)

    def to_arrow(self, filter=None, snapshot_id=None):
        """S14: JVM-free local read (IcebergGenerics.java:28-50 analog) —
        plan with the driver-side planner, read files with pyarrow.
        For tests/small tables; the data plane is Spark."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from incubator_iceberg_spark.scan import TableScan, parse_predicate

        scan = TableScan(self, None)
        if snapshot_id is not None:
            scan = scan.use_snapshot(snapshot_id)
        if filter is not None:
            scan = scan.filter(filter)
        # force: no SparkSession in this path — a None for over-threshold
        # metadata would silently read as an EMPTY table
        entries = scan.plan_entries_local(force=True)
        if not entries:
            return pa.table({})
        data = [e for e in entries if (e.get("content") or 0) == 0]
        dels = [e for e in entries if (e.get("content") or 0) != 0]
        cur = self.metadata.schema()
        tables = []
        for e in data:
            if (e.get("file_format") or "parquet") == "avro":
                tbl = self._read_avro_local(e)
            else:
                tbl = pq.read_table(e["file_path"])
            # field-ID projection to the current schema BEFORE deletes
            # (scan._project_to_current analog): files written before a
            # rename carry the old column name — without this, to_arrow
            # surfaced stale names and equality deletes (keyed by
            # current names) missed their rows
            sid = e.get("schema_id")
            fsch = (self.metadata.schema_by_id(sid)
                    if sid is not None and any(s.schema_id == sid
                                               for s in self.metadata.schemas)
                    else cur)
            tbl = _arrow_project_to_schema(tbl, fsch, cur)
            if dels:
                from incubator_iceberg_spark import deletes as DEL
                pos_paths, eq_groups = DEL.scope_deletes_for_file(
                    e, dels, cur)
                tbl = DEL.arrow_apply_pos_deletes(tbl, e["file_path"], pos_paths)
                tbl = DEL.arrow_apply_eq_deletes(tbl, eq_groups)
            tables.append(tbl)
        out = pa.concat_tables(tables, promote_options="permissive")
        if filter is not None:
            import incubator_iceberg_spark.expressions as X
            bound = X.bind(self.metadata.schema(),
                           parse_predicate(filter) if isinstance(filter, str) else filter)
            from incubator_iceberg_spark.py_eval import arrow_mask
            mask = arrow_mask(out, bound)
            if mask is not None:
                out = out.filter(mask)
        return out

    def _read_avro_local(self, entry):
        """Local avro file → arrow table via the engine codec (S14+S7)."""
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        from incubator_iceberg_spark import avro_format as AV
        sid = entry.get("schema_id")
        sch = (self.metadata.schema_by_id(sid)
               if sid is not None and any(s.schema_id == sid
                                          for s in self.metadata.schemas)
               else self.metadata.schema())
        with open(entry["file_path"], "rb") as f:
            cols, _n = AV.read_container(f.read(), sch)
        if not cols:
            cols = [[] for _ in sch.fields]
        arrow_schema = to_arrow_schema(sch.to_spark())
        return pa.table(
            {f.name: pa.array(col, type=arrow_schema.field(f.name).type)
             for f, col in zip(sch.fields, cols)})

    # -- transactions (C10) --------------------------------------------------
    def new_transaction(self, spark=None):
        from incubator_iceberg_spark.transactions import Transaction
        return Transaction(self, spark=spark or self.spark)

    # -- v2 delete files (M8; C6 RowDelta) ---------------------------------
    def add_position_deletes(self, pos_df, spark=None) -> "Table":
        from incubator_iceberg_spark import deletes
        return deletes.add_position_deletes(self, pos_df, spark=spark or self.spark)

    def add_equality_deletes(self, del_df, equality_cols, spark=None) -> "Table":
        from incubator_iceberg_spark import deletes
        return deletes.add_equality_deletes(self, del_df, equality_cols,
                                            spark=spark or self.spark)

    # -- snapshot management (C9; core/.../SnapshotManager.java:32-233) ----
    def rollback_to_snapshot(self, snapshot_id: int) -> "Table":
        def apply(base):
            return base.with_current(snapshot_id)

        self.metadata = MD.run_with_retries(self.ops, apply)
        return self

    def rollback_to_timestamp(self, timestamp_ms: int) -> "Table":
        snap = self.metadata.snapshot_as_of(timestamp_ms)
        if snap is None:
            raise ValueError(f"no snapshot as of {timestamp_ms}")
        return self.rollback_to_snapshot(snap.snapshot_id)

    def set_current_snapshot(self, snapshot_id: int) -> "Table":
        return self.rollback_to_snapshot(snapshot_id)

    def cherry_pick(self, snapshot_id: int) -> "Table":
        """Re-apply a (possibly staged/WAP) append snapshot's added files on
        top of the current snapshot (SnapshotManager cherrypick)."""
        from incubator_iceberg_spark import manifests as MF
        md = self.metadata
        snap = md.snapshot_by_id(snapshot_id)
        if snap is None:
            raise ValueError(f"unknown snapshot {snapshot_id}")
        if snap.operation != "append":
            raise MD.ValidationException(
                f"cherry-pick supports append snapshots only, got {snap.operation}")
        # re-applying a snapshot that is already in the current ancestry
        # would silently DUPLICATE its rows (SnapshotManager's already-
        # applied guard): cherry-pick targets are orphaned/staged commits
        sid = md.current_snapshot_id
        while sid is not None:
            if sid == snapshot_id:
                raise MD.ValidationException(
                    f"snapshot {snapshot_id} is already an ancestor of the "
                    f"current state; cherry-picking it would duplicate rows")
            cur = md.snapshot_by_id(sid)
            sid = cur.parent_id if cur is not None else None
        entries = []
        for row in MF.read_manifest_list_arrow(snap.manifest_list).to_pylist():
            if row.get("added_snapshot_id") != snapshot_id:
                continue
            for e in MF.read_manifest_arrow(row["manifest_path"]).to_pylist():
                if e.get("status") == MF.ADDED and e.get("snapshot_id") == snapshot_id:
                    for k in ("value_counts", "null_counts", "nan_counts"):
                        if isinstance(e.get(k), list):
                            e[k] = dict(e[k]) if e[k] else None
                    e["status"] = MF.ADDED
                    # the re-applied files belong to the NEW commit: strip
                    # the source commit's stamps so the manifest writer
                    # re-stamps snapshot id AND sequence number (stale ids
                    # made cherry-picked rows invisible to incremental/
                    # streaming reads; a stale sequence would let newer
                    # delete files apply to the re-added rows).  Physical
                    # write-time stamps (spec_id, schema_id) are kept.
                    e.pop("snapshot_id", None)
                    e.pop("sequence_number", None)
                    entries.append(e)
        published = {"published-wap-id": snap.summary.get("wap.id")} \
            if snap.summary.get("wap.id") else None
        self.metadata = SN.append_files(self.ops, entries, extra_summary=published)
        return self

    # -- branch/tag refs (SnapshotRef analog beyond WAP) -------------------
    def create_branch(self, name: str, snapshot_id: Optional[int] = None,
                      max_ref_age_ms: Optional[int] = None,
                      min_snapshots_to_keep: Optional[int] = None,
                      max_snapshot_age_ms: Optional[int] = None) -> "Table":
        """Named branch starting at ``snapshot_id`` (default: current head);
        writable via ``append(df, branch=name)``, readable via
        ``to_df(ref=name)``.  Optional SnapshotRef retention (the
        reference's maxRefAgeMs / minSnapshotsToKeep / maxSnapshotAgeMs):
        an aged-out ref is dropped by expire_snapshots, and a branch with
        ancestry retention set keeps only its newest N / young-enough
        ancestry instead of the whole chain (the conservative default)."""
        sid = snapshot_id if snapshot_id is not None else self.metadata.current_snapshot_id
        if sid is None:
            raise ValueError("cannot branch an empty table")
        retention = {"max-ref-age-ms": max_ref_age_ms,
                     "min-snapshots-to-keep": min_snapshots_to_keep,
                     "max-snapshot-age-ms": max_snapshot_age_ms}
        self.metadata = MD.run_with_retries(
            self.ops, lambda base: base.with_ref(name, sid, "branch",
                                                 retention=retention))
        return self

    def create_tag(self, name: str, snapshot_id: Optional[int] = None,
                   max_ref_age_ms: Optional[int] = None) -> "Table":
        """Immutable named snapshot pointer; ``max_ref_age_ms`` lets
        expire_snapshots drop the tag once aged out."""
        sid = snapshot_id if snapshot_id is not None else self.metadata.current_snapshot_id
        if sid is None:
            raise ValueError("cannot tag an empty table")
        self.metadata = MD.run_with_retries(
            self.ops, lambda base: base.with_ref(
                name, sid, "tag",
                retention={"max-ref-age-ms": max_ref_age_ms}))
        return self

    def drop_ref(self, name: str) -> "Table":
        self.metadata = MD.run_with_retries(
            self.ops, lambda base: base.without_ref(name))
        return self

    def fast_forward(self, name: str, to_ref: str) -> "Table":
        """Move ref ``name`` (e.g. "main") to ``to_ref``'s head, requiring
        the move be an ancestry fast-forward (no history rewrite)."""
        def apply(base):
            src = base.ref(to_ref)
            if src is None:
                raise ValueError(f"unknown ref: {to_ref}")
            dst = base.ref(name)
            target = src["snapshot-id"]
            if dst is not None:
                # walk parents from target; must reach dst's head
                cur = base.snapshot_by_id(target)
                ok = False
                while cur is not None:
                    if cur.snapshot_id == dst["snapshot-id"]:
                        ok = True
                        break
                    cur = (base.snapshot_by_id(cur.parent_id)
                           if cur.parent_id is not None else None)
                if not ok:
                    raise MD.ValidationException(
                        f"cannot fast-forward {name} to {to_ref}: not an ancestor")
            ref_type = dst["type"] if dst is not None else "branch"
            return base.with_ref(name, target, ref_type)

        self.metadata = MD.run_with_retries(self.ops, apply)
        return self

    # -- WAP (write-audit-publish) -----------------------------------------
    def wap_append(self, df, wap_id: str, spark=None) -> int:
        """Stage an append without advancing current (TableProperties
        write.wap.enabled); returns the staged snapshot id for audit +
        cherry_pick publish."""
        entries = self._stage(df, spark)
        before = {s.snapshot_id for s in self.metadata.snapshots}
        self.metadata = SN.append_files(self.ops, entries,
                                        extra_summary={"wap.id": wap_id})
        after = [s for s in self.metadata.snapshots if s.snapshot_id not in before]
        return after[0].snapshot_id

    # -- evolution ----------------------------------------------------------
    def update_schema(self):
        from incubator_iceberg_spark.evolution import UpdateSchema
        return UpdateSchema(self)

    def update_spec(self, partition_by) -> "Table":
        from incubator_iceberg_spark.evolution import update_partition_spec
        update_partition_spec(self, partition_by)
        return self

    def replace_sort_order(self, sort_by) -> "Table":
        def apply(base):
            import dataclasses
            md = dataclasses.replace(base)
            order = _as_sort_order(base.schema(), sort_by,
                                   order_id=max((o.order_id for o in base.sort_orders),
                                                default=0) + 1)
            md.sort_orders = list(base.sort_orders) + [order]
            md.default_sort_order_id = order.order_id
            md.last_updated_ms = MD.now_ms()
            return md

        self.metadata = MD.run_with_retries(self.ops, apply)
        return self

    def set_write_spec(self, distribution_mode: Optional[str] = None,
                       sort_by=None) -> "Table":
        """ONE atomic commit for the `ALTER TABLE ... WRITE ...`
        statements (SetWriteDistributionAndOrdering): the distribution
        mode property and the sort order land in the same metadata
        swap, and sort-column validation happens INSIDE the retry
        closure — a bad column name leaves the table untouched.
        ``sort_by=[]`` installs the unsorted order; ``sort_by=None``
        keeps the current order."""
        if distribution_mode not in (None, "none", "hash", "range"):
            raise ValueError(
                f"invalid write.distribution-mode: {distribution_mode}")

        def apply(base):
            import dataclasses
            md = dataclasses.replace(base)
            if sort_by is not None:
                order = _as_sort_order(
                    base.schema(), sort_by,
                    order_id=max((o.order_id for o in base.sort_orders),
                                 default=0) + 1)
                md.sort_orders = list(base.sort_orders) + [order]
                md.default_sort_order_id = order.order_id
            if distribution_mode is not None:
                props = dict(base.properties)
                props[MD.WRITE_DISTRIBUTION_MODE] = distribution_mode
                md.properties = props
            md.last_updated_ms = MD.now_ms()
            return md

        self.metadata = MD.run_with_retries(self.ops, apply)
        return self

    def set_identifier_fields(self, names) -> "Table":
        """C13 / IcebergSqlExtensions.g4:74 `ALTER TABLE ... SET
        IDENTIFIER FIELDS` (UpdateSchema.setIdentifierFields): commit a
        new schema version with the same fields and the given columns
        as identifier-field-ids.  Float/double identifiers are rejected
        (NaN equality makes them unusable as row identity) and the
        columns must be existing top-level fields."""
        names = [names] if isinstance(names, str) else list(names)

        def apply(base):
            import dataclasses
            from incubator_iceberg_spark import schema as S
            sch = base.schema()
            top = {f.field_id for f in sch.fields}
            ids = []
            for n in names:
                f = sch.find_field(n)
                if f is None:
                    raise ValueError(
                        f"no such column for identifier field: {n}")
                if f.field_id not in top:
                    raise ValueError(
                        f"identifier field must be a top-level column: {n}")
                if isinstance(f.type, (S.FloatType, S.DoubleType)):
                    raise ValueError(
                        f"identifier field cannot be float/double: {n}")
                ids.append(f.field_id)
            from incubator_iceberg_spark.partitioning import PartitionSpec
            new = dataclasses.replace(base)
            new_schema_id = max(s.schema_id for s in base.schemas) + 1
            ns = S.Schema(list(sch.fields), schema_id=new_schema_id,
                          identifier_field_ids=tuple(ids))
            new.schemas = list(base.schemas) + [ns]
            new.current_schema_id = new_schema_id
            new.specs = [PartitionSpec(ns, sp.fields, sp.spec_id)
                         for sp in base.specs]
            new.last_updated_ms = MD.now_ms()
            return new

        self.metadata = MD.run_with_retries(self.ops, apply)
        return self

    def drop_identifier_fields(self, names) -> "Table":
        """IcebergSqlExtensions.g4:75 `ALTER TABLE ... DROP IDENTIFIER
        FIELDS`: remove the named columns from the identifier set
        (no-op names raise — the reference's setIdentifierFields
        guard).  The kept set is computed INSIDE the retry closure
        against fresh metadata, so a concurrent SET IDENTIFIER FIELDS
        is never clobbered by a stale read."""
        names = [names] if isinstance(names, str) else list(names)

        def apply(base):
            import dataclasses
            from incubator_iceberg_spark import schema as S
            from incubator_iceberg_spark.partitioning import PartitionSpec
            sch = base.schema()
            current = set(sch.identifier_field_ids or ())
            drop = set()
            for n in names:
                f = sch.find_field(n)
                if f is None or f.field_id not in current:
                    raise ValueError(f"{n} is not an identifier field")
                drop.add(f.field_id)
            keep = tuple(i for i in sch.identifier_field_ids
                         if i not in drop)
            new = dataclasses.replace(base)
            new_schema_id = max(s.schema_id for s in base.schemas) + 1
            ns = S.Schema(list(sch.fields), schema_id=new_schema_id,
                          identifier_field_ids=keep)
            new.schemas = list(base.schemas) + [ns]
            new.current_schema_id = new_schema_id
            new.specs = [PartitionSpec(ns, sp.fields, sp.spec_id)
                         for sp in base.specs]
            new.last_updated_ms = MD.now_ms()
            return new

        self.metadata = MD.run_with_retries(self.ops, apply)
        return self

    # -- metadata tables (S13) ---------------------------------------------
    def count_rows(self, filter=None, spark=None) -> dict:
        """Aggregate-pushdown COUNT: serve ``count(*) WHERE p`` from
        manifest statistics wherever possible, reading only the files
        the predicate PARTIALLY matches (later-Iceberg SparkScan
        aggregate pushdown analog, built on P7's strict evaluator).

        Per planned data file: if the strict metrics/partition
        evaluator proves EVERY row matches, its manifest
        ``record_count`` folds in with zero bytes read; otherwise the
        file is scanned with the residual filter (and any relevant
        delete files applied).  Any delete debt disables the metadata
        path for the affected candidates (a delete file may hide rows
        the bounds still advertise) — same conservatism as R1's
        metadata-only DELETE.

        At 100 TB this is the difference between a manifest-plane
        aggregate (seconds, zero data IO) and a full scan: a
        partition-aligned predicate answers entirely from metadata.
        Returns {count, metadata_only_files, scanned_files}."""
        from pyspark.sql import functions as F

        from incubator_iceberg_spark import row_ops
        from incubator_iceberg_spark.scan import TableScan, read_entries

        spark = spark or self.spark
        md = self.metadata
        expr = (parse_predicate(filter) if isinstance(filter, str)
                else (filter if filter is not None else X.always_true()))
        if md.current_snapshot() is None:
            return {"count": 0, "metadata_only_files": 0,
                    "scanned_files": 0}
        bound = X.bind(md.schema(), expr)
        if isinstance(bound, X.AlwaysFalse):
            return {"count": 0, "metadata_only_files": 0,
                    "scanned_files": 0}
        scan = TableScan(self, spark, row_filter=expr)
        cand, dels = row_ops._plan_delete_candidates(self, scan, bound)
        if cand is None:
            return {"count": 0, "metadata_only_files": 0,
                    "scanned_files": 0}
        meta = [c for c in cand if c["strict"]]
        partial = [c.entry for c in cand if not c["strict"]]
        n = sum(c.entry.get("record_count") or 0 for c in meta)
        if partial:
            df = read_entries(spark, md, partial, dels, md.schema())
            cond = X.to_column(bound)
            n += df.filter(F.coalesce(cond, F.lit(False))).count()
        return {"count": int(n), "metadata_only_files": len(meta),
                "scanned_files": len(partial)}

    def count_non_null(self, column: str, filter=None, spark=None) -> dict:
        """Aggregate-pushdown COUNT(col): non-null counts served from
        manifest value/null counts (the COUNT(*) companion; reference
        keeps both per column — DataFile.java value_counts /
        null_value_counts).  A strictly-matching file contributes
        ``value_count - null_count`` with zero bytes read; files with
        missing counts (metrics mode ``none``) or partial predicate
        matches scan with the residual.
        Returns {count, metadata_only_files, scanned_files}."""
        from pyspark.sql import functions as F

        from incubator_iceberg_spark import row_ops
        from incubator_iceberg_spark.scan import TableScan, read_entries

        spark = spark or self.spark
        md = self.metadata
        if md.schema().find_field(column) is None:
            raise ValueError(f"no such column: {column}")
        expr = (parse_predicate(filter) if isinstance(filter, str)
                else (filter if filter is not None else X.always_true()))
        if md.current_snapshot() is None:
            return {"count": 0, "metadata_only_files": 0,
                    "scanned_files": 0}
        bound = X.bind(md.schema(), expr)
        if isinstance(bound, X.AlwaysFalse):
            return {"count": 0, "metadata_only_files": 0,
                    "scanned_files": 0}
        scan = TableScan(self, spark, row_filter=expr)
        cand, dels = row_ops._plan_delete_candidates(self, scan, bound)
        if cand is None:
            return {"count": 0, "metadata_only_files": 0,
                    "scanned_files": 0}
        # record_count may substitute for a missing value_count ONLY for a
        # column with exactly one value slot per row: a top-level
        # primitive, or a struct-nested primitive leaf reached through
        # STRUCTS alone (structs don't repeat).  A leaf under a list/map
        # can hold 0..N values per row, so the substitution would be a
        # silent wrong count — those files scan.
        from incubator_iceberg_spark import schema as S

        def _one_slot_per_row(dotted: str) -> bool:
            t = md.schema().struct
            for seg in dotted.split("."):
                if not isinstance(t, S.StructType):
                    return False
                nf = next((f for f in t.fields if f.name == seg), None)
                if nf is None:
                    return False
                t = nf.type
            return t.is_primitive

        top_scalar = _one_slot_per_row(column)
        n = 0
        meta_files = 0
        partial = []
        for c in cand:
            e = c.entry
            nulls = (e.get("null_counts") or {}).get(column)
            values = (e.get("value_counts") or {}).get(column)
            if values is None and top_scalar:
                # top-level scalar: one value per row
                values = e.get("record_count")
            if not c["strict"] or nulls is None or values is None:
                partial.append(e)
                continue
            meta_files += 1
            n += values - nulls
        if partial:
            df = read_entries(spark, md, partial, dels, md.schema())
            cond = X.to_column(bound)
            r = (df.filter(F.coalesce(cond, F.lit(False)))
                 .agg(F.count(column).alias("c")).collect()[0])
            n += r["c"]
        return {"count": int(n), "metadata_only_files": meta_files,
                "scanned_files": len(partial)}

    def min_max(self, column: str, filter=None, spark=None) -> dict:
        """MIN/MAX aggregate pushdown from manifest bounds (the
        companion of :meth:`count_rows`): a file every row of which
        matches the predicate contributes its exact write-time bounds
        with zero bytes read; partial matches scan with the residual.

        Restricted to numeric/date/timestamp columns — their bounds are
        exact values; string bounds under ``truncate(N)`` metrics are
        PREFIXES (bounds, not attained values) and must scan.  Files
        with missing bounds (``counts``/``none`` metrics modes) or any
        relevant delete debt fall back to scanning too.
        Returns {min, max, metadata_only_files, scanned_files}."""
        from pyspark.sql import functions as F

        from incubator_iceberg_spark import py_eval as PE
        from incubator_iceberg_spark import row_ops
        from incubator_iceberg_spark import schema as S
        from incubator_iceberg_spark.scan import TableScan, read_entries

        spark = spark or self.spark
        md = self.metadata
        f = md.schema().find_field(column)
        if f is None:
            raise ValueError(f"no such column: {column}")
        if not isinstance(f.type, (S.IntegerType, S.LongType, S.FloatType,
                                   S.DoubleType, S.DateType,
                                   S.TimestampType)):
            raise ValueError(
                f"min_max pushdown unsupported for type of {column!r} "
                f"(string/binary bounds may be truncated prefixes)")
        empty = {"min": None, "max": None, "metadata_only_files": 0,
                 "scanned_files": 0}
        expr = (parse_predicate(filter) if isinstance(filter, str)
                else (filter if filter is not None else X.always_true()))
        if md.current_snapshot() is None:
            return dict(empty)
        bound = X.bind(md.schema(), expr)
        if isinstance(bound, X.AlwaysFalse):
            return dict(empty)
        scan = TableScan(self, spark, row_filter=expr)
        cand, dels = row_ops._plan_delete_candidates(self, scan, bound)
        if cand is None:
            return dict(empty)
        lo = hi = None
        meta_files = 0
        partial = []
        for c in cand:
            e = c.entry
            nulls = (e.get("null_counts") or {}).get(column)
            values = (e.get("value_counts") or {}).get(column)
            if (c["strict"] and nulls is not None and values is not None
                    and nulls >= values):
                meta_files += 1  # all-null column in this file: no value
                continue
            elb = (e.get("lower_bounds") or {}).get(column)
            eub = (e.get("upper_bounds") or {}).get(column)
            if not c["strict"] or elb is None or eub is None:
                partial.append(e)
                continue
            meta_files += 1
            elb, eub = PE._norm(elb), PE._norm(eub)
            lo = elb if lo is None or elb < lo else lo
            hi = eub if hi is None or eub > hi else hi
        if partial:
            df = read_entries(spark, md, partial, dels, md.schema())
            cond = X.to_column(bound)
            r = (df.filter(F.coalesce(cond, F.lit(False)))
                 .agg(F.min(column).alias("mn"),
                      F.max(column).alias("mx")).collect()[0])
            smn, smx = PE._norm(r["mn"]), PE._norm(r["mx"])
            if smn is not None:
                lo = smn if lo is None or smn < lo else lo
            if smx is not None:
                hi = smx if hi is None or smx > hi else hi
        return {"min": lo, "max": hi, "metadata_only_files": meta_files,
                "scanned_files": len(partial)}

    def metadata_table(self, kind: str, spark=None):
        from incubator_iceberg_spark import metadata_tables
        return metadata_tables.metadata_table(self, kind, spark or self.spark)

    # -- maintenance (§2.7) --------------------------------------------------
    def expire_snapshots(self, older_than_ms: Optional[int] = None,
                         retain_last: int = 1, delete_files: bool = True) -> dict:
        from incubator_iceberg_spark import maintenance
        return maintenance.expire_snapshots(self, older_than_ms=older_than_ms,
                                            retain_last=retain_last,
                                            delete_files=delete_files)

    def remove_orphan_files(self, older_than_ms: Optional[int] = None,
                            dry_run: bool = False) -> list:
        from incubator_iceberg_spark import maintenance
        return maintenance.remove_orphan_files(self, older_than_ms=older_than_ms,
                                               dry_run=dry_run)

    def rewrite_data_files(self, target_file_size: Optional[int] = None,
                           min_input_files: int = 5, filter=None, spark=None) -> dict:
        from incubator_iceberg_spark import maintenance
        return maintenance.rewrite_data_files(self, spark=spark or self.spark,
                                              target_file_size=target_file_size,
                                              min_input_files=min_input_files,
                                              filter=filter)

    def rewrite_manifests(self, spark=None) -> dict:
        from incubator_iceberg_spark import maintenance
        return maintenance.rewrite_manifests(self, spark=spark or self.spark)

    def remove_dangling_deletes(self) -> dict:
        from incubator_iceberg_spark import maintenance
        return maintenance.remove_dangling_deletes(self)

    def rewrite_position_deletes(self, spark=None, fmt=None) -> dict:
        from incubator_iceberg_spark import maintenance
        return maintenance.rewrite_position_deletes(
            self, spark=spark or self.spark, fmt=fmt)

    def convert_equality_deletes(self, spark=None) -> dict:
        from incubator_iceberg_spark import maintenance
        return maintenance.convert_equality_deletes(self, spark=spark or self.spark)

    def run_maintenance(self, spark=None, **kw) -> dict:
        """Composite housekeeping (compact → delete-file cleanup →
        manifest rewrite → expire → orphans)."""
        from incubator_iceberg_spark import maintenance
        return maintenance.run_maintenance(self, spark=spark or self.spark, **kw)

    def write_partition_stats(self, spark=None) -> dict:
        from incubator_iceberg_spark import maintenance
        return maintenance.write_partition_stats(self, spark=spark or self.spark)

    def partition_stats(self, spark=None):
        from incubator_iceberg_spark import maintenance
        return maintenance.partition_stats(self, spark=spark or self.spark)

    def compute_column_stats(self, spark=None, columns=None) -> dict:
        from incubator_iceberg_spark import maintenance
        return maintenance.compute_column_stats(
            self, spark=spark or self.spark, columns=columns)

    def column_stats(self, spark=None):
        from incubator_iceberg_spark import maintenance
        return maintenance.column_stats(self, spark=spark or self.spark)

    def fast_count(self, filter=None, spark=None):
        """Metadata-only exact COUNT(*) (None → needs a data scan)."""
        from incubator_iceberg_spark import agg_pushdown
        return agg_pushdown.fast_count(self, filter=filter,
                                       spark=spark or self.spark)

    def fast_min_max(self, column, spark=None):
        """Metadata-only exact (min, max) (None → needs a data scan)."""
        from incubator_iceberg_spark import agg_pushdown
        return agg_pushdown.fast_min_max(self, column, spark=spark or self.spark)

    def auto_maintain(self, spark=None, policy=None,
                      dry_run: bool = False) -> dict:
        """Policy-driven maintenance — maintenance.auto_maintain."""
        from incubator_iceberg_spark import maintenance
        return maintenance.auto_maintain(self, spark=spark or self.spark,
                                         policy=policy, dry_run=dry_run)

    def zorder_rewrite(self, columns, spark=None, **kw) -> dict:
        from incubator_iceberg_spark import maintenance
        return maintenance.zorder_rewrite(self, columns,
                                          spark=spark or self.spark, **kw)

    def sort_rewrite(self, sort_by, spark=None, **kw) -> dict:
        from incubator_iceberg_spark import maintenance
        return maintenance.sort_rewrite(self, sort_by,
                                        spark=spark or self.spark, **kw)

    def changelog(self, from_snapshot_id=None, to_snapshot_id=None, spark=None,
                  net_changes=False):
        """Row-level CDC diff in (from, to] — see changelog.changelog."""
        from incubator_iceberg_spark import changelog as CL
        return CL.changelog(self, spark=spark or self.spark,
                            from_snapshot_id=from_snapshot_id,
                            to_snapshot_id=to_snapshot_id,
                            net_changes=net_changes)

    def changelog_with_updates(self, identifier_cols=None,
                               from_snapshot_id=None, to_snapshot_id=None,
                               spark=None, net_changes=False):
        """CDC diff with update_preimage/update_postimage pairing — see
        changelog.changelog_with_updates."""
        from incubator_iceberg_spark import changelog as CL
        return CL.changelog_with_updates(
            self, spark=spark or self.spark,
            identifier_cols=identifier_cols,
            from_snapshot_id=from_snapshot_id,
            to_snapshot_id=to_snapshot_id,
            net_changes=net_changes)
