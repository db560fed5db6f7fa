"""SQLite-backed catalog — the JdbcCatalog analog (SURVEY §2.1 S15;
core/.../jdbc/JdbcCatalog.java re-expressed for the Python engine).

The FS `Catalog` resolves a table's current version by probing the
filesystem (HadoopCatalog semantics: atomic create-if-absent +
version-hint).  Here the AUTHORITATIVE pointer lives in one SQLite row
per table and commits swap it with a compare-and-set UPDATE — the JDBC
catalog's optimistic protocol.  Metadata/manifest files stay on the
filesystem exactly as before; only the "which version is current"
decision moves into the database, which is what makes REPLACE/DROP
visible across writers that don't share a filesystem view.

    cat = SqliteCatalog("/path/catalog.db", warehouse, spark)
    t = cat.create_table("db.t", schema)

Concurrency: SQLite serializes writers per database file (BEGIN
IMMEDIATE); a lost CAS raises CommitFailedException and the engine's
retry loop re-applies on fresh metadata, same as the FS path.
"""

from __future__ import annotations

import os
import sqlite3
import uuid
from typing import Optional

from incubator_iceberg_spark import metadata as MD
from incubator_iceberg_spark.metadata import (
    CommitFailedException,
    TableMetadata,
    TableOperations,
)
from incubator_iceberg_spark.table import (
    NoSuchTableError,
    Table,
    TableAlreadyExistsError,
)

_DDL = """
CREATE TABLE IF NOT EXISTS iceberg_tables (
    name     TEXT PRIMARY KEY,
    location TEXT NOT NULL,
    version  INTEGER NOT NULL
)
"""


def _connect(db_path: str) -> sqlite3.Connection:
    con = sqlite3.connect(db_path, timeout=30.0)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute(_DDL)
    return con


class SqliteTableOperations(TableOperations):
    """TableOperations whose current-version pointer is a SQLite row."""

    def __init__(self, db_path: str, name: str, table_location: str):
        super().__init__(table_location)
        self.db_path = db_path
        self.name = name

    def current_version(self) -> Optional[int]:
        with _connect(self.db_path) as con:
            row = con.execute(
                "SELECT version FROM iceberg_tables WHERE name = ?",
                (self.name,)).fetchone()
        return row[0] if row else None

    def commit(self, base_version: Optional[int], metadata: TableMetadata) -> int:
        import json

        os.makedirs(self.metadata_dir, exist_ok=True)
        new_version = (base_version or 0) + 1
        final = self.metadata_path(new_version)
        tmp = os.path.join(self.metadata_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(metadata.to_json(), f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)  # file-level create-if-absent guard
        except FileExistsError:
            raise CommitFailedException(
                f"version {new_version} already written by a concurrent writer")
        finally:
            os.unlink(tmp)

        con = _connect(self.db_path)
        try:
            con.execute("BEGIN IMMEDIATE")
            if base_version is None:
                try:
                    con.execute(
                        "INSERT INTO iceberg_tables (name, location, version) "
                        "VALUES (?, ?, ?)",
                        (self.name, self.location, new_version))
                except sqlite3.IntegrityError:
                    con.rollback()
                    os.unlink(final)
                    raise CommitFailedException(
                        f"table {self.name} concurrently created")
            else:
                cur = con.execute(
                    "UPDATE iceberg_tables SET version = ? "
                    "WHERE name = ? AND version = ?",
                    (new_version, self.name, base_version))
                if cur.rowcount == 0:
                    con.rollback()
                    os.unlink(final)
                    raise CommitFailedException(
                        f"concurrent commit won the pointer swap for {self.name}")
            con.commit()
        finally:
            con.close()
        return new_version


class SqliteCatalog:
    """Same surface as ``Catalog``, pointer-in-SQLite commit protocol."""

    def __init__(self, db_path: str, warehouse: str, spark=None):
        self.db_path = os.path.abspath(db_path)
        self.warehouse = os.path.abspath(warehouse)
        self.spark = spark
        os.makedirs(self.warehouse, exist_ok=True)
        with _connect(self.db_path):
            pass  # ensure schema

    def _table_location(self, name: str) -> str:
        return os.path.join(self.warehouse, *name.split("."))

    def _ops(self, name: str) -> SqliteTableOperations:
        # location comes from the pointer row when it exists (a renamed
        # table keeps its original directory), else from the name
        with _connect(self.db_path) as con:
            row = con.execute(
                "SELECT location FROM iceberg_tables WHERE name = ?",
                (name,)).fetchone()
        loc = row[0] if row else self._table_location(name)
        return SqliteTableOperations(self.db_path, name, loc)

    def create_table(self, name: str, schema, partition_by=None,
                     properties: Optional[dict] = None,
                     sort_by=None, identifier_fields=None, spark=None) -> Table:
        from incubator_iceberg_spark.partitioning import PartitionSpec
        from incubator_iceberg_spark.table import _as_schema, _as_sort_order
        from incubator_iceberg_spark.schema import Schema

        ops = self._ops(name)
        if ops.refresh() is not None:
            raise TableAlreadyExistsError(name)
        if self.view_exists(name):
            raise TableAlreadyExistsError(f"{name} exists as a view")
        parts = name.split(".")
        for j in range(1, len(parts)):
            if self.view_exists(".".join(parts[:j])):
                raise TableAlreadyExistsError(
                    f"{name}: ancestor {'.'.join(parts[:j])} is a view")
        # a renamed-away table keeps its original (name-derived) directory;
        # re-creating the old name must NOT share it — interleaved metadata
        # versions and orphan-file cleanup would corrupt both tables.  Pick
        # a fresh suffixed location instead (the pointer row, not the path,
        # is the identity — JdbcCatalog/Nessie location-independence).
        if os.path.isdir(os.path.join(ops.location, "metadata")):
            ops = SqliteTableOperations(
                self.db_path, name,
                ops.location + "-" + uuid.uuid4().hex[:8])
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
        spec = (PartitionSpec.build(schema, partition_by)
                if partition_by else PartitionSpec.unpartitioned(schema))
        md = TableMetadata.new(ops.location, schema, spec, properties)
        if sort_by:
            md.sort_orders = [_as_sort_order(schema, sort_by, order_id=1)]
            md.default_sort_order_id = 1

        def apply(base):
            if base is not None:
                raise TableAlreadyExistsError(name)
            return md

        MD.run_with_retries(ops, apply, retries=0)
        return Table(name, ops, spark or self.spark)

    def create_table_as_select(self, name: str, df, partition_by=None,
                               properties: Optional[dict] = None,
                               spark=None) -> Table:
        from incubator_iceberg_spark.schema import Schema
        t = self.create_table(name, Schema.from_spark(df.schema),
                              partition_by=partition_by,
                              properties=properties, spark=spark)
        t.append(df)
        return t

    def load_table(self, name: str, spark=None) -> Table:
        ops = self._ops(name)
        if ops.refresh() is None:
            raise NoSuchTableError(name)
        return Table(name, ops, spark or self.spark)

    def table_exists(self, name: str) -> bool:
        return self._ops(name).refresh() is not None

    def drop_table(self, name: str, purge: bool = True) -> bool:
        import shutil
        with _connect(self.db_path) as con:
            row = con.execute(
                "SELECT location FROM iceberg_tables WHERE name = ?",
                (name,)).fetchone()
            cur = con.execute("DELETE FROM iceberg_tables WHERE name = ?", (name,))
            existed = cur.rowcount > 0
        if existed and purge:
            # purge the POINTER's location — a renamed table lives at its
            # original directory, not the current-name-derived path
            shutil.rmtree(row[0], ignore_errors=True)
        return existed

    def rename_table(self, name: str, new_name: str) -> None:
        """Metadata-only rename: the pointer row moves, files stay put
        (JdbcCatalog.renameTable semantics — location is independent of
        the name)."""
        with _connect(self.db_path) as con:
            con.execute("BEGIN IMMEDIATE")
            row = con.execute("SELECT 1 FROM iceberg_tables WHERE name = ?",
                              (new_name,)).fetchone()
            if row:
                con.rollback()
                raise TableAlreadyExistsError(new_name)
            cur = con.execute(
                "UPDATE iceberg_tables SET name = ? WHERE name = ?",
                (new_name, name))
            if cur.rowcount == 0:
                con.rollback()
                raise NoSuchTableError(name)
            con.commit()

    def list_tables(self, namespace: str = "") -> list:
        q = "SELECT name FROM iceberg_tables"
        args: tuple = ()
        if namespace:
            q += " WHERE name LIKE ?"
            args = (namespace + ".%",)
        with _connect(self.db_path) as con:
            return sorted(r[0] for r in con.execute(q, args))

    # -- views (views.py): metadata lives on the filesystem under the
    # warehouse path; the pointer DB stays tables-only, exactly like the
    # reference's JdbcCatalog pairing with a ViewCatalog implementation

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
