"""Catalog-level branches and tags — the NessieCatalog analog (SURVEY
§2.1 S15 stretch; nessie/src/main/java/org/apache/iceberg/nessie/NessieCatalog.java
re-expressed for the Python engine).

Where table-level refs (Table.create_branch) version ONE table's snapshot
pointer, a Nessie-style catalog versions the WHOLE catalog state: every
commit is an immutable (name → table-metadata-pointer) map with a parent
hash, and a branch is a mutable ref to one commit.  That gives
cross-table atomicity semantics the reference gets from Nessie:

- writers on branch ``etl`` see and mutate only ``etl``'s state;
- ``main`` readers see nothing until an explicit ``merge``;
- merge fast-forwards when possible, else applies a three-way per-table
  merge from the common ancestor and raises ``MergeConflictError`` when
  both branches changed the same table.

Storage reuses the SQLite pointer-store pattern of ``SqliteCatalog``
(BEGIN IMMEDIATE serializes ref swaps; losers raise
CommitFailedException and the engine retry loop re-applies), and
metadata/manifest files stay on the shared filesystem.  Metadata files
are uuid-named so the same table can advance independently on two
branches without filename collisions.
"""

from __future__ import annotations

import json
import os
import sqlite3
import time
from contextlib import closing
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

_DDL = [
    """
    CREATE TABLE IF NOT EXISTS catalog_refs (
        ref      TEXT PRIMARY KEY,
        type     TEXT NOT NULL,
        hash     TEXT NOT NULL
    )
    """,
    """
    CREATE TABLE IF NOT EXISTS catalog_commits (
        hash        TEXT PRIMARY KEY,
        parent      TEXT,
        merge_parent TEXT,
        message     TEXT,
        tables_json TEXT NOT NULL,
        created_ms  INTEGER NOT NULL
    )
    """,
]

_EMPTY_HASH = "0" * 16


def _rel_to(base: str, path: str) -> str:
    """Store catalog pointers relative to the warehouse root so relocating
    the warehouse (or its db file) keeps every entry resolvable — the
    reference keeps metadata pointers resolvable relative to the table
    location for the same reason.  Paths outside the warehouse stay
    absolute."""
    try:
        rel = os.path.relpath(os.path.abspath(path), base)
    except ValueError:  # different drive (windows)
        return path
    return path if rel.startswith("..") else rel


def _abs_to(base: str, path: str) -> str:
    return path if os.path.isabs(path) else os.path.join(base, path)


class MergeConflictError(Exception):
    """Both branches changed the same table since their common ancestor."""


_initialized: set = set()


def _connect(db_path: str) -> sqlite3.Connection:
    # autocommit mode: transactions are ONLY the explicit BEGIN IMMEDIATE
    # blocks below (python's implicit-transaction default would leave the
    # seed INSERTs holding a txn open).  DDL + root-commit seeding runs
    # once per db path per process; callers MUST close (or use the
    # `with closing(...)`-style contexts below) — sqlite3's own context
    # manager commits, it does not close.
    con = sqlite3.connect(db_path, timeout=30.0, isolation_level=None)
    con.execute("PRAGMA journal_mode=WAL")
    if db_path not in _initialized:
        for ddl in _DDL:
            con.execute(ddl)
        # the empty root commit every new ref starts from (idempotent —
        # a concurrent-process race is harmless)
        con.execute(
            "INSERT OR IGNORE INTO catalog_commits "
            "(hash, parent, merge_parent, message, tables_json, created_ms) "
            "VALUES (?, NULL, NULL, 'root', '{}', ?)",
            (_EMPTY_HASH, int(time.time() * 1000)))
        con.execute(
            "INSERT OR IGNORE INTO catalog_refs (ref, type, hash) "
            "VALUES ('main', 'branch', ?)", (_EMPTY_HASH,))
        _initialized.add(db_path)
    return con


def _tables_at(con, ref_hash: str) -> dict:
    row = con.execute("SELECT tables_json FROM catalog_commits WHERE hash = ?",
                      (ref_hash,)).fetchone()
    if row is None:
        raise CommitFailedException(f"unknown commit {ref_hash}")
    return json.loads(row[0])


def _ref_hash(con, ref: str) -> tuple:
    row = con.execute("SELECT type, hash FROM catalog_refs WHERE ref = ?",
                      (ref,)).fetchone()
    if row is None:
        raise NoSuchRefError(ref)
    return row


class NoSuchRefError(Exception):
    pass


class BranchTableOperations(TableOperations):
    """TableOperations whose current pointer lives in the branch's commit
    map.  ``version`` is a per-(branch, table) monotone counter; each
    version maps to a uuid-named metadata file so two branches can write
    v3 of the same table without colliding."""

    def __init__(self, catalog: "NessieLiteCatalog", name: str,
                 table_location: str):
        super().__init__(table_location)
        self.catalog = catalog
        self.name = name

    def _entry(self, con) -> Optional[dict]:
        _, h = self.catalog._resolve(con)
        e = _tables_at(con, h).get(self.name)
        # a VIEW entry sharing the name map is invisible to table ops
        return None if e and e.get("kind") == "view" else e

    def current_version(self) -> Optional[int]:
        with closing(_connect(self.catalog.db_path)) as con:
            e = self._entry(con)
        return e["version"] if e else None

    def refresh(self) -> Optional[TableMetadata]:
        with closing(_connect(self.catalog.db_path)) as con:
            e = self._entry(con)
        if e is None:
            return None
        with open(_abs_to(self.catalog.warehouse, e["metadata_file"])) as f:
            md = TableMetadata.from_json(json.load(f))
        md._version = e["version"]  # type: ignore[attr-defined]
        return md

    def commit(self, base_version: Optional[int], metadata: TableMetadata) -> int:
        cat = self.catalog
        os.makedirs(self.metadata_dir, exist_ok=True)
        new_version = (base_version or 0) + 1
        mfile = os.path.join(self.metadata_dir,
                             f"b-{uuid.uuid4().hex}.metadata.json")
        with open(mfile, "w") as f:
            json.dump(metadata.to_json(), f, default=MD._json_default)
            f.flush()
            os.fsync(f.fileno())

        con = _connect(cat.db_path)
        try:
            con.execute("BEGIN IMMEDIATE")
            ref_type, cur_hash = cat._resolve(con)
            if ref_type != "branch":
                con.rollback()
                raise CommitFailedException(
                    f"ref {cat.ref!r} is a {ref_type}; only branches accept commits")
            tables = _tables_at(con, cur_hash)
            entry = tables.get(self.name)
            if entry and entry.get("kind") == "view":
                con.rollback()
                os.unlink(mfile)
                raise CommitFailedException(
                    f"{self.name}@{cat.ref} is a view")
            cur_v = entry["version"] if entry else None
            if cur_v != base_version:
                con.rollback()
                os.unlink(mfile)
                raise CommitFailedException(
                    f"{self.name}@{cat.ref}: expected v{base_version}, "
                    f"found v{cur_v} (concurrent catalog commit)")
            tables[self.name] = {"location": _rel_to(cat.warehouse, self.location),
                                 "version": new_version,
                                 "metadata_file": _rel_to(cat.warehouse, mfile)}
            new_hash = uuid.uuid4().hex[:16]
            con.execute(
                "INSERT INTO catalog_commits (hash, parent, merge_parent, "
                "message, tables_json, created_ms) VALUES (?, ?, NULL, ?, ?, ?)",
                (new_hash, cur_hash, f"commit {self.name} v{new_version}",
                 json.dumps(tables), int(time.time() * 1000)))
            cur = con.execute(
                "UPDATE catalog_refs SET hash = ? WHERE ref = ? AND hash = ?",
                (new_hash, cat.ref, cur_hash))
            if cur.rowcount == 0:
                con.rollback()
                os.unlink(mfile)
                raise CommitFailedException(
                    f"concurrent commit moved ref {cat.ref!r}")
            con.commit()
        finally:
            con.close()
        return new_version


class BranchViewOperations:
    """views.ViewOperations whose current pointer lives in the branch's
    commit map (entry ``kind: view``): per-branch view versions, and
    branch merge/conflict semantics come from the same three-way map
    merge tables use."""

    def __init__(self, catalog: "NessieLiteCatalog", name: str,
                 location: str):
        self.catalog = catalog
        self.name = name
        self.location = location
        self.metadata_dir = os.path.join(location, "metadata")

    def _entry(self, con) -> Optional[dict]:
        _, h = self.catalog._resolve(con)
        e = _tables_at(con, h).get(self.name)
        return e if e and e.get("kind") == "view" else None

    def current_version(self) -> Optional[int]:
        with closing(_connect(self.catalog.db_path)) as con:
            e = self._entry(con)
        return e["version"] if e else None

    def refresh(self):
        from incubator_iceberg_spark.views import ViewMetadata
        with closing(_connect(self.catalog.db_path)) as con:
            e = self._entry(con)
        if e is None:
            return None
        with open(_abs_to(self.catalog.warehouse, e["metadata_file"])) as f:
            return ViewMetadata.from_json(json.load(f))

    def commit(self, base_version: Optional[int], md) -> int:
        cat = self.catalog
        os.makedirs(self.metadata_dir, exist_ok=True)
        new_version = (base_version or 0) + 1
        mfile = os.path.join(self.metadata_dir,
                             f"b-{uuid.uuid4().hex}.view-metadata.json")
        with open(mfile, "w") as f:
            json.dump(md.to_json(), f)
            f.flush()
            os.fsync(f.fileno())
        con = _connect(cat.db_path)
        try:
            con.execute("BEGIN IMMEDIATE")
            ref_type, cur_hash = cat._resolve(con)
            if ref_type != "branch":
                con.rollback()
                os.unlink(mfile)
                raise CommitFailedException(
                    f"ref {cat.ref!r} is a {ref_type}; only branches "
                    "accept commits")
            tables = _tables_at(con, cur_hash)
            entry = tables.get(self.name)
            if entry and entry.get("kind") != "view":
                con.rollback()
                os.unlink(mfile)
                raise CommitFailedException(
                    f"{self.name}@{cat.ref} is a table")
            cur_v = entry["version"] if entry else None
            if cur_v != base_version:
                con.rollback()
                os.unlink(mfile)
                raise CommitFailedException(
                    f"{self.name}@{cat.ref}: expected view v{base_version},"
                    f" found v{cur_v} (concurrent catalog commit)")
            tables[self.name] = {
                "kind": "view",
                "location": _rel_to(cat.warehouse, self.location),
                "version": new_version,
                "metadata_file": _rel_to(cat.warehouse, mfile)}
            new_hash = uuid.uuid4().hex[:16]
            con.execute(
                "INSERT INTO catalog_commits (hash, parent, merge_parent, "
                "message, tables_json, created_ms) VALUES (?, ?, NULL, ?, ?, ?)",
                (new_hash, cur_hash,
                 f"commit view {self.name} v{new_version}",
                 json.dumps(tables), int(time.time() * 1000)))
            cur = con.execute(
                "UPDATE catalog_refs SET hash = ? WHERE ref = ? AND hash = ?",
                (new_hash, cat.ref, cur_hash))
            if cur.rowcount == 0:
                con.rollback()
                os.unlink(mfile)
                raise CommitFailedException(
                    f"concurrent commit moved ref {cat.ref!r}")
            con.commit()
        finally:
            con.close()
        return new_version


class StagedTableOperations(BranchTableOperations):
    """TableOperations that stage commits into a CatalogTransaction
    instead of the ref store: metadata files are written, but the
    catalog pointer only moves when the WHOLE transaction commits."""

    def __init__(self, txn: "CatalogTransaction", name: str,
                 table_location: str):
        super().__init__(txn.catalog, name, table_location)
        self.txn = txn

    def _staged(self) -> Optional[dict]:
        return self.txn.staged.get(self.name)

    def current_version(self) -> Optional[int]:
        s = self._staged()
        if s is not None:
            return s["version"]
        e = self.txn.base_tables.get(self.name)
        return e["version"] if e else None

    def refresh(self) -> Optional[TableMetadata]:
        s = self._staged() or self.txn.base_tables.get(self.name)
        if s is None:
            return None
        with open(_abs_to(self.catalog.warehouse, s["metadata_file"])) as f:
            md = TableMetadata.from_json(json.load(f))
        md._version = s["version"]  # type: ignore[attr-defined]
        return md

    def commit(self, base_version: Optional[int], metadata: TableMetadata) -> int:
        cur = self.current_version()
        if cur != base_version:
            raise CommitFailedException(
                f"{self.name}@txn: expected v{base_version}, found v{cur}")
        new_version = (base_version or 0) + 1
        os.makedirs(self.metadata_dir, exist_ok=True)
        mfile = os.path.join(self.metadata_dir,
                             f"b-{uuid.uuid4().hex}.metadata.json")
        with open(mfile, "w") as f:
            json.dump(metadata.to_json(), f, default=MD._json_default)
            f.flush()
            os.fsync(f.fileno())
        wh = self.catalog.warehouse
        self.txn.staged[self.name] = {"location": _rel_to(wh, self.location),
                                      "version": new_version,
                                      "metadata_file": _rel_to(wh, mfile)}
        return new_version


class CatalogTransaction:
    """ATOMIC MULTI-TABLE transaction on a branch — the capability the
    reference ecosystem gets from Nessie: any number of table mutations
    (appends, deletes, creates, …) staged against one catalog state and
    published by a single ref CAS.  Readers see all of it or none of it.

    Conflict rule at commit: every touched table's version in the
    branch's CURRENT state must still equal the version this transaction
    started from (per-table optimistic check — commits that touched
    DISJOINT tables interleave freely; a concurrent change to a touched
    table fails the transaction, nothing is applied).

        with cat.transaction() as txn:
            txn.table("db.a").append(df1)
            txn.table("db.b").append(df2)
        # one catalog commit: a and b move together
    """

    def __init__(self, catalog: "NessieLiteCatalog"):
        self.catalog = catalog
        with closing(_connect(catalog.db_path)) as con:
            ref_type, h = catalog._resolve(con)
            if ref_type != "branch":
                raise ValueError(
                    f"transactions require a branch (ref {catalog.ref!r} "
                    f"is a {ref_type})")
            self.base_hash = h
            self.base_tables = _tables_at(con, h)
        self.staged: dict = {}
        self._done = False

    def table(self, name: str) -> Table:
        e = self.staged.get(name) or self.base_tables.get(name)
        loc = _abs_to(self.catalog.warehouse, e["location"]) if e else os.path.join(
            self.catalog.warehouse, *name.split("."), uuid.uuid4().hex[:8])
        ops = StagedTableOperations(self, name, loc)
        if ops.refresh() is None:
            raise NoSuchTableError(f"{name}@{self.catalog.ref} (txn)")
        return Table(name, ops, self.catalog.spark)

    def create_table(self, name: str, schema, partition_by=None,
                     properties: Optional[dict] = None) -> Table:
        from incubator_iceberg_spark.partitioning import PartitionSpec
        from incubator_iceberg_spark.table import _as_schema

        if name in self.staged or name in self.base_tables:
            raise TableAlreadyExistsError(f"{name}@{self.catalog.ref}")
        loc = os.path.join(self.catalog.warehouse, *name.split("."),
                           uuid.uuid4().hex[:8])
        ops = StagedTableOperations(self, name, loc)
        schema = _as_schema(schema)
        spec = (PartitionSpec.build(schema, partition_by)
                if partition_by else PartitionSpec.unpartitioned(schema))
        md = TableMetadata.new(loc, schema, spec, properties)
        ops.commit(None, md)
        return Table(name, ops, self.catalog.spark)

    def commit(self) -> str:
        if self._done:
            raise RuntimeError("transaction already finished")
        self._done = True
        if not self.staged:
            return self.base_hash
        cat = self.catalog
        con = _connect(cat.db_path)
        try:
            con.execute("BEGIN IMMEDIATE")
            ref_type, cur_hash = cat._resolve(con)
            if ref_type != "branch":
                raise CommitFailedException(f"ref {cat.ref!r} became {ref_type}")
            tables = _tables_at(con, cur_hash)
            for name in self.staged:
                base_e = self.base_tables.get(name)
                cur_e = tables.get(name)
                base_v = base_e["version"] if base_e else None
                cur_v = cur_e["version"] if cur_e else None
                if base_v != cur_v:
                    con.rollback()
                    raise CommitFailedException(
                        f"transaction conflict: {name}@{cat.ref} moved "
                        f"v{base_v} → v{cur_v} since the transaction began")
            tables.update(self.staged)
            new_hash = uuid.uuid4().hex[:16]
            con.execute(
                "INSERT INTO catalog_commits (hash, parent, merge_parent, "
                "message, tables_json, created_ms) VALUES (?, ?, NULL, ?, ?, ?)",
                (new_hash, cur_hash,
                 f"txn: {len(self.staged)} table(s) "
                 + ", ".join(sorted(self.staged)),
                 json.dumps(tables), int(time.time() * 1000)))
            cur = con.execute(
                "UPDATE catalog_refs SET hash = ? WHERE ref = ? AND hash = ?",
                (new_hash, cat.ref, cur_hash))
            if cur.rowcount == 0:
                con.rollback()
                raise CommitFailedException(
                    f"concurrent commit moved ref {cat.ref!r}")
            con.commit()
            return new_hash
        finally:
            con.close()

    def __enter__(self) -> "CatalogTransaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is None:
            self.commit()
        else:
            self._done = True  # abandon: staged files become orphans (GC'd)
        return False


class NessieLiteCatalog:
    """Catalog with Nessie-style branches/tags.  Same table surface as
    ``Catalog``/``SqliteCatalog`` plus ref management; all table
    operations act on ``self.ref``."""

    def __init__(self, db_path: str, warehouse: str, spark=None,
                 ref: str = "main"):
        self.db_path = os.path.abspath(db_path)
        self.warehouse = os.path.abspath(warehouse)
        self.spark = spark
        self.ref = ref
        os.makedirs(self.warehouse, exist_ok=True)
        with closing(_connect(self.db_path)):
            pass

    def _resolve(self, con) -> tuple:
        """(ref_type, commit_hash) for this view — detached views pin a
        commit hash and are read-only."""
        h = getattr(self, "_detached_hash", None)
        if h is not None:
            return ("detached", h)
        return _ref_hash(con, self.ref)

    def transaction(self) -> "CatalogTransaction":
        """Begin an atomic MULTI-TABLE transaction on this branch."""
        return CatalogTransaction(self)

    # -- ref management ----------------------------------------------------
    def with_ref(self, ref: str) -> "NessieLiteCatalog":
        """A view of the same catalog on another branch/tag."""
        return NessieLiteCatalog(self.db_path, self.warehouse, self.spark, ref)

    def at_hash(self, commit_hash: str) -> "NessieLiteCatalog":
        """Read-only view pinned to one catalog commit (nessie detached
        ref): loads resolve against that commit's table map; commits
        raise (no ref to move)."""
        with closing(_connect(self.db_path)) as con:
            if con.execute("SELECT 1 FROM catalog_commits WHERE hash = ?",
                           (commit_hash,)).fetchone() is None:
                raise ValueError(f"unknown catalog commit: {commit_hash}")
        view = NessieLiteCatalog(self.db_path, self.warehouse, self.spark,
                                 f"DETACHED@{commit_hash}")
        view._detached_hash = commit_hash
        return view

    def create_branch(self, name: str, from_ref: Optional[str] = None) -> "NessieLiteCatalog":
        return self._create_ref(name, "branch", from_ref)

    def create_tag(self, name: str, from_ref: Optional[str] = None) -> "NessieLiteCatalog":
        return self._create_ref(name, "tag", from_ref)

    def _create_ref(self, name, ref_type, from_ref):
        src = from_ref or self.ref
        con = _connect(self.db_path)
        try:
            con.execute("BEGIN IMMEDIATE")
            _, src_hash = _ref_hash(con, src)
            try:
                con.execute(
                    "INSERT INTO catalog_refs (ref, type, hash) VALUES (?, ?, ?)",
                    (name, ref_type, src_hash))
            except sqlite3.IntegrityError:
                con.rollback()
                raise ValueError(f"ref already exists: {name}")
            con.commit()
        finally:
            con.close()
        return self.with_ref(name)

    def drop_ref(self, name: str) -> None:
        if name == "main":
            raise ValueError("cannot drop main")
        with closing(_connect(self.db_path)) as con:
            con.execute("DELETE FROM catalog_refs WHERE ref = ?", (name,))

    def list_refs(self) -> list:
        with closing(_connect(self.db_path)) as con:
            return sorted(
                (r[0], r[1], r[2]) for r in
                con.execute("SELECT ref, type, hash FROM catalog_refs"))

    def ref_hash(self, ref: Optional[str] = None) -> str:
        with closing(_connect(self.db_path)) as con:
            return _ref_hash(con, ref or self.ref)[1]

    def log(self, ref: Optional[str] = None, limit: int = 100) -> list:
        """Commit log of a ref (newest first) — `nessie log` analog."""
        out = []
        with closing(_connect(self.db_path)) as con:
            h = _ref_hash(con, ref or self.ref)[1]
            while h and len(out) < limit:
                row = con.execute(
                    "SELECT hash, parent, merge_parent, message, created_ms "
                    "FROM catalog_commits WHERE hash = ?", (h,)).fetchone()
                if row is None:
                    break
                out.append({"hash": row[0], "parent": row[1],
                            "merge_parent": row[2], "message": row[3],
                            "created_ms": row[4]})
                h = row[1]
        return out

    # -- merge -------------------------------------------------------------
    def _ancestors(self, con, h: str) -> list:
        """BFS ancestors over BOTH parent edges — merge commits have a
        ``merge_parent`` too, and ignoring it would make the merge base
        of a re-merged long-lived branch resolve to the original branch
        point (spurious conflicts on every later merge)."""
        chain, seen, frontier = [], set(), [h]
        while frontier:
            cur = frontier.pop(0)
            if cur is None or cur in seen:
                continue
            seen.add(cur)
            chain.append(cur)
            row = con.execute(
                "SELECT parent, merge_parent FROM catalog_commits WHERE hash = ?",
                (cur,)).fetchone()
            if row:
                frontier.extend(p for p in row if p is not None)
        return chain

    def _generations(self, con, head: str) -> dict:
        """Longest-path-to-root depth for every ancestor of ``head``.
        Merge-base selection orders candidates by generation: plain BFS
        distance can, in criss-cross merge histories, pick an ancestor
        OLDER than the closest common ancestor and raise spurious
        conflicts."""
        memo: dict = {}

        def parents(h):
            row = con.execute(
                "SELECT parent, merge_parent FROM catalog_commits WHERE hash = ?",
                (h,)).fetchone()
            return [p for p in (row or ()) if p is not None]

        stack = [(head, False)]
        while stack:
            h, ready = stack.pop()
            if h in memo:
                continue
            ps = parents(h)
            if ready:
                memo[h] = 1 + max((memo[p] for p in ps), default=0)
            else:
                stack.append((h, True))
                stack.extend((p, False) for p in ps if p not in memo)
        return memo

    def merge(self, from_ref: str, to_ref: Optional[str] = None,
              message: Optional[str] = None) -> str:
        """Merge ``from_ref`` into ``to_ref`` (default: this catalog's
        ref).  Fast-forwards when ``to_ref`` hasn't moved since the
        branch point; otherwise three-way merges the table maps from the
        common ancestor and raises MergeConflictError if both sides
        changed (or one deleted, one changed) the same table."""
        to_ref = to_ref or self.ref
        con = _connect(self.db_path)
        try:
            con.execute("BEGIN IMMEDIATE")
            to_type, to_hash = _ref_hash(con, to_ref)
            _, from_hash = _ref_hash(con, from_ref)
            if to_type != "branch":
                con.rollback()
                raise ValueError(f"cannot merge into {to_type} {to_ref!r}")
            if from_hash == to_hash:
                con.rollback()
                return to_hash
            from_anc = self._ancestors(con, from_hash)
            if to_hash in from_anc:
                # fast-forward
                con.execute("UPDATE catalog_refs SET hash = ? WHERE ref = ?",
                            (from_hash, to_ref))
                con.commit()
                return from_hash
            to_anc = self._ancestors(con, to_hash)
            if from_hash in to_anc:
                # already merged: from_ref is strictly behind to_ref — no
                # no-op merge commit, the target hash is already the answer
                con.rollback()
                return to_hash
            # merge base = common ancestor of max generation (closest by
            # commit depth; ties broken by hash for determinism)
            common = set(from_anc) & set(to_anc)
            gen = self._generations(con, to_hash)
            base_hash = max(common, key=lambda h: (gen.get(h, 0), h))
            base = _tables_at(con, base_hash)
            src = _tables_at(con, from_hash)
            dst = _tables_at(con, to_hash)
            merged = dict(dst)
            changed = []
            for name in set(base) | set(src):
                b, s = base.get(name), src.get(name)
                if s == b:
                    continue  # unchanged on from_ref
                d = dst.get(name)
                if d != b and d != s:
                    con.rollback()
                    raise MergeConflictError(
                        f"table {name!r} changed on both {from_ref!r} and "
                        f"{to_ref!r} since {base_hash}")
                if s is None:
                    merged.pop(name, None)
                else:
                    merged[name] = s
                changed.append(name)
            new_hash = uuid.uuid4().hex[:16]
            con.execute(
                "INSERT INTO catalog_commits (hash, parent, merge_parent, "
                "message, tables_json, created_ms) VALUES (?, ?, ?, ?, ?, ?)",
                (new_hash, to_hash, from_hash,
                 message or f"merge {from_ref} into {to_ref} ({len(changed)} tables)",
                 json.dumps(merged), int(time.time() * 1000)))
            cur = con.execute(
                "UPDATE catalog_refs SET hash = ? WHERE ref = ? AND hash = ?",
                (new_hash, to_ref, to_hash))
            if cur.rowcount == 0:
                con.rollback()
                raise CommitFailedException(f"concurrent commit moved {to_ref!r}")
            con.commit()
            return new_hash
        finally:
            con.close()

    # -- table surface (acts on self.ref) ----------------------------------
    def _ops(self, name: str) -> BranchTableOperations:
        with closing(_connect(self.db_path)) as con:
            _, h = self._resolve(con)
            e = _tables_at(con, h).get(name)
        loc = _abs_to(self.warehouse, e["location"]) if e else os.path.join(
            self.warehouse, *name.split("."), uuid.uuid4().hex[:8])
        return BranchTableOperations(self, name, loc)

    def create_table(self, name: str, schema, partition_by=None,
                     properties: Optional[dict] = None,
                     sort_by=None, spark=None) -> Table:
        from incubator_iceberg_spark.partitioning import PartitionSpec
        from incubator_iceberg_spark.table import _as_schema, _as_sort_order

        ops = self._ops(name)
        if ops.refresh() is not None:
            raise TableAlreadyExistsError(f"{name}@{self.ref}")
        if self.view_exists(name):
            raise TableAlreadyExistsError(
                f"{name}@{self.ref} exists as a view")
        schema = _as_schema(schema)
        spec = (PartitionSpec.build(schema, partition_by)
                if partition_by else PartitionSpec.unpartitioned(schema))
        md = TableMetadata.new(ops.location, schema, spec, properties)
        if sort_by:
            md.sort_orders = [_as_sort_order(schema, sort_by, order_id=1)]
            md.default_sort_order_id = 1

        def apply(base):
            if base is not None:
                raise TableAlreadyExistsError(f"{name}@{self.ref}")
            return md

        MD.run_with_retries(ops, apply, retries=0)
        return Table(name, ops, spark or self.spark)

    def load_table(self, name: str, spark=None) -> Table:
        ops = self._ops(name)
        if ops.refresh() is None:
            raise NoSuchTableError(f"{name}@{self.ref}")
        return Table(name, ops, spark or self.spark)

    def table_exists(self, name: str) -> bool:
        return self._ops(name).refresh() is not None

    def drop_table(self, name: str, purge: bool = False) -> bool:
        """Remove the table from THIS branch's state (a new commit).  Files
        are never purged here — other branches may still reference them
        (the Nessie GC problem; remove_orphan_files handles files)."""
        con = _connect(self.db_path)
        try:
            con.execute("BEGIN IMMEDIATE")
            ref_type, cur_hash = _ref_hash(con, self.ref)
            if ref_type != "branch":
                raise ValueError(f"cannot drop on {ref_type} {self.ref!r}")
            tables = _tables_at(con, cur_hash)
            if name not in tables or \
                    tables[name].get("kind") == "view":
                con.rollback()
                return False  # absent, or a view (use drop_view)
            del tables[name]
            new_hash = uuid.uuid4().hex[:16]
            con.execute(
                "INSERT INTO catalog_commits (hash, parent, merge_parent, "
                "message, tables_json, created_ms) VALUES (?, ?, NULL, ?, ?, ?)",
                (new_hash, cur_hash, f"drop {name}", json.dumps(tables),
                 int(time.time() * 1000)))
            con.execute(
                "UPDATE catalog_refs SET hash = ? WHERE ref = ? AND hash = ?",
                (new_hash, self.ref, cur_hash))
            con.commit()
            return True
        finally:
            con.close()

    def list_tables(self, namespace: str = "") -> list:
        with closing(_connect(self.db_path)) as con:
            _, h = self._resolve(con)
            entries = _tables_at(con, h)
        names = [n for n, e in entries.items() if e.get("kind") != "view"]
        if namespace:
            return sorted(n for n in names if n.startswith(namespace + "."))
        return sorted(names)

    # -- view surface (acts on self.ref; views.py metadata, pointer in
    # the commit map — branch merges/conflicts come from the same
    # three-way map merge tables use) ---------------------------------

    def _view_ops(self, name: str) -> BranchViewOperations:
        with closing(_connect(self.db_path)) as con:
            _, h = self._resolve(con)
            e = _tables_at(con, h).get(name)
        loc = (_abs_to(self.warehouse, e["location"])
               if e and e.get("kind") == "view"
               else os.path.join(self.warehouse, *name.split("."),
                                 uuid.uuid4().hex[:8]))
        return BranchViewOperations(self, name, loc)

    def create_view(self, name: str, sql: str, spark=None,
                    replace: bool = False, properties=None):
        from incubator_iceberg_spark import views as V
        spark = spark or self.spark
        ops = self._view_ops(name)
        existing = ops.refresh()
        if existing is not None:
            if not replace:
                raise V.ViewAlreadyExistsError(f"{name}@{self.ref}")
            return V.View(name, ops, existing).replace(
                sql, catalog=self, spark=spark, properties=properties)
        if self.table_exists(name):
            raise V.ViewAlreadyExistsError(
                f"{name}@{self.ref} exists as a table")
        md = V.new_view_metadata(
            name, ops.location, sql,
            V._capture_schema(self, spark, sql), properties)
        ops.commit(None, md)
        return V.View(name, ops, md)

    def load_view(self, name: str):
        from incubator_iceberg_spark import views as V
        ops = self._view_ops(name)
        md = ops.refresh()
        if md is None:
            raise V.NoSuchViewError(f"{name}@{self.ref}")
        return V.View(name, ops, md)

    def view_exists(self, name: str) -> bool:
        return self._view_ops(name).current_version() is not None

    def drop_view(self, name: str) -> bool:
        con = _connect(self.db_path)
        try:
            con.execute("BEGIN IMMEDIATE")
            ref_type, cur_hash = _ref_hash(con, self.ref)
            if ref_type != "branch":
                raise ValueError(f"cannot drop on {ref_type} {self.ref!r}")
            tables = _tables_at(con, cur_hash)
            if name not in tables or tables[name].get("kind") != "view":
                con.rollback()
                return False
            del tables[name]
            new_hash = uuid.uuid4().hex[:16]
            con.execute(
                "INSERT INTO catalog_commits (hash, parent, merge_parent, "
                "message, tables_json, created_ms) VALUES (?, ?, NULL, ?, ?, ?)",
                (new_hash, cur_hash, f"drop view {name}",
                 json.dumps(tables), int(time.time() * 1000)))
            con.execute(
                "UPDATE catalog_refs SET hash = ? WHERE ref = ? AND hash = ?",
                (new_hash, self.ref, cur_hash))
            con.commit()
            return True
        finally:
            con.close()

    def list_views(self, namespace: str = "") -> list:
        with closing(_connect(self.db_path)) as con:
            _, h = self._resolve(con)
            entries = _tables_at(con, h)
        names = [n for n, e in entries.items() if e.get("kind") == "view"]
        if namespace:
            return sorted(n for n in names if n.startswith(namespace + "."))
        return sorted(names)
