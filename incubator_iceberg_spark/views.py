"""Versioned SQL views over engine tables.

The incubator-era reference has no view support; this implements the
shape of the PUBLIC Apache Iceberg view spec (view-metadata JSON:
``view-uuid``, ``versions[]`` each carrying a SQL representation +
schema + default namespace, ``version-log``, properties; CREATE OR
REPLACE appends an immutable version; rollback re-points
``current-version-id``) on the same version-hint + atomic-hard-link
commit protocol the tables use (metadata.py TableOperations,
HadoopTableOperations.java:126-168).

A view stores TEXT, not data: reads re-execute the stored SQL through
the facade (sqlfacade.execute), so scans under a view keep metadata
pruning, delete application, and every other engine read path.  At
100 TB the view layer adds zero data-plane cost — it is a metadata
indirection resolved at plan time, exactly like the reference family's
ViewCatalog.

    v = catalog.create_view("db.top_cust", "SELECT ... FROM db.orders ...",
                            spark=spark)
    v.to_df(catalog, spark)                # executes version 1
    catalog.create_view("db.top_cust", NEW_SQL, spark=spark, replace=True)
    v = catalog.load_view("db.top_cust")
    v.to_df(catalog, spark, version_id=1)  # time travel by view version
    v.rollback_to_version(1)               # re-point current, log entry
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from typing import Optional

from incubator_iceberg_spark.metadata import (CommitFailedException, now_ms)


class NoSuchViewError(Exception):
    pass


def _require_query(sql: str) -> str:
    """A view body must be a QUERY.  The facade regex enforces this for
    SQL-path creation, but the programmatic API accepts arbitrary text —
    and ``to_df`` re-executes the stored text through full facade
    dispatch on EVERY read, so a body like 'DROP TABLE t' would run
    that statement per read.  Reject anything whose first token (after
    comments) is not SELECT/WITH/VALUES, at create/replace AND read."""
    import re
    from incubator_iceberg_spark.sqlfacade import strip_leading_comments
    head = strip_leading_comments(sql)
    m = re.match(r"(?i)(SELECT|WITH|VALUES)\b", head)
    if not m:
        tok = head.split(None, 1)[0] if head.split() else "<empty>"
        raise ValueError(
            f"view SQL must be a query (SELECT/WITH/VALUES), got {tok!r}")
    return sql


class ViewAlreadyExistsError(Exception):
    pass


class ViewVersion:
    """One immutable version: the SQL text + the schema it produced at
    definition time (spec: versions[] entries with representations)."""

    def __init__(self, version_id: int, timestamp_ms: int, sql: str,
                 schema_json=None, default_namespace: str = "",
                 summary: Optional[dict] = None, dialect: str = "spark"):
        self.version_id = version_id
        self.timestamp_ms = timestamp_ms
        self.sql = sql
        self.schema_json = schema_json
        self.default_namespace = default_namespace
        self.summary = summary or {}
        self.dialect = dialect

    def to_json(self) -> dict:
        return {
            "version-id": self.version_id,
            "timestamp-ms": self.timestamp_ms,
            "schema": self.schema_json,
            "default-namespace": self.default_namespace,
            "summary": self.summary,
            "representations": [
                {"type": "sql", "sql": self.sql, "dialect": self.dialect}],
        }

    @staticmethod
    def from_json(obj: dict) -> "ViewVersion":
        reps = [r for r in obj.get("representations", [])
                if r.get("type") == "sql"]
        if not reps:
            raise ValueError("view version has no SQL representation")
        return ViewVersion(
            version_id=obj["version-id"], timestamp_ms=obj["timestamp-ms"],
            sql=reps[0]["sql"], schema_json=obj.get("schema"),
            default_namespace=obj.get("default-namespace", ""),
            summary=obj.get("summary", {}),
            dialect=reps[0].get("dialect", "spark"))


class ViewMetadata:
    def __init__(self, view_uuid: str, location: str,
                 current_version_id: int, versions: list,
                 version_log: list, properties: Optional[dict] = None):
        self.view_uuid = view_uuid
        self.location = location
        self.current_version_id = current_version_id
        self.versions = versions
        self.version_log = version_log
        self.properties = properties or {}

    def version(self, version_id: int) -> ViewVersion:
        for v in self.versions:
            if v.version_id == version_id:
                return v
        raise ValueError(f"no view version {version_id}")

    def current_version(self) -> ViewVersion:
        return self.version(self.current_version_id)

    def to_json(self) -> dict:
        return {
            "view-uuid": self.view_uuid,
            "format-version": 1,
            "location": self.location,
            "current-version-id": self.current_version_id,
            "versions": [v.to_json() for v in self.versions],
            "version-log": self.version_log,
            "properties": self.properties,
        }

    @staticmethod
    def from_json(obj: dict) -> "ViewMetadata":
        return ViewMetadata(
            view_uuid=obj["view-uuid"], location=obj["location"],
            current_version_id=obj["current-version-id"],
            versions=[ViewVersion.from_json(v) for v in obj["versions"]],
            version_log=obj.get("version-log", []),
            properties=obj.get("properties", {}))


class ViewOperations:
    """Version-hint + atomic create-if-absent commit, the table protocol
    with view-specific file names so a path can never be read as both a
    table and a view."""

    def __init__(self, location: str):
        self.location = location
        self.metadata_dir = os.path.join(location, "metadata")

    def hint_path(self) -> str:
        return os.path.join(self.metadata_dir, "view-version-hint.text")

    def metadata_path(self, version: int) -> str:
        return os.path.join(self.metadata_dir,
                            f"v{version}.view-metadata.json")

    def current_version(self) -> Optional[int]:
        try:
            with open(self.hint_path()) as f:
                v = int(f.read().strip())
        except (FileNotFoundError, ValueError):
            v = 0
        probe = max(v, 1)
        found = v if v > 0 and os.path.exists(self.metadata_path(v)) else None
        while os.path.exists(self.metadata_path(probe)):
            found = probe
            probe += 1
        return found

    def refresh(self) -> Optional[ViewMetadata]:
        v = self.current_version()
        if v is None:
            return None
        with open(self.metadata_path(v)) as f:
            return ViewMetadata.from_json(json.load(f))

    def commit(self, base_version: Optional[int], md: ViewMetadata) -> int:
        os.makedirs(self.metadata_dir, exist_ok=True)
        new_version = (base_version or 0) + 1
        final = self.metadata_path(new_version)
        tmp = os.path.join(self.metadata_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(md.to_json(), f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)  # atomic create-if-absent
        except FileExistsError:
            raise CommitFailedException(
                f"view version file v{new_version} already committed")
        finally:
            os.unlink(tmp)
        hint_tmp = os.path.join(self.metadata_dir, f".hint-{uuid.uuid4().hex}")
        with open(hint_tmp, "w") as f:
            f.write(str(new_version))
        os.replace(hint_tmp, self.hint_path())
        return new_version


# views being expanded on this thread — cycle guard for v1 -> v2 -> v1
_EXPANDING = threading.local()


class View:
    def __init__(self, name: str, ops: ViewOperations,
                 metadata: ViewMetadata):
        self.name = name
        self.ops = ops
        self.metadata = metadata

    def refresh(self) -> "View":
        md = self.ops.refresh()
        if md is None:
            raise NoSuchViewError(self.name)
        self.metadata = md
        return self

    def sql(self, version_id: Optional[int] = None) -> str:
        vid = (version_id if version_id is not None
               else self.metadata.current_version_id)
        return self.metadata.version(vid).sql

    def versions(self) -> list:
        return list(self.metadata.versions)

    def version_log(self) -> list:
        return list(self.metadata.version_log)

    def to_df(self, catalog, spark, version_id: Optional[int] = None):
        """Execute the stored SQL through the facade: scans keep pruning
        and delete application; nested views expand recursively."""
        from incubator_iceberg_spark import sqlfacade
        stack = getattr(_EXPANDING, "names", None)
        if stack is None:
            stack = _EXPANDING.names = set()
        if self.name in stack:
            raise ValueError(f"view cycle detected at {self.name}")
        stack.add(self.name)
        try:
            return sqlfacade.execute(catalog, spark,
                                     _require_query(self.sql(version_id)))
        finally:
            stack.discard(self.name)

    def _commit(self, mutate, retries: int = 3) -> "View":
        """Optimistic commit with re-apply on conflict (the table
        plane's run_with_retries shape): refresh → mutate → atomic
        install; a concurrent committer forces re-applying ``mutate``
        to the NEW base, so version ids stay dense and last-writer's
        intent is preserved rather than failed."""
        for attempt in range(retries + 1):
            base = self.ops.current_version()
            md = self.ops.refresh()
            if md is None:
                raise NoSuchViewError(self.name)
            try:
                self.ops.commit(base, mutate(md))
                return self.refresh()
            except CommitFailedException:
                if attempt == retries:
                    raise
        raise AssertionError("unreachable")

    def replace(self, sql: str, catalog=None, spark=None,
                properties: Optional[dict] = None) -> "View":
        """CREATE OR REPLACE: append an immutable version and point
        current-version-id at it (prior versions stay queryable)."""
        _require_query(sql)
        schema_json = _capture_schema(catalog, spark, sql)

        def mutate(md: ViewMetadata) -> ViewMetadata:
            vid = max(v.version_id for v in md.versions) + 1
            md.versions.append(ViewVersion(
                vid, now_ms(), sql, schema_json=schema_json,
                default_namespace=self.name.rsplit(".", 1)[0],
                summary={"operation": "replace"}))
            md.current_version_id = vid
            md.version_log.append(
                {"timestamp-ms": now_ms(), "version-id": vid})
            if properties:
                md.properties.update(properties)
            return md
        return self._commit(mutate)

    def rollback_to_version(self, version_id: int) -> "View":
        def mutate(md: ViewMetadata) -> ViewMetadata:
            md.version(version_id)  # raises if absent
            md.current_version_id = version_id
            md.version_log.append(
                {"timestamp-ms": now_ms(), "version-id": version_id})
            return md
        return self._commit(mutate)

    def update_properties(self, updates: dict) -> "View":
        def mutate(md: ViewMetadata) -> ViewMetadata:
            md.properties.update(updates)
            return md
        return self._commit(mutate)


def _capture_schema(catalog, spark, sql: str):
    """Record the schema the SQL produces at definition time (spec keeps
    a schema per version).  Plan-only — no job runs."""
    if catalog is None or spark is None:
        return None
    from incubator_iceberg_spark import sqlfacade
    df = sqlfacade.execute(catalog, spark, sql)
    return json.loads(df.schema.json())


def _location_holds_table(location: str) -> bool:
    """True when the name-derived directory already carries TABLE
    metadata — e.g. a SqliteCatalog rename moved the pointer away but
    the files stayed put.  Writing view metadata there would interleave
    two objects' lifecycles (and a later drop could destroy the
    table's data)."""
    try:
        return any(n.endswith(".metadata.json")
                   and not n.endswith(".view-metadata.json")
                   for n in os.listdir(os.path.join(location, "metadata")))
    except FileNotFoundError:
        return False


def new_view_metadata(name: str, location: str, sql: str, schema_json,
                      properties: Optional[dict] = None) -> ViewMetadata:
    """Fresh single-version view metadata (shared by the FS/sqlite path
    and the NessieLite branch-scoped path)."""
    return ViewMetadata(
        view_uuid=str(uuid.uuid4()), location=location,
        current_version_id=1,
        versions=[ViewVersion(
            1, now_ms(), sql, schema_json=schema_json,
            default_namespace=name.rsplit(".", 1)[0],
            summary={"operation": "create"})],
        version_log=[{"timestamp-ms": now_ms(), "version-id": 1}],
        properties=properties)


def create_view(catalog, name: str, sql: str, spark=None,
                replace: bool = False,
                properties: Optional[dict] = None) -> View:
    _require_query(sql)
    location = catalog._table_location(name)
    ops = ViewOperations(location)
    existing = ops.refresh()
    if existing is not None:
        if not replace:
            raise ViewAlreadyExistsError(name)
        return View(name, ops, existing).replace(
            sql, catalog=catalog, spark=spark, properties=properties)
    if catalog.table_exists(name):
        raise ViewAlreadyExistsError(f"{name} exists as a table")
    if _location_holds_table(location):
        raise ViewAlreadyExistsError(
            f"{name}: location {location} holds table metadata "
            "(a renamed table keeps its original directory)")
    # a view nested UNDER an existing table/view would live inside that
    # object's directory: invisible to listings, destroyed by its drop
    parts = name.split(".")
    for j in range(1, len(parts)):
        prefix = ".".join(parts[:j])
        if catalog.table_exists(prefix) or view_exists(catalog, prefix):
            raise ViewAlreadyExistsError(
                f"{name}: ancestor {prefix} is an existing table/view")
    md = new_view_metadata(name, location, sql,
                           _capture_schema(catalog, spark, sql), properties)
    ops.commit(None, md)
    # TOCTOU guard: the table_exists check above has no shared lock with
    # create_table (NessieLite re-checks kind inside BEGIN IMMEDIATE; the
    # FS/sqlite path cannot).  Re-check AFTER the atomic link commit —
    # the view files are now visible, so a concurrent create_table either
    # saw them (and failed) or raced in first; if a table landed, roll
    # the view back (unlink our own files only) and surface the clash.
    if catalog.table_exists(name) or _location_holds_table(location):
        drop_view(catalog, name)
        raise ViewAlreadyExistsError(
            f"{name}: a table was created concurrently with this view")
    return View(name, ops, md)


def load_view(catalog, name: str) -> View:
    ops = ViewOperations(catalog._table_location(name))
    md = ops.refresh()
    if md is None:
        raise NoSuchViewError(name)
    return View(name, ops, md)


def view_exists(catalog, name: str) -> bool:
    return ViewOperations(
        catalog._table_location(name)).current_version() is not None


def drop_view(catalog, name: str) -> bool:
    """Unlink ONLY the view's own metadata files — never rmtree the
    location wholesale (a legacy/renamed table sharing the directory
    must survive a view drop)."""
    ops = ViewOperations(catalog._table_location(name))
    if ops.current_version() is None:
        return False
    for n in os.listdir(ops.metadata_dir):
        if n.endswith(".view-metadata.json") or n == "view-version-hint.text":
            os.unlink(os.path.join(ops.metadata_dir, n))
    for d in (ops.metadata_dir, ops.location):
        try:
            os.rmdir(d)  # only if nothing else lives there
        except OSError:
            break
    return True


def list_views_under(warehouse: str, namespace: str = "") -> list:
    """Walk the warehouse for view-metadata dirs (shared by the FS and
    sqlite catalogs so their SHOW VIEWS semantics cannot diverge)."""
    root = (os.path.join(warehouse, *namespace.split("."))
            if namespace else warehouse)
    out = []
    for dirpath, dirs, _files in os.walk(root):
        mdir = os.path.join(dirpath, "metadata")
        if os.path.isdir(mdir):
            rel = os.path.relpath(dirpath, warehouse)
            if any(n.endswith(".view-metadata.json")
                   for n in os.listdir(mdir)):
                out.append(rel.replace(os.sep, "."))
            dirs.clear()
    return sorted(out)


def versions_df(view: View, spark):
    """`db.v.versions` inspection surface: one row per view version plus
    is_current, mirroring the table-side metadata tables."""
    rows = [(v.version_id,
             v.timestamp_ms,
             v.sql,
             json.dumps(v.schema_json) if v.schema_json else None,
             v.summary.get("operation"),
             v.version_id == view.metadata.current_version_id)
            for v in view.metadata.versions]
    return spark.createDataFrame(
        rows, "version_id int, timestamp_ms long, sql string, "
              "schema_json string, operation string, is_current boolean")
