"""REST catalog — the catalog-service protocol of the modern Iceberg
ecosystem (the PUBLIC Iceberg REST catalog OpenAPI spec's table
surface), re-expressed for the Python engine with stdlib only.

The incubator-era reference predates the REST catalog; its successors
made it the primary multi-engine protocol: a central HTTP service owns
the "which metadata version is current" pointer, engines read/write
data and metadata FILES directly, and a commit is one compare-and-set
POST against the service.  That split is exactly the engine's existing
TableOperations seam (metadata.py; HadoopTableOperations /
JdbcCatalog analogs), so this module adds:

- ``RestCatalogServer`` — an in-process ``http.server`` authority over
  the pointer map (create-if-absent / CAS-swap / rename / drop), with
  optional bearer-token auth and optional JSON persistence so a
  restarted server keeps its pointers.  Endpoints follow the spec's
  shapes: GET /v1/config, GET/POST /v1/namespaces/{ns}/tables[/{t}],
  DELETE .../tables/{t}, POST /v1/tables/rename.  A lost CAS answers
  409 — the spec's CommitFailedException mapping.
- ``RestTableOperations`` — TableOperations whose current_version is a
  GET and whose commit is: write the metadata file locally (same
  atomic hard-link create-if-absent guard every other catalog uses),
  then POST the pointer swap; 409 unlinks the file and raises
  CommitFailedException so the engine's run_with_retries re-applies on
  fresh metadata.
- ``RestCatalog`` — the ``Catalog`` surface (create/load/exists/drop/
  rename/list + filesystem-backed views, mirroring SqliteCatalog's
  table-pointer/FS-view split).

Scale shape: the service holds one tiny row per table and serializes
only the pointer swap; ALL data/metadata IO stays on the engines, so a
10^5-table warehouse costs the service a dict and each commit one
round trip — the property that lets one catalog front a 100 TB lake.

    srv = RestCatalogServer(state_path=...)  # port=0 → ephemeral
    srv.start()
    cat = RestCatalog(srv.url, warehouse, spark, token=srv.token)
    t = cat.create_table("db.t", schema)
"""

from __future__ import annotations

import json
import os
import socket
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import quote, unquote
from urllib.request import Request, urlopen
from urllib.error import HTTPError, URLError

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


# ---------------------------------------------------------------------------
# server
# ---------------------------------------------------------------------------

class _State:
    """Pointer map + lock; optionally persisted as a SNAPSHOT file plus
    an append-only JSONL JOURNAL (the real service's backing database,
    reduced to the sandbox).  Each mutation appends ONE line — O(1) per
    pointer swap, where the r9 version rewrote the whole table map per
    mutation (~MBs and a global serialization point at 10^5 tables).
    Startup replays snapshot + journal; ``compact()`` (on shutdown and
    automatically past a line budget) folds the journal back into the
    snapshot atomically: the snapshot is replaced FIRST, then the
    journal truncated, so a crash between the two only re-applies
    idempotent set/del lines."""

    COMPACT_EVERY = 50_000  # journal lines before an automatic compact

    def __init__(self, state_path: Optional[str] = None):
        self.lock = threading.Lock()
        self.state_path = state_path
        self.tables: dict = {}  # name -> {"location": str, "version": int}
        self.namespaces: dict = {}  # name -> {properties}
        self._journal = None
        self._journal_lines = 0
        if state_path:
            if os.path.exists(state_path):
                with open(state_path) as f:
                    snap = json.load(f)
                if "tables" in snap or "namespaces" in snap:
                    self.tables = snap.get("tables", {})
                    self.namespaces = snap.get("namespaces", {})
                else:  # pre-r10 snapshot: bare table map
                    self.tables = snap
            jp = state_path + ".journal"
            good_bytes = 0
            if os.path.exists(jp):
                with open(jp, "rb") as f:
                    raw = f.read()
                lines = raw.decode("utf-8", errors="replace").splitlines(
                    keepends=True)
                for i, line in enumerate(lines):
                    if not line.endswith("\n"):
                        # FINAL line without its trailing newline: the
                        # ack (fsync) covers line+'\n' in one write, so
                        # a newline-less tail is UNACKED even when it
                        # parses as complete JSON — drop it.  Applying
                        # it and reopening in append mode would write
                        # the next op onto the same line, merging two
                        # ops into one unparseable line (a later replay
                        # would then wedge mid-journal or drop an ACKED
                        # op; r10 advice finding #1).
                        break
                    stripped = line.strip()
                    if not stripped:
                        good_bytes += len(line.encode("utf-8",
                                                      errors="replace"))
                        continue
                    try:
                        op = json.loads(stripped)
                    except json.JSONDecodeError:
                        if i == len(lines) - 1:
                            # torn FINAL line: the crash happened mid-
                            # append, so the op never ack'd — drop it
                            break
                        raise  # mid-journal corruption is a real error
                    self._apply(op)
                    self._journal_lines += 1
                    good_bytes += len(line.encode("utf-8",
                                                  errors="replace"))
                if good_bytes < len(raw):
                    # TRUNCATE the torn fragment before reopening for
                    # append — otherwise the next mutation is written
                    # onto the same line, merging an UNACKED fragment
                    # with an ACKED op into one unparseable line (a
                    # second crash would then drop a committed pointer
                    # swap or wedge startup; r10 review finding #1)
                    with open(jp, "r+b") as f:
                        f.truncate(good_bytes)
            self._journal = open(jp, "a")

    def _apply(self, op: dict) -> None:
        kind = op["op"]
        if kind == "set":
            self.tables[op["name"]] = op["row"]
        elif kind == "del":
            self.tables.pop(op["name"], None)
        elif kind == "set_ns":
            self.namespaces[op["name"]] = op.get("properties") or {}
        elif kind == "del_ns":
            self.namespaces.pop(op["name"], None)
        elif kind == "rename":
            # ABSOLUTE rename (carries the moved row): idempotent under
            # full-journal replay onto an already-folded snapshot — the
            # relative form re-executed after a crash inside compact()
            # could pop a RE-CREATED src and clobber dst with its row
            # (r10 review finding #2).  src is only dropped when it
            # still holds the row this rename moved.
            self.tables[op["dst"]] = op["row"]
            if self.tables.get(op["src"]) == op["row"] \
                    and op["src"] != op["dst"]:
                self.tables.pop(op["src"], None)

    def _persist(self, op: dict) -> None:
        """Append one journal line (caller holds the lock, op already
        applied to the in-memory map)."""
        if self._journal is None:
            return
        self._journal.write(json.dumps(op) + "\n")
        self._journal.flush()
        os.fsync(self._journal.fileno())
        self._journal_lines += 1
        if self._journal_lines >= self.COMPACT_EVERY:
            self.compact(locked=True)

    def compact(self, locked: bool = False) -> None:
        """Fold the journal into the snapshot; truncate the journal."""
        if self.state_path is None:
            return
        if not locked:
            with self.lock:
                return self.compact(locked=True)
        tmp = self.state_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"tables": self.tables,
                       "namespaces": self.namespaces}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.state_path)
        if self._journal is not None:
            self._journal.close()
        self._journal = open(self.state_path + ".journal", "w")
        self._journal_lines = 0


class _Handler(BaseHTTPRequestHandler):
    server_version = "iiws-rest-catalog/1"

    # quiet the default stderr access log
    def log_message(self, fmt, *args):  # pragma: no cover
        pass

    def _send(self, code: int, body: Optional[dict] = None) -> None:
        data = json.dumps(body or {}).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _authed(self) -> bool:
        token = self.server.token  # type: ignore[attr-defined]
        if not token:
            return True
        return self.headers.get("Authorization") == f"Bearer {token}"

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        return json.loads(self.rfile.read(n)) if n else {}

    def _route(self):
        """(verb, ns, table) from the path, or None.  Empty segments are
        PRESERVED (not filtered): /v1/namespaces//tables is the list-all
        route (ns='') — filtering empties made it unreachable and broke
        the client's default list_tables('')."""
        parts = [unquote(p)
                 for p in self.path.split("?")[0].strip("/").split("/")]
        # /v1/config | /v1/tables/rename | /v1/namespaces/{ns}/tables[/{t}]
        if parts[:2] == ["v1", "config"]:
            return ("config", None, None)
        if parts[:3] == ["v1", "tables", "rename"]:
            return ("rename", None, None)
        if len(parts) >= 4 and parts[0] == "v1" and parts[1] == "namespaces" \
                and parts[3] == "tables":
            ns = parts[2]
            tbl = parts[4] if len(parts) > 4 and parts[4] else None
            return ("tables", ns, tbl)
        if parts[:2] == ["v1", "namespaces"]:
            # /v1/namespaces | /v1/namespaces/{ns} | .../{ns}/properties
            if len(parts) == 2:
                return ("namespaces", None, None)
            if len(parts) == 3 and parts[2]:
                return ("namespace", parts[2], None)
            if len(parts) == 4 and parts[3] == "properties":
                return ("ns_props", parts[2], None)
        return None

    def do_GET(self):  # noqa: N802
        if not self._authed():
            return self._send(401, {"error": "bad token"})
        r = self._route()
        if r is None:
            return self._send(404, {"error": "no such route"})
        verb, ns, tbl = r
        st: _State = self.server.state  # type: ignore[attr-defined]
        if verb == "config":
            return self._send(200, {"defaults": {}, "overrides": {}})
        if verb == "tables" and tbl is None:  # list
            with st.lock:
                names = sorted(n for n in st.tables
                               if n.startswith(ns + ".") or ns == "")
            return self._send(200, {"identifiers": [
                {"namespace": n.rsplit(".", 1)[0].split("."),
                 "name": n.rsplit(".", 1)[-1]} for n in names]})
        if verb == "tables":  # load
            name = f"{ns}.{tbl}"
            with st.lock:
                row = st.tables.get(name)
            if row is None:
                return self._send(404, {"error": f"no such table {name}"})
            return self._send(200, {"name": name, **row})
        if verb == "namespaces":  # list: explicit ∪ implicit-from-tables
            with st.lock:
                names = set(st.namespaces) | {
                    n.rsplit(".", 1)[0] for n in st.tables}
            return self._send(200, {"namespaces": [
                n.split(".") for n in sorted(names)]})
        if verb == "namespace":  # load properties
            with st.lock:
                props = st.namespaces.get(ns)
                implicit = props is None and any(
                    n.rsplit(".", 1)[0] == ns for n in st.tables)
            if props is None and not implicit:
                return self._send(404, {"error": f"no such namespace {ns}"})
            return self._send(200, {"namespace": ns.split("."),
                                    "properties": props or {}})
        return self._send(404, {"error": "no such route"})

    def do_POST(self):  # noqa: N802
        if not self._authed():
            return self._send(401, {"error": "bad token"})
        r = self._route()
        if r is None:
            return self._send(404, {"error": "no such route"})
        verb, ns, tbl = r
        st: _State = self.server.state  # type: ignore[attr-defined]
        body = self._body()
        if verb == "rename":
            src, dst = body.get("source"), body.get("destination")
            with st.lock:
                if dst in st.tables:
                    return self._send(409, {"error": f"{dst} exists"})
                row = st.tables.pop(src, None)
                if row is None:
                    return self._send(404, {"error": f"no such table {src}"})
                st.tables[dst] = row
                st._persist({"op": "rename", "src": src, "dst": dst,
                             "row": row})
            return self._send(200, {})
        if verb == "tables" and tbl is None:  # create (register pointer)
            name = f"{ns}.{body['name']}"
            with st.lock:
                if name in st.tables:
                    return self._send(409, {"error": f"{name} exists"})
                st.tables[name] = {"location": body["location"],
                                   "version": int(body["version"]),
                                   "metadata_file": body.get("metadata_file")}
                st._persist({"op": "set", "name": name,
                             "row": st.tables[name]})
            return self._send(200, {"name": name, **st.tables[name]})
        if verb == "tables":  # commit: CAS pointer swap
            name = f"{ns}.{tbl}"
            base = body.get("base-version")
            new = int(body["version"])
            with st.lock:
                row = st.tables.get(name)
                if base is None:
                    if row is not None:
                        return self._send(
                            409, {"error": f"{name} concurrently created"})
                    st.tables[name] = {"location": body["location"],
                                       "version": new,
                                       "metadata_file":
                                           body.get("metadata_file")}
                else:
                    if row is None:
                        return self._send(404,
                                          {"error": f"no such table {name}"})
                    if row["version"] != int(base):
                        return self._send(409, {
                            "error": "concurrent commit won the pointer "
                                     f"swap for {name} (at "
                                     f"{row['version']}, base {base})"})
                    row["version"] = new
                    row["metadata_file"] = body.get("metadata_file")
                st._persist({"op": "set", "name": name,
                             "row": st.tables[name]})
            return self._send(200, {})
        if verb == "namespaces":  # create
            name = ".".join(body.get("namespace") or []) \
                if isinstance(body.get("namespace"), list) \
                else (body.get("namespace") or "")
            if not name:
                return self._send(400, {"error": "namespace required"})
            with st.lock:
                if name in st.namespaces:
                    return self._send(409, {"error": f"{name} exists"})
                st.namespaces[name] = dict(body.get("properties") or {})
                st._persist({"op": "set_ns", "name": name,
                             "properties": st.namespaces[name]})
            return self._send(200, {"namespace": name.split("."),
                                    "properties": st.namespaces[name]})
        if verb == "ns_props":  # update properties (removals + updates)
            with st.lock:
                if ns not in st.namespaces:
                    return self._send(404,
                                      {"error": f"no such namespace {ns}"})
                props = dict(st.namespaces[ns])
                for k in body.get("removals") or []:
                    props.pop(k, None)
                props.update(body.get("updates") or {})
                st.namespaces[ns] = props
                st._persist({"op": "set_ns", "name": ns,
                             "properties": props})
            return self._send(200, {"updated": sorted(
                (body.get("updates") or {}).keys()), "removed": sorted(
                body.get("removals") or [])})
        return self._send(404, {"error": "no such route"})

    def do_DELETE(self):  # noqa: N802
        if not self._authed():
            return self._send(401, {"error": "bad token"})
        r = self._route()
        if r is not None and r[0] == "namespace":
            ns = r[1]
            st: _State = self.server.state  # type: ignore[attr-defined]
            with st.lock:
                if any(n.rsplit(".", 1)[0] == ns for n in st.tables):
                    return self._send(
                        409, {"error": f"namespace {ns} is not empty"})
                props = st.namespaces.pop(ns, None)
                if props is not None:
                    st._persist({"op": "del_ns", "name": ns})
            if props is None:
                return self._send(404, {"error": f"no such namespace {ns}"})
            return self._send(200, {})
        if r is None or r[0] != "tables" or r[2] is None:
            return self._send(404, {"error": "no such route"})
        _, ns, tbl = r
        name = f"{ns}.{tbl}"
        st: _State = self.server.state  # type: ignore[attr-defined]
        with st.lock:
            row = st.tables.pop(name, None)
            if row is not None:
                st._persist({"op": "del", "name": name})
        if row is None:
            return self._send(404, {"error": f"no such table {name}"})
        return self._send(200, row)


class RestCatalogServer:
    """In-process catalog service.  ``port=0`` binds an ephemeral port;
    ``token`` (optional) enables bearer auth; ``state_path`` persists
    the pointer map across restarts."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 token: Optional[str] = None,
                 state_path: Optional[str] = None):
        self.state = _State(state_path)
        self.token = token
        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self._httpd.state = self.state  # type: ignore[attr-defined]
        self._httpd.token = token  # type: ignore[attr-defined]
        self._thread: Optional[threading.Thread] = None

    @property
    def url(self) -> str:
        h, p = self._httpd.server_address[:2]
        return f"http://{h}:{p}"

    def start(self) -> "RestCatalogServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)
        self.state.compact()  # fold the journal into the snapshot


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------

class RestError(Exception):
    def __init__(self, code: int, message: str):
        super().__init__(f"HTTP {code}: {message}")
        self.code = code


class NoSuchNamespaceError(Exception):
    pass


class NamespaceAlreadyExistsError(Exception):
    pass


class NamespaceNotEmptyError(Exception):
    pass


class CommitStateUnknownError(Exception):
    """The pointer-swap POST failed in TRANSPORT (timeout / connection
    drop) and the service could not be re-read to learn whether the
    swap landed — the commit may or may not have happened.  Surfaced
    WITHOUT retry (the reference's CommitStateUnknownException:
    re-applying a possibly-landed mutation would double-apply it)."""


def _call(url: str, method: str = "GET", body: Optional[dict] = None,
          token: Optional[str] = None, timeout: float = 10.0) -> dict:
    data = json.dumps(body).encode() if body is not None else None
    req = Request(url, data=data, method=method,
                  headers={"Content-Type": "application/json"})
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    try:
        with urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read() or b"{}")
    except HTTPError as e:
        try:
            msg = json.loads(e.read() or b"{}").get("error", "")
        except Exception:
            msg = ""
        raise RestError(e.code, msg) from None


def _failed_before_send(exc: BaseException) -> bool:
    """True ONLY for transport failures that prove the request never
    reached the server (TCP connect refused, DNS resolution failure) —
    the one class where "the pointer didn't move" can be read as
    "provably not landed".  A timeout or connection reset may leave the
    POST still in flight server-side: the swap can land AFTER our
    re-read, so those must stay CommitStateUnknownError (r9 advice:
    treating a timeout as not-landed deleted a metadata file the server
    could still come to reference, wedging every future read)."""
    if isinstance(exc, URLError) and not isinstance(exc, HTTPError):
        reason = exc.reason
        if isinstance(reason, BaseException):
            return _failed_before_send(reason)
        return False
    return isinstance(exc, (ConnectionRefusedError, socket.gaierror))


def _split(name: str):
    if "." not in name:
        raise ValueError(f"table name needs a namespace: {name!r}")
    ns, tbl = name.rsplit(".", 1)
    return quote(ns, safe=""), quote(tbl, safe="")


class RestTableOperations(TableOperations):
    """TableOperations whose authoritative pointer lives behind the REST
    service.  Metadata files are written locally FIRST (atomic hard-link
    guard), then the pointer swap POSTs; a 409 unlinks and raises so the
    engine's retry loop re-applies on fresh metadata — the same
    optimistic protocol as every other catalog here."""

    def __init__(self, base_url: str, name: str, table_location: str,
                 token: Optional[str] = None):
        super().__init__(table_location)
        self.base_url = base_url.rstrip("/")
        self.name = name
        self.token = token
        self._ns, self._tbl = _split(name)
        self._prefetched: Optional[dict] = None  # one-shot row cache

    def _table_url(self) -> str:
        return (f"{self.base_url}/v1/namespaces/{self._ns}"
                f"/tables/{self._tbl}")

    def _load_row(self) -> Optional[dict]:
        """One GET carries (location, version, metadata_file) — callers
        needing several of those must not pay several round trips.  The
        one-shot prefetch lets RestCatalog._ops seed the row it already
        fetched for the location decision into the next refresh."""
        if self._prefetched is not None:
            row, self._prefetched = self._prefetched, None
            return row
        try:
            return _call(self._table_url(), token=self.token)
        except RestError as e:
            if e.code == 404:
                return None
            raise

    def current_version(self) -> Optional[int]:
        row = self._load_row()
        return int(row["version"]) if row else None

    def refresh(self) -> Optional[TableMetadata]:
        row = self._load_row()
        if row is None:
            return None
        mf = row.get("metadata_file")
        if mf is not None and (mf != os.path.basename(mf) or "\\" in mf
                               or mf in ("", ".", "..")):
            # server-supplied value must stay a bare filename inside the
            # table's metadata dir — a '../'-bearing pointer from a
            # compromised/buggy service must not escape it (r9 advice)
            raise ValueError(
                f"unsafe metadata_file from catalog service: {mf!r}")
        path = (os.path.join(self.metadata_dir, mf) if mf
                else self.metadata_path(int(row["version"])))
        with open(path) as f:
            md = TableMetadata.from_json(json.load(f))
        md._version = int(row["version"])  # type: ignore[attr-defined]
        return md

    def commit(self, base_version: Optional[int],
               metadata: TableMetadata) -> int:
        """Write a UUID-NAMED metadata file, then CAS the pointer.  The
        uuid name (the REST spec's metadata-location model) is what
        makes every failure mode safe: the file is invisible until the
        swap lands, two racing writers can never collide on a filename,
        and a transport-failed swap leaves at worst a small orphan —
        never a wedged table (a fixed v{N} name + link guard meant one
        orphan made every future commit's create-if-absent fail)."""
        os.makedirs(self.metadata_dir, exist_ok=True)
        new_version = (base_version or 0) + 1
        fname = f"v{new_version}-{uuid.uuid4().hex[:12]}.metadata.json"
        final = os.path.join(self.metadata_dir, fname)
        with open(final, "w") as f:
            json.dump(metadata.to_json(), f)
            f.flush()
            os.fsync(f.fileno())
        body = {"base-version": base_version, "version": new_version,
                "location": self.location, "metadata_file": fname}
        try:
            if base_version is None:
                _call(f"{self.base_url}/v1/namespaces/{self._ns}/tables",
                      method="POST",
                      body={"name": unquote(self._tbl),
                            "location": self.location,
                            "version": new_version,
                            "metadata_file": fname},
                      token=self.token)
            else:
                _call(self._table_url(), method="POST", body=body,
                      token=self.token)
        except RestError as e:
            os.unlink(final)
            if e.code == 409:
                if base_version is None:
                    # create endpoint: the name was concurrently taken —
                    # surface the same exception the other catalogs'
                    # create paths raise, not a retryable CAS loss
                    raise TableAlreadyExistsError(self.name) from None
                raise CommitFailedException(str(e)) from None
            raise
        except Exception as e:
            # TRANSPORT failure: the swap may or may not have landed.
            # Re-read the pointer once to find out.
            try:
                row = _call(self._table_url(), token=self.token)
            except Exception:
                row = None
            if row and int(row["version"]) == new_version \
                    and row.get("metadata_file") == fname:
                return new_version  # landed; only the response was lost
            if _failed_before_send(e):
                # the failure PROVES the request never reached the
                # server (connect refused / DNS): not landed, full stop
                os.unlink(final)
                if base_version is None and row is not None:
                    raise TableAlreadyExistsError(self.name) from None
                raise CommitFailedException(
                    f"pointer swap failed in transport ({e}); "
                    "not committed") from None
            if base_version is None and row is not None:
                if int(row["version"]) == new_version \
                        and row.get("metadata_file") != fname:
                    # the FIRST version slot is held by someone else's
                    # file: our create-if-absent (possibly still in
                    # flight) can only ever answer 409 — cannot land
                    os.unlink(final)
                    raise TableAlreadyExistsError(self.name) from None
                # pointer PAST our version: our create may have LANDED
                # and been built upon by a concurrent commit before the
                # re-read — claiming "already exists" would tell the
                # caller its own durable create was a conflict (r10
                # review finding #4).  Fall through to UNKNOWN.
            if row is not None and int(row["version"]) == new_version \
                    and row.get("metadata_file") != fname:
                # a racing writer consumed our version slot: the server
                # pointer already moved base→new, so our in-flight CAS
                # (same base) can only ever answer 409 — provably NOT
                # landed regardless of how the transport failed
                os.unlink(final)
                raise CommitFailedException(
                    f"pointer swap failed in transport ({e}); a "
                    "concurrent commit won the version slot") from None
            # NOTE: pointer merely BEHIND us after a timeout/reset is
            # NOT proof — the POST may still be in flight and could
            # land after this re-read, so it falls through to UNKNOWN.
            # service unreadable, the pointer moved PAST our version
            # (ours may have landed with another commit on top), or the
            # POST may still be in flight (timeout/reset): keep the
            # file (uuid-named → harmless orphan if it never lands, the
            # pointer's target if it does) and surface WITHOUT retry —
            # re-applying a possibly-landed mutation would double-apply
            raise CommitStateUnknownError(
                f"pointer swap outcome unknown for {self.name} "
                f"v{new_version}: {e}") from None
        return new_version


class RestCatalog:
    """``Catalog`` surface over the REST pointer service; data/metadata
    files live under ``warehouse`` exactly like the other catalogs, and
    views stay filesystem-backed (the SqliteCatalog pairing)."""

    def __init__(self, base_url: str, warehouse: str, spark=None,
                 token: Optional[str] = None):
        self.base_url = base_url.rstrip("/")
        self.warehouse = os.path.abspath(warehouse)
        self.spark = spark
        self.token = token
        os.makedirs(self.warehouse, exist_ok=True)
        _call(f"{self.base_url}/v1/config", token=token)  # fail fast

    def _table_location(self, name: str) -> str:
        return os.path.join(self.warehouse, *name.split("."))

    def _under_warehouse(self, location: str) -> bool:
        """Server-returned locations are only trusted inside the
        warehouse root — every location this catalog ever registers is
        under it, so anything else is a corrupt/hostile pointer (r9
        advice: drop_table purge rmtree'd whatever the service said)."""
        wh = os.path.realpath(self.warehouse)
        loc = os.path.realpath(location)
        return loc != wh and loc.startswith(wh + os.sep)

    def _ops(self, name: str) -> RestTableOperations:
        ops = RestTableOperations(self.base_url, name,
                                  self._table_location(name),
                                  token=self.token)
        # ONE GET decides the location (a renamed table keeps its
        # original directory — trust the service over the name-derived
        # path, but never outside the warehouse) AND seeds the ops' next
        # refresh, so load_table costs a single round trip instead of 3
        row = ops._load_row()
        if row and row.get("location") and row["location"] != ops.location:
            if not self._under_warehouse(row["location"]):
                raise ValueError(
                    f"catalog service returned a location outside the "
                    f"warehouse for {name}: {row['location']!r}")
            ops = RestTableOperations(self.base_url, name, row["location"],
                                      token=self.token)
        ops._prefetched = row
        return ops

    def create_table(self, name: str, schema, partition_by=None,
                     properties: Optional[dict] = None, sort_by=None,
                     identifier_fields=None, spark=None) -> Table:
        from incubator_iceberg_spark.partitioning import PartitionSpec
        from incubator_iceberg_spark.schema import Schema
        from incubator_iceberg_spark.table import _as_schema, _as_sort_order

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
        if os.path.isdir(os.path.join(ops.location, "metadata")):
            # renamed-away table kept the directory: fresh suffixed path
            ops = RestTableOperations(
                self.base_url, name,
                ops.location + "-" + uuid.uuid4().hex[:8],
                token=self.token)
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
        try:
            return self._ops(name).refresh() is not None
        except ValueError:
            return False

    def drop_table(self, name: str, purge: bool = True) -> bool:
        import shutil
        ns, tbl = _split(name)
        try:
            row = _call(f"{self.base_url}/v1/namespaces/{ns}/tables/{tbl}",
                        method="DELETE", token=self.token)
        except RestError as e:
            if e.code == 404:
                return False
            raise
        if purge:
            if not self._under_warehouse(row["location"]):
                raise ValueError(
                    f"refusing to purge {name}: service-returned "
                    f"location {row['location']!r} is outside the "
                    f"warehouse")
            shutil.rmtree(row["location"], ignore_errors=True)
        return True

    def rename_table(self, name: str, new_name: str) -> None:
        try:
            _call(f"{self.base_url}/v1/tables/rename", method="POST",
                  body={"source": name, "destination": new_name},
                  token=self.token)
        except RestError as e:
            if e.code == 404:
                raise NoSuchTableError(name) from None
            if e.code == 409:
                raise TableAlreadyExistsError(new_name) from None
            raise

    def list_tables(self, namespace: str = "") -> list:
        ns = quote(namespace, safe="")
        out = _call(f"{self.base_url}/v1/namespaces/{ns}/tables",
                    token=self.token)
        return sorted(".".join(i["namespace"] + [i["name"]])
                      for i in out["identifiers"])

    # -- namespaces: the spec's namespace endpoints (create/list/load/
    # update-properties/drop; implicit namespaces — derived from table
    # names — list and load but cannot be dropped or hold properties)

    def create_namespace(self, name: str,
                         properties: Optional[dict] = None) -> None:
        try:
            _call(f"{self.base_url}/v1/namespaces", method="POST",
                  body={"namespace": name.split("."),
                        "properties": dict(properties or {})},
                  token=self.token)
        except RestError as e:
            if e.code == 409:
                raise NamespaceAlreadyExistsError(name) from None
            raise

    def list_namespaces(self) -> list:
        out = _call(f"{self.base_url}/v1/namespaces", token=self.token)
        return sorted(".".join(n) for n in out["namespaces"])

    def namespace_exists(self, name: str) -> bool:
        try:
            self.load_namespace_properties(name)
            return True
        except NoSuchNamespaceError:
            return False

    def load_namespace_properties(self, name: str) -> dict:
        ns = quote(name, safe="")
        try:
            out = _call(f"{self.base_url}/v1/namespaces/{ns}",
                        token=self.token)
        except RestError as e:
            if e.code == 404:
                raise NoSuchNamespaceError(name) from None
            raise
        return dict(out.get("properties") or {})

    def update_namespace_properties(self, name: str,
                                    updates: Optional[dict] = None,
                                    removals: Optional[list] = None) -> dict:
        ns = quote(name, safe="")
        try:
            return _call(f"{self.base_url}/v1/namespaces/{ns}/properties",
                         method="POST",
                         body={"updates": dict(updates or {}),
                               "removals": list(removals or [])},
                         token=self.token)
        except RestError as e:
            if e.code == 404:
                raise NoSuchNamespaceError(name) from None
            raise

    def drop_namespace(self, name: str) -> bool:
        ns = quote(name, safe="")
        try:
            _call(f"{self.base_url}/v1/namespaces/{ns}", method="DELETE",
                  token=self.token)
            return True
        except RestError as e:
            if e.code == 404:
                return False
            if e.code == 409:
                raise NamespaceNotEmptyError(name) from None
            raise

    # -- views: filesystem-backed under the warehouse (SqliteCatalog
    # pairing — the pointer service stays tables-only)

    def create_view(self, name: str, sql: str, spark=None,
                    replace: bool = False,
                    properties: Optional[dict] = None):
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
