"""Thin SQL façade (SURVEY.md §4): the reference reaches MERGE/DELETE/
UPDATE/CALL through a Catalyst parser extension
(IcebergSparkSqlExtensionsParser, IcebergSqlExtensions.g4:68-88); here the
same statements route to the Python engine API with a small parser —
no JVM extensions.

    from incubator_iceberg_spark import sqlfacade
    sqlfacade.execute(catalog, spark, "DELETE FROM db.orders WHERE o_totalprice > 1e5")
    sqlfacade.execute(catalog, spark, '''
        MERGE INTO db.orders AS t USING updates AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND s.o_totalprice > 0 THEN UPDATE SET *
        WHEN MATCHED THEN DELETE
        WHEN NOT MATCHED THEN INSERT *
    ''')

USING accepts a temp-view name or a parenthesized subquery (resolved via
``spark.sql``).  SELECT statements pass through to ``spark.sql`` after
registering the referenced engine tables as temp views (full-scan views:
Catalyst applies filters post-scan; programmatic scans keep metadata
pruning).  DDL/DML: ``INSERT INTO/OVERWRITE ... SELECT|VALUES``,
``CREATE TABLE ... [PARTITIONED BY (...)] AS SELECT``, and
``DROP TABLE [IF EXISTS] ... [PURGE]`` round out the statement surface
the reference reaches through DSv2.
"""

from __future__ import annotations

import re
import weakref
from typing import Optional

from incubator_iceberg_spark.row_ops import (WhenMatched, WhenNotMatched,
                                             WhenNotMatchedBySource)

_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+([\w.]+)\s*(?:WHERE\s+(.*?))?\s*$",
    re.IGNORECASE | re.DOTALL)
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+([\w.]+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*?))?\s*$",
    re.IGNORECASE | re.DOTALL)
_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+([\w.]+)(?:\s+AS)?\s*(\w+)?\s+USING\s+"
    r"(\(.*?\)|[\w.]+)(?:\s+AS)?\s*(\w+)?\s+ON\s+(.*?)\s*(WHEN\s+.*)$",
    re.IGNORECASE | re.DOTALL)
_WHEN_RE = re.compile(
    r"WHEN\s+(NOT\s+)?MATCHED(\s+BY\s+SOURCE)?\s*(?:AND\s+(.*?))?\s*THEN\s+"
    r"(UPDATE\s+SET\s+.*?|DELETE|INSERT\s+.*?)\s*(?=WHEN\s+(?:NOT\s+)?MATCHED|$)",
    re.IGNORECASE | re.DOTALL)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?([\w.]+)\s+(.*)$",
    re.IGNORECASE | re.DOTALL)
_CTAS_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+([\w.]+)\s*"
    r"(?:PARTITIONED\s+BY\s*\(((?:[^()]|\([^()]*\))*)\)\s*)?"
    r"AS\s+(SELECT\b.*|WITH\b.*)$",
    re.IGNORECASE | re.DOTALL)
_CREATE_COLS_RE = re.compile(
    # column-list CREATE TABLE — the SHOW CREATE TABLE render round-trips
    # through this (USING clause optional/ignored; the identifier-fields
    # comment line is our own SHOW CREATE dialect, parsed back on purpose)
    r"^\s*CREATE\s+TABLE\s+([\w.]+)\s*\(((?:[^()]|\([^()]*\))*)\)\s*"
    r"(?:USING\s+\w+\s*)?"
    r"(?:PARTITIONED\s+BY\s*\(((?:[^()]|\([^()]*\))*)\)\s*)?"
    r"(?:--\s*identifier\s+fields:\s*\(([^)]*)\)\s*)?"
    r"(?:TBLPROPERTIES\s*\((.*)\)\s*)?$",
    re.IGNORECASE | re.DOTALL)
_DROP_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([\w.]+)\s*(PURGE)?\s*$",
    re.IGNORECASE)
_CREATE_VIEW_RE = re.compile(
    r"^\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+([\w.]+)\s+AS\s+"
    r"(SELECT\b.*|WITH\b.*)$",
    re.IGNORECASE | re.DOTALL)
_DROP_VIEW_RE = re.compile(
    r"^\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.]+)\s*$", re.IGNORECASE)


def _split_top_level(s: str) -> list:
    """Split on commas at paren/angle-bracket depth 0 (column lists and
    partition clauses contain decimal(p,s) / bucket(n, col) / map<k,v>)."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [x.strip() for x in out if x.strip()]


def strip_leading_comments(sql: str) -> str:
    """Drop leading ``--`` / ``/* */`` comments: they would defeat
    head-keyword dispatch here (head becomes '--') and the view layer's
    query-body validation — ONE implementation for both so the rule
    cannot drift."""
    return re.sub(r"^(\s*(--[^\n]*\n|/\*.*?\*/))*\s*", "", sql,
                  flags=re.DOTALL)


def execute(catalog, spark, sql: str):
    """Dispatch one SQL statement against engine tables."""
    s = strip_leading_comments(sql).strip().rstrip(";")
    head = s.split(None, 1)[0].upper() if s else ""
    if head == "CALL":
        from incubator_iceberg_spark import procedures
        return procedures.call(catalog, s, spark=spark)
    if head == "DELETE":
        m = _DELETE_RE.match(s)
        if not m:
            raise ValueError(f"cannot parse DELETE: {sql!r}")
        t = catalog.load_table(m.group(1), spark=spark)
        if m.group(2):
            return t.delete_where(m.group(2))
        from incubator_iceberg_spark import expressions as X
        return t.delete_where(X.always_true())
    if head == "UPDATE":
        m = _UPDATE_RE.match(s)
        if not m:
            raise ValueError(f"cannot parse UPDATE: {sql!r}")
        t = catalog.load_table(m.group(1), spark=spark)
        assignments = _parse_assignments(m.group(2))
        return t.update(assignments, m.group(3) or "1 = 1")
    if head == "MERGE":
        return _merge(catalog, spark, s)
    if head in ("SELECT", "WITH"):
        # storage-partitioned join routing: a two-table equi-join whose
        # sides are both bucket-partitioned on their join keys plans as
        # a union of bucket-local broadcast joins — NO shuffle exchange
        # (bucket_join.py; SparkBatchScan.java:89 outputPartitioning)
        routed = _try_bucket_join_route(catalog, spark, s)
        if routed is not None:
            return routed
        # aggregate pushdown: a bare COUNT(*) over one engine table is
        # served from manifest statistics (Table.count_rows) — the
        # partition-aligned case reads zero data files
        m = re.match(r"^\s*SELECT\s+COUNT\s*\(\s*(\*|\w+)\s*\)\s*"
                     r"(?:AS\s+(\w+)\s*)?FROM\s+([\w.]+)\s*"
                     r"(?:WHERE\s+(.*))?$", s,
                     re.IGNORECASE | re.DOTALL)
        if m:
            try:
                t = catalog.load_table(m.group(3), spark=spark)
            except Exception:
                t = None
            if t is not None:
                target = m.group(1)
                try:
                    if target == "*":
                        n = t.count_rows(m.group(4))["count"]
                        default_name = "count(1)"
                    else:
                        n = t.count_non_null(target, m.group(4))["count"]
                        default_name = f"count({target})"
                    return (spark.createDataFrame([(n,)], "c bigint")
                            .toDF(m.group(2) or default_name))
                except ValueError:
                    pass  # unknown column / unparseable predicate → full SQL
        return spark.sql(_register_and_rewrite(catalog, spark, s))
    if head == "INSERT":
        m = _INSERT_RE.match(s)
        if not m:
            raise ValueError(f"cannot parse INSERT: {sql!r}")
        t = catalog.load_table(m.group(2), spark=spark)
        body = m.group(3).strip()
        if body.upper().startswith("VALUES"):
            df = spark.sql(f"SELECT * FROM ({body}) "
                           f"AS v({', '.join(f.name for f in t.schema().fields)})")
        else:
            df = spark.sql(_register_and_rewrite(catalog, spark, body))
        if m.group(1).upper() == "OVERWRITE":
            if t.metadata.spec().is_partitioned:
                t.dynamic_overwrite(df)
            else:
                from incubator_iceberg_spark import expressions as X
                t.overwrite(df, X.always_true())
        else:
            t.append(df)
        return t
    if head == "CREATE":
        mv = _CREATE_VIEW_RE.match(s)
        if mv:
            return catalog.create_view(mv.group(2), mv.group(3).strip(),
                                       spark=spark, replace=bool(mv.group(1)))
        mn = re.match(r"^\s*CREATE\s+(?:NAMESPACE|DATABASE|SCHEMA)\s+"
                      r"(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*"
                      r"(?:WITH\s+(?:DBPROPERTIES|PROPERTIES)\s*"
                      r"\((.*)\)\s*)?$", s, re.IGNORECASE | re.DOTALL)
        if mn:
            if not hasattr(catalog, "create_namespace"):
                raise ValueError(
                    "this catalog has no namespace surface (implicit "
                    "namespaces only); use a RestCatalog")
            props = (dict(re.findall(r"'([^']*)'\s*=\s*'([^']*)'",
                                     mn.group(2)))
                     if mn.group(2) else None)
            if_not_exists = bool(re.search(r"IF\s+NOT\s+EXISTS", s,
                                           re.IGNORECASE))
            # IF NOT EXISTS must swallow ONLY already-exists — a
            # blanket `except Exception` here turned transport
            # failures / auth errors / server 5xx (RestError) into a
            # silent True "created" (r10 advice #4)
            from incubator_iceberg_spark.catalog_rest import \
                NamespaceAlreadyExistsError
            try:
                if props:
                    try:
                        catalog.create_namespace(mn.group(1), props)
                    except TypeError:
                        raise ValueError(
                            "this catalog does not support namespace "
                            "properties (directory namespaces only); "
                            "use a RestCatalog") from None
                else:
                    catalog.create_namespace(mn.group(1))
            except NamespaceAlreadyExistsError:
                if not if_not_exists:
                    raise
            return True
        mc = _CREATE_COLS_RE.match(s)
        if mc:
            from incubator_iceberg_spark import schema as SCH
            name, cols_s, parts_s, ids_s, props_s = mc.groups()
            fields = []
            for i, c in enumerate(_split_top_level(cols_s), start=1):
                cm = re.match(r"^(\w+)\s+(.+?)\s*(NOT\s+NULL)?$", c,
                              re.IGNORECASE | re.DOTALL)
                if not cm:
                    raise ValueError(f"cannot parse column def: {c!r}")
                fields.append(SCH.NestedField(
                    i, cm.group(1),
                    SCH.type_from_string(cm.group(2).strip()),
                    required=bool(cm.group(3))))
            parts = _split_top_level(parts_s) if parts_s else None
            ids = ([x.strip() for x in ids_s.split(",") if x.strip()]
                   if ids_s else None)
            props = (dict(re.findall(r"'([^']*)'\s*=\s*'([^']*)'", props_s))
                     if props_s else None)
            return catalog.create_table(name, SCH.Schema(fields),
                                        partition_by=parts or None,
                                        properties=props or None,
                                        identifier_fields=ids, spark=spark)
        m = _CTAS_RE.match(s)
        if not m:
            raise ValueError(
                f"cannot parse CREATE (only column-list / CTAS / "
                f"CREATE VIEW): {sql!r}")
        from incubator_iceberg_spark.schema import Schema
        df = spark.sql(_register_and_rewrite(catalog, spark, m.group(3)))
        parts = [p.strip() for p in (m.group(2) or "").split(",") if p.strip()]
        t = catalog.create_table(m.group(1), Schema.from_spark(df.schema),
                                 partition_by=parts or None, spark=spark)
        t.append(df)
        return t
    if head == "DROP":
        mn = re.match(r"^\s*DROP\s+(?:NAMESPACE|DATABASE|SCHEMA)\s+"
                      r"(IF\s+EXISTS\s+)?([\w.]+)\s*$", s, re.IGNORECASE)
        if mn:
            if not hasattr(catalog, "drop_namespace"):
                raise ValueError(
                    "this catalog has no namespace surface (implicit "
                    "namespaces only); use a RestCatalog")
            dropped = catalog.drop_namespace(mn.group(2))
            if not dropped and not mn.group(1):
                from incubator_iceberg_spark.catalog_rest import \
                    NoSuchNamespaceError
                raise NoSuchNamespaceError(mn.group(2))
            return dropped
        mv = _DROP_VIEW_RE.match(s)
        if mv:
            dropped = catalog.drop_view(mv.group(2))
            if not dropped and not mv.group(1):
                from incubator_iceberg_spark.views import NoSuchViewError
                raise NoSuchViewError(mv.group(2))
            return dropped
        m = _DROP_RE.match(s)
        if not m:
            raise ValueError(f"cannot parse DROP TABLE/VIEW: {sql!r}")
        return catalog.drop_table(m.group(1), purge=bool(m.group(2)))
    if head == "ALTER":
        mv = re.match(r"^\s*ALTER\s+VIEW\s+([\w.]+)\s+(.*)$", s,
                      re.IGNORECASE | re.DOTALL)
        if mv:
            v = catalog.load_view(mv.group(1))
            body = mv.group(2).strip()
            mm = re.match(r"^AS\s+(SELECT\b.*|WITH\b.*)$", body,
                          re.IGNORECASE | re.DOTALL)
            if mm:
                return v.replace(mm.group(1).strip(), catalog=catalog,
                                 spark=spark)
            mm = re.match(r"^SET\s+TBLPROPERTIES\s*\((.*)\)\s*$", body,
                          re.IGNORECASE | re.DOTALL)
            if mm:
                props = {}
                for part in _split_top(mm.group(1), ","):
                    k, val = part.split("=", 1)
                    props[k.strip().strip("'\"")] = val.strip().strip("'\"")
                return v.update_properties(props)
            raise ValueError(f"cannot parse ALTER VIEW: {sql!r}")
        return _alter(catalog, spark, s)
    if head == "SHOW":
        mm = re.match(r"^\s*SHOW\s+(TABLES|VIEWS)\s*(?:IN\s+([\w.]+))?\s*$",
                      s, re.IGNORECASE)
        if mm:
            kind, ns = mm.group(1).upper(), mm.group(2) or ""
            names = (catalog.list_views(ns) if kind == "VIEWS"
                     else catalog.list_tables(ns))
            return spark.createDataFrame(
                [(n.rsplit(".", 1)[0] if "." in n else "",
                  n.rsplit(".", 1)[-1]) for n in names],
                "namespace string, name string")
        mm = re.match(r"^\s*SHOW\s+CREATE\s+(TABLE|VIEW)\s+([\w.]+)\s*$",
                      s, re.IGNORECASE)
        if mm:
            return _show_create(catalog, spark, mm.group(1).upper(),
                                mm.group(2))
        if re.match(r"^\s*SHOW\s+(NAMESPACES|DATABASES|SCHEMAS)\s*$",
                    s, re.IGNORECASE):
            if hasattr(catalog, "list_namespaces"):
                names = catalog.list_namespaces()
            else:  # implicit namespaces from table/view names
                names = sorted({n.rsplit(".", 1)[0]
                                for n in catalog.list_tables("")
                                if "." in n}
                               | {n.rsplit(".", 1)[0]
                                  for n in catalog.list_views("")
                                  if "." in n})
            return spark.createDataFrame([(n,) for n in names],
                                         "namespace string")
        raise ValueError(f"cannot parse SHOW: {sql!r}")
    if head in ("DESCRIBE", "DESC"):
        mm = re.match(r"^\s*(?:DESCRIBE|DESC)\s+(?:TABLE\s+|VIEW\s+)?"
                      r"(EXTENDED\s+)?([\w.]+)\s*$", s, re.IGNORECASE)
        if not mm:
            raise ValueError(f"cannot parse DESCRIBE: {sql!r}")
        # keyword CAPTURED, not substring-matched: a table named
        # db.orders_extended must not trigger the extended output
        return _describe(catalog, spark, mm.group(2),
                         extended=bool(mm.group(1)))
    if head == "TRUNCATE":
        mm = re.match(r"^\s*TRUNCATE\s+TABLE\s+([\w.]+)\s*$", s, re.IGNORECASE)
        if not mm:
            raise ValueError(f"cannot parse TRUNCATE: {sql!r}")
        from incubator_iceberg_spark import expressions as X
        return catalog.load_table(mm.group(1),
                                  spark=spark).delete_where(X.always_true())
    raise ValueError(
        f"unsupported statement: {head} (supported: SELECT, INSERT, "
        "CREATE TABLE AS, CREATE [OR REPLACE] VIEW, DROP TABLE/VIEW, "
        "ALTER TABLE/VIEW, SHOW TABLES/VIEWS, SHOW CREATE TABLE/VIEW, "
        "DESCRIBE [EXTENDED], DELETE, UPDATE, MERGE, "
        "CALL)")


_ALTER_RE = re.compile(r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+(.*)$",
                       re.IGNORECASE | re.DOTALL)


def _alter(catalog, spark, s: str):
    """ALTER TABLE statements — the reference's own SQL-extension grammar
    (IcebergSqlExtensions.g4:70-75: ADD/DROP PARTITION FIELD, WRITE
    ORDERED BY) plus the standard column DDL the reference reaches via
    Spark's DSv2 ALTER support (SparkCatalog.alterTable)."""
    m = _ALTER_RE.match(s)
    if not m:
        raise ValueError(f"cannot parse ALTER TABLE: {s!r}")
    t = catalog.load_table(m.group(1), spark=spark)
    rest = m.group(2).strip()
    up = rest.upper()

    if up.startswith("ADD PARTITION FIELD"):
        term = rest[len("ADD PARTITION FIELD"):].strip()
        name = None
        as_m = re.match(r"(.*?)\s+AS\s+(\w+)\s*$", term, re.IGNORECASE)
        if as_m:
            term, name = as_m.group(1).strip(), as_m.group(2)
        parts = _current_spec_parts(t)
        parts.append((*_parse_part_term(term), name) if name
                     else _parse_part_term(term))
        return t.update_spec(parts)
    if up.startswith("DROP PARTITION FIELD"):
        term = rest[len("DROP PARTITION FIELD"):].strip()
        src, tr = _parse_part_term(term)
        parts = [p for p in _current_spec_parts(t)
                 if not (p[0] == src and p[1] == tr) and p[2] != term]
        return t.update_spec(parts)
    if up.startswith("REPLACE PARTITION FIELD"):
        mm = re.match(r"REPLACE\s+PARTITION\s+FIELD\s+(.*?)\s+WITH\s+(.*?)"
                      r"(?:\s+AS\s+(\w+))?\s*$", rest, re.IGNORECASE)
        if not mm:
            raise ValueError(f"cannot parse REPLACE PARTITION FIELD: {rest!r}")
        old_src, old_tr = _parse_part_term(mm.group(1))
        parts = [p for p in _current_spec_parts(t)
                 if not (p[0] == old_src and p[1] == old_tr)
                 and p[2] != mm.group(1).strip()]
        new = _parse_part_term(mm.group(2))
        parts.append((*new, mm.group(3)) if mm.group(3) else new)
        return t.update_spec(parts)
    if up.startswith("WRITE "):
        # the writeSpec statements (g4:83-88) each REPLACE the whole
        # write spec, and land as ONE atomic commit (set_write_spec
        # validates sort columns inside the retry closure — a bad
        # column leaves the table untouched):
        #   ORDERED BY c...            -> range + sort (ordered without
        #                                 a distribution implies range)
        #   LOCALLY ORDERED BY c...    -> none + task-local sort
        #   DISTRIBUTED BY PARTITION
        #     [LOCALLY ORDERED BY c..] -> hash + (sort | unsorted)
        #   UNORDERED                  -> none + unsorted
        def cols_of(tail):
            return [c.strip() for c in tail.strip().strip("()").split(",")]
        if up.startswith("WRITE ORDERED BY"):
            return t.set_write_spec(
                "range", cols_of(rest[len("WRITE ORDERED BY"):]))
        if up.startswith("WRITE LOCALLY ORDERED BY"):
            return t.set_write_spec(
                "none", cols_of(rest[len("WRITE LOCALLY ORDERED BY"):]))
        if up.startswith("WRITE DISTRIBUTED BY PARTITION"):
            tail = rest[len("WRITE DISTRIBUTED BY PARTITION"):].strip()
            if tail.upper().startswith("LOCALLY ORDERED BY"):
                return t.set_write_spec(
                    "hash", cols_of(tail[len("LOCALLY ORDERED BY"):]))
            if tail:
                raise ValueError("cannot parse WRITE DISTRIBUTED BY "
                                 f"PARTITION tail: {tail!r}")
            return t.set_write_spec("hash", [])
        if up.startswith("WRITE UNORDERED"):
            return t.set_write_spec("none", [])
        raise ValueError(f"cannot parse WRITE spec: {rest!r}")
    if up.startswith("SET IDENTIFIER FIELDS"):
        cols = rest[len("SET IDENTIFIER FIELDS"):].strip().strip("()")
        return t.set_identifier_fields([c.strip() for c in cols.split(",")])
    if up.startswith("DROP IDENTIFIER FIELDS"):
        cols = rest[len("DROP IDENTIFIER FIELDS"):].strip().strip("()")
        return t.drop_identifier_fields([c.strip() for c in cols.split(",")])
    if up.startswith("UNSET TBLPROPERTIES"):
        body = rest[len("UNSET TBLPROPERTIES"):].strip()
        if_exists = body.upper().startswith("IF EXISTS")
        if if_exists:
            body = body[len("IF EXISTS"):].strip()
        body = body.strip("()")
        keys = [k.strip().strip("'\"") for k in _split_top(body, ",")]
        if not if_exists:
            missing = [k for k in keys if k not in t.metadata.properties]
            if missing:
                raise ValueError(
                    f"table property does not exist: {missing} "
                    f"(use UNSET TBLPROPERTIES IF EXISTS to ignore)")
        return t.update_properties({k: None for k in keys})
    if up.startswith("SET TBLPROPERTIES"):
        body = rest[len("SET TBLPROPERTIES"):].strip().strip("()")
        updates = {}
        for kv in _split_top(body, ","):
            k, v = kv.split("=", 1)
            updates[k.strip().strip("'\"")] = v.strip().strip("'\"")
        return t.update_properties(updates)
    if up.startswith("ADD COLUMN"):
        mm = re.match(r"ADD\s+COLUMNS?\s+\(?\s*(\w+)\s+([\w(),]+)\s*\)?\s*$",
                      rest, re.IGNORECASE)
        if not mm:
            raise ValueError(f"cannot parse ADD COLUMN: {rest!r}")
        return t.update_schema().add_column(mm.group(1),
                                            _sql_type(mm.group(2))).commit()
    if up.startswith("DROP COLUMN"):
        return t.update_schema().delete_column(
            rest[len("DROP COLUMN"):].strip()).commit()
    if up.startswith("RENAME COLUMN"):
        mm = re.match(r"RENAME\s+COLUMN\s+([\w.]+)\s+TO\s+(\w+)\s*$",
                      rest, re.IGNORECASE)
        if not mm:
            raise ValueError(f"cannot parse RENAME COLUMN: {rest!r}")
        return t.update_schema().rename_column(mm.group(1), mm.group(2)).commit()
    if up.startswith("ALTER COLUMN"):
        mm = re.match(r"ALTER\s+COLUMN\s+([\w.]+)\s+TYPE\s+([\w(),]+)\s*$",
                      rest, re.IGNORECASE)
        if mm:
            return t.update_schema().update_column_type(
                mm.group(1), _sql_type(mm.group(2))).commit()
        mm = re.match(r"ALTER\s+COLUMN\s+([\w.]+)\s+DROP\s+NOT\s+NULL\s*$",
                      rest, re.IGNORECASE)
        if mm:
            return t.update_schema().make_column_optional(mm.group(1)).commit()
        raise ValueError(f"cannot parse ALTER COLUMN: {rest!r}")
    raise ValueError(f"unsupported ALTER TABLE clause: {rest!r}")


_SQL_TYPE_MAP = {"bigint": "long", "integer": "int", "smallint": "int",
                 "varchar": "string", "text": "string", "bool": "boolean",
                 "real": "float", "timestamptz": "timestamptz"}


def _sql_type(s: str) -> str:
    base = s.strip().lower()
    return _SQL_TYPE_MAP.get(base, base)


def _current_spec_parts(t) -> list:
    schema = t.metadata.schema()
    return [(schema.field_path(f.source_id), str(f.transform), f.name)
            for f in t.metadata.spec().fields]


def _parse_part_term(term: str) -> tuple:
    """'month(ts)' → ('ts', 'month'); 'bucket(16, id)' (reference grammar
    argument order) or 'bucket[16](id)' → ('id', 'bucket[16]'); bare
    column → identity."""
    term = term.strip()
    mm = re.match(r"(\w+)\s*\[\s*(\d+)\s*\]\s*\(\s*([\w.]+)\s*\)$", term)
    if mm:
        return (mm.group(3), f"{mm.group(1)}[{mm.group(2)}]")
    mm = re.match(r"(\w+)\s*\(\s*(\d+)\s*,\s*([\w.]+)\s*\)$", term)
    if mm:
        return (mm.group(3), f"{mm.group(1)}[{mm.group(2)}]")
    mm = re.match(r"(\w+)\s*\(\s*([\w.]+)\s*\)$", term)
    if mm:
        return (mm.group(2), mm.group(1))
    return (term, "identity")


def _parse_assignments(raw: str) -> dict:
    out = {}
    for part in _split_top(raw, ","):
        if "=" not in part:
            raise ValueError(f"bad assignment: {part!r}")
        k, v = part.split("=", 1)
        k = k.strip()
        if k.lower().startswith("t."):
            k = k[2:]
        out[k] = v.strip()
    return out


def _split_top(s: str, sep: str) -> list:
    out, depth, cur, quote = [], 0, [], None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [p.strip() for p in out if p.strip()]


def _merge(catalog, spark, s: str):
    m = _MERGE_RE.match(s)
    if not m:
        raise ValueError(f"cannot parse MERGE: {s!r}")
    target_name, t_alias, source_sql, s_alias, on_cond, whens = m.groups()
    t_alias = t_alias or "t"
    s_alias = s_alias or "s"
    table = catalog.load_table(target_name, spark=spark)
    if source_sql.startswith("("):
        source_df = spark.sql(source_sql[1:-1])
    else:
        source_df = spark.table(source_sql)

    # normalize aliases to the engine's canonical t/s
    def canon(expr: str) -> str:
        expr = re.sub(rf"\b{re.escape(t_alias)}\.", "t.", expr)
        expr = re.sub(rf"\b{re.escape(s_alias)}\.", "s.", expr)
        return expr

    matched, not_matched, by_source = [], [], []
    for neg, bysrc, cond, action in _WHEN_RE.findall(whens):
        cond = canon(cond.strip()) if cond.strip() else None
        a = action.strip()
        a_up = a.upper()
        if neg and bysrc:
            if a_up == "DELETE":
                by_source.append(WhenNotMatchedBySource(condition=cond, delete=True))
            elif a_up.startswith("UPDATE"):
                body = a[len("UPDATE"):].strip()
                if not body.upper().startswith("SET"):
                    raise ValueError(f"bad UPDATE action: {a!r}")
                by_source.append(WhenNotMatchedBySource(
                    condition=cond,
                    update={k: canon(v) for k, v in
                            _parse_assignments(body[3:].strip()).items()}))
            else:
                raise ValueError(
                    "WHEN NOT MATCHED BY SOURCE supports UPDATE/DELETE only")
        elif neg:
            if not a_up.startswith("INSERT"):
                raise ValueError("WHEN NOT MATCHED supports INSERT only")
            body = a[len("INSERT"):].strip()
            if body == "*":
                not_matched.append(WhenNotMatched(condition=cond))
            else:
                cols_part, vals_part = body.split("VALUES", 1)
                cols = [c.strip() for c in cols_part.strip(" ()").split(",")]
                vals = _split_top(vals_part.strip(" ()"), ",")
                not_matched.append(WhenNotMatched(
                    condition=cond,
                    insert={c: canon(v) for c, v in zip(cols, vals)}))
        elif a_up == "DELETE":
            matched.append(WhenMatched(condition=cond, delete=True))
        elif a_up.startswith("UPDATE"):
            body = a[len("UPDATE"):].strip()
            if not body.upper().startswith("SET"):
                raise ValueError(f"bad UPDATE action: {a!r}")
            body = body[3:].strip()
            if body == "*":
                matched.append(WhenMatched.update_all(condition=cond))
            else:
                matched.append(WhenMatched(
                    condition=cond,
                    update={k: canon(v) for k, v in _parse_assignments(body).items()}))
        else:
            raise ValueError(f"unsupported MERGE action: {a!r}")
    return table.merge(source_df, on=canon(on_cond),
                       when_matched=matched, when_not_matched=not_matched,
                       when_not_matched_by_source=by_source)


_TT_RE = re.compile(
    r"\b((?:\w+\.)+\w+)\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+('[^']*'|\d+)",
    re.IGNORECASE)


def _describe(catalog, spark, name: str, extended: bool = False):
    """DESCRIBE [EXTENDED] over engine tables and views: Spark's
    (col_name, data_type, comment) shape; EXTENDED appends partition
    spec, identifier fields, location, current snapshot/version and
    properties as metadata rows (DescribeTableExec analog)."""
    from incubator_iceberg_spark import views as V
    v_exists = getattr(catalog, "view_exists",
                       lambda n: V.view_exists(catalog, n))
    rows = []
    if v_exists(name):
        v_load = getattr(catalog, "load_view",
                         lambda n: V.load_view(catalog, n))
        v = v_load(name)
        sj = v.metadata.current_version().schema_json
        if sj:
            for f in sj.get("fields", []):
                t = f["type"]
                rows.append((f["name"],
                             t if isinstance(t, str) else str(t), None))
        if extended:
            rows.append(("", "", None))
            rows.append(("# View Information", "", None))
            rows.append(("current_version",
                         str(v.metadata.current_version_id), None))
            rows.append(("sql", v.sql(), None))
            for k, x in sorted(v.metadata.properties.items()):
                rows.append((f"prop:{k}", x, None))
        return spark.createDataFrame(
            rows, "col_name string, data_type string, comment string")
    t = catalog.load_table(name, spark=spark)
    md = t.metadata
    schema = md.schema()
    for f in schema.fields:
        rows.append((f.name, str(f.type),
                     "required" if f.required else None))
    if extended:
        rows.append(("", "", None))
        rows.append(("# Table Information", "", None))
        rows.append(("location", md.location, None))
        spec = md.spec()
        if spec.is_partitioned:
            rows.append(("partition_spec", str(spec), None))
        if schema.identifier_field_ids:
            rows.append(("identifier_fields",
                         ", ".join(schema.field_path(i)
                                   for i in schema.identifier_field_ids),
                         None))
        snap = md.current_snapshot()
        rows.append(("current_snapshot_id",
                     str(snap.snapshot_id) if snap else "", None))
        for k, x in sorted(md.properties.items()):
            rows.append((f"prop:{k}", x, None))
    return spark.createDataFrame(
        rows, "col_name string, data_type string, comment string")


def _show_create(catalog, spark, kind: str, name: str):
    """SHOW CREATE TABLE/VIEW: one-row DDL render (SparkShowCreateTable
    shape).  Views render the CURRENT version's stored SQL; tables render
    columns, partition transforms in create syntax, identifier fields and
    non-default properties."""
    if kind == "VIEW":
        from incubator_iceberg_spark import views as V
        v_load = getattr(catalog, "load_view",
                         lambda n: V.load_view(catalog, n))
        v = v_load(name)
        stmt = f"CREATE VIEW {name} AS\n{v.sql()}"
        if v.metadata.properties:
            props = ", ".join(f"'{k}' = '{x}'"
                              for k, x in sorted(v.metadata.properties.items()))
            stmt += f"\nTBLPROPERTIES ({props})"
        return spark.createDataFrame([(stmt,)], "createview_stmt string")
    t = catalog.load_table(name, spark=spark)
    md = t.metadata
    schema = md.schema()
    cols = ",\n  ".join(
        f"{f.name} {f.type}{' NOT NULL' if f.required else ''}"
        for f in schema.fields)
    stmt = f"CREATE TABLE {name} (\n  {cols})\nUSING iiws"
    spec = md.spec()
    if spec.is_partitioned:
        parts = []
        for f in spec.fields:
            src = schema.field_path(f.source_id)
            ts = str(f.transform).replace("[", "(").rstrip("]")
            if ts == "identity":
                parts.append(src)
            elif "(" in ts:  # bucket(8 / truncate(10 -> bucket(8, col)
                parts.append(f"{ts}, {src})")
            else:
                parts.append(f"{ts}({src})")
        stmt += "\nPARTITIONED BY (" + ", ".join(parts) + ")"
    if schema.identifier_field_ids:
        ids = ", ".join(schema.field_path(i)
                        for i in schema.identifier_field_ids)
        stmt += f"\n-- identifier fields: ({ids})"
    if md.properties:
        props = ", ".join(f"'{k}' = '{x}'"
                          for k, x in sorted(md.properties.items()))
        stmt += f"\nTBLPROPERTIES ({props})"
    return spark.createDataFrame([(stmt,)], "createtab_stmt string")


def _rewrite_time_travel(catalog, spark, s: str) -> str:
    """Spark SQL time-travel syntax over engine tables:
    ``t VERSION AS OF <snapshot-id | 'branch-or-tag'>`` and
    ``t TIMESTAMP AS OF '<iso>'`` become temp views of the resolved scan
    (read options snapshot-id/as-of-timestamp, SparkReadOptions.java:31-34)."""
    def repl(m):
        name, kind, val = m.group(1), m.group(2).upper(), m.group(3)
        try:
            t = catalog.load_table(name, spark=spark)
        except Exception:
            # engine VIEW: `v VERSION AS OF <view-version-id>` executes
            # that immutable version's stored SQL (views.py)
            try:
                from incubator_iceberg_spark import views as V
                v_exists = getattr(catalog, "view_exists",
                                   lambda n: V.view_exists(catalog, n))
                v_load = getattr(catalog, "load_view",
                                 lambda n: V.load_view(catalog, n))
                if kind == "VERSION" and not val.startswith("'") \
                        and v_exists(name):
                    df = v_load(name).to_df(
                        catalog, spark, version_id=int(val))
                    view = re.sub(r"\W", "_", f"{name}_V_{val}")
                    df.createOrReplaceTempView(view)
                    return view
            except ValueError as e:
                if "view cycle" in str(e) or "no view version" in str(e):
                    raise
            except Exception:
                pass
            return m.group(0)
        if kind == "VERSION":
            if val.startswith("'"):
                df = t.to_df(spark, ref=val.strip("'"))
            else:
                df = t.to_df(spark, snapshot_id=int(val))
        else:
            from datetime import datetime, timezone
            dt = datetime.fromisoformat(val.strip("'"))
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            df = t.to_df(spark, as_of_timestamp_ms=int(dt.timestamp() * 1000))
        view = re.sub(r"\W", "_", f"{name}_{kind}_{val.strip(chr(39))}")
        df.createOrReplaceTempView(view)
        return view

    return _TT_RE.sub(repl, s)


_BUCKET_JOIN_RE = re.compile(
    r"^\s*SELECT\s+(?P<sel>.*?)\s+FROM\s+(?P<t1>[\w.]+)\s+(?:AS\s+)?"
    r"(?P<a>\w+)\s+(?:INNER\s+)?JOIN\s+(?P<t2>[\w.]+)\s+(?:AS\s+)?"
    r"(?P<b>\w+)\s+ON\s+(?P<lq>\w+)\.(?P<lk>\w+)\s*=\s*"
    r"(?P<rq>\w+)\.(?P<rk>\w+)\s*(?P<rest>(?:WHERE|GROUP|ORDER|HAVING|"
    r"LIMIT)\b.*)?$",
    re.IGNORECASE | re.DOTALL)


def _try_bucket_join_route(catalog, spark, s: str):
    """Route ``SELECT ... FROM t1 a JOIN t2 b ON a.k = b.k [...]``
    through bucket_join when BOTH sides are engine tables
    bucket-partitioned by the same bucket[N] on their join keys —
    the facade analog of the reference's storage-partitioned join
    planning.  Returns the result DataFrame or None (any mismatch →
    caller falls back to the generic rewrite path, which is always
    correct).  Restricted shape by design: explicit aliases, single
    INNER equi-join; qualified column refs rewrite to the joined
    frame's names (same-named non-key B columns carry the plain-join
    ``_b`` suffix)."""
    from incubator_iceberg_spark.bucket_join import bucket_join

    m = _BUCKET_JOIN_RE.match(s)
    if not m:
        return None
    g = m.groupdict()
    try:
        ta = catalog.load_table(g["t1"], spark=spark)
        tb = catalog.load_table(g["t2"], spark=spark)
    except Exception:
        return None
    # map ON-clause qualifiers to sides
    if g["lq"] == g["a"] and g["rq"] == g["b"]:
        key_a, key_b = g["lk"], g["rk"]
    elif g["lq"] == g["b"] and g["rq"] == g["a"]:
        key_a, key_b = g["rk"], g["lk"]
    else:
        return None
    try:
        joined = bucket_join(ta, tb, key_a, key_b, spark=spark)
    except ValueError:
        return None  # not co-bucketed (or build oversize) → generic path
    cols_a = {f.name for f in ta.metadata.schema().fields}
    rename_b = {c: (c + "_b" if c in cols_a and c != key_b else c)
                for c in (f.name for f in tb.metadata.schema().fields)}
    same_key = rename_b.get(key_b) == key_a

    def dequalify(txt: str) -> str:
        def repl(mm):
            q, col = mm.group(1), mm.group(2)
            if q == g["a"]:
                return col
            if col == key_b and same_key:
                return key_a  # USING-style join keeps the key once
            return rename_b.get(col, col)
        return re.sub(rf"\b({re.escape(g['a'])}|{re.escape(g['b'])})"
                      r"\.(\w+)", repl, txt)

    view = f"__bucket_join_{abs(hash((g['t1'], g['t2'], key_a, key_b)))}"
    joined.createOrReplaceTempView(view)
    rest = " " + dequalify(g["rest"]) if g["rest"] else ""
    return spark.sql(f"SELECT {dequalify(g['sel'])} FROM {view}{rest}")


def _register_and_rewrite(catalog, spark, s: str) -> str:
    """Register engine tables named in the statement as temp views and
    rewrite their dotted names.  Views go through the Python Data Source
    (Catalyst WHERE clauses reach metadata pruning via pushFilters; v2
    delete files are applied executor-side by the reader).  Dotted tokens
    that are not engine tables (column refs like t.col) fail load_table
    and are left untouched."""
    s = _rewrite_time_travel(catalog, spark, s)
    # longest dotted names first: `db.t.snapshots` must resolve before a
    # `db.t` rewrite corrupts it (\b matches at the inner dots)
    names = sorted(set(re.findall(r"\b((?:\w+\.)+\w+)\b", s)),
                   key=lambda n: -n.count("."))
    for name in names:
        df = None
        try:
            t = catalog.load_table(name, spark=spark)
            # A table referenced MORE THAN ONCE in one statement (self
            # join, filtered UNION ALL unfiltered, ...) must NOT go
            # through the Python Data Source: every branch of the plan
            # shares the one PythonDataSourceV2 instance behind the temp
            # view, and Spark caches the planned read (readInfo) on it
            # keyed on nothing — a branch that pushes filters bakes them
            # into the shared partition list and a filterless branch
            # silently reuses it (a filtered+unfiltered UNION ALL
            # returned the filtered count for BOTH sides).  The eager
            # engine scan plans per-branch-safe parquet relations; data
            # pins at plan time, which within a single statement is
            # exactly snapshot isolation.
            if len(re.findall(rf"\b{re.escape(name)}\b", s)) > 1:
                df = t.to_df(spark)
            else:
                df = _view_df(t, spark)
        except Exception:
            # engine VIEW: expand its stored SQL recursively through the
            # facade (views.py — scans under the view keep pruning).
            # Resolution goes through the CATALOG's view methods so
            # branch-scoped views (NessieLite) and pointer-store layouts
            # resolve; FS-path fallback for bare catalogs
            from incubator_iceberg_spark import views as V
            parts = name.split(".")
            kind = parts[-1].lower()
            v_exists = getattr(catalog, "view_exists",
                               lambda n: V.view_exists(catalog, n))
            v_load = getattr(catalog, "load_view",
                             lambda n: V.load_view(catalog, n))
            try:
                if v_exists(name):
                    df = v_load(name).to_df(catalog, spark)
                elif (len(parts) >= 3 and kind == "versions"
                        and v_exists(".".join(parts[:-1]))):
                    df = V.versions_df(
                        v_load(".".join(parts[:-1])), spark)
            except ValueError as e:
                if "view cycle" in str(e):
                    raise
                df = None
            except Exception:
                df = None
        if df is None:
            # `db.t.<metadata_table>` / `db.t.changes`: the inspection
            # surface of the reference family's Spark integration
            # (SELECT * FROM db.t.snapshots / .files / .changes)
            from incubator_iceberg_spark import metadata_tables as MT
            parts = name.split(".")
            kind = parts[-1].lower()
            if len(parts) >= 3 and (kind in MT.METADATA_TABLE_KINDS
                                    or kind == "changes"):
                try:
                    base = catalog.load_table(".".join(parts[:-1]),
                                              spark=spark)
                    # a table COLUMN named files/changes/snapshots/...
                    # wins over the inspection surface: `db.t.files` in
                    # that case is a qualified column ref, and the base
                    # `db.t` rewrite keeps it one (`db_t.files`)
                    if any(f.name.lower() == kind
                           for f in base.metadata.schema().fields):
                        df = None
                    else:
                        df = (base.changelog(spark=spark)
                              if kind == "changes"
                              else MT.metadata_table(base, kind, spark))
                except Exception:
                    df = None
        if df is None:
            continue
        view = name.replace(".", "_")
        df.createOrReplaceTempView(view)
        s = re.sub(rf"\b{re.escape(name)}\b", view, s)
    return s


# Data-source registration is session-global and stateless — pay its
# py4j round trip once per session, not per referenced table.  Weak so
# a recycled id() of a stopped session can never alias a new one.
_DS_REGISTERED: weakref.WeakSet = weakref.WeakSet()


def _view_df(t, spark):
    # A FRESH load() per statement is load-bearing for CORRECTNESS, not
    # style: Spark's PythonDataSourceV2 caches the planned read
    # (readInfo — pickled read function + partition list) on the
    # provider instance, keyed on nothing.  pushFilters overwrites it;
    # a filterless query never calls pushFilters, so executing one
    # against a shared handle silently reuses whatever filter the LAST
    # filtered plan baked into the partition list (wrong results — a
    # cached-handle build returned a 100000-cutoff COUNT for an
    # unfiltered view read).  The per-statement cost is recovered by
    # passing the schema explicitly: DataFrameReader.load() then skips
    # the schema-inference Python-worker round trip (~280 ms → ~40 ms
    # per call measured warm).
    try:
        from incubator_iceberg_spark import sources
        # The reader resolves table state from the LOCATION at every
        # execution; probe it driver-side and take the schema from the
        # same source (parity with the worker-side inference the
        # explicit schema skips).  Pointer-store catalogs (NessieLite
        # branches) whose locations don't carry the standard file
        # layout fail here and keep the eager path, as they did when
        # schema inference failed inside load().
        loc_md = sources._load_metadata(t.location)
        if spark not in _DS_REGISTERED:
            sources.register(spark)
            _DS_REGISTERED.add(spark)
        return (spark.read.format(sources.FORMAT_NAME)
                .schema(loc_md.schema().to_spark())
                .option("path", t.location).load())
    except Exception:
        pass  # unloadable location / registration hiccup → eager path
    # the eager fallback pins data at plan time
    return t.to_df(spark)


def register_views(catalog, spark, names=None) -> None:
    """Expose engine tables as Spark temp views (dots → underscores)."""
    for name in (names or catalog.list_tables()):
        t = catalog.load_table(name, spark=spark)
        _view_df(t, spark).createOrReplaceTempView(name.replace(".", "_"))
