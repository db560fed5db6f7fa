"""Versioned SQL views (views.py): catalog CRUD, facade routing,
version history / rollback, nesting, and table/view collision guards."""

import threading

import pytest

from incubator_iceberg_spark import sqlfacade
from incubator_iceberg_spark.schema import Schema
from incubator_iceberg_spark.table import TableAlreadyExistsError
from incubator_iceberg_spark.views import (NoSuchViewError,
                                           ViewAlreadyExistsError)


@pytest.fixture()
def orders_table(warehouse, spark, sf_dir):
    src = (spark.read.parquet(f"{sf_dir}/orders.parquet")
           .select("o_orderkey", "o_custkey", "o_totalprice"))
    t = warehouse.create_table("db.vo", Schema.from_spark(src.schema))
    t.append(src)
    return t, src


def test_create_query_replace_rollback(warehouse, spark, orders_table):
    _, src = orders_table
    sqlfacade.execute(warehouse, spark,
                      "CREATE VIEW db.big AS SELECT o_orderkey, o_totalprice "
                      "FROM db.vo WHERE o_totalprice > 100000")
    n1 = sqlfacade.execute(
        warehouse, spark, "SELECT COUNT(*) AS n FROM db.big").collect()[0].n
    assert n1 == src.filter("o_totalprice > 100000").count()

    sqlfacade.execute(warehouse, spark,
                      "CREATE OR REPLACE VIEW db.big AS "
                      "SELECT o_orderkey, o_totalprice FROM db.vo "
                      "WHERE o_totalprice > 200000")
    n2 = sqlfacade.execute(
        warehouse, spark, "SELECT COUNT(*) AS n FROM db.big").collect()[0].n
    assert n2 == src.filter("o_totalprice > 200000").count()

    v = warehouse.load_view("db.big")
    assert [x.version_id for x in v.versions()] == [1, 2]
    assert v.metadata.current_version_id == 2
    # prior version stays queryable by id (time travel by view version)
    assert v.to_df(warehouse, spark, version_id=1).count() == n1

    v.rollback_to_version(1)
    assert sqlfacade.execute(
        warehouse, spark,
        "SELECT COUNT(*) AS n FROM db.big").collect()[0].n == n1
    # version log records create, replace, rollback
    assert [e["version-id"] for e in v.version_log()] == [1, 2, 1]


def test_versions_inspection_and_schema_capture(warehouse, spark,
                                                orders_table):
    warehouse.create_view(
        "db.v1", "SELECT o_custkey, SUM(o_totalprice) AS total "
                 "FROM db.vo GROUP BY o_custkey", spark=spark)
    rows = sqlfacade.execute(
        warehouse, spark,
        "SELECT version_id, operation, is_current FROM db.v1.versions"
    ).collect()
    assert [(r.version_id, r.operation, r.is_current) for r in rows] == \
        [(1, "create", True)]
    v = warehouse.load_view("db.v1")
    fields = {f["name"] for f in
              v.metadata.current_version().schema_json["fields"]}
    assert fields == {"o_custkey", "total"}


def test_nested_views_and_cycle_guard(warehouse, spark, orders_table):
    warehouse.create_view(
        "db.a", "SELECT o_orderkey FROM db.vo WHERE o_orderkey % 2 = 0",
        spark=spark)
    warehouse.create_view(
        "db.b", "SELECT o_orderkey FROM db.a WHERE o_orderkey % 3 = 0",
        spark=spark)
    n = sqlfacade.execute(
        warehouse, spark, "SELECT COUNT(*) AS n FROM db.b").collect()[0].n
    assert n == orders_table[1].filter("o_orderkey % 6 = 0").count()

    # a -> b -> a: replace without schema capture, then querying raises
    warehouse.load_view("db.a").replace("SELECT o_orderkey FROM db.b")
    with pytest.raises(ValueError, match="view cycle"):
        sqlfacade.execute(warehouse, spark, "SELECT * FROM db.a")


def test_collision_and_drop_semantics(warehouse, spark, orders_table):
    t, src = orders_table
    warehouse.create_view("db.w", "SELECT o_orderkey FROM db.vo",
                          spark=spark)
    with pytest.raises(ViewAlreadyExistsError):
        warehouse.create_view("db.w", "SELECT 1", spark=spark)
    with pytest.raises(TableAlreadyExistsError):
        warehouse.create_table("db.w", Schema.from_spark(src.schema))
    with pytest.raises(ViewAlreadyExistsError):
        warehouse.create_view("db.vo", "SELECT 1", spark=spark)
    assert not warehouse.drop_table("db.w")  # wrong kind: refuses
    assert warehouse.list_views() == ["db.w"]
    assert warehouse.list_tables() == ["db.vo"]
    assert sqlfacade.execute(warehouse, spark, "DROP VIEW db.w") is True
    assert warehouse.list_views() == []
    with pytest.raises(NoSuchViewError):
        sqlfacade.execute(warehouse, spark, "DROP VIEW db.w")
    assert sqlfacade.execute(
        warehouse, spark, "DROP VIEW IF EXISTS db.w") is False


def test_view_sees_table_updates_and_prunes(warehouse, spark, orders_table):
    """A view stores SQL, not data: new appends are visible, and the scan
    under the view keeps metadata pruning (fewer files read)."""
    t, src = orders_table
    warehouse.create_view(
        "db.live", "SELECT COUNT(*) AS n FROM db.vo", spark=spark)
    before = sqlfacade.execute(
        warehouse, spark, "SELECT * FROM db.live").collect()[0].n
    t.append(src.limit(10))
    after = sqlfacade.execute(
        warehouse, spark, "SELECT * FROM db.live").collect()[0].n
    assert after == before + 10


def test_concurrent_replace_all_land(warehouse, spark, orders_table):
    """Conflicting replaces retry against the new base (run_with_retries
    shape): every committer's version lands, ids stay dense."""
    warehouse.create_view("db.r", "SELECT o_orderkey FROM db.vo",
                          spark=spark)
    results = []

    def worker(i):
        try:
            warehouse.load_view("db.r").replace(
                f"SELECT o_orderkey FROM db.vo WHERE o_orderkey % 10 = {i}")
            results.append(("ok", i))
        except Exception as e:
            results.append(("err", type(e).__name__))

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    [x.start() for x in ts]
    [x.join() for x in ts]
    oks = [r for r in results if r[0] == "ok"]
    v = warehouse.load_view("db.r")
    assert len(v.versions()) == 1 + len(oks)
    assert [x.version_id for x in v.versions()] == \
        list(range(1, 2 + len(oks)))
    assert v.metadata.current_version_id == len(v.versions())


def test_alter_view_and_show(warehouse, spark, orders_table):
    _, src = orders_table
    sqlfacade.execute(warehouse, spark,
                      "CREATE VIEW db.av AS SELECT o_orderkey FROM db.vo")
    # ALTER VIEW ... AS appends a version
    sqlfacade.execute(warehouse, spark,
                      "ALTER VIEW db.av AS SELECT o_orderkey FROM db.vo "
                      "WHERE o_orderkey % 2 = 0")
    v = warehouse.load_view("db.av")
    assert len(v.versions()) == 2 and v.metadata.current_version_id == 2
    assert sqlfacade.execute(
        warehouse, spark, "SELECT COUNT(*) AS n FROM db.av"
    ).collect()[0].n == src.filter("o_orderkey % 2 = 0").count()
    # ALTER VIEW ... SET TBLPROPERTIES
    sqlfacade.execute(warehouse, spark,
                      "ALTER VIEW db.av SET TBLPROPERTIES "
                      "('owner'='me', 'comment'='top view')")
    v = warehouse.load_view("db.av")
    assert v.metadata.properties["owner"] == "me"
    assert v.metadata.properties["comment"] == "top view"
    # SHOW TABLES / SHOW VIEWS
    rows = sqlfacade.execute(warehouse, spark, "SHOW VIEWS").collect()
    assert [(r.namespace, r.name) for r in rows] == [("db", "av")]
    rows = sqlfacade.execute(warehouse, spark, "SHOW TABLES IN db").collect()
    assert ("db", "vo") in [(r.namespace, r.name) for r in rows]


def test_view_version_time_travel_sql(warehouse, spark, orders_table):
    _, src = orders_table
    warehouse.create_view(
        "db.tt", "SELECT o_orderkey FROM db.vo WHERE o_orderkey % 2 = 0",
        spark=spark)
    warehouse.create_view(
        "db.tt", "SELECT o_orderkey FROM db.vo WHERE o_orderkey % 3 = 0",
        spark=spark, replace=True)
    n1 = sqlfacade.execute(
        warehouse, spark,
        "SELECT COUNT(*) AS n FROM db.tt VERSION AS OF 1").collect()[0].n
    assert n1 == src.filter("o_orderkey % 2 = 0").count()
    n2 = sqlfacade.execute(
        warehouse, spark, "SELECT COUNT(*) AS n FROM db.tt").collect()[0].n
    assert n2 == src.filter("o_orderkey % 3 = 0").count()
    with pytest.raises(ValueError, match="no view version"):
        sqlfacade.execute(warehouse, spark,
                          "SELECT * FROM db.tt VERSION AS OF 9")


def test_view_over_renamed_table_location_refused(tmp_path, spark):
    """SqliteCatalog rename moves the pointer but the files stay put: a
    view created under the OLD name must refuse the still-live directory
    (writing there, then dropping the view, would have destroyed the
    renamed table's data)."""
    from incubator_iceberg_spark.catalog_sqlite import SqliteCatalog
    cat = SqliteCatalog(str(tmp_path / "cat.db"), str(tmp_path / "wh"),
                        spark=spark)
    df = spark.range(10).toDF("id")
    t = cat.create_table("db.orig", Schema.from_spark(df.schema))
    t.append(df)
    cat.rename_table("db.orig", "db.moved")
    with pytest.raises(ViewAlreadyExistsError, match="table metadata"):
        cat.create_view("db.orig", "SELECT 1", spark=spark)
    assert cat.load_table("db.moved").to_df().count() == 10


def test_view_location_collision_guards(warehouse, spark, orders_table):
    """Nesting under an existing object is refused both ways, and
    drop_view unlinks only the view's own files."""
    import os
    # nesting guards, both directions
    with pytest.raises(ViewAlreadyExistsError, match="ancestor"):
        warehouse.create_view("db.vo.sub", "SELECT 1", spark=spark)
    warehouse.create_view("db.topv", "SELECT o_orderkey FROM db.vo",
                          spark=spark)
    with pytest.raises(TableAlreadyExistsError, match="ancestor"):
        warehouse.create_table("db.topv.t",
                               Schema.from_spark(orders_table[1].schema))
    # drop_view leaves foreign files in a shared directory intact
    vloc = warehouse._table_location("db.topv")
    marker = os.path.join(vloc, "metadata", "unrelated.bin")
    with open(marker, "wb") as f:
        f.write(b"x")
    assert warehouse.drop_view("db.topv")
    assert os.path.exists(marker)
    assert warehouse.list_views() == []


def test_branch_scoped_views_nessie(tmp_path, spark):
    """Views on the NessieLite catalog ride the commit map (kind=view):
    per-branch version history, branch isolation, fast-forward-able
    merges, both-modified conflicts, and guards against table/view
    name collisions."""
    from pyspark.sql import functions as F
    from incubator_iceberg_spark.catalog_branches import (
        MergeConflictError, NessieLiteCatalog)

    cat = NessieLiteCatalog(str(tmp_path / "cat.db"),
                            str(tmp_path / "wh"), spark)
    df = spark.range(100).select(F.col("id"))
    t = cat.create_table("db.t", Schema.from_spark(df.schema))
    t.append(df)
    sqlfacade.execute(cat, spark,
                      "CREATE VIEW db.v AS SELECT id FROM db.t "
                      "WHERE id % 2 = 0")

    dev = cat.create_branch("dev")
    sqlfacade.execute(dev, spark,
                      "CREATE OR REPLACE VIEW db.v AS SELECT id FROM db.t "
                      "WHERE id % 5 = 0")
    # branch isolation: main still serves v1
    assert sqlfacade.execute(
        dev, spark, "SELECT COUNT(*) AS n FROM db.v").collect()[0].n == 20
    assert sqlfacade.execute(
        cat, spark, "SELECT COUNT(*) AS n FROM db.v").collect()[0].n == 50
    assert [x.version_id for x in cat.load_view("db.v").versions()] == [1]
    assert [x.version_id
            for x in dev.load_view("db.v").versions()] == [1, 2]

    cat.merge("dev")  # view change merges like a table change
    assert sqlfacade.execute(
        cat, spark, "SELECT COUNT(*) AS n FROM db.v").collect()[0].n == 20

    # both-modified view -> MergeConflictError
    dev2 = cat.create_branch("dev2")
    sqlfacade.execute(dev2, spark,
                      "CREATE OR REPLACE VIEW db.v AS SELECT id FROM db.t "
                      "WHERE id % 3 = 0")
    sqlfacade.execute(cat, spark,
                      "CREATE OR REPLACE VIEW db.v AS SELECT id FROM db.t "
                      "WHERE id % 7 = 0")
    with pytest.raises(MergeConflictError):
        cat.merge("dev2")

    # kind guards + listings
    assert cat.list_tables() == ["db.t"]
    assert cat.list_views() == ["db.v"]
    with pytest.raises(TableAlreadyExistsError):
        cat.create_table("db.v", Schema.from_spark(df.schema))
    assert cat.drop_table("db.v") is False  # wrong kind
    assert cat.drop_view("db.v") is True and cat.list_views() == []
    # the other branch's head still serves its own version
    assert sqlfacade.execute(
        dev2, spark, "SELECT COUNT(*) AS n FROM db.v").collect()[0].n == 34


def test_view_sql_must_be_a_query(warehouse, spark, orders_table):
    """The programmatic API (unlike the facade regex) accepted arbitrary
    text, and to_df re-executes the stored text through full facade
    dispatch on every read — a DDL/DML body would run per read."""
    from incubator_iceberg_spark import views as V
    with pytest.raises(ValueError, match="must be a query"):
        V.create_view(warehouse, "db.evil", "DROP TABLE db.vo", spark=spark)
    v = V.create_view(warehouse, "db.ok",
                      "-- leading comment\n  WITH x AS (SELECT 1 AS a) "
                      "SELECT a FROM x", spark=spark)
    assert v.to_df(warehouse, spark).count() == 1
    with pytest.raises(ValueError, match="must be a query"):
        v.replace("DELETE FROM db.vo WHERE o_orderkey = 1",
                  catalog=warehouse, spark=spark)
    # defense in depth: a stored body that is somehow not a query is
    # refused at READ time too
    v.metadata.versions[-1].sql = "DROP TABLE db.vo"
    with pytest.raises(ValueError, match="must be a query"):
        v.to_df(warehouse, spark)
    assert warehouse.load_table("db.vo").to_df().count() > 0


def test_create_view_rolls_back_on_concurrent_table(warehouse, spark,
                                                    orders_table,
                                                    monkeypatch):
    """TOCTOU guard: table_exists passes pre-commit, a concurrent
    create_table lands before our post-commit re-check — the view must
    unlink itself and raise instead of leaving both objects on one name."""
    from incubator_iceberg_spark import views as V
    calls = {"n": 0}
    real = warehouse.table_exists

    def racy(name):
        if name == "db.race":
            calls["n"] += 1
            return calls["n"] >= 2  # pre-check False, post-check True
        return real(name)

    monkeypatch.setattr(warehouse, "table_exists", racy)
    with pytest.raises(ViewAlreadyExistsError, match="concurrently"):
        V.create_view(warehouse, "db.race", "SELECT 1 AS a", spark=spark)
    assert not V.view_exists(warehouse, "db.race")


def test_view_body_over_metadata_table_and_time_travel(warehouse, spark,
                                                       orders_table):
    """View bodies are full facade SQL: metadata-table suffixes and
    VERSION AS OF time travel inside a view body resolve per read."""
    t, src = orders_table
    s1 = t.metadata.current_snapshot_id
    t.append(src.limit(7))
    sqlfacade.execute(warehouse, spark,
                      "CREATE VIEW db.vsnap AS "
                      "SELECT COUNT(*) AS n_snaps FROM db.vo.snapshots")
    assert sqlfacade.execute(
        warehouse, spark, "SELECT * FROM db.vsnap").first().n_snaps == 2
    sqlfacade.execute(warehouse, spark,
                      f"CREATE VIEW db.vpin AS SELECT COUNT(*) AS n "
                      f"FROM db.vo VERSION AS OF {s1}")
    n_v1 = src.count()
    assert sqlfacade.execute(
        warehouse, spark, "SELECT * FROM db.vpin").first().n == n_v1
    # the time-travel pin holds as the base table moves on
    t.append(src.limit(3))
    assert sqlfacade.execute(
        warehouse, spark, "SELECT * FROM db.vpin").first().n == n_v1
    assert sqlfacade.execute(
        warehouse, spark, "SELECT * FROM db.vsnap").first().n_snaps == 3


def test_show_create_view_and_table(warehouse, spark, orders_table):
    sqlfacade.execute(warehouse, spark,
                      "CREATE VIEW db.vshow AS "
                      "SELECT o_orderkey FROM db.vo WHERE o_totalprice > 1")
    row = sqlfacade.execute(warehouse, spark,
                            "SHOW CREATE VIEW db.vshow").first()
    assert "CREATE VIEW db.vshow AS" in row.createview_stmt
    assert "o_totalprice > 1" in row.createview_stmt
    # round-trip: the rendered body re-executes
    body = row.createview_stmt.split(" AS\n", 1)[1].split("\nTBLPROPERTIES")[0]
    assert sqlfacade.execute(warehouse, spark, body).count() > 0

    t = warehouse.create_table(
        "db.shtab", "k long, v string",
        partition_by=["bucket(8, k)"],
        properties={"write.format.default": "parquet"})
    row = sqlfacade.execute(warehouse, spark,
                            "SHOW CREATE TABLE db.shtab").first()
    assert "CREATE TABLE db.shtab" in row.createtab_stmt
    assert "bucket(8, k)" in row.createtab_stmt
    assert "USING iiws" in row.createtab_stmt
    assert "write.format.default" in row.createtab_stmt


def test_concurrent_replace_with_readers(warehouse, spark, orders_table):
    """Reader isolation under concurrent REPLACE: every read executes
    ONE committed version's SQL — results always match some version's
    expected output, never an error or a torn state."""
    from incubator_iceberg_spark import views as V
    V.create_view(warehouse, "db.vrw",
                  "SELECT COUNT(*) AS n, 0 AS v FROM db.vo", spark=spark)
    valid = {}
    valid[0] = tuple(sqlfacade.execute(
        warehouse, spark, "SELECT COUNT(*) AS n, 0 AS v FROM db.vo")
        .first())
    errors, results = [], []

    def replacer():
        try:
            v = warehouse.load_view("db.vrw")
            for i in range(1, 6):
                cutoff = i * 20000
                v.replace(f"SELECT COUNT(*) AS n, {i} AS v FROM db.vo "
                          f"WHERE o_totalprice > {cutoff}",
                          catalog=warehouse, spark=spark)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def reader():
        try:
            for _ in range(8):
                v = warehouse.load_view("db.vrw")
                results.append(tuple(v.to_df(warehouse, spark).first()))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    for i in range(1, 6):
        valid[i] = tuple(sqlfacade.execute(
            warehouse, spark,
            f"SELECT COUNT(*) AS n, {i} AS v FROM db.vo "
            f"WHERE o_totalprice > {i * 20000}").first())
    threads = [threading.Thread(target=replacer)] + \
              [threading.Thread(target=reader) for _ in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert results and all(r in set(valid.values()) for r in results), \
        (results, valid)
    # after the dust settles: current = the last replace
    v = warehouse.load_view("db.vrw").refresh()
    assert tuple(v.to_df(warehouse, spark).first()) == valid[5]
    assert [x.version_id for x in v.versions()] == [1, 2, 3, 4, 5, 6]


def test_drop_namespace_refuses_views_only_namespace(warehouse, spark,
                                                     orders_table):
    """r11 advice #2: list_tables excludes views, so DROP NAMESPACE on a
    namespace holding ONLY views used to pass the emptiness check and
    rmtree the views — data loss through a DDL surface.  It must raise
    the same not-empty error; after dropping the view the namespace
    drops cleanly."""
    warehouse.create_view("vns.only_view",
                          "SELECT o_orderkey FROM db.vo", spark=spark)
    assert warehouse.list_tables("vns") == []
    assert warehouse.list_views("vns") == ["vns.only_view"]
    with pytest.raises(ValueError, match="not empty"):
        warehouse.drop_namespace("vns")
    # the view survived the refused drop
    assert warehouse.list_views("vns") == ["vns.only_view"]
    assert warehouse.drop_view("vns.only_view") is True
    assert warehouse.drop_namespace("vns") is True
    assert "vns" not in warehouse.list_namespaces()
