"""REST catalog (catalog_rest.py — the public Iceberg REST catalog
spec's table surface over an in-process stdlib HTTP service): pointer
CAS commits, optimistic retries, rename/drop, auth, restart
persistence."""

import threading

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark.catalog_rest import (RestCatalog, RestCatalogServer,
                                                  RestError)
from incubator_iceberg_spark.metadata import CommitFailedException
from incubator_iceberg_spark.schema import Schema
from incubator_iceberg_spark.table import (NoSuchTableError,
                                           TableAlreadyExistsError)


@pytest.fixture()
def server():
    srv = RestCatalogServer().start()
    yield srv
    srv.stop()


@pytest.fixture()
def rcat(server, tmp_path, spark):
    return RestCatalog(server.url, str(tmp_path / "wh"), spark)


def _ids(spark, n=500):
    return spark.range(n).select(F.col("id"), (F.col("id") % 7).alias("v"))


def test_rest_round_trip(rcat, spark):
    base = _ids(spark)
    t = rcat.create_table("db.rt", Schema.from_spark(base.schema))
    t.append(base)
    assert t.to_df().count() == 500
    t.delete_where("id % 5 = 0", mode="merge-on-read")
    assert t.to_df().count() == 400
    # reload through the service
    t2 = rcat.load_table("db.rt")
    assert t2.to_df().count() == 400
    assert rcat.table_exists("db.rt")
    assert rcat.list_tables("db") == ["db.rt"]
    with pytest.raises(TableAlreadyExistsError):
        rcat.create_table("db.rt", Schema.from_spark(base.schema))
    with pytest.raises(NoSuchTableError):
        rcat.load_table("db.absent")


def test_rest_cas_conflict_and_retry(rcat, spark):
    base = _ids(spark)
    t = rcat.create_table("db.cas", Schema.from_spark(base.schema))
    t.append(base)
    # a stale handle loses the pointer swap
    stale = rcat.load_table("db.cas")
    t.append(base.limit(10))
    from incubator_iceberg_spark import snapshots as SN
    with pytest.raises(CommitFailedException):
        # bypass retries: commit directly against the stale base
        stale.ops.commit(stale.ops.current_version() - 1,
                         stale.metadata)
    # but the engine's retry loop re-applies and lands
    stale.append(base.limit(5))
    assert rcat.load_table("db.cas").to_df().count() == 515


def test_rest_concurrent_committers_all_land(rcat, spark):
    base = _ids(spark, 100)
    t = rcat.create_table("db.conc", Schema.from_spark(base.schema))
    errors = []

    def worker(i):
        try:
            h = rcat.load_table("db.conc") if i else t
            h.append(base.filter(f"id % 4 = {i}"))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert rcat.load_table("db.conc").to_df().count() == 100
    assert len(rcat.load_table("db.conc").metadata.snapshots) == 4


def test_rest_rename_and_drop(rcat, spark):
    base = _ids(spark, 50)
    rcat.create_table("db.a", Schema.from_spark(base.schema)).append(base)
    rcat.rename_table("db.a", "db.b")
    assert not rcat.table_exists("db.a")
    # metadata-only rename: files stayed at the original directory
    assert rcat.load_table("db.b").to_df().count() == 50
    rcat.create_table("db.a", Schema.from_spark(base.schema))  # fresh dir
    with pytest.raises(TableAlreadyExistsError):
        rcat.rename_table("db.a", "db.b")
    assert rcat.drop_table("db.b")
    assert not rcat.drop_table("db.b")
    assert rcat.list_tables("db") == ["db.a"]


def test_rest_auth_rejected(tmp_path, spark):
    srv = RestCatalogServer(token="sekrit").start()
    try:
        with pytest.raises(RestError) as ei:
            RestCatalog(srv.url, str(tmp_path / "w1"), spark)
        assert ei.value.code == 401
        cat = RestCatalog(srv.url, str(tmp_path / "w2"), spark,
                          token="sekrit")
        cat.create_table("db.t", "k long")
        assert cat.table_exists("db.t")
    finally:
        srv.stop()


def test_rest_restart_persistence(tmp_path, spark):
    state = str(tmp_path / "catalog-state.json")
    srv = RestCatalogServer(state_path=state).start()
    base = _ids(spark, 60)
    cat = RestCatalog(srv.url, str(tmp_path / "wh"), spark)
    cat.create_table("db.p", Schema.from_spark(base.schema)).append(base)
    srv.stop()
    srv2 = RestCatalogServer(state_path=state).start()
    try:
        cat2 = RestCatalog(srv2.url, str(tmp_path / "wh"), spark)
        assert cat2.load_table("db.p").to_df().count() == 60
        # commits continue from the persisted pointer
        cat2.load_table("db.p").append(base.limit(6))
        assert cat2.load_table("db.p").to_df().count() == 66
    finally:
        srv2.stop()


def test_rest_views_over_rest_tables(rcat, spark):
    from incubator_iceberg_spark import sqlfacade as SQLF
    base = _ids(spark, 80)
    rcat.create_table("db.vt", Schema.from_spark(base.schema)).append(base)
    SQLF.execute(rcat, spark,
                 "CREATE VIEW db.vv AS SELECT v, COUNT(*) AS n "
                 "FROM db.vt GROUP BY v")
    assert SQLF.execute(rcat, spark,
                        "SELECT * FROM db.vv").count() == 7


def test_rest_list_all_namespaces_and_show_tables(rcat, spark):
    """list_tables('') (the default) must hit the list-ALL route — the
    round-9 review found the empty path segment was filtered out server-
    side, 404ing SHOW TABLES and facade view registration."""
    from incubator_iceberg_spark import sqlfacade as SQLF
    rcat.create_table("db.l1", "k long")
    rcat.create_table("db2.l2", "k long")
    assert rcat.list_tables("") == ["db.l1", "db2.l2"]
    names = {(r.namespace, r.name) for r in SQLF.execute(
        rcat, spark, "SHOW TABLES").collect()}
    assert names == {("db", "l1"), ("db2", "l2")}


def test_rest_transport_failure_not_landed(rcat, spark, monkeypatch):
    """A PRE-SEND transport failure of the pointer-swap POST (connect
    refused: the request provably never reached the server) must clean
    up and raise CommitFailedException — the retry loop then re-applies.
    Before the round-9 review fix, the orphaned metadata file wedged
    every future commit."""
    from incubator_iceberg_spark import catalog_rest as CR
    base = _ids(spark, 40)
    t = rcat.create_table("db.tf", Schema.from_spark(base.schema))
    t.append(base)
    real = CR._call
    state = {"drop_next_post": True}

    def flaky(url, method="GET", body=None, token=None, timeout=10.0):
        if method == "POST" and state["drop_next_post"]:
            state["drop_next_post"] = False
            raise ConnectionRefusedError("connect refused before send")
        return real(url, method=method, body=body, token=token,
                    timeout=timeout)

    monkeypatch.setattr(CR, "_call", flaky)
    with pytest.raises(CommitFailedException, match="transport"):
        t.ops.commit(t.ops.current_version(), t.metadata)
    # NOT wedged: the next commit (fresh handle, same version slot) lands
    t2 = rcat.load_table("db.tf")
    t2.append(base.limit(4))
    assert rcat.load_table("db.tf").to_df().count() == 44


def test_rest_timeout_with_delayed_landing_is_unknown(rcat, spark,
                                                      monkeypatch):
    """A TIMEOUT leaves the POST possibly in flight: even when the
    re-read still shows the old pointer, the swap can land AFTER the
    re-read.  The r10 fix classifies this as CommitStateUnknownError and
    KEEPS the metadata file — the r9 code unlinked it and retried, so a
    late-landing swap left the server pointing at a deleted file
    (refresh → FileNotFoundError, table wedged) and the retry
    double-applied the mutation."""
    import time
    from incubator_iceberg_spark import catalog_rest as CR
    from incubator_iceberg_spark.catalog_rest import CommitStateUnknownError
    base = _ids(spark, 30)
    t = rcat.create_table("db.late", Schema.from_spark(base.schema))
    t.append(base)
    real = CR._call
    state = {"delay_next_post": True}

    def delayed(url, method="GET", body=None, token=None, timeout=10.0):
        if method == "POST" and state["delay_next_post"]:
            state["delay_next_post"] = False
            # the request IS in flight: it will land shortly AFTER the
            # client has timed out and re-read the (still-old) pointer
            th = threading.Timer(0.4, real, args=(url,),
                                 kwargs=dict(method=method, body=body,
                                             token=token, timeout=timeout))
            th.start()
            raise TimeoutError("timed out waiting for response")
        return real(url, method=method, body=body, token=token,
                    timeout=timeout)

    monkeypatch.setattr(CR, "_call", delayed)
    meta_dir = t.ops.metadata_dir
    import os
    before = set(os.listdir(meta_dir))
    with pytest.raises(CommitStateUnknownError):
        t.append(base.limit(3))
    after = set(os.listdir(meta_dir))
    # the uuid-named metadata file was KEPT (new files, none removed)
    assert before <= after and len(after) > len(before)
    time.sleep(0.8)  # let the in-flight swap land
    # the late-landing swap references the kept file: reads see the
    # commit, nothing is wedged, and no retry double-applied it
    t2 = rcat.load_table("db.late")
    assert t2.to_df().count() == 33
    assert len(t2.metadata.snapshots) == 2
    t2.append(base.limit(2))  # future commits proceed normally
    assert rcat.load_table("db.late").to_df().count() == 35


def test_rest_create_race_maps_409_to_already_exists(rcat, spark):
    """A 409 from the CREATE endpoint (another client created the table
    between our existence check and our commit) surfaces as
    TableAlreadyExistsError — matching the other catalogs' create
    semantics — not a retryable CommitFailedException."""
    from incubator_iceberg_spark.catalog_rest import RestTableOperations
    from incubator_iceberg_spark.metadata import TableMetadata
    from incubator_iceberg_spark.partitioning import PartitionSpec
    base = _ids(spark, 10)
    rcat.create_table("db.race", Schema.from_spark(base.schema))
    # a second client that already passed its existence check
    ops = RestTableOperations(rcat.base_url, "db.race",
                              rcat._table_location("db.race") + "-b")
    sch = Schema.from_spark(base.schema)
    md = TableMetadata.new(ops.location, sch,
                           PartitionSpec.unpartitioned(sch), None)
    with pytest.raises(TableAlreadyExistsError):
        ops.commit(None, md)


def test_rest_rejects_unsafe_server_values(rcat, spark, server, tmp_path):
    """Server-supplied metadata_file must stay a bare filename and
    server-supplied locations must stay under the warehouse — a
    traversal-bearing pointer must not escape (r9 advice)."""
    base = _ids(spark, 10)
    rcat.create_table("db.safe", Schema.from_spark(base.schema)).append(base)
    with server.state.lock:
        server.state.tables["db.safe"]["metadata_file"] = \
            "../../../etc/evil.json"
    with pytest.raises(ValueError, match="unsafe metadata_file"):
        rcat.load_table("db.safe")
    # location outside the warehouse: purge refuses to rmtree it
    victim = tmp_path / "victim-dir"
    victim.mkdir()
    (victim / "keep.txt").write_text("do not delete")
    with server.state.lock:
        server.state.tables["db.safe"]["metadata_file"] = None
        server.state.tables["db.safe"]["location"] = str(victim)
    with pytest.raises(ValueError, match="outside the warehouse"):
        rcat.load_table("db.safe")
    with pytest.raises(ValueError, match="refusing to purge"):
        rcat.drop_table("db.safe", purge=True)
    assert (victim / "keep.txt").exists()


def test_rest_transport_failure_landed(rcat, spark, monkeypatch):
    """If the POST reached the server but the RESPONSE was lost, the
    commit re-reads the pointer, sees its own metadata file, and reports
    success instead of double-applying through a retry."""
    from incubator_iceberg_spark import catalog_rest as CR
    base = _ids(spark, 30)
    t = rcat.create_table("db.tl", Schema.from_spark(base.schema))
    t.append(base)
    real = CR._call
    state = {"lose_next_post_response": True}

    def lossy(url, method="GET", body=None, token=None, timeout=10.0):
        out = real(url, method=method, body=body, token=token,
                   timeout=timeout)
        if method == "POST" and state["lose_next_post_response"]:
            state["lose_next_post_response"] = False
            raise OSError("response lost after server processed the swap")
        return out

    monkeypatch.setattr(CR, "_call", lossy)
    t2 = rcat.load_table("db.tl")
    t2.append(base.limit(3))  # POST lands, response lost → still success
    assert rcat.load_table("db.tl").to_df().count() == 33
    assert len(rcat.load_table("db.tl").metadata.snapshots) == 2


def test_rest_upsert_mor_with_auto_maintain_hook(rcat, spark):
    """Composition: the streaming upsert-MoR sink + the every-N-epochs
    auto_maintain hook, with EVERY commit kind (RowDelta epoch, convert
    replace, compaction rewrite, manifest rewrite, expire) CASing
    through the REST pointer service."""
    from incubator_iceberg_spark import streaming as STR
    from incubator_iceberg_spark.manifests import EQUALITY_DELETES
    from incubator_iceberg_spark.scan import TableScan

    base = _ids(spark, 300)
    t = rcat.create_table(
        "db.mor", Schema.from_spark(base.schema),
        properties={"maintenance.auto.every-epochs": "3",
                    "maintenance.auto.eq-debt-files": "2",
                    "maintenance.auto.min-small-files": "1000",
                    "maintenance.auto.max-manifests": "1000",
                    "maintenance.auto.max-snapshots": "1000"})
    t.append(base)
    for ep in range(1, 7):
        b = (base.limit(40)
             .withColumn("v", F.col("v") + ep))
        assert STR.upsert_mor_exactly_once(t, b, epoch_id=ep,
                                           on=["id"], spark=spark)
        t = rcat.load_table("db.mor")  # fresh handle each epoch via REST
    _data, dels = TableScan(t, spark)._plan_split()
    n_eq = len([e for e in dels
                if (e.get("content") or 0) == EQUALITY_DELETES])
    assert n_eq <= 2, n_eq  # hook paid the debt through REST commits
    assert t.to_df().count() == 300
    assert t.to_df().filter("id < 40").agg(
        F.min("v")).first()[0] == 6  # last epoch's update won


def test_rest_journal_replay_without_compaction(tmp_path, spark):
    """r10 persistence journal: a server that dies WITHOUT compacting
    (crash) must rebuild the exact pointer map from snapshot + journal
    replay — including renames and drops; a clean stop() compacts and a
    subsequent start agrees with zero journal lines."""
    import os
    state = str(tmp_path / "cat.json")
    srv = RestCatalogServer(state_path=state).start()
    try:
        cat = RestCatalog(srv.url, str(tmp_path / "wh"), spark)
        cat.create_table("db.j1", "k long")
        cat.create_table("db.j2", "k long")
        cat.rename_table("db.j2", "db.j3")
        cat.drop_table("db.j1", purge=False)
    finally:
        # CRASH: kill the HTTP server without the stop() compaction
        srv._httpd.shutdown()
        srv._httpd.server_close()
    assert os.path.exists(state + ".journal")
    assert os.path.getsize(state + ".journal") > 0
    srv2 = RestCatalogServer(state_path=state).start()
    try:
        cat2 = RestCatalog(srv2.url, str(tmp_path / "wh"), spark)
        assert cat2.list_tables("") == ["db.j3"]
        t = cat2.load_table("db.j3")
        t.append(spark.range(5).selectExpr("id AS k"))
        assert t.to_df().count() == 5
    finally:
        srv2.stop()  # compacts
    assert os.path.getsize(state + ".journal") == 0
    srv3 = RestCatalogServer(state_path=state).start()
    try:
        cat3 = RestCatalog(srv3.url, str(tmp_path / "wh"), spark)
        assert cat3.list_tables("") == ["db.j3"]
        assert cat3.load_table("db.j3").to_df().count() == 5
    finally:
        srv3.stop()


def test_rest_journal_torn_final_line(tmp_path, spark):
    """A crash mid-append leaves a torn final journal line: replay must
    DROP it (the op never ack'd to any client) and keep every complete
    line; mid-journal corruption still raises."""
    import json as _json
    import os
    state = str(tmp_path / "cat.json")
    srv = RestCatalogServer(state_path=state).start()
    cat = RestCatalog(srv.url, str(tmp_path / "wh"), spark)
    cat.create_table("db.a", "k long")
    cat.create_table("db.b", "k long")
    srv._httpd.shutdown()
    srv._httpd.server_close()  # crash: no compaction
    jp = state + ".journal"
    with open(jp, "a") as f:
        f.write('{"op": "set", "name": "db.c", "ro')  # torn mid-append
    srv2 = RestCatalogServer(state_path=state).start()
    try:
        cat2 = RestCatalog(srv2.url, str(tmp_path / "wh"), spark)
        assert cat2.list_tables("") == ["db.a", "db.b"]  # torn op dropped
    finally:
        srv2.stop()
    # mid-journal corruption (not the final line) is a REAL error
    with open(jp, "w") as f:
        f.write('{"op": "set", "name": "db.x", "ro\n')
        f.write(_json.dumps({"op": "set", "name": "db.y",
                             "row": {"location": "/wh/db/y",
                                     "version": 1}}) + "\n")
    with pytest.raises(Exception):
        RestCatalogServer(state_path=state)


def test_rest_journal_torn_line_then_new_ops_survive_second_crash(
        tmp_path, spark):
    """r10 review finding #1: after replay drops a torn final line, the
    fragment must be TRUNCATED before reopening for append — otherwise
    the next acked mutation merges into the fragment's line and a
    SECOND crash-replay drops a committed pointer swap."""
    import os
    state = str(tmp_path / "cat.json")
    srv = RestCatalogServer(state_path=state).start()
    cat = RestCatalog(srv.url, str(tmp_path / "wh"), spark)
    cat.create_table("db.a", "k long")
    srv._httpd.shutdown()
    srv._httpd.server_close()  # crash #1 (no compaction)
    with open(state + ".journal", "a") as f:
        f.write('{"op": "set", "name": "db.torn", "ro')
    srv2 = RestCatalogServer(state_path=state).start()
    cat2 = RestCatalog(srv2.url, str(tmp_path / "wh"), spark)
    cat2.create_table("db.b", "k long")  # acked mutation post-replay
    cat2.load_table("db.b").append(spark.range(3).selectExpr("id AS k"))
    srv2._httpd.shutdown()
    srv2._httpd.server_close()  # crash #2 (still no compaction)
    srv3 = RestCatalogServer(state_path=state).start()
    try:
        cat3 = RestCatalog(srv3.url, str(tmp_path / "wh"), spark)
        # the acked create + append survive the second crash-replay
        assert cat3.list_tables("") == ["db.a", "db.b"]
        assert cat3.load_table("db.b").to_df().count() == 3
    finally:
        srv3.stop()


def test_rest_rename_replay_idempotent_after_recreate(tmp_path, spark):
    """r10 review finding #2: full-journal replay onto an already-folded
    snapshot (the compact() crash window) must not let a re-executed
    rename clobber the destination with a RE-CREATED source's row —
    renames journal as absolute ops carrying the moved row."""
    import json as _json
    state = str(tmp_path / "cat.json")
    srv = RestCatalogServer(state_path=state).start()
    cat = RestCatalog(srv.url, str(tmp_path / "wh"), spark)
    cat.create_table("db.a", "k long")
    a_loc = srv.state.tables["db.a"]["location"]
    cat.rename_table("db.a", "db.b")
    cat.create_table("db.a", "k long")  # re-created under the old name
    a2_loc = srv.state.tables["db.a"]["location"]
    assert a2_loc != a_loc
    # simulate the compact() crash window: snapshot folded, journal NOT
    # truncated -> the next start replays the FULL journal on top
    with srv.state.lock:
        with open(state, "w") as f:
            _json.dump(srv.state.tables, f)
    srv._httpd.shutdown()
    srv._httpd.server_close()
    srv2 = RestCatalogServer(state_path=state).start()
    try:
        tables = srv2.state.tables
        assert tables["db.b"]["location"] == a_loc, \
            "rename replay clobbered the destination"
        assert tables["db.a"]["location"] == a2_loc
    finally:
        srv2.stop()


def test_rest_journal_newline_less_final_line_is_unacked(tmp_path, spark):
    """r11 advice #1: a crash can leave the final journal line as
    COMPLETE JSON without its trailing newline.  The ack (fsync) covers
    line+'\\n' in one write, so that tail is unacked — replay must drop
    and TRUNCATE it, or the next mutation is appended onto the same
    line, merging two ops (a later replay then wedges mid-journal or
    drops an acked op)."""
    import json as _json
    state = str(tmp_path / "cat.json")
    srv = RestCatalogServer(state_path=state).start()
    cat = RestCatalog(srv.url, str(tmp_path / "wh"), spark)
    cat.create_table("db.a", "k long")
    srv._httpd.shutdown()
    srv._httpd.server_close()  # crash: no compaction
    jp = state + ".journal"
    with open(jp, "a") as f:  # complete JSON, NO trailing newline
        f.write(_json.dumps({"op": "set", "name": "db.unacked",
                             "row": {"location": "/wh/db/unacked",
                                     "version": 1}}))
    srv2 = RestCatalogServer(state_path=state).start()
    cat2 = RestCatalog(srv2.url, str(tmp_path / "wh"), spark)
    # the newline-less op never acked: it must NOT be visible
    assert cat2.list_tables("") == ["db.a"]
    cat2.create_table("db.b", "k long")  # acked mutation post-replay
    srv2._httpd.shutdown()
    srv2._httpd.server_close()  # crash #2, again no compaction
    # replay #2 must neither wedge on a merged line nor lose db.b
    srv3 = RestCatalogServer(state_path=state).start()
    try:
        cat3 = RestCatalog(srv3.url, str(tmp_path / "wh"), spark)
        assert cat3.list_tables("") == ["db.a", "db.b"]
    finally:
        srv3.stop()


def test_rest_namespace_endpoints(tmp_path, spark):
    """r10: the spec's namespace surface — create/list/load properties/
    update properties/drop; implicit namespaces (derived from table
    names) list and load but refuse drop-with-tables; all of it
    journaled and crash-replayable."""
    from incubator_iceberg_spark.catalog_rest import (
        NamespaceAlreadyExistsError, NamespaceNotEmptyError,
        NoSuchNamespaceError)
    state = str(tmp_path / "cat.json")
    srv = RestCatalogServer(state_path=state).start()
    try:
        cat = RestCatalog(srv.url, str(tmp_path / "wh"), spark)
        cat.create_namespace("sales", {"owner": "etl"})
        with pytest.raises(NamespaceAlreadyExistsError):
            cat.create_namespace("sales")
        cat.create_table("db.t1", "k long")  # db = implicit namespace
        assert cat.list_namespaces() == ["db", "sales"]
        assert cat.load_namespace_properties("sales") == {"owner": "etl"}
        assert cat.load_namespace_properties("db") == {}  # implicit
        with pytest.raises(NoSuchNamespaceError):
            cat.load_namespace_properties("absent")
        cat.update_namespace_properties("sales",
                                        updates={"retention": "30d"},
                                        removals=["owner"])
        assert cat.load_namespace_properties("sales") == \
            {"retention": "30d"}
        # drop: non-empty refuses; explicit empty drops; absent False
        cat.create_table("sales.s1", "k long")
        with pytest.raises(NamespaceNotEmptyError):
            cat.drop_namespace("sales")
        cat.drop_table("sales.s1")
        assert cat.drop_namespace("sales")
        assert not cat.drop_namespace("sales")
        assert cat.list_namespaces() == ["db"]
        # journaled: crash (no compaction) replays namespace ops
        cat.create_namespace("crashy", {"a": "1"})
    finally:
        srv._httpd.shutdown()
        srv._httpd.server_close()
    srv2 = RestCatalogServer(state_path=state).start()
    try:
        cat2 = RestCatalog(srv2.url, str(tmp_path / "wh"), spark)
        assert cat2.load_namespace_properties("crashy") == {"a": "1"}
        assert "sales" not in cat2.list_namespaces()
    finally:
        srv2.stop()  # compacts {tables, namespaces} snapshot
    srv3 = RestCatalogServer(state_path=state).start()
    try:
        cat3 = RestCatalog(srv3.url, str(tmp_path / "wh"), spark)
        assert cat3.load_namespace_properties("crashy") == {"a": "1"}
    finally:
        srv3.stop()
