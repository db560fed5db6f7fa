"""Tier 3: SQL façade — DELETE/UPDATE/MERGE/CALL/SELECT statements routed
to the engine (IcebergSqlExtensions.g4 grammar surface, sans JVM)."""

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark import sqlfacade as SQL
from incubator_iceberg_spark.schema import Schema


def _ingest(warehouse, name, df, **kw):
    t = warehouse.create_table(name, Schema.from_spark(df.schema), **kw)
    t.append(df)
    return t


def test_sql_delete(warehouse, orders, spark):
    _ingest(warehouse, "db.sd", orders)
    res = SQL.execute(warehouse, spark, "DELETE FROM db.sd WHERE o_totalprice > 200000")
    assert res["deleted_rows"] == orders.filter("o_totalprice > 200000").count()
    t = warehouse.load_table("db.sd")
    assert t.to_df().count() == orders.filter("o_totalprice <= 200000").count()


def test_sql_update(warehouse, orders, spark):
    _ingest(warehouse, "db.su", orders)
    SQL.execute(warehouse, spark,
                "UPDATE db.su SET o_orderstatus = 'Z', o_totalprice = o_totalprice * 2 "
                "WHERE o_orderkey % 10 = 0")
    t = warehouse.load_table("db.su")
    assert t.to_df(filter="o_orderstatus = 'Z'").count() == \
        orders.filter("o_orderkey % 10 = 0").count()


def test_sql_merge_full_grammar(warehouse, orders, spark):
    _ingest(warehouse, "db.sm", orders)
    (orders.filter("o_orderkey % 20 = 0")
     .withColumn("o_totalprice", F.col("o_totalprice") + 1)
     .createOrReplaceTempView("merge_src"))
    SQL.execute(warehouse, spark, """
        MERGE INTO db.sm AS tgt USING merge_src AS src
        ON tgt.o_orderkey = src.o_orderkey
        WHEN MATCHED AND src.o_totalprice > 150000 THEN DELETE
        WHEN MATCHED THEN UPDATE SET o_orderstatus = 'M'
        WHEN NOT MATCHED THEN INSERT *
    """)
    t = warehouse.load_table("db.sm")
    deleted = orders.filter("o_orderkey % 20 = 0 AND o_totalprice + 1 > 150000").count()
    updated = orders.filter("o_orderkey % 20 = 0 AND o_totalprice + 1 <= 150000").count()
    assert t.to_df().count() == orders.count() - deleted
    assert t.to_df(filter="o_orderstatus = 'M'").count() == updated


def test_sql_merge_subquery_source(warehouse, orders, spark):
    _ingest(warehouse, "db.sm2", orders.limit(100))
    orders.createOrReplaceTempView("orders_raw")
    SQL.execute(warehouse, spark, """
        MERGE INTO db.sm2 t
        USING (SELECT o_orderkey, 'Q' AS st FROM orders_raw LIMIT 40) s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_orderstatus = s.st
    """)
    t = warehouse.load_table("db.sm2")
    assert t.to_df(filter="o_orderstatus = 'Q'").count() > 0


def test_sql_select_passthrough(warehouse, orders, spark):
    _ingest(warehouse, "db.ss", orders)
    df = SQL.execute(warehouse, spark,
                     "SELECT o_orderstatus, count(*) AS n FROM db.ss GROUP BY 1")
    got = {r["o_orderstatus"]: r["n"] for r in df.collect()}
    want = {r["o_orderstatus"]: r["count"] for r in
            orders.groupBy("o_orderstatus").count().collect()}
    assert got == want


def test_sql_call(warehouse, orders, spark):
    t = _ingest(warehouse, "db.sc", orders.limit(50))
    s1 = t.metadata.current_snapshot_id
    t.append(orders.limit(10))
    SQL.execute(warehouse, spark,
                f"CALL system.rollback_to_snapshot('db.sc', {s1})")
    assert warehouse.load_table("db.sc").to_df().count() == 50


def test_sql_unsupported(warehouse, spark):
    with pytest.raises(ValueError):
        SQL.execute(warehouse, spark, "VACUUM db.x")


def test_sql_merge_not_matched_by_source(warehouse, orders, spark):
    _ingest(warehouse, "db.smbs", orders)
    orders.filter("o_orderkey % 3 = 0").createOrReplaceTempView("mbs_src")
    SQL.execute(warehouse, spark, """
        MERGE INTO db.smbs AS tgt USING mbs_src AS src
        ON tgt.o_orderkey = src.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_orderstatus = 'S'
        WHEN NOT MATCHED BY SOURCE AND tgt.o_totalprice > 150000 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET o_orderstatus = 'N'
    """)
    t = warehouse.load_table("db.smbs")
    matched = orders.filter("o_orderkey % 3 = 0").count()
    deleted = orders.filter("o_orderkey % 3 != 0 AND o_totalprice > 150000").count()
    rest = orders.filter("o_orderkey % 3 != 0 AND o_totalprice <= 150000").count()
    assert t.to_df().count() == orders.count() - deleted
    assert t.to_df(filter="o_orderstatus = 'S'").count() == matched
    assert t.to_df(filter="o_orderstatus = 'N'").count() == rest


def test_sql_select_views_prune_via_datasource(warehouse, orders, spark):
    """Facade SELECT registers data-source views: WHERE clauses reach
    metadata pruning (pushFilters), and results match a plain filter."""
    _ingest(warehouse, "db.selds", orders, partition_by=["month(o_orderdate)"])
    got = SQL.execute(warehouse, spark, """
        SELECT count(*) AS n FROM db.selds
        WHERE o_orderdate >= TIMESTAMP '1997-06-01'
    """).collect()[0]["n"]
    assert got == orders.filter("o_orderdate >= TIMESTAMP '1997-06-01'").count()


def test_sql_select_with_v2_deletes_falls_back(warehouse, orders, spark):
    """Tables carrying v2 delete files must NOT use the datasource view
    (it skips delete application) — results stay delete-aware."""
    t = _ingest(warehouse, "db.seldel", orders)
    victims = orders.filter("o_orderkey % 10 = 0").select("o_orderkey")
    t.add_equality_deletes(victims, ["o_orderkey"])
    got = SQL.execute(warehouse, spark,
                      "SELECT count(*) AS n FROM db.seldel").collect()[0]["n"]
    assert got == orders.filter("o_orderkey % 10 != 0").count()


def test_sql_time_travel_and_branch_syntax(warehouse, orders, spark):
    t = _ingest(warehouse, "db.tt1", orders.filter("o_orderkey % 2 = 0"))
    s1 = t.metadata.current_snapshot_id
    t.create_branch("audit")
    t.append(orders.filter("o_orderkey % 2 != 0"), branch="audit")
    t.append(orders.limit(7).withColumn("o_orderkey", F.col("o_orderkey") + 8_000_000))
    half = orders.filter("o_orderkey % 2 = 0").count()
    # VERSION AS OF snapshot id
    n = SQL.execute(warehouse, spark,
                    f"SELECT count(*) AS n FROM db.tt1 VERSION AS OF {s1}"
                    ).collect()[0]["n"]
    assert n == half
    # VERSION AS OF branch name
    n = SQL.execute(warehouse, spark,
                    "SELECT count(*) AS n FROM db.tt1 VERSION AS OF 'audit'"
                    ).collect()[0]["n"]
    assert n == orders.count()
    # current main includes the extra 7
    n = SQL.execute(warehouse, spark,
                    "SELECT count(*) AS n FROM db.tt1").collect()[0]["n"]
    assert n == half + 7


def test_sql_timestamp_as_of(warehouse, orders, spark):
    import time as _time
    from datetime import datetime, timezone
    t = _ingest(warehouse, "db.tt2", orders.limit(100))
    _time.sleep(0.05)
    mark = datetime.now(timezone.utc).isoformat()
    _time.sleep(0.05)
    t.append(orders.limit(50).withColumn("o_orderkey", F.col("o_orderkey") + 7_000_000))
    n = SQL.execute(warehouse, spark,
                    f"SELECT count(*) AS n FROM db.tt2 TIMESTAMP AS OF '{mark}'"
                    ).collect()[0]["n"]
    assert n == 100


def test_call_ref_procedures(warehouse, orders, spark):
    t = _ingest(warehouse, "db.refproc", orders.filter("o_orderkey % 2 = 0"))
    SQL.execute(warehouse, spark, "CALL system.create_branch('db.refproc', 'dev')")
    t.refresh().append(orders.filter("o_orderkey % 2 != 0"), branch="dev")
    SQL.execute(warehouse, spark, "CALL system.fast_forward('db.refproc', 'main', 'dev')")
    assert warehouse.load_table("db.refproc").to_df().count() == orders.count()
    SQL.execute(warehouse, spark, "CALL system.create_tag('db.refproc', 'v1')")
    SQL.execute(warehouse, spark, "CALL system.drop_ref('db.refproc', 'v1')")
    assert "v1" not in warehouse.load_table("db.refproc").metadata.refs


def test_sql_insert_into_select(warehouse, orders, spark):
    _ingest(warehouse, "db.inssrc", orders)
    t = warehouse.create_table("db.insdst", Schema.from_spark(orders.schema))
    SQL.execute(warehouse, spark,
                "INSERT INTO db.insdst SELECT * FROM db.inssrc "
                "WHERE o_totalprice > 150000")
    t.refresh()
    assert t.to_df().count() == orders.filter("o_totalprice > 150000").count()
    # a second INSERT accumulates
    SQL.execute(warehouse, spark,
                "INSERT INTO db.insdst SELECT * FROM db.inssrc "
                "WHERE o_totalprice <= 150000")
    t.refresh()
    assert t.to_df().count() == orders.count()


def test_sql_insert_values(warehouse, spark):
    from incubator_iceberg_spark.schema import (Schema as Sch, NestedField,
                                                LongType, StringType)
    t = warehouse.create_table("db.insval", Sch([
        NestedField(1, "id", LongType(), required=False),
        NestedField(2, "name", StringType(), required=False)]))
    SQL.execute(warehouse, spark,
                "INSERT INTO db.insval VALUES (1, 'a'), (2, 'b')")
    t.refresh()
    assert sorted((r["id"], r["name"]) for r in t.to_df().collect()) == \
        [(1, "a"), (2, "b")]


def test_sql_ctas_partitioned_and_drop(warehouse, orders, spark):
    _ingest(warehouse, "db.ctassrc", orders)
    t = SQL.execute(warehouse, spark, """
        CREATE TABLE db.ctasdst PARTITIONED BY (month(o_orderdate)) AS
        SELECT * FROM db.ctassrc WHERE o_orderkey % 2 = 0
    """)
    assert t.metadata.spec().is_partitioned
    want = orders.filter("o_orderkey % 2 = 0").count()
    assert t.to_df().count() == want
    pruned = len(t.new_scan().filter(
        "o_orderdate >= TIMESTAMP '1997-06-01'").plan_files())
    assert pruned < len(t.new_scan().plan_files())
    assert SQL.execute(warehouse, spark, "DROP TABLE db.ctasdst PURGE") is True
    import pytest as _pytest
    from incubator_iceberg_spark.table import NoSuchTableError
    with _pytest.raises(NoSuchTableError):
        warehouse.load_table("db.ctasdst")


def test_sql_insert_overwrite_dynamic(warehouse, orders, spark):
    t = _ingest(warehouse, "db.insow", orders,
                partition_by=["month(o_orderdate)"])
    _ingest(warehouse, "db.insowsrc", orders.filter("o_orderkey % 5 = 0"))
    SQL.execute(warehouse, spark,
                "INSERT OVERWRITE db.insow SELECT * FROM db.insowsrc")
    t.refresh()
    # dynamic overwrite: months present in the source are replaced, other
    # months keep their original rows
    src = orders.filter("o_orderkey % 5 = 0")
    src_months = {r[0] for r in
                  src.selectExpr("date_trunc('month', o_orderdate)").collect()}
    kept = orders.filter(
        ~F.date_trunc("month", "o_orderdate").isin(list(src_months)))
    assert t.to_df().count() == src.count() + kept.count()


def test_sql_alter_partition_fields_and_sort(warehouse, orders, spark):
    t = _ingest(warehouse, "db.alt1", orders)
    SQL.execute(warehouse, spark,
                "ALTER TABLE db.alt1 ADD PARTITION FIELD month(o_orderdate)")
    t.refresh()
    assert [str(f.transform) for f in t.metadata.spec().fields] == ["month"]
    # reference-grammar bucket argument order: bucket(4, col)
    SQL.execute(warehouse, spark,
                "ALTER TABLE db.alt1 ADD PARTITION FIELD bucket(4, o_custkey)")
    t.refresh()
    assert len(t.metadata.spec().fields) == 2
    SQL.execute(warehouse, spark,
                "ALTER TABLE db.alt1 DROP PARTITION FIELD bucket(4, o_custkey)")
    t.refresh()
    assert [str(f.transform) for f in t.metadata.spec().fields] == ["month"]
    # new data written under the evolved spec prunes; old files still scan
    t.append(orders.limit(100))
    assert t.to_df().count() == orders.count() + 100
    SQL.execute(warehouse, spark,
                "ALTER TABLE db.alt1 WRITE ORDERED BY (o_totalprice DESC)")
    t.refresh()
    so = t.metadata.sort_order()
    assert so.fields and so.fields[0].direction == "desc"


def test_sql_alter_columns_and_properties(warehouse, orders, spark):
    t = _ingest(warehouse, "db.alt2", orders.limit(50))
    SQL.execute(warehouse, spark,
                "ALTER TABLE db.alt2 ADD COLUMN note string")
    SQL.execute(warehouse, spark,
                "ALTER TABLE db.alt2 RENAME COLUMN o_orderpriority TO prio")
    SQL.execute(warehouse, spark,
                "ALTER TABLE db.alt2 ALTER COLUMN o_custkey TYPE bigint")
    t.refresh()
    names = [f.name for f in t.schema().fields]
    assert "note" in names and "prio" in names and "o_orderpriority" not in names
    df = t.to_df()
    assert df.schema["o_custkey"].dataType.typeName() == "long"
    assert df.filter("prio IS NOT NULL").count() == 50  # old data readable
    SQL.execute(warehouse, spark,
                "ALTER TABLE db.alt2 SET TBLPROPERTIES ('read.plan-mode'='auto', 'x'='1')")
    t.refresh()
    assert t.metadata.properties.get("x") == "1"
    SQL.execute(warehouse, spark, "ALTER TABLE db.alt2 DROP COLUMN note")
    t.refresh()
    assert "note" not in [f.name for f in t.schema().fields]


def test_sql_truncate(warehouse, orders, spark):
    t = _ingest(warehouse, "db.trunc", orders.limit(80))
    SQL.execute(warehouse, spark, "TRUNCATE TABLE db.trunc")
    t.refresh()
    assert t.to_df().count() == 0
    # table still writable after truncate
    t.append(orders.limit(5))
    assert t.to_df().count() == 5


def test_sql_alter_replace_partition_field(warehouse, orders, spark):
    t = _ingest(warehouse, "db.alt3", orders,
                partition_by=["month(o_orderdate)"])
    SQL.execute(warehouse, spark,
                "ALTER TABLE db.alt3 REPLACE PARTITION FIELD "
                "month(o_orderdate) WITH day(o_orderdate)")
    t.refresh()
    assert [str(f.transform) for f in t.metadata.spec().fields] == ["day"]
    # old month-partitioned files still readable (mixed-spec planning)
    t.append(orders.limit(40))
    assert t.to_df().count() == orders.count() + 40


def test_select_count_star_pushdown(warehouse, spark, orders):
    """Bare SELECT COUNT(*) [WHERE p] routes through
    Table.count_rows (manifest-stat aggregate pushdown) and must agree
    with the full SQL path, including under MoR delete debt."""
    from incubator_iceberg_spark import sqlfacade as SQL
    from incubator_iceberg_spark.schema import Schema

    t = warehouse.create_table("db.cntf", Schema.from_spark(orders.schema),
                               partition_by=["month(o_orderdate)"])
    t.append(orders)
    n = SQL.execute(warehouse, spark,
                    "SELECT count(*) AS n FROM db.cntf").collect()[0]["n"]
    assert n == orders.count()
    cond = "o_orderdate >= TIMESTAMP '1997-06-01'"
    n = SQL.execute(
        warehouse, spark,
        f"SELECT count(*) FROM db.cntf WHERE {cond}").collect()[0][0]
    assert n == orders.filter(cond).count()
    t.delete_where("o_custkey % 7 = 0", mode="merge-on-read")
    n = SQL.execute(warehouse, spark,
                    "SELECT count(*) AS n FROM db.cntf").collect()[0]["n"]
    assert n == orders.filter("NOT (o_custkey % 7 = 0)").count()
    # anything fancier falls through to the SQL path untouched
    df = SQL.execute(warehouse, spark,
                     "SELECT count(*) AS n, max(o_custkey) AS m FROM db.cntf")
    assert df.collect()[0]["n"] == orders.filter(
        "NOT (o_custkey % 7 = 0)").count()


# -- storage-partitioned join routing (r5 verdict item 9) -------------------

def _bucketed_pair(warehouse, spark):
    fact = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
    dim = spark.range(0, 500).select(
        F.col("id").alias("k"),
        F.concat(F.lit("d"), F.col("id")).alias("name"))
    _ingest(warehouse, "db.spjf", fact, partition_by=["bucket(8, k)"])
    _ingest(warehouse, "db.spjd", dim, partition_by=["bucket(8, k)"])
    return fact, dim


def test_sql_bucket_join_routes_without_shuffle(warehouse, spark):
    """A facade equi-join over two co-bucketed engine tables plans as
    bucket-local broadcast joins — NO shuffle exchange — and matches the
    plain-join answer including WHERE/GROUP BY over qualified refs."""
    fact, dim = _bucketed_pair(warehouse, spark)
    df = SQL.execute(warehouse, spark, """
        SELECT f.v AS v, COUNT(*) AS n
        FROM db.spjf f JOIN db.spjd d ON f.k = d.k
        WHERE d.name != 'd3'
        GROUP BY f.v""")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    # join inputs never shuffle; only the GROUP BY aggregates exchange
    assert plan.count("Exchange hashpartitioning") <= 2
    want = (fact.join(dim.filter("name != 'd3'"), "k")
            .groupBy("v").count())
    got = {r["v"]: r["n"] for r in df.collect()}
    assert got == {r["v"]: r["count"] for r in want.collect()}


def test_sql_bucket_join_same_named_b_column_suffix(warehouse, spark):
    fact, dim = _bucketed_pair(warehouse, spark)
    df = SQL.execute(warehouse, spark, """
        SELECT f.k AS k, d.k AS k2, d.name AS name
        FROM db.spjf f JOIN db.spjd d ON f.k = d.k
        ORDER BY f.k LIMIT 3""")
    rows = df.collect()
    assert [r["k"] for r in rows] == [r["k2"] for r in rows] == [0, 0, 0] \
        or [r["k"] for r in rows] == [r["k2"] for r in rows]


def test_sql_join_falls_back_when_not_cobucketed(warehouse, spark):
    """Unbucketed sides must take the generic rewrite path — same
    answer, just without the structural routing."""
    fact = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit("x").alias("name"))
    _ingest(warehouse, "db.nbf", fact)
    _ingest(warehouse, "db.nbd", dim, partition_by=["bucket(8, k)"])
    df = SQL.execute(warehouse, spark, """
        SELECT f.v AS v, COUNT(*) AS n
        FROM db.nbf f JOIN db.nbd d ON f.k = d.k
        GROUP BY f.v""")
    want = fact.join(dim, "k").groupBy("v").count()
    assert {r["v"]: r["n"] for r in df.collect()} == \
        {r["v"]: r["count"] for r in want.collect()}


def test_sql_metadata_tables_and_changes(warehouse, orders, spark):
    """`SELECT ... FROM db.t.<metadata_table>` and `db.t.changes` — the
    reference family's Spark inspection syntax through the facade.  The
    base-table name inside the longer dotted name must not be corrupted
    by the db.t rewrite."""
    from incubator_iceberg_spark import sqlfacade as SQL
    from incubator_iceberg_spark.schema import Schema

    t = warehouse.create_table("db.meta_sql", Schema.from_spark(orders.schema))
    t.append(orders)
    t.delete_where("o_totalprice > 250000")

    n_snaps = SQL.execute(
        warehouse, spark,
        "SELECT count(*) AS n FROM db.meta_sql.snapshots").collect()[0]["n"]
    assert n_snaps == 2

    paths = [r["file_path"] for r in SQL.execute(
        warehouse, spark,
        "SELECT file_path FROM db.meta_sql.files").collect()]
    assert paths and all(p.endswith(".parquet") for p in paths)

    # joinable with the base table in ONE statement: both names rewrite
    got = SQL.execute(
        warehouse, spark,
        "SELECT count(*) AS n FROM db.meta_sql "
        "WHERE o_totalprice <= 250000").collect()[0]["n"]
    want = orders.filter("o_totalprice <= 250000").count()
    assert got == want

    ch = {r["_change_type"]: r["n"] for r in SQL.execute(
        warehouse, spark,
        "SELECT _change_type, count(*) AS n FROM db.meta_sql.changes "
        "GROUP BY _change_type").collect()}
    n_orders = orders.count()
    n_del = orders.filter("o_totalprice > 250000").count()
    assert ch == {"insert": n_orders, "delete": n_del}, ch


def test_sql_column_named_like_metadata_table_wins(warehouse, spark):
    """A table COLUMN named `files` (or any metadata kind / `changes`)
    must resolve as a column ref, never as the inspection surface:
    `SELECT db.t.files FROM db.t` stays a qualified column after the
    rewrite (ADVICE r6: the interception previously hijacked ANY dotted
    name ending in a metadata kind anywhere in the statement)."""
    df = spark.range(0, 10).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("files"),
        (F.col("id") * 3).alias("changes"))
    t = warehouse.create_table("db.colclash", Schema.from_spark(df.schema))
    t.append(df)

    got = SQL.execute(
        warehouse, spark,
        "SELECT db.colclash.files AS files, db.colclash.changes AS ch "
        "FROM db.colclash ORDER BY k LIMIT 3").collect()
    assert [(r["files"], r["ch"]) for r in got] == [(0, 0), (2, 3), (4, 6)]

    # unqualified refs keep working too
    s = SQL.execute(
        warehouse, spark,
        "SELECT sum(files) AS sf FROM db.colclash").collect()[0]["sf"]
    assert s == sum(i * 2 for i in range(10))

    # and a table WITHOUT the clash still serves the inspection surface
    t2 = warehouse.create_table("db.noclash", Schema.from_spark(
        spark.range(0, 5).select(F.col("id").alias("k")).schema))
    t2.append(spark.range(0, 5).select(F.col("id").alias("k")))
    n = SQL.execute(
        warehouse, spark,
        "SELECT count(*) AS n FROM db.noclash.files").collect()[0]["n"]
    assert n >= 1


def test_describe_table_and_view(warehouse, spark):
    from incubator_iceberg_spark import sqlfacade as SQLF
    t = warehouse.create_table(
        "db.desc_t", "k long, v string",
        partition_by=["bucket(4, k)"],
        properties={"write.format.default": "parquet"})
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    rows = {r.col_name: r for r in SQLF.execute(
        warehouse, spark, "DESCRIBE db.desc_t").collect()}
    assert rows["k"].data_type == "long" and rows["v"].data_type == "string"
    ext = {r.col_name: r.data_type for r in SQLF.execute(
        warehouse, spark, "DESCRIBE EXTENDED db.desc_t").collect()}
    assert "location" in ext and "current_snapshot_id" in ext
    assert "bucket" in ext.get("partition_spec", "")
    assert ext.get("prop:write.format.default") == "parquet"

    SQLF.execute(warehouse, spark,
                 "CREATE VIEW db.desc_v AS SELECT k, COUNT(*) AS n "
                 "FROM db.desc_t GROUP BY k")
    vrows = {r.col_name: r.data_type for r in SQLF.execute(
        warehouse, spark, "DESC VIEW db.desc_v").collect()}
    assert "k" in vrows and "n" in vrows
    vext = {r.col_name: r.data_type for r in SQLF.execute(
        warehouse, spark, "DESCRIBE EXTENDED db.desc_v").collect()}
    assert vext.get("current_version") == "1"
    assert "GROUP BY" in vext.get("sql", "")


def test_create_table_column_list(warehouse, spark):
    """Column-list CREATE TABLE (r10): types (incl. decimal / array),
    NOT NULL, PARTITIONED BY transforms, identifier-fields comment
    dialect and TBLPROPERTIES all parse into a real engine table."""
    SQL.execute(warehouse, spark, """CREATE TABLE db.cc (
      k long NOT NULL,
      v string,
      price decimal(12,2),
      ts timestamp,
      tags array<string>)
    USING iiws
    PARTITIONED BY (month(ts), bucket(4, k))
    -- identifier fields: (k)
    TBLPROPERTIES ('commit.retry.num-retries' = '3')""")
    t = warehouse.load_table("db.cc")
    assert [(f.name, str(f.type), f.required) for f in t.schema().fields] \
        == [("k", "long", True), ("v", "string", False),
            ("price", "decimal(12,2)", False), ("ts", "timestamp", False),
            ("tags", "list<string>", False)]
    assert [str(f.transform) for f in t.metadata.spec().fields] == \
        ["month", "bucket[4]"]
    assert t.schema().identifier_field_ids == (1,)
    assert t.metadata.properties["commit.retry.num-retries"] == "3"
    # bad column defs still raise with a clear message
    with pytest.raises(ValueError, match="unknown type string"):
        SQL.execute(warehouse, spark, "CREATE TABLE db.bad (k wat)")


def test_show_create_table_round_trips(warehouse, orders, spark):
    """SHOW CREATE TABLE output is EXECUTABLE: re-running the rendered
    DDL under a new name recreates the schema, spec, identifier fields
    and properties exactly (r9 verdict #6)."""
    warehouse.create_table(
        "db.rt1", Schema.from_spark(orders.schema),
        partition_by=["month(o_orderdate)", ("o_custkey", "bucket[4]")],
        identifier_fields=["o_orderkey"],
        properties={"write.format.default": "parquet"})
    ddl = SQL.execute(warehouse, spark,
                      "SHOW CREATE TABLE db.rt1").first()[0]
    SQL.execute(warehouse, spark, ddl.replace("db.rt1", "db.rt2"))
    a = warehouse.load_table("db.rt1")
    b = warehouse.load_table("db.rt2")
    assert [(f.name, str(f.type), f.required) for f in a.schema().fields] \
        == [(f.name, str(f.type), f.required) for f in b.schema().fields]
    assert str(a.metadata.spec()) == str(b.metadata.spec())
    assert a.schema().identifier_field_ids == b.schema().identifier_field_ids
    assert b.metadata.properties["write.format.default"] == "parquet"
    # the round-tripped table is writable and readable
    b.append(orders.limit(7))
    assert b.to_df().count() == 7


def test_namespace_ddl_through_facade(tmp_path, spark):
    """r10: CREATE/DROP NAMESPACE + SHOW NAMESPACES route to catalogs
    with a namespace surface (REST); implicit-namespace catalogs serve
    SHOW NAMESPACES from table/view names and reject namespace DDL."""
    from incubator_iceberg_spark.catalog_rest import (RestCatalog,
                                                      RestCatalogServer)
    srv = RestCatalogServer().start()
    try:
        cat = RestCatalog(srv.url, str(tmp_path / "wh"), spark)
        SQL.execute(cat, spark,
                    "CREATE NAMESPACE sales WITH PROPERTIES "
                    "('owner' = 'etl')")
        SQL.execute(cat, spark, "CREATE NAMESPACE IF NOT EXISTS sales")
        with pytest.raises(Exception):
            SQL.execute(cat, spark, "CREATE NAMESPACE sales")
        cat.create_table("db.t", "k long")
        got = sorted(r["namespace"] for r in SQL.execute(
            cat, spark, "SHOW NAMESPACES").collect())
        assert got == ["db", "sales"]
        assert cat.load_namespace_properties("sales") == {"owner": "etl"}
        assert SQL.execute(cat, spark, "DROP NAMESPACE sales") is True
        assert SQL.execute(cat, spark,
                           "DROP NAMESPACE IF EXISTS sales") is False
    finally:
        srv.stop()


def test_show_namespaces_on_fs_catalog(warehouse, spark):
    warehouse.create_table("db.n1", "k long")
    warehouse.create_table("db2.n2", "k long")
    got = sorted(r["namespace"] for r in SQL.execute(
        warehouse, spark, "SHOW NAMESPACES").collect())
    assert got == ["db", "db2"]
    # FS namespaces are directories: create/drop work, properties don't
    SQL.execute(warehouse, spark, "CREATE NAMESPACE extra")
    assert "extra" in [r["namespace"] for r in SQL.execute(
        warehouse, spark, "SHOW NAMESPACES").collect()]
    assert SQL.execute(warehouse, spark, "DROP NAMESPACE extra") is True
    with pytest.raises(ValueError, match="not empty"):
        SQL.execute(warehouse, spark, "DROP NAMESPACE db")
    with pytest.raises(ValueError, match="namespace properties"):
        SQL.execute(warehouse, spark,
                    "CREATE NAMESPACE nope WITH PROPERTIES ('a' = 'b')")


def test_create_namespace_if_not_exists_only_swallows_exists(tmp_path,
                                                             spark):
    """r11 advice #4: IF NOT EXISTS must swallow ONLY already-exists.
    Transport failures / server 5xx (RestError) used to be absorbed by
    a blanket except, returning True as if the namespace were created."""
    from incubator_iceberg_spark.catalog_rest import (
        NamespaceAlreadyExistsError, RestError)

    class FlakyCatalog:
        def __init__(self, exc):
            self.exc = exc

        def create_namespace(self, name, properties=None):
            raise self.exc

    # server/transport errors propagate even under IF NOT EXISTS
    with pytest.raises(RestError):
        SQL.execute(FlakyCatalog(RestError(503, "backend down")), spark,
                    "CREATE NAMESPACE IF NOT EXISTS ns1")
    with pytest.raises(ConnectionError):
        SQL.execute(FlakyCatalog(ConnectionError("refused")), spark,
                    "CREATE NAMESPACE IF NOT EXISTS ns1")
    # already-exists is swallowed under IF NOT EXISTS, raised without
    ok = SQL.execute(FlakyCatalog(NamespaceAlreadyExistsError("ns1")),
                     spark, "CREATE NAMESPACE IF NOT EXISTS ns1")
    assert ok is True
    with pytest.raises(NamespaceAlreadyExistsError):
        SQL.execute(FlakyCatalog(NamespaceAlreadyExistsError("ns1")),
                    spark, "CREATE NAMESPACE ns1")


def test_set_and_drop_identifier_fields_ddl(warehouse, orders, spark):
    """IcebergSqlExtensions.g4:74-75 SET/DROP IDENTIFIER FIELDS: the
    identifier set changes via DDL on an EXISTING table (a new schema
    version, fields unchanged), upsert immediately keys on it, and
    float/double identifiers reject."""
    t = warehouse.create_table("db.idf", Schema.from_spark(orders.schema))
    assert not t.schema().identifier_field_ids
    SQL.execute(warehouse, spark,
                "ALTER TABLE db.idf SET IDENTIFIER FIELDS o_orderkey")
    t = warehouse.load_table("db.idf")
    sch = t.schema()
    assert [sch.field_path(i) for i in sch.identifier_field_ids] == \
        ["o_orderkey"]
    # upsert keys on the new identifier set with no explicit `on`
    t.append(orders.limit(10))
    upd = t.to_df().limit(3).withColumn("o_orderpriority", F.lit("UPDATED"))
    t.upsert(upd)
    assert t.to_df().count() == 10
    assert t.to_df().filter("o_orderpriority = 'UPDATED'").count() == 3

    # widen, then drop one
    SQL.execute(
        warehouse, spark,
        "ALTER TABLE db.idf SET IDENTIFIER FIELDS (o_orderkey, o_custkey)")
    sch = warehouse.load_table("db.idf").schema()
    assert len(sch.identifier_field_ids) == 2
    SQL.execute(warehouse, spark,
                "ALTER TABLE db.idf DROP IDENTIFIER FIELDS o_custkey")
    sch = warehouse.load_table("db.idf").schema()
    assert [sch.field_path(i) for i in sch.identifier_field_ids] == \
        ["o_orderkey"]
    # guards
    with pytest.raises(ValueError, match="float|double"):
        SQL.execute(warehouse, spark,
                    "ALTER TABLE db.idf SET IDENTIFIER FIELDS o_totalprice")
    with pytest.raises(ValueError, match="not an identifier"):
        SQL.execute(warehouse, spark,
                    "ALTER TABLE db.idf DROP IDENTIFIER FIELDS o_orderpriority")
    with pytest.raises(ValueError, match="no such column"):
        SQL.execute(warehouse, spark,
                    "ALTER TABLE db.idf SET IDENTIFIER FIELDS nope")


def test_write_distribution_and_ordering_ddl(warehouse, orders, spark):
    """g4:83-88 write-spec DDL maps onto O1's distribution modes +
    sort orders: ORDERED BY -> range+sort, LOCALLY ORDERED BY ->
    none+sort, DISTRIBUTED BY PARTITION [LOCALLY ORDERED BY] -> hash,
    UNORDERED -> none + empty order."""
    warehouse.create_table("db.wrd", Schema.from_spark(orders.schema),
                           partition_by=["month(o_orderdate)"])

    def snap():
        t = warehouse.load_table("db.wrd")
        so = t.metadata.sort_order()
        sch = t.schema()
        return (t.metadata.properties.get("write.distribution-mode"),
                [(sch.field_path(f.source_id), f.direction)
                 for f in so.fields] if so else [])

    SQL.execute(warehouse, spark,
                "ALTER TABLE db.wrd WRITE ORDERED BY o_orderdate")
    assert snap() == ("range", [("o_orderdate", "asc")])
    SQL.execute(
        warehouse, spark,
        "ALTER TABLE db.wrd WRITE LOCALLY ORDERED BY o_totalprice DESC")
    assert snap() == ("none", [("o_totalprice", "desc")])
    SQL.execute(
        warehouse, spark,
        "ALTER TABLE db.wrd WRITE DISTRIBUTED BY PARTITION "
        "LOCALLY ORDERED BY o_custkey")
    assert snap() == ("hash", [("o_custkey", "asc")])
    SQL.execute(warehouse, spark, "ALTER TABLE db.wrd WRITE UNORDERED")
    assert snap() == ("none", [])
    # writes run under each mode (hash again, then append)
    SQL.execute(warehouse, spark,
                "ALTER TABLE db.wrd WRITE DISTRIBUTED BY PARTITION")
    t = warehouse.load_table("db.wrd")
    t.append(orders.limit(20))
    assert t.to_df().count() == 20


def test_unset_tblproperties_ddl(warehouse, spark):
    warehouse.create_table("db.up", Schema.from_spark(
        spark.range(1).schema), properties={"a.b": "1", "c.d": "2"})
    SQL.execute(warehouse, spark,
                "ALTER TABLE db.up UNSET TBLPROPERTIES ('a.b')")
    t = warehouse.load_table("db.up")
    assert "a.b" not in t.metadata.properties
    assert t.metadata.properties.get("c.d") == "2"
    # IF EXISTS tolerates absent keys
    SQL.execute(warehouse, spark,
                "ALTER TABLE db.up UNSET TBLPROPERTIES IF EXISTS ('zz')")


def test_filtered_statement_does_not_poison_later_scans(warehouse, spark,
                                                        sf_dir):
    """Regression: Spark's PythonDataSourceV2 caches the planned read
    (readInfo) on the provider instance with NO cache key — pushFilters
    overwrites it, and a filterless query never calls pushFilters.  A
    shared/cached DataFrame handle therefore replays the LAST filtered
    plan's partition list under an unfiltered query (a 100000-cutoff
    COUNT answered an unfiltered view read).  Each facade statement must
    get a fresh load(), so interleaved filtered/unfiltered statements
    stay independent.  The literal column defeats the metadata
    COUNT(*) rewrite, forcing a real scan."""
    src = (spark.read.parquet(f"{sf_dir}/orders.parquet")
           .select("o_orderkey", "o_totalprice"))
    warehouse.create_table(
        "db.poison", Schema.from_spark(src.schema)).append(src)
    total = src.count()
    cutoff = 100000
    expect_f = src.filter(F.col("o_totalprice") > cutoff).count()

    n0 = SQL.execute(warehouse, spark,
                     "SELECT COUNT(*) AS n, 0 AS v FROM db.poison"
                     ).first().n
    nf = SQL.execute(warehouse, spark,
                     f"SELECT COUNT(*) AS n, 1 AS v FROM db.poison "
                     f"WHERE o_totalprice > {cutoff}").first().n
    n1 = SQL.execute(warehouse, spark,
                     "SELECT COUNT(*) AS n, 0 AS v FROM db.poison"
                     ).first().n
    assert (n0, nf, n1) == (total, expect_f, total)


def test_multi_reference_statement_branches_independent(warehouse, spark,
                                                        sf_dir):
    """Regression (pre-existing): branches of ONE statement referencing
    the same table share the temp view's single PythonDataSourceV2, whose
    keyless readInfo cache lets a filtered branch's partition list answer
    the unfiltered branch (filtered+unfiltered UNION ALL returned the
    filtered count for BOTH sides).  Multi-referenced tables must resolve
    through branch-safe scans."""
    src = (spark.read.parquet(f"{sf_dir}/orders.parquet")
           .select("o_orderkey", "o_totalprice"))
    warehouse.create_table(
        "db.twice", Schema.from_spark(src.schema)).append(src)
    total = src.count()
    expect_f = src.filter(F.col("o_totalprice") > 100000).count()

    rows = SQL.execute(warehouse, spark, """
        SELECT 'f' AS k, COUNT(*) AS n FROM db.twice
        WHERE o_totalprice > 100000
        UNION ALL
        SELECT 'a' AS k, COUNT(*) AS n FROM db.twice
    """).collect()
    got = {r.k: r.n for r in rows}
    assert got == {"f": expect_f, "a": total}

    n_join = SQL.execute(warehouse, spark, """
        SELECT COUNT(*) AS n
        FROM db.twice a JOIN db.twice b ON a.o_orderkey = b.o_orderkey
        WHERE a.o_totalprice > 100000
    """).first().n
    assert n_join == expect_f
