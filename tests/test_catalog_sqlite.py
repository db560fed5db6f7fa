"""SQLite catalog (JdbcCatalog analog): pointer-in-DB commit protocol,
CAS conflicts, metadata-only rename, cross-handle visibility."""

import threading

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark import metadata as MD
from incubator_iceberg_spark.catalog_sqlite import SqliteCatalog
from incubator_iceberg_spark.schema import Schema
from incubator_iceberg_spark.table import NoSuchTableError, TableAlreadyExistsError


@pytest.fixture()
def scat(tmp_path, spark):
    return SqliteCatalog(str(tmp_path / "cat.db"), str(tmp_path / "wh"), spark)


def test_create_load_drop_list(scat, orders):
    t = scat.create_table("db.a", Schema.from_spark(orders.schema))
    t.append(orders.limit(100))
    assert scat.load_table("db.a").to_df().count() == 100
    with pytest.raises(TableAlreadyExistsError):
        scat.create_table("db.a", Schema.from_spark(orders.schema))
    scat.create_table("db2.b", Schema.from_spark(orders.schema))
    assert scat.list_tables() == ["db.a", "db2.b"]
    assert scat.list_tables("db") == ["db.a"]
    assert scat.drop_table("db2.b") is True
    assert scat.drop_table("db2.b") is False
    with pytest.raises(NoSuchTableError):
        scat.load_table("db2.b")


def test_pointer_is_authoritative_not_fs_probe(scat, orders, spark):
    """A metadata file written without a successful CAS must be invisible
    (the FS catalog would probe-forward onto it; the DB pointer must not)."""
    import json
    t = scat.create_table("db.p", Schema.from_spark(orders.schema))
    t.append(orders.limit(10))
    v = t.ops.current_version()
    # simulate a crashed writer: orphan metadata file one version ahead
    with open(t.ops.metadata_path(v + 1), "w") as f:
        json.dump(t.metadata.to_json(), f)
    t2 = scat.load_table("db.p")
    assert t2.ops.current_version() == v
    assert t2.to_df().count() == 10


def test_concurrent_appends_retry_through_cas(scat, orders, spark):
    t = scat.create_table("db.c", Schema.from_spark(orders.schema))
    t.append(orders.limit(1))
    errs = []

    def worker(k):
        try:
            h = scat.load_table("db.c", spark=spark)
            h.append(orders.limit(20).withColumn(
                "o_orderkey", F.col("o_orderkey") + 1000000 * k))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(k,)) for k in range(4)]
    [th.start() for th in threads]
    [th.join() for th in threads]
    assert not errs
    assert scat.load_table("db.c").to_df().count() == 1 + 4 * 20


def test_rename_keeps_location_and_data(scat, orders):
    t = scat.create_table("db.old", Schema.from_spark(orders.schema))
    t.append(orders.limit(50))
    loc = t.location
    scat.rename_table("db.old", "db.new")
    t2 = scat.load_table("db.new")
    assert t2.location == loc
    assert t2.to_df().count() == 50
    with pytest.raises(NoSuchTableError):
        scat.load_table("db.old")
    # further commits through the renamed handle work
    t2.append(orders.limit(10).withColumn("o_orderkey", F.col("o_orderkey") + 999999))
    assert scat.load_table("db.new").to_df().count() == 60


def test_sqlite_catalog_views(tmp_path, spark, sf_dir):
    """Views work on the pointer-store catalog too: metadata on the
    filesystem, pointer DB stays tables-only; facade routing included."""
    from incubator_iceberg_spark import sqlfacade
    from incubator_iceberg_spark.catalog_sqlite import SqliteCatalog
    from incubator_iceberg_spark.schema import Schema
    from incubator_iceberg_spark.table import TableAlreadyExistsError
    import pytest as _pytest

    cat = SqliteCatalog(str(tmp_path / "cat.db"),
                        str(tmp_path / "wh"), spark=spark)
    src = (spark.read.parquet(f"{sf_dir}/orders.parquet")
           .select("o_orderkey", "o_totalprice"))
    t = cat.create_table("db.so", Schema.from_spark(src.schema))
    t.append(src)
    sqlfacade.execute(cat, spark,
                      "CREATE VIEW db.sv AS SELECT o_orderkey FROM db.so "
                      "WHERE o_totalprice > 100000")
    n = sqlfacade.execute(cat, spark,
                          "SELECT COUNT(*) AS n FROM db.sv").collect()[0].n
    assert n == src.filter("o_totalprice > 100000").count()
    assert cat.list_views() == ["db.sv"]
    assert cat.list_tables() == ["db.so"]  # pointer DB untouched by views
    with _pytest.raises(TableAlreadyExistsError):
        cat.create_table("db.sv", Schema.from_spark(src.schema))
    assert cat.drop_view("db.sv") and cat.list_views() == []
