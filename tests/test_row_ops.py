"""Tier 3: DELETE/UPDATE/MERGE scenario matrix (mirrors TestMerge's ~40
scenarios, TestDelete, TestCopyOnWriteUpdate)."""

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark.row_ops import (
    MergeCardinalityError,
    WhenMatched,
    WhenNotMatched,
)
from incubator_iceberg_spark.schema import Schema


def _ingest(warehouse, name, df, **kw):
    t = warehouse.create_table(name, Schema.from_spark(df.schema), **kw)
    t.append(df)
    return t


def test_metadata_only_delete(warehouse, orders):
    t = _ingest(warehouse, "db.d1", orders, partition_by=["month(o_orderdate)"])
    res = t.delete_where("o_orderdate < TIMESTAMP '1996-01-01'")
    assert res["metadata_only"] is True
    assert res["rewritten_files"] == 0
    assert t.to_df().count() == orders.filter("o_orderdate >= TIMESTAMP '1996-01-01'").count()


def test_cow_delete(warehouse, orders):
    t = _ingest(warehouse, "db.d2", orders)
    res = t.delete_where("o_totalprice > 200000")
    assert res["rewritten_files"] > 0
    want = orders.filter("o_totalprice <= 200000").count()
    assert t.to_df().count() == want


def test_delete_everything(warehouse, orders):
    t = _ingest(warehouse, "db.d3", orders)
    t.delete_where("o_orderkey IS NOT NULL")
    assert t.to_df().count() == 0


def test_delete_nothing(warehouse, orders):
    t = _ingest(warehouse, "db.d4", orders)
    res = t.delete_where("o_orderkey = -1")
    assert t.to_df().count() == orders.count()


def test_update_with_expression(warehouse, orders):
    t = _ingest(warehouse, "db.u1", orders)
    t.update({"o_totalprice": "o_totalprice * 2"}, "o_orderstatus = 'O'")
    got = t.to_df().agg(F.sum("o_totalprice")).collect()[0][0]
    want = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice"))).agg(F.sum("o_totalprice")).collect()[0][0]
    assert abs(got - want) < 1e-6


def test_update_rhs_sees_pre_update_values(warehouse, orders):
    """SQL UPDATE semantics: all assignments read the OLD row."""
    t = _ingest(warehouse, "db.u2", orders)
    t.update({"o_totalprice": "o_totalprice + 1",
              "o_custkey": "CAST(o_totalprice AS BIGINT)"},
             "o_orderkey % 2 = 0")
    row = (t.to_df().filter("o_orderkey % 2 = 0")
           .select("o_custkey", "o_totalprice").first())
    # o_custkey must be floor(OLD price), i.e. == floor(new price - 1)
    assert row["o_custkey"] == int(row["o_totalprice"] - 1)


def test_merge_update_insert_delete_matrix(warehouse, orders):
    t = _ingest(warehouse, "db.m1", orders)
    n = orders.count()
    source = (orders.filter("o_orderkey % 10 = 0")
              .withColumn("o_totalprice", F.col("o_totalprice") + 5))
    new_rows = (orders.filter("o_orderkey % 10 = 1").limit(20)
                .withColumn("o_orderkey", F.col("o_orderkey") + 90000000))
    res = t.merge(source.unionByName(new_rows), on=["o_orderkey"],
                  when_matched=[WhenMatched.update_all()],
                  when_not_matched=[WhenNotMatched.insert_all()])
    assert t.to_df().count() == n + new_rows.count()


def test_merge_conditional_clauses(warehouse, orders):
    t = _ingest(warehouse, "db.m2", orders)
    src = orders.filter("o_orderkey % 20 = 0").select("o_orderkey", "o_totalprice")
    t.merge(src, on=["o_orderkey"],
            when_matched=[
                WhenMatched(condition="s.o_totalprice > 100000", delete=True),
                WhenMatched(update={"o_orderstatus": "'M'"}),
            ])
    deleted = orders.filter("o_orderkey % 20 = 0 AND o_totalprice > 100000").count()
    updated = orders.filter("o_orderkey % 20 = 0 AND o_totalprice <= 100000").count()
    assert t.to_df().count() == orders.count() - deleted
    assert t.to_df(filter="o_orderstatus = 'M'").count() == updated


def test_merge_not_matched_condition(warehouse, orders):
    t = _ingest(warehouse, "db.m3", orders.limit(0))
    src = orders.limit(100)
    t.merge(src, on=["o_orderkey"],
            when_not_matched=[WhenNotMatched(condition="s.o_totalprice > 100000")])
    want = src.filter("o_totalprice > 100000").count()
    assert t.to_df().count() == want


def test_merge_cardinality_violation_raises(warehouse, orders):
    t = _ingest(warehouse, "db.m4", orders)
    dup = orders.filter("o_orderkey % 100 = 0")
    with pytest.raises(MergeCardinalityError):
        t.merge(dup.unionByName(dup), on=["o_orderkey"],
                when_matched=[WhenMatched.update_all()])


def test_merge_sql_condition(warehouse, orders):
    t = _ingest(warehouse, "db.m5", orders)
    src = orders.filter("o_orderkey % 7 = 0").select(
        F.col("o_orderkey").alias("key"), F.lit("Z").alias("status"))
    t.merge(src, on="t.o_orderkey = s.key",
            when_matched=[WhenMatched(update={"o_orderstatus": "s.status"})])
    assert t.to_df(filter="o_orderstatus = 'Z'").count() == src.count()


def test_merge_untouched_files_not_rewritten(warehouse, orders):
    t = _ingest(warehouse, "db.m6", orders, partition_by=["month(o_orderdate)"])
    files_before = {p for p, _ in t.new_scan().plan_files()}
    one_month = orders.filter(
        "o_orderdate >= TIMESTAMP '1997-02-01' AND o_orderdate < TIMESTAMP '1997-03-01'")
    src = one_month.limit(5).withColumn("o_totalprice", F.lit(1.0))
    t.merge(src, on=["o_orderkey"], when_matched=[WhenMatched.update_all()])
    files_after = {p for p, _ in t.new_scan().plan_files()}
    untouched = files_before & files_after
    # only the touched month's file(s) were replaced
    assert len(files_before) - len(untouched) <= 2


def test_conflict_validation_on_concurrent_append(warehouse, orders, spark):
    """C3: a delete that raced a conflicting append must fail validation."""
    from incubator_iceberg_spark import row_ops, snapshots as SN, metadata as MD
    from incubator_iceberg_spark import expressions as X

    t = _ingest(warehouse, "db.c1", orders)
    # simulate: plan the delete against the current snapshot…
    base_snapshot = t.metadata.current_snapshot_id
    files = [p for p, _ in t.new_scan().plan_files()]
    # …then a concurrent append lands
    t2 = warehouse.load_table("db.c1")
    t2.append(orders.limit(10))
    # …the delete commit must now detect the conflicting append
    bound = X.bind(t.metadata.schema(), X.gt("o_totalprice", 0))
    with pytest.raises(MD.ValidationException):
        SN.overwrite_files(
            t.ops, [], set(files), operation="delete",
            base_snapshot_id=base_snapshot,
            conflict_detection_filter=lambda e: row_ops.entry_might_match(e, bound))


def test_merge_not_matched_by_source_delete(warehouse, orders):
    """Target rows without a source match are deleted (sync-to-source)."""
    from incubator_iceberg_spark.row_ops import WhenNotMatchedBySource
    t = _ingest(warehouse, "db.mbs1", orders)
    src = orders.filter("o_orderkey % 2 = 0")
    t.merge(src, on=["o_orderkey"],
            when_matched=[WhenMatched(update={"o_orderstatus": "'K'"})],
            when_not_matched_by_source=[WhenNotMatchedBySource(delete=True)])
    assert t.to_df().count() == src.count()
    assert t.to_df(filter="o_orderstatus = 'K'").count() == src.count()


def test_merge_not_matched_by_source_conditional_update(warehouse, orders):
    """Conditional by-source UPDATE touches only qualifying unmatched rows."""
    from incubator_iceberg_spark.row_ops import WhenNotMatchedBySource
    t = _ingest(warehouse, "db.mbs2", orders)
    src = orders.filter("o_orderkey % 2 = 0").select("o_orderkey")
    t.merge(src, on=["o_orderkey"],
            when_not_matched_by_source=[
                WhenNotMatchedBySource(condition="t.o_totalprice > 100000",
                                       update={"o_orderstatus": "'X'"})])
    want = orders.filter("o_orderkey % 2 != 0 AND o_totalprice > 100000").count()
    assert t.to_df().count() == orders.count()  # nothing deleted
    assert t.to_df(filter="o_orderstatus = 'X'").count() == want


def test_merge_evolve_schema_adds_source_columns(warehouse, orders):
    """evolve_schema=True union-by-names source-only columns before merging."""
    t = _ingest(warehouse, "db.mevo", orders)
    src = (orders.filter("o_orderkey % 5 = 0")
           .withColumn("o_channel", F.lit("web")))
    new_rows = (orders.filter("o_orderkey % 5 = 1").limit(10)
                .withColumn("o_orderkey", F.col("o_orderkey") + 70000000)
                .withColumn("o_channel", F.lit("api")))
    t.merge(src.unionByName(new_rows), on=["o_orderkey"],
            when_matched=[WhenMatched.update_all()],
            when_not_matched=[WhenNotMatched.insert_all()],
            evolve_schema=True)
    df = t.to_df()
    assert "o_channel" in df.columns
    assert df.filter("o_channel = 'web'").count() == src.count()
    assert df.filter("o_channel = 'api'").count() == 10
    assert df.filter("o_channel IS NULL").count() == \
        orders.filter("o_orderkey % 5 != 0").count()


def test_count_rows_metadata_pushdown(warehouse, orders, spark):
    """count_rows serves strict-matching files from manifest stats
    (zero scanned files for a partition-aligned predicate), scans only
    partial matches, and disables the metadata path under delete
    debt."""
    from incubator_iceberg_spark.schema import Schema

    t = warehouse.create_table("db.cnt", Schema.from_spark(orders.schema),
                               partition_by=["month(o_orderdate)"])
    t.append(orders)

    # unfiltered: pure metadata
    r = t.count_rows()
    assert r["count"] == orders.count() and r["scanned_files"] == 0
    assert r["metadata_only_files"] > 0

    # month-aligned predicate: every candidate file strictly matches
    r = t.count_rows("o_orderdate >= TIMESTAMP '1997-06-01'")
    assert r["count"] == orders.filter(
        "o_orderdate >= TIMESTAMP '1997-06-01'").count()
    assert r["scanned_files"] == 0 and r["metadata_only_files"] > 0

    # mid-month predicate: boundary files scan, full months fold in
    cond = "o_orderdate >= TIMESTAMP '1997-06-15'"
    r = t.count_rows(cond)
    assert r["count"] == orders.filter(cond).count()
    assert r["scanned_files"] > 0

    # impossible predicate: nothing planned at all
    r = t.count_rows("o_orderkey < -1")
    assert r == {"count": 0, "metadata_only_files": 0, "scanned_files": 0}

    # MoR delete debt: bounds may lie about hidden rows -> affected
    # files must scan, and the count stays exact
    t.delete_where("o_custkey % 7 = 0", mode="merge-on-read")
    want = orders.filter("NOT (o_custkey % 7 = 0)").count()
    r = t.count_rows()
    assert r["count"] == want
    assert r["metadata_only_files"] == 0 and r["scanned_files"] > 0


def test_min_max_metadata_pushdown(warehouse, orders, spark):
    from incubator_iceberg_spark.schema import Schema

    t = warehouse.create_table("db.mm", Schema.from_spark(orders.schema),
                               partition_by=["month(o_orderdate)"])
    t.append(orders)

    r = t.min_max("o_custkey")
    want = orders.agg({"o_custkey": "min"}).collect()[0][0], \
        orders.agg({"o_custkey": "max"}).collect()[0][0]
    assert (r["min"], r["max"]) == want and r["scanned_files"] == 0

    cond = "o_orderdate >= TIMESTAMP '1997-06-01'"
    r = t.min_max("o_totalprice", cond)
    sub = orders.filter(cond)
    assert r["min"] == sub.agg({"o_totalprice": "min"}).collect()[0][0]
    assert r["max"] == sub.agg({"o_totalprice": "max"}).collect()[0][0]
    assert r["scanned_files"] == 0

    # mid-month boundary: partial files scan, result stays exact
    cond = "o_orderdate >= TIMESTAMP '1997-06-15'"
    sub = orders.filter(cond)
    r = t.min_max("o_totalprice", cond)
    assert r["min"] == sub.agg({"o_totalprice": "min"}).collect()[0][0]
    assert r["max"] == sub.agg({"o_totalprice": "max"}).collect()[0][0]
    assert r["scanned_files"] > 0

    # strings refuse (truncated prefix bounds are not attained values)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unsupported"):
        t.min_max("o_orderpriority")

    # delete debt: the deleted extremum must disappear from the answer
    mx = t.min_max("o_totalprice")["max"]
    t.delete_where(f"o_totalprice = {mx}", mode="merge-on-read")
    r = t.min_max("o_totalprice")
    want = t.to_df().agg({"o_totalprice": "max"}).collect()[0][0]
    assert r["max"] == want and r["max"] != mx
