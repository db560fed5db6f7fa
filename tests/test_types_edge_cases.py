"""Tier 2: type-system edge cases — nested types (F3), NaN/null-heavy
stats (F2), decimals, local arrow reads, property-based transform checks
(mirrors RandomData round-trip testing, RandomData.java:51-94)."""

import math
from datetime import date, datetime, timedelta
from decimal import Decimal

import pytest
from hypothesis import given, settings, strategies as st

from incubator_iceberg_spark import expressions as X
from incubator_iceberg_spark import schema as S
from incubator_iceberg_spark import transforms as T
from incubator_iceberg_spark.murmur3 import spark_hash
from incubator_iceberg_spark.schema import Schema


def test_nested_struct_list_map_roundtrip(warehouse, spark):
    rows = [
        (1, {"col1": "a", "col2": 1.5, "col3": 10}, ["x", "y"], {"k": "v"}),
        (2, {"col1": None, "col2": None, "col3": None}, [], {}),
        (3, None, None, None),
    ]
    df = spark.createDataFrame(
        rows, "id long, nested struct<col1:string,col2:double,col3:long>, "
              "tags array<string>, attrs map<string,string>")
    t = warehouse.create_table("db.nested", Schema.from_spark(df.schema))
    t.append(df)
    got = t.to_df().orderBy("id").collect()
    want = df.orderBy("id").collect()
    assert got == want
    # nested field projection works
    assert t.to_df().select("nested.col1").count() == 3
    # pruning on the top-level id still works with nested cols present
    assert len(t.new_scan().filter("id > 100").plan_files()) == 0


def test_nan_null_heavy_stats(warehouse, spark):
    rows = [(1, float("nan")), (2, None), (3, 1.5), (4, float("nan")), (5, None)]
    df = spark.createDataFrame(rows, "id long, v double")
    t = warehouse.create_table("db.nan", Schema.from_spark(df.schema))
    t.append(df)
    assert t.to_df().count() == 5
    assert t.to_df(filter=X.is_nan("v")).count() == 2
    # reference semantics (NaNUtil): null is NOT NaN → not_nan(null) matches
    assert t.to_df(filter=X.not_nan("v")).count() == 3
    assert t.to_df(filter=X.is_null("v")).count() == 2
    # Spark/DuckDB ordering: NaN > any value → NaN rows match v > 1.0;
    # NaN-polluted footer bounds are dropped so pruning stays conservative
    assert t.to_df(filter="v > 1.0").count() == 3


def test_all_null_column_pruning(warehouse, spark):
    df = spark.createDataFrame([(i, None) for i in range(10)], "id long, s string")
    t = warehouse.create_table("db.allnull", Schema.from_spark(df.schema))
    t.append(df)
    # inclusive metrics: all-null file can't match a value predicate
    assert t.new_scan().filter("s = 'x'").plan_files() == []
    assert t.to_df(filter=X.is_null("s")).count() == 10


def test_decimal_roundtrip(warehouse, spark):
    rows = [(1, Decimal("12345.67890")), (2, Decimal("-0.00001")), (3, None)]
    df = spark.createDataFrame(rows, "id long, d decimal(20,5)")
    t = warehouse.create_table("db.dec", Schema.from_spark(df.schema))
    t.append(df)
    got = {r["id"]: r["d"] for r in t.to_df().collect()}
    assert got[1] == Decimal("12345.67890")
    assert got[2] == Decimal("-0.00001")
    assert t.to_df(filter="d > 0").count() == 1


def test_to_arrow_local_read(warehouse, orders):
    t = warehouse.create_table("db.arrow", Schema.from_spark(orders.schema))
    t.append(orders)
    tbl = t.to_arrow()
    assert tbl.num_rows == orders.count()
    filtered = t.to_arrow(filter="o_totalprice > 200000")
    want = orders.filter("o_totalprice > 200000").count()
    assert filtered.num_rows == want


def test_string_bounds_truncation_correct(warehouse, spark):
    """MetricsModes truncate(16): long strings truncate in manifests but the
    upper bound must stay >= every value (increment semantics)."""
    long_a = "a" * 40
    long_z = "z" * 40
    df = spark.createDataFrame([(1, long_a), (2, long_z)],
                               "id long, s string").coalesce(1)
    t = warehouse.create_table("db.trunc16", Schema.from_spark(df.schema))
    t.append(df)
    entry = t.new_scan().plan_entries_local()[0]
    lo, hi = entry["lower_bounds"]["s"], entry["upper_bounds"]["s"]
    assert len(lo) <= 16 and len(hi) <= 16
    assert lo <= long_a and hi >= long_z
    # pruning with the truncated bounds still finds matching rows
    assert t.to_df(filter=f"s = '{long_z}'").count() == 1


# -- property-based (hypothesis) --------------------------------------------

@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_truncate_long_invariants(v):
    tr = T.truncate(10)
    out = tr.apply(v)
    if out is not None and abs(v) < 2**63 - 10:
        assert out <= v < out + 10
        assert out % 10 == 0


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_hash_deterministic_strings(s):
    assert spark_hash(s, S.StringType()) == spark_hash(s, S.StringType())
    b = T.bucket(16).apply(s, S.StringType())
    assert 0 <= b < 16


@settings(max_examples=200, deadline=None)
@given(st.datetimes(min_value=datetime(1901, 1, 1), max_value=datetime(2200, 1, 1)))
def test_time_transform_ordering_preserved(ts):
    """month/day/hour are monotonic: t1 <= t2 ⇒ T(t1) <= T(t2)."""
    other = ts + timedelta(hours=7, minutes=13)
    for tr in (T.year(), T.month(), T.day(), T.hour()):
        assert tr.apply(ts) <= tr.apply(other)


@settings(max_examples=100, deadline=None)
@given(st.datetimes(min_value=datetime(1950, 1, 1), max_value=datetime(2100, 1, 1)),
       st.datetimes(min_value=datetime(1950, 1, 1), max_value=datetime(2100, 1, 1)))
def test_month_projection_soundness(data_ts, lit_ts):
    """Inclusive projection soundness: if the ROW matches the predicate,
    its PARTITION must match the projected predicate (never prune a
    matching row's file)."""
    tr = T.month()
    part = tr.apply(data_ts)
    for op, matches in ((X.LT, data_ts < lit_ts), (X.LT_EQ, data_ts <= lit_ts),
                        (X.GT, data_ts > lit_ts), (X.GT_EQ, data_ts >= lit_ts),
                        (X.EQ, data_ts == lit_ts)):
        proj = tr.project("m", X.Predicate(op, X.Reference("x"), (lit_ts,)))
        if proj is None or not matches:
            continue
        from incubator_iceberg_spark import py_eval as PE
        assert PE.eval_partition_value(proj, {"m": part}), \
            f"unsound projection: {op} lit={lit_ts} data={data_ts} part={part}"


def test_nan_counts_enable_metadata_pruning(warehouse, spark):
    """With write.metrics.nan-counts=true, is_nan predicates prune files
    that provably contain no NaNs."""
    t = warehouse.create_table(
        "db.nanstats", "id long, v double",
        properties={"write.metrics.nan-counts": "true"})
    clean = spark.createDataFrame([(i, float(i)) for i in range(10)],
                                  "id long, v double").coalesce(1)
    dirty = spark.createDataFrame([(100, float("nan")), (101, 1.0)],
                                  "id long, v double").coalesce(1)
    t.append(clean)
    t.append(dirty)
    entries = t.new_scan().plan_entries_local()
    nc = {tuple(sorted((e.get("nan_counts") or {}).items())) for e in entries}
    assert (("v", 0),) in nc and (("v", 1),) in nc
    # pruning: only the dirty file is scanned for is_nan
    pruned = t.new_scan().filter(X_is_nan()).plan_files()
    assert len(pruned) == 1
    assert t.to_df(filter=X_is_nan()).count() == 1


def X_is_nan():
    return X.is_nan("v")


@given(st.text(min_size=0, max_size=48), st.integers(min_value=1, max_value=20))
@settings(max_examples=300, deadline=None)
def test_truncated_bounds_still_bound(s, length):
    """truncate(N) parity property: a truncated lower bound is <= every
    value it covers and the incremented upper bound is >= it — required
    for pruning soundness (UnicodeUtil.truncateStringMin/Max analog)."""
    from incubator_iceberg_spark.manifests import truncate_lower, truncate_upper
    lo = truncate_lower(s, length)
    assert lo <= s
    up = truncate_upper(s, length)
    if up is not None:
        assert up >= s
    else:
        # increment impossible only when every truncated char is U+10FFFF
        assert all(ord(c) >= 0x10FFFF for c in s[:length])


@given(st.binary(min_size=0, max_size=48), st.integers(min_value=1, max_value=20))
@settings(max_examples=300, deadline=None)
def test_truncated_binary_bounds_still_bound(b, length):
    from incubator_iceberg_spark.manifests import truncate_lower, truncate_upper
    lo = truncate_lower(b, length)
    assert lo <= b
    up = truncate_upper(b, length)
    if up is not None:
        assert up >= b
    else:
        assert all(x == 0xFF for x in b[:length])


def test_list_column_roundtrips_every_read_path(warehouse, spark):
    """array<T> columns (e.g. SQ8 codes) through all four read paths:
    engine scan, to_arrow, the python DataSource, and the avro format —
    including field-ID projection across a rename."""
    from incubator_iceberg_spark import sources
    from incubator_iceberg_spark.schema import Schema

    df = spark.createDataFrame([(1, [1, 2, 3]), (2, None), (3, [])],
                               "id long, codes array<int>")
    t = warehouse.create_table("db.listcol", Schema.from_spark(df.schema))
    t.append(df)
    want = {1: [1, 2, 3], 2: None, 3: []}

    assert {r["id"]: r["codes"] for r in t.to_df().collect()} == want
    at = t.to_arrow()
    assert {i: c for i, c in zip(at.column("id").to_pylist(),
                                 at.column("codes").to_pylist())} == want
    sources.register(spark)
    got = spark.read.format("iiws").option("path", t.location).load()
    assert {r["id"]: r["codes"] for r in got.collect()} == want

    t.update_schema().rename_column("codes", "codes2").commit()
    assert {r["id"]: r["codes2"] for r in t.to_df().collect()} == want

    ta = warehouse.create_table(
        "db.listcol_avro", Schema.from_spark(df.schema),
        properties={"write.format.default": "avro"})
    ta.append(df)
    assert {r["id"]: r["codes"] for r in ta.to_df().collect()} == want


def test_decimal_bounds_decoded_and_prune(warehouse, spark):
    """Spark writes decimals as FIXED_LEN_BYTE_ARRAY whose footer stats
    pyarrow cannot cast (ArrowNotImplementedError) — footer_stats used
    to crash the whole append (found by the types-roundtrip fuzz).  The
    unscaled integer is recovered from min_raw/max_raw, so decimal
    columns keep file-level pruning."""
    df1 = spark.createDataFrame([(1, Decimal("10.25")), (2, Decimal("19.50"))],
                                "id long, d decimal(12,2)")
    df2 = spark.createDataFrame([(3, Decimal("100.75")), (4, Decimal("250.00"))],
                                "id long, d decimal(12,2)")
    t = warehouse.create_table("db.decprune", Schema.from_spark(df1.schema))
    t.append(df1.coalesce(1))
    t.append(df2.coalesce(1))
    assert len(t.new_scan().plan_files()) == 2
    pruned = t.new_scan().filter("d > 99").plan_files()
    assert len(pruned) == 1, "decimal bounds did not prune"
    assert t.to_df(filter="d > 99").count() == 2
