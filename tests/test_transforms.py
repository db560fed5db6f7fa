"""Tier 1+2: transforms — Python/Spark parity (the invariant the whole
pruning design rests on) + projection edge cases (mirrors TestBucketing,
TestTruncate, TestDates/TestTimestamps projection tests)."""

from datetime import date, datetime
from decimal import Decimal

import pytest

from incubator_iceberg_spark import expressions as X
from incubator_iceberg_spark import schema as S
from incubator_iceberg_spark import transforms as T
from incubator_iceberg_spark.murmur3 import spark_hash


def test_truncate_ints_floor_semantics():
    tr = T.truncate(10)
    assert tr.apply(1) == 0
    assert tr.apply(19) == 10
    assert tr.apply(-1) == -10  # floor toward -inf (Truncate.java negatives)
    assert tr.apply(-10) == -10
    assert tr.apply(-11) == -20


def test_truncate_string_and_decimal():
    assert T.truncate(3).apply("iceberg") == "ice"
    assert T.truncate(3).apply("ab") == "ab"
    assert T.truncate(50).apply(Decimal("10.65")) == Decimal("10.50")


def test_time_ordinals():
    assert T.year().apply(date(1970, 1, 1)) == 0
    assert T.year().apply(date(1969, 12, 31)) == -1
    assert T.month().apply(date(1996, 3, 13)) == 314
    assert T.month().apply(date(1969, 12, 31)) == -1
    assert T.day().apply(date(1970, 1, 2)) == 1
    assert T.day().apply(date(1969, 12, 31)) == -1
    assert T.hour().apply(datetime(1970, 1, 1, 5, 59)) == 5
    assert T.hour().apply(datetime(1969, 12, 31, 23, 30)) == -1


def test_bucket_deterministic_and_in_range():
    tr = T.bucket(16)
    vals = [tr.apply(v, S.LongType()) for v in range(1000)]
    assert all(0 <= v < 16 for v in vals)
    assert len(set(vals)) == 16


def test_month_projection_bounds():
    tr = T.month()
    # LT '1996-02-01' must include January 1996 (ordinal 312)
    p = tr.project("m", X.Predicate(X.LT, X.Reference("x"), (datetime(1996, 2, 1),)))
    assert p.op == X.LT_EQ and p.literal == 312
    # GT one µs before Feb still projects to January's ordinal (inclusive)
    p = tr.project("m", X.Predicate(X.GT, X.Reference("x"), (datetime(1996, 1, 31, 23, 59, 59),)))
    assert p.op == X.GT_EQ and p.literal == 312
    # GT exactly at the Feb boundary projects to February (313)
    p = tr.project("m", X.Predicate(X.GT_EQ, X.Reference("x"), (datetime(1996, 2, 1),)))
    assert p.op == X.GT_EQ and p.literal == 313


def test_truncate_projection_lt_boundary():
    tr = T.truncate(10)
    p = tr.project("t", X.Predicate(X.LT, X.Reference("x"), (100,)))
    # rows < 100 live in buckets <= trunc(99) = 90
    assert p.op == X.LT_EQ and p.literal == 90
    p = tr.project("t", X.Predicate(X.LT_EQ, X.Reference("x"), (100,)))
    assert p.op == X.LT_EQ and p.literal == 100


def test_bucket_projection_only_eq():
    tr = T.bucket(8)
    assert tr.project("b", X.Predicate(X.LT, X.Reference("x"), (5,))) is None
    p = tr.project("b", X.Predicate(X.EQ, X.Reference("x"), (5,)))
    assert p.op == X.EQ


def test_parse_transform_strings():
    assert isinstance(T.parse_transform("bucket[16]"), T.BucketTransform)
    assert isinstance(T.parse_transform("truncate(4)"), T.TruncateTransform)
    assert isinstance(T.parse_transform("month"), T.MonthTransform)
    # unknown names PARSE (forward-compat read path, r10); spec-creating
    # surfaces reject them (see test_unknown_transform_*)
    assert isinstance(T.parse_transform("wat[3]"), T.UnknownTransform)


def test_unknown_transform_semantics():
    """Mirror of api/src/test/.../transforms/TestUnknownTransform.java:
    unknown transforms round-trip, never project (no pruning), bind to
    string, and refuse to compute values."""
    from incubator_iceberg_spark import schema as S
    tr = T.parse_transform("future_op[16]")
    assert isinstance(tr, T.UnknownTransform)
    assert str(tr) == "future_op[16]"  # metadata JSON round-trips verbatim
    assert tr == T.parse_transform("future_op[16]")
    assert isinstance(tr.result_type(S.LongType()), S.StringType)
    assert tr.can_transform(S.LongType())
    assert tr.project("p", X.Predicate(X.EQ, X.Reference("x"), (5,))) is None
    assert tr.project_strict(
        "p", X.Predicate(X.EQ, X.Reference("x"), (5,))) is None
    with pytest.raises(NotImplementedError, match="readable"):
        tr.spark_expr(None)
    with pytest.raises(NotImplementedError):
        tr.apply(7)


def test_unknown_transform_rejected_by_spec_build():
    """Spec CREATION (DDL / ALTER / spec evolution) still rejects what
    the engine cannot compute — only metadata reads tolerate it."""
    from incubator_iceberg_spark.partitioning import PartitionSpec
    from incubator_iceberg_spark import schema as S
    sch = S.Schema([S.NestedField(1, "k", S.LongType(), False)])
    with pytest.raises(ValueError, match="unknown transform"):
        PartitionSpec.build(sch, [("k", "future_op[16]")])


@pytest.mark.spark
def test_spark_python_hash_parity(spark):
    """THE invariant: Python murmur3 == Spark F.hash for every bucketable
    type (write path and pruning path must agree)."""
    from pyspark.sql import functions as F

    rows = [
        (0, 0, "", 0.0, date(1970, 1, 1), datetime(1970, 1, 1)),
        (-1, -1, "a", -1.5, date(1969, 12, 31), datetime(2026, 8, 13, 1, 2, 3, 456789)),
        (2**31 - 1, 2**62, "héllo wörld", 3.14159, date(2100, 1, 1),
         datetime(1996, 3, 13, 10, 30)),
    ]
    df = spark.createDataFrame(rows, "i int, l long, s string, d double, dt date, ts timestamp")
    got = df.select(*[F.hash(c).alias(c) for c in df.columns]).collect()
    types = {"i": S.IntegerType(), "l": S.LongType(), "s": S.StringType(),
             "d": S.DoubleType(), "dt": S.DateType(), "ts": S.TimestampType()}
    for spark_row, src in zip(got, rows):
        for col, val in zip(df.columns, src):
            assert spark_hash(val, types[col]) == spark_row[col], (col, val)


@pytest.mark.spark
def test_spark_transform_exprs_match_python(spark):
    from pyspark.sql import functions as F

    rows = [(datetime(1996, 3, 13, 14, 30),), (datetime(1969, 12, 31, 23, 59),),
            (datetime(2001, 1, 1, 0, 0),)]
    df = spark.createDataFrame(rows, "ts timestamp")
    for tr in [T.year(), T.month(), T.day(), T.hour()]:
        got = [r[0] for r in df.select(tr.spark_expr(F.col("ts"))).collect()]
        want = [tr.apply(r[0]) for r in rows]
        assert got == want, str(tr)


def test_zorder_interleave_monotone_property(spark):
    """Property: with one dimension fixed, the z-value is monotone in the
    other (bit interleave preserves per-dimension order)."""
    from hypothesis import given, settings, strategies as st
    import pyspark.sql.functions as F

    bits = 8
    maxv = (1 << bits) - 1

    def z(u1, u2):
        out = 0
        for i in range(bits):
            out |= ((u1 >> i) & 1) << (2 * i)
            out |= ((u2 >> i) & 1) << (2 * i + 1)
        return out

    @given(st.integers(0, maxv), st.integers(0, maxv), st.integers(0, maxv))
    @settings(max_examples=200, deadline=None)
    def prop(a, b, fixed):
        lo, hi = min(a, b), max(a, b)
        assert z(lo, fixed) <= z(hi, fixed)
        assert z(fixed, lo) <= z(fixed, hi)

    prop()
