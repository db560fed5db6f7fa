"""Tier 1: pure-Python unit tests for the expression algebra (mirrors the
reference's TestEvaluator / TestExpressionBinding / RewriteNot tests)."""

from datetime import date, datetime

import pytest

from incubator_iceberg_spark import expressions as X
from incubator_iceberg_spark import schema as S

SCHEMA = S.Schema([
    S.NestedField(1, "id", S.IntegerType(), required=True),
    S.NestedField(2, "data", S.StringType()),
    S.NestedField(3, "ratio", S.DoubleType()),
    S.NestedField(4, "d", S.DateType()),
    S.NestedField(5, "ts", S.TimestampType()),
])


def test_rewrite_not_pushes_down():
    e = X.not_(X.and_(X.eq("id", 1), X.gt("ratio", 0.5)))
    r = X.rewrite_not(e)
    assert isinstance(r, X.Or)
    assert r.left.op == X.NOT_EQ
    assert r.right.op == X.LT_EQ


def test_double_not_cancels():
    e = X.not_(X.not_(X.eq("id", 5)))
    assert X.rewrite_not(e).op == X.EQ


def test_bind_resolves_field_ids():
    b = X.bind(SCHEMA, X.eq("id", 3))
    assert b.term.field_id == 1
    assert b.literal == 3


def test_bind_case_insensitive():
    b = X.bind(SCHEMA, X.eq("ID", 3), case_sensitive=False)
    assert b.term.field_id == 1
    with pytest.raises(X.BindError):
        X.bind(SCHEMA, X.eq("ID", 3), case_sensitive=True)


def test_bind_missing_column_raises():
    with pytest.raises(X.BindError):
        X.bind(SCHEMA, X.eq("nope", 1))


def test_literal_coercion_date_string():
    b = X.bind(SCHEMA, X.gt_eq("d", "1996-01-01"))
    assert b.literal == date(1996, 1, 1)


def test_literal_coercion_timestamp_string():
    b = X.bind(SCHEMA, X.lt("ts", "1996-01-01 10:30:00"))
    assert b.literal == datetime(1996, 1, 1, 10, 30)


def test_int_overflow_folds():
    # literal above int32 max: id < huge → always true
    assert isinstance(X.bind(SCHEMA, X.lt("id", 2**40)), X.AlwaysTrue)
    assert isinstance(X.bind(SCHEMA, X.gt("id", 2**40)), X.AlwaysFalse)
    assert isinstance(X.bind(SCHEMA, X.gt("id", -2**40)), X.AlwaysTrue)


def test_is_null_on_required_folds_false():
    assert isinstance(X.bind(SCHEMA, X.is_null("id")), X.AlwaysFalse)
    assert isinstance(X.bind(SCHEMA, X.not_null("id")), X.AlwaysTrue)


def test_in_degenerate_cases():
    assert isinstance(X.in_("id", []), X.AlwaysFalse)
    assert X.in_("id", [7]).op == X.EQ
    assert isinstance(X.not_in("id", []), X.AlwaysTrue)


def test_is_nan_requires_float():
    with pytest.raises(X.BindError):
        X.bind(SCHEMA, X.is_nan("id"))
    assert X.bind(SCHEMA, X.is_nan("ratio")).op == X.IS_NAN


def test_null_literal_comparison_folds_false():
    assert isinstance(X.bind(SCHEMA, X.eq("id", None)), X.AlwaysFalse)


def test_negation_table_involution():
    for op, neg in X.NEGATIONS.items():
        assert X.NEGATIONS[neg] == op


def test_parse_predicate_roundtrip():
    from incubator_iceberg_spark.scan import parse_predicate

    e = parse_predicate(
        "l_shipdate >= TIMESTAMP '1996-01-01' AND (l_discount > 0.05 OR l_tax <= 0.02)")
    assert isinstance(e, X.And)
    e2 = parse_predicate("id IN (1, 2, 3) AND data LIKE 'pre%'")
    assert e2.right.op == X.STARTS_WITH
    e3 = parse_predicate("x BETWEEN 1 AND 5")
    assert isinstance(e3, X.And)
    e4 = parse_predicate("data IS NOT NULL")
    assert e4.op == X.NOT_NULL
