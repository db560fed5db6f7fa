"""Expression algebra: the engine's predicate IR (P1-P5 in SURVEY.md §2.2).

Re-expresses the reference's expression model
(api/.../expressions/Expression.java:28-60, Expressions.java:37-293,
Binder.java:35-93, RewriteNot.java) in Python.  One expression tree
compiles three ways:

- ``to_column(expr)``        → ``pyspark.sql.Column`` row filter (P5); Spark
                               pushes it to Parquet row groups natively.
- ``evaluators.inclusive_metrics_filter`` → Column over the manifest-entry
                               DataFrame (file skipping, P6).
- ``transforms.project_*``   → predicate over partition columns (P10).

Null semantics follow SQL three-valued logic on the row path (Spark) and
"might match" semantics on the metadata path.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import date, datetime
from decimal import Decimal
from typing import Any, Optional, Sequence

from incubator_iceberg_spark import schema as S

# -- operations --------------------------------------------------------------

TRUE_ = "true"
FALSE_ = "false"
IS_NULL = "is_null"
NOT_NULL = "not_null"
IS_NAN = "is_nan"
NOT_NAN = "not_nan"
LT = "lt"
LT_EQ = "lt_eq"
GT = "gt"
GT_EQ = "gt_eq"
EQ = "eq"
NOT_EQ = "not_eq"
IN = "in"
NOT_IN = "not_in"
STARTS_WITH = "starts_with"
NOT_STARTS_WITH = "not_starts_with"
AND = "and"
OR = "or"
NOT = "not"

# negation table (api/.../expressions/Expression.java:62-106)
NEGATIONS = {
    IS_NULL: NOT_NULL, NOT_NULL: IS_NULL,
    IS_NAN: NOT_NAN, NOT_NAN: IS_NAN,
    LT: GT_EQ, LT_EQ: GT, GT: LT_EQ, GT_EQ: LT,
    EQ: NOT_EQ, NOT_EQ: EQ,
    IN: NOT_IN, NOT_IN: IN,
    STARTS_WITH: NOT_STARTS_WITH, NOT_STARTS_WITH: STARTS_WITH,
    TRUE_: FALSE_, FALSE_: TRUE_,
}

UNARY_OPS = {IS_NULL, NOT_NULL, IS_NAN, NOT_NAN}
LITERAL_OPS = {LT, LT_EQ, GT, GT_EQ, EQ, NOT_EQ, STARTS_WITH, NOT_STARTS_WITH}
SET_OPS = {IN, NOT_IN}


class Expression:
    op: str  # annotation only; concrete dataclasses define the value


@dataclass(frozen=True)
class AlwaysTrue(Expression):
    op: str = TRUE_

    def __str__(self):
        return "true"


@dataclass(frozen=True)
class AlwaysFalse(Expression):
    op: str = FALSE_

    def __str__(self):
        return "false"


@dataclass(frozen=True)
class And(Expression):
    left: Expression
    right: Expression
    op: str = AND

    def __str__(self):
        return f"({self.left} and {self.right})"


@dataclass(frozen=True)
class Or(Expression):
    left: Expression
    right: Expression
    op: str = OR

    def __str__(self):
        return f"({self.left} or {self.right})"


@dataclass(frozen=True)
class Not(Expression):
    child: Expression
    op: str = NOT

    def __str__(self):
        return f"not({self.child})"


@dataclass(frozen=True)
class SqlPredicate(Expression):
    """Opaque SQL row predicate: anything the tiny predicate parser can't
    express (modulo, arithmetic, UDF calls).  Compiles to ``F.expr`` on the
    row path; the metadata path treats it as unknowable (no pruning, which
    is correct but unoptimized)."""

    sql: str
    negated: bool = False
    op: str = "sql"

    def __str__(self):
        return f"{'NOT ' if self.negated else ''}sql({self.sql})"


@dataclass(frozen=True)
class Reference:
    """Unbound named column reference."""

    name: str

    def __str__(self):
        return self.name


@dataclass(frozen=True)
class BoundReference:
    field_id: int
    path: str  # dotted column path in the row schema
    type: S.Type

    def __str__(self):
        return f"{self.path}#{self.field_id}"


@dataclass(frozen=True)
class Predicate(Expression):
    op: str
    term: Any  # Reference | BoundReference
    literals: Optional[tuple] = None  # None for unary; tuple for literal/set ops

    @property
    def literal(self):
        return self.literals[0] if self.literals else None

    @property
    def is_bound(self) -> bool:
        return isinstance(self.term, BoundReference)

    def __str__(self):
        if self.op in UNARY_OPS:
            return f"{self.op}({self.term})"
        if self.op in SET_OPS:
            return f"{self.term} {self.op} {set(self.literals)}"
        return f"{self.term} {self.op} {self.literal!r}"


# -- factory helpers (api/.../expressions/Expressions.java:37-293) -----------

def ref(name: str) -> Reference:
    return Reference(name)


def always_true() -> Expression:
    return AlwaysTrue()


def always_false() -> Expression:
    return AlwaysFalse()


def _term(t) -> Any:
    return t if isinstance(t, (Reference, BoundReference)) else Reference(t)


def is_null(t) -> Predicate:
    return Predicate(IS_NULL, _term(t))


def not_null(t) -> Predicate:
    return Predicate(NOT_NULL, _term(t))


def is_nan(t) -> Predicate:
    return Predicate(IS_NAN, _term(t))


def not_nan(t) -> Predicate:
    return Predicate(NOT_NAN, _term(t))


def lt(t, v) -> Predicate:
    return Predicate(LT, _term(t), (v,))


def lt_eq(t, v) -> Predicate:
    return Predicate(LT_EQ, _term(t), (v,))


def gt(t, v) -> Predicate:
    return Predicate(GT, _term(t), (v,))


def gt_eq(t, v) -> Predicate:
    return Predicate(GT_EQ, _term(t), (v,))


def eq(t, v) -> Predicate:
    return Predicate(EQ, _term(t), (v,))


def not_eq(t, v) -> Predicate:
    return Predicate(NOT_EQ, _term(t), (v,))


def in_(t, vs: Sequence) -> Expression:
    vs = tuple(dict.fromkeys(vs))  # dedup, keep order
    if len(vs) == 0:
        return AlwaysFalse()
    if len(vs) == 1:
        return eq(t, vs[0])
    return Predicate(IN, _term(t), vs)


def not_in(t, vs: Sequence) -> Expression:
    vs = tuple(dict.fromkeys(vs))
    if len(vs) == 0:
        return AlwaysTrue()
    if len(vs) == 1:
        return not_eq(t, vs[0])
    return Predicate(NOT_IN, _term(t), vs)


def starts_with(t, v: str) -> Predicate:
    return Predicate(STARTS_WITH, _term(t), (v,))


def not_starts_with(t, v: str) -> Predicate:
    return Predicate(NOT_STARTS_WITH, _term(t), (v,))


def and_(*exprs: Expression) -> Expression:
    exprs = [e for e in exprs if not isinstance(e, AlwaysTrue)]
    if not exprs:
        return AlwaysTrue()
    if any(isinstance(e, AlwaysFalse) for e in exprs):
        return AlwaysFalse()
    out = exprs[0]
    for e in exprs[1:]:
        out = And(out, e)
    return out


def or_(*exprs: Expression) -> Expression:
    exprs = [e for e in exprs if not isinstance(e, AlwaysFalse)]
    if not exprs:
        return AlwaysFalse()
    if any(isinstance(e, AlwaysTrue) for e in exprs):
        return AlwaysTrue()
    out = exprs[0]
    for e in exprs[1:]:
        out = Or(out, e)
    return out


def not_(e: Expression) -> Expression:
    if isinstance(e, AlwaysTrue):
        return AlwaysFalse()
    if isinstance(e, AlwaysFalse):
        return AlwaysTrue()
    if isinstance(e, Not):
        return e.child
    return Not(e)


# -- NOT rewrite (P4; api/.../expressions/RewriteNot.java) -------------------

def rewrite_not(e: Expression) -> Expression:
    if isinstance(e, SqlPredicate):
        return e
    if isinstance(e, Not):
        return negate(rewrite_not(e.child))
    if isinstance(e, And):
        return And(rewrite_not(e.left), rewrite_not(e.right))
    if isinstance(e, Or):
        return Or(rewrite_not(e.left), rewrite_not(e.right))
    return e


def negate(e: Expression) -> Expression:
    """De Morgan + per-op negation."""
    if isinstance(e, AlwaysTrue):
        return AlwaysFalse()
    if isinstance(e, AlwaysFalse):
        return AlwaysTrue()
    if isinstance(e, And):
        return Or(negate(e.left), negate(e.right))
    if isinstance(e, Or):
        return And(negate(e.left), negate(e.right))
    if isinstance(e, Not):
        return rewrite_not(e.child)
    if isinstance(e, Predicate):
        return Predicate(NEGATIONS[e.op], e.term, e.literals)
    if isinstance(e, SqlPredicate):
        return SqlPredicate(e.sql, negated=not e.negated)
    raise ValueError(f"cannot negate {e}")


# -- literal coercion (api/.../expressions/Literals.java:44-182) -------------

INT_MIN, INT_MAX = -(2**31), 2**31 - 1
LONG_MIN, LONG_MAX = -(2**63), 2**63 - 1

ABOVE_MAX = "__above_max__"
BELOW_MIN = "__below_min__"


def coerce_literal(value, t: S.Type):
    """Coerce a Python literal to an iceberg type.  Returns the coerced
    value or the ABOVE_MAX / BELOW_MIN sentinel for out-of-range numerics
    (used for constant folding, Literals.java:44-182)."""
    if value is None:
        return None
    if isinstance(t, S.BooleanType):
        return bool(value)
    if isinstance(t, S.IntegerType):
        v = int(value)
        if v > INT_MAX:
            return ABOVE_MAX
        if v < INT_MIN:
            return BELOW_MIN
        return v
    if isinstance(t, S.LongType) or isinstance(t, S.TimeType):
        v = int(value)
        if v > LONG_MAX:
            return ABOVE_MAX
        if v < LONG_MIN:
            return BELOW_MIN
        return v
    if isinstance(t, (S.FloatType, S.DoubleType)):
        return float(value)
    if isinstance(t, S.DateType):
        if isinstance(value, datetime):
            return value.date()
        if isinstance(value, date):
            return value
        if isinstance(value, str):
            return date.fromisoformat(value)
        if isinstance(value, int):
            from datetime import timedelta
            return date(1970, 1, 1) + timedelta(days=value)
    if isinstance(t, S.TimestampType):
        if isinstance(value, datetime):
            return value
        if isinstance(value, date):
            return datetime(value.year, value.month, value.day)
        if isinstance(value, str):
            return datetime.fromisoformat(value)
        if isinstance(value, (int, float)):
            from datetime import timedelta, timezone
            return datetime(1970, 1, 1) + timedelta(microseconds=int(value))
    if isinstance(t, (S.StringType, S.UUIDType)):
        return str(value)
    if isinstance(t, (S.BinaryType, S.FixedType)):
        return bytes(value)
    if isinstance(t, S.DecimalType):
        return Decimal(value).quantize(Decimal(1).scaleb(-t.scale))
    raise TypeError(f"cannot coerce {value!r} to {t}")


# -- binding (P3; api/.../expressions/Binder.java:35-93) ---------------------

class BindError(ValueError):
    pass


def bind(schema: S.Schema, e: Expression, case_sensitive: bool = True) -> Expression:
    """Resolve names to field IDs, coerce + fold literals.  Run
    ``rewrite_not`` first so downstream evaluators never see NOT."""
    e = rewrite_not(e)
    return _bind(schema, e, case_sensitive)


def _bind(schema, e, cs):
    if isinstance(e, (AlwaysTrue, AlwaysFalse, SqlPredicate)):
        return e
    if isinstance(e, And):
        return and_(_bind(schema, e.left, cs), _bind(schema, e.right, cs))
    if isinstance(e, Or):
        return or_(_bind(schema, e.left, cs), _bind(schema, e.right, cs))
    if isinstance(e, Predicate):
        if e.is_bound:
            return e
        field = schema.find_field(e.term.name, case_sensitive=cs)
        if field is None:
            raise BindError(f"cannot find field '{e.term.name}' in {schema}")
        bref = BoundReference(field.field_id, schema.field_path(field.field_id), field.type)
        if e.op in UNARY_OPS:
            if e.op == IS_NULL and field.required:
                return AlwaysFalse()
            if e.op == NOT_NULL and field.required:
                return AlwaysTrue()
            if e.op in (IS_NAN, NOT_NAN) and not isinstance(field.type, (S.FloatType, S.DoubleType)):
                raise BindError(f"{e.op} on non-floating column {field.name}")
            return Predicate(e.op, bref)
        if e.op in LITERAL_OPS:
            v = coerce_literal(e.literal, field.type)
            if v is None:
                # comparisons with null literal never match (SQL semantics)
                return AlwaysFalse()
            if v == ABOVE_MAX:
                return _fold_above_max(e.op, bref)
            if v == BELOW_MIN:
                return _fold_below_min(e.op, bref)
            return Predicate(e.op, bref, (v,))
        if e.op in SET_OPS:
            vals, has_above, has_below = [], False, False
            for raw in e.literals:
                v = coerce_literal(raw, field.type)
                if v == ABOVE_MAX:
                    has_above = True
                elif v == BELOW_MIN:
                    has_below = True
                elif v is not None:
                    vals.append(v)
            vals = tuple(dict.fromkeys(vals))
            if e.op == IN:
                if not vals:
                    return AlwaysFalse()
                return Predicate(IN, bref, vals) if len(vals) > 1 else Predicate(EQ, bref, vals)
            else:
                if not vals:
                    return AlwaysTrue()
                return Predicate(NOT_IN, bref, vals) if len(vals) > 1 else Predicate(NOT_EQ, bref, vals)
    raise BindError(f"cannot bind {e!r}")


def _fold_above_max(op, bref):
    # literal above the type's max: c < lit → true, c > lit → false, ...
    if op in (LT, LT_EQ, NOT_EQ):
        return AlwaysTrue()
    return AlwaysFalse()


def _fold_below_min(op, bref):
    if op in (GT, GT_EQ, NOT_EQ):
        return AlwaysTrue()
    return AlwaysFalse()


# -- compile to pyspark Column (P5) -----------------------------------------

def to_column(e: Expression, col=None):
    """Compile a bound (or unbound — names used as-is) expression to a
    ``pyspark.sql.Column`` row filter.  Spark's Catalyst then handles
    pushdown, codegen, and row-group pruning (SURVEY.md §4)."""
    from pyspark.sql import functions as F

    if isinstance(e, AlwaysTrue):
        return F.lit(True)
    if isinstance(e, AlwaysFalse):
        return F.lit(False)
    if isinstance(e, And):
        return to_column(e.left) & to_column(e.right)
    if isinstance(e, Or):
        return to_column(e.left) | to_column(e.right)
    if isinstance(e, Not):
        return ~to_column(e.child)
    if isinstance(e, SqlPredicate):
        c = F.expr(e.sql)
        return ~c if e.negated else c
    if isinstance(e, Predicate):
        name = e.term.path if isinstance(e.term, BoundReference) else e.term.name
        c = F.col(name)
        if e.op == IS_NULL:
            return c.isNull()
        if e.op == NOT_NULL:
            return c.isNotNull()
        if e.op == IS_NAN:
            return F.isnan(c)
        if e.op == NOT_NAN:
            return ~F.isnan(c)
        if e.op == LT:
            return c < F.lit(e.literal)
        if e.op == LT_EQ:
            return c <= F.lit(e.literal)
        if e.op == GT:
            return c > F.lit(e.literal)
        if e.op == GT_EQ:
            return c >= F.lit(e.literal)
        if e.op == EQ:
            return c == F.lit(e.literal)
        if e.op == NOT_EQ:
            return c != F.lit(e.literal)
        if e.op == IN:
            return c.isin(list(e.literals))
        if e.op == NOT_IN:
            return ~c.isin(list(e.literals))
        if e.op == STARTS_WITH:
            return c.startswith(e.literal)
        if e.op == NOT_STARTS_WITH:
            return ~c.startswith(e.literal)
    raise ValueError(f"cannot compile {e!r}")


def references(e: Expression) -> set:
    """Column names/paths referenced by an expression."""
    out: set = set()
    _collect_refs(e, out)
    return out


def _collect_refs(e, out):
    if isinstance(e, (And, Or)):
        _collect_refs(e.left, out)
        _collect_refs(e.right, out)
    elif isinstance(e, Not):
        _collect_refs(e.child, out)
    elif isinstance(e, Predicate):
        out.add(e.term.path if isinstance(e.term, BoundReference) else e.term.name)
