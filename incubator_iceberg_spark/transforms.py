"""Partition transforms (SURVEY.md §2.3, T1-T6).

Each transform supplies three things:

- ``spark_expr(col)``  — JVM-side Column computing the partition value at
                         write time (no Python UDFs on the write path);
- ``apply(value)``     — the identical computation on a Python literal
                         (driver-side, used when projecting predicates);
- ``project(name, bound_pred)`` / ``project_strict`` — inclusive / strict
                         projection of a row predicate onto partition space
                         (reference: api/.../expressions/Projections.java:31-90,
                         api/.../transforms/ProjectionUtil.java).

Canonical value encodings (engine-defined, consistent across both paths):
  bucket[N]     → int in [0, N)        hash = Spark F.hash (murmur3 seed 42),
                                       bucket = (hash & MaxInt) % N
  truncate[W]   → same type as source  (ints floored, strings prefixed)
  year          → int, years since 1970
  month         → int, months since 1970-01
  day           → int, days since 1970-01-01
  hour          → int, hours since 1970-01-01T00
  identity      → source value
  void          → null
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from datetime import date, datetime, timedelta, timezone
from decimal import Decimal
from typing import Optional

from incubator_iceberg_spark import expressions as X
from incubator_iceberg_spark import schema as S
from incubator_iceberg_spark.murmur3 import spark_hash

_EPOCH_D = date(1970, 1, 1)
_EPOCH_TS = datetime(1970, 1, 1, tzinfo=timezone.utc)


class Transform:
    name: str = "?"

    def result_type(self, source_type: S.Type) -> S.Type:
        raise NotImplementedError

    def spark_expr(self, col):
        raise NotImplementedError

    def apply(self, value):
        raise NotImplementedError

    def can_transform(self, source_type: S.Type) -> bool:
        return True

    def preserves_order(self) -> bool:
        return False

    def project(self, name: str, pred: X.Predicate) -> Optional[X.Expression]:
        """Inclusive projection: partition predicate that is implied-by any
        row matching ``pred`` (may be weaker, never stronger)."""
        return None

    def project_strict(self, name: str, pred: X.Predicate) -> Optional[X.Expression]:
        """Strict projection: partition predicate that guarantees ALL rows
        in a matching partition satisfy ``pred``."""
        return None

    def __str__(self):
        return self.name

    def __repr__(self):
        return f"Transform({self.name})"

    def __eq__(self, other):
        return isinstance(other, Transform) and str(self) == str(other)

    def __hash__(self):
        return hash(str(self))


class IdentityTransform(Transform):
    """api/.../transforms/Identity.java"""

    name = "identity"

    def result_type(self, source_type):
        return source_type

    def spark_expr(self, col):
        return col

    def apply(self, value):
        return value

    def preserves_order(self):
        return True

    def project(self, name, pred):
        return X.Predicate(pred.op, X.Reference(name), pred.literals)

    def project_strict(self, name, pred):
        return X.Predicate(pred.op, X.Reference(name), pred.literals)


@dataclass(frozen=True, eq=False)
class BucketTransform(Transform):
    """murmur3 bucket (api/.../transforms/Bucket.java:43-312).

    Uses Spark's builtin ``F.hash`` (murmur3_x86_32, seed 42) JVM-side and
    an exact Python reimplementation (murmur3.py) driver-side, so bucket
    pruning on literals requires no UDF and no JVM round-trip.
    """

    num_buckets: int

    @property
    def name(self):
        return f"bucket[{self.num_buckets}]"

    def result_type(self, source_type):
        return S.IntegerType()

    def can_transform(self, t):
        return isinstance(t, (S.IntegerType, S.LongType, S.DateType, S.TimestampType,
                              S.TimeType, S.StringType, S.UUIDType, S.FixedType,
                              S.BinaryType, S.DecimalType))

    def spark_expr(self, col):
        from pyspark.sql import functions as F
        return F.pmod(F.hash(col).bitwiseAND(F.lit(2147483647)), F.lit(self.num_buckets))

    def apply(self, value, source_type=None):
        if value is None:
            return None
        h = spark_hash(value, source_type)
        return (h & 2147483647) % self.num_buckets

    def _lit_bucket(self, pred):
        t = pred.term.type if isinstance(pred.term, X.BoundReference) else None
        return self.apply(pred.literal, t)

    def project(self, name, pred):
        # only equality projects through a hash (Bucket.java project())
        if pred.op == X.EQ:
            return X.eq(name, self._lit_bucket(pred))
        if pred.op == X.IN:
            t = pred.term.type if isinstance(pred.term, X.BoundReference) else None
            return X.in_(name, [self.apply(v, t) for v in pred.literals])
        if pred.op in (X.IS_NULL, X.NOT_NULL):
            return X.Predicate(pred.op, X.Reference(name))
        return None

    def project_strict(self, name, pred):
        if pred.op == X.NOT_EQ:
            return X.not_eq(name, self._lit_bucket(pred))
        if pred.op == X.NOT_IN:
            t = pred.term.type if isinstance(pred.term, X.BoundReference) else None
            return X.not_in(name, [self.apply(v, t) for v in pred.literals])
        if pred.op in (X.IS_NULL, X.NOT_NULL):
            return X.Predicate(pred.op, X.Reference(name))
        return None


@dataclass(frozen=True, eq=False)
class TruncateTransform(Transform):
    """api/.../transforms/Truncate.java:37-447.

    int/long: ``v - (((v % W) + W) % W)`` (floor toward -inf);
    string: W-char prefix; decimal: scaled floor; binary: W-byte prefix.
    """

    width: int

    @property
    def name(self):
        return f"truncate[{self.width}]"

    def result_type(self, source_type):
        return source_type

    def can_transform(self, t):
        return isinstance(t, (S.IntegerType, S.LongType, S.StringType,
                              S.BinaryType, S.DecimalType))

    def preserves_order(self):
        return True

    def spark_expr(self, col):
        # type-agnostic form is only valid for int/long; use spark_expr_for
        from pyspark.sql import functions as F
        return col - F.pmod(col, F.lit(self.width))

    def spark_expr_for(self, col, source_type: S.Type):
        from pyspark.sql import functions as F
        W = self.width
        if isinstance(source_type, (S.IntegerType, S.LongType)):
            return col - F.pmod(col, F.lit(W))
        if isinstance(source_type, S.DecimalType):
            unscaled = (col * (10 ** source_type.scale)).cast("long")
            floored = unscaled - F.pmod(unscaled, F.lit(W))
            return (floored / (10 ** source_type.scale)).cast(
                f"decimal({source_type.precision},{source_type.scale})")
        if isinstance(source_type, (S.StringType, S.BinaryType)):
            return F.substring(col, 1, W)
        raise TypeError(f"cannot truncate {source_type}")

    def apply(self, value, source_type=None):
        if value is None:
            return None
        W = self.width
        if isinstance(value, int) and not isinstance(value, bool):
            return value - (((value % W) + W) % W)
        if isinstance(value, Decimal):
            scale = -value.as_tuple().exponent
            unscaled = int(value.scaleb(scale))
            floored = unscaled - (((unscaled % W) + W) % W)
            return Decimal(floored).scaleb(-scale)
        if isinstance(value, str):
            return value[:W]
        if isinstance(value, (bytes, bytearray)):
            return bytes(value)[:W]
        raise TypeError(f"cannot truncate {value!r}")

    # projection logic follows ProjectionUtil.truncateInteger/truncateString
    def project(self, name, pred):
        if pred.op in (X.IS_NULL, X.NOT_NULL):
            return X.Predicate(pred.op, X.Reference(name))
        if pred.op in (X.IN,):
            return X.in_(name, [self.apply(v) for v in pred.literals])
        if pred.op not in (X.LT, X.LT_EQ, X.GT, X.GT_EQ, X.EQ, X.STARTS_WITH):
            return None
        v = pred.literal
        if isinstance(v, (int, Decimal)) and not isinstance(v, bool):
            one = 1 if isinstance(v, int) else Decimal(1).scaleb(v.as_tuple().exponent)
            if pred.op == X.LT:
                return X.lt_eq(name, self.apply(v - one))
            if pred.op == X.LT_EQ:
                return X.lt_eq(name, self.apply(v))
            if pred.op == X.GT:
                return X.gt_eq(name, self.apply(v + one))
            if pred.op == X.GT_EQ:
                return X.gt_eq(name, self.apply(v))
            return X.eq(name, self.apply(v))
        if isinstance(v, str):
            tv = self.apply(v)
            if pred.op == X.LT:
                return X.lt_eq(name, tv)
            if pred.op == X.LT_EQ:
                return X.lt_eq(name, tv)
            if pred.op == X.GT:
                return X.gt_eq(name, tv)
            if pred.op == X.GT_EQ:
                return X.gt_eq(name, tv)
            if pred.op == X.EQ:
                return X.eq(name, tv)
            if pred.op == X.STARTS_WITH:
                if len(v) < self.width:
                    return X.starts_with(name, v)
                return X.eq(name, tv)
        return None

    def project_strict(self, name, pred):
        if pred.op in (X.IS_NULL, X.NOT_NULL):
            return X.Predicate(pred.op, X.Reference(name))
        v = pred.literal if pred.literals else None
        if isinstance(v, (int, Decimal)) and not isinstance(v, bool):
            one = 1 if isinstance(v, int) else Decimal(1).scaleb(v.as_tuple().exponent)
            tv = self.apply(v)
            if pred.op == X.LT:
                # all rows < v  ⟸  partition < truncate(v)  (strict)
                return X.lt(name, tv)
            if pred.op == X.LT_EQ:
                return X.lt(name, self.apply(v + one))
            if pred.op == X.GT:
                return X.gt(name, tv)
            if pred.op == X.GT_EQ:
                return X.gt(name, self.apply(v - one))
            if pred.op == X.NOT_EQ:
                return X.not_eq(name, tv)
        if isinstance(v, str) and pred.op == X.NOT_EQ:
            return None  # a partition may hold both equal and unequal rows
        return None


class _TimeTransform(Transform):
    """year/month/day/hour ordinals (api/.../transforms/Timestamps.java:34-80,
    Dates.java).  Ordinals are ints since epoch; negative inputs floor."""

    granularity: str = "?"

    @property
    def name(self):
        return self.granularity

    def result_type(self, source_type):
        return S.IntegerType()

    def can_transform(self, t):
        if self.granularity == "hour":
            return isinstance(t, S.TimestampType)
        return isinstance(t, (S.DateType, S.TimestampType))

    def preserves_order(self):
        return True

    def spark_expr(self, col):
        from pyspark.sql import functions as F
        g = self.granularity
        if g == "year":
            return (F.year(col) - F.lit(1970)).cast("int")
        if g == "month":
            return ((F.year(col) - F.lit(1970)) * F.lit(12) + F.month(col) - F.lit(1)).cast("int")
        if g == "day":
            return F.datediff(F.to_date(col), F.lit("1970-01-01")).cast("int")
        if g == "hour":
            # NTZ-safe: cast to (tz) timestamp first (session tz is UTC,
            # wall clock preserved), then seconds-since-epoch
            return F.floor(col.cast("timestamp").cast("double") / F.lit(3600.0)).cast("int")
        raise ValueError(g)

    def apply(self, value):
        if value is None:
            return None
        g = self.granularity
        if isinstance(value, datetime):
            d = value.date()
        elif isinstance(value, date):
            d = value
        else:
            raise TypeError(f"not a date/timestamp: {value!r}")
        if g == "year":
            return d.year - 1970
        if g == "month":
            return (d.year - 1970) * 12 + d.month - 1
        if g == "day":
            return (d - _EPOCH_D).days
        if g == "hour":
            ts = value if isinstance(value, datetime) else datetime(d.year, d.month, d.day)
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=timezone.utc)
            delta = ts - _EPOCH_TS
            secs = delta.days * 86_400 + delta.seconds
            return secs // 3600  # floor division handles negatives
        raise ValueError(g)

    def _next_unit(self, value):
        """smallest increment of the source type (1 day for dates, 1 µs for ts)."""
        if isinstance(value, datetime):
            return timedelta(microseconds=1)
        return timedelta(days=1)

    def project(self, name, pred):
        if pred.op in (X.IS_NULL, X.NOT_NULL):
            return X.Predicate(pred.op, X.Reference(name))
        if pred.op == X.IN:
            return X.in_(name, [self.apply(v) for v in pred.literals])
        if pred.op not in (X.LT, X.LT_EQ, X.GT, X.GT_EQ, X.EQ):
            return None
        v = pred.literal
        # monotonic non-decreasing transform → ProjectionUtil.truncateLong logic
        if pred.op == X.LT:
            return X.lt_eq(name, self.apply(v - self._next_unit(v)))
        if pred.op == X.LT_EQ:
            return X.lt_eq(name, self.apply(v))
        if pred.op == X.GT:
            return X.gt_eq(name, self.apply(v + self._next_unit(v)))
        if pred.op == X.GT_EQ:
            return X.gt_eq(name, self.apply(v))
        return X.eq(name, self.apply(v))

    def project_strict(self, name, pred):
        if pred.op in (X.IS_NULL, X.NOT_NULL):
            return X.Predicate(pred.op, X.Reference(name))
        if pred.op not in (X.LT, X.LT_EQ, X.GT, X.GT_EQ, X.NOT_EQ):
            return None
        v = pred.literal
        tv = self.apply(v)
        if pred.op == X.LT:
            return X.lt(name, tv)
        if pred.op == X.LT_EQ:
            return X.lt(name, self.apply(v + self._next_unit(v)))
        if pred.op == X.GT:
            return X.gt(name, tv)
        if pred.op == X.GT_EQ:
            return X.gt(name, self.apply(v - self._next_unit(v)))
        return None


class YearTransform(_TimeTransform):
    granularity = "year"


class MonthTransform(_TimeTransform):
    granularity = "month"


class DayTransform(_TimeTransform):
    granularity = "day"


class HourTransform(_TimeTransform):
    granularity = "hour"


class VoidTransform(Transform):
    """alwaysNull (api/.../transforms/VoidTransform.java)."""

    name = "void"

    def result_type(self, source_type):
        return source_type

    def spark_expr(self, col):
        from pyspark.sql import functions as F
        return F.lit(None)

    def apply(self, value):
        return None


class UnknownTransform(Transform):
    """Forward-compat placeholder for a transform name this engine
    version does not implement (api/.../transforms/UnknownTransform.java;
    mirror test api/src/test/.../transforms/TestUnknownTransform.java).

    A table whose metadata was written by a NEWER engine (or migrated
    from an engine with more transforms) stays READABLE: projections
    return None, so planning never prunes on this partition field —
    every partition of that spec is scanned and the row filter does the
    work.  Stored partition values pass through untouched (the declared
    partition type falls back to string, matching the reference's
    getResultType).  Only WRITE-side use rejects: computing a partition
    value (``spark_expr``/``apply``) raises, and PartitionSpec.build /
    spec evolution refuse to create a spec with an unknown transform."""

    def __init__(self, raw: str):
        self.raw = raw
        self.name = raw  # str() round-trips metadata JSON verbatim

    def result_type(self, source_type):
        return S.StringType()

    def can_transform(self, t):
        return True  # cannot validate a transform we don't know

    def spark_expr(self, col):
        raise NotImplementedError(
            f"cannot compute partition values for unknown transform "
            f"{self.raw!r} (written by a newer engine version): the "
            f"table is readable, but writes need an engine that "
            f"implements it")

    def apply(self, value):
        raise NotImplementedError(
            f"cannot apply unknown transform {self.raw!r}")

    def project(self, name, pred):
        return None  # no pruning possible → scan all partitions

    def project_strict(self, name, pred):
        return None


def parse_transform(s: str) -> Transform:
    """Registry (api/.../transforms/Transforms.java).  Unknown names
    parse into ``UnknownTransform`` — readable, never prunable — so
    metadata written by a newer engine still loads; spec-CREATING
    surfaces (PartitionSpec.build, spec evolution) reject it."""
    raw = s.strip()
    s = raw.lower()
    if s == "identity":
        return IdentityTransform()
    if s in ("year", "month", "day", "hour"):
        return {"year": YearTransform, "month": MonthTransform,
                "day": DayTransform, "hour": HourTransform}[s]()
    if s == "void":
        return VoidTransform()
    if s.startswith("bucket[") and s.endswith("]"):
        return BucketTransform(int(s[len("bucket["):-1]))
    if s.startswith("bucket(") and s.endswith(")"):
        return BucketTransform(int(s[len("bucket("):-1]))
    if s.startswith("truncate[") and s.endswith("]"):
        return TruncateTransform(int(s[len("truncate["):-1]))
    if s.startswith("truncate(") and s.endswith(")"):
        return TruncateTransform(int(s[len("truncate("):-1]))
    return UnknownTransform(raw)


def identity() -> Transform:
    return IdentityTransform()


def bucket(n: int) -> Transform:
    return BucketTransform(n)


def truncate(w: int) -> Transform:
    return TruncateTransform(w)


def year() -> Transform:
    return YearTransform()


def month() -> Transform:
    return MonthTransform()


def day() -> Transform:
    return DayTransform()


def hour() -> Transform:
    return HourTransform()


def void() -> Transform:
    return VoidTransform()
