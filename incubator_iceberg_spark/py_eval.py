"""Pure-Python expression evaluation over metadata rows (driver-side
scan planning fast path).

The reference plans scans on the DRIVER (BaseTableScan.planFiles with a
worker pool, ManifestGroup.java:186); the Spark-DataFrame planner in
evaluators.py is our 100 TB path.  For the common case — metadata well
under a few MB — a driver-side pyarrow read + these evaluators saves two
Spark jobs per query (~0.5-1 s each on local mode, worse on a busy
cluster).  scan.TableScan picks automatically by metadata size.

Semantics mirror evaluators.py exactly:
- eval_inclusive_entry  == inclusive_metrics_filter   (default True)
- eval_strict_entry     == strict_metrics_filter      (default False)
- eval_partition_value  == partition_pruning_filter   (exact values)
- eval_summary          == manifest_summary_filter    (bounds, default True)
"""

from __future__ import annotations

from datetime import date, datetime, timezone

from incubator_iceberg_spark import expressions as X
from incubator_iceberg_spark import schema as S

IN_PREDICATE_LIMIT = 200


def _norm(v):
    """Comparable form: tz-aware datetimes → naive UTC (manifest bounds come
    back tz-aware from arrow; bound literals are naive UTC)."""
    if isinstance(v, datetime) and v.tzinfo is not None:
        return v.astimezone(timezone.utc).replace(tzinfo=None)
    return v


def _cmp(a, op, b):
    a, b = _norm(a), _norm(b)
    try:
        if op == "lt":
            return a < b
        if op == "le":
            return a <= b
        if op == "gt":
            return a > b
        if op == "ge":
            return a >= b
        if op == "eq":
            return a == b
    except TypeError:
        return None
    return None


def _maybe(v):  # None (unknown) → might match
    return True if v is None else bool(v)


def _surely(v):  # None (unknown) → no guarantee
    return False if v is None else bool(v)


def eval_inclusive_entry(entry: dict, bound: X.Expression) -> bool:
    """File MIGHT contain matching rows (InclusiveMetricsEvaluator)."""
    if isinstance(bound, X.AlwaysTrue):
        return True
    if isinstance(bound, X.AlwaysFalse):
        return False
    if isinstance(bound, X.And):
        return eval_inclusive_entry(entry, bound.left) and eval_inclusive_entry(entry, bound.right)
    if isinstance(bound, X.Or):
        return eval_inclusive_entry(entry, bound.left) or eval_inclusive_entry(entry, bound.right)
    if isinstance(bound, X.SqlPredicate):
        return True
    assert isinstance(bound, X.Predicate)
    p = bound.term.path if isinstance(bound.term, X.BoundReference) else bound.term.name
    lower = _norm((entry.get("lower_bounds") or {}).get(p))
    upper = _norm((entry.get("upper_bounds") or {}).get(p))
    nulls = (entry.get("null_counts") or {}).get(p)
    values = (entry.get("value_counts") or {}).get(p)
    nans = (entry.get("nan_counts") or {}).get(p)
    op = bound.op

    if op == X.IS_NULL:
        return _maybe(None if nulls is None else nulls > 0)
    if op == X.NOT_NULL:
        return not (nulls is not None and values is not None and nulls >= values)
    if op == X.IS_NAN:
        return _maybe(None if nans is None else nans > 0)
    if op == X.NOT_NAN:
        if nans is None or values is None:
            return True
        return nans < (values - (nulls or 0))
    if op in (X.NOT_EQ, X.NOT_IN, X.NOT_STARTS_WITH):
        return True
    if nulls is not None and values is not None and nulls >= values:
        return False  # all null: no value predicate can match
    v = bound.literal
    if op == X.LT:
        return _maybe(None if lower is None else _cmp(lower, "lt", v))
    if op == X.LT_EQ:
        return _maybe(None if lower is None else _cmp(lower, "le", v))
    if op == X.GT:
        return _maybe(None if upper is None else _cmp(upper, "gt", v))
    if op == X.GT_EQ:
        return _maybe(None if upper is None else _cmp(upper, "ge", v))
    if op == X.EQ:
        return (_maybe(None if lower is None else _cmp(lower, "le", v))
                and _maybe(None if upper is None else _cmp(upper, "ge", v)))
    if op == X.IN:
        if len(bound.literals) > IN_PREDICATE_LIMIT:
            return True
        return any(
            _maybe(None if lower is None else _cmp(lower, "le", x))
            and _maybe(None if upper is None else _cmp(upper, "ge", x))
            for x in bound.literals)
    if op == X.STARTS_WITH:
        n = len(v)
        lo = None if not isinstance(lower, str) else lower[:n] <= v
        hi = None if not isinstance(upper, str) else upper[:n] >= v
        return _maybe(lo) and _maybe(hi)
    return True


def eval_strict_entry(entry: dict, bound: X.Expression) -> bool:
    """EVERY row in the file matches (StrictMetricsEvaluator)."""
    if isinstance(bound, X.AlwaysTrue):
        return True
    if isinstance(bound, X.AlwaysFalse):
        return False
    if isinstance(bound, X.And):
        return eval_strict_entry(entry, bound.left) and eval_strict_entry(entry, bound.right)
    if isinstance(bound, X.Or):
        return eval_strict_entry(entry, bound.left) or eval_strict_entry(entry, bound.right)
    if isinstance(bound, X.SqlPredicate):
        return False
    assert isinstance(bound, X.Predicate)
    p = bound.term.path if isinstance(bound.term, X.BoundReference) else bound.term.name
    lower = _norm((entry.get("lower_bounds") or {}).get(p))
    upper = _norm((entry.get("upper_bounds") or {}).get(p))
    nulls = (entry.get("null_counts") or {}).get(p)
    nans = (entry.get("nan_counts") or {}).get(p)
    rec = entry.get("record_count")
    op = bound.op
    is_float = isinstance(bound.term, X.BoundReference) and \
        isinstance(bound.term.type, (S.FloatType, S.DoubleType))

    def no_nulls():
        return _surely(None if nulls is None else nulls == 0)

    def no_nans():
        if not is_float:
            return True
        return _surely(None if nans is None else nans == 0)

    if op == X.IS_NULL:
        return _surely(None if (nulls is None or rec is None) else nulls == rec)
    if op == X.NOT_NULL:
        return no_nulls()
    if op == X.IS_NAN:
        return _surely(None if (nans is None or rec is None) else nans == rec)
    if op == X.NOT_NAN:
        return no_nans() and no_nulls()
    v = bound.literal
    if op == X.LT:
        return no_nulls() and no_nans() and _surely(
            None if upper is None else _cmp(upper, "lt", v))
    if op == X.LT_EQ:
        return no_nulls() and no_nans() and _surely(
            None if upper is None else _cmp(upper, "le", v))
    if op == X.GT:
        return no_nulls() and no_nans() and _surely(
            None if lower is None else _cmp(lower, "gt", v))
    if op == X.GT_EQ:
        return no_nulls() and no_nans() and _surely(
            None if lower is None else _cmp(lower, "ge", v))
    if op == X.EQ:
        return no_nulls() and _surely(
            None if (lower is None or upper is None)
            else (_cmp(lower, "eq", v) and _cmp(upper, "eq", v)))
    if op == X.NOT_EQ:
        out = None
        if lower is not None and upper is not None:
            lo, hi = _cmp(v, "lt", lower), _cmp(v, "gt", upper)
            out = None if (lo is None or hi is None) else (lo or hi)
        return no_nulls() and _surely(out)
    if op == X.IN:
        same = None if (lower is None or upper is None) else _cmp(lower, "eq", upper)
        member = None if lower is None else any(_cmp(lower, "eq", x) for x in bound.literals)
        return no_nulls() and _surely(same) and _surely(member)
    if op == X.NOT_IN:
        if lower is None or upper is None:
            return False
        ok = all((_cmp(x, "lt", lower) or _cmp(x, "gt", upper)) for x in bound.literals)
        return no_nulls() and _surely(ok)
    if op == X.STARTS_WITH:
        n = len(v)
        ok = None
        if isinstance(lower, str) and isinstance(upper, str):
            ok = lower[:n] == v and upper[:n] == v
        return no_nulls() and _surely(ok)
    return False


def eval_partition_value(proj: X.Expression, partition: dict) -> bool:
    """Exact partition-tuple test of a PROJECTED predicate (names are
    partition field names).  NULL partition values fail comparisons."""
    if isinstance(proj, X.AlwaysTrue):
        return True
    if isinstance(proj, X.AlwaysFalse):
        return False
    if isinstance(proj, X.And):
        return eval_partition_value(proj.left, partition) and \
            eval_partition_value(proj.right, partition)
    if isinstance(proj, X.Or):
        return eval_partition_value(proj.left, partition) or \
            eval_partition_value(proj.right, partition)
    if isinstance(proj, X.SqlPredicate):
        return True
    assert isinstance(proj, X.Predicate)
    name = proj.term.name if isinstance(proj.term, X.Reference) else proj.term.path
    v = _norm(partition.get(name))
    op = proj.op
    if op == X.IS_NULL:
        return v is None
    if op == X.NOT_NULL:
        return v is not None
    if v is None:
        return False
    lit = proj.literal
    if op == X.LT:
        return _surely(_cmp(v, "lt", lit))
    if op == X.LT_EQ:
        return _surely(_cmp(v, "le", lit))
    if op == X.GT:
        return _surely(_cmp(v, "gt", lit))
    if op == X.GT_EQ:
        return _surely(_cmp(v, "ge", lit))
    if op == X.EQ:
        return _surely(_cmp(v, "eq", lit))
    if op == X.NOT_EQ:
        return not _surely(_cmp(v, "eq", lit))
    if op == X.IN:
        return any(_surely(_cmp(v, "eq", x)) for x in proj.literals)
    if op == X.NOT_IN:
        return not any(_surely(_cmp(v, "eq", x)) for x in proj.literals)
    if op == X.STARTS_WITH:
        return isinstance(v, str) and v.startswith(lit)
    if op == X.NOT_STARTS_WITH:
        return not (isinstance(v, str) and v.startswith(lit))
    return True


def eval_summary(proj: X.Expression, summaries: dict) -> bool:
    """Manifest MIGHT contain matching files, from per-manifest partition
    summaries {field: {contains_null, lower, upper}} (ManifestEvaluator)."""
    if isinstance(proj, X.AlwaysTrue):
        return True
    if isinstance(proj, X.AlwaysFalse):
        return False
    if isinstance(proj, X.And):
        return eval_summary(proj.left, summaries) and eval_summary(proj.right, summaries)
    if isinstance(proj, X.Or):
        return eval_summary(proj.left, summaries) or eval_summary(proj.right, summaries)
    if isinstance(proj, X.SqlPredicate):
        return True
    assert isinstance(proj, X.Predicate)
    name = proj.term.name if isinstance(proj.term, X.Reference) else proj.term.path
    s = summaries.get(name)
    if s is None:
        return True
    lower, upper = _norm(s.get("lower")), _norm(s.get("upper"))
    contains_null = s.get("contains_null")
    op = proj.op
    if op == X.IS_NULL:
        return _maybe(contains_null)
    if op == X.NOT_NULL:
        return True
    v = proj.literal if proj.literals else None
    if op == X.LT:
        return _maybe(None if lower is None else _cmp(lower, "lt", v))
    if op == X.LT_EQ:
        return _maybe(None if lower is None else _cmp(lower, "le", v))
    if op == X.GT:
        return _maybe(None if upper is None else _cmp(upper, "gt", v))
    if op == X.GT_EQ:
        return _maybe(None if upper is None else _cmp(upper, "ge", v))
    if op == X.EQ:
        return (_maybe(None if lower is None else _cmp(lower, "le", v))
                and _maybe(None if upper is None else _cmp(upper, "ge", v)))
    if op == X.IN:
        return any(
            _maybe(None if lower is None else _cmp(lower, "le", x))
            and _maybe(None if upper is None else _cmp(upper, "ge", x))
            for x in proj.literals)
    if op == X.STARTS_WITH:
        n = len(v)
        lo = None if not isinstance(lower, str) else lower[:n] <= v
        hi = None if not isinstance(upper, str) else upper[:n] >= v
        return _maybe(lo) and _maybe(hi)
    return True


def residual_for(bound: X.Expression, spec, partition: dict) -> X.Expression:
    """P9 residual evaluator (api/.../expressions/ResidualEvaluator.java:30-75):
    partially evaluate the bound row filter against ONE file's partition
    tuple.  Predicates proven true for every row in the partition (strict
    projection holds) collapse to TRUE; predicates that cannot match
    (inclusive projection fails) collapse to FALSE; the rest remain and
    must be applied per row.  Files whose residual is AlwaysTrue skip row
    filtering entirely."""
    from incubator_iceberg_spark import partitioning as PT

    def walk(e):
        if isinstance(e, (X.AlwaysTrue, X.AlwaysFalse)):
            return e
        if isinstance(e, X.And):
            return X.and_(walk(e.left), walk(e.right))
        if isinstance(e, X.Or):
            return X.or_(walk(e.left), walk(e.right))
        if isinstance(e, X.SqlPredicate):
            return e
        assert isinstance(e, X.Predicate)
        if not isinstance(e.term, X.BoundReference):
            return e
        for f in spec.fields:
            if f.source_id != e.term.field_id:
                continue
            strict = f.transform.project_strict(f.name, e)
            if strict is not None and eval_partition_value(strict, partition):
                return X.always_true()
            incl = f.transform.project(f.name, e)
            if incl is not None and not eval_partition_value(incl, partition):
                return X.always_false()
        return e

    if not spec.is_partitioned:
        return bound
    return walk(bound)


def arrow_mask(tbl, bound):
    """Compile a bound expression to a pyarrow boolean mask (row filter for
    the local/arrow read paths — Table.to_arrow and the Python data
    source)."""
    import pyarrow.compute as pc
    from incubator_iceberg_spark import expressions as X

    def walk(e):
        if isinstance(e, X.AlwaysTrue):
            return None
        if isinstance(e, X.AlwaysFalse):
            import pyarrow as pa
            return pa.array([False] * tbl.num_rows)
        if isinstance(e, X.And):
            l, r = walk(e.left), walk(e.right)
            if l is None:
                return r
            if r is None:
                return l
            return pc.and_kleene(l, r)
        if isinstance(e, X.Or):
            l, r = walk(e.left), walk(e.right)
            if l is None or r is None:
                return None
            return pc.or_kleene(l, r)
        if isinstance(e, X.SqlPredicate):
            raise ValueError("opaque SQL predicates need the Spark read path")
        assert isinstance(e, X.Predicate)
        path = e.term.path if isinstance(e.term, X.BoundReference) else e.term.name
        col = tbl.column(path)
        op = e.op
        if op == X.IS_NULL:
            return pc.is_null(col)
        if op == X.NOT_NULL:
            return pc.is_valid(col)
        if op == X.IS_NAN:
            return pc.is_nan(col)
        if op == X.NOT_NAN:
            return pc.invert(pc.is_nan(col))
        v = e.literal
        fns = {X.LT: pc.less, X.LT_EQ: pc.less_equal, X.GT: pc.greater,
               X.GT_EQ: pc.greater_equal, X.EQ: pc.equal, X.NOT_EQ: pc.not_equal}
        if op in fns:
            return fns[op](col, v)
        if op == X.IN:
            import pyarrow as pa
            return pc.is_in(col, value_set=pa.array(list(e.literals)))
        if op == X.NOT_IN:
            import pyarrow as pa
            return pc.and_kleene(pc.invert(pc.is_in(col, value_set=pa.array(list(e.literals)))),
                                 pc.is_valid(col))
        if op == X.STARTS_WITH:
            return pc.starts_with(col, v)
        if op == X.NOT_STARTS_WITH:
            return pc.invert(pc.starts_with(col, v))
        raise ValueError(f"unhandled {op}")

    return walk(bound)
