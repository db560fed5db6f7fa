"""Metrics / manifest evaluators (P6, P7, P8 in SURVEY.md §2.2) compiled to
``pyspark.sql.Column`` filters over METADATA DataFrames — never row data.

The reference evaluates its expression algebra at five granularities
(manifest → file → row-group → dictionary → row).  Here:

- manifest granularity  → ``manifest_summary_filter``  (ManifestEvaluator.java:51-141)
- file granularity      → ``inclusive_metrics_filter`` (InclusiveMetricsEvaluator.java:54-91)
                          + ``partition_pruning_filter`` (Projections + partition tuples)
- strict file matching  → ``strict_metrics_filter``    (StrictMetricsEvaluator.java)
- row-group/dictionary  → free (Spark's Parquet reader, SURVEY.md §4)
- row                   → ``expressions.to_column``

All metadata pruning therefore runs distributed as Spark jobs over the
manifest DataFrames — nothing is collected to the driver except the final
pruned file-path list (100 TB design constraint, SURVEY.md §7).

Manifest-entry DataFrame stat columns (written by manifests.py):
  record_count long,
  value_counts / null_counts / nan_counts : map<string,long>,
  lower_bounds / upper_bounds : struct<colname: source-type>,
  partition : struct<partfield: result-type>

Manifest-list DataFrame summary columns:
  partitions : struct<partfield: struct<contains_null bool, lower T, upper T>>
"""

from __future__ import annotations

from typing import Optional

from incubator_iceberg_spark import expressions as X
from incubator_iceberg_spark import partitioning as P

IN_PREDICATE_LIMIT = 200  # InclusiveMetricsEvaluator.java IN cap


def _has(df_schema, *path) -> bool:
    """Check a nested struct column path exists in a Spark schema."""
    if df_schema is None:
        return True
    import pyspark.sql.types as T
    cur = df_schema
    for part in path:
        if not isinstance(cur, T.StructType) or part not in cur.fieldNames():
            return False
        cur = cur[part].dataType
    return True


class _EntryStats:
    """Accessors for file-level stats in the manifest-entry DF."""

    def __init__(self, df_schema):
        self.schema = df_schema

    def lower(self, col):
        from pyspark.sql import functions as F
        if not _has(self.schema, "lower_bounds", col):
            return None
        return F.col("lower_bounds").getField(col)

    def upper(self, col):
        from pyspark.sql import functions as F
        if not _has(self.schema, "upper_bounds", col):
            return None
        return F.col("upper_bounds").getField(col)

    def null_count(self, col):
        from pyspark.sql import functions as F
        if not _has(self.schema, "null_counts"):
            return None
        return F.col("null_counts").getItem(col)

    def nan_count(self, col):
        from pyspark.sql import functions as F
        if not _has(self.schema, "nan_counts"):
            return None
        return F.col("nan_counts").getItem(col)

    def value_count(self, col):
        from pyspark.sql import functions as F
        if not _has(self.schema, "value_counts"):
            return None
        return F.col("value_counts").getItem(col)

    def record_count(self):
        from pyspark.sql import functions as F
        return F.col("record_count")


def _maybe(cond):
    """Missing/NULL stats → 'rows might match' (inclusive default TRUE)."""
    from pyspark.sql import functions as F
    if cond is None:
        return F.lit(True)
    return F.coalesce(cond, F.lit(True))


def _surely(cond):
    """Missing/NULL stats → 'rows might not match' (strict default FALSE)."""
    from pyspark.sql import functions as F
    if cond is None:
        return F.lit(False)
    return F.coalesce(cond, F.lit(False))


def inclusive_metrics_filter(e: X.Expression, df_schema=None):
    """Column over the manifest-entry DF: True ⇔ file MIGHT contain rows
    matching the bound row expression."""
    from pyspark.sql import functions as F
    st = _EntryStats(df_schema)

    def walk(e):
        if isinstance(e, X.AlwaysTrue):
            return F.lit(True)
        if isinstance(e, X.AlwaysFalse):
            return F.lit(False)
        if isinstance(e, X.And):
            return walk(e.left) & walk(e.right)
        if isinstance(e, X.Or):
            return walk(e.left) | walk(e.right)
        if isinstance(e, X.Not):
            raise ValueError("bind() rewrites NOT away before metrics eval")
        if isinstance(e, X.SqlPredicate):
            return F.lit(True)  # opaque: might match
        assert isinstance(e, X.Predicate) and isinstance(e.term, X.BoundReference)
        p = e.term.path
        lower, upper = st.lower(p), st.upper(p)
        nulls, values, nans = st.null_count(p), st.value_count(p), st.nan_count(p)

        def not_all_null():
            if nulls is None or values is None:
                return F.lit(True)
            return F.coalesce(nulls < values, F.lit(True))

        op = e.op
        if op == X.IS_NULL:
            return _maybe(None if nulls is None else nulls > 0)
        if op == X.NOT_NULL:
            return not_all_null()
        if op == X.IS_NAN:
            return _maybe(None if nans is None else nans > 0)
        if op == X.NOT_NAN:
            if nans is None or values is None:
                return F.lit(True)
            base = F.coalesce(nulls, F.lit(0)) if nulls is not None else F.lit(0)
            return F.coalesce(nans < (values - base), F.lit(True))
        lit = F.lit
        if op == X.LT:
            return not_all_null() & _maybe(None if lower is None else lower < lit(e.literal))
        if op == X.LT_EQ:
            return not_all_null() & _maybe(None if lower is None else lower <= lit(e.literal))
        if op == X.GT:
            return not_all_null() & _maybe(None if upper is None else upper > lit(e.literal))
        if op == X.GT_EQ:
            return not_all_null() & _maybe(None if upper is None else upper >= lit(e.literal))
        if op == X.EQ:
            return (not_all_null()
                    & _maybe(None if lower is None else lower <= lit(e.literal))
                    & _maybe(None if upper is None else upper >= lit(e.literal)))
        if op in (X.NOT_EQ, X.NOT_IN, X.NOT_STARTS_WITH):
            return F.lit(True)
        if op == X.IN:
            if len(e.literals) > IN_PREDICATE_LIMIT:
                return F.lit(True)
            any_hit = None
            for v in e.literals:
                hit = (_maybe(None if lower is None else lower <= lit(v))
                       & _maybe(None if upper is None else upper >= lit(v)))
                any_hit = hit if any_hit is None else (any_hit | hit)
            return not_all_null() & any_hit
        if op == X.STARTS_WITH:
            pref = e.literal
            n = len(pref)
            lo = None if lower is None else F.substring(lower, 1, n) <= lit(pref)
            hi = None if upper is None else F.substring(upper, 1, n) >= lit(pref)
            return not_all_null() & _maybe(lo) & _maybe(hi)
        raise ValueError(f"unhandled op {op}")

    return walk(e)


def strict_metrics_filter(e: X.Expression, df_schema=None):
    """Column over the manifest-entry DF: True ⇔ EVERY row in the file
    matches the bound expression.  Powers metadata-only DELETE (R1) and
    overwrite validation (C3)."""
    from pyspark.sql import functions as F
    st = _EntryStats(df_schema)

    def walk(e):
        if isinstance(e, X.AlwaysTrue):
            return F.lit(True)
        if isinstance(e, X.AlwaysFalse):
            return F.lit(False)
        if isinstance(e, X.And):
            return walk(e.left) & walk(e.right)
        if isinstance(e, X.Or):
            return walk(e.left) | walk(e.right)
        if isinstance(e, X.Not):
            raise ValueError("bind() rewrites NOT away before metrics eval")
        if isinstance(e, X.SqlPredicate):
            return F.lit(False)  # opaque: no strict guarantee
        assert isinstance(e, X.Predicate) and isinstance(e.term, X.BoundReference)
        p = e.term.path
        lower, upper = st.lower(p), st.upper(p)
        nulls, nans = st.null_count(p), st.nan_count(p)
        rec = st.record_count()
        lit = F.lit

        def no_nulls():
            return _surely(None if nulls is None else nulls == 0)

        def no_nans():
            # non-float columns have no nan counts → vacuously true
            import pyspark.sql.types as T
            from incubator_iceberg_spark import schema as S
            if not isinstance(e.term.type, (S.FloatType, S.DoubleType)):
                return F.lit(True)
            return _surely(None if nans is None else nans == 0)

        op = e.op
        if op == X.IS_NULL:
            return _surely(None if nulls is None else nulls == rec)
        if op == X.NOT_NULL:
            return no_nulls()
        if op == X.IS_NAN:
            return _surely(None if nans is None else nans == rec)
        if op == X.NOT_NAN:
            return no_nans() & no_nulls()
        if op == X.LT:
            return no_nulls() & no_nans() & _surely(None if upper is None else upper < lit(e.literal))
        if op == X.LT_EQ:
            return no_nulls() & no_nans() & _surely(None if upper is None else upper <= lit(e.literal))
        if op == X.GT:
            return no_nulls() & no_nans() & _surely(None if lower is None else lower > lit(e.literal))
        if op == X.GT_EQ:
            return no_nulls() & no_nans() & _surely(None if lower is None else lower >= lit(e.literal))
        if op == X.EQ:
            return (no_nulls()
                    & _surely(None if lower is None else lower == lit(e.literal))
                    & _surely(None if upper is None else upper == lit(e.literal)))
        if op == X.NOT_EQ:
            out_of_range = None
            if lower is not None and upper is not None:
                out_of_range = (lit(e.literal) < lower) | (lit(e.literal) > upper)
            return no_nulls() & _surely(out_of_range)
        if op == X.IN:
            same = None if (lower is None or upper is None) else (lower == upper)
            member = None if lower is None else lower.isin(list(e.literals))
            return no_nulls() & _surely(same) & _surely(member)
        if op == X.NOT_IN:
            cond = None
            if lower is not None and upper is not None:
                for v in e.literals:
                    c = (lit(v) < lower) | (lit(v) > upper)
                    cond = c if cond is None else (cond & c)
            return no_nulls() & _surely(cond)
        if op == X.STARTS_WITH:
            n = len(e.literal)
            cond = None
            if lower is not None and upper is not None:
                cond = ((F.substring(lower, 1, n) == lit(e.literal))
                        & (F.substring(upper, 1, n) == lit(e.literal)))
            return no_nulls() & _surely(cond)
        if op == X.NOT_STARTS_WITH:
            return F.lit(False)
        raise ValueError(f"unhandled op {op}")

    return walk(e)


def partition_pruning_filter(spec: P.PartitionSpec, bound_row_expr: X.Expression,
                             df_schema=None):
    """Column over the manifest-entry DF testing the file's exact partition
    tuple against the inclusive projection of the row filter (P10)."""
    from pyspark.sql import functions as F
    if not spec.is_partitioned:
        return F.lit(True)
    proj = P.project_inclusive(spec, bound_row_expr)
    return _compile_over_partition(proj, "partition", df_schema)


def strict_partition_filter(spec: P.PartitionSpec, bound_row_expr: X.Expression,
                            df_schema=None):
    """True ⇔ every row in the file's partition satisfies the row filter
    (used for partition-aligned metadata DELETE)."""
    from pyspark.sql import functions as F
    if not spec.is_partitioned:
        return F.lit(False)
    proj = P.project_strict(spec, bound_row_expr)
    return _compile_over_partition(proj, "partition", df_schema)


def _compile_over_partition(e: X.Expression, root: str, df_schema):
    from pyspark.sql import functions as F

    def walk(e):
        if isinstance(e, X.AlwaysTrue):
            return F.lit(True)
        if isinstance(e, X.AlwaysFalse):
            return F.lit(False)
        if isinstance(e, X.And):
            return walk(e.left) & walk(e.right)
        if isinstance(e, X.Or):
            return walk(e.left) | walk(e.right)
        if isinstance(e, X.SqlPredicate):
            return F.lit(True)
        assert isinstance(e, X.Predicate)
        name = e.term.name if isinstance(e.term, X.Reference) else e.term.path
        if not _has(df_schema, root, name):
            return F.lit(True)
        c = F.col(root).getField(name)
        lit = F.lit
        op = e.op
        if op == X.IS_NULL:
            return c.isNull()
        if op == X.NOT_NULL:
            return c.isNotNull()
        if op == X.LT:
            return F.coalesce(c < lit(e.literal), F.lit(False))
        if op == X.LT_EQ:
            return F.coalesce(c <= lit(e.literal), F.lit(False))
        if op == X.GT:
            return F.coalesce(c > lit(e.literal), F.lit(False))
        if op == X.GT_EQ:
            return F.coalesce(c >= lit(e.literal), F.lit(False))
        if op == X.EQ:
            return F.coalesce(c == lit(e.literal), F.lit(False))
        if op == X.NOT_EQ:
            return F.coalesce(c != lit(e.literal), F.lit(False))
        if op == X.IN:
            return F.coalesce(c.isin(list(e.literals)), F.lit(False))
        if op == X.NOT_IN:
            return F.coalesce(~c.isin(list(e.literals)), F.lit(False))
        if op == X.STARTS_WITH:
            return F.coalesce(c.startswith(e.literal), F.lit(False))
        if op == X.NOT_STARTS_WITH:
            return F.coalesce(~c.startswith(e.literal), F.lit(False))
        raise ValueError(f"unhandled op {op}")

    return walk(e)


def manifest_summary_filter(spec: P.PartitionSpec, bound_row_expr: X.Expression,
                            df_schema=None):
    """Column over the manifest-LIST DF: True ⇔ manifest might contain
    matching files, judged from per-manifest partition-field summaries
    (ManifestEvaluator.java:51-141)."""
    from pyspark.sql import functions as F
    if not spec.is_partitioned:
        return F.lit(True)
    proj = P.project_inclusive(spec, bound_row_expr)

    def walk(e):
        if isinstance(e, X.AlwaysTrue):
            return F.lit(True)
        if isinstance(e, X.AlwaysFalse):
            return F.lit(False)
        if isinstance(e, X.And):
            return walk(e.left) & walk(e.right)
        if isinstance(e, X.Or):
            return walk(e.left) | walk(e.right)
        if isinstance(e, X.SqlPredicate):
            return F.lit(True)
        assert isinstance(e, X.Predicate)
        name = e.term.name if isinstance(e.term, X.Reference) else e.term.path
        if not _has(df_schema, "partitions", name):
            return F.lit(True)
        node = F.col("partitions").getField(name)
        lower, upper = node.getField("lower"), node.getField("upper")
        contains_null = node.getField("contains_null")
        lit = F.lit
        op = e.op
        if op == X.IS_NULL:
            return F.coalesce(contains_null, F.lit(True))
        if op == X.NOT_NULL:
            # summary has no "all null" marker → only prunes when lower/upper
            # exist check is impossible; keep manifest
            return F.lit(True)
        if op == X.LT:
            return _maybe(lower < lit(e.literal))
        if op == X.LT_EQ:
            return _maybe(lower <= lit(e.literal))
        if op == X.GT:
            return _maybe(upper > lit(e.literal))
        if op == X.GT_EQ:
            return _maybe(upper >= lit(e.literal))
        if op == X.EQ:
            return _maybe(lower <= lit(e.literal)) & _maybe(upper >= lit(e.literal))
        if op == X.IN:
            any_hit = None
            for v in e.literals:
                hit = _maybe(lower <= lit(v)) & _maybe(upper >= lit(v))
                any_hit = hit if any_hit is None else (any_hit | hit)
            return any_hit if any_hit is not None else F.lit(True)
        if op == X.STARTS_WITH:
            n = len(e.literal)
            return (_maybe(F.substring(lower, 1, n) <= lit(e.literal))
                    & _maybe(F.substring(upper, 1, n) >= lit(e.literal)))
        # NOT_EQ / NOT_IN / NOT_STARTS_WITH can't prune from summaries
        return F.lit(True)

    return walk(proj)
