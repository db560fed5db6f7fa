"""Metadata-only aggregates — later-Iceberg aggregate pushdown analog
(COUNT(*)/MIN/MAX answered from manifest stats, no data read).

At 100 TB, `SELECT count(*)` over a petabyte table is an O(manifest)
driver computation, not an O(data) scan.  Exactness rules (return None
and let the caller fall back to a real scan when any fail):

- COUNT(*): every candidate file must be decidable — STRICTLY matching
  (all rows counted) or provably non-matching (pruned already); files
  that merely MIGHT match make the count inexact.  Any v2 delete file
  in scope voids exactness (deleted rows are invisible to stats).
- MIN/MAX(col): bounds must be exact, which excludes truncated types
  (string/binary, MetricsModes truncate(16)) and float/double columns
  whose NaN counts are unknown (NaN-polluted bounds were already
  dropped at write time, making recorded bounds non-exhaustive); rows
  where the column is null don't participate, but all-null files must
  be recognized (null_count == value_count).
"""

from __future__ import annotations

from typing import Optional

from incubator_iceberg_spark import expressions as X
from incubator_iceberg_spark import py_eval as PE
from incubator_iceberg_spark import schema as S


def _candidates(table, spark, row_filter):
    from incubator_iceberg_spark.scan import TableScan, parse_predicate
    scan = TableScan(table, spark)
    if row_filter is not None:
        if isinstance(row_filter, str):
            row_filter = parse_predicate(row_filter)
        scan = scan.filter(row_filter)
    data, dels = scan._plan_split()
    return scan, data, dels, row_filter


def fast_count(table, filter=None, spark=None) -> Optional[int]:
    """Exact row count from metadata, or None when not exactly answerable."""
    spark = spark or table.spark
    scan, data, dels, row_filter = _candidates(table, spark, filter)
    if dels:
        return None
    total = 0
    md = table.metadata
    schema = md.schema()
    bound = X.bind(schema, row_filter) if row_filter is not None else X.always_true()
    from incubator_iceberg_spark import partitioning as PT
    strict_proj_cache: dict = {}
    for e in data:
        if isinstance(bound, X.AlwaysTrue):
            strict = True
        else:
            strict = PE.eval_strict_entry(e, bound)
            if not strict:
                spec = md.spec_by_id(e.get("spec_id", md.default_spec_id))
                if spec.is_partitioned:
                    proj = strict_proj_cache.get(spec.spec_id)
                    if proj is None:
                        proj = PT.project_strict(spec, bound)
                        strict_proj_cache[spec.spec_id] = proj
                    strict = PE.eval_partition_value(proj, e.get("partition") or {})
        if not strict:
            return None  # file might partially match: count needs data
        total += e.get("record_count") or 0
    return total


def fast_min_max(table, column: str, spark=None) -> Optional[tuple]:
    """(min, max) over non-null values from metadata, or None."""
    spark = spark or table.spark
    schema = table.metadata.schema()
    f = schema.find_field(column)
    if f is None:
        raise ValueError(f"unknown column: {column}")
    if isinstance(f.type, (S.StringType, S.BinaryType, S.FloatType, S.DoubleType)):
        return None  # truncated bounds / unknown NaN handling → inexact
    _scan, data, dels, _rf = _candidates(table, spark, None)
    if dels or not data:
        return None
    lo = hi = None
    for e in data:
        nulls = (e.get("null_counts") or {}).get(column)
        values = (e.get("value_counts") or {}).get(column)
        if nulls is not None and values is not None and nulls >= values:
            continue  # all-null file: contributes nothing
        l = (e.get("lower_bounds") or {}).get(column)
        u = (e.get("upper_bounds") or {}).get(column)
        if l is None or u is None:
            return None  # a contributing file without bounds → inexact
        lo = l if lo is None or l < lo else lo
        hi = u if hi is None or u > hi else hi
    return (lo, hi)
