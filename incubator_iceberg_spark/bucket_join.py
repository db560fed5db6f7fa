"""Storage-partitioned (bucket-affine) join over engine tables.

Reference hook: SparkBatchScan.java:89 (outputPartitioning — the
v0.11-era seam Iceberg later grew into storage-partitioned joins):
when both join sides are partitioned by the SAME bucket transform on
their join keys, the storage layout already co-locates matching rows,
and the usual whole-table shuffle is pure waste.

Spark-first expression: plain DataFrame reads cannot report an
outputPartitioning to Catalyst (Iceberg's murmur bucket ≠ Spark's hash
partitioning anyway), so the affinity is expressed STRUCTURALLY — the
join decomposes into one bucket-local join per bucket value, each side
reading only that bucket's files (planned from manifests, zero data
IO), with the smaller side broadcast.  The union of bucket-local
broadcast joins plans NO shuffle exchange at all (pinned in
tests/test_plans.py).

At 100 TB this is the difference between shuffling both sides of a
fact × fact join and moving only the per-bucket build sides: each
bucket's build slice has to fit in executor memory (size the bucket
count for that), while the probe side streams from its co-located
files — exactly the regime where a full broadcast is impossible and a
shuffle join pays the whole-table network cost.
"""

from __future__ import annotations

from typing import Optional, Sequence

#: default per-branch broadcast build budget (compressed file bytes from
#: manifest stats — decompressed build rows run larger, so keep this an
#: order of magnitude under executor memory)
DEFAULT_BROADCAST_BUDGET = 256 * 1024 * 1024
#: default cap on union branches — bounds plan size and the driver's
#: broadcast fan-out at high bucket counts (each branch is one broadcast)
DEFAULT_MAX_UNION_BRANCHES = 64


class BucketBuildOversize(ValueError):
    """A bucket's build-side slice exceeds the broadcast budget — the
    per-bucket broadcast join would OOM an executor.  Either raise the
    budget, re-bucket the build table finer, or pass
    ``on_oversize='shuffle'`` to let the oversized branches run as
    bucket-local shuffle joins (still only that bucket's slice moves)."""


def _bucket_field(table, key: str):
    """The current-spec bucket partition field sourced from ``key``;
    (field, n_buckets) or raises."""
    md = table.metadata
    schema = md.schema()
    src = schema.find_field(key)
    if src is None:
        raise ValueError(f"no such column: {key}")
    for pf in md.spec().fields:
        tname = str(pf.transform)
        if pf.source_id == src.field_id and tname.startswith("bucket["):
            return pf, int(tname[7:-1])
    raise ValueError(
        f"table {md.location!r} is not bucket-partitioned on {key!r} "
        f"(current spec: {[str(f.transform) for f in md.spec().fields]})")


def _entries_by_bucket(table, spark, bucket_field, filter=None):
    """Plan once from manifests; {bucket value: [data entries]} plus the
    scan's delete entries.  Every data file must carry the bucket value
    (files from a pre-bucket spec can't prove co-location — raise)."""
    from incubator_iceberg_spark.scan import TableScan

    scan = TableScan(table, spark)
    if filter is not None:
        scan = scan.filter(filter)
    data, dels = scan._plan_split()
    by_bucket: dict = {}
    for e in data:
        part = e.get("partition") or {}
        if bucket_field.name not in part:
            raise ValueError(
                f"data file {e['file_path']} predates the bucket spec "
                f"({bucket_field.name} missing from its partition tuple); "
                "rewrite it (rewrite_data_files) before bucket_join")
        by_bucket.setdefault(part[bucket_field.name], []).append(e)
    return by_bucket, dels


def bucket_join(table_a, table_b, key_a: str, key_b: Optional[str] = None,
                select_a: Optional[Sequence[str]] = None,
                select_b: Optional[Sequence[str]] = None,
                filter_a=None, filter_b=None, spark=None,
                broadcast_budget_bytes: int = DEFAULT_BROADCAST_BUDGET,
                max_union_branches: int = DEFAULT_MAX_UNION_BRANCHES,
                on_oversize: str = "error"):
    """INNER-join two engine tables bucket-partitioned by the same
    ``bucket[N]`` transform on their join keys, without shuffling
    either side.

    Per common bucket value: read A's files and B's files for that
    bucket (manifest-planned, co-located by the write path) and join
    with B broadcast; union the bucket-local joins.  NULL-bucket files
    hold only NULL keys (the transform derives the tuple per row) and
    are skipped — inner-join semantics.  Inner only: an outer flavor
    would have to resurrect rows of buckets the other side lacks.

    ``select_a`` / ``select_b`` prune columns BEFORE the join (the scan
    reads only those); ``filter_a`` / ``filter_b`` push predicates into
    file planning.  Same-named non-key columns of B are suffixed
    ``_b`` (plain-join convention).

    Scale guards: buckets are packed into at most
    ``max_union_branches`` union branches (LPT by build-side bytes from
    manifest stats — bounds plan size and driver broadcast fan-out at
    hundreds of buckets), and every branch's build slice is checked
    against ``broadcast_budget_bytes`` BEFORE any data is read.  A
    branch over budget raises :class:`BucketBuildOversize`
    (``on_oversize='error'``, default) or degrades to a bucket-local
    shuffle join that still moves only that branch's slices
    (``on_oversize='shuffle'``)."""
    from pyspark.sql import functions as F
    from incubator_iceberg_spark.scan import read_entries

    if on_oversize not in ("error", "shuffle"):
        raise ValueError(f"on_oversize must be 'error' or 'shuffle', "
                         f"got {on_oversize!r}")

    spark = spark or table_a.spark
    key_b = key_b or key_a
    pf_a, n_a = _bucket_field(table_a, key_a)
    pf_b, n_b = _bucket_field(table_b, key_b)
    if n_a != n_b:
        raise ValueError(
            f"bucket counts differ: {key_a}=bucket[{n_a}] vs "
            f"{key_b}=bucket[{n_b}] — co-location needs equal counts")
    by_a, dels_a = _entries_by_bucket(table_a, spark, pf_a, filter_a)
    by_b, dels_b = _entries_by_bucket(table_b, spark, pf_b, filter_b)

    md_a, md_b = table_a.metadata, table_b.metadata
    sch_a, sch_b = md_a.schema(), md_b.schema()
    cols_a = list(select_a) if select_a else [f.name for f in sch_a.fields]
    cols_b = list(select_b) if select_b else [f.name for f in sch_b.fields]
    if key_a not in cols_a:
        cols_a = [key_a] + cols_a
    if key_b not in cols_b:
        cols_b = [key_b] + cols_b
    rename_b = {c: (c + "_b" if c in cols_a and c != key_b else c)
                for c in cols_b}

    def one_branch(entries_a, entries_b, broadcast: bool):
        da = read_entries(spark, md_a, entries_a, dels_a, sch_a)
        if filter_a is not None:  # residual rows of partially-matching files
            da = da.filter(filter_a)
        da = da.select(*cols_a)
        db = read_entries(spark, md_b, entries_b, dels_b, sch_b)
        if filter_b is not None:
            db = db.filter(filter_b)
        db = db.select(*[F.col(c).alias(rename_b[c]) for c in cols_b])
        if broadcast:
            db = F.broadcast(db)
        if rename_b[key_b] == key_a:
            # same key name: USING-style join, key kept once
            return da.join(db, [key_a], "inner")
        return da.join(db, da[key_a] == db[rename_b[key_b]], "inner")

    common = sorted(b for b in by_a if b is not None and b in by_b)
    if not common:
        return one_branch([], [], True)  # empty result in the joined schema

    # LPT-pack buckets into ≤ max_union_branches branches by build-side
    # bytes (manifest stats — no data read); joining several buckets in
    # one branch is correct because key equality implies bucket equality
    def size_b(bucket):
        return sum(e.get("file_size_bytes") or 0 for e in by_b[bucket])

    n_groups = max(1, min(len(common), max_union_branches))
    groups: list[list] = [[] for _ in range(n_groups)]
    group_sz = [0] * n_groups
    for b in sorted(common, key=lambda b: (-size_b(b), str(b))):
        i = group_sz.index(min(group_sz))
        groups[i].append(b)
        group_sz[i] += size_b(b)
    packed = [(g, sz) for g, sz in zip(groups, group_sz) if g]

    parts = []
    for g, sz in sorted(packed, key=lambda t: str(t[0][0])):
        oversized = sz > broadcast_budget_bytes
        if oversized and on_oversize == "error":
            raise BucketBuildOversize(
                f"build side of bucket group {sorted(map(str, g))} is "
                f"~{sz / 1e6:.1f} MB (manifest stats) > budget "
                f"{broadcast_budget_bytes / 1e6:.1f} MB; raise "
                f"broadcast_budget_bytes, re-bucket finer, or pass "
                f"on_oversize='shuffle'")
        ea = [e for b in g for e in by_a[b]]
        eb = [e for b in g for e in by_b[b]]
        parts.append(one_branch(ea, eb, broadcast=not oversized))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
