"""Multi-objective analytics: exact 2-D skyline (Pareto frontier).

The skyline of a set under two maximize-objectives is every row not
strictly dominated by another (dominator ≥ in both dimensions, > in at
least one).  The classic distributed algorithm: a LOCAL skyline per
block first (any partition of the rows — each local skyline is a
superset-preserving filter, since a dominator within a block also
dominates globally), then the global skyline over the few survivors.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _skyline_pass(df, x: str, y: str, part_cols):
    """Keep rows of ``df`` not strictly dominated within each partition
    group (no group: global).  Integer x required (the RANGE frame's
    ``x' > x`` bound is value-based).

    Rule: with m1 = max(y) over rows with x' > x (same group) and
    m2 = max(y) over rows with x' = x:  a row survives iff
    (m1 is NULL or y > m1) and y = m2 — equal points are NOT dominators
    (both survive), a higher-y twin at the same x is."""
    wgt = (Window.partitionBy(*part_cols).orderBy(F.col(x).desc())
           .rangeBetween(Window.unboundedPreceding, -1))
    weq = Window.partitionBy(*(list(part_cols) + [x]))
    return (df.withColumn("__m1", F.max(y).over(wgt))
            .withColumn("__m2", F.max(y).over(weq))
            .filter((F.col("__m1").isNull() | (F.col(y) > F.col("__m1")))
                    & (F.col(y) == F.col("__m2")))
            .drop("__m1", "__m2"))


def skyline2d(df, x_col: str, y_col: str, id_col: str, salt: int = 64):
    """Exact skyline maximizing (x_col, y_col), both integer-valued.

    Scale shape: pass 1 computes a local skyline inside ``salt``
    hash-groups of the id (window-partition parallel — each group's
    survivors are a superset of its global-skyline members, so nothing
    is lost); pass 2 runs the same filter globally over the
    O(salt · frontier) survivors.  No all-pairs join anywhere; the
    oracle is the NOT EXISTS dominance definition, which must agree
    exactly."""
    base = df.select(F.col(id_col).alias("id"),
                     F.col(x_col).cast("long").alias("x"),
                     F.col(y_col).cast("long").alias("y"))
    salted = base.withColumn("__g", F.pmod(F.hash(F.col("id")),
                                           F.lit(int(salt))))
    local = _skyline_pass(salted, "x", "y", ["__g"]).drop("__g")
    out = _skyline_pass(local, "x", "y", [])
    return out.select(F.col("id").alias(id_col),
                      F.col("x").alias(x_col), F.col("y").alias(y_col))


def percentile_exact(df, col: str, ps, buckets: int = 4096,
                     max_passes: int = 8):
    """EXACT p-quantiles of an int64 column by multi-pass histogram
    narrowing — the distributed selection algorithm, no global sort.

    Semantics: type-1 / lower order statistic — the k-th smallest value
    with k = 1 + floor(p * (n - 1)) over non-null rows (DuckDB
    ``ORDER BY c LIMIT 1 OFFSET k-1`` equivalent; exact under ties).

    Scale shape (the reason this exists): a global ``orderBy`` of 100 TB
    shuffles everything to compute one number.  Here pass 1 is a single
    min/max/count aggregate, pass 2 one map-side-combined histogram
    aggregate shared by ALL requested percentiles, and each further pass
    scans only the narrowed value range — a ``BETWEEN`` predicate Spark
    pushes to parquet row-group stats, so refinement passes read a
    shrinking fraction of the data.  Each pass divides the candidate
    domain by ``buckets`` (4096), so int64 resolves in <= 6 passes; the
    driver holds <= ``buckets`` histogram rows per pass.  Skew-proof: a
    hot value collapses its bucket to width 1, which resolves exactly.

    ``ps`` are decimal-string-exact fractions (0.5, 0.9, 0.99): ranks are
    computed with integer arithmetic via Fraction(str(p)) — no float
    rank-off-by-one at large n.

    Returns a list of dicts {"p_bp": p in basis points, "rank": k,
    "value": the exact order statistic}.
    """
    from fractions import Fraction

    c = F.col(col)
    base = df.filter(c.isNotNull())
    head = base.agg(F.count(c).alias("n"), F.min(c).alias("mn"),
                    F.max(c).alias("mx")).collect()[0]
    n, mn, mx = head["n"], head["mn"], head["mx"]
    if n == 0:
        return []

    fracs = [Fraction(str(p)) for p in ps]
    ranks = {f: 1 + (f.numerator * (n - 1)) // f.denominator for f in fracs}

    def histogram(lo: int, hi: int, width: int) -> dict:
        b = F.expr(f"(CAST({col} AS BIGINT) - CAST({lo} AS BIGINT)) "
                   f"div CAST({width} AS BIGINT)")
        rows = (base.filter((c >= lo) & (c <= hi))
                .groupBy(b.alias("__b")).count().collect())
        return {r["__b"]: r["count"] for r in rows}

    def narrow(lo, hi, r, hist, width):
        """One narrowing step: walk the collected histogram to the bucket
        holding rank r; returns (lo', hi', r')."""
        for b in sorted(hist):
            if r <= hist[b]:
                return (lo + b * width,
                        min(hi, lo + (b + 1) * width - 1), r)
            r -= hist[b]
        raise AssertionError("rank walked past histogram; concurrent "
                             "mutation of the input?")

    # Overflow guard: the bucket expression computes (col - lo) in
    # int64; when the column domain spans more than half the int64
    # range (mx - mn > 2^63-1, e.g. hash-derived keys), non-ANSI Spark
    # would wrap silently and mis-bucket.  Split the domain at 0 — each
    # half's width fits int64 by construction — route each rank to its
    # half with one extra count, and narrow within the half.
    INT64_MAX = 2 ** 63 - 1
    split = (mx - mn) > INT64_MAX
    n_neg = base.filter(c < 0).count() if split else 0

    # pass 2 is shared: percentiles starting in the same range reuse it
    shared: dict = {}

    def shared_hist(lo, hi, total):
        key = (lo, hi)
        if key not in shared:
            w = max(1, (hi - lo) // buckets + 1)
            shared[key] = ((histogram(lo, hi, w) if hi > lo else {0: total}),
                           w)
        return shared[key]

    out = []
    for f in fracs:
        r = ranks[f]
        if split:
            if r <= n_neg:
                lo0, hi0, total = mn, -1, n_neg
            else:
                lo0, hi0, total = 0, mx, n - n_neg
                r -= n_neg
        else:
            lo0, hi0, total = mn, mx, n
        hist0, width0 = shared_hist(lo0, hi0, total)
        lo, hi, r = narrow(lo0, hi0, r, hist0, width0)
        passes = 1
        while hi - lo + 1 > buckets:
            if passes >= max_passes:  # unreachable: domain /= 4096 per pass
                raise AssertionError("histogram narrowing did not converge")
            width = max(1, (hi - lo) // buckets + 1)
            lo, hi, r = narrow(lo, hi, r, histogram(lo, hi, width), width)
            passes += 1
        # domain <= buckets distinct values: exact value counting
        counts = histogram(lo, hi, 1)
        value = None
        for b in sorted(counts):
            if r <= counts[b]:
                value = lo + b
                break
            r -= counts[b]
        assert value is not None
        out.append({
            "p_bp": int(f * 10000) if (f * 10000).denominator == 1
            else None,
            "rank": ranks[f],
            "value": value,
        })
    return out


def percentile_exact_df(spark, df, col: str, ps, buckets: int = 4096):
    """percentile_exact as a DataFrame (p_bp, rank, value) for the driver
    contract; ps must be basis-point-exact (multiples of 0.0001)."""
    rows = percentile_exact(df, col, ps, buckets=buckets)
    return spark.createDataFrame(
        [(r["p_bp"], r["rank"], r["value"]) for r in rows],
        "p_bp long, rank long, value long")
