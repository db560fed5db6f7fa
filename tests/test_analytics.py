"""Exact 2-D skyline: hand cases + randomized naive-equivalence, and
salt-invariance (the local pass must be superset-preserving)."""

import duckdb
from pyspark.sql import functions as F

from incubator_iceberg_spark.functions import analytics


def _df(spark, pts):
    return spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)],
        "id long, x long, y long")


def test_skyline_hand_cases(spark):
    pts = [(1, 9), (5, 5), (9, 1),       # frontier
           (1, 8), (4, 4), (0, 0),       # dominated
           (9, 1)]                        # exact duplicate: both survive
    got = sorted((r["x"], r["y"]) for r in
                 analytics.skyline2d(_df(spark, pts), "x", "y",
                                     "id").collect())
    assert got == [(1, 9), (5, 5), (9, 1), (9, 1)]


def test_skyline_same_x_higher_y_dominates(spark):
    pts = [(5, 5), (5, 7), (3, 7)]
    got = sorted((r["x"], r["y"]) for r in
                 analytics.skyline2d(_df(spark, pts), "x", "y",
                                     "id").collect())
    # (5,7) dominates both (5,5) and (3,7)
    assert got == [(5, 7)]


def test_skyline_matches_naive_and_salt_invariant(spark):
    base = spark.range(0, 400).select(
        F.col("id"),
        ((F.col("id") * 37) % 59).alias("x"),
        ((F.col("id") * 101 + 7) % 53).alias("y"))
    rows = [(r["id"], r["x"], r["y"]) for r in base.collect()]
    naive = {r for r in rows
             if not any(d[1] >= r[1] and d[2] >= r[2]
                        and (d[1] > r[1] or d[2] > r[2]) for d in rows)}
    for salt in (1, 8, 64):
        got = {(r["id"], r["x"], r["y"]) for r in
               analytics.skyline2d(base, "x", "y", "id",
                                   salt=salt).collect()}
        assert got == naive, f"salt={salt}"


def test_copurchase_lift_hand_values(spark):
    from incubator_iceberg_spark.functions import graph as G
    # orders: 1:{A,B} 2:{A,B} 3:{A,C} 4:{B}  (A=1 B=2 C=3)
    rows = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3), (4, 2),
            (2, 1)]  # duplicate line item: distinct collapses it
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {(r["part_a"], r["part_b"]):
           (r["n_a"], r["n_b"], r["n_co"], r["conf_ab_micro"],
            r["conf_ba_micro"]) for r in
           G.copurchase_lift(li, min_support=2).collect()}
    # only (A,B) reaches support 2: n_a=3, n_b=3, co=2
    assert out == {(1, 2): (3, 3, 2, 666_666, 666_666)}


def test_percentile_exact_matches_sorted_oracle(spark):
    import random
    rng = random.Random(77)
    # mixed domain: wide uniform + a hot tie value + negatives + dupes
    vals = ([rng.randrange(-10**12, 10**12) for _ in range(4000)]
            + [42] * 1500 + [rng.randrange(-50, 50) for _ in range(1500)])
    df = spark.createDataFrame([(v,) for v in vals], "v long").repartition(16)
    ps = [0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0]
    got = analytics.percentile_exact(df, "v", ps)
    svals = sorted(vals)
    n = len(svals)
    from fractions import Fraction
    for p, r in zip(ps, got):
        f = Fraction(str(p))
        k = 1 + (f.numerator * (n - 1)) // f.denominator
        assert r["rank"] == k
        assert r["value"] == svals[k - 1], (p, r, svals[k - 1])


def test_percentile_exact_full_int64_domain(spark):
    """Overflow guard: a domain spanning more than half the int64 range
    (hash-derived keys) must split at 0 instead of letting the bucket
    offset wrap in non-ANSI Spark (silently wrong quantiles)."""
    import random
    rng = random.Random(99)
    lo, hi = -(2 ** 62) - 7, 2 ** 62 + 11   # mx - mn > 2^63 - 1
    vals = ([lo, hi]
            + [rng.randrange(-2 ** 62, 2 ** 62) for _ in range(3000)]
            + [-(2 ** 61)] * 400)           # hot value in the negative half
    df = spark.createDataFrame([(v,) for v in vals], "v long").repartition(8)
    ps = [0.0, 0.1, 0.5, 0.9, 1.0]
    got = analytics.percentile_exact(df, "v", ps)
    svals = sorted(vals)
    n = len(svals)
    from fractions import Fraction
    for p_, r in zip(ps, got):
        f = Fraction(str(p_))
        k = 1 + (f.numerator * (n - 1)) // f.denominator
        assert r["value"] == svals[k - 1], (p_, r, svals[k - 1])


def test_percentile_exact_narrow_domain_and_small_n(spark):
    # all-equal column resolves in the shared pass; n=1 and n=2 edges
    df = spark.createDataFrame([(7,)] * 100, "v long")
    assert [r["value"] for r in
            analytics.percentile_exact(df, "v", [0.5])] == [7]
    df1 = spark.createDataFrame([(3,), (None,)], "v long")
    out = analytics.percentile_exact(df1, "v", [0.0, 1.0])
    assert [r["value"] for r in out] == [3, 3]  # nulls excluded from n
    df2 = spark.createDataFrame([(1,), (2,)], "v long")
    out = analytics.percentile_exact(df2, "v", [0.5, 1.0])
    assert [r["value"] for r in out] == [1, 2]  # lower order statistic
