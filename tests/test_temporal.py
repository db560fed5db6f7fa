"""As-of join (functions/temporal.py) — semantics vs pandas merge_asof,
tie handling, and the union+window shape (no inequality join)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _asof(spark, left_rows, right_rows, **kw):
    from incubator_iceberg_spark.functions import temporal
    left = spark.createDataFrame(left_rows, "id long, k long, ts long")
    right = spark.createDataFrame(right_rows, "k long, ts long, v double")
    out = temporal.asof_join(left, right, on="k", left_ts="ts",
                             right_ts="ts", value_cols=["v"], **kw)
    return {r["id"]: (r["asof_ts"], r["asof_v"]) for r in out.collect()}


def test_backward_basic(spark):
    got = _asof(spark,
                [(1, 1, 10), (2, 1, 25), (3, 1, 5), (4, 2, 10)],
                [(1, 10, 1.0), (1, 20, 2.0), (2, 50, 9.0)])
    # id=1 at ts=10: right row at exactly 10 counts (at-or-before)
    assert got[1] == (10, 1.0)
    assert got[2] == (20, 2.0)
    assert got[3] == (None, None)   # nothing at or before ts=5
    assert got[4] == (None, None)   # key 2's only right row is later


def test_forward_basic(spark):
    from incubator_iceberg_spark.functions import temporal
    left = spark.createDataFrame([(1, 1, 10), (2, 1, 25)],
                                 "id long, k long, ts long")
    right = spark.createDataFrame([(1, 10, 1.0), (1, 20, 2.0)],
                                  "k long, ts long, v double")
    out = temporal.asof_join(left, right, on="k", left_ts="ts",
                             right_ts="ts", value_cols=["v"],
                             direction="forward")
    got = {r["id"]: (r["asof_ts"], r["asof_v"]) for r in out.collect()}
    assert got[1] == (10, 1.0)      # at-or-after includes the equal row
    assert got[2] == (None, None)


def test_tiebreak_among_simultaneous_right_rows(spark):
    from incubator_iceberg_spark.functions import temporal
    left = spark.createDataFrame([(1, 1, 10)], "id long, k long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 1.0, 100), (1, 10, 2.0, 200), (1, 10, 3.0, 150)],
        "k long, ts long, v double, seq long")
    out = temporal.asof_join(left, right, on="k", left_ts="ts",
                             right_ts="ts", value_cols=["v"],
                             tiebreak="seq")
    row = out.collect()[0]
    assert row["asof_v"] == 2.0     # max tiebreak wins for backward


def test_matches_pandas_merge_asof_randomized(spark):
    import numpy as np
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    left = pd.DataFrame({
        "id": np.arange(n_l),
        "k": rng.integers(0, 12, n_l),
        "ts": rng.integers(0, 1000, n_l).astype("int64"),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 12, n_r),
        "ts": rng.integers(0, 1000, n_r).astype("int64"),
        "v": rng.random(n_r),
    })
    # dedupe right per (k, ts) so pandas/engine tie rules can't differ
    right = right.sort_values(["k", "ts"]).drop_duplicates(["k", "ts"])
    right["rts"] = right["ts"]

    from incubator_iceberg_spark.functions import temporal
    out = temporal.asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="k", left_ts="ts", right_ts="ts", value_cols=["rts", "v"])
    got = (out.toPandas().sort_values("id").reset_index(drop=True))

    exp = pd.merge_asof(left.sort_values("ts"), right.sort_values("ts"),
                        on="ts", by="k", direction="backward")
    exp = exp.sort_values("id").reset_index(drop=True)
    assert (got["asof_rts"].fillna(-1).to_numpy()
            == exp["rts"].fillna(-1).to_numpy()).all()
    pd.testing.assert_series_equal(
        got["asof_v"].rename("v"), exp["v"], check_exact=True)


def test_no_join_node_in_plan(spark):
    """The scale contract: asof is union+window, never an inequality join."""
    from incubator_iceberg_spark.functions import temporal
    left = spark.createDataFrame([(1, 1, 10)], "id long, k long, ts long")
    right = spark.createDataFrame([(1, 5, 1.0)], "k long, ts long, v double")
    out = temporal.asof_join(left, right, on="k", left_ts="ts",
                             right_ts="ts", value_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


def test_bad_direction_raises(spark):
    from incubator_iceberg_spark.functions import temporal
    left = spark.createDataFrame([(1, 1, 10)], "id long, k long, ts long")
    with pytest.raises(ValueError):
        temporal.asof_join(left, left, on="k", left_ts="ts", right_ts="ts",
                           value_cols=["id"], direction="sideways")


def test_rolling_features_vs_bruteforce(spark):
    import datetime
    import numpy as np
    rng = np.random.default_rng(13)
    n = 300
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        rows.append((i, int(rng.integers(0, 6)),
                     base + datetime.timedelta(
                         seconds=int(rng.integers(0, 7200)),
                         microseconds=int(rng.integers(0, 1_000_000))),
                     float(np.round(rng.uniform(-5, 5), 4))))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")

    from incubator_iceberg_spark.functions import temporal
    out = temporal.rolling_features(
        df, on="user_id", ts_col="ts", value_col="value",
        windows={"30m": 1_800_000_000}).collect()
    got = {r["event_id"]: (r["n_30m"], r["sum_30m_micro"]) for r in out}

    import math
    by_user = {}
    for eid, u, ts, v in rows:
        by_user.setdefault(u, []).append((ts, eid, v))
    for eid, u, ts, v in rows:
        lo = ts - datetime.timedelta(microseconds=1_800_000_000)
        in_win = [(t2, e2, v2) for t2, e2, v2 in by_user[u]
                  if lo <= t2 <= ts]
        n_w = len(in_win)
        s_w = sum(math.floor(v2 * 1_000_000) for _, _, v2 in in_win)
        assert got[eid] == (n_w, s_w), (eid, got[eid], (n_w, s_w))


def test_null_timestamps(spark):
    """NULL-ts right rows are dropped facts (pandas rejects NaT); NULL-ts
    left rows match nothing instead of 'everything before time'."""
    from incubator_iceberg_spark.functions import temporal
    left = spark.createDataFrame([(1, 1, 10), (2, 1, None)],
                                 "id long, k long, ts long")
    right = spark.createDataFrame([(1, None, 99.0), (1, 5, 1.0)],
                                  "k long, ts long, v double")
    out = temporal.asof_join(left, right, on="k", left_ts="ts",
                             right_ts="ts", value_cols=["v"])
    got = {r["id"]: (r["asof_ts"], r["asof_v"]) for r in out.collect()}
    assert got[1] == (5, 1.0)       # the NULL-ts fact never matches
    assert got[2] == (None, None)   # NULL-ts query matches nothing


# ---------------------------------------------------------------- range_join

def _ts(s):
    import datetime as dt
    return dt.datetime.fromisoformat(s)


def _naive_range_join(pts, ivs):
    """Reference semantics: all (point, interval) pairs with containment."""
    out = []
    for pid, k, t in pts:
        for iid, ik, s, e in ivs:
            if k == ik and s <= t <= e:
                out.append((pid, iid))
    return sorted(out)


def _run_range_join(spark, pts, ivs, **kw):
    from incubator_iceberg_spark.functions import temporal
    p = spark.createDataFrame(
        [(a, b, _ts(c)) for a, b, c in pts], "pid long, k long, ts timestamp")
    i = spark.createDataFrame(
        [(a, b, _ts(c), _ts(d)) for a, b, c, d in ivs],
        "iid long, k long, s timestamp, e timestamp")
    out = temporal.range_join(p, i, on="k", point_ts="ts",
                              start_ts="s", end_ts="e", **kw)
    return sorted((r["pid"], r["iv_iid"]) for r in out.collect())


def test_range_join_containment_and_bounds_inclusive(spark):
    pts = [(1, 1, "2024-01-01 10:00:00"), (2, 1, "2024-01-01 11:00:00"),
           (3, 1, "2024-01-01 12:00:00"), (4, 2, "2024-01-01 10:30:00")]
    ivs = [(10, 1, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
           (11, 1, "2024-01-01 10:30:00", "2024-01-01 12:30:00"),
           (12, 2, "2024-01-01 09:00:00", "2024-01-01 10:00:00"),
           (13, 3, "2024-01-01 00:00:00", "2024-01-02 00:00:00")]
    expect = _naive_range_join(
        [(p, k, _ts(t)) for p, k, t in pts],
        [(i, k, _ts(s), _ts(e)) for i, k, s, e in ivs])
    # both bounds inclusive: pid=1 matches iv 10 at its start, pid=2 at its end
    assert (1, 10) in expect and (2, 10) in expect
    got = _run_range_join(spark, pts, ivs, grid_micros=3600 * 1_000_000)
    assert got == expect


def test_range_join_grid_size_invariant_randomized(spark):
    import random
    rnd = random.Random(7)
    base = _ts("2024-03-01 00:00:00")
    import datetime as dt
    pts, ivs = [], []
    for pid in range(120):
        pts.append((pid, rnd.randrange(4),
                    (base + dt.timedelta(seconds=rnd.randrange(86400))
                     ).isoformat(sep=" ")))
    for iid in range(60):
        s = base + dt.timedelta(seconds=rnd.randrange(86400))
        e = s + dt.timedelta(seconds=rnd.randrange(14400))
        ivs.append((iid, rnd.randrange(4), s.isoformat(sep=" "),
                    e.isoformat(sep=" ")))
    expect = _naive_range_join(
        [(p, k, _ts(t)) for p, k, t in pts],
        [(i, k, _ts(s), _ts(e)) for i, k, s, e in ivs])
    for grid in (60_000_000, 3_600_000_000, 86_400_000_000):
        assert _run_range_join(spark, pts, ivs, grid_micros=grid) == expect


def test_range_join_empty_and_null_intervals_drop(spark):
    # end < start and NULL bounds match nothing (like the inequality form)
    from incubator_iceberg_spark.functions import temporal
    p = spark.createDataFrame([(1, 1, _ts("2024-01-01 10:00:00"))],
                              "pid long, k long, ts timestamp")
    i = spark.createDataFrame(
        [(10, 1, _ts("2024-01-01 11:00:00"), _ts("2024-01-01 09:00:00")),
         (11, 1, None, _ts("2024-01-01 12:00:00")),
         (12, 1, _ts("2024-01-01 09:00:00"), None)],
        "iid long, k long, s timestamp, e timestamp")
    out = temporal.range_join(p, i, on="k", point_ts="ts",
                              start_ts="s", end_ts="e",
                              grid_micros=3_600_000_000)
    assert out.count() == 0


def test_range_join_overlong_interval_raises(spark):
    from incubator_iceberg_spark.functions import temporal
    p = spark.createDataFrame([(1, 1, _ts("2024-01-01 10:00:00"))],
                              "pid long, k long, ts timestamp")
    i = spark.createDataFrame(
        [(10, 1, _ts("2024-01-01 00:00:00"), _ts("2025-01-01 00:00:00"))],
        "iid long, k long, s timestamp, e timestamp")
    out = temporal.range_join(p, i, on="k", point_ts="ts",
                              start_ts="s", end_ts="e",
                              grid_micros=3_600_000_000,
                              max_cells_per_interval=100)
    with pytest.raises(Exception, match="range_join|ASSERT"):
        out.count()


def test_range_join_plan_has_no_nested_loop(spark):
    from incubator_iceberg_spark.functions import temporal
    p = spark.createDataFrame([(1, 1, _ts("2024-01-01 10:00:00"))],
                              "pid long, k long, ts timestamp")
    i = spark.createDataFrame(
        [(10, 1, _ts("2024-01-01 09:00:00"), _ts("2024-01-01 11:00:00"))],
        "iid long, k long, s timestamp, e timestamp")
    out = temporal.range_join(p, i, on="k", point_ts="ts",
                              start_ts="s", end_ts="e",
                              grid_micros=3_600_000_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_rollup_gap_fill_hand_values(spark):
    """Hourly buckets with a 2-bucket gap: gap rows appear with
    n_events=0/filled=1, LOCF carries the last observed mean, and the
    mean is exact int64 floor division."""
    from incubator_iceberg_spark.functions import temporal

    h = 3_600_000_000
    rows = [
        ("k", 0 * h + 5, 1.5),       # bucket 0
        ("k", 0 * h + 9, 2.0),       # bucket 0 → mean (1.5+2.0)/2 = 1.75
        ("k", 3 * h + 1, 7.25),      # bucket 3 (buckets 1-2 are gaps)
        ("z", 10 * h, 4.0),          # independent key, single bucket
    ]
    df = spark.createDataFrame(
        [(k, ts, v) for k, ts, v in rows],
        "key string, us long, value double"
    ).selectExpr("key", "timestamp_micros(us) AS ts", "value")
    out = temporal.rollup_gap_fill(df, "ts", "key", "value",
                                   bucket_micros=h)
    got = {(r["key"], r["bucket_start"].hour):
           (r["n_events"], r["mean_micro"], r["locf_mean_micro"],
            r["filled"]) for r in out.collect()}
    assert got[("k", 0)] == (2, 1_750_000, 1_750_000, 0)
    assert got[("k", 1)] == (0, None, 1_750_000, 1)
    assert got[("k", 2)] == (0, None, 1_750_000, 1)
    assert got[("k", 3)] == (1, 7_250_000, 7_250_000, 0)
    assert got[("z", 10)] == (1, 4_000_000, 4_000_000, 0)
    assert len(got) == 5


def test_rollup_gap_fill_span_guard_raises(spark):
    from incubator_iceberg_spark.functions import temporal
    from py4j.protocol import Py4JJavaError
    import pytest

    df = spark.createDataFrame(
        [("k", 0, 1.0), ("k", 10**15, 2.0)],
        "key string, us long, value double"
    ).selectExpr("key", "timestamp_micros(us) AS ts", "value")
    with pytest.raises(Exception, match="spans more than"):
        temporal.rollup_gap_fill(df, "ts", "key", "value",
                                 bucket_micros=3_600_000_000,
                                 max_buckets_per_key=1000).collect()
