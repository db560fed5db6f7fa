"""Sessionization: batch window-function form vs streaming
applyInPandasWithState form must agree on closed sessions."""

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark.functions import sessions
from incubator_iceberg_spark.schema import Schema


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from incubator_iceberg_spark.io import load_table
    return load_table(spark, sf_dir, "events")


def test_batch_sessionize_partitions_all_events(spark, events):
    out = sessions.sessionize(events, gap_minutes=60)
    assert out.agg(F.sum("n_events")).collect()[0][0] == events.count()
    # session bounds are consistent
    bad = out.filter(F.col("session_start") > F.col("session_end")).count()
    assert bad == 0


def test_streaming_sessionize_matches_batch_closed_sessions(
        warehouse, spark, events, tmp_path):
    """Stream the events table (time-ordered snapshots) through the
    stateful operator; closed sessions must equal the batch result minus
    each user's final (still-open) session."""
    from incubator_iceberg_spark import sources
    sources.register(spark)
    ev = events.filter("user_id % 10 = 0")  # keep the state fleet small
    t = warehouse.create_table("db.sess_ev", Schema.from_spark(ev.schema))
    # time-ordered appends → micro-batches arrive in event-time order
    evu = ev.withColumn("__us", F.unix_micros("ts"))
    qs = evu.approxQuantile("__us", [0.33, 0.66], 0.001)
    t.append(evu.filter(F.col("__us") < qs[0]).drop("__us"))
    t.append(evu.filter((F.col("__us") >= qs[0]) & (F.col("__us") < qs[1])).drop("__us"))
    t.append(evu.filter(F.col("__us") >= qs[1]).drop("__us"))

    sdf = spark.readStream.format("iiws").option("path", t.location).load()
    out = sessions.sessionize_stream(sdf, gap_minutes=60)
    q = (out.writeStream.format("memory").queryName("sess_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(240)
    got = (spark.table("sess_out")
           .select("user_id", "session_start", "session_end", "n_events",
                   F.round("sum_value", 2).alias("sum_value")))

    batch = sessions.sessionize(ev, gap_minutes=60)
    last = batch.groupBy("user_id").agg(F.max("session_seq").alias("mx"))
    want = (batch.join(last, ["user_id"])
            .filter(F.col("session_seq") != F.col("mx"))
            .select("user_id", "session_start", "session_end", "n_events",
                    F.round("sum_value", 2).alias("sum_value")))
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


# ------------------------------------------------------ funnel / cohort

def test_funnel_steps_earliest_completion_and_gap(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    m = lambda minutes: base + dt.timedelta(minutes=minutes)
    rows = [
        # user 1 completes: view@0 -> click@10 -> purchase@20
        (1, m(0), "view"), (1, m(10), "click"), (1, m(20), "purchase"),
        # user 2: click BEFORE view never counts; re-click after view does
        (2, m(5), "click"), (2, m(10), "view"), (2, m(30), "click"),
        # user 3: completes but the purchase exceeds the 60-min gap
        (3, m(0), "view"), (3, m(10), "click"), (3, m(200), "purchase"),
        # user 4: never views
        (4, m(0), "click"), (4, m(1), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, "
                                     "event_type string")
    from incubator_iceberg_spark.functions import sessions as S
    got = {r["step_idx"]: r["n_users"]
           for r in S.funnel_steps(df, ["view", "click", "purchase"],
                                   max_gap_micros=60 * 60 * 1_000_000
                                   ).collect()}
    # step 1 = users 1, 2 (the re-click after the view), 3; step 2 only
    # user 1 (user 3's purchase exceeds the gap from their click)
    assert got == {0: 3, 1: 3, 2: 1}
    # ungated: user 3's late purchase now counts
    ungated = {r["step_idx"]: r["n_users"]
               for r in S.funnel_steps(df, ["view", "click", "purchase"]
                                       ).collect()}
    assert ungated == {0: 3, 1: 3, 2: 2}


def test_funnel_greedy_earliest_not_optimal(spark):
    """Earliest-completion pins step i to its EARLIEST qualifying event
    even when a later choice would let step i+1 succeed — the documented
    (and industry-standard) greedy semantics."""
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    m = lambda minutes: base + dt.timedelta(minutes=minutes)
    rows = [(1, m(0), "view"), (1, m(1), "click"),   # greedy click@1
            (1, m(100), "click"),                    # optimal would be @100
            (1, m(105), "purchase")]                 # within 10m of click#2
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, "
                                     "event_type string")
    from incubator_iceberg_spark.functions import sessions as S
    got = {r["step_idx"]: r["n_users"]
           for r in S.funnel_steps(df, ["view", "click", "purchase"],
                                   max_gap_micros=10 * 60 * 1_000_000
                                   ).collect()}
    assert got == {0: 1, 1: 1, 2: 0}     # greedy: purchase misses


def test_cohort_retention_offsets(spark):
    import datetime as dt
    wk = 7 * 86_400_000_000
    base = dt.datetime(2024, 1, 4)       # mid-week, any anchor works
    d = lambda days: base + dt.timedelta(days=days)
    rows = [(1, d(0)), (1, d(7)), (1, d(21)),      # cohort c, offsets 0,1,3
            (2, d(7)), (2, d(8)),                  # cohort c+1, offset 0 twice
            (3, d(0))]                             # cohort c, offset 0
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    from incubator_iceberg_spark.functions import sessions as S
    got = {(r["cohort"], r["period_offset"]): r["n_users"]
           for r in S.cohort_retention(df, period_micros=wk).collect()}
    c = min(k[0] for k in got)
    assert got[(c, 0)] == 2              # users 1 and 3
    assert got[(c, 1)] == 1 and got[(c, 3)] == 1
    assert got[(c + 1, 0)] == 1          # user 2 counted once
    assert (c + 1, 1) not in got
