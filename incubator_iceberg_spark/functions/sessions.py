"""Gap-based sessionization over event streams (M9 extension).

Two forms over the same semantics (a session ends when the user is idle
longer than ``gap_minutes``):

- ``sessionize(df)`` — BATCH: lag + running-sum window functions, fully
  JVM-side (no UDFs), oracle-checkable in ANSI SQL.
- ``sessionize_stream(sdf)`` — STREAMING: ``applyInPandasWithState``
  custom stateful operator (per-user state = open session accumulator);
  emits a session when a later event closes it.  The open (final)
  session per user stays in state — at 100 TB this is the
  bounded-state path: state size is O(active users), not O(events).

The reference has no sessionization; this follows the Structured
Streaming arbitrary-state pattern the brief's north star asks for.
"""

from __future__ import annotations

GAP_MINUTES_DEFAULT = 60


def _require_utc_for_ntz(df, ts_col: str) -> None:
    """The NTZ→instant cast is only linear when the session tz has no DST:
    require UTC rather than silently shifting gap boundaries.  Must run
    BEFORE any cast to tz-aware timestamp (the cast erases the evidence)."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "")
        if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
            raise ValueError(
                f"TIMESTAMP_NTZ {ts_col!r} requires spark.sql.session.timeZone"
                f"=UTC for gap sessionization (got {tz!r})")


def assign_sessions(df, user_col: str = "user_id", ts_col: str = "ts",
                    gap_minutes: int = GAP_MINUTES_DEFAULT):
    """Per-event session sequence number (1-based per user)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    _require_utc_for_ntz(df, ts_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(us)
    prev = F.lag(us).over(w)
    new_s = F.when(prev.isNull() | ((us - prev) > gap_minutes * 60_000_000), 1) \
        .otherwise(0)
    run = Window.partitionBy(user_col).orderBy(us) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_seq", F.sum(new_s).over(run).cast("long"))


def sessionize(df, user_col: str = "user_id", ts_col: str = "ts",
               value_col: str = "value",
               gap_minutes: int = GAP_MINUTES_DEFAULT):
    """Per-session aggregate: start/end, event count, value sum.

    ``ts_col`` is cast to tz-aware TIMESTAMP up front so batch output types
    match ``sessionize_stream``'s schema for TIMESTAMP_NTZ inputs too."""
    from pyspark.sql import functions as F

    _require_utc_for_ntz(df, ts_col)  # BEFORE the cast erases NTZ-ness
    df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    tagged = assign_sessions(df, user_col, ts_col, gap_minutes)
    return (tagged.groupBy(user_col, "session_seq")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count("*").alias("n_events"),
                 F.round(F.sum(value_col), 2).alias("sum_value")))


def sessionize_stream(sdf, user_col: str = "user_id", ts_col: str = "ts",
                      value_col: str = "value",
                      gap_minutes: int = GAP_MINUTES_DEFAULT):
    """Streaming sessionization with ``applyInPandasWithState``.

    Emits CLOSED sessions only (a session closes when a strictly later
    event arrives past the gap); each user's open session persists in
    state across micro-batches.  Late events inside the open session
    fold in; events older than the open session's start are counted into
    it as well (no watermark here — callers needing bounded lateness put
    ``withWatermark`` upstream)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60_000_000
    out_schema = (f"{user_col} long, session_start timestamp, "
                  "session_end timestamp, n_events long, sum_value double")
    state_schema = "start long, last long, n long, sv double"

    def fn(key, pdfs, state):
        if state.exists:
            start, last, n, sv = state.get
        else:
            start = last = None
            n, sv = 0, 0.0
        closed = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(ts_col)
            for ts, val in zip(pdf[ts_col], pdf[value_col]):
                us = int(pd.Timestamp(ts).value // 1000)
                if last is not None and us - last > gap_us:
                    closed.append((key[0], start, last, n, round(sv, 6)))
                    start, n, sv = None, 0, 0.0
                if start is None or us < start:
                    start = us
                if last is None or us > last:
                    last = us
                n += 1
                sv += float(val)
        state.update((start, last, n, sv))
        if closed:
            yield pd.DataFrame({
                user_col: [c[0] for c in closed],
                "session_start": [pd.to_datetime(c[1], unit="us", utc=True)
                                  for c in closed],
                "session_end": [pd.to_datetime(c[2], unit="us", utc=True)
                                for c in closed],
                "n_events": [c[3] for c in closed],
                "sum_value": [c[4] for c in closed],
            })

    return (sdf.groupBy(user_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def funnel_steps(df, steps, user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type", max_gap_micros: int = None):
    """Ordered funnel analysis with the standard earliest-completion
    semantics: a user reaches step i when an event of ``steps[i]``
    occurs AT OR AFTER their step-(i-1) reach time (optionally within
    ``max_gap_micros`` of it).  Returns one row per step:
    (step_idx, step, n_users) — monotone non-increasing.

    Greedy earliest-completion is the classic funnel definition (each
    step pins to its EARLIEST qualifying event); it is deterministic,
    engine-reproducible, and what the SQL mirror replays.

    Scale shape: one conditional min-aggregate per step, each keyed on
    the user — len(steps) hash aggregates + (len(steps)-1) user-keyed
    joins, all map-side combinable; no windows, no per-user sort.  The
    step count is small and fixed, so the pass count is too; the event
    stream itself is only scanned once per step with the type filter
    pushed to the scan."""
    from pyspark.sql import functions as F

    if not steps:
        raise ValueError("funnel_steps needs at least one step")
    _require_utc_for_ntz(df, ts_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = df.select(F.col(user_col).alias("__u"),
                   F.col(type_col).alias("__ty"), us.alias("__us"))

    reach = (ev.filter(F.col("__ty") == steps[0])
               .groupBy("__u").agg(F.min("__us").alias("__t")))
    counts = [reach.count()]
    for i in range(1, len(steps)):
        nxt = ev.filter(F.col("__ty") == steps[i])
        j = nxt.join(reach, "__u").filter(F.col("__us") >= F.col("__t"))
        if max_gap_micros is not None:
            j = j.filter(F.col("__us") <= F.col("__t") + int(max_gap_micros))
        reach = j.groupBy("__u").agg(F.min("__us").alias("__t"))
        counts.append(reach.count())
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i, s, int(c)) for i, (s, c) in enumerate(zip(steps, counts))],
        "step_idx int, step string, n_users long")


def cohort_retention(df, user_col: str = "user_id", ts_col: str = "ts",
                     period_micros: int = 7 * 86_400_000_000):
    """Cohort retention: users grouped by the period of their FIRST
    event (the cohort), counted in each later period they were active.
    Returns (cohort, period_offset, n_users) where cohort is the epoch
    period index and offset 0 is the cohort period itself.

    Scale shape: one user-keyed min-aggregate (first activity), one
    user-keyed join to stamp the cohort, then a distinct-user count per
    (cohort, offset) — the user-keyed exchange is reused by Spark for
    the aggregate and the join, and the final aggregate's key space is
    tiny (periods²)."""
    from pyspark.sql import functions as F

    _require_utc_for_ntz(df, ts_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    p = int(period_micros)
    ev = df.select(F.col(user_col).alias("__u"),
                   F.floor(us / p).cast("long").alias("__p"))
    first = ev.groupBy("__u").agg(F.min("__p").alias("__cohort"))
    return (ev.join(first, "__u")
            .groupBy(F.col("__cohort").alias("cohort"),
                     (F.col("__p") - F.col("__cohort"))
                     .cast("long").alias("period_offset"))
            .agg(F.count_distinct(F.col("__u")).alias("n_users")))
