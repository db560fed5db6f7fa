"""Time-series as-of joins — an operator family the reference lacks but a
training-data / event pipeline needs constantly (attach the latest prior
fact to every observation: last purchase before a click, last model
checkpoint before a run, last price before a trade).

Spark has no ASOF JOIN; the naive encoding is an inequality join
(``l.ts >= r.ts``) whose range-join explosion is O(|L|·|R|) per key.  The
scale-correct shape used here is the UNION + ORDERED WINDOW form:

  1. tag both sides and union them (no join at all),
  2. one hash exchange on the key,
  3. per-key ordered window with ``last(value, ignorenulls=True)`` carries
     the most recent right-side row forward onto every left row.

Cost: ONE shuffle of |L|+|R| rows and a per-key sort — the same price as
a plain equi-join, independent of how many right rows precede each left
row.  Skew note: a hot key sorts in one task; per-key cardinality bounds
task size (salting is inapplicable — order within the key is the
semantics), so pre-filter the right side to the columns/rows needed.

Semantics match pandas ``merge_asof(direction='backward')`` with
``allow_exact_matches=True``: at equal timestamps the right row counts
(right rows sort before left rows at the same instant).  Deterministic
tiebreak: among right rows sharing a timestamp the one with the largest
ordering key wins (documented, stable across engines).
"""

from __future__ import annotations


def asof_join(left, right, on, left_ts: str, right_ts: str,
              value_cols, direction: str = "backward",
              tiebreak: str | None = None, prefix: str = "asof_"):
    """For every ``left`` row, attach the most recent ``right`` row at or
    before (``backward``) / the earliest at or after (``forward``) its
    timestamp, per ``on`` key.  Returns ``left`` plus ``{prefix}{right_ts}``
    and ``{prefix}{c}`` for each value column (NULL when no right row
    qualifies).

    ``tiebreak``: right-side column ordering simultaneous right rows (the
    max wins for backward, min for forward); defaults to ``right_ts``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = [on] if isinstance(on, str) else list(on)
    value_cols = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    tiebreak = tiebreak or right_ts

    carried = F.struct(F.col(right_ts).alias("__ts"),
                       F.col(tiebreak).alias("__tb"),
                       *[F.col(c).alias(c) for c in value_cols])
    # a NULL-timestamp fact has no position on the time axis: drop it
    # (pandas merge_asof rejects NaT outright); a NULL-ts LEFT row keeps
    # flowing through and simply matches nothing (NULLs sort first).
    r = right.filter(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias("__ats"),
        F.lit(0).alias("__side"),
        carried.alias("__carry"))
    left_cols = left.columns
    l = left.select(*left_cols,  # noqa: E741
                    F.col(left_ts).alias("__ats"),
                    F.lit(1).alias("__side"),
                    F.lit(None).cast(r.schema["__carry"].dataType).alias("__carry"))
    # union by name: pad the right side with NULLs for left-only columns
    for c in left_cols:
        if c not in on:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.unionByName(r.select(l.columns))

    if direction == "backward":
        # at equal ts the right row sorts first => "at-or-before" includes it;
        # among simultaneous right rows the LAST in (__ts, __tb) order wins
        order = [F.col("__ats").asc(), F.col("__side").asc(),
                 F.col("__carry.__tb").asc_nulls_first()]
    else:
        order = [F.col("__ats").desc(), F.col("__side").asc(),
                 F.col("__carry.__tb").desc_nulls_first()]
    w = (Window.partitionBy(*on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = F.last("__carry", ignorenulls=True).over(w)

    out = (u.withColumn("__m", matched)
            .filter(F.col("__side") == 1)
            .select(*left_cols,
                    F.col(f"__m.__ts").alias(f"{prefix}{right_ts}"),
                    *[F.col(f"__m.{c}").alias(f"{prefix}{c}")
                      for c in value_cols]))
    return out


def rolling_features(df, on, ts_col: str, value_col: str, windows: dict):
    """Trailing-window per-key features as-of EVERY row — the feature-
    engineering counterpart of ``asof_join``: for each named window span
    (microseconds), the count of the key's events and the exact
    micro-unit integer sum of ``value_col`` over ``[ts - span, ts]``.

    Implementation is a RANGE-framed ordered window over
    ``unix_micros(ts)``: ONE hash exchange on the key + one sort,
    independent of window span and event density (no self-join, no
    explode-per-window).  Sums are ``sum(floor(value * 1e6))`` int64 —
    exact and engine-reproducible (a raw double running sum would be
    float-order ambiguous).  Equal timestamps are frame PEERS (standard
    RANGE semantics both in Spark and ANSI SQL), so results don't depend
    on tie order.

    ``windows``: ``{"1h": 3_600_000_000, ...}`` — emits ``n_<name>`` and
    ``sum_<name>_micro`` per entry."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    on = [on] if isinstance(on, str) else list(on)
    out = df
    ts_us = F.unix_micros(F.col(ts_col))
    v_u = F.floor(F.col(value_col) * 1_000_000).cast("long")
    for name, span in windows.items():
        w = (Window.partitionBy(*on).orderBy(ts_us)
             .rangeBetween(-int(span), 0))
        out = (out.withColumn(f"n_{name}",
                              F.count(F.lit(1)).over(w))
                  .withColumn(f"sum_{name}_micro", F.sum(v_u).over(w)))
    return out


def range_join(points, intervals, on, point_ts: str,
               start_ts: str, end_ts: str,
               grid_micros: int, iv_cols=None, prefix: str = "iv_",
               max_cells_per_interval: int = 4096):
    """Point-in-interval join: every ``points`` row paired with every
    ``intervals`` row (same ``on`` key) whose ``[start_ts, end_ts]`` span
    contains ``point_ts`` (both bounds inclusive).  INNER semantics: a
    point matching k intervals appears k times, unmatched rows on either
    side are absent.

    Spark's native plan for the inequality predicate is a broadcast
    nested-loop (or cartesian) join — O(|P|·|I|) per key and a
    non-starter at scale.  This uses the standard GRID-BUCKETED
    decomposition instead (the same trick behind Databricks' range-join
    hint and GeoSpark's 1-D grid partitioning):

      1. cell(point)    = floor(epoch_micros / G)                (1 row)
      2. cells(interval)= sequence(floor(s/G), floor(e/G))     (explode)
      3. EQUI-join on (key..., cell), then the exact containment filter.

    A point lives in exactly ONE cell, so each (point, interval) pair
    meets at most once — no dedup pass.  Cost: one hash-partitioned
    equi-join whose left side is |P| and right side is |I| · (span/G + 1);
    pick ``grid_micros`` ≈ the typical interval span so the replication
    factor stays ~2.  Intervals longer than ``max_cells_per_interval``
    cells raise (a silent explode there would be an accidental
    cross-join); widen the grid instead.  NULL timestamps and empty
    intervals (end < start) match nothing, like the inequality form.

    Returns ``points.*`` + each of ``iv_cols`` (default: all interval
    columns not in ``on``) under ``{prefix}{col}``.

    Skew: a hot (key, cell) pair hash-joins in one task; unlike
    ``asof_join`` there is no per-key ordering semantics, so standard
    salting of the POINT side (replicating the interval side per salt)
    applies if a key×cell gets pathological.
    """
    from pyspark.sql import functions as F
    from .sessions import _require_utc_for_ntz

    on = [on] if isinstance(on, str) else list(on)
    iv_cols = list(iv_cols) if iv_cols is not None else \
        [c for c in intervals.columns if c not in on]
    g = int(grid_micros)
    if g <= 0:
        raise ValueError(f"grid_micros must be positive, got {grid_micros}")

    # NTZ inputs are mapped to the instant line via the session tz; require
    # UTC so grid cells and containment agree with the SQL mirror
    _require_utc_for_ntz(points, point_ts)
    for c in (start_ts, end_ts):
        _require_utc_for_ntz(intervals, c)

    def _us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    p = (points.filter(F.col(point_ts).isNotNull())
               .withColumn("__cell", F.floor(_us(point_ts) / g)))

    s_us = _us(start_ts)
    e_us = _us(end_ts)
    c0, c1 = F.floor(s_us / g), F.floor(e_us / g)
    n_cells = c1 - c0 + 1
    # guard: an over-long interval must raise, not silently explode into
    # a near-cross-join; assert_true feeds the sequence bound so codegen
    # cannot prune it, and it only fires on the offending rows
    ok = n_cells <= F.lit(int(max_cells_per_interval))
    c1_guarded = F.when(ok, c1).otherwise(
        F.assert_true(ok, F.concat(
            F.lit("range_join: interval spans "), n_cells.cast("string"),
            F.lit(f" grid cells (> {max_cells_per_interval}); "
                  f"widen grid_micros"))).cast("long"))
    iv = (intervals
          .filter(F.col(start_ts).isNotNull() & F.col(end_ts).isNotNull()
                  & (e_us >= s_us))
          .select(*on,
                  s_us.alias("__s_us"), e_us.alias("__e_us"),
                  *[F.col(c).alias(f"__iv_{c}") for c in iv_cols],
                  F.explode(F.sequence(c0, c1_guarded)).alias("__cell")))

    pt_us = _us(point_ts)
    out = (p.join(iv, on=on + ["__cell"], how="inner")
            .filter((pt_us >= F.col("__s_us")) & (pt_us <= F.col("__e_us")))
            .drop("__cell", "__s_us", "__e_us"))
    for c in iv_cols:
        out = out.withColumnRenamed(f"__iv_{c}", f"{prefix}{c}")
    return out


def rollup_gap_fill(df, ts_col: str, key_col: str, value_col: str,
                    bucket_micros: int = 3_600_000_000,
                    max_buckets_per_key: int = 1_000_000):
    """Hypertable-style time-bucket rollup with gap filling and LOCF
    (last-observation-carried-forward) — the continuous-aggregate shape
    time-series stores expose (time_bucket + gapfill + locf), composed
    from Spark primitives.

    Per (key, bucket): n_events + the bucket mean in exact micro units
    (sum of floor(value·1e6) div n — int64 floor division, so a SQL
    oracle replays it bit-for-bit).  Missing buckets between each key's
    first and last observation materialize with n_events = 0,
    mean_micro NULL, filled = 1, and locf_mean_micro carrying the last
    observed bucket's mean forward.

    Scale shape: ONE groupBy on (key, bucket) rolls raw events up
    before anything else (the only pass over the big table); the gap
    grid is a per-key ``sequence`` explode bounded by
    ``max_buckets_per_key`` (assert_true feeds the sequence bound — a
    runaway span raises instead of exploding); LOCF is one running
    ``last(ignorenulls)`` window per key over the BUCKETED rows
    (O(span/bucket) per key, not O(events))."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    roll = (df.withColumn("__us", us)
            .withColumn("__b", F.expr(f"__us div {int(bucket_micros)}"))
            .groupBy(F.col(key_col).alias("key"), "__b")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.floor(F.col(value_col) * 1e6).cast("long"))
                 .alias("__sum_vmicro"))
            .withColumn("mean_micro", F.expr("__sum_vmicro div n_events")))
    ok = F.col("__mx") - F.col("__mn") < F.lit(int(max_buckets_per_key))
    guard = F.when(
        F.assert_true(ok, F.concat(
            F.lit("rollup_gap_fill: key "), F.col("key").cast("string"),
            F.lit(f" spans more than {max_buckets_per_key} buckets"),
        )).isNull(), F.col("__mx"))
    grid = (roll.groupBy("key")
            .agg(F.min("__b").alias("__mn"), F.max("__b").alias("__mx"))
            .select("key", F.explode(F.sequence(F.col("__mn"), guard))
                    .alias("__b")))
    w = (Window.partitionBy("key").orderBy("__b")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(roll, ["key", "__b"], "left")
            .select("key",
                    F.timestamp_micros(F.col("__b")
                                       * F.lit(int(bucket_micros)))
                    .alias("bucket_start"),
                    F.coalesce(F.col("n_events"),
                               F.lit(0).cast("long")).alias("n_events"),
                    "mean_micro",
                    F.last("mean_micro", ignorenulls=True).over(w)
                    .alias("locf_mean_micro"),
                    F.col("n_events").isNull().cast("int").alias("filled")))
