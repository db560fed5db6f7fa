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
