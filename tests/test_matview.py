"""Incremental materialized-view maintenance (matview.py): every
refresh must leave the MV bit-identical to a from-scratch rebuild, under
appends, MoR/CoW deletes, group-moving updates, and compaction (which
must fold in as a no-op delta)."""

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark import matview
from incubator_iceberg_spark.schema import Schema


def _mk(warehouse, spark, rows):
    df = spark.createDataFrame(rows, "id long, grp string, v long")
    t = warehouse.create_table("db.mvbase", Schema.from_spark(df.schema))
    t.append(df)
    return t


def _rebuild(t):
    return {(r["grp"]): (r["n_rows"], r["sum_v"]) for r in
            t.to_df().groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("v").alias("sum_v")).collect()}


def _mv_state(mv):
    return {(r["grp"]): (r["n_rows"], r["sum_v"])
            for r in mv.to_df().collect()}


def test_matview_tracks_rebuild_through_ops(warehouse, spark):
    t = _mk(warehouse, spark,
            [(i, "ab"[i % 2], i * 10) for i in range(20)])
    mv = matview.create_agg_mv(warehouse, "db.mv", t, ["grp"], ["v"])
    assert _mv_state(mv) == _rebuild(t)

    # append introducing a NEW group
    t.append(spark.createDataFrame(
        [(100 + i, "c", 7) for i in range(5)],
        "id long, grp string, v long"))
    r = matview.refresh_agg_mv(mv, t)
    assert r["refreshed"] and r["groups_changed"] == 1
    assert _mv_state(mv) == _rebuild(t)

    # MoR delete emptying group c entirely -> MV row must disappear
    t.delete_where("grp = 'c'", mode="merge-on-read")
    matview.refresh_agg_mv(mv, t)
    state = _mv_state(mv)
    assert "c" not in state and state == _rebuild(t)

    # CoW update moving rows between groups
    t.update({"grp": "'z'"}, "id % 4 = 0", mode="copy-on-write")
    matview.refresh_agg_mv(mv, t)
    assert _mv_state(mv) == _rebuild(t)

    # compaction: contents unchanged -> zero-delta refresh, watermark
    # still advances
    t.rewrite_data_files(min_input_files=2)
    r = matview.refresh_agg_mv(mv, t)
    assert r["refreshed"] and r["groups_changed"] == 0
    assert _mv_state(mv) == _rebuild(t)
    assert int(mv.metadata.properties[matview.PROP_BASE_SNAPSHOT]) \
        == t.metadata.current_snapshot_id

    # idempotent: nothing new
    assert matview.refresh_agg_mv(mv, t) == {"refreshed": False,
                                             "groups_changed": 0}


def test_matview_value_update_changes_sums_only(warehouse, spark):
    t = _mk(warehouse, spark, [(i, "a", 10) for i in range(8)])
    mv = matview.create_agg_mv(warehouse, "db.mv2", t, ["grp"], ["v"])
    t.update({"v": "v + 5"}, "id < 4", mode="merge-on-read")
    matview.refresh_agg_mv(mv, t)
    assert _mv_state(mv) == _rebuild(t) == {"a": (8, 100)}


def test_matview_rejects_float_measures(warehouse, spark):
    df = spark.createDataFrame([(1, "a", 1.5)],
                               "id long, grp string, v double")
    t = warehouse.create_table("db.mvf", Schema.from_spark(df.schema))
    t.append(df)
    with pytest.raises(ValueError, match="integer-typed"):
        matview.create_agg_mv(warehouse, "db.mvf_mv", t, ["grp"], ["v"])
