"""Merge-on-read upsert sink (streaming.upsert_mor_exactly_once) — the
Flink upsert-materialize shape (flink sink equality-delete mode;
api/.../RowDelta.java): one eq-delete + append commit per epoch, target
never read.
"""

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark import streaming as STR
from incubator_iceberg_spark.io import load_table
from incubator_iceberg_spark.manifests import (DATA, EQUALITY_DELETES)
from incubator_iceberg_spark.scan import TableScan
from incubator_iceberg_spark.schema import Schema


def _mk(warehouse, spark, sf_dir, name, n=120):
    orders = load_table(spark, sf_dir, "orders")
    base = orders.orderBy("o_orderkey").limit(n)
    t = warehouse.create_table(name, Schema.from_spark(base.schema))
    t.append(base)
    return t, base


def _split(t, spark):
    data, dels = TableScan(t, spark)._plan_split()
    return data, dels


def test_upsert_mor_basic_update_and_insert(warehouse, spark, sf_dir):
    t, base = _mk(warehouse, spark, sf_dir, "db.um1")
    before_data, _ = _split(t, spark)
    before_paths = {e["file_path"] for e in before_data}

    batch = (base.limit(30)
             .withColumn("o_totalprice", F.col("o_totalprice") * 2)
             .unionByName(base.limit(10)
                          .withColumn("o_orderkey",
                                      F.col("o_orderkey") + 5_000_000)))
    assert STR.upsert_mor_exactly_once(t, batch, epoch_id=1,
                                       on=["o_orderkey"]) is True

    # MoR: every pre-existing data file is still live (never rewritten),
    # and the commit added exactly one eq-delete file keyed on the batch
    data, dels = _split(t, spark)
    assert before_paths <= {e["file_path"] for e in data}
    eq = [e for e in dels if e.get("content") == EQUALITY_DELETES]
    assert len(eq) == 1 and eq[0]["record_count"] == 40

    out = t.to_df()
    assert out.count() == 130  # 120 base + 10 inserts, 30 replaced in place
    doubled = (out.join(base.limit(30).select(
        "o_orderkey", F.col("o_totalprice").alias("old")), "o_orderkey")
        .filter("abs(o_totalprice - 2*old) < 1e-6"))
    assert doubled.count() == 30


def test_upsert_mor_cdc_deletes_and_replay(warehouse, spark, sf_dir):
    t, base = _mk(warehouse, spark, sf_dir, "db.um2")
    keys = [r[0] for r in base.select("o_orderkey")
            .orderBy("o_orderkey").collect()]
    upd, dead = keys[:15], keys[15:25]
    batch = (base.filter(F.col("o_orderkey").isin(upd))
             .withColumn("o_orderpriority", F.lit("u1")).withColumn("op", F.lit("U"))
             .unionByName(base.filter(F.col("o_orderkey").isin(dead))
                          .withColumn("op", F.lit("D"))))
    assert STR.upsert_mor_exactly_once(t, batch, epoch_id=1,
                                       on=["o_orderkey"], op_col="op")
    out = t.to_df()
    assert out.count() == 110
    assert out.filter(F.col("o_orderkey").isin(dead)).count() == 0
    assert out.filter("o_orderpriority = 'u1'").count() == 15

    # replay: same epoch id is a no-op commit-wise
    before = t.metadata.current_snapshot_id
    assert STR.upsert_mor_exactly_once(t, batch, epoch_id=1,
                                       on=["o_orderkey"], op_col="op") is False
    assert t.refresh().metadata.current_snapshot_id == before


def test_upsert_mor_same_batch_last_wins(warehouse, spark, sf_dir):
    t, base = _mk(warehouse, spark, sf_dir, "db.um3")
    k = [r[0] for r in base.select("o_orderkey").orderBy("o_orderkey")
         .limit(1).collect()][0]
    one = base.filter(F.col("o_orderkey") == k)
    batch = (one.withColumn("o_orderpriority", F.lit("v1"))
             .withColumn("_ord", F.lit(1))
             .unionByName(one.withColumn("o_orderpriority", F.lit("v2"))
                          .withColumn("_ord", F.lit(2))))
    assert STR.upsert_mor_exactly_once(t, batch.withColumn("op", F.lit("U")),
                                       epoch_id=1, on=["o_orderkey"],
                                       op_col="op", order_col="_ord")
    vals = [r[0] for r in t.to_df().filter(F.col("o_orderkey") == k)
            .select("o_orderpriority").collect()]
    assert vals == ["v2"]


def test_upsert_mor_multi_epoch_then_convert(warehouse, spark, sf_dir):
    """Three epochs of upserts, then convert_equality_deletes folds the
    eq debt into position form and the data still reads identically —
    the write/maintain split this sink is designed around."""
    t, base = _mk(warehouse, spark, sf_dir, "db.um4")
    for ep in (1, 2, 3):
        batch = (base.filter(f"o_orderkey % {ep + 2} = 0")
                 .withColumn("o_orderpriority", F.lit(f"e{ep}")))
        assert STR.upsert_mor_exactly_once(t, batch, epoch_id=ep,
                                           on=["o_orderkey"])
    expect = t.to_df().orderBy("o_orderkey").collect()
    _, dels = _split(t, spark)
    assert sum(1 for e in dels
               if e.get("content") == EQUALITY_DELETES) == 3

    res = t.convert_equality_deletes()
    assert res["converted_eq_files"] == 3
    _, dels2 = _split(t, spark)
    assert not any(e.get("content") == EQUALITY_DELETES for e in dels2)
    assert t.to_df().orderBy("o_orderkey").collect() == expect


def test_upsert_mor_empty_table_skips_delete_file(warehouse, spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    base = orders.orderBy("o_orderkey").limit(40)
    t = warehouse.create_table("db.um5", Schema.from_spark(base.schema))
    assert STR.upsert_mor_exactly_once(t, base, epoch_id=0,
                                       on=["o_orderkey"])
    data, dels = _split(t, spark)
    assert dels == [] and all(e.get("content", DATA) == DATA for e in data)
    assert t.to_df().count() == 40


def test_upsert_mor_requires_keys(warehouse, spark, sf_dir):
    t, base = _mk(warehouse, spark, sf_dir, "db.um6", n=10)
    with pytest.raises(ValueError, match="identifier"):
        STR.upsert_mor_exactly_once(t, base, epoch_id=1)
    with pytest.raises(ValueError, match="not in schema"):
        STR.upsert_mor_exactly_once(t, base, epoch_id=1, on=["nope"])


def test_upsert_mor_rebases_across_rename(warehouse, spark, sf_dir):
    """A batch built before a concurrent rename still lands: stale
    column names (including the key) resolve by field-id through the
    caller-visible schema, the recovery the merge-schema append path
    established."""
    t, base = _mk(warehouse, spark, sf_dir, "db.um7", n=30)
    batch = (base.limit(5)
             .withColumn("o_totalprice", F.col("o_totalprice") + 1.0))
    # rename lands through a CONCURRENT handle after the batch was
    # built: the sink's refresh is what picks it up
    t2 = warehouse.load_table("db.um7")
    t2.update_schema().rename_column("o_totalprice", "price").commit()
    assert STR.upsert_mor_exactly_once(t, batch, epoch_id=1,
                                       on=["o_orderkey"])
    out = t.to_df()
    assert "price" in out.columns
    bumped = (out.join(base.limit(5).select(
        "o_orderkey", F.col("o_totalprice").alias("old")), "o_orderkey")
        .filter("abs(price - (old + 1.0)) < 1e-6"))
    assert bumped.count() == 5


def test_epoch_replay_skipped_after_snapshot_expiry(warehouse, spark):
    """Exactly-once must survive expire_snapshots: the max committed
    epoch is persisted per query_id in table properties, so a late
    foreachBatch replay of an old epoch is a no-op even after the
    snapshots carrying the streaming.epoch-id markers expired
    (ADVICE r6: the scan-only check re-committed in that window)."""
    from incubator_iceberg_spark import streaming as STR

    t = warehouse.create_table("db.exp_once", "k long, v long")
    b0 = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    b1 = spark.createDataFrame([(3, 30)], "k long, v long")
    assert STR.append_exactly_once(t, b0, 0, query_id="qx") is True
    assert STR.append_exactly_once(t, b1, 1, query_id="qx") is True
    assert t.metadata.properties[STR.EPOCH_PROP_PREFIX + "qx"] == "1"

    # expire every marker-carrying snapshot (keep only the property
    # commit's head state)
    t.expire_snapshots(older_than_ms=10**18, retain_last=1)
    assert not any(STR.EPOCH_KEY in s.summary
                   for s in t.metadata.snapshots[:-1])

    # late replays of both epochs are no-ops
    assert STR.append_exactly_once(t, b0, 0, query_id="qx") is False
    assert STR.append_exactly_once(t, b1, 1, query_id="qx") is False
    assert t.to_df().count() == 3
    # a genuinely new epoch still commits, and per-query isolation holds
    assert STR.append_exactly_once(t, b1, 2, query_id="qx") is True
    assert STR.append_exactly_once(t, b0, 0, query_id="other") is True


def test_auto_maintain_hook_bounds_eq_debt(warehouse, spark, sf_dir):
    """maintenance.auto.every-epochs=N: every Nth committed epoch runs
    the manifest-plane auto_maintain pass from INSIDE the sink loop —
    accrued eq-delete files stay bounded across many upsert epochs
    without an external scheduler."""
    t, base = _mk(warehouse, spark, sf_dir, "db.amh")
    t.update_properties({"maintenance.auto.every-epochs": "4",
                         "maintenance.auto.eq-debt-files": "3",
                         "maintenance.auto.min-small-files": "1000",
                         "maintenance.auto.max-manifests": "1000",
                         "maintenance.auto.max-snapshots": "1000"})
    max_eq_seen = 0
    for epoch in range(1, 13):
        batch = (base.limit(20)
                 .withColumn("o_totalprice",
                             F.col("o_totalprice") + epoch))
        assert STR.upsert_mor_exactly_once(t, batch, epoch_id=epoch,
                                           on=["o_orderkey"], spark=spark)
        _, dels = _split(t.refresh(), spark)
        n_eq = len([e for e in dels
                    if (e.get("content") or 0) == EQUALITY_DELETES])
        max_eq_seen = max(max_eq_seen, n_eq)
    # without the hook 12 epochs accrue 12 eq files; the every-4 cadence
    # converts them, so the high-water mark stays under one cadence + gate
    assert max_eq_seen <= 7, max_eq_seen
    _, dels = _split(t.refresh(), spark)
    n_eq_final = len([e for e in dels
                      if (e.get("content") or 0) == EQUALITY_DELETES])
    assert n_eq_final <= 3, n_eq_final
    # replay guard still intact through maintenance commits
    assert not STR.upsert_mor_exactly_once(t, base.limit(5), epoch_id=12,
                                           on=["o_orderkey"], spark=spark)
    # rows correct: every key upserted once, plus the survivors
    assert t.refresh().to_df().count() == 120


def test_auto_maintain_hook_off_by_default(warehouse, spark, sf_dir):
    t, base = _mk(warehouse, spark, sf_dir, "db.amh0", n=40)
    for epoch in range(1, 5):
        STR.upsert_mor_exactly_once(t, base.limit(10), epoch_id=epoch,
                                    on=["o_orderkey"], spark=spark)
    _, dels = _split(t.refresh(), spark)
    n_eq = len([e for e in dels
                if (e.get("content") or 0) == EQUALITY_DELETES])
    assert n_eq == 4  # one per epoch, untouched
