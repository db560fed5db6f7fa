"""Randomized incremental-materialized-view fuzz gate: after ANY seeded
interleaving of base-table ops (appends, CoW/MoR deletes, group-moving
and value-shifting updates in both modes, compaction), an incremental
refresh must leave the MV bit-identical to a from-scratch rebuild —
including refreshes that fold SEVERAL base commits in one delta, and
repeated refreshes that must be no-ops (the exactly-once watermark).

Systematizes test_matview.py's hand-picked walk the way the evolution /
lifecycle fuzz gates systematized their planes.

Tunables: SPARK_GRAFT_MV_FUZZ_OPS (default 18), SPARK_GRAFT_FUZZ_SEED."""

import os
import random

from pyspark.sql import functions as F

from incubator_iceberg_spark import matview
from incubator_iceberg_spark.schema import Schema

N_OPS = int(os.environ.get("SPARK_GRAFT_MV_FUZZ_OPS", "18"))
SEED = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "0"))

GROUPS = ["a", "b", "c", "d", "e"]


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, v long")


def _rebuild(t):
    return {r["grp"]: (r["n_rows"], r["sum_v"]) for r in
            t.to_df().groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("v").alias("sum_v")).collect()}


def _mv_state(mv):
    return {r["grp"]: (r["n_rows"], r["sum_v"])
            for r in mv.to_df().collect()}


def test_fuzz_matview_refresh_equals_rebuild(warehouse, spark):
    rng = random.Random(0x37A7E + SEED)
    rows = [(i, rng.choice(GROUPS), rng.randrange(-100, 100) * 10)
            for i in range(30)]
    t = warehouse.create_table("db.mvfuzz_base",
                               Schema.from_spark(_df(spark, rows).schema))
    t.append(_df(spark, rows))
    mv = matview.create_agg_mv(warehouse, "db.mvfuzz_mv", t,
                               ["grp"], ["v"])
    assert _mv_state(mv) == _rebuild(t)

    next_id = 30
    pending = 0  # base commits not yet folded into the MV
    for step in range(N_OPS):
        op = rng.choice(["append", "append", "mor_delete", "cow_delete",
                         "move_update", "value_update", "compact"])
        if op == "append":
            n = rng.randrange(3, 12)
            batch = [(next_id + i, rng.choice(GROUPS),
                      rng.randrange(-100, 100) * 10) for i in range(n)]
            next_id += n
            t.append(_df(spark, batch))
        elif op in ("mor_delete", "cow_delete"):
            mode = "merge-on-read" if op == "mor_delete" else "copy-on-write"
            kind = rng.randrange(3)
            if kind == 0:
                t.delete_where(f"grp = '{rng.choice(GROUPS)}'", mode=mode)
            elif kind == 1:
                m, j = rng.choice([(3, 0), (4, 1), (5, 2)])
                t.delete_where(f"id % {m} = {j}", mode=mode)
            else:
                lo = rng.randrange(0, next_id)
                t.delete_where(f"id >= {lo} AND id < {lo + 15}", mode=mode)
        elif op == "move_update":
            mode = rng.choice(["copy-on-write", "merge-on-read"])
            src, dst = rng.sample(GROUPS, 2)
            t.update({"grp": f"'{dst}'"},
                     f"grp = '{src}' AND id % 2 = {rng.randrange(2)}",
                     mode=mode)
        elif op == "value_update":
            mode = rng.choice(["copy-on-write", "merge-on-read"])
            dv = rng.randrange(1, 50)
            m = rng.choice([2, 3, 4])
            t.update({"v": f"v + {dv}"}, f"id % {m} = 0", mode=mode)
        else:
            t.rewrite_data_files(min_input_files=2)
        pending += 1

        # sometimes let several commits pile up before one refresh
        if rng.random() < 0.35 and step != N_OPS - 1:
            continue
        matview.refresh_agg_mv(mv, t)
        pending = 0
        ctx = f"step {step} after {op}"
        assert _mv_state(mv) == _rebuild(t), ctx
        # watermark: an immediate second refresh is a no-op
        if rng.random() < 0.3:
            r = matview.refresh_agg_mv(mv, t)
            assert r == {"refreshed": False, "groups_changed": 0}, ctx

    matview.refresh_agg_mv(mv, t)
    assert _mv_state(mv) == _rebuild(t), "final"
