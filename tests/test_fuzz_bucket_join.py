"""Fuzz gate for the storage-partitioned bucket join: randomized
co-bucketed tables under randomized mutation (appends, CoW/MoR deletes,
updates, compaction), with randomized key ranges (disjoint buckets on
either side, NULL keys, duplicate keys) and pushed filters — the
bucket-local union must match Spark's plain inner join of the two full
scans bit-for-bit.

Seeded: failures reproduce with SPARK_GRAFT_FUZZ_SEED.
"""

import os
import random

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark.bucket_join import bucket_join
from incubator_iceberg_spark.schema import Schema

SEED = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "4242"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_BJ_ROUNDS", "6"))


def _rows_df(spark, rng, lo, hi, n, null_frac=0.05):
    rows = []
    for i in range(n):
        k = None if rng.random() < null_frac else rng.randrange(lo, hi)
        rows.append((k, rng.randrange(0, 1000), i))
    return spark.createDataFrame(rows, "k long, v long, seq long")


def _norm(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("rnd", range(ROUNDS))
def test_bucket_join_fuzz_matches_plain_join(warehouse, spark, rnd):
    rng = random.Random(SEED + rnd)
    n_buckets = rng.choice([4, 8, 16])
    # key ranges overlap partially; one side may cover buckets the other
    # side never writes (those bucket-local joins must vanish, not fail)
    lo_a, hi_a = 0, rng.randrange(200, 800)
    lo_b, hi_b = rng.randrange(0, 300), rng.randrange(600, 1200)

    ta = warehouse.create_table(f"db.bjf_a{rnd}",
                                Schema.from_spark(
                                    _rows_df(spark, rng, 0, 1, 1).schema),
                                partition_by=[f"bucket({n_buckets}, k)"])
    tb = warehouse.create_table(f"db.bjf_b{rnd}",
                                Schema.from_spark(
                                    _rows_df(spark, rng, 0, 1, 1).schema),
                                partition_by=[f"bucket({n_buckets}, k)"])

    for t, lo, hi in ((ta, lo_a, hi_a), (tb, lo_b, hi_b)):
        for _ in range(rng.randrange(1, 4)):
            t.append(_rows_df(spark, rng, lo, hi, rng.randrange(50, 300)))
        for _ in range(rng.randrange(0, 3)):
            op = rng.choice(["delete_cow", "delete_mor", "update", "compact"])
            pred = f"v % {rng.randrange(2, 7)} = {rng.randrange(0, 2)}"
            if op == "delete_cow":
                t.delete_where(pred)
            elif op == "delete_mor":
                t.delete_where(pred, mode="merge-on-read")
            elif op == "update":
                t.update({"v": "v + 1"}, pred)
            else:
                t.rewrite_data_files(min_input_files=2)

    filt = rng.choice([None, f"v < {rng.randrange(300, 900)}"])
    got = bucket_join(ta, tb, "k", filter_a=filt)
    want = ta.to_df(filter=filt).alias("a").join(
        tb.to_df().alias("b"), "k").select(
        "k", F.col("a.v").alias("v"), F.col("a.seq").alias("seq"),
        F.col("b.v").alias("v_b"), F.col("b.seq").alias("seq_b"))
    cols = ["k", "v", "seq", "v_b", "seq_b"]
    assert _norm(got, cols) == _norm(want, cols), \
        f"seed={SEED + rnd} buckets={n_buckets} filt={filt}"
