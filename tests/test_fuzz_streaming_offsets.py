"""Fuzz gate for streaming offsets under file-level rate limiting:
random append shapes (file counts, empty appends, interleaved skipped
delete snapshots), random per-batch file budgets, and random reader
RESTARTS from the checkpoint — the concatenation of all batches must
equal the appended rows exactly once, in every interleaving.

Seeded: failures reproduce with SPARK_GRAFT_FUZZ_SEED.
"""

import os
import random

import pytest

from incubator_iceberg_spark import streaming as STR
from incubator_iceberg_spark.schema import Schema

SEED = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "2718"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_SO_ROUNDS", "4"))


@pytest.mark.parametrize("rnd", range(ROUNDS))
def test_fuzz_rate_limited_stream_exactly_once(warehouse, spark, tmp_path, rnd):
    rng = random.Random(SEED + rnd)
    t = warehouse.create_table(f"db.sof{rnd}", "k long, v long")
    ck = str(tmp_path / f"ck{rnd}")

    expected: list = []
    consumed: list = []
    next_k = [0]
    rd = STR.MicroBatchReader(t, checkpoint_dir=ck)

    def append_some():
        n_rows = rng.randrange(1, 40)
        n_files = rng.randrange(1, 5)
        rows = [(next_k[0] + i, rng.randrange(100)) for i in range(n_rows)]
        next_k[0] += n_rows
        df = spark.createDataFrame(rows, "k long, v long")
        t.append(df.repartition(n_files))
        expected.extend(rows)

    for step in range(14):
        op = rng.choice(["append", "consume", "consume", "restart",
                         "delete"])
        if op == "append":
            append_some()
        elif op == "restart":
            # a fresh reader from the same checkpoint must resume exactly
            # where the old one stopped — including mid-snapshot
            rd = STR.MicroBatchReader(t, checkpoint_dir=ck)
        elif op == "delete":
            if expected and rng.random() < 0.5:
                # skipped snapshot type: must not disturb offsets
                t.delete_where(f"v = {rng.randrange(100)}")
        else:
            budget = rng.choice([1, 2, 3, None])
            out = rd.next_batch(max_snapshots_per_batch=None,
                                max_files_per_batch=budget)
            if out is not None:
                consumed.extend((r["k"], r["v"]) for r in out[0].collect())

    # drain
    while True:
        out = rd.next_batch(max_snapshots_per_batch=None,
                            max_files_per_batch=rng.choice([2, None]))
        if out is None:
            break
        consumed.extend((r["k"], r["v"]) for r in out[0].collect())

    assert sorted(consumed) == sorted(expected), f"seed={SEED + rnd}"


def test_reader_rejects_nonpositive_file_budget(warehouse, spark, tmp_path):
    """max_files_per_batch=0 would take nothing yet mark every pending
    snapshot consumed — checkpointed silent data loss from a typo."""
    t = warehouse.create_table("db.so_budget", "k long")
    t.append(spark.range(5).selectExpr("id AS k"))
    rd = STR.MicroBatchReader(t, checkpoint_dir=str(tmp_path / "ckb"))
    with pytest.raises(ValueError, match="max_files_per_batch"):
        rd.next_batch(max_files_per_batch=0)
    with pytest.raises(ValueError, match="max_files_per_batch"):
        rd.next_batch(max_files_per_batch=-3)
    # the offset did NOT advance: a valid budget still sees all rows
    df, _ = rd.next_batch(max_files_per_batch=100)
    assert df.count() == 5


def test_reader_detects_expired_offset_snapshot(warehouse, spark, tmp_path):
    """A checkpointed snapshot expired out of the chain must raise, not
    silently mis-slice the oldest snapshot (loss) or replay a partially
    consumed one (duplicates)."""
    t = warehouse.create_table("db.so_expired", "k long")
    ck = str(tmp_path / "cke")
    t.append(spark.range(0, 5).selectExpr("id AS k"))
    rd = STR.MicroBatchReader(t, checkpoint_dir=ck)
    assert rd.next_batch() is not None  # consume snapshot 1; checkpoint it
    t.append(spark.range(5, 9).selectExpr("id AS k"))
    # expire everything but the current snapshot: the checkpointed one dies
    t.expire_snapshots(older_than_ms=10**18, retain_last=1)
    rd2 = STR.MicroBatchReader(t, checkpoint_dir=ck)
    with pytest.raises(ValueError, match="no longer in the table's"):
        rd2.next_batch()
