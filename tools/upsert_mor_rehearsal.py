"""Upsert-MoR sink vs MERGE sink as the TABLE grows (round 6).

The sink's claim: per-epoch work is O(batch) — the target is never
read — while the MERGE-based upsert joins the batch against the target
and rewrites every matched file, so its per-epoch cost grows with
table size (and with key scatter).  This rehearsal times ONE identical
epoch (10k rows: half updates of scattered existing keys, half fresh
inserts) against tables a decade apart.

At 100 TB this is the difference between a CDC stream whose commit
latency is constant and one that degrades as the table accretes.

Usage: python tools/upsert_mor_rehearsal.py [sizes ...]
Defaults 100_000 1_000_000 10_000_000.  Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from incubator_iceberg_spark import streaming as STR
from incubator_iceberg_spark.session import get_spark
from incubator_iceberg_spark.table import Catalog

BATCH = 10_000


def base_df(spark, n):
    from pyspark.sql import functions as F
    return (spark.range(n).select(
        F.col("id"),
        (F.col("id") * 37 % 1000).alias("v"),
        F.format_string("val-%012d", F.col("id")).alias("s")))


def batch_df(spark, n):
    from pyspark.sql import functions as F
    # updates: BATCH/2 keys strided across the whole id space (worst
    # case for MERGE's file-matching); inserts: BATCH/2 fresh keys
    upd = (spark.range(BATCH // 2)
           .select((F.col("id") * (n // (BATCH // 2))).alias("id"))
           .filter(F.col("id") < n))
    ins = spark.range(BATCH // 2).select((F.col("id") + 2 * n).alias("id"))
    return (upd.unionByName(ins)
            .select(F.col("id"), F.lit(-1).alias("v"),
                    F.lit("updated").alias("s")))


def run(spark, n: int) -> dict:
    from incubator_iceberg_spark.schema import Schema
    wh = tempfile.mkdtemp(prefix="upsert_rehearsal_")
    cat = Catalog(wh, spark)
    df = base_df(spark, n)
    out = {"n_base": n}
    for kind in ("mor", "merge"):
        t = cat.create_table(
            f"db.t_{kind}", Schema.from_spark(df.schema),
            properties={"write.target-file-size-bytes": str(4 * 1024 * 1024)})
        t.append(df)
        b = batch_df(spark, n)
        t0 = time.time()
        if kind == "mor":
            assert STR.upsert_mor_exactly_once(t, b, epoch_id=1, on=["id"])
        else:
            assert STR.upsert_exactly_once(t, b, epoch_id=1, on=["id"])
        out[f"{kind}_epoch_s"] = round(time.time() - t0, 2)
        out[f"{kind}_rows_ok"] = (
            t.to_df().count() == n + BATCH // 2 and
            t.to_df().filter("s = 'updated'").count() == b.count())
    shutil.rmtree(wh, ignore_errors=True)
    return out


def main():
    sizes = ([int(a) for a in sys.argv[1:]]
             or [100_000, 1_000_000, 10_000_000])
    spark = get_spark()
    print(json.dumps({"batch": BATCH,
                      "results": [run(spark, n) for n in sizes]}))


if __name__ == "__main__":
    main()
