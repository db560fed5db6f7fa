"""Phase profile of one streaming-SCD2 shape at sf0.1: where the
per-epoch MERGE wall goes (probe job, classification, stage write,
commit)."""

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_iceberg_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="scd2-profile", master="local[32]",
                  shuffle_partitions=32)

from pyspark.sql import functions as F  # noqa: E402

from incubator_iceberg_spark import Catalog  # noqa: E402
from incubator_iceberg_spark import row_ops as RO  # noqa: E402
from incubator_iceberg_spark import snapshots as SN  # noqa: E402
from incubator_iceberg_spark import write as W  # noqa: E402
from incubator_iceberg_spark.functions import scd  # noqa: E402
from incubator_iceberg_spark.schema import Schema  # noqa: E402

times = defaultdict(float)
counts = defaultdict(int)


def timed(bucket, fn):
    def wrap(*a, **kw):
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            times[bucket] += time.perf_counter() - t0
            counts[bucket] += 1
    return wrap


W.stage_write = timed("stage_write", W.stage_write)
RO.W.stage_write = W.stage_write
SN.overwrite_files = timed("commit_overwrite", SN.overwrite_files)
RO.SN.overwrite_files = SN.overwrite_files

# time the probe by wrapping toLocalIterator consumption indirectly:
# wrap TableScan.to_df? coarse: time merge_into and scd2_apply
scd_merge = RO.merge_into
RO.merge_into = timed("merge_into_total", scd_merge)

sf = "/root/testdata/sf0.1"
base = (spark.read.parquet(os.path.join(sf, "customer.parquet"))
        .select(F.col("c_custkey").alias("k"),
                F.col("c_mktsegment").alias("seg"),
                F.col("c_nationkey").cast("long").alias("nat")))
import shutil

wh = "/tmp/scd2_profile_wh"
shutil.rmtree(wh, ignore_errors=True)
cat = Catalog(wh, spark)
dim = cat.create_table(
    "s.dim", "k long, seg string, nat long, "
             "effective_from long, effective_to long, is_current boolean")
dim.append(base.withColumn("effective_from", F.lit(0).cast("long"))
               .withColumn("effective_to", F.lit(None).cast("long"))
               .withColumn("is_current", F.lit(True)))

wall0 = time.perf_counter()
per = []
for ep in range(1, 4):
    e0 = time.perf_counter()
    batch = (base.filter(f"k % {4 + ep} = 0")
             .withColumn("seg", F.lit(f"U{ep}"))
             .withColumn("ts", F.lit(100 * ep).cast("long"))
             .withColumn("op", F.lit("U"))
             .select("k", "seg", "nat", "ts", "op"))
    scd.scd2_apply(dim, batch, ["k"], ["seg", "nat"], "ts", op_col="op")
    per.append(time.perf_counter() - e0)
wall = time.perf_counter() - wall0

print(f"\n== 3 scd2 epochs total {wall:.2f}s ==")
print("per-epoch: " + " ".join(f"{x:.2f}" for x in per))
for k in sorted(times, key=lambda k: -times[k]):
    print(f"{k:22s} {times[k]:7.3f}s  x{counts[k]}")
probe = times["merge_into_total"] - times["stage_write"] - times["commit_overwrite"]
print(f"merge probe+join (residual): {probe:.3f}s")
print(f"scd pre-merge (epoch wall - merge): "
      f"{wall - times['merge_into_total']:.3f}s")
spark.stop()
