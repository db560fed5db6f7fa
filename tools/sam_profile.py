"""Phase profile of the streaming_auto_maintain shape: 12 upsert-MoR
epochs + every-4-epochs auto_maintain at sf0.1, with wall split across
sink internals vs maintenance internals and Spark job counts."""

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_iceberg_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="sam-profile", master="local[32]",
                  shuffle_partitions=32)

from pyspark.sql import functions as F  # noqa: E402

from incubator_iceberg_spark import Catalog  # noqa: E402
from incubator_iceberg_spark import deletes as DEL  # noqa: E402
from incubator_iceberg_spark import maintenance as MT  # noqa: E402
from incubator_iceberg_spark import snapshots as SN  # noqa: E402
from incubator_iceberg_spark import streaming as ST  # noqa: E402
from incubator_iceberg_spark.schema import Schema  # noqa: E402
from incubator_iceberg_spark.table import Table  # noqa: E402

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


Table._stage = timed("stage_data_write", Table._stage)
DEL._write_delete_parquet = timed("eq_key_file", DEL._write_delete_parquet)
ST.SN.append_files = timed("sink_commit", SN.append_files)
for name in ("auto_maintain", "convert_equality_deletes",
             "rewrite_data_files", "rewrite_manifests", "expire_snapshots",
             "rewrite_position_deletes"):
    if hasattr(MT, name):
        setattr(MT, name, timed(f"mt.{name}", getattr(MT, name)))

tracker = spark.sparkContext.statusTracker()


def job_count():
    return len(tracker.getJobIdsForGroup(None) or [])


sf = "/root/testdata/sf0.1"
cust = spark.read.parquet(os.path.join(sf, "customer.parquet")) \
    .select("c_custkey", "c_mktsegment", "c_acctbal")
import shutil

wh = "/tmp/sam_profile_wh"
shutil.rmtree(wh, ignore_errors=True)
cat = Catalog(wh, spark)
t = cat.create_table(
    "s.sam", Schema.from_spark(cust.schema),
    properties={"maintenance.auto.every-epochs": "4",
                "maintenance.auto.eq-debt-files": "3",
                "maintenance.auto.min-small-files": "1000",
                "maintenance.auto.max-manifests": "1000",
                "maintenance.auto.max-snapshots": "1000"})
t.append(cust)
for k in list(times):
    times.pop(k)
    counts.pop(k, None)

jobs0 = spark.sparkContext.statusTracker()
wall0 = time.perf_counter()
per_epoch = []
for ep in range(1, 13):
    e0 = time.perf_counter()
    b = (cust.filter(f"c_custkey % 12 = {ep % 12}")
         .withColumn("c_acctbal", F.col("c_acctbal") + float(ep)))
    assert ST.upsert_mor_exactly_once(t, b, epoch_id=ep,
                                      on=["c_custkey"], spark=spark)
    t = t.refresh()
    per_epoch.append(time.perf_counter() - e0)
wall = time.perf_counter() - wall0

print(f"\n== 12 epochs (auto-maintain every 4) total {wall:.2f}s ==")
print("per-epoch: " + " ".join(f"{x:.2f}" for x in per_epoch))
tracked = 0.0
for k in sorted(times, key=lambda k: -times[k]):
    print(f"{k:28s} {times[k]:7.3f}s  x{counts[k]}")
    if not k.startswith("mt.") or k == "mt.auto_maintain":
        tracked += times[k] if k != "mt.auto_maintain" else 0
print(f"auto_maintain total: {times.get('mt.auto_maintain', 0):.3f}s; "
      f"sink-side total: {times.get('stage_data_write', 0) + times.get('eq_key_file', 0) + times.get('sink_commit', 0):.3f}s")
spark.stop()
