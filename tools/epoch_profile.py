"""Profile ONE upsert-MoR epoch end-to-end (r9 verdict #3): wall per
phase — batch staging (data write job), eq-delete key file, snapshot
commit (manifests + metadata JSON), epoch-marker property commit,
refreshes — to find the per-commit fixed cost that dominates the
composition benches (streaming_scd2, streaming_auto_maintain).

Usage: python tools/epoch_profile.py [sf_dir] [n_epochs]
"""

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 8

from incubator_iceberg_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="epoch-profile", master="local[8]",
                  shuffle_partitions=8)

from pyspark.sql import functions as F  # noqa: E402

from incubator_iceberg_spark import Catalog  # noqa: E402
from incubator_iceberg_spark import deletes as DEL  # noqa: E402
from incubator_iceberg_spark import metadata as MDM  # noqa: E402
from incubator_iceberg_spark import snapshots as SN  # noqa: E402
from incubator_iceberg_spark import streaming as STR  # noqa: E402
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


# coarse phases
Table._stage = timed("stage_data_write", Table._stage)
DEL._write_delete_parquet = timed("eq_key_file", DEL._write_delete_parquet)
STR.SN.append_files = timed("append_files_commit", SN.append_files)
Table.update_properties = timed("prop_commit", Table.update_properties)
Table.refresh = timed("refresh", Table.refresh)

# inside the commit: manifest write vs metadata swap vs footer stats
from incubator_iceberg_spark import manifests as MF  # noqa: E402
from incubator_iceberg_spark import write as W  # noqa: E402

MF.write_manifest = timed("  manifest_write", MF.write_manifest)
MF.write_manifest_list = timed("  manifest_list_write", MF.write_manifest_list)
MDM.TableOperations.commit = timed("  metadata_swap", MDM.TableOperations.commit)
MDM.TableOperations.refresh = timed("  ops_refresh", MDM.TableOperations.refresh)
if hasattr(W, "footer_stats"):
    W.footer_stats = timed("  footer_stats", W.footer_stats)
for name in ("collect_entry_stats", "entries_for_files", "stats_entries"):
    if hasattr(W, name):
        setattr(W, name, timed(f"  w.{name}", getattr(W, name)))

base = spark.read.parquet(os.path.join(SF, "customer.parquet"))
wh = "/tmp/epoch_profile_wh"
import shutil

shutil.rmtree(wh, ignore_errors=True)
cat = Catalog(wh, spark)
t = cat.create_table("db.c", Schema.from_spark(base.schema))
t.append(base)
for k in list(times):
    times.pop(k)
    counts.pop(k, None)

wall0 = time.perf_counter()
for ep in range(1, N + 1):
    b = (base.limit(2000).withColumn("c_acctbal", F.col("c_acctbal") + ep))
    ok = STR.upsert_mor_exactly_once(t, b, epoch_id=ep, on=["c_custkey"],
                                     spark=spark)
    assert ok
wall = time.perf_counter() - wall0

print(f"\n== {N} upsert-MoR epochs, total wall {wall:.2f}s "
      f"({wall / N:.3f}s/epoch) ==")
tracked = 0.0
for k in sorted(times, key=lambda k: -times[k]):
    per = times[k] / N
    print(f"{k:28s} {times[k]:7.3f}s total  {per:7.4f}s/epoch  "
          f"x{counts[k]}")
    if not k.startswith(" "):
        tracked += times[k]
print(f"{'(untracked)':28s} {wall - tracked:7.3f}s total")
spark.stop()
