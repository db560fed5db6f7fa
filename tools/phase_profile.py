"""Phase-attribution profiler for any queries() row: wraps the engine's
op entry points (writes, stats harvest, delete-file writes, commits,
planning, reads, maintenance passes, row ops) with wall timers, runs the
named row(s) once, and prints per-bucket totals + call counts vs the
row's total wall.  The residual is Spark work driven directly by the
query body (final count, ad-hoc jobs).

Usage: python tools/phase_profile.py <query> [...] [--sf DIR]
"""

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

names = [a for a in sys.argv[1:] if not a.startswith("--")]
sf = "/root/testdata/sf0.1"
if "--sf" in sys.argv:
    sf = sys.argv[sys.argv.index("--sf") + 1]

import __spark_entry__ as E  # noqa: E402
from incubator_iceberg_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="phase-profile")
E._prep(spark)
E._ensure_warehouse(spark, sf)
spark.range(100).mapInPandas(lambda it: it, "id long").count()

times: dict = defaultdict(float)
counts: dict = defaultdict(int)
_depth = [0]  # attribute nested buckets once (outermost wins for total)


def timed(bucket, fn, exclusive=False):
    def wrap(*a, **kw):
        t0 = time.perf_counter()
        _depth[0] += 1
        try:
            return fn(*a, **kw)
        finally:
            _depth[0] -= 1
            dt = time.perf_counter() - t0
            times[bucket] += dt
            counts[bucket] += 1
    return wrap


from incubator_iceberg_spark import deletes as DEL  # noqa: E402
from incubator_iceberg_spark import maintenance as MT  # noqa: E402
from incubator_iceberg_spark import manifests as MF  # noqa: E402
from incubator_iceberg_spark import row_ops as RO  # noqa: E402
from incubator_iceberg_spark import scan as SC  # noqa: E402
from incubator_iceberg_spark import snapshots as SN  # noqa: E402
from incubator_iceberg_spark import streaming as ST  # noqa: E402
from incubator_iceberg_spark import write as W  # noqa: E402
from incubator_iceberg_spark.table import Table  # noqa: E402

# leaf buckets
W.stage_write = timed("w:stage_write", W.stage_write)
W.collect_file_stats = timed("w:file_stats", W.collect_file_stats)
DEL._write_delete_parquet = timed("w:delete_parquet", DEL._write_delete_parquet)
DEL.apply_delete_files = timed("r:apply_deletes", DEL.apply_delete_files)
SN.append_files = timed("c:append_files", SN.append_files)
SN.overwrite_files = timed("c:overwrite_files", SN.overwrite_files)
SN.replace_partitions = timed("c:replace_parts", SN.replace_partitions)
MF.write_manifest = timed("c:write_manifest", MF.write_manifest)
MF.write_manifest_list = timed("c:write_mlist", MF.write_manifest_list)
SC.read_entries = timed("r:read_entries", SC.read_entries)
SC.TableScan.plan_entries_local = timed("p:plan_local",
                                        SC.TableScan.plan_entries_local)
SC.TableScan.to_df = timed("p:to_df", SC.TableScan.to_df)
Table.refresh = timed("t:refresh", Table.refresh)
Table._stage = timed("t:stage", Table._stage)

# composite buckets (overlap leaf buckets; read with that in mind)
for mod, fname in [
    (MT, "convert_equality_deletes"), (MT, "rewrite_position_deletes"),
    (MT, "rewrite_data_files"), (MT, "remove_dangling_deletes"),
    (MT, "expire_snapshots"), (MT, "rewrite_manifests"),
    (MT, "auto_maintain"),
    (RO, "merge_into"), (RO, "delete_where"), (RO, "delete_where_mor"),
    (RO, "update_mor"),
    (ST, "upsert_mor_exactly_once"), (ST, "cdc_apply_exactly_once"),
]:
    if hasattr(mod, fname):
        setattr(mod, fname, timed("M:" + fname, getattr(mod, fname)))

REPS = int(os.environ.get("PHASE_PROFILE_REPS", "2"))
qs = E.queries()
for name in names:
    # warm runs first; report the LAST (steady-state, matches the
    # bench's median-of-3 behavior better than a cold first run)
    for rep in range(REPS):
        for k in list(times):
            times.pop(k)
            counts.pop(k)
        t0 = time.perf_counter()
        df = qs[name](spark, sf)
        n = df.count()
        total = time.perf_counter() - t0
    print(f"\n=== {name}: total {total:.3f}s ({n} rows, run {REPS}) ===")
    acct = 0.0
    for k in sorted(times, key=lambda k: -times[k]):
        flag = "*" if k.startswith("M:") else " "
        print(f"  {k:24s} {times[k]:8.3f}s  x{counts[k]}{flag}")
        if not k.startswith("M:"):
            acct += times[k]
    print(f"  {'[leaf-accounted]':24s} {acct:8.3f}s "
          f"(residual {total - acct:.3f}s; M:* overlap leaves)")
spark.stop()
