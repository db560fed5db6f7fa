"""Round-9 plan-time rehearsal: eq-delete schema fingerprints vs footer
reads at backlog scale.

A lagging maintenance loop can leave HUNDREDS of accrued eq-delete
files; before round 9 the planner paid one driver pyarrow footer read
per file to bucket them by schema (one object-store round trip each at
100 TB).  With the manifest-stamped fingerprint (eq_schema_fp) the
bucketing is metadata-only.  This drives N small upsert epochs, then
times ONLY the logical-plan construction (TableScan.to_df(), no job)
with fingerprints present vs stripped (simulating pre-r9 manifests),
counting the footer reads each way.

Usage: python tools/eq_plan_time_rehearsal.py [epochs]   (default 200)
Prints one JSON line.
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    from pyspark.sql import functions as F
    import pyarrow.parquet as pq
    from incubator_iceberg_spark import streaming as STR
    from incubator_iceberg_spark.scan import TableScan
    from incubator_iceberg_spark.schema import Schema
    from incubator_iceberg_spark.session import get_spark
    from incubator_iceberg_spark.table import Catalog

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    tmp = tempfile.mkdtemp(prefix="eqplan_")
    try:
        cat = Catalog(tmp, spark)
        base = spark.range(100_000).select(
            F.col("id"), (F.col("id") % 97).alias("v"))
        t = cat.create_table("db.t", Schema.from_spark(base.schema))
        t.append(base)
        for ep in range(1, epochs + 1):
            b = base.filter(f"id % {epochs} = {ep % epochs}").limit(200) \
                .withColumn("v", F.col("v") + ep)
            STR.upsert_mor_exactly_once(t, b, epoch_id=ep, on=["id"],
                                        spark=spark)
            t = t.refresh()

        calls = [0]
        real = pq.read_schema

        def counting(*a, **k):
            calls[0] += 1
            return real(*a, **k)

        pq.read_schema = counting
        try:
            # warm the entry cache so both timings plan from memory
            TableScan(t, spark)._plan_split()

            t0 = time.time()
            TableScan(t, spark).to_df()
            dt_fp = time.time() - t0
            reads_fp = calls[0]

            # strip fingerprints (pre-r9 manifests / imported files)
            import incubator_iceberg_spark.scan as SC
            orig = SC.TableScan._plan_split

            def stripped(self):
                data, dels = orig(self)
                dels = [dict(e) for e in dels]
                for e in dels:
                    e.pop("eq_schema_fp", None)
                return data, dels

            SC.TableScan._plan_split = stripped
            calls[0] = 0
            t0 = time.time()
            TableScan(t, spark).to_df()
            dt_foot = time.time() - t0
            reads_foot = calls[0]
            SC.TableScan._plan_split = orig
        finally:
            pq.read_schema = real

        n = t.to_df().count()
        print(json.dumps({
            "epochs": epochs, "eq_files": epochs,
            "plan_s_fingerprint": round(dt_fp, 3),
            "footer_reads_fingerprint": reads_fp,
            "plan_s_footer_fallback": round(dt_foot, 3),
            "footer_reads_fallback": reads_foot,
            "rows": n,
        }))
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
