"""Wide-table scale rehearsal — the #columns axis (round 11).

Every prior rehearsal scaled rows, files, commits or tables; none
scaled COLUMNS.  The stats plane is the part of the engine that grows
with schema width: footer harvest walks O(row-groups × columns) per
file, manifests store two bounds structs + three count maps keyed by
column, and every plan-time manifest decode pays for all of it.  At
100 TB a 1000-column ML feature table would spend more manifest bytes
on bounds nobody filters by than on the file listing itself — which is
why Iceberg later added write.metadata.metrics.max-inferred-column-
defaults (default 100).  This round implements that cap (manifests.
metrics_modes); this probe measures what it buys.

For widths 50 / 200 / 800 columns, capped (default 100) vs uncapped:
  - append wall (includes footer-stats harvest),
  - total manifest bytes for the snapshot,
  - plan_files() wall (manifest decode),
  - filtered-scan correctness + pruning on a collecting column.

Run:  python tools/wide_table_rehearsal.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTHS = [50, 200, 800]
ROWS = 100_000
FILES = 16


def _wide_df(spark, ncols, nrows):
    cols = ["id"] + [f"(id * 7 + {i}) % 1000003 AS c{i:03d}"
                     for i in range(1, ncols)]
    # range partitioning on id → disjoint per-file id ranges, so the
    # collecting-column pruning assertion is meaningful
    return spark.range(nrows).selectExpr(*cols) \
        .repartitionByRange(FILES, "id")


def _manifest_bytes(t):
    from incubator_iceberg_spark import manifests as MF
    mlist = MF.read_manifest_list_arrow(
        t.metadata.current_snapshot().manifest_list)
    return sum(os.path.getsize(p)
               for p in mlist.column("manifest_path").to_pylist())


def run(out_json: str | None = None) -> list:
    from incubator_iceberg_spark.session import get_spark
    from incubator_iceberg_spark import Catalog
    from incubator_iceberg_spark.schema import Schema

    spark = get_spark()
    root = f"/tmp/wide_rehearsal_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root, spark)
    results = []
    for ncols in WIDTHS:
        df = _wide_df(spark, ncols, ROWS)
        df.persist().count()
        for label, props in (
                ("capped", {}),  # default cap = 100
                ("uncapped", {"write.metadata.metrics."
                              "max-inferred-column-defaults": "100000"})):
            name = f"db.w{ncols}_{label}"
            t = cat.create_table(name, Schema.from_spark(df.schema),
                                 properties=props)
            t0 = time.time()
            t.append(df)
            append_s = time.time() - t0
            mbytes = _manifest_bytes(t)
            # isolate the per-file stats harvest (whole-append wall is
            # dominated by Spark's parquet write and too noisy to read)
            from incubator_iceberg_spark import write as W
            files = [p for p, _sid in t.new_scan().plan_files()]
            t0 = time.time()
            W.collect_file_stats(None, files, t.metadata.schema(),
                                 properties=t.metadata.properties)
            harvest_s = time.time() - t0
            t0 = time.time()
            nfiles = len(t.new_scan().plan_files())
            plan_s = time.time() - t0
            # collecting column must still prune + return exact rows
            got = t.to_df(filter="id < 1000").count()
            pruned = len(t.new_scan().filter("id < 1000").plan_files())
            row = {"ncols": ncols, "mode": label,
                   "append_s": round(append_s, 2),
                   "stats_harvest_s": round(harvest_s, 3),
                   "manifest_bytes": mbytes,
                   "plan_s": round(plan_s, 3),
                   "files": nfiles, "pruned_files": pruned,
                   "filtered_rows_ok": got == 1000}
            results.append(row)
            print(json.dumps(row))
        df.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1)
    spark.stop()
    return results


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else None)
