"""Metadata-plane scale rehearsal: plan a scan over ~10^5 manifest entries
with distributed planning forced, and assert

  1. plan wall-time stays interactive (seconds, not minutes), and
  2. driver memory during planning is O(pruned files), NOT O(all entries)
     — the SURVEY §3.1 contract ("only the final pruned file-path list is
     materialized on the driver").

The table is synthesized at the metadata layer (no data files are written
or read — planning never opens data files), mirroring what a 100 TB table
looks like to the planner: N_MANIFESTS manifest Parquet files x
ENTRIES_PER_MANIFEST entries each, identity-partitioned, with per-column
bounds so partition pruning, manifest-summary pruning (P8) and inclusive
metrics pruning (P6) all engage.  Entry fabrication uses the same
write_manifest/write_manifest_list code every real commit uses, so the
layout under test is the production layout.

Usage: python tools/metadata_scale_rehearsal.py [n_manifests] [entries_per_manifest]
Defaults 200 x 500 = 100,000 entries.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import tracemalloc

sys.path.insert(0, "/root/repo")

from incubator_iceberg_spark import manifests as M
from incubator_iceberg_spark import metadata as MD
from incubator_iceberg_spark import schema as S
from incubator_iceberg_spark import snapshots as SN
from incubator_iceberg_spark.session import get_spark
from incubator_iceberg_spark.table import Catalog


def build_table(warehouse: str, spark, n_manifests: int, per_manifest: int):
    """One snapshot holding n_manifests x per_manifest fabricated entries.

    Each manifest covers exactly one identity partition p=i (so manifest
    partition summaries are maximally selective, like a well-clustered
    100 TB table after RewriteManifests); per-entry bounds on `v` split the
    partition's value range so metrics pruning has sub-partition work too.
    """
    cat = Catalog(warehouse, spark)
    t = cat.create_table(
        "db.huge",
        S.Schema([
            S.NestedField(1, "id", S.LongType(), True),
            S.NestedField(2, "v", S.LongType()),
            S.NestedField(3, "p", S.IntegerType()),
        ]),
        partition_by=["p"],
        properties={
            "read.plan-mode": "distributed",
            # keep the fabricated 1-manifest-per-partition clustering
            MD.MANIFEST_MIN_MERGE_COUNT: str(10 ** 9),
        },
    )
    ops = t.ops
    base = ops.refresh()
    md_dir = os.path.join(base.location, "metadata")
    spec = base.spec()
    schema = base.schema()

    def make(view, snapshot_id, seq):
        rows = []
        for i in range(n_manifests):
            entries = []
            for j in range(per_manifest):
                lo = j * 1000
                entries.append({
                    "status": M.ADDED,
                    "snapshot_id": snapshot_id,
                    "sequence_number": seq,
                    "content": M.DATA,
                    "file_path": f"{base.location}/data/p={i}/f-{i}-{j}.parquet",
                    "file_format": "parquet",
                    "spec_id": spec.spec_id,
                    "schema_id": schema.schema_id,
                    "record_count": 1000,
                    "file_size_bytes": 64 * 1024 * 1024,
                    "partition": {"p": i},
                    "value_counts": {"id": 1000, "v": 1000},
                    "null_counts": {"id": 0, "v": 0},
                    "lower_bounds": {"id": i * 10**6 + lo, "v": lo},
                    "upper_bounds": {"id": i * 10**6 + lo + 999, "v": lo + 999},
                })
            rows.append(M.write_manifest(md_dir, entries, schema, spec,
                                         snapshot_id, seq,
                                         properties=base.properties))
        return rows

    MD.run_with_retries(
        ops, lambda b: SN._install_snapshot(b, make, "append", None, [], []))
    return cat.load_table("db.huge", spark)


def _extra_entry(t, tag: str, k: int, snapshot_id: int, seq: int) -> dict:
    base = t.metadata
    return {
        "status": M.ADDED,
        "snapshot_id": snapshot_id,
        "sequence_number": seq,
        "content": M.DATA,
        "file_path": f"{base.location}/data/p=0/extra-{tag}-{k}.parquet",
        "file_format": "parquet",
        "spec_id": base.default_spec_id,
        "schema_id": base.current_schema_id,
        "record_count": 1000,
        "file_size_bytes": 64 * 1024 * 1024,
        "partition": {"p": 0},
        "value_counts": {"id": 1000, "v": 1000},
        "null_counts": {"id": 0, "v": 0},
        "lower_bounds": {"id": k, "v": k},
        "upper_bounds": {"id": k + 999, "v": k + 999},
    }


def changelog_case(t, total_entries: int):
    """The round-7 verdict case: changelog metadata-plane cost must be
    ∝ the files a commit TOUCHED, not the table's live entry count.

    Three small commits land on the ≥10^5-entry table — append 10 files,
    append 100, delete 10 (a rewritten manifest, the carry-by-EXISTING
    shape) — and each commit's `_snapshot_changes` diff is timed with a
    cold manifest-list cache.  The yardstick is a NAIVE full live-set
    materialization (every manifest `to_pylist()`, what `_live_entries`
    did through round 6, PER SIDE PER COMMIT): each small diff must beat
    one side's materialization by >=10x wall and use far less driver
    memory, or the rehearsal fails."""
    from incubator_iceberg_spark import changelog as CL

    md = t.metadata
    schema = md.schema()

    def commit_append(tag, n):
        entries = [_extra_entry(t, tag, k, 0, 0) for k in range(n)]
        t.metadata = SN.append_files(t.ops, entries)
        return t.metadata.current_snapshot()

    snap_a = commit_append("a", 10)
    snap_b = commit_append("b", 100)
    del_paths = {e["file_path"]
                 for e in [_extra_entry(t, "a", k, 0, 0) for k in range(10)]}
    t.metadata = SN.overwrite_files(t.ops, [], del_paths, operation="delete")
    snap_c = t.metadata.current_snapshot()
    md = t.metadata

    def timed_diff(snap):
        parent = md.snapshot_by_id(snap.parent_id)
        t0 = time.perf_counter()
        changes = CL._snapshot_changes(md, schema, snap, parent, {})
        wall = time.perf_counter() - t0
        tracemalloc.start()
        CL._snapshot_changes(md, schema, snap, parent, {})
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        now_e, before_e, _, _ = changes
        return wall, len(now_e), len(before_e), peak / 1e6

    w_a, na, _, mem_a = timed_diff(snap_a)
    w_b, nb, _, mem_b = timed_diff(snap_b)
    w_c, _, nc, mem_c = timed_diff(snap_c)
    assert na == 10 and nb == 100 and nc == 10, (na, nb, nc)

    # naive r6-style yardstick: one side's full live materialization
    t0 = time.perf_counter()
    n_naive = 0
    for row in M.read_manifest_list_arrow(
            snap_c.manifest_list).to_pylist():
        for e in M.read_manifest_arrow(row["manifest_path"]).to_pylist():
            if e.get("status") != M.DELETED:
                M.normalize_entry(e)
                n_naive += 1
    w_naive = time.perf_counter() - t0
    assert n_naive >= total_entries, (n_naive, total_entries)

    for w in (w_a, w_b, w_c):
        assert w * 10 < w_naive, (w, w_naive)

    return {
        "diff_append10": {"wall_s": round(w_a, 4),
                          "driver_peak_mb": round(mem_a, 2)},
        "diff_append100": {"wall_s": round(w_b, 4),
                           "driver_peak_mb": round(mem_b, 2)},
        "diff_delete10": {"wall_s": round(w_c, 4),
                          "driver_peak_mb": round(mem_c, 2)},
        "naive_live_set_one_side": {"wall_s": round(w_naive, 3),
                                    "entries": n_naive},
    }


def timed_plan(t, predicate):
    """(wall_s, n_files, driver_peak_mb): wall and memory are measured in
    SEPARATE passes — tracemalloc instruments every Python allocation and
    inflates wall time several-fold."""
    def scan():
        s = t.new_scan()
        return (s.filter(predicate) if predicate else s).plan_files()

    t0 = time.perf_counter()
    files = scan()
    wall = time.perf_counter() - t0
    tracemalloc.start()
    scan()
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    return wall, len(files), peak / 1e6


def main():
    n_manifests = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    per_manifest = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    total = n_manifests * per_manifest
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    warehouse = tempfile.mkdtemp(prefix="mdscale_")
    try:
        t0 = time.perf_counter()
        t = build_table(warehouse, spark, n_manifests, per_manifest)
        build_s = time.perf_counter() - t0
        assert t.metadata.properties["read.plan-mode"] == "distributed"

        # warm (JVM + parquet-footer caches), selective predicate
        timed_plan(t, "p = 3 AND v < 5000")

        # 1-partition + metrics cut: prune to ~5 of 100k files
        w_sel, n_sel, mem_sel = timed_plan(t, "p = 7 AND v < 5000")
        # 10% of partitions, all files within them
        hi = max(1, n_manifests // 10)
        w_10, n_10, mem_10 = timed_plan(t, f"p < {hi}")
        # full scan: the path list itself is the driver materialization
        w_full, n_full, mem_full = timed_plan(t, None)

        changelog = changelog_case(t, total)

        expect_sel = 5  # v<5000 keeps j in [0,5) of one partition
        assert n_sel == expect_sel, (n_sel, expect_sel)
        assert n_10 == hi * per_manifest, (n_10, hi * per_manifest)
        assert n_full == total, (n_full, total)
        # contract: selective-plan driver memory is O(pruned files), so it
        # must sit far below the full path list's footprint
        assert mem_sel < mem_full / 10, (mem_sel, mem_full)

        print(json.dumps({
            "entries": total,
            "manifests": n_manifests,
            "build_s": round(build_s, 2),
            "plan_selective": {"wall_s": round(w_sel, 3), "files": n_sel,
                               "driver_peak_mb": round(mem_sel, 2)},
            "plan_10pct": {"wall_s": round(w_10, 3), "files": n_10,
                           "driver_peak_mb": round(mem_10, 2)},
            "plan_full": {"wall_s": round(w_full, 3), "files": n_full,
                          "driver_peak_mb": round(mem_full, 2)},
            "changelog": changelog,
        }))
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)


if __name__ == "__main__":
    main()
