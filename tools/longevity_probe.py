"""Snapshot-log longevity probe — commit #10,000 (r10 verdict #5).

Every commit rewrites the full metadata JSON, which grows with the
snapshot log — the same shape as the reference, which bounds it via
``write.metadata.previous-versions-max`` + expire_snapshots
(core/src/main/java/org/apache/iceberg/TableMetadata.java previousFiles
+ RemoveSnapshots).  Nothing measured this repo at high commit count
before: this probe synthesizes a 10k-commit table (metadata-only fast
appends re-registering one staged data file), sampling at checkpoints:

  - commit latency (median of a 20-commit window),
  - metadata JSON size,
  - load_table latency (ops.refresh() — JSON parse of the full log),
  - manifest-list length (bounded by manifest merging),
  - plan_files() wall (entry count grows linearly).

then verifies the two reclamation levers actually reclaim:

  - expire_snapshots(retain_last=1) prunes the snapshot log →
    metadata JSON shrinks to O(1) and commit/load latency resets;
  - previous-versions-max + delete-after-commit bound the metadata
    DIRECTORY (file count), which otherwise holds one full JSON per
    commit forever.

Run:  python tools/longevity_probe.py [--commits 10000]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHECKPOINTS = [100, 500, 1000, 2000, 5000, 10000]


def run_probe(n_commits: int = 10000, verbose: bool = True) -> dict:
    from incubator_iceberg_spark.session import get_spark
    from incubator_iceberg_spark import Catalog
    from incubator_iceberg_spark import snapshots as SN
    from incubator_iceberg_spark.schema import Schema
    from incubator_iceberg_spark.scan import TableScan

    spark = get_spark()
    root = f"/tmp/longevity_probe_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root, spark)
    # ONE staged file re-registered per commit: metadata-only fast
    # appends isolate the metadata-plane cost (the point of the probe)
    df = spark.range(10).selectExpr(
        "id", "CAST(id AS STRING) AS s").coalesce(1)
    t = cat.create_table(
        "db.longevity", Schema.from_spark(df.schema),
        properties={
            # bound the metadata DIRECTORY: keep 20 old versions, unlink
            # the rest after each commit (reference TableProperties
            # METADATA_PREVIOUS_VERSIONS_MAX / METADATA_DELETE_AFTER_COMMIT)
            "write.metadata.previous-versions-max": "20",
            "write.metadata.delete-after-commit.enabled": "true",
        })
    entries = t._stage(df, spark)
    t.metadata = SN.append_files(t.ops, entries)

    def md_size() -> int:
        v = t.ops.current_version()
        return os.path.getsize(t.ops.metadata_path(v))

    def md_dir_files() -> int:
        return sum(1 for n in os.listdir(t.ops.metadata_dir)
                   if n.endswith(".metadata.json"))

    def manifest_list_len() -> int:
        from incubator_iceberg_spark import manifests as MF
        return MF.read_manifest_list_arrow(
            t.metadata.current_snapshot().manifest_list).num_rows

    def sample(label) -> dict:
        # commit latency: median over the last window of 20 commits is
        # taken by the caller; here measure load + plan
        t0 = time.time()
        t.ops.refresh()
        load_sec = time.time() - t0
        t0 = time.time()
        n_files = len(TableScan(t, spark).plan_files())
        plan_sec = time.time() - t0
        return {
            "label": label,
            "load_table_ms": round(load_sec * 1000, 2),
            "plan_files_ms": round(plan_sec * 1000, 2),
            "plan_file_count": n_files,
            "metadata_json_mb": round(md_size() / 1e6, 3),
            "metadata_dir_jsons": md_dir_files(),
            "manifest_list_rows": manifest_list_len(),
        }

    samples = []
    window: list[float] = []
    committed = 1
    while committed < n_commits:
        t0 = time.time()
        t.metadata = SN.append_files(t.ops, entries)
        window.append(time.time() - t0)
        committed += 1
        if committed in CHECKPOINTS:
            w = sorted(window[-20:])
            s = sample(f"commit_{committed}")
            s["commit_ms_median20"] = round(w[len(w) // 2] * 1000, 2)
            samples.append(s)
            if verbose:
                print(json.dumps(s), flush=True)

    # reclamation lever 1: expire prunes the snapshot log
    t0 = time.time()
    res = t.expire_snapshots(retain_last=1)
    expire_sec = round(time.time() - t0, 2)
    t0 = time.time()
    t.metadata = SN.append_files(t.ops, entries)
    post_commit_ms = round((time.time() - t0) * 1000, 2)
    post = sample("after_expire")
    post["expire_sec"] = expire_sec
    post["expired_snapshots"] = res["expired_snapshots"]
    post["commit_ms_after_expire"] = post_commit_ms
    samples.append(post)
    if verbose:
        print(json.dumps(post), flush=True)

    out = {"n_commits": n_commits, "samples": samples}
    shutil.rmtree(root, ignore_errors=True)
    return out


def main(argv: list) -> int:
    n = 10000
    if "--commits" in argv:
        n = int(argv[argv.index("--commits") + 1])
    run_probe(n_commits=n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
