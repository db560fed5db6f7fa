"""Dangling-delete reclaim at metadata scale (r5 verdict item 2).

Fabricates one snapshot with N data entries (post-compaction, high
sequence number) plus M delete entries — a half-and-half mix of
dangling and live, across both eq- and pos-delete kinds (pos deletes
carry real referenced-path bounds) — then times
``remove_dangling_deletes`` end-to-end (liveness + the reclaim commit).

The r5 implementation was an O(M x N) Python loop on the driver
(10^10 comparisons at 10^6 x 10^4); the columnar rewrite must show
near-linear wall time across a decade.  Entry fabrication uses the same
write_manifest code every real commit uses.

Usage: python tools/dangling_delete_rehearsal.py [n_data] [n_deletes]
Defaults 100_000 x 1_000.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from incubator_iceberg_spark import manifests as M
from incubator_iceberg_spark import metadata as MD
from incubator_iceberg_spark import schema as S
from incubator_iceberg_spark import snapshots as SN
from incubator_iceberg_spark.session import get_spark
from incubator_iceberg_spark.table import Catalog

DATA_SEQ = 5  # every data file post-compaction


def build_table(warehouse: str, spark, n_data: int, n_dels: int):
    cat = Catalog(warehouse, spark)
    t = cat.create_table(
        "db.debt",
        S.Schema([S.NestedField(1, "id", S.LongType(), True),
                  S.NestedField(2, "v", S.LongType())]),
        properties={MD.MANIFEST_MIN_MERGE_COUNT: str(10 ** 9)},
    )
    ops = t.ops
    base = ops.refresh()
    md_dir = os.path.join(base.location, "metadata")
    spec = base.spec()
    schema = base.schema()
    loc = base.location

    def dpath(i: int) -> str:
        return f"{loc}/data/f-{i:07d}.parquet"

    def make(view, snapshot_id, seq):
        per = 10_000
        rows = []
        for start in range(0, n_data, per):
            entries = []
            for i in range(start, min(start + per, n_data)):
                entries.append({
                    "status": M.ADDED, "snapshot_id": snapshot_id,
                    "sequence_number": DATA_SEQ, "content": M.DATA,
                    "file_path": dpath(i), "file_format": "parquet",
                    "spec_id": spec.spec_id, "schema_id": schema.schema_id,
                    "record_count": 1000,
                    "file_size_bytes": 64 * 1024 * 1024,
                })
            rows.append(M.write_manifest(md_dir, entries, schema, spec,
                                         snapshot_id, seq,
                                         properties=base.properties))
        dels = []
        n_each = n_dels // 4
        for k in range(n_dels):
            kind = k % 4
            if kind == 0:    # eq delete BELOW every data seq → dangling
                e = {"content": M.EQUALITY_DELETES,
                     "sequence_number": DATA_SEQ - 2}
            elif kind == 1:  # eq delete above data seq → alive
                e = {"content": M.EQUALITY_DELETES,
                     "sequence_number": DATA_SEQ + 2}
            elif kind == 2:  # pos delete, in-range bounds, seq == data → alive
                i = (k * 37) % max(1, n_data - 3)
                e = {"content": M.POSITION_DELETES,
                     "sequence_number": DATA_SEQ,
                     "ref_lower_bound": dpath(i),
                     "ref_upper_bound": dpath(i + 2)}
            else:            # pos delete, seq below every data file → dangling
                i = (k * 53) % max(1, n_data - 3)
                e = {"content": M.POSITION_DELETES,
                     "sequence_number": DATA_SEQ - 1,
                     "ref_lower_bound": dpath(i),
                     "ref_upper_bound": dpath(i + 2)}
            e.update({
                "status": M.ADDED, "snapshot_id": snapshot_id,
                "file_path": f"{loc}/data/del-{k:06d}.parquet",
                "file_format": "parquet", "spec_id": spec.spec_id,
                "schema_id": schema.schema_id, "record_count": 10,
                "file_size_bytes": 4096,
            })
            dels.append(e)
        for start in range(0, len(dels), per):
            rows.append(M.write_manifest(md_dir, dels[start:start + per],
                                         schema, spec, snapshot_id, seq,
                                         properties=base.properties))
        return rows

    MD.run_with_retries(
        ops, lambda b: SN._install_snapshot(b, make, "append", None, [], []))
    return cat.load_table("db.debt", spark), n_dels // 4 * 2 + (
        1 if n_dels % 4 in (1, 2) else 0) + (1 if n_dels % 4 == 3 else 0)


def main():
    n_data = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_dels = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    warehouse = tempfile.mkdtemp(prefix="dangling_")
    try:
        t0 = time.perf_counter()
        t, _ = build_table(warehouse, spark, n_data, n_dels)
        build_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        res = t.remove_dangling_deletes()
        reclaim_s = time.perf_counter() - t0

        # kinds 0 and 3 are dangling by construction
        expect = sum(1 for k in range(n_dels) if k % 4 in (0, 3))
        assert res["removed_delete_files"] == expect, (res, expect)

        # idempotent second pass: nothing left to reclaim
        t0 = time.perf_counter()
        res2 = t.remove_dangling_deletes()
        second_s = time.perf_counter() - t0
        assert res2["removed_delete_files"] == 0, res2

        print(json.dumps({
            "n_data": n_data, "n_deletes": n_dels,
            "removed": res["removed_delete_files"],
            "build_s": round(build_s, 2),
            "reclaim_s": round(reclaim_s, 3),
            "second_pass_s": round(second_s, 3),
        }))
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)


if __name__ == "__main__":
    main()
