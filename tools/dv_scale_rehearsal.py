"""Deletion-vector layout at delete-debt scale (round 6).

The DV claim: steady-state MoR debt on a big table stops costing
O(deleted rows) exploded (file_path, pos) tuples and becomes
O(touched data files) compressed bitmap rows.  This rehearsal measures
the claim directly on synthetic debt shaped like a 100 TB table's
(many data files, clustered deleted positions per file):

  1. layout size  — bytes at rest for the SAME (file_path, pos) set
     written as exploded pos parquet vs as DV files;
  2. apply-side   — wall time to materialize the decoded tuple view
     (read_dv_pos_df → count) vs scanning the exploded parquet, i.e.
     the input cost of the anti-join both layouts feed.

Two debt shapes per scale: 'dense' (contiguous position runs — the
compaction/retention shape, bitmap branch) and 'sparse' (scattered
positions — the point-delete shape, raw branch).

Usage: python tools/dv_scale_rehearsal.py [n_files] [dels_per_file]
Defaults 10_000 x 100 (10^6 tuples).  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from incubator_iceberg_spark import delete_vectors as DV
from incubator_iceberg_spark import deletes as DEL
from incubator_iceberg_spark.session import get_spark


def tree_bytes(paths):
    return sum(os.path.getsize(p) for p in paths)


def run(spark, n_files: int, per_file: int, shape: str) -> dict:
    from pyspark.sql import functions as F

    loc = tempfile.mkdtemp(prefix=f"dv_rehearsal_{shape}_")
    os.makedirs(os.path.join(loc, "data"))
    # synthetic debt: n_files data paths x per_file deleted positions.
    # dense = runs starting at a random-ish offset (retention window),
    # sparse = positions strided across a 1M-row file (point deletes).
    stride = 1 if shape == "dense" else 9973
    pos_df = (
        spark.range(n_files * per_file)
        .select(
            F.format_string(
                "/wh/db/t/data/part-%07d.parquet",
                (F.col("id") / per_file).cast("long")).alias("file_path"),
            ((F.col("id") % per_file) * stride
             + F.pmod(F.xxhash64((F.col("id") / per_file).cast("long")),
                      100_000)).alias("pos"))
    )

    t0 = time.time()
    plain_entries = DEL._write_delete_parquet(
        spark, loc, pos_df.sortWithinPartitions("file_path", "pos"),
        DEL.POS_DELETE_SCHEMA)
    t_plain_write = time.time() - t0

    t0 = time.time()
    dv_entries = DV.write_dv_files(spark, loc, pos_df)
    t_dv_write = time.time() - t0

    plain_bytes = tree_bytes([e["file_path"] for e in plain_entries])
    dv_bytes = tree_bytes([e["file_path"] for e in dv_entries])

    # apply-side input: decoded tuple view count (forces full decode)
    for e in dv_entries:
        e["sequence_number"] = 7
    t0 = time.time()
    n_dv = DV.read_dv_pos_df(spark, dv_entries).count()
    t_dv_read = time.time() - t0
    t0 = time.time()
    n_plain = (spark.read.schema(DEL.POS_DELETE_SCHEMA.to_spark())
               .parquet(*[e["file_path"] for e in plain_entries]).count())
    t_plain_read = time.time() - t0
    assert n_dv == n_plain == n_files * per_file, (n_dv, n_plain)

    shutil.rmtree(loc, ignore_errors=True)
    return {
        "shape": shape,
        "tuples": n_files * per_file,
        "plain_files": len(plain_entries),
        "dv_files": len(dv_entries),
        "plain_mb": round(plain_bytes / 1e6, 2),
        "dv_mb": round(dv_bytes / 1e6, 2),
        "bytes_ratio": round(plain_bytes / max(dv_bytes, 1), 2),
        "write_s": {"plain": round(t_plain_write, 2),
                    "dv": round(t_dv_write, 2)},
        "decode_s": {"plain": round(t_plain_read, 2),
                     "dv": round(t_dv_read, 2)},
    }


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark()
    out = [run(spark, n_files, per_file, s) for s in ("dense", "sparse")]
    print(json.dumps({"n_files": n_files, "per_file": per_file,
                      "results": out}))


if __name__ == "__main__":
    main()
