"""Equality-delete BACKLOG read-path rehearsal (round 8).

The upsert-MoR sink accrues one eq-delete file per epoch between
maintenance runs.  Round 8 gated the eq anti-join broadcast by summed
record_count (deletes.py BROADCAST_MAX_DELETE_TUPLES) and collapsed the
per-file reads into one multi-path read — so a reader catching up on a
large backlog takes a shuffle anti-join instead of broadcasting the
whole key set through an O(#files) union plan.

This rehearsal drives that path for real:
  1. base table, then E upsert-MoR epochs of K update-keys each
     (eq debt = E files, E*K tuples);
  2. full-scan count with debt UNDER the gate (broadcast path) and
     OVER the gate (shuffle path + maintenance advisory);
  3. convert_equality_deletes + rewrite, then re-scan (debt paid).

Counts are exact at every step (updates never change cardinality), so
this is a correctness gate as well as a timing probe.

Usage: python tools/eq_debt_rehearsal.py [base_rows] [epochs] [keys/epoch]
Defaults 2_000_000 10 150_000 (1.5M tuples: past the 1M gate).
Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from incubator_iceberg_spark import streaming as STR
from incubator_iceberg_spark.session import get_spark
from incubator_iceberg_spark.table import Catalog


def main():
    base_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    keys = int(sys.argv[3]) if len(sys.argv) > 3 else 150_000

    from pyspark.sql import functions as F
    from incubator_iceberg_spark import deletes as DEL
    from incubator_iceberg_spark.schema import Schema

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    tmp = tempfile.mkdtemp(prefix="eqdebt_")
    out = {"base_rows": base_rows, "epochs": epochs, "keys_per_epoch": keys,
           "gate": DEL.BROADCAST_MAX_DELETE_TUPLES}
    try:
        cat = Catalog(tmp, spark)
        base = spark.range(base_rows).select(
            F.col("id"), (F.col("id") % 1000).alias("v"))
        t = cat.create_table("db.eqd", Schema.from_spark(base.schema))
        t.append(base)

        def epoch_batch(ep):
            # scattered existing keys, values bumped per epoch
            return (spark.range(keys)
                    .select((F.col("id") * (base_rows // keys) + ep)
                            .alias("id"))
                    .filter(F.col("id") < base_rows)
                    .withColumn("v", F.lit(1000 + ep).cast("long"))
                    .withColumn("op", F.lit("U")))

        debt_tuples = 0
        under_gate_scan = None
        for ep in range(epochs):
            STR.upsert_mor_exactly_once(t, epoch_batch(ep), epoch_id=ep,
                                        on=["id"], op_col="op")
            t = t.refresh()
            debt_tuples += keys
            if under_gate_scan is None and \
                    debt_tuples * 2 > DEL.BROADCAST_MAX_DELETE_TUPLES:
                # last epoch where the NEXT one would cross half-gate:
                # time the broadcast-path scan here
                t0 = time.time()
                n = t.to_df(spark).count()
                under_gate_scan = round(time.time() - t0, 3)
                assert n == base_rows, (n, base_rows)
                out["under_gate_epochs"] = ep + 1
                out["under_gate_tuples"] = debt_tuples
        out["under_gate_scan_sec"] = under_gate_scan
        out["backlog_tuples"] = debt_tuples

        # the over-gate scan must take the shuffle path AND emit the
        # maintenance advisory (events.register listener)
        from incubator_iceberg_spark import events as EV
        seen = []
        EV.register(seen.append)
        try:
            t0 = time.time()
            n = t.to_df(spark).count()
            out["backlog_scan_sec"] = round(time.time() - t0, 3)
        finally:
            EV.unregister(seen.append)
        assert n == base_rows, (n, base_rows)
        out["advisory_emitted"] = any(
            isinstance(e, EV.MaintenanceAdvisory)
            and e.kind == "convert_equality_deletes" for e in seen)
        assert out["advisory_emitted"], "expected eq-debt advisory"

        t0 = time.time()
        t.convert_equality_deletes()
        t = t.refresh()
        t.rewrite_position_deletes(fmt="dv")
        t = t.refresh()
        out["convert_sec"] = round(time.time() - t0, 3)

        t0 = time.time()
        n = t.to_df(spark).count()
        out["post_convert_scan_sec"] = round(time.time() - t0, 3)
        assert n == base_rows, (n, base_rows)

        # the loop ENDS with compaction: data rewrite folds the DV debt
        # in, after which scans carry zero delete-application cost
        t0 = time.time()
        t.rewrite_data_files(min_input_files=2)
        t = t.refresh()
        out["compact_sec"] = round(time.time() - t0, 3)
        t0 = time.time()
        n = t.to_df(spark).count()
        out["post_compact_scan_sec"] = round(time.time() - t0, 3)
        assert n == base_rows, (n, base_rows)

        # value correctness spot check: the LAST epoch touching key 0's
        # stride wins
        row = t.to_df(spark).filter(F.col("id") == (base_rows // keys)
                                    * 7 + 3).limit(1).collect()
        out["spot_ok"] = bool(row)
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
