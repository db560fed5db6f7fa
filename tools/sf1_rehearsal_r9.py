"""Round-9 sf1 rehearsal (VERDICT r8 item 5): time the round-8/9
composition surfaces at sf0.1 vs a 10x key-shifted sf1 replica
(tools/make_scaled_sf.py) and verify wall time scales ~with data (not
epochs^2), plus exercise merge_file_filter's scale-invariant assertion
at sf1.  Usage: python tools/sf1_rehearsal_r9.py [sf1_dir]"""
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E
from incubator_iceberg_spark.session import get_spark

QUERIES = ["streaming_scd2", "auto_maintain", "streaming_auto_maintain",
           "merge_file_filter"]


def main():
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/sf1"
    spark = get_spark(app_name="sf1-rehearsal-r9")
    E._prep(spark)
    qs = E.queries()
    # warm the session (JIT, python workers)
    qs["merge_file_filter"](spark, "/root/testdata/sf0.001").count()
    out = {}
    for sf_dir, label in (("/root/testdata/sf0.1", "sf0.1"), (sf1, "sf1")):
        for name in QUERIES:
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            dt = time.time() - t0
            out[(label, name)] = dt
            print(f"{label:6s} {name:24s} {dt:7.2f}s  ({n} rows)", flush=True)
    print("\nratios (sf1 / sf0.1; data is 10x):")
    for name in QUERIES:
        r = out[("sf1", name)] / out[("sf0.1", name)]
        print(f"  {name:24s} {r:5.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
