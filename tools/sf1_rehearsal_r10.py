"""Round-10 sf1 rehearsal (r9 VERDICT stretch item #8): the two newest
scan-path features — fingerprint-bucketed eq-delete planning
(rest_catalog_scan's MoR shape) and residual grouping (residual_scan) —
had sf0.1 evidence only.  Time both query shapes at sf0.1 vs the 10x
key-shifted sf1 replica (tools/make_scaled_sf.py) and check:

- wall scales ~with data (not #files^2 / #epochs^2);
- residual grouping overhead is FLAT in #files: the driver-side
  _residual_groups pass is timed separately at both scales.

Usage: python tools/sf1_rehearsal_r10.py [sf1_dir]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E
from incubator_iceberg_spark.session import get_spark

QUERIES = ["rest_catalog_scan", "residual_scan", "unknown_transform_scan",
           "sql_describe"]


def time_residual_grouping(spark, sf_dir, n_chunks=1):
    """Driver-side residual-group pass alone (plan-time overhead).
    ``n_chunks`` appends the data in that many slices so the kept-file
    count scales with it — the flat-in-#files check."""
    from incubator_iceberg_spark import Catalog
    from incubator_iceberg_spark.scan import TableScan
    from incubator_iceberg_spark.schema import Schema
    import os
    import uuid
    cat = Catalog(os.path.join("/tmp/iiws_scratch", uuid.uuid4().hex), spark)
    li = E._load(spark, sf_dir, "lineitem")
    t = cat.create_table("s.res", Schema.from_spark(li.schema),
                         partition_by=["month(l_shipdate)"],
                         properties={"read.use-residuals": "true"})
    if n_chunks == 1:
        t.append(li)
    else:
        for i in range(n_chunks):
            t.append(li.filter(f"l_orderkey % {n_chunks} = {i}"))
    pred = ("l_shipdate >= TIMESTAMP '1995-03-15' "
            "AND l_shipdate < TIMESTAMP '1995-09-01' "
            "AND l_quantity < 25")
    scan = TableScan(t, spark, row_filter=pred)
    md = t.metadata
    data, _dels = scan._plan_split()
    bound = scan._bound_filter(md.schema())
    t0 = time.perf_counter()
    groups = scan._residual_groups(md, data, bound)
    dt = time.perf_counter() - t0
    return dt, len(data), len(groups or [])


def main():
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/sf1"
    spark = get_spark(app_name="sf1-rehearsal-r10")
    E._prep(spark)
    qs = E.queries()
    qs["residual_scan"](spark, "/root/testdata/sf0.001").count()  # warm
    out = {}
    for sf_dir, label in (("/root/testdata/sf0.1", "sf0.1"), (sf1, "sf1")):
        for name in QUERIES:
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            dt = time.time() - t0
            out[(label, name)] = dt
            print(f"{label:6s} {name:24s} {dt:7.2f}s  ({n} rows)",
                  flush=True)
        g_dt, n_files, n_groups = time_residual_grouping(spark, sf_dir)
        out[(label, "_residual_grouping")] = (g_dt, n_files)
        print(f"{label:6s} residual-grouping pass   {g_dt * 1000:7.1f}ms "
              f"over {n_files} kept files -> {n_groups} groups", flush=True)
    print("\nratios (sf1 / sf0.1; data is 10x):")
    for name in QUERIES:
        r = out[("sf1", name)] / out[("sf0.1", name)]
        print(f"  {name:24s} {r:5.2f}x")
    g1, f1 = out[("sf1", "_residual_grouping")]
    g0, f0 = out[("sf0.1", "_residual_grouping")]
    print(f"  residual-grouping        {g1 / g0:5.2f}x wall over "
          f"{f1 / max(f0, 1):.1f}x files")
    # flat-in-#files: same data, 16x the files in the kept window
    ga, fa, _ = time_residual_grouping(spark, "/root/testdata/sf0.1", 1)
    gb, fb, _ = time_residual_grouping(spark, "/root/testdata/sf0.1", 16)
    print(f"  grouping vs #files: {ga * 1000:.2f}ms @ {fa} files -> "
          f"{gb * 1000:.2f}ms @ {fb} files "
          f"({gb / max(ga, 1e-9):.1f}x wall over {fb / max(fa, 1):.0f}x "
          f"files; per-file cost {'flat' if gb / max(ga, 1e-9) <= 2 * fb / max(fa, 1) else 'NOT flat'})")
    spark.stop()


if __name__ == "__main__":
    main()
