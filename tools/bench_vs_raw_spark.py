"""Engine overhead vs raw Spark: run the read-path headline queries twice —
through the engine's tables (metadata planning + pruned scan) and as plain
``spark.read.parquet`` DataFrame queries — and report the ratio.

The engine's value is pruning + ACID; this shows what that costs (or
saves) on the same session, same data, same plans.

Usage: python tools/bench_vs_raw_spark.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import __spark_entry__ as E
    from incubator_iceberg_spark.io import load_table
    from incubator_iceberg_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="bench-vs-raw")
    E._prep(spark)
    E._ensure_warehouse(spark, sf_dir)

    li_raw = load_table(spark, sf_dir, "lineitem")
    orders_raw = load_table(spark, sf_dir, "orders")
    cust_raw = load_table(spark, sf_dir, "customer")

    def raw_q1():
        return (li_raw.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
                .groupBy("l_returnflag", "l_linestatus")
                .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                     F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                     F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
                     F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                     F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                     F.count("*").alias("count_order")))

    def raw_q6():
        return (li_raw.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24))
            .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
                 .alias("revenue")))

    def raw_q3():
        return (li_raw.join(orders_raw, li_raw.l_orderkey == orders_raw.o_orderkey)
                .join(F.broadcast(cust_raw), orders_raw.o_custkey == cust_raw.c_custkey)
                .filter((F.col("c_mktsegment") == "BUILDING")
                        & (F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
                        & (F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")))
                .groupBy("l_orderkey", "o_orderdate")
                .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                     .alias("revenue"))
                .orderBy(F.desc("revenue"), F.col("l_orderkey")).limit(10))

    def raw_filter():
        return (li_raw.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") > 0.08))
            .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"))

    qs = E.queries()
    pairs = [
        ("q1_pricing_summary", raw_q1),
        ("q6_forecast_revenue", raw_q6),
        ("q3_shipping_priority", raw_q3),
        ("filter_pushdown_scan", raw_filter),
    ]

    def timeit(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn().count()
            best = min(best, time.time() - t0)
        return best

    out = {}
    for name, raw_fn in pairs:
        eng = timeit(lambda: qs[name](spark, sf_dir))
        raw = timeit(raw_fn)
        out[name] = {"engine_sec": round(eng, 3), "raw_spark_sec": round(raw, 3),
                     "ratio": round(eng / raw, 2)}
        print(f"{name}: engine {eng:.3f}s  raw {raw:.3f}s  ratio {eng/raw:.2f}x",
              file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
