"""Test-data loading helpers for the driver's TPC-H-ish tables."""

from __future__ import annotations

import os

SF_TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
             "lineitem", "events", "documents", "embeddings")


def load_table(spark, sf_dir: str, name: str):
    """Load one driver-generated table; normalizes the events table's
    nanosecond timestamps to TimestampType (micros)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer division: ts/1000 through a double would corrupt ns epochs
            # (~1.7e18 exceeds the 2^53 double mantissa)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # parquet isAdjustedToUTC=false reads as TIMESTAMP_NTZ in Spark 4;
            # session tz is pinned to UTC so this cast preserves the micros
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark, sf_dir: str, tables=SF_TABLES) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
