"""Parquet bloom-filter table properties (TableProperties.java
PARQUET_BLOOM_FILTER_COLUMN_ENABLED_PREFIX family): the write path maps
``write.parquet.bloom-filter-enabled.column.<col>`` (+fpp/ndv/max-bytes)
to parquet-mr writer options, so point lookups on high-cardinality,
non-clustered columns can skip row groups whose [min,max] covers the
probe value.  Readers need no config — parquet-mr row-group filtering
consults the bloom automatically under Spark's filter pushdown.
"""

import pytest

from incubator_iceberg_spark import write as W
from incubator_iceberg_spark.schema import Schema


def _bloom_offsets(spark, file_path: str) -> dict:
    """column name -> bloom filter offset (-1 = none) for row group 0."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(file_path)
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        path, conf)
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    try:
        rg = reader.getFooter().getBlocks().get(0)
        out = {}
        for i in range(rg.getColumns().size()):
            cc = rg.getColumns().get(i)
            out[cc.getPath().toDotString()] = cc.getBloomFilterOffset()
        return out
    finally:
        reader.close()


def test_parquet_writer_options_mapping():
    opts = W.parquet_writer_options({
        "write.parquet.bloom-filter-enabled.column.o_orderkey": "true",
        "write.parquet.bloom-filter-fpp.column.o_orderkey": "0.05",
        "write.parquet.bloom-filter-expected-ndv.column.o_orderkey": "5000",
        "write.parquet.bloom-filter-max-bytes": "1048576",
        "write.parquet.row-group-size-bytes": "1048576",
        "write.parquet.compression-codec": "zstd",
        "write.format.default": "parquet",  # unrelated — ignored
    })
    assert opts == {
        "parquet.bloom.filter.enabled#o_orderkey": "true",
        "parquet.bloom.filter.fpp#o_orderkey": "0.05",
        "parquet.bloom.filter.expected.ndv#o_orderkey": "5000",
        "parquet.bloom.filter.max.bytes": "1048576",
        "parquet.block.size": "1048576",
        "compression": "zstd",
    }
    assert W.parquet_writer_options(None) == {}


def test_bloom_filter_written_and_survives_compaction(warehouse, orders, spark):
    t = warehouse.create_table(
        "db.bloom_orders", Schema.from_spark(orders.schema),
        properties={
            "write.parquet.bloom-filter-enabled.column.o_orderkey": "true",
            "write.parquet.bloom-filter-expected-ndv.column.o_orderkey": "2000",
        })
    t.append(orders)
    files = [p for p, _ in t.new_scan(spark).plan_files()]
    offs = _bloom_offsets(spark, files[0])
    assert offs["o_orderkey"] > 0, "bloom filter missing on enabled column"
    assert offs["o_custkey"] == -1, "bloom filter on a non-enabled column"

    # rewrites flow the table properties too: compacted files keep blooms
    t.append(orders.limit(100))
    res = t.rewrite_data_files(min_input_files=2)
    assert res["rewritten_files"] >= 2
    files2 = [p for p, _ in t.new_scan(spark).plan_files()]
    assert files2 != files
    offs2 = _bloom_offsets(spark, files2[0])
    assert offs2["o_orderkey"] > 0, "compaction dropped the bloom filter"


def test_bloom_filter_absent_without_property(warehouse, orders, spark):
    t = warehouse.create_table(
        "db.nobloom_orders", Schema.from_spark(orders.schema))
    t.append(orders)
    f = t.new_scan(spark).plan_files()[0][0]
    offs = _bloom_offsets(spark, f)
    assert all(v == -1 for v in offs.values())


def test_row_group_size_property_applies(warehouse, spark):
    from pyspark.sql import functions as F
    df = (spark.range(200_000).coalesce(1)
          .select(F.col("id"), F.sha2(F.col("id").cast("string"), 256)
                  .alias("payload")))
    t = warehouse.create_table(
        "db.rg_wide", Schema.from_spark(df.schema),
        properties={"write.parquet.row-group-size-bytes": "262144",
                    "write.parquet.page-size-bytes": "16384"})
    t.append(df)
    f = t.new_scan(spark).plan_files()[0][0]
    import pyarrow.parquet as pq
    md = pq.ParquetFile(f).metadata
    assert md.num_row_groups >= 2, "row-group-size property not applied"
