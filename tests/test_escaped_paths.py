"""Paths with URI-escaped characters (spaces etc.) in the WAREHOUSE
location: `_metadata.file_path` is percent-escaped while manifests store
raw filesystem paths — every path-keyed join must decode at the
boundary (row_ops._norm_file_col / normalize_file_uri,
deletes._decoded_meta_path_col).  Regression pins for the round-8
review finding: before the fix, MoR deletes silently stopped applying
(rows resurrected) and MERGE's touched-file probe matched nothing."""

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark import Catalog
from incubator_iceberg_spark.row_ops import WhenMatched
from incubator_iceberg_spark.schema import Schema


@pytest.fixture()
def spaced_catalog(tmp_path, spark):
    return Catalog(str(tmp_path / "wh space" / "x"), spark)


@pytest.fixture()
def ids(spark):
    return spark.range(1000).select(F.col("id"),
                                    (F.col("id") % 10).alias("v"))


def test_mor_deletes_apply_under_escaped_path(spaced_catalog, spark, ids):
    t = spaced_catalog.create_table("db.sp", Schema.from_spark(ids.schema))
    t.append(ids)
    t.delete_where("id % 7 = 0", mode="merge-on-read")
    t.delete_where("id % 11 = 0", mode="merge-on-read")  # multi-seq stamp
    exp = 1000 - len([i for i in range(1000) if i % 7 == 0 or i % 11 == 0])
    assert t.to_df().count() == exp
    assert len(t.to_arrow()) == exp  # local path decodes too


def test_eq_deletes_and_convert_under_escaped_path(spaced_catalog, spark,
                                                   ids):
    t = spaced_catalog.create_table("db.eq", Schema.from_spark(ids.schema))
    t.append(ids)
    for m in (13, 17):  # two commits -> multi-seq eq stamping join
        t.add_equality_deletes(
            spark.createDataFrame([(i,) for i in range(0, 1000, m)],
                                  "id long"), ["id"])
    exp = 1000 - len([i for i in range(1000) if i % 13 == 0 or i % 17 == 0])
    assert t.to_df().count() == exp
    t.convert_equality_deletes()
    assert t.refresh().to_df().count() == exp


def test_dv_and_inspection_under_escaped_path(spaced_catalog, spark, ids):
    t = spaced_catalog.create_table(
        "db.dv", Schema.from_spark(ids.schema),
        properties={"write.delete.format": "dv",
                    "write.delete.mode": "merge-on-read"})
    t.append(ids)
    t.delete_where("id % 5 = 0")
    t.delete_where("id % 9 = 0")
    exp = 1000 - len([i for i in range(1000) if i % 5 == 0 or i % 9 == 0])
    assert t.to_df().count() == exp
    assert t.metadata_table("position_deletes").count() == 1000 - exp


def test_merge_file_filter_under_escaped_path(spaced_catalog, spark, ids):
    t = spaced_catalog.create_table("db.mg", Schema.from_spark(ids.schema))
    for i in range(4):
        t.append(ids.filter(F.col("id") % 4 == i))
    res = t.merge(ids.filter("id % 100 = 0")
                  .withColumn("v", F.lit(999).cast("long")),
                  on=["id"], when_matched=[WhenMatched.update_all()])
    assert res["touched_files"] > 0  # the probe must find the files
    assert t.to_df().filter("v = 999").count() == 10
    assert t.to_df().count() == 1000


@pytest.fixture()
def pct_catalog(tmp_path, spark):
    # a directory whose LITERAL name contains a %-hex sequence: decode
    # applied twice turns 'a%20b' into 'a b' and breaks path-keyed joins
    return Catalog(str(tmp_path / "a%20b" / "wh"), spark)


def test_avro_mor_deletes_under_literal_percent_path(pct_catalog, spark,
                                                     ids):
    """avro lineage stamps _file from raw paths (not _metadata.file_path);
    consumers url_decode — the emit side must escape literal '%' so the
    decode is a true inverse (round-9 ADVICE, row_ops.py:717)."""
    t = pct_catalog.create_table(
        "db.av", Schema.from_spark(ids.schema),
        properties={"write.format.default": "avro"})
    t.append(ids)
    t.delete_where("id % 7 = 0", mode="merge-on-read")
    exp = 1000 - len([i for i in range(1000) if i % 7 == 0])
    assert t.to_df().count() == exp


def test_parquet_mor_deletes_under_literal_percent_path(pct_catalog, spark,
                                                        ids):
    t = pct_catalog.create_table("db.pq", Schema.from_spark(ids.schema))
    t.append(ids)
    t.delete_where("id % 7 = 0", mode="merge-on-read")
    t.delete_where("id % 11 = 0", mode="merge-on-read")
    exp = 1000 - len([i for i in range(1000) if i % 7 == 0 or i % 11 == 0])
    assert t.to_df().count() == exp
    assert len(t.to_arrow()) == exp
