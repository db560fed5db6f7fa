"""Deletion vectors (delete_vectors.py): bitmap position deletes — the
Iceberg-v3 DV shape on the engine's v2 delete plumbing.  Covers blob
roundtrip, MoR write routing via write.delete.format=dv, Spark + pyarrow
read parity, consolidation rewrite, metadata-table decoding, dangling
reclaim, and DV/plain-pos coexistence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark import delete_vectors as DV
from incubator_iceberg_spark import maintenance as MT
from incubator_iceberg_spark import metadata_tables as MD
from incubator_iceberg_spark.schema import Schema


def _ingest(warehouse, name, df, props=None, **kw):
    t = warehouse.create_table(name, Schema.from_spark(df.schema), **kw)
    if props:
        t = t.update_properties(props)
    t.append(df)
    return t


DV_PROPS = {"write.delete.format": "dv", "write.delete.mode": "merge-on-read"}


# ---------------------------------------------------------------- blob codec

def test_encode_decode_roundtrip():
    cases = [
        [0],
        [5, 5, 7],                        # dupes collapse
        list(range(4096)),                # dense → bitmap branch
        [2 ** 40, 2 ** 40 + 3],           # sparse, huge span → raw branch
        np.random.RandomState(7).randint(0, 10 ** 7, 20_000).tolist(),
    ]
    for arr in cases:
        got = DV.decode_dv(DV.encode_dv(arr))
        assert np.array_equal(got, np.unique(np.asarray(arr, dtype=np.int64)))


def test_encode_picks_compact_branch():
    dense = DV.encode_dv(list(range(10_000)))
    sparse = DV.encode_dv([i * 10 ** 9 for i in range(1, 20)])
    assert dense[0] == DV._TAG_BITMAP
    assert sparse[0] == DV._TAG_RAW
    # dense 10k consecutive positions compress to far less than 8B each
    assert len(dense) < 1000


def test_encode_rejects_bad_input():
    with pytest.raises(ValueError):
        DV.encode_dv([])
    with pytest.raises(ValueError):
        DV.encode_dv([-1, 3])


def test_prop_codec_roundtrip_any_position_set():
    """Property gate: ANY non-empty set of int64 row positions — mixed
    density, adversarial spans, duplicates — roundtrips exactly, and
    the branch choice never allocates more than the raw encoding would
    (the pre-compression size rule)."""
    from hypothesis import given, settings, strategies as st

    pos = st.one_of(
        st.integers(0, 2 ** 62),                  # anywhere in range
        st.integers(0, 5000),                     # dense cluster
        st.builds(lambda b, o: b * 10 ** 6 + o,   # clustered runs
                  st.integers(0, 50), st.integers(0, 2000)),
    )

    @settings(max_examples=150, deadline=None)
    @given(st.lists(pos, min_size=1, max_size=400))
    def check(arr):
        blob = DV.encode_dv(arr)
        want = np.unique(np.asarray(arr, dtype=np.int64))
        assert np.array_equal(DV.decode_dv(blob), want)
        if blob[0] == DV._TAG_BITMAP:
            span_bytes = (int(want[-1]) - int(want[0])) // 8 + 1
            assert span_bytes <= 8 * len(want)

    check()


# ------------------------------------------------------------- write + scan

def test_mor_delete_writes_dv_and_scans(spark, warehouse, orders):
    t = _ingest(warehouse, "db.dv1", orders, props=DV_PROPS)
    res = t.delete_where("o_totalprice > 200000")
    assert res["mode"] == "merge-on-read"
    from incubator_iceberg_spark.scan import TableScan
    _, dels = TableScan(t, spark)._plan_split()
    assert dels and all(DV.is_dv_entry(e) for e in dels)
    # record_count = deleted-row cardinality, not #dv rows
    want_deleted = orders.filter("o_totalprice > 200000").count()
    assert sum(e["record_count"] for e in dels) + 0 == want_deleted
    want = orders.filter("o_totalprice <= 200000").count()
    assert t.to_df().count() == want
    # filtered scan through the anti-join
    got = t.to_df().filter("o_orderpriority = '1-URGENT'").count()
    exp = orders.filter(
        "o_totalprice <= 200000 AND o_orderpriority = '1-URGENT'").count()
    assert got == exp


def test_arrow_local_read_applies_dv(spark, warehouse, orders):
    t = _ingest(warehouse, "db.dv2", orders, props=DV_PROPS)
    t.delete_where("o_orderkey % 5 = 0")
    want = orders.filter("o_orderkey % 5 != 0").count()
    assert t.to_arrow().num_rows == want


def test_update_mor_dv(spark, warehouse, orders):
    t = _ingest(warehouse, "db.dv3", orders,
                props={"write.delete.format": "dv",
                       "write.update.mode": "merge-on-read"})
    t.update({"o_orderpriority": "'9-LOW'"}, "o_orderkey % 11 = 0")
    got = t.to_df().filter("o_orderpriority = '9-LOW'").count()
    assert got == orders.filter("o_orderkey % 11 = 0").count()
    assert t.to_df().count() == orders.count()


def test_dv_and_plain_pos_coexist(spark, warehouse, orders):
    t = _ingest(warehouse, "db.dv4", orders, props=DV_PROPS)
    t.delete_where("o_orderkey % 3 = 0")               # DV
    t = t.update_properties({"write.delete.format": "parquet"})
    t.delete_where("o_orderkey % 7 = 0")               # plain pos parquet
    want = orders.filter(
        "o_orderkey % 3 != 0 AND o_orderkey % 7 != 0").count()
    assert t.to_df().count() == want
    assert t.to_arrow().num_rows == want


def test_partitioned_dv_delete_scoped(spark, warehouse, orders):
    t = _ingest(warehouse, "db.dv5", orders, props=DV_PROPS,
                partition_by=["month(o_orderdate)"])
    t.delete_where("o_custkey % 2 = 0")
    want = orders.filter("o_custkey % 2 != 0")
    assert t.to_df().count() == want.count()
    # partition-filtered scan still correct (scoped DV files prune along)
    got = t.to_df().filter(
        "o_orderdate >= TIMESTAMP '1997-01-01'").count()
    assert got == want.filter(
        "o_orderdate >= TIMESTAMP '1997-01-01'").count()


# ------------------------------------------------------------- maintenance

def test_rewrite_consolidates_to_single_dv(spark, warehouse, orders):
    t = _ingest(warehouse, "db.dv6", orders, props=DV_PROPS)
    t.delete_where("o_orderkey % 13 = 0")
    t.delete_where("o_orderkey % 17 = 0")
    from incubator_iceberg_spark.scan import TableScan
    _, dels = TableScan(t, spark)._plan_split()
    assert len(dels) == 2
    r = MT.rewrite_position_deletes(t, spark)
    assert r["rewritten_delete_files"] == 2
    _, dels = TableScan(t, spark)._plan_split()
    assert len(dels) == 1 and DV.is_dv_entry(dels[0])
    want = orders.filter(
        "o_orderkey % 13 != 0 AND o_orderkey % 17 != 0").count()
    assert t.to_df().count() == want


def test_rewrite_plain_pos_into_dv(spark, warehouse, orders):
    # table starts with exploded pos files; fmt='dv' converts the layout
    t = _ingest(warehouse, "db.dv7", orders,
                props={"write.delete.mode": "merge-on-read"})
    t.delete_where("o_orderkey % 9 = 0")
    r = MT.rewrite_position_deletes(t, spark, fmt="dv")
    assert r["added_delete_files"] >= 1
    from incubator_iceberg_spark.scan import TableScan
    _, dels = TableScan(t, spark)._plan_split()
    assert all(DV.is_dv_entry(e) for e in dels)
    assert t.to_df().count() == orders.filter("o_orderkey % 9 != 0").count()


def test_compaction_then_dangling_dv_reclaimed(spark, warehouse, orders):
    t = _ingest(warehouse, "db.dv8", orders, props=DV_PROPS)
    t.delete_where("o_orderkey % 4 = 0")
    # min_input_files=1: the sf0.001 ingest lands as a single small file
    MT.rewrite_data_files(t, spark, min_input_files=1)  # folds deletes in
    r = MT.remove_dangling_deletes(t)
    assert r["removed_delete_files"] >= 1
    from incubator_iceberg_spark.scan import TableScan
    _, dels = TableScan(t, spark)._plan_split()
    assert dels == []
    assert t.to_df().count() == orders.filter("o_orderkey % 4 != 0").count()


def test_position_deletes_table_decodes_dv(spark, warehouse, orders):
    t = _ingest(warehouse, "db.dv9", orders, props=DV_PROPS)
    t.delete_where("o_orderkey % 6 = 0")
    pdt = MD.metadata_table(t, "position_deletes", spark)
    rows = pdt.count()
    assert rows == orders.filter("o_orderkey % 6 = 0").count()
    assert pdt.filter(F.col("delete_file_path").isNull()).count() == 0
    # every referenced path is a live data file
    from incubator_iceberg_spark.scan import TableScan
    data, _ = TableScan(t, spark)._plan_split()
    live = {e["file_path"] for e in data}
    refs = {r["file_path"] for r in pdt.select("file_path").distinct().collect()}
    assert refs <= live


def test_datasource_reader_applies_dv(spark, warehouse, orders):
    from incubator_iceberg_spark import sources
    sources.register(spark)
    t = _ingest(warehouse, "db.dv10", orders, props=DV_PROPS)
    t.delete_where("o_orderkey % 8 = 0")
    df = spark.read.format("iiws").option("path", t.location).load()
    want = orders.filter("o_orderkey % 8 != 0").count()
    assert df.count() == want


def test_rewrite_position_deletes_to_dv_via_procedure(warehouse, spark,
                                                      orders):
    """CALL system.rewrite_position_deletes(fmt => 'dv') converts a
    plain exploded-tuple MoR table's debt to deletion vectors without
    flipping the table property."""
    from incubator_iceberg_spark import delete_vectors as DV
    from incubator_iceberg_spark import procedures as PR
    from incubator_iceberg_spark.scan import TableScan
    from incubator_iceberg_spark.schema import Schema

    t = warehouse.create_table("db.dvproc", Schema.from_spark(orders.schema))
    t.append(orders)
    t.delete_where("o_orderkey % 13 = 0", mode="merge-on-read")
    dels = TableScan(t, spark)._plan_split()[1]
    assert dels and not any(DV.is_dv_entry(e) for e in dels)
    want = t.to_df().count()
    PR.call(warehouse,
            "CALL system.rewrite_position_deletes('db.dvproc', fmt => 'dv')")
    t.refresh()
    dels2 = TableScan(t, spark)._plan_split()[1]
    assert dels2 and all(DV.is_dv_entry(e) for e in dels2)
    assert t.to_df().count() == want
