"""T6 forward-compat: a table whose metadata names a partition
transform this engine doesn't implement (written by a NEWER engine
version) must stay READABLE — no pruning on that field, scan-all-
partitions planning, row filters still applied — while writes and
spec-creating DDL reject it.

Reference: api/.../transforms/UnknownTransform.java (project/
projectStrict return null; getResultType is string; only write-side
use rejects); mirror test api/src/test/.../TestUnknownTransform.java.
"""

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark import evolution as EV
from incubator_iceberg_spark.scan import TableScan
from incubator_iceberg_spark.schema import Schema


def _stamp_unknown(t, old: str, new: str):
    """Rewrite the CURRENT metadata JSON replacing a spec's transform
    name — simulating metadata written by a newer engine."""
    ops = t.ops
    path = ops.metadata_path(ops.current_version())
    with open(path) as f:
        raw = f.read()
    assert f'"{old}"' in raw, raw[:200]
    with open(path, "w") as f:
        f.write(raw.replace(f'"{old}"', f'"{new}"'))


@pytest.fixture()
def unk_table(warehouse, orders):
    t = warehouse.create_table("db.unk", Schema.from_spark(orders.schema),
                               partition_by=[("o_orderkey", "bucket[4]")])
    t.append(orders)
    return t


def test_unknown_transform_table_stays_readable(warehouse, orders,
                                                unk_table, spark):
    # pick a MID-RANGE key: inside every file's column-stats bounds, so
    # only bucket-transform projection could prune — isolating the
    # partition-pruning axis from the metrics evaluator
    k = orders.approxQuantile("o_orderkey", [0.5], 0.0)[0]
    k = int(k)
    # with the KNOWN bucket spec, an equality filter prunes buckets
    pruned = len(TableScan(unk_table, spark,
                           row_filter=f"o_orderkey = {k}").plan_files())
    total = len(TableScan(unk_table, spark).plan_files())
    assert pruned < total

    _stamp_unknown(unk_table, "bucket[4]", "future_op[16]")
    t2 = warehouse.load_table("db.unk")
    tr = t2.metadata.spec().fields[0].transform
    assert type(tr).__name__ == "UnknownTransform" and str(tr) == \
        "future_op[16]"

    # pruning is OFF for that field: the same filter plans ALL files...
    scan = TableScan(t2, spark, row_filter=f"o_orderkey = {k}")
    assert len(scan.plan_files()) == total
    # ...and the row filter still applies — results are correct
    assert scan.to_df().count() == \
        orders.filter(f"o_orderkey = {k}").count()
    assert t2.to_df().count() == orders.count()

    # metadata ROUND-TRIPS the unknown name verbatim (a property change
    # commits fine and the next reader still sees future_op[16])
    t2.update_properties({"commit.retry.num-retries": "3"})
    t3 = warehouse.load_table("db.unk")
    assert str(t3.metadata.spec().fields[0].transform) == "future_op[16]"


def test_unknown_transform_rejects_writes_and_ddl(warehouse, orders,
                                                  unk_table, spark):
    _stamp_unknown(unk_table, "bucket[4]", "future_op[16]")
    t2 = warehouse.load_table("db.unk")
    # WRITES reject: the engine cannot compute the partition value
    with pytest.raises(NotImplementedError, match="future_op"):
        t2.append(orders.limit(1))
    # ALTER-to-unknown rejects at spec build
    with pytest.raises(ValueError, match="unknown transform"):
        EV.update_partition_spec(t2, [("o_custkey", "future_op[16]")])
    # but evolving to a KNOWN spec works — and writes resume under it
    EV.update_partition_spec(t2, [("o_custkey", "bucket[2]")])
    t3 = warehouse.load_table("db.unk")
    t3.append(orders.limit(5))
    assert t3.to_df().count() == orders.count() + 5
    # the old unknown-spec files still plan (mixed-spec groups) with no
    # pruning on the unknown field
    scan = TableScan(t3, spark, row_filter="o_orderkey = 7")
    assert scan.to_df().count() == \
        orders.filter("o_orderkey = 7").count() + orders.limit(5).filter(
            "o_orderkey = 7").count()


def test_unknown_transform_metadata_tables_readable(warehouse, orders,
                                                    unk_table, spark):
    """Inspection surfaces stay up on a cross-version table: every
    metadata table serves rows (partition values pass through as
    stored)."""
    _stamp_unknown(unk_table, "bucket[4]", "future_op[16]")
    t2 = warehouse.load_table("db.unk")
    for mt in ("files", "partitions", "snapshots", "manifests", "entries",
               "position_deletes", "refs", "history"):
        assert t2.metadata_table(mt).count() >= 0, mt
    assert t2.metadata_table("partitions").count() == 4  # 4 buckets


def test_unknown_transform_mor_deletes_stay_applied(warehouse, orders,
                                                    spark):
    """r11 stretch: delete entries on an unknown-spec table must stay
    EXEMPT from partition pruning — a filtered MoR scan that plans all
    data files (no projection through the unknown transform) must also
    keep every delete file in scope, or deleted rows resurrect.

    Reference shape: DeleteFileIndex never prunes delete manifests
    through a transform it cannot project (UnknownTransform.project
    returns null ⇒ scan-everything)."""
    t = warehouse.create_table(
        "db.unk_mor", Schema.from_spark(orders.schema),
        partition_by=[("o_orderkey", "bucket[4]")],
        properties={"write.delete.mode": "merge-on-read"})
    t.append(orders)
    ks = [int(k) for k in
          orders.approxQuantile("o_orderkey", [0.4, 0.6], 0.0)]
    k_del, k_keep = ks
    res = t.delete_where(f"o_orderkey = {k_del}", mode="merge-on-read")
    assert res.get("delete_files_written", 0) >= 1
    expected_total = orders.count() - \
        orders.filter(f"o_orderkey = {k_del}").count()

    _stamp_unknown(t, "bucket[4]", "future_op[16]")
    t2 = warehouse.load_table("db.unk_mor")
    assert type(t2.metadata.spec().fields[0].transform).__name__ == \
        "UnknownTransform"
    # full scan applies the delete debt
    assert t2.to_df().count() == expected_total
    # the deleted key reads empty THROUGH a filtered scan (the delete
    # file must be in scope even though data pruning is off)
    assert TableScan(t2, spark,
                     row_filter=f"o_orderkey = {k_del}").to_df().count() == 0
    # an undeleted mid-range key is intact
    assert TableScan(t2, spark,
                     row_filter=f"o_orderkey = {k_keep}").to_df().count() \
        == orders.filter(f"o_orderkey = {k_keep}").count()
    # arrow path (local scan, no engine) agrees
    assert t2.to_arrow().num_rows == expected_total


def test_unknown_transform_partitions_meta_after_evolution(warehouse,
                                                           orders, spark):
    """r11 stretch: `partitions` grouping on an unknown-transform field
    across spec evolution (TestMetadataTablesWithPartitionEvolution
    shape): rows for BOTH the unknown-spec buckets and the evolved
    known-spec buckets appear, and record counts reconcile."""
    t = warehouse.create_table(
        "db.unk_pm", Schema.from_spark(orders.schema),
        partition_by=[("o_orderkey", "bucket[4]")])
    t.append(orders)
    _stamp_unknown(t, "bucket[4]", "future_op[16]")
    t2 = warehouse.load_table("db.unk_pm")
    EV.update_partition_spec(t2, [("o_custkey", "bucket[2]")])
    t3 = warehouse.load_table("db.unk_pm")
    extra = orders.limit(40)
    t3.append(extra)

    pm = t3.metadata_table("partitions").collect()
    # 4 unknown-spec buckets + up to 2 evolved buckets, no crash
    assert len(pm) >= 5
    assert sum(r["record_count"] for r in pm) == orders.count() + 40
    assert sum(r["file_count"] for r in pm) >= 5
    # files metadata serves both specs' partition tuples verbatim
    files = t3.metadata_table("files")
    assert files.count() == sum(r["file_count"] for r in pm)
