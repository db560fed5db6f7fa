"""Wide-schema metrics cap (write.metadata.metrics.max-inferred-column-
defaults, TableProperties parity): the default metrics mode is inferred
for at most N stats columns (schema order); later columns collect no
counts/bounds unless explicitly configured.  Bounds-struct MEMBERSHIP
shrinks too — a capped wide table's manifests store (and plan-time
decode) only the collecting prefix, keeping the stats plane O(cap ×
files) instead of O(columns × files).  Mirrors MetricsModes.java +
TestMetricsModes shapes from the reference lineage."""

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark import manifests as MF
from incubator_iceberg_spark.schema import Schema

CAP_PROP = "write.metadata.metrics.max-inferred-column-defaults"


def _wide_df(spark, ncols, nrows=40):
    cols = ["id"] + [f"(id + {i}) AS c{i:03d}" for i in range(1, ncols)]
    return spark.range(nrows).selectExpr(*cols)


def _current_manifest_tables(t):
    mlist = MF.read_manifest_list_arrow(
        t.metadata.current_snapshot().manifest_list)
    return [MF.read_manifest_arrow(p)
            for p in mlist.column("manifest_path").to_pylist()]


def _bounds_fields(mtab):
    if "lower_bounds" not in mtab.column_names:
        return []
    typ = mtab.schema.field("lower_bounds").type
    return [typ.field(i).name for i in range(typ.num_fields)]


def test_default_cap_limits_membership(spark, warehouse):
    df = _wide_df(spark, 120)
    t = warehouse.create_table("db.wide", Schema.from_spark(df.schema))
    t.append(df)
    stats_names = [f.name for f in MF._stats_columns(t.metadata.schema())]
    want = set(stats_names[:MF.MAX_INFERRED_COLUMN_DEFAULTS])
    for mtab in _current_manifest_tables(t):
        got = set(_bounds_fields(mtab))
        assert got == want
        for e in mtab.to_pylist():
            # arrow map columns read back as [(k, v), ...] lists
            assert {k for k, _ in (e.get("value_counts") or [])} <= want
            assert {k for k, _ in (e.get("null_counts") or [])} <= want


def test_cap_override_and_explicit_column_escape(spark, warehouse):
    df = _wide_df(spark, 20)
    t = warehouse.create_table(
        "db.wide8", Schema.from_spark(df.schema),
        properties={CAP_PROP: "8",
                    "write.metadata.metrics.column.c015": "full"})
    t.append(df)
    stats_names = [f.name for f in MF._stats_columns(t.metadata.schema())]
    want = set(stats_names[:8]) | {"c015"}
    for mtab in _current_manifest_tables(t):
        assert set(_bounds_fields(mtab)) == want
        for e in mtab.to_pylist():
            lb = e.get("lower_bounds") or {}
            assert lb.get("c015") is not None  # explicit column collects
            assert lb.get("id") is not None


def test_capped_column_scans_correctly_without_pruning(spark, warehouse):
    # 4 disjoint-range files; cap=1 so only `id` collects bounds
    df = _wide_df(spark, 6, nrows=400).repartitionByRange(4, "id")
    t = warehouse.create_table(
        "db.widecap", Schema.from_spark(df.schema),
        properties={CAP_PROP: "1"})
    t.append(df)
    total = len(t.new_scan().plan_files())
    assert total >= 3
    # capped column: no stats → inclusive evaluator keeps every file,
    # but row results stay exact
    cond = "c003 >= 300"  # c003 = id + 3
    assert len(t.new_scan().filter(cond).plan_files()) == total
    assert t.to_df(filter=cond).count() == df.filter(cond).count()
    # collecting column still prunes
    assert len(t.new_scan().filter("id < 50").plan_files()) < total


def test_mixed_cap_manifests_align_on_scan(spark, warehouse):
    df = _wide_df(spark, 12, nrows=60)
    t = warehouse.create_table(
        "db.widemix", Schema.from_spark(df.schema),
        properties={CAP_PROP: "3"})
    t.append(df)
    # lift the cap (back to the 100 default) and append again: the two
    # manifests now carry DIFFERENT bounds-struct field sets and must
    # align through every concat/read path
    t = t.update_properties({CAP_PROP: "100"})
    t.append(df)
    assert t.to_df().count() == 120
    cond = "c007 > 30"
    assert t.to_df(filter=cond).count() == df.filter(cond).count() * 2
    files_meta = t.metadata_table("files")
    assert files_meta.count() == len(t.new_scan().plan_files())


def test_modes_function_semantics():
    fields = Schema.from_spark(
        _schema_for(5)).struct.fields  # a1..a5 via helper below
    props = {CAP_PROP: "2",
             "write.metadata.metrics.column.a4": "counts"}
    modes = MF.metrics_modes(props, list(fields))
    names = [f.name for f in fields]
    assert modes[names[0]][0] == "truncate"
    assert modes[names[1]][0] == "truncate"
    assert modes[names[2]] == ("none", None)  # past cap, inferred
    assert modes[names[3]] == ("counts", None)  # explicit beats cap
    assert modes[names[4]] == ("none", None)
    # default (no cap prop) infers for exactly the first 100
    import dataclasses
    wide = [dataclasses.replace(fields[0], name=f"w{i:03d}")
            for i in range(150)]
    dmodes = MF.metrics_modes({}, wide)
    assert dmodes["w099"][0] == "truncate"
    assert dmodes["w100"] == ("none", None)


def _schema_for(n):
    from pyspark.sql.types import StructType, StructField, LongType
    return StructType(
        [StructField(f"a{i + 1}", LongType()) for i in range(n)])


def test_ddl_added_column_lands_past_cap(spark, warehouse):
    # columns appended by schema evolution take positions at the END of
    # the schema walk — on a capped table they collect no stats unless
    # explicitly configured, and enabling them per-column works without
    # touching older manifests
    df = _wide_df(spark, 6, nrows=50)
    t = warehouse.create_table(
        "db.widevolve", Schema.from_spark(df.schema),
        properties={CAP_PROP: "6"})  # exactly the initial width
    t.append(df)
    t = t.update_schema().add_column("extra", "long").commit()
    df2 = df.withColumn("extra", F.col("id") * 3)
    t.append(df2)
    # newest manifest: extra is past the cap → absent from bounds
    newest = _current_manifest_tables(t)
    assert all("extra" not in _bounds_fields(m) for m in newest)
    # explicit per-column property turns it on for SUBSEQUENT writes
    t = t.update_properties(
        {"write.metadata.metrics.column.extra": "full"})
    t.append(df2)
    fields_by_manifest = [set(_bounds_fields(m))
                          for m in _current_manifest_tables(t)]
    assert any("extra" in fs for fs in fields_by_manifest)
    # mixed membership across manifests still scans exactly
    assert t.to_df(filter="extra > 60").count() == \
        df2.filter("extra > 60").count() * 2
    assert t.to_df().count() == 150
