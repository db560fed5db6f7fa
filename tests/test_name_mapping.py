"""Name mapping for field-ID-less imported files (S16 × C11).

Reference contract: core/.../mapping/NameMapping.java + MappingUtil.java
(+ NameMappingParser.java JSON format), table property
``schema.name-mapping.default`` (TableProperties.java:139), applied at
parquet/.../ApplyNameMapping.java.  The canonical use case: import plain
parquet written by an external system, evolve the schema, and scans must
keep resolving the foreign columns by the stored mapping — not by the
table's current names.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark import mapping as NM
from incubator_iceberg_spark import procedures
from incubator_iceberg_spark.schema import Schema


# -- parser / round-trip ---------------------------------------------------

REFERENCE_JSON = (
    '[{"field-id": 1, "names": ["id", "record_id"]},'
    ' {"field-id": 2, "names": ["data"]},'
    ' {"field-id": 3, "names": ["location"], "fields": ['
    '{"field-id": 4, "names": ["latitude", "lat"]},'
    '{"field-id": 5, "names": ["longitude", "long"]}]}]')


def test_mapping_parses_reference_format_and_round_trips():
    nm = NM.NameMapping.from_json(REFERENCE_JSON)
    assert nm.find_by_id(1).names == ("id", "record_id")
    assert nm.find_by_name("record_id").field_id == 1
    assert nm.find_by_name("location.lat").field_id == 4
    assert nm.find_by_name("nope") is None
    again = NM.NameMapping.from_json(nm.to_json())
    assert json.loads(again.to_json()) == json.loads(nm.to_json())


def test_mapping_rejects_ambiguous_names():
    with pytest.raises(ValueError, match="ambiguous"):
        NM.NameMapping([NM.MappedField(1, ("a", "x")),
                        NM.MappedField(2, ("x",))])


def test_create_and_update_mapping():
    from incubator_iceberg_spark.schema import LongType, NestedField, StringType
    sch = Schema([NestedField(1, "k", LongType(), required=False),
                  NestedField(2, "v", StringType(), required=False)],
                 schema_id=0)
    nm = NM.create_mapping(sch)
    assert nm.find_by_id(sch.find_field("k").field_id).names \
        == ("k",)
    # rename adds an alias; add extends
    kid = sch.find_field("k").field_id
    nm2 = NM.update_mapping(nm, {kid: "key"},
                            [NestedField(99, "extra", LongType(),
                                         required=False)])
    assert nm2.find_by_id(kid).names == ("k", "key")
    assert nm2.find_by_name("key").field_id == kid
    assert nm2.find_by_id(99).names == ("extra",)


# -- import → evolve → scan ------------------------------------------------

def _write_foreign(spark, tmp_path, rows, schema_str, name):
    path = str(tmp_path / name)
    spark.createDataFrame(rows, schema_str).coalesce(1).write.parquet(path)
    return [os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".parquet")]


def test_import_rename_scan_resolves_by_mapping(warehouse, spark, tmp_path):
    """The reference's exact use case: import foreign parquet, rename a
    column; the scan must read the file's OLD physical name via the
    mapping while presenting the new name."""
    t = warehouse.create_table("db.nmap", "c long, v string")
    NM.set_default_mapping(t)
    files = _write_foreign(spark, tmp_path, [(1, "a"), (2, "b")],
                           "c long, v string", "f1")
    procedures.add_files(t, files)
    t.update_schema().rename_column("c", "d").commit()
    got = {r["d"]: r["v"] for r in t.to_df().collect()}
    assert got == {1: "a", 2: "b"}
    # filter on the renamed column still plans + evaluates
    assert t.to_df().filter("d = 2").count() == 1
    # the mapping gained the new name as an alias (SchemaUpdate.java:404)
    nm = NM.table_mapping(t.metadata)
    fid = t.metadata.schema().find_field("d").field_id
    assert set(nm.find_by_id(fid).names) == {"c", "d"}


def test_import_with_alias_names(warehouse, spark, tmp_path):
    """Foreign files whose physical names are ALIASES of the schema
    names (the mapping's raison d'être — no table schema ever carried
    these names)."""
    t = warehouse.create_table("db.nmap2", "id long, data string")
    NM.set_default_mapping(t, aliases={"id": "record_id"})
    files = _write_foreign(spark, tmp_path, [(10, "x"), (20, "y")],
                           "record_id long, data string", "f2")
    procedures.add_files(t, files)
    got = {r["id"]: r["data"] for r in t.to_df().collect()}
    assert got == {10: "x", 20: "y"}
    # stats were re-keyed to canonical names: pruning + agg pushdown work
    r = t.count_non_null("id")
    assert r["count"] == 2 and r["scanned_files"] == 0
    assert t.to_df().filter("id = 10").count() == 1


def test_import_missing_column_reads_null_and_stats_agree(
        warehouse, spark, tmp_path):
    """A schema column with no alias present in a foreign file reads as
    NULL — and the import-time stats must say all-NULL (else IS NULL
    predicates would wrongly prune and COUNT(col) overcount)."""
    t = warehouse.create_table("db.nmap3", "id long, v string, extra long")
    NM.set_default_mapping(t)
    files = _write_foreign(spark, tmp_path, [(1, "a")], "id long, v string",
                           "f3")
    procedures.add_files(t, files)
    rows = t.to_df().collect()
    assert rows[0]["extra"] is None
    r = t.count_non_null("extra")
    assert r["count"] == 0
    assert t.to_df().filter("extra IS NULL").count() == 1


def test_mapped_import_mixes_with_engine_written_files(
        warehouse, spark, tmp_path):
    """Foreign (mapping-resolved) and engine-written (schema-id-resolved)
    files coexist in one table and one scan."""
    t = warehouse.create_table("db.nmap4", "k long, v string")
    t.append(spark.createDataFrame([(100, "native")], "k long, v string"))
    NM.set_default_mapping(t, aliases={"k": "kk"})
    files = _write_foreign(spark, tmp_path, [(200, "foreign")],
                           "kk long, v string", "f4")
    procedures.add_files(t, files)
    t.update_schema().rename_column("k", "key").commit()
    got = {r["key"]: r["v"] for r in t.to_df().collect()}
    assert got == {100: "native", 200: "foreign"}
    assert t.to_df().filter("key = 200").first()["v"] == "foreign"


def test_mapped_import_partitioned_and_delete(warehouse, spark, tmp_path):
    """Mapping-resolved files participate in partition pruning and
    row-level DELETE like any other file."""
    t = warehouse.create_table("db.nmap5", "k long, v string",
                               partition_by=["truncate(10, k)"])
    NM.set_default_mapping(t)
    f1 = _write_foreign(spark, tmp_path, [(1, "a"), (2, "b")],
                        "k long, v string", "p0")
    f2 = _write_foreign(spark, tmp_path, [(11, "c"), (12, "d")],
                        "k long, v string", "p1")
    procedures.add_files(t, f1 + f2)
    sc = t.new_scan().filter("k >= 11")
    assert len(sc.plan_files()) == 1  # partition pruning on foreign files
    t.delete_where("k = 2", mode="merge-on-read")
    assert sorted(r["k"] for r in t.to_df().collect()) == [1, 11, 12]


def test_mixed_alias_files_coalesce_per_row(warehouse, spark, tmp_path):
    """Regression pin (found by the fuzz gate): files imported BEFORE and
    AFTER a rename carry different aliases of the same field; the
    mergeSchema union holds both physical columns and each row must
    resolve through ITS file's alias — a single first-present-alias pick
    silently nulled every file written under the other alias."""
    t = warehouse.create_table("db.nmap6", "k long, v long")
    NM.set_default_mapping(t)
    f1 = _write_foreign(spark, tmp_path, [(1, 10)], "k long, v long", "m0")
    procedures.add_files(t, f1)
    t.update_schema().rename_column("v", "val").commit()
    # foreign producer adopted the new name
    f2 = _write_foreign(spark, tmp_path, [(2, 20)], "k long, val long", "m1")
    procedures.add_files(t, f2)
    got = {r["k"]: r["val"] for r in t.to_df().collect()}
    assert got == {1: 10, 2: 20}
    assert t.to_df().filter("val = 20").count() == 1
