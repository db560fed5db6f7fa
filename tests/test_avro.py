"""S7 Avro: the engine's pure-Python Object Container File codec
(avro_format.py) — codec round trips, engine-table integration, and
BOTH-direction binary interop with the Apache Avro Java reference
implementation on Spark's classpath."""

import glob
import io
import os
from datetime import date, datetime
from decimal import Decimal

import pytest

from incubator_iceberg_spark import avro_format as AV
from incubator_iceberg_spark import schema as S
from incubator_iceberg_spark.schema import Schema


def _all_types_schema():
    return Schema([
        S.NestedField(1, "i", S.IntegerType()),
        S.NestedField(2, "l", S.LongType()),
        S.NestedField(3, "f", S.FloatType()),
        S.NestedField(4, "d", S.DoubleType()),
        S.NestedField(5, "s", S.StringType()),
        S.NestedField(6, "b", S.BinaryType()),
        S.NestedField(7, "dt", S.DateType()),
        S.NestedField(8, "ts", S.TimestampType(with_zone=False)),
        S.NestedField(9, "bo", S.BooleanType()),
        S.NestedField(10, "dec", S.DecimalType(10, 2)),
        S.NestedField(11, "arr", S.ListType.of(20, S.LongType())),
        S.NestedField(12, "m", S.MapType.of(21, S.StringType(),
                                            22, S.DoubleType())),
    ])


def _all_types_columns():
    return [
        [1, None, -5],
        [10**12, 2, None],
        [1.5, None, -0.25],
        [3.14159, 2.5, None],
        ["héllo", "", None],
        [b"\x00\xffbin", None, b""],
        [date(2020, 1, 31), None, date(1969, 12, 31)],
        [datetime(2021, 6, 1, 12, 30, 45, 123456), None, datetime(1960, 1, 1)],
        [True, False, None],
        [Decimal("123.45"), Decimal("-0.01"), None],
        [[1, 2, None, 4], [], None],
        [{"a": 1.5, "b": None}, {}, None],
    ]


@pytest.mark.parametrize("codec", ["deflate", "null"])
def test_container_roundtrip_all_types(codec):
    sch, cols = _all_types_schema(), _all_types_columns()
    buf = io.BytesIO()
    n = AV.write_container(buf, cols, sch, codec=codec)
    assert n == 3
    out, total = AV.read_container(buf.getvalue(), sch)
    assert total == 3 and out == cols
    # count-only path reads block headers without decompressing
    assert AV.read_container(buf.getvalue(), Schema([]),
                             count_only=True)[1] == 3


def test_container_multiblock_roundtrip():
    sch = Schema([S.NestedField(1, "x", S.LongType()),
                  S.NestedField(2, "y", S.StringType())])
    cols = [list(range(10000)), [f"s{i}" for i in range(10000)]]
    buf = io.BytesIO()
    AV.write_container(buf, cols, sch, block_rows=777)
    out, total = AV.read_container(buf.getvalue(), sch)
    assert total == 10000 and out == cols


def test_avro_table_end_to_end(warehouse, orders, spark):
    """Engine table in avro format: append, filtered read, metrics-bounds
    pruning, equality deletes (real _pos/_file lineage), local no-engine
    read."""
    t = warehouse.create_table("db.o_avro", Schema.from_spark(orders.schema),
                               properties={"write.format.default": "avro"})
    t.append(orders)
    n = orders.count()
    assert t.to_df().count() == n
    want = orders.filter("o_totalprice > 200000").count()
    assert t.to_df(filter="o_totalprice > 200000").count() == want
    # write-time stats give full metrics pruning (no footer needed)
    assert len(t.new_scan().filter("o_orderkey < 0").plan_files()) == 0
    # v2 equality deletes apply on the avro read path
    t.add_equality_deletes(
        orders.filter("o_orderkey % 100 = 0").select("o_orderkey"),
        ["o_orderkey"])
    survivors = orders.filter("o_orderkey % 100 != 0").count()
    assert t.to_df().count() == survivors
    assert t.to_arrow().num_rows == survivors  # S14 local read too


def test_avro_table_position_deletes(warehouse, orders, spark):
    """Avro decode emits real per-row _pos, so position deletes work on
    avro data files (they cannot on ORC)."""
    t = warehouse.create_table("db.o_avro_pd", Schema.from_spark(orders.schema),
                               properties={"write.format.default": "avro"})
    t.append(orders)
    path = t.new_scan().plan_files()[0][0]
    pos = spark.createDataFrame([(path, 0), (path, 1)],
                                "file_path string, pos long")
    t.add_position_deletes(pos)
    assert t.to_df().count() == orders.count() - 2


def test_avro_partitioned_write_prunes(warehouse, orders, spark):
    t = warehouse.create_table(
        "db.o_avro_p", Schema.from_spark(orders.schema),
        partition_by=["month(o_orderdate)"],
        properties={"write.format.default": "avro"})
    t.append(orders)
    assert t.to_df().count() == orders.count()
    total = len(t.new_scan().plan_files())
    pruned = len(t.new_scan().filter(
        "o_orderdate >= TIMESTAMP '1997-03-01' "
        "AND o_orderdate < TIMESTAMP '1997-04-01'").plan_files())
    assert 0 < pruned < total


def test_avro_schema_evolution_field_id_projection(warehouse, orders, spark):
    """Field-ID projection works across avro files written under an old
    schema: rename resolves, added column reads NULL."""
    from pyspark.sql import functions as F
    t = warehouse.create_table("db.o_avro_ev", Schema.from_spark(orders.schema),
                               properties={"write.format.default": "avro"})
    t.append(orders.limit(50))
    t.update_schema().rename_column("o_totalprice", "price") \
        .add_column("note", "string").commit()
    df = t.to_df()
    assert "price" in df.columns and "note" in df.columns
    rows = df.orderBy("o_orderkey").limit(5).collect()
    assert all(r["note"] is None for r in rows)
    assert rows[0]["price"] is not None


def test_avro_java_reads_python_files(warehouse, orders, spark):
    """Interop A: files written by the python codec decode byte-perfectly
    under the Apache Avro JAVA reference implementation (avro-1.x jar on
    Spark's classpath)."""
    t = warehouse.create_table("db.o_avro_j", Schema.from_spark(orders.schema),
                               properties={"write.format.default": "avro"})
    t.append(orders.limit(100))
    path = t.new_scan().plan_files()[0][0]
    jvm = spark._jvm
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path),
        jvm.org.apache.avro.generic.GenericDatumReader())
    assert dfr.getMetaString("avro.codec") == "deflate"
    n = 0
    keys = set()
    while dfr.hasNext():
        rec = dfr.next()
        keys.add(rec.get("o_orderkey"))
        n += 1
    dfr.close()
    assert n == 100
    want = {r["o_orderkey"] for r in orders.limit(100).collect()}
    assert keys == want


def test_avro_python_reads_java_files(tmp_path, spark):
    """Interop B: a container written by the JAVA reference implementation
    decodes under the python codec."""
    jvm = spark._jvm
    # x declared "int" java-side: py4j passes python ints as Integer (it
    # re-unboxes even an explicit Long.valueOf), and avro int/long share
    # the same zigzag wire format, so the python side reads it as long
    avsc = ('{"type":"record","name":"r","fields":['
            '{"name":"x","type":["null","int"],"default":null},'
            '{"name":"s","type":["null","string"],"default":null}]}')
    jschema = jvm.org.apache.avro.Schema.Parser().parse(avsc)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(jschema))
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    path = str(tmp_path / "java.avro")
    writer.create(jschema, jvm.java.io.File(path))
    for i in range(500):
        rec = jvm.org.apache.avro.generic.GenericData.Record(jschema)
        rec.put("x", i * 7)
        rec.put("s", None if i % 10 == 0 else f"v{i}")
        writer.append(rec)
    writer.close()

    sch = Schema([S.NestedField(1, "x", S.LongType()),
                  S.NestedField(2, "s", S.StringType())])
    with open(path, "rb") as f:
        cols, n = AV.read_container(f.read(), sch)
    assert n == 500
    assert cols[0] == [i * 7 for i in range(500)]
    assert cols[1][0] is None and cols[1][1] == "v1"
    assert AV.avro_row_count(path) == 500


def test_avro_add_files_import(warehouse, orders, spark, tmp_path):
    """add_files (S16) imports pre-existing avro files: row counts come
    from block headers without decompression."""
    sch = Schema.from_spark(orders.schema)
    ext = str(tmp_path / "ext.avro")
    rows = orders.limit(40).collect()
    cols = [[r[f.name] for r in rows] for f in sch.fields]
    with open(ext, "wb") as f:
        AV.write_container(f, cols, sch)

    t = warehouse.create_table("db.o_avro_imp", sch)
    from incubator_iceberg_spark import procedures as PR
    PR.add_files(t, [ext], file_format="avro")
    assert t.to_df().count() == 40


# -- property-based round trips (hypothesis) --------------------------------

from hypothesis import given, settings, strategies as st


def _rt(sch, cols, codec="deflate"):
    buf = io.BytesIO()
    AV.write_container(buf, cols, sch, codec=codec)
    out, n = AV.read_container(buf.getvalue(), sch)
    return out, n


@settings(max_examples=50, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.integers(min_value=-(2**63), max_value=2**63 - 1)),
                max_size=40))
def test_prop_long_roundtrip_full_int64_range(vals):
    sch = Schema([S.NestedField(1, "x", S.LongType())])
    out, n = _rt(sch, [vals])
    assert n == len(vals) and out[0] == vals


@settings(max_examples=50, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=80)), max_size=30))
def test_prop_unicode_string_roundtrip(vals):
    sch = Schema([S.NestedField(1, "s", S.StringType())])
    out, n = _rt(sch, [vals])
    assert n == len(vals) and out[0] == vals


@settings(max_examples=50, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.floats(allow_nan=True, allow_infinity=True,
                                    width=64)),
                max_size=30))
def test_prop_double_roundtrip_nan_inf(vals):
    import math
    sch = Schema([S.NestedField(1, "d", S.DoubleType())])
    out, n = _rt(sch, [vals])
    assert n == len(vals)
    for a, b in zip(vals, out[0]):
        if a is None:
            assert b is None
        elif math.isnan(a):
            assert math.isnan(b)
        else:
            assert a == b  # bit-exact incl. -0.0 sign? equality suffices


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.binary(max_size=60)), max_size=20),
       st.sampled_from(["deflate", "null"]))
def test_prop_bytes_roundtrip_both_codecs(vals, codec):
    sch = Schema([S.NestedField(1, "b", S.BinaryType())])
    out, n = _rt(sch, [vals], codec=codec)
    assert n == len(vals) and out[0] == vals


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.lists(st.one_of(st.none(),
                                             st.integers(-10**12, 10**12)),
                                   max_size=8)),
                max_size=15))
def test_prop_nested_list_roundtrip(vals):
    sch = Schema([S.NestedField(1, "a", S.ListType.of(10, S.LongType()))])
    out, n = _rt(sch, [vals])
    assert n == len(vals) and out[0] == vals


def test_format_migration_parquet_to_avro_via_rewrite(warehouse, orders, spark):
    """Format migration: flip write.format.default then compact — the
    rewrite emits avro files, mixed-format reads stay correct along the
    way."""
    t = warehouse.create_table("db.fmt_mig", Schema.from_spark(orders.schema))
    for i in range(4):
        t.append(orders.filter(f"o_orderkey % 4 = {i}"))
    t.update_properties({"write.format.default": "avro"})
    # mixed state: append one more batch as avro alongside parquet files
    t.append(orders.limit(0))  # no-op append keeps state simple
    t.rewrite_data_files(min_input_files=2)
    ents = t.new_scan().plan_entries_local()
    fmts = {e.get("file_format") or "parquet" for e in ents
            if (e.get("content") or 0) == 0}
    assert "avro" in fmts
    assert t.to_df().count() == orders.count()
    assert (t.to_df(filter="o_totalprice > 200000").count()
            == orders.filter("o_totalprice > 200000").count())


def test_cow_delete_on_avro_table_stays_avro(warehouse, orders, spark):
    """Row ops honor the table format: a copy-on-write DELETE on an avro
    table rewrites survivors as avro, not parquet."""
    t = warehouse.create_table("db.avro_cow", Schema.from_spark(orders.schema),
                               properties={"write.format.default": "avro"})
    t.append(orders)
    t.delete_where("o_orderkey % 5 = 0")
    ents = [e for e in t.new_scan().plan_entries_local()
            if (e.get("content") or 0) == 0]
    assert ents and all((e.get("file_format") or "parquet") == "avro"
                        for e in ents)
    assert t.to_df().count() == orders.filter("o_orderkey % 5 != 0").count()


def test_truncated_avro_file_raises_with_path(warehouse, orders, spark):
    """A corrupted/truncated avro file fails the read with the offending
    path in the message, not a bare decode error."""
    t = warehouse.create_table("db.avro_trunc", Schema.from_spark(orders.schema),
                               properties={"write.format.default": "avro"})
    t.append(orders.limit(200))
    path = t.new_scan().plan_files()[0][0]
    data = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(data[:len(data) // 2])  # truncate mid-block
    with pytest.raises(Exception) as ei:
        t.to_df().count()
    assert "corrupt avro container" in str(ei.value)


def test_migrate_avro_directory_in_place(warehouse, orders, spark, tmp_path):
    """migrate() over a directory of avro files: schema comes from the
    container header (round-tripping the engine's field-id props), files
    import without rewrite."""
    from incubator_iceberg_spark import procedures as PR
    src_dir = tmp_path / "avro_src"
    src_dir.mkdir()
    sch = Schema.from_spark(orders.schema)
    rows = orders.limit(120).collect()
    for part in range(2):
        cols = [[r[f.name] for r in rows[part * 60:(part + 1) * 60]]
                for f in sch.fields]
        with open(src_dir / f"part-{part}.avro", "wb") as f:
            AV.write_container(f, cols, sch)

    t = PR.migrate(warehouse, "db.migrated_avro", str(src_dir),
                   file_format="avro")
    assert t.to_df().count() == 120
    # field ids round-tripped from the header props
    assert [f.field_id for f in t.schema().fields] == \
        [f.field_id for f in sch.fields]
    # imported in place: data files point into the source dir
    assert all(p.startswith(str(src_dir))
               for p, _ in t.new_scan().plan_files())


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.sampled_from([S.BooleanType(), S.IntegerType(), S.LongType(),
                     S.FloatType(), S.DoubleType(), S.StringType(),
                     S.BinaryType(), S.DateType(),
                     S.TimestampType(with_zone=False),
                     S.TimestampType(with_zone=True),
                     S.DecimalType(10, 2), S.FixedType(8)]),
    min_size=1, max_size=10))
def test_prop_schema_roundtrip_through_avro(types):
    """Engine schema → avro json → engine schema preserves field ids,
    names, and types (the migrate/import path's contract)."""
    sch = Schema([S.NestedField(i + 1, f"c{i}", t)
                  for i, t in enumerate(types)])
    back = AV.from_avro_schema(AV.to_avro_schema(sch))
    assert [(f.field_id, f.name, type(f.type)) for f in back.fields] == \
        [(f.field_id, f.name, type(f.type)) for f in sch.fields]
    for a, b in zip(back.fields, sch.fields):
        if isinstance(b.type, S.TimestampType):
            assert a.type.with_zone == b.type.with_zone
        if isinstance(b.type, S.DecimalType):
            assert (a.type.precision, a.type.scale) == \
                (b.type.precision, b.type.scale)


# ---------------------------------------------------------------------------
# round-4: per-file writer-schema resolution (Avro spec / AvroIterable
# semantics — decode against the file's embedded schema, never blindly)
# ---------------------------------------------------------------------------

def _write_file(tmp_path, name, cols, sch):
    p = str(tmp_path / name)
    with open(p, "wb") as f:
        AV.write_container(f, cols, sch)
    return p


def test_read_resolves_swapped_field_order_by_name(tmp_path, spark):
    """A file whose writer schema has the SAME two long columns in the
    other order must decode with values in the right columns — blind
    positional decode crossed them silently."""
    expected = Schema([S.NestedField(1, "a", S.LongType()),
                       S.NestedField(2, "b", S.LongType())])
    swapped = Schema([S.NestedField(2, "b", S.LongType()),
                      S.NestedField(1, "a", S.LongType())])
    p = _write_file(tmp_path, "sw.avro", [[100, 200], [1, 2]], swapped)
    rows = {r["a"]: r["b"] for r in
            AV.read_avro_files(spark, [p], expected).collect()}
    assert rows == {1: 100, 2: 200}


def test_read_promotes_int_to_long_and_float_to_double(tmp_path, spark):
    expected = Schema([S.NestedField(1, "x", S.LongType()),
                       S.NestedField(2, "y", S.DoubleType())])
    writer = Schema([S.NestedField(1, "x", S.IntegerType()),
                     S.NestedField(2, "y", S.FloatType())])
    p = _write_file(tmp_path, "promo.avro", [[7, None], [1.5, -0.5]], writer)
    rows = sorted(AV.read_avro_files(spark, [p], expected).collect(),
                  key=lambda r: (r["x"] is None, r["x"]))
    assert [r["x"] for r in rows] == [7, None]
    assert [r["y"] for r in rows] == [1.5, -0.5]


def test_read_rejects_missing_field_loudly(tmp_path, spark):
    expected = Schema([S.NestedField(1, "a", S.LongType()),
                       S.NestedField(2, "zz", S.LongType())])
    writer = Schema([S.NestedField(1, "a", S.LongType())])
    p = _write_file(tmp_path, "miss.avro", [[1]], writer)
    with pytest.raises(Exception) as ei:
        AV.read_avro_files(spark, [p], expected).collect()
    assert "zz" in str(ei.value) and "missing from writer" in str(ei.value)


def test_read_rejects_incompatible_type_loudly(tmp_path, spark):
    expected = Schema([S.NestedField(1, "a", S.LongType())])
    writer = Schema([S.NestedField(1, "a", S.StringType())])
    p = _write_file(tmp_path, "bad.avro", [["oops"]], writer)
    with pytest.raises(Exception) as ei:
        AV.read_avro_files(spark, [p], expected).collect()
    assert "not resolvable" in str(ei.value)


def test_read_skips_extra_writer_fields(tmp_path, spark):
    """Foreign files may carry extra columns; resolution selects only the
    expected ones (spec: unmatched writer fields are skipped)."""
    expected = Schema([S.NestedField(1, "a", S.LongType())])
    writer = Schema([S.NestedField(5, "junk", S.StringType()),
                     S.NestedField(1, "a", S.LongType())])
    p = _write_file(tmp_path, "extra.avro", [["x", "y"], [1, 2]], writer)
    assert sorted(r["a"] for r in
                  AV.read_avro_files(spark, [p], expected).collect()) == [1, 2]


def test_field_id_zero_is_preserved():
    """A legitimate ``field-id: 0`` must not be reassigned (the old
    ``or next_id()`` treated 0 as absent)."""
    avsc = {"type": "record", "name": "r", "fields": [
        {"name": "z", "type": "long", "field-id": 0},
        {"name": "a", "type": "long", "field-id": 7}]}
    sch = AV.from_avro_schema(avsc)
    assert [f.field_id for f in sch.fields] == [0, 7]


def test_timestamp_micros_exact_far_from_epoch():
    """Exact integer micros: the float path lost 1 µs past ~year 2255."""
    sch = Schema([S.NestedField(1, "ts", S.TimestampType(with_zone=False))])
    vals = [datetime(2400, 1, 1, 0, 0, 0, 1),
            datetime(2400, 1, 1, 0, 0, 0, 999999),
            datetime(1, 1, 1, 0, 0, 0, 1),
            datetime(9999, 12, 31, 23, 59, 59, 999999)]
    buf = io.BytesIO()
    AV.write_container(buf, [vals], sch)
    out, n = AV.read_container(buf.getvalue(), sch)
    assert n == len(vals) and out[0] == vals


def test_metrics_modes_apply_to_avro_tables(warehouse, orders, spark):
    """The metrics-mode property contract holds for avro files too —
    modes apply at the manifest layer, format-independent."""
    t = warehouse.create_table(
        "db.avro_mmodes", Schema.from_spark(orders.schema),
        properties={
            "write.format.default": "avro",
            "write.metadata.metrics.column.o_orderstatus": "none",
            "write.metadata.metrics.column.o_custkey": "counts",
            "write.metadata.metrics.default": "truncate(4)",
        })
    t.append(orders.limit(500))
    entry = t.new_scan().plan_entries_local()[0]
    lo = entry["lower_bounds"]
    assert lo.get("o_orderstatus") is None  # none: no bounds
    assert (entry.get("value_counts") or {}).get("o_orderstatus") is None
    assert lo.get("o_custkey") is None  # counts: counts but no bounds
    assert (entry.get("value_counts") or {}).get("o_custkey") is not None
    # default truncate(4) shortens the 8-char priority strings
    assert lo.get("o_orderpriority") is not None
    assert len(lo["o_orderpriority"]) <= 4


def test_large_avro_rewrite_warns(warehouse, orders, spark, caplog, monkeypatch):
    """Compacting a big avro table logs the Python-decode warning; the
    file_format override migrates the rewrite to parquet instead."""
    import logging
    from incubator_iceberg_spark import maintenance as MT

    t = warehouse.create_table(
        "db.avro_warn", Schema.from_spark(orders.schema),
        properties={"write.format.default": "avro"})
    for _ in range(5):
        t.append(orders.limit(200))
    monkeypatch.setattr(MT, "AVRO_REWRITE_WARN_BYTES", 1)  # force-trip
    with caplog.at_level(logging.WARNING,
                         logger="incubator_iceberg_spark.maintenance"):
        MT.rewrite_data_files(t, spark)
    assert any("avro" in r.message for r in caplog.records)
    # escape hatch: rewritten files become parquet
    for _ in range(5):
        t.append(orders.limit(200))
    res = MT.rewrite_data_files(t, spark, file_format="parquet")
    assert res["added_files"] >= 1
    fmts = {(e.get("file_format") or "").lower()
            for e in t.new_scan().plan_entries_local()}
    assert any("parquet" in f for f in fmts)
    assert t.to_df().count() == 2000
