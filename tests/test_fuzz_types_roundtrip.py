"""Tier-2 parity with the reference's RandomData round-trip tests
(spark/src/test/java/.../data/RandomData.java:51-94 and
RandomGenericData): generate a RANDOM schema over the full type system
(primitives incl. date/timestamp/decimal/binary + nested
struct/list/map to depth 2), generate random rows with ~15% nulls at
every level, append through the engine in a rotating file format
(parquet / avro / orc), and assert the engine scan returns exactly the
written rows.  Then rename a random top-level column and assert the
values still resolve (field-ID projection).  Seeds are pinned —
failures reproduce.
"""

import datetime
import random
from decimal import Decimal

import pytest

from incubator_iceberg_spark.schema import Schema

SEEDS = [(101, "parquet"), (202, "parquet"), (303, "avro"),
         (404, "orc"), (505, "avro"), (606, "orc")]

N_ROWS = 120
NULL_P = 0.15


def _primitives(rng):
    return [
        ("bigint", lambda r: r.randint(-2 ** 40, 2 ** 40)),
        ("int", lambda r: r.randint(-2 ** 31 + 1, 2 ** 31 - 1)),
        ("double", lambda r: r.randint(-10 ** 12, 10 ** 12) / 64.0),
        # fp32-exact values so the float32 round trip compares equal
        ("float", lambda r: float(r.randint(-4096, 4096)) / 4.0),
        ("string", lambda r: "".join(
            r.choice("abcXYZ09 _#é¿あ") for _ in range(r.randint(0, 12)))),
        ("boolean", lambda r: r.random() < 0.5),
        ("date", lambda r: datetime.date(1970, 1, 1)
            + datetime.timedelta(days=r.randint(-20000, 25000))),
        ("timestamp", lambda r: datetime.datetime(2001, 1, 1)
            + datetime.timedelta(seconds=r.randint(-10 ** 9, 10 ** 9),
                                 microseconds=r.randint(0, 999999))),
        ("decimal(12,2)",
         lambda r: Decimal(r.randint(-10 ** 9, 10 ** 9)) / 100),
        ("binary", lambda r: bytes(r.getrandbits(8)
                                   for _ in range(r.randint(0, 10)))),
    ]


def _mk_type(rng, depth):
    """(ddl, generator) for one random type."""
    prims = _primitives(rng)
    n_prim = len(prims)
    k = rng.randrange(n_prim + (3 if depth < 2 else 0))
    if k < n_prim:
        return prims[k]
    kind = ("struct", "list", "map")[k - n_prim]
    if kind == "struct":
        subs = [_mk_type(rng, depth + 1) for _ in range(rng.randint(1, 3))]
        ddl = "struct<" + ", ".join(
            f"s{i}: {d}" for i, (d, _g) in enumerate(subs)) + ">"

        def gen(r, subs=subs):
            return tuple(None if r.random() < NULL_P else g(r)
                         for _d, g in subs)
        return ddl, gen
    if kind == "list":
        d, g = _mk_type(rng, depth + 1)

        def gen(r, g=g):
            return [None if r.random() < NULL_P else g(r)
                    for _ in range(r.randint(0, 4))]
        return f"array<{d}>", gen
    d, g = _mk_type(rng, depth + 1)

    def gen(r, g=g):
        return {f"k{i}": (None if r.random() < NULL_P else g(r))
                for i in range(r.randint(0, 3))}
    return f"map<string, {d}>", gen


def _norm(v):
    """Comparison-normal form: Rows/tuples → tuples, maps → sorted item
    tuples, bytes-likes → bytes, recursively."""
    from pyspark.sql import Row
    if isinstance(v, Row):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


@pytest.mark.parametrize("seed,fmt", SEEDS)
def test_random_schema_roundtrip(warehouse, spark, seed, fmt):
    rng = random.Random(seed)
    cols = [(f"c{i}",) + _mk_type(rng, 0)
            for i in range(rng.randint(3, 6))]
    ddl = ", ".join(f"{n} {d}" for n, d, _g in cols)
    rows = [tuple(None if rng.random() < NULL_P else g(rng)
                  for _n, _d, g in cols) for _ in range(N_ROWS)]
    df = spark.createDataFrame(rows, ddl)

    t = warehouse.create_table(
        f"db.rt_{seed}", Schema.from_spark(df.schema),
        properties={"write.format.default": fmt})
    t.append(df)

    got = sorted((_norm(tuple(r)) for r in t.to_df().collect()),
                 key=repr)
    want = sorted((_norm(r) for r in df.collect()), key=repr)
    assert got == want, (
        f"seed={seed} fmt={fmt}: first diff "
        f"{next((a, b) for a, b in zip(got, want) if a != b)}")

    # field-ID projection survives a rename: values unchanged under the
    # new name, in the same physical files
    old = cols[rng.randrange(len(cols))][0]
    t.update_schema().rename_column(old, "renamed_col").commit()
    idx = [n for n, _d, _g in cols].index(old)
    got2 = sorted((_norm(r["renamed_col"]) for r in
                   t.to_df(select=["renamed_col"]).collect()),
                  key=repr)
    want2 = sorted((_norm(r[idx]) for r in rows), key=repr)
    assert got2 == want2, f"seed={seed} fmt={fmt}: rename broke projection"


DELETE_SEEDS = [(711, "parquet", "copy-on-write"),
                (812, "parquet", "merge-on-read"),
                (913, "avro", "merge-on-read"),
                (1014, "orc", "copy-on-write")]


@pytest.mark.parametrize("seed,fmt,mode", DELETE_SEEDS)
def test_random_schema_row_delete(warehouse, spark, seed, fmt, mode):
    """Row-level DELETE over a RANDOM full-type-system schema: pick a
    comparable primitive column, delete rows above its midpoint in the
    given mode, and assert the surviving rows equal the Python model —
    CoW rewrites and MoR delete files must both carry every exotic type
    through unharmed."""
    rng = random.Random(seed)
    comparable = {"bigint", "int", "double", "string"}
    while True:
        cols = [(f"c{i}",) + _mk_type(rng, 0)
                for i in range(rng.randint(3, 6))]
        pred_cols = [(n, d) for n, d, _g in cols if d in comparable]
        if pred_cols:
            break
    ddl = ", ".join(f"{n} {d}" for n, d, _g in cols)
    rows = [tuple(None if rng.random() < NULL_P else g(rng)
                  for _n, _d, g in cols) for _ in range(N_ROWS)]
    df = spark.createDataFrame(rows, ddl)

    t = warehouse.create_table(
        f"db.rtd_{seed}", Schema.from_spark(df.schema),
        properties={"write.format.default": fmt})
    t.append(df)

    name, d = pred_cols[rng.randrange(len(pred_cols))]
    idx = [n for n, _d, _g in cols].index(name)
    vals = sorted((r[idx] for r in rows if r[idx] is not None))
    assert vals, f"seed={seed}: all-null predicate column"
    pivot = vals[len(vals) // 2]
    lit = "'" + str(pivot).replace("'", "''") + "'" \
        if d == "string" else repr(pivot)
    t.delete_where(f"{name} > {lit}", mode=mode)

    got = sorted((_norm(tuple(r)) for r in t.to_df().collect()), key=repr)
    want = sorted((_norm(r) for r in rows
                   if r[idx] is None or not r[idx] > pivot), key=repr)
    assert got == want, f"seed={seed} fmt={fmt} mode={mode}"


MERGE_SEEDS = [(1115, "parquet"), (1216, "avro")]


@pytest.mark.parametrize("seed,fmt", MERGE_SEEDS)
def test_random_schema_merge_upsert(warehouse, spark, seed, fmt):
    """MERGE (update_all + insert_all) over a random full-type-system
    schema keyed on an injected bigint id: every exotic column must ride
    the CoW rewrite — matched rows take the source's values wholesale,
    unmatched sources insert, untouched rows survive bit-for-bit."""
    from incubator_iceberg_spark import row_ops
    from incubator_iceberg_spark.row_ops import WhenMatched, WhenNotMatched

    rng = random.Random(seed)
    cols = [(f"c{i}",) + _mk_type(rng, 0) for i in range(rng.randint(2, 4))]
    ddl = "rid bigint, " + ", ".join(f"{n} {d}" for n, d, _g in cols)

    def mk_rows(ids):
        return [(i,) + tuple(None if rng.random() < NULL_P else g(rng)
                             for _n, _d, g in cols) for i in ids]

    target_rows = mk_rows(range(0, 80))
    source_rows = mk_rows(range(40, 120))  # 40 matched, 40 new
    tdf = spark.createDataFrame(target_rows, ddl)
    sdf = spark.createDataFrame(source_rows, ddl)

    t = warehouse.create_table(
        f"db.rtm_{seed}", Schema.from_spark(tdf.schema),
        properties={"write.format.default": fmt})
    t.append(tdf)
    row_ops.merge_into(t, sdf, on=["rid"],
                       when_matched=[WhenMatched.update_all()],
                       when_not_matched=[WhenNotMatched.insert_all()],
                       spark=spark)

    want_by_id = {r[0]: r for r in target_rows}
    want_by_id.update({r[0]: r for r in source_rows})
    got = sorted((_norm(tuple(r)) for r in t.to_df().collect()), key=repr)
    want = sorted((_norm(r) for r in want_by_id.values()), key=repr)
    assert got == want, f"seed={seed} fmt={fmt}"
