"""Fuzz gate for name-mapping resolution (schema.name-mapping.default):
randomized interleavings of foreign-file imports (random column subsets,
random column ORDER, physical names drawn from any registered alias),
engine-written appends, and column renames — the engine scan must match
a plain Python row model at every step, full and filtered.

The reference contract under test: a data file with no field-id
metadata resolves each current-schema column through the stored mapping
(core/.../mapping/MappingUtil.java, parquet/.../ApplyNameMapping.java),
never through the current column NAME.

Seeded: failures reproduce with SPARK_GRAFT_FUZZ_SEED.
"""

import os
import random

import pytest

from incubator_iceberg_spark import mapping as NM
from incubator_iceberg_spark import procedures

SEED = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "515"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_NM_ROUNDS", "4"))
OPS = int(os.environ.get("SPARK_GRAFT_NM_OPS", "12"))


@pytest.mark.parametrize("rnd", range(ROUNDS))
def test_fuzz_name_mapping_vs_model(warehouse, spark, tmp_path, rnd):
    rng = random.Random(SEED + rnd)
    t = warehouse.create_table(f"db.nmf{rnd}", "a long, b long, c string")
    NM.set_default_mapping(t)
    fids = {n: t.metadata.schema().find_field(n).field_id
            for n in ("a", "b", "c")}
    # model state: rows keyed by field-id; alias pool per field-id
    model: list = []  # list of {field_id: value}
    aliases = {fid: [n] for n, fid in fids.items()}
    current = {fid: n for n, fid in fids.items()}
    next_val = [0]
    fresh = [0]

    def mkrow(present):
        r = {}
        for fid in fids.values():
            if fid in present:
                next_val[0] += 1
                r[fid] = (f"s{next_val[0]}"
                          if current[fid].startswith("c") or
                          aliases[fid][0] == "c" else next_val[0])
            else:
                r[fid] = None
        return r

    def nkey(tup):
        return tuple((v is None, "" if v is None else str(v)) for v in tup)

    def check():
        names = [current[f] for f in sorted(fids.values())]
        got = sorted(
            (tuple(r[n] for n in names) for r in t.to_df().collect()),
            key=nkey)
        want = sorted(
            (tuple(m[f] for f in sorted(fids.values())) for m in model),
            key=nkey)
        assert got == want, f"seed={SEED + rnd}"

    for step in range(OPS):
        op = rng.choice(["foreign", "foreign", "append", "rename", "check"])
        if op == "foreign":
            # random non-empty subset, random order, random alias names
            present = rng.sample(sorted(fids.values()),
                                 rng.randrange(1, len(fids) + 1))
            order = list(present)
            rng.shuffle(order)
            rows = [mkrow(present) for _ in range(rng.randrange(1, 6))]
            phys = {fid: rng.choice(aliases[fid]) for fid in order}
            schema_str = ", ".join(
                f"{phys[fid]} {'string' if aliases[fid][0] == 'c' else 'long'}"
                for fid in order)
            df = spark.createDataFrame(
                [tuple(r[fid] for fid in order) for r in rows], schema_str)
            path = str(tmp_path / f"f{rnd}_{step}")
            df.coalesce(1).write.parquet(path)
            files = [os.path.join(path, f) for f in os.listdir(path)
                     if f.endswith(".parquet")]
            procedures.add_files(t, files)
            model.extend(rows)
        elif op == "append":
            rows = [mkrow(set(fids.values()))
                    for _ in range(rng.randrange(1, 6))]
            names = [current[f] for f in sorted(fids.values())]
            types = {f: ("string" if aliases[f][0] == "c" else "long")
                     for f in sorted(fids.values())}
            schema_str = ", ".join(
                f"{current[f]} {types[f]}" for f in sorted(fids.values()))
            t.append(spark.createDataFrame(
                [tuple(r[f] for f in sorted(fids.values())) for r in rows],
                schema_str))
            model.extend(rows)
        elif op == "rename":
            fid = rng.choice(sorted(fids.values()))
            fresh[0] += 1
            new = f"{current[fid]}_r{fresh[0]}"
            t.update_schema().rename_column(current[fid], new).commit()
            current[fid] = new
            # the mapping gained the new name as an alias: foreign files
            # may legitimately be written under it from now on
            aliases[fid].append(new)
        else:
            check()
            # filtered scan on a random long field (model-filtered)
            fid = fids["a"]
            vals = [m[fid] for m in model if m[fid] is not None]
            if vals:
                pivot = rng.choice(vals)
                got = sorted(
                    r[current[fid]] for r in
                    t.to_df(filter=f"{current[fid]} >= {pivot}").collect())
                want = sorted(v for v in vals if v >= pivot)
                assert got == want, f"seed={SEED + rnd} pivot={pivot}"
    check()


@pytest.mark.parametrize("rnd", range(2))
def test_fuzz_nested_struct_mapping_vs_model(warehouse, spark, tmp_path, rnd):
    """Nested edition: foreign files carry a struct column under random
    parent/leaf aliases, random leaf SUBSETS and random leaf ORDER; the
    scan must resolve every leaf by name through the nested mapping and
    absent leaves must read NULL — checked full and filtered against a
    plain Python model (r5 verdict What's-wrong #1 regression gate)."""
    rng = random.Random(SEED + 100 + rnd)
    t = warehouse.create_table(
        f"db.nmfn{rnd}", "id long, meta struct<x: long, y: string>")
    NM.set_default_mapping(t, aliases={
        "meta": ["m", "md"], "meta.x": "xx", "meta.y": "yy"})
    parent_aliases = ["meta", "m", "md"]
    leaf_aliases = {"x": ["x", "xx"], "y": ["y", "yy"]}
    model: list = []  # (id, x, y)
    nid = [0]

    def check():
        got = sorted((r["id"], r["meta"]["x"], r["meta"]["y"])
                     for r in t.to_df().collect())
        assert got == sorted(model), f"seed={SEED + 100 + rnd}"
        xs = [x for (_, x, _) in model if x is not None]
        if xs:
            pivot = rng.choice(xs)
            got_f = t.to_df().filter(f"meta.x >= {pivot}").count()
            assert got_f == sum(1 for x in xs if x >= pivot), \
                f"seed={SEED + 100 + rnd} pivot={pivot}"
        n_null = sum(1 for (_, x, _) in model if x is None)
        assert t.to_df().filter("meta.x IS NULL").count() == n_null

    for step in range(8):
        op = rng.choice(["foreign", "foreign", "append", "check"])
        if op == "foreign":
            leaves = rng.sample(["x", "y"], rng.randrange(1, 3))
            rng.shuffle(leaves)
            rows = []
            for _ in range(rng.randrange(1, 5)):
                nid[0] += 1
                x = nid[0] * 10 if "x" in leaves else None
                y = f"s{nid[0]}" if "y" in leaves else None
                rows.append((nid[0], x, y))
            parent = rng.choice(parent_aliases)
            phys = {lf: rng.choice(leaf_aliases[lf]) for lf in leaves}
            inner = ", ".join(
                f"{phys[lf]}: {'long' if lf == 'x' else 'string'}"
                for lf in leaves)
            schema_str = f"id long, {parent} struct<{inner}>"
            data = [(i, tuple((x if lf == "x" else y) for lf in leaves))
                    for (i, x, y) in rows]
            df = spark.createDataFrame(data, schema_str)
            path = str(tmp_path / f"nf{rnd}_{step}")
            df.coalesce(1).write.parquet(path)
            files = [os.path.join(path, f) for f in os.listdir(path)
                     if f.endswith(".parquet")]
            procedures.add_files(t, files)
            model.extend(rows)
        elif op == "append":
            rows = []
            for _ in range(rng.randrange(1, 5)):
                nid[0] += 1
                rows.append((nid[0], nid[0] * 10, f"s{nid[0]}"))
            t.append(spark.createDataFrame(
                [(i, (x, y)) for (i, x, y) in rows],
                "id long, meta struct<x: long, y: string>"))
            model.extend(rows)
        else:
            check()
    check()
