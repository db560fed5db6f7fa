"""Catalog-plane fuzz gate: a seeded walk of create / drop(purge) /
rename / append — through a primary SqliteCatalog handle, a SECOND
independent handle (the CAS pointer plane), and a CachingCatalog
wrapper — diffed against a pure-Python model after every op.

Complements test_catalog_sqlite.py's deterministic pins; this is the
randomized gate in the style of test_fuzz_lifecycle.py, covering the
JdbcCatalog semantics space (pointer row = identity; location is
name-INDEPENDENT after a rename).

Deterministic pin first: re-creating a renamed-away name must get a
FRESH location (sharing the old directory interleaves metadata versions
and lets orphan-file cleanup of one table delete the other's data), and
drop(purge=True) must purge the POINTER's location, not the
name-derived path.

Tunables: SPARK_GRAFT_CAT_OPS (default 40), SPARK_GRAFT_FUZZ_SEED.
"""

import os
import random

import pytest

from incubator_iceberg_spark.caching_catalog import CachingCatalog
from incubator_iceberg_spark.catalog_sqlite import SqliteCatalog
from incubator_iceberg_spark.table import NoSuchTableError, TableAlreadyExistsError

N_OPS = int(os.environ.get("SPARK_GRAFT_CAT_OPS", "40"))
_SEED_OVERRIDE = os.environ.get("SPARK_GRAFT_FUZZ_SEED")
_SEEDS = [int(_SEED_OVERRIDE)] if _SEED_OVERRIDE else [20250815, 1729]

DDL = "k long, v string"


@pytest.fixture()
def scat(tmp_path, spark):
    return SqliteCatalog(str(tmp_path / "cat.db"), str(tmp_path / "wh"), spark)


def _rows(spark, ks, tag):
    return spark.createDataFrame([(k, f"{tag}_{k}") for k in ks], DDL)


def test_recreate_after_rename_gets_fresh_location(scat, spark, tmp_path):
    a = scat.create_table("db.a", DDL)
    a.append(_rows(spark, [1], "orig"))
    scat.rename_table("db.a", "db.b")
    a2 = scat.create_table("db.a", DDL)
    b = scat.load_table("db.b")
    assert a2.metadata.location != b.metadata.location
    a2.append(_rows(spark, [9], "new"))
    # purge of the renamed table removes ITS directory, not db.a's data
    assert scat.drop_table("db.b", purge=True)
    assert not os.path.isdir(b.metadata.location)
    assert [r["k"] for r in scat.load_table("db.a").to_df().collect()] == [9]


@pytest.mark.parametrize("seed", _SEEDS)
def test_randomized_catalog_walk_vs_model(scat, spark, seed):
    rng = random.Random(seed)
    second = SqliteCatalog(scat.db_path, scat.warehouse, spark)
    cached = CachingCatalog(scat)
    model: dict[str, dict[int, str]] = {}  # name -> {k: v}
    next_id = [0]
    next_key = [0]

    def fresh_name():
        next_id[0] += 1
        return f"db.t{next_id[0]}"

    def do_create():
        name = fresh_name()
        handle = rng.choice([scat, cached])
        handle.create_table(name, DDL)
        model[name] = {}
        # creating an existing name must raise through any handle
        with pytest.raises(TableAlreadyExistsError):
            rng.choice([scat, second, cached]).create_table(name, DDL)

    def do_drop():
        if not model:
            return
        name = rng.choice(sorted(model))
        purge = rng.random() < 0.5
        handle = rng.choice([scat, cached])
        assert handle.drop_table(name, purge=purge)
        if handle is scat:
            # documented staleness contract: a drop through a DIFFERENT
            # handle leaves any cached entry live until invalidation
            if name in cached._cache:
                assert cached.load_table(name) is not None
            cached.invalidate(name)
        del model[name]
        with pytest.raises(NoSuchTableError):
            cached.load_table(name)
        with pytest.raises(NoSuchTableError):
            second.load_table(name)

    def do_rename():
        if not model:
            return
        old = rng.choice(sorted(model))
        new = fresh_name()
        rng.choice([scat, cached]).rename_table(old, new)
        model[new] = model.pop(old)
        if rng.random() < 0.3 and len(model) >= 2:
            # renaming onto an existing name must raise and change nothing
            a, b = rng.sample(sorted(model), 2)
            with pytest.raises(TableAlreadyExistsError):
                scat.rename_table(a, b)

    def do_append():
        if not model:
            return
        name = rng.choice(sorted(model))
        handle = rng.choice([scat, second, cached])
        ks = [next_key[0] + i for i in range(rng.randint(1, 4))]
        next_key[0] += len(ks)
        t = handle.load_table(name)
        if handle is cached:
            t.refresh()  # cached handle may predate other-handle commits
        t.append(_rows(spark, ks, "a"))
        model[name].update({k: f"a_{k}" for k in ks})

    ops = [do_create, do_drop, do_rename, do_append, do_append]
    do_create()
    for _ in range(N_OPS):
        rng.choice(ops)()
        assert scat.list_tables() == sorted(model)
        assert second.list_tables() == sorted(model)

    # final content check through a COLD handle (no cache, no state)
    cold = SqliteCatalog(scat.db_path, scat.warehouse, spark)
    for name, rows in model.items():
        got = {r["k"]: r["v"] for r in cold.load_table(name).to_df().collect()}
        assert got == rows, f"{name}: {got} != {rows}"
