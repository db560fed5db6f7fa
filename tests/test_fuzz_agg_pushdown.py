"""Randomized aggregate-pushdown fuzz gate: the metadata-only fast paths
(Table.fast_count / Table.fast_min_max, the later-Iceberg aggregate
pushdown analog over manifest stats) may ALWAYS decline (return None) but
must NEVER return a wrong number.  A wrong fast path is the worst silent
class this engine has: the query skips the data entirely, so no amount of
scan-side testing catches it.

Seeded walks over three partition layouts interleave appends, CoW
deletes, CoW updates, MoR deletes, and compaction; after EVERY commit the
fast answers for a pool of random predicates are diffed against a
pure-Python model of the table.  The gate also asserts the fast path
actually fires (non-None) a minimum number of times per walk, so a
regression to "always decline" cannot pass vacuously.

Tunables: SPARK_GRAFT_AGG_FUZZ_OPS (default 16 ops/layout),
SPARK_GRAFT_FUZZ_SEED (shared override used by the other fuzz gates)."""

import os
import random

import pytest

N_OPS = int(os.environ.get("SPARK_GRAFT_AGG_FUZZ_OPS", "16"))
SEED = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "0"))

LAYOUTS = [
    ("unpartitioned", None),
    ("identity_grp", ["grp"]),
    ("bucket_id", ["bucket(4, id)"]),
]


def _rows(rng, next_id, n):
    out = []
    for i in range(n):
        out.append({
            "id": next_id + i,
            "grp": rng.choice(["a", "b", "c", "d"]),
            "v": None if rng.random() < 0.12 else rng.randrange(-1000, 1000),
            # struct leaves: nullable string + long (nested stats plane)
            "ms": None if rng.random() < 0.2 else f"s{rng.randrange(50)}",
            "mw": rng.randrange(-1000, 1000),
        })
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        [(r["id"], r["grp"], r["v"], (r["ms"], r["mw"])) for r in rows],
        "id long, grp string, v long, m struct<s: string, w: long>")


def _predicates(rng):
    """(sql, python) pairs the planner sees; every one must be either
    declined or answered exactly."""
    pool = []
    for _ in range(4):
        lo = rng.randrange(0, 300)
        hi = lo + rng.randrange(10, 200)
        pool.append((f"id >= {lo} AND id < {hi}",
                     lambda r, lo=lo, hi=hi: lo <= r["id"] < hi))
    g = rng.choice(["a", "b", "c", "d"])
    pool.append((f"grp = '{g}'", lambda r, g=g: r["grp"] == g))
    pool.append((f"grp != '{g}'", lambda r, g=g: r["grp"] != g))
    v = rng.randrange(-500, 500)
    pool.append((f"v > {v}", lambda r, v=v: r["v"] is not None and r["v"] > v))
    pool.append(("v IS NULL", lambda r: r["v"] is None))
    w = rng.randrange(-500, 500)
    pool.append((f"m.w > {w}",
                 lambda r, w=w: r["mw"] is not None and r["mw"] > w))
    pool.append(("m.s IS NULL", lambda r: r["ms"] is None))
    return pool


def _check_fast_paths(t, model, preds, stats, ctx):
    # unfiltered count
    fc = t.fast_count()
    if fc is not None:
        stats["count_hits"] += 1
        assert fc == len(model), f"{ctx}: fast_count() {fc} != {len(model)}"
    # filtered counts
    for sql, py in preds:
        fc = t.fast_count(sql)
        if fc is None:
            continue
        stats["count_hits"] += 1
        want = sum(1 for r in model.values() if py(r))
        assert fc == want, f"{ctx}: fast_count({sql!r}) {fc} != {want}"
    # min/max over the nullable long column and the key
    for col in ("v", "id"):
        mm = t.fast_min_max(col)
        if mm is None:
            continue
        stats["mm_hits"] += 1
        vals = [r[col] for r in model.values() if r[col] is not None]
        want = (min(vals), max(vals)) if vals else (None, None)
        assert tuple(mm) == want, f"{ctx}: fast_min_max({col}) {mm} != {want}"
    # the HYBRID pushdown (count_rows / min_max: strict files fold from
    # metadata, partial files scan) never declines — it must be exact on
    # every predicate, every step, delete debt included
    for sql, py in preds:
        got = t.count_rows(sql)
        want = sum(1 for r in model.values() if py(r))
        assert got["count"] == want, \
            f"{ctx}: count_rows({sql!r}) {got} != {want}"
        stats["hybrid_meta_files"] += got["metadata_only_files"]
        gotn = t.count_non_null("v", sql)
        wantn = sum(1 for r in model.values() if py(r) and r["v"] is not None)
        assert gotn["count"] == wantn, \
            f"{ctx}: count_non_null(v, {sql!r}) {gotn} != {wantn}"
        stats["hybrid_meta_files"] += gotn["metadata_only_files"]
        # struct-nested leaf: COUNT(m.s) folds from nested dotted-path
        # value/null counts (one slot per row through structs)
        gotm = t.count_non_null("m.s", sql)
        wantm = sum(1 for r in model.values() if py(r) and r["ms"] is not None)
        assert gotm["count"] == wantm, \
            f"{ctx}: count_non_null(m.s, {sql!r}) {gotm} != {wantm}"
        stats["nested_meta_files"] += gotm["metadata_only_files"]
    sql, py = preds[0]
    got = t.min_max("v", sql)
    vals = [r["v"] for r in model.values() if py(r) and r["v"] is not None]
    want = (min(vals), max(vals)) if vals else (None, None)
    assert (got["min"], got["max"]) == want, \
        f"{ctx}: min_max(v, {sql!r}) {got} != {want}"


@pytest.mark.parametrize("layout_name,part", LAYOUTS,
                         ids=[l[0] for l in LAYOUTS])
def test_fuzz_agg_pushdown_never_wrong(warehouse, spark, layout_name, part):
    from incubator_iceberg_spark.schema import Schema

    layout_salt = [l[0] for l in LAYOUTS].index(layout_name)
    rng = random.Random(0xA66 + SEED * 1000 + layout_salt)
    df0_rows = _rows(rng, 0, 40)
    df0 = _df(spark, df0_rows)
    t = warehouse.create_table(f"db.aggfuzz_{layout_name}",
                               Schema.from_spark(df0.schema),
                               partition_by=part)
    t.append(df0)
    model = {r["id"]: r for r in df0_rows}
    next_id = 40
    preds = _predicates(rng)
    stats = {"count_hits": 0, "mm_hits": 0, "hybrid_meta_files": 0,
             "nested_meta_files": 0}
    _check_fast_paths(t, model, preds, stats, f"{layout_name} init")

    for step in range(N_OPS):
        op = rng.choice(["append", "append", "cow_delete", "mor_delete",
                         "cow_update", "compact"])
        if op == "append":
            rows = _rows(rng, next_id, rng.randrange(5, 25))
            next_id += len(rows)
            t.append(_df(spark, rows))
            for r in rows:
                model[r["id"]] = r
        elif op in ("cow_delete", "mor_delete"):
            sql, py = rng.choice(preds)
            mode = "copy-on-write" if op == "cow_delete" else "merge-on-read"
            t.delete_where(sql, mode=mode)
            model = {k: r for k, r in model.items() if not py(r)}
        elif op == "cow_update":
            lo = rng.randrange(0, next_id)
            hi = lo + 20
            dv = rng.randrange(1, 9)
            t.update({"v": f"v + {dv}"}, f"id >= {lo} AND id < {hi}",
                     mode="copy-on-write")
            for r in model.values():
                if lo <= r["id"] < hi and r["v"] is not None:
                    r["v"] += dv
        else:
            t.rewrite_data_files(min_input_files=2)
        ctx = f"{layout_name} step {step} after {op}"
        _check_fast_paths(t, model, preds, stats, ctx)
        # the real scan stays the ground truth the model claims to be
        if step % 5 == 0:
            got = {row["id"] for row in t.to_df().select("id").collect()}
            assert got == set(model), f"{ctx}: scan/model diverged"

    # the gate must not pass by always declining / never folding metadata
    assert stats["count_hits"] >= 5, stats
    assert stats["mm_hits"] >= 2, stats
    assert stats["hybrid_meta_files"] > 0, stats
    # nested COUNT must actually fold from metadata, not pass by scanning
    assert stats["nested_meta_files"] > 0, stats
