"""Randomized branch/tag-plane fuzz gate: a seeded interleaving of main
writes (appends, CoW/MoR deletes, compaction), branch appends, branch
creation, tagging, fast-forwards (both directions), ref drops, and
snapshot expiry must keep EVERY live ref's scan identical to a pure-
Python per-ref model.

The high-value surfaces this walks that the lifecycle fuzz
(test_fuzz_lifecycle.py) does not:

- a DIVERGED branch reading its own snapshot while main accumulates MoR
  delete files over the same data files (sequence/snapshot scoping must
  keep main's deletes invisible to the branch);
- fast-forward ancestry validation under randomized divergence (valid
  moves must succeed, invalid ones must raise — both asserted, so a
  conservative-reject bug fails the gate too);
- expiry reachability through branch heads, not just tags.

Reference semantics: SnapshotRef branches/tags + SnapshotManager
fast-forward (core/.../SnapshotManager.java:32-233) and
RemoveSnapshots ref reachability (RemoveSnapshots.java:63-119).

Tunables: SPARK_GRAFT_REF_OPS (default 28), SPARK_GRAFT_FUZZ_SEED.
"""

import copy
import os
import random

import pytest

N_OPS = int(os.environ.get("SPARK_GRAFT_REF_OPS", "28"))

_SEED_OVERRIDE = os.environ.get("SPARK_GRAFT_FUZZ_SEED")
_REF_SEEDS = ([int(_SEED_OVERRIDE)] if _SEED_OVERRIDE else [20113, 555])


def _rows_of(df):
    return {r["rid"]: (r["v"],) for r in df.collect()}


def _model_rows(rows):
    return {r["rid"]: (r["v"],) for r in rows}


@pytest.mark.parametrize("seed", _REF_SEEDS)
def test_randomized_ref_plane_vs_model(warehouse, spark, seed):
    from incubator_iceberg_spark import metadata as MD
    from incubator_iceberg_spark.schema import Schema

    rng = random.Random(seed)
    df0 = spark.createDataFrame([(0, 0)], "rid long, v long")
    t = warehouse.create_table(f"db.reffuzz_{seed}",
                               Schema.from_spark(df0.schema))

    next_rid = 0
    next_tok = 0
    rows: dict[str, list] = {"main": []}     # ref -> row dicts
    ancestry: dict[str, list] = {"main": []}  # ref -> commit tokens
    tags: dict[str, list] = {}                # tag -> frozen rows
    n_branches = 0

    def fresh_token():
        nonlocal next_tok
        next_tok += 1
        return next_tok

    def make_batch():
        nonlocal next_rid
        n = rng.randrange(4, 12)
        batch = [{"rid": next_rid + i, "v": rng.randrange(0, 100)}
                 for i in range(n)]
        next_rid += n
        return batch

    def append_to(ref):
        batch = make_batch()
        df = spark.createDataFrame([(r["rid"], r["v"]) for r in batch],
                                   "rid long, v long")
        t.append(df, branch=None if ref == "main" else ref)
        rows[ref] = rows[ref] + batch
        ancestry[ref] = ancestry[ref] + [fresh_token()]

    append_to("main")
    ops_run = []
    ff_expected_ok = ff_expected_reject = 0

    for step in range(N_OPS):
        branches = [r for r in rows if r != "main"]
        kind = rng.choice(
            ["append_main", "append_main", "append_branch", "append_branch",
             "create_branch", "delete_cow", "delete_mor", "compact",
             "tag", "fast_forward", "drop_ref", "expire"])
        if kind == "append_main":
            append_to("main")
        elif kind == "append_branch":
            if not branches:
                continue
            append_to(rng.choice(branches))
        elif kind == "create_branch":
            if len(branches) >= 4 or not ancestry["main"]:
                continue
            name = f"b{n_branches}"
            n_branches += 1
            t.create_branch(name)       # at current main head
            rows[name] = copy.deepcopy(rows["main"])
            ancestry[name] = list(ancestry["main"])
        elif kind in ("delete_cow", "delete_mor"):
            if not rows["main"]:
                continue
            m, j = rng.choice([(4, 1), (6, 3), (9, 0)])
            mode = ("merge-on-read" if kind == "delete_mor"
                    else "copy-on-write")
            t.delete_where(f"rid % {m} = {j}", mode=mode)
            rows["main"] = [r for r in rows["main"] if r["rid"] % m != j]
            ancestry["main"] = ancestry["main"] + [fresh_token()]
        elif kind == "compact":
            t.rewrite_data_files(min_input_files=2)
            # rows unchanged; a no-op rewrite commits nothing, but a real
            # one advances main — either way main's model rows hold, and
            # ancestry token freshness only matters for fast-forward
            # validity, so only record a token when a snapshot landed
            if t.metadata.current_snapshot_id is not None:
                ancestry["main"] = ancestry["main"] + [fresh_token()]
        elif kind == "tag":
            src = rng.choice(list(rows))
            ref = t.metadata.ref(src)
            if ref is None:
                continue
            name = f"tag_{step}"
            t.create_tag(name, ref["snapshot-id"])
            tags[name] = copy.deepcopy(rows[src])
        elif kind == "fast_forward":
            if not branches:
                continue
            b = rng.choice(branches)
            direction = rng.choice(["main_to_branch", "branch_to_main"])
            if direction == "main_to_branch":
                dst, src = "main", b
            else:
                dst, src = b, "main"
            head_dst = ancestry[dst][-1] if ancestry[dst] else None
            valid = head_dst is None or head_dst in ancestry[src]
            if valid:
                t.fast_forward(dst, src)
                rows[dst] = copy.deepcopy(rows[src])
                ancestry[dst] = list(ancestry[src])
                ff_expected_ok += 1
            else:
                with pytest.raises(MD.ValidationException):
                    t.fast_forward(dst, src)
                ff_expected_reject += 1
        elif kind == "drop_ref":
            droppable = branches + list(tags)
            if not droppable:
                continue
            name = rng.choice(droppable)
            t.drop_ref(name)
            rows.pop(name, None)
            ancestry.pop(name, None)
            tags.pop(name, None)
        elif kind == "expire":
            t.expire_snapshots(retain_last=rng.randrange(2, 5))
        ops_run.append(kind)

        # every live ref (main + branches) must scan exactly its model
        for ref in rows:
            got = _rows_of(t.to_df(ref=None if ref == "main" else ref))
            want = _model_rows(rows[ref])
            assert got == want, (
                f"seed {seed} step {step} ({kind}): ref {ref!r} mismatch; "
                f"missing={sorted(set(want) - set(got))[:5]} "
                f"extra={sorted(set(got) - set(want))[:5]}")

        # every tag still reads its frozen contents
        for name, frozen in tags.items():
            tg = _rows_of(t.to_df(ref=name))
            assert tg == _model_rows(frozen), (
                f"seed {seed} step {step} ({kind}): tag {name} diverged")

    # coverage is structural, not seed-dependent: force any critical op
    # the walk missed, then re-verify every ref
    if "append_branch" not in ops_run:
        if not [r for r in rows if r != "main"]:
            name = f"b{n_branches}"
            t.create_branch(name)
            rows[name] = copy.deepcopy(rows["main"])
            ancestry[name] = list(ancestry["main"])
        append_to([r for r in rows if r != "main"][0])
    if ff_expected_ok == 0:
        # branch at main head -> append to it -> main fast-forwards to it
        name = f"b{n_branches + 1}"
        t.create_branch(name)
        rows[name] = copy.deepcopy(rows["main"])
        ancestry[name] = list(ancestry["main"])
        append_to(name)
        t.fast_forward("main", name)
        rows["main"] = copy.deepcopy(rows[name])
        ancestry["main"] = list(ancestry[name])
    if ff_expected_reject == 0:
        # diverge: branch, then commit to main -> branch is behind
        name = f"b{n_branches + 2}"
        t.create_branch(name)
        rows[name] = copy.deepcopy(rows["main"])
        ancestry[name] = list(ancestry["main"])
        append_to("main")
        with pytest.raises(MD.ValidationException):
            t.fast_forward("main", name)
        rows.pop(name)
        t.drop_ref(name)
    if "expire" not in ops_run:
        t.expire_snapshots(retain_last=2)
    for ref in rows:
        got = _rows_of(t.to_df(ref=None if ref == "main" else ref))
        assert got == _model_rows(rows[ref]), f"forced-op check: {ref!r}"
    for name, frozen in tags.items():
        assert _rows_of(t.to_df(ref=name)) == _model_rows(frozen), name

    # persisted state agrees after a fresh load
    t2 = warehouse.load_table(f"db.reffuzz_{seed}")
    for ref in rows:
        got = _rows_of(t2.to_df(ref=None if ref == "main" else ref))
        assert got == _model_rows(rows[ref]), f"reload diverged for {ref!r}"
