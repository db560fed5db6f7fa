"""Randomized snapshot-lifecycle fuzz gate: a seeded interleaving of
appends, CoW/MoR deletes, rollbacks, cherry-picks, tags, compaction, and
snapshot expiry must keep (a) the current scan, (b) time travel to every
retained snapshot, and (c) every tag read identical to a pure-Python model
that froze the row set at each commit.

Complements test_fuzz_evolution.py (schema plane) and
test_stress_concurrent.py (race plane): this walks the HISTORY plane —
the reference's SnapshotManager / RemoveSnapshots semantics
(core/.../SnapshotManager.java:32-233, RemoveSnapshots.java:63-119).

Tunables: SPARK_GRAFT_LIFE_OPS (default 26)."""

import copy
import os
import random

N_OPS = int(os.environ.get("SPARK_GRAFT_LIFE_OPS", "26"))


def _rows_of(df):
    return {r["rid"]: (r["v"],) for r in df.collect()}


def _model_rows(rows):
    return {r["rid"]: (r["v"],) for r in rows}


import pytest


_SEED_OVERRIDE = os.environ.get("SPARK_GRAFT_FUZZ_SEED")
_LIFE_SEEDS = ([int(_SEED_OVERRIDE)] if _SEED_OVERRIDE else [4111, 777])


@pytest.mark.parametrize("seed", _LIFE_SEEDS)
def test_randomized_snapshot_lifecycle_vs_model(warehouse, spark, seed):
    from incubator_iceberg_spark.schema import Schema

    rng = random.Random(seed)
    df0 = spark.createDataFrame([(0, 0)], "rid long, v long")
    t = warehouse.create_table(f"db.lifefuzz_{seed}",
                               Schema.from_spark(df0.schema))

    next_rid = 0
    current: list[dict] = []
    frozen: dict[int, list] = {}     # snapshot_id -> row list at that commit
    batches: dict[int, list] = {}    # append snapshot_id -> its batch rows
    tags: dict[str, int] = {}        # tag name -> snapshot_id

    def commit_snapshot():
        sid = t.metadata.current_snapshot_id
        frozen[sid] = copy.deepcopy(current)
        return sid

    def do_append():
        nonlocal next_rid, current
        n = rng.randrange(5, 15)
        rows = [{"rid": next_rid + i, "v": rng.randrange(0, 100)}
                for i in range(n)]
        next_rid += n
        t.append(spark.createDataFrame([(r["rid"], r["v"]) for r in rows],
                                       "rid long, v long"))
        current = current + rows
        batches[t.metadata.current_snapshot_id] = rows
        commit_snapshot()

    do_append()
    ops_run = []

    for step in range(N_OPS):
        kind = rng.choice(
            ["append", "append", "delete_cow", "delete_mor", "rollback",
             "cherry_pick", "tag", "compact", "expire"])
        if kind == "append":
            do_append()
        elif kind in ("delete_cow", "delete_mor"):
            if not current:
                continue
            m, j = rng.choice([(4, 1), (6, 3), (9, 0)])
            mode = ("merge-on-read" if kind == "delete_mor"
                    else "copy-on-write")
            t.delete_where(f"rid % {m} = {j}", mode=mode)
            current = [r for r in current if r["rid"] % m != j]
            commit_snapshot()
        elif kind == "rollback":
            retained = [s.snapshot_id for s in t.metadata.snapshots
                        if s.snapshot_id in frozen]
            if len(retained) < 2:
                continue
            sid = rng.choice(retained)
            t.set_current_snapshot(sid)
            current = copy.deepcopy(frozen[sid])
        elif kind == "cherry_pick":
            cur_rids = {r["rid"] for r in current}
            ancestors = set()
            asid = t.metadata.current_snapshot_id
            while asid is not None:
                ancestors.add(asid)
                snap = t.metadata.snapshot_by_id(asid)
                asid = snap.parent_id if snap is not None else None
            cands = [sid for sid, rows in batches.items()
                     if t.metadata.snapshot_by_id(sid) is not None
                     and sid not in ancestors  # guard refuses ancestors
                     and not ({r["rid"] for r in rows} & cur_rids)]
            if not cands:
                continue
            sid = rng.choice(cands)
            t.cherry_pick(sid)
            current = current + copy.deepcopy(batches[sid])
            commit_snapshot()
        elif kind == "tag":
            sid = t.metadata.current_snapshot_id
            if sid is None:
                continue
            name = f"tag_{step}"
            t.create_tag(name, sid)
            tags[name] = sid
        elif kind == "compact":
            t.rewrite_data_files(min_input_files=2)
            commit_snapshot()  # rows unchanged; snapshot id advanced
        elif kind == "expire":
            t.expire_snapshots(retain_last=rng.randrange(2, 5))
            retained_ids = {s.snapshot_id for s in t.metadata.snapshots}
            # reachability invariant: every tag target survives expiry
            for name, sid in tags.items():
                assert sid in retained_ids, (
                    f"step {step}: expire dropped tagged snapshot {sid} "
                    f"({name})")
            for sid in list(frozen):
                if sid not in retained_ids:
                    del frozen[sid]
        ops_run.append(kind)

        # (a) current scan == model
        got = _rows_of(t.to_df())
        want = _model_rows(current)
        assert got == want, (
            f"step {step} ({kind}): current scan mismatch; "
            f"missing={sorted(set(want) - set(got))[:5]} "
            f"extra={sorted(set(got) - set(want))[:5]}")

        # (b) time travel to up to 3 random retained frozen snapshots
        checkable = [sid for sid in frozen
                     if t.metadata.snapshot_by_id(sid) is not None]
        for sid in rng.sample(checkable, min(3, len(checkable))):
            tt = _rows_of(t.to_df(snapshot_id=sid))
            assert tt == _model_rows(frozen[sid]), (
                f"step {step} ({kind}): time travel to {sid} diverged")

        # (c) every tag still reads its frozen contents
        for name, sid in tags.items():
            if sid in frozen:
                tg = _rows_of(t.to_df(ref=name))
                assert tg == _model_rows(frozen[sid]), (
                    f"step {step} ({kind}): tag {name} diverged")

    # the walk must have exercised the history ops, not just appends
    # (skip the mix assertion under an override seed — coverage varies)
    if not _SEED_OVERRIDE:
        assert {"rollback", "expire"} & set(ops_run), ops_run
    seqs = [s.sequence_number for s in
            sorted(t.metadata.snapshots, key=lambda s: s.sequence_number)]
    assert seqs == sorted(set(seqs)), "sequence numbers not strictly unique"
