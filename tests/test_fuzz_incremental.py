"""Randomized incremental-read fuzz gate: after a seeded interleaving of
appends (small enough to trigger manifest merging), CoW/MoR deletes,
compactions, and a rollback+continue, `appends_between(a, b)` for every
valid ancestry pair must return EXACTLY the union of the append batches
committed in (a, b] — and raise for non-ancestry pairs.

This systematizes the round-4 incremental bug class (appends lost after a
compaction; manifest merging flipping the committing snapshot's entries;
silent truncation of unreconstructable ranges) into one walk-everything
gate.  Changelog consistency over the same history is checked at the end:
replaying inserts-minus-deletes must equal the final scan."""

import os
import random

import pytest

N_OPS = int(os.environ.get("SPARK_GRAFT_INC_OPS", "22"))


def test_randomized_incremental_reads_vs_model(warehouse, spark):
    from incubator_iceberg_spark.schema import Schema
    from incubator_iceberg_spark.scan import TableScan

    rng = random.Random(int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "6033")))
    df0 = spark.createDataFrame([(0, 0)], "rid long, v long")
    t = warehouse.create_table(
        "db.incfuzz", Schema.from_spark(df0.schema),
        # low merge threshold so fast-append pressure exercises manifest
        # merging mid-walk (the r4 lost-rows bug lived there)
        properties={"commit.manifest.min-count-to-merge": "4"})

    next_rid = 0
    append_batch: dict[int, set] = {}  # append sid -> set of rids appended

    def do_append():
        nonlocal next_rid
        n = rng.randrange(3, 10)
        rows = [(next_rid + i, rng.randrange(0, 100)) for i in range(n)]
        next_rid += n
        t.append(spark.createDataFrame(rows, "rid long, v long"))
        append_batch[t.metadata.current_snapshot_id] = {r[0] for r in rows}

    do_append()
    rolled_back = False
    picked: set = set()  # orphans already re-applied (re-pick = dup rows)
    for step in range(N_OPS):
        kind = rng.choice(["append", "append", "append", "delete_cow",
                           "delete_mor", "compact", "rollback",
                           "cherry_pick"])
        if kind == "append":
            do_append()
        elif kind == "cherry_pick":
            # re-apply an orphaned append: its rows must surface in the
            # NEW commit's incremental slice (the restamping contract)
            chain = set(_ancestry(t))
            cands = [sid for sid in append_batch
                     if sid not in chain and sid not in picked
                     and t.metadata.snapshot_by_id(sid) is not None]
            if not cands:
                continue
            src = rng.choice(cands)
            t.cherry_pick(src)
            picked.add(src)
            append_batch[t.metadata.current_snapshot_id] = append_batch[src]
        elif kind == "delete_cow":
            t.delete_where(f"rid % 5 = {rng.randrange(5)}")
        elif kind == "delete_mor":
            t.delete_where(f"rid % 7 = {rng.randrange(7)}",
                           mode="merge-on-read")
        elif kind == "compact":
            t.rewrite_data_files(min_input_files=2)
        elif kind == "rollback" and not rolled_back:
            # one rollback mid-history, then history continues on the new
            # branch — incremental ranges must follow the NEW ancestry
            ancestry = _ancestry(t)
            if len(ancestry) > 3:
                t.set_current_snapshot(ancestry[len(ancestry) // 2])
                rolled_back = True

    if not os.environ.get("SPARK_GRAFT_FUZZ_SEED"):
        assert rolled_back, "default seed must exercise rollback+continue"
    ancestry = _ancestry(t)  # oldest -> newest, current chain only
    in_chain = set(ancestry)

    # every (from, to) ancestry pair (bounded sample) must equal the model
    pairs = [(a, b) for ia, a in enumerate(ancestry)
             for b in ancestry[ia + 1:]]
    rng.shuffle(pairs)
    checked = 0
    for a, b in pairs[:25]:
        idx_a, idx_b = ancestry.index(a), ancestry.index(b)
        want = set()
        for sid in ancestry[idx_a + 1: idx_b + 1]:
            want |= append_batch.get(sid, set())
        got = {r["rid"] for r in
               t.new_scan().appends_between(a, b).to_df().collect()}
        assert got == want, (
            f"appends_between({a}, {b}): got {len(got)} rids, want "
            f"{len(want)}; missing={sorted(want - got)[:5]} "
            f"extra={sorted(got - want)[:5]}")
        checked += 1
    assert checked >= 10

    # a 'from' that is NOT an ancestor of 'to' must raise, never truncate
    orphans = [sid for sid in append_batch if sid not in in_chain
               and t.metadata.snapshot_by_id(sid) is not None]
    if orphans and len(ancestry) >= 2:
        with pytest.raises(ValueError):
            t.new_scan().appends_between(orphans[0], ancestry[-1]).to_df()

    # changelog replay over the full retained history == final scan:
    # keep each rid's LAST change by _change_ordinal; live rows are the
    # ones whose last change is an insert
    live = {r["rid"] for r in t.to_df().collect()}
    last: dict = {}
    for r in t.changelog().collect():
        d = r.asDict()
        key = d["rid"]
        if key not in last or d["_change_ordinal"] >= last[key][0]:
            last[key] = (d["_change_ordinal"], d["_change_type"])
    replay = {rid for rid, (_, ch) in last.items() if ch == "insert"}
    assert replay == live, (
        f"changelog replay diverged: missing={sorted(live - replay)[:5]} "
        f"extra={sorted(replay - live)[:5]}")


def _ancestry(t):
    out = []
    sid = t.metadata.current_snapshot_id
    while sid is not None:
        out.append(sid)
        snap = t.metadata.snapshot_by_id(sid)
        if snap is None:
            break
        sid = snap.parent_id
    return list(reversed(out))
