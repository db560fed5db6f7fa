"""Changelog micro-batch source (streaming.ChangelogMicroBatchReader):
row-level CDC streaming with per-snapshot offsets, checkpoint resume,
update images, and CDC replication into the upsert-MoR sink.
"""

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark import streaming as STR
from incubator_iceberg_spark.io import load_table
from incubator_iceberg_spark.schema import Schema


def _build(warehouse, spark, sf_dir, name):
    orders = load_table(spark, sf_dir, "orders")
    base = orders.orderBy("o_orderkey").limit(200)
    t = warehouse.create_table(name, Schema.from_spark(base.schema))
    t.append(base)
    s0 = t.metadata.current_snapshot_id
    t.update({"o_totalprice": "o_totalprice * 2"}, "o_orderkey % 7 = 0")
    t.delete_where("o_orderkey % 5 = 0 AND o_orderkey % 7 != 0",
                   mode="merge-on-read")
    t.append(base.limit(10).withColumn("o_orderkey",
                                       F.col("o_orderkey") + 8_000_000))
    return t, base, s0


def _rows(df):
    return sorted((r["o_orderkey"], r["_change_type"],
                   round(r["o_totalprice"], 2)) for r in df.collect())


def test_changelog_batches_equal_full_changelog(warehouse, spark, sf_dir):
    t, base, s0 = _build(warehouse, spark, sf_dir, "db.cls1")
    rd = STR.ChangelogMicroBatchReader(t, spark, from_snapshot_id=s0)
    got = []
    n_batches = 0
    for df, _off in rd.batches(max_snapshots_per_batch=1):
        got.extend(_rows(df))
        n_batches += 1
    assert n_batches == 3  # one per commit after s0
    want = _rows(t.changelog(from_snapshot_id=s0))
    assert sorted(got) == want
    assert rd.next_batch() is None  # caught up


def test_changelog_stream_checkpoint_resume(warehouse, spark, sf_dir,
                                            tmp_path):
    t, base, s0 = _build(warehouse, spark, sf_dir, "db.cls2")
    ckpt = str(tmp_path / "ck")
    rd = STR.ChangelogMicroBatchReader(t, spark, checkpoint_dir=ckpt,
                                       from_snapshot_id=s0)
    df1, off1 = rd.next_batch(max_snapshots_per_batch=1)
    first = _rows(df1)
    # a NEW reader on the same checkpoint resumes after the first commit
    rd2 = STR.ChangelogMicroBatchReader(t, spark, checkpoint_dir=ckpt)
    assert rd2.offset == off1
    rest = []
    for df, _off in rd2.batches():
        rest.extend(_rows(df))
    assert sorted(first + rest) == _rows(t.changelog(from_snapshot_id=s0))


def test_changelog_stream_update_images(warehouse, spark, sf_dir):
    t, base, s0 = _build(warehouse, spark, sf_dir, "db.cls3")
    rd = STR.ChangelogMicroBatchReader(t, spark, from_snapshot_id=s0,
                                       update_images=True,
                                       identifier_cols=["o_orderkey"])
    types = set()
    for df, _off in rd.batches(max_snapshots_per_batch=1):
        types |= {r["_change_type"] for r in
                  df.select("_change_type").distinct().collect()}
    assert types == {"update_preimage", "update_postimage",
                     "delete", "insert"}


def test_changelog_stream_expired_offset_raises(warehouse, spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    base = orders.limit(30)
    t = warehouse.create_table("db.cls4", Schema.from_spark(base.schema))
    t.append(base)
    s0 = t.metadata.current_snapshot_id
    t.append(base.limit(5))
    t.append(base.limit(5))
    t.expire_snapshots(retain_last=1)
    rd = STR.ChangelogMicroBatchReader(t, spark, from_snapshot_id=s0)
    with pytest.raises(ValueError, match="no longer in the table's"):
        rd.next_batch()


def test_cdc_replication_changelog_to_upsert_mor(warehouse, spark, sf_dir):
    """The round-trip the two round-6 streaming pieces exist for:
    stream table A's changelog WITH update images and apply each batch
    to table B through the upsert-MoR sink — B must converge to A
    after every batch, without B ever being read by the writer."""
    t, base, s0 = _build(warehouse, spark, sf_dir, "db.cls_src")
    dst = warehouse.create_table("db.cls_dst", Schema.from_spark(base.schema))
    dst.append(base)  # same starting state as A at s0

    rd = STR.ChangelogMicroBatchReader(t, spark, from_snapshot_id=s0,
                                       update_images=True,
                                       identifier_cols=["o_orderkey"])
    cols = [f.name for f in base.schema.fields]
    # epoch ids must be MONOTONE per query (snapshot ids are random) —
    # number the batches like foreachBatch numbers its epochs
    for ep, (df, _off) in enumerate(rd.batches(max_snapshots_per_batch=1)):
        batch = (df.filter(F.col("_change_type") != "update_preimage")
                 .withColumn("op",
                             F.when(F.col("_change_type") == "delete",
                                    F.lit("D")).otherwise(F.lit("U")))
                 .select(*cols, "op"))
        STR.upsert_mor_exactly_once(dst, batch, epoch_id=ep,
                                    on=["o_orderkey"], op_col="op")
    a = sorted(tuple(r) for r in t.to_df().select(*cols).collect())
    b = sorted(tuple(r) for r in dst.to_df().select(*cols).collect())
    assert a == b and len(a) > 0


def test_changelog_net_changes(warehouse, spark, sf_dir):
    """net_changes collapses a multi-commit range to net row effect:
    insert-then-delete vanishes, delete-then-reinsert of identical
    values vanishes, a surviving insert/delete keeps its LAST change's
    ordinal, and the plain changelog is unaffected."""
    df = spark.range(0, 20).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("v"))
    t = warehouse.create_table("db.netc", Schema.from_spark(df.schema))
    t.append(df)
    s0 = t.metadata.current_snapshot_id
    # commit 1: insert 10 new rows (k in [100,110))
    extra = spark.range(100, 110).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("v"))
    t.append(extra)
    # commit 2: delete half of them (inserted-then-deleted → net zero)
    # plus 5 pre-range rows (net delete)
    t.delete_where("k >= 105 OR k < 5")
    # commit 3: re-insert 2 of the pre-range deleted rows with IDENTICAL
    # values (delete-then-reinsert → net zero)
    t.append(df.filter("k < 2"))

    net = {(r["k"], r["_change_type"], r["_change_ordinal"])
           for r in t.changelog(from_snapshot_id=s0,
                                net_changes=True).collect()}
    # survivors: k in [100,105) net inserts (ordinal of LAST change = 0,
    # their only change); k in [2,5) net deletes (ordinal 1)
    assert net == ({(k, "insert", 0) for k in range(100, 105)}
                   | {(k, "delete", 1) for k in range(2, 5)}), net

    # plain changelog still shows the churn
    plain = t.changelog(from_snapshot_id=s0)
    assert plain.count() == 10 + 10 + 2  # inserts+deletes+reinserts
    # and the stream honors the flag (single batch over the range)
    rd = STR.ChangelogMicroBatchReader(t, spark, from_snapshot_id=s0,
                                       net_changes=True)
    df_all, _off = rd.next_batch(max_snapshots_per_batch=10)
    got = {(r["k"], r["_change_type"]) for r in df_all.collect()}
    assert got == {(k, "insert") for k in range(100, 105)} \
        | {(k, "delete") for k in range(2, 5)}


def test_changelog_net_changes_multiplicity(warehouse, spark, sf_dir):
    """Duplicate full rows net by MULTIPLICITY: inserting the same row
    twice and deleting one copy nets to one insert."""
    df = spark.createDataFrame([(1, "a")], "k int, s string")
    t = warehouse.create_table("db.netm", Schema.from_spark(df.schema))
    s0 = t.metadata.current_snapshot_id
    t.append(df)
    t.append(df)  # second identical copy
    net = t.changelog(net_changes=True).collect()
    assert [(r["k"], r["_change_type"]) for r in net] == \
        [(1, "insert"), (1, "insert")]


def test_changelog_net_changes_rejects_update_images(warehouse, spark,
                                                     sf_dir):
    df = spark.createDataFrame([(1, "a")], "k int, s string")
    t = warehouse.create_table("db.netr", Schema.from_spark(df.schema))
    t.append(df)
    with pytest.raises(ValueError, match="net_changes"):
        t.changelog_with_updates(identifier_cols=["k"], net_changes=True)
    with pytest.raises(ValueError, match="net_changes"):
        STR.ChangelogMicroBatchReader(t, spark, update_images=True,
                                      net_changes=True)


def test_changelog_survives_manifest_merge(warehouse, spark, sf_dir):
    """Columnar-diff pin: a fast-append that triggers manifest MERGING
    replaces several carried manifests with one combined manifest, so
    carried files change manifests while staying live.  The path-set
    diff must cancel them (they appear in BOTH side-unique manifest
    sets) and report only the genuinely appended rows — per commit and
    under net_changes."""
    t = warehouse.create_table(
        "db.clmm", "k long, v long",
        properties={"commit.manifest.min-count-to-merge": "3"})
    s0 = None
    for i in range(8):  # several merge waves
        df = spark.range(i * 10, i * 10 + 10).selectExpr(
            "id AS k", "id * 2 AS v")
        t.append(df)
        if i == 0:
            s0 = t.metadata.current_snapshot_id
    ch = t.changelog(from_snapshot_id=s0)
    rows = [(r["k"], r["_change_type"], r["_change_ordinal"])
            for r in ch.collect()]
    assert all(c == "insert" for _, c, _ in rows)
    assert sorted(k for k, _, _ in rows) == list(range(10, 80))
    # each commit's slice attributes to its own ordinal
    by_ord = {}
    for k, _c, o in rows:
        by_ord.setdefault(o, []).append(k)
    assert {o: sorted(ks) for o, ks in by_ord.items()} == {
        i - 1: list(range(i * 10, i * 10 + 10)) for i in range(1, 8)}
    net = t.changelog(from_snapshot_id=s0, net_changes=True)
    assert sorted(r["k"] for r in net.collect()) == list(range(10, 80))


def test_changelog_across_spec_evolution(warehouse, spark, sf_dir):
    """Spec evolution changes the partition struct's SHAPE between
    manifests; the columnar diff must unify layouts (and a CoW delete
    after the evolution rewrites files written under the old spec)."""
    df = spark.range(0, 40).selectExpr("id AS k", "id % 10 AS b",
                                       "id * 3 AS v")
    t = warehouse.create_table("db.clspec", Schema.from_spark(df.schema))
    t.append(df.filter("k < 20"))
    s0 = t.metadata.current_snapshot_id
    t.update_spec(["bucket(4, b)"])
    t.append(df.filter("k >= 20"))
    t.delete_where("k % 10 = 3")  # hits files under BOTH specs
    ch = t.changelog(from_snapshot_id=s0)
    got = {(r["k"], r["_change_type"]) for r in ch.collect()}
    want = {(k, "insert") for k in range(20, 40)} \
        | {(k, "delete") for k in range(0, 40) if k % 10 == 3}
    # k>=20 rows with k%10==3 were inserted then deleted in range:
    # both events show (plain changelog keeps churn)
    assert got == want, got ^ want
    net = {(r["k"], r["_change_type"])
           for r in t.changelog(from_snapshot_id=s0,
                                net_changes=True).collect()}
    assert net == {(k, "insert") for k in range(20, 40) if k % 10 != 3} \
        | {(k, "delete") for k in range(0, 20) if k % 10 == 3}


def test_net_changes_attribution_by_kind(warehouse, spark, sf_dir):
    """Net deletes attribute to the row's LAST 'delete' event and net
    inserts to its LAST 'insert' event — NOT to the last change of
    either kind.  Mixed multiplicity pins it: 2 copies deleted, 1
    re-inserted later nets to one delete that must carry the DELETE
    commit's ordinal, not the re-insert's."""
    df = spark.createDataFrame([(1, "a"), (1, "a")], "k int, s string")
    t = warehouse.create_table("db.netattr", Schema.from_spark(df.schema))
    t.append(df)  # two identical copies, before the range
    s0 = t.metadata.current_snapshot_id
    t.delete_where("k = 1")                    # ordinal 0: -2
    t.append(df.limit(1))                      # ordinal 1: +1
    net = t.changelog(from_snapshot_id=s0, net_changes=True).collect()
    assert [(r["k"], r["_change_type"], r["_change_ordinal"])
            for r in net] == [(1, "delete", 0)], net

    # mirror case: 1 copy deleted, 2 re-inserted later → one net insert
    # carrying the INSERT commit's ordinal
    t2 = warehouse.create_table("db.netattr2", Schema.from_spark(df.schema))
    t2.append(df.limit(1))
    s0 = t2.metadata.current_snapshot_id
    t2.delete_where("k = 1")                   # ordinal 0: -1
    t2.append(df)                              # ordinal 1: +2
    net = t2.changelog(from_snapshot_id=s0, net_changes=True).collect()
    assert [(r["k"], r["_change_type"], r["_change_ordinal"])
            for r in net] == [(1, "insert", 1)], net


def test_changelog_eq_delete_bounds_scoping(warehouse, spark, sf_dir):
    """An eq-delete commit marks as affected only the carried data files
    whose value bounds OVERLAP the delete file's key range (columnar
    mirror of scope_deletes_for_file) — one small eq commit must not
    drag every earlier carried file through both sides of the diff."""
    from incubator_iceberg_spark import changelog as CL

    t = warehouse.create_table("db.cleqb", "k long, v long")
    t.append(spark.range(0, 100).selectExpr("id AS k", "id AS v"))
    t.append(spark.range(1000, 1100).selectExpr("id AS k", "id AS v"))
    keys = spark.createDataFrame([(1005,)], "k long")
    t.add_equality_deletes(keys, ["k"])

    md = t.metadata
    snap = md.current_snapshot()
    parent = md.snapshot_by_id(snap.parent_id)
    ch = CL._snapshot_changes(md, md.schema(), snap, parent, {})
    assert ch is not None
    now_entries, before_entries, _dn, _db = ch
    # only the k∈[1000,1100) file overlaps the delete's bounds
    assert len(before_entries) == 1, [e["file_path"] for e in before_entries]
    assert before_entries[0]["lower_bounds"]["k"] >= 1000
    # and the changelog output is still exactly the one deleted row
    rows = t.changelog(from_snapshot_id=parent.snapshot_id).collect()
    assert [(r["k"], r["_change_type"]) for r in rows] == [(1005, "delete")]


def test_changelog_shared_manifest_read_once(warehouse, spark, sf_dir,
                                             monkeypatch):
    """A K-MoR-commit changelog range over shared manifests reads each
    manifest's slices ONCE (tab_cache caches BOTH data and delete
    slices) — each path loads at most twice across the range: once as a
    side-unique manifest when its commit introduced it, once as a
    shared manifest thereafter."""
    from collections import Counter
    from incubator_iceberg_spark import changelog as CL

    t = warehouse.create_table("db.clro", "k long, v long")
    t.append(spark.range(0, 400).selectExpr("id AS k", "id AS v"))
    s0 = t.metadata.current_snapshot_id
    for m in range(4):  # K=4 MoR delete commits against the same file
        t.delete_where(f"k % 10 = {m}", mode="merge-on-read")

    calls = Counter()
    real = CL._live_arrow

    def counting(paths):
        for p in paths:
            calls[p] += 1
        return real(paths)

    monkeypatch.setattr(CL, "_live_arrow", counting)
    got = t.changelog(from_snapshot_id=s0)
    n = got.count()
    assert n == 4 * 40  # 4 commits x 40 deleted rows each
    assert calls and max(calls.values()) <= 2, calls
