"""Tier 3: catalog-level branches/tags (NessieCatalog analog) and the
CachingCatalog wrapper."""

import threading

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark.schema import Schema


@pytest.fixture()
def ncat(tmp_path, spark):
    from incubator_iceberg_spark.catalog_branches import NessieLiteCatalog

    return NessieLiteCatalog(str(tmp_path / "cat.db"), str(tmp_path / "wh"),
                             spark)


def test_branch_isolation_and_fast_forward_merge(ncat, orders, spark):
    t = ncat.create_table("db.orders", Schema.from_spark(orders.schema))
    t.append(orders.filter("o_orderkey % 2 = 0"))
    n_main = t.to_df().count()

    etl = ncat.create_branch("etl")
    te = etl.load_table("db.orders")
    te.append(orders.filter("o_orderkey % 2 != 0"))

    # main unchanged until merge
    assert ncat.load_table("db.orders").to_df().count() == n_main
    assert etl.load_table("db.orders").to_df().count() == orders.count()

    ncat.merge("etl")  # fast-forward: main didn't move
    assert ncat.load_table("db.orders").to_df().count() == orders.count()
    log = ncat.log()
    assert log[0]["hash"] == etl.ref_hash()


def test_merge_disjoint_tables_three_way(ncat, orders, spark):
    a = orders.limit(100)
    ncat.create_table("db.base", Schema.from_spark(a.schema)).append(a)
    b1 = ncat.create_branch("b1")
    b1.create_table("db.t1", Schema.from_spark(a.schema)).append(a)
    # main moves too (different table) → three-way, not fast-forward
    ncat.create_table("db.t2", Schema.from_spark(a.schema)).append(a)
    h = ncat.merge("b1")
    assert set(ncat.list_tables()) == {"db.base", "db.t1", "db.t2"}
    assert ncat.log()[0]["hash"] == h
    assert ncat.log()[0]["merge_parent"] is not None


def test_merge_conflict_same_table(ncat, orders, spark):
    from incubator_iceberg_spark.catalog_branches import MergeConflictError

    t = ncat.create_table("db.c", Schema.from_spark(orders.schema))
    t.append(orders.limit(10))
    br = ncat.create_branch("risky")
    br.load_table("db.c").append(orders.limit(5))
    ncat.load_table("db.c").append(orders.limit(3))  # main moves same table
    with pytest.raises(MergeConflictError):
        ncat.merge("risky")


def test_tag_is_immutable_and_pins_state(ncat, orders, spark):
    from incubator_iceberg_spark.metadata import CommitFailedException

    t = ncat.create_table("db.tg", Schema.from_spark(orders.schema))
    t.append(orders.limit(10))
    tag = ncat.create_tag("v1")
    t.append(orders.limit(20))  # main advances
    assert ncat.load_table("db.tg").to_df().count() == 30
    assert tag.load_table("db.tg").to_df().count() == 10  # tag pinned
    with pytest.raises((CommitFailedException, ValueError)):
        tag.load_table("db.tg").append(orders.limit(1))


def test_drop_on_branch_does_not_touch_other_refs(ncat, orders, spark):
    t = ncat.create_table("db.d", Schema.from_spark(orders.schema))
    t.append(orders.limit(10))
    keep = ncat.create_branch("keep")
    assert ncat.drop_table("db.d")
    assert not ncat.table_exists("db.d")
    assert keep.table_exists("db.d")
    assert keep.load_table("db.d").to_df().count() == 10


def test_concurrent_appends_one_branch_retry(ncat, orders, spark):
    t = ncat.create_table("db.cc", Schema.from_spark(orders.schema))
    halves = [orders.filter(f"o_orderkey % 2 = {i}") for i in (0, 1)]
    errs = []

    def run(i):
        try:
            ncat.load_table("db.cc").append(halves[i])
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in (0, 1)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert ncat.load_table("db.cc").to_df().count() == orders.count()


def test_caching_catalog_reuses_and_invalidates(warehouse, orders, spark):
    from incubator_iceberg_spark.caching_catalog import CachingCatalog

    cat = CachingCatalog(warehouse)
    t = cat.create_table("db.cached", Schema.from_spark(orders.schema))
    t.append(orders.limit(10))
    assert cat.load_table("db.cached") is t          # same instance
    assert cat.load_table("db.cached") is t
    cat.invalidate("db.cached")
    t2 = cat.load_table("db.cached")
    assert t2 is not t
    assert t2.to_df().count() == 10
    cat.drop_table("db.cached")
    from incubator_iceberg_spark.table import NoSuchTableError
    with pytest.raises(NoSuchTableError):
        cat.load_table("db.cached")


def test_caching_catalog_expiration_sees_external_commit(warehouse, orders, spark):
    """With an expiration interval, an expired cached handle is refreshed
    on hit and picks up commits made through another handle (the reference
    CACHE_EXPIRATION_INTERVAL_MS behavior); without one it stays stale."""
    from incubator_iceberg_spark.caching_catalog import CachingCatalog

    stale = CachingCatalog(warehouse)
    fresh = CachingCatalog(warehouse, expiration_interval_s=0.0)
    warehouse.create_table("db.ttl", Schema.from_spark(orders.schema))
    t_stale = stale.load_table("db.ttl")
    t_fresh = fresh.load_table("db.ttl")
    assert t_stale.to_df().count() == 0
    # external commit via a separate handle
    warehouse.load_table("db.ttl").append(orders.limit(10))
    assert stale.load_table("db.ttl").metadata.current_snapshot() is None
    assert fresh.load_table("db.ttl") is t_fresh  # same handle, refreshed
    assert fresh.load_table("db.ttl").to_df().count() == 10


def test_caching_catalog_lru_bound(warehouse, orders, spark):
    from incubator_iceberg_spark.caching_catalog import CachingCatalog

    cat = CachingCatalog(warehouse, max_size=2)
    for i in range(3):
        cat.create_table(f"db.lru{i}", Schema.from_spark(orders.schema))
    assert len(cat._cache) == 2  # oldest evicted


def test_detached_commit_read(ncat, orders, spark):
    """at_hash pins a catalog commit: reads see that state, writes fail."""
    from incubator_iceberg_spark.metadata import CommitFailedException

    t = ncat.create_table("db.det", Schema.from_spark(orders.schema))
    t.append(orders.limit(10))
    h1 = ncat.ref_hash()
    t.append(orders.limit(30))
    old = ncat.at_hash(h1)
    assert old.load_table("db.det").to_df().count() == 10
    assert ncat.load_table("db.det").to_df().count() == 40
    with pytest.raises((CommitFailedException, ValueError)):
        old.load_table("db.det").append(orders.limit(1))
    with pytest.raises(ValueError):
        ncat.at_hash("nope")


def test_remerge_long_lived_branch_no_spurious_conflict(ncat, orders, spark):
    """After a three-way merge, merging the SAME branch again (with new
    commits) must not conflict: the merge base follows merge_parent
    edges, not just first parents."""
    a = orders.limit(50)
    ncat.create_table("db.x", Schema.from_spark(a.schema)).append(a)
    etl = ncat.create_branch("lived")
    etl.create_table("db.y", Schema.from_spark(a.schema)).append(a)
    ncat.create_table("db.z", Schema.from_spark(a.schema)).append(a)
    ncat.merge("lived")  # three-way (both sides moved, different tables)
    # branch keeps living: another change to db.y on the branch only
    etl.load_table("db.y").append(a)
    h = ncat.merge("lived")  # re-merge must NOT conflict
    assert ncat.load_table("db.y").to_df().count() == 100
    assert ncat.log()[0]["hash"] == h


def test_catalog_transaction_multi_table_atomic(ncat, orders, spark):
    """Two tables move in ONE catalog commit: neither change is visible
    before commit; both after; the commit log gains exactly one entry."""
    a = orders.limit(60)
    ncat.create_table("db.t_a", Schema.from_spark(a.schema)).append(a)
    ncat.create_table("db.t_b", Schema.from_spark(a.schema))
    log_before = len(ncat.log())
    with ncat.transaction() as txn:
        txn.table("db.t_a").append(a)            # 60 → 120
        txn.table("db.t_b").append(a.limit(10))  # 0 → 10
        # staged but NOT visible outside the txn yet
        assert ncat.load_table("db.t_a").to_df().count() == 60
        assert ncat.load_table("db.t_b").to_df().count() == 0
    assert ncat.load_table("db.t_a").to_df().count() == 120
    assert ncat.load_table("db.t_b").to_df().count() == 10
    assert len(ncat.log()) == log_before + 1


def test_catalog_transaction_conflict_aborts_everything(ncat, orders, spark):
    from incubator_iceberg_spark.metadata import CommitFailedException

    a = orders.limit(40)
    ncat.create_table("db.c_a", Schema.from_spark(a.schema)).append(a)
    ncat.create_table("db.c_b", Schema.from_spark(a.schema)).append(a)
    txn = ncat.transaction()
    txn.table("db.c_a").append(a)
    txn.table("db.c_b").append(a)
    # concurrent writer moves one touched table before the txn commits
    ncat.load_table("db.c_a").append(a.limit(5))
    with pytest.raises(CommitFailedException):
        txn.commit()
    # NOTHING from the transaction is visible — only the concurrent append
    assert ncat.load_table("db.c_a").to_df().count() == 45
    assert ncat.load_table("db.c_b").to_df().count() == 40


def test_catalog_transaction_create_and_write(ncat, orders, spark):
    a = orders.limit(25)
    with ncat.transaction() as txn:
        t = txn.create_table("db.fresh", Schema.from_spark(a.schema))
        t.append(a)
        assert not ncat.table_exists("db.fresh")
    assert ncat.load_table("db.fresh").to_df().count() == 25


def test_catalog_transaction_abandoned_on_error(ncat, orders, spark):
    a = orders.limit(10)
    ncat.create_table("db.ab", Schema.from_spark(a.schema))
    with pytest.raises(RuntimeError):
        with ncat.transaction() as txn:
            txn.table("db.ab").append(a)
            raise RuntimeError("boom")
    assert ncat.load_table("db.ab").to_df().count() == 0


def test_merge_behind_branch_is_noop(ncat, orders, spark):
    """Merging a branch strictly behind the target returns the target hash
    unchanged — no no-op merge commit (nessie behavior)."""
    t = ncat.create_table("db.nb", Schema.from_spark(orders.schema))
    t.append(orders.limit(10))
    old = ncat.create_branch("old")
    ncat.load_table("db.nb").append(orders.limit(5))  # main advances
    before = ncat.ref_hash()
    n_log = len(ncat.log())
    assert ncat.merge("old") == before
    assert ncat.ref_hash() == before
    assert len(ncat.log()) == n_log


def test_merge_crisscross_uses_closest_ancestor(ncat, orders, spark):
    """Criss-cross history: after main and side have merged each other's
    disjoint work, further disjoint work on side must merge cleanly — a
    BFS-nearest base can pick an ancestor older than the LCA and raise a
    spurious conflict."""
    s = Schema.from_spark(orders.schema)
    ncat.create_table("db.x", s).append(orders.limit(5))
    side = ncat.create_branch("side")
    # diverge: disjoint tables on each ref
    side.create_table("db.s1", s).append(orders.limit(5))
    ncat.create_table("db.m1", s).append(orders.limit(5))
    # cross-merge both ways → criss-cross ancestry
    ncat.merge("side")
    side.merge("main", to_ref="side")
    # further disjoint work on side, then merge again — must NOT conflict
    side.create_table("db.s2", s).append(orders.limit(5))
    ncat.merge("side")
    assert {"db.x", "db.s1", "db.m1", "db.s2"} <= set(ncat.list_tables())


def test_catalog_survives_warehouse_relocation(tmp_path, orders, spark):
    """Catalog pointers are stored relative to the warehouse: moving the
    warehouse + db file keeps every table's metadata resolvable."""
    import shutil

    from incubator_iceberg_spark.catalog_branches import NessieLiteCatalog

    src = tmp_path / "site_a"
    src.mkdir()
    cat = NessieLiteCatalog(str(src / "cat.db"), str(src / "wh"), spark)
    t = cat.create_table("db.mv", Schema.from_spark(orders.schema))
    t.append(orders.limit(10))
    v = t.ops.current_version()

    dst = tmp_path / "site_b"
    shutil.move(str(src), str(dst))
    cat2 = NessieLiteCatalog(str(dst / "cat.db"), str(dst / "wh"), spark)
    t2 = cat2.load_table("db.mv")  # refresh() resolves via relative pointer
    assert t2.ops.current_version() == v
    assert [f.name for f in t2.schema().fields] == \
        [f.name for f in Schema.from_spark(orders.schema).fields]
