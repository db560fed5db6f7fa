import pytest

from incubator_iceberg_spark.functions import scd
from incubator_iceberg_spark.schema import Schema


def _dim(warehouse, spark):
    t = warehouse.create_table(
        "db.dim", "k long, seg string, score long, "
                  "effective_from long, effective_to long, is_current boolean")
    rows = [(1, "A", 10), (2, "B", 20), (3, "C", None)]
    df = spark.createDataFrame(
        [(k, s, v, 0, None, True) for k, s, v in rows],
        t.to_df().schema)
    t.append(df)
    return t


def _changes(spark, rows, ts):
    return spark.createDataFrame([(k, s, v, ts) for k, s, v in rows],
                                 "k long, seg string, score long, ts long")


def test_scd2_close_insert_new_and_noop(warehouse, spark):
    t = _dim(warehouse, spark)
    batch = _changes(spark, [
        (1, "A", 11),      # score change -> close + insert
        (2, "B", 20),      # identical -> no-op
        (3, "C", 5),       # NULL -> value is a change
        (9, "Z", 99),      # new key -> insert only
    ], ts=100)
    scd.scd2_apply(t, batch, ["k"], ["seg", "score"], "ts")
    got = {(r["k"], r["effective_from"]): r
           for r in t.to_df().collect()}
    assert len(got) == 6  # 3 original + 2 new versions + 1 new key
    assert got[(1, 0)]["effective_to"] == 100 and not got[(1, 0)]["is_current"]
    assert got[(1, 100)]["score"] == 11 and got[(1, 100)]["is_current"]
    assert got[(2, 0)]["effective_to"] is None and got[(2, 0)]["is_current"]
    assert got[(3, 100)]["score"] == 5
    assert got[(9, 100)]["seg"] == "Z" and got[(9, 100)]["is_current"]
    # exactly one current row per key
    cur = t.to_df().filter("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_second_batch_closes_first_version(warehouse, spark):
    t = _dim(warehouse, spark)
    scd.scd2_apply(t, _changes(spark, [(1, "A", 11)], 100),
                   ["k"], ["seg", "score"], "ts")
    scd.scd2_apply(t, _changes(spark, [(1, "A2", 12)], 200),
                   ["k"], ["seg", "score"], "ts")
    rows = sorted(t.to_df().filter("k = 1").collect(),
                  key=lambda r: r["effective_from"])
    assert [(r["effective_from"], r["effective_to"], r["is_current"])
            for r in rows] == [(0, 100, False), (100, 200, False),
                               (200, None, True)]


def test_scd2_rejects_duplicate_batch_keys(warehouse, spark):
    t = _dim(warehouse, spark)
    batch = _changes(spark, [(1, "A", 11), (1, "A", 12)], 100)
    with pytest.raises(ValueError, match="multiple rows"):
        scd.scd2_apply(t, batch, ["k"], ["seg", "score"], "ts")


def test_scd2_null_to_null_is_noop(warehouse, spark):
    t = _dim(warehouse, spark)
    before = t.metadata.current_snapshot_id
    scd.scd2_apply(t, _changes(spark, [(3, "C", None)], 100),
                   ["k"], ["seg", "score"], "ts")
    # nothing acted: merge commits no rewrite (snapshot may stay put)
    assert t.to_df().count() == 3
    assert t.to_df().filter("k = 3 and is_current").first()["score"] is None

def test_scd2_rejects_null_batch_keys(warehouse, spark):
    t = _dim(warehouse, spark)
    batch = _changes(spark, [(None, "A", 11)], 100)
    with pytest.raises(ValueError, match="NULL business key"):
        scd.scd2_apply(t, batch, ["k"], ["seg", "score"], "ts")


def test_scd2_null_keyed_current_row_never_matches_inserts(warehouse, spark):
    # A NULL-keyed current row already in the dimension must not match the
    # staged INSERT rows (which carry NULL merge keys): NULL <=> NULL is
    # TRUE, so without the IS NOT NULL guard in the MERGE ON, every insert
    # would fan out against it with the cardinality guard off.
    t = _dim(warehouse, spark)
    df = spark.createDataFrame([(None, "X", 1, 0, None, True)],
                               t.to_df().schema)
    t.append(df)
    batch = _changes(spark, [(1, "A", 11), (9, "Z", 99)], 100)
    scd.scd2_apply(t, batch, ["k"], ["seg", "score"], "ts")
    rows = t.to_df().collect()
    # 4 original + 1 new version of k=1 + 1 new key = 6; no duplicates
    assert len(rows) == 6
    nul = [r for r in rows if r["k"] is None]
    assert len(nul) == 1 and nul[0]["is_current"] \
        and nul[0]["effective_to"] is None
    got = {(r["k"], r["effective_from"]): r for r in rows if r["k"] is not None}
    assert got[(1, 0)]["effective_to"] == 100 and not got[(1, 0)]["is_current"]
    assert got[(1, 100)]["score"] == 11 and got[(1, 100)]["is_current"]
    assert got[(9, 100)]["is_current"]


def _changes_op(spark, rows, ts):
    return spark.createDataFrame(
        [(k, s, v, ts, op) for k, s, v, op in rows],
        "k long, seg string, score long, ts long, op string")


def test_scd2_source_deletes_close_without_insert(warehouse, spark):
    t = _dim(warehouse, spark)
    batch = _changes_op(spark, [
        (1, None, None, "D"),   # delete existing -> close only
        (2, "B2", 21, "U"),     # update -> close + insert
        (7, None, None, "D"),   # delete absent key -> no-op
        (9, "Z", 99, "U"),      # new key -> insert
    ], ts=100)
    scd.scd2_apply(t, batch, ["k"], ["seg", "score"], "ts", op_col="op")
    got = {(r["k"], r["effective_from"]): r for r in t.to_df().collect()}
    assert len(got) == 5  # 3 original + v2 of k=2 + new k=9
    assert got[(1, 0)]["effective_to"] == 100 and not got[(1, 0)]["is_current"]
    assert (2, 100) in got and got[(2, 100)]["is_current"]
    assert (9, 100) in got
    assert t.to_df().filter("k = 1 AND is_current").count() == 0


def test_scd2_deleted_key_can_reappear(warehouse, spark):
    t = _dim(warehouse, spark)
    scd.scd2_apply(t, _changes_op(spark, [(1, None, None, "D")], 100),
                   ["k"], ["seg", "score"], "ts", op_col="op")
    scd.scd2_apply(t, _changes_op(spark, [(1, "BACK", 50, "U")], 200),
                   ["k"], ["seg", "score"], "ts", op_col="op")
    rows = sorted(t.to_df().filter("k = 1").collect(),
                  key=lambda r: r["effective_from"])
    assert [(r["effective_from"], r["effective_to"], r["is_current"])
            for r in rows] == [(0, 100, False), (200, None, True)]


def test_scd2_null_op_is_upsert_not_dropped(warehouse, spark):
    """A change row with op = NULL (CDC insert/snapshot rows often omit
    op) must act as an upsert — a plain == would make the acting filter
    NULL and silently drop the row."""
    t = _dim(warehouse, spark)
    batch = _changes_op(spark, [
        (1, "A1", 11, None),   # NULL op on existing key -> close + insert
        (9, "Z", 99, None),    # NULL op on new key -> insert
        (2, None, None, "D"),  # real delete still closes
    ], ts=100)
    scd.scd2_apply(t, batch, ["k"], ["seg", "score"], "ts", op_col="op")
    got = {(r["k"], r["effective_from"]): r for r in t.to_df().collect()}
    assert (1, 100) in got and got[(1, 100)]["seg"] == "A1"
    assert got[(1, 0)]["effective_to"] == 100 and not got[(1, 0)]["is_current"]
    assert (9, 100) in got and got[(9, 100)]["is_current"]
    assert t.to_df().filter("k = 2 AND is_current").count() == 0


def test_scd2_guard_classification_uses_sentinel_not_prose(warehouse,
                                                           spark):
    """r11 advice #3: the except block re-classifies in-job guard trips
    by a unique sentinel token, not prose substring — wrapped/truncated
    exception text keeps the token, and unrelated failures whose message
    merely embeds the prose are NOT misreported as guard trips."""
    assert scd._DUP_KEY_SENTINEL in scd._DUP_KEY_MSG
    assert scd._NULL_KEY_SENTINEL in scd._NULL_KEY_MSG
    assert scd._DUP_KEY_SENTINEL != scd._NULL_KEY_SENTINEL
    # sentinel-bearing errors still surface as the pinned ValueError
    t = _dim(warehouse, spark)
    with pytest.raises(ValueError, match="multiple rows"):
        scd.scd2_apply(t, _changes(spark, [(1, "A", 1), (1, "B", 2)], 100),
                       ["k"], ["seg", "score"], "ts")
    # an unrelated failure embedding only the PROSE must pass through
    # unconverted (it lacks the sentinel)
    import re as _re
    prose = _re.sub(r"^\[[^\]]*\] ", "", scd._DUP_KEY_MSG)
    assert scd._DUP_KEY_SENTINEL not in prose

    class Boom(RuntimeError):
        pass

    err = Boom(f"stage failed while logging: {prose}")
    assert scd._DUP_KEY_SENTINEL not in str(err)
