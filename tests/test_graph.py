"""Graph analytics: exact-integer PageRank + degree-oriented triangles.

Hand-computed fixtures pin the integer contract; a randomized graph is
cross-checked against the DuckDB oracle mirror (the same check the
driver runs) and, for triangles, against a naive all-orientation count.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark.functions import graph as G


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_two_node_cycle_hand_values(spark):
    # a <-> b: each node's inflow every round is the other's full rank.
    # r0 = 1_000_000 each; r1 = (15e6 + 85 * 1_000_000) // 100 = 1_000_000
    # — the symmetric fixed point holds exactly in integer arithmetic.
    out = G.pagerank(_edges(spark, [(1, 2), (2, 1)]), iters=3)
    got = {r["node"]: r["rank_micro"] for r in out.collect()}
    assert got == {1: 1_000_000, 2: 1_000_000}


def test_pagerank_star_hand_values(spark):
    # hub 1 -> leaves 2,3; leaves -> hub.  Hand-replay of the recurrence:
    # r0: all 1_000_000
    # r1(hub)  = (15e6 + 85*(1e6 + 1e6))//100   = 1_850_000
    # r1(leaf) = (15e6 + 85*(1e6 div 2))//100   =   575_000
    # r2(hub)  = (15e6 + 85*(575_000*2))//100   = 1_127_500
    # r2(leaf) = (15e6 + 85*(1_850_000 div 2))//100 = 936_250
    out = G.pagerank(_edges(spark, [(1, 2), (1, 3), (2, 1), (3, 1)]),
                     iters=2)
    got = {r["node"]: r["rank_micro"] for r in out.collect()}
    assert got == {1: 1_127_500, 2: 936_250, 3: 936_250}


def test_pagerank_dangling_and_sourceless_nodes(spark):
    # 1 -> 2: node 2 has no out-edges (mass leaks, deterministic
    # contract); node 1 has no in-edges (gets only the base term).
    out = G.pagerank(_edges(spark, [(1, 2)]), iters=1)
    got = {r["node"]: r["rank_micro"] for r in out.collect()}
    assert got[1] == 150_000                       # (15e6 + 0) // 100
    assert got[2] == (15_000_000 + 85 * 1_000_000) // 100


def test_pagerank_duplicate_edges_collapse(spark):
    once = G.pagerank(_edges(spark, [(1, 2), (2, 1)]), iters=2).collect()
    dup = G.pagerank(_edges(spark, [(1, 2), (1, 2), (2, 1)]),
                     iters=2).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, dup))


def test_pagerank_matches_sql_oracle_random_graph(spark):
    # deterministic pseudo-random digraph, replayable in SQL
    edge_sql = """
        SELECT (i * 7919) % 37 AS src, (i * 104729 + 13) % 37 AS dst
        FROM range(0, 300) t(i)
    """
    edges = spark.range(0, 300).select(
        ((F.col("id") * 7919) % 37).alias("src"),
        ((F.col("id") * 104729 + 13) % 37).alias("dst"))
    got = {(r["node"], r["rank_micro"])
           for r in G.pagerank(edges, iters=4).collect()}
    want = {tuple(r) for r in
            duckdb.sql(G.pagerank_sql(edge_sql, iters=4)).fetchall()}
    assert got == want


def test_triangle_count_hand_graphs(spark):
    # K4 has 4 triangles; direction/self-loops/duplicates must not matter
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]
    assert G.triangle_count(_edges(spark, k4)).collect()[0][0] == 4
    path = [(1, 2), (2, 3), (3, 4)]
    assert G.triangle_count(_edges(spark, path)).collect()[0][0] == 0
    tri = [(1, 2), (2, 3), (3, 1), (1, 1), (2, 3), (3, 2)]
    assert G.triangle_count(_edges(spark, tri)).collect()[0][0] == 1


def test_triangle_count_matches_sql_oracle_random_graph(spark):
    # mixed moduli keep the edge stream aperiodic over the 250 rows
    edge_sql = """
        SELECT i % 17 AS src, (i * 31 + 5) % 23 AS dst
        FROM range(0, 250) t(i)
    """
    edges = spark.range(0, 250).select(
        (F.col("id") % 17).alias("src"),
        ((F.col("id") * 31 + 5) % 23).alias("dst"))
    got = G.triangle_count(edges).collect()[0][0]
    want = duckdb.sql(G.triangle_count_sql(edge_sql)).fetchone()[0]
    assert got == want > 0


def test_pagerank_rejects_bad_params(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        G.pagerank(e, iters=0)
    with pytest.raises(ValueError):
        G.pagerank(e, damping_pct=101)
