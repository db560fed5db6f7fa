"""Graph analytics in exact integer arithmetic: PageRank power iteration
and degree-oriented triangle counting.

Post-parity pipeline extensions (SURVEY.md §2.9a): link-graph signals are
a standard training-data curation input (page quality via PageRank over a
hyperlink/co-occurrence graph, community/spam structure via triangle
density).  Both operators follow the repo's exact-arithmetic contract
(see similarity.kmeans_assign_micro): every engine-order-ambiguous step
is pinned to int64, so a SQL oracle replays the whole computation
bit-for-bit — something floating-point PageRank can never promise.

Scale shape (100 TB):
- ``pagerank`` — the edge table (the big side) is joined to out-degrees
  ONCE and persisted; each power iteration then shuffles only the
  O(nodes) rank table into that cached adjacency, plus one
  map-side-combined groupBy for the inflow sums.  Lineage is truncated
  every ``checkpoint_every`` iterations (localCheckpoint) so plans stay
  bounded regardless of iteration count without paying a
  materialization job per iteration.
- ``triangle_count`` — edges are oriented from the (degree, id)-smaller
  endpoint to the larger one, the classic orientation that bounds every
  join fan-out by O(sqrt(m)) instead of the max raw degree; the count is
  orientation-invariant, so the SQL oracle may use the simpler a<b<c
  orientation and must agree exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

RANK_UNIT = 1_000_000  # rank 1.0 in micro-units


def pagerank(edges, src: str = "src", dst: str = "dst",
             iters: int = 3, damping_pct: int = 85,
             checkpoint_every: int = 4):
    """Exact-integer PageRank over a directed edge list.

    Contract (what the SQL oracle replays bit-for-bit):
    - duplicate edges collapse (``DISTINCT src, dst``); self-loops count
      like any other edge;
    - every node (appearing as src OR dst) starts at rank
      ``RANK_UNIT`` (micro-units of 1.0);
    - per iteration, node ``u`` with out-degree ``d`` sends
      ``r(u) div d`` (int64 floor division — ranks are non-negative) to
      each successor; nodes with NO out-edges send nothing (their mass
      leaks — the deterministic, SQL-replayable choice; the reference
      redistribution variants are floating-point and engine-ordered);
    - ``r'(v) = ((100 - damping_pct)·RANK_UNIT
                 + damping_pct·inflow(v)) div 100``.

    Returns (node, rank_micro) after ``iters`` iterations.

    Overflow: inflow(v) ≤ total mass ≤ n·10⁶; at n = 10¹⁰ nodes,
    ``85 · 10¹⁶ < 2⁶³`` — int64-safe at any realistic node count.
    """
    if iters < 1:
        raise ValueError("pagerank needs iters >= 1")
    if not (0 <= damping_pct <= 100):
        raise ValueError("damping_pct must be in [0, 100]")
    e = edges.select(F.col(src).alias("__src"),
                     F.col(dst).alias("__dst")).distinct()
    deg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("__d"))
    # big side shuffled once, reused every iteration
    adj = e.join(deg, "__src").persist()
    nodes = (e.select(F.col("__src").alias("node"))
             .union(e.select(F.col("__dst")))
             .distinct().persist())
    base = (100 - damping_pct) * RANK_UNIT
    ranks = nodes.withColumn("r", F.lit(RANK_UNIT).cast("long"))
    for i in range(int(iters)):
        contrib = (adj.join(ranks, adj["__src"] == ranks["node"])
                   .select(F.col("__dst").alias("node"),
                           F.expr("r div __d").alias("__c")))
        inflow = contrib.groupBy("node").agg(F.sum("__c").alias("__s"))
        ranks = (nodes.join(inflow, "node", "left")
                 .select("node",
                         ((F.lit(base).cast("long")
                           + F.lit(damping_pct).cast("long")
                           * F.coalesce(F.col("__s"), F.lit(0).cast("long")))
                          .cast("long"))
                         .alias("__t"))
                 .select("node", F.expr("__t div 100").alias("r")))
        # truncate lineage on a cadence, not per iteration: each eager
        # localCheckpoint is a full materialization JOB of the rank
        # table, and chaining a few iterations into one job removes
        # those round-trips while keeping the plan depth bounded at
        # checkpoint_every joins.  The LAST iteration always checkpoints
        # so the returned ranks don't recompute after adj/nodes
        # unpersist below.
        if (i + 1) % max(1, int(checkpoint_every)) == 0 or i == iters - 1:
            ranks = ranks.localCheckpoint()
    out = ranks.select("node", F.col("r").alias("rank_micro"))
    adj.unpersist()
    nodes.unpersist()
    return out


def pagerank_sql(edge_sql: str, iters: int = 3, damping_pct: int = 85) -> str:
    """ANSI/DuckDB mirror of :func:`pagerank` — the power iteration
    unrolled as one CTE pair per round.  ``edge_sql`` must yield columns
    (src, dst).  All divisions are on non-negative int64, so ``//``
    truncation equals the engine's ``div`` floor."""
    base = (100 - damping_pct) * RANK_UNIT
    parts = [f"e AS (SELECT DISTINCT src, dst FROM ({edge_sql}))",
             "deg AS (SELECT src, count(*) AS d FROM e GROUP BY src)",
             "nodes AS (SELECT DISTINCT src AS node FROM e"
             " UNION SELECT DISTINCT dst FROM e)",
             f"r0 AS (SELECT node, CAST({RANK_UNIT} AS BIGINT) AS r"
             " FROM nodes)"]
    for i in range(1, int(iters) + 1):
        parts.append(f"""r{i} AS (
  SELECT n.node,
         CAST(({base} + {damping_pct} * coalesce(f.s, 0)) // 100
              AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(p.r // deg.d) AS s
    FROM e JOIN r{i - 1} p ON p.node = e.src
           JOIN deg ON deg.src = e.src
    GROUP BY e.dst) f USING (node))""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT node, r AS rank_micro FROM r{int(iters)}")


def copurchase_edges(lineitem, order_mod: int = 1):
    """Directed co-purchase part graph: parts bought in the same order
    link both ways (the self-join emits both (a,b) and (b,a)).  Distinct
    pairs only; per-order fan-out is bounded by the order's line count
    squared (TPC-H: ≤ 7 lines/order), so the self-join is an equi-join
    with small bounded expansion, not an all-pairs blow-up.

    ``order_mod`` > 1 keeps only orders with ``l_orderkey % mod == 0`` —
    the deterministic analog of the support/sample sparsification real
    market-basket graphs apply before analysis (and what the driver
    queries use so their cost stays proportional to the suite)."""
    src = lineitem
    if order_mod > 1:
        src = src.filter(F.col("l_orderkey") % order_mod == 0)
    a = src.select(F.col("l_orderkey").alias("ok"),
                   F.col("l_partkey").alias("src"))
    b = src.select(F.col("l_orderkey").alias("ok"),
                   F.col("l_partkey").alias("dst"))
    return (a.join(b, "ok")
            .filter(F.col("src") != F.col("dst"))
            .select("src", "dst").distinct())


def copurchase_edge_sql(order_mod: int = 1) -> str:
    """SQL mirror of :func:`copurchase_edges`."""
    gate = (f"a.l_orderkey % {int(order_mod)} = 0 AND "
            if order_mod > 1 else "")
    return f"""
SELECT a.l_partkey AS src, b.l_partkey AS dst
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey
WHERE {gate}a.l_partkey <> b.l_partkey
"""


COPURCHASE_EDGE_SQL = copurchase_edge_sql()


def triangle_count(edges, src: str = "src", dst: str = "dst"):
    """Exact global triangle count of the UNDIRECTED simple graph under
    ``edges`` (direction and self-loops dropped, parallel edges
    collapsed).

    Degree orientation: every undirected edge {u, v} is kept once,
    oriented from the (degree, id)-lexicographically smaller endpoint to
    the larger.  Each triangle then has exactly one source node with two
    out-edges, so counting wedge closures counts each triangle exactly
    once — and out-degrees are bounded by O(sqrt(m)), which bounds the
    wedge join's fan-out on power-law graphs where the raw max degree
    would not be.  Returns a single-row DataFrame (n_triangles)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = (e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
           .filter(F.col("a") != F.col("b")).distinct())
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    # orient each undirected edge from (deg, id)-smaller to larger;
    # und holds both directions, so keeping the "<" side keeps each
    # undirected edge exactly once
    d1 = deg.select(F.col("a").alias("u"), F.col("d").alias("du"))
    d2 = deg.select(F.col("a").alias("v"), F.col("d").alias("dv"))
    orient = (und.select(F.col("a").alias("u"), F.col("b").alias("v"))
              .join(d1, "u").join(d2, "v")
              .filter((F.col("du") < F.col("dv"))
                      | ((F.col("du") == F.col("dv"))
                         & (F.col("u") < F.col("v"))))
              .select("u", "v").persist())
    w1 = orient.select(F.col("u").alias("x"), F.col("v").alias("y"))
    w2 = orient.select(F.col("u").alias("y"), F.col("v").alias("z"))
    w3 = orient.select(F.col("u").alias("x"), F.col("v").alias("z"))
    n = (w1.join(w2, "y").join(w3, ["x", "z"])
         .agg(F.count(F.lit(1)).alias("n_triangles")))
    out = n.localCheckpoint()
    orient.unpersist()
    return out


def triangle_count_sql(edge_sql: str) -> str:
    """SQL mirror of :func:`triangle_count`.  Uses the simpler a<b<c
    orientation — the count is orientation-invariant, so it must agree
    exactly with the engine's degree orientation."""
    return f"""WITH raw AS (SELECT src AS a, dst AS b FROM ({edge_sql})),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM raw WHERE a <> b
    UNION ALL SELECT b, a FROM raw WHERE a <> b)),
o AS (SELECT a AS u, b AS v FROM und WHERE a < b)
SELECT count(*) AS n_triangles
FROM o e1 JOIN o e2 ON e2.u = e1.v JOIN o e3
  ON e3.u = e1.u AND e3.v = e2.v"""


def copurchase_lift(lineitem, order_mod: int = 1, min_support: int = 2):
    """Market-basket association scores over the co-purchase pair space:
    for every unordered part pair bought together in ≥ ``min_support``
    orders, the support counts and both direction confidences in exact
    int64 micro units (conf(a→b) = n_co·1e6 div n_a — no float, no
    overflow: n_co ≤ n_a ≤ n_orders, so the product stays < 2⁶³ for any
    corpus below ~9·10¹² orders).  Lift derives downstream as
    conf(a→b)·N div n_b·1e6 if wanted — kept out of the row to stay
    int64-exact at every scale.

    Scale shape: one self-equi-join on order key (fan-out bounded by
    per-order line count), one pair-count aggregate, two broadcast-size
    per-part count joins.  ``min_support`` prunes the long tail before
    the count joins."""
    from pyspark.sql import functions as F

    src = lineitem
    if order_mod > 1:
        src = src.filter(F.col("l_orderkey") % order_mod == 0)
    po = (src.select(F.col("l_orderkey").alias("ok"),
                     F.col("l_partkey").alias("p")).distinct())
    per = po.groupBy("p").agg(F.count(F.lit(1)).alias("n_ord"))
    a = po.select("ok", F.col("p").alias("part_a"))
    b = po.select("ok", F.col("p").alias("part_b"))
    co = (a.join(b, "ok")
          .filter(F.col("part_a") < F.col("part_b"))
          .groupBy("part_a", "part_b")
          .agg(F.count(F.lit(1)).alias("n_co"))
          .filter(F.col("n_co") >= min_support))
    na = per.select(F.col("p").alias("part_a"), F.col("n_ord").alias("n_a"))
    nb = per.select(F.col("p").alias("part_b"), F.col("n_ord").alias("n_b"))
    return (co.join(na, "part_a").join(nb, "part_b")
            .select("part_a", "part_b", "n_a", "n_b", "n_co",
                    F.expr("(n_co * 1000000) div n_a").alias("conf_ab_micro"),
                    F.expr("(n_co * 1000000) div n_b").alias("conf_ba_micro")))


def copurchase_lift_sql(order_mod: int = 1, min_support: int = 2) -> str:
    """SQL mirror of :func:`copurchase_lift`."""
    gate = (f"WHERE l_orderkey % {int(order_mod)} = 0 "
            if order_mod > 1 else "")
    return f"""WITH po AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem {gate}),
per AS (SELECT p, count(*) AS n_ord FROM po GROUP BY p),
co AS (
  SELECT a.p AS part_a, b.p AS part_b, count(*) AS n_co
  FROM po a JOIN po b ON a.ok = b.ok AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= {int(min_support)})
SELECT co.part_a, co.part_b,
       pa.n_ord AS n_a, pb.n_ord AS n_b, co.n_co,
       CAST(co.n_co * 1000000 // pa.n_ord AS BIGINT) AS conf_ab_micro,
       CAST(co.n_co * 1000000 // pb.n_ord AS BIGINT) AS conf_ba_micro
FROM co JOIN per pa ON pa.p = co.part_a
        JOIN per pb ON pb.p = co.part_b"""
