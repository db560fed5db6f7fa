"""Preconditions the driver-oracle soundness arguments lean on, recomputed
from the shipped testdata so a data refresh cannot silently invalidate an
oracle (the failure would otherwise surface only as an unexplained driver
hash mismatch).

No Spark needed — DuckDB over the raw parquet."""

import os

import duckdb
import pytest

TESTDATA = "/root/testdata"

# dedup_minhash_pairs / pipeline_clean_corpus oracles: the claim that LSH
# banding recall is TOTAL for jaccard >= 0.8 pairs rests on the corpus
# similarity gap — no pair of documents has exact 5-shingle jaccard inside
# (GAP_LO, GAP_HI).  The soundness-critical sub-region is [0.8, 0.92): a
# pair there would pass the oracle's exact-jaccard filter but could be
# missed by 8x4 banding (P(miss) rises from 4e-5 at 0.92 to 0.26 at 0.8);
# the cushion below 0.8 additionally keeps the threshold compare off any
# floating-point knife edge.  Measured gaps: (0.334, 0.92] at sf0.001,
# (0.309, 0.929) at sf0.01 — endpoints attainable, interior empty.
GAP_LO, GAP_HI = 0.35, 0.92


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_minhash_oracle_similarity_gap_holds(sf):
    path = os.path.join(TESTDATA, sf, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    con = duckdb.connect()
    rows = con.sql(f"""
        WITH sh AS (
          SELECT doc_id, list_distinct([substr(text, i, 5)
                          FOR i IN range(1, length(text) - 3)]) AS s
          FROM read_parquet('{path}') WHERE length(text) >= 5),
        ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        cand AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        sized AS (SELECT doc_id, len(s) AS n FROM sh)
        SELECT id_a, id_b,
               inter * 1.0 / (na.n + nb.n - inter) AS j
        FROM cand JOIN sized na ON na.doc_id = cand.id_a
                  JOIN sized nb ON nb.doc_id = cand.id_b
    """).fetchall()
    assert rows, f"{sf}: no candidate pairs at all — corpus shape changed"
    in_gap = [(a, b, j) for a, b, j in rows if GAP_LO < j < GAP_HI]
    assert not in_gap, (
        f"{sf}: similarity gap ({GAP_LO}, {GAP_HI}) closed — "
        f"minhash/pipeline oracle soundness argument is void; "
        f"offending pairs: {sorted(in_gap, key=lambda t: t[2])[:5]}")
