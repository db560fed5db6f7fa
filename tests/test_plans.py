"""Tier 3: physical-plan regression guards — the properties BENCH_NOTES
audits by hand must hold structurally: filters reach the parquet scan,
projections prune the read schema, small join sides broadcast, and
aggregates run inside whole-stage codegen with a map-side partial."""

import pytest
from pyspark.sql import functions as F

from incubator_iceberg_spark.schema import Schema


def _final_plan(df) -> str:
    df.collect()  # resolve AQE so the final physical plan is visible
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def orders_table(spark, sf_dir, tmp_path_factory):
    from incubator_iceberg_spark import Catalog
    from incubator_iceberg_spark.io import load_table

    wh = str(tmp_path_factory.mktemp("planwh"))
    cat = Catalog(wh, spark)
    orders = load_table(spark, sf_dir, "orders")
    t = cat.create_table("db.plans", Schema.from_spark(orders.schema))
    t.append(orders)
    return t


def test_filter_reaches_parquet_scan(orders_table, spark):
    df = orders_table.to_df(filter="o_totalprice > 100000") \
        .select("o_orderkey", "o_totalprice")
    plan = _final_plan(df)
    assert "PushedFilters: [" in plan
    assert "GreaterThan(o_totalprice" in plan


def test_projection_prunes_read_schema(orders_table, spark):
    df = orders_table.to_df().select("o_orderkey", "o_totalprice")
    plan = _final_plan(df)
    scan_line = next(ln for ln in plan.splitlines() if "ReadSchema" in ln)
    assert "o_orderkey" in scan_line and "o_totalprice" in scan_line
    assert "o_comment" not in scan_line  # widest column must not be read


def test_small_dimension_join_broadcasts(orders_table, spark, sf_dir):
    from incubator_iceberg_spark.io import load_table
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    df = orders_table.to_df().join(F.broadcast(cust),
                                   F.col("o_custkey") == F.col("c_custkey"))
    plan = _final_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # the fact table must not shuffle


def test_aggregate_is_codegen_with_partial(orders_table, spark):
    df = (orders_table.to_df()
          .groupBy("o_orderstatus")
          .agg(F.sum("o_totalprice").alias("s"), F.count("*").alias("n")))
    plan = _final_plan(df)
    assert "*(" in plan  # whole-stage-codegen stage markers
    # partial_sum before the exchange = map-side combine (no raw shuffle
    # of unaggregated rows)
    assert "partial_sum" in plan
    assert plan.count("HashAggregate") >= 2


@pytest.fixture(scope="module")
def docs_df(spark, sf_dir):
    from incubator_iceberg_spark.io import load_table
    return load_table(spark, sf_dir, "documents")


def test_chunk_documents_is_shuffle_free(docs_df):
    """Chunking is a narrow transform: NO Exchange anywhere in the plan —
    at 100 TB it must not shuffle the corpus to window it."""
    from incubator_iceberg_spark.functions import corpus
    plan = _final_plan(corpus.chunk_documents(docs_df))
    assert "Exchange" not in plan


def test_contamination_probe_broadcasts_eval_grams(docs_df):
    """The eval-gram side must broadcast (map-side hash join), never
    shuffle the corpus grams against it with a sort-merge join."""
    from incubator_iceberg_spark.functions import corpus
    out = corpus.ngram_contamination(
        docs_df.filter("doc_id % 50 != 0"),
        docs_df.filter("doc_id % 50 = 0"), n=5)
    plan = _final_plan(out)
    assert "BroadcastHashJoin" in plan
    # the totals-vs-hits join on the doc id may sort-merge (both sides
    # pre-aggregated); the GRAM join must never
    smj_on_gram = [ln for ln in plan.splitlines()
                   if "SortMergeJoin" in ln and "[g#" in ln]
    assert not smj_on_gram, smj_on_gram


def test_mixture_sample_is_pure_filter(docs_df):
    """Deterministic sampling adds no shuffle and no UDF: a Filter over
    the scan, nothing else."""
    from incubator_iceberg_spark.functions import corpus
    out = corpus.mixture_sample(docs_df, {"src0": 0.5}, "source", "doc_id")
    plan = _final_plan(out)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sq8_stored_probe_prunes_raw_vectors(spark, tmp_path_factory):
    """The compressed-read contract: a stored-codes probe must never read
    the raw float vector column — ReadSchema carries only (id, codes)."""
    from incubator_iceberg_spark import Catalog
    from incubator_iceberg_spark.functions import similarity as S
    import numpy as np

    rng = np.random.default_rng(2)
    rows = [(i, [float(x) for x in rng.standard_normal(8)])
            for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cat = Catalog(str(tmp_path_factory.mktemp("sq8wh")), spark)
    t = cat.create_table("db.sq8plan", Schema.from_spark(df.schema))
    t.append(df)
    S.add_sq8_index(t)

    probe = S.sq8_topk_stored(t, [float(x) for x in rng.standard_normal(8)],
                              k=5)
    plan = _final_plan(probe)
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, plan
    assert "embedding" not in " ".join(scan), " ".join(scan)
    assert "__sq8_codes" in " ".join(scan)


def test_rolling_features_single_exchange(spark):
    """Both RANGE frames share one partitioning+ordering: Spark must plan
    ONE shuffle (plus AQE reads), not one per window."""
    import datetime
    from incubator_iceberg_spark.functions import temporal
    rows = [(i, i % 4, datetime.datetime(2024, 1, 1)
             + datetime.timedelta(seconds=i), float(i)) for i in range(100)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    out = temporal.rolling_features(
        df, on="user_id", ts_col="ts", value_col="value",
        windows={"1m": 60_000_000, "5m": 300_000_000})
    plan = _final_plan(out).split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_shuffle_shards_single_exchange(spark):
    from incubator_iceberg_spark.functions import corpus
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = corpus.shuffle_shards(df, n_shards=8)
    plan = _final_plan(out).split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_eq_only_single_seq_scan_has_no_seq_map_join(spark,
                                                     tmp_path_factory):
    """Round-9 fast path: an eq-delete-only scan whose data files share
    ONE sequence stamps the sequence as a literal — no seq-map
    ExistingRDD broadcast join, no per-row _metadata decode, and
    Catalyst prunes the lineage column from the parquet read."""
    from incubator_iceberg_spark import Catalog

    wh = str(tmp_path_factory.mktemp("eqfastwh"))
    cat = Catalog(wh, spark)
    base = spark.range(5000).select(F.col("id"), (F.col("id") % 9).alias("v"))
    t = cat.create_table("db.eqfast", Schema.from_spark(base.schema))
    t.append(base)
    t.add_equality_deletes(
        spark.createDataFrame([(i,) for i in range(0, 5000, 11)], "id long"),
        ["id"])
    df = t.to_df()
    plan = _final_plan(df)
    assert "ExistingRDD" not in plan, "seq-map join not eliminated"
    assert "_metadata" not in plan, "lineage column not pruned"
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("BroadcastHashJoin") == 1  # the eq anti-join only
    assert df.count() == 5000 - len(range(0, 5000, 11))
