"""Corpus-preparation operators for training-data pipelines (SURVEY §7
post-parity extensions, same family as dedup/text/similarity):

- chunk_documents    — fixed-size overlapping character windows per doc
                       (RAG / context-window prep); pure Column algebra.
- pack_sequences     — next-fit packing of docs into fixed-token-budget
                       training sequences, per group — inherently
                       sequential per group, so Arrow-batched
                       applyInPandas (the sanctioned stateful path);
                       group count bounds parallelism, not corpus size.
- mixture_sample     — deterministic per-stratum sampling by a
                       multiplicative-hash uniform; reproducible corpus
                       mixtures without RNG state (same rows on every
                       run/cluster — the property mixture rebuilds need).
- tf_idf             — classic ln-idf term weighting (explode + two
                       aggregates, all codegen).
- tf_idf_top_terms   — top-k terms per doc by a RATIONAL idf surrogate
                       (tf·(N+1)/(df+1)): division is correctly-rounded
                       IEEE so ranks are bit-identical across engines,
                       unlike ln whose last-ulp differs by libm.
- ngram_contamination — benchmark-leakage check (corpus n-grams against
                       a broadcast eval-gram set; window-lead grams).
- repetition_stats   — Gopher-style dup-line fraction + top-word
                       dominance in floor-micro units.
- chunk_by_tokens    — token-count windows (training-prep counterpart
                       to the char-window chunker).
- split_assign       — deterministic train/val/test assignment from the
                       key-hash uniform (incremental-safe).

At 100 TB: chunking explodes rows ~len/step× but stays in whole-stage
codegen (no shuffle); packing shuffles once on the group key and streams
each group through one Arrow batch sequence; mixture_sample is a pure
filter (no shuffle, no sampling state); tf-idf is two hash aggregates
(term and (doc,term)) plus a broadcast-joined doc-frequency table when
the vocabulary is small.
"""

from __future__ import annotations

from incubator_iceberg_spark.functions import text as TX


def chunk_documents(df, text_col: str = "text", id_col: str = "doc_id",
                    chunk_size: int = 200, overlap: int = 20):
    """One row per (doc, chunk): fixed-size character windows starting
    every ``chunk_size - overlap`` characters.  An empty document yields
    one empty chunk (callers filter if unwanted).  chunk_id is the
    0-based window ordinal; chunk_len the actual window length (the last
    window is usually short)."""
    from pyspark.sql import functions as F
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    step = chunk_size - overlap
    c = F.col(text_col)
    starts = F.sequence(F.lit(1), F.greatest(F.length(c), F.lit(1)),
                        F.lit(step))
    ex = df.select(F.col(id_col), c.alias("__t"),
                   F.posexplode(starts).alias("chunk_id", "__start"))
    return (ex.select(
        id_col, "chunk_id",
        F.col("__t").substr(F.col("__start"), F.lit(chunk_size))
        .alias("chunk_text"))
        .withColumn("chunk_len", F.length("chunk_text")))


def pack_sequences(df, group_cols, token_col: str, id_col: str = "doc_id",
                   budget: int = 2048):
    """Next-fit sequence packing: within each group, docs in ``id_col``
    order are appended to the current sequence until the next doc would
    overflow ``budget`` tokens, then a new sequence starts.  A single doc
    larger than the budget gets its own sequence.  Deterministic (order
    is total), so rebuilds produce identical packings.

    Returns df columns + ``seq_id`` (0-based per group).  Per-group
    sequential by nature — runs as one applyInPandas per group; at scale
    the group key (e.g. (lang, shard)) sets parallelism, so shard wide
    corpora into enough groups."""
    import pandas as pd
    from pyspark.sql import functions as F

    if isinstance(group_cols, str):
        group_cols = [group_cols]
    from pyspark.sql.types import StructType
    # copy before .add — pyspark's StructType.add MUTATES in place, and
    # df.schema is the DataFrame's cached schema object
    out_schema = StructType(list(df.schema.fields)).add("seq_id", "long")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        seqs = []
        seq, acc = 0, 0
        for t in pdf[token_col]:
            t = int(t)
            if acc > 0 and acc + t > budget:
                seq += 1
                acc = 0
            acc += t
            seqs.append(seq)
        pdf["seq_id"] = seqs
        return pdf

    # groupBy().applyInPandas shuffles on the group key itself — a
    # repartition first would be a second, redundant exchange
    return df.groupBy(*group_cols).applyInPandas(pack, schema=out_schema)


# multiplicative-hash constant (Knuth): u = (key * K) % M / M is a
# deterministic uniform both Spark and any SQL engine compute identically
# in exact int64 arithmetic
_MIX_K = 2654435761
_MIX_M = 1_000_000


def mixture_u(key_col):
    """Deterministic pseudo-uniform in [0, 1) from an integer key.

    The key is reduced mod M BEFORE the multiply: (key·K) mod M ==
    ((key mod M)·K) mod M, so the value is unchanged, but the product
    stays < 2.7e15 — exact int64 in every engine.  (The un-reduced form
    overflowed int64 for keys ≥ ~3.5e9: Spark non-ANSI wrapped silently
    while other engines widened or errored, breaking the promised
    cross-engine bit-equality.)"""
    from pyspark.sql import functions as F
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    r = F.pmod(c, F.lit(_MIX_M))
    return (F.pmod(r * F.lit(_MIX_K), F.lit(_MIX_M)).cast("double")
            / F.lit(float(_MIX_M)))


def mixture_sample(df, rates: dict, strata_col: str, key_col: str):
    """Keep each row with its stratum's rate, decided by the
    deterministic key hash (not an RNG): ``u(key) < rate[stratum]``.
    Strata missing from ``rates`` are dropped (rate 0).  Scale shape: a
    pure filter — no shuffle, no sample() RNG whose result depends on
    partitioning."""
    from pyspark.sql import functions as F
    rate = F.lit(0.0)
    for s, r in rates.items():
        rate = F.when(F.col(strata_col) == s, F.lit(float(r))).otherwise(rate)
    return df.filter(mixture_u(key_col) < rate)


def stratified_sample(df, quotas: dict, strata_col: str, key_col: str):
    """Exact per-stratum quotas (the counterpart of rate-based
    ``mixture_sample``): rank rows within each stratum by the
    deterministic mixture hash — ties broken on the key — and keep the
    first ``quotas[stratum]``.  RNG-free, so re-runs select the SAME
    rows; strata missing from ``quotas`` are dropped.

    Scale shape: one shuffle on ``strata_col`` for the per-stratum
    window; no driver involvement and no global sort.  A pathologically
    huge stratum makes its window sort the bottleneck — pre-thin with
    ``mixture_sample`` at ~2× the quota rate first, then take the exact
    quota here (both stages use the same hash, so the pre-thinning never
    drops a row the final ranking would have kept... provided the
    thinning rate stays comfortably above quota/stratum_size)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    quota = F.lit(None).cast("long")
    for s, n in quotas.items():
        quota = F.when(F.col(strata_col) == s, F.lit(int(n))).otherwise(quota)
    # strata without a quota contribute nothing — drop them BEFORE the
    # exchange so they never shuffle (the filter pushes into the scan)
    df = df.filter(F.col(strata_col).isin(*quotas.keys()))
    w = Window.partitionBy(strata_col).orderBy(
        mixture_u(key_col).asc(), F.col(key_col).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= quota)
              .drop("__rn"))


def mixture_u_sql(key_expr: str) -> str:
    """The ANSI-SQL mirror of mixture_u — exact same int64 arithmetic
    for the FULL int64 key range (key reduced mod M first; the double-%
    makes the reduction non-negative like Spark's pmod, so negative keys
    agree too)."""
    m = _MIX_M
    return (f"((((({key_expr} % {m}) + {m}) % {m}) * {_MIX_K}) % {m})"
            f" / {m}.0")


def _term_freqs(df, text_col: str, id_col: str):
    from pyspark.sql import functions as F
    ex = df.select(F.col(id_col).alias("__id"),
                   F.explode(TX.tokens(text_col)).alias("term"))
    tf = ex.groupBy("__id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # document frequency DERIVED from tf — tf's key set IS the distinct
    # (doc, term) pairs, so this tokenizes the corpus once (not twice),
    # skips the standalone distinct shuffle, and lets Spark reuse the tf
    # aggregate exchange for both consumers of the join
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return tf, dfreq


def tf_idf(df, text_col: str = "text", id_col: str = "doc_id"):
    """(doc, term, tf, df, tfidf) with the classic ln idf:
    tfidf = tf * ln((N + 1) / (df + 1)).  Two codegen hash aggregates +
    one join on term (broadcastable while the vocab is small)."""
    from pyspark.sql import functions as F
    n_docs = df.count()
    tf, dfreq = _term_freqs(df, text_col, id_col)
    return (tf.join(dfreq, "term")
            .select(F.col("__id").alias(id_col), "term", "tf", "df",
                    (F.col("tf") * F.log((F.lit(float(n_docs + 1)))
                                         / (F.col("df") + F.lit(1.0))))
                    .alias("tfidf")))


def tf_idf_top_terms(df, text_col: str = "text", id_col: str = "doc_id",
                     k: int = 3):
    """Top-k most characteristic terms per doc, ranked by the RATIONAL
    idf surrogate score = tf * (N + 1) / (df + 1) — monotone in the same
    (tf, df) ordering as ln idf for fixed tf, but computed with one IEEE
    division (correctly rounded, engine-identical) instead of ln (libm
    last-ulp varies), so ranks — and therefore result hashes — are
    reproducible across engines.  Ties break by term ascending."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    n_docs = df.count()
    tf, dfreq = _term_freqs(df, text_col, id_col)
    scored = (tf.join(dfreq, "term")
              .withColumn("score",
                          (F.col("tf") * F.lit(float(n_docs + 1)))
                          / (F.col("df") + F.lit(1.0))))
    w = Window.partitionBy("__id").orderBy(F.desc("score"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("__id").alias(id_col), "rank", "term", "tf", "df",
                    "score"))


def word_ngram_rows(df, text_col: str, id_col: str, n: int):
    """(id, gram) rows of DISTINCT word n-grams via posexplode + window
    ``lead``s — the array-lambda formulation (transform+slice+concat_ws)
    runs interpreted per row and measured 10×+ slower on real corpora
    (same finding that drove dedup.ngram_jaccard_pairs' rewrite)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    toks = df.select(F.col(id_col).alias("__id"),
                     F.posexplode_outer(TX.tokens(text_col))
                     .alias("__p", "__t"))
    w = Window.partitionBy("__id").orderBy("__p")
    cols = [F.col("__t")] + [F.lead("__t", k).over(w) for k in range(1, n)]
    return (toks.select("__id", *[c.alias(f"__t{k}")
                                  for k, c in enumerate(cols)])
            .filter(F.col(f"__t{n-1}").isNotNull())
            .select("__id", F.concat_ws(" ", *[F.col(f"__t{k}")
                                               for k in range(n)]).alias("g"))
            .distinct())


def ngram_contamination(corpus_df, benchmark_df, n: int = 8,
                        text_col: str = "text", id_col: str = "doc_id",
                        bench_text_col: str = None):
    """Benchmark DECONTAMINATION check: for every corpus doc, how many of
    its word n-grams appear anywhere in the benchmark set (the standard
    pre-training hygiene test — eval data leaking into the corpus).

    Returns (id, n_grams, contaminated_grams, contamination_micro) where
    contamination_micro = floor(contaminated/n_grams * 1e6).  Shape: both
    sides reduce to distinct (id, gram) rows via window leads (codegen,
    no interpreted array lambdas); the benchmark side is a distinct gram
    set (small → broadcast), so the probe is a map-side hash join.  The
    corpus gram set has two consumers (totals + hits) — persisted once
    and released after materialization."""
    from pyspark.sql import functions as F
    from incubator_iceberg_spark.functions.dedup import (
        _materialize_and_release,
    )
    grams = word_ngram_rows(corpus_df, text_col, id_col, n).persist()
    bench = (word_ngram_rows(benchmark_df, bench_text_col or text_col,
                             id_col, n)
             .select("g").distinct())
    totals = grams.groupBy("__id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (grams.join(F.broadcast(bench), "g")
            .groupBy("__id").agg(F.count(F.lit(1)).alias("contaminated_grams")))
    out = (totals.join(hits, "__id", "left")
           .select(F.col("__id").alias(id_col), "n_grams",
                   F.coalesce("contaminated_grams", F.lit(0))
                   .alias("contaminated_grams"))
           .withColumn("contamination_micro",
                       F.floor(F.col("contaminated_grams")
                               * F.lit(1000000.0) / F.col("n_grams"))
                       .cast("long")))
    return _materialize_and_release(out, [grams])


def repetition_stats(df, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style within-document repetition signals: duplicate-line
    fraction and top-word dominance, used to drop boilerplate/spam docs.

    Returns (id, n_lines, dup_line_micro, top_word_micro):
    dup_line_micro = floor((1 - distinct_lines/lines) * 1e6) over
    non-empty trimmed lines; top_word_micro = floor(max word frequency /
    total words * 1e6).  Pure Column algebra + two aggregates."""
    from pyspark.sql import functions as F
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda s: F.trim(s)),
        lambda s: s != "")
    base = df.select(F.col(id_col).alias("__id"), lines.alias("__ls"),
                     TX.tokens(text_col).alias("__toks"))
    line_stats = base.select(
        "__id",
        F.size("__ls").alias("n_lines"),
        F.when(F.size("__ls") > 0,
               F.floor((F.lit(1.0)
                        - F.size(F.array_distinct("__ls")).cast("double")
                        / F.size("__ls")) * F.lit(1000000.0)).cast("long"))
        .otherwise(F.lit(0)).alias("dup_line_micro"))
    tok = base.select("__id", F.explode_outer("__toks").alias("__t"))
    word_stats = (tok.groupBy("__id", "__t")
                  .agg(F.count(F.lit(1)).alias("__c"))
                  .groupBy("__id")
                  .agg(F.sum(F.when(F.col("__t").isNotNull(), F.col("__c"))
                             .otherwise(0)).alias("__total"),
                       F.max(F.when(F.col("__t").isNotNull(), F.col("__c"))
                             .otherwise(0)).alias("__top")))
    top = word_stats.select(
        "__id",
        F.when(F.col("__total") > 0,
               F.floor(F.col("__top") * F.lit(1000000.0) / F.col("__total"))
               .cast("long")).otherwise(F.lit(0)).alias("top_word_micro"))
    return (line_stats.join(top, "__id")
            .select(F.col("__id").alias(id_col), "n_lines",
                    "dup_line_micro", "top_word_micro"))


def chunk_by_tokens(df, text_col: str = "text", id_col: str = "doc_id",
                    chunk_tokens: int = 256, overlap: int = 32):
    """Token-window chunking: windows of ``chunk_tokens`` word tokens
    every ``chunk_tokens - overlap`` tokens; chunk_text is the
    space-joined token window (tokenization is lossy by design — this is
    the training-prep shape, char-preserving chunks are
    ``chunk_documents``).  An empty/token-free doc yields one empty
    chunk.  Pure Column algebra, no shuffle."""
    from pyspark.sql import functions as F
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    base = df.select(F.col(id_col), TX.tokens(text_col).alias("__t"))
    starts = F.sequence(F.lit(0),
                        F.greatest(F.size("__t") - 1, F.lit(0)),
                        F.lit(step))
    ex = base.select(id_col, "__t",
                     F.posexplode(starts).alias("chunk_id", "__s"))
    win = F.slice("__t", F.col("__s") + 1, F.lit(chunk_tokens))
    return ex.select(id_col, "chunk_id",
                     F.concat_ws(" ", win).alias("chunk_text"),
                     F.size(win).alias("n_tokens"))


def split_assign(df, weights: dict, key_col: str,
                 split_col: str = "split"):
    """Deterministic train/val/test assignment: each row gets the split
    whose cumulative-weight interval contains the key's hash uniform —
    reproducible across runs/partitionings (no RNG), and a row's split
    never changes when OTHER rows are added (the property incremental
    corpus builds need; weights are normalized).  Pure Column algebra."""
    from pyspark.sql import functions as F
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum > 0")
    u = mixture_u(key_col)
    cum = 0.0
    expr = None
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += float(w)
        # ONE division per boundary: accumulating normalized fractions
        # (0.8 + 0.1) lands on a different double than the literal 0.9 a
        # SQL mirror writes — cum/total is the same double both sides
        cond = u < F.lit(cum / total)
        expr = F.when(cond, F.lit(name)) if expr is None else \
            expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)


def duplicated_spans(df, text_col: str = "text", id_col: str = "doc_id",
                     n: int = 8, min_docs: int = 2):
    """Substring-level duplication coverage (the span-dedup signal of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499 — suffix-array spans recast Spark-first as
    fixed-width token-window grams): a token position counts as
    duplicated when some ``n``-token window covering it occurs in at
    least ``min_docs`` DISTINCT documents.  Within-doc self-repetition is
    deliberately excluded (that signal is ``repetition_stats``).

    Returns one row per input doc:
    (id, n_tokens, dup_windows, dup_cover_tokens, dup_cover_micro) where
    dup_windows is the number of duplicated window STARTS, dup_cover_*
    the interval-union size of those windows (exact integer arithmetic:
    micro = tokens*1e6 DIV n_tokens, so results hash identically across
    engines).  Docs with < n tokens have no windows and report zeros.

    Scale shape: tokenize+explode (codegen, no shuffle) -> one hash
    aggregate on the gram for the distinct-doc count -> one join back on
    the gram -> a per-doc window over DUPLICATED starts only (sparse) ->
    one per-doc aggregate.  Nothing is all-pairs; the gram aggregate is
    the only corpus-wide shuffle.  At 100 TB you would group on
    xxhash64(gram) instead of the gram string to cut shuffle width
    (collisions only over-mark spans, acceptable for a dedup signal);
    the string form is kept here for bit-exact cross-engine oracles.
    Interval-union trick: windows all have length n and starts are
    sorted, so union = sum(least(n, start - prev_start)) with the first
    window contributing n.

    The gram relation feeds two consumers (the distinct-doc aggregate
    and the join back) and is DELIBERATELY computed twice rather than
    persisted: the aggregate subtree prunes positions and partially
    aggregates map-side (its shuffle carries ~one row per distinct gram
    per partition), so the duplicated work is pure codegen map CPU —
    cheaper at 100 TB than caching O(corpus x n) gram rows or switching
    to a window-based distinct count that would shuffle every gram row
    full-width."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    toks = df.select(F.col(id_col).alias("__id"),
                     TX.tokens(text_col).alias("__t"))
    pos = toks.select("__id", F.posexplode("__t").alias("__p", "__w"))
    w_doc = Window.partitionBy("__id").orderBy("__p")
    leads = [F.col("__w")] + [F.lead("__w", k).over(w_doc)
                              for k in range(1, n)]
    grams = (pos.select("__id", "__p",
                        *[c.alias(f"__w{k}") for k, c in enumerate(leads)])
             .filter(F.col(f"__w{n-1}").isNotNull())
             .select("__id", "__p",
                     F.concat_ws(" ", *[F.col(f"__w{k}")
                                        for k in range(n)]).alias("__g")))
    dup = (grams.groupBy("__g")
           .agg(F.count_distinct("__id").alias("__nd"))
           .filter(F.col("__nd") >= min_docs)
           .select("__g"))
    starts = grams.join(dup, "__g").select("__id", "__p")
    prev = F.lag("__p").over(Window.partitionBy("__id").orderBy("__p"))
    cover = (starts.withColumn(
                 "__c",
                 F.when(prev.isNull(), F.lit(n))
                 .otherwise(F.least(F.lit(n), F.col("__p") - prev)))
             .groupBy("__id")
             .agg(F.count(F.lit(1)).alias("dup_windows"),
                  F.sum("__c").alias("dup_cover_tokens")))
    base = toks.select("__id", F.size("__t").alias("n_tokens"))
    out = (base.join(cover, "__id", "left")
           .select(F.col("__id").alias(id_col), "n_tokens",
                   F.coalesce("dup_windows", F.lit(0)).alias("dup_windows"),
                   F.coalesce("dup_cover_tokens", F.lit(0))
                   .alias("dup_cover_tokens")))
    return out.withColumn(
        "dup_cover_micro",
        F.when(F.col("n_tokens") > 0,
               F.expr("dup_cover_tokens * 1000000 DIV n_tokens"))
        .otherwise(F.lit(0)).cast("long"))


def token_budget_sample(df, budgets: dict, strata_col: str, key_col: str,
                        text_col: str = "text"):
    """Token-BUDGET mixture construction (the counterpart of doc-count
    ``stratified_sample``): within each stratum, order docs by the
    deterministic mixture hash (ties on the key) and keep the prefix
    whose cumulative whitespace-token count stays within
    ``budgets[stratum]`` — i.e. a doc is kept iff the running total
    INCLUDING it is <= the budget.  This is how pretraining mixtures are
    actually specified (tokens per source, not docs per source).
    RNG-free: re-runs and re-partitions select the same rows, and a
    kept doc stays kept when OTHER strata change.  Strata without a
    budget are dropped before the exchange.

    Returns df columns + n_tokens + cum_tokens.  Scale shape: one
    shuffle on the stratum for the running-sum window; a pathologically
    huge stratum can be pre-thinned with ``mixture_sample`` exactly as
    documented on ``stratified_sample``."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    budget = F.lit(None).cast("long")
    for s, b in budgets.items():
        budget = F.when(F.col(strata_col) == s,
                        F.lit(int(b))).otherwise(budget)
    df = df.filter(F.col(strata_col).isin(*budgets.keys()))
    df = df.withColumn("n_tokens", TX.token_count(text_col).cast("long"))
    w = (Window.partitionBy(strata_col)
         .orderBy(mixture_u(key_col).asc(), F.col(key_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.withColumn("cum_tokens", F.sum("n_tokens").over(w))
              .filter(F.col("cum_tokens") <= budget))


def mixture_h(key_col):
    """The integer form of ``mixture_u``: deterministic pseudo-uniform
    int64 in ``[0, 1e6)`` — same value in every engine (exact int64
    arithmetic, key reduced mod M before the multiply)."""
    from pyspark.sql import functions as F
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.pmod(F.pmod(c, F.lit(_MIX_M)) * F.lit(_MIX_K), F.lit(_MIX_M))


def shuffle_shards(df, n_shards: int, key_col: str = "doc_id"):
    """Deterministic global training-data shuffle + shard assignment.

    Every row gets ``(shard, pos)``: ``shard = h(key) % n_shards`` and
    ``pos`` = rank within the shard by ``(h(key), key)`` — i.e. a
    pseudo-random global permutation materialized as N independently
    ordered shards, the layout a trainer streams (read shards in any
    order, each shard internally shuffled).  RNG-free: re-runs — and
    incremental re-runs after appends — place unchanged keys in the same
    relative order.

    Scale shape: one hash exchange on ``shard`` + a per-shard window
    sort.  Parallelism == ``n_shards`` and per-task memory is one shard,
    so choose ``n_shards`` ≈ corpus_size / target_shard_rows (a shard is
    a training file: 100 TB at 100 MB shards -> 10^6 shards, far wider
    than any cluster).  No global sort, no driver state."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    h = mixture_h(key_col)
    w = Window.partitionBy("shard").orderBy(F.col("__h").asc(),
                                            F.col(key_col).asc())
    return (df.withColumn("__h", h)
              .withColumn("shard", F.pmod(F.col("__h"), F.lit(int(n_shards))))
              .withColumn("pos", F.row_number().over(w) - F.lit(1))
              .drop("__h"))


class HeavyHitterCertificationError(RuntimeError):
    """The sketch could not PROVE the top-k is exact at this capacity."""


def heavy_hitters(df, text_col: str = "text", k: int = 20,
                  capacity: int = 512, max_retries: int = 3):
    """CERTIFIED-exact global top-k terms by total occurrences, without
    ever shuffling the full vocabulary — the two-pass sketch pattern:

    1. **Sketch pass**: per-partition Misra-Gries summaries (Arrow-batched
       ``mapInPandas``; counting is pandas ``value_counts``, not a Python
       token loop).  Each partition tracks its exact total undercount
       ``u_p`` (the sum of prune decrements), so any term whose TRUE
       partition count exceeds ``u_p`` provably survives — hence any term
       with global count > U = Σ u_p appears in the candidate union.
    2. **Verify pass**: exact counts of the (bounded) candidate set via a
       broadcast semi-join, then top-k.

    **Certificate**: if the k-th best exact count > U, no non-candidate
    can outrank it — the result is exactly the true top-k.  Otherwise the
    capacity was too small for this distribution: retry with 4x capacity
    (up to ``max_retries``), then raise ``HeavyHitterCertificationError``
    rather than return a silently-approximate answer.

    Scale shape: pass 1 shuffles nothing (narrow map); candidate set is
    ≤ partitions × capacity rows (driver-side metadata, like any sketch
    merge); pass 2 shuffles only candidate-term rows.  Compare the naive
    exact form: a full-vocabulary groupBy, whose shuffle at 100 TB is the
    whole token stream."""
    import pandas as pd
    from pyspark.sql import functions as F
    from incubator_iceberg_spark.functions import text as TX

    toks = df.select(F.explode(TX.tokens(text_col)).alias("term"))

    cap = int(capacity)
    for attempt in range(max_retries):
        def sketch(batches, cap=cap):
            counts: dict = {}
            u = 0
            for pdf in batches:
                add = pdf["term"].value_counts()
                for t, c in add.items():
                    counts[t] = counts.get(t, 0) + int(c)
                if len(counts) > cap:
                    vals = sorted(counts.values(), reverse=True)
                    d = vals[cap]  # (cap+1)-th largest
                    u += d
                    counts = {t: c - d for t, c in counts.items() if c > d}
            yield pd.DataFrame({"term": list(counts.keys()) + [None],
                                "u": [0] * len(counts) + [u]})

        summary = toks.mapInPandas(sketch, "term string, u long")
        agg = summary.agg(
            F.sum("u").alias("U"),
            F.collect_set("term").alias("cands")).collect()[0]
        total_undercount = agg["U"] or 0
        cands = agg["cands"]

        exact = (toks.join(F.broadcast(
                     toks.sparkSession.createDataFrame(
                         [(c,) for c in cands], "term string")),
                     "term", "left_semi")
                 .groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
                 .orderBy(F.desc("cnt"), F.col("term")).limit(k))
        rows = exact.collect()
        # certified when the k-th exact count beats the total possible
        # undercount, OR no pruning ever happened (U == 0 -> the candidate
        # set IS the full vocabulary).  Fewer-than-k candidates alone is
        # NOT a certificate: pruned-away terms could fill the top-k.
        certified = (total_undercount == 0
                     or (len(rows) == k and rows[-1]["cnt"] > total_undercount))
        if certified:
            return toks.sparkSession.createDataFrame(
                [(r["term"], r["cnt"]) for r in rows], "term string, cnt long")
        cap *= 4
    kth = rows[-1]["cnt"] if len(rows) == k else "n/a"
    raise HeavyHitterCertificationError(
        f"top-{k} not certifiable at capacity {cap // 4} "
        f"(k-th count {kth} vs undercount bound {total_undercount}, "
        f"{len(rows)} candidates); distribution too flat — raise capacity")


# KMV hash domain: a coarser modulus than int64 so the product with the
# Knuth multiplier stays exactly representable in EVERY engine's int64
# ((M-1)·K ≈ 5.7e18 < 2^63); 2^31-1 keeps collision mass negligible for
# sketch-sized inputs (k ≪ √M)
_KMV_M = 2_147_483_647


def kmv_hash(key_col):
    """Deterministic pseudo-uniform hash of an integer key into
    [0, 2^31-1) — the same exact-int64 multiplicative scheme as
    ``mixture_u`` but on a 2^31 domain (a 10^6 domain would collide
    sketch slots).  Bit-identical in any engine's int64 SQL."""
    from pyspark.sql import functions as F
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    r = F.pmod(c, F.lit(_KMV_M))
    return F.pmod(r * F.lit(_MIX_K), F.lit(_KMV_M))


def kmv_distinct(df, key_col: str, k: int = 64):
    """KMV (k-minimum-values) distinct-count sketch over an integer key
    column — the classic mergeable cardinality estimator (Bar-Yossef et
    al.): keep the k smallest DISTINCT hash values; if the k-th smallest
    is ``h_k``, the hashes are uniform on [0, M) and the estimate is
    ``(k-1) · M / h_k``.  Unlike HyperLogLog-style sketches this is
    RNG-free AND engine-reproducible: the hash is exact int64
    arithmetic, the min-k set is a pure function of the key set, and the
    estimate uses integer division — so a SQL oracle replays it
    bit-for-bit (approx_count_distinct can never be oracle-checked).

    Returns ONE row: (k_used, kth_hash, est_distinct).  When fewer than
    ``k`` distinct hashes exist the sketch IS the distinct set and the
    exact count is returned (kth_hash NULL) — the estimator's standard
    small-cardinality exact mode.

    Scale shape: a narrow single-column scan; each partition contributes
    its own ≤ k smallest distinct hashes via an Arrow-batched
    ``mapInPandas`` running min-k (bounded memory, no shuffle), and the
    global min-k over those ≤ k·partitions candidates is a
    TakeOrderedAndProject — nothing resembling the full distinct set is
    ever shuffled or collected (the exact ``count_distinct`` it replaces
    shuffles every distinct key).  Sketches merge by unioning candidate
    rows — the same path incremental maintenance would use.
    Accuracy: relative σ ≈ 1/√(k-2) (~13% at k=64); pick k for the
    precision you need."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    if k < 2:
        raise ValueError(f"kmv_distinct needs k >= 2, got {k}")
    hashed = df.select(kmv_hash(key_col).alias("hh"))

    def part_mink(batches, k=int(k)):
        best = None
        for pdf in batches:
            vals = pdf["hh"].to_numpy()
            cand = np.unique(vals if best is None
                             else np.concatenate([best, vals]))
            best = cand[:k] if len(cand) > k else cand
        yield pd.DataFrame({"hh": best if best is not None else
                            np.array([], dtype="int64")})

    cand = hashed.mapInPandas(part_mink, "hh long")
    mink = cand.distinct().orderBy("hh").limit(int(k))
    s = mink.agg(F.count(F.lit(1)).alias("c"), F.max("hh").alias("hk"))
    kk, m = F.lit(int(k)), F.lit(_KMV_M)
    return s.select(
        kk.alias("k_used"),
        F.when(F.col("c") >= kk, F.col("hk")).cast("long").alias("kth_hash"),
        F.when(F.col("c") < kk, F.col("c"))
         .otherwise(F.expr(f"({int(k)} - 1) * {_KMV_M}L div hk"))
         .cast("long").alias("est_distinct"))


def kmv_distinct_sql(key_expr: str, table: str, k: int = 64,
                     where: str = "") -> str:
    """The exact ANSI-SQL mirror of ``kmv_distinct`` for oracle checks."""
    m, kk = _KMV_M, int(k)
    w = f"WHERE {where}" if where else ""
    kexpr = f"CAST({key_expr} AS BIGINT)"  # pre-widen: % M + M overflows int32
    return f"""
        WITH h AS (
            SELECT DISTINCT ((({kexpr} % {m}) + {m}) % {m}
                             * {_MIX_K}) % {m} AS hh
            FROM {table} {w}),
        mink AS (SELECT hh FROM h ORDER BY hh LIMIT {kk}),
        s AS (SELECT count(*) AS c, max(hh) AS hk FROM mink)
        SELECT CAST({kk} AS INT) AS k_used,
               CAST(CASE WHEN c >= {kk} THEN hk END AS BIGINT) AS kth_hash,
               CAST(CASE WHEN c < {kk} THEN c
                    ELSE ({kk} - 1) * CAST({m} AS BIGINT) // hk
               END AS BIGINT) AS est_distinct
        FROM s"""


def inverted_postings(df, text_col: str = "text", id_col: str = "doc_id",
                      top_n: int = 100, max_postings: int = 1000,
                      salt_buckets: int = 64):
    """Inverted-index build for the ``top_n`` highest-document-frequency
    terms: (term, doc_freq, postings) where ``postings`` is the
    ascending doc-id list serialized as CSV (capped at ``max_postings``
    entries — the head shard of the posting list; full lists for hot
    terms are unbounded at corpus scale and real indexes shard them).

    Scale shape: tokenize once (``_term_freqs`` derives doc-frequency
    from the tf aggregate), broadcast-join the small top-N term set to
    filter BEFORE any list building, then take each term's min-k doc
    ids with a SALTED two-stage aggregate: stage 1 caps each
    (term, id%S) group to its k smallest, stage 2 merges S capped
    candidate lists per term.  The top-N terms are by construction the
    HOTTEST keys in the corpus, so a per-term window sort (the naive
    cap) serializes each hot term into one task and goes superlinear —
    measured 3.5x per 10x docs; the salted form keeps parallelism at
    top_n·S and per-task memory at O(df_max/S + S·cap).  ``doc_freq``
    is the TRUE document frequency (counted before capping)."""
    from pyspark.sql import functions as F

    tf, dfreq = _term_freqs(df, text_col, id_col)
    top = (dfreq.orderBy(F.desc("df"), F.col("term").asc())
                .limit(int(top_n)))
    pairs = tf.join(F.broadcast(top), "term")
    cap, s = int(max_postings), int(salt_buckets)
    partial = (pairs.groupBy("term", "df",
                             F.pmod(F.col("__id"), F.lit(s)).alias("__salt"))
                    .agg(F.slice(F.array_sort(F.collect_list("__id")),
                                 1, cap).alias("__ids")))
    return (partial.groupBy("term", "df")
            .agg(F.array_join(
                     F.transform(
                         F.slice(F.array_sort(
                             F.flatten(F.collect_list("__ids"))), 1, cap),
                         lambda x: x.cast("string")),
                     ",").alias("postings"))
            .select(F.col("term"), F.col("df").alias("doc_freq"),
                    F.col("postings")))


def search_topk(df, query_terms, k: int = 10,
                text_col: str = "text", id_col: str = "doc_id",
                mode: str = "any"):
    """Ranked boolean retrieval over the corpus: score each document
    against a bag of query terms by integer tf-idf and return the top
    ``k`` as (doc_id, n_hit_terms, score_micro) — the serving-side
    counterpart of ``inverted_postings``.

    Scoring is EXACT integer arithmetic so any engine reproduces it
    bit-for-bit: per term, weight = floor(1e6 · (N + 1) / (df + 1))
    (the same ln-free idf surrogate the tf_idf operator uses — ln is
    engine-ambiguous at ulp level), and score = Σ tf · weight over the
    matched query terms.  Ties break on doc_id ascending.  ``mode``:
    ``"any"`` ranks every doc matching ≥ 1 term (OR), ``"all"`` keeps
    only docs matching every query term (AND) — the conjunctive filter
    runs BEFORE ranking via a per-doc distinct-term count.

    Scale shape: the tf aggregate shuffles only rows whose term is in
    the (broadcast) query set — everything else dies in the map-side
    semi-join; doc_freq for the query terms comes from the same
    pre-filtered aggregate; the final top-k is a TakeOrderedAndProject,
    never a global sort."""
    from pyspark.sql import functions as F
    from incubator_iceberg_spark.functions import text as TX

    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("search_topk needs at least one query term")
    if mode not in ("any", "all"):
        raise ValueError(f"mode must be any|all, got {mode!r}")
    spark = df.sparkSession
    n_docs = df.count()
    qdf = spark.createDataFrame([(t,) for t in terms], "term string")

    ex = df.select(F.col(id_col).alias("__id"),
                   F.explode(TX.tokens(text_col)).alias("term"))
    tf = (ex.join(F.broadcast(qdf), "term")
            .groupBy("__id", "term")
            .agg(F.count(F.lit(1)).alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    weighted = tf.join(F.broadcast(dfreq), "term").select(
        "__id", "tf",
        # 1000000L: the int32 product 1e6·(N+1) overflows past N ≈ 2146
        # (ANSI mode raises; non-ANSI silently wraps — both wrong)
        F.expr(f"floor(1000000L * ({int(n_docs)} + 1) / (df + 1))")
         .cast("long").alias("w"))
    scored = (weighted.groupBy("__id")
              .agg(F.count(F.lit(1)).alias("n_hit_terms"),
                   F.sum(F.col("tf") * F.col("w")).alias("score_micro")))
    if mode == "all":
        scored = scored.filter(F.col("n_hit_terms") == len(terms))
    return (scored.orderBy(F.desc("score_micro"), F.col("__id").asc())
            .limit(int(k))
            .select(F.col("__id").alias(id_col),
                    F.col("n_hit_terms").cast("int").alias("n_hit_terms"),
                    F.col("score_micro").cast("long").alias("score_micro")))


def _bigram_rows(df, text_col: str, id_col: str):
    """All (doc, w1, w2) word-bigram OCCURRENCES (not distinct) via
    posexplode + one ordered window lead — same plan shape as
    word_ngram_rows, minus the distinct."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    toks = df.select(F.col(id_col).alias("__id"),
                     F.posexplode_outer(TX.tokens(text_col))
                     .alias("__p", "__t"))
    w = Window.partitionBy("__id").orderBy("__p")
    return (toks.select("__id", F.col("__t").alias("w1"),
                        F.lead("__t", 1).over(w).alias("w2"))
            .filter(F.col("w2").isNotNull()))


def ngram_lm_score(df, text_col: str = "text", id_col: str = "doc_id",
                   ref_df=None):
    """Bigram language-model quality score — the model-based filtering
    step of a CCNet/KenLM-style pipeline (reference-corpus LM perplexity
    gates pretraining docs), in engine-exact integer arithmetic.

    Trains bigram conditional frequencies on ``ref_df`` (default: the
    corpus itself) and scores every document by the mean conditional
    probability of its word bigrams in floor-micro units::

        p_micro(w2|w1)  = (1_000_000 * c(w1,w2)) DIV c(w1,·)
        lm_score_micro  = SUM(k * p_micro) DIV SUM(k)     per doc

    where c(w1,·) = SUM_w2 c(w1,w2) (bigram-start count, derived from
    the bigram aggregate so the corpus tokenizes once) and k is the
    doc's occurrence count of that bigram.  Bigrams unseen in the
    reference score 0 (the self-trained default never hits this).
    Monotone in the same ordering as mean log-prob for ranking within a
    doc-length class; exact integers make the score bit-identical across
    engines — an oracle-checkable stand-in for float perplexity.

    Plan: two map-side-combined hash aggregates for the model, one
    per-doc bigram aggregate, one shuffle join on (w1, w2), one final
    doc aggregate.  Nothing is all-pairs; the model tables scale with
    vocabulary, not corpus size.  Docs with < 2 tokens are dropped
    (no bigrams to score).

    Returns (id_col, n_bigrams, lm_score_micro).
    """
    from pyspark.sql import functions as F
    big = _bigram_rows(df, text_col, id_col)
    ref = big if ref_df is None else _bigram_rows(ref_df, text_col, id_col)
    c2 = ref.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    model = (c2.join(c1, "w1")
             .select("w1", "w2",
                     F.expr("(1000000 * c2) DIV c1").alias("p_micro")))
    doc_b = big.groupBy("__id", "w1", "w2").agg(F.count(F.lit(1)).alias("k"))
    scored = (doc_b.join(model, ["w1", "w2"], "left")
              .withColumn("p_micro", F.coalesce(F.col("p_micro"), F.lit(0))))
    return (scored.groupBy("__id")
            .agg(F.sum("k").alias("n_bigrams"),
                 F.expr("SUM(k * p_micro) DIV SUM(k)")
                 .alias("lm_score_micro"))
            .select(F.col("__id").alias(id_col), "n_bigrams",
                    "lm_score_micro"))


def bpe_train(df, n_merges: int = 20, text_col: str = "text",
              id_col: str = "doc_id", checkpoint_every: int = 8):
    """Byte-pair-encoding tokenizer training on the corpus — the
    vocabulary-induction step of a pretraining pipeline, distributed and
    engine-exact.

    The classic algorithm (Sennrich et al.) runs on the WORD-FREQUENCY
    table, not the raw corpus: one corpus tokenize + count produces
    (word, cnt); every merge round then touches only the vocabulary.
    Each word's symbol sequence is encoded as a fully-wrapped string
    (``"ab" -> "⟨a⟩⟨b⟩"``) so that applying a merge is a plain
    ``replace(seq, '⟨l⟩⟨r⟩', '⟨lr⟩')`` — adjacent matches share no
    characters, so single-pass leftmost-nonoverlapping replace (the
    semantics of both Spark's and DuckDB's ``replace``) IS greedy BPE
    application, bit-identically across engines.

    Per round: symbol pairs via ``regexp_extract_all`` + list slicing
    (no shuffle), ONE map-side-combined weighted count over the
    vocabulary, and a LIMIT-1 argmax with the deterministic tie-break
    (count DESC, left ASC, right ASC) fetched to the driver — the same
    driver-loop shape as kmeans_assign_micro, O(n_merges) tiny
    round-trips.  The vocabulary table scales with distinct words (not
    corpus size); lineage is localCheckpoint-ed every
    ``checkpoint_every`` rounds so the plan stays bounded.

    Raises if the corpus runs dry before ``n_merges`` productive pairs
    (the SQL mirror unrolls exactly n_merges rounds).

    Returns (rank, lhs, rhs, merged, pair_count) — the ordered merge
    list, i.e. the tokenizer.
    """
    from pyspark.sql import functions as F
    words = (df.select(F.explode(TX.tokens(text_col)).alias("w"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
             .withColumn("seq", F.regexp_replace(F.col("w"), "(.)",
                                                 "⟨$1⟩"))
             .select("seq", "cnt"))
    words = words.localCheckpoint()
    merges = []
    for rank in range(1, int(n_merges) + 1):
        syms = F.expr("regexp_extract_all(seq, '⟨([^⟩]*)⟩', 1)")
        pairs = (words
                 .select("cnt", F.explode(F.arrays_zip(
                     F.slice(syms, 1, F.size(syms) - 1).alias("l"),
                     F.slice(syms, 2, F.size(syms) - 1).alias("r")))
                     .alias("p"))
                 .select("cnt", F.col("p.l").alias("l"),
                         F.col("p.r").alias("r")))
        best = (pairs.groupBy("l", "r").agg(F.sum("cnt").alias("c"))
                .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
                .limit(1).collect())
        if not best:
            raise ValueError(
                f"corpus exhausted after {rank - 1} merges; "
                f"asked for {n_merges}")
        l, r, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((rank, l, r, l + r, c))
        words = words.withColumn(
            "seq", F.expr(
                f"replace(seq, '⟨{l}⟩⟨{r}⟩', '⟨{l}{r}⟩')"))
        # never checkpoint the LAST round: the loop ends and words is
        # discarded — that materialization is a pure wasted Spark job
        # (the bench's n_merges=16 with cadence 8 paid it every call)
        if rank % checkpoint_every == 0 and rank < int(n_merges):
            words = words.localCheckpoint()
    spark = df.sparkSession
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, merged string, "
                "pair_count bigint")


def bpe_oracle_sql(n_merges: int = 20, table: str = "documents",
                   text_col: str = "text") -> str:
    """ANSI-SQL mirror of ``bpe_train`` — each merge round unrolled as
    (pairs -> argmax -> replace) CTEs; possible because the wrapped-
    string representation makes merge application a plain replace()."""
    # every CTE MATERIALIZED: the per-round scalar subqueries reference
    # b{{i}} four times; without materialization DuckDB re-inlines the
    # whole prefix chain per reference (4^n blow-up)
    parts = [f"""w0 AS MATERIALIZED (
  SELECT regexp_replace(w, '(.)', '⟨\\1⟩', 'g') AS seq,
         CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(list_filter(
            regexp_split_to_array(lower({text_col}),
                                  '[^\\p{{L}}\\p{{N}}]+'),
            x -> x != '')) AS w
        FROM {table}) t
  GROUP BY w)"""]
    for i in range(1, int(n_merges) + 1):
        prev, cur = f"w{i - 1}", f"w{i}"
        parts.append(f"""p{i} AS MATERIALIZED (
  SELECT u.g['l'] AS l, u.g['r'] AS r, SUM(cnt) AS c
  FROM (SELECT regexp_extract_all(seq, '⟨([^⟩]*)⟩', 1) AS s, cnt
        FROM {prev}) t,
       unnest([{{'l': s[j], 'r': s[j+1]}} FOR j IN range(1, len(s))])
           AS u(g)
  GROUP BY 1, 2),
b{i} AS MATERIALIZED (SELECT l, r, c FROM p{i}
         ORDER BY c DESC, l ASC, r ASC LIMIT 1),
{cur} AS MATERIALIZED (
  SELECT replace(seq,
                 '⟨' || (SELECT l FROM b{i}) || '⟩⟨' ||
                     (SELECT r FROM b{i}) || '⟩',
                 '⟨' || (SELECT l FROM b{i}) ||
                     (SELECT r FROM b{i}) || '⟩') AS seq, cnt
  FROM {prev})""")
    sel = "\nUNION ALL\n".join(
        f"SELECT {i} AS rank, l AS lhs, r AS rhs, l || r AS merged, "
        f"CAST(c AS BIGINT) AS pair_count FROM b{i}"
        for i in range(1, int(n_merges) + 1))
    return "WITH " + ",\n".join(parts) + "\n" + sel


def bpe_encode(df, merges, text_col: str = "text", id_col: str = "doc_id"):
    """Apply a trained BPE merge list (from ``bpe_train``) to the
    corpus: each word is wrapped (``"ab" -> "⟨a⟩⟨b⟩"``) and the merges
    replay IN RANK ORDER as chained ``replace`` calls — the same
    wrapped-string trick as training, so application is greedy BPE,
    engine-exact.

    The whole encode is one codegen projection (array transform over
    the word list, no shuffle, no UDF).  The replace chain is
    O(n_merges) passes per word, fine for the inline-expression sizes
    Catalyst handles (hundreds); for production-size merge lists (30k+)
    encode the DISTINCT-word table once and join it back — same
    functions, one extra aggregate + join — rather than inlining a
    30k-deep expression.

    Returns (id_col, n_tokens, encoded) where ``encoded`` is the
    space-joined token sequence.
    """
    from pyspark.sql import functions as F
    if hasattr(merges, "collect"):
        merges = [(r["lhs"], r["rhs"])
                  for r in merges.orderBy("rank").collect()]

    def enc(w):
        s = F.regexp_replace(w, "(.)", "⟨$1⟩")
        for l, r in merges:
            s = F.replace(s, F.lit(f"⟨{l}⟩⟨{r}⟩"), F.lit(f"⟨{l}{r}⟩"))
        return F.regexp_extract_all(s, F.lit("⟨([^⟩]*)⟩"), 1)

    toks = F.flatten(F.transform(TX.tokens(text_col), enc))
    return df.select(F.col(id_col),
                     F.size(toks).alias("n_tokens"),
                     F.concat_ws(" ", toks).alias("encoded"))


def bpe_encode_oracle_sql(n_merges: int = 16, table: str = "documents",
                          text_col: str = "text",
                          id_col: str = "doc_id") -> str:
    """ANSI-SQL mirror of ``bpe_train(n_merges)`` + ``bpe_encode`` over
    the same corpus: the unrolled training CTEs produce the merge list,
    a one-row CTE pivots the 2·n_merges merge sides into columns, and
    the encode lambda replays the replace chain per word."""
    # reuse the train SQL's WITH chain, dropping its final SELECT
    train = bpe_oracle_sql(n_merges, table=table, text_col=text_col)
    with_sql = train[:train.index("SELECT 1 AS rank")].rstrip() + ","
    m_cols = ", ".join(
        f"(SELECT l FROM b{i}) AS l{i}, (SELECT r FROM b{i}) AS r{i}"
        for i in range(1, int(n_merges) + 1))
    chain = "regexp_replace(w, '(.)', '⟨\\1⟩', 'g')"
    for i in range(1, int(n_merges) + 1):
        chain = (f"replace({chain}, "
                 f"'⟨' || l{i} || '⟩⟨' || r{i} || '⟩', "
                 f"'⟨' || l{i} || r{i} || '⟩')")
    return f"""{with_sql}
m AS MATERIALIZED (SELECT {m_cols}),
src AS (
  SELECT {id_col}, list_filter(
      regexp_split_to_array(lower({text_col}), '[^\\p{{L}}\\p{{N}}]+'),
      x -> x != '') AS words
  FROM {table}),
enc AS (
  SELECT {id_col},
         flatten(list_transform(words,
             w -> regexp_extract_all({chain}, '⟨([^⟩]*)⟩', 1))) AS toks
  FROM src, m)
SELECT {id_col}, CAST(len(toks) AS INT) AS n_tokens,
       array_to_string(toks, ' ') AS encoded
FROM enc"""


def dedup_lines(df, text_col: str = "text", id_col: str = "doc_id",
                sep: str = "\n"):
    """C4-style GLOBAL line-level deduplication: every line that occurs
    more than once across the whole corpus is kept only at its first
    occurrence (ordered by (doc, line ordinal) — the deterministic
    total order), all other occurrences are dropped, and each document
    is reassembled from its surviving lines in order.

    The line-removal step of the C4 cleaning recipe (boilerplate,
    navigation chrome, repeated disclaimers vanish corpus-wide while
    the first copy survives).

    Scale shape: one shuffle partitioned by the line text for the
    first-occurrence window, one shuffle back on the doc id for
    reassembly — both map-side-combinable aggregating shapes; nothing
    is all-pairs.  (At 100 TB pre-hash the line to a 128-bit key so the
    exchange carries hashes, not text — same plan, smaller shuffle.)

    Returns (id_col, text_deduped, n_lines, n_kept).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), sep, -1))
        .alias("__ln", "__line"))
    w = Window.partitionBy("__line").orderBy("__id", "__ln")
    kept = (lines.withColumn("__rk", F.row_number().over(w))
            .withColumn("__keep", F.col("__rk") == 1))
    return (kept.groupBy("__id")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum(F.col("__keep").cast("long")).alias("n_kept"),
                 F.concat_ws(sep, F.transform(
                     F.array_sort(F.collect_list(
                         F.when(F.col("__keep"),
                                F.struct("__ln", "__line")))),
                     lambda s: s["__line"])).alias("text_deduped"))
            .select(F.col("__id").alias(id_col), "text_deduped",
                    "n_lines", "n_kept"))


def source_overlap(df, text_col: str = "text", id_col: str = "doc_id",
                   group_col: str = "source", n: int = 3):
    """Pairwise cross-source n-gram overlap matrix — the corpus-hygiene
    view of which provenance sources share content (mirror sites, common
    boilerplate, cross-source leakage) before mixing weights are chosen.

    Returns one row per unordered source pair (src_a < src_b):
    (src_a, src_b, grams_a, grams_b, shared_grams, jaccard_micro) with
    jaccard_micro = floor(shared / (a + b - shared) · 1e6) in exact
    int64 — engine-replayable, no float division.

    Scale shape: per-doc distinct grams (word_ngram_rows: posexplode +
    window leads, no arrays through shuffles) → ONE distinct on
    (source, gram) → a self-equi-join on gram.  A gram present in k
    sources contributes C(k,2) pair rows, and k is bounded by the
    number of sources — a corpus-provenance dimension that is small by
    nature — so the join fan-out is bounded per gram; nothing is
    all-pairs in the document dimension.  Pairs with zero shared grams
    still appear (cross join of the tiny per-source summary)."""
    from pyspark.sql import functions as F

    grams = word_ngram_rows(df, text_col, id_col, n)
    src = df.select(F.col(id_col).alias("__id"),
                    F.col(group_col).alias("__src"))
    sg = grams.join(src, "__id").select("__src", "g").distinct()
    per = sg.groupBy("__src").agg(F.count(F.lit(1)).alias("n_grams"))
    shared = (sg.alias("a").join(sg.alias("b"), "g")
              .filter(F.col("a.__src") < F.col("b.__src"))
              .groupBy(F.col("a.__src").alias("src_a"),
                       F.col("b.__src").alias("src_b"))
              .agg(F.count(F.lit(1)).alias("shared_grams")))
    pa = per.select(F.col("__src").alias("src_a"),
                    F.col("n_grams").alias("grams_a"))
    pb = per.select(F.col("__src").alias("src_b"),
                    F.col("n_grams").alias("grams_b"))
    allp = pa.join(pb, pa.src_a < pb.src_b)
    out = (allp.join(shared, ["src_a", "src_b"], "left")
           .withColumn("shared_grams",
                       F.coalesce(F.col("shared_grams"),
                                  F.lit(0).cast("long")))
           .withColumn(
               "jaccard_micro",
               F.expr("(shared_grams * 1000000) div "
                      "(grams_a + grams_b - shared_grams)")))
    return out.select("src_a", "src_b", "grams_a", "grams_b",
                      "shared_grams", "jaccard_micro")


def robust_stats(df, value_col: str, key_col: str, id_col: str,
                 scale: int = 100, trim_pct: int = 5):
    """Per-group robust statistics for outlier-aware quality gating:
    exact lower-median, MAD (median absolute deviation), and a
    winsorized mean, all in scaled int64 units (floor(value·scale)) so
    a SQL oracle replays every statistic exactly.

    Deterministic contract (what the oracle mirrors):
    - ranks order by (scaled value, id) — ties are total-ordered;
    - median = the ((n+1) div 2)-th smallest (lower median — no
      float interpolation);
    - MAD = lower median of |v - median| under the same rank rule;
    - winsorized mean = sum(clamp(v, lo, hi)) div n with
      lo = value at rank max(1, (trim·n) div 100) and
      hi = value at rank (( (100-trim)·n + 99) div 100) (ceil).

    Scale shape: three key-partitioned window passes + broadcast-size
    per-key joins — everything shuffles on the group key once per pass,
    no all-pairs anywhere."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = df.select(F.col(key_col).alias("k"),
                     F.floor(F.col(value_col) * scale).cast("long")
                     .alias("v"),
                     F.col(id_col).alias("i"))
    w = Window.partitionBy("k").orderBy("v", "i")
    wn = Window.partitionBy("k")
    r = (base.withColumn("rn", F.row_number().over(w))
         .withColumn("n", F.count(F.lit(1)).over(wn)))
    med = (r.filter(F.col("rn") == F.expr("(n + 1) div 2"))
           .select("k", F.col("v").alias("med"), "n"))
    lo = (r.filter(F.col("rn")
                   == F.expr(f"greatest(1, ({trim_pct} * n) div 100)"))
          .select("k", F.col("v").alias("lo")))
    hi = (r.filter(F.col("rn")
                   == F.expr(f"(({100 - trim_pct} * n) + 99) div 100"))
          .select("k", F.col("v").alias("hi")))
    dev = (base.join(med, "k")
           .withColumn("d", F.abs(F.col("v") - F.col("med"))))
    wd = Window.partitionBy("k").orderBy("d", "i")
    mad = (dev.withColumn("rn", F.row_number().over(wd))
           .filter(F.col("rn") == F.expr("(n + 1) div 2"))
           .select("k", F.col("d").alias("mad")))
    wins = (base.join(lo, "k").join(hi, "k")
            .groupBy("k")
            .agg(F.sum(F.greatest(F.col("lo"),
                                  F.least(F.col("hi"), F.col("v"))))
                 .alias("s"), F.count(F.lit(1)).alias("n2")))
    return (med.join(mad, "k").join(wins, "k")
            .select(F.col("k").alias(key_col),
                    F.col("n").alias("n_rows"),
                    F.col("med").alias("median_scaled"),
                    F.col("mad").alias("mad_scaled"),
                    F.expr("s div n2").alias("winsor_mean_scaled")))
