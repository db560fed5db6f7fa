"""Deduplication operators for large-scale corpus cleaning (M9).

All variants are pure DataFrame pipelines (shuffle-conscious, no UDFs):

- exact_dedup        — hash-groupBy; one shuffle on the content hash.
- minhash_lsh_pairs  — shingle → minhash (n seeded xxhash64 mins) → band →
                       bucket self-join → jaccard verify.  The classic
                       MinHashLSH pipeline expressed with higher-order
                       Column functions; band join keeps the self-join from
                       being O(n²) at 100 TB.
- simhash            — 64-bit sign-aggregated token hashes; near-dups have
                       small hamming distance.
- ngram_jaccard_pairs — exact jaccard over word n-grams for candidate pairs
                       (verification stage or small corpora).
"""

from __future__ import annotations

from incubator_iceberg_spark.functions import text as TX


def content_hash(col):
    from pyspark.sql import functions as F
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c)


def _materialize_and_release(result, intermediates):
    """Persist + materialize ``result`` (small: verified pairs), then
    unpersist the large ``intermediates`` (signature/size caches).  Without
    this, repeated invocations in a long-lived session accumulate executor
    storage memory: the lazily-returned result pins the intermediate caches
    forever.  The returned DataFrame is itself persisted; callers that are
    done with it may ``.unpersist()`` — its footprint is O(pairs), not
    O(corpus)."""
    result = result.persist()
    result.count()
    for df in intermediates:
        df.unpersist()
    return result


def exact_dedup(df, text_col: str = "text", id_col: str = "doc_id", keep: str = "min"):
    """Keep one row per exact content match (hash-groupBy dedup).  Uses a
    min/max-of-id groupBy + semi-join instead of a window: both shuffle
    once on the hash, but the agg gets map-side partial aggregation."""
    from pyspark.sql import functions as F
    h = content_hash(text_col).alias("__h")
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    keep_ids = (df.select(h, F.col(id_col))
                .groupBy("__h").agg(agg.alias(id_col))
                .select(id_col))
    return df.join(keep_ids, id_col, "left_semi")


def minhash_signature(col, num_hashes: int = 32, shingle_size: int = 5):
    """Array of ``num_hashes`` minhash values over character shingles.
    Seeded hash i = xxhash64(i, shingle) (Spark's xxhash64 is keyed by the
    extra column — no UDF needed)."""
    from pyspark.sql import functions as F
    shingles = TX.char_ngrams(col, shingle_size)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(shingles, lambda s: F.xxhash64(i, s))))


def minhash_lsh_pairs(df, text_col: str = "text", id_col: str = "doc_id",
                      num_hashes: int = 32, bands: int = 8, shingle_size: int = 5,
                      jaccard_threshold: float = 0.6,
                      max_bucket_size: int = 1000):
    """Candidate near-duplicate pairs (id_a < id_b) with verified shingle
    jaccard ≥ threshold.

    Pipeline: signature → explode band hashes → groupBy bucket join →
    distinct candidate pairs → verify with exact jaccard on shingle sets.

    Hot-bucket cap (the standard guard in production LSH dedup): the banded
    self-join is quadratic PER BUCKET, so one boilerplate bucket with 10⁶
    ids would put O(10¹²) pairs on a single reducer.  Buckets larger than
    ``max_bucket_size`` are collapsed to STAR pairs (bucket-min ↔ member):
    O(n) per bucket.  Precise semantics of the trade: the CANDIDATE graph
    keeps every hot-bucket member connected to the bucket min, so a
    degenerate bucket of mutually-identical docs still dedups fully (all
    pairs verify at jaccard 1.0 through the min).  A pair of merely
    SIMILAR docs whose only co-occurring bands are hot can be missed when
    neither verifies against the bucket min — that recall loss is
    inherent to every hot-bucket guard (the common alternative, dropping
    the bucket outright, loses strictly more), is bounded by the other
    ``bands-1`` bands each pair hashes into, and only applies past a
    threshold tuned to be degenerate-only.  The number of capped buckets
    is logged so operators see when it fires.
    """
    import logging
    from pyspark.sql import functions as F
    rows_per_band = num_hashes // bands
    # materialize shingles ONCE, then hash the materialized array — deriving
    # shingles inside each of the num_hashes min-hash expressions re-runs
    # the substring explosion num_hashes times (measured 30×+ slower).
    # repartition first: signature hashing is CPU-bound and must not be
    # gated on the input file count
    par = df.sparkSession.sparkContext.defaultParallelism
    # signature via explode + groupBy(min(xxhash64(i, shingle))): higher-order
    # array lambdas run interpreted row-by-row, but hash+min aggregates stay
    # inside whole-stage codegen with map-side partial aggregation — same
    # values (xxhash64(lit(i), s) == xxhash64(seq_elem_i, s)), ~10× faster,
    # and the shuffle is pre-aggregated so it scales with docs, not shingles.
    # Signatures come straight off the aggregate — no join-back onto the
    # shingled base and no O(corpus) shingle cache: the band probe needs
    # only (id, sig), and the exact verify re-derives shingles for the
    # CANDIDATE docs after the pair joins (same shape as
    # fuzzy_decontaminate).  repartition first: signature hashing is
    # CPU-bound and must not be gated on the input file count.
    ex = (df.repartition(par)
          .select(F.col(id_col).alias("__id"),
                  F.explode_outer(TX.char_ngrams(text_col, shingle_size))
                  .alias("__s")))
    sig = (ex.groupBy("__id").agg(
        *[F.min(F.xxhash64(F.lit(i), F.col("__s"))).alias(f"__h{i}")
          for i in range(num_hashes)])
        .select("__id",
                F.array(*[F.col(f"__h{i}") for i in range(num_hashes)])
                .alias("__sig")))
    # three downstream branches (bands + both verify sides) read this —
    # O(docs × num_hashes) longs, tiny next to the old shingle cache; the
    # hot-bucket count below materializes it before the branches fan out
    sig = sig.persist()
    banded = sig.select(
        "__id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(F.concat_ws(
                    ",", F.transform(F.slice(F.col("__sig"), b * rows_per_band + 1,
                                             rows_per_band),
                                     lambda v: v.cast("string")))).alias("bucket")),
        )).alias("bb"))
    banded = banded.select("__id", F.col("bb.band").alias("band"),
                           F.col("bb.bucket").alias("bucket"))
    # hot-bucket guard: size every (band, bucket) first (map-side combined
    # aggregate — one shuffle on the bucket key the join needs anyway)
    sizes = (banded.groupBy("band", "bucket")
             .agg(F.count(F.lit(1)).alias("__n"),
                  F.min("__id").alias("__min_id")))
    sizes = sizes.persist()
    n_hot = sizes.filter(F.col("__n") > max_bucket_size).count()
    if n_hot:
        logging.getLogger(__name__).warning(
            "minhash_lsh_pairs: %d hot bucket(s) over max_bucket_size=%d "
            "collapsed to star pairs", n_hot, max_bucket_size)
    tagged = banded.join(sizes, ["band", "bucket"])
    small = tagged.filter(F.col("__n") <= max_bucket_size)
    all_pairs = (small.alias("a")
                 .join(small.alias("b"),
                       (F.col("a.band") == F.col("b.band"))
                       & (F.col("a.bucket") == F.col("b.bucket"))
                       & (F.col("a.__id") < F.col("b.__id")))
                 .select(F.col("a.__id").alias("id_a"),
                         F.col("b.__id").alias("id_b")))
    star_pairs = (tagged.filter((F.col("__n") > max_bucket_size)
                                & (F.col("__id") > F.col("__min_id")))
                  .select(F.col("__min_id").alias("id_a"),
                          F.col("__id").alias("id_b")))
    cand = all_pairs.unionByName(star_pairs).distinct()
    # cheap signature-estimate prefilter (fraction of equal minhashes ≈
    # jaccard) before the exact shingle-set verification — an O(num_hashes)
    # compare instead of O(|shingles|) intersect for the losers
    est = (F.size(F.filter(F.zip_with(F.col("sig_a"), F.col("sig_b"),
                                      lambda a, b: a == b),
                           lambda x: x)).cast("double") / F.lit(num_hashes))
    survivors = (cand
                 .join(sig.select(F.col("__id").alias("id_a"),
                                  F.col("__sig").alias("sig_a")), "id_a")
                 .join(sig.select(F.col("__id").alias("id_b"),
                                  F.col("__sig").alias("sig_b")), "id_b")
                 .withColumn("__est", est)
                 .filter(F.col("__est") >= jaccard_threshold * 0.5)
                 .select("id_a", "id_b"))
    # exact verify re-derives shingles AFTER the pair joins attach the
    # candidate docs' texts, so the substring explosion runs only for the
    # est-surviving pairs — O(candidates), not O(corpus)
    texts = df.select(F.col(id_col).alias("__id"),
                      F.col(text_col).alias("__t"))
    verified = (survivors
                .join(texts.select(F.col("__id").alias("id_a"),
                                   F.col("__t").alias("__ta")), "id_a")
                .join(texts.select(F.col("__id").alias("id_b"),
                                   F.col("__t").alias("__tb")), "id_b")
                .withColumn("sh_a", TX.char_ngrams("__ta", shingle_size))
                .withColumn("sh_b", TX.char_ngrams("__tb", shingle_size))
                .withColumn("jaccard", _jaccard(F.col("sh_a"), F.col("sh_b")))
                .filter(F.col("jaccard") >= jaccard_threshold)
                .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))
    return _materialize_and_release(verified, [sig, sizes])


def _jaccard(a, b):
    from pyspark.sql import functions as F
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(df, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.5):
    """Exact n-gram jaccard over all pairs sharing ≥1 n-gram (inverted-index
    join — shuffle on the n-gram, never a cartesian).

    Grams come from posexplode + window ``lead``s, and jaccard from pure
    COUNT aggregates (|A∩B| from the inverted join, |A|/|B| from per-doc
    gram counts): no array columns ever ship through a shuffle and no
    interpreted higher-order lambdas run per row — the array-lambda
    formulation was measured 30×+ slower on 500 docs."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    toks = df.select(F.col(id_col).alias("__id"),
                     F.posexplode_outer(TX.tokens(text_col))
                     .alias("__p", "__t"))
    w = Window.partitionBy("__id").orderBy("__p")
    cols = [F.col("__t")] + [F.lead("__t", k).over(w) for k in range(1, n)]
    g = (toks.select("__id", *[c.alias(f"__t{k}") for k, c in enumerate(cols)])
         .filter(F.col(f"__t{n-1}").isNotNull())
         .select("__id", F.concat_ws(" ", *[F.col(f"__t{k}")
                                            for k in range(n)]).alias("g"))
         .distinct())
    g = g.persist()
    sizes = g.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))
    inter = (g.alias("a")
             .join(g.alias("b"), (F.col("a.g") == F.col("b.g"))
                   & (F.col("a.__id") < F.col("b.__id")))
             .groupBy(F.col("a.__id").alias("id_a"),
                      F.col("b.__id").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("__i")))
    out = (inter
           .join(sizes.select(F.col("__id").alias("id_a"),
                              F.col("__n").alias("__na")), "id_a")
           .join(sizes.select(F.col("__id").alias("id_b"),
                              F.col("__n").alias("__nb")), "id_b")
           .withColumn("jaccard", F.col("__i")
                       / (F.col("__na") + F.col("__nb") - F.col("__i")))
           .filter(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))
    return _materialize_and_release(out, [g])


def connected_components(pairs, id_a: str = "id_a", id_b: str = "id_b",
                         max_iter: int = 20):
    """Duplicate GROUPS from near-dup pairs: min-label propagation until
    fixpoint — the keep-one decision for TRANSITIVE duplicate clusters
    (pairs alone under-delete: a~b, b~c ⇒ {a,b,c} is one group even if
    a~c was never emitted).

    Iterative label propagation (the simplified small-star pattern used
    in production CC over edge lists): each round every node takes the
    min label among itself and its neighbors; rounds needed = graph
    diameter, and near-dup clusters are shallow.  All joins shuffle on
    the node id only; no driver-side graph materialization.

    Returns (node, label) for every node appearing in ``pairs``, where
    label = min id of the node's component.
    """
    from pyspark.sql import functions as F

    edges = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    edges = (edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct().persist())
    # localCheckpoint (not persist): the loop would otherwise chain every
    # round's joins into one ever-deeper logical plan — lineage truncation
    # is mandatory for iterative DataFrame algorithms
    labels = (edges.select(F.col("a").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint(eager=True))
    for _ in range(max_iter):
        prop = (edges.join(labels, edges["a"] == labels["node"])
                .groupBy(F.col("b").alias("node"))
                .agg(F.min("label").alias("nlabel")))
        # carry the OLD label through the checkpointed projection so
        # convergence detection is a scan of the checkpoint, not another
        # join-with-previous-labels job per round
        staged = (labels.alias("l")
                  .join(prop.alias("p"), "node", "left")
                  .select("node", F.col("label").alias("__old"),
                          F.least(F.col("label"),
                                  F.coalesce(F.col("nlabel"),
                                             F.col("label")))
                          .alias("label"))
                  .localCheckpoint(eager=True))
        changed = (staged.filter(F.col("__old") != F.col("label"))
                   .limit(1).count())
        labels = staged.select("node", "label")
        if changed == 0:
            break
    else:
        import logging
        logging.getLogger(__name__).warning(
            "connected_components: max_iter=%d reached before fixpoint — "
            "labels for components with diameter > max_iter are NOT "
            "converged; raise max_iter", max_iter)
    edges.unpersist()
    return labels


def simhash(col, bits: int = 64):
    """64-bit SimHash of the token multiset, entirely in Column algebra:
    per-token xxhash64 → per-bit ±1 votes → sign bits recomposed.  Bit
    indices are Python ints (shiftright/shiftleft take literal counts)."""
    from pyspark.sql import functions as F
    toks = TX.tokens(col)
    votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0), bits),
        lambda acc, t: F.zip_with(
            acc,
            F.array(*[F.when(
                F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1)) == 1,
                F.lit(1)).otherwise(F.lit(-1)) for i in range(bits)]),
            lambda a, b: a + b))
    # two's-complement bit values; bit 63 is the (negative) sign bit
    powers = F.array(*[
        F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long") for i in range(bits)])
    return F.aggregate(
        F.zip_with(votes, powers,
                   lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x))


def hamming_distance(a, b):
    from pyspark.sql import functions as F
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(df, text_col: str = "text", id_col: str = "doc_id",
                  max_distance: int = 3, block_bits: int = 16,
                  max_bucket_size: int = 1000):
    """Near-dup pairs by simhash hamming distance ≤ max_distance.  Blocks
    on 16-bit chunks (pigeonhole: ≤3 differing bits ⇒ at least one of 4
    chunks identical) so the join is bucketed, not cartesian.

    Chunk-key buckets larger than ``max_bucket_size`` are collapsed to star
    pairs (bucket-min ↔ member) like ``minhash_lsh_pairs`` — a degenerate
    corpus of identical docs otherwise makes the block join O(n²) on one
    reducer.  Identical docs (distance 0 to the min) always survive; a
    member pair within ``max_distance`` of each other but beyond it from
    the bucket min can be missed if its other three chunks are also hot —
    the inherent hot-bucket trade (see minhash_lsh_pairs docstring).
    Capped buckets are logged."""
    import logging
    from pyspark.sql import functions as F
    par = df.sparkSession.sparkContext.defaultParallelism
    sh = (df.repartition(par)
          .filter(F.col(text_col).isNotNull())  # null text → null hash → no pairs (as before)
          .select(F.col(id_col).alias("__id"), TX.tokens(text_col).alias("__t"))
          .select("__id", F.explode_outer("__t").alias("__tok")))
    # per-bit ±1 votes as 64 codegen'd SUM aggregates (the array-lambda form
    # of simhash() runs interpreted; explode+groupBy keeps whole-stage
    # codegen and map-side partial aggregation — same bits)
    h = F.xxhash64(F.col("__tok"))
    votes = sh.groupBy("__id").agg(
        *[F.sum(F.when(F.col("__tok").isNull(), F.lit(0)).otherwise(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)))
          .alias(f"__v{i}") for i in range(64)])
    bit = [F.when(F.col(f"__v{i}") > 0,
                  F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long"))
           .otherwise(F.lit(0).cast("long")) for i in range(64)]
    acc = bit[0]
    for b in bit[1:]:
        acc = acc.bitwiseOR(b)
    sh = votes.select("__id", acc.alias("__sh")).persist()
    n_chunks = 64 // block_bits
    chunk_arr = F.array(*[
        F.struct(F.lit(i).alias("chunk"),
                 F.shiftright(F.col("__sh"), i * block_bits)
                 .bitwiseAND(F.lit((1 << block_bits) - 1)).alias("key"))
        for i in range(n_chunks)])
    chunks = sh.select("__id", "__sh", F.explode(chunk_arr).alias("c"))
    chunks = chunks.select("__id", "__sh", F.col("c.chunk").alias("chunk"),
                           F.col("c.key").alias("key"))
    sizes = (chunks.groupBy("chunk", "key")
             .agg(F.count(F.lit(1)).alias("__n"),
                  F.min("__id").alias("__min_id")))
    sizes = sizes.persist()
    n_hot = sizes.filter(F.col("__n") > max_bucket_size).count()
    if n_hot:
        logging.getLogger(__name__).warning(
            "simhash_pairs: %d hot chunk bucket(s) over max_bucket_size=%d "
            "collapsed to star pairs", n_hot, max_bucket_size)
    tagged = chunks.join(sizes, ["chunk", "key"])
    small = tagged.filter(F.col("__n") <= max_bucket_size)
    all_pairs = (small.alias("a")
                 .join(small.alias("b"),
                       (F.col("a.chunk") == F.col("b.chunk"))
                       & (F.col("a.key") == F.col("b.key"))
                       & (F.col("a.__id") < F.col("b.__id")))
                 .select(F.col("a.__id").alias("id_a"),
                         F.col("b.__id").alias("id_b"),
                         hamming_distance(F.col("a.__sh"),
                                          F.col("b.__sh")).alias("distance")))
    # star pairs need the bucket-min's hash for the distance column: join
    # the (small, aggregated) sizes frame back to the signature table
    min_sh = sh.select(F.col("__id").alias("__min_id"),
                       F.col("__sh").alias("__min_sh"))
    star_pairs = (tagged.filter((F.col("__n") > max_bucket_size)
                                & (F.col("__id") > F.col("__min_id")))
                  .join(F.broadcast(
                      sizes.filter(F.col("__n") > max_bucket_size)
                      .select("__min_id").distinct()
                      .join(min_sh, "__min_id")), "__min_id")
                  .select(F.col("__min_id").alias("id_a"),
                          F.col("__id").alias("id_b"),
                          hamming_distance(F.col("__min_sh"),
                                           F.col("__sh")).alias("distance")))
    out = (all_pairs.unionByName(star_pairs)
           .distinct()
           .filter(F.col("distance") <= max_distance))
    return _materialize_and_release(out, [sh, sizes])


def exact_dedup_keep_best(df, score, text_col: str = "text",
                          id_col: str = "doc_id"):
    """Cluster resolution for exact duplicates: keep the BEST copy per
    content group instead of an arbitrary one — rank within the content
    hash by ``score`` (a Column, higher wins) with the id as the
    deterministic tie-break.  The usual final step of a dedup pipeline:
    duplicates differ in metadata (source, fetch time) even when the text
    is identical, and the kept copy should be the highest-quality one.

    Scale shape: same single shuffle on the content hash as
    ``exact_dedup`` — a max_by groupBy (map-side partial agg) + one
    semi-join; no window, no arrays through the shuffle."""
    from pyspark.sql import functions as F
    h = content_hash(text_col).alias("__h")
    ranked = df.select(h, F.col(id_col).alias("__id"),
                       score.alias("__score"))
    # max_by on the (score, -id) pair: highest score, ties → smallest id
    best = (ranked.groupBy("__h")
            .agg(F.max_by(F.col("__id"),
                          F.struct(F.col("__score").alias("s"),
                                   (-F.col("__id")).alias("i")))
                 .alias(id_col))
            .select(id_col))
    return df.join(best, id_col, "left_semi")


def incremental_dedup(batch_df, corpus_df, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Continuous-ingest dedup: drop batch rows whose content already
    exists in the corpus, then exact-dedup WITHIN the batch (keep min
    id).  The steady-state shape of a training-data pipeline — each
    arriving batch is deduped against everything already accepted
    without ever re-deduping the corpus itself.

    Scale shape: the corpus side is reduced to DISTINCT hashes before
    the anti-join (shuffle carries 8-byte hashes, not documents); both
    joins co-partition on the hash, so at 100 TB the corpus hash set
    can also be maintained as a bucketed table and the shuffle skipped
    entirely."""
    from pyspark.sql import functions as F
    batch_h = batch_df.withColumn("__h", content_hash(text_col))
    corpus_h = corpus_df.select(content_hash(text_col).alias("__h")).distinct()
    fresh = batch_h.join(corpus_h, "__h", "left_anti")
    keep = (fresh.groupBy("__h").agg(F.min(id_col).alias(id_col))
            .select(id_col))
    return batch_df.join(keep, id_col, "left_semi")


def fuzzy_decontaminate(corpus_df, eval_df, text_col: str = "text",
                        id_col: str = "doc_id", eval_text_col: str = "text",
                        eval_id_col: str = "eval_id", num_hashes: int = 32,
                        bands: int = 8, shingle_size: int = 5,
                        jaccard_threshold: float = 0.8):
    """NEAR-duplicate eval-set decontamination — the fuzzy complement of
    ``corpus.ngram_contamination`` (which catches verbatim gram overlap):
    a lightly-reworded benchmark document still contaminates, and this
    finds it by MinHash similarity instead of exact grams.

    Scale shape exploits the asymmetry: the eval set is SMALL (benchmark
    suites are thousands of docs), so its signatures, band buckets, and
    shingle sets are BROADCAST.  The corpus side pays one shingle
    explode + map-side-combined min-hash aggregate (shuffle scales with
    docs, not shingles), then a broadcast band-bucket join and a
    broadcast exact-jaccard verify — the corpus never self-joins and
    never shuffles on bucket keys.  Returns ``(id, eval_id, jaccard)``
    for every corpus doc whose verified shingle jaccard with an eval doc
    meets the threshold."""
    from pyspark.sql import functions as F

    rows_per_band = num_hashes // bands

    def sig_of(df, idc, txc, out_id, wide):
        """Minhash array per doc — explode + map-side-combined min
        aggregate (the codegen-friendly shape; see minhash_lsh_pairs).
        Returns ONLY (id, __sig): the band probe needs nothing else, and
        the verify recomputes shingles for just the candidate docs —
        carrying the shingle arrays here forced a join-back plus two
        persisted caches sized by the whole corpus."""
        base = df.select(F.col(idc).alias(out_id),
                         TX.char_ngrams(txc, shingle_size).alias("__sh"))
        if wide:
            # CPU-bound signature hashing must not be gated on input
            # file count
            par = df.sparkSession.sparkContext.defaultParallelism
            base = base.repartition(par)
        ex = base.select(out_id, F.explode_outer("__sh").alias("__s"))
        mins = ex.groupBy(out_id).agg(
            *[F.min(F.xxhash64(F.lit(i), F.col("__s"))).alias(f"__h{i}")
              for i in range(num_hashes)])
        return mins.select(
            out_id,
            F.array(*[F.col(f"__h{i}") for i in range(num_hashes)])
            .alias("__sig"))

    def banded_of(sig, out_id):
        bb = sig.select(
            out_id,
            F.explode(F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.concat_ws(
                        ",", F.transform(
                            F.slice(F.col("__sig"), b * rows_per_band + 1,
                                    rows_per_band),
                            lambda v: v.cast("string")))).alias("bucket")),
            )).alias("bb"))
        return bb.select(out_id, F.col("bb.band").alias("band"),
                         F.col("bb.bucket").alias("bucket"))

    corpus_sig = sig_of(corpus_df, id_col, text_col, "__cid", wide=True)
    eval_sig = sig_of(eval_df, eval_id_col, eval_text_col, "__eid",
                      wide=False)

    # ONE pass over the corpus: scan → shingle → minhash aggregate →
    # band explode → broadcast probe against the eval bands.  No persist:
    # the band probe is the signature's only consumer.
    cand = (banded_of(corpus_sig, "__cid")
            .join(F.broadcast(banded_of(eval_sig, "__eid")),
                  ["band", "bucket"])
            .select("__cid", "__eid").distinct())
    # exact verify re-derives shingles AFTER the broadcast candidate
    # join, so the substring explosion runs only for candidate docs —
    # O(collisions), not O(corpus)
    verified = (corpus_df.select(F.col(id_col).alias("__cid"),
                                 F.col(text_col).alias("__ct"))
                .join(F.broadcast(cand), "__cid")
                .join(F.broadcast(eval_df.select(
                    F.col(eval_id_col).alias("__eid"),
                    TX.char_ngrams(eval_text_col, shingle_size)
                    .alias("sh_e"))), "__eid")
                .withColumn("sh_c", TX.char_ngrams("__ct", shingle_size))
                .withColumn("jaccard", _jaccard(F.col("sh_c"), F.col("sh_e")))
                .filter(F.col("jaccard") >= jaccard_threshold)
                .select(F.col("__cid").alias(id_col),
                        F.col("__eid").alias(eval_id_col),
                        F.round("jaccard", 6).alias("jaccard")))
    return _materialize_and_release(verified, [])
