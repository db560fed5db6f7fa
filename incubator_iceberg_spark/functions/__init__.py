"""Training-data pipeline functions (SURVEY.md §2.9 / M9 extensions):

- text       — language-ID, quality scoring, token counting, fingerprinting,
               PII scrubbing
- dedup      — exact (+keep-best, incremental), minhash-LSH, simhash,
               n-gram jaccard, connected components
- similarity — brute-force cosine top-k, LSH/IVF ANN (+persistent stored
               indexes), SQ8 scalar quantization, semantic dedup
- corpus     — chunking, packing, mixture/stratified/token-budget
               sampling, tf-idf, decontamination, repetition stats,
               splits, span dedup, shuffle-shards, certified heavy
               hitters, KMV distinct sketch, inverted postings, ranked
               retrieval (search_topk)
- similarity — (also) exact-integer distributed k-means
- graph      — exact-integer PageRank, degree-oriented triangle count,
               market-basket lift/confidence
- analytics  — exact 2-D skyline (Pareto frontier), salted two-pass
- temporal   — as-of joins, grid-bucketed interval joins, rolling windows
- sessions   — gap sessionization (batch + streaming), funnel analysis,
               cohort retention
- multimodal — binary media columns with typed metadata, decode stubs
- skew       — salted aggregation/join helpers

Everything stays JVM-side (built-in ``pyspark.sql.functions`` higher-order
functions) except clearly-marked media decode stubs and the documented
Arrow-batched sketch/pack/verify stages.
"""

from incubator_iceberg_spark.functions import (
    analytics,
    corpus,
    dedup,
    graph,
    multimodal,
    sessions,
    similarity,
    skew,
    temporal,
    text,
)

__all__ = ["analytics", "corpus", "dedup", "graph", "multimodal",
           "sessions", "similarity", "skew", "temporal", "text"]
