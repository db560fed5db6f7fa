"""Training-data pipeline functions (SURVEY.md §2.9 / M9 extensions):

- text      — language-ID, quality scoring, token counting, fingerprinting
- dedup     — exact, minhash-LSH, simhash, n-gram jaccard
- similarity — brute-force cosine top-k + LSH-bucketed ANN
- multimodal — binary media columns with typed metadata, decode stubs

Everything stays JVM-side (built-in ``pyspark.sql.functions`` higher-order
functions) except clearly-marked media decode stubs.
"""

from incubator_iceberg_spark.functions import text, dedup, similarity, multimodal, skew

__all__ = ["text", "dedup", "similarity", "multimodal", "skew"]
