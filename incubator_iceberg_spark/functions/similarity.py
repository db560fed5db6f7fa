"""Similarity search over embedding columns (``array<float>``) — M9.

- cosine_topk       — brute-force exact top-k: ``F.zip_with`` dot product +
                      sort; the correctness baseline.
- cosine_join_topk  — top-k neighbors for EVERY query row via broadcast of
                      the (small) query side + window rank.
- lsh_ann_topk      — random-hyperplane LSH buckets (sign bits of seeded
                      deterministic planes) restrict the candidate set; the
                      scale path: candidates per query ≈ n / 2^bits·probes.

No UDFs: the dot product is ``aggregate(zip_with(...))`` inside codegen.
"""

from __future__ import annotations

import math


def _dot(a, b):
    from pyspark.sql import functions as F
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    from pyspark.sql import functions as F
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a, b):
    """Cosine over double-cast arrays (float32 inputs are widened so the
    arithmetic matches a float64 oracle bit-for-bit)."""
    from pyspark.sql import functions as F
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(df, query_vec, k: int = 10, vec_col: str = "embedding",
                id_col: str = "vec_id"):
    """Exact top-k rows most similar to one query vector."""
    from pyspark.sql import functions as F
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(F.col(id_col),
                       F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"))
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def cosine_join_topk(df, queries_df, k: int = 10, vec_col: str = "embedding",
                     id_col: str = "vec_id", q_id_col: str = "q_id",
                     q_vec_col: str = "q_vec"):
    """Exact k-NN join: every query row gets its top-k corpus neighbors.
    Queries are broadcast (small dim table); the corpus never shuffles
    until the per-query rank."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    joined = df.join(F.broadcast(queries_df))
    scored = joined.select(
        F.col(q_id_col), F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(q_vec_col)), 6).alias("cos_sim"))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def vector_dim(df, vec_col: str = "embedding") -> int:
    """Embedding dimension WITHOUT running a job: prefer the column's
    ``"dim"`` schema metadata, else Spark's cheap local-relation/stats path
    is skipped entirely and a 1-row limit is read (the unavoidable
    fallback for untyped array columns)."""
    field = df.schema[vec_col] if vec_col in df.columns else None
    if field is not None and field.metadata and "dim" in field.metadata:
        return int(field.metadata["dim"])
    sample = df.select(vec_col).limit(1).collect()
    if not sample or sample[0][0] is None:
        raise ValueError(f"cannot infer vector dimension of {vec_col!r}: "
                         "empty input and no 'dim' schema metadata")
    return len(sample[0][0])


def random_planes(dim: int, bits: int, seed: int = 42):
    """Deterministic unit hyperplanes (numpy PRNG, fixed seed)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim))
    planes /= np.linalg.norm(planes, axis=1, keepdims=True)
    return planes.tolist()


def lsh_bucket(vec_col, planes):
    """Sign-bit bucket id of a vector under the given hyperplanes."""
    from pyspark.sql import functions as F
    c = (F.col(vec_col) if isinstance(vec_col, str) else vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(c, plane) >= 0,
                     F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def lsh_probe_buckets(planes, query_vec, multiprobe_hamming: int = 1) -> list:
    """Driver-side probe set: the query's sign-bit bucket plus its
    ``multiprobe_hamming``-bit-flip ring — ONE implementation shared by
    the ad-hoc and stored-index paths so bucket semantics can't diverge.
    Same arithmetic as the Column path (lsh_bucket)."""
    bits = len(planes)
    qb = 0
    for i, p in enumerate(planes):
        if sum(px * qx for px, qx in zip(p, query_vec)) >= 0:
            qb |= 1 << i
    probe = [qb]
    if multiprobe_hamming >= 1:
        probe += [qb ^ (1 << i) for i in range(bits)]
    if multiprobe_hamming >= 2:
        probe += [qb ^ (1 << i) ^ (1 << j)
                  for i in range(bits) for j in range(i + 1, bits)]
    return probe


def ivf_probe_cells(centroids, query_vec, nprobe: int) -> list:
    """Driver-side nearest-``nprobe`` centroid cells of a query (shared by
    ad-hoc and stored-index IVF paths)."""
    import numpy as np
    cent = np.asarray(centroids, dtype=np.float64)
    q = np.array(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    return [int(i) for i in np.argsort(-(cent @ q))[:nprobe]]


def lsh_ann_topk(df, query_vec, k: int = 10, vec_col: str = "embedding",
                 id_col: str = "vec_id", bits: int = 8, seed: int = 42,
                 multiprobe_hamming: int = 1):
    """Approximate top-k: scan only rows whose LSH bucket is within
    ``multiprobe_hamming`` bits of the query's bucket (multi-probe LSH).
    At 100 TB the bucket column is a partition/cluster key; here it is a
    filter the Parquet scan can evaluate cheaply."""
    from pyspark.sql import functions as F
    dim = len(query_vec)
    planes = random_planes(dim, bits, seed)
    probe = lsh_probe_buckets(planes, query_vec, multiprobe_hamming)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    bucketed = df.withColumn("__bucket", lsh_bucket(vec_col, planes))
    cand = bucketed.filter(F.col("__bucket").isin(probe))
    scored = cand.select(F.col(id_col),
                         F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"))
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def spherical_kmeans(df, vec_col: str = "embedding", id_col: str = "vec_id",
                     n_cells: int = 16, sample: int = 2048, iters: int = 8,
                     seed: int = 42):
    """Driver-side spherical k-means over a DETERMINISTIC sample (ordered
    by id) — the coarse-quantizer build step of an IVF index.  The sample
    and the centroid matrix are driver-sized (n_cells × dim floats) no
    matter the corpus size; assignment stays distributed."""
    import numpy as np

    rows = (df.select(id_col, vec_col).orderBy(id_col).limit(sample).collect())
    A = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(A, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    A = A / norms
    rng = np.random.default_rng(seed)
    cent = A[rng.choice(len(A), size=min(n_cells, len(A)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(A @ cent.T, axis=1)
        for c in range(len(cent)):
            members = A[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    return cent.tolist()


def ivf_cell_col(centroids, vec_col: str = "embedding"):
    """Nearest-centroid cell id as a Column (vectorized pandas UDF: one
    matmul per Arrow batch — linear algebra the built-ins can't express)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    M = [list(map(float, c)) for c in centroids]

    def _cell(v):
        C = np.array(M, dtype=np.float64)  # (cells, dim)
        A = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        n = np.linalg.norm(A, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return pd.Series(np.argmax((A / n) @ C.T, axis=1).astype(np.int32))

    # annotate with the real classes: string hints wouldn't resolve since
    # pandas is imported function-locally
    _cell.__annotations__ = {"v": pd.Series, "return": pd.Series}
    cell = pandas_udf(_cell, "int")
    return cell(F.col(vec_col) if isinstance(vec_col, str) else vec_col)


def ivf_ann_topk(df, query_vec, k: int = 10, vec_col: str = "embedding",
                 id_col: str = "vec_id", n_cells: int = 16, nprobe: int = 4,
                 sample: int = 2048, iters: int = 8, seed: int = 42):
    """IVF approximate top-k (the second scale path next to LSH): cluster
    the corpus into ``n_cells`` Voronoi cells around k-means centroids,
    probe only the ``nprobe`` cells nearest the query, brute-force cosine
    inside them.  Scan fraction ≈ nprobe / n_cells.  At 100 TB the cell id
    is a write-time partition/cluster column (ivf_cell_col at ingest), so
    probing prunes files via partition metadata instead of computing the
    UDF per row at query time."""
    import numpy as np
    from pyspark.sql import functions as F

    cent = np.array(spherical_kmeans(df, vec_col, id_col, n_cells, sample,
                                     iters, seed))
    probe = ivf_probe_cells(cent, query_vec, nprobe)
    cand = df.withColumn("__cell", ivf_cell_col(cent.tolist(), vec_col)) \
        .filter(F.col("__cell").isin(probe))
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = cand.select(F.col(id_col),
                         F.round(cosine(F.col(vec_col), qcol), 6).alias("cos_sim"))
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


# ---------------------------------------------------------------------------
# persistent ANN index (write-time cluster column + partition pruning)
# ---------------------------------------------------------------------------

ANN_PROP = "ann.index."


def add_ann_index(table, kind: str = "ivf", vec_col: str = "embedding",
                  id_col: str = "vec_id", n_cells: int = 16, bits: int = 8,
                  seed: int = 42, sample: int = 2048, iters: int = 8,
                  spark=None):
    """Materialize the ANN coarse index as a STORED column + identity
    partition field (the role clustering plays in the reference's
    rewrite-with-sort/cluster action, spark/.../actions/BaseRewriteDataFilesSparkAction.java):

    - ``kind="ivf"``  — spherical-kmeans cell id → ``__ann_cell`` int
    - ``kind="lsh"``  — hyperplane sign bucket  → ``__ann_bucket`` long

    One full-table rewrite clusters the data files by the index column, so
    a probe query prunes to ``nprobe / n_cells`` of the FILES via partition
    metadata — no per-row bucket/cell computation at query time, no
    full-corpus scan.  Index parameters (and IVF centroids) persist in
    table properties; ``ivf_ann_topk_indexed`` / ``lsh_ann_topk_indexed``
    read them back.
    """
    import json
    from pyspark.sql import functions as F
    from incubator_iceberg_spark import expressions as X

    spark = spark or table.spark
    df = table.to_df(spark=spark)
    if kind == "ivf":
        cent = spherical_kmeans(df, vec_col, id_col, n_cells, sample, iters,
                                seed)
        col_name = "__ann_cell"
        idx_col = ivf_cell_col(cent, vec_col)
        col_type = "int"
        props = {ANN_PROP + "kind": "ivf", ANN_PROP + "vec-col": vec_col,
                 ANN_PROP + "n-cells": str(len(cent)),
                 ANN_PROP + "centroids": json.dumps(cent)}
    elif kind == "lsh":
        dim = vector_dim(df, vec_col)
        planes = random_planes(dim, bits, seed)
        col_name = "__ann_bucket"
        idx_col = lsh_bucket(vec_col, planes)
        col_type = "long"
        props = {ANN_PROP + "kind": "lsh", ANN_PROP + "vec-col": vec_col,
                 ANN_PROP + "bits": str(bits), ANN_PROP + "seed": str(seed),
                 ANN_PROP + "dim": str(dim)}
    else:
        raise ValueError(f"unknown ANN index kind: {kind!r}")

    table.update_schema().add_column(col_name, col_type).commit()
    # identity partition on the index column, APPENDED to any existing
    # partition fields (spec evolution keeps e.g. a date partition intact)
    md = table.metadata
    existing = [(md.schema().field_path(f.source_id), f.transform, f.name)
                for f in md.spec().fields]
    table.update_spec(existing + [col_name])
    out = df.withColumn(col_name, idx_col.cast(col_type))
    table.overwrite(out, X.always_true(), spark=spark)
    table.update_properties(props)
    return table


def _ann_props(table):
    p = table.metadata.properties
    if ANN_PROP + "kind" not in p:
        raise ValueError("table has no ANN index; run add_ann_index first")
    return p


def ann_index_col(table):
    """The stored-index Column recomputed from the table's persisted
    parameters — what an APPEND to an indexed table must attach so new
    rows land in the right cell/bucket partitions (index maintenance:
    ``t.append(with_ann_index_col(t, df))`` keeps the clustering live
    without a rebuild)."""
    import json
    p = _ann_props(table)
    vec_col = p[ANN_PROP + "vec-col"]
    if p[ANN_PROP + "kind"] == "ivf":
        cent = json.loads(p[ANN_PROP + "centroids"])
        return ivf_cell_col(cent, vec_col).cast("int")
    planes = random_planes(int(p[ANN_PROP + "dim"]),
                           int(p[ANN_PROP + "bits"]),
                           int(p[ANN_PROP + "seed"]))
    return lsh_bucket(vec_col, planes).cast("long")


def with_ann_index_col(table, df):
    """``df`` + the index column named as stored — use before appending
    to an indexed table."""
    name = ("__ann_cell" if _ann_props(table)[ANN_PROP + "kind"] == "ivf"
            else "__ann_bucket")
    return df.withColumn(name, ann_index_col(table))


def ivf_ann_topk_indexed(table, query_vec, k: int = 10,
                         id_col: str = "vec_id", nprobe: int = 4, spark=None):
    """IVF probe against the STORED index: nearest ``nprobe`` centroids are
    picked driver-side from the persisted centroid matrix, then the scan
    reads ONLY the probed cells' partitions (identity partition pruning on
    ``__ann_cell`` — files read ≈ nprobe/n_cells of the table)."""
    import numpy as np
    from pyspark.sql import functions as F

    p = _ann_props(table)
    assert p[ANN_PROP + "kind"] == "ivf", "stored index is not IVF"
    import json
    cent = np.array(json.loads(p[ANN_PROP + "centroids"]))
    vec_col = p[ANN_PROP + "vec-col"]
    probe = ivf_probe_cells(cent, query_vec, nprobe)
    in_list = ", ".join(str(c) for c in probe)
    cand = table.to_df(spark=spark, filter=f"__ann_cell IN ({in_list})")
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = cand.select(F.col(id_col),
                         F.round(cosine(F.col(vec_col), qcol), 6).alias("cos_sim"))
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def lsh_ann_topk_indexed(table, query_vec, k: int = 10,
                         id_col: str = "vec_id", multiprobe_hamming: int = 1,
                         spark=None):
    """LSH probe against the STORED bucket column: probe buckets computed
    driver-side from the persisted (dim, bits, seed) plane parameters; the
    scan partition-prunes to the probed buckets."""
    from pyspark.sql import functions as F

    p = _ann_props(table)
    assert p[ANN_PROP + "kind"] == "lsh", "stored index is not LSH"
    bits = int(p[ANN_PROP + "bits"])
    seed = int(p[ANN_PROP + "seed"])
    dim = int(p[ANN_PROP + "dim"])
    vec_col = p[ANN_PROP + "vec-col"]
    planes = random_planes(dim, bits, seed)
    probe = lsh_probe_buckets(planes, query_vec, multiprobe_hamming)
    in_list = ", ".join(str(b) for b in probe)
    cand = table.to_df(spark=spark, filter=f"__ann_bucket IN ({in_list})")
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = cand.select(F.col(id_col),
                         F.round(cosine(F.col(vec_col), qcol), 6).alias("cos_sim"))
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def embedding_near_dup_pairs(df, vec_col: str = "embedding", id_col: str = "vec_id",
                             bits: int = 12, seed: int = 42,
                             cosine_threshold: float = 0.95,
                             hamming_tolerance: int = 0):
    """Embedding-cosine near-duplicate pairs: LSH-bucket self-join verified
    by exact cosine ≥ threshold.  With ``hamming_tolerance=1`` one side is
    expanded to its bit-flip probe buckets (multi-probe), so a true
    near-dup pair straddling one hyperplane is still a candidate — recall
    goes from (1-θ/π)^bits to ≈1 for small angles, at (bits+1)× candidate
    cost on one side only."""
    from pyspark.sql import functions as F
    try:
        dim = vector_dim(df, vec_col)
    except ValueError:  # empty input → no pairs
        return df.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cos_sim double")
    planes = random_planes(dim, bits, seed)
    b = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"),
                  lsh_bucket(vec_col, planes).alias("__bucket"))
    if hamming_tolerance >= 1:
        probes = F.array(F.col("__bucket"),
                         *[F.col("__bucket").bitwiseXOR(F.lit(1 << i).cast("long"))
                           for i in range(bits)])
        probed = b.withColumn("__probe", F.explode(probes))
        pairs = (b.alias("a")
                 .join(probed.alias("b"),
                       (F.col("a.__bucket") == F.col("b.__probe"))
                       & (F.col("a.__id") < F.col("b.__id"))))
    else:
        pairs = (b.alias("a")
                 .join(b.alias("b"),
                       (F.col("a.__bucket") == F.col("b.__bucket"))
                       & (F.col("a.__id") < F.col("b.__id"))))
    return (pairs
            .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"),
                    F.round(cosine(F.col("a.__v"), F.col("b.__v")), 6).alias("cos_sim"))
            .filter(F.col("cos_sim") >= cosine_threshold)
            .dropDuplicates(["id_a", "id_b"]))


SEMANTIC_DEDUP_TARGET_CELL = 4096


def semantic_dedup_cells_for(n: int, target_cell_size: int = SEMANTIC_DEDUP_TARGET_CELL) -> int:
    """Cell count so the per-cell O(cell²) verify stays executor-sized:
    ceil(n / target_cell_size), floored at 16.  At 10⁸ vectors this gives
    ~24k cells (≈4k vectors ≈ 16M-pair matmul per cell) instead of a
    fixed 16 (≈4·10¹³ pairs per cell — an OOM)."""
    return max(16, -(-max(n, 1) // target_cell_size))


def semantic_dedup_pairs(df, vec_col: str = "embedding", id_col: str = "vec_id",
                         n_cells: int | None = None, sample: int = 2048,
                         iters: int = 8, seed: int = 42,
                         cosine_threshold: float = 0.95,
                         target_cell_size: int = SEMANTIC_DEDUP_TARGET_CELL):
    """SemDeDup-style semantic near-duplicate pairs: spherical-kmeans
    cells are the blocking stage (the self-join is quadratic PER CELL,
    never globally), exact cosine >= threshold verifies inside the cell.

    Recall contract: vectors with the SAME direction (exact or scalar-
    multiple duplicates) get bit-identical cell assignments, so
    exact-duplicate recall is total; a near-dup pair straddling a cell
    boundary can be missed — the standard SemDeDup trade, bounded by the
    cell granularity (fewer cells = higher recall, bigger per-cell
    join).  At 100 TB: one pandas-UDF cell-assignment pass (one matmul
    per Arrow batch), one shuffle on the cell id, then ONE numpy
    similarity matmul per cell (applyInPandas) — the shape SemDeDup runs
    in practice.  A per-pair Column-expression cosine was measured ~10×
    slower (interpreted higher-order lambdas over |cell|² pairs).  Cell
    memory is O((corpus/n_cells)²) during verify.  ``n_cells=None``
    (default) auto-sizes from a cheap ``df.count()`` so cells target
    ``target_cell_size`` vectors each — pass n_cells explicitly only
    when you know the corpus size (the kmeans sample is widened to keep
    ≥4 sample points per cell)."""
    import pandas as pd
    from pyspark.sql import functions as F
    if n_cells is None:
        n_cells = semantic_dedup_cells_for(df.count(), target_cell_size)
        sample = max(sample, 4 * n_cells)
    cent = spherical_kmeans(df, vec_col, id_col, n_cells, sample, iters, seed)
    b = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"),
                  ivf_cell_col(cent, vec_col).alias("__cell"))

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        pdf = pdf.sort_values("__id")
        ids = pdf["__id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        V = np.array(pdf["__v"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0] = 1.0
        S = (V / norms[:, None]) @ (V / norms[:, None]).T
        ia, ib = np.triu_indices(len(ids), k=1)
        cs = np.round(S[ia, ib], 6)
        keep = cs >= cosine_threshold
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
                             "cos_sim": cs[keep]})

    return (b.groupBy("__cell")
            .applyInPandas(cell_pairs,
                           "id_a long, id_b long, cos_sim double"))


def semantic_dedup(df, vec_col: str = "embedding", id_col: str = "vec_id",
                   **kwargs):
    """Keep-one semantic dedup: drop the higher id of every
    ``semantic_dedup_pairs`` pair (keep-min representative)."""
    from pyspark.sql import functions as F
    pairs = semantic_dedup_pairs(df, vec_col, id_col, **kwargs)
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drops, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8): 4x-compressed approximate search
# ---------------------------------------------------------------------------

SQ8_MICRO = 1_000_000  # fixed-point unit: 1e-6 of the raw float range


def sq8_params(df, vec_col: str = "embedding"):
    """Train per-dimension SQ8 parameters in EXACT micro-unit integers.

    One distributed aggregate (posexplode -> per-dim min/max) produces the
    only driver-side state: two ``dim``-length integer lists — metadata, not
    data.  All downstream arithmetic (encode, reconstruct, score) is pure
    int64, so an SQL oracle replays it bit-for-bit with no float-order
    ambiguity.  Returns ``(mn_u, su_u)``: per-dim ``floor(min*1e6)`` and
    ``floor(max*1e6) - floor(min*1e6)`` (the span in micro-units).

    100 TB note: train on a bounded sample (``df.sample``) — per-dim min/max
    converges fast and the full pass is unnecessary; the aggregate itself is
    one shuffle of ``dim`` groups either way.
    """
    from pyspark.sql import functions as F
    stats = (df.select(F.posexplode(F.col(vec_col).cast("array<double>"))
                       .alias("d", "x"))
               .groupBy("d")
               .agg(F.floor(F.min("x") * SQ8_MICRO).cast("long").alias("mn"),
                    F.floor(F.max("x") * SQ8_MICRO).cast("long").alias("mx"))
               .orderBy("d").collect())
    mn_u = [r["mn"] for r in stats]
    su_u = [r["mx"] - r["mn"] for r in stats]
    return mn_u, su_u


def sq8_codes_col(mn_u, su_u, vec_col: str = "embedding"):
    """Column of uint8 codes (as ``array<int>``) for a float vector column.

    ``c_d = clamp(floor((floor(v*1e6) - mn_d) * 255 / su_d), 0, 255)`` —
    integer arithmetic end-to-end.  Stored as an index column this is the
    4x-memory scale path (100 TB of float32 embeddings -> 25 TB of codes).
    """
    from pyspark.sql import functions as F
    mn_arr = F.array(*[F.lit(int(v)).cast("long") for v in mn_u])
    su_arr = F.array(*[F.lit(int(v)).cast("long") for v in su_u])

    def code(x, i):
        v_u = F.floor(x.cast("double") * SQ8_MICRO).cast("long")
        mn = F.element_at(mn_arr, i + 1)
        su = F.element_at(su_arr, i + 1)
        raw = F.floor((v_u - mn) * 255 / su).cast("long")
        clamped = F.least(F.lit(255).cast("long"), F.greatest(F.lit(0).cast("long"), raw))
        return F.when(su <= 0, F.lit(0).cast("long")).otherwise(clamped).cast("int")

    return F.transform(F.col(vec_col), code)


def sq8_score_col(codes_col, mn_u, su_u, query_vec):
    """Approximate dot product of SQ8 codes against a RAW query vector,
    in exact integer micro^2 units: ``sum_d recon_u(c_d) * floor(q_d*1e6)``
    with ``recon_u(c) = mn_d + su_d*c // 255``.  int64-exact (|recon_u| and
    |q_u| are ~1e6; 64 dims -> ~1e14, far under 2^63)."""
    from pyspark.sql import functions as F
    recon = F.transform(
        codes_col,
        lambda c, i: F.element_at(F.array(*[F.lit(int(v)).cast("long") for v in mn_u]), i + 1)
        + F.floor(F.element_at(F.array(*[F.lit(int(v)).cast("long") for v in su_u]), i + 1)
                  * c.cast("long") / 255).cast("long"))
    q_u = F.array(*[F.lit(int(math.floor(float(q) * SQ8_MICRO))).cast("long")
                    for q in query_vec])
    return F.aggregate(F.zip_with(recon, q_u, lambda r, q: r * q),
                       F.lit(0).cast("long"), lambda acc, v: acc + v)


def sq8_topk(df, query_vec, k: int = 10, vec_col: str = "embedding",
             id_col: str = "vec_id", params=None):
    """Approximate top-k by SQ8 inner product — the memory-bound scale path
    for brute-force search (codes are 1/4 the footprint of float32; the
    scan stays whole-stage codegen, ranking is Spark's distributed
    TakeOrdered).  Composable with the IVF index (encode within cells) for
    the full IVF+SQ 100 TB layout.  Scores are exact int64 micro^2 units,
    so results are deterministic and SQL-oracle-checkable."""
    from pyspark.sql import functions as F
    if params is None:
        params = sq8_params(df, vec_col)
    mn_u, su_u = params
    codes = sq8_codes_col(mn_u, su_u, vec_col)
    scored = df.select(F.col(id_col),
                       sq8_score_col(codes, mn_u, su_u, query_vec)
                       .alias("sq8_score"))
    return scored.orderBy(F.desc("sq8_score"), F.col(id_col)).limit(k)


SQ8_PROP = "ann.sq8."
SQ8_CODES_COL = "__sq8_codes"


def add_sq8_index(table, vec_col: str = "embedding", spark=None):
    """Persist an SQ8 index on a table: per-dim params go to table
    properties, codes go to a stored ``__sq8_codes`` ``array<int>``
    column via one overwrite.  Probes (``sq8_topk_stored``) then scan
    ONLY (id, codes) — column pruning never touches the raw float
    vectors, which is the compressed read path at scale (codes are
    0..255, parquet bit-packs them to ~1 byte vs 4 for float32).

    Composes with ``add_ann_index``: an IVF-indexed table keeps its cell
    partition field, so ``ivf_sq8_topk_indexed`` prunes FILES by cell and
    scores the survivors on codes — the IVF+SQ layout (coarse quantizer +
    scalar-compressed residuals) used for 100 TB vector corpora.

    Appends must attach codes with ``with_sq8_codes_col`` (same index-
    maintenance contract as ``with_ann_index_col``); params are frozen at
    build time — retrain by re-running ``add_sq8_index``."""
    import json
    from incubator_iceberg_spark import expressions as X

    spark = spark or table.spark
    df = table.to_df(spark=spark)
    mn_u, su_u = sq8_params(df, vec_col)
    if SQ8_CODES_COL not in [f.name for f in table.metadata.schema().fields]:
        table.update_schema().add_column(SQ8_CODES_COL, "array<int>").commit()
    out = table.to_df(spark=spark).withColumn(
        SQ8_CODES_COL, sq8_codes_col(mn_u, su_u, vec_col))
    table.overwrite(out, X.always_true(), spark=spark)
    table.update_properties({
        SQ8_PROP + "vec-col": vec_col,
        SQ8_PROP + "mn": json.dumps(mn_u),
        SQ8_PROP + "su": json.dumps(su_u)})
    return table


def sq8_stored_params(table):
    import json
    p = table.metadata.properties
    if SQ8_PROP + "mn" not in p:
        raise ValueError("table has no SQ8 index; run add_sq8_index first")
    return (json.loads(p[SQ8_PROP + "mn"]), json.loads(p[SQ8_PROP + "su"]),
            p[SQ8_PROP + "vec-col"])


def with_sq8_codes_col(table, df):
    """``df`` + the codes column encoded with the table's FROZEN params —
    use before appending to an SQ8-indexed table."""
    mn_u, su_u, vec_col = sq8_stored_params(table)
    return df.withColumn(SQ8_CODES_COL, sq8_codes_col(mn_u, su_u, vec_col))


def sq8_topk_stored(table, query_vec, k: int = 10, id_col: str = "vec_id",
                    spark=None, filter=None):
    """Top-k by SQ8 score against the STORED codes column: the scan reads
    (id, codes) only — the raw vector column is column-pruned away."""
    from pyspark.sql import functions as F
    mn_u, su_u, _ = sq8_stored_params(table)
    cand = table.to_df(spark=spark, filter=filter,
                       select=[id_col, SQ8_CODES_COL])
    scored = cand.select(
        F.col(id_col),
        sq8_score_col(F.col(SQ8_CODES_COL), mn_u, su_u, query_vec)
        .alias("sq8_score"))
    return scored.orderBy(F.desc("sq8_score"), F.col(id_col)).limit(k)


def ivf_sq8_topk_indexed(table, query_vec, k: int = 10,
                         id_col: str = "vec_id", nprobe: int = 4,
                         spark=None):
    """The combined IVF+SQ8 probe: partition-prune to the ``nprobe``
    nearest cells via the stored IVF index, then rank the survivors on
    stored SQ8 codes — files read ~ nprobe/n_cells of the table AND the
    read columns are the compressed codes, not the floats."""
    import json
    import numpy as np
    p = _ann_props(table)
    assert p[ANN_PROP + "kind"] == "ivf", "stored coarse index is not IVF"
    cent = np.array(json.loads(p[ANN_PROP + "centroids"]))
    probe = ivf_probe_cells(cent, query_vec, nprobe)
    in_list = ", ".join(str(c) for c in probe)
    return sq8_topk_stored(table, query_vec, k, id_col, spark=spark,
                           filter=f"__ann_cell IN ({in_list})")


def _micro_vec(vec_col):
    from pyspark.sql import functions as F
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(c, lambda x: F.floor(x.cast("double") * 1_000_000)
                       .cast("long"))


def kmeans_assign_micro(df, vec_col: str = "embedding",
                        id_col: str = "vec_id", k: int = 4,
                        iters: int = 2):
    out, _cents = kmeans_micro_full(df, vec_col, id_col, k, iters)
    return out


def kmeans_micro_full(df, vec_col: str = "embedding",
                      id_col: str = "vec_id", k: int = 4,
                      iters: int = 2):
    """Distributed Lloyd's k-means with EXACT integer arithmetic — the
    full-corpus clustering counterpart of the sample-based
    ``spherical_kmeans`` blocking helper.  Everything an engine could
    float-order-diverge on is pinned to int64: vectors quantize to
    micro-units (floor(x·1e6), the SQ8 convention), distances are exact
    squared-L2 in micro² (64 dims × (2e6)² ≈ 2.6e14 ≪ 2^63), and the
    centroid update is an exact element-wise FLOOR-division mean
    ((s − pmod(s, n)) / n) — so two engines (or a SQL oracle) replay
    every iteration bit-for-bit, which no floating k-means can promise.

    Deterministic contract: init centroids are the vectors of the ``k``
    smallest ids; argmin ties break on the lower centroid index; an
    emptied cluster keeps its previous centroid.  Returns (id, cluster)
    after ``iters`` assignment/update rounds (the returned assignment is
    the one computed against the LAST updated centroids).

    Scale shape per iteration: assignment is a narrow whole-stage-codegen
    projection against k broadcast centroid literals (no join, no
    shuffle); the update is ONE map-side-combined groupBy producing
    k×(dim+1) partial sums; only the k centroid rows ever reach the
    driver.  iters × 2 jobs total — the classic Lloyd's loop with
    driver-side state bounded by k·dim ints."""
    from pyspark.sql import functions as F

    if k < 1 or iters < 1:
        raise ValueError("kmeans_assign_micro needs k >= 1 and iters >= 1")
    dim = vector_dim(df, vec_col)
    base = (df.select(F.col(id_col).alias("__id"),
                      _micro_vec(vec_col).alias("__vm")))
    # (id, micro-vector) is consumed by EVERY driver round trip (init
    # collect + one aggregate per iteration + the final assignment):
    # persist it so the source scan + quantization run once, not
    # iters+2 times.  The returned assignment localCheckpoints before
    # the unpersist so it never recomputes against the cold source.
    base = base.persist()

    init = base.orderBy("__id").limit(int(k)).collect()
    if len(init) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(init)}")
    centroids = [list(r["__vm"]) for r in init]

    def assign_col(cents):
        dists = [
            F.aggregate(
                F.zip_with(F.col("__vm"),
                           F.array(*[F.lit(v) for v in c]),
                           lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"), lambda acc, x: acc + x)
            for c in cents]
        best = F.lit(0)
        best_d = dists[0]
        for ci in range(1, len(cents)):
            better = dists[ci] < best_d
            best = F.when(better, F.lit(ci)).otherwise(best)
            best_d = F.when(better, dists[ci]).otherwise(best_d)
        return best.cast("int")

    assigned = None
    for _ in range(int(iters)):
        assigned = base.withColumn("cluster", assign_col(centroids))
        sums = (assigned.groupBy("cluster")
                .agg(F.count(F.lit(1)).alias("n"),
                     *[F.sum(F.element_at("__vm", d)).alias(f"s{d}")
                       for d in range(1, dim + 1)])
                .collect())
        new_cents = list(centroids)          # emptied cluster keeps old
        for r in sums:
            n = r["n"]
            new_cents[r["cluster"]] = [
                (r[f"s{d}"] - (r[f"s{d}"] % n + n) % n) // n
                for d in range(1, dim + 1)]
        centroids = new_cents
    # final assignment against the last UPDATED centroids
    out = (base.withColumn("cluster", assign_col(centroids))
           .select(F.col("__id").alias(id_col), "cluster")
           .localCheckpoint())
    base.unpersist()
    return out, centroids


_KM_ASSIGN_SQL = """
{a} AS (
  SELECT vec_id, c FROM (
    SELECT {v}.vec_id, {c}.c,
           row_number() OVER (PARTITION BY {v}.vec_id
                              ORDER BY list_sum([({v}.vm[d] - {c}.vm[d])
                                                 * ({v}.vm[d] - {c}.vm[d])
                                                 FOR d IN range(1, {dp1})]),
                                       {c}.c) AS rn
    FROM {v} CROSS JOIN {c})
  WHERE rn = 1)"""

_KM_UPDATE_SQL = """
{s} AS (
  SELECT {a}.c, t.d, CAST(sum({v}.vm[t.d]) AS BIGINT) AS s, count(*) AS n
  FROM {a} JOIN {v} USING (vec_id) CROSS JOIN range(1, {dp1}) t(d)
  GROUP BY 1, 2),
{cn} AS (
  SELECT {cp}.c, coalesce(u.vm2, {cp}.vm) AS vm
  FROM {cp} LEFT JOIN (
    SELECT c, list(CAST((s - ((s % n) + n) % n) // n AS BIGINT)
                   ORDER BY d) AS vm2
    FROM {s} GROUP BY c) u USING (c))"""


def kmeans_oracle_sql(k: int = 4, iters: int = 2, dim: int = 64,
                      table: str = "embeddings") -> str:
    """The exact ANSI-SQL mirror of ``kmeans_assign_micro`` (unrolled
    Lloyd's iterations as CTEs) for oracle checks — possible only
    because every step is integer arithmetic."""
    dp1 = dim + 1
    parts = [f"""v AS (
  SELECT vec_id,
         [CAST(floor(embedding[d]::DOUBLE * 1000000) AS BIGINT)
          FOR d IN range(1, {dp1})] AS vm
  FROM {table}),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS c, vm
  FROM (SELECT vec_id, vm FROM v ORDER BY vec_id LIMIT {int(k)}))"""]
    for i in range(int(iters)):
        parts.append(_KM_ASSIGN_SQL.format(a=f"a{i + 1}", c=f"c{i}",
                                           v="v", dp1=dp1))
        parts.append(_KM_UPDATE_SQL.format(s=f"s{i + 1}", a=f"a{i + 1}",
                                           cn=f"c{i + 1}", cp=f"c{i}",
                                           v="v", dp1=dp1))
    parts.append(_KM_ASSIGN_SQL.format(a=f"a{int(iters) + 1}",
                                       c=f"c{int(iters)}", v="v", dp1=dp1))
    return ("WITH " + ",".join(parts)
            + f"\nSELECT vec_id, CAST(c AS INT) AS cluster"
              f" FROM a{int(iters) + 1}")


# ---------------------------------------------------------------------------
# Product quantization (PQ) — m subspace codebooks, ADC scoring, exact int
# ---------------------------------------------------------------------------

def pq_train_encode(df, vec_col: str = "embedding", id_col: str = "vec_id",
                    m: int = 4, k: int = 8, iters: int = 2):
    """Train product-quantization codebooks and encode the corpus, all in
    the exact-int64 micro-unit regime so a SQL oracle replays training
    AND encoding bit-for-bit (the PQ analog of kmeans_assign_micro).

    The vector splits into ``m`` contiguous subspaces of dim/m
    components; each subspace independently runs the deterministic
    integer Lloyd's loop (init = the k smallest ids' slices, argmin ties
    to the lower index, emptied clusters keep their centroid).  Returns
    (codes_df with columns [id, code_0..code_{m-1}], codebooks) where
    codebooks[j][c] is the int64 micro centroid of subspace j.

    Scale shape: codes are m small ints per row (dim 64 float -> 4 bytes
    at k<=256: 64x compression at rest).  The m subspace Lloyd's loops
    run FUSED: one projection assigns all m codes (broadcast centroid
    literals, no join), and one exploded map-side-combined aggregate per
    iteration produces every subspace's m*k centroid sums together —
    iters+2 jobs total instead of m independent loops (measured 25 s ->
    ~3 s at 2k vectors; at 100 TB it is m-fold fewer full scans).
    Nothing but m*k*(dim/m) centroid sums ever reaches the driver."""
    from pyspark.sql import functions as F

    dim = vector_dim(df, vec_col)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    base = df.select(F.col(id_col).alias("__id"),
                     _micro_vec(vec_col).alias("__vm"))
    base = base.select(
        "__id", *[F.slice("__vm", j * dsub + 1, dsub).alias(f"__s{j}")
                  for j in range(m)])

    init = base.orderBy("__id").limit(int(k)).collect()
    if len(init) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(init)}")
    books = [[list(r[f"__s{j}"]) for r in init] for j in range(m)]

    def assign_col(j, cents):
        # identical contract to kmeans_micro_full: strict < keeps the
        # lowest centroid index on ties
        dists = [
            F.aggregate(
                F.zip_with(F.col(f"__s{j}"),
                           F.array(*[F.lit(v) for v in c]),
                           lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"), lambda acc, x: acc + x)
            for c in cents]
        best, best_d = F.lit(0), dists[0]
        for ci in range(1, len(cents)):
            better = dists[ci] < best_d
            best = F.when(better, F.lit(ci)).otherwise(best)
            best_d = F.when(better, dists[ci]).otherwise(best_d)
        return best.cast("int")

    for _ in range(int(iters)):
        assigned = base.select(
            *[assign_col(j, books[j]).alias(f"__c{j}") for j in range(m)],
            *[f"__s{j}" for j in range(m)])
        stacked = assigned.select(F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     F.col(f"__c{j}").alias("c"),
                     F.col(f"__s{j}").alias("sl"))
            for j in range(m)])).alias("e"))
        sums = (stacked.groupBy(F.col("e.j").alias("j"),
                                F.col("e.c").alias("c"))
                .agg(F.count(F.lit(1)).alias("n"),
                     *[F.sum(F.element_at("e.sl", d)).alias(f"s{d}")
                       for d in range(1, dsub + 1)])
                .collect())
        new_books = [list(b) for b in books]  # emptied cluster keeps old
        for r in sums:
            n = r["n"]
            new_books[r["j"]][r["c"]] = [
                (r[f"s{d}"] - (r[f"s{d}"] % n + n) % n) // n
                for d in range(1, dsub + 1)]
        books = new_books

    codes = base.select(
        F.col("__id").alias(id_col),
        *[assign_col(j, books[j]).alias(f"code_{j}") for j in range(m)])
    return codes, books


def pq_topk(codes_df, books, query_vec, topk: int = 10,
            id_col: str = "vec_id"):
    """Asymmetric-distance (ADC) top-k over PQ codes: the m x k distance
    table between the micro-quantized query and every codebook centroid
    is computed driver-side in exact python ints (m*k entries) and
    embedded as array literals; each row's distance is m element_at
    lookups summed — a whole-stage-codegen projection over (id, codes)
    only, never touching the raw vectors.  Ordered by (dist, id)."""
    import math

    from pyspark.sql import functions as F

    m = len(books)
    q = [int(math.floor(float(x) * 1_000_000)) for x in query_vec]
    dsub = len(books[0][0])
    dist = None
    for j in range(m):
        qj = q[j * dsub:(j + 1) * dsub]
        table = [sum((a - b) * (a - b) for a, b in zip(qj, c))
                 for c in books[j]]
        term = F.element_at(F.array(*[F.lit(v) for v in table]),
                            F.col(f"code_{j}") + 1)
        dist = term if dist is None else dist + term
    return (codes_df.withColumn("dist", dist.cast("long"))
            .select(id_col, "dist")
            .orderBy("dist", id_col).limit(int(topk)))


def pq_oracle_sql(m: int = 4, k: int = 8, iters: int = 2, dim: int = 64,
                  topk: int = 10, table: str = "embeddings") -> str:
    """The exact ANSI-SQL mirror of pq_train_encode + pq_topk with the
    query vector = the embedding of the smallest vec_id: per subspace an
    unrolled integer Lloyd's loop (the kmeans_oracle_sql CTEs, sliced),
    then ADC distances joined across subspaces."""
    dsub = dim // m
    parts = []
    last = int(iters) + 1
    for j in range(m):
        lo = j * dsub + 1
        parts.append(f"""v{j} AS (
  SELECT vec_id,
         [CAST(floor(embedding[d]::DOUBLE * 1000000) AS BIGINT)
          FOR d IN range({lo}, {lo + dsub})] AS vm
  FROM {table}),
c0_{j} AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS c, vm
  FROM (SELECT vec_id, vm FROM v{j} ORDER BY vec_id LIMIT {int(k)}))""")
        for i in range(int(iters)):
            parts.append(_KM_ASSIGN_SQL.format(
                a=f"a{i + 1}_{j}", c=f"c{i}_{j}", v=f"v{j}", dp1=dsub + 1))
            parts.append(_KM_UPDATE_SQL.format(
                s=f"s{i + 1}_{j}", a=f"a{i + 1}_{j}", cn=f"c{i + 1}_{j}",
                cp=f"c{i}_{j}", v=f"v{j}", dp1=dsub + 1))
        parts.append(_KM_ASSIGN_SQL.format(
            a=f"a{last}_{j}", c=f"c{int(iters)}_{j}", v=f"v{j}",
            dp1=dsub + 1))
        parts.append(f"""q{j} AS (
  SELECT vm FROM v{j} ORDER BY vec_id LIMIT 1),
d{j} AS (
  SELECT a.vec_id,
         list_sum([(q.vm[d] - c.vm[d]) * (q.vm[d] - c.vm[d])
                   FOR d IN range(1, {dsub + 1})]) AS dist
  FROM a{last}_{j} a JOIN c{int(iters)}_{j} c ON a.c = c.c
  CROSS JOIN q{j} q)""")
    dist_sum = " + ".join(f"d{j}.dist" for j in range(m))
    joins = "d0" + "".join(f" JOIN d{j} USING (vec_id)"
                           for j in range(1, m))
    return ("WITH " + ",".join(parts)
            + f"\nSELECT vec_id, CAST({dist_sum} AS BIGINT) AS dist"
              f" FROM {joins} ORDER BY dist, vec_id LIMIT {int(topk)}")
