"""Multimodal column conventions + processing plumbing (M9).

Media are opaque ``binary`` columns with a typed metadata struct:

    media: binary,
    media_meta: struct<kind string, mime string, width int, height int,
                       duration_ms long, sample_rate int>

Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` — the
Spark-side plumbing (schema, batch shape, partitioning) is real and tested;
the actual codec calls are STUBBED (image/audio libraries are not in this
container): ``decode_stub=True`` produces deterministic fake features from
the bytes, ``decode_stub=False`` raises NotImplementedError where a real
implementation would call PIL/ffmpeg.
"""

from __future__ import annotations

MEDIA_META_DDL = ("kind string, mime string, width int, height int, "
                  "duration_ms long, sample_rate int")


def media_schema_ddl(extra_cols: str = "") -> str:
    base = f"media binary, media_meta struct<{MEDIA_META_DDL}>"
    return f"{extra_cols}, {base}" if extra_cols else base


def attach_fake_media(df, id_col: str, kind: str = "image"):
    """Deterministic fake media bytes keyed by id (test fixture helper)."""
    from pyspark.sql import functions as F
    payload = F.encode(F.concat(F.lit(kind + ":"), F.col(id_col).cast("string")), "utf-8")
    meta = F.struct(
        F.lit(kind).alias("kind"),
        F.lit("application/fake").alias("mime"),
        (F.pmod(F.xxhash64(F.col(id_col)), 1920) + 1).cast("int").alias("width"),
        (F.pmod(F.xxhash64(F.col(id_col), F.lit(1)), 1080) + 1).cast("int").alias("height"),
        (F.pmod(F.xxhash64(F.col(id_col), F.lit(2)), 60000)).alias("duration_ms"),
        F.lit(16000).alias("sample_rate"),
    )
    return df.withColumn("media", payload).withColumn("media_meta", meta)


def extract_features(df, media_col: str = "media", feature_dim: int = 8,
                     decode_stub: bool = True):
    """Arrow-batched feature extraction: media binary → float feature
    vector.  Real decode would go where the NotImplementedError is."""
    import pandas as pd
    import pyspark.sql.types as T

    # fresh StructType — StructType.add would mutate df's cached schema
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField("features", T.ArrayType(T.FloatType()))])
    dim = feature_dim

    def run(batches):
        import hashlib
        for pdf in batches:
            feats = []
            for blob in pdf[media_col]:
                if blob is None:
                    feats.append(None)
                    continue
                if not decode_stub:
                    raise NotImplementedError(
                        "real media decode requires PIL/ffmpeg — not in this "
                        "container; run with decode_stub=True")
                # deterministic fake embedding from content bytes
                h = hashlib.sha256(bytes(blob)).digest()
                feats.append([((h[i % 32] / 255.0) * 2 - 1) for i in range(dim)])
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(run, schema)


def frame_sample_plan(df, meta_col: str = "media_meta", fps: float = 1.0):
    """Video frame-sampling plan: one row per sampled frame timestamp —
    pure Column math (explode over a sequence), no decode needed."""
    from pyspark.sql import functions as F
    n_frames = F.greatest(
        (F.col(f"{meta_col}.duration_ms") / F.lit(1000.0 / fps)).cast("int"), F.lit(1))
    return df.withColumn(
        "frame_ts_ms",
        F.explode(F.transform(F.sequence(F.lit(0), n_frames - 1),
                              lambda i: (i * F.lit(int(1000 / fps))).cast("long"))))


def audio_chunk_plan(df, meta_col: str = "media_meta", window_ms: int = 5000):
    """Audio chunking plan: one row per fixed window with millisecond and
    sample offsets (what a transcription/embedding stage consumes) — pure
    Column math from duration_ms + sample_rate, no decode."""
    from pyspark.sql import functions as F
    dur = F.col(f"{meta_col}.duration_ms")
    rate = F.col(f"{meta_col}.sample_rate")
    n = F.greatest(F.ceil(dur / F.lit(window_ms)).cast("int"), F.lit(1))
    df = df.withColumn("chunk_idx",
                       F.explode(F.sequence(F.lit(0), n - 1)))
    start = F.col("chunk_idx").cast("long") * window_ms
    end = F.least(start + window_ms, dur.cast("long"))
    return (df.withColumn("chunk_start_ms", start)
            .withColumn("chunk_end_ms", end)
            .withColumn("start_sample", (start * rate / 1000).cast("long"))
            .withColumn("end_sample", (end * rate / 1000).cast("long")))


def resize_plan(df, meta_col: str = "media_meta", max_side: int = 336):
    """Image resize metadata (target dims, aspect preserved) — the shape
    computation is Column math; the pixel work is the stubbed decode."""
    from pyspark.sql import functions as F
    w = F.col(f"{meta_col}.width").cast("double")
    h = F.col(f"{meta_col}.height").cast("double")
    scale = F.least(F.lit(float(max_side)) / w, F.lit(float(max_side)) / h, F.lit(1.0))
    return (df.withColumn("target_width", F.round(w * scale).cast("int"))
            .withColumn("target_height", F.round(h * scale).cast("int")))
