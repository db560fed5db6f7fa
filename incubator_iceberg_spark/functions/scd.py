"""Slowly-changing-dimension (SCD Type 2) maintenance over engine tables.

The reference's MERGE surface (spark3-extensions MERGE INTO, our
row_ops.merge_into) is the primitive warehouses build SCD2 on; this
module packages the canonical "close-and-insert" recipe as one
operator so a dimension table keeps full history:

- each business key has at most ONE current row (``is_current``);
- applying a change batch CLOSES the current row (sets
  ``effective_to`` = change ts, ``is_current`` = false) and INSERTS a
  new current version;
- brand-new keys insert; no-op changes (attributes identical) commit
  nothing for that key.

Standard MERGE cannot both update and insert from the same source row,
so the staged-source pattern is used: every acting change contributes
an INSERT row (merge keys NULLed, so it can never match) and changes
to existing keys additionally contribute a CLOSE row carrying the real
merge key.  One MERGE commit applies the whole batch atomically.

Scale shape (100 TB dimension, small change batch): the differs/new
classification is one broadcast-able join of the batch against the
CURRENT slice only; the MERGE's dynamic file filter then rewrites only
the files holding changed keys, with the staged source broadcast on
the inner joins.  Nothing is O(history).
"""

from __future__ import annotations

from typing import Optional, Sequence

FROM_COL = "effective_from"
TO_COL = "effective_to"
CURRENT_COL = "is_current"

# Unique sentinels embedded in the raise_error messages so the except
# block below can re-classify the in-job guard failures without
# substring-matching prose (Py4J/connect can truncate or wrap exception
# text, and an unrelated failure whose message embedded the prose would
# be misreported as a guard trip — r10 advice #3).
_DUP_KEY_SENTINEL = "SCD2_GUARD:dup-key"
_NULL_KEY_SENTINEL = "SCD2_GUARD:null-key"
_DUP_KEY_MSG = (f"[{_DUP_KEY_SENTINEL}] SCD2 batch has multiple rows "
                "for one key; apply batches in ts order instead")
_NULL_KEY_MSG = (f"[{_NULL_KEY_SENTINEL}] SCD2 batch has NULL business "
                 "key(s); SCD2 keys must be non-null")


def scd2_apply(table, changes_df, key_cols: Sequence[str],
               attr_cols: Sequence[str], ts_col: str,
               spark=None, op_col: Optional[str] = None,
               delete_op: str = "D") -> dict:
    """Apply one change batch to an SCD2 dimension table.

    ``changes_df`` must carry ``key_cols + attr_cols + [ts_col]`` with
    at most one row per key (raises otherwise — two versions of one key
    in a single batch have no defined ordering within one commit).
    ``table`` must already have the three history columns
    (``effective_from``/``effective_to`` long, ``is_current`` boolean).
    NULL attribute values compare null-safely (NULL -> NULL is a no-op,
    NULL -> value is a change).

    With ``op_col``, rows whose op equals ``delete_op`` are SOURCE
    DELETES: they CLOSE the key's current row without inserting a new
    version (the CDC-feed shape — a changelog 'delete' ends the
    dimension history until the key reappears).  Deleting an absent
    key is a no-op.
    """
    from pyspark.sql import functions as F
    from incubator_iceberg_spark.row_ops import (WhenMatched, WhenNotMatched,
                                                 merge_into)

    spark = spark or table.spark
    key_cols = list(key_cols)
    attr_cols = list(attr_cols)
    schema = table.metadata.schema()
    for c in key_cols + attr_cols + [FROM_COL, TO_COL, CURRENT_COL]:
        if schema.find_field(c) is None:
            raise ValueError(f"SCD2 dimension is missing column {c!r}")

    # eqNullSafe: a NULL op value is an upsert, not a silent drop — a
    # plain == would yield NULL, and the acting filter below would then
    # evaluate to NULL for the row (neither close nor insert), losing
    # data for CDC feeds that leave op NULL on insert/snapshot rows.
    c_df = changes_df.select(
        *key_cols, *attr_cols, F.col(ts_col).cast("long").alias("__ts"),
        F.col(op_col).eqNullSafe(F.lit(delete_op)).alias("__del") if op_col
        else F.lit(False).alias("__del"))
    # Batch invariants — duplicate business keys, NULL business keys —
    # are validated INSIDE the merge job itself (the J2 cardinality-
    # guard pattern: a window count + raise_error evaluated while the
    # same pass computes the merge output).  r8 ran TWO dedicated
    # collect jobs per micro-batch for these; r10 fused them to one and
    # then to zero — pure fixed cost in streaming SCD2 loops.  NULL
    # business keys must be rejected: staged INSERT rows carry NULL
    # merge keys by design, and the MERGE ON uses null-safe equality,
    # so a NULL-keyed row on either side would cross-match every insert
    # (silent fan-out with check_cardinality=False).  The ON clause
    # below also carries an explicit IS NOT NULL guard as defense in
    # depth against a NULL-keyed *current* row already in the dimension.
    from pyspark.sql.window import Window
    null_key = None
    for k in key_cols:
        cond = F.col(k).isNull()
        null_key = cond if null_key is None else (null_key | cond)
    key_cnt = F.count(F.lit(1)).over(Window.partitionBy(*key_cols))
    guard = (F.when(null_key,
                    F.raise_error(F.lit(_NULL_KEY_MSG)).cast("boolean"))
             .when(key_cnt > 1,
                   F.raise_error(F.lit(_DUP_KEY_MSG)).cast("boolean"))
             .otherwise(F.lit(True)))
    # the filter forces per-row evaluation (a bare column would be
    # pruned away by Catalyst and never raise)
    c_df = c_df.withColumn("__g", guard).filter(F.col("__g")).drop("__g")

    cur = (table.to_df().filter(F.col(CURRENT_COL))
           .select(*key_cols,
                   *[F.col(a).alias(f"__d_{a}") for a in attr_cols],
                   F.lit(True).alias("__d_exists")))

    joined = c_df.join(cur, key_cols, "left")
    differs = None
    for a in attr_cols:
        d = ~F.col(a).eqNullSafe(F.col(f"__d_{a}"))
        differs = d if differs is None else (differs | d)
    is_new = F.col("__d_exists").isNull()
    # deletes act only when the key currently exists (close, no insert);
    # upserts act when the key is new or any attribute differs
    acting = joined.filter(
        (F.col("__del") & ~is_new) | (~F.col("__del") & (is_new | differs))
    ).select(*key_cols, *attr_cols, "__ts", "__del",
             is_new.alias("__is_new"))
    # merge_into consumes the staged source three times (pass-1 probe +
    # the split main pass's outer and anti branches); without a cache
    # each consumption re-runs the classification join, i.e. re-reads
    # the dimension's CURRENT slice — 3 extra target reads per batch.
    # Persist ACTING (small: only the batch's acting rows), not STAGED:
    # caching staged was measured 1.3x slower in r10 because it blocks
    # the probe's semi-join column pruning against the full plan; a
    # cached acting is already tiny so pruning is moot, and the
    # classification join (the expensive part) runs exactly once.
    acting = acting.persist()

    # staged source: closers carry the real merge key; inserts carry NULL
    mk = [f"__mk_{k}" for k in key_cols]
    closers = (acting.filter(~F.col("__is_new"))
               .select(*[F.col(k).alias(m) for k, m in zip(key_cols, mk)],
                       *key_cols, *attr_cols, "__ts"))
    inserts = (acting.filter(~F.col("__del"))
               .select(*[F.lit(None)
                         .cast(closers.schema[m].dataType).alias(m)
                         for m in mk],
                       *key_cols, *attr_cols, "__ts"))
    # NOT persisted: merge_into consumes the staged source twice, but
    # caching it forces FULL materialization of the classification join
    # (all columns) during the pass-1 probe, where the un-cached plan
    # lets Catalyst prune the semi-join side to the key columns only —
    # measured 1.3x SLOWER with persist at sf0.1 (r10)
    staged = closers.unionByName(inserts)

    # s.__mk_k IS NOT NULL keeps staged inserts (NULL merge keys) AND any
    # NULL-keyed current dimension row out of the match: NULL <=> NULL is
    # TRUE, so without the guard one NULL-keyed current row would match
    # every staged insert and silently duplicate/close rows.
    on = " AND ".join([f"s.__mk_{k} IS NOT NULL" for k in key_cols]
                      + [f"t.{k} <=> s.__mk_{k}" for k in key_cols]
                      + [f"t.{CURRENT_COL}"])
    insert_map = {k: f"s.{k}" for k in key_cols}
    insert_map.update({a: f"s.{a}" for a in attr_cols})
    insert_map[FROM_COL] = "s.__ts"
    insert_map[TO_COL] = "CAST(NULL AS LONG)"
    insert_map[CURRENT_COL] = "true"
    try:
        return merge_into(
            table, staged, on=on,
            when_matched=[WhenMatched(update={TO_COL: "s.__ts",
                                              CURRENT_COL: "false"})],
            when_not_matched=[WhenNotMatched(insert=insert_map)],
            check_cardinality=False,  # closers are key-unique by the dup
                                      # guard; inserts have NULL merge
                                      # keys (never match)
        )
    except Exception as e:
        # the fused guard raises inside the Spark job; surface the same
        # ValueError the eager probes raised (API contract + test pins).
        # Match on the unique sentinel tokens, not the prose — wrapped
        # or truncated exception text keeps the short token, and no
        # unrelated failure plausibly embeds it.
        if _DUP_KEY_SENTINEL in str(e):
            raise ValueError(_DUP_KEY_MSG) from None
        if _NULL_KEY_SENTINEL in str(e):
            raise ValueError(_NULL_KEY_MSG) from None
        raise
    finally:
        acting.unpersist()
