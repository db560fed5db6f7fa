"""Transactions (C10; core/.../BaseTransaction.java:51-219).

Multiple table operations staged against a working copy of the metadata,
installed with ONE atomic swap.  Data files are written eagerly (they are
invisible until the metadata commit — same staging story as CTAS); the
metadata mutations are queued as composable ``base → metadata`` functions
and re-applied on commit conflicts.

Supported ops: append, dynamic_overwrite, delete_where (predicate planned
at queue time against the transaction's working state), set_properties.

    with table.new_transaction() as tx:
        tx.delete_where("o_orderdate < TIMESTAMP '1996-01-01'")
        tx.append(fresh_df)
    # ← single snapshot-chain commit; readers see both or neither
"""

from __future__ import annotations

from typing import Callable, Optional

from incubator_iceberg_spark import expressions as X
from incubator_iceberg_spark import metadata as MD
from incubator_iceberg_spark import snapshots as SN
from incubator_iceberg_spark import write as W


class Transaction:
    def __init__(self, table, spark=None):
        self.table = table
        self.spark = spark or table.spark
        self._actions: list[Callable] = []
        self._committed = False

    # -- staged ops ----------------------------------------------------------
    def append(self, df) -> "Transaction":
        entries = self.table._stage(df, self.spark)
        self._actions.append(lambda md: SN.apply_append(md, list(entries)))
        return self

    def dynamic_overwrite(self, df) -> "Transaction":
        entries = self.table._stage(df, self.spark)
        pt = self.table.metadata.spec().partition_type()
        names = [f.name for f in pt.fields]
        written = {tuple((e.get("partition") or {}).get(n) for n in names)
                   for e in entries}

        def act(md):
            from incubator_iceberg_spark import manifests as MF
            import os
            # inline replace-partitions against the working metadata
            dropped: list = []

            def make(base, snapshot_id, seq):
                md_dir = os.path.join(base.location, "metadata")
                rows = []
                for row in SN._manifest_rows(base):
                    tbl = MF.read_manifest_arrow(row["manifest_path"])
                    drop = set()
                    for e in tbl.to_pylist():
                        p = e.get("partition") or {}
                        if tuple(p.get(n) for n in names) in written:
                            drop.add(e["file_path"])
                    new_row, dr = SN._rewrite_manifest_without(
                        md_dir, base, row, drop, snapshot_id, seq)
                    dropped.extend(dr)
                    if new_row is not None:
                        rows.append(new_row)
                if entries:
                    rows.extend(SN._write_added_manifests(
                        md_dir, base, list(entries), snapshot_id, seq))
                return rows

            return SN._install_snapshot(md, make, "overwrite", None,
                                        list(entries), dropped)

        self._actions.append(act)
        return self

    def delete_where(self, condition) -> "Transaction":
        """Plans candidate files against the CURRENT transaction state (the
        table as of queueing, plus earlier staged ops are not yet visible —
        reference transactions behave the same way for independent ops)."""
        from incubator_iceberg_spark import row_ops
        from incubator_iceberg_spark.scan import TableScan, parse_predicate

        expr = parse_predicate(condition) if isinstance(condition, str) else condition
        md = self.table.metadata
        bound = X.bind(md.schema(), expr)
        scan = TableScan(self.table, self.spark, row_filter=expr)
        cand, dels = row_ops._plan_delete_candidates(self.table, scan, bound)
        if cand is None:
            return self
        rewrite = [c for c in cand if not c["strict"]]
        new_entries = []
        if rewrite:
            from pyspark.sql import functions as F
            from incubator_iceberg_spark.scan import read_entries
            schema = md.schema()
            kept = read_entries(self.spark, md, [c.entry for c in rewrite],
                                dels, schema)
            kept = kept.filter(~F.coalesce(X.to_column(bound), F.lit(False)))
            new_entries = W.stage_write(self.spark, md.location, kept, schema,
                                        md.spec(), sort_order=md.sort_order(),
                                        properties=md.properties)
        deleted = {c["file_path"] for c in cand}
        if not deleted and not new_entries:
            return self
        self._actions.append(
            lambda m: SN.apply_overwrite(m, new_entries, deleted, operation="delete"))
        return self

    def set_properties(self, updates: dict) -> "Transaction":
        def act(md):
            import dataclasses
            new = dataclasses.replace(md)
            props = dict(md.properties)
            for k, v in updates.items():
                if v is None:
                    props.pop(k, None)
                else:
                    props[k] = str(v)
            new.properties = props
            new.last_updated_ms = MD.now_ms()
            return new

        self._actions.append(act)
        return self

    # -- commit ----------------------------------------------------------------
    def commit_transaction(self):
        if self._committed:
            raise RuntimeError("transaction already committed")

        def apply(base):
            md = base
            for act in self._actions:
                md = act(md)
            return md

        self.table.metadata = MD.run_with_retries(self.table.ops, apply)
        self._committed = True
        return self.table

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None and not self._committed:
            self.commit_transaction()
        return False
