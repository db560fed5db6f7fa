"""PartitionSpec (api/.../PartitionSpec.java:52,378-460) and whole-expression
projection onto partition space (api/.../expressions/Projections.java:31-90).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from incubator_iceberg_spark import expressions as X
from incubator_iceberg_spark import schema as S
from incubator_iceberg_spark import transforms as T

PARTITION_FIELD_ID_START = 1000


@dataclass(frozen=True)
class PartitionField:
    source_id: int
    field_id: int
    name: str
    transform: T.Transform


class PartitionSpec:
    def __init__(self, schema: S.Schema, fields, spec_id: int = 0):
        self.schema = schema
        self.fields: tuple = tuple(fields)
        self.spec_id = spec_id

    @staticmethod
    def unpartitioned(schema: S.Schema) -> "PartitionSpec":
        return PartitionSpec(schema, (), spec_id=0)

    @staticmethod
    def build(schema: S.Schema, parts, spec_id: int = 0) -> "PartitionSpec":
        """``parts``: list of (source_col, transform[, name]) or "col" or
        "transform(col)" strings, e.g. ["month(l_shipdate)", ("o_orderkey",
        "bucket[8]")]."""
        fields = []
        next_id = PARTITION_FIELD_ID_START
        for p in parts:
            name = None
            if isinstance(p, str):
                src, tr = _parse_part(p)
            else:
                src, tr = p[0], p[1]
                if len(p) > 2:
                    name = p[2]
                if isinstance(tr, str):
                    tr = T.parse_transform(tr)
            if isinstance(tr, T.UnknownTransform):
                # spec CREATION (DDL / spec evolution) must reject what
                # this engine can't compute; only metadata READS of a
                # newer engine's specs tolerate unknown transforms
                raise ValueError(f"unknown transform: {tr.raw!r}")
            field = schema.find_field(src)
            if field is None:
                raise ValueError(f"partition source column not found: {src}")
            if not tr.can_transform(field.type):
                raise ValueError(f"cannot apply {tr} to {field.type} column {src}")
            if name is None:
                name = _default_name(src, tr)
            fields.append(PartitionField(field.field_id, next_id, name, tr))
            next_id += 1
        return PartitionSpec(schema, fields, spec_id=spec_id)

    @property
    def is_partitioned(self) -> bool:
        return len(self.fields) > 0

    def partition_type(self) -> S.StructType:
        out = []
        for f in self.fields:
            src = self.schema.find_field(f.source_id)
            out.append(S.NestedField(f.field_id, f.name,
                                     f.transform.result_type(src.type), required=False))
        return S.StructType(out)

    def source_column(self, f: PartitionField) -> str:
        return self.schema.field_path(f.source_id)

    def spark_partition_columns(self, schema: Optional[S.Schema] = None):
        """[(name, Column)] computing each partition value JVM-side."""
        from pyspark.sql import functions as F
        schema = schema or self.schema
        out = []
        for f in self.fields:
            src_field = schema.find_field(f.source_id)
            col = F.col(schema.field_path(f.source_id))
            if isinstance(f.transform, T.TruncateTransform):
                expr = f.transform.spark_expr_for(col, src_field.type)
            else:
                expr = f.transform.spark_expr(col)
            out.append((f.name, expr))
        return out

    def partition_tuple(self, row: dict) -> tuple:
        """Compute partition values for a Python row dict (driver-side)."""
        out = []
        for f in self.fields:
            src = self.schema.field_path(f.source_id)
            v = row.get(src)
            tr = f.transform
            if isinstance(tr, (T.BucketTransform, T.TruncateTransform)):
                out.append(tr.apply(v, self.schema.find_field(f.source_id).type)
                           if isinstance(tr, T.BucketTransform) else tr.apply(v))
            else:
                out.append(tr.apply(v))
        return tuple(out)

    def to_json(self) -> dict:
        return {"spec-id": self.spec_id,
                "fields": [{"source-id": f.source_id, "field-id": f.field_id,
                            "name": f.name, "transform": str(f.transform)}
                           for f in self.fields]}

    @staticmethod
    def from_json(obj: dict, schema: S.Schema) -> "PartitionSpec":
        fields = [PartitionField(f["source-id"], f["field-id"], f["name"],
                                 T.parse_transform(f["transform"]))
                  for f in obj["fields"]]
        return PartitionSpec(schema, fields, spec_id=obj.get("spec-id", 0))

    def __str__(self):
        return "[" + ", ".join(
            f"{f.name}={f.transform}({self.source_column(f)})" for f in self.fields) + "]"


def _parse_part(s: str):
    s = s.strip()
    if "(" in s and s.endswith(")"):
        head, arg = s.split("(", 1)
        arg = arg[:-1]
        head = head.strip().lower()
        if head in ("year", "month", "day", "hour", "void", "identity"):
            return arg.strip(), T.parse_transform(head)
        if head in ("bucket", "truncate"):
            # bucket(16, col) or bucket(col, 16)
            a, b = [x.strip() for x in arg.split(",")]
            if a.isdigit():
                return b, T.parse_transform(f"{head}[{a}]")
            return a, T.parse_transform(f"{head}[{b}]")
    return s, T.IdentityTransform()


def _default_name(src: str, tr: T.Transform) -> str:
    if isinstance(tr, T.IdentityTransform):
        return src
    if isinstance(tr, T.BucketTransform):
        return f"{src}_bucket"
    if isinstance(tr, T.TruncateTransform):
        return f"{src}_trunc"
    return f"{src}_{tr.name}"


# -- whole-expression projection (Projections.java) --------------------------

def project_inclusive(spec: PartitionSpec, bound_expr: X.Expression) -> X.Expression:
    """Weakest partition-space predicate implied by the row predicate: any
    file whose partition tuple fails this CANNOT contain matching rows.
    Unprojectable subtrees become ``true`` (keep the file)."""
    return _project(spec, bound_expr, strict=False)


def project_strict(spec: PartitionSpec, bound_expr: X.Expression) -> X.Expression:
    """Partition-space predicate that guarantees ALL rows in a matching
    file satisfy the row predicate.  Unprojectable subtrees become
    ``false`` (no guarantee)."""
    return _project(spec, bound_expr, strict=True)


def _project(spec, e, strict):
    default = X.always_false() if strict else X.always_true()
    if isinstance(e, (X.AlwaysTrue, X.AlwaysFalse)):
        return e
    if isinstance(e, X.And):
        return X.and_(_project(spec, e.left, strict), _project(spec, e.right, strict))
    if isinstance(e, X.Or):
        return X.or_(_project(spec, e.left, strict), _project(spec, e.right, strict))
    if isinstance(e, (X.Not, X.SqlPredicate)):
        # NOT is rewritten away by bind(); SqlPredicate is unknowable
        return default
    if isinstance(e, X.Predicate):
        if not isinstance(e.term, X.BoundReference):
            return default
        parts = []
        for f in spec.fields:
            if f.source_id != e.term.field_id:
                continue
            proj = (f.transform.project_strict(f.name, e) if strict
                    else f.transform.project(f.name, e))
            if proj is not None:
                parts.append(proj)
        if not parts:
            return default
        # multiple partition fields on the same source: all projections hold
        return X.and_(*parts) if not strict else X.or_(*parts)
    return default
