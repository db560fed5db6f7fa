"""Schema evolution (C11; core/.../SchemaUpdate.java:64-297) and partition
spec evolution (C12; core/.../BaseUpdatePartitionSpec.java:44-171).

Schema changes produce a NEW schema version; data files are never touched.
Reads resolve columns by FIELD ID (scan._project_to_current), so renames
and type promotions are metadata-only.  Spec changes produce a new spec-id;
old files keep their old spec and scan planning prunes per spec.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from incubator_iceberg_spark import metadata as MD
from incubator_iceberg_spark import schema as S
from incubator_iceberg_spark.partitioning import PartitionSpec


class UpdateSchema:
    """Fluent schema-evolution builder: add/delete/rename/update-type/
    make-optional/move, then ``commit()``."""

    def __init__(self, table):
        self.table = table
        self._ops: list = []

    def add_column(self, name: str, col_type, doc: Optional[str] = None) -> "UpdateSchema":
        if isinstance(col_type, str):
            col_type = S.type_from_string(col_type)
        self._ops.append(("add", name, col_type, doc))
        return self

    def delete_column(self, name: str) -> "UpdateSchema":
        self._ops.append(("delete", name))
        return self

    def rename_column(self, name: str, new_name: str) -> "UpdateSchema":
        self._ops.append(("rename", name, new_name))
        return self

    def update_column_type(self, name: str, new_type) -> "UpdateSchema":
        if isinstance(new_type, str):
            new_type = S.type_from_string(new_type)
        self._ops.append(("update_type", name, new_type))
        return self

    def make_column_optional(self, name: str) -> "UpdateSchema":
        self._ops.append(("make_optional", name))
        return self

    def move_first(self, name: str) -> "UpdateSchema":
        self._ops.append(("move_first", name))
        return self

    def move_after(self, name: str, after: str) -> "UpdateSchema":
        self._ops.append(("move_after", name, after))
        return self

    def union_by_name(self, other) -> "UpdateSchema":
        """UnionByNameVisitor.java: add columns present in ``other`` but
        missing here; promote types where legal."""
        other = other if isinstance(other, S.Schema) else S.Schema.from_spark(other)
        cur = self.table.metadata.schema()
        for f in other.fields:
            mine = cur.find_field(f.name)
            if mine is None:
                self.add_column(f.name, f.type)
            elif mine.type != f.type and S.is_promotion_allowed(mine.type, f.type):
                self.update_column_type(f.name, f.type)
        return self

    def commit(self):
        table = self.table

        def apply(base):
            new = dataclasses.replace(base)
            fields = list(base.schema().fields)
            next_id = base.last_column_id
            renames: dict = {}  # field_id → new name, for mapping update
            added: list = []

            def idx(name):
                for i, f in enumerate(fields):
                    if f.name == name:
                        return i
                raise ValueError(f"column not found: {name}")

            for op in self._ops:
                kind = op[0]
                if kind == "add":
                    _, name, col_type, doc = op
                    if any(f.name == name for f in fields):
                        raise ValueError(f"column exists: {name}")
                    next_id += 1
                    fid = next_id

                    def alloc():
                        nonlocal next_id
                        next_id += 1
                        return next_id

                    col_type = _with_fresh_nested_ids(col_type, alloc)
                    fields.append(S.NestedField(fid, name, col_type,
                                                required=False, doc=doc))
                    added.append(fields[-1])
                elif kind == "delete":
                    fid = fields[idx(op[1])].field_id
                    # reference SchemaUpdate rejects deleting fields
                    # other metadata still references; silently dropping
                    # them corrupts reads (a partition source breaks
                    # spec re-rooting; an equality-delete key makes the
                    # delete unapplicable and RESURRECTS deleted rows)
                    for sp in base.specs:
                        for pf in sp.fields:
                            if pf.source_id == fid:
                                raise ValueError(
                                    f"cannot delete column '{op[1]}': it is "
                                    f"the source of partition field "
                                    f"'{pf.name}' (spec {sp.spec_id})")
                    if fid in (base.schema().identifier_field_ids or ()):
                        raise ValueError(
                            f"cannot delete column '{op[1]}': it is an "
                            "identifier field")
                    if fid in _live_equality_ids(base):
                        raise ValueError(
                            f"cannot delete column '{op[1]}': live equality-"
                            "delete files key on it and would stop applying "
                            "(deleted rows would resurrect); rewrite the "
                            "delete debt first (compact / rewrite row ops)")
                    fields.pop(idx(op[1]))
                elif kind == "rename":
                    i = idx(op[1])
                    renames[fields[i].field_id] = op[2]
                    fields[i] = dataclasses.replace(fields[i], name=op[2])
                elif kind == "update_type":
                    i = idx(op[1])
                    if not S.is_promotion_allowed(fields[i].type, op[2]):
                        raise ValueError(
                            f"illegal promotion {fields[i].type} → {op[2]}")
                    fields[i] = dataclasses.replace(fields[i], type=op[2])
                elif kind == "make_optional":
                    i = idx(op[1])
                    fields[i] = dataclasses.replace(fields[i], required=False)
                elif kind == "move_first":
                    f = fields.pop(idx(op[1]))
                    fields.insert(0, f)
                elif kind == "move_after":
                    f = fields.pop(idx(op[1]))
                    fields.insert(idx(op[2]) + 1, f)

            new_schema_id = max(s.schema_id for s in base.schemas) + 1
            new_schema = S.Schema(fields, schema_id=new_schema_id,
                                  identifier_field_ids=base.schema().identifier_field_ids)
            new.schemas = list(base.schemas) + [new_schema]
            new.current_schema_id = new_schema_id
            new.last_column_id = max(next_id, new_schema.highest_field_id())
            # re-root existing specs on the new schema so field paths resolve
            new.specs = [PartitionSpec(new_schema, sp.fields, sp.spec_id)
                         for sp in base.specs]
            # keep the stored name mapping current (SchemaUpdate.java:404
            # MappingUtil.update): a renamed field gains the new name as
            # an alias, added columns extend the mapping — imported
            # field-ID-less files stay readable across evolution
            from incubator_iceberg_spark import mapping as NM
            raw = (base.properties or {}).get(NM.NAME_MAPPING_PROP)
            if raw and (renames or added):
                nm = NM.update_mapping(NM.NameMapping.from_json(raw),
                                       renames, added)
                props = dict(base.properties)
                props[NM.NAME_MAPPING_PROP] = nm.to_json()
                new.properties = props
            new.last_updated_ms = MD.now_ms()
            return new

        table.metadata = MD.run_with_retries(table.ops, apply)
        return table


def _with_fresh_nested_ids(t, alloc):
    """Assign fresh field-ids to every nested field of an ADDED column's
    type (the AssignFreshIds analog for nested adds — type strings parse
    with placeholder ids)."""
    if isinstance(t, S.ListType):
        el = t.element_field
        return S.ListType(dataclasses.replace(
            el, field_id=alloc(), type=_with_fresh_nested_ids(el.type, alloc)))
    if isinstance(t, S.MapType):
        k, v = t.key_field, t.value_field
        return S.MapType(
            dataclasses.replace(k, field_id=alloc(),
                                type=_with_fresh_nested_ids(k.type, alloc)),
            dataclasses.replace(v, field_id=alloc(),
                                type=_with_fresh_nested_ids(v.type, alloc)))
    if isinstance(t, S.StructType):
        return S.StructType([
            dataclasses.replace(f, field_id=alloc(),
                                type=_with_fresh_nested_ids(f.type, alloc))
            for f in t.fields])
    return t


def _live_equality_ids(md) -> set:
    """Field ids referenced by LIVE equality-delete entries of the
    current snapshot (delete-manifest walk only; has_deletes=False
    manifests are skipped).  Used to block delete_column on fields
    whose eq deletes would silently stop applying."""
    from incubator_iceberg_spark import manifests as MF
    snap = md.current_snapshot()
    if snap is None:
        return set()
    ids: set = set()
    for row in MF.read_manifest_list_arrow(snap.manifest_list).to_pylist():
        if row.get("has_deletes") is False:
            continue
        for e in MF.read_manifest_arrow(row["manifest_path"]).to_pylist():
            if e.get("status") == MF.DELETED:
                continue
            if (e.get("content") or 0) == MF.EQUALITY_DELETES:
                ids.update(e.get("equality_ids") or ())
    return ids


def update_partition_spec(table, partition_by) -> None:
    """C12: install a new default spec; existing files keep their spec-id
    and scans plan per-spec (IcebergSqlExtensions.g4:70-72 ALTER TABLE ...
    REPLACE PARTITION FIELD analog)."""

    def apply(base):
        new = dataclasses.replace(base)
        schema = base.schema()
        new_spec_id = max(s.spec_id for s in base.specs) + 1
        spec = (PartitionSpec.build(schema, partition_by, spec_id=new_spec_id)
                if partition_by else
                PartitionSpec(schema, (), spec_id=new_spec_id))
        # keep partition-field ids unique across specs
        used = {f.field_id for sp in base.specs for f in sp.fields}
        next_id = max(used, default=999) + 1
        fixed = []
        for f in spec.fields:
            existing = next((g for sp in base.specs for g in sp.fields
                             if g.source_id == f.source_id and str(g.transform) == str(f.transform)),
                            None)
            if existing is not None:
                fixed.append(dataclasses.replace(f, field_id=existing.field_id,
                                                 name=existing.name))
            else:
                fixed.append(dataclasses.replace(f, field_id=next_id))
                next_id += 1
        spec = PartitionSpec(schema, fixed, spec_id=new_spec_id)
        new.specs = list(base.specs) + [spec]
        new.default_spec_id = new_spec_id
        new.last_partition_id = max(next_id - 1, base.last_partition_id)
        new.last_updated_ms = MD.now_ms()
        return new

    table.metadata = MD.run_with_retries(table.ops, apply)
