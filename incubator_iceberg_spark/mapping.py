"""Name mapping for field-ID-less data files.

Reference: core/.../mapping/NameMapping.java + MappingUtil.java +
NameMappingParser.java (JSON contract), applied at
parquet/.../ApplyNameMapping.java and orc/.../ApplyNameMapping.java;
the table property is ``schema.name-mapping.default``
(core/.../TableProperties.java:139).  Schema evolution keeps the
mapping current (core/.../SchemaUpdate.java:404 MappingUtil.update).

Files written by the engine carry a manifest-stamped write-schema id,
so field-id projection (scan._project_to_current) already resolves
renames for them.  IMPORTED files (add_files over foreign parquet)
have no such pedigree: their physical column names are whatever the
external writer used.  The name mapping is the stored contract that
resolves those names to field ids — a JSON list of
``{"field-id": N, "names": [...]}`` entries (nested structs carry a
``"fields"`` list) kept in the table property.

Spark-first application: instead of rewriting parquet footers to
inject field ids, the scan reads a foreign file group with its
PHYSICAL schema and projects each current-schema field from the first
mapped alias present (:func:`apply_to_df`); a field none of whose
aliases appear reads as NULL, matching the reference's behavior for
unmapped columns.  Import-time footer stats are re-keyed from physical
alias names to canonical field names (:func:`alias_to_canonical`), so
metrics pruning keeps working over imported files.

Mapping application here is TOP-LEVEL: nested entries parse and
round-trip (the reference format is preserved verbatim), but alias
resolution projects whole top-level columns — the engine's stats and
projection planes are top-level-keyed (see write.footer_stats).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Sequence

from incubator_iceberg_spark import schema as S

#: table property holding the default mapping (TableProperties.java:139)
NAME_MAPPING_PROP = "schema.name-mapping.default"

#: manifest ``schema_id`` sentinel for imported field-ID-less files:
#: the read path must resolve their columns via the name mapping, not
#: via a stored engine write-schema.
FOREIGN_SCHEMA_ID = -1


@dataclasses.dataclass(frozen=True)
class MappedField:
    """One mapping entry: a set of external names for one field id
    (core/.../mapping/MappedField.java)."""
    field_id: Optional[int]
    names: tuple
    nested: tuple = ()  # MappedField children for struct/list/map types

    def with_name(self, name: str) -> "MappedField":
        if name in self.names:
            return self
        return dataclasses.replace(self, names=self.names + (name,))


class NameMapping:
    """External-name → field-id mapping (NameMapping.java semantics:
    lookup by id or by name; names within one mapping level must be
    unambiguous)."""

    def __init__(self, fields: Sequence[MappedField]):
        self.fields = tuple(fields)
        self._by_id: dict = {}
        self._by_name: dict = {}

        def index(mfs, prefix):
            for mf in mfs:
                if mf.field_id is not None:
                    self._by_id[mf.field_id] = mf
                for n in mf.names:
                    key = prefix + n
                    if key in self._by_name:
                        raise ValueError(
                            f"invalid name mapping: {key!r} is ambiguous")
                    self._by_name[key] = mf
                if mf.nested:
                    for n in mf.names:
                        index(mf.nested, prefix + n + ".")

        index(self.fields, "")

    def find_by_id(self, field_id: int) -> Optional[MappedField]:
        return self._by_id.get(field_id)

    def find_by_name(self, name: str) -> Optional[MappedField]:
        return self._by_name.get(name)

    # -- JSON (NameMappingParser.java format, round-trip exact) ----------
    def to_json(self) -> str:
        def enc(mf: MappedField) -> dict:
            d: dict = {"field-id": mf.field_id, "names": list(mf.names)}
            if mf.nested:
                d["fields"] = [enc(c) for c in mf.nested]
            return d

        return json.dumps([enc(mf) for mf in self.fields])

    @classmethod
    def from_json(cls, text: str) -> "NameMapping":
        def dec(d: dict) -> MappedField:
            return MappedField(
                field_id=d.get("field-id"),
                names=tuple(d.get("names") or ()),
                nested=tuple(dec(c) for c in (d.get("fields") or ())))

        data = json.loads(text)
        if not isinstance(data, list):
            raise ValueError("name mapping JSON must be a list")
        return cls([dec(d) for d in data])


def create_mapping(schema: S.Schema) -> NameMapping:
    """Default mapping from a schema — each field's current name maps to
    its field id (MappingUtil.create / CreateMapping visitor)."""

    def from_type(t) -> tuple:
        if isinstance(t, S.StructType):
            return tuple(
                MappedField(f.field_id, (f.name,), from_type(f.type))
                for f in t.fields)
        if isinstance(t, S.ListType):
            el = t.element_field
            return (MappedField(el.field_id, ("element",),
                                from_type(el.type)),)
        if isinstance(t, S.MapType):
            k, v = t.key_field, t.value_field
            return (MappedField(k.field_id, ("key",), from_type(k.type)),
                    MappedField(v.field_id, ("value",), from_type(v.type)))
        return ()

    return NameMapping([
        MappedField(f.field_id, (f.name,), from_type(f.type))
        for f in schema.fields])


def update_mapping(mapping: NameMapping, renames: dict,
                   adds: Sequence[S.NestedField]) -> NameMapping:
    """Evolve the mapping with schema changes (MappingUtil.update,
    invoked from SchemaUpdate.java:404): a renamed field keeps its old
    names and gains the new one as an alias; added columns extend the
    mapping with fresh single-name entries.  ``renames`` maps field id
    → new name; ``adds`` are the new top-level fields."""

    def walk(mfs) -> tuple:
        out = []
        for mf in mfs:
            new = renames.get(mf.field_id)
            if new is not None:
                mf = mf.with_name(new)
            if mf.nested:
                mf = dataclasses.replace(mf, nested=walk(mf.nested))
            out.append(mf)
        return tuple(out)

    fields = list(walk(mapping.fields))
    known = {mf.field_id for mf in fields}
    sub = create_mapping(S.Schema(list(adds), schema_id=0)).fields \
        if adds else ()
    fields.extend(mf for mf in sub if mf.field_id not in known)
    return NameMapping(fields)


def alias_to_canonical(mapping: NameMapping, schema: S.Schema) -> dict:
    """{physical alias name → canonical current-schema name} for every
    alias of a mapped TOP-LEVEL field.  Used to re-key imported footer
    stats so metrics pruning sees canonical names."""
    out: dict = {}
    for f in schema.fields:
        mf = mapping.find_by_id(f.field_id)
        if mf is None:
            continue
        for n in mf.names:
            out[n] = f.name
    return out


def apply_to_df(df, mapping: NameMapping, current: S.Schema, extra=None):
    """ApplyNameMapping in DataFrame terms: project a physically-named
    DataFrame (read straight from foreign files, no forced schema) to
    the current table schema.  The DataFrame may union SEVERAL foreign
    layouts (mergeSchema) in which different files carry different
    aliases of the same field — e.g. files imported before and after a
    rename added an alias — so each current field COALESCES over all of
    its aliases present among the physical columns, in mapping order
    (per row only the originating file's alias is populated; picking a
    single "first present" alias silently nulled every file that used
    another one).  A field with no alias present reads as NULL (the
    reference's unmapped-column behavior).  ``extra`` appends lineage
    columns untouched."""
    from pyspark.sql import functions as F

    physical = set(df.columns)
    cols = []
    for f in current.fields:
        mf = mapping.find_by_id(f.field_id)
        spark_t = S._to_spark_type(f.type)
        srcs = [n for n in mf.names if n in physical] if mf else []
        if not srcs:
            cols.append(F.lit(None).cast(spark_t).alias(f.name))
        else:
            cols.append(F.coalesce(
                *[F.col(n).cast(spark_t) for n in srcs]).alias(f.name))
    return df.select(*cols, *(extra or []))


def table_mapping(md) -> Optional[NameMapping]:
    """The table's stored default mapping, or None."""
    raw = (md.properties or {}).get(NAME_MAPPING_PROP)
    return NameMapping.from_json(raw) if raw else None


def set_default_mapping(table, mapping: Optional[NameMapping] = None,
                        aliases: Optional[dict] = None) -> NameMapping:
    """Install ``schema.name-mapping.default`` on a table.  With no
    arguments, the default mapping is created from the current schema
    (MappingUtil.create); ``aliases`` ({current column name → extra
    external name(s)}) registers the physical names foreign files use.
    Subsequent add_files imports are treated as field-ID-less and
    resolve through this mapping at read time."""
    nm = mapping or create_mapping(table.metadata.schema())
    if aliases:
        schema = table.metadata.schema()
        fields = list(nm.fields)
        for col, names in aliases.items():
            f = schema.find_field(col)
            if f is None:
                raise ValueError(f"no such column: {col}")
            names = [names] if isinstance(names, str) else list(names)
            for i, mf in enumerate(fields):
                if mf.field_id == f.field_id:
                    for n in names:
                        mf = mf.with_name(n)
                    fields[i] = mf
        nm = NameMapping(fields)
    table.update_properties({NAME_MAPPING_PROP: nm.to_json()})
    return nm
