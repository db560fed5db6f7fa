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

Mapping application is applied at EVERY nesting level, matching
MappingUtil.visit / ApplyNameMapping.java: struct leaves resolve by
NAME through the nested MappedFields (structs are rebuilt with
``F.struct`` per mapped leaf — never cast positionally), arrays of
structs resolve their element leaves via ``F.transform``, and a leaf
none of whose aliases appear in a file reads as NULL.  Footer stats
re-key nested dotted paths through the same mapping
(:func:`alias_to_canonical` emits ``m.auth → meta.author``), so the
read plane and the pruning plane agree on which nested leaves are
NULL.  Map key/value nested structs keep a positional cast (documented
divergence; map-typed columns carry no bounds stats, so no pruning
hazard).
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
    """{physical alias path → canonical current-schema path} for every
    alias of a mapped field at EVERY nesting level — nested struct
    leaves emit dotted paths for every parent-alias × leaf-alias combo
    (``m.auth → meta.author``).  Used to re-key imported footer stats so
    metrics pruning sees canonical names for nested predicates too."""
    out: dict = {}

    def walk(fields, mfs, phys_prefixes, canon_prefix):
        by_id = {m.field_id: m for m in mfs if m.field_id is not None}
        for f in fields:
            mf = by_id.get(f.field_id)
            if mf is None:
                continue
            cpath = canon_prefix + f.name
            for pp in phys_prefixes:
                for n in mf.names:
                    out[pp + n] = cpath
            if isinstance(f.type, S.StructType) and mf.nested:
                subs = [pp + n + "." for pp in phys_prefixes
                        for n in mf.names]
                walk(f.type.fields, mf.nested, subs, cpath + ".")

    walk(schema.fields, mapping.fields, [""], "")
    return out


def _resolve_value(col, phys_t, mf: MappedField, canon_t, spark_t):
    """One physical Column → canonical type, resolving nested names
    through the mapping.  Structs rebuild leaf-by-leaf by NAME (never a
    positional cast — ApplyNameMapping.java re-keys every level);
    arrays of structs resolve elements via ``transform``; primitives
    (and map types, documented divergence) cast."""
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    if (isinstance(canon_t, S.StructType)
            and isinstance(phys_t, T.StructType) and mf.nested):
        built = _resolve_struct(col, phys_t, mf.nested, canon_t)
        # a NULL physical struct must stay NULL, not become a struct of
        # NULL leaves (and must let coalesce fall through to the next
        # alias in a multi-layout union)
        return F.when(col.isNotNull(), built)
    if (isinstance(canon_t, S.ListType)
            and isinstance(phys_t, T.ArrayType) and mf.nested):
        el_mf = next((m for m in mf.nested if "element" in m.names), None)
        el_t = canon_t.element_field.type
        if (el_mf is not None and el_mf.nested
                and isinstance(el_t, S.StructType)
                and isinstance(phys_t.elementType, T.StructType)):
            el_spark = S._to_spark_type(el_t)
            return F.when(col.isNotNull(), F.transform(
                col, lambda x: F.when(x.isNotNull(), _resolve_struct(
                    x, phys_t.elementType, el_mf.nested, el_t))
                .cast(el_spark)))
    return col.cast(spark_t)


def _resolve_struct(parent, phys_struct_t, nested_mfs, struct_t):
    """Rebuild a canonical struct from a physical struct Column: each
    canonical leaf coalesces over its present aliases (by name, through
    the nested mapping); an unmapped/absent leaf reads NULL — exactly
    the contract import-time stats stamp (write.footer_stats)."""
    from pyspark.sql import functions as F

    phys = {f.name: f.dataType for f in phys_struct_t.fields}
    by_id = {m.field_id: m for m in nested_mfs if m.field_id is not None}
    items = []
    for cf in struct_t.fields:
        cmf = by_id.get(cf.field_id)
        spark_t = S._to_spark_type(cf.type)
        srcs = [n for n in cmf.names if n in phys] if cmf else []
        if not srcs:
            items.append(F.lit(None).cast(spark_t).alias(cf.name))
        else:
            items.append(F.coalesce(
                *[_resolve_value(parent.getField(n), phys[n], cmf,
                                 cf.type, spark_t)
                  for n in srcs]).alias(cf.name))
    return F.struct(*items)


def apply_to_df(df, mapping: NameMapping, current: S.Schema, extra=None):
    """ApplyNameMapping in DataFrame terms: project a physically-named
    DataFrame (read straight from foreign files, no forced schema) to
    the current table schema, resolving names at EVERY nesting level.
    The DataFrame may union SEVERAL foreign layouts (mergeSchema) in
    which different files carry different aliases of the same field —
    e.g. files imported before and after a rename added an alias — so
    each current field COALESCES over all of its aliases present among
    the physical columns, in mapping order (per row only the
    originating file's alias is populated; picking a single "first
    present" alias silently nulled every file that used another one).
    Divergence note: when ONE file physically carries two alias columns
    of the same field, the reference reads only the first mapped name
    (even if NULL) while coalesce falls through a NULL to the other
    alias — an accepted tradeoff of the unioned-DataFrame read model.
    A field with no alias present reads as NULL (the reference's
    unmapped-column behavior).  ``extra`` appends lineage columns
    untouched."""
    from pyspark.sql import functions as F

    physical = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in current.fields:
        mf = mapping.find_by_id(f.field_id)
        spark_t = S._to_spark_type(f.type)
        srcs = [n for n in mf.names if n in physical] if mf else []
        if not srcs:
            cols.append(F.lit(None).cast(spark_t).alias(f.name))
        else:
            cols.append(F.coalesce(
                *[_resolve_value(F.col(n), physical[n], mf, f.type, spark_t)
                  for n in srcs]).alias(f.name))
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
        fields = tuple(nm.fields)
        for col, names in aliases.items():
            # dotted keys register NESTED leaf aliases: "meta.author"
            f = schema.find_field(col)
            if f is None:
                raise ValueError(f"no such column: {col}")
            names = [names] if isinstance(names, str) else list(names)
            fields, hit = _add_alias(fields, f.field_id, names)
            if not hit:
                raise ValueError(f"column not in mapping: {col}")
        nm = NameMapping(fields)
    table.update_properties({NAME_MAPPING_PROP: nm.to_json()})
    return nm


def _add_alias(fields: tuple, field_id: int, names) -> tuple:
    """Add alias names to the MappedField with ``field_id`` anywhere in
    the mapping tree.  Returns (new fields, found?)."""
    out, hit = [], False
    for mf in fields:
        if mf.field_id == field_id:
            for n in names:
                mf = mf.with_name(n)
            hit = True
        elif mf.nested:
            nested, sub = _add_alias(mf.nested, field_id, names)
            if sub:
                mf = dataclasses.replace(mf, nested=nested)
                hit = True
        out.append(mf)
    return tuple(out), hit
