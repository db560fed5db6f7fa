"""Type system + Schema with field IDs.

Re-expresses the reference's type model (api/.../types/Type.java:29-45,
Types.java:82-761) and Schema (api/.../Schema.java:50-96) in Python, with
bidirectional mapping to Spark ``StructType``.  Field IDs are carried in
Spark field metadata under ``iceberg.field-id`` so they survive renames —
the key to schema evolution (SURVEY.md §1.1).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from typing import Any, Iterator, Optional

FIELD_ID_KEY = "iceberg.field-id"


class Type:
    type_id: str = "?"

    @property
    def is_primitive(self) -> bool:
        return not isinstance(self, (StructType, ListType, MapType))

    def __repr__(self) -> str:
        return str(self)


class _Singleton(Type):
    _instances: dict = {}

    def __new__(cls):
        if cls not in _Singleton._instances:
            _Singleton._instances[cls] = super().__new__(cls)
        return _Singleton._instances[cls]

    def __eq__(self, other):
        return type(self) is type(other)

    def __hash__(self):
        return hash(type(self).__name__)

    def __str__(self):
        return self.type_id


class BooleanType(_Singleton):
    type_id = "boolean"


class IntegerType(_Singleton):
    type_id = "int"


class LongType(_Singleton):
    type_id = "long"


class FloatType(_Singleton):
    type_id = "float"


class DoubleType(_Singleton):
    type_id = "double"


class DateType(_Singleton):
    type_id = "date"


class TimeType(_Singleton):
    """Time of day, microseconds.  Spark has no TimeType → LongType + tag
    (the reference hits the same gap, SURVEY.md §1.2)."""

    type_id = "time"


class StringType(_Singleton):
    type_id = "string"


class UUIDType(_Singleton):
    """Carried as StringType + metadata tag in Spark."""

    type_id = "uuid"


class BinaryType(_Singleton):
    type_id = "binary"


@dataclass(frozen=True)
class TimestampType(Type):
    """timestamp with/without zone (api/.../types/Types.java:211)."""

    with_zone: bool = True
    type_id: str = dc_field(default="timestamp", init=False, repr=False)

    def __str__(self):
        return "timestamptz" if self.with_zone else "timestamp"


@dataclass(frozen=True)
class FixedType(Type):
    length: int
    type_id: str = dc_field(default="fixed", init=False, repr=False)

    def __str__(self):
        return f"fixed[{self.length}]"


@dataclass(frozen=True)
class DecimalType(Type):
    precision: int
    scale: int
    type_id: str = dc_field(default="decimal", init=False, repr=False)

    def __str__(self):
        return f"decimal({self.precision},{self.scale})"


@dataclass(frozen=True)
class NestedField:
    field_id: int
    name: str
    type: Type
    required: bool = False
    doc: Optional[str] = None

    def __str__(self):
        req = "required" if self.required else "optional"
        return f"{self.field_id}: {self.name}: {req} {self.type}"


@dataclass(frozen=True)
class StructType(Type):
    fields: tuple
    type_id: str = dc_field(default="struct", init=False, repr=False)

    def __init__(self, fields):
        object.__setattr__(self, "fields", tuple(fields))

    def field(self, name: str) -> Optional[NestedField]:
        for f in self.fields:
            if f.name == name:
                return f
        return None

    def __str__(self):
        return "struct<" + ", ".join(str(f) for f in self.fields) + ">"


@dataclass(frozen=True)
class ListType(Type):
    element_field: NestedField  # name is always "element"
    type_id: str = dc_field(default="list", init=False, repr=False)

    @staticmethod
    def of(element_id: int, element_type: Type, required: bool = False) -> "ListType":
        return ListType(NestedField(element_id, "element", element_type, required))

    def __str__(self):
        return f"list<{self.element_field.type}>"


@dataclass(frozen=True)
class MapType(Type):
    key_field: NestedField  # "key", always required
    value_field: NestedField  # "value"
    type_id: str = dc_field(default="map", init=False, repr=False)

    @staticmethod
    def of(key_id: int, key_type: Type, value_id: int, value_type: Type,
           value_required: bool = False) -> "MapType":
        return MapType(
            NestedField(key_id, "key", key_type, True),
            NestedField(value_id, "value", value_type, value_required),
        )

    def __str__(self):
        return f"map<{self.key_field.type}, {self.value_field.type}>"


# ---------------------------------------------------------------------------
# Type promotion (api/.../types/CheckCompatibility.java): legal promotions are
# int→long, float→double, decimal(p,s)→decimal(p2>=p,s).
# ---------------------------------------------------------------------------

def is_promotion_allowed(src: Type, dst: Type) -> bool:
    if src == dst:
        return True
    if isinstance(src, IntegerType) and isinstance(dst, LongType):
        return True
    if isinstance(src, FloatType) and isinstance(dst, DoubleType):
        return True
    if isinstance(src, DecimalType) and isinstance(dst, DecimalType):
        return dst.scale == src.scale and dst.precision >= src.precision
    return False


class Schema:
    """Named, ID-addressed columns (api/.../Schema.java:50-96)."""

    def __init__(self, fields, schema_id: int = 0, identifier_field_ids=()):
        self.struct = StructType(fields)
        self.schema_id = schema_id
        self.identifier_field_ids = tuple(identifier_field_ids)
        self._name_to_id: dict[str, int] = {}
        self._id_to_field: dict[int, NestedField] = {}
        self._id_to_path: dict[int, str] = {}
        self._index(self.struct, prefix="")

    # -- indexing (api/.../types/IndexByName.java, IndexById.java) ---------
    def _index(self, struct_or_type, prefix: str):
        if isinstance(struct_or_type, StructType):
            for f in struct_or_type.fields:
                path = f"{prefix}{f.name}"
                self._name_to_id[path] = f.field_id
                self._id_to_field[f.field_id] = f
                self._id_to_path[f.field_id] = path
                self._index(f.type, prefix=path + ".")
        elif isinstance(struct_or_type, ListType):
            ef = struct_or_type.element_field
            self._id_to_field[ef.field_id] = ef
            self._id_to_path[ef.field_id] = prefix + "element"
            self._index(ef.type, prefix=prefix + "element.")
        elif isinstance(struct_or_type, MapType):
            for mf in (struct_or_type.key_field, struct_or_type.value_field):
                self._id_to_field[mf.field_id] = mf
                self._id_to_path[mf.field_id] = prefix + mf.name
                self._index(mf.type, prefix=prefix + mf.name + ".")

    @property
    def fields(self) -> tuple:
        return self.struct.fields

    def columns(self) -> list[str]:
        return [f.name for f in self.fields]

    def find_field(self, name_or_id, case_sensitive: bool = True) -> Optional[NestedField]:
        if isinstance(name_or_id, int):
            return self._id_to_field.get(name_or_id)
        if case_sensitive:
            fid = self._name_to_id.get(name_or_id)
        else:
            lowered = {n.lower(): i for n, i in self._name_to_id.items()}
            fid = lowered.get(name_or_id.lower())
        return self._id_to_field.get(fid) if fid is not None else None

    def field_path(self, field_id: int) -> Optional[str]:
        return self._id_to_path.get(field_id)

    def highest_field_id(self) -> int:
        return max(self._id_to_field.keys(), default=0)

    def __str__(self):
        return "table " + str(self.struct)

    def __eq__(self, other):
        return isinstance(other, Schema) and self.struct == other.struct

    # -- Spark conversion --------------------------------------------------
    def to_spark(self):
        import pyspark.sql.types as T

        return _to_spark_struct(self.struct)

    @staticmethod
    def from_spark(spark_schema, schema_id: int = 0) -> "Schema":
        """Convert a Spark StructType; assigns fresh IDs where metadata has
        none (api/.../types/AssignFreshIds.java analog)."""
        counter = _IdCounter()
        fields = [_from_spark_field(f, counter) for f in spark_schema.fields]
        return Schema(fields, schema_id=schema_id)

    # -- JSON round trip ---------------------------------------------------
    def to_json(self) -> dict:
        return {
            "schema-id": self.schema_id,
            "identifier-field-ids": list(self.identifier_field_ids),
            "fields": [_field_to_json(f) for f in self.fields],
        }

    @staticmethod
    def from_json(obj: dict) -> "Schema":
        return Schema(
            [_field_from_json(f) for f in obj["fields"]],
            schema_id=obj.get("schema-id", 0),
            identifier_field_ids=obj.get("identifier-field-ids", ()),
        )

    def select(self, *names: str) -> "Schema":
        """Column pruning by name (api/.../types/PruneColumns.java analog,
        top-level only — nested pruning is delegated to Spark's
        nestedSchemaPruning)."""
        keep = set(names)
        return Schema([f for f in self.fields if f.name in keep],
                      schema_id=self.schema_id)


class _IdCounter:
    def __init__(self, start: int = 0):
        self.v = start

    def next(self) -> int:
        self.v += 1
        return self.v


# -- Spark StructType conversion helpers ------------------------------------

def _to_spark_type(t: Type):
    import pyspark.sql.types as T

    if isinstance(t, BooleanType):
        return T.BooleanType()
    if isinstance(t, IntegerType):
        return T.IntegerType()
    if isinstance(t, LongType):
        return T.LongType()
    if isinstance(t, FloatType):
        return T.FloatType()
    if isinstance(t, DoubleType):
        return T.DoubleType()
    if isinstance(t, DateType):
        return T.DateType()
    if isinstance(t, TimeType):
        return T.LongType()
    if isinstance(t, TimestampType):
        # Spark TimestampType == with-zone micros; NTZ carried the same way
        # plus a table-level tag (reference: SparkFixupTimestampType.java).
        return T.TimestampType() if t.with_zone else T.TimestampNTZType()
    if isinstance(t, StringType) or isinstance(t, UUIDType):
        return T.StringType()
    if isinstance(t, (FixedType, BinaryType)):
        return T.BinaryType()
    if isinstance(t, DecimalType):
        return T.DecimalType(t.precision, t.scale)
    if isinstance(t, StructType):
        return _to_spark_struct(t)
    if isinstance(t, ListType):
        ef = t.element_field
        return T.ArrayType(_to_spark_type(ef.type), containsNull=not ef.required)
    if isinstance(t, MapType):
        return T.MapType(
            _to_spark_type(t.key_field.type),
            _to_spark_type(t.value_field.type),
            valueContainsNull=not t.value_field.required,
        )
    raise ValueError(f"unsupported type: {t}")


def _to_spark_struct(struct: StructType):
    import pyspark.sql.types as T

    return T.StructType([
        T.StructField(
            f.name,
            _to_spark_type(f.type),
            nullable=not f.required,
            metadata={FIELD_ID_KEY: f.field_id, "iceberg.type": str(f.type)},
        )
        for f in struct.fields
    ])


def _from_spark_type(t, counter: _IdCounter) -> Type:
    import pyspark.sql.types as T

    if isinstance(t, T.BooleanType):
        return BooleanType()
    if isinstance(t, T.IntegerType) or isinstance(t, (T.ShortType, T.ByteType)):
        return IntegerType()
    if isinstance(t, T.LongType):
        return LongType()
    if isinstance(t, T.FloatType):
        return FloatType()
    if isinstance(t, T.DoubleType):
        return DoubleType()
    if isinstance(t, T.DateType):
        return DateType()
    if isinstance(t, T.TimestampType):
        return TimestampType(with_zone=True)
    if hasattr(T, "TimestampNTZType") and isinstance(t, T.TimestampNTZType):
        return TimestampType(with_zone=False)
    if isinstance(t, T.StringType):
        return StringType()
    if isinstance(t, T.BinaryType):
        return BinaryType()
    if isinstance(t, T.DecimalType):
        return DecimalType(t.precision, t.scale)
    if isinstance(t, T.StructType):
        return StructType([_from_spark_field(f, counter) for f in t.fields])
    if isinstance(t, T.ArrayType):
        eid = counter.next()
        return ListType(NestedField(eid, "element",
                                    _from_spark_type(t.elementType, counter),
                                    required=not t.containsNull))
    if isinstance(t, T.MapType):
        kid, vid = counter.next(), counter.next()
        return MapType(
            NestedField(kid, "key", _from_spark_type(t.keyType, counter), True),
            NestedField(vid, "value", _from_spark_type(t.valueType, counter),
                        required=not t.valueContainsNull),
        )
    raise ValueError(f"unsupported spark type: {t}")


def _from_spark_field(f, counter: _IdCounter) -> NestedField:
    meta = f.metadata or {}
    fid = meta.get(FIELD_ID_KEY)
    if fid is None:
        fid = counter.next()
    else:
        counter.v = max(counter.v, int(fid))
    return NestedField(int(fid), f.name, _from_spark_type(f.dataType, counter),
                       required=not f.nullable)


# -- JSON serialization ------------------------------------------------------

def _type_to_json(t: Type) -> Any:
    if isinstance(t, StructType):
        return {"type": "struct", "fields": [_field_to_json(f) for f in t.fields]}
    if isinstance(t, ListType):
        ef = t.element_field
        return {"type": "list", "element-id": ef.field_id,
                "element": _type_to_json(ef.type), "element-required": ef.required}
    if isinstance(t, MapType):
        return {"type": "map",
                "key-id": t.key_field.field_id, "key": _type_to_json(t.key_field.type),
                "value-id": t.value_field.field_id, "value": _type_to_json(t.value_field.type),
                "value-required": t.value_field.required}
    return str(t)


def _field_to_json(f: NestedField) -> dict:
    out = {"id": f.field_id, "name": f.name, "required": f.required,
           "type": _type_to_json(f.type)}
    if f.doc:
        out["doc"] = f.doc
    return out


_PRIMITIVES = {
    "boolean": BooleanType, "int": IntegerType, "long": LongType,
    "float": FloatType, "double": DoubleType, "date": DateType,
    "time": TimeType, "string": StringType, "uuid": UUIDType,
    "binary": BinaryType,
}


def type_from_string(s: str) -> Type:
    if s in _PRIMITIVES:
        return _PRIMITIVES[s]()
    if s == "timestamptz":
        return TimestampType(with_zone=True)
    if s == "timestamp":
        return TimestampType(with_zone=False)
    if s.startswith("fixed["):
        return FixedType(int(s[len("fixed["):-1]))
    if s.startswith("decimal("):
        p, sc = s[len("decimal("):-1].split(",")
        return DecimalType(int(p), int(sc))
    for prefix in ("array<", "list<"):
        if s.startswith(prefix) and s.endswith(">"):
            # placeholder element id -1: UpdateSchema.add_column assigns a
            # fresh id at commit (like AssignFreshIds for nested adds)
            return ListType.of(-1, type_from_string(s[len(prefix):-1]))
    if s.startswith("map<") and s.endswith(">"):
        # split on the FIRST top-level comma (keys are primitive here)
        inner = s[len("map<"):-1]
        k, _, v = inner.partition(",")
        return MapType.of(-1, type_from_string(k.strip()),
                          -2, type_from_string(v.strip()))
    raise ValueError(f"unknown type string: {s}")


def _type_from_json(obj: Any) -> Type:
    if isinstance(obj, str):
        return type_from_string(obj)
    t = obj["type"]
    if t == "struct":
        return StructType([_field_from_json(f) for f in obj["fields"]])
    if t == "list":
        return ListType(NestedField(obj["element-id"], "element",
                                    _type_from_json(obj["element"]),
                                    required=obj.get("element-required", False)))
    if t == "map":
        return MapType(
            NestedField(obj["key-id"], "key", _type_from_json(obj["key"]), True),
            NestedField(obj["value-id"], "value", _type_from_json(obj["value"]),
                        required=obj.get("value-required", False)),
        )
    raise ValueError(f"unknown type json: {obj}")


def _field_from_json(obj: dict) -> NestedField:
    return NestedField(obj["id"], obj["name"], _type_from_json(obj["type"]),
                       required=obj.get("required", False), doc=obj.get("doc"))
