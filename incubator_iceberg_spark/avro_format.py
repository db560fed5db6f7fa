"""Avro read/write (S7) — a pure-Python Avro Object Container File codec
run DISTRIBUTED through Spark.

Why not spark-avro: the runtime ships Spark without the external
spark-avro datasource module and package installs are disallowed, so the
engine implements the container format directly from the public Avro 1.x
spec (magic ``Obj\\x01``, metadata map, null/deflate codec blocks,
zigzag-varint primitives) — the role core/src/main/java/org/apache/
iceberg/avro/Avro.java + ValueReaders.java/ValueWriters.java play in the
reference, re-expressed Python-side.

Distributed shape:
- READ: ``spark.read.format('binaryFile')`` ships each file's bytes to
  an executor; ``mapInArrow`` decodes them into Arrow batches (one task
  per file group, no driver involvement).  Decoding emits real per-row
  positions, so avro files carry ``_pos`` lineage (unlike ORC).
- WRITE: the distributed frame is encoded per task via ``mapInArrow``;
  each task groups rows by partition tuple, rolls files at the target
  record count, computes per-file column stats WHILE encoding (avro has
  no footer to read back — this keeps metrics pruning at parquet parity)
  and returns one stats row per file.

Arrow-level (mapInArrow, not pandas) on both sides: pandas would turn
nullable ints into float64+NaN and lose value fidelity.

Supported schema: the engine's primitive types (boolean, int, long,
float, double, date, time, timestamp[tz], string, uuid, binary, fixed,
decimal) plus nested struct/list/map, all as ``["null", T]`` unions with
Iceberg-style ``field-id`` props.  Codecs: ``null`` and ``deflate``
(raw RFC-1951, the spec's required pair).
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid as _uuid
import zlib
from datetime import date, datetime, timedelta, timezone
from decimal import Decimal

from incubator_iceberg_spark import schema as S

MAGIC = b"Obj\x01"
_EPOCH_DATE = date(1970, 1, 1)
_EPOCH_DT = datetime(1970, 1, 1)
_EPOCH_DT_TZ = datetime(1970, 1, 1, tzinfo=timezone.utc)


# ---------------------------------------------------------------------------
# schema mapping
# ---------------------------------------------------------------------------

def to_avro_schema(schema: S.Schema, name: str = "table") -> dict:
    """Engine schema → Avro record schema (every field a nullable union,
    field ids kept as ``field-id`` props like the reference's
    AvroSchemaUtil.convert)."""
    return _struct_to_avro(schema.fields, name)


def _struct_to_avro(fields, name: str) -> dict:
    out = {"type": "record", "name": name, "fields": []}
    for f in fields:
        out["fields"].append({
            "name": f.name,
            "type": ["null", _type_to_avro(f.type, f"{name}_{f.name}")],
            "default": None,
            "field-id": f.field_id,
        })
    return out


def _type_to_avro(t: S.Type, name: str):
    if isinstance(t, S.BooleanType):
        return "boolean"
    if isinstance(t, S.IntegerType):
        return "int"
    if isinstance(t, S.LongType):
        return "long"
    if isinstance(t, S.FloatType):
        return "float"
    if isinstance(t, S.DoubleType):
        return "double"
    if isinstance(t, S.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(t, S.TimeType):
        return {"type": "long", "logicalType": "time-micros"}
    if isinstance(t, S.TimestampType):
        lt = "timestamp-micros" if t.with_zone else "local-timestamp-micros"
        return {"type": "long", "logicalType": lt}
    if isinstance(t, S.StringType):
        return "string"
    if isinstance(t, S.UUIDType):
        return {"type": "string", "logicalType": "uuid"}
    if isinstance(t, S.BinaryType):
        return "bytes"
    if isinstance(t, S.FixedType):
        return {"type": "fixed", "name": f"{name}_fixed", "size": t.length}
    if isinstance(t, S.DecimalType):
        return {"type": "bytes", "logicalType": "decimal",
                "precision": t.precision, "scale": t.scale}
    if isinstance(t, S.StructType):
        return _struct_to_avro(t.fields, name)
    if isinstance(t, S.ListType):
        return {"type": "array",
                "items": ["null",
                          _type_to_avro(t.element_field.type, name + "_e")]}
    if isinstance(t, S.MapType):
        # avro map keys are strings; engine maps with string keys only
        return {"type": "map",
                "values": ["null",
                           _type_to_avro(t.value_field.type, name + "_v")]}
    raise NotImplementedError(f"avro mapping for {t!r}")


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------

def _w_long(buf: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _r_long(data: bytes, pos: int):
    acc = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _w_bytes(buf: bytearray, b: bytes) -> None:
    _w_long(buf, len(b))
    buf += b


def _r_bytes(data: bytes, pos: int):
    n, pos = _r_long(data, pos)
    return data[pos:pos + n], pos + n


# ---------------------------------------------------------------------------
# per-type value codecs (python value <-> avro binary)
# ---------------------------------------------------------------------------

def _encoder(t: S.Type):
    """value-encoder(buf, v) for a NON-NULL value of engine type t."""
    if isinstance(t, S.BooleanType):
        return lambda buf, v: buf.append(1 if v else 0)
    if isinstance(t, (S.IntegerType, S.LongType)):
        return lambda buf, v: _w_long(buf, int(v))
    if isinstance(t, S.FloatType):
        return lambda buf, v: buf.extend(struct.pack("<f", float(v)))
    if isinstance(t, S.DoubleType):
        return lambda buf, v: buf.extend(struct.pack("<d", float(v)))
    if isinstance(t, S.DateType):
        return lambda buf, v: _w_long(buf, (v - _EPOCH_DATE).days
                                      if isinstance(v, date) else int(v))
    if isinstance(t, S.TimeType):
        return lambda buf, v: _w_long(
            buf, int(v) if isinstance(v, int)
            else (v.hour * 3600 + v.minute * 60 + v.second) * 1_000_000
            + v.microsecond)
    if isinstance(t, S.TimestampType):
        def enc_ts(buf, v):
            if isinstance(v, datetime):
                epoch = _EPOCH_DT_TZ if v.tzinfo is not None else _EPOCH_DT
                td = v - epoch
                # exact integer micros: float total_seconds() loses
                # sub-µs exactness past ~year 2255 (spacing > 0.5 µs)
                v = (td.days * 86_400_000_000 + td.seconds * 1_000_000
                     + td.microseconds)
            _w_long(buf, int(v))
        return enc_ts
    if isinstance(t, (S.StringType, S.UUIDType)):
        return lambda buf, v: _w_bytes(buf, str(v).encode("utf-8"))
    if isinstance(t, S.BinaryType):
        return lambda buf, v: _w_bytes(buf, bytes(v))
    if isinstance(t, S.FixedType):
        return lambda buf, v: buf.extend(bytes(v))
    if isinstance(t, S.DecimalType):
        scale = t.scale

        def enc_dec(buf, v):
            unscaled = int(Decimal(v).scaleb(scale).to_integral_value())
            nbytes = max(1, (unscaled.bit_length() + 8) // 8)
            _w_bytes(buf, unscaled.to_bytes(nbytes, "big", signed=True))
        return enc_dec
    if isinstance(t, S.StructType):
        subs = [(f.name, _encoder(f.type)) for f in t.fields]

        def enc_struct(buf, v):
            get = v.get if isinstance(v, dict) else lambda k: getattr(v, k)
            for name, sub in subs:
                x = get(name)
                if x is None:
                    _w_long(buf, 0)
                else:
                    _w_long(buf, 1)
                    sub(buf, x)
        return enc_struct
    if isinstance(t, S.ListType):
        sub = _encoder(t.element_field.type)

        def enc_list(buf, v):
            v = list(v)
            if v:
                _w_long(buf, len(v))
                for x in v:
                    if x is None:
                        _w_long(buf, 0)
                    else:
                        _w_long(buf, 1)
                        sub(buf, x)
            _w_long(buf, 0)
        return enc_list
    if isinstance(t, S.MapType):
        sub = _encoder(t.value_field.type)

        def enc_map(buf, v):
            items = list(v.items())
            if items:
                _w_long(buf, len(items))
                for k, x in items:
                    _w_bytes(buf, str(k).encode("utf-8"))
                    if x is None:
                        _w_long(buf, 0)
                    else:
                        _w_long(buf, 1)
                        sub(buf, x)
            _w_long(buf, 0)
        return enc_map
    raise NotImplementedError(f"avro encoder for {t!r}")


def _decoder(t: S.Type):
    """(value, pos) decoder for a NON-NULL value of engine type t."""
    if isinstance(t, S.BooleanType):
        return lambda d, p: (d[p] != 0, p + 1)
    if isinstance(t, (S.IntegerType, S.LongType)):
        return _r_long
    if isinstance(t, S.FloatType):
        return lambda d, p: (struct.unpack_from("<f", d, p)[0], p + 4)
    if isinstance(t, S.DoubleType):
        return lambda d, p: (struct.unpack_from("<d", d, p)[0], p + 8)
    if isinstance(t, S.DateType):
        def dec_date(d, p):
            days, p = _r_long(d, p)
            return _EPOCH_DATE + timedelta(days=days), p
        return dec_date
    if isinstance(t, S.TimeType):
        return _r_long  # micros-of-day as int (arrow time64 accepts it)
    if isinstance(t, S.TimestampType):
        tz = t.with_zone

        def dec_ts(d, p):
            us, p = _r_long(d, p)
            base = _EPOCH_DT_TZ if tz else _EPOCH_DT
            return base + timedelta(microseconds=us), p
        return dec_ts
    if isinstance(t, (S.StringType, S.UUIDType)):
        def dec_str(d, p):
            b, p = _r_bytes(d, p)
            return b.decode("utf-8"), p
        return dec_str
    if isinstance(t, (S.BinaryType,)):
        def dec_bin(d, p):
            b, p = _r_bytes(d, p)
            return bytes(b), p
        return dec_bin
    if isinstance(t, S.FixedType):
        n = t.length
        return lambda d, p: (bytes(d[p:p + n]), p + n)
    if isinstance(t, S.DecimalType):
        scale = t.scale

        def dec_dec(d, p):
            b, p = _r_bytes(d, p)
            unscaled = int.from_bytes(b, "big", signed=True)
            return Decimal(unscaled).scaleb(-scale), p
        return dec_dec
    if isinstance(t, S.StructType):
        subs = [(f.name, _decoder(f.type)) for f in t.fields]

        def dec_struct(d, p):
            out = {}
            for name, sub in subs:
                idx, p = _r_long(d, p)
                if idx == 0:
                    out[name] = None
                else:
                    out[name], p = sub(d, p)
            return out, p
        return dec_struct
    if isinstance(t, S.ListType):
        sub = _decoder(t.element_field.type)

        def dec_list(d, p):
            out = []
            while True:
                n, p = _r_long(d, p)
                if n == 0:
                    return out, p
                if n < 0:  # block with byte size prefix
                    n = -n
                    _, p = _r_long(d, p)
                for _ in range(n):
                    idx, p = _r_long(d, p)
                    if idx == 0:
                        out.append(None)
                    else:
                        v, p = sub(d, p)
                        out.append(v)
        return dec_list
    if isinstance(t, S.MapType):
        sub = _decoder(t.value_field.type)

        def dec_map(d, p):
            out = {}
            while True:
                n, p = _r_long(d, p)
                if n == 0:
                    return out, p
                if n < 0:
                    n = -n
                    _, p = _r_long(d, p)
                for _ in range(n):
                    kb, p = _r_bytes(d, p)
                    idx, p = _r_long(d, p)
                    if idx == 0:
                        out[kb.decode("utf-8")] = None
                    else:
                        v, p = sub(d, p)
                        out[kb.decode("utf-8")] = v
        return dec_map
    raise NotImplementedError(f"avro decoder for {t!r}")


# ---------------------------------------------------------------------------
# container file write / read
# ---------------------------------------------------------------------------

def write_container(out, columns: list, schema: S.Schema,
                    codec: str = "deflate", block_rows: int = 4096) -> int:
    """Encode ``columns`` (list of per-field python-value lists, aligned)
    into an Avro Object Container stream.  Returns the row count."""
    avsc = to_avro_schema(schema)
    encoders = [_encoder(f.type) for f in schema.fields]
    n_rows = len(columns[0]) if columns else 0

    header = bytearray()
    header += MAGIC
    meta = {"avro.schema": json.dumps(avsc).encode(),
            "avro.codec": codec.encode()}
    _w_long(header, len(meta))
    for k, v in meta.items():
        _w_bytes(header, k.encode())
        _w_bytes(header, v)
    _w_long(header, 0)
    sync = os.urandom(16)
    header += sync
    out.write(bytes(header))

    for start in range(0, n_rows, block_rows):
        stop = min(start + block_rows, n_rows)
        buf = bytearray()
        for i in range(start, stop):
            for col, enc in zip(columns, encoders):
                v = col[i]
                if v is None:
                    _w_long(buf, 0)
                else:
                    _w_long(buf, 1)
                    enc(buf, v)
        payload = bytes(buf)
        if codec == "deflate":
            payload = zlib.compress(payload, 6)[2:-4]  # raw RFC-1951
        blk = bytearray()
        _w_long(blk, stop - start)
        _w_long(blk, len(payload))
        out.write(bytes(blk))
        out.write(payload)
        out.write(sync)
    return n_rows


def _read_header(data: bytes):
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta = {}
    while True:
        n, pos = _r_long(data, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _, pos = _r_long(data, pos)
        for _ in range(n):
            k, pos = _r_bytes(data, pos)
            v, pos = _r_bytes(data, pos)
            meta[k.decode()] = v
    sync = data[pos:pos + 16]
    return meta, sync, pos + 16


def read_container(data: bytes, schema: S.Schema,
                   count_only: bool = False):
    """Decode a container byte string → (columns, n_rows) where columns
    is a list of python-value lists per schema field (None for nulls).
    ``count_only`` sums block row counts without decompressing."""
    meta, sync, pos = _read_header(data)
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    decoders = [_decoder(f.type) for f in schema.fields]
    columns: list[list] = [[] for _ in schema.fields]
    total = 0
    n_bytes = len(data)
    while pos < n_bytes:
        n, pos = _r_long(data, pos)
        size, pos = _r_long(data, pos)
        block = data[pos:pos + size]
        pos += size + 16  # skip sync
        total += n
        if count_only:
            continue
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        bp = 0
        for _ in range(n):
            for col, dec in zip(columns, decoders):
                idx, bp = _r_long(block, bp)
                if idx == 0:
                    col.append(None)
                else:
                    v, bp = dec(block, bp)
                    col.append(v)
    return columns, total


def avro_row_count(path: str) -> int:
    """Row count from block headers only (no decompression) — the footer
    read stand-in for imported avro files."""
    with open(path, "rb") as f:
        data = f.read()
    _, n = read_container(data, S.Schema([]), count_only=True)
    return n


# ---------------------------------------------------------------------------
# distributed Spark integration
# ---------------------------------------------------------------------------

def _dir_value(v) -> str:
    from urllib.parse import quote
    if v is None:
        return "__HIVE_DEFAULT_PARTITION__"
    return quote(str(v), safe="")


def _bounds_update(stats_cols: dict, name: str, values: list) -> None:
    lo = hi = None
    nulls = 0
    for v in values:
        if v is None:
            nulls += 1
            continue
        if isinstance(v, float) and v != v:
            continue  # NaN never a bound
        if lo is None or v < lo:
            lo = v
        if hi is None or v > hi:
            hi = v
    st = stats_cols.setdefault(name, {"lo": None, "hi": None, "nulls": 0})
    st["nulls"] += nulls
    if lo is not None and (st["lo"] is None or lo < st["lo"]):
        st["lo"] = lo
    if hi is not None and (st["hi"] is None or hi > st["hi"]):
        st["hi"] = hi


def write_avro_files(spark, df, staging: str, schema: S.Schema,
                     part_col_names: list, max_records: int) -> list:
    """Distributed avro write: each task groups its rows by partition
    tuple (hive-style ``_p_x=v`` dirs, matching the parquet writer's
    layout so ``_partition_from_path`` parses both), rolls files at
    ``max_records``, computes column stats WHILE encoding (avro has no
    readable footer — this keeps metrics pruning at parquet parity) and
    emits one JSON stats row per file.  Returns footer_stats-shaped
    dicts.  The stats here are always FULL; ``write.metadata.metrics.*``
    modes (none/counts/truncate(N)) are applied at the manifest layer
    (manifests.write_manifest), identically for every file format —
    pinned by tests/test_avro.py::test_metrics_modes_apply_to_avro_tables."""
    import pyarrow as pa

    schema_json = json.dumps(schema.to_json())
    prim_names = [f.name for f in schema.fields if f.type.is_primitive]
    field_names = [f.name for f in schema.fields]

    def task(batches):
        from incubator_iceberg_spark import write as W
        from incubator_iceberg_spark.schema import Schema as Sch
        sch = Sch.from_json(json.loads(schema_json))
        buffers: dict[tuple, list] = {}  # part tuple -> list of col lists
        out_stats: list[str] = []

        def flush(key):
            cols = buffers.pop(key)
            n = len(cols[0])
            if n == 0:
                return
            d = os.path.join(staging,
                             *(f"{pn}={_dir_value(pv)}"
                               for pn, pv in zip(part_col_names, key)))
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"part-{_uuid.uuid4().hex}.avro")
            with open(path, "wb") as f:
                write_container(f, cols, sch)
            stats_cols: dict = {}
            for fname, col in zip(field_names, cols):
                if fname in prim_names:
                    _bounds_update(stats_cols, fname, col)
            out_stats.append(json.dumps({
                "file_path": path,
                "record_count": n,
                "file_size_bytes": os.path.getsize(path),
                "value_counts": {c: n for c in prim_names},
                "null_counts": {c: stats_cols.get(c, {}).get("nulls", 0)
                                for c in prim_names},
                "nan_counts": None,
                "lower_bounds": {c: s["lo"] for c, s in stats_cols.items()
                                 if s["lo"] is not None},
                "upper_bounds": {c: s["hi"] for c, s in stats_cols.items()
                                 if s["hi"] is not None},
            }, default=W._stats_json_default))

        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            data_cols = [tbl[c].to_pylist() for c in field_names]
            part_vals = [tbl[c].to_pylist() for c in part_col_names]
            if not part_col_names:
                keys = [()] * tbl.num_rows
            else:
                keys = list(zip(*part_vals))
            by_key: dict[tuple, list] = {}
            for i, k in enumerate(keys):
                by_key.setdefault(k, []).append(i)
            for k, idxs in by_key.items():
                cols = buffers.setdefault(
                    k, [[] for _ in field_names])
                for ci, col in enumerate(data_cols):
                    cols[ci].extend(col[i] for i in idxs)
                if len(cols[0]) >= max_records:
                    flush(k)
        for k in list(buffers):
            flush(k)
        yield pa.RecordBatch.from_pydict({"stats": out_stats})

    raw = df.mapInArrow(task, "stats string").collect()
    from incubator_iceberg_spark import write as W
    return [json.loads(r["stats"], object_hook=W._stats_obj_hook)
            for r in raw]


def _resolvable(src: S.Type, dst: S.Type) -> bool:
    """May values decoded as writer type ``src`` be served as read type
    ``dst``?  Avro schema-resolution rules: identical types, the
    int→long / float→double promotions, and name-matched (field-id-
    insensitive — foreign writers don't carry engine ids) recursion into
    records/arrays/maps."""
    if type(src) is type(dst):
        if isinstance(src, S.StructType):
            have = {f.name: f.type for f in src.fields}
            return all(f.name in have and _resolvable(have[f.name], f.type)
                       for f in dst.fields)
        if isinstance(src, S.ListType):
            return _resolvable(src.element_field.type, dst.element_field.type)
        if isinstance(src, S.MapType):
            return _resolvable(src.value_field.type, dst.value_field.type)
        return src == dst
    if isinstance(src, S.IntegerType) and isinstance(dst, S.LongType):
        return True
    if isinstance(src, S.FloatType) and isinstance(dst, S.DoubleType):
        return True
    return False


def _writer_resolution(raw_schema: bytes, expected: S.Schema, path: str):
    """(writer_schema, column_index_per_expected_field) for one file's
    embedded ``avro.schema``.  The Avro spec (and the reference,
    core/src/main/java/org/apache/iceberg/avro/AvroIterable.java:89 via
    DataFileReader) always resolves against the per-file WRITER schema;
    decoding blindly with the table schema silently mis-decodes files
    whose field order or widths differ (two swapped long columns decode
    without error, values crossed)."""
    wsch = from_avro_schema(json.loads(raw_schema.decode()))
    by_name = {f.name: i for i, f in enumerate(wsch.fields)}
    mapping = []
    for f in expected.fields:
        i = by_name.get(f.name)
        if i is None:
            raise ValueError(
                f"avro file {path!r}: field {f.name!r} missing from writer "
                f"schema (has {sorted(by_name)}); refusing blind decode")
        wt = wsch.fields[i].type
        if not _resolvable(wt, f.type):
            raise ValueError(
                f"avro file {path!r}: field {f.name!r} writer type {wt!r} "
                f"is not resolvable to expected {f.type!r}")
        mapping.append(i)
    return wsch, mapping


def read_avro_files(spark, paths: list, file_schema: S.Schema,
                    with_lineage: bool = False):
    """Distributed avro read: binaryFile ships each file's bytes to an
    executor, mapInArrow decodes.  Each file is decoded with its OWN
    header-embedded writer schema, then resolved to the expected schema
    by field name (int→long / float→double promoted, swapped or foreign
    field order handled, incompatible files rejected loudly).  Emits
    real ``_pos`` per-row lineage (sequential decode order), so position
    deletes work on avro files too."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    schema_json = json.dumps(file_schema.to_json())
    spark_schema = file_schema.to_spark()
    if with_lineage:
        spark_schema = spark_schema.add("_file", "string").add("_pos", "long")
    arrow_schema = to_arrow_schema(spark_schema)
    out_names = [f.name for f in file_schema.fields]

    def task(batches):
        from incubator_iceberg_spark.schema import Schema as Sch
        expected = Sch.from_json(json.loads(schema_json))
        res_cache: dict = {}  # raw writer-schema bytes -> (wsch, mapping)
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            for path, content in zip(tbl["path"].to_pylist(),
                                     tbl["content"].to_pylist()):
                data = bytes(content)
                try:
                    meta, _sync, _hdr = _read_header(data)
                    raw = meta["avro.schema"]
                except (ValueError, IndexError, KeyError) as e:
                    raise ValueError(
                        f"corrupt avro container {path!r}: "
                        f"{type(e).__name__}: {e}") from e
                if raw not in res_cache:
                    # raises a path-bearing ValueError on schema mismatch
                    res_cache[raw] = _writer_resolution(raw, expected, path)
                wsch, mapping = res_cache[raw]
                try:
                    cols_w, n = read_container(data, wsch)
                except (IndexError, zlib.error, ValueError) as e:
                    raise ValueError(
                        f"corrupt avro container {path!r}: "
                        f"{type(e).__name__}: {e}") from e
                cols = [cols_w[i] for i in mapping] if cols_w else []
                if not cols:
                    cols = [[] for _ in out_names]
                arrays = {name: pa.array(col, type=arrow_schema.field(name).type)
                          for name, col in zip(out_names, cols)}
                if with_lineage:
                    # binaryFile's path is a RAW filesystem path behind a
                    # file: scheme (NOT percent-escaped like
                    # _metadata.file_path) — escape_for_lineage makes the
                    # consumers' url_decode a true inverse
                    from incubator_iceberg_spark.row_ops import \
                        escape_for_lineage
                    arrays["_file"] = pa.array(
                        [escape_for_lineage(path)] * n, type=pa.string())
                    arrays["_pos"] = pa.array(range(n), type=pa.int64())
                yield pa.RecordBatch.from_pydict(arrays, schema=arrow_schema)

    bin_df = spark.read.format("binaryFile").load(paths)
    return bin_df.select("path", "content").mapInArrow(task, spark_schema)


# ---------------------------------------------------------------------------
# avro schema -> engine schema (import/migrate path)
# ---------------------------------------------------------------------------

def from_avro_schema(avsc: dict) -> S.Schema:
    """Avro record schema → engine Schema (AvroSchemaUtil.toIceberg
    analog): honors ``field-id`` props when present (engine-written
    files), else assigns sequential ids; nullable unions unwrap; logical
    types map back to date/time/timestamp/decimal/uuid."""
    counter = [0]

    def next_id() -> int:
        counter[0] += 1
        return counter[0]

    def conv(t):
        if isinstance(t, list):  # union: only [null, T] supported
            non_null = [x for x in t if x != "null"]
            if len(non_null) != 1:
                raise NotImplementedError(f"avro union {t!r}")
            return conv(non_null[0])
        if isinstance(t, str):
            prim = {"boolean": S.BooleanType(), "int": S.IntegerType(),
                    "long": S.LongType(), "float": S.FloatType(),
                    "double": S.DoubleType(), "string": S.StringType(),
                    "bytes": S.BinaryType()}
            if t in prim:
                return prim[t]
            raise NotImplementedError(f"avro type {t!r}")
        lt = t.get("logicalType")
        base = t.get("type")
        if lt == "date":
            return S.DateType()
        if lt == "time-micros":
            return S.TimeType()
        if lt == "timestamp-micros":
            return S.TimestampType(with_zone=True)
        if lt == "local-timestamp-micros":
            return S.TimestampType(with_zone=False)
        if lt == "uuid":
            return S.UUIDType()
        if lt == "decimal":
            return S.DecimalType(t["precision"], t["scale"])
        if base == "fixed":
            return S.FixedType(t["size"])
        if base == "record":
            return S.StructType([
                S.NestedField(_fid(f, next_id), f["name"], conv(f["type"]))
                for f in t["fields"]])
        if base == "array":
            return S.ListType.of(next_id(), conv(t["items"]))
        if base == "map":
            return S.MapType.of(next_id(), S.StringType(),
                                next_id(), conv(t["values"]))
        if base is not None:
            return conv(base)
        raise NotImplementedError(f"avro type {t!r}")

    fields = [S.NestedField(_fid(f, next_id), f["name"], conv(f["type"]))
              for f in avsc["fields"]]
    return S.Schema(fields)


def _fid(f: dict, next_id):
    """Explicit None test — a legitimate ``field-id: 0`` must not be
    treated as absent and silently reassigned."""
    fid = f.get("field-id")
    return fid if fid is not None else next_id()


def read_file_schema(path: str) -> S.Schema:
    """Engine schema from one container file's header."""
    with open(path, "rb") as f:
        head = f.read(1 << 20)  # header metadata is tiny
    meta, _sync, _pos = _read_header(head)
    return from_avro_schema(json.loads(meta["avro.schema"].decode()))
