"""Pure-Python Murmur3 x86_32 matching Spark's ``F.hash`` (seed 42).

Why: the ``bucket[N]`` partition transform (reference:
api/.../transforms/Bucket.java:43-312) must be computable BOTH on the JVM
write path (as ``F.hash`` — vectorized, no UDF) and in Python for
partition-pruning projection of literals (e.g. ``EQ(c, v)`` projects to
``bucket(c) == bucket_of(v)`` which the driver evaluates on metadata).

This reimplements the public algorithm from Apache Spark's
``org.apache.spark.unsafe.hash.Murmur3_x86_32`` and the per-type dispatch
of ``org.apache.spark.sql.catalyst.expressions.HashExpression``:

- int/date            → hashInt(value)
- long/timestamp/time → hashLong(value)
- float               → hashInt(floatToIntBits), with -0.0 → 0.0
- double              → hashLong(doubleToLongBits), with -0.0 → 0.0
- string/binary       → hashUnsafeBytes(utf8)
- boolean             → hashInt(1 or 0)

Engine-internal consistency is what matters (SURVEY.md §2.3 T2): our
bucket values agree between write path and pruning path by construction;
tests assert parity with Spark's ``F.hash``.
"""

from __future__ import annotations

import struct
from datetime import date, datetime, timezone

SPARK_HASH_SEED = 42

_MASK = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _MASK
    k1 = _rotl32(k1, 15)
    return (k1 * _C2) & _MASK


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK
    h1 ^= h1 >> 16
    return h1


def _to_signed32(v: int) -> int:
    v &= _MASK
    return v - (1 << 32) if v >= (1 << 31) else v


def hash_int(value: int, seed: int = SPARK_HASH_SEED) -> int:
    h1 = _mix_h1(seed & _MASK, _mix_k1(value & _MASK))
    return _to_signed32(_fmix(h1, 4))


def hash_long(value: int, seed: int = SPARK_HASH_SEED) -> int:
    value &= 0xFFFFFFFFFFFFFFFF
    low = value & _MASK
    high = (value >> 32) & _MASK
    h1 = _mix_h1(seed & _MASK, _mix_k1(low))
    h1 = _mix_h1(h1, _mix_k1(high))
    return _to_signed32(_fmix(h1, 8))


def hash_bytes(data: bytes, seed: int = SPARK_HASH_SEED) -> int:
    """Spark's hashUnsafeBytes: 4-byte little-endian words, then remaining
    bytes one at a time as *signed* bytes (a Spark quirk vs standard
    murmur3 tail handling)."""
    n = len(data)
    aligned = n - n % 4
    h1 = seed & _MASK
    for i in range(0, aligned, 4):
        (word,) = struct.unpack_from("<i", data, i)
        h1 = _mix_h1(h1, _mix_k1(word & _MASK))
    for i in range(aligned, n):
        b = data[i]
        if b >= 128:
            b -= 256  # signed byte
        h1 = _mix_h1(h1, _mix_k1(b & _MASK))
    return _to_signed32(_fmix(h1, n))


_EPOCH_DATE = date(1970, 1, 1)


def spark_hash(value, iceberg_type=None, seed: int = SPARK_HASH_SEED) -> int:
    """Hash a Python literal exactly as Spark's ``F.hash(col)`` would hash
    the corresponding column value."""
    from incubator_iceberg_spark import schema as S

    if value is None:
        return seed if seed != SPARK_HASH_SEED else 42
    if isinstance(value, bool):
        return hash_int(1 if value else 0, seed)
    if isinstance(iceberg_type, S.IntegerType):
        return hash_int(int(value), seed)
    if isinstance(iceberg_type, (S.LongType, S.TimeType)):
        return hash_long(int(value), seed)
    if isinstance(iceberg_type, S.DateType):
        d = value if isinstance(value, date) else value.date()
        return hash_int((d - _EPOCH_DATE).days, seed)
    if isinstance(iceberg_type, S.TimestampType):
        return hash_long(_timestamp_micros(value), seed)
    if isinstance(iceberg_type, S.FloatType):
        f = float(value)
        if f == 0.0:
            f = 0.0  # normalize -0.0
        (bits,) = struct.unpack("<i", struct.pack("<f", f))
        return hash_int(bits, seed)
    if isinstance(iceberg_type, S.DoubleType):
        f = float(value)
        if f == 0.0:
            f = 0.0
        (bits,) = struct.unpack("<q", struct.pack("<d", f))
        return hash_long(bits, seed)
    # fallbacks by Python type
    if isinstance(value, int):
        return hash_long(value, seed)
    if isinstance(value, float):
        if value == 0.0:
            value = 0.0
        (bits,) = struct.unpack("<q", struct.pack("<d", value))
        return hash_long(bits, seed)
    if isinstance(value, str):
        return hash_bytes(value.encode("utf-8"), seed)
    if isinstance(value, (bytes, bytearray)):
        return hash_bytes(bytes(value), seed)
    if isinstance(value, datetime):
        return hash_long(_timestamp_micros(value), seed)
    if isinstance(value, date):
        return hash_int((value - _EPOCH_DATE).days, seed)
    raise TypeError(f"cannot spark-hash {type(value)}: {value!r}")


_EPOCH_TS = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _timestamp_micros(value) -> int:
    if isinstance(value, datetime):
        if value.tzinfo is None:
            value = value.replace(tzinfo=timezone.utc)
        delta = value - _EPOCH_TS
        return (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
    if isinstance(value, (int, float)):
        return int(value)
    raise TypeError(f"not a timestamp: {value!r}")
