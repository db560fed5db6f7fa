"""incubator_iceberg_spark — a PySpark-native analytics engine with the
capabilities of Apache Iceberg (reference: apache/incubator-iceberg).

Design stance (see SURVEY.md §7): metadata layer in pure Python (JSON +
Parquet manifests), data plane 100% Spark DataFrame API, zero JVM code,
zero custom Catalyst rules.  The expression algebra exists once in Python
and compiles two ways: to filters over metadata DataFrames (file pruning)
and to ``pyspark.sql.Column`` (row filters that Catalyst pushes to Parquet).
"""

from incubator_iceberg_spark.schema import (
    Schema,
    NestedField,
    BooleanType,
    IntegerType,
    LongType,
    FloatType,
    DoubleType,
    DateType,
    TimeType,
    TimestampType,
    StringType,
    UUIDType,
    FixedType,
    BinaryType,
    DecimalType,
    StructType,
    ListType,
    MapType,
)
from incubator_iceberg_spark import expressions as expr
from incubator_iceberg_spark.partitioning import PartitionSpec, PartitionField


def __getattr__(name):  # lazy: table pulls in pyspark-heavy modules
    if name in ("Catalog", "Table"):
        from incubator_iceberg_spark import table as _t
        return getattr(_t, name)
    if name == "Transaction":
        from incubator_iceberg_spark.transactions import Transaction
        return Transaction
    if name == "SqliteCatalog":
        from incubator_iceberg_spark.catalog_sqlite import SqliteCatalog
        return SqliteCatalog
    if name in ("NessieLiteCatalog", "MergeConflictError"):
        from incubator_iceberg_spark import catalog_branches as _cb
        return getattr(_cb, name)
    if name == "CachingCatalog":
        from incubator_iceberg_spark.caching_catalog import CachingCatalog
        return CachingCatalog
    if name in ("WhenMatched", "WhenNotMatched", "WhenNotMatchedBySource",
                "MergeCardinalityError"):
        from incubator_iceberg_spark import row_ops as _r
        return getattr(_r, name)
    if name == "register_data_source":
        from incubator_iceberg_spark.sources import register
        return register
    if name in ("runtime_filtered_join", "runtime_key_filter"):
        from incubator_iceberg_spark import runtime_filter as _rf
        return getattr(_rf, name)
    if name == "events":
        import importlib
        return importlib.import_module("incubator_iceberg_spark.events")
    raise AttributeError(name)

__all__ = [
    "Schema",
    "NestedField",
    "Catalog",
    "Table",
    "PartitionSpec",
    "PartitionField",
    "expr",
    "BooleanType",
    "IntegerType",
    "LongType",
    "FloatType",
    "DoubleType",
    "DateType",
    "TimeType",
    "TimestampType",
    "StringType",
    "UUIDType",
    "FixedType",
    "BinaryType",
    "DecimalType",
    "StructType",
    "ListType",
    "MapType",
]

__version__ = "0.1.0"
