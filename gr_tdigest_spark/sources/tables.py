"""Catalog-table adapter — the Iceberg surface the north_rule names.

Every source/sink in this package addresses data by a single string
``ref`` that is either a filesystem path (contains a separator) or a
catalog table identifier (``catalog.db.table``). Table refs go through
``spark.read.table`` / ``DataFrameWriterV2`` (``writeTo``) — exactly
the API an Iceberg catalog implements — so pointing the session at an
Iceberg catalog (``spark.sql.catalog.<name> = org.apache.iceberg...``)
makes these calls transactional Iceberg reads/writes with no code
change. The sandbox has no Iceberg jars, so the built-in session
catalog is exercised instead; its v1 tables reject V2 ``append``/
``createOrReplace``, hence the documented fallbacks to the V1 writer
(same semantics, minus Iceberg's atomicity).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException

__all__ = [
    "is_table_ref", "read_table", "write_table", "drop_table",
    "table_exists",
]

_TABLE_ID = re.compile(r"^\w+(\.\w+)+$")
_FILE_SUFFIXES = (".parquet", ".csv", ".json", ".orc")


def is_table_ref(ref: str) -> bool:
    """Catalog-table id only when unambiguous: an explicit ``table:``
    prefix, or a DOTTED identifier (``db.tbl`` / ``cat.db.tbl``) without
    a file suffix. Everything else — including a bare relative name like
    ``my_ckpt``, previously a valid filesystem path — stays a path, so a
    checkpoint dir never silently routes to the warehouse."""
    if ref.startswith("table:"):
        return True
    if ref.lower().endswith(_FILE_SUFFIXES):
        return False
    return bool(_TABLE_ID.match(ref))


def _table_id(ref: str) -> str:
    """Strip the ``table:`` prefix and validate the identifier (the ref
    is later interpolated into SQL, so reject anything but ``\\w``/dots)."""
    name = ref[len("table:"):] if ref.startswith("table:") else ref
    if not re.match(r"^\w+(\.\w+)*$", name):
        raise ValueError(f"invalid catalog table identifier: {ref!r}")
    return name


def _quoted(ref: str) -> str:
    """Backtick-quote each dotted part for SQL statements."""
    return ".".join(f"`{p}`" for p in _table_id(ref).split("."))


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    if is_table_ref(ref):
        return spark.read.table(_table_id(ref))
    return spark.read.parquet(ref)


def table_exists(spark: SparkSession, ref: str) -> bool:
    if is_table_ref(ref):
        return spark.catalog.tableExists(_table_id(ref))
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(ref)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def write_table(df: DataFrame, ref: str, mode: str = "append") -> None:
    """Append/overwrite through the V2 writer for table refs (Iceberg's
    API), with a session-catalog v1 fallback; plain parquet for paths."""
    if not is_table_ref(ref):
        df.write.mode(mode).parquet(ref)
        return
    table = _table_id(ref)
    spark = df.sparkSession
    if mode == "overwrite":
        try:
            df.writeTo(table).using("parquet").createOrReplace()
        except AnalysisException:
            df.write.mode("overwrite").saveAsTable(table)
        return
    if mode == "append":
        if not spark.catalog.tableExists(table):
            df.writeTo(table).using("parquet").create()
            return
        try:
            df.writeTo(table).append()
        except AnalysisException:
            df.write.mode("append").saveAsTable(table)
        return
    raise ValueError("mode must be 'append' or 'overwrite'")


def drop_table(spark: SparkSession, ref: str) -> None:
    if is_table_ref(ref):
        spark.sql(f"DROP TABLE IF EXISTS {_quoted(ref)}")
        return
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(ref)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        fs.delete(hpath, True)
