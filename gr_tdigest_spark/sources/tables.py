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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException

__all__ = [
    "is_table_ref", "read_table", "write_table", "drop_table",
    "table_exists",
]


def is_table_ref(ref: str) -> bool:
    """Path if it has a separator or a file suffix; table id otherwise."""
    return "/" not in ref and "\\" not in ref and not ref.lower().endswith(
        (".parquet", ".csv", ".json", ".orc")
    )


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    if is_table_ref(ref):
        return spark.read.table(ref)
    return spark.read.parquet(ref)


def table_exists(spark: SparkSession, ref: str) -> bool:
    if is_table_ref(ref):
        return spark.catalog.tableExists(ref)
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
    spark = df.sparkSession
    if mode == "overwrite":
        try:
            df.writeTo(ref).using("parquet").createOrReplace()
        except AnalysisException:
            df.write.mode("overwrite").saveAsTable(ref)
        return
    if mode == "append":
        if not spark.catalog.tableExists(ref):
            df.writeTo(ref).using("parquet").create()
            return
        try:
            df.writeTo(ref).append()
        except AnalysisException:
            df.write.mode("append").saveAsTable(ref)
        return
    raise ValueError("mode must be 'append' or 'overwrite'")


def drop_table(spark: SparkSession, ref: str) -> None:
    if is_table_ref(ref):
        spark.sql(f"DROP TABLE IF EXISTS {ref}")
        return
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(ref)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        fs.delete(hpath, True)
