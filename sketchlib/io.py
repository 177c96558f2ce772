"""I/O seam: Iceberg when a catalog is configured, Parquet paths otherwise.

The north rule targets Iceberg tables of pre-tokenized sequences
(BASELINE.json:14-15). This sandbox has no Iceberg runtime jar (verified:
no iceberg-spark-runtime in the Spark jars, offline — SURVEY.md §7.9), so
the seam keeps call sites format-agnostic: pass ``iceberg:catalog.db.table``
to use a configured Iceberg catalog, or a filesystem path for Parquet. The
schemas are identical either way, so switching is config-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PREFIX = "iceberg:"


def read_corpus(spark: SparkSession, uri: str) -> DataFrame:
    if uri.startswith(ICEBERG_PREFIX):
        return spark.read.format("iceberg").load(uri[len(ICEBERG_PREFIX):])
    return spark.read.parquet(uri)


def write_table(df: DataFrame, uri: str, mode: str = "overwrite") -> None:
    if uri.startswith(ICEBERG_PREFIX):
        name = uri[len(ICEBERG_PREFIX):]
        if mode == "append":
            df.writeTo(name).append()
        else:
            df.writeTo(name).createOrReplace()
    else:
        df.write.mode(mode).parquet(uri)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        # py4j resolves packages lazily; Class.forName forces a real lookup
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.source.SparkTable"
        )
        return True
    except Exception:
        return False
