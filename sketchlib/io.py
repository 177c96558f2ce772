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
    """Write with Parquet-save-mode semantics on BOTH branches. The Iceberg
    branch used to map every non-append mode to ``createOrReplace`` — so
    ``mode='error'``/``'ignore'`` silently DESTROYED an existing table
    instead of raising / no-op'ing, breaking the "switching formats is
    config-only" contract exactly on the destructive case."""
    if uri.startswith(ICEBERG_PREFIX):
        name = uri[len(ICEBERG_PREFIX):]
        if mode == "append":
            df.writeTo(name).append()
        elif mode == "overwrite":
            df.writeTo(name).createOrReplace()
        elif mode in ("error", "errorifexists"):
            df.writeTo(name).create()  # raises TableAlreadyExistsException
        elif mode == "ignore":
            if not df.sparkSession.catalog.tableExists(name):
                df.writeTo(name).create()
        else:
            raise ValueError(f"write_table: unknown mode {mode!r}")
    else:
        df.write.mode(mode).parquet(uri)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        # Resolve against Spark's user-jar classloader (Utils.classForName
        # walks the context/mutable classloader): a jar supplied via
        # --jars / spark.jars.packages lives there, NOT on the system
        # classpath that a plain java.lang.Class.forName through py4j
        # searches — the latter reported Iceberg missing when
        # spark.read.format("iceberg") actually worked.
        spark._jvm.org.apache.spark.util.Utils.classForName(  # noqa: SLF001
            "org.apache.iceberg.spark.source.SparkTable", True, True
        )
        return True
    except Exception:
        return False
