"""Iceberg source wiring (jar-gated) — see ICEBERG.md for the full mapping.

The north rule's input is "an Iceberg table of Common-Crawl-style web pages".
On a cluster with ``iceberg-spark-runtime`` on the classpath (plus the
catalog confs in ICEBERG.md), :func:`read_pages_iceberg` yields the exact
same ``DataFrame`` shape as ``sources.pages.read_pages``; everything
downstream is identical.  In jar-less environments the call fails with a
clear :class:`IcebergUnavailableError` instead of an opaque analysis error,
and the plain-parquet analogue (``read_pages`` / ``read_pages_partitioned``)
carries the same pruning semantics (asserted in PLANS.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pages import PAGES_SCHEMA

ICEBERG_CATALOG_IMPL = "org.apache.iceberg.spark.SparkCatalog"
ICEBERG_EXTENSIONS = (
    "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
)


class IcebergUnavailableError(RuntimeError):
    """Raised when the Iceberg runtime jar is not on the session classpath."""


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg SparkCatalog class is loadable in this JVM."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(ICEBERG_CATALOG_IMPL)
        return True
    except Exception:
        return False


def catalog_confs(catalog: str, warehouse: str) -> dict[str, str]:
    """The spark confs that register a hadoop-type Iceberg catalog.

    Pass to ``build_session(extra_conf=...)`` or ``spark-submit --conf``.
    """
    return {
        "spark.sql.extensions": ICEBERG_EXTENSIONS,
        f"spark.sql.catalog.{catalog}": ICEBERG_CATALOG_IMPL,
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def create_pages_table_ddl(table: str) -> str:
    """DDL for the north-rule pages table with days(warc_ts) hidden
    partitioning — a warc_ts range predicate then prunes partitions with no
    explicit day column (the analogue's `day=` Hive column, ICEBERG.md)."""
    cols = ", ".join(f.strip() for f in PAGES_SCHEMA.split(","))
    return (
        f"CREATE TABLE IF NOT EXISTS {table} ({cols}) "
        f"USING iceberg PARTITIONED BY (days(warc_ts))"
    )


def read_pages_iceberg(
    spark: SparkSession,
    table: str,
    langs: tuple[str, ...] | None = None,
    since=None,
    until=None,
) -> DataFrame:
    """Pages DataFrame from an Iceberg catalog table — same shape and same
    predicate semantics as ``read_pages`` over parquet.

    The ``warc_ts`` range predicate maps onto the table's days(warc_ts)
    partition transform, so Iceberg prunes whole partitions from the
    manifests (the analogue's `day=` directory pruning); ``lang`` is an
    ordinary pushed data filter in both worlds.
    """
    if not iceberg_available(spark):
        raise IcebergUnavailableError(
            "Iceberg runtime jar not on the classpath — add "
            "--packages org.apache.iceberg:iceberg-spark-runtime-... and the "
            "catalog confs (ICEBERG.md), or read the parquet analogue via "
            "sources.pages.read_pages[_partitioned]"
        )
    df = spark.read.table(table)
    if langs:
        df = df.filter(F.col("lang").isin(*langs))
    if since is not None:
        df = df.filter(F.col("warc_ts") >= F.lit(since))
    if until is not None:
        df = df.filter(F.col("warc_ts") < F.lit(until))
    return df
