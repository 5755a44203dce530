"""Iceberg wiring (jar-gated) — what IS testable without the runtime jar:
the DDL shape, the catalog confs, availability detection, and the graceful
failure.  ICEBERG.md maps every Iceberg property to its parquet analogue;
the analogue's pruning itself is asserted in PLANS.md + test_partitioned_source.
"""

import pytest


def test_ddl_declares_days_partition_transform():
    from pdf_drawing_ocr_recognition_spark.sources.iceberg import (
        create_pages_table_ddl,
    )

    ddl = create_pages_table_ddl("cc.crawl.pages")
    assert "USING iceberg" in ddl
    assert "PARTITIONED BY (days(warc_ts))" in ddl
    for col in ("url STRING", "warc_ts TIMESTAMP", "html BINARY",
                "text STRING", "lang STRING"):
        assert col in ddl


def test_catalog_confs_shape():
    from pdf_drawing_ocr_recognition_spark.sources.iceberg import (
        ICEBERG_CATALOG_IMPL,
        catalog_confs,
    )

    confs = catalog_confs("cc", "hdfs://wh")
    assert confs["spark.sql.catalog.cc"] == ICEBERG_CATALOG_IMPL
    assert confs["spark.sql.catalog.cc.warehouse"] == "hdfs://wh"
    assert "IcebergSparkSessionExtensions" in confs["spark.sql.extensions"]


def test_jarless_environment_fails_loudly(spark):
    from pdf_drawing_ocr_recognition_spark.sources.iceberg import (
        IcebergUnavailableError,
        iceberg_available,
        read_pages_iceberg,
    )

    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present — gate not exercisable")
    with pytest.raises(IcebergUnavailableError, match="ICEBERG.md"):
        read_pages_iceberg(spark, "cc.crawl.pages")
