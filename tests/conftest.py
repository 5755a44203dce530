"""Shared Spark session + synthesized corpus fixtures (session-scoped)."""

import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from pdf_drawing_ocr_recognition_spark.plans.session import build_session

    s = build_session(app="pdor-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_small(tmp_path_factory):
    """~600-row deterministic corpus written as multi-part parquet."""
    from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import write_corpus

    path = str(tmp_path_factory.mktemp("pages") / "pages_small")
    write_corpus(path, 600)
    return path


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
