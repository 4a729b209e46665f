"""Shared pytest fixtures: one local SparkSession for the whole run.

Tests use sf0.001 (~6k lineitem rows) so the suite stays fast; the
driver's t2 gate re-checks everything against DuckDB at sf0.01.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from grader_etl_spark.session import get_spark

    s = get_spark(app_name="grader-etl-spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
