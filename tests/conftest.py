"""Shared SparkSession for the test suite (one JVM for all spark tests)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from riptide_spark.session import build_session

    session = build_session("riptide-tests", master="local[4]", shuffle_partitions=4)
    yield session
    session.stop()
