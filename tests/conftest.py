from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running scale test")


@pytest.fixture(scope="session")
def spark():
    from mapnik_vector_tile_spark.session import get_spark

    s = get_spark(app_name="mvt-spark-tests", cores=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_small() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def images_small(spark):
    """Deterministic 2,000-row images fixture (cached on disk)."""
    from mapnik_vector_tile_spark.sources import images

    path = images.ensure_images(spark, 2000)
    return spark.read.parquet(path)
