from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small & fast for unit tests


@pytest.fixture(scope="session")
def spark():
    from fcrepo3_rdf_extractor_spark.session import build_session

    spark = build_session("tests", cores=4, shuffle_partitions=8)
    yield spark
    spark.stop()
