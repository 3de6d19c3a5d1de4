from __future__ import annotations

import os
import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# Small-core session for tests: faster startup/shuffles on tiny data.
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

PARITY_SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from ast_data_pipeline_spark.session import get_spark
    from ast_data_pipeline_spark.sources.domain_views import clear_view_cache

    spark = get_spark("ast-tests", shuffle_partitions=8)
    yield spark
    clear_view_cache()


@pytest.fixture(scope="session")
def sf_dir():
    return PARITY_SF_DIR
