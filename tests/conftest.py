from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # lighter JVM for unit tests

# wire up the image's vendored protobuf (if needed) BEFORE any worker spawns,
# so the transformWithStateInPandas equivalence tests run instead of skipping
from gmall_spark.compat import ensure_protobuf

ensure_protobuf()

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from gmall_spark.session import get_spark

    s = get_spark("gmall_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
