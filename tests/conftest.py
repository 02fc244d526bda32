from __future__ import annotations

import os
import sys

import pytest

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

# Python DataSource classes are pickled by reference: Spark's Python workers
# must be able to import broadway_kinesis_spark. Must be set before the JVM
# starts so worker processes inherit it.
_pp = os.environ.get("PYTHONPATH", "")
if REPO_DIR not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = f"{REPO_DIR}{os.pathsep}{_pp}" if _pp else REPO_DIR

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from broadway_kinesis_spark.session import build_session

    s = build_session(app_name="bks-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL
