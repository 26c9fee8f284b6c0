import os
import sys
from pathlib import Path

import pytest

os.environ.setdefault("TZ", "UTC")
ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


@pytest.fixture(scope="session")
def spark():
    from tortank_spark.session import get_spark

    s = get_spark("tortank-tests", cpus=8, shuffle_partitions=8)
    yield s


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
