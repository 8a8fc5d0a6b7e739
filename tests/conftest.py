import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from garden_net_backend_spark.session import get_session

# activate the vendored protobuf shim BEFORE any skipif probes or JVM
# launch (workers inherit PYTHONPATH from the JVM env snapshot)
from garden_net_backend_spark._vendor import ensure_protobuf_shim

ensure_protobuf_shim()


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    s = get_session("tests")
    yield s


SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"
