import sys

sys.path.insert(0, "/root/repo")

import pytest


@pytest.fixture(scope="session")
def spark():
    from posextract_spark.session import build_session

    s = build_session(app_name="pytest", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
