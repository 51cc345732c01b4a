import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from greynirserver_spark.session import get_spark

    s = get_spark(app_name="greynirserver-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()
