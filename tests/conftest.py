import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bfokg.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    sp = get_spark(app_name="bfokg-tests", master="local[4]", shuffle_partitions=4)
    yield sp
    sp.stop()
