from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from nem_mms_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8, app_name="tests")
    yield s
    s.stop()
