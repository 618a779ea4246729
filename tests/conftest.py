from __future__ import annotations

import pytest

from rocket_etl_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="rocket-etl-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
