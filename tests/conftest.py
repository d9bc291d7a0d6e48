from __future__ import annotations

import tempfile

import pytest

from data_lake_demo_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # fresh warehouse per session: managed-table locations (bucketed
    # tables) must not collide with leftovers from earlier sessions
    s = get_spark(
        "tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="wh_")},
    )
    yield s
    s.stop()
