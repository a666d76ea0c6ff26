from __future__ import annotations

import pytest

from data_migration_etl_scripts_spark import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # small local session: tests exercise semantics, not throughput
    s = get_spark(app_name="dmess_tests", master="local[4]", shuffle_partitions=4)
    yield s
