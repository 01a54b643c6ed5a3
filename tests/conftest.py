from __future__ import annotations

import pytest

from datafusion_archive_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    s = get_spark(
        "tests",
        master="local[*]",
        shuffle_partitions=8,
        extra_conf={
            # static conf — must be set at session creation (bucketed
            # tables in tests write here)
            "spark.sql.warehouse.dir": str(
                tmp_path_factory.mktemp("warehouse")
            ),
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
