from __future__ import annotations

import pytest

from ecommerce_data_pipeline_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "engine-tests",
        cpus=8,
        shuffle_partitions=8,
        # static conf: the bucketed-table tests need a writable warehouse
        extra_conf={"spark.sql.warehouse.dir": "/tmp/engine-tests-warehouse"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
