from __future__ import annotations

import pytest

from parallel_monte_carlo_simulations_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="pmcs-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s
