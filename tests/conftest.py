from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from adsb_clickhouse_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmp_base(tmp_path):
    return str(tmp_path)
