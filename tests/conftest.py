from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from mysql_streamer_spark.session import get_spark

    warehouse = tempfile.mkdtemp(prefix="mss_warehouse_")
    spark = get_spark(
        "tests", cpus=8, extra_conf={"spark.sql.warehouse.dir": warehouse}
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
