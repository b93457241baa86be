from __future__ import annotations

import pytest

from opensea_datapipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    import tempfile

    s = get_spark(
        "tests",
        master="local[4]",
        freeze_gc=True,
        extra_configs={
            "spark.sql.shuffle.partitions": "4",
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark_wh_"),
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
