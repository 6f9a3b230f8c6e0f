from __future__ import annotations

import os

import pytest

TESTDATA_SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from ftm_datalake_spark.session import build_session

    import tempfile

    s = build_session(
        app_name="ftm-datalake-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "4g",
            # keep saveAsTable output out of the repo cwd
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-wh-"),
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TESTDATA_SF
