from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from airflow_crypto_btc_spark.session import get_spark

    s = get_spark(
        app_name="engine-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            # keep saveAsTable artifacts (bucketing tests) out of the repo
            "spark.sql.warehouse.dir": str(
                tmp_path_factory.mktemp("spark-warehouse")
            ),
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
