from __future__ import annotations

import pytest

from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.session import (
    build_session,
    register_testdata_views,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="tests", shuffle_partitions=8)
    register_testdata_views(s, SF_DIR)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
