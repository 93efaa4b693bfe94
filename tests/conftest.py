from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from elb_log_etl_enrichment_spark.session import get_spark

    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    s = get_spark(
        app_name="engine-tests", master="local[4]", shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
