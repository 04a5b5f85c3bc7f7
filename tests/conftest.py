from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from stock_market_data_pipeline_v2_spark.session import get_spark

    spark = get_spark("tests", shuffle_partitions=4)
    yield spark
    spark.stop()
