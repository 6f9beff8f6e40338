import os

import pytest

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")


@pytest.fixture(scope="session")
def spark():
    from doctor_spark.session import get_spark

    s = get_spark("doctor_spark-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()
