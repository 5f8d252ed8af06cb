import pytest

from fhir_owl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fhir-owl-spark-tests", parallelism=8, shuffle_partitions=8)
    yield s
    s.stop()
