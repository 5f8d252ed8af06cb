import pytest

from fhir_owl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fhir-owl-spark-tests", parallelism=8, shuffle_partitions=8)
    yield s
    s.stop()


def plan_of(df) -> str:
    """Formatted physical plan — single shared accessor for the pyspark
    internal (df._sc._jvm) so a pyspark upgrade breaks exactly one spot."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
