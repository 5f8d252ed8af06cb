"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over fhir_owl_spark.contract — the driver's verify runs
``entry(spark)`` as a smoke check and compares each ``queries()[name]``
against ``oracle_sql()[name]`` via DuckDB at sf=0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fhir_owl_spark import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return contract.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data operator family)."""
    return dict(contract.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query — since round 3 EVERY query has
    one (94/94 as of round 5). Hash-parameterized operators (simhash,
    fingerprint, sampling) run with an md5-60bit hash DuckDB recomputes;
    the two approximate ANN queries are self-validating (recall-floor
    booleans vs the in-query exact top-3, oracle asserts TRUE)."""
    return contract.oracle_sql()
