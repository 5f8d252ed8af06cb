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
    """DuckDB-equivalent SQL per query; keys absent here (simhash_docs,
    fingerprint_docs, ann_lsh_top3) are rows-only by design — xxhash64
    has no DuckDB equivalent / ANN is approximate."""
    return contract.oracle_sql()
