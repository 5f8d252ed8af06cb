"""Table IO seam: parquet in this sandbox, Iceberg in production.

The north rule targets partitioned Iceberg tables with snapshot-pinned
resumable reads; no Iceberg runtime jars exist in this sandbox
(SURVEY.md §7.4 #6), so the seam keeps both worlds behind one interface:

  * parquet mode (default here): plain directory reads/writes, partition
    columns via directory layout, exactly-once via the lineage protocol
    (plans/lineage.py: write-ahead chunk dirs + lineage commit rows).
  * iceberg mode (production): table identifiers instead of paths;
    ``writeTo(...).append()`` inside the chunk commit, reads pinned with
    ``option("snapshot-id", ...)`` so a resumed run sees byte-identical
    input; the lineage table becomes an Iceberg table and the chunk
    commit becomes one atomic append.

Only the parquet mode is executable (and tested) in this environment;
the iceberg branch raises with a clear message if the runtime is absent.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class TableIO:
    mode: str = "parquet"  # 'parquet' | 'iceberg'
    catalog: str = "spark_catalog"

    def read(self, spark: SparkSession, ident: str, snapshot_id: int | None = None) -> DataFrame:
        if self.mode == "parquet":
            return spark.read.parquet(ident)
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        try:
            return reader.table(f"{self.catalog}.{ident}")
        except Exception as e:  # pragma: no cover - no iceberg jars in sandbox
            raise RuntimeError(
                "iceberg mode requires iceberg-spark-runtime on the classpath"
            ) from e

    def append(self, df: DataFrame, ident: str, partition_by: tuple[str, ...] = ()) -> None:
        if self.mode == "parquet":
            w = df.write.mode("append")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(ident)
            return
        try:  # pragma: no cover - no iceberg jars in sandbox
            df.writeTo(f"{self.catalog}.{ident}").append()
        except Exception as e:
            raise RuntimeError(
                "iceberg mode requires iceberg-spark-runtime on the classpath"
            ) from e
