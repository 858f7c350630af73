"""Table-format seam: one adapter surface for parquet paths and Iceberg
tables, so the engine's sources/sinks (input scan, violations/verdicts
checkpoint, gated load) are format-agnostic.

North rule / input_hint name Iceberg as the production table format
(``spark.read.format("iceberg")``, gated ``writeTo().append()``, snapshot
based resume); this sandbox has no Iceberg runtime jar, so:

- ``ParquetTable`` is the fully-functional stand-in. Hive-partitioned
  parquet layouts give the SAME observable pruning behavior the engine
  relies on at scale: a partition-column predicate prunes whole
  directories at the source (``PartitionFilters`` in the scan plan,
  asserted in tests/test_plans.py + test_checkpoint.py) exactly as an
  Iceberg manifest prune would.
- ``IcebergTable`` carries the real call shapes (``spark.table``,
  ``DataFrame.writeTo(...).append()``) and fails fast with an actionable
  error when the runtime/catalog is absent — the seam a cluster
  deployment fills by adding the iceberg-spark-runtime jar and a catalog
  conf; no engine code changes.

``resume_filter`` is the §4.5 orchestration step: checkpoint table →
incomplete-partition predicate → source-level partition pruning, so a
resumed 10^12-row run reads ZERO bytes of finished partitions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class ParquetTable:
    """Path-backed parquet table, optionally hive-partitioned.

    ``partition_by``: partition columns for writes. Reads of partitioned
    layouts discover the partition columns from the directory structure,
    and filters on them become ``PartitionFilters`` (directory pruning,
    zero I/O for pruned partitions).
    """

    path: str
    partition_by: list[str] = field(default_factory=list)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def append(self, df: DataFrame) -> None:
        w = df.write.mode("append")
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(self.path)

    def overwrite(self, df: DataFrame) -> None:
        w = df.write.mode("overwrite")
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(self.path)


@dataclass
class IcebergTable:
    """Catalog-registered Iceberg table (``catalog.db.table``).

    Requires the iceberg-spark-runtime jar + a catalog configured via
    ``spark.sql.catalog.<name>`` — present on the production cluster,
    absent in this sandbox, hence the plan-time availability check
    (fail fast with the fix, not a deep ClassNotFoundException).
    Appends use ``writeTo().append()`` — an atomic snapshot commit, so
    the gated load's all-or-nothing property holds per table without
    the careful write ordering parquet needs.
    """

    identifier: str

    def _check(self, spark: SparkSession) -> None:
        catalog = self.identifier.split(".", 1)[0]
        if not spark.conf.get(f"spark.sql.catalog.{catalog}", None):
            raise RuntimeError(
                f"Iceberg catalog {catalog!r} is not configured. Add the "
                "iceberg-spark-runtime jar and set "
                f"spark.sql.catalog.{catalog}=org.apache.iceberg.spark."
                "SparkCatalog (plus warehouse/type confs) at submit time."
            )

    def read(self, spark: SparkSession) -> DataFrame:
        self._check(spark)
        return spark.table(self.identifier)

    def append(self, df: DataFrame) -> None:
        self._check(df.sparkSession)
        df.writeTo(self.identifier).append()

    def overwrite(self, df: DataFrame) -> None:
        self._check(df.sparkSession)
        df.writeTo(self.identifier).createOrReplace()


def as_table(sink: "str | ParquetTable | IcebergTable"):
    """Back-compat shim: plain string paths mean parquet."""
    if isinstance(sink, str):
        return ParquetTable(sink)
    return sink


def sink_for(dest: str, fmt: str = "parquet"):
    """Destination string + EXPLICIT sink format → table adapter.

    The sink format is its own decision — a production-shaped run
    validates staged parquet input and gated-appends into an Iceberg
    prod table, so the INPUT format flag must never choose the sink
    type."""
    if fmt == "iceberg":
        return IcebergTable(dest)
    if fmt == "parquet":
        return ParquetTable(dest)
    raise ValueError(f"unsupported sink format {fmt!r} (parquet|iceberg)")


def resume_filter(
    df: DataFrame, done_parts: set, part_col: str = "part_id"
) -> DataFrame:
    """Prune completed partitions from the input scan (SURVEY §4.5).

    The predicate is on the PARTITION column, so on a hive-partitioned
    parquet layout (or an Iceberg-partitioned table) it prunes at the
    source — finished partitions cost zero I/O on resume, not a scan +
    filter. Plan-asserted in tests/test_checkpoint.py.
    """
    if not done_parts:
        return df
    # NULL-safe: ~isin() is NULL (not true) for NULL partition values, so
    # a plain negated isin would silently drop NULL-part rows from every
    # resume wave — unvalidated rows passing the gate. NULL can never be
    # a completed partition id, so it always stays in the todo set (and
    # fails loudly downstream where wave grouping requires a part id).
    return df.filter(
        F.col(part_col).isNull() | ~F.col(part_col).isin(list(done_parts))
    )
