"""SparkSession construction tuned for the validation engine.

Defaults are chosen for the 100 TB design point and scale down to
``local[N]`` for tests/bench:

- AQE on (runtime join re-planning, partition coalescing, skew-join) —
  replaces the reference's ad-hoc ``multiprocessing`` fan-out
  (/root/reference/proj/core/functions.py:35-58) with Spark's scheduler.
- Arrow execution on, with a deliberately small ``maxRecordsPerBatch``:
  image ``bytes`` rows are large, so Arrow batches crossing the JVM↔Python
  boundary must be capped by row count to bound Python-worker memory
  (SURVEY.md §4 item 4).
- Session timezone pinned to UTC so results hash-compare against the
  DuckDB oracle (duckdb timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Rows per Arrow batch for UDF stages. Image rows are ~1-100 KB each; 1024
# rows keeps a batch in the low-MB range per Python worker.
ARROW_BATCH_ROWS = 1024


def physical_parallelism() -> int:
    """Task-count target for CPU-bound Python UDF stages on SMALL inputs
    (few file splits). This is the number of PHYSICAL cores Python
    workers can actually use — NOT defaultParallelism: this box reports
    32 vCPUs but sustains ~8 cores of Python throughput, and forcing 32
    concurrent UDF tasks measured ~10× slower than 8 (oversubscribed
    workers thrash). At corpus scale file splits >> cores and callers'
    ``min_parallelism`` repartitions become no-ops, so this knob only
    shapes small/benchmark runs. Override with $SMCCHECKER_UDF_CORES."""
    env = os.environ.get("SMCCHECKER_UDF_CORES")
    if env:
        return int(env)
    return min(8, os.cpu_count() or 8)


def get_spark(
    app_name: str = "smcchecker-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` honors $SPARK_GRAFT_CPUS then falls back to ``local[*]``.
    ``shuffle_partitions`` defaults to the core count — at cluster scale this
    is overridden by AQE coalescing anyway; for local runs 200 is pure
    scheduling overhead on small data.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n_cores = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n_cores = cores

    # Single-JVM local mode: the 1g default heap is the scaling killer —
    # 32 concurrent tasks' scan buffers + Arrow batches thrash GC and
    # local[32] ends up SLOWER than local[8]. Size the heap to the core
    # count (only effective on first JVM launch in the process; harmless
    # later). On a real cluster this is executor memory, set at submit.
    driver_mem = os.environ.get("SPARK_DRIVER_MEM", f"{max(8, n_cores)}g")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n_cores))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS)
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # ship the engine to executors (the spark-submit --py-files analogue) so
    # pandas-UDF closures can import smcchecker_spark wherever the driver ran
    from smcchecker_spark.package import ensure_shipped

    ensure_shipped(spark)
    return spark
