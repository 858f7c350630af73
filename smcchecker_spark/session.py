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


# Config default for CPU-bound Python-UDF task counts when the host's
# PHYSICAL core budget can't be detected (see physical_parallelism). A
# hypervisor-oversubscribed guest reports vCPUs, not the physical share it
# sustains — the test/bench box reports 32 vCPUs but delivers ~8 cores of
# Python throughput, and 32 concurrent UDF workers measured ~10× slower
# than 8. Per-host calibration belongs in $SMCCHECKER_UDF_CORES (the bench
# harness pins it); this constant is only the conservative fallback.
DEFAULT_UDF_CORES = 8


def _detect_physical_cores() -> int | None:
    """Unique (physical id, core id) pairs from /proc/cpuinfo — detects
    SMT (hyperthread siblings share a core id). None when unreadable or
    on non-Linux."""
    try:
        pairs, phys, core = set(), None, None
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("physical id"):
                    phys = line.split(":")[1].strip()
                elif line.startswith("core id"):
                    core = line.split(":")[1].strip()
                elif not line.strip() and phys is not None and core is not None:
                    pairs.add((phys, core))
                    phys = core = None
        if phys is not None and core is not None:
            pairs.add((phys, core))
        return len(pairs) or None
    except OSError:
        return None


def physical_parallelism() -> int:
    """Task-count target for CPU-bound Python UDF stages on SMALL inputs
    (few file splits). This is the number of PHYSICAL cores Python
    workers can actually use — NOT defaultParallelism. At corpus scale
    file splits >> cores and callers' ``min_parallelism`` repartitions
    become no-ops, so this knob only shapes small/benchmark runs.

    Resolution order: $SMCCHECKER_UDF_CORES (per-host calibration, set
    by the bench harness) → SMT-aware detection (when /proc/cpuinfo
    shows fewer physical cores than the scheduler affinity, trust it) →
    min(DEFAULT_UDF_CORES, affinity). The last cap exists because a
    hypervisor-oversubscribed guest is UNDETECTABLE from inside — the
    vCPU count looks like real cores — and overshooting the physical
    budget thrashes Python workers."""
    env = os.environ.get("SMCCHECKER_UDF_CORES")
    if env:
        return int(env)
    try:
        affinity = len(os.sched_getaffinity(0))
    except AttributeError:  # non-Linux
        affinity = os.cpu_count() or DEFAULT_UDF_CORES
    detected = _detect_physical_cores()
    if detected and detected < affinity:
        return detected
    return min(DEFAULT_UDF_CORES, affinity)


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
        # Scan-split floor: Spark's split target is
        # min(maxPartitionBytes, totalBytes/minPartitionNum) and
        # minPartitionNum DEFAULTS to the core count — a multi-GB local
        # input then plans ~1-2.5 task waves, and a 2.5-wave scan leaves
        # half the cores idle through the final wave (measured: the
        # 8-core image-validation level swung 150k-230k img/s run-to-run
        # with a 20-split scan; the 2-core level, at 10 clean waves, was
        # stable — directly skewing the N→4N efficiency). 4 waves/core
        # bounds the tail-wave utilization loss at ~1/4 wave. At cluster
        # scale splits >> 4×cores and this floor is inert.
        .config("spark.sql.files.minPartitionNum", str(4 * n_cores))
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
