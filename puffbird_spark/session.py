"""SparkSession factory tuned for the puffbird-spark engine.

The reference (``puffbird/frame.py``) is single-process pandas and has no
session concept; this module is the Spark-native execution envelope:

- AQE on (runtime re-plan, partition coalescing, skew-join splitting) so
  plans survive scale-up without hand-tuned partition counts.
- UTC / NTZ-friendly timezone so timestamp semantics match naive-timestamp
  oracles (DuckDB) bit-for-bit.
- Arrow enabled for the few Pandas-UDF escape hatches (variant explosion,
  embedding kernels); everything else stays JVM-side.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        try:
            return max(1, int(cpus))
        except ValueError:
            pass
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "puffbird-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with scale-oriented defaults.

    In production this is a cluster session; locally ``local[N]``. All
    settings below are safe on both: AQE re-plans at runtime, so the static
    ``shuffle.partitions`` is only an upper bound for small data and a
    starting point for large data.
    """
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{default_parallelism()}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local[N] runs everything in the driver JVM; the 1g Spark default
        # OOMs on wide collect_list buckets long before the host does.
        # Only effective at JVM launch — a pre-existing session wins.
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # --- adaptive execution: the 100 TB story -------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- determinism & oracle parity ----------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # --- python boundary: Arrow batches, never per-row pickling -------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- scan efficiency ----------------------------------------------
        # nanosecond parquet timestamps (events table) surface as long —
        # sources.load_table converts them to timestamp_ntz at microsecond
        # precision, matching DuckDB's ns->us truncation
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # --- catalog: keep table data/metadata out of the repo cwd --------
        # (in-memory catalog — no hive metastore, no derby files; bucketed
        # saveAsTable data lands under the warehouse dir)
        .config("spark.sql.warehouse.dir", "/tmp/pbs_warehouse")
        # --- quieter local runs -------------------------------------------
        .config("spark.ui.showConsoleProgress", "false")
    )
    if os.environ.get("SPARK_GRAFT_UI", "0") != "1":
        builder = builder.config("spark.ui.enabled", "false")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
