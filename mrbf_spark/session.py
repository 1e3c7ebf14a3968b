"""SparkSession factory tuned for the driver environment.

Local mode is a single JVM: ``spark.driver.memory`` is the only memory
knob. On a real cluster the same builder works unchanged — partitioning
and broadcast decisions in the operators are what make the plans scale,
not these settings.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "mrbf-spark", *, cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    - AQE on: runtime coalescing, skew-join splitting, broadcast
      conversion — the scale-up safety net.
    - shuffle.partitions ~ cores locally; a cluster deploy would raise
      it (or rely on AQE coalescing from a high initial value).
    - UTC session timezone so timestamps compare exactly against the
      DuckDB oracle.
    - Arrow enabled for the few pandas-UDF code paths.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Trust bucketed-scan sort order (Spark 3+ hides it behind this
        # legacy flag): our bucketed writes guarantee one file per
        # bucket (repartition-before-bucketBy), the only layout where
        # Spark honors the flag, eliding the SMJ's per-partition Sort.
        # Plan-only effect; results identical on a vanilla session.
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # Collected-result ceiling: the ENGINE never collects large
        # frames (plan-audited), but verification harnesses collect
        # both compare sides, and at sf≥1 some pair outputs are
        # legitimately 10⁷-row (dedup_simhash on a Zipfian corpus).
        # Env-tunable like driver memory; 4g default (Spark ships 1g).
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_GRAFT_MAX_RESULT", "4g"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
