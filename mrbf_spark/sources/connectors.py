"""Optional-format connectors, gated behind import/classpath probes.

The v1 image has no Delta/Iceberg jars and no Kafka broker; the
connector surface is declared (so a cluster deploy only adds jars, not
code) and fails with actionable errors here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _require_format(spark: SparkSession, fmt: str, package_hint: str):
    try:
        spark.read.format(fmt).load("/nonexistent")  # classpath probe
    except Exception as exc:
        msg = str(exc)
        if "ClassNotFoundException" in msg or "Failed to find" in msg or "data source" in msg.lower():
            raise NotImplementedError(
                f"{fmt} support needs its connector jar on the classpath "
                f"(e.g. --packages {package_hint}); not baked into this environment"
            ) from exc
        raise


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    _require_format(spark, "delta", "io.delta:delta-spark_2.13")
    return spark.read.format("delta").load(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    _require_format(spark, "iceberg", "org.apache.iceberg:iceberg-spark-runtime")
    return spark.read.format("iceberg").load(table)


def read_kafka_stream(spark: SparkSession, bootstrap: str, topic: str) -> DataFrame:
    _require_format(spark, "kafka", "org.apache.spark:spark-sql-kafka-0-10_2.13")
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .load()
    )
