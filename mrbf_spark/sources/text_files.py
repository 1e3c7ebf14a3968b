"""Schema'd text-file sources/sinks — the reference's native format
(TSV with header, util/split-dataset.py:32-33) as first-class
connectors with the Java-flavor skip-bad-rows default
(BloomFilterMapper.java:73-83 → DROPMALFORMED).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_tsv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    header: bool = True,
    drop_malformed: bool = True,
) -> DataFrame:
    return (
        spark.read.options(
            sep="\t",
            header=header,
            mode="DROPMALFORMED" if drop_malformed else "PERMISSIVE",
        )
        .schema(schema)
        .csv(path)
    )


def write_tsv(df: DataFrame, path: str, *, single_file: bool = False) -> None:
    """TSV sink; single_file=True reproduces the reference's getmerge
    step (sh-scripts/1_launch-linecount.sh:16-18) via coalesce(1)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").options(sep="\t", header=True).csv(path)
