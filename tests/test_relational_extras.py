"""Accuracy bounds for the sketch aggregates vs their exact twins."""

from __future__ import annotations

import pyspark.sql.functions as F

from mrbf_spark.catalog import queries
from mrbf_spark.tables import load_table

from conftest import SF_SMOKE


def test_approx_aggregates_within_bounds(spark):
    approx = {
        r["l_returnflag"]: r
        for r in queries()["approx_aggregates"](spark, SF_SMOKE).collect()
    }
    li = load_table(spark, SF_SMOKE, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median_price"),
        )
        .collect()
    }
    for flag, a in approx.items():
        e = exact[flag]
        assert abs(a["approx_parts"] - e["parts"]) / e["parts"] < 0.1  # HLL ~2% rsd
        assert abs(a["approx_median_price"] - e["median_price"]) / e["median_price"] < 0.2
