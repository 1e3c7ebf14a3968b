"""Custom stateful streaming operator (north-star: 'custom stateful
operators via applyInPandasWithState').

Running per-user totals: state = (event count, value sum); each
micro-batch folds its rows into the state and emits the updated
totals. The same pattern carries any incremental per-key aggregate a
training-data stream needs (per-source document counts, per-shard
dedup registers, quota enforcement).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from ..tables import load_events_stream

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("v", T.DoubleType())]
)


def _update_user_totals(
    key, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, v = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        v += float(pdf["value"].sum())
    state.update((n, v))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [v]})


def streaming_user_totals(spark: SparkSession, sf_dir: str, query_name: str = "user_totals"):
    """readStream → applyInPandasWithState → memory sink (update mode).
    Returns the started StreamingQuery."""
    raw = load_events_stream(spark, f"{sf_dir}/events.parque[t]")
    ev = raw.select("user_id", "value")
    out = ev.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
