"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.12 doc-batch handler family; beyond-reference surface).

Spark's built-in streaming aggregations cover counts/sums; an arbitrary
per-key state machine (running aggregates with custom transition logic,
session scoring, anomaly flags) needs the state-store API directly.
``stateful_user_stats`` keeps (n_events, total_value, max_value) per user
across micro-batches: each batch touches only its keys' state — the
100 TB shape for per-entity accumulators (state lives partitioned in the
state store, co-located with the groupBy hash).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _update_user_stats(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total], "max_value": [mx]}
    )


def stateful_user_stats(
    spark: SparkSession,
    source_dir: str,
    schema,
    query_name: str = "user_stats",
):
    """readStream -> groupBy(user_id).applyInPandasWithState: emits each
    touched user's UPDATED running stats per micro-batch (update mode —
    untouched keys emit nothing, their state stays in the store)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    out = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=(
                "user_id long, n_events long, total_value double, max_value double"
            ),
            stateStructType="n long, total double, mx double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
