"""Custom stateful streaming operators via applyInPandasWithState.

NOTE: no ``from __future__ import annotations`` — state functions are
inspected by signature like pandas UDFs.

The reference has no streaming at all; this is the [extension] surface
for arbitrary per-key streaming state that windowed builtins can't
express (SURVEY §2.10). Pattern: grouped Arrow batches + an explicit
GroupState carrying a tuple, update-mode output per micro-batch.

Scale notes: state lives in the state store partitioned by key — one
shuffle on the grouping key per micro-batch; use timeouts
(ProcessingTimeTimeout/EventTimeTimeout) to expire idle keys so state
is bounded on unbounded key domains.
"""

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _update_running_totals(key, pdfs, state: GroupState):
    (n, total) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "total_value": round(total, 2)}]
    )


def stream_running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user lifetime (n_events, total_value), updated each micro-batch.

    A deliberately simple custom stateful operator: the same shape
    carries sessionization-with-side-outputs, CEP-style pattern state,
    or per-key model features.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_user_totals(events: DataFrame) -> DataFrame:
    """Batch twin of ``stream_running_user_totals``: the same per-key
    pandas kernel run through grouped-map applyInPandas. Streaming's
    final emitted state MUST equal this (asserted in tests); registering
    it makes the stateful surface hash-verifiable against a SQL oracle.
    """
    import numpy as np

    from velox_hadoop_spark.functions.vectors import round_half_away

    def totals(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [
                {
                    "user_id": int(pdf["user_id"].iloc[0]),
                    "n_events": len(pdf),
                    "total_value": float(
                        round_half_away(float(pdf["value"].sum()), 2)
                    ),
                }
            ]
        )

    return events.groupBy("user_id").applyInPandas(totals, RUNNING_TOTALS_SCHEMA)


def _register():
    from pyspark.sql import functions as F

    from velox_hadoop_spark.plans.registry import register

    @register(
        "stateful_totals_batch_twin",
        oracle="""
            SELECT user_id, count(*) AS n_events,
                   ROUND(sum(value), 2) AS total_value
            FROM events GROUP BY user_id
        """,
        tags=("streaming", "stateful", "applyInPandasWithState", "extension"),
    )
    def q_stateful_totals_batch_twin(spark, sf_dir):
        """Final state of the custom stateful operator, batch form."""
        from velox_hadoop_spark.catalog import read_table

        ev = read_table(spark, sf_dir, "events").select("user_id", "value")
        return batch_user_totals(ev)


_register()
