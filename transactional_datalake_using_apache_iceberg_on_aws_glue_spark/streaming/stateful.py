"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY §2.9 T5: the reference keeps all state in the Iceberg table;
these cover the cases where an operator needs cross-batch state that
is NOT the sink — running aggregates and first-seen dedup).

State layout is per-key (Spark partitions state by the groupBy key),
so memory is O(distinct keys) per executor and the operator scales
horizontally exactly like the shuffle that feeds it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"

# NOTE on function placement: the state functions are defined as
# CLOSURES inside the public builders, not at module level. cloudpickle
# serializes module-level functions by REFERENCE (import path), so
# executors' Python workers would need this package importable —
# which fails for any caller using the repo via sys.path. Closures are
# pickled by VALUE and run anywhere. (Found by driving the operator
# from an external script; the pytest run masked it via cwd.)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming running totals per user via applyInPandasWithState
    (update-mode output). State = (count, sum) per user — O(distinct
    users), checkpointed with each batch so replays are safe.

    Batch DataFrames (tests' oracle path) fall back to a plain groupBy —
    same result as draining the stream and keeping each user's last row.
    """
    if not events.isStreaming:
        import pyspark.sql.functions as F

        return events.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )

    def fn(key, pdfs, state):
        import pandas as pd  # worker-side import

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FIRST_SEEN_SCHEMA = "fingerprint string, doc_id bigint"
_SEEN_STATE_SCHEMA = "seen boolean"


def streaming_first_seen(docs: DataFrame, fingerprint_col: str = "fingerprint") -> DataFrame:
    """Streaming exact-dedup: first doc_id per fingerprint across the
    whole stream lifetime (state-backed; the batch analogue is
    groupBy(fingerprint).min(doc_id))."""
    if not docs.isStreaming:
        import pyspark.sql.functions as F

        return docs.groupBy(fingerprint_col).agg(F.min("doc_id").alias("doc_id"))

    def fn(key, pdfs, state):
        import pandas as pd  # worker-side import

        if state.exists:
            return
        best = None
        for pdf in pdfs:
            m = int(pdf["doc_id"].min())
            best = m if best is None else min(best, m)
        if best is not None:
            state.update((True,))
            yield pd.DataFrame({"fingerprint": [key[0]], "doc_id": [best]})

    return docs.groupBy(fingerprint_col).applyInPandasWithState(
        fn,
        outputStructType=FIRST_SEEN_SCHEMA,
        stateStructType=_SEEN_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
