"""Custom stateful streaming operator: per-host crawl session tracking.

Demonstrates the ``applyInPandasWithState`` pattern for operators the
built-in windowed aggregations can't express: arbitrary per-key state
(running counters + open-session bookkeeping) updated per micro-batch,
with timeout-driven emission.

Each crawl host accumulates (pages, bytes, first_ts, last_ts) across
micro-batches; a state row is emitted every update (``closed=false``)
and once more when the processing-time timeout fires with no new data
(``closed=true``) — the streaming analog of gap-based sessionization
(q_sessionize is the batch twin).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType([
    T.StructField("host", T.StringType(), False),
    T.StructField("pages", T.LongType(), True),
    T.StructField("bytes", T.LongType(), True),
    T.StructField("first_ts", T.TimestampType(), True),
    T.StructField("last_ts", T.TimestampType(), True),
    T.StructField("closed", T.BooleanType(), True),
])

STATE_SCHEMA = T.StructType([
    T.StructField("pages", T.LongType(), True),
    T.StructField("bytes", T.LongType(), True),
    T.StructField("first_us", T.LongType(), True),
    T.StructField("last_us", T.LongType(), True),
])


def _update_host_session(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
):
    host = key[0]
    if state.hasTimedOut:
        pages, byts, first_us, last_us = state.get
        state.remove()
        yield pd.DataFrame([{
            "host": host, "pages": pages, "bytes": byts,
            "first_ts": pd.Timestamp(first_us, unit="us"),
            "last_ts": pd.Timestamp(last_us, unit="us"),
            "closed": True,
        }])
        return
    pages, byts, first_us, last_us = (
        state.get if state.exists else (0, 0, None, None)
    )
    for pdf in pdfs:
        pages += len(pdf)
        byts += int(pdf["nbytes"].sum())
        ts_us = pdf["ts"].astype("int64") // 1000
        lo, hi = int(ts_us.min()), int(ts_us.max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
    state.update((pages, byts, first_us, last_us))
    state.setTimeoutDuration(30 * 60 * 1000)  # 30min idle -> close
    yield pd.DataFrame([{
        "host": host, "pages": pages, "bytes": byts,
        "first_ts": pd.Timestamp(first_us, unit="us"),
        "last_ts": pd.Timestamp(last_us, unit="us"),
        "closed": False,
    }])


def host_sessions(pages_stream: DataFrame) -> DataFrame:
    """Stateful per-host session aggregation over the pages stream."""
    keyed = pages_stream.select(
        F.regexp_extract("url", r"https?://([^/]+)/", 1).alias("host"),
        F.col("warc_ts").alias("ts"),
        F.length("html").cast("long").alias("nbytes"),
    )
    return keyed.groupBy("host").applyInPandasWithState(
        _update_host_session,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
