"""Custom stateful streaming operator via applyInPandasWithState.

Running per-language crawl counters (pages, bytes, latest event time) that
survive across micro-batches — the kind of incremental corpus accounting a
long-running ingestion keeps (the batch pipeline's metrics table is its
checkpointed cousin, plans/lineage.py).

Built on ``applyInPandasWithState``: state is a single struct per group key,
updated from each batch's rows; a processing-time timeout could expire idle
keys (unused here — language keys are few and long-lived).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_pages", LongType()),
        StructField("n_bytes", LongType()),
    ]
)
OUTPUT_SCHEMA = StructType(
    [
        StructField("lang", StringType()),
        StructField("n_pages", LongType()),
        StructField("n_bytes", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    n_pages, n_bytes = state.get if state.exists else (0, 0)
    last_ts = None
    for pdf in pdfs:
        n_pages += len(pdf)
        n_bytes += int(pdf["n_bytes"].fillna(0).sum())
        ts = pdf["warc_ts"].max()
        if pd.notna(ts):
            last_ts = ts if last_ts is None else max(last_ts, ts)
    state.update((int(n_pages), int(n_bytes)))
    yield pd.DataFrame(
        {"lang": [key[0]], "n_pages": [n_pages], "n_bytes": [n_bytes],
         "last_ts": [last_ts]}
    )


def crawl_counters(pages_stream: DataFrame) -> DataFrame:
    """Streaming (lang -> running pages/bytes) counters, updated per batch."""
    from pyspark.sql import functions as F

    prepared = pages_stream.select(
        "lang", "warc_ts", F.length("html").cast("long").alias("n_bytes")
    )
    return prepared.groupBy("lang").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
