"""Custom stateful streaming operators (driver brief §streams:
``applyInPandasWithState`` for custom stateful logic).

``dedup_stream``: exactly-once emission per key ACROSS micro-batches —
the streaming analog of exact dedup (operators/dedup.py). The classic
use here is dropping re-delivered image/caption rows (keyed by
``image_id`` or ``phash``) before they reach the append pipeline:
``dropDuplicates`` on a stream needs an unbounded watermark to be safe,
while explicit group state keeps exactly the key set and nothing else.

State per key is a single marker row; at 10^12 keys the state store is
the bound — callers partition the stream by key (Spark does: the
stateful operator hash-shuffles on the grouping key) and RocksDB-backed
state stores hold the key set out of heap on a real cluster.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import IntegerType, StructField, StructType

_STATE_SCHEMA = StructType([StructField("seen", IntegerType(), True)])


def dedup_stream(stream_df: DataFrame, key_col: str = "image_id") -> DataFrame:
    """Emit each key's FIRST row only, once per stream lifetime.

    Works across micro-batches and restarts (state lives in the
    streaming checkpoint). Within a batch, the first row in arrival
    order wins — deterministic for file sources, which preserve file
    order per partition.
    """
    out_schema = stream_df.schema

    def fn(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            # key already emitted in an earlier batch — drop everything
            return iter(())
        first = None
        for pdf in pdfs:
            if len(pdf):
                first = pdf.iloc[:1]
                break
        state.update((1,))
        return iter(()) if first is None else iter((first,))

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )
