"""Custom stateful streaming: session windows via applyInPandasWithState.

Tumbling/sliding windows (streaming/metrics.py) cover fixed-window aggs;
session windows need CUSTOM state — a session closes only when a gap
elapses, which no built-in window expresses incrementally. This is the
``applyInPandasWithState`` shape: per-key state (the open session) carried
across micro-batches, closed sessions emitted in append mode.

Semantics match the batch sessionizer (operators/relational.sessionize,
30-minute default gap): events sorted by (ts, event_id) per user; a gap
greater than ``gap_s`` closes the running session. The OPEN session stays
in the state store — a later micro-batch (or a later ``availableNow``
run over the same checkpoint) continues it, which the test proves by
feeding a second file drop that extends a session opened by the first.

State is stored as epoch seconds (long) — portable across the Arrow
state serializer.
"""

from __future__ import annotations

import datetime

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_no", IntegerType()),
        StructField("n_events", LongType()),
        StructField("session_value", DoubleType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("session_no", IntegerType()),
        StructField("start_epoch", LongType()),
        StructField("last_epoch", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _make_update(gap_s: int):
    def update(key, pdfs, state: GroupState):
        user_id = int(key[0])
        if state.exists:
            sno, start_e, last_e, n, val = state.get
        else:
            sno, start_e, last_e, n, val = 0, None, None, 0, 0.0
        closed = []
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            events = pd.concat(frames).sort_values(["ts", "event_id"])
            for ts, v in zip(events["ts"], events["value"]):
                e = int(ts.timestamp())
                if last_e is not None and e - last_e > gap_s:
                    closed.append(
                        (user_id, sno, n, round(val, 4),
                         datetime.datetime.utcfromtimestamp(start_e),
                         datetime.datetime.utcfromtimestamp(last_e))
                    )
                    sno += 1
                    start_e, n, val = None, 0, 0.0
                if start_e is None:
                    start_e = e
                n += 1
                val += float(v)
                last_e = e
        state.update((sno, start_e, last_e, n, val))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_no", "n_events", "session_value",
                    "session_start", "session_end",
                ],
            )

    return update


def sessionize_stream(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    gap_s: int = 1800,
):
    """File-source stream → stateful session windows → parquet sink
    (append mode: rows are CLOSED sessions). availableNow per call; the
    open-session state survives in the checkpointed state store."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    out = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _make_update(gap_s),
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
