"""Stateful streaming sessionization: cross-micro-batch state, batch
parity on closed sessions."""

import datetime

import pytest

from readur_spark.streaming.sessions import sessionize_stream

SCHEMA = "user_id long, event_id long, ts timestamp, value double"
T0 = datetime.datetime(2026, 2, 1, 8, 0, 0)


def _ev(user, eid, minutes, value=1.0):
    return {
        "user_id": user,
        "event_id": eid,
        "ts": T0 + datetime.timedelta(minutes=minutes),
        "value": float(value),
    }


def test_sessions_close_on_gap_and_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    # drop 1: user 1 — two events 10 min apart, then a 2 h gap event
    # (closes session 0); user 2 — single event (stays open)
    batch1 = [_ev(1, 1, 0, 5.0), _ev(1, 2, 10, 7.0), _ev(1, 3, 130, 1.0), _ev(2, 1, 0, 2.0)]
    spark.createDataFrame(batch1, SCHEMA).coalesce(1).write.parquet(src)
    q = sessionize_stream(spark, src, out, ck, SCHEMA, gap_s=1800)
    q.awaitTermination(120)
    rows = {
        (r["user_id"], r["session_no"]): (r["n_events"], r["session_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert rows == {(1, 0): (2, 12.0)}  # only user 1's first session closed

    # drop 2: user 1 extends the OPEN session (10 min after its last
    # event), then a huge gap closes it — n_events must count the event
    # from drop 1 PLUS the one from drop 2 (state carried across runs)
    batch2 = [_ev(1, 4, 140, 3.0), _ev(1, 5, 600, 9.0)]
    spark.createDataFrame(batch2, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    q2 = sessionize_stream(spark, src, out, ck, SCHEMA, gap_s=1800)
    q2.awaitTermination(120)
    rows = {
        (r["user_id"], r["session_no"]): (r["n_events"], r["session_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert rows[(1, 0)] == (2, 12.0)
    assert rows[(1, 1)] == (2, 4.0)  # events 3 (drop 1) + 4 (drop 2)
    assert (2, 0) not in rows  # user 2's session still open in state


def test_session_boundaries_match_batch_semantics(spark, tmp_path):
    """Closed sessions agree with the batch sessionizer's grouping on the
    same event set (same 1800 s gap rule)."""
    from readur_spark.operators.relational import sessionize

    events = [
        _ev(7, 1, 0), _ev(7, 2, 20), _ev(7, 3, 60), _ev(7, 4, 65),
        _ev(7, 5, 200), _ev(7, 6, 900),  # sentinel closes everything before
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(events, SCHEMA).coalesce(1).write.parquet(src)
    q = sessionize_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ck"), SCHEMA, gap_s=1800
    )
    q.awaitTermination(120)
    stream_rows = {
        (r["n_events"], r["session_value"], r["session_start"], r["session_end"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    batch = sessionize(
        spark.createDataFrame(events, "user_id long, event_id long, ts timestamp, value double")
    ).collect()
    batch_rows = {
        (r["n_events"], r["session_value"], r["session_start"], r["session_end"])
        for r in batch
    }
    # stream emitted all sessions except the open one (the sentinel's)
    assert stream_rows and stream_rows <= batch_rows
    assert len(stream_rows) == len(batch_rows) - 1
