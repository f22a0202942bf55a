"""Custom stateful streaming operator: gap sessionization, including
state carried ACROSS micro-batches (two file drops)."""

from __future__ import annotations

import datetime as dt

import pytest

from btd.schema import TRANSCRIPTS
from btd.streaming import run_to_memory, sessionize_stream, stream_transcripts

# naive = session-TZ (UTC) wall time, matching what Spark hands back
T0 = dt.datetime(2021, 1, 1)


def _rows(conv, minute_offsets, base_idx=0):
    return [
        {
            "conv_id": conv,
            "turn_idx": base_idx + i,
            "role": "user",
            "text": "t",
            "tool": "",
            "ts": T0 + dt.timedelta(minutes=m),
        }
        for i, m in enumerate(minute_offsets)
    ]


def _py_sessions(minute_offsets, gap=30):
    sessions, cur = [], [minute_offsets[0]]
    for m in minute_offsets[1:]:
        if m - cur[-1] > gap:
            sessions.append(cur)
            cur = [m]
        else:
            cur.append(m)
    sessions.append(cur)
    return sessions


@pytest.fixture()
def staged_input(spark, tmp_path):
    """Two file drops = two micro-batches (maxFilesPerTrigger=1), so
    the open-session state must survive a batch boundary."""
    p = tmp_path / "tx"
    p.mkdir()
    batch1 = _rows("c1", [0, 5, 10, 60, 65]) + _rows("c2", [0, 100])
    batch2 = _rows("c1", [70, 200], base_idx=5) + _rows("c2", [105], base_idx=2)
    spark.createDataFrame(batch1, TRANSCRIPTS).coalesce(1).write.parquet(
        str(p / "b1")
    )
    spark.createDataFrame(batch2, TRANSCRIPTS).coalesce(1).write.parquet(
        str(p / "b2")
    )
    return str(p), {"c1": [0, 5, 10, 60, 65, 70, 200], "c2": [0, 100, 105]}


def test_sessionize_across_batches(spark, staged_input):
    path, offsets = staged_input
    stream = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/b*/")
    )
    run_to_memory(sessionize_stream(stream, 30), "sessions", mode="update")
    got_all = spark.sql("SELECT * FROM sessions").collect()
    # update mode re-emits open sessions; last emission per key wins
    final = {}
    for r in got_all:
        final[(r.conv_id, r.session_idx)] = (
            r.n_turns,
            r.start_ts,
            r.end_ts,
        )
    for conv, mins in offsets.items():
        expected = _py_sessions(mins)
        got_conv = sorted(
            (k[1], v) for k, v in final.items() if k[0] == conv
        )
        assert len(got_conv) == len(expected), (conv, got_conv, expected)
        for (si, (n, st, en)), sess in zip(got_conv, expected):
            assert n == len(sess), (conv, si)
            assert st == T0 + dt.timedelta(minutes=sess[0])
            assert en == T0 + dt.timedelta(minutes=sess[-1])


def test_stream_gap_uses_whole_seconds_like_batch(spark, tmp_path):
    """Sub-second timestamps: a raw gap of 1800.3 s whose FLOORED
    gap is exactly 1800 s must stay ONE session, matching the batch
    twin's unix_timestamp (whole-second) comparison and the SQL
    oracle's floor(epoch()) arithmetic."""
    rows = [
        {
            "conv_id": "c",
            "turn_idx": i,
            "role": "user",
            "text": "t",
            "tool": "",
            "ts": ts,
        }
        for i, ts in enumerate(
            [
                T0 + dt.timedelta(seconds=0, microseconds=600000),
                # floor: 1800 - 0 = 1800, NOT > 1800 -> same session,
                # though the raw delta is 1800.3s
                T0 + dt.timedelta(seconds=1800, microseconds=900000),
                # floor gap 1801 > 1800 -> new session
                T0 + dt.timedelta(seconds=3601, microseconds=950000),
            ]
        )
    ]
    src = str(tmp_path / "tx")
    spark.createDataFrame(rows, TRANSCRIPTS).write.parquet(src)
    run_to_memory(
        sessionize_stream(stream_transcripts(spark, src), 30),
        "subsec_sessions",
        mode="update",
    )
    got = {
        (r.conv_id, r.session_idx): r.n_turns
        for r in spark.table("subsec_sessions").collect()
    }
    assert got == {("c", 0): 2, ("c", 1): 1}
