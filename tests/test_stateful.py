"""Custom stateful streaming op: sessions survive micro-batch boundaries
(state carried in applyInPandasWithState); gap-closed sessions match an
independent pandas replay, and idle/final sessions are flushed by
event-time timeout once the watermark passes their expiry (round 3 —
previously a drained stream stranded each user's final session in state)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from etl_rust_spark.streaming.stateful import stateful_sessionize

GAP = 60  # test-data gaps are seconds-scale; ~1000 sessions close at 60s
DELAY = 10  # watermark delay (stateful_sessionize default is "10 seconds")


def _oracle_sessions(pdf: pd.DataFrame):
    """Independent replay → (closed-by-gap sessions, final open session
    per user)."""
    closed, finals = [], []
    for uid, g in pdf.groupby("user_id"):
        ts = np.sort(g["ts"].astype("datetime64[s]").astype("int64").to_numpy())
        start = last = None
        n = 0
        for t in ts:
            t = int(t)
            if start is None:
                start, last, n = t, t, 1
            elif t - last > GAP:
                closed.append((uid, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        if start is not None:
            finals.append((uid, start, last, n))
    cols = ["user_id", "session_start", "session_end", "n_events"]
    return pd.DataFrame(closed, columns=cols), pd.DataFrame(finals, columns=cols)


def _run_stream(spark, tmp_path, src: pd.DataFrame, n_files=3):
    stream_dir = tmp_path / "ev"
    stream_dir.mkdir()
    # micro-batches split by TIME, so sessions straddle batch boundaries
    for i, part in enumerate(np.array_split(np.arange(len(src)), n_files)):
        pq.write_table(
            pa.Table.from_pandas(src.iloc[part], preserve_index=False),
            stream_dir / f"seg-{i}.parquet",
        )
    schema = spark.read.parquet(str(stream_dir)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    q = (
        stateful_sessionize(stream, GAP)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.sql("SELECT * FROM sessions").toPandas()
    finally:
        q.stop()
        q.awaitTermination()


def test_stateful_sessions_across_batches(spark, tmp_path):
    src = pd.read_parquet("/root/testdata/sf0.001/events.parquet")[
        ["user_id", "ts", "event_id"]
    ].sort_values("ts")  # ordered source (a WAL tail)
    actual = _run_stream(spark, tmp_path, src)

    closed, finals = _oracle_sessions(src)
    # event-time timeout flushes a final session once the watermark
    # (global max ts - delay) passes its expiry (last + gap)
    global_max = int(src["ts"].astype("datetime64[s]").astype("int64").max())
    flushed = finals[(global_max - DELAY) > (finals.session_end + GAP)]
    expected = pd.concat([closed, flushed], ignore_index=True)

    a = actual.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    e = expected.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert len(a) > len(closed) > 0  # timeout emitted sessions beyond gap-closure
    pd.testing.assert_frame_equal(a, e, check_dtype=False)


def test_end_of_stream_flushes_final_sessions(spark, tmp_path):
    """The round-2 defect scenario: users go idle, stream drains — their
    final sessions must be emitted, not ride in state forever. A late
    'ticker' user advances the watermark past everyone's expiry."""
    base = pd.Timestamp("2025-01-01").value // 10**9
    rows = []
    for uid in (1, 2):
        for k in range(3):  # one session of 3 events per user, then silence
            rows.append((uid, pd.Timestamp((base + uid * 5 + k) * 10**9), k))
    # ticker events far in the future push the watermark beyond expiry
    for j in range(3):
        rows.append((99, pd.Timestamp((base + 10_000 + j * 200) * 10**9), j))
    src = pd.DataFrame(rows, columns=["user_id", "ts", "event_id"]).sort_values("ts")
    src["ts"] = src["ts"].astype("datetime64[us]")  # Spark can't read NANOS parquet
    actual = _run_stream(spark, tmp_path, src)
    by_uid = {
        r.user_id: (r.session_start, r.session_end, r.n_events)
        for r in actual.itertuples()
        if r.user_id in (1, 2)
    }
    assert by_uid == {
        1: (base + 5, base + 7, 3),
        2: (base + 10, base + 12, 3),
    }
