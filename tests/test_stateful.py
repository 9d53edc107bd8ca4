"""Custom stateful streaming op: sessions survive micro-batch boundaries
(state carried in applyInPandasWithState), closed sessions match an
independent pandas replay."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from etl_rust_spark.streaming.stateful import stateful_sessionize

GAP = 60  # test-data gaps are seconds-scale; ~1000 sessions close at 60s


def _oracle_closed_sessions(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for uid, g in pdf.groupby("user_id"):
        ts = np.sort(g["ts"].astype("datetime64[s]").astype("int64").to_numpy())
        start = last = None
        n = 0
        sessions = []
        for t in ts:
            t = int(t)
            if start is None:
                start, last, n = t, t, 1
            elif t - last > GAP:
                sessions.append((uid, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        out.extend(sessions)  # open (final) session NOT closed — excluded
    return pd.DataFrame(
        out, columns=["user_id", "session_start", "session_end", "n_events"]
    )


def test_stateful_sessions_across_batches(spark, tmp_path):
    src = pd.read_parquet("/root/testdata/sf0.001/events.parquet")[
        ["user_id", "ts", "event_id"]
    ].sort_values("ts")  # ordered source (a WAL tail)
    stream_dir = tmp_path / "ev"
    stream_dir.mkdir()
    # 3 micro-batches split by TIME, so sessions straddle batch boundaries
    for i, part in enumerate(np.array_split(np.arange(len(src)), 3)):
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
        actual = spark.sql("SELECT * FROM sessions").toPandas()
    finally:
        q.stop()
        q.awaitTermination()

    expected = _oracle_closed_sessions(src)
    a = actual.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    e = expected.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, e, check_dtype=False)
