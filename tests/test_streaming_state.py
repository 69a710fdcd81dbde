"""Stateful streaming sessionization: applyInPandasWithState vs the batch
gap formulation on the same data (closed sessions must agree)."""

from scalable_data_integration_with_llms_spark.streaming.events import read_event_stream
from scalable_data_integration_with_llms_spark.streaming.sessions import sessionize_stream


def test_streaming_sessionization_matches_batch(spark, tmp_path):
    from scalable_data_integration_with_llms_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    batch = {
        (r.user_id, r.session_id): (r.n_events, r.session_start, r.session_end)
        for r in QUERIES["q_sessionization"](spark, sf_dir).collect()
    }

    stream = read_event_stream(spark, sf_dir)
    sessions = sessionize_stream(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sdi_sessions_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = {
        (r.user_id, r.session_id): (r.n_events, r.session_start, r.session_end)
        for r in spark.table("sdi_sessions_test").collect()
    }
    # single availableNow pass: only sessions closed by a later event are
    # emitted (each user's final open session stays in state awaiting
    # timeout) — every emitted session must match the batch result exactly
    assert emitted, "no closed sessions emitted"
    for key, val in emitted.items():
        assert key in batch, f"streaming emitted unknown session {key}"
        assert val == batch[key], f"mismatch for {key}: {val} != {batch[key]}"
    # and the emitted set is exactly the batch sessions minus each user's last
    last_per_user = {}
    for (u, sid) in batch:
        last_per_user[u] = max(last_per_user.get(u, 0), sid)
    expected_closed = {k for k in batch if k[1] != last_per_user[k[0]]}
    assert set(emitted) == expected_closed
