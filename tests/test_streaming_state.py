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


def test_stream_minhash_bands_byte_equal_to_batch(spark):
    """The map-only streaming signature path must produce EXACTLY the batch
    operator's (doc, band, signature) rows — stream and batch stages of one
    pipeline have to agree on what a bucket is."""
    from scalable_data_integration_with_llms_spark.operators.dedup import (
        minhash_signatures, word_shingles,
    )
    from scalable_data_integration_with_llms_spark.sources.readers import load_table
    from scalable_data_integration_with_llms_spark.streaming.near_dup_gate import (
        stream_minhash_bands,
    )

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = sorted(map(tuple, stream_minhash_bands(d).collect()))
    want = sorted(
        map(tuple, minhash_signatures(word_shingles(d, "doc_id", "text", n=3)).collect())
    )
    assert got == want and len(got) > 0


def test_near_dup_gate_first_wins(spark):
    """Gate semantics on the drained stream: the minimum doc of every bucket
    is never flagged, any doc sharing a bucket with a smaller one is flagged
    in exactly its colliding bands, and planted near-dup pairs collide."""
    from scalable_data_integration_with_llms_spark.queries import QUERIES
    from scalable_data_integration_with_llms_spark.sources.readers import load_table
    from scalable_data_integration_with_llms_spark.streaming.near_dup_gate import (
        stream_minhash_bands,
    )

    sf = "/root/testdata/sf0.001"
    verdicts = {r.doc_id: (r.n_dup_bands, r.admitted)
                for r in QUERIES["q_stream_near_dup_gate"](spark, sf).collect()}
    assert all((n == 0) == adm for n, adm in verdicts.values())

    # independent batch recomputation of expected dup-band counts
    buckets: dict = {}
    d = load_table(spark, sf, "documents")
    for r in stream_minhash_bands(d).collect():
        buckets.setdefault((r.band, r.signature), []).append(r.doc)
    expect: dict = {doc: 0 for doc in verdicts}
    for docs in buckets.values():
        m = min(docs)
        for doc in docs:
            if doc > m:
                expect[doc] += 1
    assert verdicts == {doc: (n, n == 0) for doc, n in expect.items()}
    assert any(n > 0 for n, _a in verdicts.values())  # planted dups exist
