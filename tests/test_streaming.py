"""Structured Streaming: the streaming windowed agg equals its batch twin."""

from __future__ import annotations


def test_streaming_counts_match_batch(spark, sf_dir):
    from knn_using_hadoop_spark.contract import q_events_windowed_agg
    from knn_using_hadoop_spark.streaming.events import (
        run_stream_to_memory,
        streaming_event_counts,
    )

    agg = streaming_event_counts(spark, f"{sf_dir}/events.parquet")
    assert agg.isStreaming
    got = run_stream_to_memory(agg, spark, "t_stream_counts")
    stream_rows = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in got.collect()
    }
    batch_rows = {
        (r.hour_start, r.event_type): (r.n_events, r.total_value)
        for r in q_events_windowed_agg(spark, sf_dir).collect()
    }
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def test_streaming_sessionize_matches_batch(spark, sf_dir):
    from knn_using_hadoop_spark.contract import q_sessionization
    from knn_using_hadoop_spark.streaming.events import (
        run_stream_to_memory,
        streaming_sessionize,
    )

    agg = streaming_sessionize(spark, f"{sf_dir}/events.parquet")
    got = run_stream_to_memory(agg, spark, "t_stream_sessions")
    stream_rows = {
        (r.user_id, r.session_start): r.n_events for r in got.collect()
    }
    batch_rows = {
        (r.user_id, r.session_start): r.n_events
        for r in q_sessionization(spark, sf_dir).collect()
    }
    assert stream_rows == batch_rows


def test_multimodal_plumbing(spark, sf_dir):
    import pytest

    from knn_using_hadoop_spark.operators import multimodal as mm
    from knn_using_hadoop_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir)
    wp = mm.attach_binary(docs)
    stats = mm.binary_stats(wp)
    r = stats.orderBy("doc_id").first()
    txt = docs.orderBy("doc_id").first().text
    assert r.n_bytes == len(txt.encode())
    assert r.byte_sum == sum(txt.encode())
    assert r.head8 == txt[:8]

    frames = mm.frame_sample(wp).collect()
    assert all(f.frame_offset == f.frame_idx * 100 for f in frames)
    assert all(0 <= f.frame_idx < 5 for f in frames)

    # tiny payload -> zero frames, not an error
    tiny = mm.attach_binary(
        spark.createDataFrame([(9, "short")], "doc_id long, text string")
    )
    assert mm.frame_sample(tiny).count() == 0

    with pytest.raises(NotImplementedError, match="codecs"):
        mm.decode_media(wp, "image")
