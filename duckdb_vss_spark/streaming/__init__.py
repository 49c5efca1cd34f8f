"""Structured Streaming surface (north-star extension beyond duckdb-vss
parity — the reference has no streams, SURVEY.md §2 "Not present").

Design (idiomatic Spark): streams are declared with ``readStream`` over a
file-source directory, transformed with the SAME column expressions the
batch operators use (distance functions, text functions), and aggregated
with watermarked event-time windows. Custom stateful logic goes through
``applyInPandasWithState`` (Arrow-batched, partitioned by key — the
Spark-native analog of a custom stateful operator).

Every op here is paired with a batch twin so tests (and the driver's duckdb
oracle) can check the streaming result against the equivalent batch query:
with ``trigger(availableNow=True)`` a single pass sees all data, so the
streaming result must EQUAL the batch result — watermarks only drop data
across multiple triggers.
"""

from .ops import (  # noqa: F401
    events_schema,
    read_events_stream,
    windowed_counts,
    stream_dedup_counts,
    sessionize,
    running_totals_stateful,
    score_vector_stream,
    stream_interval_join,
    stream_index_insert,
    stream_crawl_ingest,
    stream_warc_ingest,
    stream_audio_curate,
    stream_image_curate,
    stream_image_text_curate,
    stream_video_curate,
    stream_curate,
    stream_knn_join,
    run_to_memory,
)
