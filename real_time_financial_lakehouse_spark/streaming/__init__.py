"""Structured Streaming medallion: bronze ingest -> silver windowed aggs.

One aggregation code path (operators/silver.py) runs in both batch and
streaming mode; this package adds the streaming wrappers: sources,
watermarks, foreachBatch sinks, checkpoints, triggers.
"""
