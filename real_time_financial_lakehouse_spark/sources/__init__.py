"""Custom data sources (Spark 4 Python DataSource API).

The reference ingests from Kafka (consumer_lake.py:37-42); no broker or
Kafka jar exists in this sandbox, so the connector LAYER is demonstrated
with a real custom source instead: ``rtfl_ticks`` implements both the
batch reader (partitioned, executor-side generation) and the streaming
reader (offset management, exactly-once micro-batch planning) against a
deterministic tick feed that a DuckDB oracle can recompute row for row.
Swapping in a real broker changes the read() body, not the plumbing.
"""

from .jsonl_sink import JsonlDataSource, read_manifested, register_jsonl_sink
from .tick_source import TickDataSource, register_tick_source

__all__ = [
    "JsonlDataSource",
    "TickDataSource",
    "read_manifested",
    "register_jsonl_sink",
    "register_tick_source",
]
