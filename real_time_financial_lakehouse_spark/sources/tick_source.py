"""``rtfl_ticks``: a custom Spark 4 Python DataSource for a synthetic
market-tick feed -- the sandbox stand-in for the reference's Kafka
consumer (consumer_lake.py:37-42), built on the real connector API
surface (``pyspark.sql.datasource``) instead of a file-glob shim.

Batch path: ``DataSourceReader.partitions()`` splits the tick range into
contiguous chunks and every executor generates ITS OWN chunk inside
``read(partition)`` -- no driver-side materialization, the same
distributed-generation discipline a JDBC/Kafka connector uses for
offset ranges.

Streaming path: ``SimpleDataSourceStreamReader`` with genuine offset
semantics -- ``initialOffset`` / ``read(start)`` plan each micro-batch
as a [start, end) tick range and Spark checkpoints the offsets, giving
exactly-once replay on restart; the feed is bounded by ``n_ticks`` so
``availableNow`` drains it deterministically.

Every generated column is pure md5 arithmetic on the tick index
(``functions.hashing.md5_long`` semantics), so a DuckDB oracle
recomputes the whole feed from ``generate_series`` -- the custom SOURCE
itself is hash-checkable, not just the queries over it.
"""

from __future__ import annotations

import datetime as dt
import hashlib
from collections.abc import Iterator

TICK_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
_BASE_TS = dt.datetime(2024, 1, 1, 0, 0, 0)


def _tick_row(i: int) -> tuple:
    """Deterministic tick ``i`` -- MUST stay in lockstep with the DuckDB
    oracle SQL in registry.py (md5_long semantics: first 15 hex chars of
    md5 as a 60-bit int)."""
    h = int(hashlib.md5(f"tick:{i}".encode()).hexdigest()[:15], 16)
    return (
        i,
        _BASE_TS + dt.timedelta(seconds=i),
        h % 1000,
        _EVENT_TYPES[h % 5],
        (h % 1_000_000) / 100.0,
        '{"k": %d}' % (h % 4 + 1),
    )


# oracle twin of _tick_row, parameterized on the DuckDB index expression
def tick_oracle_sql(n_ticks: int) -> str:
    """DuckDB SQL producing the identical feed as a relation ``ticks``."""
    return f"""
    SELECT i::BIGINT AS event_id,
           TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 1 SECOND AS ts,
           (h % 1000)::BIGINT AS user_id,
           ['click', 'error', 'purchase', 'signup', 'view'][(h % 5) + 1]
               AS event_type,
           (h % 1000000) / 100.0 AS value,
           '{{"k": ' || (h % 4 + 1) || '}}' AS props
    FROM (
        SELECT i, ('0x' || substr(md5('tick:' || i), 1, 15))::BIGINT AS h
        FROM (SELECT unnest(generate_series(0, {n_ticks - 1})) AS i)
    )
    """


try:  # pragma: no cover - import surface depends on the Spark build
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    _HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceReader = object  # type: ignore[assignment,misc]
    SimpleDataSourceStreamReader = object  # type: ignore[assignment,misc]
    InputPartition = None  # type: ignore[assignment]
    _HAVE_DATASOURCE_API = False


class _RangePartition(InputPartition if _HAVE_DATASOURCE_API else object):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class _TickBatchReader(DataSourceReader):
    """Partitioned batch read: each partition generates its contiguous
    tick range executor-side (the offset-range split a Kafka/JDBC
    connector performs)."""

    def __init__(self, options: dict) -> None:
        self.n_ticks = int(options.get("n_ticks", 10_000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):  # noqa: D102 - API contract
        n, p = self.n_ticks, max(1, self.n_partitions)
        if n <= 0:  # empty feed: no partitions, not a range() crash
            return [_RangePartition(0, 0)]
        step = -(-n // p)
        return [
            _RangePartition(lo, min(lo + step, n)) for lo in range(0, n, step)
        ]

    def read(self, partition) -> Iterator[tuple]:  # noqa: D102
        for i in range(partition.start, partition.end):
            yield _tick_row(i)


class _TickStreamReader(SimpleDataSourceStreamReader):
    """Offset-managed streaming read: each micro-batch is the
    [start, end) tick range; Spark checkpoints the returned offsets, so
    a restarted query replays exactly the uncommitted range.  The feed
    is bounded at ``n_ticks`` -- availableNow drains to the end and
    stops."""

    def __init__(self, options: dict) -> None:
        self.n_ticks = int(options.get("n_ticks", 10_000))
        self.batch_size = int(options.get("batch_size", 2_500))

    def initialOffset(self) -> dict:  # noqa: D102, N802 - API contract
        return {"tick": 0}

    def read(self, start: dict):  # noqa: D102
        lo = int(start["tick"])
        hi = min(lo + self.batch_size, self.n_ticks)
        rows = [_tick_row(i) for i in range(lo, hi)]
        return iter(rows), {"tick": hi}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: D102, N802
        # exact replay of a checkpointed range after restart
        return iter([_tick_row(i) for i in range(int(start["tick"]), int(end["tick"]))])


class TickDataSource(DataSource):
    """``spark.read.format("rtfl_ticks")`` / ``spark.readStream.format(
    "rtfl_ticks")`` -- options: n_ticks, n_partitions (batch),
    batch_size (streaming)."""

    @classmethod
    def name(cls) -> str:  # noqa: D102
        return "rtfl_ticks"

    def schema(self) -> str:  # noqa: D102
        return TICK_SCHEMA

    def reader(self, schema) -> _TickBatchReader:  # noqa: D102
        return _TickBatchReader(self.options)

    def simpleStreamReader(self, schema) -> _TickStreamReader:  # noqa: D102, N802
        return _TickStreamReader(self.options)


def register_tick_source(spark) -> None:
    """Idempotent per-SESSION registration of the custom source (Python
    data sources register on the SparkSession, not the context -- a
    ``newSession()`` child needs its own registration).  The
    already-done marker lives ON the session object (an id()-keyed
    global set could go stale when a GC'd session's id is reused)."""
    if not _HAVE_DATASOURCE_API:  # pragma: no cover
        raise NotImplementedError(
            "this Spark build lacks the Python DataSource API"
        )
    if getattr(spark, "_rtfl_ticks_registered", False):
        return
    try:
        spark.dataSource.register(TickDataSource)
    except Exception as ex:  # noqa: BLE001
        # the registry is shared wider than one session in some builds
        # (DATA_SOURCE_ALREADY_EXISTS from a sibling session is fine)
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(ex):
            raise
    spark._rtfl_ticks_registered = True
