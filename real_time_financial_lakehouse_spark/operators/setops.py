"""Set operations and sorts/limits (SURVEY sections 2.5, 2.6).

The reference's only set op is a union-all concat of per-file pandas frames
(dashboard.py:42); its "tail-N" freshness hack reads the last 20 parquet
*files* (dashboard.py:37) -- a correctness bug at scale (file order is not
time order, and it bypasses the Delta log).  We replace it with a true
top-k by event time: ``ORDER BY ts DESC LIMIT n``, which Spark executes as
TakeOrderedAndProject -- each partition keeps a local k-heap and the driver
merges k*partitions rows, so no global sort materializes even at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def union_all(*dfs: DataFrame) -> DataFrame:
    """U1: union-all by column name (dashboard.py:42 pd.concat)."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out

def tail_n_by_time(df: DataFrame, n: int, time_col: str = "ts", tiebreak: str = "event_id") -> DataFrame:
    """O3: latest-n rows by event time with a deterministic tiebreak
    (replaces the dashboard's last-20-files hack, dashboard.py:37)."""
    return df.orderBy(F.col(time_col).desc(), F.col(tiebreak).desc()).limit(n)

def distinct_pairs(events: DataFrame) -> DataFrame:
    """DISTINCT projection (engine extension; absent from the reference):
    one shuffle on the pair key with map-side partial dedup."""
    return events.select("user_id", "event_type").distinct().orderBy("user_id", "event_type")

def users_intersect(events: DataFrame, type_a: str, type_b: str) -> DataFrame:
    """INTERSECT: users who performed BOTH event types.  Spark plans this
    as an aggregate + semi-join on the key -- keys-only shuffle."""
    a = events.filter(F.col("event_type") == type_a).select("user_id")
    b = events.filter(F.col("event_type") == type_b).select("user_id")
    return a.intersect(b).orderBy("user_id")

def users_except(events: DataFrame, type_a: str, type_b: str) -> DataFrame:
    """EXCEPT: users who performed type_a but never type_b (anti-join
    shape)."""
    a = events.filter(F.col("event_type") == type_a).select("user_id")
    b = events.filter(F.col("event_type") == type_b).select("user_id")
    return a.subtract(b).orderBy("user_id")
