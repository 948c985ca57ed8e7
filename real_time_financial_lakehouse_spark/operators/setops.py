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
