"""DuckDB-oracle differential harness (SURVEY section 5, strategy 1).

The driver compares each ``queries()`` entry against its ``oracle_sql()``
twin at sf=0.01 (row-count + schema + order-insensitive value hash).  This
module replicates that comparison locally so every operator is verified
before the driver ever sees it.  Comparison is *exact* after normalization
(floats stringified at full repr) -- queries are responsible for rounding
any aggregate whose bit pattern could legitimately differ between a
distributed Spark plan and a single-node DuckDB run.
"""

from __future__ import annotations

import math
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .catalog import TABLE_NAMES

def run_oracle(sql: str, sf_dir: str):
    """Run oracle SQL in DuckDB with the fixture tables as views, the way
    the driver does. Returns a pandas DataFrame."""
    import duckdb

    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetchdf()

def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return repr(v)
    # pandas Timestamp / datetime / date -> ISO string
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.floating):
            return _norm_cell(float(v))
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.ndarray):
            return tuple(_norm_cell(x) for x in v.tolist())
        if v is getattr(np, "nan", object()):
            return None
    except ImportError:
        pass
    return v

def normalize(pdf) -> list[tuple]:
    """Sort columns by name, normalize cells, return a sorted row multiset."""
    cols = sorted(pdf.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)]
    return sorted(rows, key=repr)

_DTYPE_CLASSES = (
    ("datetime", "ts"),
    ("int", "int"),
    ("uint", "int"),
    ("float", "float"),
    ("double", "float"),
    ("bool", "bool"),
)

def _dtype_class(dtype) -> str:
    name = str(dtype).lower()
    for needle, cls in _DTYPE_CLASSES:
        if needle in name:
            return cls
    return "obj"  # strings, lists, decimals -- value compare covers these

def compare_frames(spark_pdf, oracle_pdf) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"schema mismatch: spark={s_cols} oracle={o_cols}")
        return problems
    # dtype drift check: a bigint-vs-double drift can repr identically
    # after cell normalization, so compare normalized dtype classes too.
    # int vs float is only tolerated when the column is nullable in
    # practice (pandas upcasts nullable ints to float64/object, and which
    # side upcasts depends on the engine, not the query).
    for c in s_cols:
        s_cls, o_cls = _dtype_class(spark_pdf[c].dtype), _dtype_class(oracle_pdf[c].dtype)
        if s_cls == o_cls or "obj" in (s_cls, o_cls):
            continue
        nullable = bool(spark_pdf[c].isna().any() or oracle_pdf[c].isna().any())
        if {s_cls, o_cls} == {"int", "float"} and nullable:
            continue
        problems.append(f"dtype mismatch on {c}: spark={spark_pdf[c].dtype} oracle={oracle_pdf[c].dtype}")
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_rows, o_rows = normalize(spark_pdf), normalize(oracle_pdf)
    if s_rows != o_rows:
        diff_s = [r for r in s_rows if r not in set(o_rows)][:3]
        diff_o = [r for r in o_rows if r not in set(s_rows)][:3]
        problems.append(f"value mismatch (cols={s_cols}): spark-only={diff_s} oracle-only={diff_o}")
    return problems

def check_query(
    spark: SparkSession, query_fn, sql: str, sf_dir: str
) -> list[str]:
    spark_df: DataFrame = query_fn(spark, sf_dir)
    return compare_frames(spark_df.toPandas(), run_oracle(sql, sf_dir))
