"""Grouped-map pandas operators (``applyInPandas``).

The reference has no UDFs at all (SURVEY section 2.10); the engine keeps
its core UDF-free and uses Arrow-batched grouped-map pandas ONLY where a
per-group computation genuinely doesn't decompose into built-in
aggregates + windows.  ``user_zscores`` is the canonical shape: the
whole group must be seen twice (once for moments, once to emit a row per
input row).  It *could* be done with two window functions -- the point
here is exercising the applyInPandas path itself (Arrow batch transfer,
group re-partitioning, pandas kernel) with an exact SQL oracle, so the
same plumbing is trusted where no window-function equivalent exists.

Scale: applyInPandas shuffles on the grouping key (one exchange) and
streams each group through a Python worker as Arrow batches.  Groups
must fit in worker memory -- true for per-user / per-symbol groups, NOT
for global ones; a group key with 100 GB of rows needs the window-
function formulation instead.  Arithmetic is float64 in pandas and in
the JVM alike; the quantization grid (1e-6) absorbs summation-order
differences.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZSCORE_SCHEMA = "event_id bigint, user_id bigint, value double, z double"

ZSCORE_BUCKETS = 64

def _zscore_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    # One pandas call per BUCKET of users, with the per-user moments
    # computed by a vectorized groupby().transform inside the kernel.
    # Grouping applyInPandas directly on user_id costs one Python call +
    # one Arrow batch per user (~5 ms each -- measured 7 s for ~1.5 k
    # users); bucketing amortizes that to |buckets| calls.
    g = pdf.groupby("user_id")["value"]
    mu = g.transform("mean")
    sd = g.transform("std", ddof=0)  # population, = stddev_pop; cython path
    with np.errstate(invalid="ignore", divide="ignore"):
        z = np.floor((pdf["value"] - mu) / sd * 1e6 + 0.5) / 1e6
    z = z.where((sd != 0.0) & sd.notna(), other=np.nan)
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "user_id": pdf["user_id"],
            "value": pdf["value"],
            "z": z,
        }
    )

def user_zscores(events: DataFrame) -> DataFrame:
    """Per-user z-score of event values via grouped-map pandas,
    bucket-grouped: the applyInPandas key is hash(user_id) % B, so each
    Arrow batch carries MANY whole user groups and the per-user math runs
    as a vectorized pandas groupby inside the kernel.  Every user's rows
    still land in exactly one bucket, so semantics equal per-user
    grouping.  Single-row users (sd == 0) yield NULL, matching the SQL
    convention for 0/0.

    Scale: B fixed at 64 here; on a real cluster set B ~ 4x executor
    cores so buckets stay balanced and each Arrow batch stays in worker
    memory."""
    bucketed = events.select("event_id", "user_id", "value").withColumn(
        "bucket", F.pmod(F.hash("user_id"), F.lit(ZSCORE_BUCKETS))
    )
    return (
        bucketed.groupBy("bucket")
        .applyInPandas(_zscore_bucket, schema=ZSCORE_SCHEMA)
        .orderBy("event_id")
    )

# ---------------------------------------------------------------------------
# §2.10 completion: pandas UDAF + Python UDTF surfaces
# ---------------------------------------------------------------------------

# Plain module-level kernels (no pandas_udf decoration at import time:
# UDTF workers re-import this module, and constructing a pandas UDF there
# fails -- the wrapping happens inside the operator functions instead).

def _wavg_kernel(v: pd.Series, w: pd.Series) -> float:
    # Arrow grouped-aggregate kernel: whole group's columns arrive as
    # pandas Series, returns one scalar per group.
    return float((v * w).sum() / w.sum())

def _count_kernel(v: pd.Series) -> int:
    return len(v)

def weighted_symbol_price(events: DataFrame) -> DataFrame:
    """Weighted average price per symbol via a grouped-aggregate pandas
    UDAF -- the SURVEY §2.10 UDAF surface, pinned with an exact SQL twin
    (``sum(value*w)/sum(w)`` with deterministic weights ``event_id%10+1``)
    the same way ``user_zscores`` pins applyInPandas.

    Scale: grouped-agg pandas UDFs do NO map-side partial aggregation --
    every group's full columns ship through Arrow to a Python worker.
    That is acceptable for per-symbol/per-user group sizes and dead wrong
    for near-global groups; the built-in ratio-of-sums form (the oracle
    twin) is the 100 TB default, and this query exists to keep the UDAF
    plumbing exact where a custom kernel (no SQL equivalent) would need
    it."""
    from pyspark.sql.functions import pandas_udf

    from ..functions.numeric import qround

    # All aggregates in one agg() must be pandas UDAFs (Spark rejects
    # mixing grouped-agg pandas UDFs with built-in aggregates), so the
    # row count is a pandas kernel too.
    wavg = pandas_udf(_wavg_kernel, "double")
    cnt = pandas_udf(_count_kernel, "long")
    w = ((F.col("event_id") % 10) + 1).cast("double")
    return (
        events.select(F.col("event_type").alias("symbol"), "value", w.alias("w"))
        .groupBy("symbol")
        .agg(
            qround(wavg("value", "w"), 6).alias("weighted_price"),
            cnt("value").alias("n_events"),
        )
        .orderBy("symbol")
    )

def term_positions(documents: DataFrame) -> DataFrame:
    """Positional term expansion, JVM built-ins only:
    ``posexplode(split(norm_text, ' '))`` -- the DEFAULT formulation and
    the one to copy.  Pure generate-side narrow transform: no shuffle
    until the final presentation sort, output proportional to input,
    whole-stage-codegen'd end to end.  ``term_positions_udtf`` computes
    the identical result through a Python UDTF and exists to cover the
    §2.10 table-function API surface; this version is what a 100 TB
    corpus should run."""
    from ..functions.hashing import normalize_text

    norm = documents.select(
        "doc_id", normalize_text(F.col("text")).alias("norm_text")
    ).filter(F.col("norm_text").isNotNull() & (F.col("norm_text") != ""))
    return (
        norm.select(
            "doc_id", F.posexplode(F.split("norm_text", " ")).alias("p", "term")
        )
        .select(
            "doc_id",
            (F.col("p") + 1).cast("int").alias("pos"),
            "term",
            F.length("term").cast("int").alias("term_len"),
        )
        .orderBy("doc_id", "pos")
    )

# Python UDTF (Arrow-batched): one input row -> one output row per term.
TERM_POSITIONS_SCHEMA = "doc_id bigint, pos int, term string, term_len int"

class _TermPositions:
    def eval(self, doc_id, norm_text):
        # Input text is pre-normalized JVM-side (functions.hashing
        # .normalize_text) so Python string semantics never leak into
        # oracle-compared values; the kernel only splits and enumerates.
        if norm_text is None or norm_text == "":
            return
        for i, t in enumerate(norm_text.split(" ")):
            yield doc_id, i + 1, t, len(t)

def term_positions_udtf(spark, documents: DataFrame) -> DataFrame:
    """Positional term expansion via a Python UDTF with a LATERAL join --
    the SURVEY §2.10 UDTF surface.  Covers the table-function API shape
    (per-row generator, declared schema, SQL LATERAL correlation).  The
    explicit ``_udtf`` suffix marks this as the SLOW PATH kept for API
    coverage -- ``term_positions`` (posexplode built-ins) is the default
    a user should copy.

    Scale: a Python row generator is the slow path; the JVM-built-in twin
    is ``posexplode(split(norm_text, ' '))`` and is what a 100 TB corpus
    should run (the oracle SQL is exactly that form).  The UDTF here is
    Arrow-batched (``useArrow=True``) so the boundary cost is per-batch,
    not per-row, and the expansion is embarrassingly parallel -- no
    shuffle, output proportional to input."""
    from pyspark.sql.functions import udtf

    from ..functions.hashing import normalize_text

    tp = udtf(_TermPositions, returnType=TERM_POSITIONS_SCHEMA, useArrow=True)
    spark.udtf.register("rtfl_term_positions", tp)
    documents.select(
        "doc_id", normalize_text(F.col("text")).alias("norm_text")
    ).createOrReplaceTempView("rtfl_term_positions_src")
    return spark.sql(
        """
        SELECT t.doc_id, t.pos, t.term, t.term_len
        FROM rtfl_term_positions_src d,
             LATERAL rtfl_term_positions(d.doc_id, d.norm_text) t
        ORDER BY t.doc_id, t.pos
        """
    )
