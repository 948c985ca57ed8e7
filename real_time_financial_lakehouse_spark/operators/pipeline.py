"""Training-data pipeline operators: sampling, normalization,
contamination (engine extension).

The ops a corpus-building pipeline runs between ingestion and training,
beyond dedup/quality (operators/dedup.py, operators/text.py):

* **Deterministic stratified sampling** -- per-stratum Bernoulli keep
  decided by an md5 hash of the row key, not ``rand()``: reproducible
  across runs, engines, and partitionings, and purely row-local (zero
  shuffle at any scale).
* **Deterministic per-group head sampling** -- "give me k docs per
  language, stable under re-runs": the md5 hash acts as a frozen random
  permutation.  Implemented two-phase (salted local top-k, then global
  top-k per group) so one giant stratum never funnels through a single
  window task.
* **Corpus normalization** -- the canonical text form every downstream
  hash/fingerprint op assumes (functions/hashing.normalize_text), as a
  queryable projection with change accounting.
* **Contamination check** -- n-gram overlap of a holdout split against
  the training split (the benchmark-leakage screen): distinct shingles
  per side, one equi-join on the shingle, per-doc overlap ratio.

All hashing is md5-based (functions/hashing.py) so every operator has an
exact DuckDB oracle twin.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long, shingles_expr
from ..functions.numeric import qround
from .dedup import _spread

# pack_sequences defaults, shared verbatim with the SQL twin
PACK_BUDGET = 256
PACK_BUCKETS = 16

# mixture_sample target proportions (the domain-mixing recipe input); the
# fixture's five languages, weighted the way a Pile-style mix sheet would
MIXTURE_TARGETS = (
    ("de", 0.15),
    ("en", 0.40),
    ("es", 0.15),
    ("fr", 0.15),
    ("zh", 0.15),
)

def stratified_sample(documents: DataFrame, pct: int = 20) -> DataFrame:
    """Keep ~pct% of each language stratum, deterministically.

    The keep decision is ``md5(lang:doc_id) % 100 < pct`` -- row-local,
    reproducible, and independent of partitioning, so at 100 TB this is
    a pure scan-side filter: no shuffle, no rand() seed plumbing, and
    re-running yields the identical sample (the property that matters
    for training-data lineage)."""
    bucket = md5_long(F.concat_ws(":", F.col("lang"), F.col("doc_id"))) % 100
    return (
        documents.filter(bucket < pct)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )

def grouped_head_sample(documents: DataFrame, k: int = 25, salts: int = 8) -> DataFrame:
    """Deterministic k-per-group sample: the md5 hash of doc_id is a
    frozen uniform permutation, and the k smallest hashes per language
    are the sample -- a reservoir sample with the randomness made
    reproducible.

    Scale: a single window over ``partition by lang`` funnels every row
    of a giant stratum through one task.  Instead: phase 1 takes the
    local top-k within (lang, hash-salt) buckets -- ``salts`` parallel
    tasks per stratum, each emitting <= k rows -- and phase 2 re-ranks
    the <= salts*k survivors per stratum.  Both phases are the same
    window expression; the result is exactly the global top-k because
    every global winner wins its salt bucket.  The SQL twin is the
    single-window form (same result, the fixture proves equivalence)."""
    h = md5_long(F.col("doc_id").cast("string"))
    salted = documents.select(
        "doc_id", "lang", h.alias("h"), (h % salts).alias("salt")
    )
    w_local = Window.partitionBy("lang", "salt").orderBy("h", "doc_id")
    survivors = (
        salted.withColumn("lr", F.row_number().over(w_local))
        .filter(F.col("lr") <= k)
        .drop("lr", "salt")
    )
    w_global = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w_global))
        .filter(F.col("sample_rank") <= k)
        .select("lang", "sample_rank", "doc_id")
        .orderBy("lang", "sample_rank")
    )

def normalize_corpus(documents: DataFrame) -> DataFrame:
    """Canonical text normalization as a queryable projection: lowercase,
    trim, collapse whitespace runs (the exact form every md5 fingerprint
    in the dedup ladder hashes).  Reports per-doc change accounting so a
    pipeline can quantify how dirty a source is.

    Scale: pure row-local projection -- no shuffle; the regexes are JVM
    codegen, no Python."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return documents.select(
        "doc_id",
        norm.alias("norm_text"),
        (norm != F.col("text")).alias("changed"),
        (F.length("text") - F.length(norm)).alias("n_chars_removed"),
    ).orderBy("doc_id")

def pack_sequences(
    documents: DataFrame, budget: int = PACK_BUDGET, n_buckets: int = PACK_BUCKETS
) -> DataFrame:
    """Greedy sequence packing: assign each document to a training
    sequence so consecutive docs fill a ``budget``-token context window
    (first-fit in doc_id order; a doc that would overflow starts the next
    sequence, and an over-budget doc gets a sequence to itself).  The
    sequence-building step every pre-training pipeline runs after
    filtering -- packing efficiency decides how many FLOPs hit padding.

    Packing is inherently sequential, so the operator makes the
    parallelism unit explicit: docs are sharded into ``n_buckets``
    deterministic md5 buckets and packed independently per bucket
    (bucket = shard = one task).  At 100 TB you raise ``n_buckets`` to
    O(cores) and each shard streams through one Arrow-batched
    applyInPandas pass -- per-task memory is one shard's (doc_id,
    n_tokens) pairs, 16 bytes/doc, NOT the text (token counts are
    computed JVM-side before the Python boundary and only the two int
    columns cross it).  The DuckDB twin replays the same greedy fold as
    a recursive CTE, so the assignment is engine-checked, not just
    shape-checked."""
    toks = documents.select(
        "doc_id",
        (md5_long(F.col("doc_id").cast("string")) % n_buckets).alias("bucket"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_ids, seq, fill = [], 0, None
        for t in pdf["n_tokens"]:
            if fill is None:
                fill = t
            elif fill + t <= budget:
                fill += t
            else:
                seq, fill = seq + 1, t
            seq_ids.append(seq)
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        return pdf[["doc_id", "bucket", "seq_id", "n_tokens"]]

    return (
        toks.groupBy("bucket")
        .applyInPandas(pack, "doc_id long, bucket long, seq_id long, n_tokens int")
        .orderBy("doc_id")
    )

def mixture_sample(
    documents: DataFrame, targets=MIXTURE_TARGETS
) -> DataFrame:
    """Domain-mixing resample: scale the corpus to target per-language
    proportions by downsampling every stratum to the largest total the
    targets allow (N* = min over langs of count/weight), keeping exactly
    floor(weight * N*) docs per language -- chosen deterministically as
    the smallest md5 hashes, so the sample is stable across runs and
    engines.  Returns the per-language audit sheet (counts, targets,
    achieved fractions).

    Scale: stratum counts are one partial-aggregable groupBy; the
    per-lang quotas are a 5-row broadcast joined back to the ranked
    docs.  The rank window partitions by lang -- for strata that dwarf a
    task, the salted two-phase top-k of ``grouped_head_sample`` drops in
    unchanged (quota as k); the single-window form keeps the oracle twin
    identical.  All float math (N*, quotas) is the same IEEE-double op
    sequence on both engines, so floor() boundaries agree exactly."""
    spark = documents.sparkSession
    wdf = spark.createDataFrame(list(targets), "lang string, target_w double")
    counts = documents.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    j = counts.join(F.broadcast(wdf), "lang")
    nstar = j.agg(
        F.min(F.col("n_docs").cast("double") / F.col("target_w")).alias("ns")
    )
    quotas = j.crossJoin(F.broadcast(nstar)).select(
        "lang",
        "n_docs",
        "target_w",
        F.floor(F.col("target_w") * F.col("ns")).cast("long").alias("n_target"),
    )
    h = md5_long(F.concat_ws(":", F.lit("mix"), F.col("doc_id")))
    ranked = documents.select("doc_id", "lang", h.alias("h")).withColumn(
        "r", F.row_number().over(Window.partitionBy("lang").orderBy("h", "doc_id"))
    )
    kept = (
        ranked.join(F.broadcast(quotas.select("lang", "n_target")), "lang")
        .filter(F.col("r") <= F.col("n_target"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    total = F.sum("n_kept").over(Window.partitionBy())  # 5-row window: safe
    return (
        quotas.join(kept, "lang")
        .select(
            "lang",
            "n_docs",
            "n_kept",
            "target_w",
            qround(F.col("n_kept").cast("double") / total).alias("achieved_frac"),
        )
        .orderBy("lang")
    )

def contamination_check(
    documents: DataFrame, shingle_n: int = 3, holdout_mod: int = 10
) -> DataFrame:
    """Benchmark-leakage screen: for each holdout doc (doc_id %
    holdout_mod == 0), the fraction of its distinct word n-grams that
    appear anywhere in the training split.

    Scale: both sides reduce to DISTINCT shingles before the join --
    train side globally (one shuffle, map-side partial distinct), eval
    side per-doc (array_distinct, row-local).  Shingles are packed to a
    60-bit md5 long BEFORE the shuffle, so the distinct + join move and
    compare 8-byte keys instead of 20-40-byte strings (a wash on
    local[32] where md5 cost offsets it, but the byte reduction is what
    matters when the shuffle crosses a real network; collision odds
    ~1e-7 at 10^6 shingles, and the oracle packs identically so parity
    is exact either way).  The join is a LEFT join
    on the hash (uniform md5 domain, no hot key by construction),
    followed by one groupBy on the eval doc_id.  No pair expansion
    anywhere, so no bucket cap is needed.  Docs with fewer than
    ``shingle_n`` words have no shingles and drop out on both engines
    identically."""
    sh = F.expr(shingles_expr("text", shingle_n))
    is_holdout = F.col("doc_id") % holdout_mod == 0
    # CPU-bound shingling must not inherit a single-file scan's one
    # partition -- same _spread rationale as the dedup ladder (measured
    # 3.5 s -> 0.4 s for the shingle pass at sf0.1 on local[32])
    documents = _spread(documents.select("doc_id", "text"))
    eval_sh = (
        documents.filter(is_holdout)
        .select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
        .select("doc_id", md5_long(F.col("shingle")).alias("shingle_h"))
    )
    train_sh = (
        documents.filter(~is_holdout)
        .select(F.explode(sh).alias("shingle"))
        .select(md5_long(F.col("shingle")).alias("t_shingle_h"))
        .distinct()
    )
    hits = eval_sh.join(
        train_sh, eval_sh.shingle_h == train_sh.t_shingle_h, "left"
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("t_shingle_h").alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            qround(F.col("n_contaminated") / F.col("n_shingles"), 6).alias("contamination"),
        )
        .orderBy("doc_id")
    )

def chunk_documents(documents: DataFrame, width: int = 200, stride: int = 150) -> DataFrame:
    """Split each document into overlapping character windows -- the
    context-window chunking step every embedding / retrieval / pretraining
    pipeline runs before tokenization.  Chunk i covers
    ``[i*stride, i*stride + width)``; the last chunk is the first one whose
    window reaches the end of the text, so every character lands in at
    least one chunk and consecutive chunks overlap by ``width - stride``.

    Scale: pure projection + explode -- no shuffle, no UDF, and the fan-out
    factor is ~len/stride per doc, so output size is a constant multiple of
    input size regardless of cluster width.  At 100 TB the chunk count per
    task stays proportional to the task's input split; nothing concentrates.
    (Token-budget packing of these chunks is ``pack_sequences``.)"""
    n = F.length("text")
    last_chunk = F.when(n <= width, F.lit(0)).otherwise(
        F.ceil((n - F.lit(width)).cast("double") / F.lit(float(stride)))
    )
    return (
        documents.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), last_chunk.cast("int"))).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            (F.col("chunk_id") * stride + 1).cast("long").alias("char_start"),
            F.expr(f"substr(text, chunk_id * {stride} + 1, {width})").alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text").cast("long"))
        .orderBy("doc_id", "chunk_id")
    )


def token_budget_mixture(documents: DataFrame, budget_frac: float = 0.5) -> DataFrame:
    """Water-filling token-budget allocation across sources: given a
    global token budget (``budget_frac`` of the corpus), every source
    gets ``min(its tokens, L)`` where the water level ``L`` is chosen so
    the allocations sum to the budget -- small sources are taken whole,
    large sources are capped at the common level.  This is the
    mixture-rebalancing step a pretraining recipe runs to stop one
    dominant crawl from swamping the mix.

    The closed form avoids any iteration: sort sources by token count
    ascending, and ``L = max_k (B - cum_{k-1}) / (n - k + 1)`` -- the
    candidate level is increasing while sources are fully consumable and
    decreasing after the crossing point, so the max IS the level.  One
    expression over a window, no loop, identical in the DuckDB twin.

    Scale: the data-sized work is one map-side-combinable groupBy
    (source -> token sums); everything after runs at SOURCE cardinality
    (a handful of rows), so the ordering window and the two broadcast
    joins on single-row totals are metadata-cheap at any corpus size."""
    from ..functions.hashing import normalize_text

    toks = documents.select(
        "source",
        F.size(F.split(normalize_text(F.col("text")), " ")).alias("n_tokens"),
    )
    # source-cardinality lineage cut (a handful of rows): per_src feeds
    # the grand total, the ranked frame and the output -- without it the
    # corpus tokenize+groupBy evaluates once per consumer
    per_src = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("total_tokens")
    ).localCheckpoint(eager=True)
    totals = per_src.agg(
        F.sum("total_tokens").alias("grand"), F.count(F.lit(1)).alias("n_sources")
    )
    j = per_src.crossJoin(F.broadcast(totals))
    # source-cardinality frame: a global (unpartitioned) window is fine
    w_order = Window.orderBy("total_tokens", "source")
    cum_prev = F.coalesce(
        F.sum("total_tokens").over(w_order.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    k = F.row_number().over(w_order)
    budget = F.col("grand") * F.lit(budget_frac)
    lvl = (budget - cum_prev) / (F.col("n_sources") - k + 1)
    ranked = j.withColumn("lvl", lvl)
    level = ranked.agg(F.max("lvl").alias("level"))
    alloc = F.least(F.col("total_tokens").cast("double"), F.col("level"))
    return (
        ranked.crossJoin(F.broadcast(level))
        .select(
            "source",
            "n_docs",
            "total_tokens",
            qround(alloc, 6).alias("alloc_tokens"),
            qround(alloc / F.col("total_tokens"), 6).alias("sample_rate"),
        )
        .orderBy("source")
    )


def winsorize_values(events: DataFrame, lo: float = 0.01, hi: float = 0.99) -> DataFrame:
    """Winsorized clipping summary per symbol: exact (lo, hi) percentile
    fences, the count clipped at each tail, and the post-clip mean --
    the outlier-robust feature-cleaning pass a training pipeline runs
    before normalization (fat-fingered ticks / sensor spikes must not
    set the feature scale).

    Scale: two passes over the values, both partial-agg shuffles on the
    symbol.  The exact ``percentile`` here is the correctness twin; at
    100 TB swap pass one to ``percentile_approx`` (KLL sketch, mergeable,
    one pass no sort) -- the fence moves by the sketch's rank error and
    nothing else changes.  The per-symbol fence table is tiny and
    broadcast back (no shuffle on the second pass's join)."""
    from pyspark.sql.functions import broadcast

    fences = (
        events.groupBy(F.col("event_type").alias("symbol"))
        .agg(
            F.expr(f"percentile(value, {lo})").alias("p_lo"),
            F.expr(f"percentile(value, {hi})").alias("p_hi"),
        )
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p_lo")), F.col("p_hi"))
    return (
        events.select(F.col("event_type").alias("symbol"), "value")
        .join(broadcast(fences), "symbol")
        .groupBy("symbol")
        .agg(
            qround(F.first("p_lo"), 6).alias("p_lo"),
            qround(F.first("p_hi"), 6).alias("p_hi"),
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("value") < F.col("p_lo")).cast("long")).alias("n_clipped_lo"),
            F.sum((F.col("value") > F.col("p_hi")).cast("long")).alias("n_clipped_hi"),
            qround(F.avg(clipped), 6).alias("clipped_mean"),
        )
        .orderBy("symbol")
    )


def boilerplate_strip(
    documents: DataFrame, width: int = 8, min_df: int = 2
) -> DataFrame:
    """Corpus-level boilerplate removal (the CCNet / RefinedWeb line-dedup
    idea): segment each normalized document into non-overlapping
    ``width``-word windows, count each segment's document frequency
    across the WHOLE corpus, drop every segment that appears in
    ``min_df``-or-more distinct documents (navigation chrome, license
    headers, templated footers -- and, in this fixture, the verbatim
    spans shared by near-duplicate docs), and reassemble the surviving
    segments in order.  Emits per-doc accounting so a pipeline can watch
    how much boilerplate each source carries.

    Scale: one groupBy(segment) builds the frequency table with map-side
    partial aggregation (duplicates collapse before the wire), and only
    the segments ABOVE the df threshold survive the filter -- that
    boilerplate list is tiny relative to the corpus (boilerplate is by
    definition repeated), so the removal join is a broadcast LEFT ANTI
    against the exploded segments: the corpus never shuffles for it.
    The reassembly groupBy(doc_id) is the second and last shuffle.  At
    100 TB, join on ``md5_long(seg)`` (8-byte keys) instead of the raw
    segment text to shrink both the frequency table and the wire format;
    a df-capped variant (stop counting a segment past the threshold) is
    the same skip-list idiom ngram_jaccard_pairs uses."""
    text = F.coalesce(F.col("text"), F.lit(""))
    words = F.split(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "), " ")
    nseg = F.greatest(
        F.ceil(F.size(words) / F.lit(float(width))).cast("int"), F.lit(1)
    )
    seg_arr = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * width + 1, F.lit(width))),
    )
    # ONE normalize+segment pass (round-13): the segment branch, the
    # anti-join probe branch and the totals branch each re-ran the
    # regex/split/segment projection from the scan (3x the query's
    # per-doc CPU), and the single-file fixture scan pinned that work to
    # one task -- _spread first (the contamination_check discipline),
    # then a doc-cardinality lineage cut carrying (seg_arr, n_segments);
    # the cut holds segments, i.e. about the normalized text itself,
    # never the exploded rows.
    tokenized = (
        _spread(documents.select("doc_id", "text"))
        .select(
            "doc_id",
            seg_arr.alias("sa"),
            nseg.cast("long").alias("n_segments"),
        )
        .localCheckpoint(eager=True)
    )
    segs = tokenized.select("doc_id", F.posexplode("sa").alias("pos", "seg"))
    boilerplate = (
        segs.groupBy("seg")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("seg")
    )
    kept = segs.join(F.broadcast(boilerplate), "seg", "left_anti")
    reassembled = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda x: x["seg"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = tokenized.select("doc_id", "n_segments")
    return (
        totals.join(reassembled, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            "n_segments",
            (F.col("n_segments") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
                "n_removed"
            ),
        )
        .orderBy("doc_id")
    )


# PII patterns shared by the Spark op and its DuckDB oracle twin: kept to
# syntax valid AND identical in meaning for both Java regex and RE2
# (character classes, bounded repetition -- no lookarounds, no \b).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^ ]+", "<URL>"),
    ("phone", r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}", "<PHONE>"),
    ("longnum", r"[0-9]{6,}", "<NUM>"),
]


def redact_pii(documents: DataFrame) -> DataFrame:
    """PII scrubbing for training corpora: replace emails, URLs, phone
    numbers, and long digit runs (account/SSN-shaped) with typed
    placeholder tokens, with per-category match accounting so a pipeline
    can monitor how much PII each source leaks.  Replacements apply in
    PII_PATTERNS order (email before the digit rules, so a phone inside
    an email is counted once as email); counts are measured against the
    ORIGINAL text per pattern.

    Scale: pure row-local projection -- regexp_replace / regexp_
    extract_all are JVM codegen, no shuffle, no Python; at 100 TB this
    fuses into whatever scan feeds it.  The pattern list is the contract:
    both the Spark expressions and the DuckDB oracle read PII_PATTERNS,
    so adding a category cannot silently diverge the two engines."""
    text = F.coalesce(F.col("text"), F.lit(""))
    clean = text
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("long").alias(
                f"n_{name}"
            )
        )
        clean = F.regexp_replace(clean, pat, repl)
    return documents.select(
        "doc_id",
        clean.alias("clean_text"),
        *counts,
        (F.length(text) - F.length(clean)).cast("long").alias("n_chars_removed"),
    ).orderBy("doc_id")


def corpus_summary(documents: DataFrame) -> DataFrame:
    """The one-row dataset card every corpus release ships: document /
    token / char totals, language and source cardinalities, and the
    exact-duplicate rate (1 - distinct content fingerprints / docs) --
    the first numbers a data audit asks for and the denominators every
    downstream quality metric normalizes by.

    Scale: one scan, one aggregation; the content-hash distinct is a
    countDistinct over 60-bit md5 longs (swap to approx_count_distinct
    at 100 TB, same trade as profile_columns); everything else is
    map-side partial-aggregated sums."""
    from ..functions.hashing import md5_long, normalize_text
    from ..functions.numeric import qround

    toks = F.size(F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"))
    fp = md5_long(normalize_text(F.coalesce(F.col("text"), F.lit(""))))
    return documents.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("total_tokens"),
        F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct(fp).alias("n_distinct_contents"),
        qround(
            F.lit(1.0) - F.countDistinct(fp) / F.count(F.lit(1)), 6
        ).alias("exact_dup_rate"),
    )


def dataset_split_counts(
    documents: DataFrame, train_pct: int = 80, val_pct: int = 10
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent
    md5 bucket (doc_id-keyed, so re-runs and re-shards reproduce the
    same split -- the property random() splits lose), reported as
    per-split doc/token counts and shares.

    Scale: the split is a pure projection (no shuffle, no RNG state);
    the report is one partial-aggregated groupBy over 3 groups.  Keying
    the hash on doc_id rather than content keeps near-duplicate leakage
    detection a SEPARATE concern (contamination_check) instead of
    silently entangling the two."""
    from ..functions.hashing import md5_long
    from ..functions.numeric import qround

    bucket = md5_long(F.concat_ws(":", F.lit("split"), F.col("doc_id"))) % 100
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    toks = F.size(F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"))
    tagged = documents.select(split.alias("split"), toks.alias("n_toks"))
    total = tagged.agg(F.count(F.lit(1)).cast("double").alias("n_total"))
    return (
        tagged.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_toks").alias("n_tokens"))
        .crossJoin(F.broadcast(total))
        .select(
            "split",
            "n_docs",
            "n_tokens",
            qround(F.col("n_docs") / F.col("n_total"), 6).alias("doc_share"),
        )
        .orderBy("split")
    )

def shard_manifest(documents: DataFrame, n_shards: int = 16) -> DataFrame:
    """Deterministic training-shard assignment manifest: every document
    hashes to one of ``n_shards`` shards by md5(doc_id) -- the global
    shuffle a training pipeline needs before writing tokenized shards
    (hash placement is order-free, so re-runs and backfills land every
    doc in the same shard; no RNG, no skew from ingestion order).  The
    manifest reports each shard's doc count, token total, char total,
    source diversity and doc-id span -- what the trainer's data loader
    reads to plan epoch scheduling.

    Scale: ONE partial-aggregable groupBy at n_shards cardinality; the
    hash is uniform so shards balance to ~1/n each regardless of input
    order or key skew (asserted by the fixture's max/min shard-size
    ratio staying near 1).  The write path pairs this manifest with
    ``df.repartition(n_shards, shard_col).write`` -- the same hash
    routes rows and manifest alike."""
    shard = (
        md5_long(F.concat_ws(":", F.lit("shard"), F.col("doc_id")), 7) % n_shards
    ).alias("shard_id")
    # module-wide token convention (corpus_summary / dataset_split_counts):
    # trim + split on \s+ so consecutive spaces never inflate counts.
    # NB: split('') yields [''] in both engines, so NULL/empty docs count
    # as 1 token under this convention -- consistent with the sibling
    # ops, which is the point (the old single-space split disagreed with
    # them on multi-space runs).
    toks = F.size(F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"))
    return (
        documents.select(
            shard,
            F.col("doc_id"),
            F.col("source"),
            F.col("n_chars"),
            toks.alias("n_tokens"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("shard_id")
    )

def weighted_sample_per_source(documents: DataFrame, n: int = 20) -> DataFrame:
    """Weighted sampling without replacement, ``n`` docs per source,
    length-weighted: the Efraimidis-Spirakis A-ES scheme -- draw
    u ~ U(0,1) per doc, rank by key = u^(1/weight), keep the top n --
    gives each doc inclusion probability proportional to its weight
    with NO sequential pass and no rejection loop, which is why it is
    the distributed weighted-reservoir algorithm (each partition ranks
    locally, winners merge).  u comes from the doc's md5, so the
    "random" draw is reproducible across runs, engines and re-shards --
    the property a training pipeline needs for auditable data recipes.
    Zero-length / NULL-length docs carry no weight and are excluded.

    Scale: the key is a pure projection; per-source top-n is a
    WindowGroupLimit-pushed rank, so each task ships <= n rows per
    source and the shuffle carries O(sources x n).  Ranking compares the
    ROUNDED key (tie-broken by doc_id) so both engines order identical
    doubles."""
    from pyspark.sql import Window

    # +0.5 keeps u strictly inside (0, 1) so ln(u) is finite
    u = (
        md5_long(F.concat_ws(":", F.lit("wsample"), F.col("doc_id"))) + F.lit(0.5)
    ) / F.lit(1152921504606846976.0)
    # Order-equivalent LOG form of the A-ES key (Efraimidis-Spirakis):
    # rank by ln(u)/w instead of u^(1/w).  The power form crowds onto the
    # quantization grid near 1.0 once w reaches ~1e5-1e6 chars (any fixed
    # decimal grid ties large docs and the doc_id tiebreak silently
    # replaces the length weighting); ln(u)/w spreads values at every
    # document length, so a 9-digit grid stays collision-free.
    key = qround(F.log(u) / F.col("n_chars").cast("double"), 9)
    keyed = (
        documents.filter(F.col("n_chars") > 0)
        .select("source", "doc_id", "n_chars", key.alias("sample_key"))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("sample_key").desc(), F.col("doc_id")
    )
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .orderBy("source", "rank")
    )


def domain_temperature_mixture(
    documents: DataFrame, alpha: float = 0.7, budget_tokens: int = 100_000
) -> DataFrame:
    """Temperature-scaled domain mixing weights: given each source's
    natural token share p_i, the sampling weight w_i = p_i^alpha /
    sum(p_j^alpha) -- the standard upweighting of small high-quality
    domains (alpha < 1 flattens the mixture, the GPT-3 / LLaMA
    data-mixing recipe).  The report carries the natural share, the
    tempered share, the token budget allotted to each source, and the
    implied epoch count (budget_i / tokens_i -- epochs > 1 flag sources
    the schedule would repeat).

    Scale: one scan computing per-source token counts (partial-agg to
    |sources| rows); the temperature math runs on the tiny source table
    with a broadcast total."""
    from ..functions.hashing import normalize_text

    per_src = documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.size(F.split(normalize_text(F.col("text")), " "))
        ).alias("n_tokens"),
    )
    tot = per_src.agg(F.sum("n_tokens").cast("double").alias("t_total"))
    shared = per_src.crossJoin(F.broadcast(tot)).withColumn(
        "nat_share", F.col("n_tokens") / F.col("t_total")
    ).withColumn("w_raw", F.pow(F.col("nat_share"), F.lit(alpha)))
    wsum = shared.agg(F.sum("w_raw").alias("w_total"))
    out = shared.crossJoin(F.broadcast(wsum)).withColumn(
        "temp_share", F.col("w_raw") / F.col("w_total")
    )
    budget = F.col("temp_share") * F.lit(float(budget_tokens))
    return out.select(
        "source",
        "n_docs",
        "n_tokens",
        qround(F.col("nat_share"), 6).alias("nat_share"),
        qround(F.col("temp_share"), 6).alias("temp_share"),
        qround(budget, 2).alias("budget_tokens"),
        qround(budget / F.col("n_tokens"), 6).alias("epochs"),
    ).orderBy("source")


def pii_density_by_source(documents: DataFrame) -> DataFrame:
    """Per-source PII leak profile: total match counts for every
    ``PII_PATTERNS`` category (the same shared pattern list
    ``redact_pii`` scrubs with) plus each category's density per 10k
    characters -- the monitoring view that decides which ingestion
    source needs scrubbing attention before its documents enter a
    training mix.

    Scale: pure row-local regexp counting fused into the scan (JVM
    codegen, no Python), one partial-aggregable groupBy at source
    cardinality.  Densities are ratios of exact integer counts."""
    from ..functions.numeric import qround

    text = F.coalesce(F.col("text"), F.lit(""))
    per_doc = documents.select(
        "source",
        F.length(text).alias("n_chars_text"),
        *[
            F.size(F.regexp_extract_all(text, F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{name}")
            for name, pat, _ in PII_PATTERNS
        ],
    )
    aggs = [F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars_text").alias("n_chars")]
    for name, _, _ in PII_PATTERNS:
        aggs.append(F.sum(f"n_{name}").alias(f"n_{name}"))
    out = per_doc.groupBy("source").agg(*aggs)
    dens = [
        F.when(
            F.col("n_chars") > 0,
            qround(F.col(f"n_{name}") * F.lit(10000.0) / F.col("n_chars"), 6),
        ).alias(f"{name}_per_10k_chars")
        for name, _, _ in PII_PATTERNS
    ]
    return out.select(
        "source",
        "n_docs",
        "n_chars",
        *[F.col(f"n_{name}") for name, _, _ in PII_PATTERNS],
        *dens,
    ).orderBy("source")


def shard_skew_report(documents: DataFrame, n_shards: int = 16) -> DataFrame:
    """One-row acceptance check for the ``shard_manifest`` hash
    placement: per-shard doc and char totals reduced to skew ratios
    (max/mean, min/mean) and a chi-square uniformity statistic over doc
    counts -- the number a pipeline asserts on before committing a
    shard layout (a skew ratio near 1 means every trainer data-loader
    rank gets the same bytes; chi2 far above the shard count means the
    hash or the key is broken).

    Scale: one partial-aggregable groupBy at ``n_shards`` cardinality,
    then a single-row aggregate over ``n_shards`` rows.  Counts are
    exact integers; every ratio divides exact integers, and the chi2
    sums ``n_shards`` identical doubles."""
    from ..functions.hashing import md5_long
    from ..functions.numeric import qround

    shard = (
        md5_long(F.concat_ws(":", F.lit("shard"), F.col("doc_id")), 7) % n_shards
    ).alias("shard_id")
    per = documents.select(shard, "n_chars").groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("ch"),
    )
    tot = per.agg(
        F.sum("n").alias("nt"),
        F.sum("ch").alias("cht"),
        F.count(F.lit(1)).alias("k"),
    )
    j = per.crossJoin(F.broadcast(tot))
    expect = F.col("nt") / F.col("k")
    dev = F.col("n") - expect
    return j.agg(
        F.max("k").alias("n_shards"),
        F.max("nt").cast("long").alias("n_docs"),
        qround(F.max(F.col("n") * F.col("k") / F.col("nt")), 6).alias(
            "max_doc_skew"
        ),
        qround(F.min(F.col("n") * F.col("k") / F.col("nt")), 6).alias(
            "min_doc_skew"
        ),
        qround(F.max(F.col("ch") * F.col("k") / F.col("cht")), 6).alias(
            "max_char_skew"
        ),
        qround(F.min(F.col("ch") * F.col("k") / F.col("cht")), 6).alias(
            "min_char_skew"
        ),
        qround(F.sum(dev * dev / expect), 6).alias("chi2_docs"),
    )


def packing_efficiency_sweep(
    documents: DataFrame, budgets: tuple[int, ...] = (128, 256, 512, 1024)
) -> DataFrame:
    """Context-length sweep for the greedy packer: run ``pack_sequences``
    at several token budgets and report, per budget, how many training
    sequences the corpus packs into and what fraction of the context
    window would be padding -- the table that decides a pre-training
    context length (doubling the window only helps if the packer can
    fill it).

    Padding for a sequence is max(budget - fill, 0): an over-budget solo
    document overflows its window (truncated in training) and
    contributes no padding.  Scale: each budget is one bucketed
    applyInPandas pass over (doc_id, n_tokens) int pairs plus a
    seq-cardinality aggregate; the sweep is |budgets| passes, all
    bounded.  Every reported number is exact-integer arithmetic."""
    from ..functions.numeric import qround

    frames = []
    for b in budgets:
        packed = pack_sequences(documents, budget=b)
        fills = packed.groupBy("bucket", "seq_id").agg(
            F.sum("n_tokens").alias("fill")
        )
        pad = F.greatest(F.lit(b).cast("long") - F.col("fill"), F.lit(0).cast("long"))
        frames.append(
            fills.agg(
                F.lit(b).cast("long").alias("budget"),
                F.count(F.lit(1)).alias("n_sequences"),
                F.sum("fill").alias("total_tokens"),
                F.sum(pad).alias("total_pad_tokens"),
                qround(
                    F.sum(pad).cast("double")
                    / (F.count(F.lit(1)) * F.lit(float(b))),
                    6,
                ).alias("pad_fraction"),
                qround(
                    F.sum("fill").cast("double") / F.count(F.lit(1)), 4
                ).alias("avg_fill"),
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.orderBy("budget")


def t_closeness_report(
    documents: DataFrame, n_bins: int = 10, t_threshold: float = 0.2
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007), completing
    the anonymity ladder after ``k_anonymity_report`` (group sizes) and
    ``l_diversity_report`` (sensitive-value variety): per
    quasi-identifier group (lang, source), the EARTH-MOVER distance
    between the group's distribution of the ordered sensitive attribute
    (document length, on a fixed global 10-bucket grid) and the
    corpus-wide distribution.  For an ordered attribute EMD reduces to
    mean absolute cumulative-share difference, sum_i |cumP_i - cumQ_i| /
    (B-1); a group whose EMD exceeds t leaks length information about
    its members even when k and l look healthy.

    Scale: ONE documents scan -- the per-group bucket histogram is
    n_bins conditional sums in a single partial-aggregable groupBy
    (empty buckets materialize as zero columns, no spine join, no plan
    re-expansion), posexploded to a (groups x n_bins) frame on which
    every cumulative -- per-group AND global -- is a window.  The two
    empty-partition-spec windows (global cum, global total) run over
    that provably bounded frame (|lang x source| x n_bins rows),
    whitelisted in the plan audit with that justification.
    Determinism: pure integer-count arithmetic end to end --
    |cn*T - gcn*t_g| is an exact BIGINT before the single final
    division; no libm anywhere."""
    from ..functions.numeric import qround

    docs = documents.filter(F.col("n_chars").isNotNull())
    bounds = docs.agg(
        F.min("n_chars").alias("cmin"), F.max("n_chars").alias("cmax")
    )
    binned = docs.crossJoin(F.broadcast(bounds)).select(
        "lang",
        "source",
        F.when(
            F.col("cmax") != F.col("cmin"),
            F.least(
                F.floor(
                    (F.col("n_chars") - F.col("cmin"))
                    / (F.col("cmax") - F.col("cmin"))
                    * n_bins
                ),
                F.lit(n_bins - 1),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("bucket"),
    )
    per_group = binned.groupBy("lang", "source").agg(
        *[
            F.sum(F.when(F.col("bucket") == b, 1).otherwise(0)).alias(f"b{b}")
            for b in range(n_bins)
        ]
    )
    full = per_group.select(
        "lang",
        "source",
        F.posexplode(
            F.array(*[F.col(f"b{b}") for b in range(n_bins)])
        ).alias("bucket", "n"),
    )
    wgrp = Window.partitionBy("lang", "source").orderBy("bucket")
    wglob = Window.orderBy("bucket").rangeBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = full.select(
        "lang",
        "source",
        F.sum("n").over(wgrp.rowsBetween(Window.unboundedPreceding, 0)).alias("cn"),
        F.sum("n").over(Window.partitionBy("lang", "source")).alias("t_g"),
        F.sum("n").over(wglob).alias("gcn"),
        F.sum("n").over(wall).alias("t_all"),
    )
    terms = cum.select(
        "lang",
        "source",
        "t_g",
        "t_all",
        F.abs(
            F.col("cn") * F.col("t_all") - F.col("gcn") * F.col("t_g")
        ).alias("term_u"),
    )
    agg = terms.groupBy("lang", "source").agg(
        F.max("t_g").alias("n_docs"),
        F.max("t_all").alias("t_all"),
        F.sum("term_u").alias("sum_u"),
    )
    emd = (
        F.col("sum_u").cast("double")
        / (F.col("n_docs").cast("double") * F.col("t_all").cast("double"))
        / F.lit(float(n_bins - 1))
    )
    return agg.select(
        "lang",
        "source",
        "n_docs",
        qround(emd, 6).alias("emd"),
        (emd > F.lit(float(t_threshold))).alias("t_violation"),
    ).orderBy("lang", "source")


def length_quantile_bands(documents: DataFrame) -> DataFrame:
    """Per-source document-length banding: exact interpolated
    P10/P25/P50/P75/P90 of ``n_chars``, the IQR, and the count of docs
    beyond the classic Tukey upper fence (P75 + 1.5 IQR) -- the length
    profile a pretraining mix reads to set per-source truncation /
    chunking policy (a source whose P90 is 40x its median needs
    chunking; one with a fat over-fence tail needs an outlier gate
    before token budgeting).

    Scale: one partial-agg percentile pass at source cardinality, then
    ONE re-scan joined against the broadcast (|sources|-row) fence
    frame -- the quality_deciles two-pass shape; never a global sort.
    Determinism: exact interpolated percentiles on integer lengths
    (the value_percentiles discipline), fences composed from 12-dp
    quantized quartiles, and the fence comparison is integer-vs-double
    with both sides identical."""
    src = documents.select("source", F.col("n_chars").cast("double").alias("len"))
    q = src.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        qround(F.expr("percentile(len, 0.10)"), 12).alias("p10_q"),
        qround(F.expr("percentile(len, 0.25)"), 12).alias("p25_q"),
        qround(F.expr("percentile(len, 0.50)"), 12).alias("p50_q"),
        qround(F.expr("percentile(len, 0.75)"), 12).alias("p75_q"),
        qround(F.expr("percentile(len, 0.90)"), 12).alias("p90_q"),
    )
    fence = F.col("p75_q") + F.lit(1.5) * (F.col("p75_q") - F.col("p25_q"))
    fenced = q.select("source", "n_docs", "p10_q", "p25_q", "p50_q",
                      "p75_q", "p90_q", fence.alias("fence"))
    # single second pass: re-scan the lengths ONCE against the broadcast
    # (|sources|-row) fence frame and fold the whole report in that agg
    # (carrying the quantiles via max over the constant-per-source
    # columns) -- a separate over-fence frame re-expands the percentile
    # subtree and costs a third scan
    return (
        src.join(F.broadcast(fenced), "source")
        .groupBy("source")
        .agg(
            F.max("n_docs").alias("n_docs"),
            qround(F.max("p10_q"), 6).alias("p10_len"),
            qround(F.max("p25_q"), 6).alias("p25_len"),
            qround(F.max("p50_q"), 6).alias("p50_len"),
            qround(F.max("p75_q"), 6).alias("p75_len"),
            qround(F.max("p90_q"), 6).alias("p90_len"),
            qround(F.max("p75_q") - F.max("p25_q"), 6).alias("iqr"),
            F.sum((F.col("len") > F.col("fence")).cast("long")).alias(
                "n_over_fence"
            ),
        )
        .orderBy("source")
    )
