"""Deduplication operators for training-data pipelines (engine extension).

Four tiers, cheapest first -- the standard LLM-corpus dedup ladder:

1. **Exact** (``exact_dedup``): md5 of normalized text, one hash-groupBy.
   At 100 TB this is a single shuffle on a well-distributed 60-bit key;
   map-side partial aggregation collapses most duplicates before the wire.
2. **MinHash signatures** (``minhash_signatures``): word-shingle MinHash
   computed entirely with array expressions (``array_min(transform(...))``)
   -- per-row, JVM-side, NO shuffle and no UDF; the signature computation
   scales linearly and embarrassingly parallel.
3. **LSH banding** (``lsh_candidate_pairs``): signatures banded so that
   only likely-similar pairs meet in a (band, band_hash) shuffle -- the
   classic sub-quadratic near-dup join (candidates only, verify after).
4. **N-gram Jaccard** (``ngram_jaccard_pairs``): exact similarity on
   candidate pairs via a shingle inverted index; quadratic in the worst
   case, so at scale it runs AFTER banding prunes candidates.

SimHash (``simhash_fingerprints``) complements MinHash for
cosine-ish/Hamming near-dup.  All hashing is md5-based and engine-stable
(functions/hashing.py), so every operator has an exact DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    MINHASH_PRIME,
    md5_long,
    minhash_expr,
    normalize_text,
    perm_params,
    shingles_expr,
)

def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact dedup on normalized text: one row per distinct content hash,
    keeping the smallest doc_id as representative."""
    return (
        documents.select(
            F.col("doc_id"), md5_long(normalize_text(F.col("text"))).alias("content_hash")
        )
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("representative_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("representative_id")
    )

def minhash_signatures(documents: DataFrame, k: int = 8, shingle_n: int = 3) -> DataFrame:
    """Per-document MinHash signature as k columns mh_0..mh_{k-1}.

    Array-expression implementation: shingle the text, hash each shingle
    (md5-based, engine-stable), take the min under k fixed universal-hash
    permutations.  Zero shuffles -- the whole signature is a projection."""
    sh = shingles_expr("text", shingle_n)
    cols = [F.col("doc_id")]
    for i in range(k):
        cols.append(F.expr(minhash_expr(sh, i)).alias(f"mh_{i}"))
    return documents.select(*cols)

def lsh_candidate_pairs(
    documents: DataFrame, k: int = 8, bands: int = 4, shingle_n: int = 3
) -> DataFrame:
    """LSH banding over MinHash signatures: k/bands rows per band, band
    hash = md5 of the concatenated row values; docs sharing any band hash
    become a candidate pair (doc_a < doc_b, distinct).

    Scale: the only shuffle is the self-join on (band_id, band_hash) --
    cardinality ~ n_docs * bands, and the join explodes only within
    buckets, which is exactly the point of banding."""
    rows = k // bands
    sigs = minhash_signatures(documents, k=k, shingle_n=shingle_n)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(F.concat_ws(",", *[p.cast("string") for p in parts])).alias("band_hash"),
            )
        )
    banded = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )

def ngram_jaccard_pairs(
    documents: DataFrame, shingle_n: int = 3, threshold: float = 0.2
) -> DataFrame:
    """Exact n-gram Jaccard similarity via a shingle inverted index:
    explode distinct shingles, self-join on shingle, count shared, then
    ``|A∩B| / (|A| + |B| - |A∩B|)``.  Pairs above threshold only.

    Scale: worst-case quadratic within a shingle bucket; in a real corpus
    the hot shingles are stop-gram-like and get filtered by document
    frequency (df_cap) before the join -- same idea as skip-listing
    high-df terms in search engines."""
    sh = shingles_expr("text", shingle_n)
    doc_shingles = documents.select(
        "doc_id", F.explode(F.array_distinct(F.expr(sh))).alias("shingle")
    )
    sizes = doc_shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = doc_shingles.alias("a")
    b = doc_shingles.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jacc = F.col("shared") / (F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("shared"))
    return (
        shared.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "shared",
            (F.floor(jacc * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )

def simhash_fingerprints(documents: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash: per-token md5-based hash; fingerprint bit b is 1 when the
    weighted sum of (+1 / -1) over tokens' bit b is positive.

    Implementation: explode tokens -> one aggregate with ``bits`` sum
    expressions (all JVM-side bit ops) -> recombine.  One shuffle on
    doc_id.  Hamming distance between fingerprints then approximates
    cosine similarity of the token multisets."""
    toks = documents.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).withColumn("h", F.expr("cast(conv(substring(md5(tok),1,7),16,10) as bigint)"))
    bit_sums = [
        F.sum(
            F.when(F.expr(f"(shiftright(h, {b}) & 1)") == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"s_{b}")
        for b in range(bits)
    ]
    summed = toks.groupBy("doc_id").agg(*bit_sums)
    fingerprint = None
    for b in range(bits):
        term = F.when(F.col(f"s_{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return summed.select("doc_id", fingerprint.cast("long").alias("simhash")).orderBy("doc_id")
