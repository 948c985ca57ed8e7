"""Text analysis operators for training-data pipelines (engine extension).

Language-ID (stopword heuristic), quality scoring (length / punctuation /
stopword ratios), token counting, and content fingerprinting -- the
standard pre-training corpus filters, all as built-in column expressions
(regex + array functions, no UDF) so they run inside whole-stage codegen
and cost one scan.

Regex patterns are restricted to the dialect intersection of Java regex
(Spark) and RE2 (DuckDB): character classes and quantifiers only, no
backrefs/lookarounds -- both engines then match identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long, normalize_text

# tiny in-vocabulary stopword sets: enough to exercise the heuristic; a
# production build swaps in real per-language lists (the operator shape
# does not change)
STOPWORDS = {
    "en": ["the", "a", "of"],
    "de": ["der", "die", "das"],
    "fr": ["le", "la", "les"],
}

def _tokens(col: str = "text") -> F.Column:
    return F.split(F.trim(F.col(col)), r"\s+")

def _stopword_count(lang: str) -> F.Column:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return F.expr(f"size(filter(split(trim(text), '\\\\s+'), t -> t IN ({words})))")

def token_stats(documents: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, mean token
    length -- the inputs to any tokens-per-doc budget."""
    toks = _tokens()
    avg_len = F.expr(
        "aggregate(split(trim(text), '\\\\s+'), 0D, (acc, t) -> acc + length(t))"
    ) / F.size(toks)
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        (F.floor(avg_len * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("avg_token_len"),
    ).orderBy("doc_id")

def text_quality(documents: DataFrame) -> DataFrame:
    """Quality scoring: char length, punctuation ratio, stopword ratio,
    and a composite keep/drop flag (the C4-style heuristic gate)."""
    n_chars = F.length("text")
    # punctuation = what remains after stripping alphanumerics and spaces
    punct = F.length(F.regexp_replace(F.col("text"), "[a-z0-9 ]", ""))
    n_tokens = F.size(_tokens())
    stop_ratio = _stopword_count("en") / n_tokens
    punct_ratio = punct / n_chars
    q6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return documents.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        q6(punct_ratio).alias("punct_ratio"),
        q6(stop_ratio).alias("stopword_ratio"),
        (
            (n_chars >= 50) & (n_tokens >= 10) & (punct_ratio < F.lit(0.3))
        ).alias("quality_pass"),
    ).orderBy("doc_id")

def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-vote language ID with deterministic tiebreak (score desc,
    language code asc); 'und' when nothing matches.  The fixture carries a
    ground-truth ``lang`` column, so the query also reports agreement."""
    scores = {lang: _stopword_count(lang) for lang in STOPWORDS}
    best = None
    for lang in sorted(STOPWORDS):  # asc code order = tiebreak
        s = scores[lang]
        if best is None:
            best = F.struct(s.alias("score"), F.lit(lang).alias("code"))
        else:
            best = F.when(s > best["score"], F.struct(s.alias("score"), F.lit(lang).alias("code"))).otherwise(best)
    predicted = F.when(best["score"] > 0, best["code"]).otherwise(F.lit("und"))
    return documents.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        predicted.alias("predicted_lang"),
        (predicted == F.col("lang")).alias("agrees"),
    ).orderBy("doc_id")

def doc_fingerprints(documents: DataFrame) -> DataFrame:
    """Content fingerprinting: 60-bit md5 of normalized text plus the md5
    hex digest -- join keys for cross-corpus dedup."""
    norm = normalize_text(F.col("text"))
    return documents.select(
        "doc_id",
        F.md5(norm).alias("digest"),
        md5_long(norm).alias("fingerprint"),
    ).orderBy("doc_id")
