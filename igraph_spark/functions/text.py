"""Text-analysis operators for a training-data pipeline, over a
``documents(doc_id, text, lang, source, n_chars)`` table.

All pure Catalyst expressions (JVM-side, whole-stage codegen) — no
Python in the hot path.  Each has a matching DuckDB-oracle SQL in
``__spark_entry__.py`` where expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny stopword lists for the n-gram/stopword language heuristic
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den"],
    "fr": ["le", "la", "les", "de", "et", "est", "une", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "es", "una", "por", "con"],
}


def token_count(docs: DataFrame, col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate (words +
    digit runs + punctuation marks counted separately) ->
    (doc_id, n_tokens, n_subtokens)."""
    words = F.size(F.split(F.trim(F.col(col)), r"\s+"))
    subtok = F.size(
        F.regexp_extract_all(F.col(col),
                             F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))
    return docs.select(
        "doc_id",
        F.when(F.length(F.trim(F.col(col))) == 0, F.lit(0))
         .otherwise(words).cast("long").alias("n_tokens"),
        subtok.cast("long").alias("n_subtokens"))


def quality_score(docs: DataFrame, col: str = "text") -> DataFrame:
    """Heuristic quality features + combined score ->
    (doc_id, n_chars, alpha_ratio, punct_ratio, stopword_ratio,
    mean_word_len, quality).  Mirrors the usual pretraining-corpus
    filters (length, symbol density, stopword density)."""
    length = F.length(col).cast("double")
    alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", "")).cast("double")
    punct = F.length(F.regexp_replace(col, r"[^.,;:!?'\"()\[\]{}]", "")) \
        .cast("double")
    words = F.split(F.trim(F.col(col)), r"\s+")
    n_words = F.size(words).cast("double")
    sw = F.array([F.lit(w) for w in _STOPWORDS["en"]])
    n_stop = F.size(F.filter(
        F.transform(words, lambda w: F.lower(w)),
        lambda w: F.array_contains(sw, w))).cast("double")
    safe_len = F.greatest(length, F.lit(1.0))
    safe_words = F.greatest(n_words, F.lit(1.0))
    alpha_ratio = (alpha / safe_len).alias("alpha_ratio")
    punct_ratio = (punct / safe_len).alias("punct_ratio")
    stop_ratio = (n_stop / safe_words).alias("stopword_ratio")
    mean_wl = ((length - n_words + 1) / safe_words).alias("mean_word_len")
    quality = (
        F.least(length / 500.0, F.lit(1.0)) * 0.25
        + (alpha / safe_len) * 0.35
        + F.least((n_stop / safe_words) * 4.0, F.lit(1.0)) * 0.25
        + F.when((length / safe_words >= 3) & (length / safe_words <= 12),
                 0.15).otherwise(0.0)
    ).alias("quality")
    return docs.select("doc_id", length.cast("long").alias("n_chars"),
                       alpha_ratio, punct_ratio, stop_ratio, mean_wl, quality)


def language_id(docs: DataFrame, col: str = "text") -> DataFrame:
    """Stopword-vote language ID -> (doc_id, lang_pred, lang_votes).

    Counts per-language stopword hits over the lowercased token array;
    the argmax wins, ties broken by language code; no hits => 'und'.
    """
    words = F.transform(F.split(F.trim(F.col(col)), r"\s+"),
                        lambda w: F.lower(F.regexp_replace(w, r"[^a-zA-Z]", "")))
    votes = []
    for lang, sws in _STOPWORDS.items():
        arr = F.array([F.lit(w) for w in sws])
        votes.append(
            F.struct(F.size(F.filter(words, lambda w: F.array_contains(arr, w)))
                     .alias("v"),
                     F.lit(-ord(lang[0])).alias("tie"),
                     F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*votes))
    return docs.select(
        "doc_id",
        F.when(best["v"] > 0, best["lang"]).otherwise(F.lit("und"))
         .alias("lang_pred"),
        best["v"].cast("long").alias("lang_votes"))


def fingerprint(docs: DataFrame, col: str = "text",
                window: int = 8, hash: str = "xxhash64") -> DataFrame:
    """Winnowing-style document fingerprint -> (doc_id, fingerprint).

    Rolling scheme: hash each ``window``-token shingle, keep the
    minimum — a deterministic content signature robust to token
    reordering outside the window.  Pure Catalyst (transform +
    aggregate over the token array).

    hash='xxhash64' (default) -> 64-bit long fingerprint;
    hash='md5' -> minimum md5 hex string — same semantics, portable to
    ANSI-SQL engines, so the driver oracle can recompute it in DuckDB.
    """
    words = F.split(F.trim(F.col(col)), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)))
    if hash == "md5":
        shingles = F.transform(
            idx, lambda i: F.md5(F.concat_ws(
                " ", F.slice(words, i + 1, window))))
    else:
        shingles = F.transform(
            idx, lambda i: F.xxhash64(F.concat_ws(
                " ", F.slice(words, i + 1, window))))
    return docs.select(
        "doc_id",
        F.when(n >= 1, F.array_min(shingles))
         .otherwise(F.lit(None)).alias("fingerprint"))
