"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Every function here returns/produces native Spark Columns — pure JVM
expressions (regexp/length/md5), no Python in the hot path, so they run at
full codegen speed over 100 TB of documents. Regexes are restricted to the
Java-regex ∩ RE2 common subset so the DuckDB oracle computes identical
values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# language -> characteristic stopwords (tiny deterministic n-gram-style
# heuristic; the point is the operator shape, not linguistic accuracy)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "dans"],
    "es": ["el", "la", "los", "y", "es", "una", "que", "en"],
}


def _stopword_pattern(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def stopword_count(text: Column, lang: str = "en") -> Column:
    return F.regexp_count(F.lower(text), F.lit(_stopword_pattern(LANG_STOPWORDS[lang])))


def token_count(text: Column) -> Column:
    """Whitespace tokenization count."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    ).cast(T.LongType())


def word_token_count(text: Column) -> Column:
    """BPE-ish subword proxy: alpha runs + digit runs + single punct marks."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0))).cast(T.LongType())


def char_count(text: Column) -> Column:
    return F.length(text).cast(T.LongType())


def punct_ratio(text: Column) -> Column:
    """Fraction of characters in a fixed punctuation set."""
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))
    return punct.cast(T.DoubleType()) / F.length(text)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    return stopword_count(text, lang).cast(T.DoubleType()) / token_count(text)


def mean_word_len(text: Column) -> Column:
    no_space = F.length(F.regexp_replace(text, r"\s+", ""))
    return no_space.cast(T.DoubleType()) / token_count(text)


def quality_score(text: Column) -> Column:
    """Composite heuristic quality score in [0,1]: length band + stopword
    presence - punctuation excess. Deterministic, engine-portable."""
    n_tok = token_count(text)
    len_score = F.when((n_tok >= 20) & (n_tok <= 1000), F.lit(0.5)).otherwise(F.lit(0.1))
    stop_score = F.least(stopword_ratio(text) * F.lit(2.0), F.lit(0.3))
    punct_pen = F.least(punct_ratio(text) * F.lit(2.0), F.lit(0.2))
    return F.round(len_score + stop_score - punct_pen, 6)


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: stopword_count(text, lang) for lang in LANG_STOPWORDS}


def lang_id(text: Column) -> Column:
    """argmax over per-language stopword hit counts; 'und' (undetermined)
    when no language scores > 0. Ties break by language-name order
    (deterministic — matches the oracle SQL's greatest-first CASE)."""
    scores = lang_scores(text)
    langs = sorted(scores)
    best = None
    best_score = None
    for lg in langs:
        s = scores[lg]
        if best is None:
            best, best_score = F.lit(lg), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lg)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text — the content-defined identity used for exact dedup at scale."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def with_text_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach the full metric set as columns."""
    c = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(c))
        .withColumn("n_chars_m", char_count(c))
        .withColumn("punct_ratio", punct_ratio(c))
        .withColumn("stopword_ratio", stopword_ratio(c))
        .withColumn("quality", quality_score(c))
        .withColumn("lang_pred", lang_id(c))
        .withColumn("fingerprint", fingerprint(c))
    )
