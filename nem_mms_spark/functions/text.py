"""Text analysis operators: token stats, quality scoring, language-ID
heuristic, document fingerprinting.  Everything is built-in-function
composition — no Python in the row path — so Catalyst/codegen run it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language stopword markers for the heuristic language id
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
    "es": ["el", "los", "que"],
}

STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
]


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (split on runs of whitespace, drop empties)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-style subword estimate: word-pieces of <=4 chars (a regex
    approximation of byte-pair tokenizers' ~4 chars/token behavior)."""
    return F.ceil(F.length(text) / F.lit(4)).cast("long")


def stopword_ratio(text: Column) -> Column:
    toks = tokens_col(F.lower(text))
    stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return stop / F.greatest(F.size(toks), F.lit(1))


def avg_token_len(text: Column) -> Column:
    toks = tokens_col(text)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column) -> Column:
    no_punct = F.regexp_replace(text, r"[^\w\s]", "")
    return (F.length(text) - F.length(no_punct)) / F.greatest(
        F.length(text), F.lit(1)
    )


def quality_score(text: Column) -> Column:
    """Composite 0..1 heuristic quality: length band + token shape +
    punctuation sanity (web-text curation style)."""
    n = token_count(text)
    len_ok = F.when((n >= 10) & (n <= 5000), 1.0).otherwise(0.3)
    awl = avg_token_len(text)
    shape_ok = F.when((awl >= 3) & (awl <= 12), 1.0).otherwise(0.5)
    punct_ok = F.when(punct_ratio(text) < 0.2, 1.0).otherwise(0.4)
    return F.round((len_ok + shape_ok + punct_ok) / 3.0, 4)


def lang_id(text: Column) -> Column:
    """N-gram/stopword-marker language guess over LANG_MARKERS."""
    toks = tokens_col(F.lower(text))
    expr = F.lit("und")
    best = F.lit(0)
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(markers)))
        expr = F.when(hits > best, F.lit(lang)).otherwise(expr)
        best = F.greatest(hits, best)
    return expr


def fingerprint(text: Column) -> Column:
    """Stable content fingerprint (md5 hex — portable across engines)."""
    return F.md5(text.cast("string"))


def text_quality_df(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.round(avg_token_len(F.col("text")), 4).alias("avg_token_len"),
        F.round(stopword_ratio(F.col("text")), 4).alias("stopword_ratio"),
        quality_score(F.col("text")).alias("quality"),
    )
