"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

Everything is built from codegen'd string/regexp/higher-order expressions —
no Python in the hot path — so the operators stream through a 100 TB scan
at parquet speed.  Every rule is also expressible in ANSI SQL, which keeps
the operators oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/keyword language heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "was"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
    "zh": ["de", "shi", "le", "zai", "he"],
}

# BPE-ish pre-tokenization: word pieces, digit runs, single punctuation.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_PUNCT = r"[.,!?;:]"
_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def _count_matches(c: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0))


def _word_count(c: Column, word: str) -> Column:
    return F.size(F.regexp_extract_all(c, F.lit(rf"\b{word}\b"), 0))


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(F.split(F.trim(t), r"\s+")).alias("ws_tokens"),
        _count_matches(t, BPE_PATTERN).alias("bpe_tokens"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + composite score per document.

    Features: length, whitespace-token count, mean token length, punctuation
    ratio, stopword ratio, alpha ratio.  The composite is a fixed linear
    blend rounded to 4 dp (deterministic double math in both engines).
    """
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    ws = F.size(F.split(F.trim(t), r"\s+"))
    punct = _count_matches(t, _PUNCT)
    alpha = _count_matches(t, r"[A-Za-z]")
    stop = None
    for wd in _STOPWORDS:
        c = _word_count(t, wd)
        stop = c if stop is None else stop + c
    out = df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        ws.alias("ws_tokens"),
        punct.alias("punct_cnt"),
        alpha.alias("alpha_cnt"),
        stop.alias("stop_cnt"),
    )
    punct_ratio = F.col("punct_cnt").cast("double") / F.col("n_chars")
    alpha_ratio = F.col("alpha_cnt").cast("double") / F.col("n_chars")
    stop_ratio = F.col("stop_cnt").cast("double") / F.col("ws_tokens")
    score = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.4) * F.least(stop_ratio * 2, F.lit(1.0))
        - F.lit(0.2) * punct_ratio
    )
    return out.select(
        id_col,
        "n_chars",
        "ws_tokens",
        F.floor(punct_ratio * 10000.0 + 0.5) / 10000.0,
        F.floor(alpha_ratio * 10000.0 + 0.5) / 10000.0,
        F.floor(score * 10000.0 + 0.5) / 10000.0,
    ).toDF(id_col, "n_chars", "ws_tokens", "punct_ratio", "alpha_ratio", "quality")


def lang_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keyword-marker language ID: score per language, argmax prediction.

    Ties break alphabetically on language code (deterministic).
    """
    t = F.lower(F.col(text_col))
    score_cols = []
    for lang in sorted(LANG_MARKERS):
        s = None
        for wd in LANG_MARKERS[lang]:
            c = _word_count(t, wd)
            s = c if s is None else s + c
        score_cols.append(s.alias(f"score_{lang}"))
    scored = df.select(F.col(id_col), *score_cols)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = None
    for lang in reversed(langs):  # earlier langs win ties -> apply last
        cond = F.when(F.col(f"score_{lang}") == best, F.lit(lang))
        pred = cond.otherwise(pred) if pred is not None else cond
    return scored.select(id_col, *[f"score_{lang}" for lang in langs], pred.alias("pred_lang"))


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic rolling polynomial hash (base 31 mod 1e9+7) per doc.

    A true content fingerprint (order-sensitive, unlike a bag-of-words
    hash); computed with a sequential higher-order fold over the char
    array so it stays in codegen.
    """
    p = 1_000_000_007
    chars = F.split(F.col(text_col), "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % p,
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))
