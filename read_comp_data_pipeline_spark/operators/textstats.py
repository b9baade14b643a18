"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure Column expressions (oracle-replicable).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language marker lists (n-gram/stopword heuristic). Deterministic
# and deliberately simple: the point is the Spark shape (scoring via
# horizontal expressions, argmax via greatest/when chain), not NLP quality.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " ist "],
    "fr": [" le ", " et ", " est "],
    "es": [" el ", " y ", " es "],
    "zh": ["的", "是", "在"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]

# BPE-ish tokenizer regex: words, numbers, single punctuation marks.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _count_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of a literal substring — (len - len(removed)) / len(needle),
    identical arithmetic in DuckDB."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return {
        lang: sum(
            (_count_occurrences(padded, m) for m in markers), F.lit(0).cast("long")
        )
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax over marker-hit counts; ties broken by language-code order;
    'und' (undetermined) when nothing matches."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in sorted(scores, reverse=True):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best > 0, out).otherwise(F.lit("und"))


def token_count(text: Column) -> Column:
    """BPE-ish token count via regexp_extract_all (not split — avoids the
    empty-trailing-element divergence between engines)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), 0)).cast("long")


def word_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+"), 0)).cast("long")


def stopword_hits(text: Column) -> Column:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return sum(
        (_count_occurrences(padded, f" {w} ") for w in STOPWORDS),
        F.lit(0).cast("long"),
    )


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0)).cast("long")


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: length band + stopword ratio −
    punctuation excess. Exact formula chosen for cross-engine determinism:
    every term is an integer ratio rounded at the end.
    """
    n_tok = token_count(text)
    n_stop = stopword_hits(text)
    n_punct = punct_count(text)
    len_ok = F.when((F.length(text) >= 100) & (F.length(text) <= 20000), 0.4).otherwise(0.1)
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_tok > 0, n_punct / n_tok).otherwise(F.lit(0.0))
    raw = len_ok + F.least(stop_ratio * F.lit(2.0), F.lit(0.4)) + F.lit(0.2) - F.least(punct_ratio, F.lit(0.2))
    return F.round(F.greatest(F.least(raw, F.lit(1.0)), F.lit(0.0)), 4)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of case/whitespace-normalized text — the
    cheap rolling-hash analogue used for shard-level exact dedup."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))
