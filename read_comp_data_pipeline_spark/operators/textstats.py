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
    cheap whole-document form used for shard-level exact dedup."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def winnowing_fingerprints(
    df, text_col: str = "text", id_col: str = "doc_id", n: int = 5, window: int = 4
):
    """Rolling-hash document fingerprints (winnowing, à la MOSS): hash
    every n-gram word shingle in position order, keep the minimum of each
    sliding window of ``window`` consecutive shingle hashes, distinct the
    survivors. Robust to local edits: an edit perturbs only the windows it
    overlaps, so most fingerprints survive — the containment-detection
    primitive exact/md5 fingerprints can't provide.

    Relational shape: posexplode → lead-chain shingles → windowed min →
    distinct. All windows are per-document (keyed shuffle only).
    """
    from pyspark.sql import DataFrame, Window  # noqa: F401

    from read_comp_data_pipeline_spark.functions.hashing import phash

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("pos", "tok"),
    ).where(F.col("tok") != "")
    w = Window.partitionBy("id").orderBy("pos")
    sh = toks.select(
        "id", "pos",
        phash(
            F.concat_ws(
                " ",
                F.col("tok"),
                *[F.lead("tok", i).over(w) for i in range(1, n)],
            )
        ).alias("h"),
        F.lead("tok", n - 1).over(w).alias("_tail"),
    ).where(F.col("_tail").isNotNull())
    w2 = Window.partitionBy("id").orderBy("pos").rowsBetween(0, window - 1)
    winnowed = sh.select(
        "id",
        F.min("h").over(w2).alias("fp"),
        F.lead("h", window - 1).over(Window.partitionBy("id").orderBy("pos")).alias("_full"),
    ).where(F.col("_full").isNotNull())
    return winnowed.select(F.col("id").alias(id_col), "fp").distinct()


def winnowing_oracle_sql(n: int = 5, window: int = 4) -> str:
    """DuckDB mirror of :func:`winnowing_fingerprints` over `documents`."""
    from read_comp_data_pipeline_spark.functions.hashing import phash_sql

    leads = " || ' ' || ".join(["tok"] + [f"lead(tok, {i}) OVER w" for i in range(1, n)])
    return f"""
    WITH toks AS (
      SELECT doc_id AS id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok,
             unnest(generate_series(1, len(regexp_split_to_array(lower(trim(text)), '\\s+')))) AS pos
      FROM documents
    ),
    sh AS (
      SELECT id, pos, {phash_sql(f"({leads})")} AS h,
             lead(tok, {n - 1}) OVER w AS _tail
      FROM toks WHERE tok <> ''
      WINDOW w AS (PARTITION BY id ORDER BY pos)
    ),
    kept AS (SELECT * FROM sh WHERE _tail IS NOT NULL),
    winnowed AS (
      SELECT id,
             min(h) OVER (PARTITION BY id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS fp,
             lead(h, {window - 1}) OVER (PARTITION BY id ORDER BY pos) AS _full
      FROM kept
    )
    SELECT DISTINCT id AS doc_id, fp FROM winnowed WHERE _full IS NOT NULL
    """
