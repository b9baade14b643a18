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


def repetition_signals(df, text_col: str = "text", id_col: str = "doc_id"):
    """Within-document repetition signals (Gopher-style quality filters):

    * ``dup_line_frac``    — fraction of non-empty trimmed lines that are
      repeats of an earlier identical line (0 for single-line docs);
    * ``top_unigram_frac`` — occurrences of the most frequent word token
      over all word-token occurrences;
    * ``top_bigram_frac``  — same for word bigrams.

    Boilerplate-heavy documents (navigation chrome, templated licenses,
    keyword stuffing) light these up; they extend :func:`quality_score`
    with the repetition dimension it lacks.

    Scale shape: line stats are pure array Column expressions (zero
    shuffle, folded into the scan projection); n-gram stats are one
    explode + two map-side-combinable hash aggregates keyed on
    (doc, term) then (doc) — no windows, so a 10^10-doc corpus profiles
    in one pass. All arithmetic is integer-ratio → double, replicated
    bit-for-bit by the DuckDB oracle (:func:`repetition_oracle_sql`).

    Reference analogue: the reference has per-page line counts only
    (``/root/reference/search_scrape.py:443-445``); repetition screening
    is part of the training-data extension surface.
    """
    text = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        F.round((n_lines - F.size(F.array_distinct(lines))) / n_lines, 6),
    ).otherwise(F.lit(0.0))

    base = df.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        dup_line_frac.alias("dup_line_frac"),
    )

    toks = F.regexp_extract_all(F.lower(text), F.lit("[a-z]+"), 0)
    nb = F.size(toks) - 1
    bigrams = F.when(
        nb >= 1,
        F.zip_with(
            F.slice(toks, 1, nb),
            F.slice(toks, 2, nb),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
    ).otherwise(F.array().cast("array<string>"))

    def _top_frac(exploded, alias):
        per_term = exploded.groupBy("id", "term").agg(F.count("*").alias("n"))
        return per_term.groupBy("id").agg(
            F.round(F.max("n") / F.sum("n"), 6).alias(alias)
        )

    uni = _top_frac(
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("term")),
        "top_unigram_frac",
    )
    bi = _top_frac(
        df.select(F.col(id_col).alias("id"), F.explode(bigrams).alias("term")),
        "top_bigram_frac",
    )
    out = (
        base.join(uni.withColumnRenamed("id", id_col), on=id_col, how="left")
        .join(bi.withColumnRenamed("id", id_col), on=id_col, how="left")
    )
    return out.select(
        id_col,
        "n_lines",
        "dup_line_frac",
        F.coalesce("top_unigram_frac", F.lit(0.0)).alias("top_unigram_frac"),
        F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
    )


def repetition_oracle_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`repetition_signals` over ``table``."""
    lines = (
        "list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),"
        " l -> l <> '')"
    )
    return f"""
    WITH rs_base AS (
      SELECT doc_id,
             CAST(len({lines}) AS BIGINT) AS n_lines,
             CASE WHEN len({lines}) > 0
                  THEN round((len({lines}) - len(list_distinct({lines})))
                             / len({lines}), 6)
                  ELSE 0.0 END AS dup_line_frac
      FROM {table}
    ),
    rs_toks AS (
      SELECT doc_id AS id,
             unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok,
             unnest(generate_series(1, len(regexp_extract_all(lower(text), '[a-z]+')))) AS pos
      FROM {table}
    ),
    rs_uni AS (
      SELECT id, round(max(n) / sum(n), 6) AS top_unigram_frac FROM (
        SELECT id, tok, count(*) AS n FROM rs_toks GROUP BY id, tok
      ) GROUP BY id
    ),
    rs_bg AS (
      SELECT id, tok || ' ' || lead(tok) OVER w AS bg, lead(tok) OVER w AS _t
      FROM rs_toks WINDOW w AS (PARTITION BY id ORDER BY pos)
    ),
    rs_bi AS (
      SELECT id, round(max(n) / sum(n), 6) AS top_bigram_frac FROM (
        SELECT id, bg, count(*) AS n FROM rs_bg WHERE _t IS NOT NULL GROUP BY id, bg
      ) GROUP BY id
    )
    SELECT b.doc_id, b.n_lines, b.dup_line_frac,
           coalesce(u.top_unigram_frac, 0.0) AS top_unigram_frac,
           coalesce(i.top_bigram_frac, 0.0) AS top_bigram_frac
    FROM rs_base b
    LEFT JOIN rs_uni u ON u.id = b.doc_id
    LEFT JOIN rs_bi i ON i.id = b.doc_id
    """
