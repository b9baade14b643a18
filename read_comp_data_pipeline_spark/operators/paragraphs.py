"""Corpus-wide paragraph deduplication — training-data hygiene.

Web corpora are dominated by *granular* duplication: navigation chrome,
cookie banners, templated footers, and licence boilerplate repeat across
millions of pages even when no two whole documents match. The standard
pretraining fix (C4 / CCNet-style) deduplicates at the paragraph/line
level across the WHOLE corpus: every distinct paragraph survives exactly
once — at its first occurrence in a canonical order — and each document
is reassembled from its surviving paragraphs.

Scale shape (the reason this is NOT a window query): the natural
formulation — ``row_number() OVER (PARTITION BY paragraph ORDER BY
doc_id, pos) = 1`` — sorts every occurrence of a paragraph in ONE
reducer task. Boilerplate is precisely the case where a single paragraph
has 10^8 occurrences, so the window formulation re-creates the hot-key
problem the near-dup family's collapse guard exists to kill. Instead the
winner per paragraph is computed with ``min(struct(doc_id, pos, para))``
over a sha2-keyed hash aggregate: map-side combinable, so the hottest
boilerplate paragraph costs one partial min per task — no hot reducer,
no sort, no join back for the winner row (the winning paragraph's
content rides through the same min-struct). Total cost: one explode, one
hash-key aggregate, one doc-keyed aggregate for reassembly.

The shuffle key is ``sha2(para, 256)`` rather than the paragraph string:
the aggregate then moves 64-char digests + one winner struct per
distinct paragraph instead of every paragraph occurrence, and a 256-bit
key cannot collide at corpus scale the way a 64-bit hash would
(birthday bound at ~4×10^9 distinct paragraphs).

Reference analogue: none — the reference (a single-page crawler,
``/root/reference/search_scrape.py``) has no corpus-level view; this is
part of the training-data extension surface. The first-occurrence-wins
discipline mirrors the exact-dedup keeper rule
(:func:`read_comp_data_pipeline_spark.operators.dedup.exact_dedup_groups`)
applied at paragraph granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_paragraphs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos, para): trimmed non-empty lines of ``text_col``.

    ``pos`` is the 0-based index in the RAW newline split (before
    trimming/filtering), so reassembly preserves the original relative
    order and the oracle can reproduce positions without re-deriving
    the filter.
    """
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
                "pos", "para"
            ),
        )
        .withColumn("para", F.trim("para"))
        .where(F.col("para") != "")
    )


def paragraph_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep each distinct paragraph once corpus-wide (first occurrence in
    (doc_id, pos) order); reassemble every document from its survivors.

    Returns one row per input document:
      (doc_id, n_paras, n_kept, cleaned_text)
    where ``n_paras`` counts the document's non-empty paragraphs,
    ``n_kept`` how many survived, and ``cleaned_text`` is the surviving
    paragraphs re-joined with ``\\n`` in original order ('' when the
    whole document was boilerplate already seen elsewhere).
    """
    paras = explode_paragraphs(df, text_col, id_col)

    # winner per distinct paragraph: min-struct over a sha2-keyed hash agg
    # (map-side combinable — a 10^8-occurrence boilerplate line costs one
    # partial min per task, never a hot reducer; see module docstring)
    winners = (
        paras.groupBy(F.sha2(F.col("para"), 256).alias("h"))
        .agg(F.min(F.struct("doc_id", "pos", "para")).alias("w"))
        .select(
            F.col("w.doc_id").alias("doc_id"),
            F.col("w.pos").alias("pos"),
            F.col("w.para").alias("para"),
        )
    )

    totals = paras.groupBy("doc_id").agg(F.count("*").alias("n_paras"))
    rebuilt = (
        winners.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "para"))).alias("kp"))
        .select(
            "doc_id",
            F.size("kp").cast("long").alias("n_kept"),
            F.concat_ws(
                "\n", F.transform("kp", lambda s: s["para"])
            ).alias("cleaned_text"),
        )
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(totals, on="doc_id", how="left")
        .join(rebuilt, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_paras"), F.lit(0)).cast("long").alias("n_paras"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
        )
    )


def paragraph_dedup_oracle_sql(source_rel: str = "documents") -> str:
    """DuckDB mirror of :func:`paragraph_dedup` over ``source_rel``
    (a relation with doc_id + text). Partitions by the paragraph CONTENT
    (sha2 groups == content groups); the oracle may use the window
    formulation the Spark side deliberately avoids — at oracle scale
    there is no hot key.
    """
    return f"""
    pd_p AS (
      SELECT doc_id,
             unnest(list_transform(string_split(coalesce(text, ''), chr(10)),
                                   l -> trim(l))) AS para,
             unnest(generate_series(
                 0, len(string_split(coalesce(text, ''), chr(10))) - 1)) AS pos
      FROM {source_rel}
    ),
    pd_np AS (SELECT * FROM pd_p WHERE para <> ''),
    pd_win AS (
      SELECT doc_id, pos, para,
             row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
      FROM pd_np
    ),
    pd_kept AS (SELECT doc_id, pos, para FROM pd_win WHERE rn = 1),
    pd_tot AS (SELECT doc_id, count(*) AS n_paras FROM pd_np GROUP BY doc_id),
    pd_agg AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(para, chr(10) ORDER BY pos) AS cleaned_text
      FROM pd_kept GROUP BY doc_id
    ),
    pd_out AS (
      SELECT d.doc_id,
             CAST(coalesce(t.n_paras, 0) AS BIGINT) AS n_paras,
             CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
             coalesce(a.cleaned_text, '') AS cleaned_text
      FROM {source_rel} d
      LEFT JOIN pd_tot t USING (doc_id)
      LEFT JOIN pd_agg a USING (doc_id)
    )
    """
