"""Eval-set contamination check — training-data hygiene.

Before a corpus becomes pretraining data, every document must be screened
for n-gram overlap against the evaluation/benchmark sets the resulting
model will be scored on (otherwise eval numbers measure memorization).
The shape is extremely asymmetric: the eval set is tiny (10^3–10^5 docs),
the corpus is the 100 TB side — so the eval n-gram set is BROADCAST and
the corpus side never shuffles: one scan → shingle explode → broadcast
hash semi-join → per-doc count. The corpus n-grams that match are counted
DISTINCT per document (each shingle relation is already distinct), so the
score is "how many distinct eval 8-grams does this doc contain".

Reference analogue: none (the reference has no eval hygiene); this is
part of the training-data extension surface (brief: "the operations a
large-scale training-data pipeline would need"). Shingling reuses
operators/dedup.shingles — the same tokenization the near-dup family
uses, so one tokenizer governs both hygiene passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from read_comp_data_pipeline_spark.operators.dedup import shingles


def eval_contamination(
    corpus: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    threshold: int = 1,
) -> DataFrame:
    """(doc_id, n_overlapping, contaminated) for every corpus document.

    ``n_overlapping`` = distinct ``n``-gram word shingles the document
    shares with ANY eval document; ``contaminated`` = at least
    ``threshold`` such shingles. Documents shorter than ``n`` tokens have
    no shingles and report 0/false.

    Precondition (inherited from dedup.shingles' zero-shuffle contract):
    ``id_col`` uniquely identifies a row in BOTH inputs — duplicate-id
    rows would emit duplicate (id, shingle) pairs and inflate the
    intersection counts here instead of failing loudly. Dedupe upstream
    if a feed can carry duplicate ids.
    """
    eval_ngrams = shingles(eval_docs, text_col, id_col, n).select("shingle").distinct()
    corpus_sh = shingles(corpus, text_col, id_col, n)
    hits = (
        corpus_sh.join(F.broadcast(eval_ngrams), on="shingle", how="inner")
        .groupBy("id")
        .agg(F.count("*").alias("n_overlapping"))
    )
    return (
        corpus.select(F.col(id_col))
        .join(hits.withColumnRenamed("id", id_col), on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_overlapping", F.lit(0)).cast("long").alias("n_overlapping"),
            (F.coalesce("n_overlapping", F.lit(0)) >= threshold).alias("contaminated"),
        )
    )


def _shingle_cte_sql(n: int, source: str, rel: str) -> str:
    """DuckDB CTE pair mirroring dedup.shingles for arbitrary ``n``:
    defines ``toks_{rel}`` and ``{rel}`` (DISTINCT id, shingle)."""
    leads = " || ' ' || ".join(
        ["tok"] + [f"lead(tok, {i}) OVER w" for i in range(1, n)]
    )
    return rf"""
    toks_{rel} AS (
      SELECT doc_id AS id,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok,
             unnest(generate_series(1, len(regexp_split_to_array(lower(trim(text)), '\s+')))) AS pos
      FROM {source}
    ),
    {rel} AS (
      SELECT DISTINCT id, shingle FROM (
        SELECT id, {leads} AS shingle, lead(tok, {n - 1}) OVER w AS t_last
        FROM toks_{rel} WHERE tok <> ''
        WINDOW w AS (PARTITION BY id ORDER BY pos)
      ) WHERE t_last IS NOT NULL
    )"""


def contamination_oracle_sql(
    eval_pred: str, n: int = 8, threshold: int = 1, table: str = "documents"
) -> str:
    """DuckDB mirror of :func:`eval_contamination` where the eval set is
    ``{table} WHERE {eval_pred}`` and the corpus is its complement."""
    return f"""
    WITH evd AS (SELECT * FROM {table} WHERE {eval_pred}),
    corp AS (SELECT * FROM {table} WHERE NOT ({eval_pred})),
    {_shingle_cte_sql(n, "evd", "esh")},
    {_shingle_cte_sql(n, "corp", "csh")},
    eg AS (SELECT DISTINCT shingle FROM esh),
    hits AS (
      SELECT c.id, count(*) AS n_overlapping
      FROM csh c JOIN eg USING (shingle) GROUP BY c.id
    )
    SELECT d.doc_id,
           CAST(coalesce(h.n_overlapping, 0) AS BIGINT) AS n_overlapping,
           coalesce(h.n_overlapping, 0) >= {threshold} AS contaminated
    FROM corp d LEFT JOIN hits h ON h.id = d.doc_id
    """
