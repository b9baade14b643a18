"""Sequence packing (concat-and-chunk) for training-data pipelines.

LLM pretraining consumes documents as one concatenated token stream cut
into fixed-budget sequences; the pipeline step is assigning every document
its (pack_id, offset) in that stream deterministically. This is exactly a
windowed running sum:

    offset_in_stream = Σ tokens of all earlier docs in the same stream
    pack_id          = offset_in_stream // budget
    offset_in_pack   = offset_in_stream %  budget

(documents straddle pack boundaries, as concat-and-chunk training does).

Scale shape: the stream is SHARDED — ``(strata, shard)`` with
shard = portable_hash(id) % n_shards — so the per-stream ordered window
never concentrates the corpus in one task; each shard is an independent
token stream packed in parallel (training runs consume shards
independently, so cross-shard boundaries cost nothing). Assignment is a
pure function of (id, tokens of same-shard predecessors): reproducible
across runs and cluster sizes, and DuckDB-oracle-exact (the portable
hash + the same token regex compute identically there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from read_comp_data_pipeline_spark.functions.hashing import phash, phash_sql
from read_comp_data_pipeline_spark.operators import textstats


def pack_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str | None = None,
    n_shards: int = 1,
    salt: str = "pack-v1",
) -> DataFrame:
    """Assign every row ``(shard, pack_id, pack_offset, n_tokens)`` — its
    place in the sharded concat-and-chunk token stream. Stream order is
    ascending ``id_col`` within each (strata, shard)."""
    shard = F.pmod(
        phash(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
        F.lit(n_shards),
    ).cast("int")
    keys = ([F.col(strata_col)] if strata_col else []) + [F.col("shard")]
    out = df.withColumn("shard", shard).withColumn(
        "n_tokens", textstats.token_count(F.col(text_col))
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    # integral `div`, not floor(double): Spark's `/` on longs produces a
    # double, which loses exactness past 2^53 running tokens — the DuckDB
    # oracle's bigint `//` never does, so the arithmetic must match it
    return (
        out.withColumn("_prev", prev)
        .withColumn("pack_id", F.expr(f"_prev div {int(budget)}").cast("long"))
        .withColumn("pack_offset", F.pmod(F.col("_prev"), F.lit(budget)).cast("long"))
        .drop("_prev")
    )


def pack_sequences_sql(
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str | None = None,
    n_shards: int = 1,
    salt: str = "pack-v1",
    table: str = "documents",
    select_cols: str = "doc_id, lang",
) -> str:
    """DuckDB rendering of :func:`pack_sequences`."""
    h = phash_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    tok = rf"CAST(length(regexp_extract_all({text_col}, '{textstats.TOKEN_RE}')) AS BIGINT)"
    part = (f"{strata_col}, " if strata_col else "") + "shard"
    return f"""
    SELECT {select_cols}, shard, n_tokens,
           CAST(prev // {budget} AS BIGINT) AS pack_id,
           CAST(prev % {budget} AS BIGINT) AS pack_offset
    FROM (
      SELECT {select_cols}, shard, n_tokens,
             coalesce(sum(n_tokens) OVER (PARTITION BY {part} ORDER BY {id_col} ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS prev
      FROM (
        SELECT {select_cols}, CAST(({h}) % {n_shards} AS INT) AS shard,
               {tok} AS n_tokens
        FROM {table}
      )
    )
    """
