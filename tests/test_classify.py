"""Keyword-classifier semantics (P5/A1) — including the NULL contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from read_comp_data_pipeline_spark.functions.classify import (
    keyword_hits,
    passes_classifier,
)


def test_keyword_hits_counts_and_threshold(spark):
    df = spark.createDataFrame(
        [
            (0, "the court ruled the statute unconstitutional"),  # court, statute, law? no
            (1, "nothing relevant here"),
            (2, "LAW and LEGAL text about the legislature"),
        ],
        "id int, content string",
    )
    rows = {
        r["id"]: (r["hits"], r["passes"])
        for r in df.select(
            "id",
            keyword_hits(F.col("content")).alias("hits"),
            passes_classifier(F.col("content")).alias("passes"),
        ).collect()
    }
    assert rows[0][0] >= 2 and rows[0][1] is True
    assert rows[1] == (0, False)
    assert rows[2][0] >= 3 and rows[2][1] is True


def test_keyword_hits_null_content_is_zero_not_null(spark):
    """NULL content must count as 0 hits (and fail the gate), not propagate
    NULL — a NULL here makes downstream least()/aggregations silently skip
    the row instead of scoring it 0 (quality would jump 0.2 -> 0.7)."""
    df = spark.createDataFrame([(0, None)], "id int, content string")
    r = df.select(
        keyword_hits(F.col("content")).alias("hits"),
        passes_classifier(F.col("content")).alias("passes"),
    ).first()
    assert r["hits"] == 0
    assert r["passes"] is False


def test_null_content_upsert_quality_is_floor(spark):
    """prepare_target_rows on a null-content upsert (quarantine off) must
    score quality at the 0.2 floor — the pre-fix NULL kw_hits made
    least(1.0, 0.2 + least(NULL/10, 0.5)) evaluate to 0.7."""
    from read_comp_data_pipeline_spark.streaming.ingest import prepare_target_rows

    df = spark.createDataFrame(
        [("r", "k", "c", "py", None, 1, "U")],
        "repo string, path string, commit string, lang string, "
        "content string, seq long, op string",
    )
    r = prepare_target_rows(df).select("quality", "kw_hits").first()
    assert r["kw_hits"] == 0
    assert abs(r["quality"] - 0.2) < 1e-9
