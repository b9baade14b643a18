"""Training-data hygiene operators: eval-set contamination and within-doc
repetition signals — planted-value checks plus the broadcast plan contract
(the eval side of the contamination join must broadcast: the corpus side
is the 100 TB side and must never shuffle)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from read_comp_data_pipeline_spark.operators.contamination import eval_contamination
from read_comp_data_pipeline_spark.operators.textstats import repetition_signals


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_planted_overlap(spark):
    eval_text = " ".join(f"ev{i}" for i in range(12))  # 5 distinct 8-grams
    clean = " ".join(f"cl{i}" for i in range(20))
    # contains eval 8-grams: embeds the full eval text → shares all 5
    leaky = "pre1 pre2 " + eval_text + " post1"
    # shares exactly one 8-gram window (tokens ev0..ev7)
    partial = " ".join(f"ev{i}" for i in range(8)) + " zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8"
    ev = _mk_docs(spark, [(1, eval_text)])
    corpus = _mk_docs(spark, [(10, clean), (11, leaky), (12, partial), (13, "short doc")])
    got = {r["doc_id"]: (r["n_overlapping"], r["contaminated"])
           for r in eval_contamination(corpus, ev, n=8).collect()}
    assert got[10] == (0, False)
    assert got[11] == (5, True)
    assert got[12] == (1, True)
    assert got[13] == (0, False)  # < 8 tokens → no shingles at all


def test_contamination_eval_side_broadcasts(spark):
    ev = _mk_docs(spark, [(1, " ".join(f"e{i}" for i in range(10)))])
    corpus = _mk_docs(spark, [(i, " ".join(f"w{i}x{j}" for j in range(10)))
                              for i in range(10, 40)])
    plan = _plan(eval_contamination(corpus, ev, n=8))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_repetition_signals_planted(spark):
    doc_dup_lines = "same line\nsame line\nother line\n  \nsame line"
    # tokens: a a a b → top unigram 3/4; bigrams: 'a a','a a','a b' → 2/3
    doc_rep_tokens = "a a a b"
    docs = _mk_docs(spark, [(1, doc_dup_lines), (2, doc_rep_tokens), (3, "")])
    got = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    # 4 non-empty lines, 2 distinct → 2 repeats / 4
    assert got[1]["n_lines"] == 4
    assert abs(got[1]["dup_line_frac"] - 0.5) < 1e-9
    assert got[2]["n_lines"] == 1
    assert abs(got[2]["top_unigram_frac"] - 0.75) < 1e-9
    assert abs(got[2]["top_bigram_frac"] - 2 / 3) < 1e-6
    # empty text: no lines, no tokens — all zeros, row still present
    assert got[3]["n_lines"] == 0
    assert got[3]["dup_line_frac"] == 0.0
    assert got[3]["top_unigram_frac"] == 0.0
    assert got[3]["top_bigram_frac"] == 0.0


def test_repetition_line_stats_add_no_shuffle(spark):
    """The line signals are scan-projection Column exprs: a plan computing
    only them must contain zero exchanges."""
    docs = _mk_docs(spark, [(1, "x\nx"), (2, "y")])
    lines = F.filter(
        F.transform(F.split(F.col("text"), "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    df = docs.select(
        "doc_id",
        (F.size(lines) - F.size(F.array_distinct(lines))).alias("n_dup"),
    )
    assert "Exchange" not in _plan(df)
