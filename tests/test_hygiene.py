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


# ───────────────────────── paragraph dedup (r5) ─────────────────────────

from read_comp_data_pipeline_spark.operators.paragraphs import paragraph_dedup
from read_comp_data_pipeline_spark.operators.redact import redact_pii


def test_paragraph_dedup_planted(spark):
    docs = _mk_docs(spark, [
        (1, "nav\nUnique one\nfooter"),
        (2, "nav\nUnique two\nfooter"),
        (3, "nav\nfooter"),                    # pure boilerplate, later id
        (4, "  \n\nSame twice\nSame twice\nz"),  # intra-doc dup + empties
        (5, None),
    ])
    got = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    # doc 1 is the first occurrence of both boilerplate lines — keeps all
    assert (got[1]["n_paras"], got[1]["n_kept"]) == (3, 3)
    assert got[1]["cleaned_text"] == "nav\nUnique one\nfooter"
    # docs 2/3 lose the boilerplate; doc 3 loses everything
    assert (got[2]["n_kept"], got[2]["cleaned_text"]) == (1, "Unique two")
    assert (got[3]["n_paras"], got[3]["n_kept"], got[3]["cleaned_text"]) == (2, 0, "")
    # intra-doc repeat: second occurrence removed, order preserved,
    # whitespace-only lines never count as paragraphs
    assert (got[4]["n_paras"], got[4]["n_kept"]) == (3, 2)
    assert got[4]["cleaned_text"] == "Same twice\nz"
    # NULL text → zero-paragraph row, still present
    assert (got[5]["n_paras"], got[5]["n_kept"], got[5]["cleaned_text"]) == (0, 0, "")


def test_paragraph_dedup_winner_is_hash_agg_not_window(spark):
    """The winner-per-paragraph step must be the map-side-combinable
    min-struct aggregate, NOT a row_number window: a 10^8-occurrence
    boilerplate line in one window partition is the hot-reducer shape the
    dedup family's collapse guard exists to kill."""
    docs = _mk_docs(spark, [(1, "a\nb"), (2, "a\nc")])
    plan = _plan(paragraph_dedup(docs))
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_redact_pii_planted(spark):
    docs = _mk_docs(spark, [
        (1, "mail a.b+c@x.example.org and d@ex.io, ip 192.168.0.1, tel 5551234567"),
        (2, "no pii here, short number 123, not-an-ip 1.2.3"),
        (3, None),
    ])
    got = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_number"]) == (2, 1, 1)
    assert got[1]["redacted_text"] == "mail <EMAIL> and <EMAIL>, ip <IP>, tel <NUM>"
    # sub-threshold digit runs and 3-octet dotted strings are left alone
    assert (got[2]["n_email"], got[2]["n_ipv4"], got[2]["n_number"]) == (0, 0, 0)
    assert got[2]["redacted_text"] == "no pii here, short number 123, not-an-ip 1.2.3"
    assert (got[3]["n_email"], got[3]["redacted_text"]) == (0, "")


def test_redact_pii_is_zero_shuffle_codegen(spark):
    """The scrub is a pure scan projection: no exchange, no UDF — it must
    ride whatever pass already reads the text column."""
    docs = _mk_docs(spark, [(1, "a@b.co"), (2, "x")])
    plan = _plan(redact_pii(docs))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
