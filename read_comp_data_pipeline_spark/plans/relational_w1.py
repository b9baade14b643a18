"""Relational header-breadcrumb scan (W1) — the reference's stateful
per-document loop (``search_scrape.py:434-620``) expressed as pure
relational algebra, checkable line-by-line against a DuckDB oracle.

Shape (SURVEY §2.5): ``posexplode(split(content, '\\n'))`` → most-specific-
first marker dispatch → per-level carry-forward via
``last(ignore nulls) over (partition by doc order by pos)`` with the
reset-deeper rule encoded as ''-valued reset events → segment text via an
ordered aggregate → emission join. The pandas-UDF variant
(functions/extract.py) is the fast path (one pass per document, no window
shuffles); this relational variant exists because it is oracle-checkable
and because it scales differently: the window shuffle is keyed by doc_id,
so a single enormous document parallelizes across its lines here while the
UDF binds a document to one task.

Carry-forward semantics preserved from the reference: emission of the
*previous* breadcrumb + accumulated text at every header line; deeper
levels reset by shallower headers; h5's ``replace("===","")`` quirk;
References/Notes break only on h2; trailing flush only when text lines
follow the last header.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# content synthesizer shared (textually) by the Spark query and the DuckDB
# oracle — valid in both SQL dialects.
SYNTH_CONTENT_SQL = (
    "'intro ' || substr(text, 1, 20) || chr(10) || "
    "'== Alpha ' || (doc_id % 5) || ' ==' || chr(10) || "
    "'body ' || substr(text, 1, 10 + doc_id % 30) || chr(10) || "
    "CASE WHEN doc_id % 3 = 0 THEN '=== Beta ===' || chr(10) || 'sub ' || lang "
    "     ELSE 'plain ' || lang END || chr(10) || "
    "CASE WHEN doc_id % 4 = 0 THEN '== References ==' || chr(10) || 'ignored tail' "
    "     ELSE '== Summary ==' || chr(10) || 'fin ' || source END"
)
SYNTH_TITLE_SQL = "'Doc ' || doc_id"


def synth_docs(documents: DataFrame) -> DataFrame:
    """(doc_id, title, content) with wiki-style header markers synthesized
    deterministically from the shared `documents` table."""
    return documents.select(
        "doc_id",
        F.expr(SYNTH_TITLE_SQL).alias("title"),
        F.expr(SYNTH_CONTENT_SQL).alias("content"),
    )


def relational_sections(docs: DataFrame) -> DataFrame:
    """docs(doc_id, title, content) → (doc_id, section_no, heading, text)."""
    lines = docs.select(
        "doc_id",
        "title",
        F.posexplode(F.split("content", "\n")).alias("pos", "line"),
    )
    line = F.col("line")
    lines = lines.withColumn(
        "lvl",
        F.when(F.instr(line, "====== ") > 0, 6)
        .when(F.instr(line, "===== ") > 0, 5)
        .when(F.instr(line, "==== ") > 0, 4)
        .when(F.instr(line, "=== ") > 0, 3)
        .when(F.instr(line, "== ") > 0, 2),
    )
    # level-specific strip tokens reproduce the reference's replace() calls
    # (h5 quirk: replace("===","") on a 5-equals fence leaves '== … ==')
    lines = lines.withColumn(
        "hdr_val",
        F.when(F.col("lvl").isNull(), F.lit(None))
        .when(F.col("lvl") == 4, F.trim(F.replace(line, F.lit("===="), F.lit(""))))
        .when(F.col("lvl") == 2, F.trim(F.replace(line, F.lit("=="), F.lit(""))))
        .otherwise(F.trim(F.replace(line, F.lit("==="), F.lit("")))),
    )
    # References/Notes break: drop everything after the first breaking h2
    wd = Window.partitionBy("doc_id")
    is_break = (F.col("lvl") == 2) & (
        F.col("hdr_val").contains("References") | F.col("hdr_val").contains("Notes")
    )
    lines = lines.withColumn("cut", F.min(F.when(is_break, F.col("pos"))).over(wd))
    lines = lines.where(F.col("cut").isNull() | (F.col("pos") <= F.col("cut")))

    wo = Window.partitionBy("doc_id").orderBy("pos")
    lines = lines.withColumn(
        "hdr_idx", F.sum(F.when(F.col("lvl").isNotNull(), 1).otherwise(0)).over(wo)
    )

    # --- header-state carry-forward -----------------------------------------
    hdrs = lines.where(F.col("lvl").isNotNull())
    for l in range(2, 7):
        e = F.when(F.col("lvl") == l, F.col("hdr_val"))
        if l > 2:
            e = e.when(F.col("lvl") < l, F.lit(""))  # shallower header resets
        hdrs = hdrs.withColumn(f"s{l}", F.last(e, ignorenulls=True).over(wo))
    for l in range(2, 7):
        hdrs = hdrs.withColumn(f"p{l}", F.coalesce(F.lag(f"s{l}").over(wo), F.lit("")))
    hdrs = hdrs.withColumn(
        "p_run", F.coalesce(F.lag("hdr_val").over(wo), F.col("title"))
    )

    def crumb(prefix: str, run_col: str):
        parts = F.concat(
            F.coalesce(F.col(f"{prefix}2"), F.lit("")),
            *[
                F.when(
                    F.coalesce(F.col(f"{prefix}{l}"), F.lit("")) != "",
                    F.concat(F.lit(" - "), F.col(f"{prefix}{l}")),
                ).otherwise(F.lit(""))
                for l in range(3, 7)
            ],
        )
        return F.when(parts == "", F.col(run_col)).otherwise(parts)

    # --- segment text (ordered aggregate, reference join-with-space+trim) ---
    texts = (
        lines.where(F.col("lvl").isNull())
        .groupBy(F.col("doc_id").alias("t_doc"), F.col("hdr_idx").alias("t_seg"))
        .agg(
            F.trim(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "line"))),
                        lambda x: x["line"],
                    ),
                    " ",
                )
            ).alias("seg_text")
        )
    )

    emit_h = (
        hdrs.join(
            texts,
            (texts["t_doc"] == hdrs["doc_id"]) & (texts["t_seg"] == hdrs["hdr_idx"] - 1),
            "left",
        )
        .select(
            "doc_id",
            F.col("hdr_idx").alias("section_no"),
            crumb("p", "p_run").alias("heading"),
            F.coalesce(F.col("seg_text"), F.lit("")).alias("text"),
        )
    )

    # --- trailing flush: text lines after the last header --------------------
    last_state = hdrs.groupBy("doc_id").agg(
        F.max("hdr_idx").alias("H"),
        *[F.max_by(f"s{l}", "pos").alias(f"f{l}") for l in range(2, 7)],
        F.max_by("hdr_val", "pos").alias("f_run"),
    )
    titles = docs.select(F.col("doc_id").alias("t2_doc"), F.col("title").alias("doc_title"))
    flush = (
        texts.join(last_state, texts["t_doc"] == last_state["doc_id"], "left")
        .join(titles, texts["t_doc"] == titles["t2_doc"])
        .where(texts["t_seg"] == F.coalesce(F.col("H"), F.lit(0)))
        .select(
            F.col("t_doc").alias("doc_id"),
            (F.coalesce(F.col("H"), F.lit(0)) + 1).alias("section_no"),
            F.coalesce(
                crumb("f", "f_run"), F.col("doc_title")
            ).alias("heading"),
            F.col("seg_text").alias("text"),
        )
    )
    return emit_h.unionByName(flush)


# ---------------------------------------------------------------------------
# DuckDB oracle — the same algebra in SQL over the pre-registered
# `documents` view. Kept textually close to the Spark plan above.
# ---------------------------------------------------------------------------
_CRUMB_P = (
    "p2 || CASE WHEN p3 <> '' THEN ' - ' || p3 ELSE '' END"
    " || CASE WHEN p4 <> '' THEN ' - ' || p4 ELSE '' END"
    " || CASE WHEN p5 <> '' THEN ' - ' || p5 ELSE '' END"
    " || CASE WHEN p6 <> '' THEN ' - ' || p6 ELSE '' END"
)
_CRUMB_F = _CRUMB_P.replace("p2", "f2").replace("p3", "f3").replace("p4", "f4").replace("p5", "f5").replace("p6", "f6")

W1_ORACLE_SQL = f"""
WITH docs AS (
  SELECT doc_id, {SYNTH_TITLE_SQL} AS title, {SYNTH_CONTENT_SQL} AS content
  FROM documents
),
lines0 AS (
  -- DuckDB zips parallel unnests in one SELECT → (line, 0-based pos)
  SELECT doc_id, title,
         unnest(string_split(content, chr(10))) AS line,
         unnest(generate_series(1, len(string_split(content, chr(10))))) - 1 AS pos
  FROM docs
),
lines1 AS (
  SELECT *,
    CASE WHEN instr(line, '====== ') > 0 THEN 6
         WHEN instr(line, '===== ') > 0 THEN 5
         WHEN instr(line, '==== ') > 0 THEN 4
         WHEN instr(line, '=== ') > 0 THEN 3
         WHEN instr(line, '== ') > 0 THEN 2 END AS lvl
  FROM lines0
),
lines2 AS (
  SELECT *,
    CASE WHEN lvl IS NULL THEN NULL
         WHEN lvl = 4 THEN trim(replace(line, '====', ''))
         WHEN lvl = 2 THEN trim(replace(line, '==', ''))
         ELSE trim(replace(line, '===', '')) END AS hdr_val
  FROM lines1
),
cuts AS (
  SELECT *,
    min(CASE WHEN lvl = 2 AND (hdr_val LIKE '%References%' OR hdr_val LIKE '%Notes%')
             THEN pos END) OVER (PARTITION BY doc_id) AS cut
  FROM lines2
),
kept AS (SELECT * FROM cuts WHERE cut IS NULL OR pos <= cut),
numbered AS (
  SELECT *,
    CAST(sum(CASE WHEN lvl IS NOT NULL THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS hdr_idx
  FROM kept
),
hdrs AS (
  SELECT *,
    last_value(CASE WHEN lvl = 2 THEN hdr_val END IGNORE NULLS) OVER w AS s2,
    last_value(CASE WHEN lvl = 3 THEN hdr_val WHEN lvl < 3 THEN '' END IGNORE NULLS) OVER w AS s3,
    last_value(CASE WHEN lvl = 4 THEN hdr_val WHEN lvl < 4 THEN '' END IGNORE NULLS) OVER w AS s4,
    last_value(CASE WHEN lvl = 5 THEN hdr_val WHEN lvl < 5 THEN '' END IGNORE NULLS) OVER w AS s5,
    last_value(CASE WHEN lvl = 6 THEN hdr_val WHEN lvl < 6 THEN '' END IGNORE NULLS) OVER w AS s6
  FROM numbered WHERE lvl IS NOT NULL
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
hdrs2 AS (
  SELECT *,
    coalesce(lag(s2) OVER w2, '') AS p2,
    coalesce(lag(s3) OVER w2, '') AS p3,
    coalesce(lag(s4) OVER w2, '') AS p4,
    coalesce(lag(s5) OVER w2, '') AS p5,
    coalesce(lag(s6) OVER w2, '') AS p6,
    coalesce(lag(hdr_val) OVER w2, title) AS p_run
  FROM hdrs
  WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)
),
texts AS (
  SELECT doc_id AS t_doc, hdr_idx AS t_seg,
         trim(string_agg(line, ' ' ORDER BY pos)) AS seg_text
  FROM numbered WHERE lvl IS NULL
  GROUP BY doc_id, hdr_idx
),
emit_h AS (
  SELECT h.doc_id,
         h.hdr_idx AS section_no,
         CASE WHEN ({_CRUMB_P}) = '' THEN p_run ELSE ({_CRUMB_P}) END AS heading,
         coalesce(t.seg_text, '') AS text
  FROM hdrs2 h
  LEFT JOIN texts t ON t.t_doc = h.doc_id AND t.t_seg = h.hdr_idx - 1
),
last_state AS (
  SELECT doc_id AS l_doc, max(hdr_idx) AS H,
         coalesce(arg_max(s2, pos), '') AS f2,
         coalesce(arg_max(s3, pos), '') AS f3,
         coalesce(arg_max(s4, pos), '') AS f4,
         coalesce(arg_max(s5, pos), '') AS f5,
         coalesce(arg_max(s6, pos), '') AS f6,
         arg_max(hdr_val, pos) AS f_run
  FROM hdrs GROUP BY doc_id
),
flush AS (
  SELECT t.t_doc AS doc_id,
         CAST(coalesce(l.H, 0) + 1 AS BIGINT) AS section_no,
         coalesce(
           CASE WHEN ({_CRUMB_F}) = '' THEN f_run ELSE ({_CRUMB_F}) END,
           d.title
         ) AS heading,
         t.seg_text AS text
  FROM texts t
  LEFT JOIN last_state l ON l.l_doc = t.t_doc
  JOIN docs d ON d.doc_id = t.t_doc
  WHERE t.t_seg = coalesce(l.H, 0)
)
SELECT * FROM emit_h UNION ALL SELECT * FROM flush
"""
