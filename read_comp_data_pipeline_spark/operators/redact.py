"""PII-style redaction — training-data hygiene.

Standard pretraining hygiene (C4/Dolma-style) scrubs personally
identifying surface forms — email addresses, IPv4 addresses, long digit
runs (phone/account numbers) — before a document becomes training data.
The pass is purely lexical: fixed regex classes, fixed replacement
tokens, plus per-document match counts so downstream filters can drop
documents that are mostly PII (a contact-scrape page is not prose).

Scale shape: everything is a Column expression over the scan — zero
shuffles, zero UDFs, folded into whole-stage codegen alongside whatever
projection already reads ``text``. A 100 TB corpus pays exactly one
pass, and the counts ride the same projection as the rewrite.

The three classes are applied in a fixed order (email → IPv4 → digit
run), each stage counting THEN rewriting on the previous stage's output,
so a digit run inside an already-redacted email is never double-counted.
Patterns stay inside the regex dialect intersection of Java
(``java.util.regex``, what Spark executes) and RE2 (what the DuckDB
oracle executes): character classes, bounded repetition, non-capturing
groups, and ASCII word boundaries behave identically in both.

Reference analogue: none — the reference crawler stores page text
verbatim (``/root/reference/search_scrape.py``); this is part of the
training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in order; patterns are valid and
# equivalent in both Java regex (Spark) and RE2 (DuckDB oracle)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("number", r"\b\d{7,15}\b", "<NUM>"),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Count and rewrite the three PII classes in ``text_col``.

    Returns (doc_id, n_email, n_ipv4, n_number, redacted_text); NULL
    text is treated as '' (zero counts, empty output) so the row never
    drops out of the hygiene report.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    for name, pat, rep in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        text = F.regexp_replace(text, pat, rep)
    return df.select(
        F.col(id_col).alias("doc_id"), *counts, text.alias("redacted_text")
    )


def redact_pii_oracle_sql(source_rel: str = "documents") -> str:
    """DuckDB mirror of :func:`redact_pii` over ``source_rel`` — the same
    staged count-then-rewrite, with the 'g' flag (DuckDB replaces only
    the first match by default; Spark replaces all)."""
    stages, prev = [], "coalesce(text, '')"
    for i, (name, pat, rep) in enumerate(PII_PATTERNS):
        lit = pat.replace("'", "''")
        stages.append(
            f"rp_s{i} AS (SELECT *, regexp_replace({prev}, '{lit}', '{rep}', 'g')"
            f" AS t{i} FROM {'rp_s' + str(i - 1) if i else source_rel})"
        )
        prev = f"t{i}"
    last = len(PII_PATTERNS) - 1
    # counts must be staged too: n_<k> is measured on stage k-1's text
    count_cols = ["doc_id"]
    for i, (name, pat, _) in enumerate(PII_PATTERNS):
        lit = pat.replace("'", "''")
        src = f"t{i - 1}" if i else "coalesce(text, '')"
        count_cols.append(
            f"CAST(len(regexp_extract_all({src}, '{lit}')) AS BIGINT) AS n_{name}"
        )
    return (
        ",\n".join(stages)
        + f""",
    rp_out AS (
      SELECT {', '.join(count_cols)}, t{last} AS redacted_text
      FROM rp_s{last}
    )
    """
    )
