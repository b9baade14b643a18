"""W1 scanner semantics — behavioral parity with the reference's stateful
scan (search_scrape.py:1150-1336), including its quirks."""

from __future__ import annotations

from read_comp_data_pipeline_spark.functions.extract import (
    extract_page_metadata,
    scan_sections,
)


def test_plain_text_no_headers_emits_one_row_with_title_fallback():
    out = scan_sections("Page Title", "line one\nline two")
    assert out == [("Page Title", "line one line two")]


def test_h2_emits_previous_section_then_tracks_breadcrumb():
    content = "intro\n== Alpha ==\nbody a\n=== Beta ===\nbody b\n== Gamma ==\ntail"
    out = scan_sections("T", content)
    # emit happens BEFORE updating prevs: first row is the pre-header text
    assert out[0] == ("T", "intro")
    assert out[1] == ("Alpha", "body a")
    assert out[2] == ("Alpha - Beta", "body b")
    assert out[3] == ("Gamma", "tail")


def test_header_line_emits_even_with_empty_description():
    out = scan_sections("T", "== A ==\n== B ==\nx")
    assert out[0] == ("T", "")
    assert out[1] == ("A", "")
    assert out[2] == ("B", "x")


def test_references_break_only_on_h2():
    content = "a\n=== References deep ===\nstill here\n== References ==\ngone\n== After ==\nnope"
    out = scan_sections("T", content)
    # h3 'References deep' does NOT break; h2 'References' does.
    assert ("T", "a") in out
    headings = [h for h, _ in out]
    assert not any("After" in h for h in headings)
    # nothing after the break is emitted (no final flush of 'gone')
    assert all("gone" not in t for _, t in out)


def test_notes_break_and_no_final_flush():
    out = scan_sections("T", "x\n== Notes ==\nhidden tail")
    assert out == [("T", "x")]


def test_h5_replace_quirk_leaves_equals_wrapper():
    # reference h5 branch strips with replace("===","") on a 5-equals fence,
    # leaving '== H ==' as the stored header (search_scrape.py:497)
    content = "===== Five =====\nbody\n====== Six ======\nz"
    out = scan_sections("T", content)
    assert out[0] == ("T", "")
    # h5 header stored with wrapper; appears in next breadcrumb (leading ' - '
    # because prev_h2 is empty — reference quirk)
    assert out[1] == (" - == Five ==", "body")


def test_marker_found_anywhere_in_line_triggers():
    # 'find' not 'startswith': marker mid-line still dispatches
    out = scan_sections("T", "text == Mid == more\nafter")
    assert out[0] == ("T", "")
    assert out[1][0] == "text  Mid  more"  # '==' removed, rest kept
    assert out[1][1] == "after"


def test_deeper_header_resets_deeper_levels():
    content = "== A ==\n=== B ===\n==== C ====\n=== D ===\nbody"
    out = scan_sections("T", content)
    assert out[-1] == ("A - D", "body")  # C reset when D (h3) arrived


def test_delete_content_none():
    assert scan_sections("T", None) == []


def test_metadata_fallback_chains():
    html = (
        "<html><head><title>Main Title</title>"
        '<meta name="description" content="desc here">'
        '<meta name="theme-color" content="#fff">'
        '<link rel="icon" href="/fav.ico"></head>'
        "<body><h1>H1</h1><p>para</p><img src='x.png'></body></html>"
    )
    m = extract_page_metadata(html, "http://ex.com")
    assert m["title"] == "Main Title"
    assert m["description"] == "desc here"
    assert m["image"] == "x.png"
    assert m["favicon"] == "/fav.ico"
    assert m["theme_color"] == "#fff"
    # fallbacks
    m2 = extract_page_metadata("<html><body><h1>Only H1</h1><p>p1</p></body></html>", "http://ex.com/")
    assert m2["title"] == "Only H1"
    assert m2["description"] == "p1"
    assert m2["favicon"] == "http://ex.com/favicon.ico"
    m3 = extract_page_metadata(None)
    assert all(v is None for v in m3.values())


def test_first_section_equals_full_scan():
    """scan_first_section must equal scan_sections(...)[0] on every input
    that yields sections — tricky battery + deterministic grammar sweep."""
    import hashlib

    from read_comp_data_pipeline_spark.functions.extract import (
        scan_first_section,
        scan_sections,
    )

    docs = [
        None, "", "plain text only", "== A ==", "x\n== A ==\nbody",
        "text == mid == marker", "====== deep ======\nx", "\n", "\n\n",
        "a\n\nb", "  spaced  \n== H ==", "== References ==\nhidden",
    ]
    for seed in range(60):
        h = hashlib.md5(str(seed).encode()).digest()
        lines = []
        for i, byte in enumerate(h):
            kind = byte % 7
            if kind == 0:
                lines.append(f"== w{byte} ==")
            elif kind == 1:
                lines.append(f"===== w{byte} =====")
            elif kind == 2:
                lines.append("")
            elif kind == 3:
                lines.append(f"mid == w{byte} == marker")
            else:
                lines.append(f"plain w{byte} line {i}")
        docs.append("\n".join(lines))
    for d in docs:
        full = scan_sections("T", d)
        first = scan_first_section("T", d)
        if d is None:
            assert first == (None, None)
        else:
            assert full, f"scan_sections empty for non-null content {d!r}"
            assert first == full[0], (d, first, full[0])


def test_ingest_handles_empty_string_content(spark, tmp_path):
    """An upsert whose content is the empty string must ingest cleanly
    (heading = title fallback, empty text) — not trip ANSI element_at."""
    import datetime as dt

    from pyspark.sql import types as T

    from read_comp_data_pipeline_spark.operators.merge import HashMergeTable
    from read_comp_data_pipeline_spark.schemas import WAL_SCHEMA
    from read_comp_data_pipeline_spark.streaming.ingest import run_ingest

    rows = [
        (0, 0, dt.datetime(2024, 1, 1), "I", "r1", "empty.py", "c0", "py", ""),
        (1, 0, dt.datetime(2024, 1, 1, 0, 0, 1), "I", "r1", "ok.py", "c1", "py", "hello"),
    ]
    nullable = T.StructType([T.StructField(f.name, f.dataType, True) for f in WAL_SCHEMA.fields])
    wal = str(tmp_path / "wal")
    spark.createDataFrame(rows, nullable).write.partitionBy("epoch").parquet(wal)
    tbl = str(tmp_path / "t")
    run_ingest(spark, wal, tbl, n_buckets=2)
    got = {r["path"]: (r["heading"], r["text"]) for r in HashMergeTable(spark, tbl).read().collect()}
    assert got["empty.py"] == ("empty.py", "")  # title falls back to path
    assert got["ok.py"] == ("hello", "hello")


def test_first_section_exprs_equal_python_scanner(spark):
    """The JVM-expression extraction (ingest hot path since r6) must be
    value-identical to the Python scan_first_section on the tricky battery
    AND on real generator content — any divergence in marker detection,
    prefix slicing or whitespace stripping fails here."""
    from pyspark.sql import functions as F

    from read_comp_data_pipeline_spark.functions.extract import (
        first_section_exprs,
        scan_first_section,
    )
    from read_comp_data_pipeline_spark.sources.wal import generate_change_events

    docs = [
        None, "", "plain text only", "== A ==", "x\n== A ==\nbody",
        "text == mid == marker", "====== deep ======\nx", "\n", "\n\n",
        "a\n\nb", "  spaced  \n== H ==", "== References ==\nhidden",
        "\tlead tab\n== H ==", "line\r\ncrlf\n== H ==", "==nospace==\nx",
        "trailing newline\n", "a\n\n\n== H ==", " == H ==",
    ]
    rows = [(f"T{i}", d) for i, d in enumerate(docs)] + [("", docs[4]), (None, docs[4])]
    df = spark.createDataFrame(rows, "title string, content string")
    h, t = first_section_exprs(F.col("title"), F.col("content"))
    got = df.select("title", "content", h.alias("h"), t.alias("t")).collect()
    for r in got:
        assert (r["h"], r["t"]) == scan_first_section(r["title"], r["content"]), (
            r["title"], r["content"], (r["h"], r["t"]))

    wal = generate_change_events(spark, 300, n_keys=40, epoch_size=100)
    wal = wal.where(F.col("content").isNotNull()).select(
        F.substring("content", 1, 20).alias("title"), "content"
    )
    h, t = first_section_exprs(F.col("title"), F.col("content"))
    for r in wal.select("title", "content", h.alias("h"), t.alias("t")).collect():
        assert (r["h"], r["t"]) == scan_first_section(r["title"], r["content"])
