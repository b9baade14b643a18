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
