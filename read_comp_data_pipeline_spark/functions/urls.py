"""URL predicates & normalizers (SURVEY §2.2 P1-P4) — single Column
expressions so Catalyst folds them into one codegen'd predicate and pushes
them into scans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WIKI_BASE = "https://en.wikipedia.org"

# The 18-clause conjunction of search_scrape.py:120-140: reject namespace
# pages, edit links, media extensions, fragment-only links, off-site http.
_REJECT_SUBSTRINGS = [
    "File:", "Wikipedia:", "Template:", "Template_talk:", "Help:",
    "Category:", "Talk:", "User:", "User_talk:", "Special:Contributions",
    "edit",
]
_REJECT_EXTENSIONS = [".svg", ".jpg", ".png", ".js", ".mp3", ".mp4"]


def url_accept(url: Column) -> Column:
    """P1 — accept iff no reject clause fires (search_scrape.py:120-140)."""
    cond = F.lit(True)
    for s in _REJECT_SUBSTRINGS:
        cond = cond & ~url.contains(s)
    for ext in _REJECT_EXTENSIONS:
        cond = cond & ~url.endswith(ext)
    cond = cond & ~url.startswith("#")
    cond = cond & ~(url.startswith("http") & ~url.contains("wikipedia.org"))
    return cond


def is_namespace_page(url: Column) -> Column:
    """P2 — ':' in the first path token after /wiki/
    (search_scrape.py:68-82). NOTE: defined but DISABLED in the reference
    (commented out of both predicates at :96 and :121); kept here with the
    same status — available, not wired into url_accept."""
    token = F.substring_index(F.substring_index(url, "/wiki/", -1), "/", 1)
    return token.contains(":")


def strip_fragment(url: Column) -> Column:
    """P3 — drop '#...' suffix (search_scrape.py:56-65)."""
    return F.substring_index(url, "#", 1)


def absolutize(href: Column, base: str = WIKI_BASE) -> Column:
    """P4 — prefix the base onto root-relative hrefs (search_scrape.py:23-28)."""
    return F.when(href.startswith("/"), F.concat(F.lit(base), href)).otherwise(href)


def title_to_filename(title: Column) -> Column:
    """S6 filename mangle: ' '→'_', '/'→'-' (search_scrape.py:418, :1141)."""
    return F.translate(title, " /", "_-")


def filename_to_title(fname: Column) -> Column:
    """J3 inverse transform: strip .txt, '_'→' ' (query_gpt.py:38-39)."""
    return F.regexp_replace(F.regexp_replace(fname, r"\.txt$", ""), "_", " ")
