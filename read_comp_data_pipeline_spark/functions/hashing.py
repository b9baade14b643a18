"""Portable deterministic hashing shared by dedup/similarity operators.

Engine-native hashes (xxhash64, DuckDB ``hash``) differ across engines, so
oracle-checked operators use an md5-derived 60-bit integer that computes
identically in Spark and DuckDB:

* Spark  : ``conv(substring(md5(s), 1, 15), 16, 10)`` cast to long
* DuckDB : ``('0x' || substr(md5(s), 1, 15))::bigint``

15 hex digits < 2^60, so the value fits a signed 64-bit integer in both.
Seeded variants prepend ``"{seed}:"`` to the input.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def phash(col: Column, seed: int | None = None) -> Column:
    """Portable 60-bit hash of a string column (same value in DuckDB)."""
    if seed is not None:
        col = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def phash_sql(expr: str, seed: int | None = None) -> str:
    """DuckDB rendering of :func:`phash` for oracle queries."""
    if seed is not None:
        expr = f"'{seed}:' || {expr}"
    return f"('0x' || substr(md5({expr}), 1, 15))::bigint"
