"""Operators: compaction, MERGE sink, dedup, similarity, text analysis."""
