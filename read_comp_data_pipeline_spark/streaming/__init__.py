"""Streaming: resumable epoch-loop ingest + Structured Streaming variant."""
