"""Structured Streaming variants (optional stretch — SURVEY.md Table B)."""

from .stream_extract import stream_extraction, windowed_event_counts

__all__ = ["stream_extraction", "windowed_event_counts"]
