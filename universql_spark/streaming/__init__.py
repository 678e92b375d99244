"""Structured Streaming extension (SURVEY.md §2.9: the reference is
batch-only; the events fixture invites the streaming twin of its windowed
aggregations)."""
