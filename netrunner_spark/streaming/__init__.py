"""Structured Streaming surface (engine extension; the reference is
batch-with-a-loop, SURVEY.md §2.8 — no event-time constructs exist
there). These operators give the frontier a continuous ingestion path."""
