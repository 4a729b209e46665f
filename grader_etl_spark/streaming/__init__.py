"""Structured Streaming rendition of the reference's implicit
streaming semantics (SURVEY.md §2.8)."""
