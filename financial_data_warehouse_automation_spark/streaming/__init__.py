"""Structured Streaming wrapper (SURVEY §2.9).

The reference's batch loop — new monthly files appear in a folder, each
is parsed once and upserted by key — is exactly the Structured
Streaming file-source + ``foreachBatch`` pattern; see ``pipeline``.
"""
