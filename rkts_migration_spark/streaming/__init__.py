"""Incremental processing. The reference is strictly batch
(migrate.php is a sequential script; SURVEY.md §2.9), and the
production design here is batch-over-Iceberg-snapshots with resumable
checkpoints. This package adds the Structured Streaming variant for
continuously-arriving transcripts: same triple semantics, micro-batch
execution via foreachBatch so every batch reuses the EXACT batch
operators (no second implementation to drift)."""

from .incremental import (  # noqa: F401
    stream_from_directory,
    stream_kg_ingest,
    stream_triples,
)
