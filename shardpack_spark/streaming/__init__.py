"""Structured Streaming surface: windowed aggregations, watermarking,
stateful dedup, stream-static enrichment, and watermarked stream-stream
interval joins over the events stream.

The transformation builders in ``ops`` are batch/stream agnostic — the same
function is applied to a static DataFrame for the oracle-checked declared
queries (Q25-Q27) and to a ``readStream`` DataFrame in the behavioral
pytest suite.  That symmetry is exactly Spark's unified-API contract.

``dedup_stream`` adds continuous corpus ingest: per-micro-batch near-dup
verdicts against a persisted minhash-signature store, replay-idempotent
via batch_id dynamic partition overwrites.
"""

from shardpack_spark.streaming.dedup_stream import (  # noqa: F401
    near_dup_ingest_batch,
    start_near_dup_ingest,
)
