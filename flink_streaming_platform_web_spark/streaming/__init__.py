"""Structured-Streaming layer: job runner (JobApplication analog),
upsert/CDC foreachBatch sinks, checkpoint-config mapping."""
