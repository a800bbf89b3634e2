"""Operator inventory: batch-relational (SURVEY §2.3 O1-O26),
windowed/event-time, CDC/upsert, and large-scale data-pipeline
operators (dedup, similarity search, text analysis, multimodal)."""
