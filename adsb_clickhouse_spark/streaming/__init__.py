"""Structured Streaming layer: the reference's Kafka→MV cascade
re-expressed as streaming queries with exactly-once foreachBatch sinks
(SURVEY.md §2.9, §3.1)."""
