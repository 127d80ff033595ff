"""Row sources: JSON/Kafka readers and deterministic test fixtures."""
