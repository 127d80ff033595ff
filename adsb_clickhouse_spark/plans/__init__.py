"""Physical table management: history storage, current-state upsert,
TTL/compaction maintenance (SURVEY.md §2.1 S2/S3, §4)."""
