"""Relational/dataflow operators (SURVEY.md §2) plus the large-scale
training-data pipeline operators (dedup, similarity, text, multimodal)."""
