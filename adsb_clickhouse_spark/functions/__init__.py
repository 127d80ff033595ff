"""Scalar/columnar function layer — all JVM-side builtins, no Python UDFs
on the hot path (matching the reference, which uses only ClickHouse
builtins; SURVEY.md §2.8/§2.10)."""
