"""adsb_clickhouse_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of
the reference ADS-B ClickHouse pipeline (capgar/adsb_clickhouse):

- streaming ingestion of newline-JSON feeds into typed columnar storage
  (reference: Kafka-engine tables, ``schema/schema-local.sql:26-100``),
- continuous derived tables / MV cascades (``schema/schema-local.sql:199-293``),
- keyed upsert "latest row per aircraft" semantics
  (ReplacingMergeTree + FINAL + LIMIT 1 BY, ``schema/schema-local.sql:370-372,455-460``),
- time-partitioned history storage with TTL (``schema/schema-local.sql:183-187``),
- interactive analytical queries (dashboard rawSql in
  ``dashboards/examples/*.json``).

Everything is expressed with the public PySpark DataFrame/SQL API; Catalyst
and Tungsten supply the physical execution strategy. No RDDs, no Python UDFs
on the hot path.

Beyond the reference surface, :mod:`.operators` adds the large-scale
training-data pipeline operators (dedup, similarity search, text analysis,
multimodal column plumbing) designed for 100 TB scale.
"""

__version__ = "0.1.0"
