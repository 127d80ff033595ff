"""The MV cascade as one streaming query per source (SURVEY.md §3.1).

Reference dataflow (schema/schema-local.sql):

    Kafka topic → Kafka-engine table → cleansing MV → history MergeTree
                                     → recency MV   → ReplacingMergeTree
                                     → projection MV → combined Replacing

Spark design: ``readStream → from_json → foreachBatch{ cleanse; append
history; upsert state; upsert combined }``. The foreachBatch body
reproduces the MV cascade per micro-batch.

Delivery semantics (honest version):

- **state / combined** — effectively exactly-once: the upserts are
  idempotent (argmax semantics), so a retried batch converges to the
  same state.
- **history** — at-least-once in the narrow window where a cascade
  crashes between the history append and the batch commit marker. A
  fully-processed batch that gets re-delivered (the common foreachBatch
  replay: sink work finished, checkpoint commit didn't) is skipped via
  the per-batch marker in ``_commits/``. Duplicates from the crash
  window never affect state (argmax) and can be removed from history
  reads with ``tables.read_history(..., dedupe=True)``. True
  exactly-once history needs a transactional sink (Delta) — documented
  swap point in plans/tables.py.

Trigger cadence and batch-size caps mirror the per-topic
kafka_flush_interval_ms / kafka_max_block_size settings
(manifests/adsb-clickhouse/30-clickhouse-local.yaml.example:49-51) via
``SourceConfig.trigger`` / ``max_rows_per_trigger``.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import SourceConfig
from ..functions.cleanse import cleanse
from ..operators.combined import to_combined
from ..plans import tables


class IngestPipeline:
    """Per-source ingestion cascade writing history + state + combined."""

    def __init__(self, cfg: SourceConfig, base_dir: str, *, now: datetime | None = None):
        self.cfg = cfg
        self.base = base_dir
        self.now = now  # injectable wall-clock for deterministic tests
        self.history_path = os.path.join(base_dir, cfg.name, "history")
        self.state_path = os.path.join(base_dir, cfg.name, "state")
        self.combined_path = os.path.join(base_dir, "combined", "state")
        self.commits_dir = os.path.join(base_dir, cfg.name, "_commits")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.commits_dir, f"batch_{batch_id}")

    # -- the MV cascade body (used by both batch and streaming) ------------

    def process_batch(self, raw: DataFrame, batch_id: int | None = None) -> None:
        if batch_id is not None and os.path.exists(self._marker(batch_id)):
            return  # replay of a fully-committed batch (module docstring)
        ingestion = F.lit(self.now).cast("timestamp") if self.now else F.current_timestamp()
        clean = cleanse(raw, self.cfg, ingestion_time=ingestion)
        # multiple sinks consume the cleansed batch — materialize it once
        clean.persist()
        try:
            # MV 1: history append (schema-local.sql:199-293 → 183-187)
            tables.append_history(clean, self.history_path)
            # MV 2: current-state upsert (schema-local.sql:384-446 → 370-372)
            tables.upsert_state(
                clean,
                self.state_path,
                ttl=self.cfg.state_ttl,
                now=self.now,
            )
            # MV 3: combined projection upsert (schema-global-combined.sql:42-108)
            now_col = F.lit(self.now).cast("timestamp") if self.now else None
            combined = to_combined(clean, now=now_col)
            tables.upsert_state(
                combined,
                self.combined_path,
                ttl="1 hour",
                now=self.now,
            )
        finally:
            clean.unpersist()
        if batch_id is not None:
            os.makedirs(self.commits_dir, exist_ok=True)
            with open(self._marker(batch_id), "w") as fh:
                fh.write("")

    # -- streaming entry ----------------------------------------------------

    def start(self, raw_stream: DataFrame, checkpoint_dir: str) -> StreamingQuery:
        """Attach the cascade to an unbounded raw DataFrame. The checkpoint
        dir reproduces Kafka consumer-group offset tracking (ST5)."""
        return (
            raw_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(processingTime=self.cfg.trigger)
            .start()
        )

    # -- query surface --------------------------------------------------------

    def latest(self, spark) -> DataFrame:
        """The positions_<source>_latest view (schema-local.sql:455-460)."""
        from ..operators.latest import latest_view

        now_col = F.lit(self.now).cast("timestamp") if self.now else None
        state = tables.read_state(spark, self.state_path)
        return latest_view(state, freshness=self.cfg.freshness, now=now_col)

    def combined_latest(self, spark) -> DataFrame:
        from ..operators.latest import latest_view

        now_col = F.lit(self.now).cast("timestamp") if self.now else None
        state = tables.read_state(spark, self.combined_path)
        return latest_view(state, freshness="5 minutes", now=now_col)
