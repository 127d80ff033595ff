"""ANN storage layouts: the at-scale half of the similarity operators.

The ANN docstrings promise that at 100 TB the corpus is *stored*
partitioned by its index key (LSH ``bucket`` or IVF ``list_id``) so a
probe is a partition-pruned scan instead of a corpus scan. This module
is that promise made concrete: write the bucketed/assigned corpus as a
directory-partitioned parquet layout, and probe it back with a filter
that Spark turns into partition pruning (the scan's PartitionFilters —
asserted by tests/test_dataops.py::test_ann_layout_probe_prunes).

The same two functions serve both index families; only the key column
differs (``bucket`` from hash_corpus, ``list_id`` from ivf_build).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_ann_layout(
    indexed_corpus: DataFrame,
    path: str,
    *,
    key_col: str,
    sort_col: str | None = None,
) -> None:
    """Persist an indexed corpus partitioned by its index key.

    ``indexed_corpus`` is hash_corpus output (has ``bucket``) or
    corpus ⋈ ivf_build assignments (has ``list_id``). One directory per
    key value; pass ``sort_col`` (the row id) to additionally sort
    within each partition so per-id lookups skip row groups (same
    discipline as the history table's within-file sort,
    plans/tables.py). Explicit rather than guessed — a name heuristic
    would happily pick the partition key or an array column."""
    if sort_col == key_col:
        raise ValueError("sort_col must differ from the partition key")
    df = indexed_corpus.repartition(F.col(key_col))
    if sort_col is not None:
        df = df.sortWithinPartitions(key_col, sort_col)
    df.write.mode("overwrite").partitionBy(key_col).parquet(path)


def probe_ann_layout(
    spark: SparkSession,
    path: str,
    keys: Sequence[int],
    *,
    key_col: str,
) -> DataFrame:
    """Read only the probed partitions of a stored ANN layout.

    The ``isin`` filter on the partition column reaches the scan as a
    PartitionFilter — Spark lists only the matching ``key=value``
    directories, so probe cost is proportional to nprobe/n_keys of the
    corpus regardless of corpus size."""
    return spark.read.parquet(path).filter(
        F.col(key_col).isin([int(k) for k in keys])
    )


def write_curated_layout(
    curated: DataFrame,
    path: str,
    *,
    partition_cols: Sequence[str] = ("split", "predicted_lang"),
    sort_col: str | None = "doc_id",
) -> None:
    """Persist a curated corpus partitioned by its consumption keys —
    by default (split, predicted_lang), so a training reader of ONE
    split (or one language slice) lists only its own directories and a
    per-doc lookup skips row groups via the within-file doc_id sort.
    The storage-side twin of ``curate_documents(assign_splits=True)``
    output: at 100 TB "give me the English train split" must be a
    partition-pruned scan, never a corpus scan + filter
    (tests/test_curation.py asserts the PartitionFilters reach the
    scan, same discipline as the ANN layouts above)."""
    cols = list(partition_cols)
    if not cols:
        raise ValueError("need at least one partition column")
    if sort_col in cols:
        raise ValueError("sort_col must differ from the partition keys")
    df = curated.repartition(*[F.col(c) for c in cols])
    if sort_col is not None:
        df = df.sortWithinPartitions(*cols, sort_col)
    df.write.mode("overwrite").partitionBy(*cols).parquet(path)


def append_curated_layout(
    curated: DataFrame,
    path: str,
    *,
    partition_cols: Sequence[str] = ("split", "predicted_lang"),
    sort_col: str | None = "doc_id",
) -> None:
    """Append one curation run's output to an existing curated layout —
    same partitioning/sort discipline as ``write_curated_layout`` but
    additive: each run adds its own files inside the (split, lang)
    directories. Per-run appends accrete small files; run
    ``compact_curated_layout`` periodically to fold a partition's files
    back to a bounded count (the same closed-partition compaction
    discipline as plans/tables.compact_partition)."""
    cols = list(partition_cols)
    if not cols:
        raise ValueError("need at least one partition column")
    if sort_col in cols:
        raise ValueError("sort_col must differ from the partition keys")
    df = curated.repartition(*[F.col(c) for c in cols])
    if sort_col is not None:
        df = df.sortWithinPartitions(*cols, sort_col)
    df.write.mode("append").partitionBy(*cols).parquet(path)


def compact_curated_layout(
    spark: SparkSession,
    path: str,
    *,
    partition_cols: Sequence[str] = ("split", "predicted_lang"),
    sort_col: str | None = "doc_id",
    target_files: int = 1,
) -> dict:
    """OPTIMIZE analogue for an appended-to curated layout: rewrite each
    leaf partition directory's accumulated per-run files into
    ``target_files`` sorted files, swapped in atomically per leaf (the
    displaced directory gets a dot-prefixed name partition discovery
    ignores, exactly like plans/tables._atomic_swap). Directory names
    are untouched, so partition pruning pins identically before and
    after. Single-writer maintenance job — run it when no append is in
    flight. Returns per-leaf before/after file counts."""
    import os

    from ..plans.storeio import storeio_for
    from ..plans.tables import _atomic_swap

    # the leaf walk goes through the StoreIO seam (r13 verdict item 3):
    # a raw os.listdir on a remote data-plane path would silently no-op
    # the leaf discovery; the seam's loud guard fires instead
    io = storeio_for(path)

    cols = list(partition_cols)
    depth = len(cols)
    if depth == 0:
        raise ValueError("need at least one partition column")

    def _leaves(d: str, level: int) -> list[str]:
        if level == depth:
            return [d]
        out: list[str] = []
        prefix = cols[level] + "="
        for e in sorted(io.listdir(d)):
            if e.startswith(prefix) and io.isdir(os.path.join(d, e)):
                out += _leaves(os.path.join(d, e), level + 1)
        return out

    stats: dict[str, dict[str, int]] = {}
    for leaf in _leaves(path, 0):
        before = [e for e in io.listdir(leaf) if e.endswith(".parquet")]
        if len(before) <= target_files:
            continue
        df = spark.read.parquet(leaf)
        if sort_col is not None:
            df = df.repartition(int(target_files)).sortWithinPartitions(sort_col)
        else:
            df = df.repartition(int(target_files))
        staging = os.path.join(
            os.path.dirname(leaf), f".compact-staging.{os.path.basename(leaf)}"
        )
        df.write.mode("overwrite").parquet(staging)
        _atomic_swap(staging, leaf)
        after = [e for e in io.listdir(leaf) if e.endswith(".parquet")]
        rel = os.path.relpath(leaf, path)
        stats[rel] = {"files_before": len(before), "files_after": len(after)}
    return stats


def read_curated_split(
    spark: SparkSession,
    path: str,
    *,
    split: str,
    langs: Sequence[str] | None = None,
) -> DataFrame:
    """Read one split (optionally narrowed to languages) of a stored
    curated layout with partition pruning."""
    df = spark.read.parquet(path).filter(F.col("split") == split)
    if langs is not None:
        df = df.filter(F.col("predicted_lang").isin(list(langs)))
    return df
