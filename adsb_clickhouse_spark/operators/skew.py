"""Skew-aware join utilities (SURVEY.md 'Partitioning & shuffle').

At 100 TB a handful of hot keys (a mega-airport's traffic, a bot user)
can stall an entire shuffle stage. Two standard remedies, both plain
DataFrame composition:

- **AQE skew-join** (``spark.sql.adaptive.skewJoin.enabled``, on by
  default in session.py) — handles skew between *shuffle partitions*
  automatically at runtime. Prefer it.
- **salting** — when one key is so hot that even a split partition is one
  key's rows (AQE cannot split a single key across joins), explode the
  small side N ways and scatter the large side's hot key across N
  sub-keys. This is that operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join `large ⋈ small` on `key` with an N-way salt.

    The large side gets a uniform random salt in [0, N); the small side is
    replicated N times (explode of a literal range — it is the *small*
    side, so N× replication is cheap). Each (key, salt) shuffle bucket
    then holds ~1/N of any hot key's rows.
    """
    salted_large = large.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_large.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")
