"""Oracle result-type hygiene.

The driver's correctness gate fetches DuckDB oracle results through a
pandas/Arrow path where DuckDB's HUGEINT (integer ``sum()``, including
window sums) and DECIMAL literals degrade to float64 / decimal128 —
stringifying differently from Spark's BIGINT/DOUBLE and breaking the
value hash while row count and schema stay green (exactly the round-4
``text_token_stats`` failure). This sweep runs every ``oracle_sql()``
entry on DuckDB at sf0.001 and fails on any decimal-typed output
column, so an uncast HUGEINT never reaches the gate again.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    # DuckDB's default reservation (80% of RAM) malloc-fails when Spark
    # JVMs hold the box — same cap as tools/check_correctness.py
    c.execute("SET memory_limit='12GB'")
    c.execute("SET threads=8")
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_oracle_has_no_decimal_columns(con, name):
    sql = entry_mod.oracle_sql()[name]
    schema = con.execute(sql).arrow().schema
    bad = [f.name for f in schema if "decimal" in str(f.type).lower()]
    assert not bad, (
        f"{name}: oracle columns {bad} are HUGEINT/DECIMAL — wrap in "
        "CAST(... AS BIGINT/DOUBLE) so the driver's Arrow/pandas fetch "
        "stringifies identically to Spark"
    )
