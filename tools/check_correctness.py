"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, schema
shape, and an order-insensitive value hash (columns sorted by name, rows
sorted, values stringified). Mirrors the driver's CORRECTNESS_r{N}.json
semantics so we catch mismatches before the round gate does.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")


def norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="seconds")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from adsb_clickhouse_spark.session import get_spark

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    # modest cap: DuckDB's default reservation is 80% of RAM, which
    # malloc-fails when Spark JVMs hold most of the box — the oracles
    # need far less than this
    con.execute("SET memory_limit='12GB'")
    con.execute("SET threads=8")
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            n_fail += 1
            continue
        # Complex-type gate: the driver canonicalizes by pandas
        # sort_values over every column, and a list/map/struct cell is
        # unhashable there (round-7 text_lm_bpe failure). Our norm_cell
        # stringifies lists, so without this guard the local gate passes
        # where the driver crashes. Serialize arrays to strings in both
        # the Spark query and the oracle instead.
        complex_cols = [
            f.name
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if complex_cols:
            print(
                f"FAIL {name}: columns {complex_cols} are array/map/"
                "struct — the driver's pandas canonicalizer cannot sort "
                "these; serialize to string on both sides"
            )
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows={len(srows)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            # Type-hygiene gate first: DuckDB integer window/plain sum()
            # returns HUGEINT (→ arrow decimal128(38,0)), which survives
            # fetchall() as exact ints locally but degrades to float64 /
            # Decimal through the pandas/Arrow fetch paths a driver
            # harness uses — silently breaking the value hash while rows
            # and schema stay green. Fail loudly here instead.
            atbl = con.execute(oracles[name]).arrow()
            bad = [
                f.name for f in atbl.schema
                if "decimal" in str(f.type).lower()
            ]
            if bad:
                print(
                    f"FAIL {name}: oracle columns {bad} are "
                    "HUGEINT/DECIMAL — CAST them (AS BIGINT/DOUBLE) so "
                    "driver-side Arrow/pandas fetch matches Spark types"
                )
                n_fail += 1
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            problems.append(f"schema spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            hs, hd = value_hash(scols, srows), value_hash(dcols, drows)
            if hs != hd:
                problems.append("value-hash mismatch")
                # show first differing row for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())
                ls = sorted("|".join(norm_cell(r[i]) for i in order_s) for r in srows)
                ld = sorted("|".join(norm_cell(r[i]) for i in order_d) for r in drows)
                for a, b in zip(ls, ld):
                    if a != b:
                        problems.append(f"  spark : {a[:200]}")
                        problems.append(f"  duckdb: {b[:200]}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
