"""General relational operator corpus (SURVEY.md §2.3-§2.8) over the
driver's TPC-H-ish tables, each with a DuckDB oracle.

The reference gets these operators from ClickHouse for free ("it *uses*
ClickHouse" — SURVEY.md intro); our engine gets them from Spark SQL. Each
query is written DataFrame-first and aliased so Spark and oracle column
names match exactly. Float aggregates are rounded identically on both
sides to make the value-hash comparison order-insensitive-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load_table, register


# --- aggregation (A2/A3; TPC-H Q1 shape) -----------------------------------

@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                      AS sum_qty,
           round(sum(l_extendedprice), 2)                                 AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)              AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                      AS avg_qty,
           round(avg(l_extendedprice), 4)                                 AS avg_price,
           round(avg(l_discount), 4)                                      AS avg_disc,
           count(*)                                                       AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="Partial+final hash aggregation (SURVEY §2.4 A3); Catalyst map-side combines.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q06_revenue_forecast",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="Filter+scalar agg; predicates push to the parquet scan.",
)
def q06_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


# --- joins (SURVEY §2.3: "joins come for free from Spark SQL") -------------

@register(
    "q03_order_revenue",
    """
    SELECT o.o_orderkey AS o_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate AS o_orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="3-way join + agg + top-k (TPC-H Q3 shape).",
)
def q03_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "q05_region_revenue",
    """
    SELECT n.n_name AS n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="6-way join; region/nation are broadcast (tiny dims) — no shuffle for them.",
)
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q_semi_anti_joins",
    """
    SELECT 'semi' AS branch, CAST(NULL AS BIGINT) AS c_custkey,
           CAST(NULL AS VARCHAR) AS c_name,
           (SELECT count(*) FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 100000)) AS n_customers
    UNION ALL
    SELECT 'anti' AS branch, c.c_custkey AS c_custkey, c.c_name AS c_name,
           CAST(NULL AS BIGINT) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY branch, c_custkey
    """,
    doc=(
        "LEFT SEMI (EXISTS) and LEFT ANTI (NOT EXISTS) joins, one tagged "
        "union (merged in round 7 to hold the registry at the driver's "
        "50-row gate limit while freeing a slot for text_dsir_select — "
        "same precedent as the round-2 registry merges; both operators "
        "stay individually hash-verified through their branches)."
    ),
)
def q_semi_anti_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    semi = (
        c.join(
            o.filter(F.col("o_totalprice") > 100000),
            c.c_custkey == o.o_custkey,
            "left_semi",
        )
        .agg(F.count("*").alias("n_customers"))
        .select(
            F.lit("semi").alias("branch"),
            F.lit(None).cast("long").alias("c_custkey"),
            F.lit(None).cast("string").alias("c_name"),
            "n_customers",
        )
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.lit("anti").alias("branch"),
        "c_custkey",
        "c_name",
        F.lit(None).cast("long").alias("n_customers"),
    )
    return anti.unionByName(semi).orderBy("branch", "c_custkey")


# --- windows (SURVEY §2.5) --------------------------------------------------

@register(
    "q_top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    ORDER BY o_custkey, o_totalprice DESC, o_orderkey
    """,
    doc="Top-k per group — the W1 window pattern generalized to k>1.",
)
def q_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", F.desc("o_totalprice"), "o_orderkey")
    )


@register(
    "q_running_revenue_per_customer",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_total
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    doc="Explicit frame spec (rowsBetween) — analytic window.",
)
def q_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "q_order_gap_days",
    """
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     lag(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS gap_days
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    doc="lag() analytic — track-reconstruction shape (SURVEY §2.5 note).",
)
def q_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap_days"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --- grouping sets / pivot / distinct (§2.4 extensions) ---------------------

@register(
    "q_rollup_order_priority",
    """
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    doc="ROLLUP grouping sets.",
)
def q_rollup_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy(F.col("o_orderpriority").asc_nulls_first(), F.col("o_orderstatus").asc_nulls_first())
    )


@register(
    "q_pivot_event_counts",
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'error')    AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Pivot (conditional aggregation).",
)
def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .orderBy("user_id")
    )


@register(
    "q_distinct_counts",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc=(
        "DISTINCT aggregate + exact interpolated percentiles in one grouped "
        "pass (Spark percentile == DuckDB quantile_cont). Formerly two "
        "queries (q_distinct_counts, q_percentiles) — merged because the "
        "driver gate checks at most 50 registry entries."
    ),
)
def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        )
        .orderBy("event_type")
    )


# --- set operations (§2.7) ---------------------------------------------------

@register(
    "q_union_intersect_except",
    """
    WITH hi AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000),
         recent AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01')
    SELECT 'union' AS op, count(*) AS n FROM (SELECT DISTINCT o_custkey FROM (SELECT * FROM hi UNION SELECT * FROM recent))
    UNION ALL
    SELECT 'intersect' AS op, count(*) AS n FROM (SELECT DISTINCT * FROM (SELECT * FROM hi INTERSECT SELECT * FROM recent))
    UNION ALL
    SELECT 'except' AS op, count(*) AS n FROM (SELECT DISTINCT * FROM (SELECT * FROM hi EXCEPT SELECT * FROM recent))
    ORDER BY op
    """,
    doc="UNION / INTERSECT / EXCEPT counts.",
)
def q_union_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 200000).select("o_custkey")
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")).select("o_custkey")
    rows = [
        hi.union(recent).distinct().agg(F.lit("union").alias("op"), F.count("*").alias("n")),
        hi.intersect(recent).agg(F.lit("intersect").alias("op"), F.count("*").alias("n")),
        hi.subtract(recent).agg(F.lit("except").alias("op"), F.count("*").alias("n")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("op")


# --- as-of join (custom operator; Spark lacks a native one) -----------------

@register(
    "q_asof_last_error_before_purchase",
    """
    SELECT p.event_id AS purchase_id, p.user_id AS user_id,
           p.ts AS purchase_ts, e.ts AS last_error_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id AND p.ts >= e.ts
    ORDER BY purchase_id
    """,
    doc=(
        "As-of join composed from built-ins: tag+union both streams, single "
        "window pass carries the last error ts forward (no O(n^2) range join, "
        "one shuffle on user_id). pyspark_guide 'Common OLAP patterns'."
    ),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id"), F.lit(1).alias("is_p")
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.lit(None).cast("long").alias("event_id"), F.lit(0).alias("is_p")
    )
    unioned = purchases.unionByName(errors)
    # errors sort before purchases at equal ts (is_p asc) → `>=` semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    err_ts = F.last(F.when(F.col("is_p") == 0, F.col("ts")), ignorenulls=True).over(w)
    return (
        unioned.withColumn("last_error_ts", err_ts)
        .filter(F.col("is_p") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "last_error_ts",
        )
        .orderBy("purchase_id")
    )


# --- JSON extraction (raw-payload shape; §2.8 note) --------------------------

@register(
    "q_json_extract_props",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY k_mod
    ORDER BY k_mod
    """,
    doc="JSON field extraction (reference decodes JSONEachRow at ingest; here ad-hoc).",
)
def q_json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy((k % 10).alias("k_mod"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("k_mod")
    )
