"""Native relational operator surface (SURVEY.md §2.2 "In the new engine").

The reference has no relational operators at all (exhaustive grep evidence in
SURVEY.md §2.2); this module is the engine's demonstrated native capability:
scans, filters, projections, hash/broadcast joins, semi/anti joins,
aggregations (incl. ROLLUP/CUBE), window functions, sorts/top-k, set ops,
scalar functions and pivot — all declared via the DataFrame API so Catalyst
owns pushdown, pruning, join selection and AQE.

Every query carries a DuckDB oracle (driver contract). Scale notes per query
explain why the plan survives 100×: filters reach the parquet scan, small
dims are broadcast, window partitioning keys are high-cardinality, and no
driver-side materialization occurs.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.exprs import dsum, money
from .base import Registry, load_table

REL = Registry()

_D = "double"


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------
@REL.register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: full-scan aggregate with 8 aggregates over 2 keys.

    Scale: map-side partial aggregation over 6 group values; the shipdate
    predicate is pushed to the parquet scan (row-group min/max pruning).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price", scale=6),
            dsum(charge, "sum_charge", scale=6),
            (F.sum(money("l_quantity")).cast(_D) / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(money("l_extendedprice")).cast(_D) / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(money("l_discount")).cast(_D) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@REL.register(
    "q6_revenue_forecast",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark, sf_dir):
    """TPC-H Q6 shape: selective scan-aggregate, zero joins.

    Scale: all three predicates push down to parquet; single scalar result.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue", scale=6),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@REL.register(
    "rollup_order_priority",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    """,
)
def rollup_order_priority(spark, sf_dir):
    """Hierarchical ROLLUP aggregate (grouping-sets family)."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total_price"),
    )


@REL.register(
    "cube_part_brand_size",
    oracle="""
    SELECT p_brand, p_size, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM part
    GROUP BY CUBE(p_brand, p_size)
    """,
)
def cube_part_brand_size(spark, sf_dir):
    """CUBE aggregate over two dimensions."""
    p = load_table(spark, sf_dir, "part")
    return p.cube("p_brand", "p_size").agg(
        F.count(F.lit(1)).alias("n_parts"),
        dsum("p_retailprice", "sum_price"),
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------
@REL.register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + aggregate + top-k.

    Scale: `customer` (filtered) is broadcast; orders⋈lineitem is a shuffled
    hash/SMJ on the orderkey; top-10 is a TakeOrdered, no global sort.
    """
    c, o, li = (load_table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem"))
    return (
        li.filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
        .join(
            o.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            c.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                scale=6,
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@REL.register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way star join with region filter.

    Scale: region/nation/supplier/customer are broadcast dims; the only big
    shuffle is orders⋈lineitem on the orderkey.
    """
    c, o, li, s, n, r = (
        load_table(spark, sf_dir, t)
        for t in ("customer", "orders", "lineitem", "supplier", "nation", "region")
    )
    return (
        li.join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                scale=6,
            )
        )
    )


@REL.register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: join + group on customer + top-20 by revenue."""
    c, o, li, n = (
        load_table(spark, sf_dir, t)
        for t in ("customer", "orders", "lineitem", "nation")
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                scale=6,
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@REL.register(
    "semi_customers_with_open_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
)
def semi_customers_with_open_orders(spark, sf_dir):
    """Left-semi join (EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o.filter(F.col("o_orderstatus") == "O"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_semi",
    ).select("c_custkey", "c_name")


@REL.register(
    "anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_customers_without_orders(spark, sf_dir):
    """Left-anti join (NOT EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------
@REL.register(
    "window_top3_suppliers_per_nation",
    oracle="""
    SELECT n_name, s_name, s_acctbal, rn FROM (
      SELECT n_name, s_name, s_acctbal,
             ROW_NUMBER() OVER (PARTITION BY s_nationkey
                                ORDER BY s_acctbal DESC, s_suppkey) AS rn
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
    ) t WHERE rn <= 3
    """,
)
def window_top3_suppliers_per_nation(spark, sf_dir):
    """Top-k per group via row_number window (the canonical top-k pattern)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    w = W.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), "s_suppkey")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("n_name", "s_name", "s_acctbal", "rn")
    )


@REL.register(
    "window_running_customer_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_revenue
    FROM orders
    """,
)
def window_running_customer_revenue(spark, sf_dir):
    """Running (prefix) aggregate per customer.

    Scale: partitions by customer key (high cardinality) — one shuffle, state
    bounded per customer.
    """
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.sum(money("o_totalprice")).over(w).cast(_D).alias("running_revenue"),
    )


@REL.register(
    "window_lag_order_gap",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS gap_days
    FROM orders
    """,
)
def window_lag_order_gap(spark, sf_dir):
    """LAG window: days since the customer's previous order (NULL for first)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    )


# --------------------------------------------------------------------------
# Sort / limit / set ops / scalar functions / pivot
# --------------------------------------------------------------------------
@REL.register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def topk_orders(spark, sf_dir):
    """Global top-k: Spark plans TakeOrderedAndProject (no full sort)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


@REL.register(
    "set_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect_nations(spark, sf_dir):
    """INTERSECT: nations having both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey")).intersect(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


@REL.register(
    "set_except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except_nations(spark, sf_dir):
    """EXCEPT: nations with customers but no suppliers."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey")).subtract(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


@REL.register(
    "set_intersect_all_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect_all_nations(spark, sf_dir):
    """INTERSECT ALL (multiset semantics): one row per nation per
    min(#customers, #suppliers) — the bag form Spark implements as
    ``intersectAll`` via a counted aggregate + generate, no distinct
    collapse. Completes the set-op family next to the DISTINCT forms.

    Scale: same one shuffle on the compared key as INTERSECT; multiset
    counting happens map-side first.
    """
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey")).intersectAll(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


@REL.register(
    "set_except_all_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except_all_nations(spark, sf_dir):
    """EXCEPT ALL (multiset semantics): per nation, max(0, #customers −
    #suppliers) surviving rows — Spark's ``exceptAll``."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey")).exceptAll(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


@REL.register(
    "full_outer_nation_activity",
    oracle="""
    WITH cc AS (
      SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
      FROM customer GROUP BY c_nationkey
    ), ss AS (
      SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
      FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(cc.nationkey, ss.nationkey) AS nationkey,
           CAST(COALESCE(n_customers, 0) AS BIGINT) AS n_customers,
           CAST(COALESCE(n_suppliers, 0) AS BIGINT) AS n_suppliers,
           CASE WHEN cc.nationkey IS NULL THEN 'suppliers_only'
                WHEN ss.nationkey IS NULL THEN 'customers_only'
                ELSE 'both' END AS activity
    FROM cc FULL OUTER JOIN ss ON cc.nationkey = ss.nationkey
    """,
)
def full_outer_nation_activity(spark, sf_dir):
    """FULL OUTER join — the one join type the repo had not yet registered:
    per-nation customer counts against per-nation supplier counts, keeping
    nations that appear on only one side (null-extended, coalesced to 0)
    with a side indicator.

    Scale: both inputs are pre-aggregated to nation cardinality before the
    join, so the outer join itself is tiny regardless of fact-table SF —
    aggregate-then-join, never join-then-aggregate, is the posture that
    survives 100 TB.
    """
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cc = c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    ss = s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    j = cc.join(ss, "nationkey", "full_outer")
    return j.select(
        "nationkey",
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        F.when(F.col("n_customers").isNull(), F.lit("suppliers_only"))
        .when(F.col("n_suppliers").isNull(), F.lit("customers_only"))
        .otherwise(F.lit("both"))
        .alias("activity"),
    )


@REL.register(
    "scalar_part_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           substr(p_type, 1, 5) AS type_prefix,
           length(p_name) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           abs(p_size - 25) AS size_dist,
           p_size % 5 AS size_mod
    FROM part
    """,
)
def scalar_part_functions(spark, sf_dir):
    """Scalar string/math function surface, all JVM-side (codegen'd)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        (F.col("p_size") % 5).alias("size_mod"),
    )


@REL.register(
    "date_functions_orders",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS o_year,
           month(o_orderdate) AS o_month,
           day(o_orderdate) AS o_day,
           quarter(o_orderdate) AS o_quarter,
           isodow(o_orderdate) - 1 AS o_weekday,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
    FROM orders
    """,
)
def date_functions_orders(spark, sf_dir):
    """Date/time scalar function surface (weekday normalized Monday=0)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.weekday("o_orderdate").alias("o_weekday"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
    )


@REL.register(
    "pivot_returnflag_by_linestatus",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_returnflag_by_linestatus(spark, sf_dir):
    """Pivot with explicit value list (no extra value-discovery job)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(money("l_quantity")).cast(_D))
    )


@REL.register(
    "agg_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct_counts(spark, sf_dir):
    """Multi-column COUNT(DISTINCT) aggregate (Catalyst expands to
    partial-distinct aggregation; no driver-side distinct)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@REL.register(
    "grouping_sets_nation_segment",
    oracle="""
    SELECT n_name, c_mktsegment, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (c_mktsegment), (n_name, c_mktsegment))
    """,
)
def grouping_sets_nation_segment(spark, sf_dir):
    """Explicit GROUPING SETS (the general grouping-family form)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    j.createOrReplaceTempView("gs_cust_nation")
    return spark.sql(
        """
        SELECT n_name, c_mktsegment, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM gs_cust_nation
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment), (n_name, c_mktsegment))
        """
    )


@REL.register(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
    UNION ALL
    SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS value FROM part
    """,
)
def unpivot_part_measures(spark, sf_dir):
    """Unpivot (wide→long) via stack()."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr(
            "stack(2, 'size', CAST(p_size AS DOUBLE),"
            " 'retailprice', p_retailprice) AS (measure, value)"
        ),
    )


@REL.register(
    "range_join_quantity_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('low', 0.0, 10.0), ('mid', 10.0, 30.0), ('high', 30.0, 51.0)
    )
    SELECT band, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
    GROUP BY band
    """,
)
def range_join_quantity_bands(spark, sf_dir):
    """Range (non-equi) join against a broadcast band dimension.

    Scale: the band table is tiny → broadcast nested-loop with 3 ranges is a
    map-side operation; for large range dims, bucketize the range key to an
    equi-join first.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 30.0), ("high", 30.0, 51.0)],
        "band string, lo double, hi double",
    )
    return (
        li.join(
            F.broadcast(bands),
            (F.col("l_quantity") >= F.col("lo"))
            & (F.col("l_quantity") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice", "sum_price"),
        )
    )


@REL.register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem JOIN part_avg USING (l_partkey)
    WHERE l_quantity < 0.2 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: per-group average as a (decorrelated) subquery join.

    Scale: the correlated scalar subquery is expressed as an aggregate +
    re-join on l_partkey — one shuffle, no per-row subquery execution.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(
        (F.sum(money("l_quantity")).cast(_D) / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    return (
        li.join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(money("l_extendedprice")).cast(_D) / 7.0).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@REL.register(
    "percentile_prices_by_flag",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50,
           quantile_cont(l_extendedprice, 0.9) AS p90,
           quantile_cont(l_extendedprice, 0.99) AS p99,
           median(l_quantity) AS median_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentile_prices_by_flag(spark, sf_dir):
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont` — verified bit-identical on doubles)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.percentile("l_extendedprice", 0.9).alias("p90"),
        F.percentile("l_extendedprice", 0.99).alias("p99"),
        F.median("l_quantity").alias("median_qty"),
    )


@REL.register("approx_aggregates", oracle=None)
def approx_aggregates(spark, sf_dir):
    """Sketch-based approximate aggregates: HLL++ distinct counts and
    quantile sketches (percentile_approx).

    Scale: these are THE aggregates for 100 TB interactive profiling —
    fixed-size sketch state, map-side combinable, no exact shuffle of
    distinct values. (Rows-only check: sketch internals differ per engine,
    so no cross-engine value oracle exists by construction.)
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias(
            "approx_orders"
        ),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias(
            "approx_p50"
        ),
        # split quartiles into scalar columns: the driver's canonicalizer
        # sorts output rows with pandas, which cannot sort array cells
        F.percentile_approx("l_extendedprice", 0.25, 10000).alias(
            "approx_p25"
        ),
        F.percentile_approx("l_extendedprice", 0.75, 10000).alias(
            "approx_p75"
        ),
    )


@REL.register(
    "quantile_sketch_report",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           quantile_cont(l_extendedprice, 0.5) AS exact_p50,
           TRUE AS rank_err_le_1pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def quantile_sketch_report(spark, sf_dir):
    """Quantile-sketch accuracy observability (round 9) — the
    percentile sibling of `cardinality_sketch_report`, completing the
    sketch-audit pair: per group, the EXACT interpolated median next to
    whether the `percentile_approx` sketch's value lands within 1% RANK
    error of it, measured against the real data. The rank of the
    sketch's answer is the MIDPOINT of its tie run — strictly-less rows
    plus half the rows equal to it, over the group count — so a heavily
    tied column can't inflate the measured rank independently of sketch
    accuracy (a plain at-or-below count assigns the whole tie mass to
    the sketch value; r9 ADVICE). On l_extendedprice ties are sparse and
    both definitions agree; the midpoint form keeps the bucket honest on
    low-cardinality columns too. The envelope pattern: Spark computes
    the real sketch and the real rank; the oracle computes the exact
    median (`quantile_cont` ≡ Spark `percentile`, bit-identical per the
    `percentile_prices_by_flag` precedent) and carries the bucket as the
    pre-verified literal TRUE — a drifted sketch flips the bucket and
    the driver hash goes red. `approx_aggregates` stays the rows-only
    raw-values view, pinned by tests/test_rows_only_pins.py.

    Scale: the sketch is the 100 TB path (fixed-size state, map-side
    combinable); the audit costs one extra broadcast of 3 group medians
    and a second aggregate — run it on a sample day, then trust the
    sketch on the full table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("__ap50")
    )
    joined = li.join(F.broadcast(approx), "l_returnflag")
    n = F.count(F.lit(1))
    strictly_less = F.sum(
        (F.col("l_extendedprice") < F.col("__ap50")).cast("long")
    )
    ties = F.sum(
        (F.col("l_extendedprice") == F.col("__ap50")).cast("long")
    )
    midpoint_rank = (
        strictly_less.cast("double") + ties.cast("double") / F.lit(2.0)
    ) / n
    return joined.groupBy("l_returnflag").agg(
        n.alias("n_rows"),
        F.percentile("l_extendedprice", 0.5).alias("exact_p50"),
        (F.abs(midpoint_rank - F.lit(0.5)) <= F.lit(0.01)).alias(
            "rank_err_le_1pct"
        ),
    )


@REL.register(
    "q4_late_shipment_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_late_shipment_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS-correlated semi-join + aggregate."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    filtered = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    late = filtered.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@REL.register(
    "q7_nation_volume",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           year(l_shipdate) AS l_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY cn.n_name, sn.n_name, year(l_shipdate)
    """,
)
def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: cross-nation trade volume (two aliases of one dim)."""
    li, o, c, s, n = (
        load_table(spark, sf_dir, t)
        for t in ("lineitem", "orders", "customer", "supplier", "nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                scale=6,
            )
        )
    )


@REL.register(
    "q14_promo_revenue_ratio",
    oracle="""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
             THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
             ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
             AS promo_pct,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_revenue_ratio(spark, sf_dir):
    """TPC-H Q14 shape: conditional-aggregate ratio with a LIKE predicate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = money(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    zero = F.lit(0).cast("decimal(18,6)")
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(zero)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast(_D)
                / F.sum(rev).cast(_D)
            ).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@REL.register(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, o_orderkey, o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING on a grouped sum + top-k."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.sum(money("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 150)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_totalprice",
            F.col("qty_dec").cast(_D).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(50)
    )


@REL.register(
    "agg_collect_arrays",
    oracle="""
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)
             AS statuses,
           COUNT(*) AS n_items
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_collect_arrays(spark, sf_dir):
    """Array-building aggregate (collect_set, sorted for determinism).

    The array is emitted comma-joined: the driver's canonicalizer sorts
    output rows with pandas, which cannot sort array cells — joining keeps
    a full value oracle instead of a rows-only check.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(
            F.array_sort(F.collect_set("l_linestatus")), ","
        ).alias("statuses"),
        F.count(F.lit(1)).alias("n_items"),
    )


@REL.register(
    "scalar_null_handling",
    oracle="""
    SELECT s_suppkey,
           coalesce(NULLIF(s_name, ''), 'unknown') AS name_or_default,
           greatest(s_acctbal, 0.0) AS bal_floor,
           least(s_acctbal, 5000.0) AS bal_cap,
           CASE WHEN s_acctbal < 0 THEN NULL ELSE s_acctbal END AS bal_or_null,
           ifnull(CASE WHEN s_acctbal < 0 THEN NULL ELSE s_acctbal END, -1.0)
             AS bal_filled
    FROM supplier
    """,
)
def scalar_null_handling(spark, sf_dir):
    """NULL-handling scalar surface: coalesce/nullif/greatest/least/ifnull."""
    s = load_table(spark, sf_dir, "supplier")
    bal_or_null = F.when(F.col("s_acctbal") < 0, F.lit(None)).otherwise(
        F.col("s_acctbal")
    )
    return s.select(
        "s_suppkey",
        F.coalesce(F.nullif("s_name", F.lit("")), F.lit("unknown")).alias(
            "name_or_default"
        ),
        F.greatest("s_acctbal", F.lit(0.0)).alias("bal_floor"),
        F.least("s_acctbal", F.lit(5000.0)).alias("bal_cap"),
        bal_or_null.alias("bal_or_null"),
        F.ifnull(bal_or_null, F.lit(-1.0)).alias("bal_filled"),
    )


@REL.register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: aggregate 'view' + scalar-subquery max + join back."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "total_revenue",
                scale=6,
            )
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        s.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(
            F.broadcast(max_rev),
            F.col("total_revenue") == F.col("m"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


@REL.register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(p, F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return joined.filter(cond).agg(
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "revenue",
            scale=6,
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


@REL.register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT substr(c_name, 1, 10) AS name_prefix,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY substr(c_name, 1, 10)
    """,
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: scalar-average subquery + anti-join + grouped agg."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(money("c_acctbal")).cast(_D) / F.count(F.lit(1))).alias("a")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.substring("c_name", 1, 10).alias("name_prefix"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", "total_bal"),
        )
    )


@REL.register(
    "window_range_7day_avg",
    oracle="""
    SELECT o_orderkey, o_custkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN INTERVAL '7 days' PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS rolling_7d_total
    FROM orders
    """,
)
def window_range_7day_avg(spark, sf_dir):
    """RANGE-frame window: per-customer rolling 7-day order total (value-
    based frame, not row-based — the time-series moving-aggregate shape)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-7 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.sum(money("o_totalprice")).over(w).cast(_D).alias("rolling_7d_total"),
    )


@REL.register(
    "window_rank_family",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           CUME_DIST() OVER w AS cume,
           PERCENT_RANK() OVER w AS pct
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_rank_family(spark, sf_dir):
    """The full ranking-function family over one window."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cume"),
        F.percent_rank().over(w).alias("pct"),
    )


@REL.register(
    "lateral_top2_orders_per_customer",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2
    ) t
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def lateral_top2_orders_per_customer(spark, sf_dir):
    """Correlated LATERAL subquery (Spark 4 SQL surface): each BUILDING
    customer joined to its 2 most recent orders.

    Catalyst decorrelates the LATERAL into a ranked window over the
    orders side (per-key top-k), not a per-row re-execution — so the plan
    is the same shuffle-once shape as `window_top3_suppliers_per_nation`
    and survives scale; the LATERAL form is exercised because it is the
    SQL idiom users reach for first.
    """
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "lat_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM lat_customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM lat_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2
        ) t
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


@REL.register(
    "table_profile_lineitem",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS distinct_orders,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           CAST(SUM(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_tax,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           strftime(MIN(l_shipdate), '%Y-%m-%d') AS first_ship,
           strftime(MAX(l_shipdate), '%Y-%m-%d') AS last_ship,
           COUNT(DISTINCT l_returnflag) AS distinct_flags
    FROM lineitem
    """,
)
def table_profile_lineitem(spark, sf_dir):
    """One-pass dataset profile: row count, key cardinalities, null counts,
    numeric and date ranges — the first query anyone runs against an
    unfamiliar table, expressed as a single aggregate.

    Scale: one scan; COUNT(DISTINCT) columns expand to the standard Expand
    + two-level aggregate, everything map-side combinable. For 100 TB
    interactive profiling swap count_distinct for approx_count_distinct
    (`approx_aggregates` demonstrates the sketch path).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("distinct_orders"),
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.sum(F.isnull("l_tax").cast("long")).alias("null_tax"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("first_ship"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("last_ship"),
        F.countDistinct("l_returnflag").alias("distinct_flags"),
    )


@REL.register(
    "dq_check_lineitem",
    oracle="""
    SELECT 'l_quantity_in_1_50' AS rule,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END)
                AS BIGINT) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate_not_null',
           COUNT(*),
           CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount_in_0_1',
           COUNT(*),
           CAST(SUM(CASE WHEN l_discount BETWEEN 0 AND 1 THEN 0 ELSE 1 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'extendedprice_positive',
           COUNT(*),
           CAST(SUM(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'returnflag_in_domain',
           COUNT(*),
           CAST(SUM(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 0 ELSE 1 END) AS BIGINT)
    FROM lineitem
    ORDER BY rule
    """,
)
def dq_check_lineitem(spark, sf_dir):
    """Data-quality assertion sweep (the dbt-test / expectations shape):
    evaluate a rule list — range bounds, non-null, cross-column ordering,
    domain membership — in ONE scan, emitting per-rule row and violation
    counts. The operator a pipeline runs before promoting a 100 TB drop.

    Scale: all rules are conditional aggregates over a single pass (the
    oracle's UNION of per-rule scans is the naive form; Spark computes one
    aggregate and unpivots), so cost is one map-side-combined scan
    regardless of rule count.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rules = {
        "l_quantity_in_1_50": ~F.col("l_quantity").between(1, 50),
        "l_shipdate_not_null": F.col("l_shipdate").isNull(),
        "l_discount_in_0_1": ~F.col("l_discount").between(0, 1),
        "extendedprice_positive": ~(F.col("l_extendedprice") > 0),
        "returnflag_in_domain": ~F.col("l_returnflag").isin("A", "N", "R"),
    }
    agg = li.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(
                F.when(cond.isNull() | cond, F.lit(1)).otherwise(F.lit(0))
            ).alias(f"__v_{i}")
            for i, cond in enumerate(rules.values())
        ],
    )
    stack = ", ".join(
        f"'{name}', __v_{i}" for i, name in enumerate(rules)
    )
    return agg.select(
        F.expr(
            f"stack({len(rules)}, {stack}) AS (rule, n_violations)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("rule", "n_rows", "n_violations")


@REL.register(
    "incremental_agg_merge",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_spent,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS avg_spent
    FROM orders GROUP BY o_custkey
    """,
)
def incremental_agg_merge(spark, sf_dir):
    """Incremental materialized-aggregate maintenance: the per-customer
    spend summary is kept as ALGEBRAIC partials (count, decimal sum), a
    new batch is aggregated independently, and the two partial tables are
    merged by key — never re-reading the base data. Derived measures
    (avg) are computed from merged partials at read time.

    The query splits orders on a date (the "already materialized" half vs
    the "new batch"), builds each half's partials separately, merges, and
    derives — and must equal the one-shot GROUP BY over everything, which
    is the oracle. That equality IS the correctness property of
    incremental view maintenance for algebraic aggregates.

    Scale: maintenance cost is O(|batch|) + a keyed merge against the
    materialized partial table; the 100 TB history is never rescanned.
    Partials use the exact-decimal sum recipe, so merge order cannot
    perturb the result.
    """
    o = load_table(spark, sf_dir, "orders")
    split = F.lit("1997-01-01").cast("timestamp")

    def partials(df):
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(money("o_totalprice")).alias("__s"),
        )

    base = partials(o.filter(F.col("o_orderdate") < split))
    delta = partials(o.filter(F.col("o_orderdate") >= split))
    merged = (
        base.unionByName(delta)
        .groupBy("o_custkey")
        .agg(F.sum("__n").alias("n_orders"), F.sum("__s").alias("__s"))
    )
    return merged.select(
        "o_custkey",
        "n_orders",
        F.col("__s").cast(_D).alias("total_spent"),
        (F.col("__s").cast(_D) / F.col("n_orders")).alias("avg_spent"),
    )


_SKETCH_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_returnflag"]
_SKETCH_ERR_BOUND = 0.05  # practical envelope for the rsd=0.02 sketch


def _sketch_report_full(spark, sf_dir):
    """(col_name, exact, estimate, rel_error) — the raw observability
    frame with the engine-specific HLL++ estimate; the registered query
    buckets it (see cardinality_sketch_report) and the ≤5% error bound
    is pinned on THIS frame in tests/test_sketch_report.py."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = _SKETCH_COLS
    agg = li.agg(
        *[F.count_distinct(F.col(c)).alias(f"__e_{c}") for c in cols],
        *[
            F.approx_count_distinct(c, 0.02).alias(f"__a_{c}")
            for c in cols
        ],
    )
    stack = ", ".join(f"'{c}', __e_{c}, __a_{c}" for c in cols)
    out = agg.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS (col_name, exact, estimate)"
        )
    )
    return out.select(
        "col_name",
        "exact",
        "estimate",
        (
            F.abs(F.col("estimate") - F.col("exact")).cast(_D)
            / F.col("exact")
        ).alias("rel_error"),
    )


@REL.register(
    "cardinality_sketch_report",
    oracle=f"""
    WITH agg AS (
      SELECT {', '.join(f'COUNT(DISTINCT {c}) AS e_{c}' for c in _SKETCH_COLS)}
      FROM lineitem
    )
    {' UNION ALL '.join(
        f"SELECT '{c}' AS col_name, e_{c} AS exact, TRUE AS error_le_5pct FROM agg"
        for c in _SKETCH_COLS
    )}
    """,
)
def cardinality_sketch_report(spark, sf_dir):
    """Sketch-accuracy observability: per column, the exact distinct count
    next to whether the HyperLogLog++ estimate landed inside its practical
    5% error envelope — the audit that tells a pipeline when
    `approx_count_distinct` (constant memory, one pass, mergeable across
    100 TB of partitions) can replace an exact distinct (a full shuffle of
    the key).

    Fully value-oracled since round 9 (the design written in round 8, the
    benford_digit_check envelope pattern): the raw HLL estimate is
    engine-specific by construction, so instead of emitting it the query
    emits the error BUCKET `error_le_5pct` computed from the real Spark
    sketch, while the oracle computes the exact counts and carries the
    bucket as the pre-verified literal TRUE. The driver hash thereby
    checks both the exact counts AND the claim that Spark's sketch is
    within 5% on every audited column (a drifted sketch flips the bucket
    to false → hash red); the raw estimate and its exact rel_error stay
    pinned on `_sketch_report_full` in tests/test_sketch_report.py.
    Deterministic: HLL++ is a pure function of the data, so the bucket
    cannot flap between runs at a given sf.

    Scale: the exact side is the expensive half at 100 TB and exists here
    as the ground truth; the report's point is that the sketch column
    makes the exact one optional.
    """
    full = _sketch_report_full(spark, sf_dir)
    return full.select(
        "col_name",
        "exact",
        (F.col("rel_error") <= F.lit(_SKETCH_ERR_BOUND)).alias(
            "error_le_5pct"
        ),
    )


_Z_BITS = 12  # 12+12-bit Morton code; 4096 cells per axis


def _zorder_oracle() -> str:
    from ..functions.zorder import scale_to_bits_sql, zorder_key_sql

    xs = scale_to_bits_sql("x", "xmax", _Z_BITS)
    ys = scale_to_bits_sql("y", "ymax", _Z_BITS)
    z = zorder_key_sql("xs", "ys", _Z_BITS)
    return f"""
    WITH dims AS (
      SELECT o_custkey AS x,
             date_diff('day', DATE '1992-01-01', o_orderdate) AS y
      FROM orders
    ), dom AS (
      SELECT MAX(x) AS xmax, MAX(y) AS ymax FROM dims
    ), cells AS (
      SELECT x, y, {xs} AS xs, {ys} AS ys FROM dims CROSS JOIN dom
    ), coded AS (
      SELECT x, y, {z} AS z FROM cells
    )
    SELECT z // 16384 AS zbucket,
           COUNT(*) AS n_orders,
           MAX(x) - MIN(x) AS custkey_span,
           MAX(y) - MIN(y) AS day_span,
           MIN(z) AS z_min,
           MAX(z) AS z_max
    FROM coded
    GROUP BY z // 16384
    """


@REL.register("zorder_locality_orders", oracle=_zorder_oracle())
def zorder_locality_orders(spark, sf_dir):
    """Z-order (Morton) clustering metric over orders: scale the customer
    key and the order-date day index to matching 12-bit widths, interleave
    into one 24-bit code, then report each top-level z-bucket's row count
    and the SPAN of both source dimensions inside it — the quantitative
    form of "every file covers a small rectangle", which is what makes
    two-dimensional zone-map pruning work (see
    ``sinks.parquet.to_zordered_parquet`` for the write path and
    tests/test_zorder_layout.py for footer-verified skipping).

    The equal-width scaling is the load-bearing step: without it, the
    wider dimension owns every high z-bit and a range split degenerates
    into a single-column sort (the tests pin this as a negative control).
    Domain maxima come from a 1-row aggregate broadcast back — the
    integer-exact stand-in for the range-id sampling Delta's OPTIMIZE
    ZORDER performs — so the recipe is scale-factor-independent.

    Bucketing by ``z >> 14`` yields at most 1024 buckets, each confining
    BOTH scaled dimensions to ~2^7 of 4096 cells by the Morton property
    (a contiguous z-range decomposes into O(1) aligned quad-tree cells
    per level). Determinism: scaling and interleave are pure integer
    arithmetic, identical term-for-term in the DuckDB oracle
    (``functions.zorder``); spans/counts are exact ints. Scale: one
    projection (codegen'd term sum) + one map-side-combined aggregate
    with bounded output; the scan reads two columns.
    """
    from ..functions.zorder import scale_to_bits, zorder_key

    o = load_table(spark, sf_dir, "orders")
    dims = o.select(
        F.col("o_custkey").alias("x"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1992-01-01").cast("date")
        ).alias("y"),
    )
    dom = dims.agg(F.max("x").alias("xmax"), F.max("y").alias("ymax"))
    cells = dims.join(F.broadcast(dom)).select(
        "x",
        "y",
        scale_to_bits(F.col("x"), F.col("xmax"), _Z_BITS).alias("xs"),
        scale_to_bits(F.col("y"), F.col("ymax"), _Z_BITS).alias("ys"),
    )
    coded = cells.select(
        "x", "y", zorder_key(F.col("xs"), F.col("ys"), _Z_BITS).alias("z")
    )
    return coded.groupBy(
        F.shiftright(F.col("z"), 14).alias("zbucket")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.max("x") - F.min("x")).alias("custkey_span"),
        (F.max("y") - F.min("y")).alias("day_span"),
        F.min("z").alias("z_min"),
        F.max("z").alias("z_max"),
    )


# Benford first-digit expected fractions, log10(1 + 1/d) pre-rounded to 9
# decimals and embedded as LITERALS in both engines — no cross-engine libm
# log call ever enters the comparison.
_BENFORD = {
    1: 0.301029996, 2: 0.176091259, 3: 0.124938737,
    4: 0.096910013, 5: 0.079181246, 6: 0.06694679,
    7: 0.057991947, 8: 0.051152522, 9: 0.045757491,
}


@REL.register(
    "benford_digit_check",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substring(regexp_extract(
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR),
               '[1-9]'), 1, 1) AS BIGINT) AS digit
      FROM lineitem WHERE l_extendedprice > 0
    ), obs AS (
      SELECT digit, COUNT(*) AS n_obs FROM digits GROUP BY digit
    ), tot AS (SELECT SUM(n_obs) AS n FROM obs)
    SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
           round(CAST(n_obs AS DOUBLE) / n, 9) AS obs_frac,
           CAST(CASE digit {' '.join(f"WHEN {d} THEN {p}" for d, p in _BENFORD.items())} END
             AS DOUBLE) AS benford_frac,
           round(abs(CAST(n_obs AS DOUBLE) / n
                 - CAST(CASE digit {' '.join(f"WHEN {d} THEN {p}" for d, p in _BENFORD.items())} END AS DOUBLE)), 9)
             AS abs_dev
    FROM obs, tot
    """,
)
def benford_digit_check(spark, sf_dir):
    """Benford's-law first-digit audit over extended prices — the classic
    fraud/synthetic-data screen: natural multiplicative quantities follow
    P(d) = log10(1+1/d); a generated or tampered column shows up as a flat
    or spiked digit histogram. Emits per digit the observed count,
    observed fraction, the Benford expectation, and the absolute
    deviation.

    Determinism: the first significant digit is taken TEXTUALLY from the
    DECIMAL(18,2) rendering (identical in both engines — no float
    formatting, no log10 on data); the nine Benford expectations are
    pre-rounded literals baked into both queries, so the only runtime
    float is one division per digit. Scale: one map-side-combined 9-group
    aggregate plus a broadcast of the 1-row total — nothing keyed wider
    than the digit domain.
    """
    li = load_table(spark, sf_dir, "lineitem")
    digits = li.filter(F.col("l_extendedprice") > 0).select(
        F.regexp_extract(
            F.col("l_extendedprice").cast("decimal(18,2)").cast("string"),
            "[1-9]",
            0,
        )
        .cast("long")
        .alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    tot = obs.agg(F.sum("n_obs").alias("n"))
    bf = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(d) for d in _BENFORD]),
            F.array(*[F.lit(p) for p in _BENFORD.values()]),
        ),
        F.col("digit").cast("int"),
    )
    return (
        obs.join(F.broadcast(tot))
        .select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs").cast("double") / F.col("n"), 9).alias(
                "obs_frac"
            ),
            bf.alias("benford_frac"),
            F.round(
                F.abs(F.col("n_obs").cast("double") / F.col("n") - bf), 9
            ).alias("abs_dev"),
        )
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@REL.register(
    "correlation_matrix_lineitem",
    oracle=f"""
    WITH agg AS (
      SELECT COUNT(*) AS n,
             {', '.join(f'''CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS s_{c},
             CAST(SUM(CAST({c} AS DECIMAL(18,2)) * CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS ss_{c}''' for c in _CORR_COLS)},
             {', '.join(f"CAST(SUM(CAST({a} AS DECIMAL(18,2)) * CAST({b} AS DECIMAL(18,2))) AS DOUBLE) AS sp_{a}_{b}" for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1:])}
      FROM lineitem
    )
    {' UNION ALL '.join(f'''
    SELECT '{a}' AS col_x, '{b}' AS col_y, CAST(n AS BIGINT) AS n,
           CASE WHEN sqrt(greatest(n * ss_{a} - s_{a} * s_{a}, 0.0))
                     * sqrt(greatest(n * ss_{b} - s_{b} * s_{b}, 0.0)) > 0
                THEN round((n * sp_{a}_{b} - s_{a} * s_{b})
                           / (sqrt(greatest(n * ss_{a} - s_{a} * s_{a}, 0.0))
                              * sqrt(greatest(n * ss_{b} - s_{b} * s_{b}, 0.0))),
                           9)
           END AS pearson_r
    FROM agg''' for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1:])}
    """,
)
def correlation_matrix_lineitem(spark, sf_dir):
    """Pairwise Pearson correlation matrix over the lineitem measures —
    the numeric-profiling step (feature redundancy, data-drift checks)
    over every column pair in one pass.

    Why not F.corr/DuckDB corr(): both implement streaming covariance
    whose float accumulation is partitioning-order-dependent — the
    cross-engine hash would flap. Here every moment (Σx, Σx², Σxy) is
    summed EXACTLY as DECIMAL (2-decimal inputs ⇒ 4-decimal products,
    order-independent), converted to double once, and r is a single
    closed-form double expression rounded to 9 — bit-stable across
    engines and partitionings. Scale: ONE map-side-combined aggregate
    computes all 4+4+6 moments in a single scan/shuffle of 14 decimal
    cells; the 6 output rows are projections of that 1-row aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    dec = {c: F.col(c).cast("decimal(18,2)") for c in _CORR_COLS}
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(dec[c]).cast("double").alias(f"s_{c}"))
        aggs.append(F.sum(dec[c] * dec[c]).cast("double").alias(f"ss_{c}"))
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
    for a, b in pairs:
        aggs.append(F.sum(dec[a] * dec[b]).cast("double").alias(f"sp_{a}_{b}"))
    agg = li.agg(*aggs)
    # all 6 pair rows explode out of the ONE aggregate row — a union of
    # per-pair selects re-executed the whole scan+aggregate per branch
    # (measured 6 parquet scans in one plan)
    structs = []
    # degenerate guards (mirrored in the oracle): a CONSTANT column has
    # zero variance, so r is undefined — NULL, not a Spark ANSI
    # DIVIDE_BY_ZERO crash; greatest(,0) absorbs the -epsilon double
    # rounding can produce at zero variance (DuckDB raises on
    # sqrt(negative), Spark yields NaN)
    for a, b in pairs:
        den = F.sqrt(
            F.greatest(
                F.col("n") * F.col(f"ss_{a}")
                - F.col(f"s_{a}") * F.col(f"s_{a}"),
                F.lit(0.0),
            )
        ) * F.sqrt(
            F.greatest(
                F.col("n") * F.col(f"ss_{b}")
                - F.col(f"s_{b}") * F.col(f"s_{b}"),
                F.lit(0.0),
            )
        )
        r = F.when(
            den > 0,
            (
                F.col("n") * F.col(f"sp_{a}_{b}")
                - F.col(f"s_{a}") * F.col(f"s_{b}")
            )
            / den,
        )
        structs.append(
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.col("n").alias("n"),
                F.round(r, 9).alias("pearson_r"),
            )
        )
    return agg.select(F.explode(F.array(*structs)).alias("o")).select(
        "o.col_x", "o.col_y", "o.n", "o.pearson_r"
    )


@REL.register(
    "chisq_independence_orders",
    oracle="""
    WITH obs AS (
      SELECT o_orderpriority AS pri, o_orderstatus AS status,
             COUNT(*) AS n_obs
      FROM orders GROUP BY 1, 2
    ), margins AS (
      SELECT pri, status, n_obs,
             SUM(n_obs) OVER (PARTITION BY pri) AS row_n,
             SUM(n_obs) OVER (PARTITION BY status) AS col_n,
             SUM(n_obs) OVER () AS n
      FROM obs
    )
    SELECT pri, status, CAST(n_obs AS BIGINT) AS n_obs,
           round(CAST(row_n AS DOUBLE) * col_n / n, 6) AS expected,
           round((n_obs - CAST(row_n AS DOUBLE) * col_n / n)
                 * (n_obs - CAST(row_n AS DOUBLE) * col_n / n)
                 / (CAST(row_n AS DOUBLE) * col_n / n), 6) AS chi_term
    FROM margins
    """,
)
def chisq_independence_orders(spark, sf_dir):
    """Chi-square independence audit between order priority and order
    status: the contingency table with each cell's expected count under
    independence and its χ² contribution — the categorical-association
    companion to `correlation_matrix_lineitem` (numeric) in the
    data-profiling family; large chi_term cells are exactly where the
    two dimensions are entangled (e.g. a status reached only by urgent
    orders), which matters when either is a sampling stratum.

    Determinism: every margin is an exact integer (window sums of
    counts); expected/chi_term are single closed-form double expressions
    over those integers, rounded to 6 — no order-dependent float
    accumulation, no cross-cell total. Scale: one map-side-combined
    aggregate to the |domain₁ × domain₂| cell table, then window sums
    OVER a table of ~15 rows — nothing downstream of the first shuffle
    depends on the row count.
    """
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql.window import Window as _W

    obs = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    m = (
        obs.withColumn(
            "row_n", F.sum("n_obs").over(_W.partitionBy("pri"))
        )
        .withColumn("col_n", F.sum("n_obs").over(_W.partitionBy("status")))
        .withColumn(
            "n", F.sum("n_obs").over(_W.partitionBy(F.lit(1)))
        )
    )
    exp = F.col("row_n").cast("double") * F.col("col_n") / F.col("n")
    return m.select(
        "pri",
        "status",
        "n_obs",
        F.round(exp, 6).alias("expected"),
        F.round((F.col("n_obs") - exp) * (F.col("n_obs") - exp) / exp, 6).alias(
            "chi_term"
        ),
    )


_FK_RELS = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
]


@REL.register(
    "fk_orphan_audit",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{name}' AS relationship,
           CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS n_child_rows,
           CAST((SELECT COUNT(*) FROM {child}
                 WHERE {fk} IS NOT NULL
                   AND {fk} NOT IN (SELECT {pk} FROM {parent})) AS BIGINT)
             AS n_orphans,
           CAST((SELECT COUNT(*) FROM {child} WHERE {fk} IS NULL) AS BIGINT)
             AS n_null_fk"""
        for name, child, fk, parent, pk in _FK_RELS
    ),
)
def fk_orphan_audit(spark, sf_dir):
    """Referential-integrity audit across every foreign key in the star
    schema: per relationship, the child row count, the orphan count (FK
    value present but matching no parent key), and the null-FK count —
    the first profiling pass run on any newly-landed extract, and the
    complement of `dq_check_lineitem`'s value-domain rules.

    Scale: each relationship is ONE left-anti-shaped join aggregated to a
    single row — Spark plans the dim-side parents (nation, customer,
    supplier, part) as broadcasts and the big-big check (lineitem→orders)
    as a shuffle join on the key; counts are map-side-combined. All
    outputs are integers.
    """
    out = None
    for name, child, fk, parent, pk in _FK_RELS:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(
            F.col(pk).alias("__pk")
        ).distinct()
        joined = c.select(F.col(fk).alias("__fk")).join(
            p, F.col("__fk") == F.col("__pk"), "left"
        )
        row = joined.agg(
            F.lit(name).alias("relationship"),
            F.count(F.lit(1)).alias("n_child_rows"),
            F.sum(
                (
                    F.col("__fk").isNotNull() & F.col("__pk").isNull()
                ).cast("long")
            ).alias("n_orphans"),
            F.sum(F.col("__fk").isNull().cast("long")).alias("n_null_fk"),
        ).select("relationship", "n_child_rows", "n_orphans", "n_null_fk")
        out = row if out is None else out.unionByName(row)
    return out


@REL.register(
    "revenue_gini_concentration",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i
      FROM rev
    ), agg AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS total,
             CAST(SUM(CAST(i AS DECIMAL(18,0)) * x) AS DOUBLE) AS weighted
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           round(total, 2) AS total_revenue,
           round(2.0 * weighted / (n * total)
                 - (CAST(n AS DOUBLE) + 1) / n, 9) AS gini,
           round((SELECT CAST(SUM(x) AS DOUBLE) FROM ranked
                  WHERE i > n - CAST(ceil(0.1 * n) AS BIGINT)) / total, 9)
             AS top10pct_share
    FROM agg
    """,
)
def revenue_gini_concentration(spark, sf_dir):
    """Gini coefficient + top-decile share of per-customer revenue — the
    concentration audit (the same computation a data pipeline runs on
    per-SOURCE token mass to answer "is this corpus dominated by a few
    crawls?"): G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over the ascending-sorted
    totals, plus the revenue share of the top 10% of customers.

    Determinism: per-customer totals are exact decimals, ranks are
    integers with an id tiebreak, Σi·x is an exact decimal sum
    (order-independent), and both statistics are single closed-form
    double expressions rounded to 9. Scale: one aggregation keyed on
    customer, one global sort of the |customers| aggregate for ranks (at
    100 TB: the sort runs on the aggregate, not the fact table — and a
    sampled-quantile Lorenz approximation replaces the exact rank if even
    that is too wide), one scalar rollup.
    """
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql.window import Window as _W

    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x")
    )
    # n comes from an unbounded-frame window over the SAME single-partition
    # sort the rank already pays (no extra shuffle), so the whole statistic
    # is one job with orders scanned exactly once — no driver-side count,
    # no checkpoint. The k = ceil(0.1·n) cut uses the same IEEE double
    # product the old math.ceil(0.1 * n) computed, so the cut line is
    # bit-identical.
    wsort = _W.orderBy("x", "o_custkey")
    ranked = rev.select(
        "x",
        F.row_number().over(wsort).alias("i"),
        F.count(F.lit(1))
        .over(wsort.rowsBetween(_W.unboundedPreceding, _W.unboundedFollowing))
        .alias("__n"),
    )
    agg = ranked.agg(
        F.max("i").alias("n"),
        F.sum("x").cast("double").alias("total"),
        F.sum(F.col("i").cast("decimal(18,0)") * F.col("x"))
        .cast("double")
        .alias("weighted"),
        F.sum(
            F.when(
                F.col("i") > F.col("__n") - F.ceil(F.col("__n") * 0.1),
                F.col("x"),
            )
        )
        .cast("double")
        .alias("topk"),
    )
    nd = F.col("n").cast("double")
    return agg.select(
        F.col("n").alias("n_customers"),
        F.round("total", 2).alias("total_revenue"),
        F.round(
            F.lit(2.0) * F.col("weighted") / (nd * F.col("total"))
            - (nd + F.lit(1.0)) / nd,
            9,
        ).alias("gini"),
        F.round(F.col("topk") / F.col("total"), 9).alias("top10pct_share"),
    )
