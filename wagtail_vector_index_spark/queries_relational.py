"""Relational query catalog (EXT operators, SURVEY §2.4): scans, filters,
equi/semi/anti joins, aggregations (incl. distinct, rollup, cube, case),
window functions (ranking + lag), sorts/top-k, set ops, date/JSON scalar
functions — each with a value-identical DuckDB oracle.

All joins here follow the engine's physical discipline: dimension tables
(region/nation/customer-slices) broadcast; fact-side aggregation is
partial (map-side combine) before the shuffle; top-k is orderBy().limit()
which Catalyst plans as TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from wagtail_vector_index_spark.catalog import _t, register

# ---------------------------------------------------------------------------
# TPC-H-style aggregations & joins
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_extendedprice), 4)                              AS avg_price,
           round(avg(l_discount), 4)                                   AS avg_disc,
           count(*)::BIGINT                                            AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_str,
           o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_str"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*)::BIGINT AS n_items
    FROM lineitem JOIN orders   ON l_orderkey  = o_orderkey
                  JOIN customer ON o_custkey   = c_custkey
                  JOIN nation   ON c_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q5_region_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q_top_customers",
    oracle="""
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 10
    """,
)
def q_top_customers(spark, sf_dir):
    return (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
        .orderBy(F.col("acctbal").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Semi / anti joins, set ops
# ---------------------------------------------------------------------------


@register(
    "q_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
)
def q_semi_join(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    big_orders = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return cust.join(
        big_orders, cust.c_custkey == big_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def q_anti_join(spark, sf_dir):
    """Customers with no large order — the filtered side guarantees a
    non-empty, non-trivial result at every scale factor."""
    cust = _t(spark, sf_dir, "customer")
    big_orders = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return cust.join(
        big_orders, cust.c_custkey == big_orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q_set_intersect",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def q_set_intersect(spark, sf_dir):
    rich = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    big = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return rich.intersect(big)


@register(
    "q_set_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    EXCEPT
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def q_set_except(spark, sf_dir):
    big = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    building = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    return big.subtract(building)


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "q_window_top_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey)::INT AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def q_window_top_orders(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "q_events_user_gaps",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id) AS gap_ms
      FROM events)
    SELECT user_id, count(*)::BIGINT AS n_gaps, round(avg(gap_ms), 4) AS avg_gap_ms
    FROM g WHERE gap_ms IS NOT NULL GROUP BY user_id
    """,
)
def q_events_user_gaps(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis("ts")
    gaps = (
        _t(spark, sf_dir, "events")
        .select("user_id", (ms - F.lag(ms).over(w)).alias("gap_ms"))
        .where(F.col("gap_ms").isNotNull())
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.avg("gap_ms"), 4).alias("avg_gap_ms"),
    )


@register(
    "q_event_paths",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT event_type || '>' || e2 || '>' || e3 AS path,
           count(*)::BIGINT AS n
    FROM s WHERE e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path LIMIT 10
    """,
)
def q_event_paths(spark, sf_dir):
    """Top-10 three-step behavioral paths (the product-analytics
    'what do users do next' query): consecutive event-type triples per
    user in (ts, event_id) order — the event_id tie-break is the
    determinism pin for simultaneous events — counted and ranked. One
    user-keyed window pass + one map-side-combinable count over a
    |event_types|³-bounded key space; TakeOrdered serves the limit."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        s.where(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(10)
    )


@register(
    "q9_nation_profit",
    oracle="""
    SELECT n_name AS nation, year(o_orderdate)::INT AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*)::BIGINT AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey AND p_name LIKE '%red%'
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    GROUP BY 1, 2
    """,
)
def q9_nation_profit(spark, sf_dir):
    """TPC-H Q9 shape (minus partsupp, absent from the testdata):
    supplier-nation revenue by order year for name-filtered parts — a
    4-dimension star around the lineitem fact. part/supplier/nation
    broadcast (the LIKE filter prunes part before the build side ships);
    orders joins on the fact's own key; the only wide shuffle is the
    final group-by."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").alias("o_year"),
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q_rolling_revenue",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS rolling_30d
    FROM orders
    """,
)
def q_rolling_revenue(spark, sf_dir):
    """Event-time RANGE-frame window: per customer, the rolling 30-day
    order revenue — a frame defined by value distance (days), not row
    count, so same-day peers always share a frame and the result is
    tie-order independent. One shuffle+sort on (custkey, day), the same
    cost envelope as any keyed window."""
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("rolling_30d"),
    )


@register(
    "q_asof_join",
    oracle="""
    WITH c AS (SELECT event_id, user_id, ts, value AS click_value
               FROM events WHERE event_type = 'click'),
    v AS (SELECT user_id, ts, value AS view_value
          FROM events WHERE event_type = 'view')
    SELECT c.event_id, c.user_id, c.click_value, v.view_value,
           (epoch_us(c.ts) - epoch_us(v.ts)) AS lag_us
    FROM c ASOF LEFT JOIN v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
)
def q_asof_join(spark, sf_dir):
    """As-of join: every click matched to the user's most recent view at
    or before it (left-join semantics — clicks with no prior view keep
    nulls). The Spark side is the union-and-window composition in
    operators/asof.py (one shuffle+sort on (user_id, ts)); the oracle is
    DuckDB's native ASOF LEFT JOIN, pinning the backward-inclusive match
    and null behavior value-for-value."""
    from wagtail_vector_index_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value")
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    j = asof_join(clicks, views, on="ts", by=["user_id"])
    return j.select(
        "event_id",
        "user_id",
        "click_value",
        F.col("view_value_asof").alias("view_value"),
        (F.unix_micros("ts") - F.unix_micros("ts_asof")).alias("lag_us"),
    )


@register(
    "q_asof_join_forward",
    oracle="""
    WITH c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
    v AS (SELECT user_id, ts, value AS view_value
          FROM events WHERE event_type = 'view')
    SELECT c.event_id, c.user_id, v.view_value,
           (epoch_us(v.ts) - epoch_us(c.ts)) AS lead_us
    FROM c ASOF LEFT JOIN v
      ON c.user_id = v.user_id AND v.ts >= c.ts
    """,
)
def q_asof_join_forward(spark, sf_dir):
    """Forward as-of: every click matched to the user's EARLIEST view at
    or after it — the mirror direction of q_asof_join, exercising the
    operator's first(ignorenulls) / following-window path against
    DuckDB's native forward ASOF."""
    from wagtail_vector_index_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    j = asof_join(clicks, views, on="ts", by=["user_id"], direction="forward")
    return j.select(
        "event_id",
        "user_id",
        F.col("view_value_asof").alias("view_value"),
        (F.unix_micros("ts_asof") - F.unix_micros("ts")).alias("lead_us"),
    )


@register(
    "q_range_join_bands",
    oracle="""
    WITH bands AS (
      SELECT r AS band_id, (r * 500)::DOUBLE AS lo,
             (r * 500 + 749)::DOUBLE AS hi
      FROM range(-2, 20) t(r))
    SELECT band_id, count(*)::BIGINT AS n_customers,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer JOIN bands ON c_acctbal BETWEEN lo AND hi
    GROUP BY band_id
    """,
)
def q_range_join_bands(spark, sf_dir):
    """Interval containment via the binned equi-join in
    operators/rangejoin.py: overlapping account-balance bands (width 750,
    stride 500 — rows can match two bands) aggregated per band. The
    oracle is a plain BETWEEN join, pinning the containment semantics
    that the bin-bucketed plan must reproduce exactly."""
    from wagtail_vector_index_spark.operators.rangejoin import range_join

    bands = spark.range(-2, 20).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 500).cast("double").alias("lo"),
        (F.col("id") * 500 + 749).cast("double").alias("hi"),
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    joined = range_join(
        cust, bands, value_col="c_acctbal", lo_col="lo", hi_col="hi",
        bin_width=500,
    )
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


# ---------------------------------------------------------------------------
# Grouping sets / distinct aggregates / conditional aggregates
# ---------------------------------------------------------------------------


@register(
    "q_rollup_acctbal",
    oracle="""
    SELECT coalesce(r_name, '(all)') AS region,
           coalesce(n_name, '(all)') AS nation,
           round(sum(c_acctbal), 2)  AS total_acctbal,
           count(*)::BIGINT          AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def q_rollup_acctbal(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .select(
            F.coalesce("r_name", F.lit("(all)")).alias("region"),
            F.coalesce("n_name", F.lit("(all)")).alias("nation"),
            "total_acctbal",
            "n_customers",
        )
    )


@register(
    "q_cube_lineitem",
    oracle="""
    SELECT coalesce(l_returnflag, '(all)') AS returnflag,
           coalesce(l_linestatus, '(all)') AS linestatus,
           round(sum(l_quantity), 2)       AS sum_qty,
           count(*)::BIGINT                AS n_items
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def q_cube_lineitem(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "sum_qty",
            "n_items",
        )
    )


@register(
    "q_distinct_agg",
    oracle="""
    SELECT o_orderstatus,
           count(*)::BIGINT                 AS n_orders,
           count(DISTINCT o_custkey)::BIGINT AS n_customers,
           round(sum(o_totalprice), 2)      AS sum_price,
           round(avg(o_totalprice), 4)      AS avg_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_distinct_agg(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


@register(
    "q_case_agg",
    oracle="""
    SELECT l_returnflag,
           sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)::BIGINT AS high_qty_items,
           round(avg(CASE WHEN l_quantity > 25 THEN 1.0 ELSE 0.0 END), 6) AS pct_high,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_case_agg(spark, sf_dir):
    high = F.when(F.col("l_quantity") > 25, 1).otherwise(0)
    high_d = F.when(F.col("l_quantity") > 25, 1.0).otherwise(0.0)
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.sum(high).cast("long").alias("high_qty_items"),
            F.round(F.avg(high_d), 6).alias("pct_high"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Date / JSON scalar functions
# ---------------------------------------------------------------------------


@register(
    "q_monthly_orders",
    oracle="""
    SELECT year(o_orderdate)::INT  AS o_year,
           month(o_orderdate)::INT AS o_month,
           count(*)::BIGINT        AS n_orders,
           round(sum(o_totalprice), 2) AS sum_total
    FROM orders GROUP BY 1, 2
    """,
)
def q_monthly_orders(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
        )
    )


@register(
    "q_skew_salted_count",
    oracle="""
    SELECT l_returnflag, count(*)::BIGINT AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_skew_salted_count(spark, sf_dir):
    """Skew-safe aggregation: per-key counts via the two-phase salted
    plan (partial count on (key, random salt), final sum on key) — the
    pattern that keeps one hot key from landing in a single reduce task
    at 100 TB. l_returnflag has 3 values over the whole table, the
    textbook hot-key shape; the salt is execution detail only, so the
    result is deterministic and the oracle is the plain GROUP BY."""
    from wagtail_vector_index_spark.operators.skew import salted_count

    return salted_count(_t(spark, sf_dir, "lineitem"), "l_returnflag")


@register(
    "q_events_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_str,
           event_type,
           count(*)::BIGINT        AS n_events,
           round(sum(value), 2)    AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q_events_hourly(spark, sf_dir):
    # no rounded avg here: with 2-decimal data and small groups, avg
    # quotients terminate within 1 ulp of a rounding boundary and the two
    # engines' summation orders flip the digit (seen at sf0.1); sums and
    # counts don't have that systematic failure mode
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd HH:00").alias("hour_str"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "q_events_json",
    oracle="""
    SELECT CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) AS k,
           count(*)::BIGINT     AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1
    """,
)
def q_events_json(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.regexp_extract("props", r'"k": (\d+)', 1).cast("int").alias("k")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "q_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged)
    SELECT user_id, session_no::INT AS session_no,
           count(*)::BIGINT AS n_events,
           (max(epoch_ms(ts)) - min(epoch_ms(ts)))::BIGINT AS duration_ms
    FROM sessions GROUP BY user_id, session_no
    """,
)
def q_sessionize(spark, sf_dir):
    """Sessionization: 30-min inactivity gap starts a new session —
    lag + conditional flag + running sum + group, all window built-ins.
    Served through the EventLog facade (operators/events.py) — the
    catalog gate therefore oracle-verifies the API path itself."""
    from wagtail_vector_index_spark.operators.events import EventLog

    return EventLog(_t(spark, sf_dir, "events")).sessionize(gap_ms=1_800_000)


@register(
    "q_stats_agg",
    oracle="""
    SELECT o_orderpriority,
           round(stddev_samp(o_totalprice), 4) AS std_price,
           round(var_samp(o_totalprice), 2)    AS var_price,
           round(min(o_totalprice), 2)         AS min_price,
           round(max(o_totalprice), 2)         AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_stats_agg(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.stddev_samp("o_totalprice"), 4).alias("std_price"),
            F.round(F.var_samp("o_totalprice"), 2).alias("var_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@register(
    "q_union_all",
    oracle="""
    SELECT custkey, count(*)::BIGINT AS n_rows FROM (
      SELECT o_custkey AS custkey FROM orders
      UNION ALL
      SELECT c_custkey AS custkey FROM customer) GROUP BY custkey
    """,
)
def q_union_all(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    return (
        orders.unionByName(cust)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "q_outer_join_counts",
    oracle="""
    SELECT c_custkey, c_name,
           count(o_orderkey)::BIGINT AS n_orders,
           round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q_outer_join_counts(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


@register(
    "q_having",
    oracle="""
    SELECT o_custkey, count(*)::BIGINT AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY o_custkey
    HAVING count(*) >= 15
    """,
)
def q_having(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .where(F.col("n_orders") >= 15)
    )


@register(
    "q_scalar_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                                   AS brand_upper,
           substr(p_name, 1, 5)                             AS name_prefix,
           length(p_name)::BIGINT                           AS name_len,
           concat(p_brand, '#', p_type)                     AS brand_type,
           abs(p_size - 25)::INT                            AS size_dist,
           round(pow(p_retailprice, 2), 2)                  AS price_sq,
           round(ln(p_retailprice + 1), 6)                  AS log_price,
           round(sqrt(p_size), 6)                           AS sqrt_size,
           CASE WHEN p_size % 2 = 0 THEN 'even' ELSE 'odd' END AS size_parity
    FROM part
    """,
)
def q_scalar_functions(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.abs(F.col("p_size") - 25).cast("int").alias("size_dist"),
        F.round(F.pow("p_retailprice", F.lit(2)), 2).alias("price_sq"),
        F.round(F.log(F.col("p_retailprice") + 1), 6).alias("log_price"),
        F.round(F.sqrt("p_size"), 6).alias("sqrt_size"),
        F.when(F.col("p_size") % 2 == 0, "even").otherwise("odd").alias(
            "size_parity"
        ),
    )


@register(
    "q_big_orders",
    oracle="""
    SELECT c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_str,
           round(o_totalprice, 2) AS totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150)
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q_big_orders(spark, sf_dir):
    """TPC-H Q18 shape: aggregate subquery -> semi join -> re-aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big_keys = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big_keys), "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_str"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


@register(
    "q_above_nation_avg",
    oracle="""
    SELECT c_custkey, round(c_acctbal, 2) AS acctbal
    FROM (
      SELECT c_custkey, c_acctbal,
             avg(c_acctbal) OVER (PARTITION BY c_nationkey) AS nation_avg
      FROM customer)
    WHERE c_acctbal > nation_avg
    """,
)
def q_above_nation_avg(spark, sf_dir):
    """Correlated-scalar-subquery shape (customers above their nation's
    average balance) expressed as a window aggregate — one pass, no
    re-scan per group."""
    w = Window.partitionBy("c_nationkey")
    return (
        _t(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_acctbal",
            F.avg("c_acctbal").over(w).alias("nation_avg"),
        )
        .where(F.col("c_acctbal") > F.col("nation_avg"))
        .select(
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
    )


@register(
    "q_pivot_flags",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
           sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_F,
           sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pivot_flags(spark, sf_dir):
    """Pivot: linestatus values become columns (Spark plans pivot as the
    same conditional aggregation the oracle spells out)."""
    li = _t(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return pivoted.select(
        "l_returnflag",
        F.col("F_qty").alias("qty_F"),
        F.col("O_qty").alias("qty_O"),
        F.col("F_n").alias("n_F"),
        F.col("O_n").alias("n_O"),
    )


@register(
    "q_median_price",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           count(*)::BIGINT AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_median_price(spark, sf_dir):
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont` bit-for-bit — both sort-and-interpolate)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias(
                "median_price"
            ),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias(
                "p90_price"
            ),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "q_window_analytics",
    oracle="""
    WITH w AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             ntile(4) OVER sw AS quartile,
             round(percent_rank() OVER sw, 6) AS pct_rank,
             lead(c_custkey) OVER sw AS next_custkey
      FROM customer
      WINDOW sw AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey))
    SELECT c_mktsegment, quartile::INT AS quartile,
           count(*)::BIGINT AS n_customers,
           round(sum(c_acctbal), 2) AS quartile_balance,
           count(next_custkey)::BIGINT AS n_with_next,
           round(max(pct_rank), 6) AS max_pct_rank
    FROM w GROUP BY c_mktsegment, quartile
    """,
)
def q_window_analytics(spark, sf_dir):
    """Remaining window family: ntile quartiles, percent_rank, lead —
    one window spec, aggregated per (segment, quartile)."""
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    )
    enriched = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.lead("c_custkey").over(w).alias("next_custkey"),
    )
    return enriched.groupBy("c_mktsegment", "quartile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("quartile_balance"),
        F.count("next_custkey").alias("n_with_next"),
        F.round(F.max("pct_rank"), 6).alias("max_pct_rank"),
    )


@register(
    "q_above_global_avg",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
    """,
)
def q_above_global_avg(spark, sf_dir):
    """Scalar-subquery shape: compare each row against a global aggregate
    (broadcast single-row cross join — no per-row re-scan). The 1.5x
    margin keeps the float threshold far from any row's value, so the
    engines' different summation orders can't flip membership."""
    orders = _t(spark, sf_dir, "orders")
    global_avg = orders.agg(F.avg("o_totalprice").alias("g_avg"))
    return (
        orders.crossJoin(F.broadcast(global_avg))
        .where(F.col("o_totalprice") > 1.5 * F.col("g_avg"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


@register(
    "q_ship_delay",
    oracle="""
    SELECT o_orderpriority,
           count(*)::BIGINT AS n_items,
           round(avg(date_diff('day', o_orderdate, l_shipdate)), 4) AS avg_delay_days,
           min(date_diff('day', o_orderdate, l_shipdate))::INT AS min_delay,
           max(date_diff('day', o_orderdate, l_shipdate))::INT AS max_delay
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_ship_delay(spark, sf_dir):
    """Date arithmetic: integer day deltas sum exactly, so the rounded
    average is engine-order-independent (unlike float-valued avgs)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.avg(delay), 4).alias("avg_delay_days"),
            F.min(delay).cast("int").alias("min_delay"),
            F.max(delay).cast("int").alias("max_delay"),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*)::BIGINT AS n_items
    FROM lineitem
    WHERE l_shipdate >= DATE '1994-01-01'
      AND l_shipdate < DATE '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change): pure filter + aggregate —
    every predicate reaches the parquet scan as PushedFilters, the agg is
    one map-side partial + a singleton exchange. The canonical test that
    selective scans stay scan-shaped. Sum of 2-dp money is
    order-independent at 2-dp rounding (sums of exact decimals)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting): which customers returned the
    most revenue. The returnflag filter pushes to the lineitem scan;
    nation broadcasts; the top-20 plans as TakeOrderedAndProject over the
    aggregated frame — no global sort."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "q14_promo_share",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
           count(*)::BIGINT AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1995-09-01'
      AND l_shipdate < DATE '1995-10-01'
    """,
)
def q14_promo_share(spark, sf_dir):
    """TPC-H Q14 (promotion effect): conditional-aggregate ratio over a
    month of shipments. Part broadcasts against the date-pruned lineitem
    scan; the ratio divides two sums of the same 2-dp-exact products, so
    the 4-dp rounding is engine-order-safe."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-09-01"))
        & (F.col("l_shipdate") < F.lit("1995-10-01"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0))
                / F.sum(rev),
                4,
            ).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q_events_anomaly",
    oracle="""
    WITH s AS (
      SELECT user_id,
             avg(value) AS mu,
             stddev_samp(value) AS sigma,
             count(*) AS n
      FROM events GROUP BY user_id),
    z AS (
      SELECT e.event_id, e.user_id, round(e.value, 2) AS value,
             round((e.value - s.mu) / s.sigma, 4) AS zscore
      FROM events e JOIN s USING (user_id)
      WHERE s.n >= 20 AND s.sigma > 0
        AND abs((e.value - s.mu) / s.sigma) > 3)
    SELECT event_id, user_id, value, zscore FROM z
    """,
)
def q_events_anomaly(spark, sf_dir):
    """Per-entity anomaly detection (the data-quality gate of an event
    pipeline): each user's value distribution -> z-score every event ->
    flag |z| > 3; users with <20 events are skipped (unstable sigma).
    Served through the EventLog facade (operators/events.py) — the
    catalog gate therefore oracle-verifies the API path itself.
    z-scores are quotients by an irrational stddev, so the 4-dp rounding
    is engine-order-safe."""
    from wagtail_vector_index_spark.operators.events import EventLog

    z = EventLog(_t(spark, sf_dir, "events")).anomalies(
        zscore=3.0, min_events=20
    )
    return z.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        F.round("zscore", 4).alias("zscore"),
    )


@register(
    "sketch_distinct_kmv",
    oracle="""
    WITH d AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(sha256(user_id::VARCHAR), 1, 8))::UBIGINT
               / 4294967296.0 AS u
      FROM events),
    r AS (
      SELECT event_type, u,
             row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn
      FROM d),
    s AS (
      SELECT event_type, max(u) AS uk, count(*) AS n
      FROM r WHERE rn <= 64 GROUP BY event_type),
    x AS (
      SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_distinct
      FROM events GROUP BY event_type)
    SELECT s.event_type, x.exact_distinct,
           round(CASE WHEN s.n < 64 THEN s.n
                      ELSE 63.0 / s.uk END, 2)          AS kmv_estimate,
           round(abs(CASE WHEN s.n < 64 THEN s.n
                          ELSE 63.0 / s.uk END - x.exact_distinct)
                 / x.exact_distinct, 4)                 AS rel_err
    FROM s JOIN x ON s.event_type = x.event_type
    """,
)
def sketch_distinct_kmv(spark, sf_dir):
    """Approximate distinct counting via the KMV bottom-k sketch
    (operators/sketches.py): per event type, the 64 smallest sha-derived
    uniform hashes of the distinct users give the (k-1)/u_k estimator
    (Bar-Yossef et al. 2002) — the exactly-SQL-replayable stand-in for
    HLL++ (F.approx_count_distinct, whose register state no external
    oracle can replay). The gate pins the whole sketch dataflow: hash,
    bottom-k selection (WindowGroupLimit), estimator, and the measured
    relative error against the exact count."""
    from wagtail_vector_index_spark.operators.sketches import kmv_distinct

    out = kmv_distinct(
        _t(spark, sf_dir, "events"),
        group_cols=["event_type"],
        value_col="user_id",
        k=64,
    )
    return out.select(
        "event_type",
        "exact_distinct",
        F.round("kmv_estimate", 2).alias("kmv_estimate"),
        F.round("rel_err", 4).alias("rel_err"),
    )


@register(
    "q_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM v)::BIGINT AS n_view,
           (SELECT count(*) FROM c)::BIGINT AS n_click,
           (SELECT count(*) FROM p)::BIGINT AS n_purchase,
           round((SELECT count(*) FROM c) * 1.0
                 / nullif((SELECT count(*) FROM v), 0), 4) AS view_to_click,
           round((SELECT count(*) FROM p) * 1.0
                 / nullif((SELECT count(*) FROM c), 0), 4) AS click_to_purchase
    """,
)
def q_funnel_conversion(spark, sf_dir):
    """Ordered funnel analysis (view -> click -> purchase): a user
    advances a step only with an event strictly AFTER their previous
    step's first occurrence — the sequential-dependency shape that makes
    funnels harder than three counts. ONE shuffle on user_id total:
    each step's first-occurrence timestamp is a conditional-min window
    chained over the same entity partitioning (step i's condition reads
    step i-1's window column, a per-entity constant), and the per-user
    collapse reuses that partitioning. Single-row output of absolute
    counts + step conversion rates; same dataflow as EventLog.funnel."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    df = ev.withColumn(
        "__t0",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    df = df.withColumn(
        "__t1",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("__t0")),
                F.col("ts"),
            )
        ).over(w),
    )
    df = df.withColumn(
        "__t2",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("__t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = df.groupBy("user_id").agg(
        F.max("__t0").alias("t0"),
        F.max("__t1").alias("t1"),
        F.max("__t2").alias("t2"),
    )
    return per_user.agg(
        F.count("t0").alias("n_view"),
        F.count("t1").alias("n_click"),
        F.count("t2").alias("n_purchase"),
    ).select(
        "n_view",
        "n_click",
        "n_purchase",
        # try_divide: an empty step yields NULL, not an ANSI
        # DIVIDE_BY_ZERO — same hardening EventLog.funnel carries.
        F.round(F.try_divide(F.col("n_click"), F.col("n_view")), 4).alias(
            "view_to_click"
        ),
        F.round(
            F.try_divide(F.col("n_purchase"), F.col("n_click")), 4
        ).alias("click_to_purchase"),
    )


@register(
    "q_retention_cohorts",
    oracle="""
    WITH f AS (
      SELECT user_id, date_trunc('day', min(ts)) AS cohort
      FROM events GROUP BY user_id),
    a AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS m FROM events)
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_label,
           date_diff('day', f.cohort, a.m)::INT AS period_offset,
           count(*)::BIGINT AS n_users
    FROM f JOIN a ON f.user_id = a.user_id
    WHERE date_diff('day', f.cohort, a.m) BETWEEN 0 AND 7
    GROUP BY 1, 2
    """,
)
def q_retention_cohorts(spark, sf_dir):
    """Cohort retention: users grouped by first-activity day, counted in
    each of the following 7 days they stay active — the standard
    retention triangle (day granularity: the events table spans one
    month). Offset arithmetic is integer day difference in both engines,
    sidestepping interval semantics. Two shuffles: the first-touch
    groupBy and the distinct-activity set, joined on user_id; the cohort
    cell agg is partial map-side. Served through the EventLog facade
    (operators/events.py::retention), so the gate oracle-verifies the
    API path itself."""
    from wagtail_vector_index_spark.operators.events import EventLog

    return EventLog(_t(spark, sf_dir, "events")).retention(
        period="day", max_offset=7
    )


@register(
    "q12_priority_shipping",
    oracle="""
    SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_priority_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_priority_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def q12_priority_shipping(spark, sf_dir):
    """TPC-H Q12 shape adapted (no l_shipmode column): order-priority mix
    of late vs on-time 1997 shipments, where "late" derives from ship
    minus order date. One shuffled join on the order key, conditional
    counts in a single partial-agg pass over the two-value ship_class
    domain — the classic mode-split report."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn(
            "ship_class",
            F.when(
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                F.lit("LATE"),
            ).otherwise(F.lit("ONTIME")),
        )
        .groupBy("ship_class")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_count"),
        )
    )


@register(
    "q_value_histogram",
    oracle="""
    SELECT event_type,
           least(floor(value / 50.0), 9)::INT AS bucket,
           count(*)::BIGINT AS n,
           round(min(value), 2) AS lo,
           round(max(value), 2) AS hi
    FROM events
    GROUP BY 1, 2
    """,
)
def q_value_histogram(spark, sf_dir):
    """Fixed-width histogram of the event value distribution per type
    (10 buckets of width 50, top bucket open-ended) — the profiling
    query every data-quality dashboard runs first. Bucket arithmetic is
    integer floor division, portable across engines; one partial-agg'd
    shuffle on the tiny (type, bucket) domain, so at 100 TB the map-side
    combine reduces each partition to <=50 rows before the exchange."""
    ev = _t(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 50.0), F.lit(9)).cast("int")
    return ev.groupBy(
        "event_type", bucket.alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 2).alias("lo"),
        F.round(F.max("value"), 2).alias("hi"),
    )


_KMV_U = "('0x' || substr(sha256(user_id::VARCHAR), 1, 8))::UBIGINT / 4294967296.0"


@register(
    "sketch_kmv_set_ops",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT event_type, {_KMV_U} AS u FROM events
      WHERE event_type IN ('view', 'click')),
    r AS (
      SELECT event_type, u,
             row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn
      FROM d),
    sk AS (
      SELECT event_type, list_sort(list(u)) AS kvals
      FROM r WHERE rn <= 64 GROUP BY event_type),
    pair AS (
      SELECT a.kvals AS ka, b.kvals AS kb,
             list_sort(list_distinct(a.kvals || b.kvals))[1:64] AS m
      FROM sk a, sk b
      WHERE a.event_type = 'view' AND b.event_type = 'click'),
    est AS (
      SELECT
        CASE WHEN len(m) >= 64 THEN 63.0 / m[len(m)]
             ELSE len(m)::DOUBLE END AS union_est,
        len(list_filter(m, x -> list_contains(ka, x)
                               AND list_contains(kb, x))) AS ic,
        len(m) >= 64 AS sat
      FROM pair),
    ex AS (
      SELECT
        (SELECT count(DISTINCT user_id) FROM events
         WHERE event_type IN ('view', 'click'))::BIGINT AS union_exact,
        (SELECT count(*) FROM
          (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
          NATURAL JOIN
          (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
        )::BIGINT AS intersect_exact)
    SELECT ex.union_exact, round(est.union_est, 2) AS union_est,
           ex.intersect_exact,
           round(CASE WHEN est.sat
                      THEN est.ic / 64.0 * est.union_est
                      ELSE est.ic::DOUBLE END, 2) AS intersect_est
    FROM est CROSS JOIN ex
    """,
)
def sketch_kmv_set_ops(spark, sf_dir):
    """Mergeable-sketch set operations (Beyer et al. 2007): estimate
    the distinct-user UNION (merge bottom-k sets, (k-1)/u_k) and
    INTERSECTION (k-min coincidence fraction x union estimate) of the
    view/click audiences from KMV sketches — the property that lets
    per-executor partial sketches answer cross-segment dashboards
    without re-reading 100 TB. r6: one :func:`kmv_overlap` pass — ONE
    events scan, ONE Arrow fold carrying both sketches AND the exact
    counts (inclusion-exclusion over folded tag counts) — replacing
    the r5 composition that re-executed the sketch subplan per
    reference plus three exact-count scans (0.48→1.02s regression).
    Output values are identical, so the oracle is unchanged."""
    from wagtail_vector_index_spark.operators.sketches import kmv_overlap

    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "click")
    )
    out = kmv_overlap(
        ev,
        value_col="user_id",
        cond_a=F.col("event_type") == "view",
        cond_b=F.col("event_type") == "click",
        k=64,
    )
    return out.select(
        "union_exact",
        F.round("union_est", 2).alias("union_est"),
        "intersect_exact",
        F.round("intersect_est", 2).alias("intersect_est"),
    )


@register(
    "sketch_quantiles_price",
    oracle="""
    WITH s AS (
      SELECT ('0x' || substr(sha256(o_orderkey::VARCHAR), 1, 8))::UBIGINT AS u,
             o_totalprice::DOUBLE AS v
      FROM orders ORDER BY u ASC, v ASC LIMIT 512),
    arr AS (SELECT list_sort(list(v)) AS a, count(*) AS m FROM s),
    ex AS (SELECT quantile_cont(o_totalprice::DOUBLE, 0.5) AS x0,
                  quantile_cont(o_totalprice::DOUBLE, 0.9) AS x1,
                  quantile_cont(o_totalprice::DOUBLE, 0.99) AS x2
           FROM orders)
    SELECT round(a[(floor(0.5 * (m - 1)))::INT + 1], 6) AS p5_est,
           round(x0, 6) AS p5_exact,
           round(a[(floor(0.9 * (m - 1)))::INT + 1], 6) AS p9_est,
           round(x1, 6) AS p9_exact,
           round(a[(floor(0.99 * (m - 1)))::INT + 1], 6) AS p99_est,
           round(x2, 6) AS p99_exact
    FROM arr CROSS JOIN ex
    """,
)
def sketch_quantiles_price(spark, sf_dir):
    """Mergeable quantile sketch (operators/sketches.py::quantile_sketch):
    p50/p90/p99 of order value estimated from a DETERMINISTIC 512-row
    bottom-k-hash sample — a content-addressed reservoir whose
    membership is a pure function of the keys, so per-executor partial
    samples merge exactly and the oracle replays the estimate value for
    value (a seeded-RNG reservoir cannot cross engines). Exact
    interpolated percentiles ride along, so the gate pins the measured
    sampling error too."""
    from wagtail_vector_index_spark.operators.sketches import quantile_sketch

    orders = _t(spark, sf_dir, "orders")
    return quantile_sketch(
        orders, key_col="o_orderkey", value_col="o_totalprice",
        quantiles=(0.5, 0.9, 0.99), k=512,
    )


@register(
    "sketch_quantiles_by_type",
    oracle="""
    WITH s AS (
      SELECT event_type,
             ('0x' || substr(sha256(event_id::VARCHAR), 1, 8))::UBIGINT AS u,
             value::DOUBLE AS v
      FROM events),
    r AS (
      SELECT event_type, u, v,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY u, v) AS rn
      FROM s),
    arr AS (
      SELECT event_type, list_sort(list(v)) AS a, count(*) AS m
      FROM r WHERE rn <= 256 GROUP BY event_type),
    ex AS (
      SELECT event_type,
             quantile_cont(value::DOUBLE, 0.5) AS x0,
             quantile_cont(value::DOUBLE, 0.9) AS x1
      FROM events GROUP BY event_type)
    SELECT arr.event_type,
           round(a[(floor(0.5 * (m - 1)))::INT + 1], 6) AS p5_est,
           round(x0, 6) AS p5_exact,
           round(a[(floor(0.9 * (m - 1)))::INT + 1], 6) AS p9_est,
           round(x1, 6) AS p9_exact
    FROM arr JOIN ex USING (event_type)
    """,
)
def sketch_quantiles_by_type(spark, sf_dir):
    """GROUPED quantile sketch (r6): p50/p90 of event value per event
    type from one content-addressed bottom-k sample per group —
    the per-segment distribution dashboard. The global form's
    TakeOrdered can't group, so this path runs the KMV-shaped Arrow
    fold (O(groups x k) state per task, partials-only exchange) and a
    ranked-window merge; duplicate keys are legitimate sample rows and
    the merge is exact without a distinct step
    (operators/sketches.py::quantile_sketch(group_cols=...)). Exact
    per-group percentiles ride along to pin the sampling error."""
    from wagtail_vector_index_spark.operators.sketches import quantile_sketch

    ev = _t(spark, sf_dir, "events")
    return quantile_sketch(
        ev,
        key_col="event_id",
        value_col="value",
        quantiles=(0.5, 0.9),
        k=256,
        group_cols=["event_type"],
    )


def _pagerank_oracle(
    iters: int,
    damping: float,
    rd: int,
    *,
    dangling: bool = False,
    mass_rd: int = 6,
    seeds: int = 0,
) -> str:
    """Chained-CTE replay of operators/graph.py::pagerank. ``rd`` and
    ``mass_rd`` MUST match the operator call's ``round_decimals`` /
    ``mass_round_decimals`` — the two precisions are paired parameters
    on both sides so they cannot drift (r6 advice fix: the mass pin
    was a hardcoded 6 in both places). ``seeds > 0`` replays the
    PERSONALIZED variant: teleport mass 1/seeds on the lexicographic
    first ``seeds`` supplier nodes, matching the graph_pagerank_seeded
    query's seed selection."""
    parts = [
        """edges AS (
      SELECT DISTINCT 's' || l_suppkey AS src, 'c' || o_custkey AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""",
        """nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges))""",
        "nn AS (SELECT count(*)::DOUBLE AS n FROM nodes)",
        "deg AS (SELECT src, count(*)::DOUBLE AS d FROM edges GROUP BY src)",
    ]
    if seeds:
        parts.append(f"""sd AS MATERIALIZED (
      SELECT node FROM nodes WHERE node LIKE 's%'
      ORDER BY node LIMIT {int(seeds)})""")
        parts.append(f"""nt AS MATERIALIZED (
      SELECT nodes.node,
             CASE WHEN sd.node IS NOT NULL
                  THEN 1.0 / {float(seeds)!r} ELSE 0.0 END AS tele
      FROM nodes LEFT JOIN sd ON sd.node = nodes.node)""")
        parts.append("r0 AS (SELECT node, tele AS pr FROM nt)")
    else:
        parts.append(
            "r0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn)"
        )
    for i in range(1, iters + 1):
        if dangling:
            # sink mass of the previous round, rounded to mass_rd (the
            # determinism pin on an order-dependent ~N-term float sum)
            parts.append(f"""m{i} AS (
      SELECT round(coalesce(sum(pr), 0), {int(mass_rd)}) AS m FROM r{i - 1} r
      WHERE NOT EXISTS (SELECT 1 FROM deg WHERE deg.src = r.node))""")
        extra = f" + m{i}.m / nn.n" if dangling else ""
        mjoin = f" CROSS JOIN m{i}" if dangling else ""
        restart = (
            f"(1 - {damping}) * nt.tele"
            if seeds
            else f"(1 - {damping}) / nn.n"
        )
        base = "nt" if seeds else "nodes"
        parts.append(f"""r{i} AS (
      SELECT {base}.node,
             round({restart}
                   + {damping} * (coalesce(s.s, 0){extra}), {rd}) AS pr
      FROM {base} CROSS JOIN nn{mjoin}
      LEFT JOIN (
        SELECT e.dst AS node, sum(r.pr / deg.d) AS s
        FROM edges e JOIN r{i - 1} r ON e.src = r.node
        JOIN deg ON deg.src = e.src
        GROUP BY e.dst) s ON s.node = {base}.node)""")
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT node, round(pr, 8) AS pr FROM (
      SELECT node, pr,
             row_number() OVER (ORDER BY pr DESC, node) AS rn
      FROM r{iters}) WHERE rn <= 20
    """


@register(
    "graph_pagerank_seeded",
    oracle=_pagerank_oracle(5, 0.85, 10, seeds=5),
)
def graph_pagerank_seeded(spark, sf_dir):
    """Personalized PageRank (Page et al. 1999 §6) over the
    supplier->customer graph: teleport mass concentrated on the five
    lexicographically-first supplier nodes, so rank measures proximity
    to that seed set — the graph-expansion retrieval primitive
    (related suppliers/customers from a seed portfolio). Same
    once-shuffled edge loop as graph_pagerank; the teleport vector is
    folded into the node frame as a column before the loop
    (operators/graph.py ``teleport=``). The oracle replays seed
    selection, teleport weights, and all five rounds."""
    from wagtail_vector_index_spark.operators.graph import pagerank

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        )
        .distinct()
        # the edge frame feeds THREE consumers (seed derivation, the
        # operator's teleport count, the loop's own partition+checkpoint)
        # — materialize the join once instead of re-executing it per
        # consumer (lazy: blocks reclaimed when the frame drops)
        .localCheckpoint(eager=False)
    )
    seeds = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(5)
    )
    ranks = pagerank(
        edges, iterations=5, damping=0.85, round_decimals=10,
        teleport=seeds, broadcast_ranks=True,
    )
    w = Window.orderBy(F.col("pr").desc(), F.col("node").asc())
    return (
        ranks.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 20)
        .select("node", F.round("pr", 8).alias("pr"))
    )


@register(
    "graph_pagerank_dangling",
    oracle=_pagerank_oracle(5, 0.85, 10, dangling=True, mass_rd=6),
)
def graph_pagerank_dangling(spark, sf_dir):
    """Textbook PageRank (dangling mass redistributed) over the same
    supplier->customer graph as ``graph_pagerank``: every customer node
    is a sink (customers are never sources), so each round's sink mass
    — one anti-join + 1-row agg, broadcast into the update
    (operators/graph.py, ``dangling="redistribute"``) — flows back
    uniformly and ranks remain a probability distribution. The 6-dp
    rounding of the sink-mass sum is the cross-engine determinism pin
    for an order-dependent ~N-term float accumulation; the oracle
    replays all five rounds plus the mass term as chained CTEs."""
    from wagtail_vector_index_spark.operators.graph import pagerank

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(
        edges, iterations=5, damping=0.85, round_decimals=10,
        dangling="redistribute", mass_round_decimals=6,
        broadcast_ranks=True,
    )
    w = Window.orderBy(F.col("pr").desc(), F.col("node").asc())
    return (
        ranks.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 20)
        .select("node", F.round("pr", 8).alias("pr"))
    )


@register(
    "q_bloom_semi_join",
    oracle="""
    SELECT count(*)::BIGINT AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                         WHERE o_orderpriority = '1-URGENT')
    """,
)
def q_bloom_semi_join(spark, sf_dir):
    """Runtime-filter semi join (operators/skew.py::bloom_semi_join):
    revenue of lineitems belonging to urgent orders, with the big side
    pre-filtered MAP-SIDE by an 8 KiB deterministic xxhash64-Bloom built
    from the key set — only bloom survivors reach the exactness
    exchange, the shuffled-bytes saving that matters when the key set
    itself is too big to broadcast. Bloom filters have no false
    negatives and the exact pass removes false positives, so the
    result — and the oracle — is the plain IN-subquery semi join."""
    from wagtail_vector_index_spark.operators.skew import bloom_semi_join

    li = _t(spark, sf_dir, "lineitem")
    urgent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    kept = bloom_semi_join(li, urgent, "l_orderkey")
    return kept.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


def _lpa_oracle(rounds: int) -> str:
    parts = [
        """li AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 4 = 0)""",
        """e AS MATERIALIZED (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                      greatest(a.l_partkey, b.l_partkey) AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)""",
        """sym AS MATERIALIZED (
      SELECT u, v FROM e UNION SELECT v, u FROM e)""",
        "l0 AS (SELECT DISTINCT u AS node, u AS community FROM sym)",
    ]
    for i in range(1, rounds + 1):
        parts.append(f"""c{i} AS (
      SELECT s.u AS node, l.community, count(*) AS c
      FROM sym s JOIN l{i - 1} l ON l.node = s.v
      GROUP BY s.u, l.community)""")
        parts.append(f"""l{i} AS MATERIALIZED (
      SELECT node, community FROM (
        SELECT node, community,
               row_number() OVER (PARTITION BY node
                                  ORDER BY c DESC, community) AS rn
        FROM c{i}) WHERE rn = 1)""")
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT community, count(*)::BIGINT AS n_nodes
    FROM l{rounds} GROUP BY community
    ORDER BY n_nodes DESC, community LIMIT 10
    """


def _kcore_oracle(k: int, rounds: int) -> str:
    parts = [
        """li AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 4 = 0)""",
        """e AS MATERIALIZED (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                      greatest(a.l_partkey, b.l_partkey) AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)""",
        """s0 AS MATERIALIZED (
      SELECT u, v FROM e UNION SELECT v, u FROM e)""",
    ]
    for i in range(1, rounds + 1):
        parts.append(f"""k{i} AS MATERIALIZED (
      SELECT u AS node FROM (
        SELECT u, count(*) AS d FROM s{i - 1} GROUP BY u)
      WHERE d >= {int(k)})""")
        parts.append(f"""s{i} AS MATERIALIZED (
      SELECT s.u, s.v FROM s{i - 1} s
      JOIN k{i} a ON a.node = s.u JOIN k{i} b ON b.node = s.v)""")
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT node, deg FROM (
      SELECT u AS node, count(*)::BIGINT AS deg,
             row_number() OVER (ORDER BY count(*) DESC, u) AS rn
      FROM s{rounds} GROUP BY u) WHERE rn <= 10
    """


@register("graph_kcore", oracle=_kcore_oracle(18, 6))
def graph_kcore(spark, sf_dir):
    """k-core of the part co-purchase graph (k=18, six peel rounds —
    converged at the gate scale, so the survivors ARE the 18-core):
    top-10 surviving parts by within-core degree. The peel
    (operators/graph.py::kcore) is the dense-subgraph cleaning
    primitive — each round one degree agg + two semi-join filters over
    an only-shrinking edge frame, fixed rounds so the chained-CTE
    oracle replays every deletion exactly."""
    from wagtail_vector_index_spark.operators.graph import kcore

    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 4 == 0
    ).select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "ok")
        .where(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )
    # broadcast_filter: the part co-occurrence node set is ~20k parts
    # vs ~600k edges — the hits broadcast_scores argument
    core = kcore(edges, k=18, rounds=6, broadcast_filter=True)
    w = Window.orderBy(F.col("deg").desc(), F.col("node").asc())
    return (
        core.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 10)
        .select("node", "deg")
    )


@register("graph_communities", oracle=_lpa_oracle(3))
def graph_communities(spark, sf_dir):
    """Community detection (synchronous label propagation, Raghavan et
    al. 2007) over the part co-purchase graph: three deterministic
    rounds — every node adopts its neighbors' majority label, ties to
    the smaller — then the ten largest communities. Complements
    connected components (reachability) and triangles (local density)
    with the mesoscale split; the fixed round count + total tie order
    make the labels a pure function of the edge set, replayed by the
    oracle as chained CTEs (operators/graph.py::label_propagation)."""
    from wagtail_vector_index_spark.operators.graph import label_propagation

    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 4 == 0
    ).select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "ok")
        .where(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )
    # broadcast_labels: same node-set-vs-edges argument as graph_kcore
    labels = label_propagation(edges, rounds=3, broadcast_labels=True)
    w = Window.orderBy(F.col("n_nodes").desc(), F.col("community").asc())
    return (
        labels.groupBy("community")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 10)
        .select("community", "n_nodes")
    )


@register(
    "graph_triangles",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 4 = 0),
    e AS (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                      greatest(a.l_partkey, b.l_partkey) AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    tri AS (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM e e1 JOIN e e2 ON e1.v = e2.u
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
    member AS (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri),
    cnt AS (
      SELECT node, count(*)::BIGINT AS n_tri FROM member GROUP BY node)
    SELECT node, n_tri FROM (
      SELECT node, n_tri,
             row_number() OVER (ORDER BY n_tri DESC, node) AS rn
      FROM cnt) WHERE rn <= 10
    """,
)
def graph_triangles(spark, sf_dir):
    """Triangle counting over the part co-purchase graph (parts sharing
    an order, orders subsampled 4:1 to keep the gate-size wedge join
    honest): top-10 parts by triangle membership. The operator
    (operators/graph.py::triangle_counts) enumerates wedges under
    DEGREE-ordered edge orientation — outdeg is O(sqrt(m))-bounded, so
    hub nodes cannot explode the wedge join at 100 TB — while the
    oracle counts the same triangles with the naive id-ordered triple
    join: two different enumeration orders, identical integer counts,
    which is exactly the cross-check a counting operator wants."""
    from wagtail_vector_index_spark.operators.graph import triangle_counts

    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 4 == 0
    ).select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "ok")
        .where(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )
    counts = triangle_counts(edges)
    w = Window.orderBy(F.col("n_tri").desc(), F.col("node").asc())
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 10)
        .select("node", "n_tri")
    )


@register("graph_pagerank", oracle=_pagerank_oracle(5, 0.85, 10))
def graph_pagerank(spark, sf_dir):
    """PageRank over the supplier->customer fulfillment graph (distinct
    (l_suppkey, o_custkey) edges): 5 damped iterations, top-20 nodes.
    Each round is a contribution join + per-node sum — pure
    shuffle-on-node-key work with no driver-side graph state
    (operators/graph.py), the iterative sibling of connected
    components. Per-round rounding to 10 dp pins the order-dependent
    float sums across engines; the oracle replays all five rounds as
    chained CTEs plus the final ranking."""
    from wagtail_vector_index_spark.operators.graph import pagerank

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(
        edges, iterations=5, damping=0.85, round_decimals=10,
        broadcast_ranks=True,
    )
    w = Window.orderBy(F.col("pr").desc(), F.col("node").asc())
    return (
        ranks.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 20)
        .select("node", F.round("pr", 8).alias("pr"))
    )


_AMS_DEPTH = 32
# r11 convention: one sha256 per row; estimator j's sign is the parity
# of hex nibble j+1 (operators/sketches.py::ams_f2 replays identically)
_AMS_SIGN = (
    "(1 - 2 * ((('0x' || substr(sha256(user_id::VARCHAR),"
    " {j1}, 1))::UBIGINT % 2)::BIGINT))"
)
_AMS_SUMS = ", ".join(
    f"sum({_AMS_SIGN.format(j1=j + 1)})::BIGINT AS z{j}"
    for j in range(_AMS_DEPTH)
)
_AMS_SQ = ", ".join(
    f"(z{j} * z{j})::DOUBLE" for j in range(_AMS_DEPTH)
)


@register(
    "sketch_f2_selfjoin",
    oracle=f"""
    WITH z AS (SELECT {_AMS_SUMS} FROM events),
    sq AS (SELECT list_sort([{_AMS_SQ}]) AS s FROM z),
    est AS (
      SELECT (s[{_AMS_DEPTH // 2}] + s[{_AMS_DEPTH // 2 + 1}]) / 2.0
             AS f2_estimate
      FROM sq),
    ex AS (
      SELECT sum(f * f)::BIGINT AS f2_exact FROM (
        SELECT count(*)::BIGINT AS f FROM events GROUP BY user_id))
    SELECT ex.f2_exact,
           round(est.f2_estimate, 2) AS f2_estimate,
           round(abs(est.f2_estimate - ex.f2_exact) / ex.f2_exact, 4)
             AS rel_err
    FROM ex, est
    """,
)
def sketch_f2_selfjoin(spark, sf_dir):
    """Self-join size (second frequency moment F2) of ``events.user_id``
    via the AMS sign sketch — the one-pass, 32-longs-of-state join-size
    estimator a planner consults before picking a strategy at 100 TB
    (operators/sketches.py::ams_f2). Every occurrence adds a
    sha-parity-derived +-1 to each of 32 partial-agg'd counters; the
    estimate is the median of the squared sums. The exact F2
    (sum of per-user count squared) is the ``eval_exact`` gate
    companion; production drops it and the whole operator is one
    map-side-combined agg row."""
    from wagtail_vector_index_spark.operators.sketches import ams_f2

    ev = _t(spark, sf_dir, "events")
    out = ams_f2(ev, value_col="user_id", depth=_AMS_DEPTH)
    return out.select(
        "f2_exact",
        F.round("f2_estimate", 2).alias("f2_estimate"),
        F.round("rel_err", 4).alias("rel_err"),
    )


def _hits_oracle(rounds: int, rd: int) -> str:
    """Chained-CTE replay of operators/graph.py::hits on the
    supplier->part bipartite graph: every contribution sum and
    max-normalization, rounded identically per round."""
    parts = [
        """e AS MATERIALIZED (
      SELECT DISTINCT 's' || l_suppkey AS u, 'p' || l_partkey AS v
      FROM lineitem)""",
        "h0 AS (SELECT DISTINCT u, 1.0 AS h FROM e)",
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"""ar{t} AS MATERIALIZED (
      SELECT v, round(sum(h), {rd}) AS a
      FROM e JOIN h{t - 1} USING (u) GROUP BY v)"""
        )
        parts.append(
            f"""a{t} AS (
      SELECT v, round(a / (SELECT max(a) FROM ar{t}), {rd}) AS a
      FROM ar{t})"""
        )
        parts.append(
            f"""hr{t} AS MATERIALIZED (
      SELECT u, round(sum(a), {rd}) AS h
      FROM e JOIN a{t} USING (v) GROUP BY u)"""
        )
        parts.append(
            f"""h{t} AS (
      SELECT u, round(h / (SELECT max(h) FROM hr{t}), {rd}) AS h
      FROM hr{t})"""
        )
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT node, auth FROM (
      SELECT v AS node, round(a, 8) AS auth,
             row_number() OVER (ORDER BY a DESC, v) AS rn
      FROM a{rounds}) WHERE rn <= 10
    """


@register("graph_hits", oracle=_hits_oracle(4, 10))
def graph_hits(spark, sf_dir):
    """HITS authorities over the supplier->part bipartite graph
    (distinct (l_suppkey, l_partkey) edges): four mutual-reinforcement
    rounds, top-10 parts by authority score — "the items good hubs
    buy", the complement of PageRank's single-score prestige
    (operators/graph.py::hits). Both edge copies shuffle once; only
    the small hub/auth score tables move per round. Per-round 10-dp
    rounding pins the order-dependent float sums; the oracle replays
    all four rounds (sums + max-normalizations) as chained CTEs."""
    from wagtail_vector_index_spark.operators.graph import hits

    li = _t(spark, sf_dir, "lineitem")
    # numeric node encoding (suppkey*2 / partkey*2+1): long shuffle and
    # agg keys through all 8 half-rounds instead of concat'd strings
    # (~15% at sf0.1); labels reconstruct after the loop, before the
    # (auth desc, node asc) top-10 so the tie order matches the oracle.
    edges = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    )
    scores = hits(
        edges, rounds=4, round_decimals=10, broadcast_scores=True
    )
    label = (
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("s"), (F.col("node") / 2).cast("long")),
        ).otherwise(
            F.concat(F.lit("p"), ((F.col("node") - 1) / 2).cast("long"))
        )
    )
    scores = scores.select(label.alias("node"), "auth")
    w = Window.orderBy(F.col("auth").desc(), F.col("node").asc())
    return (
        scores.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 10)
        .select("node", F.round("auth", 8).alias("auth"))
    )


@register(
    "sketch_kmv_sliding",
    oracle=f"""
    WITH src AS (
      SELECT date_trunc('day', ts)::DATE AS day, {_KMV_U} AS u FROM events),
    d AS (SELECT DISTINCT day, u FROM src),
    r AS (SELECT day, u,
                 row_number() OVER (PARTITION BY day ORDER BY u) AS rn
          FROM d),
    sk AS (SELECT day, list_sort(list(u)) AS kvals
           FROM r WHERE rn <= 64 GROUP BY day),
    m AS (
      SELECT a.day,
             list_sort(list_distinct(flatten(list(b.kvals))))[1:64] AS mv
      FROM sk a JOIN sk b
        ON b.day <= a.day AND b.day >= a.day - INTERVAL 2 DAY
      GROUP BY a.day),
    est AS (
      SELECT day,
             CASE WHEN len(mv) >= 64 THEN 63.0 / mv[len(mv)]
                  ELSE len(mv)::DOUBLE END AS e
      FROM m),
    dv AS (SELECT DISTINCT date_trunc('day', ts)::DATE AS vday, user_id
           FROM events),
    ex AS (
      SELECT a.day, count(DISTINCT v.user_id)::BIGINT AS exact_distinct
      FROM (SELECT day FROM sk) a JOIN dv v
        ON v.vday <= a.day AND v.vday >= a.day - INTERVAL 2 DAY
      GROUP BY a.day)
    SELECT ex.day, ex.exact_distinct, round(est.e, 2) AS kmv_estimate,
           round(abs(est.e - ex.exact_distinct) / ex.exact_distinct, 4)
             AS rel_err
    FROM ex JOIN est USING (day)
    """,
)
def sketch_kmv_sliding(spark, sf_dir):
    """Rolling 3-day distinct-user reach per day, answered from per-day
    KMV sketches (operators/sketches.py::kmv_sliding_distinct): the
    raw events scan once into one bottom-k sketch per day; every
    window estimate merges <= 3 day-sketches via a broadcast range
    self-join of the days-row sketch table — the persist-daily-
    sketches, merge-any-window-at-query-time pattern that answers
    rolling-reach dashboards at 100 TB without rescanning. The exact
    trailing distinct (day-grain distinct + range join, the pass the
    sketch replaces) rides as the eval_exact companion with measured
    relative error."""
    from wagtail_vector_index_spark.operators.sketches import (
        kmv_sliding_distinct,
    )

    ev = _t(spark, sf_dir, "events")
    out = kmv_sliding_distinct(
        ev, ts_col="ts", value_col="user_id", window=3, k=64
    )
    return out.select(
        "day",
        "exact_distinct",
        F.round("kmv_estimate", 2).alias("kmv_estimate"),
        F.round("rel_err", 4).alias("rel_err"),
    )


@register(
    "q_drift_ks",
    oracle="""
    WITH c AS (
      SELECT value,
             sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_b
      FROM events WHERE event_type IN ('view', 'click')
      GROUP BY value),
    cum AS (
      SELECT sum(n_a) OVER (ORDER BY value) AS ca,
             sum(n_b) OVER (ORDER BY value) AS cb
      FROM c),
    tot AS (SELECT max(ca)::BIGINT AS ta, max(cb)::BIGINT AS tb FROM cum)
    SELECT ta AS n_view, tb AS n_click,
           round(max(abs(ca::DOUBLE / ta - cb::DOUBLE / tb)), 6) AS d_stat
    FROM cum, tot GROUP BY ta, tb
    """,
)
def q_drift_ks(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov drift statistic between the view
    and click value distributions — the distribution-shift monitor every
    production pipeline runs between yesterday's data and today's. The
    sup|F_a - F_b| is attained at sample points, so: aggregate to
    distinct-value grain (map-side-combinable, the only pass over the
    raw events), then a DISTRIBUTED prefix scan
    (operators/prefixsum.py — range-sort + O(P) offsets + one Arrow
    pass) turns per-value counts into both ECDFs with no single-task
    global window; the final max is a plain agg. At 100 TB the scan's
    state is one row per partition on the driver and the heavy input
    never sees a one-task stage."""
    from wagtail_vector_index_spark.operators.prefixsum import (
        prefix_sum_with_totals,
    )

    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "click")
    )
    counts = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
            "n_a"
        ),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "n_b"
        ),
    )
    cum, totals = prefix_sum_with_totals(
        counts, order_cols=["value"], value_cols=["n_a", "n_b"]
    )
    ta, tb = float(totals["n_a"]), float(totals["n_b"])
    return cum.agg(
        F.lit(int(ta)).cast("long").alias("n_view"),
        F.lit(int(tb)).cast("long").alias("n_click"),
        F.round(
            F.max(
                F.abs(F.col("n_a_cum") / F.lit(ta) - F.col("n_b_cum") / F.lit(tb))
            ),
            6,
        ).alias("d_stat"),
    )


@register(
    "pipeline_dense_ids",
    oracle="""
    SELECT doc_id, n_chars,
           row_number() OVER (ORDER BY n_chars DESC, doc_id DESC) AS rank
    FROM documents
    """,
)
def pipeline_dense_ids(spark, sf_dir):
    """Gapless ordered id assignment (longest-document-first) with NO
    single-task stage — the numbering every graph build, shard layout,
    and reproducible-shuffle pipeline needs, where the naive
    row_number() OVER (ORDER BY ...) collapses 100 TB into one task.
    operators/prefixsum.py::assign_dense_ids: Spark's own distributed
    range sort assigns ascending key ranges to ascending partition ids,
    a one-row-per-partition count aggregate becomes exclusive offsets on
    the driver (O(P) state), and one narrow Arrow pass numbers each
    partition from its offset. doc_id rides as the unique tiebreaker so
    the numbering is deterministic."""
    from wagtail_vector_index_spark.operators.prefixsum import (
        assign_dense_ids,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return assign_dense_ids(
        docs,
        order_cols=["n_chars", "doc_id"],
        out_col="rank",
        descending=True,
    )


@register(
    "sketch_overlap_matrix",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT event_type AS t, user_id FROM events),
    uu AS (SELECT t, {_KMV_U} AS u FROM d),
    r AS (
      SELECT t, u, row_number() OVER (PARTITION BY t ORDER BY u) AS rn
      FROM uu),
    sk AS (
      SELECT t, list_sort(list(u)) AS kvals
      FROM r WHERE rn <= 64 GROUP BY t),
    cnt AS (SELECT t, count(*) AS c FROM d GROUP BY t),
    ix AS (
      SELECT a.t AS ta, b.t AS tb, count(*) AS ci
      FROM d a JOIN d b ON a.user_id = b.user_id AND a.t < b.t
      GROUP BY 1, 2),
    pair AS (
      SELECT a.t AS tag_a, b.t AS tag_b, a.kvals AS ka, b.kvals AS kb,
             list_sort(list_distinct(a.kvals || b.kvals))[1:64] AS m,
             ca.c AS cca, cb.c AS ccb, coalesce(ix.ci, 0) AS cci
      FROM sk a JOIN sk b ON a.t < b.t
      JOIN cnt ca ON ca.t = a.t JOIN cnt cb ON cb.t = b.t
      LEFT JOIN ix ON ix.ta = a.t AND ix.tb = b.t),
    est AS (
      SELECT tag_a, tag_b, cca, ccb, cci,
             CASE WHEN len(m) >= 64 THEN 63.0 / m[len(m)]
                  ELSE len(m)::DOUBLE END AS union_est,
             len(list_filter(m, x -> list_contains(ka, x)
                                    AND list_contains(kb, x))) AS ic,
             len(m) >= 64 AS sat
      FROM pair)
    SELECT tag_a, tag_b, (cca + ccb - cci) AS union_exact,
           round(union_est, 2) AS union_est,
           cci AS intersect_exact,
           round(CASE WHEN sat THEN ic / 64.0 * union_est
                      ELSE ic::DOUBLE END, 2) AS intersect_est
    FROM est
    """,
)
def sketch_overlap_matrix(spark, sf_dir):
    """Full pairwise audience-overlap matrix — distinct-user union and
    intersection estimates for EVERY pair of the five event types — from
    per-type KMV sketches built in ONE scan + ONE grouped Arrow fold
    (operators/sketches.py::kmv_overlap_matrix). T segments answer
    T*(T-1)/2 dashboard cells from T sketches; each value explodes into
    its segment tags plus its segment-pair tags so the exact eval
    companions ride the same fold (inclusion-exclusion, no extra scan).
    The production form (eval_exact=False) explodes singles only."""
    from wagtail_vector_index_spark.operators.sketches import (
        kmv_overlap_matrix,
    )

    ev = _t(spark, sf_dir, "events")
    out = kmv_overlap_matrix(
        ev, value_col="user_id", tag_col="event_type", k=64
    )
    return out.select(
        "tag_a",
        "tag_b",
        "union_exact",
        F.round("union_est", 2).alias("union_est"),
        "intersect_exact",
        F.round("intersect_est", 2).alias("intersect_est"),
    )


@register(
    "q_attribution_last_touch",
    oracle="""
    WITH w AS (
      SELECT event_type, ts, user_id,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pts,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS ptype
      FROM events)
    SELECT coalesce(ptype, 'none') AS touch,
           count(*)::BIGINT AS n_conversions,
           round(avg(date_diff('second', pts, ts) / 60.0), 2) AS avg_minutes
    FROM w WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def q_attribution_last_touch(spark, sf_dir):
    """Last-touch conversion attribution: every purchase is credited to
    the same user's most recent PRIOR view/click (or 'none'), with the
    mean minutes-to-convert per touch type — the marketing-analytics
    staple. One window partitioned BY USER (thousands of small
    per-user partitions — never a global sort), carrying the last
    qualifying (ts, type) struct via last(ignorenulls) over an
    unbounded-preceding frame; the attribution then aggregates
    map-side to a three-row report. At 100 TB the shuffle keys on
    user_id and each task streams its users' timelines once."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.last(
        F.when(
            F.col("event_type").isin("view", "click"),
            F.struct("ts", "event_type"),
        ),
        ignorenulls=True,
    ).over(w)
    ev = _t(spark, sf_dir, "events").withColumn("__prior", prior)
    conv = ev.where(F.col("event_type") == "purchase").select(
        F.coalesce(F.col("__prior.event_type"), F.lit("none")).alias("touch"),
        (
            (
                F.col("ts").cast("long")
                - F.col("__prior.ts").cast("long")
            )
            / 60.0
        ).alias("mins"),
    )
    return conv.groupBy("touch").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.round(F.avg("mins"), 2).alias("avg_minutes"),
    )


@register(
    "q_quality_expectations",
    oracle="""
    WITH rowchecks AS (
      SELECT count(*)::BIGINT AS checked,
             sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS v_null,
             sum(CASE WHEN NOT coalesce(o_totalprice <= 400000.0, FALSE)
                      THEN 1 ELSE 0 END)::BIGINT AS v_price,
             sum(CASE WHEN NOT coalesce(
                        o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM'),
                        FALSE) THEN 1 ELSE 0 END)::BIGINT AS v_prio
      FROM orders),
    dup AS (
      SELECT coalesce(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END), 0)::BIGINT
               AS violations,
             coalesce(sum(n), 0)::BIGINT AS checked
      FROM (SELECT count(*) AS n FROM orders GROUP BY o_custkey)),
    fk AS (
      SELECT count(*)::BIGINT AS violations FROM orders
      WHERE o_custkey IS NOT NULL
        AND o_custkey NOT IN (SELECT c_custkey FROM customer)),
    fkc AS (
      SELECT count(*)::BIGINT AS checked FROM orders
      WHERE o_custkey IS NOT NULL)
    SELECT 'not_null(o_orderdate)' AS rule, v_null AS violations,
           checked, v_null = 0 AS passed FROM rowchecks
    UNION ALL
    SELECT 'price_within_bound', v_price, checked, v_price = 0
    FROM rowchecks
    UNION ALL
    SELECT 'in_set(o_orderpriority)', v_prio, checked, v_prio = 0
    FROM rowchecks
    UNION ALL
    SELECT 'unique(o_custkey)', violations, checked, violations = 0 FROM dup
    UNION ALL
    SELECT 'foreign_key(o_custkey)', fk.violations, fkc.checked,
           fk.violations = 0
    FROM fk, fkc
    """,
)
def q_quality_expectations(spark, sf_dir):
    """Declarative data-quality gate (the Deequ / Great-Expectations
    shape) over the orders feed: five constraints — a null check, a
    numeric bound, set membership, key uniqueness, and referential
    integrity against customer — evaluated by
    operators/expectations.py::check_expectations. The three row-local
    rules compile into ONE aggregate over ONE scan (each rule a
    summed violation flag, map-side combinable — 10 rules cost the
    same scan as one); uniqueness is one groupBy on the key;
    the foreign key is one broadcast anti-join. The bound and
    membership rules fire on real rows, so the gate pins nonzero
    violation counts, not just the all-clean zeros."""
    from wagtail_vector_index_spark.operators.expectations import (
        check_expectations,
        foreign_key,
        in_set,
        not_null,
        satisfies,
        unique,
    )

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    rules = [
        not_null("o_orderdate"),
        satisfies(
            "price_within_bound", F.col("o_totalprice") <= 400000.0
        ),
        in_set("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM"]),
        unique("o_custkey"),
        foreign_key("o_custkey", customer, "c_custkey"),
    ]
    return check_expectations(orders, rules)


@register(
    "q_snapshot_diff",
    oracle="""
    WITH a AS (SELECT doc_id, text FROM documents),
    b AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN text || ' v2' ELSE text END AS text
      FROM documents WHERE doc_id % 17 <> 0
      UNION ALL
      SELECT doc_id + 100000, text FROM documents WHERE doc_id % 25 = 0),
    j AS (
      SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, a.text AS ta, b.text AS tb
      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
    SELECT doc_id,
           CASE WHEN ta IS NULL THEN 'added'
                WHEN tb IS NULL THEN 'removed'
                ELSE 'changed' END AS change
    FROM j
    WHERE ta IS NULL OR tb IS NULL OR ta <> tb
    """,
)
def q_snapshot_diff(spark, sf_dir):
    """Snapshot change-data-capture: diff two table versions into
    added / removed / changed rows — the SCD / incremental-sync
    primitive every warehouse feed needs (snapshot B is derived
    deterministically from A: every 17th doc deleted, every 10th
    edited, every 25th re-added under a new id, so both engines build
    identical inputs). ONE full outer join keyed on the id — at 100 TB
    both snapshots shuffle once on the key (or zero times if both are
    bucketed by id, the layout the repo's bucketed-join machinery
    provides) and the change classification is a pure projection;
    unchanged rows never leave the join."""
    docs = _t(spark, sf_dir, "documents")
    a = docs.select("doc_id", "text")
    b = docs.where(F.col("doc_id") % 17 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).unionByName(
        docs.where(F.col("doc_id") % 25 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    j = a.withColumnRenamed("text", "ta").join(
        b.withColumnRenamed("text", "tb"), "doc_id", "full_outer"
    )
    return j.where(
        F.col("ta").isNull()
        | F.col("tb").isNull()
        | (F.col("ta") != F.col("tb"))
    ).select(
        "doc_id",
        F.when(F.col("ta").isNull(), F.lit("added"))
        .when(F.col("tb").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("change"),
    )


@register(
    "q_user_value_deciles",
    oracle="""
    WITH u AS (
      SELECT user_id, sum(value) AS spend
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id),
    n AS (SELECT count(*) AS n FROM u),
    r AS (
      SELECT spend,
             row_number() OVER (ORDER BY spend DESC, user_id) AS rn
      FROM u)
    SELECT floor(10 * (rn - 1) / n)::BIGINT AS decile,
           count(*)::BIGINT AS users,
           round(sum(spend), 2) AS total_spend,
           round(avg(spend), 2) AS avg_spend
    FROM r, n
    GROUP BY 1
    """,
)
def q_user_value_deciles(spark, sf_dir):
    """Customer-value decile report (the LTV segmentation every growth
    team runs): rank purchasers by total spend, cut into 10 equal-count
    buckets, report size and spend per decile. The global rank uses
    the DISTRIBUTED prefix scan (operators/prefixsum.py::
    assign_dense_ids — range sort + O(P) offsets, NO single-task
    window), with the user count read from the same pass's driver-side
    partition counts; the decile arithmetic is integer floor division,
    portable across engines. At 100 TB of events the only heavy
    exchange is the user-grain spend agg (map-side combinable)."""
    from wagtail_vector_index_spark.operators.prefixsum import (
        assign_dense_ids,
    )

    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    spend = ev.groupBy("user_id").agg(F.sum("value").alias("spend"))
    # tie order (user_id DESC here vs ASC in the oracle) cannot change
    # the report: rank permutations within an equal-spend group move
    # identical spend values between buckets
    ranked = assign_dense_ids(
        spend, order_cols=["spend", "user_id"], out_col="rn", descending=True
    )
    n = spend.count()
    return (
        ranked.select(
            F.floor(F.lit(10) * (F.col("rn") - 1) / F.lit(n))
            .cast("bigint")
            .alias("decile"),
            "spend",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("users"),
            F.round(F.sum("spend"), 2).alias("total_spend"),
            F.round(F.avg("spend"), 2).alias("avg_spend"),
        )
    )


@register(
    "sketch_join_size",
    oracle="""
    WITH s AS (
      SELECT user_id::VARCHAR AS v,
             CASE WHEN event_type = 'view' THEN 'a'
                  WHEN event_type = 'click' THEN 'b' END AS side
      FROM events WHERE event_type IN ('view', 'click')),
    h AS (
      SELECT side, r,
             ('0x' || substr(sha256('cm' || r || ':' || v), 1, 8))::UBIGINT
               % 256 AS bucket
      FROM s CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r)),
    t AS (SELECT side, r, bucket, count(*) AS c FROM h GROUP BY 1, 2, 3),
    ip AS (
      SELECT a.r, sum(a.c * b.c) AS ip
      FROM t a JOIN t b ON a.r = b.r AND a.bucket = b.bucket
      WHERE a.side = 'a' AND b.side = 'b'
      GROUP BY a.r),
    est AS (SELECT min(ip)::BIGINT AS join_size_est FROM ip),
    ex AS (
      SELECT coalesce(sum(na * nb), 0)::BIGINT AS join_size_exact
      FROM (SELECT v, count(*) AS na FROM s WHERE side = 'a' GROUP BY v) x
      JOIN (SELECT v, count(*) AS nb FROM s WHERE side = 'b' GROUP BY v) y
        USING (v))
    SELECT ex.join_size_exact, est.join_size_est,
           round((est.join_size_est - ex.join_size_exact)
                 / ex.join_size_exact::DOUBLE, 6) AS rel_overcount
    FROM est CROSS JOIN ex
    """,
)
def sketch_join_size(spark, sf_dir):
    """Join-cardinality estimation BEFORE running the join — the
    question every optimizer asks when choosing broadcast vs shuffle vs
    skew handling: |view ⋈_user click| = Σ_u f_view(u)·f_click(u),
    estimated as the count-min inner product (min over sketch rows of
    the row-wise counter dot product — never an undercount, collisions
    only inflate; Cormode & Muthukrishnan 2005). ONE scan builds both
    sides' depth×width counter tables (side rides the generated hash
    explode; partial-agg state ≤ 2×depth×width per task); the inner
    product runs over two ≤1024-row tables. The exact Σ f·f companion
    (eval_exact) pins the measured overcount."""
    from wagtail_vector_index_spark.operators.sketches import (
        countmin_join_size,
    )

    ev = _t(spark, sf_dir, "events")
    return countmin_join_size(
        ev,
        value_col="user_id",
        cond_a=F.col("event_type") == "view",
        cond_b=F.col("event_type") == "click",
        depth=4,
        width=256,
    )


@register(
    "q_daily_trend",
    oracle="""
    WITH d AS (
      SELECT event_type, date_trunc('day', ts)::DATE AS day,
             round(sum(value), 6) AS y
      FROM events GROUP BY 1, 2),
    x AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', day)::DOUBLE AS x, y
      FROM d)
    SELECT event_type, count(*)::BIGINT AS n_days,
           round((count(*) * sum(x * y) - sum(x) * sum(y))
                 / (count(*) * sum(x * x) - sum(x) * sum(x)), 6) AS slope
    FROM x GROUP BY event_type
    """,
)
def q_daily_trend(spark, sf_dir):
    """Per-segment trend detection: the OLS slope of daily revenue per
    event type — the "is this metric drifting" primitive behind every
    alerting dashboard. One map-side-combinable day-grain agg collapses
    100 TB of events to (types × days) rows; the closed-form slope
    (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) is then a second tiny agg. Day
    indexes are CENTERED on a fixed epoch near the data so the
    difference-of-products never catastrophically cancels (x ≈ 0–30,
    not 19 700), and daily sums are rounded 6 dp in both engines to pin
    the order-dependent float sum before the slope arithmetic."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("y"))
    x = F.datediff(
        F.col("day"), F.to_date(F.lit("2024-01-01"))
    ).cast("double")
    pts = daily.select("event_type", x.alias("x"), "y")
    n = F.count(F.lit(1)).cast("double")
    return pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(
            (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            / (
                n * F.sum(F.col("x") * F.col("x"))
                - F.sum("x") * F.sum("x")
            ),
            6,
        ).alias("slope"),
    )


@register(
    "q_column_entropy",
    oracle="""
    WITH vals AS (
      SELECT 'event_type' AS col, event_type AS v FROM events
      UNION ALL
      SELECT 'value_bucket', least(floor(value / 50.0), 9)::VARCHAR
      FROM events
      UNION ALL
      SELECT 'hour_of_day', extract(hour FROM ts)::VARCHAR FROM events),
    c AS (SELECT col, v, count(*) AS n FROM vals GROUP BY 1, 2),
    t AS (SELECT col, sum(n) AS tot, count(*) AS card FROM c GROUP BY col)
    SELECT c.col, max(t.card)::BIGINT AS cardinality,
           round(-sum((c.n::DOUBLE / t.tot) * ln(c.n::DOUBLE / t.tot)), 6)
             AS entropy_nats
    FROM c JOIN t USING (col)
    GROUP BY c.col
    """,
)
def q_column_entropy(spark, sf_dir):
    """Column-profiling entropy report: Shannon entropy (nats) and
    cardinality of three derived event columns — the profiling pass
    that tells a pipeline which columns are informative keys, which
    are near-constant, and which are near-unique. One scan unpivots
    the columns into (col, value) rows (a generated-column explode, so
    three profiles cost one pass), then two map-side-combinable aggs:
    value-grain counts, then per-column -Σ p ln p. At 100 TB the
    exchange carries value-grain partial counts, never rows."""
    ev = _t(spark, sf_dir, "events")
    vals = ev.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("event_type").alias("col"),
                    F.col("event_type").alias("v"),
                ),
                F.struct(
                    F.lit("value_bucket").alias("col"),
                    F.least(F.floor(F.col("value") / 50.0), F.lit(9))
                    .cast("string")
                    .alias("v"),
                ),
                F.struct(
                    F.lit("hour_of_day").alias("col"),
                    F.hour("ts").cast("string").alias("v"),
                ),
            )
        ).alias("cv")
    ).select("cv.col", "cv.v")
    c = vals.groupBy("col", "v").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("col").agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("card")
    )
    p = F.col("n") / F.col("tot")
    return (
        c.join(F.broadcast(t), "col")
        .groupBy("col")
        .agg(
            F.max("card").alias("cardinality"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy_nats"),
        )
    )


@register(
    "q_attribution_linear",
    oracle="""
    WITH t AS (
      SELECT user_id, ts, event_type FROM events
      WHERE event_type IN ('view', 'click')),
    p AS (
      SELECT e.user_id, e.ts,
             (SELECT count(*) FROM t
              WHERE t.user_id = e.user_id AND t.ts < e.ts) AS n_prior
      FROM events e WHERE e.event_type = 'purchase'),
    credited AS (
      SELECT t.event_type AS touch, 1.0 / p.n_prior AS credit
      FROM t JOIN p ON t.user_id = p.user_id AND t.ts < p.ts)
    SELECT touch, count(*)::BIGINT AS n_credited,
           round(sum(credit), 6) AS credit
    FROM credited GROUP BY touch
    """,
)
def q_attribution_linear(spark, sf_dir):
    """LINEAR multi-touch attribution: every purchase splits one unit
    of credit equally across ALL the user's prior view/click touches
    (the complement of q_attribution_last_touch's winner-take-all).
    The credit assignment is a user-keyed inequality join between a
    user's touches and purchases (bounded per user, never global), and
    the per-purchase touch count is a window over the SAME joined rows
    — so the strict before-purchase semantics cannot drift from the
    oracle's correlated count.
    Per-type totals aggregate map-side. The oracle states the same
    semantics with a correlated count, the declarative twin."""
    ev = _t(spark, sf_dir, "events")
    touches = ev.where(
        F.col("event_type").isin("view", "click")
    ).select("user_id", F.col("ts").alias("ts_t"), "event_type")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("ts_p"), F.col("event_id").alias("__pid")
    )
    j = touches.join(purchases, "user_id").where(
        F.col("ts_t") < F.col("ts_p")
    )
    # per-purchase touch count derived from the SAME join rows the
    # credit flows over, so the strict ts< semantics cannot drift from
    # the oracle's correlated count
    wp = Window.partitionBy("user_id", "__pid")
    credited = j.withColumn("__np", F.count(F.lit(1)).over(wp))
    return credited.groupBy(
        F.col("event_type").alias("touch")
    ).agg(
        F.count(F.lit(1)).alias("n_credited"),
        F.round(F.sum(F.lit(1.0) / F.col("__np")), 6).alias("credit"),
    )


@register(
    "q_pareto_frontier",
    oracle="""
    WITH g AS (
      SELECT o_totalprice AS price, max(o_orderdate) AS best_date
      FROM orders GROUP BY 1),
    f AS (
      SELECT price, best_date,
             max(best_date) OVER (ORDER BY price DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cm
      FROM g)
    SELECT round(f.price, 2) AS price, f.best_date::DATE AS best_date,
           count(*)::BIGINT AS n_orders
    FROM f JOIN orders o
      ON o.o_totalprice = f.price AND o.o_orderdate = f.best_date
    WHERE cm IS NULL OR f.best_date > cm
    GROUP BY 1, 2
    """,
)
def q_pareto_frontier(spark, sf_dir):
    """Skyline / Pareto-frontier query: the orders not dominated on
    (o_totalprice, o_orderdate) — no other order is >= on both axes and
    strictly better on one. The classic multi-criteria "best tradeoffs"
    operator (Borzsony et al. 2001, "The Skyline Operator").

    Spark-first shape: pre-aggregate to PRICE GRAIN (map-side
    combinable; only max(date) per price can be on the frontier, and
    equal-price rows must not shadow each other in the scan — the grain
    guarantees it), then the domination test is an EXCLUSIVE running
    max of best_date in descending-price order via the distributed
    two-phase prefix scan (operators/prefixsum.py::prefix_max) — range
    sort + O(P) carry + one Arrow cummax pass, NO single-task global
    window at any scale. The oracle states the same test with the
    single-partition window Spark must not use.  The fact join back
    (broadcast: frontier rows only) recovers order counts."""
    from wagtail_vector_index_spark.operators.prefixsum import prefix_max

    orders = _t(spark, sf_dir, "orders")
    g = orders.groupBy(F.col("o_totalprice").alias("price")).agg(
        F.max("o_orderdate").alias("best_date")
    )
    pm = prefix_max(
        g,
        order_cols=["price"],
        value_cols=["best_date"],
        descending=True,
        exclusive=True,
    )
    frontier = pm.where(
        F.col("best_date_cummax").isNull()
        | (F.col("best_date") > F.col("best_date_cummax"))
    ).drop("best_date_cummax")
    return (
        orders.join(
            F.broadcast(frontier),
            (F.col("o_totalprice") == F.col("price"))
            & (F.col("o_orderdate") == F.col("best_date")),
        )
        .groupBy(
            F.round("price", 2).alias("price"),
            F.col("best_date").cast("date").alias("best_date"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q_ewma_daily",
    oracle="""
    WITH d AS (
      SELECT event_type, date_trunc('day', ts)::DATE AS day,
             sum(value) AS x
      FROM events GROUP BY 1, 2)
    SELECT a.event_type, a.day,
           round(sum(b.x * power(0.8, date_diff('day', b.day, a.day)))
                 / sum(power(0.8, date_diff('day', b.day, a.day))), 6)
             AS ewma
    FROM d a JOIN d b
      ON b.event_type = a.event_type
     AND b.day <= a.day
     AND b.day >= a.day - INTERVAL 29 DAY
    GROUP BY 1, 2
    """,
)
def q_ewma_daily(spark, sf_dir):
    """Exponentially-weighted moving average of daily event value per
    event type — the smoothing pass behind trend dashboards and
    anomaly baselines. Calendar-decay form: weight 0.8^(age_days),
    truncated at a 29-day trailing horizon and normalized (a weighted
    mean), so the smoother is a pure function of the daily aggregates
    — no running-state recurrence, hence exactly replayable.

    Scale shape: the raw stream collapses to DAY GRAIN first (map-side
    combinable sum — the only full-data pass), then the smoother is a
    bounded range self-join of the tiny day-grain table (each anchor
    day joins <= 30 trailing rows within its type). The recurrence
    form s_t = a*x_t + (1-a)*s_{t-1} would serialize the whole
    timeline through one task; the truncated-window form is
    embarrassingly parallel and differs by at most 0.8^30 ~ 1e-3
    relative weight."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.sum("value").alias("x"))
    a = d.select("event_type", "day")
    b = d.select(
        F.col("event_type").alias("__bt"),
        F.col("day").alias("__bday"),
        F.col("x").alias("__bx"),
    )
    w = F.pow(F.lit(0.8), F.datediff(F.col("day"), F.col("__bday")))
    return (
        a.join(
            b,
            (F.col("__bt") == F.col("event_type"))
            & (F.col("__bday") <= F.col("day"))
            & (F.col("__bday") >= F.date_sub(F.col("day"), 29)),
        )
        .groupBy("event_type", "day")
        .agg(
            F.round(F.sum(F.col("__bx") * w) / F.sum(w), 6).alias("ewma")
        )
    )


@register(
    "sketch_hll_distinct",
    oracle="""
    WITH h AS (
      SELECT event_type,
             ('0x' || substr(sha256(user_id::VARCHAR), 1, 15))::UBIGINT::BIGINT
               AS h
      FROM events),
    b AS (
      SELECT event_type, (h & 255) AS reg,
             CASE WHEN (h >> 8) = 0 THEN 53
                  ELSE 53 - length(bin(h >> 8)) END AS rho
      FROM h),
    r AS (SELECT event_type, reg, max(rho) AS mrho FROM b GROUP BY 1, 2),
    s AS (
      SELECT event_type,
             (sum(1::BIGINT << (53 - mrho))
              + (256 - count(*)) * (1::BIGINT << 53))::BIGINT AS s_int
      FROM r GROUP BY 1),
    x AS (SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact
          FROM events GROUP BY 1)
    SELECT s.event_type, x.n_exact,
           round(0.7213 / (1 + 1.079 / 256) * 65536.0
                 * 9007199254740992.0 / s_int, 4) AS hll_est,
           round((0.7213 / (1 + 1.079 / 256) * 65536.0
                  * 9007199254740992.0 / s_int) / x.n_exact - 1, 4) AS rel_err
    FROM s JOIN x USING (event_type)
    """,
)
def sketch_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct-user estimate per event type (Flajolet et
    al. 2007) — the sketch family's cardinality workhorse, complementing
    KMV (sketch_distinct_kmv): HLL state is 256 FIXED one-byte
    registers per group regardless of cardinality, mergeable by
    register-wise max, which is why it is the industry default for
    streaming/rollup distinct counts at 100 TB.

    Spark-first shape: the register fold is groupBy(type, register)
    -> max(rho) — map-side combinable (partial maxes merge in the
    combiner, so the shuffle carries at most 256 rows per type per
    task), then a 256-row-per-type final fold. No UDF anywhere.

    Cross-engine determinism: the hash is the repo's sha256-prefix
    convention (15 hex chars = 60 bits: 8 register bits + 52-bit
    suffix); rho comes from bin()-string length (both engines strip
    leading zeros), and the harmonic sum is computed in EXACT INTEGER
    arithmetic — each register contributes 2^(53-rho) via a bigint
    shift, so the sum is order-independent (a float 2^-rho sum would
    round differently under Spark's partial-agg order). One IEEE
    multiply/divide at the end is bit-identical in both engines.
    Exact count_distinct rides along as the eval companion (same
    pattern as sketch_distinct_kmv; production drops it)."""
    ev = _t(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.sha2(F.col("user_id").cast("string"), 256), 1, 15),
        16,
        10,
    ).cast("long")
    hashed = ev.select("event_type", h.alias("h"))
    w = F.shiftright(F.col("h"), 8)
    b = hashed.select(
        "event_type",
        F.col("h").bitwiseAND(F.lit(255)).alias("reg"),
        F.when(w == 0, F.lit(53))
        .otherwise(F.lit(53) - F.length(F.bin(w)))
        .alias("rho"),
    )
    r = b.groupBy("event_type", "reg").agg(F.max("rho").alias("mrho"))
    s = r.groupBy("event_type").agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - mrho)"))
            + (F.lit(256) - F.count(F.lit(1))) * F.lit(1 << 53)
        ).alias("s_int")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    est = (
        F.lit(0.7213)
        / (F.lit(1.0) + F.lit(1.079) / F.lit(256.0))
        * F.lit(65536.0)
        * F.lit(9007199254740992.0)
        / F.col("s_int")
    )
    return s.join(F.broadcast(exact), "event_type").select(
        "event_type",
        "n_exact",
        F.round(est, 4).alias("hll_est"),
        F.round(est / F.col("n_exact") - 1, 4).alias("rel_err"),
    )


@register(
    "q_concurrent_peak",
    oracle="""
    WITH iv AS (
      SELECT o.o_orderdate::DATE AS lo, max(l.l_shipdate)::DATE AS hi
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate),
    d AS (
      SELECT day, sum(delta)::BIGINT AS net FROM (
        SELECT lo AS day, 1 AS delta FROM iv
        UNION ALL
        SELECT hi + 1 AS day, -1 AS delta FROM iv)
      GROUP BY 1),
    r AS (SELECT day, sum(net) OVER (ORDER BY day)::BIGINT AS conc FROM d),
    m AS (SELECT year(day)::INT AS yr, max(conc)::BIGINT AS peak
          FROM r GROUP BY 1)
    SELECT m.yr, m.peak, min(r.day)::DATE AS first_day
    FROM r JOIN m ON year(r.day) = m.yr AND r.conc = m.peak
    GROUP BY 1, 2
    """,
)
def q_concurrent_peak(spark, sf_dir):
    """Sweep-line peak concurrency: the maximum number of orders
    simultaneously OPEN (interval [o_orderdate, last l_shipdate])
    per year, and the first day it is reached — the classic
    interval-stabbing aggregate behind capacity planning ("how many
    open X at once").

    Spark-first shape: the per-order interval is one shuffle on the
    natural join key (groupBy orderkey folds lineitem map-side, then a
    co-keyed join to orders); each interval becomes a +1/-1 delta at its
    endpoints, deltas collapse to DAY GRAIN (map-side combinable sum —
    the only full-data pass), and the running concurrency over the
    tiny day-grain table is the distributed two-phase prefix scan
    (operators/prefixsum.py::prefix_sum — range sort + O(P) carry +
    one Arrow pass), NOT the single-partition window the oracle states
    (which Spark must never run: it serializes the scan through one
    task). Per-year peaks and their first day come from a broadcast
    join of the 7-row peak table back onto the running frame."""
    from wagtail_vector_index_spark.operators.prefixsum import prefix_sum

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    iv = (
        li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("hi"))
        .join(
            orders.select(
                "o_orderkey", F.col("o_orderdate").cast("date").alias("lo")
            ),
            "o_orderkey",
        )
    )
    deltas = iv.select(
        F.col("lo").alias("day"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select(F.date_add("hi", 1).alias("day"), F.lit(-1).alias("delta"))
    )
    d = deltas.groupBy("day").agg(F.sum("delta").alias("net"))
    r = prefix_sum(d, order_cols=["day"], value_cols=["net"]).select(
        "day", F.col("net_cum").alias("conc")
    )
    m = r.groupBy(F.year("day").cast("int").alias("yr")).agg(
        F.max("conc").alias("peak")
    )
    return (
        r.join(
            F.broadcast(m),
            (F.year("day") == F.col("yr")) & (F.col("conc") == F.col("peak")),
        )
        .groupBy("yr", "peak")
        .agg(F.min("day").alias("first_day"))
    )


@register(
    "q_anomaly_mad",
    oracle="""
    WITH d AS (
      SELECT event_type, date_trunc('day', ts)::DATE AS day,
             round(sum(value), 6) AS x
      FROM events GROUP BY 1, 2),
    med AS (SELECT event_type, median(x) AS med FROM d GROUP BY 1),
    dev AS (
      SELECT d.event_type, d.day, d.x, abs(d.x - med.med) AS dev
      FROM d JOIN med USING (event_type)),
    mad AS (SELECT event_type, median(dev) AS mad FROM dev GROUP BY 1)
    SELECT dev.event_type, dev.day, dev.x,
           round(dev.dev / mad.mad, 4) AS robust_z
    FROM dev JOIN mad USING (event_type)
    WHERE dev.dev > 3 * mad.mad
    """,
)
def q_anomaly_mad(spark, sf_dir):
    """Robust daily-volume anomaly detection via MEDIAN ABSOLUTE
    DEVIATION: flag days whose total event value deviates from the
    per-type median by more than 3 MADs. The robust complement of
    q_events_anomaly's z-score — mean/stddev are themselves dragged by
    the outliers they're meant to find (50% breakdown vs 0%), so MAD
    is what production monitoring uses on heavy-tailed volumes.

    Scale shape: the raw stream collapses to day grain first (map-side
    combinable; the only full-data pass — day sums rounded to 6 dp so
    both engines feed the medians identical doubles). Both medians are
    exact per-type aggregates over the tiny day-grain table
    (partitioned by type — no global sort), and the per-type
    median/MAD tables broadcast back (a handful of rows each)."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.round(F.sum("value"), 6).alias("x"))
    med = d.groupBy("event_type").agg(F.median("x").alias("med"))
    dev = d.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("x") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("dev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.col("dev") > 3 * F.col("mad"))
        .select(
            "event_type",
            "day",
            "x",
            F.round(F.col("dev") / F.col("mad"), 4).alias("robust_z"),
        )
    )


@register(
    "q_grouping_sets",
    oracle="""
    SELECT coalesce(event_type, '(all)') AS event_type,
           coalesce(month(ts)::INT, -1) AS mon,
           GROUPING(event_type)::INT AS g_type,
           GROUPING(month(ts))::INT AS g_mon,
           round(sum(value), 2) AS total_value,
           count(*)::BIGINT AS n_events
    FROM events
    GROUP BY GROUPING SETS ((event_type, month(ts)), (event_type), ())
    """,
)
def q_grouping_sets(spark, sf_dir):
    """GROUPING SETS with explicit GROUPING() flags — the irregular
    multi-level rollup CUBE/ROLLUP can't express (here: (type, month),
    (type), () but NOT (month)), completing the OLAP grouping surface
    next to q_cube_lineitem / q_rollup_acctbal. The grouping flags
    disambiguate a real NULL key from a rolled-up one — the contract
    BI layers rely on. Executes as one pass: Spark's Expand operator
    replicates each input row once per set BEFORE the partial
    aggregate, so the shuffle carries combined partials, never raw
    rows x sets."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "mon", F.month("ts").cast("int")
    )
    return (
        ev.groupingSets(
            [["event_type", "mon"], ["event_type"], []],
            "event_type",
            "mon",
        )
        .agg(
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("mon").cast("int").alias("g_mon"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce("mon", F.lit(-1)).alias("mon"),
            "g_type",
            "g_mon",
            "total_value",
            "n_events",
        )
    )


@register(
    "q_funnel_time_bounded",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS vts FROM events
      WHERE event_type = 'view' GROUP BY 1),
    c AS (
      SELECT e.user_id, min(e.ts) AS cts
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click'
        AND e.ts >= v.vts AND e.ts <= v.vts + INTERVAL 24 HOUR
      GROUP BY 1),
    p AS (
      SELECT e.user_id, min(e.ts) AS pts
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase'
        AND e.ts >= c.cts AND e.ts <= c.cts + INTERVAL 24 HOUR
      GROUP BY 1)
    SELECT (SELECT count(*) FROM v)::BIGINT AS n_view,
           (SELECT count(*) FROM c)::BIGINT AS n_click_24h,
           (SELECT count(*) FROM p)::BIGINT AS n_purchase_24h,
           round((SELECT count(*) FROM p)::DOUBLE
                 / (SELECT count(*) FROM v), 6) AS conversion
    """,
)
def q_funnel_time_bounded(spark, sf_dir):
    """Time-bounded conversion funnel: view -> click within 24h of the
    user's FIRST view -> purchase within 24h of that first qualifying
    click. The strict-deadline variant of q_funnel_conversion (which
    only requires order) — the form growth analytics actually reports,
    because an unbounded funnel credits conversions weeks later.

    Scale shape: each stage is one user-keyed aggregate plus one
    user-keyed join carrying a single timestamp — three narrow hash
    joins on the same key (co-partitioned after the first shuffle; AQE
    reuses the exchange), never a per-user window over the full event
    history. Deadline arithmetic is timestamp+interval in both
    engines. The three stage frames fold to ONE row via a left-join
    chain at user grain + a single count aggregate — counting each
    stage separately and cross-joining the 1-row results would
    recompute the shared upstream chain once per stage (measured 30s
    vs 4s at sf0.1)."""
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vts"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(
            (F.col("ts") >= F.col("vts"))
            & (F.col("ts") <= F.col("vts") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("cts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(
            (F.col("ts") >= F.col("cts"))
            & (F.col("ts") <= F.col("cts") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    chain = v.join(c, "user_id", "left").join(p, "user_id", "left")
    return chain.agg(
        F.count("vts").alias("n_view"),
        F.count("cts").alias("n_click_24h"),
        F.count("pts").alias("n_purchase_24h"),
    ).select(
        "n_view",
        "n_click_24h",
        "n_purchase_24h",
        F.round(
            F.col("n_purchase_24h").cast("double") / F.col("n_view"), 6
        ).alias("conversion"),
    )


@register(
    "graph_bfs_reach",
    oracle="""
    WITH RECURSIVE
    base AS (
      SELECT DISTINCT 's' || l.l_suppkey AS src, 'c' || o.o_custkey AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    e AS (SELECT src AS u, dst AS v FROM base
          UNION SELECT dst, src FROM base),
    walk(node, d) AS (
      SELECT 's1', 0
      UNION
      SELECT e.v, w.d + 1 FROM walk w JOIN e ON e.u = w.node
      WHERE w.d < 3),
    m AS (SELECT node, min(d) AS dist FROM walk GROUP BY node)
    SELECT dist::INT AS dist, count(*)::BIGINT AS n_nodes
    FROM m GROUP BY dist
    """,
)
def graph_bfs_reach(spark, sf_dir):
    """Breadth-first reachability from supplier s1 over the undirected
    supplier<->customer fulfillment graph (same edge list as the
    pagerank gates): how many nodes sit at each hop distance <= 3 —
    single-source shortest paths on an unweighted graph, the frontier
    primitive behind "within k hops" features and influence radii.

    operators/graph.py::bfs_distances runs it Pregel-style: edges
    symmetrized + repartitioned on the join key ONCE (localCheckpoint
    pins the shuffle), then each round co-shuffles only the node-grain
    frontier; an anti-join against the visited set keeps first = MIN
    depth, exactly the oracle's min(d) over the recursive walk. The
    walk CTE is the single-machine statement of the same search —
    Spark must never execute it that way (path enumeration before
    dedup is exponential in dense graphs; the frontier form is linear
    in edges per round)."""
    from wagtail_vector_index_spark.operators.graph import bfs_distances

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        )
        .distinct()
    )
    dists = bfs_distances(edges, "s1", max_depth=3, directed=False)
    return dists.groupBy("dist").agg(F.count(F.lit(1)).alias("n_nodes"))


@register(
    "q_market_basket",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
    pc AS (SELECT l_partkey, count(*) AS n_p FROM li GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS n_ab
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2)
    SELECT part_a, part_b, n_ab::BIGINT AS n_ab,
           round(n_ab * n.n_orders / (ca.n_p * 1.0 * cb.n_p), 6) AS lift
    FROM pairs
    JOIN pc ca ON ca.l_partkey = part_a
    JOIN pc cb ON cb.l_partkey = part_b
    CROSS JOIN n
    ORDER BY lift DESC, n_ab DESC, part_a, part_b LIMIT 10
    """,
)
def q_market_basket(spark, sf_dir):
    """Market-basket association mining: co-purchased part pairs ranked
    by LIFT (P(ab)/P(a)P(b) — Agrawal et al. 1993 association rules,
    the retail sibling of text_collocations_pmi's log-ratio). The pair
    generator is a self-join keyed on the ORDER — candidate work is
    sum(basket_size^2) per order, bounded by basket size (~7 items),
    never corpus^2; pair counts and per-part order counts both
    collapse map-side; the scalar order total broadcasts. Lift stays
    in integer arithmetic until one final rounded division, so both
    engines agree bit-for-bit. Top-10 is TakeOrderedAndProject."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = li.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    pc = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_p"))
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(
            b,
            (F.col("l_orderkey") == F.col("__ok"))
            & (F.col("part_a") < F.col("part_b")),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ca = pc.select(F.col("l_partkey").alias("part_a"), F.col("n_p").alias("n_a"))
    cb = pc.select(F.col("l_partkey").alias("part_b"), F.col("n_p").alias("n_b"))
    return (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.round(
                F.col("n_ab")
                * F.col("n_orders")
                / (F.col("n_a") * F.lit(1.0) * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(
            F.col("lift").desc(),
            F.col("n_ab").desc(),
            F.col("part_a").asc(),
            F.col("part_b").asc(),
        )
        .limit(10)
    )


@register(
    "q_yoy_growth",
    oracle="""
    WITH y AS (
      SELECT n.n_name, year(o.o_orderdate)::INT AS yr,
             round(sum(o.o_totalprice), 2) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2)
    SELECT n_name, yr, revenue,
           round(100.0 * (revenue - lag(revenue) OVER w)
                 / lag(revenue) OVER w, 4) AS yoy_pct
    FROM y WINDOW w AS (PARTITION BY n_name ORDER BY yr)
    """,
)
def q_yoy_growth(spark, sf_dir):
    """Year-over-year revenue growth per nation — the standard finance
    reporting window (lag over the year series within each segment).
    The raw stream collapses to (nation, year) grain first (map-side
    combinable, revenue pinned at 2 dp so the lag ratio is identical
    cross-engine); the customer->nation dims broadcast; the lag window
    partitions by nation over a handful of year rows — no global sort
    at any scale. First year per nation is NULL growth (no prior)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    y = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("yr"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return y.select(
        "n_name",
        "yr",
        "revenue",
        F.round(100.0 * (F.col("revenue") - prev) / prev, 4).alias("yoy_pct"),
    )


@register(
    "q_dau_mau",
    oracle="""
    WITH d AS (
      SELECT date_trunc('month', ts) AS mon, date_trunc('day', ts) AS day,
             count(DISTINCT user_id) AS dau
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT date_trunc('month', ts) AS mon,
             count(DISTINCT user_id) AS mau
      FROM events GROUP BY 1),
    a AS (SELECT mon, avg(dau) AS avg_dau FROM d GROUP BY mon)
    SELECT strftime(a.mon, '%Y-%m') AS month, round(a.avg_dau, 4) AS avg_dau,
           m.mau::BIGINT AS mau,
           round(a.avg_dau / m.mau, 6) AS stickiness
    FROM a JOIN m USING (mon)
    """,
)
def q_dau_mau(spark, sf_dir):
    """DAU/MAU stickiness per month — the engagement ratio every
    product dashboard leads with (what share of the monthly audience
    shows up on an average day). Two distinct-count aggregates at
    different grains over one scan shape: daily distincts collapse
    map-side per (month, day), monthly distincts per month, and the
    join is month-grain (tiny). At 100 TB the exact count_distinct is
    the expensive-but-exact eval form; the production swap is the
    HLL register fold (sketch_hll_distinct) per grain — mergeable
    state, same pipeline shape."""
    ev = _t(spark, sf_dir, "events")
    mon = F.date_trunc("month", F.col("ts"))
    d = ev.groupBy(
        mon.alias("mon"), F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count_distinct("user_id").alias("dau"))
    m = ev.groupBy(mon.alias("mon")).agg(
        F.count_distinct("user_id").alias("mau")
    )
    a = d.groupBy("mon").agg(F.avg("dau").alias("avg_dau"))
    return a.join(F.broadcast(m), "mon").select(
        F.date_format("mon", "yyyy-MM").alias("month"),
        F.round("avg_dau", 4).alias("avg_dau"),
        "mau",
        F.round(F.col("avg_dau") / F.col("mau"), 6).alias("stickiness"),
    )


@register(
    "q_new_vs_returning",
    oracle="""
    WITH f AS (
      SELECT user_id, date_trunc('month', min(ts)) AS first_mon
      FROM events GROUP BY 1),
    act AS (
      SELECT DISTINCT user_id, date_trunc('month', ts) AS mon FROM events)
    SELECT strftime(act.mon, '%Y-%m') AS month,
           sum(CASE WHEN act.mon = f.first_mon THEN 1 ELSE 0 END)::BIGINT
             AS new_users,
           sum(CASE WHEN act.mon > f.first_mon THEN 1 ELSE 0 END)::BIGINT
             AS returning_users
    FROM act JOIN f USING (user_id)
    GROUP BY 1
    """,
)
def q_new_vs_returning(spark, sf_dir):
    """New-vs-returning growth accounting per month: a user is NEW in
    the month of their first-ever event and RETURNING in any later
    active month — the decomposition behind every growth chart
    (acquisition vs retention). One user-grain min(ts) aggregate (the
    only full-history pass, map-side combinable), one distinct
    (user, month) activity set, and a user-keyed join between two
    user-grain frames — co-partitioned on the same key, so AQE reuses
    the exchange; the final fold is month-grain."""
    ev = _t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.date_trunc("month", F.min("ts")).alias("first_mon")
    )
    act = ev.select(
        "user_id", F.date_trunc("month", F.col("ts")).alias("mon")
    ).distinct()
    return (
        act.join(f, "user_id")
        .groupBy(F.date_format("mon", "yyyy-MM").alias("month"))
        .agg(
            F.sum(
                F.when(F.col("mon") == F.col("first_mon"), 1).otherwise(0)
            ).alias("new_users"),
            F.sum(
                F.when(F.col("mon") > F.col("first_mon"), 1).otherwise(0)
            ).alias("returning_users"),
        )
    )


@register(
    "q_drift_psi",
    oracle="""
    WITH b AS (
      SELECT least(floor(value / 50.0), 9)::INT AS bucket,
             sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT
               AS n_ref,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
               AS n_cur
      FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1),
    g AS (SELECT unnest(range(0, 10))::INT AS bucket),
    f AS (SELECT g.bucket, coalesce(n_ref, 0)::BIGINT AS n_ref,
                 coalesce(n_cur, 0)::BIGINT AS n_cur
          FROM g LEFT JOIN b USING (bucket)),
    t AS (SELECT sum(n_ref)::BIGINT AS tr, sum(n_cur)::BIGINT AS tc FROM f)
    SELECT bucket, n_ref, n_cur,
           round(((n_cur + 0.5) / (tc + 5.0) - (n_ref + 0.5) / (tr + 5.0))
                 * ln(((n_cur + 0.5) / (tc + 5.0))
                      / ((n_ref + 0.5) / (tr + 5.0))), 8) AS psi_term
    FROM f, t
    """,
)
def q_drift_psi(spark, sf_dir):
    """Population Stability Index between the view (reference) and
    purchase (current) value distributions over 10 fixed-width buckets
    — the drift metric risk/scoring teams actually alarm on (PSI > 0.2
    = retrain), complementing q_drift_ks's nonparametric sup-distance.
    Fixed literal bucket edges (width 50, capped at bucket 9) make the
    binning engine-identical; Laplace smoothing (+0.5 per bucket) keeps
    empty buckets finite without data-dependent epsilons. ONE scan:
    conditional-sum agg to bucket grain (map-side combinable), a
    broadcast 10-row bucket skeleton fills gaps, totals ride a
    broadcast 1-row agg — nothing heavier than the bucket table ever
    shuffles. The PSI total is the (verified) sum of the per-bucket
    terms."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    b = ev.groupBy(
        F.least(F.floor(F.col("value") / 50.0), F.lit(9))
        .cast("int")
        .alias("bucket")
    ).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
            "__r"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("__c"),
    )
    g = spark.range(10).select(F.col("id").cast("int").alias("bucket"))
    f = g.join(b, "bucket", "left").select(
        "bucket",
        F.coalesce("__r", F.lit(0)).alias("n_ref"),
        F.coalesce("__c", F.lit(0)).alias("n_cur"),
    )
    t = f.agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    p = (F.col("n_ref") + 0.5) / (F.col("__tr") + 5.0)
    q = (F.col("n_cur") + 0.5) / (F.col("__tc") + 5.0)
    return f.crossJoin(F.broadcast(t)).select(
        "bucket",
        "n_ref",
        "n_cur",
        F.round((q - p) * F.log(q / p), 8).alias("psi_term"),
    )


@register(
    "q_trend_regression",
    oracle="""
    WITH m AS (
      SELECT n_name,
             (year(o_orderdate) * 12 + month(o_orderdate) - 23950)::DOUBLE
               AS x,
             round(sum(o_totalprice), 2) AS y
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2),
    s AS (
      SELECT n_name, count(*)::BIGINT AS n_months,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             sum(x * x) AS sxx
      FROM m GROUP BY 1)
    SELECT n_name, n_months,
           round((n_months * sxy - sx * sy)
                 / (n_months * sxx - sx * sx), 4) AS slope,
           round((sy - (n_months * sxy - sx * sy)
                       / (n_months * sxx - sx * sx) * sx)
                 / n_months, 2) AS intercept
    FROM s ORDER BY n_name
    """,
)
def q_trend_regression(spark, sf_dir):
    """Per-nation revenue trend via distributed ordinary least squares:
    monthly order revenue per nation, then the closed-form OLS slope
    and intercept from five sufficient statistics (n, Σx, Σy, Σxy,
    Σx²) — regression as pure map-side-combinable aggregates, the only
    shape that works at 100 TB (no matrix libraries, no driver data).
    Month index is centered by a fixed literal (23950 ≈ 1996) so the
    x-products stay small; monthly revenue is rounded to 2dp BEFORE
    the sufficient statistics, pinning the order-dependent float sums
    cross-engine. Two aggregations: fact-grain -> (nation, month),
    then (nation); the customer/nation joins broadcast."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    m = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            "n_name",
            (
                F.year("o_orderdate") * 12
                + F.month("o_orderdate")
                - F.lit(23950)
            )
            .cast("double")
            .alias("x"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("y"))
    )
    s = m.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_months"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        F.col("n_months") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("n_months") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return s.select(
        "n_name",
        "n_months",
        F.round(slope, 4).alias("slope"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n_months"), 2
        ).alias("intercept"),
    ).orderBy("n_name")


@register(
    "q_profile_columns",
    oracle="""
    SELECT 'o_orderkey' AS column_name, count(*)::BIGINT AS n_rows,
           sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_nulls,
           count(DISTINCT o_orderkey)::BIGINT AS n_distinct,
           min(o_orderkey)::DOUBLE AS min_num,
           max(o_orderkey)::DOUBLE AS max_num
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*)::BIGINT,
           sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT,
           count(DISTINCT o_custkey)::BIGINT,
           min(o_custkey)::DOUBLE, max(o_custkey)::DOUBLE
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*)::BIGINT,
           sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)::BIGINT,
           count(DISTINCT o_totalprice)::BIGINT,
           round(min(o_totalprice), 2)::DOUBLE,
           round(max(o_totalprice), 2)::DOUBLE
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*)::BIGINT,
           sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)::BIGINT,
           count(DISTINCT o_orderpriority)::BIGINT,
           NULL::DOUBLE, NULL::DOUBLE
    FROM orders
    """,
)
def q_profile_columns(spark, sf_dir):
    """One-scan data profiler (the Deequ/Great-Expectations profile
    shape): per column — row count, null count, exact distinct count,
    numeric min/max — emitted as one row per column from a SINGLE
    aggregate over a single scan (the multi-count-distinct compiles to
    one Expand + agg; adding a column adds zero scans). The oracle
    replays it as a per-column UNION ALL, so every cell is pinned.
    Profiling is the first job every new 100 TB feed gets; the plan
    shape (scan-once, map-side partials, 4 output rows) is exactly
    what makes it affordable there."""
    orders = _t(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
            "__nk"
        ),
        F.count_distinct("o_orderkey").alias("__dk"),
        F.min("o_orderkey").cast("double").alias("__mink"),
        F.max("o_orderkey").cast("double").alias("__maxk"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "__nc"
        ),
        F.count_distinct("o_custkey").alias("__dc"),
        F.min("o_custkey").cast("double").alias("__minc"),
        F.max("o_custkey").cast("double").alias("__maxc"),
        F.sum(
            F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)
        ).alias("__np"),
        F.count_distinct("o_totalprice").alias("__dp"),
        F.round(F.min("o_totalprice"), 2).cast("double").alias("__minp"),
        F.round(F.max("o_totalprice"), 2).cast("double").alias("__maxp"),
        F.sum(
            F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0)
        ).alias("__no"),
        F.count_distinct("o_orderpriority").alias("__do"),
    )
    null_d = F.lit(None).cast("double")
    row = lambda name, nn, d, mn, mx: F.struct(  # noqa: E731
        F.lit(name).alias("column_name"),
        F.col("__n").alias("n_rows"),
        nn.alias("n_nulls"),
        d.alias("n_distinct"),
        mn.alias("min_num"),
        mx.alias("max_num"),
    )
    return agg.select(
        F.explode(
            F.array(
                row(
                    "o_orderkey", F.col("__nk"), F.col("__dk"),
                    F.col("__mink"), F.col("__maxk"),
                ),
                row(
                    "o_custkey", F.col("__nc"), F.col("__dc"),
                    F.col("__minc"), F.col("__maxc"),
                ),
                row(
                    "o_totalprice", F.col("__np"), F.col("__dp"),
                    F.col("__minp"), F.col("__maxp"),
                ),
                row(
                    "o_orderpriority", F.col("__no"), F.col("__do"),
                    null_d, null_d,
                ),
            )
        ).alias("t")
    ).select("t.*")


@register(
    "q_key_skew_gini",
    oracle="""
    WITH c AS (
      SELECT o_custkey, count(*)::BIGINT AS n
      FROM orders GROUP BY o_custkey),
    r AS (
      SELECT n, row_number() OVER (ORDER BY n, o_custkey) AS i FROM c),
    s AS (
      SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS tot,
             sum(i * n)::BIGINT AS iwx
      FROM r)
    SELECT k AS n_keys, tot AS total_rows,
           round(2.0 * iwx / (k * tot) - (k + 1.0) / k, 6) AS gini
    FROM s
    """,
)
def q_key_skew_gini(spark, sf_dir):
    """Join-key skew diagnostic: the Gini coefficient of the per-key
    row-count distribution (orders per customer) — 0 = perfectly even
    keys, ->1 = one whale key owns the table, THE number that tells
    you whether a planned shuffle needs salting/AQE-skew-join before
    you burn cluster-hours finding out. Gini needs every key's RANK in
    count order; the naive row_number() OVER (ORDER BY n) is a
    single-task stage at key grain, so ranks come from
    operators/prefixsum.py::assign_dense_ids (distributed range sort +
    O(P) driver offsets + one narrow Arrow pass), and the closed form
    G = 2*sum(i*x_i)/(k*sum(x)) - (k+1)/k is then one map-side
    combinable aggregate. Integer arithmetic end to end until the
    final division — exactly replayable."""
    from wagtail_vector_index_spark.operators.prefixsum import (
        assign_dense_ids,
    )

    orders = _t(spark, sf_dir, "orders")
    counts = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    ranked = assign_dense_ids(
        counts, order_cols=["n", "o_custkey"], out_col="i"
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("tot"),
        F.sum(F.col("i") * F.col("n")).alias("iwx"),
    )
    return s.select(
        F.col("k").alias("n_keys"),
        F.col("tot").alias("total_rows"),
        F.round(
            2.0 * F.col("iwx") / (F.col("k") * F.col("tot"))
            - (F.col("k") + 1.0) / F.col("k"),
            6,
        ).alias("gini"),
    )


@register(
    "q_watermark_lateness",
    oracle="""
    WITH e AS (
      SELECT event_id, floor(epoch(ts))::BIGINT AS t FROM events),
    m AS (
      SELECT t, max(t) OVER (ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS cm
      FROM e)
    SELECT count(*)::BIGINT AS n_events,
           sum(CASE WHEN cm IS NOT NULL AND cm > t THEN 1 ELSE 0 END)
             ::BIGINT AS n_late,
           sum(CASE WHEN cm IS NOT NULL AND cm - t > 3600 THEN 1 ELSE 0
               END)::BIGINT AS n_dropped_1h,
           round(max(CASE WHEN cm IS NULL THEN 0
                          ELSE greatest(cm - t, 0) END) / 60.0, 2)
             AS max_lateness_min
    FROM m
    """,
)
def q_watermark_lateness(spark, sf_dir):
    """Watermark lateness audit: before committing a streaming job's
    watermark delay you measure how late the feed ACTUALLY runs —
    per event (in arrival order = event_id), how far its event time
    lags the maximum event time already seen, and how many rows a
    1-hour watermark would have dropped. The running high-watermark is
    the exclusive prefix MAX in arrival order — computed by
    operators/prefixsum.py::prefix_max (range sort + O(P) driver
    offsets + one Arrow pass), because the naive
    max() OVER (ORDER BY ...) is a single-task stage over the full
    feed at 100 TB. The counts are then one map-side-combinable
    aggregate."""
    from wagtail_vector_index_spark.operators.prefixsum import prefix_max

    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("long").alias("t")
    )
    m = prefix_max(
        ev, order_cols=["event_id"], value_cols=["t"], exclusive=True
    )
    cm = F.col("t_cummax")
    return m.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(cm.isNotNull() & (cm > F.col("t")), 1).otherwise(0)
        ).alias("n_late"),
        F.sum(
            F.when(cm.isNotNull() & (cm - F.col("t") > 3600), 1).otherwise(
                0
            )
        ).alias("n_dropped_1h"),
        F.round(
            F.max(
                F.when(cm.isNull(), 0).otherwise(
                    F.greatest(cm - F.col("t"), F.lit(0))
                )
            )
            / 60.0,
            2,
        ).alias("max_lateness_min"),
    )
