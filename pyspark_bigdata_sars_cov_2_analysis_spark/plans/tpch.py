"""Headline analytical queries on the star schema (joins + heavy aggs).

The reference has no joins (SURVEY.md §2.3); this module is the green-field
join surface, shaped after the classic TPC-H queries the synthetic tables
mirror. These are also the bench queries (bench.py).

Scale notes: dimension sides (region/nation/customer/supplier/part) are
broadcast via ``joins.join_dim``; fact-fact joins shuffle on the join key
with AQE skew handling; every top-k is TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_bigdata_sars_cov_2_analysis_spark.functions.localrel import (
    local_frame,
)
from pyspark_bigdata_sars_cov_2_analysis_spark.operators import joins, sorts
from pyspark_bigdata_sars_cov_2_analysis_spark.plans.fragments import (
    SCD2_TEMPORAL_JOIN_SQL,
)
from pyspark_bigdata_sars_cov_2_analysis_spark.plans.registry import (
    pround,
    query,
    sql_round,
    table,
)


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_round("SUM(l_quantity)", 2)}                                    AS sum_qty,
           {sql_round("SUM(l_extendedprice)", 2)}                               AS sum_base_price,
           {sql_round("SUM(l_extendedprice * (1 - l_discount))", 2)} AS sum_disc_price,
           {sql_round("SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))", 2)} AS sum_charge,
           {sql_round("AVG(l_quantity)", 2)}                                    AS avg_qty,
           {sql_round("AVG(l_extendedprice)", 2)}                               AS avg_price,
           {sql_round("AVG(l_discount)", 4)}                                    AS avg_disc,
           COUNT(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 family — the flagship scan+agg (the reference's
    confirmed/deaths global rollup is the same shape,
    spark/jobs/cases_time_analysis.py:122-125). Single scan, map-side
    partial agg, 6-group output."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= "2001-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            pround(F.sum("l_quantity"), 2).alias("sum_qty"),
            pround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            pround(F.sum(disc_price), 2).alias("sum_disc_price"),
            pround(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            pround(F.avg("l_quantity"), 2).alias("avg_qty"),
            pround(F.avg("l_extendedprice"), 2).alias("avg_price"),
            pround(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT o_orderkey,
           {sql_round("SUM(l_extendedprice * (1 - l_discount))", 2)} AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 family — selective dim filter broadcast into a fact-fact
    join, then top-k. Customer (filtered) is broadcast; orders⋈lineitem
    shuffles on orderkey."""
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1998-03-15")
    li = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1998-03-15")
    j = joins.join_fact(
        joins.join_dim(o, c.select("c_custkey"), on=o.o_custkey == c.c_custkey),
        li,
        on=F.col("o_orderkey") == F.col("l_orderkey"),
    )
    agg = j.groupBy("o_orderkey", "o_orderdate").agg(
        pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )
    out = agg.select(
        "o_orderkey",
        "revenue",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
    )
    return sorts.top_k(out, 10, F.desc("revenue"), F.asc("o_orderkey"))


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {sql_round("SUM(l_extendedprice * (1 - l_discount))", 2)} AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 family — 6-table star join. All dimensions broadcast; the
    only shuffle is orders⋈lineitem + the final small agg."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")

    j = joins.join_fact(o, li, on=F.col("o_orderkey") == F.col("l_orderkey"))
    j = joins.join_dim(j, c, on=F.col("o_custkey") == F.col("c_custkey"))
    j = joins.join_dim(
        j,
        s,
        on=(F.col("l_suppkey") == F.col("s_suppkey"))
        & (F.col("c_nationkey") == F.col("s_nationkey")),
    )
    j = joins.join_dim(j, n, on=F.col("s_nationkey") == F.col("n_nationkey"))
    j = joins.join_dim(j, r, on=F.col("n_regionkey") == F.col("r_regionkey"))
    return j.groupBy("n_name").agg(
        pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_round("SUM(l_extendedprice * l_discount)", 2)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 family — pure pushdown test: all three predicates must reach
    the parquet scan (verify via .explain → PushedFilters)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            pround(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_round("SUM(l_extendedprice * (1 - l_discount))", 2)} AS revenue,
           n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 family — returned-item revenue, top 20 customers."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    j = joins.join_fact(o, li, on=F.col("o_orderkey") == F.col("l_orderkey"))
    j = joins.join_dim(j, c, on=F.col("o_custkey") == F.col("c_custkey"))
    j = joins.join_dim(j, n, on=F.col("c_nationkey") == F.col("n_nationkey"))
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )
    out = agg.select("c_custkey", "c_name", "revenue", "n_name")
    return sorts.top_k(out, 20, F.desc("revenue"), F.asc("c_custkey"))


@query(
    "j01_left_join",
    oracle=f"""
    SELECT n_name, COUNT(c_custkey) AS n_customers,
           {sql_round("COALESCE(SUM(c_acctbal), 0)", 2)} AS total_acctbal
    FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
    GROUP BY n_name
    """,
)
def j01_left_join(spark, sf_dir):
    """Left outer join keeping empty dimension rows (green-field §2.3)."""
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    j = n.join(c, on=n.n_nationkey == c.c_nationkey, how="left")
    return j.groupBy("n_name").agg(
        F.count("c_custkey").alias("n_customers"),
        pround(F.coalesce(F.sum("c_acctbal"), F.lit(0.0)), 2).alias("total_acctbal"),
    )


@query(
    "j02_semi_join",
    oracle=f"""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 400000)
    """,
)
def j02_semi_join(spark, sf_dir):
    """LEFT SEMI join — existence test without duplicating fact rows."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    out = joins.semi_join(c, o, on=c.c_custkey == o.o_custkey)
    return out.select("c_custkey", "c_name")


@query(
    "j03_anti_join",
    oracle=f"""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j03_anti_join(spark, sf_dir):
    """LEFT ANTI join — customers with no orders."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    out = joins.anti_join(c, o, on=c.c_custkey == o.o_custkey)
    return out.select("c_custkey", "c_name")


@query(
    "j04_latest_via_join_equiv",
    oracle=f"""
    SELECT o.o_custkey, o.o_orderkey
    FROM orders o
    JOIN (SELECT o_custkey, MAX(o_orderdate) AS mx FROM orders GROUP BY o_custkey) m
      ON o.o_custkey = m.o_custkey AND o.o_orderdate = m.mx
    """,
)
def j04_latest_via_join_equiv(spark, sf_dir):
    """Greatest-per-group, join formulation — must agree with
    w01_latest_per_group (reference idiom equivalence, SURVEY.md §2.3)."""
    o = table(spark, sf_dir, "orders")
    out = joins.latest_per_group_via_join(o, ["o_custkey"], "o_orderdate")
    return out.select("o_custkey", "o_orderkey")


@query(
    "j05_salted_join_equiv",
    oracle=f"""
    SELECT c_custkey, c_name, COUNT(*) AS n_events,
           {sql_round("SUM(value)", 2)} AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_custkey, c_name
    """,
)
def j05_salted_join_equiv(spark, sf_dir):
    """Skew-salted join under the driver gate: events.user_id concentrates
    on a handful of hot users (the authoring-time-skew case salting
    exists for), and the oracle is the PLAIN join — proving
    salted == unsalted end-to-end, not just in unit tests."""
    e = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer")
    j = joins.salted_join(e, c, "user_id", "c_custkey", n_salts=8)
    return j.groupBy("c_custkey", "c_name").agg(
        F.count(F.lit(1)).alias("n_events"),
        pround(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "j08_full_outer",
    oracle="""
    SELECT COALESCE(a.k, b.k) AS custkey, n_orders, n_events
    FROM (SELECT o_custkey AS k, COUNT(*) AS n_orders
          FROM orders GROUP BY 1) a
    FULL JOIN (SELECT user_id AS k, COUNT(*) AS n_events
               FROM events GROUP BY 1) b
      ON a.k = b.k
    """,
)
def j08_full_outer(spark, sf_dir):
    """§2.3 completion — FULL OUTER join, the one join type j01-j07 never
    exercised: per-customer order counts ⟗ per-user event counts, keeping
    keys that exist on only ONE side with NULLs on the other (both
    directions occur in the test data). Aggregate-before-join keeps both
    inputs one-row-per-key, so the full-outer shuffle moves counts, not
    facts — the 100 TB reconciliation-report shape (e.g. billing vs
    usage) where dropping either side's orphans hides exactly the rows
    the report exists to find. The USING-style join coalesces the key on
    both engines."""
    o = table(spark, sf_dir, "orders")
    e = table(spark, sf_dir, "events")
    a = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    b = e.groupBy(F.col("user_id").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return joins.join_fact(a, b, on="custkey", how="full_outer")


@query(
    "j09_temporal_scd2_join",
    # w08's interval dimension joined back to the fact rows AT EVENT
    # TIME: equi-join on user_id + validity-interval predicate (open
    # upper bound for the current row). Both engines rebuild the same
    # dimension CTE, then count events landing in each attribute regime.
    oracle=SCD2_TEMPORAL_JOIN_SQL,
)
def j09_temporal_scd2_join(spark, sf_dir):
    """§2.3 completion — the TEMPORAL dimension join, w08's payoff: every
    fact row joined to the attribute that was valid AT ITS EVENT TIME
    (equi-join on the entity key + validity-interval predicate, open
    upper bound for current rows) — the query SCD2 tables exist to
    serve, and the reason w08 stamps intervals instead of overwriting.
    Scale shape: the equi key carries the join (per-user interval counts
    are tiny, so the interval predicate is a cheap in-group filter, never
    a nested-loop); the dimension build reuses w08's aggregate+window
    over the per-user daily frame. Output: event counts per (historical
    attribute regime, event type) — 'what did users do while their
    dominant activity was X'."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.plans.extended import (
        w08_scd2_intervals,
    )

    e = table(spark, sf_dir, "events")
    dim = w08_scd2_intervals(spark, sf_dir).select(
        "user_id",
        F.col("attr").alias("regime_attr"),
        F.to_date("valid_from").alias("vf"),
        F.to_date("valid_to").alias("vt"),
    )
    d = F.to_date("ts")
    j = e.join(
        dim,
        (e.user_id == dim.user_id)
        & (d >= dim.vf)
        & (dim.vt.isNull() | (d <= dim.vt)),
    )
    return j.groupBy("regime_attr", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "j10_range_lookup_broadcast",
    oracle=f"""
    WITH bands(band, lo, hi) AS (
      VALUES ('budget', 0.0, 20000.0), ('mid', 20000.0, 40000.0),
             ('upper', 40000.0, 60000.0), ('premium', 60000.0, 80000.0),
             ('luxury', 80000.0, 1e12)
    )
    SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
           {sql_round("SUM(l_extendedprice)", 2)} AS revenue
    FROM lineitem JOIN bands
      ON l_extendedprice >= lo AND l_extendedprice < hi
    GROUP BY band
    """,
)
def j10_range_lookup_broadcast(spark, sf_dir):
    """The DELIBERATE BroadcastNestedLoopJoin — every other plan guard
    in this repo treats BNLJ as a bug, and the nuance matters: for a
    point-in-range lookup against a TINY interval dimension (price
    bands, IP→geo blocks, rate tables — single-digit rows to a few
    thousand), broadcasting the ranges and nested-looping each fact row
    over them IS the right plan: the 'loop' is a handful of comparisons
    per row inside codegen, no shuffle, no binning machinery. The j07
    binned equi-join exists for the OTHER regime (both sides large).
    The plan test pins BNLJ + broadcast here, the documented exception
    to the rule the q-family guards enforce."""
    li = table(spark, sf_dir, "lineitem")
    # local_frame, not createDataFrame: the dim must be a JVM
    # LocalTableScan — the Python-RDD form re-enters Python to build the
    # 5-row broadcast on every execution (r15, functions/localrel.py)
    bands = local_frame(
        spark,
        [
            ("budget", 0.0, 20000.0),
            ("mid", 20000.0, 40000.0),
            ("upper", 40000.0, 60000.0),
            ("premium", 60000.0, 80000.0),
            ("luxury", 80000.0, 1e12),
        ],
        "band string, lo double, hi double",
    )
    j = li.join(
        F.broadcast(bands),
        (F.col("l_extendedprice") >= F.col("lo"))
        & (F.col("l_extendedprice") < F.col("hi")),
    )
    return j.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        pround(F.sum("l_extendedprice"), 2).alias("revenue"),
    )
