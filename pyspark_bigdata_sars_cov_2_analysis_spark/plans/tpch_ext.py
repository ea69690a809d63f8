"""Extended TPC-H-family queries (q4..q22, adapted to the synthetic schema).

The synthetic tables omit partsupp and a few lineitem columns
(commitdate/receiptdate/shipmode), so the classic queries that need them
are adapted: the join/agg/subquery SHAPE is preserved — that is what the
engine is exercising — with predicates re-targeted at existing columns.

Scale notes follow the same rules as :mod:`tpch`: dimensions broadcast,
fact-fact joins shuffle on keys, scalar subqueries become broadcast
single-row frames (never driver collects), greatest-per-group uses windows.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_bigdata_sars_cov_2_analysis_spark.operators import joins, sorts
from pyspark_bigdata_sars_cov_2_analysis_spark.plans.registry import (
    pround,
    query,
    sql_round,
    table,
)

def _disc():
    # built lazily — Column construction needs an active SparkContext,
    # which doesn't exist at module import time
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_DISC_SQL = "l_extendedprice * (1 - l_discount)"


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 family — EXISTS correlated on the fact table becomes a
    LEFT SEMI join with a cross-side predicate (commitdate/receiptdate are
    adapted to shipdate > orderdate)."""
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-10-01")
    )
    li = table(spark, sf_dir, "lineitem")
    sj = joins.semi_join(
        o,
        li,
        on=(o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
    )
    return sj.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_round(f"SUM(volume)", 2)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year, {_DISC_SQL} AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 family — bilateral trade volume by year. The nation pair
    disjunction lands on broadcast dimension joins; the only shuffles are
    orders⋈lineitem and the final tiny agg."""
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))

    j = joins.join_fact(li, o, on=F.col("l_orderkey") == F.col("o_orderkey"))
    j = joins.join_dim(j, c, on=F.col("o_custkey") == F.col("c_custkey"))
    j = joins.join_dim(j, s, on=F.col("l_suppkey") == F.col("s_suppkey"))
    j = joins.join_dim(j, n1, on=F.col("s_nationkey") == F.col("s_nk"))
    j = joins.join_dim(j, n2, on=F.col("c_nationkey") == F.col("c_nk"))
    j = j.where(
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            _disc().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(pround(F.sum("volume"), 2).alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           {sql_round(
               "SUM(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END) / SUM(volume)",
               4,
           )} AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year, {_DISC_SQL} AS volume,
             n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 family — national market share inside a region/part-type
    slice: conditional-sum ratio over an 8-table star join."""
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation"))

    j = joins.join_fact(li, o, on=F.col("l_orderkey") == F.col("o_orderkey"))
    j = joins.join_dim(j, p.select("p_partkey"), on=F.col("l_partkey") == F.col("p_partkey"))
    j = joins.join_dim(j, c, on=F.col("o_custkey") == F.col("c_custkey"))
    j = joins.join_dim(j, n1, on=F.col("c_nationkey") == F.col("c_nk"))
    j = joins.join_dim(j, r, on=F.col("c_rk") == F.col("r_regionkey"))
    j = joins.join_dim(j, s, on=F.col("l_suppkey") == F.col("s_suppkey"))
    j = joins.join_dim(j, n2, on=F.col("s_nationkey") == F.col("s_nk"))
    vol = j.select(
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        _disc().alias("volume"),
        "nation",
    )
    return vol.groupBy("o_year").agg(
        pround(
            F.sum(F.when(F.col("nation") == "NATION_2", F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            4,
        ).alias("mkt_share")
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, {sql_round("SUM(amount)", 2)} AS sum_profit
    FROM (
      SELECT n_name AS nation, year(o_orderdate) AS o_year, {_DISC_SQL} AS amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 family — profit by supplier nation and order year for a
    part-name slice (no partsupp in the schema, so amount = disc price)."""
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    j = joins.join_fact(li, o, on=F.col("l_orderkey") == F.col("o_orderkey"))
    j = joins.join_dim(j, p.select("p_partkey"), on=F.col("l_partkey") == F.col("p_partkey"))
    j = joins.join_dim(j, s, on=F.col("l_suppkey") == F.col("s_suppkey"))
    j = joins.join_dim(j, n, on=F.col("s_nationkey") == F.col("n_nationkey"))
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            _disc().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(pround(F.sum("amount"), 2).alias("sum_profit"))
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_priority_shipping(spark, sf_dir):
    """TPC-H Q12 family — priority-bucket conditional counts (shipmode is
    adapted to linestatus)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = joins.join_fact(o, li, on=F.col("o_orderkey") == F.col("l_orderkey"))
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 family — order-count histogram: LEFT JOIN with an ON-side
    predicate (NOT a where, which would drop 0-order customers), double
    aggregation."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    j = c.join(o, on=c.c_custkey == o.o_custkey, how="left")
    per_cust = j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT {sql_round(
        "100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN " + _DISC_SQL
        + " ELSE 0 END) / SUM(" + _DISC_SQL + ")",
        4,
    )} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 family — promo revenue share: conditional-sum ratio with a
    broadcast part join over a one-month scan window."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    p = table(spark, sf_dir, "part")
    j = joins.join_dim(li, p, on=F.col("l_partkey") == F.col("p_partkey"))
    return j.agg(
        pround(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", _disc()).otherwise(0.0))
            / F.sum(_disc()),
            4,
        ).alias("promo_revenue")
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_round(f"SUM({_DISC_SQL})", 2)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 family — max-revenue supplier(s). The scalar-max subquery
    is a window max over the (tiny, already-aggregated) revenue frame — no
    second scan, no driver collect. Revenue is rounded BEFORE the max
    compare so ties are engine-stable."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        pround(F.sum(_disc()), 2).alias("total_revenue")
    )
    w = Window.partitionBy()
    top = rev.withColumn("__mx", F.max("total_revenue").over(w)).where(
        F.col("total_revenue") == F.col("__mx")
    )
    j = joins.join_dim(top, s, on=F.col("supplier_no") == F.col("s_suppkey"))
    return j.select("s_suppkey", "s_name", "total_revenue")


@query(
    "q17_small_quantity",
    oracle=f"""
    SELECT {sql_round("SUM(l_extendedprice) / 7.0", 2)} AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity(spark, sf_dir):
    """TPC-H Q17 family — correlated per-part average becomes a broadcast
    agg join (quantities are integral, so AVG is exact in both engines and
    the threshold compare is deterministic)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    j = joins.join_dim(li, p.select("p_partkey"), on=F.col("l_partkey") == F.col("p_partkey"))
    j = joins.join_dim(j, per_part, on=F.col("l_partkey") == F.col("pk"))
    return j.where(F.col("l_quantity") < F.col("qty_threshold")).agg(
        pround(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
    )


@query(
    "q18_large_volume",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           {sql_round("o_totalprice", 2)} AS totalprice,
           {sql_round("SUM(l_quantity)", 2)} AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice DESC, o_orderkey LIMIT 100
    """,
)
def q18_large_volume(spark, sf_dir):
    """TPC-H Q18 family — large-volume orders. The HAVING subquery's
    per-order quantity aggregate IS the query's ``sum_qty`` output
    (orderkey is unique in orders, so the outer group collapses to one
    row per surviving order), so the aggregate's sum is carried through
    instead of re-scanning and re-aggregating lineitem on the probe side
    (optimization r15, the q21 single-scan rule — guide §1.2): lineitem
    scans 2 → 1, and the orders⋈lineitem fact join disappears; the
    surviving-order set (rare: quantity sums are integral and the >300
    threshold is exact, so equivalence is order-independent) broadcasts
    onto orders."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 300)
    )
    j = joins.join_dim(o, big, on=F.col("o_orderkey") == F.col("l_orderkey"))
    j = joins.join_dim(j, c, on=F.col("o_custkey") == F.col("c_custkey"))
    out = j.select(
        "c_custkey",
        "c_name",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        pround(F.col("o_totalprice"), 2).alias("totalprice"),
        pround(F.col("q"), 2).alias("sum_qty"),
    )
    return sorts.top_k(out, 100, F.desc("totalprice"), F.asc("o_orderkey"))


@query(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {sql_round(f"SUM({_DISC_SQL})", 2)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19 family — disjunction of brand/size/quantity envelopes over
    a broadcast part join; Catalyst pushes the common-column OR branches
    into both scans."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = joins.join_dim(li, p, on=F.col("l_partkey") == F.col("p_partkey"))
    env = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(env).agg(pround(F.sum(_disc()), 2).alias("revenue"))


@query(
    "q22_global_sales_opportunity",
    oracle=f"""
    SELECT c_nationkey, COUNT(*) AS numcust,
           {sql_round("SUM(c_acctbal)", 2)} AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT {sql_round("AVG(c_acctbal)", 2)}
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    """,
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 family — above-average-balance customers with no orders:
    scalar-avg subquery as a broadcast single-row frame + LEFT ANTI join.
    The threshold average is ROUNDED to cents on both sides before the
    compare (the q15/q11 rule): Spark and DuckDB sum doubles in
    different orders, and a customer whose balance lands inside the
    engines' last-ulp disagreement window would otherwise flip sides."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        pround(F.avg("c_acctbal"), 2).alias("__avg_bal")
    )
    rich = c.join(F.broadcast(avg_bal)).where(F.col("c_acctbal") > F.col("__avg_bal"))
    no_orders = joins.anti_join(rich, o, on=rich.c_custkey == o.o_custkey)
    return no_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        pround(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


@query(
    "q16_parts_supplier_relationship",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' AND p_size IN (1, 4, 9, 16, 25)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_parts_supplier_relationship(spark, sf_dir):
    """TPC-H Q16 family — distinct-supplier counts with a NOT IN blacklist
    subquery as LEFT ANTI join (lineitem stands in for partsupp as the
    part-supplier bridge; the blacklist is negative-balance suppliers)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25)
    )
    bad = table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    j = joins.join_dim(li, p, on=F.col("l_partkey") == F.col("p_partkey"))
    j = joins.anti_join(j, bad, on=F.col("l_suppkey") == F.col("s_suppkey"))
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.count_distinct("l_suppkey").alias("supplier_cnt")
    )


@query(
    "q20_potential_promotion",
    oracle=f"""
    SELECT s_name, s_suppkey FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%red%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 100
    )
    """,
)
def q20_potential_promotion(spark, sf_dir):
    """TPC-H Q20 family — nested IN with a HAVING aggregate subquery, as a
    LEFT SEMI join against the aggregated supplier set (availqty adapted
    to shipped-quantity threshold; integral sums keep it exact)."""
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    heavy = (
        joins.join_dim(li, p.select("p_partkey"), on=F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 100)
        .select("l_suppkey")
    )
    out = joins.semi_join(s, heavy, on=s.s_suppkey == heavy.l_suppkey)
    return out.select("s_name", "s_suppkey")


@query(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 family — the EXISTS + NOT EXISTS pair on the same fact
    (sole at-fault supplier in a multi-supplier order; receipt/commit
    lateness adapted to returnflag='R'). Both subqueries become one
    aggregated self-frame joined once: per order, the distinct supplier
    count and the distinct flagged-supplier count — cheaper than two
    correlated semi/anti joins re-scanning lineitem.

    The two distinct counts are computed as a TWO-LEVEL aggregate
    (dedupe (order, supplier) pairs with a max(flag), then plain
    count/sum per order) instead of two count_distincts: Catalyst plans
    multi-distinct aggregates via Expand (2× every pre-shuffle row);
    the two-level form has no Expand, the same shuffle count, and half
    the shuffled volume — MEASURED 1.97s vs 3.26s at sf0.1.

    r15: lineitem is scanned ONCE. The former shape re-scanned it for
    the flagged-row probe (l1) and joined l1 against the per-order
    aggregate — at scale a second full pass over the fact plus a
    broadcast build. Instead the pairs aggregate also keeps the flagged
    ROW COUNT per (order, supplier) (``n_r``), the per-order existence
    counts ride a window over the SAME small pairs frame (no self-join,
    no second scan — guide §2.4), and ``numwait``, which counts
    qualified flagged lineitems, is recovered exactly as ``sum(n_r)``:
    every l1 row belongs to exactly one (order, supplier) group and the
    qualification predicate is constant within the group."""
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    flag = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    pairs = li.groupBy(F.col("l_orderkey").alias("ok"), "l_suppkey").agg(
        F.max(flag).alias("has_r"),
        F.sum(flag).alias("n_r"),
    )
    w = Window.partitionBy("ok")
    j = (
        pairs.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_flagged", F.sum("has_r").over(w))
        # multi-supplier order, and this supplier is the only flagged one
        .where(
            (F.col("has_r") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_flagged") == 1)
        )
    )
    j = joins.join_fact(j, o, on=F.col("ok") == F.col("o_orderkey"))
    j = joins.join_dim(j, s, on=F.col("l_suppkey") == F.col("s_suppkey"))
    return j.groupBy("s_name").agg(F.sum("n_r").alias("numwait"))


@query(
    "q11_important_stock",
    oracle=f"""
    WITH sup AS (
      SELECT l_suppkey,
             {sql_round("SUM(l_extendedprice * l_quantity)", 2)} AS value_
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_suppkey
    )
    SELECT l_suppkey, value_ AS value
    FROM sup
    WHERE value_ > (SELECT {sql_round("SUM(value_) * 0.01", 2)} FROM sup)
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 family — groups exceeding a fraction-of-global-total
    threshold (partsupp value adapted to shipped value). The scalar
    subquery over the SAME aggregate is a window sum over the tiny
    grouped frame — one scan, no re-aggregation. Both the per-group value
    and the threshold product are rounded BEFORE the compare (the q15
    pattern) so a borderline supplier can't flip between engines on float
    summation order."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    j = joins.join_dim(li, s, on=F.col("l_suppkey") == F.col("s_suppkey"))
    j = joins.join_dim(j, n, on=F.col("s_nationkey") == F.col("n_nationkey"))
    sup = j.groupBy("l_suppkey").agg(
        pround(
            F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2
        ).alias("value_")
    )
    w = Window.partitionBy()
    out = sup.withColumn(
        "__thresh", pround(F.sum("value_").over(w) * 0.01, 2)
    ).where(F.col("value_") > F.col("__thresh"))
    return out.select("l_suppkey", F.col("value_").alias("value"))


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH regional AS (
      SELECT l_partkey, l_suppkey, l_extendedprice,
             s_name, s_acctbal, n_name
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    mn AS (
      SELECT l_partkey, MIN(l_extendedprice) AS min_price
      FROM regional GROUP BY l_partkey
    )
    SELECT p_partkey, p_name, s_name, n_name,
           {sql_round("s_acctbal", 2)} AS acctbal,
           {sql_round("min_price", 2)} AS min_price
    FROM regional r
      JOIN mn ON r.l_partkey = mn.l_partkey
             AND r.l_extendedprice = mn.min_price
      JOIN part ON p_partkey = r.l_partkey
    WHERE p_size <= 10
    ORDER BY acctbal DESC, p_partkey, s_name LIMIT 100
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 family — cheapest regional supplier per part (supplycost
    adapted to observed sale price; lineitem bridges part↔supplier).

    Determinism of the exact-double-equality min join, precisely: both
    engines read the same parquet doubles bit-for-bit; MIN is a selection
    (returns one of the stored bit patterns, no arithmetic), so it is
    order-independent even over floats; and ``stored == stored-min`` is a
    bitwise comparison with no computed intermediate on either side.
    Unlike a rounded-aggregate compare there is NO summation-order
    dependence anywhere in the predicate — the only rounding (acctbal /
    min_price display) happens after row selection. Verified by the
    sf0.001 and sf0.01 hash compares. Top-100 by account balance with
    unique tiebreaks (p_partkey, s_name)."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = table(spark, sf_dir, "part").where(F.col("p_size") <= 10)

    reg = joins.join_dim(li, s, on=F.col("l_suppkey") == F.col("s_suppkey"))
    reg = joins.join_dim(reg, n, on=F.col("s_nationkey") == F.col("n_nationkey"))
    reg = joins.join_dim(reg, r, on=F.col("n_regionkey") == F.col("r_regionkey"))
    reg = reg.select("l_partkey", "l_extendedprice", "s_name", "s_acctbal", "n_name")
    mn = reg.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    j = joins.join_fact(
        reg,
        mn,
        on=(F.col("l_partkey") == F.col("pk"))
        & (F.col("l_extendedprice") == F.col("min_price")),
    )
    j = joins.join_dim(j, p, on=F.col("l_partkey") == F.col("p_partkey"))
    out = j.select(
        "p_partkey",
        "p_name",
        "s_name",
        "n_name",
        pround(F.col("s_acctbal"), 2).alias("acctbal"),
        pround(F.col("min_price"), 2).alias("min_price"),
    )
    return sorts.top_k(
        out, 100, F.desc("acctbal"), F.asc("p_partkey"), F.asc("s_name")
    )
