"""Second tranche of relational shapes over the TPC-H-ish fixtures —
the decision-support patterns (TPC-H q6/q7/q9/q15/q18/q22 adapted to the
driver's schema) that complete the analytics surface beyond
``queries/analytics.py``.

Reference scope: the original system (Yelp/mysql_streamer
``replication_handler``) is a CDC relay with no query engine; this module is
part of the SURVEY.md §2.8 relational surface a user of a downstream
warehouse would run on the replicated tables.

Plan-shape rules (100 TB posture) shared with ``analytics.py``:

- Money sums quantize to integer cents first (floor(x*100+0.5)) so the sum
  is order-independent and engine-portable; divide once at the end.
- Quantities are integral doubles -> cast to long BEFORE summing (exact in
  any order), never summed as float.
- Date/brand filters are plain column predicates -> parquet pushdown.
- nation/supplier/part are dimension-sized -> broadcast; only the fact
  tables (lineitem, orders) shuffle, and only on their join keys.
- Scalar aggregates (q6's one-row revenue, q15's max) are fine as
  single-row exchanges: the partial aggregation is map-side and the final
  exchange moves ONE row per partition, not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_streamer_spark.queries.registry import QuerySpec
from mysql_streamer_spark.tables import load_table

#: exact integer cents from a double money expression (same expr both engines)
def _cents(col: F.Column) -> F.Column:
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


def _cents_sql(expr: str) -> str:
    return f"CAST(floor(({expr}) * 100 + 0.5) AS BIGINT)"


# q6: one-year shipdate window, discount band, small quantities.
FORECAST_YEAR = ("1996-01-01 00:00:00", "1997-01-01 00:00:00")
FORECAST_DISCOUNT = (0.05, 0.07)
FORECAST_MAX_QTY = 24

# q7: the two trading partners whose bilateral flow we audit.
VOLUME_NATIONS = ("NATION_1", "NATION_2")

# q9: product-line margin for parts matching this name fragment; cost model
# is a fixed fraction of retail price per unit (no partsupp table in the
# fixtures, so supplycost is modeled off the part dimension).
MARGIN_NAME_FRAGMENT = "red"
MARGIN_COST_FRACTION = 0.6

# q15: top supplier over one quarter of shipments.
TOP_SUPPLIER_WINDOW = ("1997-01-01 00:00:00", "1997-04-01 00:00:00")

# q18: orders whose total quantity exceeds this are "large volume".
LARGE_ORDER_MIN_QTY = 250

# q22: customers with above-average positive balance and no order since
# this cutoff are "inactive capital" (the fixtures have no order-less
# customers, so inactivity-by-recency replaces q22's no-orders-at-all).
INACTIVE_CUTOFF = "2000-01-01 00:00:00"


# ---------------------------------------------------------------------------
# q6 — forecast revenue change (pure scan-filter-aggregate, 1-row result)
# ---------------------------------------------------------------------------

def q_analytics_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q6 shape: every predicate is a parquet-pushable range filter,
    the aggregate partial-combines map-side, and the final exchange carries
    one partial row per task. The cheapest possible 100 TB query — and the
    plan should show exactly scan -> filter -> partial agg -> final agg."""
    lo, hi = FORECAST_YEAR
    dlo, dhi = FORECAST_DISCOUNT
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
        & (F.col("l_discount") >= dlo)
        & (F.col("l_discount") <= dhi)
        & (F.col("l_quantity") < FORECAST_MAX_QTY)
    )
    return li.agg(
        (F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount"))) / 100.0).alias(
            "forecast_revenue"
        ),
        F.count("*").alias("n_lines"),
    )


_FORECAST_ORACLE = f"""
SELECT
  sum({_cents_sql("l_extendedprice * l_discount")}) / 100.0 AS forecast_revenue,
  count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{FORECAST_YEAR[0]}'
  AND l_shipdate < TIMESTAMP '{FORECAST_YEAR[1]}'
  AND l_discount >= {FORECAST_DISCOUNT[0]} AND l_discount <= {FORECAST_DISCOUNT[1]}
  AND l_quantity < {FORECAST_MAX_QTY}
"""


# ---------------------------------------------------------------------------
# q7 — bilateral volume shipping (two nation lineages out of one fact scan)
# ---------------------------------------------------------------------------

def q_analytics_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7 shape: lineitem joins orders on orderkey (the one fact-fact
    shuffle), then supplier->nation and customer->nation both broadcast.
    The nation-pair disjunction is applied AFTER the broadcasts, where it is
    a cheap in-codegen predicate; the supplier/customer nation filters
    could also push into the broadcast build sides, which AQE handles."""
    n1, n2 = VOLUME_NATIONS
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    supp_nation = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
        .filter(F.col("supp_nation").isin(n1, n2))
    )
    cust_nation = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
        .filter(F.col("cust_nation").isin(n1, n2))
    )
    revenue = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust_nation), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            (F.sum(revenue) / 100.0).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


_VOLUME_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
  sum(revenue_c) / 100.0 AS revenue, count(*) AS n_lines
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         {_cents_sql("l_extendedprice * (1 - l_discount)")} AS revenue_c
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('{VOLUME_NATIONS[0]}', '{VOLUME_NATIONS[1]}')
    AND n2.n_name IN ('{VOLUME_NATIONS[0]}', '{VOLUME_NATIONS[1]}')
    AND n1.n_name <> n2.n_name
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# q9 — product-line margin by nation and year
# ---------------------------------------------------------------------------

def q_analytics_product_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 shape (adapted: no partsupp fixture, so unit cost is
    MARGIN_COST_FRACTION * p_retailprice). The part-name filter shrinks the
    broadcast build side BEFORE the join; lineitem never shuffles for the
    dimension joins and aggregates on a tiny (nation, year) key."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(MARGIN_NAME_FRAGMENT)
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    amount = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(MARGIN_COST_FRACTION) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg((F.sum(amount) / 100.0).alias("sum_profit"), F.count("*").alias("n_lines"))
    )


_MARGIN_ORACLE = f"""
SELECT n_name AS nation, year(l_shipdate) AS o_year,
  sum({_cents_sql(
      "l_extendedprice * (1 - l_discount) - "
      f"{MARGIN_COST_FRACTION} * p_retailprice * l_quantity"
  )}) / 100.0 AS sum_profit,
  count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE contains(p_name, '{MARGIN_NAME_FRAGMENT}')
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q15 — top supplier(s) by quarterly revenue (scalar-max equality join)
# ---------------------------------------------------------------------------

def q_analytics_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15 shape: revenue per supplier over one quarter, then keep
    every supplier whose revenue equals the global max. The max is a 1-row
    aggregate broadcast back as a cross join — never a global
    unpartitioned window (the ADVICE.md heartbeat-lag lesson). Exact cents
    make the equality deterministic across engines."""
    lo, hi = TOP_SUPPLIER_WINDOW
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_c"))
    )
    max_rev = revenue.agg(F.max("revenue_c").alias("max_revenue_c"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("revenue_c") == F.col("max_revenue_c"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            "s_name",
            (F.col("revenue_c") / 100.0).alias("total_revenue"),
        )
    )


_TOP_SUPPLIER_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey,
    sum({_cents_sql("l_extendedprice * (1 - l_discount)")}) AS revenue_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{TOP_SUPPLIER_WINDOW[0]}'
    AND l_shipdate < TIMESTAMP '{TOP_SUPPLIER_WINDOW[1]}'
  GROUP BY l_suppkey
)
SELECT s_suppkey AS suppkey, s_name, revenue_c / 100.0 AS total_revenue
FROM revenue
JOIN supplier ON l_suppkey = s_suppkey
WHERE revenue_c = (SELECT max(revenue_c) FROM revenue)
"""


# ---------------------------------------------------------------------------
# q18 — large-volume orders (HAVING on a fact-side aggregate, then enrich)
# ---------------------------------------------------------------------------

def q_analytics_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 shape: aggregate lineitem by orderkey FIRST (map-side
    partials make the shuffle carry one row per order), filter with HAVING,
    and only then join the surviving handful of orders to the orders and
    customer dimensions. Quantities are integral doubles -> cast to long
    before summing (exact in any reduction order)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > LARGE_ORDER_MIN_QTY)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
    )


_LARGE_ORDERS_ORACLE = f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS BIGINT)) > {LARGE_ORDER_MIN_QTY}
) big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# q22 — inactive high-balance customers by nation (anti join + scalar avg)
# ---------------------------------------------------------------------------

def q_analytics_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 shape, adapted to recency (the fixtures have no order-less
    customers): customers whose balance beats the average positive balance
    AND who placed no order since INACTIVE_CUTOFF. The average is a 1-row
    broadcast; the anti join's right side is pre-shrunk by the pushed
    date filter and reduced to distinct custkeys before shuffling."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(_cents(F.col("c_acctbal"))).cast("double")
            / F.count("*").cast("double")
            / 100.0
        ).alias("avg_bal")
    )
    recent = (
        orders.filter(F.col("o_orderdate") >= F.lit(INACTIVE_CUTOFF).cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("n_customers"),
            (F.sum(_cents(F.col("c_acctbal"))) / 100.0).alias("total_balance"),
        )
    )


_INACTIVE_ORACLE = f"""
WITH avg_bal AS (
  SELECT CAST(sum({_cents_sql("c_acctbal")}) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) / 100.0 AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey AS nationkey, count(*) AS n_customers,
  sum({_cents_sql("c_acctbal")}) / 100.0 AS total_balance
FROM customer, avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '{INACTIVE_CUTOFF}'
  )
GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# q11 — important stock (group share vs a global-total threshold)
# ---------------------------------------------------------------------------

# q11: parts supplied from this nation whose value share beats the fraction.
IMPORTANT_STOCK_NATION = "NATION_3"
IMPORTANT_STOCK_FRACTION = 0.0015


def q_analytics_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape (adapted: no partsupp fixture, so "stock value" is
    the revenue each part generated from the nation's suppliers). The
    signature move is a HAVING against a fraction of the GLOBAL total:
    compute the per-part aggregate once, derive the 1-row total from the
    per-part result (not by re-scanning the fact), and broadcast it back —
    the threshold comparison is then a map-side filter, never a global
    window. Integer cents keep the share comparison exact across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == IMPORTANT_STOCK_NATION
    )
    nation_supp = supp.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    per_part = (
        li.join(F.broadcast(nation_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "value_c"
            )
        )
    )
    total = per_part.agg(F.sum("value_c").alias("total_c"))
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("value_c").cast("double")
            > F.lit(IMPORTANT_STOCK_FRACTION) * F.col("total_c").cast("double")
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.col("value_c") / 100.0).alias("part_value"),
        )
    )


_IMPORTANT_STOCK_ORACLE = f"""
WITH per_part AS (
  SELECT l_partkey,
    sum({_cents_sql("l_extendedprice * (1 - l_discount)")}) AS value_c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{IMPORTANT_STOCK_NATION}'
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey, value_c / 100.0 AS part_value
FROM per_part
WHERE CAST(value_c AS DOUBLE)
      > {IMPORTANT_STOCK_FRACTION} * (SELECT CAST(sum(value_c) AS DOUBLE) FROM per_part)
"""


# ---------------------------------------------------------------------------
# q12 — shipping-delay buckets × order-priority mix (CASE-sum aggregate)
# ---------------------------------------------------------------------------

#: ship-delay bucket width in days; priorities counted as "critical"
DELAY_BUCKET_DAYS = 180
CRITICAL_PRIORITIES = ("1-URGENT", "2-HIGH")


def q_analytics_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 shape (adapted: the fixtures have no l_shipmode/commitdate,
    so lines bucket by ship delay — days between order and ship date, in
    180-day buckets). One fact-fact join on orderkey, then the q12
    signature: conditional CASE-sums splitting critical vs normal priority
    in a single aggregate pass, grouped on a tiny derived key. Map-side
    partials carry one row per (task, bucket)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    delay_bucket = F.floor(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        / F.lit(float(DELAY_BUCKET_DAYS))
    ).cast("long")
    is_critical = F.col("o_orderpriority").isin(*CRITICAL_PRIORITIES)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(delay_bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(is_critical, 1).otherwise(0)).alias("critical_lines"),
            F.sum(F.when(is_critical, 0).otherwise(1)).alias("normal_lines"),
        )
    )


_SHIPMODE_PRIORITY_ORACLE = f"""
SELECT
  CAST(floor(date_diff('day', o_orderdate, l_shipdate)
             / {float(DELAY_BUCKET_DAYS)}) AS BIGINT) AS delay_bucket,
  CAST(sum(CASE WHEN o_orderpriority IN ('{CRITICAL_PRIORITIES[0]}',
                                    '{CRITICAL_PRIORITIES[1]}')
           THEN 1 ELSE 0 END) AS BIGINT) AS critical_lines,
  CAST(sum(CASE WHEN o_orderpriority IN ('{CRITICAL_PRIORITIES[0]}',
                                    '{CRITICAL_PRIORITIES[1]}')
           THEN 0 ELSE 1 END) AS BIGINT) AS normal_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q16 — supplier diversity per part attribute (distinct-count + blacklist)
# ---------------------------------------------------------------------------

# q16: part-attribute slice under audit and the supplier blacklist stand-in
# (negative account balance replaces the reference's complaints filter).
SUPPLIER_CNT_EXCLUDED_BRAND = "Brand#1"
SUPPLIER_CNT_EXCLUDED_TYPE = "PROMO"
SUPPLIER_CNT_SIZES = (1, 4, 9, 14, 19, 24, 29, 34)


def q_analytics_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 shape (adapted: the part-supplier link is derived from
    lineitem — no partsupp — and the complaints blacklist is suppliers with
    negative balance). The fact reduces to DISTINCT (partkey, suppkey)
    pairs FIRST — the only fact-sized shuffle, keyed on the pair — then a
    broadcast anti join removes blacklisted suppliers and a broadcast inner
    join applies the part-attribute slice; the final distinct-count
    aggregates on the tiny (brand, type, size) key."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != SUPPLIER_CNT_EXCLUDED_BRAND)
        & (F.col("p_type") != SUPPLIER_CNT_EXCLUDED_TYPE)
        & F.col("p_size").isin(*SUPPLIER_CNT_SIZES)
    )
    blacklist = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    links = li.select("l_partkey", "l_suppkey").distinct()
    return (
        links.join(F.broadcast(blacklist), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_SUPPLIER_DIVERSITY_ORACLE = f"""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) links
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{SUPPLIER_CNT_EXCLUDED_BRAND}'
  AND p_type <> '{SUPPLIER_CNT_EXCLUDED_TYPE}'
  AND p_size IN {SUPPLIER_CNT_SIZES}
  AND NOT EXISTS (
    SELECT 1 FROM supplier
    WHERE s_suppkey = l_suppkey AND s_acctbal < 0
  )
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# q20 — promotion-eligible suppliers (nested semi-join chain)
# ---------------------------------------------------------------------------

# q20: suppliers who moved real volume of the promoted part family this year.
PROMO_PART_FRAGMENT = "gear"
PROMO_YEAR = ("1997-01-01 00:00:00", "1998-01-01 00:00:00")
PROMO_MIN_QTY = 60


def q_analytics_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape (adapted: ps_availqty's "more than half the shipped
    quantity" becomes an absolute shipped-quantity floor — no partsupp).
    The nested-IN chain inverts into a bottom-up reduction: broadcast the
    name-filtered part dim into the date-pruned fact scan, aggregate
    quantity per (suppkey, partkey) with map-side partials, HAVING-filter,
    reduce to distinct suppkeys, and LEFT SEMI join the supplier dim — so
    the supplier table is only ever probed, never expanded."""
    lo, hi = PROMO_YEAR
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(PROMO_PART_FRAGMENT)
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    movers = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .filter(F.col("qty") > PROMO_MIN_QTY)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


_PROMO_SUPPLIERS_ORACLE = f"""
SELECT s_suppkey, s_name, n_name AS nation
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE contains(p_name, '{PROMO_PART_FRAGMENT}')
    AND l_shipdate >= TIMESTAMP '{PROMO_YEAR[0]}'
    AND l_shipdate < TIMESTAMP '{PROMO_YEAR[1]}'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(CAST(l_quantity AS BIGINT)) > {PROMO_MIN_QTY}
)
"""


# ---------------------------------------------------------------------------
# q5 — regional local-supplier revenue (the last of the 22 TPC-H shapes)
# ---------------------------------------------------------------------------

LOCAL_REVENUE_REGION = "ASIA"
LOCAL_REVENUE_YEAR = ("1996-01-01 00:00:00", "1997-01-01 00:00:00")


def q_analytics_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation from orders where the customer
    and the supplier share a nation inside one region. The distinguishing
    plan feature is the customer-nation == supplier-nation equality: it is
    NOT a join key between two facts but a post-join filter between two
    broadcast dimension attributes, so the only shuffles are
    lineitem<->orders on orderkey and the final per-nation aggregate —
    customer, supplier, nation, region all broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= LOCAL_REVENUE_YEAR[0])
        & (F.col("o_orderdate") < LOCAL_REVENUE_YEAR[1])
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == LOCAL_REVENUE_REGION
    )
    local_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(local_nations), cust.c_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_c")
        )
        .select(F.col("n_name").alias("nation"), "revenue_c")
    )


_LOCAL_REVENUE_ORACLE = f"""
SELECT n_name AS nation,
       CAST(sum({_cents_sql("l_extendedprice * (1 - l_discount)")}) AS BIGINT)
         AS revenue_c
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = '{LOCAL_REVENUE_REGION}'
  AND o_orderdate >= TIMESTAMP '{LOCAL_REVENUE_YEAR[0]}'
  AND o_orderdate < TIMESTAMP '{LOCAL_REVENUE_YEAR[1]}'
GROUP BY n_name
"""


SPECS = [
    QuerySpec(
        "analytics_forecast_revenue",
        q_analytics_forecast_revenue,
        _FORECAST_ORACLE,
    ),
    QuerySpec(
        "analytics_local_supplier_revenue",
        q_analytics_local_supplier_revenue,
        _LOCAL_REVENUE_ORACLE,
    ),
    QuerySpec(
        "analytics_volume_shipping", q_analytics_volume_shipping, _VOLUME_ORACLE
    ),
    QuerySpec("analytics_product_margin", q_analytics_product_margin, _MARGIN_ORACLE),
    QuerySpec(
        "analytics_top_revenue_supplier",
        q_analytics_top_revenue_supplier,
        _TOP_SUPPLIER_ORACLE,
    ),
    QuerySpec("analytics_large_orders", q_analytics_large_orders, _LARGE_ORDERS_ORACLE),
    QuerySpec(
        "analytics_inactive_customers",
        q_analytics_inactive_customers,
        _INACTIVE_ORACLE,
    ),
    QuerySpec(
        "analytics_important_stock",
        q_analytics_important_stock,
        _IMPORTANT_STOCK_ORACLE,
    ),
    QuerySpec(
        "analytics_shipmode_priority",
        q_analytics_shipmode_priority,
        _SHIPMODE_PRIORITY_ORACLE,
    ),
    QuerySpec(
        "analytics_supplier_diversity",
        q_analytics_supplier_diversity,
        _SUPPLIER_DIVERSITY_ORACLE,
    ),
    QuerySpec(
        "analytics_promo_suppliers",
        q_analytics_promo_suppliers,
        _PROMO_SUPPLIERS_ORACLE,
    ),
]
