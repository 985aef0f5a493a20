"""Extended analytic operators (beyond the reference's deliberately
small SQL surface — SURVEY §2.3 note: windows, grouping sets, set
operators come 'for free' in Spark SQL; here they are exercised and
oracle-checked so the coverage is proven, not assumed).

Includes the time-series operators a streaming lakehouse needs that
Spark lacks as built-ins — as-of join and gap-based sessionization —
implemented with scale-safe plans (single shuffle + sort, carry-forward
via window functions; never per-row subqueries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from onehouse_demos_spark.functions.quantize import (
    fquant,
    fquant_sql,
    fsum,
    fsum_int,
    fsum_int_sql,
    fsum_sql,
)
from onehouse_demos_spark.operators.relational import load, load_events


# --------------------------------------------------------------------------
# ROLLUP aggregation (subtotal hierarchy).
# --------------------------------------------------------------------------

def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        # engine-proof floor-quantized contract (VERDICT r11 #2); the
        # ROLLUP grand-total row sums EVERY order — thin BIGINT margin
        # at SF 1e5, so it rides the wide accumulator (r14 ledger)
        fsum(F.col("o_totalprice"), wide=True).alias("total"),
    )


ROLLUP_STATUS_PRIORITY_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       {fsum_sql("o_totalprice", 2, wide=True)} AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------------------
# CUBE aggregation.
# --------------------------------------------------------------------------

def cube_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        fsum(F.col("l_quantity")).alias("qty"),
    )


CUBE_RETURNFLAG_LINESTATUS_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR((l_quantity) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# PIVOT (fixed pivot values → static schema).
# --------------------------------------------------------------------------

def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_finished"),
            F.coalesce("P", F.lit(0)).alias("n_pending"),
        )
    )


PIVOT_STATUS_BY_PRIORITY_SQL = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
FROM orders
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Set operators: INTERSECT / EXCEPT.
# --------------------------------------------------------------------------

def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers that have urgent orders but no low-priority orders:
    INTERSECT/EXCEPT composition."""
    orders = load(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    allc = orders.select("o_custkey")
    return (
        urgent.intersect(allc)  # no-op intersect keeps the operator exercised
        .exceptAll(low)
        .distinct()
        .withColumnRenamed("o_custkey", "custkey")
    )


SET_OPS_CUSTOMERS_SQL = """
SELECT DISTINCT o_custkey AS custkey FROM (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  INTERSECT
  SELECT o_custkey FROM orders
)
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
"""


# --------------------------------------------------------------------------
# AS-OF JOIN: for each purchase event, the most recent prior click by
# the same user. Spark has no ASOF JOIN operator; the scalable plan is
# the union + carry-forward-window trick: one shuffle on user_id, one
# sort by time, last_value(ignoreNulls) carries the latest click down
# to each purchase row. (DuckDB oracle uses its native ASOF semantics
# via a correlated MAX — same result.)
# --------------------------------------------------------------------------

def asof_prior_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("t"),
        F.unix_micros("ts").alias("click_us"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(0).alias("is_purchase"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(None).cast("long").alias("click_us"),
        F.col("event_id").alias("purchase_id"),
        F.lit(1).alias("is_purchase"),
    )
    # clicks sort before purchases at identical timestamps → "prior or
    # simultaneous click" (ties include ts == purchase ts, matching the
    # oracle's c.ts <= p.ts)
    combined = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("is_purchase").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        combined.withColumn("prior_click_us", F.last("click_us", ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
        .select(
            F.col("purchase_id").alias("event_id"),
            "user_id",
            F.unix_micros("t").alias("purchase_us"),
            "prior_click_us",
        )
    )


ASOF_PRIOR_CLICK_SQL = """
SELECT p.event_id,
       p.user_id,
       epoch_us(p.ts::TIMESTAMP) AS purchase_us,
       (SELECT MAX(epoch_us(c.ts::TIMESTAMP)) FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts <= p.ts) AS prior_click_us
FROM events p
WHERE p.event_type = 'purchase'
"""


# --------------------------------------------------------------------------
# Gap-based sessionization: new session when idle > 30 min. The classic
# lag + cumulative-sum plan: one shuffle on user_id, sort by ts — the
# standard scalable formulation.
# --------------------------------------------------------------------------

def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    with_new = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    with_sid = with_new.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
        )
    )


SESSIONIZE_EVENTS_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts) OVER w :: TIMESTAMP)
                   > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sid AS (
  SELECT user_id, ts,
         -- DuckDB SUM() OVER yields HUGEINT (int128): cast to BIGINT so
         -- the cross-engine value hash sees the same physical type as
         -- Spark's LongType window sum.
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, CAST(COUNT(*) AS BIGINT) AS n_events,
       epoch_us(MIN(ts)::TIMESTAMP) AS session_start_us,
       epoch_us(MAX(ts)::TIMESTAMP) AS session_end_us
FROM sid
GROUP BY user_id, session_seq
"""


# --------------------------------------------------------------------------
# Exact distinct + HLL approximate distinct. The sketch value is
# engine-specific (Spark HLL++ vs DuckDB HLL), so the approximate variant
# self-certifies instead: it emits whether the estimate lands within the
# configured error bound of the exact count, and the oracle pins that
# invariant. The exact twin IS value-checked directly.
# --------------------------------------------------------------------------

def distinct_users_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


DISTINCT_USERS_EXACT_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch aggregate (mergeable partial aggregation —
    the 100 TB path where exact distinct would shuffle every key).

    The sketch estimate itself differs across engines, so the query
    certifies the HLL contract instead: rsd=0.01 ⇒ estimate within 5%
    (5 sigma) of the exact count. At scale only the approx branch runs;
    the exact branch here is the verification harness."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .select(
            "event_type",
            (F.abs(F.col("approx") - F.col("exact"))
             <= F.greatest(F.col("exact") * 0.05, F.lit(1.0))
             ).alias("within_tol"),
        )
    )


APPROX_DISTINCT_USERS_SQL = """
SELECT event_type, TRUE AS within_tol FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Exact interpolated median (Spark `percentile` == DuckDB
# `quantile_cont` — both linear interpolation).
# --------------------------------------------------------------------------

def median_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete rank-selected order statistics (VERDICT r11 #2, the
    value_quantile_sketch class): interpolated percentiles diverge
    across engines/versions; the k-th smallest ELEMENT at an
    integer-arithmetic rank is single-valued everywhere. Output is the
    raw 2dp element floor-quantized to BIGINT cents."""
    orders = load(spark, sf_dir, "orders")
    # rank AND per-group count in one window pass (same partition
    # spec -> one shuffle + one sort; no aggregate-join leg, no
    # second orders scan)
    rw = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    rall = Window.partitionBy("o_orderstatus").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = (
        orders.select("o_orderstatus", "o_totalprice")
        .withColumn("_r", F.row_number().over(rw))
        .withColumn("_n", F.count(F.lit(1)).over(rall))
    )
    return ranked.groupBy("o_orderstatus").agg(
        F.max(
            F.when(
                F.col("_r") == F.expr("(_n + 1) div 2"),
                fquant(F.col("o_totalprice"), 2),
            )
        ).alias("median_total_e2"),
        F.max(
            F.when(
                F.col("_r") == F.expr("(_n * 9 + 9) div 10"),
                fquant(F.col("o_totalprice"), 2),
            )
        ).alias("p90_total_e2"),
    )


MEDIAN_ORDER_VALUE_SQL = """
WITH n AS (
  SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY 1
), ranked AS (
  SELECT o_orderstatus, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice) AS r
  FROM orders
)
SELECT ranked.o_orderstatus,
       MAX(CASE WHEN r = (n + 1) // 2
                THEN CAST(FLOOR((o_totalprice) * 100) AS BIGINT) END)
         AS median_total_e2,
       MAX(CASE WHEN r = (n * 9 + 9) // 10
                THEN CAST(FLOOR((o_totalprice) * 100) AS BIGINT) END)
         AS p90_total_e2
FROM ranked JOIN n USING (o_orderstatus)
GROUP BY ranked.o_orderstatus
"""


# --------------------------------------------------------------------------
# Correlated scalar subquery shape: each customer's max order vs their
# account balance. Expressed as join+window in Spark (Catalyst would
# decorrelate the subquery into the same plan).
# --------------------------------------------------------------------------

def customer_max_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    mx = orders.groupBy("o_custkey").agg(F.max("o_totalprice").alias("max_total"))
    return (
        customer.join(mx, customer.c_custkey == mx.o_custkey, "left")
        .select(
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal_r"),
            F.round(F.coalesce("max_total", F.lit(0.0)), 2).alias("max_order_r"),
        )
    )


CUSTOMER_MAX_ORDER_SQL = """
SELECT c_custkey,
       ROUND(c_acctbal, 2) AS acctbal_r,
       ROUND(COALESCE((SELECT MAX(o_totalprice) FROM orders
                       WHERE o_custkey = c_custkey), 0.0), 2) AS max_order_r
FROM customer
"""


# --------------------------------------------------------------------------
# Window-function suite: ranking, navigation, distribution, running
# aggregate — one shuffle on the partition key; the unique composite
# ORDER BY (price desc, key) makes every function deterministic.
# --------------------------------------------------------------------------

def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
        # floor-quantized contract: cume_dist is an exact rank/count
        # division (deterministic) but ROUND's half-tie rule is not
        # (rank/2^7 counts land EXACTLY on 7th-decimal ties); same for
        # the running double sum (VERDICT r11 #2)
        fquant(F.cume_dist().over(w), 6).alias(
            "cume_e6"
        ),
        F.lag("o_orderkey", 1).over(w).alias("prev_ok"),
        F.lead("o_orderkey", 1).over(w).alias("next_ok"),
        (
            F.sum(fquant(F.col("o_totalprice"))).over(run).cast("double")
            / 100.0
        ).alias("run_total"),
    )


WINDOW_RANK_ORDERS_SQL = """
SELECT o_custkey, o_orderkey,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       ROW_NUMBER() OVER w AS rn,
       NTILE(4) OVER w AS quartile,
       CAST(FLOOR((CUME_DIST() OVER w) * 1000000) AS BIGINT) AS cume_e6,
       LAG(o_orderkey, 1) OVER w AS prev_ok,
       LEAD(o_orderkey, 1) OVER w AS next_ok,
       CAST(SUM(CAST(FLOOR((o_totalprice) * 100) AS BIGINT))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) / 100.0 AS run_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey)
"""


# --------------------------------------------------------------------------
# Calendar bucketing: date_trunc month trend (partition-prunable shape
# when the table is date-partitioned).
# --------------------------------------------------------------------------

def monthly_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "month"
            )
        )
        .agg(
            fsum(F.col("o_totalprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


MONTHLY_REVENUE_TREND_SQL = """
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
       CAST(SUM(CAST(FLOOR((o_totalprice) * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 AS revenue,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1
"""


# --------------------------------------------------------------------------
# Customer order-count distribution (TPC-H Q13 shape): outer join +
# two-level aggregation. Scale note: both group-bys key on high-cardinality
# c_custkey then tiny c_count — the second shuffle is near-free, and the
# first benefits from AQE partial aggregation; no broadcast (orders is the
# big side, customer is also large at 100 TB so this stays a shuffle join
# co-partitioned on the key).
# --------------------------------------------------------------------------

def custdist_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


CUSTDIST_ORDERS_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# --------------------------------------------------------------------------
# 7-day moving window over daily revenue via a RANGE window frame.
# Float-parity design: daily revenue is summed as DECIMAL(18,2) (exact,
# order-independent); the window emits the exact moving SUM + day count
# (avg = sum/count for consumers) — never an AVG over doubles whose
# addition order differs per engine.
# Scale note: the window is unpartitioned but its input is ONE ROW PER DAY
# (pre-aggregated), so cardinality is bounded by the calendar, not the data.
# --------------------------------------------------------------------------

def revenue_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    # floor-quantized BIGINT cents through the whole pipeline: the
    # double->DECIMAL per-row cast rode engine-specific tie rules
    # (VERDICT r11 #2, the gapfill class)
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(fquant(F.col("o_totalprice"))).alias("rev_e2")
    )
    w = (
        Window.orderBy(F.datediff(F.col("day"), F.lit("1970-01-01")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "day",
        (F.col("rev_e2").cast("double") / 100.0).alias("day_rev_r"),
        (
            F.sum("rev_e2").over(w).cast("double") / 100.0
        ).alias("sum7_r"),
        F.count(F.lit(1)).over(w).alias("n_days7"),
    )


REVENUE_MOVING_AVG_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(FLOOR((o_totalprice) * 100) AS BIGINT)) AS BIGINT)
           AS rev_e2
  FROM orders GROUP BY 1
)
SELECT day,
       CAST(rev_e2 AS DOUBLE) / 100.0 AS day_rev_r,
       CAST(SUM(rev_e2) OVER w AS DOUBLE) / 100.0 AS sum7_r,
       COUNT(*) OVER w AS n_days7
FROM daily
WINDOW w AS (ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING
             AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# Ordered conversion funnel (view → click → purchase) via conditional
# MIN-timestamp aggregation — one shuffle on user_id, no self-joins
# (the naive 3-way self-join would be three shuffles of the full event
# stream; this is the scale-safe formulation).
# --------------------------------------------------------------------------

def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_events(spark, sf_dir)
    per_user = (
        events.filter(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
                "t_purchase"
            ),
        )
    )
    return per_user.agg(
        F.count(F.col("t_view")).alias("n_viewed"),
        F.count(
            F.when(F.col("t_click") > F.col("t_view"), F.lit(1))
        ).alias("n_clicked_after_view"),
        F.count(
            F.when(
                (F.col("t_click") > F.col("t_view"))
                & (F.col("t_purchase") > F.col("t_click")),
                F.lit(1),
            )
        ).alias("n_full_funnel"),
    )


EVENT_FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
  GROUP BY user_id
)
SELECT COUNT(t_view) AS n_viewed,
       COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_clicked_after_view,
       COUNT(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 END)
         AS n_full_funnel
FROM per_user
"""


# --------------------------------------------------------------------------
# Range join via bucket expansion. A naive interval join (value BETWEEN
# lo AND hi) plans as BroadcastNestedLoopJoin — O(rows × bands)
# comparisons, catastrophic at 100 TB. Instead each band is exploded to
# the fixed-width integer buckets it overlaps, the fact side computes
# floor(value / W) once, and the join is a plain equi-join on the bucket
# (hash join, broadcastable dim) followed by a residual band filter.
# Sums are decimal-exact for oracle parity.
# --------------------------------------------------------------------------

_VALUE_BANDS = [(0, 1), (1, 10), (10, 50), (50, 200), (200, 500)]
_BUCKET_W = 25


def range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_events(spark, sf_dir)
    bands = spark.createDataFrame(
        [(lo, hi) for lo, hi in _VALUE_BANDS], "lo int, hi int"
    )
    exploded = bands.select(
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / _BUCKET_W).cast("int"),
                F.floor(F.col("hi") / _BUCKET_W).cast("int"),
            )
        ).alias("bucket"),
    )
    facts = events.select(
        "value", F.floor(F.col("value") / _BUCKET_W).cast("int").alias("bucket")
    )
    joined = facts.join(F.broadcast(exploded), "bucket").filter(
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    return joined.groupBy("lo", "hi").agg(
        F.count(F.lit(1)).alias("n_events"),
        fsum(F.col("value")).alias("sum_value_r"),
    )


_BANDS_VALUES_SQL = ", ".join(f"({lo}, {hi})" for lo, hi in _VALUE_BANDS)

RANGE_JOIN_BANDS_SQL = f"""
SELECT lo, hi, COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR((value) * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_value_r
FROM events
JOIN (VALUES {_BANDS_VALUES_SQL}) AS bands(lo, hi)
  ON value >= lo AND value < hi
GROUP BY lo, hi
"""


# --------------------------------------------------------------------------
# Skew-safe two-stage aggregation (salting): when a groupBy key is
# pathologically hot (a handful of keys hold most rows), a single
# shuffle sends each hot key to one reducer. Stage 1 aggregates on
# (key, salt) spreading each key over N reducers; stage 2 re-aggregates
# the N partials per key — count/sum compose losslessly, and decimal
# sums keep the result bit-identical to the unsalted plan.
# --------------------------------------------------------------------------

_N_SALTS = 16


def skew_safe_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_events(spark, sf_dir)
    salted = events.withColumn(
        "salt", (F.crc32(F.col("event_id").cast("string")) % _N_SALTS)
    )
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(fquant(F.col("value"))).alias("psum_e2"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        (F.sum("psum_e2").cast("double") / 100.0).alias("sum_value_r"),
    )


SKEW_SAFE_AGG_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR((value) * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_value_r
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# TPC-H Q21 analog — "sole blocking supplier": for finished orders with
# lines from more than one supplier, find suppliers who were the ONLY
# one to ship a line after the cutoff. The textbook SQL is two
# correlated subqueries (EXISTS other-supplier / NOT EXISTS other-late-
# supplier); the Spark-first formulation DECORRELATES both into one
# per-order aggregate — count distinct suppliers and distinct late
# suppliers per order in a single shuffle — then joins lineitem back
# to it. At 100 TB that is: one groupBy(orderkey) over lineitem, one
# orderkey-keyed join (both sides co-partitioned, AQE handles skew),
# one broadcast dim join for supplier names — versus the naive plan's
# two extra self-joins of the fact table. The DuckDB oracle keeps the
# textbook correlated-subquery form, proving the decorrelation is
# semantics-preserving.
# --------------------------------------------------------------------------

_Q21_CUTOFF = "1997-06-01"


def sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supplier = load(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.lit(_Q21_CUTOFF)
    # ONE lineitem scan, physically (r14): the r13 shape built
    # `per_supp` once logically but referenced it from two branches
    # (the per-order flags joined back to it), and Spark has no
    # DataFrame-level CTE reuse — the physical plan scanned and
    # pre-aggregated lineitem TWICE (plans/r14/sole_late_supplier_
    # before.txt: two parquet scans, four exchanges). The per-order
    # flags are windows over the same (order, supplier) aggregate, so
    # compute them as windows: repartition the 3 projected columns by
    # l_orderkey ONCE — the groupBy(l_orderkey, l_suppkey) and the
    # l_orderkey-partitioned windows both reuse that partitioning
    # (guide §2.4 "two operations keyed the same way share one
    # exchange") — then filter and broadcast-join as before. Measured
    # (interleaved A/B, sf0.1): 2.05 s → 1.33 s loaded box; bench min
    # 3.07 s → see OPTIMIZATION_r14.md. One scan, one data shuffle.
    per_supp = (
        li.select(
            "l_orderkey",
            "l_suppkey",
            F.when(late, 1).otherwise(0).alias("_late_line"),
        )
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum("_late_line").alias("n_late_lines"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_supp.select(
        "l_orderkey",
        "l_suppkey",
        "n_late_lines",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum(F.least(F.col("n_late_lines"), F.lit(1))).over(w).alias(
            "n_late_supp"
        ),
    )
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    blocking = flagged.filter(
        (F.col("n_late_lines") > 0)
        & (F.col("n_supp") > 1)
        & (F.col("n_late_supp") == 1)
    ).join(finished, F.col("l_orderkey") == F.col("o_orderkey"))
    return (
        blocking.join(F.broadcast(supplier),
                      F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


SOLE_LATE_SUPPLIER_SQL = f"""
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > '{_Q21_CUTOFF}'
  AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > '{_Q21_CUTOFF}')
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# Quantile sketch vs exact: percentile_approx (Greenwald-Khanna-style
# mergeable sketch — single pass, bounded memory, the only way to do
# quantiles over 100 TB) checked against the exact interpolated
# percentile computed in the same plan. The exact values are oracle-
# verified against DuckDB's quantile_cont; the sketch's closeness is a
# self-certified boolean (the sketch bytes themselves are
# engine-specific, like the HLL case).
# --------------------------------------------------------------------------

_QS_ACCURACY = 1000  # ~1/1000 rank error


def value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISCRETE percentiles (oracle-compared values) next to
    percentile_approx sketches verified against the sketch's ACTUAL
    contract: the returned value's rank interval must lie within
    n/accuracy (+1 slack) ranks of the target rank. r2's 5%-of-spread
    value heuristic was not a guarantee the sketch makes — it failed
    legitimately at sf0.001 where a sparse tail puts p99 between two
    distant points. The rank bound is provable at every SF, so the
    pinned-True oracle booleans assert something the sketch really
    promises.

    Output contract (VERDICT r11 #1): the exact quantile is the
    rank-selected ELEMENT at rank ceil(p*n) — an order statistic, no
    interpolation — floor-quantized to integer 1e-4 units
    (CAST(FLOOR(x*10000) AS BIGINT)). Rationale: interpolated
    percentiles (Spark `percentile` vs DuckDB `quantile_cont`) compute
    `lo + (hi-lo)*frac` in engine-specific operation order, and
    ROUND/double->DECIMAL casts apply engine-specific tie rules — both
    flipped the driver's r11 hash. Selecting the k-th order statistic
    touches the raw parquet double (bit-identical in every engine) and
    IEEE multiply + floor is deterministic everywhere.

    Plan shape: one grouped agg (tiny result, broadcast) + one events
    re-scan joined on the group key for the rank counts, + one
    per-group rank window for the three order statistics (exact
    quantiles need a per-group ordering by definition — the sketch
    column is the 100 TB path; the exact leg is its verification)."""
    ev = load_events(spark, sf_dir)
    probs = [0.5, 0.9, 0.99]
    approx = [
        F.expr(
            f"percentile_approx(value, {p}, {_QS_ACCURACY})"
        ).alias(f"_a{int(p*100)}")
        for p in probs
    ]
    agg = ev.groupBy("event_type").agg(
        *approx, F.count(F.lit(1)).alias("_n")
    )
    # Exact leg: k-th order statistic per group at rank ceil(p*n),
    # floor-quantized to BIGINT 1e-4 units. row_number needs no
    # tiebreak: the k-th smallest VALUE of a multiset is unique.
    rw = Window.partitionBy("event_type").orderBy("value")
    ranked = (
        ev.select("event_type", "value")
        .withColumn("_r", F.row_number().over(rw))
        .join(F.broadcast(agg.select("event_type", "_n")), "event_type")
    )
    # Rank target ceil(p*n) in INTEGER arithmetic ((num*n + den-1) div
    # den): a double literal 0.9 times n crosses an integer boundary
    # differently than DuckDB's exact-DECIMAL literal would.
    fracs = {50: (1, 2), 90: (9, 10), 99: (99, 100)}
    exact = ranked.groupBy("event_type").agg(
        *[
            F.max(
                F.when(
                    F.col("_r")
                    == F.expr(f"(_n * {num} + {den - 1}) div {den}"),
                    fquant(F.col("value"), 4),
                )
            ).alias(f"p{i}_exact_e4")
            for i, (num, den) in fracs.items()
        ]
    )
    # rank interval of each approx value within its group
    ranks = ev.join(F.broadcast(agg), "event_type").groupBy("event_type").agg(
        *[
            F.sum(
                (F.col("value") < F.col(f"_a{int(p*100)}")).cast("long")
            ).alias(f"_lt{int(p*100)}")
            for p in probs
        ],
        *[
            F.sum(
                (F.col("value") <= F.col(f"_a{int(p*100)}")).cast("long")
            ).alias(f"_le{int(p*100)}")
            for p in probs
        ],
    )
    out = agg.join(ranks, "event_type").join(exact, "event_type")
    checks = []
    for p in probs:
        i = int(p * 100)
        target = F.ceil(F.lit(p) * F.col("_n"))
        tol = F.col("_n") / F.lit(_QS_ACCURACY) + F.lit(1.0)
        lo = F.col(f"_lt{i}") + 1
        hi = F.col(f"_le{i}")
        # value's true rank interval [lo, hi] must intersect
        # [target - tol, target + tol]
        checks.append(
            ((lo <= target + tol) & (hi >= target - tol)).alias(
                f"p{i}_sketch_ok"
            )
        )
    return out.select(
        "event_type",
        *[f"p{int(p*100)}_exact_e4" for p in probs],
        *checks,
    )


VALUE_QUANTILE_SKETCH_SQL = """
WITH n AS (
  SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
), ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS r
  FROM events
)
SELECT ranked.event_type,
       MAX(CASE WHEN r = (n * 1 + 1) // 2
                THEN CAST(FLOOR((value) * 10000) AS BIGINT) END)
         AS p50_exact_e4,
       MAX(CASE WHEN r = (n * 9 + 9) // 10
                THEN CAST(FLOOR((value) * 10000) AS BIGINT) END)
         AS p90_exact_e4,
       MAX(CASE WHEN r = (n * 99 + 99) // 100
                THEN CAST(FLOOR((value) * 10000) AS BIGINT) END)
         AS p99_exact_e4,
       CAST(1 AS BOOLEAN) AS p50_sketch_ok,
       CAST(1 AS BOOLEAN) AS p90_sketch_ok,
       CAST(1 AS BOOLEAN) AS p99_sketch_ok
FROM ranked JOIN n USING (event_type)
GROUP BY ranked.event_type
"""


# --------------------------------------------------------------------------
# Time-series rollups (hypertable continuous-aggregate family):
# OHLC bars via ordered aggregates (min_by/max_by pick open/close by
# timestamp inside one hash aggregate — no window sort), and
# gap-filling: bucket aggregation LEFT-joined onto a generated dense
# time axis with last-observation-carried-forward interpolation.
# 100 TB shapes: OHLC is one map-side-combined aggregation keyed by
# (bucket, series); gapfill's generated axis is buckets × series
# (metadata-scale vs the events), the join broadcasts it, and the fill
# is one window over the tiny bucketed frame, never the raw events.
# --------------------------------------------------------------------------


def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    hour = F.date_trunc("hour", F.col("ts"))
    # Orderable composite tiebreak key (ts, event_id) packed into ONE
    # DECIMAL(38,0): unix_micros × 10^20 + event_id. Identical total
    # order to the r13 zero-padded "%020d-%020d" string (both operands
    # are non-negative, event_id < 10^20 always as a BIGINT, and
    # micros × 10^20 ≤ ~1.8e35 < 10^38 so the packing is exact) — but
    # a fixed-width DECIMAL aggregation buffer is UnsafeRow-mutable
    # where a STRING buffer is not, so min_by/max_by plan as a
    # HashAggregate instead of Sort+SortAggregate on both sides of the
    # exchange (guide §2.4/§7.2; plans/r14/events_ohlc_bars_*.txt:
    # 2 Sort + 2 SortAggregate → 2 HashAggregate), and the two per-row
    # format_string calls disappear. Measured interleaved A/B sf0.1:
    # 0.84 s → 0.68 s. Same open/close under same-timestamp events.
    # Bound (ADVICE r14): DECIMAL(18,0) holds unix_micros < 1e18, i.e.
    # timestamps before year ~33658 — strictly wider than the
    # 1973–5000 window load_events' unit classification admits, so the
    # cast cannot overflow for any ts that survives loading; 1e18 - 1
    # micros × 10^20 + event_id also stays under the DECIMAL(38,0)
    # product headroom claimed above.
    okey = F.expr(
        "CAST(unix_micros(ts) AS DECIMAL(18,0)) * 100000000000000000000BD"
        " + CAST(event_id AS DECIMAL(20,0))"
    )
    # engine-proof contract (VERDICT r11 #2): OHLC points are raw
    # parquet-double ELEMENTS floor-quantized to BIGINT e4 units —
    # ROUND + double->DECIMAL casts ride engine-specific tie rules,
    # IEEE multiply + floor does not.
    e4 = lambda c: fquant(c, 4)  # noqa: E731
    return (
        ev.groupBy(
            F.unix_micros(hour).alias("bucket_us"),
            "event_type",
        )
        .agg(
            e4(F.min_by("value", okey)).alias("open_e4"),
            e4(F.max("value")).alias("high_e4"),
            e4(F.min("value")).alias("low_e4"),
            e4(F.max_by("value", okey)).alias("close_e4"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


EVENTS_OHLC_BARS_SQL = """
SELECT epoch_us(date_trunc('hour', ts)::TIMESTAMP) AS bucket_us,
       event_type,
       CAST(FLOOR((arg_min(value, printf('%020d-%020d',
              epoch_us(ts::TIMESTAMP), event_id))) * 10000) AS BIGINT) AS open_e4,
       CAST(FLOOR((MAX(value)) * 10000) AS BIGINT) AS high_e4,
       CAST(FLOOR((MIN(value)) * 10000) AS BIGINT) AS low_e4,
       CAST(FLOOR((arg_max(value, printf('%020d-%020d',
              epoch_us(ts::TIMESTAMP), event_id))) * 10000) AS BIGINT) AS close_e4,
       COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
"""


def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event type over the observed time span,
    with empty buckets emitted (n_events = 0) and the bucket value
    total carried forward from the last non-empty bucket (locf).

    The carried metric is an exact BIGINT sum of per-row
    floor-quantized values (CAST(FLOOR(value*10000) AS BIGINT)):
    double sums are order-dependent and double->DECIMAL casts apply
    engine-specific tie rules (the r11 driver hash flipped on exactly
    that cast), while IEEE multiply + floor on the raw parquet double
    is bit-identical in every engine and integer sums are
    order-independent (VERDICT r11 #1)."""
    ev = load_events(spark, sf_dir)
    hour = F.date_trunc("hour", F.col("ts"))
    bars = ev.groupBy(
        F.unix_micros(hour).alias("bucket_us"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(fquant(F.col("value"), 4)).alias("_sum"),
    )
    span = ev.agg(
        F.unix_micros(F.date_trunc("hour", F.min("ts"))).alias("lo"),
        F.unix_micros(F.date_trunc("hour", F.max("ts"))).alias("hi"),
    )
    hour_us = 3_600_000_000
    # The dense axis is buckets × series — METADATA-scale (hours in the
    # span × distinct types), never event-scale; its crossJoin plans as
    # a broadcast nested loop over that tiny frame by design.
    axis = (
        span.select(
            F.explode(
                F.sequence("lo", "hi", F.lit(hour_us))
            ).alias("bucket_us")
        )
        .crossJoin(ev.select("event_type").distinct())
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        axis.join(bars, ["bucket_us", "event_type"], "left")
        .withColumn("n_events", F.coalesce("n_events", F.lit(0)))
        .withColumn(
            "sum_value_locf_e4",
            F.last("_sum", ignorenulls=True).over(w).cast("long"),
        )
        .drop("_sum")
    )
    return filled.filter(F.col("sum_value_locf_e4").isNotNull())


EVENTS_GAPFILL_SQL = """
WITH bars AS (
  SELECT epoch_us(date_trunc('hour', ts)::TIMESTAMP) AS bucket_us,
         event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(FLOOR((value) * 10000) AS BIGINT)) AS BIGINT) AS a
  FROM events GROUP BY 1, 2
), span AS (
  SELECT epoch_us(date_trunc('hour', MIN(ts))::TIMESTAMP) AS lo,
         epoch_us(date_trunc('hour', MAX(ts))::TIMESTAMP) AS hi
  FROM events
), axis AS (
  SELECT unnest(generate_series(lo, hi, 3600000000)) AS bucket_us
  FROM span
), grid AS (
  SELECT axis.bucket_us, t.event_type
  FROM axis CROSS JOIN (SELECT DISTINCT event_type FROM events) t
), joined AS (
  SELECT grid.bucket_us, grid.event_type,
         COALESCE(bars.n_events, 0) AS n_events,
         bars.a
  FROM grid LEFT JOIN bars USING (bucket_us, event_type)
)
SELECT bucket_us, event_type, CAST(n_events AS BIGINT) AS n_events,
       CAST(last_value(a IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY bucket_us
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sum_value_locf_e4
FROM joined
QUALIFY sum_value_locf_e4 IS NOT NULL
"""


# --------------------------------------------------------------------------
# TPC-H Q11 analog — "important stock": supplier-part value groups
# whose total exceeds a data-relative threshold. The defining shape is
# HAVING against a scalar subquery over the same fact table:
# Spark-first this is one aggregation reused for both sides — group
# totals once, the threshold as a second tiny aggregate of the group
# frame (NOT a second fact scan), crossJoin-broadcast the scalar.
# The DuckDB oracle keeps the textbook correlated form.
#
# The threshold is the P99 of the part-value distribution (not a fixed
# fraction of the global total): a fixed fraction goes vacuous as the
# part count grows with SF (0.001 of total > every part's share once
# there are ≳1000 parts — exactly what happened at sf0.01 in r2), while
# a quantile keeps ~1% of parts "important" at EVERY scale. Both
# engines interpolate the quantile over the same exact DECIMAL sums
# cast to double, so the cut is engine-stable.
# --------------------------------------------------------------------------

#: Q11 "important part" threshold rank as an exact integer ratio —
#: the SOURCE OF TRUTH for the rank formula in BOTH engines (r12).
_Q11_NUM, _Q11_DEN = 99, 100


def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    value = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # floor-quantized e4 integer sums (VERDICT r11 #2): the per-row
    # double->DECIMAL cast and the interpolated percentile threshold
    # were both r11 driver-failure classes; the threshold is now the
    # rank-ceil(q*n) ORDER STATISTIC of exact integers.
    # wide accumulator then an exact BIGINT close: per-part group size
    # is ~constant in SF (so BIGINT would in fact survive), but the
    # headroom meta-test's conservative linear model flags it and the
    # wide path costs one tiny window-frame aggregate (VERDICT r12 #6)
    groups = li.groupBy("l_partkey").agg(
        fsum_int(value, 4, wide=True).alias("part_value_e4")
    )
    # ONE window pass over the groups frame computes rank, count AND
    # the threshold scalar (max of the rank-selected value over the
    # full frame), so the lineitem aggregate appears exactly once in
    # the plan — no cache (a cached frame leaked per invocation, r12
    # review finding) and no threshold-side re-aggregation. The
    # windows run over the GROUPS frame (one row per part), never the
    # fact table.
    w_ord = Window.orderBy("part_value_e4")
    w_all = Window.orderBy("part_value_e4").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = (
        groups.withColumn("_r", F.row_number().over(w_ord))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
        .withColumn(
            "_thr",
            F.max(
                F.when(
                    F.col("_r")
                    == F.expr(
                        f"(_n * {_Q11_NUM} + {_Q11_NUM}) div {_Q11_DEN}"
                    ),
                    F.col("part_value_e4"),
                )
            ).over(w_all),
        )
    )
    return (
        ranked.filter(F.col("part_value_e4") > F.col("_thr"))
        .select("l_partkey", "part_value_e4")
        .orderBy(F.desc("part_value_e4"), F.asc("l_partkey"))
        .limit(50)
    )


IMPORTANT_PART_VALUE_SQL = f"""
WITH g AS (
  SELECT l_partkey,
         {fsum_int_sql("l_extendedprice * (1 - l_discount)", 4,
                       wide=True)} AS part_value_e4
  FROM lineitem
  GROUP BY l_partkey
), n AS (
  SELECT COUNT(*) AS n FROM g
), ranked AS (
  SELECT part_value_e4,
         ROW_NUMBER() OVER (ORDER BY part_value_e4) AS r
  FROM g
), th AS (
  SELECT part_value_e4 AS th
  FROM ranked, n WHERE r = (n * {_Q11_NUM} + {_Q11_NUM}) // {_Q11_DEN}
)
SELECT l_partkey, part_value_e4
FROM g, th
WHERE part_value_e4 > th
ORDER BY part_value_e4 DESC, l_partkey ASC
LIMIT 50
"""


# --------------------------------------------------------------------------
# TPC-H-shaped decorrelation suite (r7): each query pins a DISTINCT
# optimizer/decorrelation shape not covered above — window-decorrelated
# scalar subquery (Q17), having-on-fact-agg top-N (Q18), EXISTS
# semi-join with a non-equi conjunct (Q4), bi-dimensional fact rollup
# (Q7), ratio-of-conditional-sums (Q8), disjunctive multi-column
# pushdown (Q19), scalar-threshold + anti-join (Q22). All declared
# DataFrame-first so Catalyst plans the decorrelation; oracles are the
# textbook correlated-SQL forms, so the gate proves the rewrites.
# --------------------------------------------------------------------------


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape. The correlated scalar subquery (per-part avg
    quantity) decorrelates into an unbounded window over l_partkey:
    ONE shuffle of the brand-filtered lineitem subset, no self-join,
    no re-scan — the textbook plan joins lineitem against a re-scanned
    per-part aggregate of itself."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    brand_parts = part.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    flt = li.join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    w = Window.partitionBy("l_partkey")
    return (
        flt.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            # SUM(e2)/700 = (sum/100)/7: exact integer sum, ONE
            # closing IEEE division (VERDICT r11 #2)
            (
                F.sum(fquant(F.col("l_extendedprice"))).cast("double")
                / 700.0
            ).alias("avg_yearly")
        )
    )


SMALL_QUANTITY_REVENUE_SQL = """
SELECT CAST(SUM(CAST(FLOOR((l_extendedprice) * 100) AS BIGINT)) AS DOUBLE)
         / 700.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
"""


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a fact aggregate, then the survivors
    (top ~1% of orders) decorate from orders/customer. The post-filter
    aggregate is tiny relative to lineitem, so AQE converts the
    decoration joins to broadcasts at runtime — only the per-order
    groupBy shuffles the fact table."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(fsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice_r"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(10)
    )


LARGE_VOLUME_CUSTOMERS_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       ROUND(o_totalprice, 2) AS o_totalprice_r, total_qty
FROM (SELECT l_orderkey,
             CAST(SUM(CAST(FLOOR((l_quantity) * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING CAST(SUM(CAST(FLOOR((l_quantity) * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 > 250) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey ASC
LIMIT 10
"""


def priority_delayed_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS over the fact table becomes a LEFT SEMI
    join on the order key with the non-equi lateness conjunct kept in
    the join condition — one pass over each table, no correlated
    re-execution, and the semi join short-circuits per key."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    late = li.select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            late,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


PRIORITY_DELAYED_ORDERS_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue by (customer nation, supplier nation)
    pair. Supplier and nation broadcast (SF/10 and constant-size dims);
    customer decorates via shuffle join — it scales with the fact
    table. The pair rollup is at most nations² rows."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    cust_n = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    supp_n = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_n, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("cust_nation", "supp_nation")
        # wide accumulator: 625 nation-pair groups mean per-group e4
        # revenue grows linearly with SF and busts BIGINT near the
        # 100 TB target (headroom meta-test, VERDICT r12 #6)
        .agg(fsum(rev, 4, wide=True).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("cust_nation"), F.asc("supp_nation"))
        .limit(20)
    )


NATION_TRADE_VOLUME_SQL = f"""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       {fsum_sql("l_extendedprice * (1 - l_discount)", 4, wide=True)}
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
GROUP BY cust_nation, supp_nation
ORDER BY revenue DESC, cust_nation ASC, supp_nation ASC
LIMIT 20
"""


def regional_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue per
    year — a ratio of conditional sums computed in a single aggregate
    pass (no second scan for the denominator)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    asia_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey")
    cust_asia = customer.join(
        F.broadcast(asia_nations), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey")
    supp_n = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_asia, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            # exact integer numerator/denominator, ONE IEEE division,
            # no rounding rule at the boundary (VERDICT r11 #2).
            # Wide accumulators: only ~7 year groups, so each e4 sum
            # grows linearly with SF and busts BIGINT near the 100 TB
            # target (headroom meta-test, VERDICT r12 #6).
            (
                F.sum(
                    fquant(
                        F.when(F.col("supp_nation") == "NATION_5", rev), 4
                    ).cast("decimal(38,0)")
                ).cast("double")
                / F.sum(fquant(rev, 4).cast("decimal(38,0)")).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


REGIONAL_MARKET_SHARE_SQL = f"""
SELECT YEAR(o_orderdate) AS o_year,
       CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_5'
                     THEN {fquant_sql("l_extendedprice * (1 - l_discount)",
                                      4)}
                     END AS DECIMAL(38,0))) AS DOUBLE)
         / CAST(SUM(CAST({fquant_sql("l_extendedprice * (1 - l_discount)",
                                     4)}
                         AS DECIMAL(38,0))) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    JOIN nation cn ON c_nationkey = cn.n_nationkey
                    JOIN region ON cn.n_regionkey = r_regionkey
                    WHERE r_name = 'ASIA')
GROUP BY o_year
ORDER BY o_year
"""


def bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: a disjunction of (brand, size-range,
    quantity-range) conjuncts. Declared as one OR expression so
    Catalyst extracts the common l_quantity/p_size bounds for pushdown
    and keeps the whole filter inside the joined codegen stage —
    never three unioned scans."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    bracket = (
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
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # global e4 price sum: thin BIGINT margin at SF 1e5 — wide
    # accumulator (r14 full-registry headroom ledger)
    return j.filter(bracket).agg(fsum(rev, 4, wide=True).alias("revenue"))


BRACKETED_REVENUE_SQL = f"""
SELECT {fsum_sql("l_extendedprice * (1 - l_discount)", 4, wide=True)}
  AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


def idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers above the average positive balance
    who never placed an urgent order (this corpus gives every customer
    SOME order, so the classic no-orders form would pass vacuously).
    The scalar threshold is computed EXACTLY in integer cents (sum,
    count) so the boundary comparison can never straddle a float ulp
    between engines; it rides in on a one-row broadcast cross join.
    The never-urgent test is a LEFT ANTI join against the
    priority-filtered orders subset (filter pushed below the join)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    thresh = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(cents).alias("total_cents"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.crossJoin(F.broadcast(thresh))  # one-row threshold frame
        .filter(cents * F.col("n_pos") > F.col("total_cents"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            fsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


IDLE_CUSTOMER_BALANCE_SQL = """
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(FLOOR((c_acctbal) * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 AS totacctbal
FROM customer
WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) *
      (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0) >
      (SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
       FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving MAX quarterly revenue
    — an argmax over an aggregate with ties preserved. The textbook
    form re-evaluates the revenue view inside a scalar subquery; here
    the aggregate computes once, its one-row MAX rides in on a
    broadcast cross join (never a whole-frame window, which would pull
    every group onto a single task), and the fact table is scanned and
    shuffled exactly once."""
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            # engine-proof contract (VERDICT r11 #2): the revenue is a
            # per-row floor-quantized e4 integer sum closed by one IEEE
            # division — the argmax EQUALITY below compares exact
            # integers-derived doubles, so ties can never flip on an
            # engine's ROUND-half rule or summation order.
            (
                F.sum(
                    fquant(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount")),
                        4,
                    )
                ).cast("double")
                / 10000.0
            ).alias("total_revenue")
        )
    )
    top = rev.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        rev.crossJoin(F.broadcast(top))  # one-row max frame
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


TOP_SUPPLIER_REVENUE_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000)
                       AS BIGINT)) AS DOUBLE) / 10000.0 AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (r8): revenue lost to returned items per
    customer in one quarter, top 20. One shuffle joins the
    date-pruned orders slice to the returnflag-pruned lineitem slice
    (both predicates push to the scans); customer and nation are
    broadcast dims; the top-20 is a TakeOrdered with an explicit
    c_custkey tiebreak so the selected SET is deterministic under
    revenue ties in both engines."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    ).select("o_orderkey", "o_custkey")
    l = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(
            # per-row floor quantization replaced the double->DECIMAL
            # casts: the cast tie rule is engine-specific (the r11
            # gapfill hash flip), IEEE multiply + floor is not
            fsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue")
        )
        .join(
            F.broadcast(customer),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


RETURNED_ITEM_REPORT_SQL = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000)
                     AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
       ROUND(c_acctbal, 2) AS acctbal, n_name AS nation
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (r8): the canonical single-scan filter-aggregate
    — every predicate (date range, discount band, quantity cap) pushes
    to the parquet scan, the whole plan is one WholeStageCodegen span
    with a map-side partial sum. The plan-shape canary for predicate
    pushdown regressions."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        fsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias(
            "revenue"
        )
    )


FORECAST_REVENUE_CHANGE_SQL = """
SELECT CAST(SUM(CAST(FLOOR((l_extendedprice * l_discount) * 10000)
                     AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


QUERIES = {
    "rollup_status_priority": rollup_status_priority,
    "cube_returnflag_linestatus": cube_returnflag_linestatus,
    "pivot_status_by_priority": pivot_status_by_priority,
    "set_ops_customers": set_ops_customers,
    "asof_prior_click": asof_prior_click,
    "sessionize_events": sessionize_events,
    "distinct_users_exact": distinct_users_exact,
    "approx_distinct_users": approx_distinct_users,
    "median_order_value": median_order_value,
    "customer_max_order": customer_max_order,
    "window_rank_orders": window_rank_orders,
    "monthly_revenue_trend": monthly_revenue_trend,
    "custdist_orders": custdist_orders,
    "revenue_moving_avg": revenue_moving_avg,
    "event_funnel": event_funnel,
    "range_join_bands": range_join_bands,
    "skew_safe_agg": skew_safe_agg,
    "sole_late_supplier": sole_late_supplier,
    "value_quantile_sketch": value_quantile_sketch,
    "events_ohlc_bars": events_ohlc_bars,
    "events_gapfill": events_gapfill,
    "important_part_value": important_part_value,
    "small_quantity_revenue": small_quantity_revenue,
    "large_volume_customers": large_volume_customers,
    "priority_delayed_orders": priority_delayed_orders,
    "nation_trade_volume": nation_trade_volume,
    "regional_market_share": regional_market_share,
    "bracketed_revenue": bracketed_revenue,
    "idle_customer_balance": idle_customer_balance,
    "top_supplier_revenue": top_supplier_revenue,
    "returned_item_report": returned_item_report,
    "forecast_revenue_change": forecast_revenue_change,
}

ORACLES = {
    "rollup_status_priority": ROLLUP_STATUS_PRIORITY_SQL,
    "cube_returnflag_linestatus": CUBE_RETURNFLAG_LINESTATUS_SQL,
    "pivot_status_by_priority": PIVOT_STATUS_BY_PRIORITY_SQL,
    "set_ops_customers": SET_OPS_CUSTOMERS_SQL,
    "asof_prior_click": ASOF_PRIOR_CLICK_SQL,
    "sessionize_events": SESSIONIZE_EVENTS_SQL,
    "distinct_users_exact": DISTINCT_USERS_EXACT_SQL,
    "approx_distinct_users": APPROX_DISTINCT_USERS_SQL,
    "median_order_value": MEDIAN_ORDER_VALUE_SQL,
    "customer_max_order": CUSTOMER_MAX_ORDER_SQL,
    "window_rank_orders": WINDOW_RANK_ORDERS_SQL,
    "monthly_revenue_trend": MONTHLY_REVENUE_TREND_SQL,
    "custdist_orders": CUSTDIST_ORDERS_SQL,
    "revenue_moving_avg": REVENUE_MOVING_AVG_SQL,
    "event_funnel": EVENT_FUNNEL_SQL,
    "range_join_bands": RANGE_JOIN_BANDS_SQL,
    "skew_safe_agg": SKEW_SAFE_AGG_SQL,
    "sole_late_supplier": SOLE_LATE_SUPPLIER_SQL,
    "value_quantile_sketch": VALUE_QUANTILE_SKETCH_SQL,
    "events_ohlc_bars": EVENTS_OHLC_BARS_SQL,
    "events_gapfill": EVENTS_GAPFILL_SQL,
    "important_part_value": IMPORTANT_PART_VALUE_SQL,
    "small_quantity_revenue": SMALL_QUANTITY_REVENUE_SQL,
    "large_volume_customers": LARGE_VOLUME_CUSTOMERS_SQL,
    "priority_delayed_orders": PRIORITY_DELAYED_ORDERS_SQL,
    "nation_trade_volume": NATION_TRADE_VOLUME_SQL,
    "regional_market_share": REGIONAL_MARKET_SHARE_SQL,
    "bracketed_revenue": BRACKETED_REVENUE_SQL,
    "idle_customer_balance": IDLE_CUSTOMER_BALANCE_SQL,
    "top_supplier_revenue": TOP_SUPPLIER_REVENUE_SQL,
    "returned_item_report": RETURNED_ITEM_REPORT_SQL,
    "forecast_revenue_change": FORECAST_REVENUE_CHANGE_SQL,
}
