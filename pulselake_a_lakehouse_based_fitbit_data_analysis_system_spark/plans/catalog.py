"""Query catalog: every implemented operator as a (Spark plan, DuckDB
oracle) pair.

Each entry maps a SURVEY §2 operator (or a scale-extension operator)
onto the driver's testdata tables. The Spark side composes the
``operators``/``functions``/``streaming`` modules; the oracle is ANSI
SQL DuckDB runs on the same parquet — the correctness gate. Column
names and rounding are aligned on both sides (the driver's comparison
hashes values after sorting columns by name).

Floating-point policy: any aggregate whose accumulation order could
differ between engines is ``round()``-ed identically on both sides
(2 decimals for money sums, 6 for ratios/averages/cosines).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.expressions import bucketize, validity_flag
from ..operators import agg, dedup, joins, merge, multimodal, neardup, similarity
from ..operators import text as text_ops
from ..operators import topk as topk_ops
from ..sources.tables import load_table
from ..streaming import ops as stream_ops

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None  # None → driver falls back to rows-only check
    doc: str
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, Query] = {}


def _register(
    name: str,
    oracle: str | None,
    doc: str,
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    def wrap(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = Query(name, fn, oracle, doc, bench, tags)
        return fn

    return wrap


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# =========================================================================
# §2.2/§2.4 — relational core
# =========================================================================

_PRICING_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                   AS sum_qty,
       round(sum(l_extendedprice), 2)                              AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
       round(avg(l_quantity), 6)                                   AS avg_qty,
       round(avg(l_extendedprice), 6)                              AS avg_price,
       round(avg(l_discount), 6)                                   AS avg_disc,
       count(*)                                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@_register(
    "pricing_summary",
    _PRICING_ORACLE,
    "TPC-H-Q1-shaped grouped aggregation (reference A1 shape): filter → "
    "8 aggregates over 2 grouping keys; partial agg + AQE-coalesced "
    "final agg, filter pushed to the parquet scan.",
    bench=True,
    tags=("agg", "filter"),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_SESSION_STATS_ORACLE = """
SELECT e.user_id,
       c.c_name                     AS user_name,
       c.c_mktsegment               AS segment,
       round(min(e.value), 2)       AS min_value,
       round(avg(e.value), 6)       AS avg_value,
       round(max(e.value), 2)       AS max_value,
       count(*)                     AS num_recordings
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY e.user_id, c.c_name, c.c_mktsegment
"""


@_register(
    "session_stats_dim",
    _SESSION_STATS_ORACLE,
    "The gold workout_bpm_summary shape (reference A1+J5, "
    "Gold/06-gold.py:93-96): per-entity min/avg/max/count + broadcast "
    "demographic dimension join. FLAGSHIP query.",
    bench=True,
    tags=("agg", "join", "flagship"),
)
def q_session_stats_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    customer = _t(spark, sf_dir, "customer")
    stats = events.groupBy("user_id").agg(
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.count(F.lit(1)).alias("num_recordings"),
    )
    dim = customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("user_name"),
        F.col("c_mktsegment").alias("segment"),
    )
    return joins.broadcast_dim_join(stats, dim, ["user_id"]).select(
        "user_id",
        "user_name",
        "segment",
        "min_value",
        "avg_value",
        "max_value",
        "num_recordings",
    )


_DIM_ENRICH_ORACLE = """
SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name AS nation, r.r_name AS region
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
"""


@_register(
    "dim_join_enrich",
    _DIM_ENRICH_ORACLE,
    "Snowflake dimension enrichment via chained broadcast equi-joins "
    "(reference J1/J2, Bronze/04-bronze.py:87-89) — both dims "
    "broadcast, zero shuffles of the fact side.",
    bench=True,
    tags=("join",),
)
def q_dim_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    enriched = joins.broadcast_dim_join(
        c, n, F.col("c_nationkey") == F.col("n_nationkey")
    )
    enriched = joins.broadcast_dim_join(
        enriched, r, F.col("n_regionkey") == F.col("r_regionkey")
    )
    return enriched.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        F.col("n_name").alias("nation"),
        F.col("r_name").alias("region"),
    )


_RANGE_JOIN_ORACLE = """
SELECT o.o_orderpriority,
       count(*)                                                         AS n_lines,
       round(avg(date_diff('day', CAST(o.o_orderdate AS DATE),
                           CAST(l.l_shipdate AS DATE))), 6)             AS avg_ship_days
FROM lineitem l JOIN orders o
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate BETWEEN o.o_orderdate AND o.o_orderdate + INTERVAL 90 DAY
GROUP BY o.o_orderpriority
"""


@_register(
    "range_join_report",
    _RANGE_JOIN_ORACLE,
    "BETWEEN range join + duration math — the gym_summary reporting "
    "view shape (reference J6, Setup/02-setup.py:250-254). Equi key "
    "carries the shuffle; the BETWEEN is a join filter.",
    bench=True,
    tags=("join", "range"),
)
def q_range_join_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    joined = joins.range_join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        o.withColumn("o_hi", F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
        ["o_orderkey"],
        point="l_shipdate",
        low="o_orderdate",
        high="o_hi",
    )
    return joined.groupBy(F.col("r.o_orderpriority").alias("o_orderpriority")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(
            F.avg(
                F.datediff(
                    F.to_date(F.col("l.l_shipdate")),
                    F.to_date(F.col("r.o_orderdate")),
                )
            ),
            6,
        ).alias("avg_ship_days"),
    )


_BUCKET_ORACLE = """
SELECT CASE WHEN c_acctbal < 0    THEN '<0'
            WHEN c_acctbal < 1000 THEN '0-1000'
            WHEN c_acctbal < 3000 THEN '1000-3000'
            WHEN c_acctbal < 5000 THEN '3000-5000'
            WHEN c_acctbal < 7000 THEN '5000-7000'
            WHEN c_acctbal < 9000 THEN '7000-9000'
            WHEN c_acctbal IS NOT NULL THEN '>=9000' END AS balance_bin,
       count(*)                 AS n_customers,
       round(avg(c_acctbal), 6) AS avg_balance
FROM customer
GROUP BY 1
"""


@_register(
    "bucketize_balance",
    _BUCKET_ORACLE,
    "Labeled bucketing via a when-chain Column factory — the "
    "reference's age_bins operator (P7, Silver/05-silver.py:291-304) "
    "generalized; stays in whole-stage codegen.",
    tags=("expr", "agg"),
)
def q_bucketize_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return (
        c.withColumn(
            "balance_bin",
            bucketize("c_acctbal", edges=[0, 1000, 3000, 5000, 7000, 9000]),
        )
        .groupBy("balance_bin")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_balance"),
        )
    )


_FILTER_ORACLE = """
SELECT event_id, user_id, event_type,
       value,
       CASE WHEN value <= 0 THEN false ELSE true END AS valid,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
FROM events
WHERE event_type IN ('click', 'view', 'purchase')
"""


@_register(
    "filter_project",
    _FILTER_ORACLE,
    "Set-membership filter + conditional validity flag + projection "
    "(reference P4/P5/P6, Silver/05-silver.py:30,271). Predicate and "
    "column pruning reach the parquet scan.",
    tags=("filter", "expr"),
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.filter(
        F.col("event_type").isin(["click", "view", "purchase"])
    ).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        validity_flag("value").alias("valid"),
        F.date_trunc("day", F.col("ts")).alias("day"),
    )


_JSON_ORACLE = """
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       count(*)             AS n,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1
"""


@_register(
    "json_extract",
    _JSON_ORACLE,
    "Late JSON parsing of a string payload column — the reference's "
    "multiplexed-bronze from_json pattern (Silver/05-silver.py:178).",
    bench=True,
    tags=("json",),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn(
            "k", F.get_json_object(F.col("props"), "$.k").cast("int")
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


_DATE_DIM_ORACLE = """
WITH dim AS (SELECT DISTINCT CAST(l_shipdate AS DATE) AS ship_date FROM lineitem)
SELECT year(d.ship_date)  AS ship_year,
       month(d.ship_date) AS ship_month,
       count(*)           AS n_lines,
       round(sum(l.l_quantity), 2) AS sum_qty
FROM lineitem l JOIN dim d ON CAST(l.l_shipdate AS DATE) = d.ship_date
GROUP BY 1, 2
"""


@_register(
    "derived_date_dim",
    _DATE_DIM_ORACLE,
    "Derived calendar dimension + broadcast enrichment at ingest — the "
    "reference's date_lookup week_part join (J1, "
    "Bronze/04-bronze.py:87-89), which feeds its partition pruning.",
    tags=("join", "dim"),
)
def q_derived_date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    dim = li.select(F.to_date("l_shipdate").alias("ship_date")).distinct()
    fact = li.withColumn("ship_date", F.to_date("l_shipdate"))
    return (
        joins.broadcast_dim_join(fact, dim, ["ship_date"])
        .groupBy(
            F.year("ship_date").alias("ship_year"),
            F.month("ship_date").alias("ship_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


# =========================================================================
# §2.3 — joins beyond equi
# =========================================================================

_INTERVAL_ORACLE = """
SELECT s.user_id,
       s.event_id AS start_id, e.event_id AS end_id,
       s.ts AS start_ts, e.ts AS end_ts
FROM (SELECT * FROM events WHERE event_type = 'signup')   s
JOIN (SELECT * FROM events WHERE event_type = 'purchase') e
  ON s.user_id = e.user_id
 AND e.ts > s.ts AND e.ts < s.ts + INTERVAL 3 HOUR
"""


@_register(
    "interval_pairing",
    _INTERVAL_ORACLE,
    "Start/stop interval self-join — the completed_workouts session "
    "reconstruction (J3, Silver/05-silver.py:368-400) in batch form; "
    "equi key shuffles, 3-hour cap bounds the match window (and the "
    "streaming form's state).",
    bench=True,
    tags=("join", "interval"),
)
def q_interval_pairing(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    starts = e.filter(F.col("event_type") == "signup")
    stops = e.filter(F.col("event_type") == "purchase")
    paired = joins.interval_join(
        starts, stops, ["user_id"], "ts", "ts", "interval 3 hours", closed="open"
    )
    return paired.select(
        F.col("s.user_id").alias("user_id"),
        F.col("s.event_id").alias("start_id"),
        F.col("e.event_id").alias("end_id"),
        F.col("s.ts").alias("start_ts"),
        F.col("e.ts").alias("end_ts"),
    )


_ASOF_ORACLE = """
SELECT purchase_id, purchase_ts, last_click_id, last_click_ts
FROM (
  SELECT p.event_id AS purchase_id, p.ts AS purchase_ts,
         s.event_id AS last_click_id, s.ts AS last_click_ts,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY s.ts DESC, s.event_id DESC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  JOIN (SELECT * FROM events WHERE event_type = 'click') s
    ON p.user_id = s.user_id
   AND s.ts <= p.ts AND s.ts > p.ts - INTERVAL 7 DAY
)
WHERE rn = 1
"""


@_register(
    "asof_attribution",
    _ASOF_ORACLE,
    "As-of join (nearest past click per purchase, 7-day tolerance) — "
    "composed from a bounded range join + row_number; the canonical "
    "time-series companion to the reference's interval joins.",
    tags=("join", "asof"),
)
def q_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("last_click_id"), F.col("ts").alias("last_click_ts")
    )
    matched = joins.as_of_join(
        purchases, clicks, ["user_id"], "purchase_ts", "last_click_ts",
        tolerance="interval 7 days", right_tiebreakers=["last_click_id"],
        left_keys=["purchase_id"],  # rank window shuffles only the key
    )
    return matched.select(
        "purchase_id", "purchase_ts", "last_click_id", "last_click_ts"
    )


_SEMI_ORACLE = """
SELECT c.* FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@_register(
    "semi_join_active",
    _SEMI_ORACLE,
    "Left-semi join (EXISTS) — exposed because the reference's "
    "insert-only MERGEs are semantically anti/semi joins (SURVEY §2.3).",
    tags=("join",),
)
def q_semi_join_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return joins.semi_join(c, o, ["c_custkey"])


_ANTI_ORACLE = """
SELECT c.* FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@_register(
    "anti_join_dormant",
    _ANTI_ORACLE,
    "Left-anti join (NOT EXISTS) — the dedup-against-target half of an "
    "insert-only MERGE (reference A4).",
    tags=("join",),
)
def q_anti_join_dormant(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return joins.anti_join(c, o, ["c_custkey"])


# =========================================================================
# §2.5 — dedup & windows
# =========================================================================

_CDC_LATEST_ORACLE = """
SELECT event_id, ts, user_id, event_type, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


@_register(
    "cdc_latest",
    _CDC_LATEST_ORACLE,
    "CDC latest-record selection — the reference's rank-newest-within-"
    "batch operator (W2, Silver/05-silver.py:24-32), with row_number + "
    "explicit tiebreak instead of tie-unsafe rank().",
    bench=True,
    tags=("window", "dedup"),
)
def q_cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return dedup.latest_by_key(
        e, ["user_id"], "ts", tiebreakers=["event_id"]
    ).select("event_id", "ts", "user_id", "event_type", "value")


_DEDUP_ORACLE = """
SELECT event_id, ts, user_id, event_type, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts ASC, event_id ASC) = 1
"""


@_register(
    "dedup_first_per_key",
    _DEDUP_ORACLE,
    "Deterministic exact dedup (one survivor per key by explicit total "
    "order) — the reproducible batch form of the reference's "
    "watermarked dropDuplicates (W1, Silver/05-silver.py:78-79).",
    tags=("dedup",),
)
def q_dedup_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return dedup.deterministic_dedup(
        e, ["user_id", "event_type"], tiebreaker=["ts", "event_id"]
    ).select("event_id", "ts", "user_id", "event_type", "value")


_WINDOW_ORACLE = """
SELECT event_id, user_id, ts, value,
       row_number() OVER w                    AS rn,
       lag(value)  OVER w                     AS prev_value,
       lead(value) OVER w                     AS next_value,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
                                              AS moving_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@_register(
    "window_analytics",
    _WINDOW_ORACLE,
    "Analytic window functions (lag/lead/row_number/moving frame) — "
    "beyond the reference's single rank() use (SURVEY §2.5 notes their "
    "absence); one shuffle on the partition key serves all four.",
    tags=("window",),
)
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-2, 0)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.row_number().over(w).alias("rn"),
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(F.avg("value").over(frame), 6).alias("moving_avg"),
    )


_SESSIONIZE_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
), numbered AS (
  SELECT user_id, ts,
         -- CAST: DuckDB's windowed sum() yields HUGEINT; Spark emits bigint.
         -- The driver's value-hash is type-sensitive, so align the types.
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_no
  FROM flagged
)
SELECT user_id, session_no,
       min(ts)  AS session_start,
       max(ts)  AS session_end,
       count(*) AS n_events
FROM numbered
GROUP BY user_id, session_no
"""


@_register(
    "sessionize_gaps",
    _SESSIONIZE_ORACLE,
    "Gap-based sessionization (lag + running sum islands) — the batch "
    "analog of session_window; the reference instead declares sessions "
    "via start/stop events (SURVEY §2.7 note).",
    bench=True,
    tags=("window", "session"),
)
def q_sessionize_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return agg.sessionize(
        e.select("user_id", "ts"), ["user_id"], "ts", gap="interval 30 minutes"
    ).select("user_id", "session_no", "session_start", "session_end", "n_events")


# =========================================================================
# §2.4/§2.6 — rollups, top-k, sorts, set ops
# =========================================================================

_ROLLUP_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       count(*)                  AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@_register(
    "rollup_orders",
    _ROLLUP_ORACLE,
    "GROUP BY ROLLUP — the dashboards' by-X-by-Y subtotal slices "
    "(SURVEY §2.4 note) in one shuffle instead of N groupBys.",
    tags=("agg", "rollup"),
)
def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return agg.rollup_stats(
        o,
        ["o_orderstatus", "o_orderpriority"],
        [
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        ],
    )


_PIVOT_ORACLE = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')    AS click,
       count(*) FILTER (WHERE event_type = 'view')     AS view,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS signup,
       count(*) FILTER (WHERE event_type = 'error')    AS error
FROM events
GROUP BY user_id
"""


@_register(
    "pivot_event_matrix",
    _PIVOT_ORACLE,
    "Pivot (long→wide counts matrix) with a declared value list so the "
    "output schema is static — the scalable form (no extra pass to "
    "discover values).",
    tags=("agg", "pivot"),
)
def q_pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    pivoted = (
        e.groupBy("user_id").pivot("event_type", kinds).agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    )


_TOPK_ORACLE = """
SELECT o_custkey AS custkey, round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY o_custkey
ORDER BY revenue DESC, custkey ASC
LIMIT 10
"""


@_register(
    "topk_revenue",
    _TOPK_ORACLE,
    "Global top-k (reference O3 ranked dashboards) — planned as "
    "TakeOrderedAndProject: per-partition heaps, no global sort.",
    bench=True,
    tags=("topk",),
)
def q_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    rev = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    return topk_ops.global_topk(
        rev, [F.col("revenue").desc(), F.col("custkey").asc()], 10
    )


_TOPK_GROUP_ORACLE = """
SELECT *
FROM (
  SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey ASC)
           AS rank_in_group
  FROM customer
)
WHERE rank_in_group <= 3
"""


@_register(
    "topk_per_segment",
    _TOPK_GROUP_ORACLE,
    "Top-k per group via ranking window — one shuffle on the group key.",
    tags=("topk", "window"),
)
def q_topk_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return topk_ops.topk_per_group(
        c.select("c_mktsegment", "c_custkey", "c_name", "c_acctbal"),
        ["c_mktsegment"],
        [F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        3,
    )


_SETOPS_ORACLE = """
SELECT user_id FROM events WHERE event_type = 'purchase'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error'
"""


@_register(
    "set_ops_loyal",
    _SETOPS_ORACLE,
    "Set difference (EXCEPT) — purchasers who never errored; the "
    "reference's multiplex design avoids set ops (SURVEY §2.6), the "
    "engine exposes them.",
    tags=("setops",),
)
def q_set_ops_loyal(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    purchasers = e.filter(F.col("event_type") == "purchase").select("user_id")
    errorers = e.filter(F.col("event_type") == "error").select("user_id")
    # subtract == EXCEPT (set semantics); exceptAll would keep
    # duplicate purchasers that also errored
    return purchasers.subtract(errorers)


_PERCENTILE_ORACLE = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6)  AS p50,
       round(quantile_cont(value, 0.9), 6)  AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
"""


@_register(
    "percentiles_by_type",
    _PERCENTILE_ORACLE,
    "Exact interpolated percentiles per group; at 100 TB swap in "
    "approx_percentile (t-digest) — kept exact here so the oracle "
    "matches bit-for-bit.",
    tags=("agg", "percentile"),
)
def q_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 6).alias("p50"),
        F.round(F.percentile("value", 0.9), 6).alias("p90"),
        F.round(F.percentile("value", 0.99), 6).alias("p99"),
    )


_HOURLY_ORACLE = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*)             AS n,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


@_register(
    "hourly_rollup",
    _HOURLY_ORACLE,
    "Event-time tumbling aggregation (batch form of the streaming "
    "windowed agg); time-bucketed keys keep the shuffle uniform.",
    bench=True,
    tags=("agg", "time"),
)
def q_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# =========================================================================
# §2.8 — merge/upsert semantics (pure-DataFrame forms)
# =========================================================================

_CUTOFF = "2024-01-15"

_MERGE_KEY_CTES = f"""
WITH tgt AS (
  SELECT user_id, event_type, event_id, ts, value FROM events
  WHERE ts < TIMESTAMP '{_CUTOFF}'
  QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                             ORDER BY ts DESC, event_id DESC) = 1
), src AS (
  SELECT user_id, event_type, event_id, ts, value FROM events
  WHERE ts >= TIMESTAMP '{_CUTOFF}'
  QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                             ORDER BY ts DESC, event_id DESC) = 1
)
"""


def _merge_tgt_src(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    tgt = dedup.latest_by_key(
        e.filter(F.col("ts") < cutoff), ["user_id", "event_type"], "ts", ["event_id"]
    )
    src = dedup.latest_by_key(
        e.filter(F.col("ts") >= cutoff), ["user_id", "event_type"], "ts", ["event_id"]
    )
    return tgt, src


_MERGE_INSERT_ORACLE = (
    _MERGE_KEY_CTES
    + """
SELECT * FROM tgt
UNION ALL
SELECT s.* FROM src s ANTI JOIN tgt t USING (user_id, event_type)
"""
)


@_register(
    "merge_insert_only",
    _MERGE_INSERT_ORACLE,
    "Insert-only MERGE (reference A4/A7/A8/A10/A11, "
    "Silver/05-silver.py:50-55): new keys append, existing keys are "
    "immutable. One anti join — no target rewrite under Delta.",
    tags=("merge",),
)
def q_merge_insert_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    tgt, src = _merge_tgt_src(spark, sf_dir)
    return merge.merge_insert_only(tgt, src, ["user_id", "event_type"])


_MERGE_SCD1_ORACLE = (
    _MERGE_KEY_CTES
    + """
, unioned AS (
  SELECT *, 1 AS pri FROM tgt
  UNION ALL
  SELECT *, 0 AS pri FROM src
)
SELECT user_id, event_type, event_id, ts, value
FROM unioned
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, pri DESC) = 1
"""
)


@_register(
    "merge_scd1",
    _MERGE_SCD1_ORACLE,
    "SCD-1 CDC MERGE (reference A6, Silver/05-silver.py:159-167): "
    "strictly-newer source wins, target wins timestamp ties — "
    "implemented as union + one ranking window, no join.",
    tags=("merge",),
)
def q_merge_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    tgt, src = _merge_tgt_src(spark, sf_dir)
    return merge.merge_scd1(tgt, src, ["user_id", "event_type"], order_col="ts")


_MERGE_COND_ORACLE = (
    _MERGE_KEY_CTES
    + """
, upd AS (
  SELECT a.user_id, a.event_type, a.event_id, a.ts,
         CASE WHEN b.user_id IS NOT NULL AND b.value > a.value
              THEN b.value ELSE a.value END AS value
  FROM tgt a LEFT JOIN src b USING (user_id, event_type)
)
SELECT * FROM upd
UNION ALL
SELECT s.* FROM src s ANTI JOIN tgt t USING (user_id, event_type)
"""
)


@_register(
    "merge_conditional_update",
    _MERGE_COND_ORACLE,
    "Conditional-update MERGE — the gym_logs late-logout correction "
    "(A5, Silver/05-silver.py:108-115): update only when the source "
    "strictly improves the target (here: larger value).",
    tags=("merge",),
)
def q_merge_conditional_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    tgt, src = _merge_tgt_src(spark, sf_dir)
    return merge.merge_conditional_update(
        tgt,
        src,
        ["user_id", "event_type"],
        update_condition=lambda a, b: F.col("b.value") > F.col("a.value"),
        update_cols=["value"],
    )


# part 2 (text/neardup/similarity/multimodal/streaming) registers itself
from . import catalog_ext  # noqa: E402,F401
from . import catalog_joins  # noqa: E402,F401
