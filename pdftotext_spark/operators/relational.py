"""DataFrame-level relational operators — the [DF]-tagged SURVEY.md §2
inventory re-expressed as Catalyst-optimizable plans, each with a
DuckDB oracle (driver contract).

Scale notes per operator are in the docstrings; common themes:
aggregations are partial (map-side combine) by construction, joins
broadcast the small side explicitly, windows carry explicit orderBy
keys with unique tie-breakers so results are deterministic at any
parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# --------------------------------------------------------------- assembly


def turn_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable-order text reassembly (the north_rule window invariant,
    SURVEY.md §1.2) on the `documents` stand-in: groupBy +
    array_sort(collect_list(struct)) keeps the aggregation partial and
    avoids a whole-partition sort. One shuffle on the group key."""
    docs = _read(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                lambda s: s.text,
            ),
            "\n",
        ).alias("assembled_text"),
        F.count("*").cast("long").alias("n_docs"),
    )


TURN_REASSEMBLY_SQL = """
SELECT lang,
       string_agg(text, chr(10) ORDER BY doc_id) AS assembled_text,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY lang
"""


# -------------------------------------------------------------- sessionize


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (L3's session-grouping analog,
    PdfToText.php:5198–5224): lag + cumulative sum of gap flags.
    Unique (ts, event_id) ordering keys make the window deterministic
    under any partitioning."""
    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = events.withColumn(
        "new_sess", F.when(gap > 3600, F.lit(1)).otherwise(F.lit(0))
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
    )


SESSIONIZE_SQL = """
WITH flagged AS (
  -- floor(epoch()) mirrors Spark's second-truncating unix_timestamp,
  -- so sub-second components cannot flip boundary gaps
  SELECT user_id, ts, event_id,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                   - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) > 3600
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id, ts,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS start_ts, MAX(ts) AS end_ts
FROM sess GROUP BY user_id, session_id
"""


# ---------------------------------------------- containment capture (L5)


def containment_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial-containment filter + bbox aggregation (L5,
    PdfToText.php:11070–11123) on lineitem's numeric 'box': the filter
    pushes to the parquet scan (PushedFilters), the agg is partial."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 40)
            & (F.col("l_extendedprice") >= 1000)
            & (F.col("l_extendedprice") <= 50000)
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        )
    )


CONTAINMENT_CAPTURE_SQL = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 40
  AND l_extendedprice BETWEEN 1000 AND 50000
GROUP BY l_returnflag
"""


# -------------------------------------------------- search offsets (X6)


def search_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring search with offset attribution (X6,
    PdfToText.php:2217–2435): first occurrence position per document."""
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.locate("data", F.col("text")).cast("long").alias("first_pos")
        )
        .filter(F.col("first_pos") > 0)
    )


SEARCH_OFFSETS_SQL = """
SELECT doc_id, CAST(strpos(text, 'data') AS BIGINT) AS first_pos
FROM documents WHERE strpos(text, 'data') > 0
"""


# ------------------------------------------------- regex replace (X2)


def regex_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """De-hyphenation-style regexp_replace (X2, PdfToText.php:1313–1320)
    generalized to a normalization fingerprint so the oracle compares
    transformed values, not pass-throughs."""
    docs = _read(spark, sf_dir, "documents")
    cleaned = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "")
    dehyph = F.regexp_replace(cleaned, "([a-z])- ([a-z])", "$1$2")
    return docs.select("doc_id", F.md5(dehyph).alias("norm_md5"))


REGEX_NORMALIZE_SQL = r"""
SELECT doc_id,
       md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                          '([a-z])- ([a-z])', '\1\2', 'g')) AS norm_md5
FROM documents
"""


# ---------------------------------------------- page selection / top-N


def topn_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-N selection per group (P11 page-selection analog,
    PdfToText.php:5844–5854): rank with unique tie-breaker."""
    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn")
    )


TOPN_PER_KEY_SQL = """
SELECT user_id, event_id, rn FROM (
  SELECT user_id, event_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn
  FROM events
) WHERE rn <= 3
"""


# ----------------------------------------------------- classic OLAP aggs


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: partial aggregation, decimal
    sums for engine-exact parity, filter pushed to scan."""
    li = _read(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            # keep full product scale (exact decimal arithmetic) so the
            # oracle needs no rounding-mode assumptions
            F.sum(price * (F.lit(1).cast("decimal(18,4)") - disc)).cast("double").alias("sum_disc_price"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension join + rollup with an explicit broadcast of the small
    side (customer ≪ orders at scale; at 100 TB the orders side
    shuffles nothing for this join)."""
    orders = _read(spark, sf_dir, "orders")
    customer = _read(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
            F.count("*").cast("long").alias("n_orders"),
        )
    )


SEGMENT_REVENUE_SQL = """
SELECT c_mktsegment,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed rollup (date_trunc + partial agg): the monitoring
    query shape for the streaming pipeline's batch equivalent."""
    events = _read(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
    )


DAILY_ACTIVITY_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY date_trunc('day', ts), event_type
"""


def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (two-phase shuffle in Spark)."""
    events = _read(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count("*").cast("long").alias("n_events"),
    )


DISTINCT_USERS_BY_TYPE_SQL = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
"""


def rolling_value_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range rolling window: per event, the user's value total
    over the trailing 7 days (RANGE frame on epoch seconds — the
    time-series primitive). Decimal accumulation keeps the window sum
    engine-exact."""
    events = _read(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-7 * 86400, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("rolling_7d_value"),
    )


ROLLING_VALUE_7D_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
            PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
            RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS rolling_7d_value
FROM events
"""


def vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-token ratio per document (a lexical-diversity quality
    feature): explode → distinct → count, all built-ins."""
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    per_doc = toks.groupBy("doc_id").agg(
        F.countDistinct("tok").cast("long").alias("n_distinct"),
        F.count("*").cast("long").alias("n_tokens"),
    )
    return per_doc.select(
        "doc_id",
        "n_distinct",
        "n_tokens",
        F.round(F.col("n_distinct") / F.col("n_tokens"), 4).alias("richness"),
    )


VOCAB_RICHNESS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
)
SELECT doc_id,
       CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(COUNT(DISTINCT tok) * 1.0 / COUNT(*), 4) AS richness
FROM toks WHERE tok <> '' GROUP BY doc_id
"""


def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: extract a JSON field from the
    events ``props`` string (get_json_object — JVM-side, no UDF) and
    aggregate it. The per-row JSON parse is the pattern for metadata
    blobs riding along a 100 TB table."""
    events = _read(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
            F.count("k").cast("long").alias("n_with_k"),
        )
    )


JSON_PROPS_STATS_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       CAST(COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS n_with_k
FROM events GROUP BY event_type
"""


def cumulative_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per ordered group — the window shape behind
    page-offset bookkeeping (X3) and incremental corpus accounting."""
    docs = _read(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return docs.select(
        "doc_id",
        "lang",
        F.sum(F.length("text")).over(w).cast("long").alias("cum_chars"),
    )


CUMULATIVE_CHARS_SQL = """
SELECT doc_id, lang,
       CAST(SUM(length(text)) OVER (PARTITION BY lang ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_chars
FROM documents
"""


def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped multi-join across the star schema
    (orders ⋈ customer ⋈ nation ⋈ region): every dimension broadcasts,
    so the fact side never shuffles for the joins — the canonical
    snowflake rollup at scale."""
    orders = _read(spark, sf_dir, "orders")
    customer = _read(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = _read(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
            F.count("*").cast("long").alias("n_orders"),
        )
    )


REGIONAL_REVENUE_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension profiling over part + supplier balance stats — covers
    the remaining star-schema tables."""
    part = _read(spark, sf_dir, "part")
    supplier = _read(spark, sf_dir, "supplier")
    brands = part.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
        F.max("p_size").cast("int").alias("max_size"),
    )
    supp = supplier.agg(
        F.count("*").cast("long").alias("n_suppliers"),
        F.round(F.avg("s_acctbal"), 2).alias("avg_balance"),
    )
    return brands.crossJoin(F.broadcast(supp))


PARTS_BY_BRAND_SQL = """
WITH supp AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         ROUND(AVG(s_acctbal), 2) AS avg_balance
  FROM supplier
)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(AVG(p_retailprice), 2) AS avg_price,
       CAST(MAX(p_size) AS INT) AS max_size,
       supp.n_suppliers, supp.avg_balance
FROM part, supp
GROUP BY p_brand, supp.n_suppliers, supp.avg_balance
"""


def fragment_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-key fragment sort (L2, PdfToText.php:5174–5185) as a
    deterministic top-k: Spark plans this as TakeOrderedAndProject —
    no global sort materialization."""
    events = _read(spark, sf_dir, "events")
    return (
        events.orderBy(F.desc("value"), F.asc("event_id"))
        .select("event_id", "user_id", "value")
        .limit(100)
    )


FRAGMENT_SORT_TOPK_SQL = """
SELECT event_id, user_id, value
FROM events ORDER BY value DESC, event_id ASC LIMIT 100
"""


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention matrix: users grouped by their first
    active day, distinct-user counts per (cohort_day, day_offset) —
    the activation dashboard every event pipeline carries.

    100 TB shape: one groupBy(user) for first-day (map-side partial
    min), joined back onto the events scan — the per-user dimension
    scales with the key universe, so the join strategy is left to AQE
    (broadcast while it fits, shuffle-hash beyond) rather than forced.
    No self-join, no window over the raw event stream."""
    events = _read(spark, sf_dir, "events")
    first_day = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    return (
        events.join(first_day, "user_id")
        .groupBy(
            F.col("cohort_day"),
            F.datediff(F.to_date("ts"), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


RETENTION_COHORTS_SQL = """
WITH first_day AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
)
SELECT f.cohort_day,
       CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS BIGINT) AS day_offset,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN first_day f USING (user_id)
GROUP BY f.cohort_day, date_diff('day', f.cohort_day, CAST(e.ts AS DATE))
"""


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel: of users whose first 'view' happened on day D,
    how many purchased within 7 days — per-cohort conversion rates,
    the canonical event-funnel rollup.

    Shape: the first-view dimension is one partial-agg groupBy (one
    row per viewing user — scales with the key universe, so AQE picks
    broadcast vs shuffle), purchases probe it with a range predicate,
    and the final rollup is a grouped count — no self-join over the
    raw stream."""
    events = _read(spark, sf_dir, "events")
    first_view = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    converted = (
        purchases.join(first_view, "user_id")
        .filter(
            (F.col("p_ts") >= F.col("view_ts"))
            & (F.col("p_ts") <= F.col("view_ts") + F.expr("INTERVAL 7 DAYS"))
        )
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    return (
        first_view.join(converted, "user_id", "left")
        .groupBy(F.to_date("view_ts").alias("view_day"))
        .agg(
            F.count("*").cast("long").alias("n_viewers"),
            F.sum(F.coalesce(F.col("converted"), F.lit(0)))
            .cast("long")
            .alias("n_converted"),
        )
        .withColumn(
            "conversion_rate",
            F.round(F.col("n_converted") / F.col("n_viewers"), 4).cast("double"),
        )
    )


FUNNEL_CONVERSION_SQL = """
WITH first_view AS (
  SELECT user_id, MIN(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
converted AS (
  SELECT DISTINCT p.user_id
  FROM events p JOIN first_view f USING (user_id)
  WHERE p.event_type = 'purchase'
    AND p.ts >= f.view_ts AND p.ts <= f.view_ts + INTERVAL 7 DAY
)
SELECT CAST(f.view_ts AS DATE) AS view_day,
       CAST(COUNT(*) AS BIGINT) AS n_viewers,
       CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
       CAST(ROUND(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS DOUBLE) AS conversion_rate
FROM first_view f LEFT JOIN converted c USING (user_id)
GROUP BY CAST(f.view_ts AS DATE)
"""


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def cube_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE rollup over (day, event_type): every subtotal combination
    plus the grand total in ONE pass — the OLAP dashboard query shape
    (Spark expands the cube through a single Expand+partial-agg plan,
    no per-grouping rescans). ``gid`` is the standard SQL grouping id
    (day = MSB), identical bit layout in both engines. Sums go through
    decimal(18,4) so addition order cannot perturb the double."""
    events = _read(spark, sf_dir, "events")
    base = events.select(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        "event_type",
        "value",
    )
    return base.cube("day", "event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_value"),
        F.grouping_id().cast("long").alias("gid"),
    )


CUBE_ACTIVITY_SQL = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
       CAST(GROUPING(CAST(date_trunc('day', ts) AS DATE), event_type) AS BIGINT) AS gid
FROM events
GROUP BY CUBE (CAST(date_trunc('day', ts) AS DATE), event_type)
"""


def pivot_daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts pivoted to one column per event type — the
    wide-format export shape. The value list is EXPLICIT
    (``EVENT_TYPES``): at 100 TB an implicit pivot means an extra
    distinct-values job over the full table before the real agg."""
    events = _read(spark, sf_dir, "events")
    base = events.select(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        "event_type",
    )
    out = (
        base.groupBy("day")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))  # count("*") is rejected inside pivot
        .na.fill(0)
    )
    return out.select(
        "day", *[F.col(t).cast("long").alias(t) for t in EVENT_TYPES]
    )


PIVOT_DAILY_BY_TYPE_SQL = f"""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       {", ".join(
           f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}"
           for t in EVENT_TYPES
       )}
FROM events GROUP BY CAST(date_trunc('day', ts) AS DATE)
"""
