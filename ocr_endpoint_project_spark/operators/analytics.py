"""Relational analytics operators (SURVEY.md §2.4 aggregations, §2.5
windows/rankings, §2.6 joins) expressed over the driver tables.

The reference's results analytics run over its append-only runs table
(``ocr_test_results``); here the ``events`` table plays that role —
``user_id`` = document, ``event_type`` = model/variant, ``value`` =
metric, ``ts`` = run_at, ``event_type='error'`` = error rows. TPC-H-ish
tables exercise the join/aggregate layer at scale. Every query is pure
Catalyst (codegen'd) with a DuckDB oracle; all are shuffle-minimal:
single hash-aggregate or window per query, broadcast joins for dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._io import read_spread
from ..functions.text import cents, r4


def _sum_cents(col="value"):
    # exact-sum discipline (functions/text.py): integer-valued terms make
    # the aggregate order-independent, hence identical across engines
    return F.sum(cents(F.col(col)))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_spread(spark, f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# A1: per-model summary (pages/parallel_ocr_test.py:220-228 semantics:
# groupby(model).agg(mean(metric), ..., sum(cost), count) with round(2))
# ---------------------------------------------------------------------------

def q_per_model_summary(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(_sum_cents().alias("sc"), F.count(F.lit(1)).alias("n_runs"))
        .select(
            "event_type",
            r4(F.col("sc") / (100.0 * F.col("n_runs"))).alias("avg_value"),
            r4(F.col("sc") / 100.0).alias("sum_value"),
            "n_runs",
        )
    )


SQL_PER_MODEL = """
SELECT event_type,
       floor((sc / (100.0 * n_runs)) * 10000 + 0.5) / 10000 AS avg_value,
       floor((sc / 100.0) * 10000 + 0.5) / 10000 AS sum_value,
       n_runs
FROM (SELECT event_type, sum(floor(value * 100 + 0.5)) AS sc, count(*) AS n_runs
      FROM events GROUP BY event_type)
"""


# ---------------------------------------------------------------------------
# A4: error-mask filtered aggregation (pages/parallel_ocr_test.py:216:
# aggregate only rows whose error is null/blank)
# ---------------------------------------------------------------------------

def q_error_mask_agg(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type") != "error")
        .groupBy("user_id")
        .agg(_sum_cents().alias("sc"), F.count(F.lit(1)).alias("n_ok_runs"))
        .select(
            "user_id",
            r4(F.col("sc") / (100.0 * F.col("n_ok_runs"))).alias("avg_value"),
            "n_ok_runs",
        )
    )


SQL_ERROR_MASK = """
SELECT user_id, floor((sc / (100.0 * n_ok_runs)) * 10000 + 0.5) / 10000 AS avg_value, n_ok_runs
FROM (SELECT user_id, sum(floor(value * 100 + 0.5)) AS sc, count(*) AS n_ok_runs
      FROM events WHERE event_type != 'error' GROUP BY user_id)
"""


# ---------------------------------------------------------------------------
# A3: two-key grouped means (pages/parallel_ocr_test.py:286-296:
# groupby([layout_type, model]).mean(metric) for charts)
# ---------------------------------------------------------------------------

def q_two_key_means(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy((F.col("user_id") % 10).alias("user_bucket"), F.col("event_type"))
        .agg(_sum_cents().alias("sc"), F.count(F.lit(1)).alias("n"))
        .select(
            "user_bucket",
            "event_type",
            r4(F.col("sc") / (100.0 * F.col("n"))).alias("avg_value"),
        )
    )


SQL_TWO_KEY = """
SELECT user_bucket, event_type, floor((sc / (100.0 * n)) * 10000 + 0.5) / 10000 AS avg_value
FROM (SELECT user_id % 10 AS user_bucket, event_type,
             sum(floor(value * 100 + 0.5)) AS sc, count(*) AS n
      FROM events GROUP BY 1, 2)
"""


# ---------------------------------------------------------------------------
# A5: success rate per model (scripts/generate_decision_report.py:127-137)
# ---------------------------------------------------------------------------

def q_success_rate(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("errors"),
        )
        .select(
            "user_id",
            "total",
            "errors",
            r4((F.col("total") - F.col("errors")) / F.col("total") * 100.0).alias(
                "success_rate_pct"
            ),
        )
    )


SQL_SUCCESS_RATE = """
SELECT user_id, total, errors,
       floor(((total - errors) / total * 100.0) * 10000 + 0.5) / 10000 AS success_rate_pct
FROM (
  SELECT user_id, count(*) AS total,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
  FROM events GROUP BY user_id
)
"""


# ---------------------------------------------------------------------------
# A6: runs-per-doc density describe (scripts/generate_decision_report.py:443-447)
# ---------------------------------------------------------------------------

def q_runs_per_doc(spark, sf_dir):
    per_doc = _events(spark, sf_dir).groupBy("user_id").count()
    return per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("count").alias("min_runs"),
        F.max("count").alias("max_runs"),
        r4(F.avg("count")).alias("avg_runs"),
    )


SQL_RUNS_PER_DOC = """
SELECT count(*) AS n_docs, min(c) AS min_runs, max(c) AS max_runs,
       floor((avg(c)) * 10000 + 0.5) / 10000 AS avg_runs
FROM (SELECT user_id, count(*) AS c FROM events GROUP BY user_id)
"""


# ---------------------------------------------------------------------------
# A7: error categorization + counts (scripts/generate_decision_report.py:79-89)
# ---------------------------------------------------------------------------

def q_error_categories(spark, sf_dir):
    cat = (
        F.when(F.col("value") < 10.0, F.lit("timeout"))
        .when(F.col("value") < 50.0, F.lit("invalid_json"))
        .otherwise(F.lit("other"))
    )
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .groupBy(cat.alias("error_category"))
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )


SQL_ERROR_CATS = """
SELECT CASE WHEN value < 10.0 THEN 'timeout'
            WHEN value < 50.0 THEN 'invalid_json'
            ELSE 'other' END AS error_category,
       count(*) AS n_errors
FROM events WHERE event_type = 'error' GROUP BY 1
"""


# ---------------------------------------------------------------------------
# W1: latest snapshot — newest run per (doc, model)
# (scripts/export_benchmark_results.py:47-56)
# ---------------------------------------------------------------------------

def q_latest_snapshot(spark, sf_dir):
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        _events(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", r4(F.col("value")).alias("value"))
    )


SQL_LATEST_SNAPSHOT = """
SELECT user_id, event_type, event_id, floor((value) * 10000 + 0.5) / 10000 AS value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# W3: best-model top-1 by multi-key sort (pages/results_summary.py:74-81)
# — deterministic tie-breaks; TakeOrderedAndProject physical op
# ---------------------------------------------------------------------------

def q_top1_per_model(spark, sf_dir):
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        _events(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "event_id", r4(F.col("value")).alias("best_value"))
    )


SQL_TOP1 = """
SELECT event_type, event_id, floor((value) * 10000 + 0.5) / 10000 AS best_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY value DESC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# W4: pivot + per-doc delta + head-to-head wins
# (scripts/generate_decision_report.py:303-315,453-479)
# ---------------------------------------------------------------------------

def q_pivot_delta(spark, sf_dir):
    pv = (
        _events(spark, sf_dir)
        .filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id")
        .pivot("event_type", ["click", "view"])
        .agg(
            F.sum(cents(F.col("value"))).alias("sc"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    click = F.col("click_sc") / (100.0 * F.col("click_n"))
    view = F.col("view_sc") / (100.0 * F.col("view_n"))
    return pv.select(
        "user_id",
        r4(click).alias("click_avg"),
        r4(view).alias("view_avg"),
        r4(click - view).alias("delta"),
    )


SQL_PIVOT_DELTA = """
SELECT user_id,
       floor((csc / (100.0 * cn)) * 10000 + 0.5) / 10000 AS click_avg,
       floor((vsc / (100.0 * vn)) * 10000 + 0.5) / 10000 AS view_avg,
       floor((csc / (100.0 * cn) - vsc / (100.0 * vn)) * 10000 + 0.5) / 10000 AS delta
FROM (
  SELECT user_id,
         sum(floor(value * 100 + 0.5)) FILTER (event_type = 'click') AS csc,
         count(*) FILTER (event_type = 'click') AS cn,
         sum(floor(value * 100 + 0.5)) FILTER (event_type = 'view') AS vsc,
         count(*) FILTER (event_type = 'view') AS vn
  FROM events WHERE event_type IN ('click', 'view') GROUP BY user_id
)
"""


def q_head_to_head(spark, sf_dir):
    pv = (
        _events(spark, sf_dir)
        .filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id")
        .pivot("event_type", ["click", "view"])
        .agg(
            F.sum(cents(F.col("value")).cast("long")).alias("sc"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("click_sc").isNotNull() & F.col("view_sc").isNotNull())
    )
    # compare averages by integer cross-multiplication: csc/cn > vsc/vn
    # <=> csc*vn > vsc*cn — exact in int64, engine-independent
    c_gt = F.col("click_sc") * F.col("view_n") > F.col("view_sc") * F.col("click_n")
    v_gt = F.col("view_sc") * F.col("click_n") > F.col("click_sc") * F.col("view_n")
    return pv.agg(
        F.sum(F.when(c_gt, 1).otherwise(0)).alias("click_wins"),
        F.sum(F.when(v_gt, 1).otherwise(0)).alias("view_wins"),
        F.count(F.lit(1)).alias("n_docs"),
    )


SQL_HEAD_TO_HEAD = """
SELECT CAST(sum(CASE WHEN csc * vn > vsc * cn THEN 1 ELSE 0 END) AS BIGINT) AS click_wins,
       CAST(sum(CASE WHEN vsc * cn > csc * vn THEN 1 ELSE 0 END) AS BIGINT) AS view_wins,
       count(*) AS n_docs
FROM (
  SELECT user_id,
         CAST(sum(floor(value * 100 + 0.5)) FILTER (event_type = 'click') AS BIGINT) AS csc,
         count(*) FILTER (event_type = 'click') AS cn,
         CAST(sum(floor(value * 100 + 0.5)) FILTER (event_type = 'view') AS BIGINT) AS vsc,
         count(*) FILTER (event_type = 'view') AS vn
  FROM events WHERE event_type IN ('click', 'view') GROUP BY user_id
) WHERE csc IS NOT NULL AND vsc IS NOT NULL
"""


# ---------------------------------------------------------------------------
# W5+W6: min-max normalization + weighted decision score
# (scripts/generate_decision_report.py:70-76,158-200)
# ---------------------------------------------------------------------------

def q_weighted_score(spark, sf_dir):
    per_model = (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(_sum_cents().alias("sc"), F.count(F.lit(1)).alias("cnt"))
        .select(
            "event_type",
            (F.col("sc") / (100.0 * F.col("cnt"))).alias("avg_value"),
            F.col("cnt").cast("double").alias("n"),
        )
    )
    w = Window.partitionBy()  # whole-frame min/max (k rows — cheap)

    def norm(c):  # (x - min)/(max - min), 1.0 when constant
        mn, mx = F.min(c).over(w), F.max(c).over(w)
        return F.when(mx == mn, F.lit(1.0)).otherwise((c - mn) / (mx - mn))

    scored = per_model.select(
        "event_type",
        norm(F.col("avg_value")).alias("s_value_raw"),
        norm(F.col("n")).alias("s_volume_raw"),
    )
    # round only the OUTPUTS — rounding intermediates creates exact-.5
    # boundary cases where engines' rounding modes diverge
    return scored.select(
        "event_type",
        r4(F.col("s_value_raw")).alias("s_value"),
        r4(F.col("s_volume_raw")).alias("s_volume"),
        r4(F.col("s_value_raw") * 0.7 + F.col("s_volume_raw") * 0.3).alias(
            "weighted_score"
        ),
    )


SQL_WEIGHTED = """
WITH per_model AS (
  SELECT event_type, sc / (100.0 * cnt) AS avg_value, CAST(cnt AS DOUBLE) AS n
  FROM (SELECT event_type, sum(floor(value * 100 + 0.5)) AS sc, count(*) AS cnt
        FROM events GROUP BY event_type)
), norm AS (
  SELECT event_type,
         CAST(CASE WHEN max(avg_value) OVER () = min(avg_value) OVER () THEN 1.0
              ELSE (avg_value - min(avg_value) OVER ())
                   / (max(avg_value) OVER () - min(avg_value) OVER ()) END AS DOUBLE) AS s_value_raw,
         CAST(CASE WHEN max(n) OVER () = min(n) OVER () THEN 1.0
              ELSE (n - min(n) OVER ()) / (max(n) OVER () - min(n) OVER ()) END AS DOUBLE) AS s_volume_raw
  FROM per_model
)
SELECT event_type, floor((s_value_raw) * 10000 + 0.5) / 10000 AS s_value, floor((s_volume_raw) * 10000 + 0.5) / 10000 AS s_volume,
       floor((s_value_raw * CAST(0.7 AS DOUBLE) + s_volume_raw * CAST(0.3 AS DOUBLE)) * 10000 + 0.5) / 10000
         AS weighted_score
FROM norm
"""


# ---------------------------------------------------------------------------
# W7: weighted Borda rank (pages/2_OCR_Benchmark.py:574-590: rank r on a
# criterion gives (n-1-r)·weight points, summed over criteria)
# ---------------------------------------------------------------------------

_CRITERIA = [("avg_value", 0.5), ("sum_value", 0.3), ("n_runs", 0.2)]


def _per_model_criteria(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(_sum_cents().alias("sc"), F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            (F.col("sc") / (100.0 * F.col("n"))).alias("avg_value"),
            (F.col("sc") / 100.0).alias("sum_value"),
            F.col("n").cast("double").alias("n_runs"),
        )
    )


def q_borda_rank(spark, sf_dir):
    per_model = _per_model_criteria(spark, sf_dir)
    melted = per_model.select(
        "event_type",
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(c) for c, _ in _CRITERIA]),
                F.array(*[F.col(c) for c, _ in _CRITERIA]),
            )
        ).alias("criterion", "score"),
    )
    wts = F.create_map(*[x for c, wt in _CRITERIA for x in (F.lit(c), F.lit(wt))])
    win = Window.partitionBy("criterion").orderBy(F.desc("score"), F.asc("event_type"))
    n = Window.partitionBy("criterion")
    pts = (
        melted.withColumn("rn", F.row_number().over(win))
        .withColumn("n_models", F.count(F.lit(1)).over(n))
        .select(
            "event_type",
            ((F.col("n_models") - F.col("rn")) * wts[F.col("criterion")]).alias("pts"),
        )
    )
    return pts.groupBy("event_type").agg(r4(F.sum("pts")).alias("borda_points"))


SQL_BORDA = """
WITH per_model AS (
  SELECT event_type, sc / (100.0 * n) AS avg_value, sc / 100.0 AS sum_value,
         CAST(n AS DOUBLE) AS n_runs
  FROM (SELECT event_type, sum(floor(value * 100 + 0.5)) AS sc, count(*) AS n
        FROM events GROUP BY event_type)
), melted AS (
  SELECT event_type, 'avg_value' AS criterion, avg_value AS score,
         CAST(0.5 AS DOUBLE) AS wt FROM per_model
  UNION ALL
  SELECT event_type, 'sum_value', sum_value, CAST(0.3 AS DOUBLE) FROM per_model
  UNION ALL
  SELECT event_type, 'n_runs', n_runs, CAST(0.2 AS DOUBLE) FROM per_model
), ranked AS (
  SELECT event_type, wt,
         row_number() OVER (PARTITION BY criterion ORDER BY score DESC, event_type ASC) AS rn,
         count(*) OVER (PARTITION BY criterion) AS n_models
  FROM melted
)
SELECT event_type, floor((sum((n_models - rn) * wt)) * 10000 + 0.5) / 10000 AS borda_points
FROM ranked GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# W8: Condorcet wins — every model equal to a criterion's best gets a win
# (pages/2_OCR_Benchmark.py:592-608)
# ---------------------------------------------------------------------------

def q_condorcet_wins(spark, sf_dir):
    per_model = _per_model_criteria(spark, sf_dir)
    melted = per_model.select(
        "event_type",
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(c) for c, _ in _CRITERIA]),
                F.array(*[F.col(c) for c, _ in _CRITERIA]),
            )
        ).alias("criterion", "score"),
    )
    best = Window.partitionBy("criterion")
    return (
        melted.withColumn("best", F.max("score").over(best))
        .groupBy("event_type")
        .agg(F.sum(F.when(F.col("score") == F.col("best"), 1).otherwise(0)).alias("wins"))
    )


SQL_CONDORCET = """
WITH per_model AS (
  SELECT event_type, sc / (100.0 * n) AS avg_value, sc / 100.0 AS sum_value,
         CAST(n AS DOUBLE) AS n_runs
  FROM (SELECT event_type, sum(floor(value * 100 + 0.5)) AS sc, count(*) AS n
        FROM events GROUP BY event_type)
), melted AS (
  SELECT event_type, 'avg_value' AS criterion, avg_value AS score FROM per_model
  UNION ALL SELECT event_type, 'sum_value', sum_value FROM per_model
  UNION ALL SELECT event_type, 'n_runs', n_runs FROM per_model
), with_best AS (
  SELECT event_type, score, max(score) OVER (PARTITION BY criterion) AS best FROM melted
)
SELECT event_type, CAST(sum(CASE WHEN score = best THEN 1 ELSE 0 END) AS BIGINT) AS wins
FROM with_best GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# TPC-H Q1-style pricing summary on lineitem (partial-agg friendly:
# map-side combine then final — one shuffle of 4-6 groups)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    # exact-sum discipline (functions/text.py): aggregate integer
    # cents/bp, divide once at the end — mirrors the oracle term-for-term
    # so partition-order float summation can never flip the 4th decimal
    li = read_spread(spark, f"{sf_dir}/lineitem.parquet")
    disc_price = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    agg = (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sq"),
            F.sum(cents(F.col("l_extendedprice"))).alias("sbp_c"),
            F.sum(disc_price).alias("sdp_c"),
            F.sum(cents(F.col("l_discount"), 10000)).alias("sd_c"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        r4(F.col("sq")).alias("sum_qty"),
        r4(F.col("sbp_c") / 100.0).alias("sum_base_price"),
        r4(F.col("sdp_c") / 10000.0).alias("sum_disc_price"),
        r4(F.col("sq") / (1.0 * F.col("count_order"))).alias("avg_qty"),
        r4(F.col("sd_c") / (10000.0 * F.col("count_order"))).alias("avg_disc"),
        "count_order",
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       floor((sq) * 10000 + 0.5) / 10000 AS sum_qty,
       floor((sbp_c / 100.0) * 10000 + 0.5) / 10000 AS sum_base_price,
       floor((sdp_c / 10000.0) * 10000 + 0.5) / 10000 AS sum_disc_price,
       floor((sq / (1.0 * count_order)) * 10000 + 0.5) / 10000 AS avg_qty,
       floor((sd_c / (10000.0 * count_order)) * 10000 + 0.5) / 10000 AS avg_disc,
       count_order
FROM (
  SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sq,
         sum(floor(l_extendedprice * 100 + 0.5)) AS sbp_c,
         sum(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)) AS sdp_c,
         sum(floor(l_discount * 10000 + 0.5)) AS sd_c,
         count(*) AS count_order
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
  GROUP BY l_returnflag, l_linestatus
)
"""


# ---------------------------------------------------------------------------
# J1 analog: fact ⋈ broadcast dims (catalog join) — revenue per nation
# ---------------------------------------------------------------------------

def q_revenue_per_nation(spark, sf_dir):
    orders = read_spread(spark, f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(cents(F.col("o_totalprice"))).alias("rc"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select("n_name", r4(F.col("rc") / 100.0).alias("revenue"), "n_orders")
    )


SQL_REVENUE_NATION = """
SELECT n_name, floor((rc / 100.0) * 10000 + 0.5) / 10000 AS revenue, n_orders
FROM (
  SELECT n_name, sum(floor(o_totalprice * 100 + 0.5)) AS rc, count(*) AS n_orders
  FROM orders JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
"""


# ---------------------------------------------------------------------------
# J3 analog: anti-join skip accounting — customers with no orders, by nation
# ---------------------------------------------------------------------------

def q_customers_without_orders(spark, sf_dir):
    orders = read_spread(spark, f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    no_orders = customer.join(
        orders.select("o_custkey"), customer.c_custkey == orders.o_custkey, "left_anti"
    )
    return (
        no_orders.join(F.broadcast(nation), no_orders.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_skipped"))
    )


SQL_NO_ORDERS = """
SELECT n_name, count(*) AS n_skipped
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# A8: criteria winners with tie -> None — per criterion, the unique best
# model or null (scripts/export_benchmark_results.py:113-144)
# ---------------------------------------------------------------------------

def q_criteria_winners(spark, sf_dir):
    melted = _per_model_criteria(spark, sf_dir).select(
        "event_type",
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(c) for c, _ in _CRITERIA]),
                F.array(*[F.col(c) for c, _ in _CRITERIA]),
            )
        ).alias("criterion", "score"),
    )
    w = Window.partitionBy("criterion")
    tagged = melted.withColumn("best", F.max("score").over(w)).withColumn(
        "n_best", F.sum(F.when(F.col("score") == F.col("best"), 1).otherwise(0)).over(w)
    )
    return tagged.groupBy("criterion").agg(
        F.max(
            F.when(
                (F.col("score") == F.col("best")) & (F.col("n_best") == 1),
                F.col("event_type"),
            )
        ).alias("winner"),
        r4(F.max("best")).alias("best_score"),
    )


SQL_CRITERIA_WINNERS = """
WITH per_model AS (
  SELECT event_type, sc / (100.0 * n) AS avg_value, sc / 100.0 AS sum_value,
         CAST(n AS DOUBLE) AS n_runs
  FROM (SELECT event_type, sum(floor(value * 100 + 0.5)) AS sc, count(*) AS n
        FROM events GROUP BY event_type)
), melted AS (
  SELECT event_type, 'avg_value' AS criterion, avg_value AS score FROM per_model
  UNION ALL SELECT event_type, 'sum_value', sum_value FROM per_model
  UNION ALL SELECT event_type, 'n_runs', n_runs FROM per_model
), with_best AS (
  SELECT *, max(score) OVER (PARTITION BY criterion) AS best FROM melted
), tagged AS (
  SELECT *, sum(CASE WHEN score = best THEN 1 ELSE 0 END)
              OVER (PARTITION BY criterion) AS n_best
  FROM with_best
)
SELECT criterion,
       max(CASE WHEN score = best AND n_best = 1 THEN event_type END) AS winner,
       floor((max(best)) * 10000 + 0.5) / 10000 AS best_score
FROM tagged GROUP BY criterion
"""


# ---------------------------------------------------------------------------
# W8 detail: criteria each model won, as a sorted list
# (pages/llm_parsing_benchmark.py:384-397)
# ---------------------------------------------------------------------------

def q_condorcet_detail(spark, sf_dir):
    melted = _per_model_criteria(spark, sf_dir).select(
        "event_type",
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(c) for c, _ in _CRITERIA]),
                F.array(*[F.col(c) for c, _ in _CRITERIA]),
            )
        ).alias("criterion", "score"),
    )
    best = Window.partitionBy("criterion")
    return (
        melted.withColumn("best", F.max("score").over(best))
        .groupBy("event_type")
        .agg(
            # scalar (comma-joined) rather than array: the driver's value-hash
            # canonicalizer cannot hash list cells (VERDICT r1 "What's wrong" #5)
            F.array_join(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("score") == F.col("best"), F.col("criterion"))
                    )
                ),
                ",",
            ).alias("criteria_won")
        )
    )


SQL_CONDORCET_DETAIL = """
WITH per_model AS (
  SELECT event_type, sc / (100.0 * n) AS avg_value, sc / 100.0 AS sum_value,
         CAST(n AS DOUBLE) AS n_runs
  FROM (SELECT event_type, sum(floor(value * 100 + 0.5)) AS sc, count(*) AS n
        FROM events GROUP BY event_type)
), melted AS (
  SELECT event_type, 'avg_value' AS criterion, avg_value AS score FROM per_model
  UNION ALL SELECT event_type, 'sum_value', sum_value FROM per_model
  UNION ALL SELECT event_type, 'n_runs', n_runs FROM per_model
), with_best AS (
  SELECT event_type, criterion, score,
         max(score) OVER (PARTITION BY criterion) AS best
  FROM melted
)
SELECT event_type,
       coalesce(array_to_string(list_sort(list(criterion) FILTER (score = best)), ','),
                '') AS criteria_won
FROM with_best GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# A9: pairwise 5-criteria verdict — model A vs model B, wins out of 5
# (pages/parallel_ocr_test.py:230-270)
# ---------------------------------------------------------------------------

def q_pairwise_verdict(spark, sf_dir):
    per = (
        _events(spark, sf_dir)
        .filter(F.col("event_type").isin("click", "view"))
        .groupBy("event_type")
        .agg(
            _sum_cents().cast("long").alias("sc"),
            F.count(F.lit(1)).alias("n"),
            F.max(cents(F.col("value")).cast("long")).alias("mx"),
            F.min(cents(F.col("value")).cast("long")).alias("mn"),
        )
    )
    a = per.filter(F.col("event_type") == "click").alias("a")
    b = per.filter(F.col("event_type") == "view").alias("b")
    j = a.crossJoin(b)
    # criteria (all higher-better; avg compared by integer cross-multiply):
    # 1 avg, 2 sum, 3 count, 4 max, 5 min
    crit = [
        (F.col("a.sc") * F.col("b.n"), F.col("b.sc") * F.col("a.n")),
        (F.col("a.sc"), F.col("b.sc")),
        (F.col("a.n"), F.col("b.n")),
        (F.col("a.mx"), F.col("b.mx")),
        (F.col("a.mn"), F.col("b.mn")),
    ]
    a_wins = sum(F.when(x > y, 1).otherwise(0) for x, y in crit)
    b_wins = sum(F.when(y > x, 1).otherwise(0) for x, y in crit)
    return j.select(
        F.lit("click").alias("model_a"),
        F.lit("view").alias("model_b"),
        a_wins.cast("bigint").alias("a_wins"),
        b_wins.cast("bigint").alias("b_wins"),
        (F.lit(5) - a_wins - b_wins).cast("bigint").alias("ties"),
    )


SQL_PAIRWISE_VERDICT = """
WITH per AS (
  SELECT event_type,
         CAST(sum(floor(value * 100 + 0.5)) AS BIGINT) AS sc,
         count(*) AS n,
         CAST(max(floor(value * 100 + 0.5)) AS BIGINT) AS mx,
         CAST(min(floor(value * 100 + 0.5)) AS BIGINT) AS mn
  FROM events WHERE event_type IN ('click', 'view') GROUP BY event_type
), j AS (
  SELECT a.sc asc_, a.n an, a.mx amx, a.mn amn, b.sc bsc, b.n bn, b.mx bmx, b.mn bmn
  FROM per a, per b WHERE a.event_type = 'click' AND b.event_type = 'view'
)
SELECT 'click' AS model_a, 'view' AS model_b,
       CAST((CASE WHEN asc_ * bn > bsc * an THEN 1 ELSE 0 END)
          + (CASE WHEN asc_ > bsc THEN 1 ELSE 0 END)
          + (CASE WHEN an > bn THEN 1 ELSE 0 END)
          + (CASE WHEN amx > bmx THEN 1 ELSE 0 END)
          + (CASE WHEN amn > bmn THEN 1 ELSE 0 END) AS BIGINT) AS a_wins,
       CAST((CASE WHEN bsc * an > asc_ * bn THEN 1 ELSE 0 END)
          + (CASE WHEN bsc > asc_ THEN 1 ELSE 0 END)
          + (CASE WHEN bn > an THEN 1 ELSE 0 END)
          + (CASE WHEN bmx > amx THEN 1 ELSE 0 END)
          + (CASE WHEN bmn > amn THEN 1 ELSE 0 END) AS BIGINT) AS b_wins,
       CAST(5 - ((CASE WHEN asc_ * bn > bsc * an THEN 1 ELSE 0 END)
          + (CASE WHEN asc_ > bsc THEN 1 ELSE 0 END)
          + (CASE WHEN an > bn THEN 1 ELSE 0 END)
          + (CASE WHEN amx > bmx THEN 1 ELSE 0 END)
          + (CASE WHEN amn > bmn THEN 1 ELSE 0 END))
          - ((CASE WHEN bsc * an > asc_ * bn THEN 1 ELSE 0 END)
          + (CASE WHEN bsc > asc_ THEN 1 ELSE 0 END)
          + (CASE WHEN bn > an THEN 1 ELSE 0 END)
          + (CASE WHEN bmx > amx THEN 1 ELSE 0 END)
          + (CASE WHEN bmn > amn THEN 1 ELSE 0 END)) AS BIGINT) AS ties
FROM j
"""


# ---------------------------------------------------------------------------
# TPC-H Q3-style: shipping-priority top-k — fact ⋈ fact sort-merge with a
# broadcast dim filter, group, then TakeOrdered (the classic mixed-join plan)
# ---------------------------------------------------------------------------

def q_shipping_priority(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_spread(spark, f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderdate") < F.lit("2000-06-01")
    )
    li = read_spread(spark, f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") > F.lit("2000-06-01")
    )
    revenue_c = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    out = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue_c).alias("rc"))
        .select(
            "l_orderkey",
            r4(F.col("rc") / 10000.0).alias("revenue"),
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )
    return out


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey,
       floor((rc / 10000.0) * 10000 + 0.5) / 10000 AS revenue,
       CAST(o_orderdate AS VARCHAR) AS o_orderdate, o_orderpriority
FROM (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         sum(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)) AS rc
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '2000-06-01'
    AND l_shipdate > TIMESTAMP '2000-06-01'
  GROUP BY 1, 2, 3
)
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# TPC-H Q5-style: local-supplier revenue by nation — the full dim chain
# region -> nation -> (customer, supplier) with the co-nation constraint
# ---------------------------------------------------------------------------

def q_local_supplier_revenue(spark, sf_dir):
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    orders = read_spread(spark, f"{sf_dir}/orders.parquet")
    li = read_spread(spark, f"{sf_dir}/lineitem.parquet")
    revenue_c = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    out = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(revenue_c).alias("rc"), F.count(F.lit(1)).alias("n_items"))
        .select(
            "r_name", "n_name", r4(F.col("rc") / 10000.0).alias("revenue"), "n_items"
        )
    )
    return out


SQL_LOCAL_SUPPLIER = """
SELECT r_name, n_name,
       floor((rc / 10000.0) * 10000 + 0.5) / 10000 AS revenue, n_items
FROM (
  SELECT r_name, n_name,
         sum(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)) AS rc,
         count(*) AS n_items
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
)
"""


# ---------------------------------------------------------------------------
# TPC-H Q4-style order-priority check: LEFT SEMI join (EXISTS) — orders in
# a date window having at least one returned lineitem, counted by priority.
# The semi-join never materializes lineitem columns, so only o_orderkey
# moves through the probe side.
# ---------------------------------------------------------------------------

def q_order_priority(spark, sf_dir):
    orders = read_spread(spark, f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1999-01-01"))
    )
    returned = read_spread(spark, f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


SQL_ORDER_PRIORITY = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q6-style forecast revenue: pure filter + single scalar aggregate —
# whole-stage-codegen scan with every predicate pushed to parquet.
# Exact-sum discipline: price (2dp) x discount (2dp) has exactly 4
# decimals, so 1e4-scaled terms are integer-valued doubles (max ~7e7 per
# term — exact int sums far past sf1) and the sum is order-independent.
# ---------------------------------------------------------------------------

def q_forecast_revenue(spark, sf_dir):
    li = read_spread(spark, f"{sf_dir}/lineitem.parquet")
    term = F.floor(
        F.col("l_extendedprice") * F.col("l_discount") * 10000.0 + F.lit(0.5)
    )
    out = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(term).alias("rc"), F.count(F.lit(1)).alias("n_items"))
        .select(r4(F.col("rc") / 10000.0).alias("revenue"), "n_items")
    )
    return out


SQL_FORECAST_REVENUE = """
SELECT floor((rc / 10000.0) * 10000 + 0.5) / 10000 AS revenue, n_items
FROM (
  SELECT sum(floor(l_extendedprice * l_discount * 10000 + 0.5)) AS rc,
         count(*) AS n_items
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
)
"""


# ---------------------------------------------------------------------------
# sessionization: gap-based sessions over the events stream — the classic
# event-analytics window composition (lag -> break flag -> running sum ->
# per-session rollup). One shuffle keyed by user_id serves every window;
# at 10^12 events this is the standard sessionize shape (skewed power
# users are bounded by their own event counts, not by a crossJoin).
# Epoch arithmetic is floored to whole seconds IN BOTH ENGINES before any
# gap comparison so microsecond representation can never flip a break.
# ---------------------------------------------------------------------------

SESSION_GAP_SEC = 1800  # 30 min of silence ends a session


def q_sessionize(spark, sf_dir):
    e = _events(spark, sf_dir).select(
        "user_id", "event_id", "ts", F.unix_timestamp(F.col("ts")).alias("es")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = (
        F.when(
            F.lag("es").over(w).isNull()
            | ((F.col("es") - F.lag("es").over(w)) > SESSION_GAP_SEC),
            1,
        )
        .otherwise(0)
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = e.withColumn("brk", brk).withColumn(
        "session_seq", F.sum("brk").over(run).cast("bigint")
    )
    return s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("es").alias("start_epoch"),
        (F.max("es") - F.min("es")).cast("bigint").alias("duration_sec"),
    )


SQL_SESSIONIZE = f"""
WITH e AS (
  SELECT user_id, event_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
),
m AS (
  SELECT *, CASE WHEN lag(es) OVER w IS NULL
                   OR es - lag(es) OVER w > {SESSION_GAP_SEC}
                 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM m
)
SELECT user_id, session_seq, count(*) AS n_events,
       min(es) AS start_epoch, CAST(max(es) - min(es) AS BIGINT) AS duration_sec
FROM s GROUP BY 1, 2
"""


QUERIES = {
    "agg_per_model_summary": q_per_model_summary,
    "agg_error_mask": q_error_mask_agg,
    "agg_two_key_means": q_two_key_means,
    "agg_success_rate": q_success_rate,
    "agg_runs_per_doc": q_runs_per_doc,
    "agg_error_categories": q_error_categories,
    "win_latest_snapshot": q_latest_snapshot,
    "win_top1_per_model": q_top1_per_model,
    "win_pivot_delta": q_pivot_delta,
    "win_head_to_head": q_head_to_head,
    "rank_weighted_score": q_weighted_score,
    "rank_borda": q_borda_rank,
    "rank_condorcet": q_condorcet_wins,
    "tpch_pricing_summary": q_pricing_summary,
    "join_revenue_per_nation": q_revenue_per_nation,
    "join_customers_without_orders": q_customers_without_orders,
    "rank_criteria_winners": q_criteria_winners,
    "rank_condorcet_detail": q_condorcet_detail,
    "rank_pairwise_verdict": q_pairwise_verdict,
    "tpch_shipping_priority": q_shipping_priority,
    "tpch_local_supplier_revenue": q_local_supplier_revenue,
    "tpch_order_priority": q_order_priority,
    "tpch_forecast_revenue": q_forecast_revenue,
    "win_sessionize": q_sessionize,
}

ORACLES = {
    "agg_per_model_summary": SQL_PER_MODEL,
    "agg_error_mask": SQL_ERROR_MASK,
    "agg_two_key_means": SQL_TWO_KEY,
    "agg_success_rate": SQL_SUCCESS_RATE,
    "agg_runs_per_doc": SQL_RUNS_PER_DOC,
    "agg_error_categories": SQL_ERROR_CATS,
    "win_latest_snapshot": SQL_LATEST_SNAPSHOT,
    "win_top1_per_model": SQL_TOP1,
    "win_pivot_delta": SQL_PIVOT_DELTA,
    "win_head_to_head": SQL_HEAD_TO_HEAD,
    "rank_weighted_score": SQL_WEIGHTED,
    "rank_borda": SQL_BORDA,
    "rank_condorcet": SQL_CONDORCET,
    "tpch_pricing_summary": SQL_PRICING,
    "join_revenue_per_nation": SQL_REVENUE_NATION,
    "join_customers_without_orders": SQL_NO_ORDERS,
    "rank_criteria_winners": SQL_CRITERIA_WINNERS,
    "rank_condorcet_detail": SQL_CONDORCET_DETAIL,
    "rank_pairwise_verdict": SQL_PAIRWISE_VERDICT,
    "tpch_shipping_priority": SQL_SHIPPING_PRIORITY,
    "tpch_local_supplier_revenue": SQL_LOCAL_SUPPLIER,
    "tpch_order_priority": SQL_ORDER_PRIORITY,
    "tpch_forecast_revenue": SQL_FORECAST_REVENUE,
    "win_sessionize": SQL_SESSIONIZE,
}
