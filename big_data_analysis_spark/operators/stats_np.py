"""Fourth statistics wave (r9, for the r10 grading window;
SURVEY.md §2.4/§2.5 additions): the non-parametric / categorical
inference tier — Mood's median test, Cochran's Q, McNemar's paired
test, odds ratio / relative risk, Cliff's delta, the Hodges-Lehmann
shift estimator, the seasonal Mann-Kendall trend test, Fleiss' kappa
for 3+ raters, a two-sample Poisson rate test, and the Wilcoxon
signed-rank test.

Same discipline as stats_ext / ta_stats: exact integer counts and
rank machinery (doubled midranks, 2x-scaled medians, value-domain
grids), the agg_chi_square one-row pivot for cross-group combination
over the FIXED five-type domain, and one fixed-order double
expression at the end.  Squared terms that can pass int64 run in
DECIMAL(38,0)/HUGEINT and cross into doubles via VARCHAR (the
agg_jarque_bera rounding gotcha: DuckDB's direct HUGEINT->DOUBLE is
not correctly rounded; string->double is, in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import table
from ..registry import query
from .stats_ext import _CENTS_SQL, _GRID_SQL, _day_grid
from .ta_stats import _TYPES


@query(
    "agg_mood_median",
    oracle=f"""
WITH c AS (
  SELECT event_type, {_CENTS_SQL} AS cents FROM events
),
grid AS (
  SELECT cents,
         {", ".join(f"CAST(COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS BIGINT) AS n_{t}" for t in _TYPES)},
         CAST(COUNT(*) AS BIGINT) AS nt
  FROM c GROUP BY cents
),
w AS (
  SELECT *, SUM(nt) OVER (ORDER BY cents
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS cum,
         SUM(nt) OVER () AS n
  FROM grid
),
med AS (
  SELECT MIN(CASE WHEN cum >= (n + 1) // 2 THEN cents END)
       + MIN(CASE WHEN cum >= n // 2 + 1 THEN cents END) AS med2
  FROM w
),
m AS (
  SELECT
    {", ".join(f"CAST(SUM(CASE WHEN 2 * g.cents > med.med2 THEN g.n_{t} ELSE 0 END) AS BIGINT) AS a_{t}" for t in _TYPES)},
    {", ".join(f"CAST(SUM(CASE WHEN 2 * g.cents < med.med2 THEN g.n_{t} ELSE 0 END) AS BIGINT) AS b_{t}" for t in _TYPES)},
    CAST(SUM(CASE WHEN 2 * g.cents = med.med2 THEN g.nt ELSE 0 END)
         AS BIGINT) AS n_at_median
  FROM grid g CROSS JOIN med
),
t2 AS (
  SELECT m.*,
         {" + ".join(f"a_{t}" for t in _TYPES)} AS ca,
         {" + ".join(f"b_{t}" for t in _TYPES)} AS cb,
         {" + ".join(f"a_{t} + b_{t}" for t in _TYPES)} AS nn
  FROM m
)
SELECT {", ".join(f"a_{t}" for t in _TYPES)},
       {", ".join(f"b_{t}" for t in _TYPES)},
       n_at_median, CAST(nn AS BIGINT) AS n_used,
       CAST(4 AS BIGINT) AS dof,
       {" + ".join(
         f"(CAST(a_{t} AS DOUBLE) * nn - (a_{t} + b_{t}) * CAST(ca AS DOUBLE))"
         f" * (CAST(a_{t} AS DOUBLE) * nn - (a_{t} + b_{t}) * CAST(ca AS DOUBLE))"
         f" / ((a_{t} + b_{t}) * CAST(ca AS DOUBLE) * nn)"
         f" + (CAST(b_{t} AS DOUBLE) * nn - (a_{t} + b_{t}) * CAST(cb AS DOUBLE))"
         f" * (CAST(b_{t} AS DOUBLE) * nn - (a_{t} + b_{t}) * CAST(cb AS DOUBLE))"
         f" / ((a_{t} + b_{t}) * CAST(cb AS DOUBLE) * nn)"
         for t in _TYPES)} AS chi2
FROM t2
""",
    category="aggregations",
)
def agg_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across the five event types — does any
    type's value distribution sit above/below the POOLED median
    (the quick-and-robust k-sample location screen beside
    agg_kruskal_wallis's rank-powered version): the pooled median is
    an exact doubled order statistic off the global cents grid,
    above/below counts per type compare at 2x scale (values AT the
    median are excluded, counted separately — the standard
    convention), and the 5x2 chi-square combines the ten integer
    counts in one fixed-order expression (the agg_chi_square
    pivot).  Scale: one grid groupBy + one ordered window pass;
    everything after is value-domain-bounded."""
    e = table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    grid = (
        e.select("event_type", cents.alias("cents"))
        .groupBy("cents")
        .agg(
            *[
                F.count(F.when(F.col("event_type") == t, 1))
                .cast("long")
                .alias(f"n_{t}")
                for t in _TYPES
            ],
            F.count(F.lit(1)).cast("long").alias("nt"),
        )
        .localCheckpoint(eager=True)  # read by median pass AND census
    )
    w_cum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    w = grid.select(
        "cents",
        "nt",
        F.sum("nt").over(w_cum).alias("cum"),
        F.sum("nt").over(w_all).alias("n"),
    )
    med = w.agg(
        (
            F.min(F.expr("CASE WHEN cum >= (n + 1) DIV 2 THEN cents END"))
            + F.min(F.expr("CASE WHEN cum >= n DIV 2 + 1 THEN cents END"))
        ).alias("med2")
    )
    m = grid.crossJoin(F.broadcast(med)).agg(
        *[
            F.sum(
                F.when(2 * F.col("cents") > F.col("med2"), F.col(f"n_{t}")).otherwise(0)
            )
            .cast("long")
            .alias(f"a_{t}")
            for t in _TYPES
        ],
        *[
            F.sum(
                F.when(2 * F.col("cents") < F.col("med2"), F.col(f"n_{t}")).otherwise(0)
            )
            .cast("long")
            .alias(f"b_{t}")
            for t in _TYPES
        ],
        F.sum(F.when(2 * F.col("cents") == F.col("med2"), F.col("nt")).otherwise(0))
        .cast("long")
        .alias("n_at_median"),
    )
    ca = None
    cb = None
    nn = None
    for t in _TYPES:
        ca = F.col(f"a_{t}") if ca is None else ca + F.col(f"a_{t}")
        cb = F.col(f"b_{t}") if cb is None else cb + F.col(f"b_{t}")
        rt = F.col(f"a_{t}") + F.col(f"b_{t}")
        nn = rt if nn is None else nn + rt
    t2 = m.select("*", ca.alias("ca"), cb.alias("cb"), nn.alias("nn"))
    chi2 = None
    for t in _TYPES:
        a, b = F.col(f"a_{t}"), F.col(f"b_{t}")
        row = a + b
        da = a.cast("double") * F.col("nn") - row * F.col("ca").cast("double")
        db = b.cast("double") * F.col("nn") - row * F.col("cb").cast("double")
        for term in (
            da * da / (row * F.col("ca").cast("double") * F.col("nn")),
            db * db / (row * F.col("cb").cast("double") * F.col("nn")),
        ):
            chi2 = term if chi2 is None else chi2 + term
    return t2.select(
        *[F.col(f"a_{t}") for t in _TYPES],
        *[F.col(f"b_{t}") for t in _TYPES],
        "n_at_median",
        F.col("nn").cast("long").alias("n_used"),
        F.lit(4).cast("long").alias("dof"),
        chi2.alias("chi2"),
    )


@query(
    "agg_cochran_q",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
med AS (
  SELECT event_type,
         MIN(m1) + MIN(m2) AS med2 FROM (
    SELECT event_type,
           CASE WHEN cum >= (n + 1) // 2 THEN x END AS m1,
           CASE WHEN cum >= n // 2 + 1 THEN x END AS m2
    FROM (
      SELECT event_type, x,
             SUM(1) OVER (PARTITION BY event_type ORDER BY x, d
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM g
    ) w
  ) q GROUP BY event_type
),
x AS (
  SELECT g.d, g.event_type,
         CASE WHEN 2 * g.x > m.med2 THEN 1 ELSE 0 END AS hi
  FROM g JOIN med m ON m.event_type = g.event_type
),
full_d AS (SELECT d FROM x GROUP BY d HAVING COUNT(*) = 5),
b AS (SELECT x.* FROM x JOIN full_d f ON f.d = x.d),
rows_ AS (
  SELECT d, CAST(SUM(hi) AS BIGINT) AS r FROM b GROUP BY d
),
m AS (
  SELECT
    {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN hi END) AS BIGINT) AS c_{t}" for t in _TYPES)},
    CAST(COUNT(DISTINCT d) AS BIGINT) AS n_days
  FROM b
),
rm AS (
  SELECT CAST(SUM(r) AS BIGINT) AS sum_r,
         CAST(SUM(r * r) AS BIGINT) AS sum_r2
  FROM rows_
)
SELECT n_days, {", ".join(f"c_{t}" for t in _TYPES)},
       sum_r, sum_r2, CAST(4 AS BIGINT) AS dof,
       4.0 * (5.0 * ({" + ".join(f"CAST(c_{t} AS DOUBLE) * CAST(c_{t} AS DOUBLE)" for t in _TYPES)})
              - CAST(sum_r AS DOUBLE) * CAST(sum_r AS DOUBLE))
         / (5.0 * CAST(sum_r AS DOUBLE) - CAST(sum_r2 AS DOUBLE)) AS q_stat
FROM m CROSS JOIN rm
""",
    category="aggregations",
)
def agg_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q across the five event types — the k-treatment
    extension of McNemar for BINARY outcomes on matched blocks: the
    outcome is "this type's daily revenue beat its own series
    median" (an exact doubled-median comparison, so every x_ij is a
    pure integer bit), blocks are complete 5-type days, and
    Q = (k-1)(k*sum C_j^2 - (sum C_j)^2) / (k*sum R_i - sum R_i^2)
    combines the integer column totals (one-row pivot over the fixed
    type domain) and row-sum moments in ONE double expression.
    Scale: windows over the bounded day grid; the binary matrix is
    days x 5."""
    g = _day_grid(spark, sf_dir)
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("x", "d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    w = g.select(
        "event_type",
        "d",
        "x",
        F.sum(F.lit(1)).over(w_cum).alias("cum"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    med = w.groupBy("event_type").agg(
        (
            F.min(F.expr("CASE WHEN cum >= (n + 1) DIV 2 THEN x END"))
            + F.min(F.expr("CASE WHEN cum >= n DIV 2 + 1 THEN x END"))
        ).alias("med2")
    )
    x = g.join(
        F.broadcast(med.withColumnRenamed("event_type", "et_m")),
        g["event_type"] == F.col("et_m"),
    ).select(
        "d",
        "event_type",
        F.when(2 * F.col("x") > F.col("med2"), 1).otherwise(0).alias("hi"),
    )
    full_d = x.groupBy("d").agg(F.count(F.lit(1)).alias("k")).where(F.col("k") == 5)
    b = x.join(full_d.select("d"), "d").localCheckpoint(eager=True)
    rows_ = b.groupBy("d").agg(F.sum("hi").cast("long").alias("r"))
    m = b.agg(
        *[
            F.sum(F.when(F.col("event_type") == t, F.col("hi")))
            .cast("long")
            .alias(f"c_{t}")
            for t in _TYPES
        ],
        F.countDistinct("d").cast("long").alias("n_days"),
    )
    rm = rows_.agg(
        F.sum("r").cast("long").alias("sum_r"),
        F.sum(F.col("r") * F.col("r")).cast("long").alias("sum_r2"),
    )
    j = m.crossJoin(F.broadcast(rm))
    csq = None
    for t in _TYPES:
        tt = F.col(f"c_{t}").cast("double") * F.col(f"c_{t}").cast("double")
        csq = tt if csq is None else csq + tt
    q_stat = (
        F.lit(4.0)
        * (
            F.lit(5.0) * csq
            - F.col("sum_r").cast("double") * F.col("sum_r").cast("double")
        )
        / (F.lit(5.0) * F.col("sum_r").cast("double") - F.col("sum_r2").cast("double"))
    )
    return j.select(
        "n_days",
        *[F.col(f"c_{t}") for t in _TYPES],
        "sum_r",
        "sum_r2",
        F.lit(4).cast("long").alias("dof"),
        q_stat.alias("q_stat"),
    )


@query(
    "agg_mcnemar",
    oracle="""
WITH u AS (
  SELECT user_id,
         MAX(CASE WHEN CAST(date_trunc('day', ts) AS DATE) < DATE '2024-01-16'
                  THEN 1 ELSE 0 END) AS h1,
         MAX(CASE WHEN CAST(date_trunc('day', ts) AS DATE) >= DATE '2024-01-16'
                  THEN 1 ELSE 0 END) AS h2
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(SUM(h1 * h2) AS BIGINT) AS both_halves,
         CAST(SUM(h1 * (1 - h2)) AS BIGINT) AS first_only,
         CAST(SUM((1 - h1) * h2) AS BIGINT) AS second_only,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM u
)
SELECT n_users, both_halves, first_only, second_only,
       CASE WHEN first_only + second_only = 0 THEN 0.0
            ELSE CAST(first_only - second_only AS DOUBLE)
                 * CAST(first_only - second_only AS DOUBLE)
                 / CAST(first_only + second_only AS DOUBLE) END AS chi2,
       CASE WHEN first_only + second_only = 0 THEN 0.0
            ELSE (ABS(CAST(first_only AS DOUBLE)
                      - CAST(second_only AS DOUBLE)) - 1.0)
                 * (ABS(CAST(first_only AS DOUBLE)
                        - CAST(second_only AS DOUBLE)) - 1.0)
                 / CAST(first_only + second_only AS DOUBLE) END
         AS chi2_corrected
FROM m
""",
    category="aggregations",
)
def agg_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on paired user activity — did the population's
    active-user set SHIFT between the two halves of the month (the
    retention drift question a DAU curve can't answer, because only
    the DISCORDANT users carry signal): per user two binary flags
    (active in days 1-15 / days 16-30), the 2x2 discordant cells
    b = active-then-gone and c = newly-active are exact integer
    counts, and chi2 = (b-c)^2/(b+c) plus Edwards' continuity
    correction are one fixed double expression each (a fully
    concordant population — zero discordant users, as happens at the
    smallest fixture SF — pins both statistics to 0.0 instead of
    dividing by zero; ANSI mode makes the unguarded division an
    ERROR, not a NULL).  Scale: one
    user_id hash-agg with map-side partials; four counters out."""
    e = table(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", F.col("ts")))
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(day < F.lit("2024-01-16").cast("date"), 1).otherwise(0)
        ).alias("h1"),
        F.max(
            F.when(day >= F.lit("2024-01-16").cast("date"), 1).otherwise(0)
        ).alias("h2"),
    )
    m = u.agg(
        F.sum(F.col("h1") * F.col("h2")).cast("long").alias("both_halves"),
        F.sum(F.col("h1") * (1 - F.col("h2"))).cast("long").alias("first_only"),
        F.sum((1 - F.col("h1")) * F.col("h2")).cast("long").alias("second_only"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )
    d = F.col("first_only").cast("double") - F.col("second_only").cast("double")
    tot = (F.col("first_only") + F.col("second_only")).cast("double")
    dd = (
        F.col("first_only") - F.col("second_only")
    ).cast("double")
    no_disc = F.col("first_only") + F.col("second_only") == 0
    return m.select(
        "n_users",
        "both_halves",
        "first_only",
        "second_only",
        F.when(no_disc, F.lit(0.0)).otherwise(dd * dd / tot).alias("chi2"),
        F.when(no_disc, F.lit(0.0))
        .otherwise((F.abs(d) - 1.0) * (F.abs(d) - 1.0) / tot)
        .alias("chi2_corrected"),
    )


@query(
    "agg_odds_ratio",
    oracle="""
WITH t AS (
  SELECT CASE WHEN ((user_id & 2147483647) * 2654435761) % 4294967296 < 2147483648
              THEN 1 ELSE 0 END AS is_a,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv
  FROM events
),
m AS (
  SELECT CAST(SUM(is_a * is_conv) AS BIGINT) AS a,
         CAST(SUM(is_a * (1 - is_conv)) AS BIGINT) AS b,
         CAST(SUM((1 - is_a) * is_conv) AS BIGINT) AS c,
         CAST(SUM((1 - is_a) * (1 - is_conv)) AS BIGINT) AS d
  FROM t
)
SELECT a, b, c, d,
       CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
         / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)) AS odds_ratio,
       (CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE))
         / (CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE)) AS relative_risk,
       1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(b AS DOUBLE)
         + 1.0 / CAST(c AS DOUBLE) + 1.0 / CAST(d AS DOUBLE)
         AS log_or_variance
FROM m
""",
    category="aggregations",
)
def agg_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio + relative risk for purchase between the hash arms
    — the 2x2 effect sizes agg_two_proportion_z's significance
    number doesn't give: four exact integer cells, OR = ad/bc and
    RR = (a/(a+b))/(c/(c+d)) each ONE fixed double expression, plus
    the Woolf log-OR variance 1/a+1/b+1/c+1/d (the CI building
    block; the log itself is libm and stays out — documented).
    Scale: one shuffle-free conditional aggregation, four
    counters."""
    ev = table(spark, sf_dir, "events")
    is_a = F.when(
        (F.col("user_id").bitwiseAND(2147483647) * 2654435761) % 4294967296
        < 2147483648,
        1,
    ).otherwise(0)
    is_conv = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    t = ev.select(is_a.alias("is_a"), is_conv.alias("is_conv"))
    m = t.agg(
        F.sum(F.col("is_a") * F.col("is_conv")).cast("long").alias("a"),
        F.sum(F.col("is_a") * (1 - F.col("is_conv"))).cast("long").alias("b"),
        F.sum((1 - F.col("is_a")) * F.col("is_conv")).cast("long").alias("c"),
        F.sum((1 - F.col("is_a")) * (1 - F.col("is_conv"))).cast("long").alias("d"),
    )
    da, db = F.col("a").cast("double"), F.col("b").cast("double")
    dc, dd = F.col("c").cast("double"), F.col("d").cast("double")
    return m.select(
        "a",
        "b",
        "c",
        "d",
        (da * dd / (db * dc)).alias("odds_ratio"),
        (
            (da / (F.col("a") + F.col("b")).cast("double"))
            / (dc / (F.col("c") + F.col("d")).cast("double"))
        ).alias("relative_risk"),
        (1.0 / da + 1.0 / db + 1.0 / dc + 1.0 / dd).alias("log_or_variance"),
    )


@query(
    "agg_cliffs_delta",
    oracle="""
WITH t AS (
  SELECT CASE WHEN ((user_id & 2147483647) * 2654435761) % 4294967296 < 2147483648
              THEN 1 ELSE 0 END AS is_a,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
per_v AS (
  SELECT cents,
         CAST(SUM(is_a) AS BIGINT) AS na,
         CAST(SUM(1 - is_a) AS BIGINT) AS nb
  FROM t GROUP BY cents
),
w AS (
  SELECT na, nb,
         CAST(COALESCE(SUM(nb) OVER (ORDER BY cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS nb_below,
         CAST(COALESCE(SUM(nb) OVER (ORDER BY cents
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
              AS BIGINT) AS nb_above
  FROM per_v
),
m AS (
  SELECT CAST(SUM(na * nb_below) AS BIGINT) AS n_gt,
         CAST(SUM(na * nb_above) AS BIGINT) AS n_lt,
         CAST(SUM(na) AS BIGINT) AS n_a,
         CAST(SUM(nb) AS BIGINT) AS n_b
  FROM w
)
SELECT n_a, n_b, n_gt, n_lt,
       CAST(n_a * n_b - n_gt - n_lt AS BIGINT) AS n_tie,
       CAST(n_gt - n_lt AS DOUBLE)
         / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS cliffs_delta
FROM m
""",
    category="aggregations",
)
def agg_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta between the hash arms' purchase values — the
    ordinal effect size P(X_A > X_B) - P(X_A < X_B) that
    agg_mann_whitney's AUC maps to linearly but reads differently
    (0 = stochastic equality, ±1 = complete dominance): the
    greater/less pair counts are EXACT integers computed without
    touching pairs — per-value arm counts on the cents grid, one
    forward and one backward cumulative window give each value's
    opposite-arm mass below/above, and the pair totals are products
    summed over the grid.  delta is one double division.  Scale:
    one data-proportional groupBy to the grid; two ordered passes
    over the value domain."""
    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    is_a = F.when(
        (F.col("user_id").bitwiseAND(2147483647) * 2654435761) % 4294967296
        < 2147483648,
        1,
    ).otherwise(0)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    t = ev.select(is_a.alias("is_a"), cents.alias("cents"))
    per_v = t.groupBy("cents").agg(
        F.sum("is_a").cast("long").alias("na"),
        F.sum(1 - F.col("is_a")).cast("long").alias("nb"),
    )
    w_below = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    w_above = Window.orderBy("cents").rowsBetween(1, Window.unboundedFollowing)
    w = per_v.select(
        "na",
        "nb",
        F.coalesce(F.sum("nb").over(w_below), F.lit(0)).cast("long").alias("nb_below"),
        F.coalesce(F.sum("nb").over(w_above), F.lit(0)).cast("long").alias("nb_above"),
    )
    m = w.agg(
        F.sum(F.col("na") * F.col("nb_below")).cast("long").alias("n_gt"),
        F.sum(F.col("na") * F.col("nb_above")).cast("long").alias("n_lt"),
        F.sum("na").cast("long").alias("n_a"),
        F.sum("nb").cast("long").alias("n_b"),
    )
    return m.select(
        "n_a",
        "n_b",
        "n_gt",
        "n_lt",
        (F.col("n_a") * F.col("n_b") - F.col("n_gt") - F.col("n_lt"))
        .cast("long")
        .alias("n_tie"),
        (
            (F.col("n_gt") - F.col("n_lt")).cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        ).alias("cliffs_delta"),
    )


@query(
    "agg_hodges_lehmann",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
a AS (SELECT d, x FROM g WHERE event_type = 'click'),
b AS (SELECT d, x FROM g WHERE event_type = 'purchase'),
p AS (
  SELECT a.x - b.x AS diff FROM a CROSS JOIN b
),
w AS (
  SELECT diff,
         ROW_NUMBER() OVER (ORDER BY diff) AS rk,
         COUNT(*) OVER () AS n
  FROM p
)
SELECT CAST(MAX(n) AS BIGINT) AS n_pairs,
       CAST(MIN(CASE WHEN rk = (n + 1) // 2 THEN diff END)
          + MIN(CASE WHEN rk = n // 2 + 1 THEN diff END) AS BIGINT) AS hl_x2,
       CAST(MIN(CASE WHEN rk = (n + 1) // 2 THEN diff END)
          + MIN(CASE WHEN rk = n // 2 + 1 THEN diff END) AS DOUBLE) / 2.0
         AS hl_shift
FROM w
""",
    category="aggregations",
)
def agg_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann shift estimator between the click and purchase
    daily-revenue series — the robust "how much higher does one
    series run" location difference (median of ALL pairwise
    differences), the estimator agg_mann_whitney's test statistic
    inverts to: the day grids are bounded, so the cross join is
    O(days^2) pairs regardless of event volume (module discipline),
    and the median of differences is the exact doubled order
    statistic hl_x2 = lower+upper median — integer until the one
    final halving.  Scale: a bounded cross join + one ordered
    rank pass; the raw events contribute only the two grid
    groupBys."""
    g = _day_grid(spark, sf_dir)
    a = g.where(F.col("event_type") == "click").select(F.col("x").alias("xa"))
    b = g.where(F.col("event_type") == "purchase").select(F.col("x").alias("xb"))
    p = a.crossJoin(F.broadcast(b)).select(
        (F.col("xa") - F.col("xb")).alias("diff")
    )
    w_rk = Window.orderBy("diff")
    w_all = Window.partitionBy()
    w = p.select(
        "diff",
        F.row_number().over(w_rk).alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    hl2 = F.min(F.expr("CASE WHEN rk = (n + 1) DIV 2 THEN diff END")) + F.min(
        F.expr("CASE WHEN rk = n DIV 2 + 1 THEN diff END")
    )
    return w.agg(
        F.max("n").cast("long").alias("n_pairs"),
        hl2.cast("long").alias("hl_x2"),
        (hl2.cast("double") / 2.0).alias("hl_shift"),
    )


@query(
    "agg_seasonal_mann_kendall",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
s AS (
  SELECT event_type, d, x, dayofweek(d) AS season FROM g
),
pairs AS (
  SELECT s1.event_type,
         CASE WHEN s2.x > s1.x THEN 1 WHEN s2.x < s1.x THEN -1 ELSE 0 END AS sgn
  FROM s s1 JOIN s s2
    ON s2.event_type = s1.event_type AND s2.season = s1.season
   AND s2.d > s1.d
),
per_season AS (
  SELECT event_type, season, CAST(COUNT(*) AS BIGINT) AS ng
  FROM s GROUP BY event_type, season
),
m AS (
  SELECT p.event_type,
         CAST(SUM(p.sgn) AS BIGINT) AS s_total,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pairs p GROUP BY p.event_type
),
v AS (
  SELECT event_type,
         CAST(SUM(ng * (ng - 1) * (2 * ng + 5)) AS BIGINT) AS var18
  FROM per_season GROUP BY event_type
)
SELECT m.event_type, m.s_total, m.n_pairs, v.var18,
       (CAST(m.s_total AS DOUBLE)
        - CASE WHEN m.s_total > 0 THEN 1.0
               WHEN m.s_total < 0 THEN -1.0 ELSE 0.0 END)
         / sqrt(CAST(v.var18 AS DOUBLE) / 18.0) AS z
FROM m JOIN v ON v.event_type = m.event_type
""",
    category="aggregations",
)
def agg_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall trend test per daily-revenue series —
    agg_mann_kendall with the weekly cycle removed: concordance
    pairs are counted only WITHIN each weekday (season), so a
    strong day-of-week pattern cannot masquerade as a trend.  The
    seasonal S statistics and the variance terms
    sum_g n_g(n_g-1)(2n_g+5) are exact integers (var carried at
    18x), and the continuity-corrected z is one double expression
    per series row.  Scale: the within-season pair join is
    O(days^2/7) on the bounded grid; one event_type shuffle."""
    g = _day_grid(spark, sf_dir)
    s = g.select("event_type", "d", "x", F.dayofweek("d").alias("season"))
    s = s.localCheckpoint(eager=True)  # pair join reads it twice
    s1 = s.select(
        F.col("event_type").alias("et1"),
        F.col("d").alias("d1"),
        F.col("x").alias("x1"),
        F.col("season").alias("se1"),
    )
    s2 = s.select(
        F.col("event_type").alias("et2"),
        F.col("d").alias("d2"),
        F.col("x").alias("x2"),
        F.col("season").alias("se2"),
    )
    pairs = s1.join(
        s2,
        (F.col("et2") == F.col("et1"))
        & (F.col("se2") == F.col("se1"))
        & (F.col("d2") > F.col("d1")),
    ).select(
        F.col("et1").alias("event_type"),
        F.when(F.col("x2") > F.col("x1"), 1)
        .when(F.col("x2") < F.col("x1"), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    m = pairs.groupBy("event_type").agg(
        F.sum("sgn").cast("long").alias("s_total"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    v = (
        s.groupBy("event_type", "season")
        .agg(F.count(F.lit(1)).cast("long").alias("ng"))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("ng") * (F.col("ng") - 1) * (2 * F.col("ng") + 5))
            .cast("long")
            .alias("var18")
        )
    )
    j = m.join(v.withColumnRenamed("event_type", "et_v"), m["event_type"] == F.col("et_v"))
    corr = (
        F.when(F.col("s_total") > 0, 1.0)
        .when(F.col("s_total") < 0, -1.0)
        .otherwise(0.0)
    )
    return j.select(
        "event_type",
        "s_total",
        "n_pairs",
        "var18",
        (
            (F.col("s_total").cast("double") - corr)
            / F.sqrt(F.col("var18").cast("double") / 18.0)
        ).alias("z"),
    )


@query(
    "agg_fleiss_kappa",
    oracle=f"""
WITH g AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         ((user_id & 2147483647) * 2654435761) % 3 AS rater,
         event_type,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events
  GROUP BY 1, 2, 3
),
votes AS (
  SELECT d, rater, MIN(event_type) AS cat FROM (
    SELECT d, rater, event_type,
           ROW_NUMBER() OVER (PARTITION BY d, rater
                              ORDER BY cnt DESC, event_type) AS rk
    FROM g
  ) r WHERE rk = 1 GROUP BY d, rater
),
full_d AS (SELECT d FROM votes GROUP BY d HAVING COUNT(*) = 3),
v AS (SELECT votes.* FROM votes JOIN full_d f ON f.d = votes.d),
cell AS (
  SELECT d,
         {", ".join(f"CAST(COUNT(CASE WHEN cat = '{t}' THEN 1 END) AS BIGINT) AS n_{t}" for t in _TYPES)}
  FROM v GROUP BY d
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM({" + ".join(f"n_{t} * (n_{t} - 1)" for t in _TYPES)})
              AS BIGINT) AS agree_pairs,
         {", ".join(f"CAST(SUM(n_{t}) AS BIGINT) AS c_{t}" for t in _TYPES)}
  FROM cell
)
SELECT n_items, agree_pairs, {", ".join(f"c_{t}" for t in _TYPES)},
       CAST(agree_pairs AS DOUBLE) / (CAST(n_items AS DOUBLE) * 6.0) AS p_bar,
       {" + ".join(
         f"(CAST(c_{t} AS DOUBLE) / (CAST(n_items AS DOUBLE) * 3.0))"
         f" * (CAST(c_{t} AS DOUBLE) / (CAST(n_items AS DOUBLE) * 3.0))"
         for t in _TYPES)} AS p_e,
       (CAST(agree_pairs AS DOUBLE) / (CAST(n_items AS DOUBLE) * 6.0)
        - ({" + ".join(
          f"(CAST(c_{t} AS DOUBLE) / (CAST(n_items AS DOUBLE) * 3.0))"
          f" * (CAST(c_{t} AS DOUBLE) / (CAST(n_items AS DOUBLE) * 3.0))"
          for t in _TYPES)}))
       / (1.0 - ({" + ".join(
          f"(CAST(c_{t} AS DOUBLE) / (CAST(n_items AS DOUBLE) * 3.0))"
          f" * (CAST(c_{t} AS DOUBLE) / (CAST(n_items AS DOUBLE) * 3.0))"
          for t in _TYPES)})) AS fleiss_kappa
FROM m
""",
    category="aggregations",
)
def agg_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa for THREE raters — the multi-rater agreement
    statistic agg_cohens_kappa (two raters) can't give, the metric
    every labeling/RLHF pipeline reports per annotation batch:
    raters are the three deterministic hash cohorts, items are days,
    and each rater's "label" is its cohort's modal event type that
    day (deterministic argmax, ties to the alphabetically first).
    P_bar comes from the exact integer agreeing-pair count
    sum_i sum_j n_ij(n_ij-1) over N items x 3 raters (pairs per
    item = 6), P_e from the five pivoted category totals — both
    combine in ONE fixed-order double expression.  Scale: one
    (day, rater, type) groupBy; everything after is calendar-
    bounded."""
    e = table(spark, sf_dir, "events")
    rater = (F.col("user_id").bitwiseAND(2147483647) * 2654435761) % 3
    g = e.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
        rater.alias("rater"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w_rk = Window.partitionBy("d", "rater").orderBy(
        F.desc("cnt"), F.asc("event_type")
    )
    votes = (
        g.select("d", "rater", "event_type", F.row_number().over(w_rk).alias("rk"))
        .where(F.col("rk") == 1)
        .groupBy("d", "rater")
        .agg(F.min("event_type").alias("cat"))
    )
    full_d = votes.groupBy("d").agg(F.count(F.lit(1)).alias("k")).where(
        F.col("k") == 3
    )
    v = votes.join(full_d.select("d"), "d")
    cell = v.groupBy("d").agg(
        *[
            F.count(F.when(F.col("cat") == t, 1)).cast("long").alias(f"n_{t}")
            for t in _TYPES
        ]
    )
    agree = None
    for t in _TYPES:
        tt = F.col(f"n_{t}") * (F.col(f"n_{t}") - 1)
        agree = tt if agree is None else agree + tt
    m = cell.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(agree).cast("long").alias("agree_pairs"),
        *[F.sum(f"n_{t}").cast("long").alias(f"c_{t}") for t in _TYPES],
    )
    dn = F.col("n_items").cast("double")
    p_bar = F.col("agree_pairs").cast("double") / (dn * 6.0)
    p_e = None
    for t in _TYPES:
        share = F.col(f"c_{t}").cast("double") / (dn * 3.0)
        tt = share * share
        p_e = tt if p_e is None else p_e + tt
    return m.select(
        "n_items",
        "agree_pairs",
        *[F.col(f"c_{t}") for t in _TYPES],
        p_bar.alias("p_bar"),
        p_e.alias("p_e"),
        ((p_bar - p_e) / (1.0 - p_e)).alias("fleiss_kappa"),
    )


@query(
    "agg_poisson_rate_test",
    oracle="""
WITH m AS (
  SELECT event_type,
         CAST(COUNT(CASE WHEN CAST(date_trunc('day', ts) AS DATE)
                              < DATE '2024-01-16' THEN 1 END) AS BIGINT) AS k1,
         CAST(COUNT(CASE WHEN CAST(date_trunc('day', ts) AS DATE)
                              >= DATE '2024-01-16' THEN 1 END) AS BIGINT) AS k2
  FROM events GROUP BY event_type
)
SELECT event_type, k1, k2,
       CAST(k1 AS DOUBLE) / 15.0 AS rate1,
       CAST(k2 AS DOUBLE) / 15.0 AS rate2,
       (CAST(k1 AS DOUBLE) / 15.0 - CAST(k2 AS DOUBLE) / 15.0)
         / sqrt(CAST(k1 AS DOUBLE) / 225.0 + CAST(k2 AS DOUBLE) / 225.0) AS z,
       (CAST(k1 AS DOUBLE) - CAST(k1 + k2 AS DOUBLE) / 2.0)
         / sqrt(CAST(k1 + k2 AS DOUBLE) / 4.0) AS z_conditional
FROM m
""",
    category="aggregations",
)
def agg_poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Poisson rate test per event type — did the event
    RATE change between the two 15-day halves of the month (the
    volume-drift companion to agg_mcnemar's membership drift):
    counts k1, k2 are exact integers; the Wald z on the rate
    difference and the conditional (binomial) z — which tests
    k1 ~ Bin(k1+k2, 1/2) under equal exposure — are each one fixed
    double expression per type row.  Scale: one conditional
    aggregation, two counters per type."""
    e = table(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", F.col("ts")))
    m = e.groupBy("event_type").agg(
        F.count(F.when(day < F.lit("2024-01-16").cast("date"), 1))
        .cast("long")
        .alias("k1"),
        F.count(F.when(day >= F.lit("2024-01-16").cast("date"), 1))
        .cast("long")
        .alias("k2"),
    )
    d1 = F.col("k1").cast("double")
    d2 = F.col("k2").cast("double")
    tot = (F.col("k1") + F.col("k2")).cast("double")
    return m.select(
        "event_type",
        "k1",
        "k2",
        (d1 / 15.0).alias("rate1"),
        (d2 / 15.0).alias("rate2"),
        ((d1 / 15.0 - d2 / 15.0) / F.sqrt(d1 / 225.0 + d2 / 225.0)).alias("z"),
        ((d1 - tot / 2.0) / F.sqrt(tot / 4.0)).alias("z_conditional"),
    )


@query(
    "agg_wilcoxon_signed_rank",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
a AS (SELECT d, x FROM g WHERE event_type = 'click'),
b AS (SELECT d, x FROM g WHERE event_type = 'purchase'),
p AS (
  SELECT a.x - b.x AS diff, ABS(a.x - b.x) AS adiff
  FROM a JOIN b ON a.d = b.d
  WHERE a.x <> b.x
),
per_v AS (
  SELECT adiff,
         CAST(COUNT(CASE WHEN diff > 0 THEN 1 END) AS BIGINT) AS npos,
         CAST(COUNT(*) AS BIGINT) AS nt
  FROM p GROUP BY adiff
),
rk AS (
  SELECT npos, nt,
         2 * (CAST(COALESCE(SUM(nt) OVER (ORDER BY adiff
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT))
           + nt + 1 AS rank2
  FROM per_v
),
m AS (
  SELECT CAST(SUM(npos * rank2) AS BIGINT) AS w2_pos,
         CAST(SUM(nt) AS BIGINT) AS n,
         CAST(SUM(nt * rank2) AS BIGINT) AS w2_all
  FROM rk
)
SELECT n, w2_pos,
       CAST(w2_pos AS DOUBLE) / 2.0 AS w_plus,
       (CAST(w2_pos AS DOUBLE) / 2.0
        - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)
       / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
              * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0) AS z
FROM m
""",
    category="aggregations",
)
def agg_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on the paired click-purchase daily
    differences — the magnitude-aware upgrade of agg_sign_test
    (which throws the |difference| ranks away): zero differences
    drop (the standard convention), |diff| midranks stay integer at
    2x via the agg_mann_whitney doubling on the |diff| value grid,
    W+ = sum of positive-diff ranks is carried as the integer 2W+,
    and the normal-approximation z is one fixed double expression.
    Scale: the grid machinery is day-bounded; one ordered pass."""
    g = _day_grid(spark, sf_dir)
    a = g.where(F.col("event_type") == "click").select("d", F.col("x").alias("xa"))
    b = g.where(F.col("event_type") == "purchase").select(
        F.col("d").alias("d2"), F.col("x").alias("xb")
    )
    p = (
        a.join(b, a["d"] == b["d2"])
        .where(F.col("xa") != F.col("xb"))
        .select(
            (F.col("xa") - F.col("xb")).alias("diff"),
            F.abs(F.col("xa") - F.col("xb")).alias("adiff"),
        )
    )
    per_v = p.groupBy("adiff").agg(
        F.count(F.when(F.col("diff") > 0, 1)).cast("long").alias("npos"),
        F.count(F.lit(1)).cast("long").alias("nt"),
    )
    w_prev = Window.orderBy("adiff").rowsBetween(Window.unboundedPreceding, -1)
    rk = per_v.select(
        "npos",
        "nt",
        (
            2 * F.coalesce(F.sum("nt").over(w_prev), F.lit(0)).cast("long")
            + F.col("nt")
            + 1
        ).alias("rank2"),
    )
    m = rk.agg(
        F.sum(F.col("npos") * F.col("rank2")).cast("long").alias("w2_pos"),
        F.sum("nt").cast("long").alias("n"),
    )
    dn = F.col("n").cast("double")
    w_plus = F.col("w2_pos").cast("double") / 2.0
    return m.select(
        "n",
        "w2_pos",
        w_plus.alias("w_plus"),
        (
            (w_plus - dn * (dn + 1.0) / 4.0)
            / F.sqrt(dn * (dn + 1.0) * (2.0 * dn + 1.0) / 24.0)
        ).alias("z"),
    )


@query(
    "agg_ljung_box",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
s AS (
  SELECT event_type, d, x,
         CAST(COUNT(*) OVER wt AS BIGINT) AS n,
         CAST(SUM(x) OVER wt AS BIGINT) AS sx
  FROM g WINDOW wt AS (PARTITION BY event_type)
),
dd AS (
  SELECT event_type, d, n, n * x - sx AS dev,
         lag(n * x - sx, 1) OVER wo AS l1,
         lag(n * x - sx, 2) OVER wo AS l2,
         lag(n * x - sx, 3) OVER wo AS l3,
         lag(n * x - sx, 4) OVER wo AS l4,
         lag(n * x - sx, 5) OVER wo AS l5
  FROM s WINDOW wo AS (PARTITION BY event_type ORDER BY d)
),
m AS (
  SELECT event_type, MAX(n) AS n,
         SUM(CAST(dev AS HUGEINT) * dev) AS den,
         SUM(CAST(dev AS HUGEINT) * l1) AS c1,
         SUM(CAST(dev AS HUGEINT) * l2) AS c2,
         SUM(CAST(dev AS HUGEINT) * l3) AS c3,
         SUM(CAST(dev AS HUGEINT) * l4) AS c4,
         SUM(CAST(dev AS HUGEINT) * l5) AS c5
  FROM dd GROUP BY event_type
),
r AS (
  SELECT event_type, CAST(n AS BIGINT) AS n,
         CAST(CAST(den AS VARCHAR) AS DOUBLE) AS dden,
         CAST(CAST(c1 AS VARCHAR) AS DOUBLE) AS dc1,
         CAST(CAST(c2 AS VARCHAR) AS DOUBLE) AS dc2,
         CAST(CAST(c3 AS VARCHAR) AS DOUBLE) AS dc3,
         CAST(CAST(c4 AS VARCHAR) AS DOUBLE) AS dc4,
         CAST(CAST(c5 AS VARCHAR) AS DOUBLE) AS dc5
  FROM m
),
rr AS (
  SELECT event_type, n,
         dc1 / dden AS r1, dc2 / dden AS r2, dc3 / dden AS r3,
         dc4 / dden AS r4, dc5 / dden AS r5
  FROM r
)
SELECT event_type, n, r1, r2, r3, r4, r5,
       CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
         * (r1 * r1 / (CAST(n AS DOUBLE) - 1.0)
            + r2 * r2 / (CAST(n AS DOUBLE) - 2.0)
            + r3 * r3 / (CAST(n AS DOUBLE) - 3.0)
            + r4 * r4 / (CAST(n AS DOUBLE) - 4.0)
            + r5 * r5 / (CAST(n AS DOUBLE) - 5.0)) AS lb_stat
FROM rr
""",
    category="aggregations",
)
def agg_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box autocorrelation test (lags 1-5) per daily-revenue
    series — is the series white noise, the diagnostic run on
    forecast residuals (agg_holt_linear) and on agg_autocorr's
    single-lag readout generalized: deviations are N-scaled integers
    (dev = N*x - S, the agg_page_hinkley lattice), each lag-k
    autocovariance and the variance are EXACT HUGEINT/DECIMAL(38,0)
    sums crossing into doubles via VARCHAR (the correctly-rounded
    route), r_k = c_k/c_0 per row, and Q = n(n+2) sum r_k^2/(n-k)
    is one fixed-order expression over the five fixed lags.  Scale:
    five lags + one hash-agg over the bounded day grid."""
    g = _day_grid(spark, sf_dir)
    wt = Window.partitionBy("event_type")
    s = g.select(
        "event_type",
        "d",
        "x",
        F.count(F.lit(1)).over(wt).cast("long").alias("n"),
        F.sum("x").over(wt).cast("long").alias("sx"),
    )
    wo = Window.partitionBy("event_type").orderBy("d")
    dev = F.col("n") * F.col("x") - F.col("sx")
    dd = s.select(
        "event_type",
        "d",
        "n",
        dev.alias("dev"),
        *[F.lag(dev, k).over(wo).alias(f"l{k}") for k in range(1, 6)],
    )
    m = dd.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(F.col("dev").cast("decimal(38,0)") * F.col("dev")).alias("den"),
        *[
            F.sum(F.col("dev").cast("decimal(38,0)") * F.col(f"l{k}")).alias(
                f"c{k}"
            )
            for k in range(1, 6)
        ],
    )
    r = m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("den").cast("string").cast("double").alias("dden"),
        *[
            F.col(f"c{k}").cast("string").cast("double").alias(f"dc{k}")
            for k in range(1, 6)
        ],
    )
    rr = r.select(
        "event_type",
        "n",
        *[(F.col(f"dc{k}") / F.col("dden")).alias(f"r{k}") for k in range(1, 6)],
    )
    dn = F.col("n").cast("double")
    q = None
    for k in range(1, 6):
        tt = F.col(f"r{k}") * F.col(f"r{k}") / (dn - float(k))
        q = tt if q is None else q + tt
    return rr.select(
        "event_type",
        "n",
        "r1",
        "r2",
        "r3",
        "r4",
        "r5",
        (dn * (dn + 2.0) * q).alias("lb_stat"),
    )


@query(
    "agg_durbin_watson",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
s AS (
  SELECT event_type, d, x,
         CAST(COUNT(*) OVER wt AS BIGINT) AS n,
         CAST(SUM(x) OVER wt AS BIGINT) AS sx
  FROM g WINDOW wt AS (PARTITION BY event_type)
),
dd AS (
  SELECT event_type, n, n * x - sx AS dev,
         lag(n * x - sx) OVER (PARTITION BY event_type ORDER BY d) AS pdev
  FROM s
),
m AS (
  SELECT event_type, MAX(n) AS n,
         SUM(CAST(dev AS HUGEINT) * dev) AS den,
         SUM(CASE WHEN pdev IS NULL THEN CAST(0 AS HUGEINT)
                  ELSE CAST(dev - pdev AS HUGEINT) * (dev - pdev) END) AS num
  FROM dd GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(CAST(num AS VARCHAR) AS DOUBLE)
         / CAST(CAST(den AS VARCHAR) AS DOUBLE) AS dw_stat
FROM m
""",
    category="aggregations",
)
def agg_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson first-order autocorrelation statistic per daily
    series — the 0..4 gauge (2 = no autocorrelation, <2 positive)
    every regression residual check starts with, here on the
    mean-removed series: deviations are N-scaled integers, the
    squared-difference numerator and squared denominator are exact
    HUGEINT/DECIMAL(38,0) sums (first day contributes 0 to the
    numerator, the standard convention), and DW is ONE double
    division over the VARCHAR-routed casts.  Scale: one lag + one
    hash-agg over the bounded day grid."""
    g = _day_grid(spark, sf_dir)
    wt = Window.partitionBy("event_type")
    s = g.select(
        "event_type",
        "d",
        "x",
        F.count(F.lit(1)).over(wt).cast("long").alias("n"),
        F.sum("x").over(wt).cast("long").alias("sx"),
    )
    wo = Window.partitionBy("event_type").orderBy("d")
    dev = F.col("n") * F.col("x") - F.col("sx")
    dd = s.select(
        "event_type",
        "n",
        dev.alias("dev"),
        F.lag(dev).over(wo).alias("pdev"),
    )
    diff = F.col("dev") - F.col("pdev")
    m = dd.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(F.col("dev").cast("decimal(38,0)") * F.col("dev")).alias("den"),
        F.sum(
            F.when(F.col("pdev").isNull(), F.lit(0).cast("decimal(38,0)"))
            .otherwise(diff.cast("decimal(38,0)") * diff)
        ).alias("num"),
    )
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (
            F.col("num").cast("string").cast("double")
            / F.col("den").cast("string").cast("double")
        ).alias("dw_stat"),
    )


# 10 fixed cent-buckets (width 5000) for the distribution distances —
# a FIXED domain, so per-bucket counts pivot to one row and the
# cross-bucket combinations run in fixed evaluation order.
_DIST_BUCKETS = list(range(10))


@query(
    "agg_distribution_distance",
    oracle=f"""
WITH t AS (
  SELECT CASE WHEN ((user_id & 2147483647) * 2654435761) % 4294967296 < 2147483648
              THEN 1 ELSE 0 END AS is_a,
         LEAST(9, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 5000)
           AS bucket
  FROM events WHERE event_type = 'purchase'
),
m AS (
  SELECT
    {", ".join(f"CAST(SUM(CASE WHEN bucket = {b} THEN is_a ELSE 0 END) AS BIGINT) AS a_{b}" for b in _DIST_BUCKETS)},
    {", ".join(f"CAST(SUM(CASE WHEN bucket = {b} THEN 1 - is_a ELSE 0 END) AS BIGINT) AS b_{b}" for b in _DIST_BUCKETS)},
    CAST(SUM(is_a) AS BIGINT) AS n_a,
    CAST(SUM(1 - is_a) AS BIGINT) AS n_b
  FROM t
)
SELECT n_a, n_b,
       CAST({" + ".join(f"ABS(a_{b} * n_b - b_{b} * n_a)" for b in _DIST_BUCKETS)}
            AS BIGINT) AS tv_num,
       CAST({" + ".join(f"ABS(a_{b} * n_b - b_{b} * n_a)" for b in _DIST_BUCKETS)}
            AS DOUBLE) / (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
         AS total_variation,
       {" + ".join(f"sqrt((CAST(a_{b} AS DOUBLE) / CAST(n_a AS DOUBLE)) * (CAST(b_{b} AS DOUBLE) / CAST(n_b AS DOUBLE)))" for b in _DIST_BUCKETS)}
         AS bhattacharyya,
       sqrt(1.0 - ({" + ".join(f"sqrt((CAST(a_{b} AS DOUBLE) / CAST(n_a AS DOUBLE)) * (CAST(b_{b} AS DOUBLE) / CAST(n_b AS DOUBLE)))" for b in _DIST_BUCKETS)}))
         AS hellinger
FROM m
""",
    category="aggregations",
)
def agg_distribution_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution distances between the hash arms' purchase-value
    histograms — the drift gauges a feature store monitors (TV for
    the worst-case bucket gap, Hellinger/Bhattacharyya for the
    geometric overlap): the 10 fixed 50-dollar buckets pivot to one
    row of integer counts, total variation's numerator
    sum |a_i*N_b - b_i*N_a| is EXACT int64 (common-denominator
    trick — fixed-order integer adds), and the Bhattacharyya
    coefficient chains ten sqrt terms in fixed order (each sqrt sees
    the identical quotient of exact integers in both engines).
    Scale: one conditional aggregation over 22 counters."""
    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    is_a = F.when(
        (F.col("user_id").bitwiseAND(2147483647) * 2654435761) % 4294967296
        < 2147483648,
        1,
    ).otherwise(0)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    t = ev.select(
        is_a.alias("is_a"),
        F.least(F.lit(9), F.expr(
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) DIV 5000"
        )).alias("bucket"),
    )
    m = t.agg(
        *[
            F.sum(F.when(F.col("bucket") == b, F.col("is_a")).otherwise(0))
            .cast("long")
            .alias(f"a_{b}")
            for b in _DIST_BUCKETS
        ],
        *[
            F.sum(F.when(F.col("bucket") == b, 1 - F.col("is_a")).otherwise(0))
            .cast("long")
            .alias(f"b_{b}")
            for b in _DIST_BUCKETS
        ],
        F.sum("is_a").cast("long").alias("n_a"),
        F.sum(1 - F.col("is_a")).cast("long").alias("n_b"),
    )
    tv_num = None
    bc = None
    for b in _DIST_BUCKETS:
        term = F.abs(
            F.col(f"a_{b}") * F.col("n_b") - F.col(f"b_{b}") * F.col("n_a")
        )
        tv_num = term if tv_num is None else tv_num + term
        sq = F.sqrt(
            (F.col(f"a_{b}").cast("double") / F.col("n_a").cast("double"))
            * (F.col(f"b_{b}").cast("double") / F.col("n_b").cast("double"))
        )
        bc = sq if bc is None else bc + sq
    return m.select(
        "n_a",
        "n_b",
        tv_num.cast("long").alias("tv_num"),
        (
            tv_num.cast("double")
            / (2.0 * F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        ).alias("total_variation"),
        bc.alias("bhattacharyya"),
        F.sqrt(1.0 - bc).alias("hellinger"),
    )


@query(
    "agg_wasserstein_1d",
    oracle="""
WITH t AS (
  SELECT CASE WHEN ((user_id & 2147483647) * 2654435761) % 4294967296 < 2147483648
              THEN 1 ELSE 0 END AS is_a,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
per_v AS (
  SELECT cents,
         CAST(SUM(is_a) AS BIGINT) AS na,
         CAST(SUM(1 - is_a) AS BIGINT) AS nb
  FROM t GROUP BY cents
),
w AS (
  SELECT cents, na, nb,
         SUM(na) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
         SUM(nb) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
         lead(cents) OVER (ORDER BY cents) AS next_v,
         SUM(na) OVER () AS n_a, SUM(nb) OVER () AS n_b
  FROM per_v
),
m AS (
  SELECT MAX(n_a) AS n_a, MAX(n_b) AS n_b,
         SUM(CASE WHEN next_v IS NULL THEN CAST(0 AS HUGEINT)
                  ELSE ABS(CAST(ca AS HUGEINT) * n_b - CAST(cb AS HUGEINT) * n_a)
                       * (next_v - cents) END) AS num
  FROM w
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(CAST(num AS VARCHAR) AS DOUBLE)
         / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) / 100.0
         AS wasserstein_dollars
FROM m
""",
    category="aggregations",
)
def agg_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein (earth mover's) distance between the hash
    arms' purchase values — the drift metric that, unlike
    agg_distribution_distance's bucket overlaps, knows HOW FAR the
    mass moved: W1 = integral |F_a - F_b| reduces on the cents grid
    to sum |cumA_i*N_b - cumB_i*N_a| * gap_i — an EXACT
    HUGEINT/DECIMAL(38,0) sum (common-denominator CDFs, integer
    gaps) crossing into doubles via VARCHAR, with one division by
    N_a*N_b and one by 100 to read out in dollars.  Scale: one grid
    groupBy + one ordered pass; exactness is scale-free."""
    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    is_a = F.when(
        (F.col("user_id").bitwiseAND(2147483647) * 2654435761) % 4294967296
        < 2147483648,
        1,
    ).otherwise(0)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    t = ev.select(is_a.alias("is_a"), cents.alias("cents"))
    per_v = t.groupBy("cents").agg(
        F.sum("is_a").cast("long").alias("na"),
        F.sum(1 - F.col("is_a")).cast("long").alias("nb"),
    )
    w_cum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    w_next = Window.orderBy("cents")
    w = per_v.select(
        "cents",
        F.sum("na").over(w_cum).alias("ca"),
        F.sum("nb").over(w_cum).alias("cb"),
        F.lead("cents").over(w_next).alias("next_v"),
        F.sum("na").over(w_all).alias("n_a"),
        F.sum("nb").over(w_all).alias("n_b"),
    )
    num = F.when(F.col("next_v").isNull(), F.lit(0).cast("decimal(38,0)")).otherwise(
        F.abs(
            F.col("ca").cast("decimal(38,0)") * F.col("n_b")
            - F.col("cb").cast("decimal(38,0)") * F.col("n_a")
        )
        * (F.col("next_v") - F.col("cents"))
    )
    m = w.agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.sum(num).alias("num"),
    )
    return m.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        (
            F.col("num").cast("string").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            / 100.0
        ).alias("wasserstein_dollars"),
    )


@query(
    "agg_bowley_skew",
    oracle=f"""
WITH c AS (
  SELECT event_type, {_CENTS_SQL} AS cents FROM events
),
grid AS (
  SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM c GROUP BY event_type, cents
),
w AS (
  SELECT event_type, cents, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM grid
),
q AS (
  SELECT event_type, MAX(n) AS n,
         MIN(CASE WHEN cum >= (n + 3) // 4 THEN cents END) AS q1,
         MIN(CASE WHEN cum >= (n + 1) // 2 THEN cents END)
       + MIN(CASE WHEN cum >= n // 2 + 1 THEN cents END) AS med2,
         MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN cents END) AS q3
  FROM w GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(q1 AS BIGINT) AS q1_cents,
       CAST(med2 AS BIGINT) AS med2_cents,
       CAST(q3 AS BIGINT) AS q3_cents,
       CAST(q1 + q3 - med2 AS BIGINT) AS skew_num,
       CAST(q1 + q3 - med2 AS DOUBLE) / CAST(q3 - q1 AS DOUBLE)
         AS bowley_skew
FROM q
""",
    category="aggregations",
)
def agg_bowley_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowley (quartile) skewness per event type — the robust
    skewness agg_jarque_bera's moment-based estimate complements
    (outlier-immune, purely order-statistic): with the doubled
    median 2*med = med_lo + med_hi, the numerator q1 + q3 - 2*med
    is exactly q1 + q3 - med2 — an integer off the same ceil-rank
    cents-grid machinery as agg_tukey_outliers — and Bowley's
    coefficient is ONE double division by the IQR.  Scale: grid
    windows only (value-domain-bounded)."""
    e = table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    grid = (
        e.select("event_type", cents.alias("cents"))
        .groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    w = grid.select(
        "event_type",
        "cents",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    q = w.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(F.expr("CASE WHEN cum >= (n + 3) DIV 4 THEN cents END")).alias("q1"),
        (
            F.min(F.expr("CASE WHEN cum >= (n + 1) DIV 2 THEN cents END"))
            + F.min(F.expr("CASE WHEN cum >= n DIV 2 + 1 THEN cents END"))
        ).alias("med2"),
        F.min(F.expr("CASE WHEN cum >= (3 * n + 3) DIV 4 THEN cents END")).alias(
            "q3"
        ),
    )
    num = F.col("q1") + F.col("q3") - F.col("med2")
    return q.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("q1").cast("long").alias("q1_cents"),
        F.col("med2").cast("long").alias("med2_cents"),
        F.col("q3").cast("long").alias("q3_cents"),
        num.cast("long").alias("skew_num"),
        (num.cast("double") / (F.col("q3") - F.col("q1")).cast("double")).alias(
            "bowley_skew"
        ),
    )


@query(
    "agg_pacf",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
s AS (
  SELECT event_type, d, x,
         CAST(COUNT(*) OVER wt AS BIGINT) AS n,
         CAST(SUM(x) OVER wt AS BIGINT) AS sx
  FROM g WINDOW wt AS (PARTITION BY event_type)
),
dd AS (
  SELECT event_type, n, n * x - sx AS dev,
         lag(n * x - sx, 1) OVER wo AS l1,
         lag(n * x - sx, 2) OVER wo AS l2
  FROM s WINDOW wo AS (PARTITION BY event_type ORDER BY d)
),
m AS (
  SELECT event_type, MAX(n) AS n,
         SUM(CAST(dev AS HUGEINT) * dev) AS den,
         SUM(CAST(dev AS HUGEINT) * l1) AS c1,
         SUM(CAST(dev AS HUGEINT) * l2) AS c2
  FROM dd GROUP BY event_type
),
r AS (
  SELECT event_type, CAST(n AS BIGINT) AS n,
         CAST(CAST(c1 AS VARCHAR) AS DOUBLE)
           / CAST(CAST(den AS VARCHAR) AS DOUBLE) AS r1,
         CAST(CAST(c2 AS VARCHAR) AS DOUBLE)
           / CAST(CAST(den AS VARCHAR) AS DOUBLE) AS r2
  FROM m
)
SELECT event_type, n, r1, r2,
       r1 AS pacf1,
       (r2 - r1 * r1) / (1.0 - r1 * r1) AS pacf2
FROM r
""",
    category="aggregations",
)
def agg_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation (lags 1-2, Durbin-Levinson) per daily
    series — the AR-order diagnostic next to agg_ljung_box's
    portmanteau (an AR(1) process shows pacf2 ~ 0 however large r2
    is): the lag-1/2 autocovariances and variance are the same exact
    HUGEINT/DECIMAL(38,0) sums on the N-scaled deviation lattice,
    crossing to doubles via VARCHAR; pacf1 = r1 and pacf2 =
    (r2 - r1^2)/(1 - r1^2) are fixed-shape expressions per type row.
    Scale: two lags + one hash-agg over the bounded day grid."""
    g = _day_grid(spark, sf_dir)
    wt = Window.partitionBy("event_type")
    s = g.select(
        "event_type",
        "d",
        "x",
        F.count(F.lit(1)).over(wt).cast("long").alias("n"),
        F.sum("x").over(wt).cast("long").alias("sx"),
    )
    wo = Window.partitionBy("event_type").orderBy("d")
    dev = F.col("n") * F.col("x") - F.col("sx")
    dd = s.select(
        "event_type",
        "n",
        dev.alias("dev"),
        F.lag(dev, 1).over(wo).alias("l1"),
        F.lag(dev, 2).over(wo).alias("l2"),
    )
    m = dd.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(F.col("dev").cast("decimal(38,0)") * F.col("dev")).alias("den"),
        F.sum(F.col("dev").cast("decimal(38,0)") * F.col("l1")).alias("c1"),
        F.sum(F.col("dev").cast("decimal(38,0)") * F.col("l2")).alias("c2"),
    )
    dden = F.col("den").cast("string").cast("double")
    r1 = F.col("c1").cast("string").cast("double") / dden
    r2 = F.col("c2").cast("string").cast("double") / dden
    r = m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        r1.alias("r1"),
        r2.alias("r2"),
    )
    return r.select(
        "event_type",
        "n",
        "r1",
        "r2",
        F.col("r1").alias("pacf1"),
        (
            (F.col("r2") - F.col("r1") * F.col("r1"))
            / (1.0 - F.col("r1") * F.col("r1"))
        ).alias("pacf2"),
    )


@query(
    "agg_turning_points",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
t AS (
  SELECT event_type, x,
         lag(x) OVER wo AS px, lead(x) OVER wo AS nx,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM g WINDOW wo AS (PARTITION BY event_type ORDER BY d)
),
m AS (
  SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN (px < x AND nx < x) OR (px > x AND nx > x)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_turning
  FROM t WHERE px IS NOT NULL AND nx IS NOT NULL
  GROUP BY event_type
)
SELECT event_type, n, n_turning,
       CAST(3 * n_turning - 2 * (n - 2) AS BIGINT) AS excess_x3,
       CAST(3 * n_turning - 2 * (n - 2) AS DOUBLE)
         / (3.0 * sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0)) AS z
FROM m
""",
    category="aggregations",
)
def agg_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point randomness test per daily series — the
    complement of agg_runs_test (which looks at signs vs the median;
    this counts LOCAL EXTREMA): an i.i.d. series has E[T] = 2(n-2)/3
    turning points, so too few flags trend/momentum and too many
    flags oscillation.  The count is exact integer comparisons on
    interior days, the excess is carried 3x-scaled to stay integer
    (3T - 2(n-2)), and z divides it by 3*sqrt((16n-29)/90) — ONE
    fixed expression.  Scale: one lag/lead pass over the bounded day
    grid."""
    g = _day_grid(spark, sf_dir)
    wo = Window.partitionBy("event_type").orderBy("d")
    wt = Window.partitionBy("event_type")
    t = g.select(
        "event_type",
        "x",
        F.lag("x").over(wo).alias("px"),
        F.lead("x").over(wo).alias("nx"),
        F.count(F.lit(1)).over(wt).alias("n"),
    ).where(F.col("px").isNotNull() & F.col("nx").isNotNull())
    turning = (
        ((F.col("px") < F.col("x")) & (F.col("nx") < F.col("x")))
        | ((F.col("px") > F.col("x")) & (F.col("nx") > F.col("x")))
    )
    m = t.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.sum(F.when(turning, 1).otherwise(0)).cast("long").alias("n_turning"),
    )
    excess = 3 * F.col("n_turning") - 2 * (F.col("n") - 2)
    return m.select(
        "event_type",
        "n",
        "n_turning",
        excess.cast("long").alias("excess_x3"),
        (
            excess.cast("double")
            / (3.0 * F.sqrt((16.0 * F.col("n").cast("double") - 29.0) / 90.0))
        ).alias("z"),
    )


@query(
    "agg_cross_correlation",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
a AS (SELECT d, x FROM g WHERE event_type = 'click'),
b AS (SELECT d, x FROM g WHERE event_type = 'purchase'),
p AS (
  SELECT a.d, a.x AS xa, b.x AS xb,
         ROW_NUMBER() OVER (ORDER BY a.d) AS idx
  FROM a JOIN b ON b.d = a.d
),
s AS (
  SELECT p.*,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(SUM(xa) OVER () AS BIGINT) AS sa,
         CAST(SUM(xb) OVER () AS BIGINT) AS sb
  FROM p
),
dd AS (
  SELECT idx, n, n * xa - sa AS da, n * xb - sb AS db,
         lag(n * xb - sb, 1) OVER (ORDER BY idx) AS db_m1,
         lag(n * xb - sb, 2) OVER (ORDER BY idx) AS db_m2,
         lead(n * xb - sb, 1) OVER (ORDER BY idx) AS db_p1,
         lead(n * xb - sb, 2) OVER (ORDER BY idx) AS db_p2
  FROM s
),
m AS (
  SELECT MAX(n) AS n,
         SUM(CAST(da AS HUGEINT) * da) AS va,
         SUM(CAST(db AS HUGEINT) * db) AS vb,
         SUM(CAST(da AS HUGEINT) * db_m2) AS cm2,
         SUM(CAST(da AS HUGEINT) * db_m1) AS cm1,
         SUM(CAST(da AS HUGEINT) * db) AS c0,
         SUM(CAST(da AS HUGEINT) * db_p1) AS cp1,
         SUM(CAST(da AS HUGEINT) * db_p2) AS cp2
  FROM dd
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(CAST(cm2 AS VARCHAR) AS DOUBLE)
         / sqrt(CAST(CAST(va AS VARCHAR) AS DOUBLE)
                * CAST(CAST(vb AS VARCHAR) AS DOUBLE)) AS ccf_m2,
       CAST(CAST(cm1 AS VARCHAR) AS DOUBLE)
         / sqrt(CAST(CAST(va AS VARCHAR) AS DOUBLE)
                * CAST(CAST(vb AS VARCHAR) AS DOUBLE)) AS ccf_m1,
       CAST(CAST(c0 AS VARCHAR) AS DOUBLE)
         / sqrt(CAST(CAST(va AS VARCHAR) AS DOUBLE)
                * CAST(CAST(vb AS VARCHAR) AS DOUBLE)) AS ccf_0,
       CAST(CAST(cp1 AS VARCHAR) AS DOUBLE)
         / sqrt(CAST(CAST(va AS VARCHAR) AS DOUBLE)
                * CAST(CAST(vb AS VARCHAR) AS DOUBLE)) AS ccf_p1,
       CAST(CAST(cp2 AS VARCHAR) AS DOUBLE)
         / sqrt(CAST(CAST(va AS VARCHAR) AS DOUBLE)
                * CAST(CAST(vb AS VARCHAR) AS DOUBLE)) AS ccf_p2
FROM m
""",
    category="aggregations",
)
def agg_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between the click and purchase
    daily series at lags -2..+2 — does click revenue LEAD purchase
    revenue (the lead-lag question agg_corr's contemporaneous
    Pearson can't answer; ccf_p1 > ccf_0 says purchases follow
    clicks by a day): deviations are N-scaled integers on the paired
    day grid, every lagged cross-product sum and both variances are
    exact HUGEINT/DECIMAL(38,0), and each of the five fixed-lag
    correlations is one double expression over the VARCHAR-routed
    casts (unmatched edge rows drop from the lag sums — the standard
    truncated-CCF convention).  Scale: lags + one aggregation over
    the bounded paired grid."""
    g = _day_grid(spark, sf_dir)
    a = g.where(F.col("event_type") == "click").select("d", F.col("x").alias("xa"))
    b = g.where(F.col("event_type") == "purchase").select(
        F.col("d").alias("d2"), F.col("x").alias("xb")
    )
    p = a.join(b, a["d"] == b["d2"]).select("d", "xa", "xb")
    w_all = Window.partitionBy()
    wo = Window.orderBy("d")
    s = p.select(
        "d",
        "xa",
        "xb",
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
        F.sum("xa").over(w_all).cast("long").alias("sa"),
        F.sum("xb").over(w_all).cast("long").alias("sb"),
    )
    da = F.col("n") * F.col("xa") - F.col("sa")
    db = F.col("n") * F.col("xb") - F.col("sb")
    dd = s.select(
        "n",
        da.alias("da"),
        db.alias("db"),
        F.lag(db, 1).over(wo).alias("db_m1"),
        F.lag(db, 2).over(wo).alias("db_m2"),
        F.lead(db, 1).over(wo).alias("db_p1"),
        F.lead(db, 2).over(wo).alias("db_p2"),
    )
    dec = lambda c: F.col("da").cast("decimal(38,0)") * F.col(c)  # noqa: E731
    m = dd.agg(
        F.max("n").alias("n"),
        F.sum(dec("da")).alias("va"),
        F.sum(F.col("db").cast("decimal(38,0)") * F.col("db")).alias("vb"),
        F.sum(dec("db_m2")).alias("cm2"),
        F.sum(dec("db_m1")).alias("cm1"),
        F.sum(dec("db")).alias("c0"),
        F.sum(dec("db_p1")).alias("cp1"),
        F.sum(dec("db_p2")).alias("cp2"),
    )
    denom = F.sqrt(
        F.col("va").cast("string").cast("double")
        * F.col("vb").cast("string").cast("double")
    )
    return m.select(
        F.col("n").cast("long").alias("n_days"),
        (F.col("cm2").cast("string").cast("double") / denom).alias("ccf_m2"),
        (F.col("cm1").cast("string").cast("double") / denom).alias("ccf_m1"),
        (F.col("c0").cast("string").cast("double") / denom).alias("ccf_0"),
        (F.col("cp1").cast("string").cast("double") / denom).alias("ccf_p1"),
        (F.col("cp2").cast("string").cast("double") / denom).alias("ccf_p2"),
    )


@query(
    "win_rolling_beta",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
a AS (SELECT d, x FROM g WHERE event_type = 'purchase'),
b AS (SELECT d, x FROM g WHERE event_type = 'click'),
p AS (
  SELECT a.d, a.x AS y, b.x AS x FROM a JOIN b ON b.d = a.d
),
w AS (
  SELECT d, y, x,
         COUNT(*) OVER w10 AS n10,
         SUM(CAST(x AS HUGEINT)) OVER w10 AS sx,
         SUM(CAST(y AS HUGEINT)) OVER w10 AS sy,
         SUM(CAST(x AS HUGEINT) * x) OVER w10 AS sxx,
         SUM(CAST(x AS HUGEINT) * y) OVER w10 AS sxy
  FROM p
  WINDOW w10 AS (ORDER BY d ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
),
q AS (
  SELECT d, y, x,
         10 * sxy - sx * sy AS cov_s,
         10 * sxx - sx * sx AS var_s
  FROM w WHERE n10 = 10
)
SELECT strftime(d, '%Y-%m-%d') AS day, y AS purchase_x, x AS click_x,
       CAST(CAST(cov_s AS VARCHAR) AS DOUBLE)
         / CAST(CAST(var_s AS VARCHAR) AS DOUBLE) AS beta,
       CAST(CASE WHEN cov_s > 0 THEN 1 WHEN cov_s < 0 THEN -1 ELSE 0 END
            AS BIGINT) AS cov_sign
FROM q
""",
    category="windows",
)
def win_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 10-day regression beta of purchase revenue on click
    revenue — the trailing sensitivity coefficient (how many purchase
    cents move per click cent this fortnight), the pairs-trading /
    marketing-mix primitive win_rolling_slope computes against TIME
    and this computes against a second SERIES: the windowed moment
    sums run in HUGEINT/DECIMAL(38,0) (x*y products pass int64 once
    daily sums pass ~2^31 cents), the n-fold scale clears both means
    (cov_s = 10*Sxy - SxSy), and beta is ONE double division over
    the VARCHAR-routed casts per row.  Scale: one paired join + one
    trailing frame over the bounded day grid."""
    g = _day_grid(spark, sf_dir)
    a = g.where(F.col("event_type") == "purchase").select(
        "d", F.col("x").alias("y")
    )
    b = g.where(F.col("event_type") == "click").select(
        F.col("d").alias("d2"), F.col("x").alias("xx")
    )
    p = a.join(b, a["d"] == b["d2"]).select("d", "y", F.col("xx").alias("x"))
    w10 = Window.orderBy("d").rowsBetween(-9, 0)
    xd = F.col("x").cast("decimal(38,0)")
    w = p.select(
        "d",
        "y",
        "x",
        F.count(F.lit(1)).over(w10).alias("n10"),
        F.sum(xd).over(w10).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).over(w10).alias("sy"),
        F.sum(xd * F.col("x")).over(w10).alias("sxx"),
        F.sum(xd * F.col("y")).over(w10).alias("sxy"),
    ).where(F.col("n10") == 10)
    cov_s = 10 * F.col("sxy") - F.col("sx") * F.col("sy")
    var_s = 10 * F.col("sxx") - F.col("sx") * F.col("sx")
    q = w.select("d", "y", "x", cov_s.alias("cov_s"), var_s.alias("var_s"))
    return q.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("y").alias("purchase_x"),
        F.col("x").alias("click_x"),
        (
            F.col("cov_s").cast("string").cast("double")
            / F.col("var_s").cast("string").cast("double")
        ).alias("beta"),
        F.when(F.col("cov_s") > 0, 1)
        .when(F.col("cov_s") < 0, -1)
        .otherwise(0)
        .cast("long")
        .alias("cov_sign"),
    )


_WEEKDAYS = list(range(7))  # Mon..Sun as Spark weekday() == DuckDB isodow-1


@query(
    "agg_anova_weekday",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
s AS (
  SELECT isodow(d) - 1 AS wd, x FROM g WHERE event_type = 'click'
),
m AS (
  SELECT
    {", ".join(f"CAST(COUNT(CASE WHEN wd = {w} THEN 1 END) AS BIGINT) AS n_{w}" for w in _WEEKDAYS)},
    {", ".join(f"CAST(SUM(CASE WHEN wd = {w} THEN x END) AS BIGINT) AS s_{w}" for w in _WEEKDAYS)},
    SUM(CAST(x AS HUGEINT) * x) AS ssq,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(x) AS BIGINT) AS st
  FROM s
)
SELECT n, CAST(6 AS BIGINT) AS df_between, CAST(n - 7 AS BIGINT) AS df_within,
       ({" + ".join(f"CAST(s_{w} AS DOUBLE) * CAST(s_{w} AS DOUBLE) / CAST(n_{w} AS DOUBLE)" for w in _WEEKDAYS)})
         - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE)
         AS ss_between,
       CAST(CAST(ssq AS VARCHAR) AS DOUBLE)
         - ({" + ".join(f"CAST(s_{w} AS DOUBLE) * CAST(s_{w} AS DOUBLE) / CAST(n_{w} AS DOUBLE)" for w in _WEEKDAYS)})
         AS ss_within,
       (({" + ".join(f"CAST(s_{w} AS DOUBLE) * CAST(s_{w} AS DOUBLE) / CAST(n_{w} AS DOUBLE)" for w in _WEEKDAYS)})
        - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
       / 6.0
       / ((CAST(CAST(ssq AS VARCHAR) AS DOUBLE)
           - ({" + ".join(f"CAST(s_{w} AS DOUBLE) * CAST(s_{w} AS DOUBLE) / CAST(n_{w} AS DOUBLE)" for w in _WEEKDAYS)}))
          / (CAST(n AS DOUBLE) - 7.0)) AS f_stat
FROM m
""",
    category="aggregations",
)
def agg_anova_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of click daily revenue across the seven weekdays
    — does the MEAN differ by day-of-week (the means companion to
    agg_brown_forsythe's variance test, and the parametric sibling of
    agg_seasonal_mann_kendall's de-seasonalizing): the weekday domain
    is FIXED (Monday-0..Sunday-6 via Spark weekday == DuckDB
    isodow-1 — Spark dayofweek and DuckDB dayofweek DISAGREE on the
    origin, the fn_date lesson), so per-group counts and sums pivot
    to one row of
    exact integers, the raw sum of squares runs in HUGEINT/DECIMAL
    (VARCHAR-routed), and SSB/SSW/F combine the integers in
    fixed-order double chains — no float aggregation across rows.
    Scale: one conditional aggregation over 16 counters on the
    bounded day grid."""
    g = _day_grid(spark, sf_dir)
    s = g.where(F.col("event_type") == "click").select(
        F.weekday("d").alias("wd"), "x"
    )
    m = s.agg(
        *[
            F.count(F.when(F.col("wd") == w, 1)).cast("long").alias(f"n_{w}")
            for w in _WEEKDAYS
        ],
        *[
            F.sum(F.when(F.col("wd") == w, F.col("x"))).cast("long").alias(f"s_{w}")
            for w in _WEEKDAYS
        ],
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("ssq"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("st"),
    )
    grp = None
    for w in _WEEKDAYS:
        tt = (
            F.col(f"s_{w}").cast("double")
            * F.col(f"s_{w}").cast("double")
            / F.col(f"n_{w}").cast("double")
        )
        grp = tt if grp is None else grp + tt
    ssb = grp - F.col("st").cast("double") * F.col("st").cast("double") / F.col(
        "n"
    ).cast("double")
    ssw = F.col("ssq").cast("string").cast("double") - grp
    return m.select(
        "n",
        F.lit(6).cast("long").alias("df_between"),
        (F.col("n") - 7).cast("long").alias("df_within"),
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        (ssb / 6.0 / (ssw / (F.col("n").cast("double") - 7.0))).alias("f_stat"),
    )


@query(
    "win_sharpe",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
s AS (SELECT d, x FROM g WHERE event_type = 'click'),
r AS (
  SELECT x - lag(x) OVER (ORDER BY d) AS r FROM s
),
m AS (
  SELECT CAST(COUNT(r) AS BIGINT) AS n,
         CAST(SUM(r) AS BIGINT) AS s1,
         SUM(CAST(r AS HUGEINT) * r) AS s2,
         CAST(SUM(LEAST(r, 0)) AS BIGINT) AS sd1,
         SUM(CAST(LEAST(r, 0) AS HUGEINT) * LEAST(r, 0)) AS sd2
  FROM r WHERE r IS NOT NULL
)
SELECT n, s1, sd1,
       CAST(s1 AS DOUBLE) / n AS mean_r,
       sqrt((CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
             - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) AS std_r,
       (CAST(s1 AS DOUBLE) / n)
         / sqrt((CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) AS sharpe,
       sqrt(CAST(CAST(sd2 AS VARCHAR) AS DOUBLE) / n) AS downside_dev,
       (CAST(s1 AS DOUBLE) / n)
         / sqrt(CAST(CAST(sd2 AS VARCHAR) AS DOUBLE) / n) AS sortino
FROM m
""",
    category="windows",
)
def win_sharpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharpe and Sortino ratios of the click daily-revenue changes —
    the risk-adjusted-return pair every portfolio/strategy readout
    carries (Sharpe divides mean return by the sample standard
    deviation; Sortino replaces the denominator with the DOWNSIDE
    deviation sqrt(sum min(r,0)^2 / n), penalizing only losses):
    day-over-day differences are exact integer cents from the bounded
    day grid, all power sums run exact (r^2 can pass 2^53 at sf0.1 so
    s2/sd2 go HUGEINT/DECIMAL(38,0) and cross to double via the
    VARCHAR route — the agg_jarque_bera rounding gotcha), and the
    final chains apply the SAME fixed-order double expression in both
    engines; sqrt is a single correctly-rounded IEEE op, so even the
    ratio columns are bit-reproducible. Scale: lag + rollup on the
    value-domain-bounded grid (~150 rows); the only unbounded pass is
    the grid aggregation itself."""
    g = _day_grid(spark, sf_dir)
    s = g.where(F.col("event_type") == "click").select("d", "x")
    w = Window.orderBy("d")
    r = s.select((F.col("x") - F.lag("x").over(w)).alias("r")).where(
        F.col("r").isNotNull()
    )
    rdec = F.col("r").cast("decimal(38,0)")
    neg = F.least(F.col("r"), F.lit(0))
    negdec = neg.cast("decimal(38,0)")
    m = r.agg(
        F.count("r").cast("long").alias("n"),
        F.sum("r").cast("long").alias("s1"),
        F.sum(rdec * F.col("r")).alias("s2"),
        F.sum(neg).cast("long").alias("sd1"),
        F.sum(negdec * neg).alias("sd2"),
    )
    n = F.col("n")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("string").cast("double")
    sd2d = F.col("sd2").cast("string").cast("double")
    mean_r = s1d / n
    std_r = F.sqrt((s2d - s1d * F.col("s1") / n) / (n - 1))
    ddev = F.sqrt(sd2d / n)
    return m.select(
        "n",
        "s1",
        "sd1",
        mean_r.alias("mean_r"),
        std_r.alias("std_r"),
        (mean_r / std_r).alias("sharpe"),
        ddev.alias("downside_dev"),
        (mean_r / ddev).alias("sortino"),
    )


# ------------------------------------------------------------------ #
# r10 wave 4: ordered-alternative trend tests, mean-centered Levene,
# and the pairwise-distance dispersion family
# ------------------------------------------------------------------ #


@query(
    "agg_jonckheere",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
pairs AS (
  SELECT CAST(SUM(CASE WHEN g1.x < g2.x THEN 2
                       WHEN g1.x = g2.x THEN 1 ELSE 0 END) AS BIGINT) AS j2
  FROM g g1 JOIN g g2 ON g1.event_type < g2.event_type
),
sizes AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(cnt * cnt) AS BIGINT) AS sn2,
         CAST(SUM(cnt * cnt * (2 * cnt + 3)) AS BIGINT) AS sn23
  FROM (SELECT COUNT(*) AS cnt FROM g GROUP BY event_type)
)
SELECT s.n, p.j2,
       (s.n * s.n - s.sn2) // 2 AS e_j2,
       s.n * s.n * (2 * s.n + 3) - s.sn23 AS var72,
       (CAST(p.j2 - (s.n * s.n - s.sn2) // 2 AS DOUBLE) / 2.0)
         / sqrt(CAST(s.n * s.n * (2 * s.n + 3) - s.sn23 AS DOUBLE) / 72.0)
         AS z
FROM pairs p, sizes s
""",
    category="aggregations",
)
def agg_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra test for an ORDERED alternative — the
    trend-aware upgrade of Kruskal-Wallis (which only detects "some
    group differs"): with groups ordered by event_type (the dose
    ordering here), J = sum over ordered group pairs of the
    Mann-Whitney count #{x_i < x_j}, ties at half weight.  J rides
    doubled (2 per strict win, 1 per tie — the house midrank trick),
    E[2J] = (N^2 - sum n_i^2)/2 and the 72-scaled null variance are
    exact integers, and z is one fixed-shape double expression
    (no-ties variance, the standard base form).  The pair join is
    bounded by the day grid (types x days); at raw-event scale the
    per-pair counts collapse to the value-grid prefix machinery
    (agg_mann_whitney's)."""
    g = _day_grid(spark, sf_dir)
    g1 = g.select(F.col("event_type").alias("t1"), F.col("x").alias("x1"))
    g2 = g.select(F.col("event_type").alias("t2"), F.col("x").alias("x2"))
    j2 = (
        g1.join(g2, F.col("t1") < F.col("t2"))
        .agg(
            F.sum(
                F.when(F.col("x1") < F.col("x2"), 2)
                .when(F.col("x1") == F.col("x2"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("j2")
        )
    )
    sizes = (
        g.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.sum("cnt").cast("long").alias("n"),
            F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("sn2"),
            F.sum(F.col("cnt") * F.col("cnt") * (2 * F.col("cnt") + 3))
            .cast("long")
            .alias("sn23"),
        )
    )
    m = j2.crossJoin(sizes)
    e_j2 = (F.col("n") * F.col("n") - F.col("sn2")) / 2
    var72 = (
        F.col("n") * F.col("n") * (2 * F.col("n") + 3) - F.col("sn23")
    )
    return m.select(
        "n",
        "j2",
        e_j2.cast("long").alias("e_j2"),
        var72.cast("long").alias("var72"),
        (
            (F.col("j2") - e_j2).cast("double")
            / 2.0
            / F.sqrt(var72.cast("double") / 72.0)
        ).alias("z"),
    )


_PAGE_ORDER = {t: i + 1 for i, t in enumerate(sorted(_TYPES))}
_PAGE_ORDER_SQL = "CASE event_type " + " ".join(
    f"WHEN '{t}' THEN {i}" for t, i in _PAGE_ORDER.items()
) + " END"


@query(
    "agg_page_l",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
full_days AS (
  SELECT d FROM g GROUP BY d HAVING COUNT(*) = {len(_TYPES)}
),
b AS (SELECT g.* FROM g JOIN full_days USING (d)),
rk AS (
  SELECT b1.d, b1.event_type,
         CAST(2 * SUM(CASE WHEN b2.x < b1.x THEN 1 ELSE 0 END)
              + SUM(CASE WHEN b2.x = b1.x THEN 1 ELSE 0 END) + 1
           AS BIGINT) AS rank2
  FROM b b1 JOIN b b2 ON b2.d = b1.d
  GROUP BY b1.d, b1.event_type
),
rs AS (
  SELECT event_type, CAST(SUM(rank2) AS BIGINT) AS r2
  FROM rk GROUP BY event_type
),
m AS (
  SELECT CAST(SUM(({_PAGE_ORDER_SQL}) * r2) AS BIGINT) AS l2,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM full_days) AS blocks
  FROM rs
)
SELECT blocks, l2,
       blocks * {len(_TYPES) * (len(_TYPES) + 1) ** 2} // 2 AS e_l2,
       blocks * {len(_TYPES) ** 2 * (len(_TYPES) - 1)
                 * (len(_TYPES) + 1) ** 2} AS var144,
       (CAST(l2 - blocks * {len(_TYPES) * (len(_TYPES) + 1) ** 2} // 2
         AS DOUBLE) / 2.0)
       / sqrt(CAST(blocks * {len(_TYPES) ** 2 * (len(_TYPES) - 1)
                             * (len(_TYPES) + 1) ** 2}
              AS DOUBLE) / 144.0) AS z
FROM m
""",
    category="aggregations",
)
def agg_page_l(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L trend test (Page 1963) — the ordered-alternative
    companion of agg_friedman_test: within each complete block (a
    day with all 5 event types), rank the treatments (midranks
    doubled, the within-block self-join count trick), then L = sum
    over treatments of (hypothesized order index) x (rank sum).
    With event types ordered alphabetically as the trend, 2L, E[2L]
    = b*k(k+1)^2/2 and the 144-scaled variance b*k^2(k-1)(k+1)^2
    are exact integers; z is one fixed double.  Blocks without all
    k treatments drop (the balanced-design requirement).  Bounded:
    the block join is k rows x k rows per day."""
    k = len(_TYPES)
    g = _day_grid(spark, sf_dir)
    full_days = (
        g.groupBy("d").agg(F.count(F.lit(1)).alias("c")).where(
            F.col("c") == k
        ).select("d")
    )
    b = g.join(F.broadcast(full_days), "d")
    b1 = b.select("d", "event_type", F.col("x").alias("x1"))
    b2 = b.select(F.col("d").alias("d2"), F.col("x").alias("x2"))
    rk = (
        b1.join(b2, F.col("d") == F.col("d2"))
        .groupBy("d", "event_type")
        .agg(
            (
                2 * F.sum(F.when(F.col("x2") < F.col("x1"), 1).otherwise(0))
                + F.sum(F.when(F.col("x2") == F.col("x1"), 1).otherwise(0))
                + 1
            )
            .cast("long")
            .alias("rank2")
        )
    )
    order_col = F.expr(_PAGE_ORDER_SQL)
    rs = rk.groupBy("event_type").agg(
        F.sum("rank2").cast("long").alias("r2")
    )
    m = rs.agg(
        F.sum(order_col * F.col("r2")).cast("long").alias("l2")
    ).crossJoin(
        full_days.agg(F.count(F.lit(1)).cast("long").alias("blocks"))
    )
    e_l2 = F.col("blocks") * (k * (k + 1) ** 2) / 2
    var144 = F.col("blocks") * (k**2 * (k - 1) * (k + 1) ** 2)
    return m.select(
        "blocks",
        "l2",
        e_l2.cast("long").alias("e_l2"),
        var144.cast("long").alias("var144"),
        (
            (F.col("l2") - e_l2).cast("double")
            / 2.0
            / F.sqrt(var144.cast("double") / 144.0)
        ).alias("z"),
    )


@query(
    "agg_levene_mean",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
full_days AS (
  SELECT d FROM g GROUP BY d HAVING COUNT(*) = {len(_TYPES)}
),
b AS (SELECT g.* FROM g JOIN full_days USING (d)),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM full_days),
grp AS (
  SELECT event_type, CAST(SUM(x) AS BIGINT) AS s
  FROM b GROUP BY event_type
),
z AS (
  SELECT b.event_type,
         CAST(ABS(nn.n * b.x - grp.s) AS BIGINT) AS zq
  FROM b JOIN grp USING (event_type) CROSS JOIN nn
),
t AS (
  SELECT event_type, CAST(SUM(zq) AS HUGEINT) AS tt
  FROM z GROUP BY event_type
),
gt AS (SELECT CAST(SUM(tt) AS HUGEINT) AS g FROM t),
num AS (
  SELECT SUM((CAST({len(_TYPES)} AS HUGEINT) * t.tt - gt.g)
             * ({len(_TYPES)} * t.tt - gt.g)) AS numh
  FROM t CROSS JOIN gt
),
den AS (
  SELECT SUM((CAST(nn.n AS HUGEINT) * z.zq - t.tt)
             * (nn.n * z.zq - t.tt)) AS denh
  FROM z JOIN t USING (event_type) CROSS JOIN nn
)
SELECT nn.n AS n_days,
       {len(_TYPES)} * nn.n AS n_total,
       CAST(CAST(num.numh AS VARCHAR) AS DOUBLE) AS num_d,
       CAST(CAST(den.denh AS VARCHAR) AS DOUBLE) AS den_d,
       (CAST({len(_TYPES)} * nn.n - {len(_TYPES)} AS DOUBLE)
        * CAST(nn.n AS DOUBLE)
        * CAST(CAST(num.numh AS VARCHAR) AS DOUBLE))
       / ({(len(_TYPES) - 1) * len(_TYPES) ** 2}.0
          * CAST(CAST(den.denh AS VARCHAR) AS DOUBLE)) AS w
FROM nn, num, den
""",
    category="aggregations",
)
def agg_levene_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene's variance-homogeneity test with MEAN centers (Levene
    1960) — the classical companion of agg_brown_forsythe's median
    variant: W = ((N-k)/(k-1)) * sum_i n(Zbar_i - Zbar)^2 /
    sum_ij (Z_ij - Zbar_i)^2 with Z = |x - groupmean|.  Mean centers
    make Z irrational on the raw grid, so the whole statistic runs
    on the n-SCALED lattice over the BALANCED panel (days all k
    types share): Z'_ij = |n*x_ij - S_i| is an exact integer, and
    algebra collapses W to ((N-k) * n * sum(k*T_i - G)^2) /
    ((k-1) * k^2 * sum(n*Z'_ij - T_i)^2) — numerator and denominator
    exact in DECIMAL(38,0)/HUGEINT, crossing to double via the
    VARCHAR route (the agg_jarque_bera rounding rule), one final
    fixed-shape division.  Balanced-panel restriction is what makes
    the single scale n exist; the unbalanced case is Brown-Forsythe
    territory."""
    k = len(_TYPES)
    g = _day_grid(spark, sf_dir)
    full_days = (
        g.groupBy("d").agg(F.count(F.lit(1)).alias("c")).where(
            F.col("c") == k
        ).select("d")
    )
    b = g.join(F.broadcast(full_days), "d")
    n_days = full_days.agg(F.count(F.lit(1)).cast("long").alias("n"))
    grp = b.groupBy("event_type").agg(F.sum("x").cast("long").alias("s"))
    z = (
        b.join(F.broadcast(grp), "event_type")
        .crossJoin(F.broadcast(n_days))
        .select(
            "event_type",
            "n",
            F.abs(F.col("n") * F.col("x") - F.col("s"))
            .cast("long")
            .alias("zq"),
        )
    )
    t = z.groupBy("event_type").agg(
        F.sum(F.col("zq").cast("decimal(38,0)")).alias("tt")
    )
    gt = t.agg(F.sum("tt").cast("decimal(38,0)").alias("g"))
    num = (
        t.crossJoin(F.broadcast(gt))
        .agg(
            F.sum(
                (F.lit(k).cast("decimal(38,0)") * F.col("tt") - F.col("g"))
                * (F.lit(k) * F.col("tt") - F.col("g"))
            ).alias("numh")
        )
    )
    den = (
        z.join(F.broadcast(t), "event_type")
        .agg(
            F.sum(
                (F.col("n").cast("decimal(38,0)") * F.col("zq") - F.col("tt"))
                * (F.col("n") * F.col("zq") - F.col("tt"))
            ).alias("denh")
        )
    )
    m = n_days.crossJoin(num).crossJoin(den)
    num_d = F.col("numh").cast("string").cast("double")
    den_d = F.col("denh").cast("string").cast("double")
    return m.select(
        F.col("n").alias("n_days"),
        (F.lit(k) * F.col("n")).cast("long").alias("n_total"),
        num_d.alias("num_d"),
        den_d.alias("den_d"),
        (
            (F.lit(k) * F.col("n") - k).cast("double")
            * F.col("n").cast("double")
            * num_d
            / (F.lit(float((k - 1) * k**2)) * den_d)
        ).alias("w"),
    )


_ED_PREFIX_SQL = """
  SELECT v, ca, cb,
         SUM(ca) OVER w AS cum_a,
         SUM(ca * v) OVER w AS cums_a,
         SUM(cb) OVER w AS cum_b,
         SUM(cb * v) OVER w AS cums_b,
         SUM(ca) OVER () AS tot_a,
         SUM(ca * v) OVER () AS tots_a,
         SUM(cb) OVER () AS tot_b,
         SUM(cb * v) OVER () AS tots_b
  FROM u
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@query(
    "agg_energy_distance",
    oracle=f"""
WITH c AS (
  SELECT event_type, {_CENTS_SQL} AS v FROM events
  WHERE event_type IN ('click', 'purchase')
),
u AS (
  SELECT v,
         CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
           AS ca,
         CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
           AS cb
  FROM c GROUP BY v
),
w AS ({_ED_PREFIX_SQL}),
s AS (
  SELECT
    CAST(SUM(cb * (v * cum_a - cums_a + (tots_a - cums_a)
                   - v * (tot_a - cum_a))) AS BIGINT) AS s_ab,
    CAST(SUM(ca * (v * cum_a - cums_a + (tots_a - cums_a)
                   - v * (tot_a - cum_a))) AS BIGINT) AS s_aa,
    CAST(SUM(cb * (v * cum_b - cums_b + (tots_b - cums_b)
                   - v * (tot_b - cum_b))) AS BIGINT) AS s_bb,
    CAST(MAX(tot_a) AS BIGINT) AS n,
    CAST(MAX(tot_b) AS BIGINT) AS m
  FROM w
)
SELECT n, m, s_ab, s_aa, s_bb,
       2.0 * CAST(s_ab AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE))
       - CAST(s_aa AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
       - CAST(s_bb AS DOUBLE) / (CAST(m AS DOUBLE) * CAST(m AS DOUBLE))
         AS energy_dist2
FROM s
""",
    category="aggregations",
)
def agg_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy distance between the click and purchase value samples
    (Székely & Rizzo) — the metric two-sample statistic D^2 =
    2E|X-Y| - E|X-X'| - E|Y-Y'|: zero iff the distributions are
    equal, the basis of the energy two-sample/k-sample tests and of
    distance correlation.  The three pairwise |.| sums are exact
    int64 WITHOUT a pair join: on the cents value grid, the sorted
    prefix identity sum_b |v - b| = v*cnt_le - sum_le + sum_gt -
    v*cnt_gt collapses each to one ordered cumulative pass (the
    agg_wasserstein_1d CDF discipline) — O(distinct values), never
    O(n*m).  Self-pair sums count ordered pairs, matching the n^2 /
    m^2 normalizations; the final combination is one fixed-shape
    double expression over exact integers.  The grid window is
    value-domain-bounded (the documented bounded-grid exemption);
    at scale the grid itself shards by value range."""
    e = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    u = e.select(F.col("event_type").alias("t"), cents.alias("v")).groupBy(
        "v"
    ).agg(
        F.count(F.when(F.col("t") == "click", 1)).cast("long").alias("ca"),
        F.count(F.when(F.col("t") == "purchase", 1)).cast("long").alias("cb"),
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    w = u.select(
        "v",
        "ca",
        "cb",
        F.sum("ca").over(wc).alias("cum_a"),
        F.sum(F.col("ca") * F.col("v")).over(wc).alias("cums_a"),
        F.sum("cb").over(wc).alias("cum_b"),
        F.sum(F.col("cb") * F.col("v")).over(wc).alias("cums_b"),
        F.sum("ca").over(wt).alias("tot_a"),
        F.sum(F.col("ca") * F.col("v")).over(wt).alias("tots_a"),
        F.sum("cb").over(wt).alias("tot_b"),
        F.sum(F.col("cb") * F.col("v")).over(wt).alias("tots_b"),
    )

    def against_a(cnt: str):
        return F.col(cnt) * (
            F.col("v") * F.col("cum_a")
            - F.col("cums_a")
            + (F.col("tots_a") - F.col("cums_a"))
            - F.col("v") * (F.col("tot_a") - F.col("cum_a"))
        )

    def against_b(cnt: str):
        return F.col(cnt) * (
            F.col("v") * F.col("cum_b")
            - F.col("cums_b")
            + (F.col("tots_b") - F.col("cums_b"))
            - F.col("v") * (F.col("tot_b") - F.col("cum_b"))
        )

    s = w.agg(
        F.sum(against_a("cb")).cast("long").alias("s_ab"),
        F.sum(against_a("ca")).cast("long").alias("s_aa"),
        F.sum(against_b("cb")).cast("long").alias("s_bb"),
        F.max("tot_a").cast("long").alias("n"),
        F.max("tot_b").cast("long").alias("m"),
    )
    dn, dm = F.col("n").cast("double"), F.col("m").cast("double")
    return s.select(
        "n",
        "m",
        "s_ab",
        "s_aa",
        "s_bb",
        (
            2.0 * F.col("s_ab").cast("double") / (dn * dm)
            - F.col("s_aa").cast("double") / (dn * dn)
            - F.col("s_bb").cast("double") / (dm * dm)
        ).alias("energy_dist2"),
    )


@query(
    "agg_gini_mean_diff",
    oracle=f"""
WITH c AS (
  SELECT event_type, {_CENTS_SQL} AS v FROM events
),
u AS (
  SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM c GROUP BY event_type, v
),
w AS (
  SELECT event_type, v, cnt,
         SUM(cnt) OVER pw AS cum,
         SUM(cnt * v) OVER pw AS cums,
         SUM(cnt) OVER p AS tot,
         SUM(cnt * v) OVER p AS tots
  FROM u
  WINDOW pw AS (PARTITION BY event_type ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         p AS (PARTITION BY event_type)
),
s AS (
  SELECT event_type,
         CAST(SUM(cnt * (v * cum - cums + (tots - cums)
                         - v * (tot - cum))) AS BIGINT) AS s_abs,
         CAST(MAX(tot) AS BIGINT) AS n
  FROM w GROUP BY event_type
)
SELECT event_type, n, s_abs,
       CAST(s_abs AS DOUBLE)
         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS gmd_cents
FROM s
""",
    category="aggregations",
)
def agg_gini_mean_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini mean difference per event type — E|X-X'| over distinct
    draws, the dispersion measure underlying the Gini coefficient
    (agg_gini's Lorenz form equals GMD/(2*mean)) and the robust
    scale estimator competing with the IQR: the ordered-pair
    absolute sum is exact int64 via the same per-partition sorted
    prefix identity as agg_energy_distance (one cumulative pass over
    the per-type value grid, never a pair join), divided by n(n-1).
    Value-domain-bounded windows partitioned by type."""
    e = table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    u = e.select("event_type", cents.alias("v")).groupBy(
        "event_type", "v"
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    pw = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = Window.partitionBy("event_type")
    w = u.select(
        "event_type",
        "v",
        "cnt",
        F.sum("cnt").over(pw).alias("cum"),
        F.sum(F.col("cnt") * F.col("v")).over(pw).alias("cums"),
        F.sum("cnt").over(p).alias("tot"),
        F.sum(F.col("cnt") * F.col("v")).over(p).alias("tots"),
    )
    s = w.groupBy("event_type").agg(
        F.sum(
            F.col("cnt")
            * (
                F.col("v") * F.col("cum")
                - F.col("cums")
                + (F.col("tots") - F.col("cums"))
                - F.col("v") * (F.col("tot") - F.col("cum"))
            )
        )
        .cast("long")
        .alias("s_abs"),
        F.max("tot").cast("long").alias("n"),
    )
    dn = F.col("n").cast("double")
    return s.select(
        "event_type",
        "n",
        "s_abs",
        (F.col("s_abs").cast("double") / (dn * (dn - 1.0))).alias(
            "gmd_cents"
        ),
    )


@query(
    "agg_brunner_munzel",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
c AS (
  SELECT x AS v,
         CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
           AS ca,
         CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
           AS cb
  FROM g WHERE event_type IN ('click', 'purchase')
  GROUP BY x
),
w AS (
  SELECT v, ca, cb,
         COALESCE(SUM(ca + cb) OVER pw, 0) AS less_all,
         COALESCE(SUM(ca) OVER pw, 0) AS less_a,
         COALESCE(SUM(cb) OVER pw, 0) AS less_b,
         SUM(ca) OVER () AS n, SUM(cb) OVER () AS m
  FROM c
  WINDOW pw AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING)
),
r AS (
  SELECT v, ca, cb, n, m,
         2 * less_all + (ca + cb) + 1 AS r2c,
         2 * less_a + ca + 1 AS r2a,
         2 * less_b + cb + 1 AS r2b
  FROM w
),
t AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(m) AS BIGINT) AS m,
         CAST(SUM(ca * r2c) AS BIGINT) AS t2_a,
         CAST(SUM(cb * r2c) AS BIGINT) AS t2_b
  FROM r
),
e AS (
  SELECT
    CAST(SUM(r.ca * (t.n * (r.r2c - r.r2a) - t.t2_a + t.n * (t.n + 1))
             * (t.n * (r.r2c - r.r2a) - t.t2_a + t.n * (t.n + 1)))
      AS BIGINT) AS e_a,
    CAST(SUM(r.cb * (t.m * (r.r2c - r.r2b) - t.t2_b + t.m * (t.m + 1))
             * (t.m * (r.r2c - r.r2b) - t.t2_b + t.m * (t.m + 1)))
      AS BIGINT) AS e_b
  FROM r CROSS JOIN t
)
SELECT t.n, t.m, t.t2_a, t.t2_b, e.e_a, e.e_b,
       CAST(t.t2_b - t.m * (t.m + 1) AS DOUBLE)
         / (2.0 * CAST(t.n AS DOUBLE) * CAST(t.m AS DOUBLE)) AS p_hat,
       CAST(t.n * t.t2_b - t.m * t.t2_a AS DOUBLE)
         / (CAST(t.n + t.m AS DOUBLE)
            * sqrt(CAST(e.e_a AS DOUBLE)
                     / (CAST(t.n AS DOUBLE) * (CAST(t.n AS DOUBLE) - 1.0))
                   + CAST(e.e_b AS DOUBLE)
                     / (CAST(t.m AS DOUBLE) * (CAST(t.m AS DOUBLE) - 1.0))))
         AS t_stat
FROM t CROSS JOIN e
""",
    category="aggregations",
)
def agg_brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brunner-Munzel test (2000) — the nonparametric Behrens-Fisher
    problem: does P(X < Y) + P(X = Y)/2 differ from 1/2, WITHOUT
    Mann-Whitney's equal-variance assumption (the test R's
    brunner.munzel.test runs; the recommended default over
    wilcox.test when spreads differ).  Fully exact internals on the
    doubled-midrank lattice: combined and within-sample midranks
    come off ONE value-grid cumulative pass (2R = 2*cnt_less + ties
    + 1), the rank-mean deviations are scaled by n_i to stay
    integer (e_k = n_i*(2Rc - 2Ri) - T2_i + n_i(n_i+1), exact at
    scale 2n_i), and the two squared-deviation sums E_A/E_B are
    exact int64.  p_hat and the t statistic are fixed-shape double
    expressions over those integers (T = (n*T2_B - m*T2_A) /
    (N*sqrt(E_A/(n(n-1)) + E_B/(m(m-1)))), the algebraic collapse
    of n1*n2*(mean_r2-mean_r1)/(N*sqrt(n1*v1+n2*v2)) onto the 2x
    lattice).  One grid pass, bounded windows."""
    g = _day_grid(spark, sf_dir).where(
        F.col("event_type").isin("click", "purchase")
    )
    c = g.groupBy(F.col("x").alias("v")).agg(
        F.count(F.when(F.col("event_type") == "click", 1))
        .cast("long")
        .alias("ca"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("long")
        .alias("cb"),
    )
    pw = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    tot = Window.partitionBy()
    r = c.select(
        "v",
        "ca",
        "cb",
        F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(pw), F.lit(0)).alias(
            "less_all"
        ),
        F.coalesce(F.sum("ca").over(pw), F.lit(0)).alias("less_a"),
        F.coalesce(F.sum("cb").over(pw), F.lit(0)).alias("less_b"),
        F.sum("ca").over(tot).alias("n"),
        F.sum("cb").over(tot).alias("m"),
    ).select(
        "v",
        "ca",
        "cb",
        "n",
        "m",
        (2 * F.col("less_all") + F.col("ca") + F.col("cb") + 1).alias("r2c"),
        (2 * F.col("less_a") + F.col("ca") + 1).alias("r2a"),
        (2 * F.col("less_b") + F.col("cb") + 1).alias("r2b"),
    )
    t = r.agg(
        F.max("n").cast("long").alias("n"),
        F.max("m").cast("long").alias("m"),
        F.sum(F.col("ca") * F.col("r2c")).cast("long").alias("t2_a"),
        F.sum(F.col("cb") * F.col("r2c")).cast("long").alias("t2_b"),
    )
    j = r.drop("n", "m").crossJoin(F.broadcast(t))
    ea_term = (
        F.col("n") * (F.col("r2c") - F.col("r2a"))
        - F.col("t2_a")
        + F.col("n") * (F.col("n") + 1)
    )
    eb_term = (
        F.col("m") * (F.col("r2c") - F.col("r2b"))
        - F.col("t2_b")
        + F.col("m") * (F.col("m") + 1)
    )
    e = j.agg(
        F.sum(F.col("ca") * ea_term * ea_term).cast("long").alias("e_a"),
        F.sum(F.col("cb") * eb_term * eb_term).cast("long").alias("e_b"),
    )
    mrow = t.crossJoin(e)
    dn, dm = F.col("n").cast("double"), F.col("m").cast("double")
    return mrow.select(
        "n",
        "m",
        "t2_a",
        "t2_b",
        "e_a",
        "e_b",
        (
            (F.col("t2_b") - F.col("m") * (F.col("m") + 1)).cast("double")
            / (2.0 * dn * dm)
        ).alias("p_hat"),
        (
            (F.col("n") * F.col("t2_b") - F.col("m") * F.col("t2_a")).cast(
                "double"
            )
            / (
                (dn + dm)
                * F.sqrt(
                    F.col("e_a").cast("double") / (dn * (dn - 1.0))
                    + F.col("e_b").cast("double") / (dm * (dm - 1.0))
                )
            )
        ).alias("t_stat"),
    )
