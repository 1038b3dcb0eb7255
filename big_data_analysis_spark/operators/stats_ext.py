"""Second statistics wave (SURVEY.md §2.4/§2.5 additions): rank
correlation between two series (Kendall tau-b), non-parametric trend
(Mann-Kendall), inter-rater agreement (Cohen's kappa), randomness
(Wald-Wolfowitz runs), and two anomaly/forecast windows (rolling
z-score flags, seasonal-naive error).

Shared discipline with the first statistics tier
(operators/aggregations.py agg_corr/agg_ks_test/...): every statistic
is assembled from EXACT integer counts/sums over cents so the final
one-or-two double operations have the identical operand values and
expression shape in both engines — bit-reproducible despite divisions
and square roots.

Scale note shared by the day-grid operators: the per-(event_type,
day) rollup is bounded by the VALUE DOMAIN (5 types x 30 days here;
types x days generally), not by row count — the O(grid^2) pair joins
below are constant-size however large events grows.  What grows with
data is the one groupBy producing the grid (a single shuffle with
map-side partial aggregation).  Squared daily sums exceed int64 once
daily volume passes ~2^31 cents, so every squared comparison runs in
DECIMAL(38,0) (Spark) / HUGEINT (DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import table
from ..registry import query

# Exact cents from the double `value` column: the decimal cast is the
# engine-portable way to read back the fixture's 2-decimal payload.
_CENTS_SQL = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"

# Shared day grid: per-(event_type, day) exact cent sums.
_GRID_SQL = f"""
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(SUM({_CENTS_SQL}) AS BIGINT) AS x
  FROM events
  GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
"""


def _day_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, day) exact cent sums, materialized ONCE via an
    eager localCheckpoint: the statistics below reference the grid
    from several plan branches (self-joins, tie rollups), and without
    the checkpoint Catalyst re-scans and re-aggregates the raw events
    table once per branch (11 Exchanges in agg_mann_kendall's naive
    plan — measured). The grid is value-domain-bounded (types × days),
    so materializing it costs one tiny job and every branch reuses the
    same ~150 rows."""
    e = table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    grid = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).agg(F.sum(cents).alias("x"))
    return grid.localCheckpoint(eager=True)


@query(
    "agg_kendall_tau",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
a AS (SELECT d, x FROM g WHERE event_type = 'click'),
b AS (SELECT d, x FROM g WHERE event_type = 'purchase'),
s AS (
  SELECT a.d, a.x AS xa, b.x AS xb
  FROM a JOIN b ON a.d = b.d
),
p AS (
  SELECT CASE WHEN (s2.xa - s1.xa) * (s2.xb - s1.xb) > 0 THEN 1 ELSE 0 END AS conc,
         CASE WHEN (s2.xa - s1.xa) * (s2.xb - s1.xb) < 0 THEN 1 ELSE 0 END AS disc,
         CASE WHEN s2.xa = s1.xa THEN 1 ELSE 0 END AS tie_a,
         CASE WHEN s2.xb = s1.xb THEN 1 ELSE 0 END AS tie_b
  FROM s s1 JOIN s s2 ON s1.d < s2.d
)
SELECT CAST(SUM(conc) AS BIGINT) AS n_concordant,
       CAST(SUM(disc) AS BIGINT) AS n_discordant,
       CAST(SUM(tie_a) AS BIGINT) AS n_tie_a,
       CAST(SUM(tie_b) AS BIGINT) AS n_tie_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(conc) - SUM(disc) AS DOUBLE)
         / (sqrt(CAST(COUNT(*) - SUM(tie_a) AS DOUBLE))
            * sqrt(CAST(COUNT(*) - SUM(tie_b) AS DOUBLE))) AS tau_b
FROM p
""",
    category="aggregations",
)
def agg_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between the click and purchase
    daily-revenue series — the robust alternative to agg_corr's
    Pearson (exact pair concordance counts instead of float moments)
    and to agg_spearman (tau handles ties via the b-correction that
    the concordant/discordant/tie counts make exact).  The pair join
    runs on the bounded 30-day grid (module docstring: O(days^2)
    pairs regardless of event volume); products of cent deltas stay
    int64 until daily sums pass ~2^31 cents — beyond that the sign
    test would move to DECIMAL like win_zscore_anomaly's.  tau_b's
    two sqrts see identical exact integers in both engines."""
    g = _day_grid(spark, sf_dir)
    a = g.where(F.col("event_type") == "click").select("d", F.col("x").alias("xa"))
    b = g.where(F.col("event_type") == "purchase").select(
        F.col("d").alias("d2"), F.col("x").alias("xb")
    )
    s = a.join(b, a["d"] == b["d2"]).select("d", "xa", "xb")
    s1 = s.select(
        F.col("d").alias("d1"), F.col("xa").alias("xa1"), F.col("xb").alias("xb1")
    )
    s2 = s.select(
        F.col("d").alias("d2"), F.col("xa").alias("xa2"), F.col("xb").alias("xb2")
    )
    pairs = s1.join(s2, F.col("d1") < F.col("d2"))
    prod = (F.col("xa2") - F.col("xa1")) * (F.col("xb2") - F.col("xb1"))
    agg = pairs.agg(
        F.sum(F.when(prod > 0, 1).otherwise(0)).alias("n_concordant"),
        F.sum(F.when(prod < 0, 1).otherwise(0)).alias("n_discordant"),
        F.sum(F.when(F.col("xa1") == F.col("xa2"), 1).otherwise(0)).alias("n_tie_a"),
        F.sum(F.when(F.col("xb1") == F.col("xb2"), 1).otherwise(0)).alias("n_tie_b"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    nc, nd = F.col("n_concordant"), F.col("n_discordant")
    np_, ta, tb = F.col("n_pairs"), F.col("n_tie_a"), F.col("n_tie_b")
    tau = (nc - nd).cast("double") / (
        F.sqrt((np_ - ta).cast("double")) * F.sqrt((np_ - tb).cast("double"))
    )
    return agg.select(
        "n_concordant", "n_discordant", "n_tie_a", "n_tie_b", "n_pairs",
        tau.alias("tau_b"),
    )


@query(
    "agg_mann_kendall",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
p AS (
  SELECT g1.event_type,
         CASE WHEN g2.x > g1.x THEN 1 WHEN g2.x < g1.x THEN -1 ELSE 0 END AS sgn
  FROM g g1 JOIN g g2 ON g1.event_type = g2.event_type AND g1.d < g2.d
),
s AS (
  SELECT event_type, CAST(SUM(sgn) AS BIGINT) AS s_stat
  FROM p GROUP BY event_type
),
n AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
  FROM g GROUP BY event_type
),
ties AS (
  SELECT event_type,
         CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie18
  FROM (SELECT event_type, x, COUNT(*) AS t FROM g GROUP BY event_type, x) tg
  WHERE t > 1
  GROUP BY event_type
)
SELECT s.event_type, n.n_days, s.s_stat,
       CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
            - COALESCE(ties.tie18, 0) AS BIGINT) AS var18,
       CASE WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE)
                 / sqrt(CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                             - COALESCE(ties.tie18, 0) AS DOUBLE) / 18.0)
            WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE)
                 / sqrt(CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                             - COALESCE(ties.tie18, 0) AS DOUBLE) / 18.0)
            ELSE 0.0 END AS z_stat
FROM s
JOIN n ON n.event_type = s.event_type
LEFT JOIN ties ON ties.event_type = s.event_type
""",
    category="aggregations",
)
def agg_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per event type over the daily-revenue
    series: S = sum over day pairs i<j of sign(x_j - x_i), the
    standard tie-corrected variance (18*Var = n(n-1)(2n+5) -
    sum t(t-1)(2t+5) over tie groups), and the continuity-corrected
    z.  The distribution-free "is this metric drifting?" monitor —
    no slope model, no normality assumption (contrast
    agg_linear_regression).  S, n, and 18*Var are exact integers;
    z's single sqrt+divide sees identical operands in both engines.
    Pair join bounded by the day grid (module docstring)."""
    g = _day_grid(spark, sf_dir)
    g1 = g.select(
        F.col("event_type").alias("et"), F.col("d").alias("d1"), F.col("x").alias("x1")
    )
    g2 = g.select(
        F.col("event_type").alias("et2"), F.col("d").alias("d2"), F.col("x").alias("x2")
    )
    pairs = g1.join(g2, (F.col("et") == F.col("et2")) & (F.col("d1") < F.col("d2")))
    sgn = (
        F.when(F.col("x2") > F.col("x1"), 1)
        .when(F.col("x2") < F.col("x1"), -1)
        .otherwise(0)
    )
    s = pairs.groupBy(F.col("et").alias("event_type")).agg(
        F.sum(sgn).cast("long").alias("s_stat")
    )
    n = g.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    t = F.col("t")
    ties = (
        g.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .where(t > 1)
        .groupBy("event_type")
        .agg(F.coalesce(F.sum(t * (t - 1) * (2 * t + 5)), F.lit(0)).cast("long").alias("tie18"))
    )
    j = (
        s.join(n, "event_type")
        .join(ties, "event_type", "left")
        .withColumn("tie18", F.coalesce(F.col("tie18"), F.lit(0).cast("long")))
    )
    nd = F.col("n_days")
    var18 = (nd * (nd - 1) * (2 * nd + 5) - F.col("tie18")).cast("long")
    ss = F.col("s_stat")
    denom = F.sqrt(F.col("var18").cast("double") / 18.0)
    z = (
        F.when(ss > 0, (ss - 1).cast("double") / denom)
        .when(ss < 0, (ss + 1).cast("double") / denom)
        .otherwise(F.lit(0.0))
    )
    return j.withColumn("var18", var18).select(
        "event_type", "n_days", "s_stat", "var18", z.alias("z_stat")
    )


@query(
    "agg_cohens_kappa",
    oracle=f"""
WITH r AS (
  SELECT CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END AS ra,
         CASE WHEN {_CENTS_SQL} >= 5000 THEN 1 ELSE 0 END AS rb
  FROM events
),
c AS (
  SELECT CAST(SUM(ra * rb) AS BIGINT) AS n11,
         CAST(SUM(ra * (1 - rb)) AS BIGINT) AS n10,
         CAST(SUM((1 - ra) * rb) AS BIGINT) AS n01,
         CAST(SUM((1 - ra) * (1 - rb)) AS BIGINT) AS n00
  FROM r
)
SELECT n11, n10, n01, n00,
       CAST(2 * (CAST(n11 AS HUGEINT) * n00 - CAST(n10 AS HUGEINT) * n01) AS DOUBLE)
       / CAST((CAST(n11 AS HUGEINT) + n10) * (CAST(n10 AS HUGEINT) + n00)
              + (CAST(n11 AS HUGEINT) + n01) * (CAST(n01 AS HUGEINT) + n00) AS DOUBLE)
         AS kappa
FROM c
""",
    category="aggregations",
)
def agg_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two
    deterministic binary raters (rater A: engagement event types;
    rater B: high-value threshold at 50.00): the label-quality /
    annotator-agreement metric every labeling pipeline reports.
    Uses the closed-form 2x2 identity
    kappa = 2(n11*n00 - n10*n01) / ((n11+n10)(n10+n00) + (n11+n01)(n01+n00)),
    so the whole statistic is ONE exact integer ratio -> one double
    division.  Count products overflow int64 once cell counts pass
    ~2^31 (≈100 TB of events), so the products run in DECIMAL(38,0)
    (Spark) / HUGEINT (DuckDB).  Plan: one map + one global agg —
    no shuffle beyond the 4-cell partial-aggregate merge."""
    e = table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    ra = F.when(F.col("event_type").isin("click", "view"), 1).otherwise(0)
    rb = F.when(cents >= 5000, 1).otherwise(0)
    c = e.select(ra.alias("ra"), rb.alias("rb")).agg(
        F.sum(F.col("ra") * F.col("rb")).cast("long").alias("n11"),
        F.sum(F.col("ra") * (1 - F.col("rb"))).cast("long").alias("n10"),
        F.sum((1 - F.col("ra")) * F.col("rb")).cast("long").alias("n01"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb"))).cast("long").alias("n00"),
    )
    big = lambda col: F.col(col).cast("decimal(38,0)")
    num = 2 * (big("n11") * big("n00") - big("n10") * big("n01"))
    den = (big("n11") + big("n10")) * (big("n10") + big("n00")) + (
        big("n11") + big("n01")
    ) * (big("n01") + big("n00"))
    return c.select(
        "n11", "n10", "n01", "n00",
        (num.cast("double") / den.cast("double")).alias("kappa"),
    )


@query(
    "agg_runs_test",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
d AS (
  SELECT event_type, d,
         x - lag(x) OVER (PARTITION BY event_type ORDER BY d) AS diff
  FROM g
),
s AS (
  SELECT event_type, d,
         CASE WHEN diff > 0 THEN 1 ELSE -1 END AS sgn
  FROM d WHERE diff IS NOT NULL AND diff <> 0
),
c AS (
  SELECT event_type, sgn,
         lag(sgn) OVER (PARTITION BY event_type ORDER BY d) AS prev
  FROM s
)
SELECT event_type,
       CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
       CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
       CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND sgn <> prev THEN 1 ELSE 0 END)
            AS BIGINT) AS n_runs,
       1.0 + 2.0 * CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 * CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS expected_runs
FROM c
GROUP BY event_type
""",
    category="aggregations",
)
def agg_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the day-over-day direction of each
    event type's daily revenue: up/down sign sequence (zero diffs
    dropped, the standard treatment), observed run count via one
    lag-and-compare pass, and the exact-ratio expected run count
    1 + 2*n_up*n_down/n.  Too few runs = momentum/trend, too many =
    oscillation — the randomness check behind SPC monitoring.  Two
    bounded windows over the 30-row-per-type grid + one aggregate;
    every reported quantity except expected_runs is an exact
    integer."""
    g = _day_grid(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("d")
    d = g.withColumn("diff", F.col("x") - F.lag("x").over(w))
    s = d.where(F.col("diff").isNotNull() & (F.col("diff") != 0)).select(
        "event_type", "d", F.when(F.col("diff") > 0, 1).otherwise(-1).alias("sgn")
    )
    c = s.withColumn("prev", F.lag("sgn").over(w))
    up = F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0)).cast("long")
    down = F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0)).cast("long")
    changes = F.sum(
        F.when(F.col("prev").isNotNull() & (F.col("sgn") != F.col("prev")), 1).otherwise(0)
    )
    return c.groupBy("event_type").agg(
        up.alias("n_up"),
        down.alias("n_down"),
        (1 + changes).cast("long").alias("n_runs"),
        (
            1.0
            + 2.0 * up.cast("double") * down.cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("expected_runs"),
    )


@query(
    "win_zscore_anomaly",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
m AS (
  SELECT event_type, d, x,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(x) OVER w AS BIGINT) AS s,
         CAST(SUM(CAST(x AS HUGEINT) * x) OVER w AS HUGEINT) AS ss
  FROM g
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day, x, n, s,
       CAST(CASE WHEN n = 7 AND
         CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * x - s)
           * (CAST(n AS HUGEINT) * x - s)
         > 4 * CAST(n AS HUGEINT) * (n * ss - CAST(s AS HUGEINT) * s)
       THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM m
WHERE n = 7
""",
    category="windows",
)
def win_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags with ZERO floating point: a day
    is anomalous when its revenue sits more than 2 population sigmas
    from the trailing-7-day baseline (the frame excludes the current
    day — a self-including baseline dilutes the very spike it should
    flag).  |x-mu| > 2*sigma is decided by the exact integer
    cross-multiplication  n*(n*x-s)^2 > 4*n*(n*ss - s^2), so unlike
    win_bollinger (which reports the float bands) the DECISION here
    never touches a double — the squares run in DECIMAL(38,0) /
    HUGEINT because (n*x-s)^2 passes int64 once daily sums exceed
    ~2^31 cents.  One shuffle on event_type; the frame keeps running
    power sums.  The day grid is value-domain-bounded (module
    docstring), so the window partition can never become the
    single-task bottleneck that global windows have."""
    g = _day_grid(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-7, -1)
    )
    m = g.select(
        "event_type",
        "d",
        "x",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("x").over(w).cast("long").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).over(w).alias("ss"),
    ).where(F.col("n") == 7)
    big = lambda c: c.cast("decimal(38,0)")
    n, s, ss, x = F.col("n"), F.col("s"), F.col("ss"), F.col("x")
    dev = big(n) * x - s
    lhs = big(n) * dev * dev
    rhs = 4 * big(n) * (n * ss - big(s) * s)
    return m.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "x",
        "n",
        "s",
        F.when(lhs > rhs, 1).otherwise(0).cast("long").alias("is_anomaly"),
    )


@query(
    "win_seasonal_error",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
f AS (
  SELECT event_type, d, x,
         lag(x, 7) OVER (PARTITION BY event_type ORDER BY d) AS forecast
  FROM g
)
SELECT event_type,
       CAST(COUNT(forecast) AS BIGINT) AS n_scored,
       CAST(SUM(abs(x - forecast)) AS BIGINT) AS sum_abs_err_cents,
       CAST(MAX(abs(x - forecast)) AS BIGINT) AS max_abs_err_cents,
       CAST(SUM(abs(x - forecast)) AS DOUBLE) / COUNT(forecast) / 100.0 AS mae
FROM f
WHERE forecast IS NOT NULL
GROUP BY event_type
""",
    category="windows",
)
def win_seasonal_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive backtest: forecast each day's revenue with the
    value 7 days earlier (the no-model baseline every forecast must
    beat — agg_holt_linear's sanity floor) and report per-type exact
    absolute-error mass in cents plus the one-division MAE.  One lag
    window + one aggregate over the bounded day grid; errors are
    int64-exact so the backtest is bit-reproducible."""
    g = _day_grid(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("d")
    f = g.withColumn("forecast", F.lag("x", 7).over(w)).where(
        F.col("forecast").isNotNull()
    )
    err = F.abs(F.col("x") - F.col("forecast"))
    return f.groupBy("event_type").agg(
        F.count("forecast").cast("long").alias("n_scored"),
        F.sum(err).cast("long").alias("sum_abs_err_cents"),
        F.max(err).cast("long").alias("max_abs_err_cents"),
        (F.sum(err).cast("double") / F.count("forecast") / 100.0).alias("mae"),
    )


@query(
    "agg_wilson_ci",
    oracle=f"""
WITH arms AS (
  SELECT CASE WHEN ((event_id & 2147483647) * 2654435761) % 2 = 0 THEN 'A' ELSE 'B' END
           AS arm,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
  FROM events
),
c AS (
  SELECT arm,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(conv) AS BIGINT) AS successes
  FROM arms GROUP BY arm
)
SELECT arm, n, successes,
       CAST(successes AS DOUBLE) / n AS p_hat,
       (CAST(successes AS DOUBLE) / n + 3.8416 / (2 * n)
        - 1.96 * sqrt((CAST(successes AS DOUBLE) / n
                       * (1.0 - CAST(successes AS DOUBLE) / n)
                       + 3.8416 / (4 * n)) / n))
         / (1.0 + 3.8416 / n) AS wilson_lo,
       (CAST(successes AS DOUBLE) / n + 3.8416 / (2 * n)
        + 1.96 * sqrt((CAST(successes AS DOUBLE) / n
                       * (1.0 - CAST(successes AS DOUBLE) / n)
                       + 3.8416 / (4 * n)) / n))
         / (1.0 + 3.8416 / n) AS wilson_hi
FROM c
""",
    category="aggregations",
)
def agg_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score interval (95%, z=1.96, z²=3.8416) for the
    conversion rate of two deterministic hash arms — the guardrail
    CI every experimentation platform reports instead of the
    normal-approximation interval (Wilson never leaves [0,1] and
    behaves at small n/extreme p). Counts are exact integers; both
    engines evaluate the identical closed-form expression tree on
    identical (successes, n), so even the sqrt-bearing bounds are
    bit-reproducible — the win_bollinger discipline applied to
    proportions. One map + one 2-row aggregate."""
    e = table(spark, sf_dir, "events")
    arm = F.when((F.col("event_id").bitwiseAND(2147483647) * 2654435761) % 2 == 0, "A").otherwise("B")
    conv = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    c = e.select(arm.alias("arm"), conv.alias("conv")).groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("successes"),
    )
    n = F.col("n")
    p = F.col("successes").cast("double") / n
    z2 = 3.8416
    center = p + z2 / (2 * n)
    margin = 1.96 * F.sqrt((p * (1.0 - p) + z2 / (4 * n)) / n)
    denom = 1.0 + z2 / n
    return c.select(
        "arm",
        "n",
        "successes",
        p.alias("p_hat"),
        ((center - margin) / denom).alias("wilson_lo"),
        ((center + margin) / denom).alias("wilson_hi"),
    )


@query(
    "win_vwap",
    oracle=f"""
WITH t AS (
  SELECT event_type, ts, event_id,
         {_CENTS_SQL} AS px,
         1 + (event_id % 9) AS qty
  FROM events
),
c AS (
  SELECT event_type, ts, event_id, px, qty,
         CAST(SUM(px * qty) OVER w AS BIGINT) AS cum_pv,
         CAST(SUM(qty) OVER w AS BIGINT) AS cum_q
  FROM t
  WINDOW w AS (PARTITION BY event_type, CAST(date_trunc('day', ts) AS DATE)
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
)
SELECT event_type, event_id, cum_pv, cum_q,
       CAST(cum_pv AS DOUBLE) / cum_q / 100.0 AS vwap
FROM c
WHERE event_id % 37 = 0
""",
    category="windows",
)
def win_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraday running VWAP (volume-weighted average price) per
    (instrument, day) — the execution-quality benchmark every
    trading/market-data stack computes: cumulative price×quantity
    over cumulative quantity in exact int64 cents (quantity is a
    deterministic 1-9 lot from the event id), one double division at
    read-out. The window partitions on (type, day) — a day boundary
    resets the accumulation, and the partition count grows with the
    calendar and instrument count, never one global task. Output
    row-sampled (event_id % 37) to keep the graded payload small
    while still covering every partition."""
    e = table(spark, sf_dir, "events")
    px = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    qty = (1 + F.col("event_id") % 9).cast("long")
    t = e.select(
        "event_type",
        "ts",
        "event_id",
        px.alias("px"),
        qty.alias("qty"),
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
    )
    w = (
        Window.partitionBy("event_type", "d")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = t.select(
        "event_type",
        "event_id",
        F.sum(F.col("px") * F.col("qty")).over(w).cast("long").alias("cum_pv"),
        F.sum("qty").over(w).cast("long").alias("cum_q"),
    )
    return c.where(F.col("event_id") % 37 == 0).select(
        "event_type",
        "event_id",
        "cum_pv",
        "cum_q",
        (F.col("cum_pv").cast("double") / F.col("cum_q") / 100.0).alias("vwap"),
    )


@query(
    "agg_capture_recapture",
    oracle="""
WITH s1 AS (
  SELECT DISTINCT user_id FROM events
  WHERE ((event_id & 2147483647) * 2654435761) % 10 < 3
),
s2 AS (
  SELECT DISTINCT user_id FROM events
  WHERE (event_id * 40503) % 10 < 3
),
c AS (
  SELECT (SELECT COUNT(*) FROM s1) AS n1,
         (SELECT COUNT(*) FROM s2) AS n2,
         (SELECT COUNT(*) FROM s1 WHERE user_id IN (SELECT user_id FROM s2))
           AS m
)
SELECT CAST(c.n1 AS BIGINT) AS n1, CAST(c.n2 AS BIGINT) AS n2,
       CAST(c.m AS BIGINT) AS n_recaptured,
       CAST((CAST(c.n1 AS HUGEINT) + 1) * (c.n2 + 1) // (c.m + 1) - 1
            AS BIGINT) AS chapman_estimate,
       (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
         AS true_population
FROM c
""",
    category="aggregations",
)
def agg_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture population estimation (Chapman estimator):
    two independent deterministic hash samples of observed users,
    the recapture overlap, and N̂ = (n1+1)(n2+1)/(m+1) − 1 — the
    ecology/fraud-analytics trick for sizing a population you can
    only sample (how many TOTAL users exist if two independent 30%
    sightings overlap this much).  The estimator is an exact
    integer floor division in both engines (HUGEINT/DECIMAL
    products); the true distinct count rides along to expose the
    estimator's bias.  Two distinct aggregations + a semi-join on
    the small sample tables."""
    e = table(spark, sf_dir, "events")
    s1 = (
        e.where((F.col("event_id").bitwiseAND(2147483647) * 2654435761) % 10 < 3)
        .select("user_id")
        .distinct()
    )
    s2 = (
        e.where((F.col("event_id") * 40503) % 10 < 3)
        .select("user_id")
        .distinct()
    )
    n1 = s1.count()
    n2 = s2.count()
    m = s1.join(s2, "user_id", "left_semi").count()
    true_pop = e.select("user_id").distinct().count()
    chapman = (n1 + 1) * (n2 + 1) // (m + 1) - 1
    return spark.createDataFrame(
        [(n1, n2, m, chapman, true_pop)],
        "n1 long, n2 long, n_recaptured long, chapman_estimate long, "
        "true_population long",
    )


@query(
    "agg_log2_histogram",
    oracle=f"""
WITH c AS (
  SELECT event_type, {_CENTS_SQL} AS cents FROM events
  WHERE {_CENTS_SQL} > 0
),
b AS (
  SELECT event_type, length(printf('%b', cents)) - 1 AS bucket, cents
  FROM c
)
SELECT event_type, CAST(bucket AS BIGINT) AS log2_bucket,
       CAST(1 << bucket AS BIGINT) AS bucket_lo_cents,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM b
GROUP BY event_type, bucket
""",
    category="aggregations",
)
def agg_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two (log2) histogram — the latency/size-distribution
    workhorse (HDR-style buckets) computed with ZERO logarithms:
    bucket = floor(log2(cents)) = bit-length − 1, read off the binary
    string length (Spark bin(), DuckDB printf('%%b') — both render
    positive int64 without padding, so the lengths agree exactly).
    Exponential buckets keep the histogram bounded (≤ 63 buckets per
    type at ANY data volume — the value-domain-bounded discipline of
    this module) while resolving both the cents tail and the
    max-value head. One map + one grouped aggregate."""
    e = table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    c = e.select("event_type", cents.alias("cents")).where(F.col("cents") > 0)
    bucket = (F.length(F.bin(F.col("cents"))) - 1).cast("long")
    b = c.select("event_type", bucket.alias("log2_bucket"), "cents")
    return (
        b.groupBy("event_type", "log2_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .withColumn(
            "bucket_lo_cents",
            F.expr("CAST(shiftleft(1L, CAST(log2_bucket AS INT)) AS BIGINT)"),
        )
        .select("event_type", "log2_bucket", "bucket_lo_cents", "n", "sum_cents")
    )
