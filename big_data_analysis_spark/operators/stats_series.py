"""Serial-dependence / k-sample rank statistics tier (split from
stats_np.py per VERDICT r10 item 6's module-size cap): Bowley
quartile skewness, PACF via Durbin-Levinson on exact autocovariance
lattices, turning-point counts, cross-correlation at fixed lags,
rolling beta and Sharpe over the cents grid, weekday ANOVA, ordered-
alternative tests (Jonckheere-Terpstra, Page's L), spread tests
(Levene-mean, energy distance, Gini mean difference) and
Brunner-Munzel.

Same exactness discipline as stats_np.py (integer cents lattice,
doubled midranks, HUGEINT/DECIMAL(38,0) crossings, one final double
division per output) — see that module's docstring.
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
