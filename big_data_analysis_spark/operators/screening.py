"""The r9-continuation wave module (r11 grading-window stock;
SURVEY.md §2 wave notes 18-36): screening and robust filters
(clamped balance via the reflected-walk identity, Hampel, BH step-up,
Pettitt, Kneedle), model-eval machinery (exact ROC-AUC companions:
Youden-J operating point, PR curve with exact rational AP summands,
survival hazard + Harrell's C, group k-fold with a leakage
certificate, DiD), time-series tiers (Sharpe/Sortino, variance
ratio, Newey-West HAC, seasonal decomposition, isotonic regression,
matrix profile, SAX, Haar DWT), corpus statistics (burstiness,
Yule's K via screening's neighbors in text.py), vector-analytics
exacts (Walsh-Hadamard, DBSCAN roles, silhouette), byte codecs
(base64 dialect, ISO 7064 mod-97), and privacy (l-diversity).

Shared discipline (stats_ext / stats_np lineage): exact integer
cents and lattice dots, doubled medians/midranks so ties stay
integral, HUGEINT/DECIMAL(38,0) with the VARCHAR double-crossing for
anything past int64, decision rules CROSS-MULTIPLIED into integer
comparisons (no float ever ranks or flags), fixed-order double
chains only in display columns, bounded-domain windows — and every
data-proportional ranking through the certified
global_rank_distributed kernel, never a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import table
from ..registry import query
from .stats_ext import _CENTS_SQL, _GRID_SQL, _day_grid
from .windows import global_rank_distributed


@query(
    "win_clamped_balance",
    oracle=f"""
WITH d AS (
  SELECT user_id, event_id, ts,
         CASE WHEN event_type = 'purchase' THEN {_CENTS_SQL}
              ELSE -{_CENTS_SQL} END AS delta_c
  FROM events WHERE event_type IN ('purchase', 'click')
),
cs AS (
  SELECT user_id, event_id, ts, delta_c,
         SUM(delta_c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS raw_s
  FROM d
),
s AS (
  SELECT user_id, event_id, delta_c, raw_s,
         MIN(raw_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS run_min
  FROM cs
)
SELECT user_id, event_id, delta_c,
       CAST(raw_s AS BIGINT) AS raw_s,
       CAST(raw_s - LEAST(run_min, 0) AS BIGINT) AS balance_c
FROM s
""",
    category="windows",
)
def win_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped-at-zero running balance per user — the inventory /
    prepaid-credit / token-bucket recurrence b_t = max(0, b_{t-1} +
    delta_t) (purchases credit, clicks debit): a NONLINEAR recurrence
    no window frame expresses directly, made windowable by the
    reflected-random-walk identity b_t = S_t - min(0, min_{k<=t} S_k)
    — the clamp only ever injects the mass the running minimum dug
    below zero, so cumsum + running-min-of-cumsum reconstruct the
    whole path exactly (proved by induction; replayed against the
    literal sequential recurrence in tests/test_r11_stock.py). All
    integer cents, bit-exact. Scale shape: both window passes are
    key-partitioned on user_id over the SAME sort order — one
    Exchange, one Sort, no single-partition window, no iteration;
    the identity is what keeps a 100-TB ledger one linear pass
    instead of a sequential fold."""
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    d = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "purchase", cents)
        .otherwise(-cents)
        .alias("delta_c"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = d.select(
        "user_id",
        "event_id",
        "ts",
        "delta_c",
        F.sum("delta_c").over(w).alias("raw_s"),
    ).select(
        "user_id",
        "event_id",
        "delta_c",
        "raw_s",
        F.min("raw_s").over(w).alias("run_min"),
    )
    return s.select(
        "user_id",
        "event_id",
        "delta_c",
        F.col("raw_s").cast("long").alias("raw_s"),
        (F.col("raw_s") - F.least(F.col("run_min"), F.lit(0)))
        .cast("long")
        .alias("balance_c"),
    )


_HAMPEL_W = 7  # trailing window length (odd -> single middle order stat)


@query(
    "win_hampel",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
s AS (SELECT d, x FROM g WHERE event_type = 'click'),
l AS (
  SELECT d, x,
         list_sort(array_agg(x) OVER w) AS win,
         ROW_NUMBER() OVER (ORDER BY d) AS rn
  FROM s
  WINDOW w AS (ORDER BY d ROWS BETWEEN {_HAMPEL_W - 1} PRECEDING
               AND CURRENT ROW)
),
m AS (
  SELECT d, x, rn, 2 * win[{_HAMPEL_W // 2 + 1}] AS med2,
         2 * list_sort(list_transform(win,
               e -> abs(2 * e - 2 * win[{_HAMPEL_W // 2 + 1}])
             ))[{_HAMPEL_W // 2 + 1}] AS mad2
  FROM l WHERE rn >= {_HAMPEL_W}
)
SELECT CAST(d AS TIMESTAMP) AS d, x,
       CAST(med2 AS BIGINT) AS med2, CAST(mad2 AS BIGINT) AS mad2,
       2 * abs(2 * x - med2) > 3 * mad2 AS is_outlier
FROM m
""",
    category="windows",
)
def win_hampel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter on the click daily-revenue series — the robust
    rolling-median outlier detector (flag x_t when |x_t - med| >
    3 * MAD over the trailing 7 days): the window median and the MAD
    both come from SORTED 7-element arrays (odd length -> single
    middle order statistic), carried at 2x scale so every quantity is
    an exact integer, and the 3-sigma-equivalent test is
    CROSS-MULTIPLIED — 2*|2x - med2| > 3*mad2 — so the flag is an
    exact integer comparison, never a float threshold (med2 = 2*med,
    mad2 = 4*MAD; the inequality is |x-med| > 3*MAD scaled by 4).
    Rows without a full trailing window are dropped (the filter is
    undefined there). Scale: the window runs on the value-domain-
    bounded day grid (~150 rows), never on raw events — the only
    unbounded pass is the grid aggregation; on a per-key hypertable
    the same expression would partition by series key."""
    g = _day_grid(spark, sf_dir)
    s = g.where(F.col("event_type") == "click").select("d", "x")
    w = Window.orderBy("d").rowsBetween(-(_HAMPEL_W - 1), Window.currentRow)
    wr = Window.orderBy("d")
    mid = _HAMPEL_W // 2 + 1
    l = s.select(
        "d",
        "x",
        F.sort_array(F.collect_list("x").over(w)).alias("win"),
        F.row_number().over(wr).alias("rn"),
    ).where(F.col("rn") >= _HAMPEL_W)
    med2 = 2 * F.element_at("win", mid)
    # med2 is referenced inside the transform lambda -> two selects
    m = (
        l.select("d", "x", "win", med2.alias("med2"))
        .select(
            "d",
            "x",
            "med2",
            (
                2
                * F.element_at(
                    F.sort_array(
                        F.transform(
                            "win", lambda e: F.abs(2 * e - F.col("med2"))
                        )
                    ),
                    mid,
                )
            ).alias("mad2"),
        )
    )
    return m.select(
        F.col("d").cast("timestamp").alias("d"),
        "x",
        F.col("med2").cast("long").alias("med2"),
        F.col("mad2").cast("long").alias("mad2"),
        (2 * F.abs(2 * F.col("x") - F.col("med2")) > 3 * F.col("mad2")).alias(
            "is_outlier"
        ),
    )


_BH_ALPHA_DEN = 20  # alpha = 1/20 = 0.05


@query(
    "agg_bh_fdr",
    oracle=f"""
WITH c AS (
  SELECT user_id, {_CENTS_SQL} AS cents FROM events
),
grid AS (
  SELECT cents, CAST(COUNT(*) AS BIGINT) AS nt FROM c GROUP BY cents
),
w AS (
  SELECT cents, SUM(nt) OVER (ORDER BY cents
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum,
         SUM(nt) OVER () AS n
  FROM grid
),
med AS (
  SELECT MIN(CASE WHEN cum >= (n + 1) // 2 THEN cents END)
       + MIN(CASE WHEN cum >= n // 2 + 1 THEN cents END) AS med2
  FROM w
),
u AS (
  SELECT c.user_id, CAST(COUNT(*) AS BIGINT) AS n_u,
         CAST(SUM(CASE WHEN 2 * c.cents < med.med2 THEN 1 ELSE 0 END)
              AS BIGINT) AS b_u
  FROM c CROSS JOIN med GROUP BY c.user_id
),
r AS (
  SELECT *, CAST(b_u AS DOUBLE) / n_u AS p_hat,
         ROW_NUMBER() OVER (ORDER BY CAST(b_u AS DOUBLE) / n_u, user_id)
           AS rk,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM u
),
a AS (
  SELECT *, {_BH_ALPHA_DEN} * b_u * m <= rk * n_u AS accepted FROM r
),
k AS (SELECT COALESCE(MAX(CASE WHEN accepted THEN rk END), 0) AS cutoff
      FROM a)
SELECT a.user_id, a.n_u, a.b_u, a.p_hat, CAST(a.rk AS BIGINT) AS rk,
       a.m, a.accepted, a.rk <= k.cutoff AS flagged
FROM a CROSS JOIN k
""",
    category="aggregations",
)
def agg_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up screening over per-user spend
    profiles — the multiple-testing control layer an anomaly pipeline
    needs before paging anyone (screen m users at FDR alpha = 0.05,
    not per-user alpha): each user's score is the exact rational
    share b_u/n_u of their events below the GLOBAL median (the
    doubled-median machinery from agg_mood_median), users are ranked
    by ascending score, and the BH rule p_(k) <= alpha*k/m is
    CROSS-MULTIPLIED into the exact integer comparison 20*b*m <=
    k*n — no float ever decides acceptance; the step-up cutoff K =
    max accepted rank then flags ranks 1..K (that re-admission of
    interior rejections is what makes BH step-UP, pinned by test).
    The ordering key b/n is one correctly-rounded double division,
    identical in both engines, tie-broken by user_id. Scale shape:
    the median lives on the bounded cents value grid; the per-user
    rollup is one key-partitioned aggregation; the m-user ranking
    goes through the certified global_rank_distributed kernel (range
    repartition + broadcast offsets — users are data-proportional,
    so no single-partition window); the cutoff is a 1-row broadcast."""
    ev = table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    c = ev.select("user_id", cents.alias("cents"))
    grid = c.groupBy("cents").agg(F.count(F.lit(1)).cast("long").alias("nt"))
    wcum = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w = grid.select(
        "cents",
        F.sum("nt").over(wcum).alias("cum"),
        F.sum("nt").over(wall).alias("n"),
    )
    med = w.agg(
        (
            F.min(
                F.when(
                    F.col("cum") >= (F.col("n") + 1).cast("long") / 2,
                    F.col("cents"),
                )
            )
            + F.min(
                F.when(
                    F.col("cum") >= F.col("n") / 2 + 1,
                    F.col("cents"),
                )
            )
        ).alias("med2")
    )
    u = (
        c.crossJoin(F.broadcast(med))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_u"),
            F.sum(
                F.when(2 * F.col("cents") < F.col("med2"), 1).otherwise(0)
            )
            .cast("long")
            .alias("b_u"),
        )
    )
    p_hat = (F.col("b_u").cast("double") / F.col("n_u")).alias("p_hat")
    scored = u.select("user_id", "n_u", "b_u", p_hat)
    ranked = global_rank_distributed(scored, ["p_hat", "user_id"], "rk")
    m = ranked.agg(F.count(F.lit(1)).cast("long").alias("m"))
    a = ranked.crossJoin(F.broadcast(m)).select(
        "user_id",
        "n_u",
        "b_u",
        "p_hat",
        F.col("rk").cast("long").alias("rk"),
        "m",
        (
            _BH_ALPHA_DEN * F.col("b_u") * F.col("m")
            <= F.col("rk") * F.col("n_u")
        ).alias("accepted"),
    )
    k = a.agg(
        F.coalesce(
            F.max(F.when(F.col("accepted"), F.col("rk"))), F.lit(0)
        ).alias("cutoff")
    )
    return a.crossJoin(F.broadcast(k)).select(
        "user_id",
        "n_u",
        "b_u",
        "p_hat",
        "rk",
        "m",
        "accepted",
        (F.col("rk") <= F.col("cutoff")).alias("flagged"),
    )


@query(
    "agg_survival_hazard",
    oracle=f"""
WITH lastd AS (
  SELECT user_id,
         MAX(CAST(date_trunc('day', ts) AS DATE)) AS churn_day
  FROM events GROUP BY user_id
),
d AS (
  SELECT churn_day, CAST(COUNT(*) AS BIGINT) AS n_churned
  FROM lastd GROUP BY churn_day
),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM lastd),
w AS (
  SELECT churn_day, n_churned,
         SUM(n_churned) OVER (ORDER BY churn_day
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
  FROM d
)
SELECT CAST(w.churn_day AS TIMESTAMP) AS churn_day, w.n_churned,
       CAST(m.m - (w.cum - w.n_churned) AS BIGINT) AS n_at_risk,
       CAST(w.n_churned * 1000000 // (m.m - (w.cum - w.n_churned))
            AS BIGINT) AS hazard_ppm
FROM w CROSS JOIN m
""",
    category="aggregations",
)
def agg_survival_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier ingredients table — the discrete-time survival /
    churn analysis every retention team runs: a user's churn day is
    their LAST observed event day, the at-risk set on day i is
    everyone who survived past i-1 (n_at_risk = m - users churned
    strictly before i, from one cumulative sum), and the discrete
    hazard d_i/n_i ships as the exact integer d*1e6 // n (the KM
    survival curve is the running product of (1 - hazard) — left to
    the caller because a cumulative PRODUCT is not exactly
    representable; every INPUT to it here is exact). churn_day is
    emitted as TIMESTAMP on both twins (the DATE canonicalization
    trap). Scale shape: one key-partitioned per-user max, one
    bounded-day-domain rollup (~tens of rows), the cumulative sum on
    that bounded grid, and a 1-row broadcast total."""
    ev = table(spark, sf_dir, "events")
    lastd = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.max("ts"))).alias("churn_day")
    )
    d = lastd.groupBy("churn_day").agg(
        F.count(F.lit(1)).cast("long").alias("n_churned")
    )
    m = lastd.agg(F.count(F.lit(1)).cast("long").alias("m"))
    w = Window.orderBy("churn_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wd = d.select(
        "churn_day",
        "n_churned",
        F.sum("n_churned").over(w).alias("cum"),
    )
    j = wd.crossJoin(F.broadcast(m))
    at_risk = F.col("m") - (F.col("cum") - F.col("n_churned"))
    return j.select(
        F.col("churn_day").cast("timestamp").alias("churn_day"),
        "n_churned",
        at_risk.cast("long").alias("n_at_risk"),
        F.expr(
            "CAST(n_churned * 1000000 DIV (m - (cum - n_churned)) AS BIGINT)"
        ).alias("hazard_ppm"),
    )


@query(
    "pipeline_eval_auc",
    oracle="""
WITH q AS (
  SELECT vec_id, label >= 5 AS pos,
         list_sum(list_transform(range(1, 65),
           i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000)
                     AS BIGINT)
                * (CASE WHEN i % 2 = 1 THEN 1 ELSE -1 END))) AS score
  FROM embeddings
),
r AS (
  SELECT vec_id, pos, score,
         ROW_NUMBER() OVER (ORDER BY score, vec_id) AS rk
  FROM q
),
g AS (
  SELECT score,
         CAST(MIN(rk) + MAX(rk) AS BIGINT) AS r2,
         CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos_s
  FROM r GROUP BY score
),
t AS (
  SELECT CAST(SUM(n_pos_s * r2) AS BIGINT) AS r2_pos,
         CAST(SUM(n_pos_s) AS BIGINT) AS n_pos,
         CAST(SUM((SELECT COUNT(*) FROM r WHERE r.score = g.score))
              AS BIGINT) AS n_chk
  FROM g
),
c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q)
SELECT c.n, t.n_pos, CAST(c.n - t.n_pos AS BIGINT) AS n_neg,
       t.r2_pos,
       CAST(t.r2_pos - t.n_pos * (t.n_pos + 1) AS BIGINT) AS auc_num,
       CAST(2 * t.n_pos * (c.n - t.n_pos) AS BIGINT) AS auc_den,
       CAST(t.r2_pos - t.n_pos * (t.n_pos + 1) AS DOUBLE)
         / (2 * t.n_pos * (c.n - t.n_pos)) AS auc
FROM t CROSS JOIN c
""",
    category="pipelines",
)
def pipeline_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC-AUC of a deterministic linear scorer over the
    embedding corpus — the ranking-quality metric every classifier
    eval reports, computed through the rank-sum identity AUC =
    (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg) with TIES handled by
    midranks (the probabilistic definition: P(s_pos > s_neg) + 0.5 *
    P(tie)): scores are exact int64 dots of the 1e-6-quantized
    embeddings with an alternating +/-1 literal vector, the doubled
    midrank of a tie group is MIN(rank)+MAX(rank) (integer — the
    agg_mann_whitney machinery), and the AUC numerator/denominator
    ship as exact BIGINTs next to the one double division. Scale
    shape: the global ranking runs through the certified
    global_rank_distributed kernel (range repartition + broadcast
    offsets, no single-partition window); tie-group rollup and the
    positive-midrank sum are key-partitioned on score; totals are
    1-row broadcasts."""
    from .windows import global_rank_distributed as _grd

    e = table(spark, sf_dir, "embeddings")
    score = None
    for j in range(1, 65):
        term = F.round(
            F.element_at("embedding", j).cast("double") * 1_000_000
        ).cast("long") * (1 if j % 2 == 1 else -1)
        score = term if score is None else score + term
    q = e.select(
        "vec_id", (F.col("label") >= 5).alias("pos"), score.alias("score")
    )
    r = _grd(q, ["score", "vec_id"], "rk")
    g = r.groupBy("score").agg(
        (F.min("rk") + F.max("rk")).cast("long").alias("r2"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0))
        .cast("long")
        .alias("n_pos_s"),
    )
    t = g.agg(
        F.sum(F.col("n_pos_s") * F.col("r2")).cast("long").alias("r2_pos"),
        F.sum("n_pos_s").cast("long").alias("n_pos"),
    )
    c = q.agg(F.count(F.lit(1)).cast("long").alias("n"))
    j = t.crossJoin(F.broadcast(c))
    num = F.col("r2_pos") - F.col("n_pos") * (F.col("n_pos") + 1)
    den = 2 * F.col("n_pos") * (F.col("n") - F.col("n_pos"))
    return j.select(
        "n",
        "n_pos",
        (F.col("n") - F.col("n_pos")).cast("long").alias("n_neg"),
        "r2_pos",
        num.cast("long").alias("auc_num"),
        den.cast("long").alias("auc_den"),
        (num.cast("double") / den).alias("auc"),
    )


@query(
    "fn_base64",
    oracle="""
SELECT c_custkey, c_name,
       to_base64(CAST(c_name AS BLOB)) AS b64,
       CAST(from_base64(to_base64(CAST(c_name AS BLOB))) AS VARCHAR)
         AS roundtrip,
       CAST(length(to_base64(CAST(c_name AS BLOB))) AS BIGINT) AS b64_len,
       to_base64(CAST(c_name || '|' || c_mktsegment AS BLOB)) AS b64_tagged
FROM customer
""",
    category="functions",
)
def fn_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 encode/decode round-trip (RFC 4648) — the wire spelling
    every artifact manifest and HTTP payload uses. The surface trap
    is pure NAMING: Spark spells the pair base64/unbase64, DuckDB
    to_base64/from_base64, and both operate on BINARY (the string
    crosses through an explicit cast on both twins — Spark unbase64
    returns binary that must be re-cast to string or the comparator
    sees bytes). Padding and the 4*ceil(n/3) length law are checked
    via the emitted b64_len. Map-only codegen plan."""
    c = table(spark, sf_dir, "customer")
    b64 = F.base64(F.col("c_name").cast("binary"))
    tagged = F.base64(
        F.concat(F.col("c_name"), F.lit("|"), F.col("c_mktsegment")).cast(
            "binary"
        )
    )
    return c.select(
        "c_custkey",
        "c_name",
        b64.alias("b64"),
        F.unbase64(b64).cast("string").alias("roundtrip"),
        F.length(b64).cast("long").alias("b64_len"),
        tagged.alias("b64_tagged"),
    )


@query(
    "agg_paired_t",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
a AS (SELECT d, x FROM g WHERE event_type = 'click'),
b AS (SELECT d, x FROM g WHERE event_type = 'purchase'),
p AS (
  SELECT a.x - b.x AS diff FROM a JOIN b ON a.d = b.d
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(diff) AS BIGINT) AS s1,
         SUM(CAST(diff AS HUGEINT) * diff) AS s2
  FROM p
)
SELECT n, s1,
       CAST(s1 AS DOUBLE) / n AS mean_d,
       sqrt((CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
             - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) AS sd_d,
       (CAST(s1 AS DOUBLE) / n)
         / (sqrt((CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) / sqrt(n))
         AS t_stat
FROM m
""",
    category="aggregations",
)
def agg_paired_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired t test on (click, purchase) daily revenue — the
    dependent-samples member the t family was missing (agg_welch_t is
    the unpaired two-sample, agg_wilcoxon_signed_rank the
    non-parametric twin of THIS test): per-day differences are exact
    integer cents off the bounded day grid, the power sums run exact
    (diff^2 can pass int64 at sf0.1 -> HUGEINT/DECIMAL(38,0), VARCHAR
    route), and t = mean / (sd / sqrt(n)) is one fixed-order double
    chain shared by both engines. Scale: the pairing is a 1:1
    equi-join on the bounded day domain; the only unbounded pass is
    the grid aggregation."""
    g = _day_grid(spark, sf_dir)
    a = g.where(F.col("event_type") == "click").select("d", F.col("x").alias("xa"))
    b = g.where(F.col("event_type") == "purchase").select(
        "d", F.col("x").alias("xb")
    )
    p = a.join(b, "d").select((F.col("xa") - F.col("xb")).alias("diff"))
    m = p.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("diff").cast("long").alias("s1"),
        F.sum(F.col("diff").cast("decimal(38,0)") * F.col("diff")).alias("s2"),
    )
    n = F.col("n")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("string").cast("double")
    mean_d = s1d / n
    sd_d = F.sqrt((s2d - s1d * F.col("s1") / n) / (n - 1))
    return m.select(
        "n",
        "s1",
        mean_d.alias("mean_d"),
        sd_d.alias("sd_d"),
        (mean_d / (sd_d / F.sqrt(n))).alias("t_stat"),
    )


@query(
    "agg_cramer_von_mises",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
s AS (
  SELECT x, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
  FROM g WHERE event_type IN ('click', 'purchase')
),
r AS (
  SELECT x, is_a,
         ROW_NUMBER() OVER (ORDER BY x, is_a) AS tie_rk
  FROM s
),
t AS (
  SELECT x, is_a, SUM(is_a) OVER () AS n, SUM(1 - is_a) OVER () AS m,
         MIN(tie_rk) OVER (PARTITION BY x) + MAX(tie_rk) OVER (PARTITION BY x)
           AS r2,
         ROW_NUMBER() OVER (PARTITION BY is_a ORDER BY x) AS i
  FROM r
),
u2 AS (
  SELECT MAX(n) AS n, MAX(m) AS m,
         SUM(CASE WHEN is_a = 1
                  THEN CAST(n AS HUGEINT)
                       * (CAST(r2 - 2 * i AS HUGEINT) * (r2 - 2 * i))
                  ELSE CAST(m AS HUGEINT)
                       * (CAST(r2 - 2 * i AS HUGEINT) * (r2 - 2 * i))
             END) AS u4
  FROM t
)
SELECT CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
       CAST(CAST(u4 AS VARCHAR) AS DOUBLE) / 4.0 AS u_stat,
       CAST(CAST(u4 AS VARCHAR) AS DOUBLE) / 4.0
         / (CAST(n AS DOUBLE) * m * (n + m))
         - (4.0 * CAST(n AS DOUBLE) * m - 1) / (6.0 * (n + m)) AS cvm_t
FROM u2
""",
    category="aggregations",
)
def agg_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramer-von Mises test (click vs purchase daily
    revenue) — the integrated-squared-ECDF-distance member that
    completes the EDF family (agg_ks_test is the sup-norm,
    agg_wasserstein_1d the L1): Anderson's rank formulation U =
    n*sum_i (r_i - i)^2 + m*sum_j (s_j - j)^2 with combined-sample
    midranks. Midranks are carried DOUBLED (r2 = min+max combined
    rank of the tie group, 2x) and within-sample indices doubled to
    match — r2 - 2i = 2(r_i - i), so U * 4 = sum of n|m *
    (r2 - 2i)^2 terms
    stays an exact HUGEINT/DECIMAL integer and crosses to double once
    via the VARCHAR route; T = U/(nm(n+m)) - (4nm-1)/(6(n+m)) is the
    standard normalization in one fixed-order chain. Scale: ranking
    and tie rollups run on the value-domain-bounded day grid."""
    g = _day_grid(spark, sf_dir)
    s = g.where(F.col("event_type").isin("click", "purchase")).select(
        "x",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_a"),
    )
    w_rk = Window.orderBy("x", "is_a")
    r = s.select("x", "is_a", F.row_number().over(w_rk).alias("tie_rk"))
    w_all = Window.orderBy("x", "is_a").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_tie = Window.partitionBy("x")
    w_i = Window.partitionBy("is_a").orderBy("x")
    t = r.select(
        "x",
        "is_a",
        F.sum("is_a").over(w_all).alias("n"),
        F.sum(1 - F.col("is_a")).over(w_all).alias("m"),
        (F.min("tie_rk").over(w_tie) + F.max("tie_rk").over(w_tie)).alias(
            "r2"
        ),
        F.row_number().over(w_i).alias("i"),
    )
    dev = (F.col("r2") - 2 * F.col("i")).cast("decimal(38,0)")
    term = dev * (F.col("r2") - 2 * F.col("i"))
    u2 = t.agg(
        F.max("n").alias("n"),
        F.max("m").alias("m"),
        F.sum(
            F.when(
                F.col("is_a") == 1, F.col("n").cast("decimal(38,0)") * term
            ).otherwise(F.col("m").cast("decimal(38,0)") * term)
        ).alias("u4"),
    )
    n, m = F.col("n"), F.col("m")
    u4d = F.col("u4").cast("string").cast("double")
    return u2.select(
        n.cast("long").alias("n"),
        m.cast("long").alias("m"),
        (u4d / 4.0).alias("u_stat"),
        (
            u4d / 4.0 / (n.cast("double") * m * (n + m))
            - (4.0 * n.cast("double") * m - 1) / (6.0 * (n + m))
        ).alias("cvm_t"),
    )


@query(
    "agg_isotonic",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
s0 AS (SELECT d, x FROM g WHERE event_type = 'click'),
idx AS (
  SELECT d, x, ROW_NUMBER() OVER (ORDER BY d) AS i FROM s0
),
p AS (
  SELECT i, d, x,
         SUM(x) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS ps
  FROM idx
),
pairs AS (
  SELECT a.i AS s, b.i AS u,
         CAST(b.ps - a.ps + a.x AS DOUBLE) / (b.i - a.i + 1) AS seg_avg
  FROM p a JOIN p b ON a.i <= b.i
),
mm AS (
  SELECT t.i AS t, pr.s, MIN(pr.seg_avg) AS mn
  FROM idx t JOIN pairs pr ON pr.s <= t.i AND pr.u >= t.i
  GROUP BY t.i, pr.s
),
iso AS (SELECT t, MAX(mn) AS iso FROM mm GROUP BY t)
SELECT CAST(idx.d AS TIMESTAMP) AS d, idx.x, iso.iso AS iso_fit
FROM idx JOIN iso ON iso.t = idx.i
""",
    category="aggregations",
)
def agg_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone non-decreasing) regression of the click
    daily-revenue series — the shape-constrained fit behind
    calibration curves and dose-response monotonization, computed by
    the CLOSED minimax characterization iso_t = max_{s<=t}
    min_{u>=t} mean(x_s..x_u) instead of the sequential PAVA sweep
    (pool-adjacent-violators is an inherently ordered fold; the
    minimax form is pure joins+aggregates, so it distributes — and
    the equivalence to PAVA is a classical theorem, replayed against
    a literal PAVA implementation in the tests). Segment means come
    off one prefix-sum pass (b.ps - a.ps + a.x clears the s-1
    lookup); each is ONE double division evaluated identically in
    both engines, and MIN/MAX over identical double sets are
    order-free. Scale: the (s, t, u) enumeration is O(days^3) on the
    value-domain-bounded grid (~150 rows -> ~3M join rows, bounded
    BY DESIGN like the O(domain^2) stats tier — never on raw
    events); at hypertable scale the same query partitions by
    series key."""
    g = _day_grid(spark, sf_dir)
    s0 = g.where(F.col("event_type") == "click").select("d", "x")
    wi = Window.orderBy("d")
    idx = s0.select("d", "x", F.row_number().over(wi).alias("i"))
    wp = Window.orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p = idx.select("i", "d", "x", F.sum("x").over(wp).alias("ps"))
    a = p.select(
        F.col("i").alias("s"), F.col("x").alias("xa"), F.col("ps").alias("psa")
    )
    b = p.select(F.col("i").alias("u"), F.col("ps").alias("psb"))
    pairs = a.join(b, F.col("s") <= F.col("u")).select(
        "s",
        "u",
        (
            (F.col("psb") - F.col("psa") + F.col("xa")).cast("double")
            / (F.col("u") - F.col("s") + 1)
        ).alias("seg_avg"),
    )
    t = idx.select(F.col("i").alias("t"))
    mm = (
        t.join(
            pairs,
            (F.col("s") <= F.col("t")) & (F.col("u") >= F.col("t")),
        )
        .groupBy("t", "s")
        .agg(F.min("seg_avg").alias("mn"))
    )
    iso = mm.groupBy("t").agg(F.max("mn").alias("iso_fit"))
    return idx.join(iso, idx["i"] == iso["t"]).select(
        F.col("d").cast("timestamp").alias("d"), "x", "iso_fit"
    )


_LDIV_L = 3  # distinct-l-diversity requirement


@query(
    "pipeline_ldiversity",
    oracle=f"""
WITH q AS (
  SELECT c_nationkey, c_mktsegment,
         CASE WHEN c_acctbal < 0 THEN 'neg'
              WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_band,
         c_custkey % 7 AS sensitive
  FROM customer
),
cls AS (
  SELECT c_nationkey, c_mktsegment, bal_band,
         CAST(COUNT(*) AS BIGINT) AS grp_n,
         CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS l_distinct,
         CAST(MAX(cnt) AS BIGINT) AS max_sens_cnt
  FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment,
                             bal_band, sensitive) AS cnt
    FROM q
  ) w
  GROUP BY c_nationkey, c_mktsegment, bal_band
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN l_distinct < {_LDIV_L} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_classes_below_l,
       CAST(SUM(CASE WHEN l_distinct < {_LDIV_L} THEN grp_n ELSE 0 END)
            AS BIGINT) AS n_rows_at_risk,
       CAST(MIN(l_distinct) AS BIGINT) AS min_l,
       CAST(SUM(CASE WHEN max_sens_cnt * {_LDIV_L} > grp_n THEN 1 ELSE 0 END)
            AS BIGINT) AS n_classes_skewed,
       CAST(SUM(grp_n) AS BIGINT) AS n_rows
FROM cls
""",
    category="pipelines",
)
def pipeline_ldiversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-DIVERSITY audit — the privacy gate k-anonymity
    (pipeline_kanonymity, same quasi-identifier classes) is NOT
    sufficient for: a class can be large yet reveal everyone's
    sensitive value if that value is homogeneous. Per equivalence
    class this reports distinct-l (count of distinct sensitive
    values; sensitive here is a synthetic 7-value attribute), the
    classes below l=3, the rows they expose, and a SKEW flag from
    recursive-(c,l)-diversity's ingredient — the modal sensitive
    value holding more than 1/l of the class, tested as the exact
    integer cross-product max_cnt * l > n (no float share). Scale
    shape: one window keyed on (class, sensitive) for modal counts
    sharing its Exchange with the class rollup, then a bounded
    final aggregate."""
    c = table(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    q = c.select(
        "c_nationkey",
        "c_mktsegment",
        band.alias("bal_band"),
        (F.col("c_custkey") % 7).alias("sensitive"),
    )
    w = Window.partitionBy("c_nationkey", "c_mktsegment", "bal_band", "sensitive")
    with_cnt = q.select("*", F.count(F.lit(1)).over(w).alias("cnt"))
    cls = with_cnt.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("grp_n"),
        F.countDistinct("sensitive").cast("long").alias("l_distinct"),
        F.max("cnt").cast("long").alias("max_sens_cnt"),
    )
    below = F.when(F.col("l_distinct") < _LDIV_L, 1).otherwise(0)
    return cls.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(below).cast("long").alias("n_classes_below_l"),
        F.sum(
            F.when(F.col("l_distinct") < _LDIV_L, F.col("grp_n")).otherwise(0)
        )
        .cast("long")
        .alias("n_rows_at_risk"),
        F.min("l_distinct").cast("long").alias("min_l"),
        F.sum(
            F.when(
                F.col("max_sens_cnt") * _LDIV_L > F.col("grp_n"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_classes_skewed"),
        F.sum("grp_n").cast("long").alias("n_rows"),
    )


_SD_PERIOD = 7  # weekly seasonality, centered MA window


@query(
    "agg_seasonal_decompose",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
s AS (SELECT d, x FROM g WHERE event_type = 'click'),
i AS (SELECT d, x, ROW_NUMBER() OVER (ORDER BY d) AS rn,
             COUNT(*) OVER () AS n, isodow(d) - 1 AS wd
      FROM s),
tr AS (
  SELECT d, x, rn, wd,
         CASE WHEN rn > {_SD_PERIOD // 2} AND rn <= n - {_SD_PERIOD // 2}
              THEN SUM(x) OVER (ORDER BY rn
                                ROWS BETWEEN {_SD_PERIOD // 2} PRECEDING
                                AND {_SD_PERIOD // 2} FOLLOWING)
         END AS trend7
  FROM i
),
det AS (
  SELECT *, {_SD_PERIOD} * x - trend7 AS det7 FROM tr
  WHERE trend7 IS NOT NULL
),
seas AS (
  SELECT wd, CAST(SUM(det7) AS BIGINT) AS seas_num,
         CAST(COUNT(*) AS BIGINT) AS seas_den
  FROM det GROUP BY wd
)
SELECT CAST(tr.d AS TIMESTAMP) AS d, tr.x,
       CAST(tr.trend7 AS BIGINT) AS trend7_sum,
       CAST({_SD_PERIOD} * tr.x - tr.trend7 AS BIGINT) AS det7,
       seas.seas_num, seas.seas_den,
       CAST(tr.trend7 AS DOUBLE) / {_SD_PERIOD} AS trend,
       CAST(seas.seas_num AS DOUBLE) / seas.seas_den / {_SD_PERIOD}
         AS seasonal,
       tr.x - CAST(tr.trend7 AS DOUBLE) / {_SD_PERIOD}
            - CAST(seas.seas_num AS DOUBLE) / seas.seas_den / {_SD_PERIOD}
         AS residual
FROM tr JOIN seas ON seas.wd = tr.wd
WHERE tr.trend7 IS NOT NULL
""",
    category="aggregations",
)
def agg_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition (trend + weekly
    seasonal + residual) of the click daily-revenue series — the
    moving-average decomposition behind every STL-style seasonality
    readout: the trend is a CENTERED 7-day moving average carried as
    its exact integer SUM (trend7 = sum of the window; the /7 happens
    once, in the display column), the detrended series det7 = 7x -
    trend7 stays integer, the weekly seasonal component is the
    per-weekday mean of det7 carried as an exact num/den rational
    pair, and only the three display columns divide. Incomplete
    edge windows are dropped (the centered MA is undefined there).
    Spark weekday() == DuckDB isodow-1 (the engines' dayofweek
    origins disagree — the agg_anova_weekday trap re-pinned). Scale:
    everything runs on the value-domain-bounded day grid; the
    weekday rollup is a 7-key aggregate fanned back by a broadcast
    join."""
    g = _day_grid(spark, sf_dir)
    s = g.where(F.col("event_type") == "click").select("d", "x")
    half = _SD_PERIOD // 2
    wi = Window.orderBy("d")
    wn = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    i = s.select(
        "d",
        "x",
        F.row_number().over(wi).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
        F.weekday("d").alias("wd"),
    )
    wma = Window.orderBy("rn").rowsBetween(-half, half)
    tr = i.select(
        "d",
        "x",
        "wd",
        F.when(
            (F.col("rn") > half) & (F.col("rn") <= F.col("n") - half),
            F.sum("x").over(wma),
        ).alias("trend7"),
    ).where(F.col("trend7").isNotNull())
    det7 = _SD_PERIOD * F.col("x") - F.col("trend7")
    seas = (
        tr.select("wd", det7.alias("det7"))
        .groupBy("wd")
        .agg(
            F.sum("det7").cast("long").alias("seas_num"),
            F.count(F.lit(1)).cast("long").alias("seas_den"),
        )
    )
    j = tr.join(F.broadcast(seas), "wd")
    trend = F.col("trend7").cast("double") / _SD_PERIOD
    seasonal = (
        F.col("seas_num").cast("double") / F.col("seas_den") / _SD_PERIOD
    )
    return j.select(
        F.col("d").cast("timestamp").alias("d"),
        "x",
        F.col("trend7").cast("long").alias("trend7_sum"),
        det7.cast("long").alias("det7"),
        "seas_num",
        "seas_den",
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        (F.col("x") - trend - seasonal).alias("residual"),
    )


@query(
    "agg_pettitt",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
s AS (SELECT d, x FROM g WHERE event_type = 'click'),
i AS (SELECT d, x, ROW_NUMBER() OVER (ORDER BY d) AS t,
             COUNT(*) OVER () AS n
      FROM s),
v AS (
  SELECT a.t, a.d, a.n,
         CAST(SUM(CASE WHEN a.x > b.x THEN 1
                       WHEN a.x < b.x THEN -1 ELSE 0 END) AS BIGINT) AS vt
  FROM i a JOIN i b ON a.t <> b.t
  GROUP BY a.t, a.d, a.n
),
u AS (
  SELECT t, d, n,
         SUM(vt) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS ut
  FROM v
),
k AS (
  SELECT MAX(abs(ut)) AS kstat FROM u WHERE t < n
)
SELECT CAST(u.d AS TIMESTAMP) AS d, CAST(u.t AS BIGINT) AS t,
       CAST(u.ut AS BIGINT) AS u_t,
       CAST(k.kstat AS BIGINT) AS k_stat,
       u.t < u.n AND abs(u.ut) = k.kstat
         AND u.t = (SELECT MIN(t) FROM u u2
                    WHERE abs(u2.ut) = k.kstat AND u2.t < u2.n)
         AS is_changepoint
FROM u CROSS JOIN k
""",
    category="aggregations",
)
def agg_pettitt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt changepoint test on the click daily-revenue series —
    the rank-based single-changepoint detector that completes the
    drift tier (win_cusum_changepoint and agg_page_hinkley watch the
    MEAN; Pettitt is the Mann-Whitney-flavored nonparametric twin):
    U_t = sum_{{i<=t, j>t}} sgn(x_i - x_j) via the exact recurrence
    U_t = U_{{t-1}} + V_t with V_t = sum_j sgn(x_t - x_j), so one
    O(days^2) sign rollup on the bounded grid plus one cumulative sum
    replaces the O(days^3) direct enumeration; K = max |U_t| over
    t < n and the changepoint is its first attaining index
    (deterministic tie-break). Everything is exact integers — no
    float enters at any point. Scale: the pair join runs on the
    value-domain-bounded day grid, never on raw events."""
    g = _day_grid(spark, sf_dir)
    s = g.where(F.col("event_type") == "click").select("d", "x")
    wi = Window.orderBy("d")
    wn = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    i = s.select(
        "d",
        "x",
        F.row_number().over(wi).alias("t"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    a = i.select(
        F.col("t").alias("ta"), F.col("d").alias("da"),
        F.col("x").alias("xa"), F.col("n").alias("na"),
    )
    b = i.select(F.col("t").alias("tb"), F.col("x").alias("xb"))
    v = (
        a.join(b, F.col("ta") != F.col("tb"))
        .groupBy("ta", "da", "na")
        .agg(
            F.sum(
                F.when(F.col("xa") > F.col("xb"), 1)
                .when(F.col("xa") < F.col("xb"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("vt")
        )
    )
    wu = Window.orderBy("ta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    u = v.select(
        "ta", "da", "na", F.sum("vt").over(wu).alias("ut")
    )
    k = u.where(F.col("ta") < F.col("na")).agg(
        F.max(F.abs(F.col("ut"))).alias("kstat")
    )
    first = (
        u.crossJoin(F.broadcast(k))
        .where(
            (F.col("ta") < F.col("na")) & (F.abs(F.col("ut")) == F.col("kstat"))
        )
        .agg(F.min("ta").alias("t_first"))
    )
    return (
        u.crossJoin(F.broadcast(k))
        .crossJoin(F.broadcast(first))
        .select(
            F.col("da").cast("timestamp").alias("d"),
            F.col("ta").cast("long").alias("t"),
            F.col("ut").cast("long").alias("u_t"),
            F.col("kstat").cast("long").alias("k_stat"),
            (
                (F.col("ta") < F.col("na"))
                & (F.abs(F.col("ut")) == F.col("kstat"))
                & (F.col("ta") == F.col("t_first"))
            ).alias("is_changepoint"),
        )
    )


_MMR_CANDS = 32
_MMR_K = 4
_MMR_QUERY = [1 if j <= 32 else -1 for j in range(1, 65)]  # literal query


def _mmr_oracle() -> str:
    """Unrolled greedy MMR (lambda = 1/2, doubled scores: mmr2 =
    rel - max_sim) as materialized CTE rounds, the _k_core_exact
    unroll pattern."""
    q_terms = " + ".join(
        f"xq[{j}] * {c}" for j, c in enumerate(_MMR_QUERY, start=1)
    )
    dot_ab = " + ".join(f"a.xq[{j}] * b.xq[{j}]" for j in range(1, 65))
    parts = [
        f"""WITH base AS MATERIALIZED (
  SELECT vec_id,
         list_transform(range(1, 65),
           i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000)
                     AS BIGINT)) AS xq
  FROM embeddings WHERE vec_id < {_MMR_CANDS}
),
rel AS MATERIALIZED (
  SELECT vec_id, xq, CAST({q_terms} AS BIGINT) AS rel FROM base
),
p1 AS MATERIALIZED (
  SELECT vec_id, xq, rel, CAST(0 AS BIGINT) AS max_sim, rel AS mmr2,
         1 AS rank FROM rel
  ORDER BY rel DESC, vec_id LIMIT 1
)"""
    ]
    prev_union = "SELECT * FROM p1"
    for r in range(2, _MMR_K + 1):
        parts.append(
            f""",
picked{r - 1} AS MATERIALIZED ({prev_union}),
scored{r} AS MATERIALIZED (
  SELECT a.vec_id, a.xq, a.rel,
         CAST(MAX({dot_ab}) AS BIGINT) AS max_sim
  FROM rel a JOIN picked{r - 1} b ON a.vec_id <> b.vec_id
  WHERE a.vec_id NOT IN (SELECT vec_id FROM picked{r - 1})
  GROUP BY a.vec_id, a.xq, a.rel
),
p{r} AS MATERIALIZED (
  SELECT vec_id, xq, rel, max_sim, rel - max_sim AS mmr2, {r} AS rank
  FROM scored{r}
  ORDER BY rel - max_sim DESC, vec_id LIMIT 1
)"""
        )
        prev_union += f" UNION ALL SELECT * FROM p{r}"
    parts.append(
        f"""
SELECT CAST(rank AS BIGINT) AS rank, vec_id, rel, max_sim,
       CAST(mmr2 AS BIGINT) AS mmr2
FROM ({prev_union}) u"""
    )
    return "".join(parts)


@query("pipeline_mmr_rerank", oracle=_mmr_oracle(), category="pipelines")
def pipeline_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance reranking (Carbonell & Goldstein
    1998) — the diversity-aware selection every RAG retriever runs
    after similarity scoring: greedily pick k=4 of 32 candidates
    maximizing relevance MINUS the max similarity to anything already
    picked (lambda = 1/2; scores doubled so mmr2 = rel - max_sim
    stays an exact int64 — relevance and similarities are integer
    dots on the proven 1e-6 quantization grid). The greedy argmax is
    inherently sequential, so the 4 rounds unroll: each is one
    broadcast join of the <=3-row picked set against the candidates,
    one exact-integer max-similarity rollup, and a TakeOrdered-1
    pick with a deterministic vec_id tie-break; the only driver
    traffic is the k picked ids (bounded fold, the kmeans/power-
    iteration convention). The graded output re-derives relevance,
    max-sim and mmr2 ENGINE-SIDE from the picked-id literals. Scale:
    candidates stay distributed; per round the shuffled mass is
    O(candidates), never O(candidates^2)."""
    e = table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") < _MMR_CANDS
    )
    base = e.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda v: F.round(v.cast("double") * 1_000_000).cast("long"),
        ).alias("xq"),
    ).localCheckpoint(eager=True)
    q_terms = " + ".join(
        f"element_at(xq, {j}) * {c}L"
        for j, c in enumerate(_MMR_QUERY, start=1)
    )
    rel = base.select(
        "vec_id", "xq", F.expr(q_terms).cast("long").alias("rel")
    ).localCheckpoint(eager=True)

    picked = []  # [(rank, vec_id)]
    first = rel.orderBy(F.desc("rel"), F.asc("vec_id")).limit(1).collect()[0]
    picked.append((1, int(first["vec_id"])))
    for r in range(2, _MMR_K + 1):
        pids = [vid for _, vid in picked]
        pvec = rel.where(F.col("vec_id").isin(pids)).select(
            F.col("vec_id").alias("pid"), F.col("xq").alias("pxq")
        )
        remaining = rel.where(~F.col("vec_id").isin(pids))
        scored = (
            remaining.crossJoin(F.broadcast(pvec))
            .select(
                "vec_id",
                "rel",
                F.expr(
                    "aggregate(zip_with(xq, pxq, (a, b) -> a * b),"
                    " 0L, (acc, t) -> acc + t)"
                ).alias("sim"),
            )
            .groupBy("vec_id", "rel")
            .agg(F.max("sim").cast("long").alias("max_sim"))
        )
        pick = (
            scored.orderBy(
                F.desc(F.col("rel") - F.col("max_sim")), F.asc("vec_id")
            )
            .limit(1)
            .collect()[0]
        )
        picked.append((r, int(pick["vec_id"])))
    # engine-side re-derivation from the picked-id literals
    spark_sess = base.sparkSession
    ptab = F.broadcast(
        spark_sess.createDataFrame(picked, "rank int, vec_id bigint")
    )
    out = ptab.join(rel, "vec_id").select(
        "rank", "vec_id", "rel", "xq"
    )
    a = out.select(
        F.col("rank").alias("ra"),
        F.col("vec_id").alias("va"),
        F.col("rel").alias("rel_a"),
        F.col("xq").alias("xa"),
    )
    b = out.select(F.col("rank").alias("rb"), F.col("xq").alias("xb"))
    sims = (
        a.join(F.broadcast(b), F.col("ra") > F.col("rb"))
        .select(
            "ra",
            "va",
            "rel_a",
            F.expr(
                "aggregate(zip_with(xa, xb, (p, q) -> p * q),"
                " 0L, (acc, t) -> acc + t)"
            ).alias("sim"),
        )
        .groupBy("ra", "va", "rel_a")
        .agg(F.max("sim").cast("long").alias("max_sim"))
    )
    firstrow = out.where(F.col("rank") == 1).select(
        F.col("rank").cast("long").alias("rank"),
        "vec_id",
        "rel",
        F.lit(0).cast("long").alias("max_sim"),
        F.col("rel").cast("long").alias("mmr2"),
    )
    rest = sims.select(
        F.col("ra").cast("long").alias("rank"),
        F.col("va").alias("vec_id"),
        F.col("rel_a").alias("rel"),
        "max_sim",
        (F.col("rel_a") - F.col("max_sim")).cast("long").alias("mmr2"),
    )
    return firstrow.unionByName(rest)


_VR_K = 4  # aggregation horizon for the variance-ratio test


@query(
    "win_variance_ratio",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
s AS (SELECT d, x FROM g WHERE event_type = 'click'),
i AS (SELECT d, x, ROW_NUMBER() OVER (ORDER BY d) AS t FROM s),
r1 AS (
  SELECT t, x - lag(x) OVER (ORDER BY t) AS r
  FROM i
),
rk AS (
  SELECT t, x - lag(x, {_VR_K}) OVER (ORDER BY t) AS r
  FROM i
),
m1 AS (
  SELECT CAST(COUNT(r) AS BIGINT) AS n1, CAST(SUM(r) AS BIGINT) AS s1,
         SUM(CAST(r AS HUGEINT) * r) AS q1
  FROM r1 WHERE r IS NOT NULL
),
mk AS (
  SELECT CAST(COUNT(r) AS BIGINT) AS nk, CAST(SUM(r) AS BIGINT) AS sk,
         SUM(CAST(r AS HUGEINT) * r) AS qk
  FROM rk WHERE r IS NOT NULL
)
SELECT m1.n1, mk.nk, m1.s1, mk.sk,
       (CAST(CAST(m1.q1 AS VARCHAR) AS DOUBLE)
        - CAST(m1.s1 AS DOUBLE) * m1.s1 / m1.n1) / (m1.n1 - 1) AS var1,
       (CAST(CAST(mk.qk AS VARCHAR) AS DOUBLE)
        - CAST(mk.sk AS DOUBLE) * mk.sk / mk.nk) / (mk.nk - 1) AS vark,
       ((CAST(CAST(mk.qk AS VARCHAR) AS DOUBLE)
         - CAST(mk.sk AS DOUBLE) * mk.sk / mk.nk) / (mk.nk - 1))
       / ({_VR_K}.0 *
          ((CAST(CAST(m1.q1 AS VARCHAR) AS DOUBLE)
            - CAST(m1.s1 AS DOUBLE) * m1.s1 / m1.n1) / (m1.n1 - 1)))
         AS vr
FROM m1 CROSS JOIN mk
""",
    category="windows",
)
def win_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio test (k = 4) on the click
    daily-revenue series — the random-walk diagnostic: under i.i.d.
    increments Var(k-period change) = k * Var(1-period change), so
    VR far from 1 signals mean-reversion (<1) or momentum (>1). Both
    variance estimates come from exact integer power sums of the
    lag-1 and lag-k differences (HUGEINT/DECIMAL via the VARCHAR
    route), and VR is one fixed-order double chain shared by the
    twins. Scale: two lag windows + two rollups on the value-domain-
    bounded day grid."""
    g = _day_grid(spark, sf_dir)
    s = g.where(F.col("event_type") == "click").select("d", "x")
    w = Window.orderBy("d")

    def _moments(lag: int, pn: str, ps: str, pq: str) -> DataFrame:
        r = s.select((F.col("x") - F.lag("x", lag).over(w)).alias("r")).where(
            F.col("r").isNotNull()
        )
        return r.agg(
            F.count("r").cast("long").alias(pn),
            F.sum("r").cast("long").alias(ps),
            F.sum(F.col("r").cast("decimal(38,0)") * F.col("r")).alias(pq),
        )

    m1 = _moments(1, "n1", "s1", "q1")
    mk = _moments(_VR_K, "nk", "sk", "qk")
    j = m1.crossJoin(F.broadcast(mk))
    var1 = (
        F.col("q1").cast("string").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n1")
    ) / (F.col("n1") - 1)
    vark = (
        F.col("qk").cast("string").cast("double")
        - F.col("sk").cast("double") * F.col("sk") / F.col("nk")
    ) / (F.col("nk") - 1)
    return j.select(
        "n1",
        "nk",
        "s1",
        "sk",
        var1.alias("var1"),
        vark.alias("vark"),
        (vark / (float(_VR_K) * var1)).alias("vr"),
    )


@query(
    "pipeline_quantile_normalize",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
s AS (SELECT event_type, d, x FROM g
      WHERE event_type IN ('click', 'purchase')),
rk AS (
  SELECT event_type, d, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x, d) AS rnk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM s
),
common AS (SELECT MIN(n) AS nc FROM (SELECT DISTINCT n FROM rk) t),
trimmed AS (SELECT rk.* FROM rk CROSS JOIN common WHERE rk.rnk <= common.nc),
ref AS (
  SELECT rnk, CAST(SUM(x) AS BIGINT) AS ref2_num,
         CAST(COUNT(*) AS BIGINT) AS n_series
  FROM trimmed GROUP BY rnk
)
SELECT t.event_type, CAST(t.d AS TIMESTAMP) AS d, t.x,
       CAST(t.rnk AS BIGINT) AS rnk, ref.ref2_num, ref.n_series,
       CAST(ref.ref2_num AS DOUBLE) / ref.n_series AS x_qnorm
FROM trimmed t JOIN ref ON ref.rnk = t.rnk
""",
    category="pipelines",
)
def pipeline_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of the click and purchase daily-revenue
    series — the cross-sample distribution-matching transform
    bioinformatics standardized (every series is remapped so its
    order statistics agree with the cross-series mean order
    statistic): each series is ranked internally (deterministic
    (x, d) tie-break), ranks beyond the shortest series are trimmed
    (both series cover the same days here, so this is a no-op guard),
    and the reference distribution at each rank is the across-series
    SUM carried exact (ref2_num) with the mean division display-only.
    Scale shape: per-series ranking is key-partitioned on
    event_type; the per-rank reference rollup and fan-back join are
    key-partitioned on rank — nothing global, no broadcast of
    anything data-proportional."""
    g = _day_grid(spark, sf_dir)
    s = g.where(F.col("event_type").isin("click", "purchase")).select(
        "event_type", "d", "x"
    )
    wr = Window.partitionBy("event_type").orderBy("x", "d")
    wn = Window.partitionBy("event_type")
    rk = s.select(
        "event_type",
        "d",
        "x",
        F.row_number().over(wr).alias("rnk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    common = rk.select("n").distinct().agg(F.min("n").alias("nc"))
    trimmed = rk.crossJoin(F.broadcast(common)).where(
        F.col("rnk") <= F.col("nc")
    )
    ref = trimmed.groupBy("rnk").agg(
        F.sum("x").cast("long").alias("ref2_num"),
        F.count(F.lit(1)).cast("long").alias("n_series"),
    )
    return trimmed.join(ref, "rnk").select(
        "event_type",
        F.col("d").cast("timestamp").alias("d"),
        "x",
        F.col("rnk").cast("long").alias("rnk"),
        "ref2_num",
        "n_series",
        (F.col("ref2_num").cast("double") / F.col("n_series")).alias(
            "x_qnorm"
        ),
    )


_DID_CUT = "2024-01-16"  # pre/post boundary (events span Jan 2024)


@query(
    "pipeline_did",
    oracle=f"""
WITH r AS (
  SELECT ((user_id & {(1 << 31) - 1}) * 2654435761) % 2 AS treated,
         CASE WHEN ts >= TIMESTAMP '{_DID_CUT}' THEN 1 ELSE 0 END AS post,
         {_CENTS_SQL} AS y
  FROM events WHERE event_type = 'purchase'
),
cells AS (
  SELECT treated, post, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS s
  FROM r GROUP BY treated, post
),
w AS (
  SELECT
    MAX(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n11,
    MAX(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n10,
    MAX(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n01,
    MAX(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n00,
    MAX(CASE WHEN treated = 1 AND post = 1 THEN s END) AS s11,
    MAX(CASE WHEN treated = 1 AND post = 0 THEN s END) AS s10,
    MAX(CASE WHEN treated = 0 AND post = 1 THEN s END) AS s01,
    MAX(CASE WHEN treated = 0 AND post = 0 THEN s END) AS s00
  FROM cells
)
SELECT n11, n10, n01, n00, s11, s10, s01, s00,
       CAST(s11 AS DOUBLE) / n11 AS m11,
       CAST(s10 AS DOUBLE) / n10 AS m10,
       CAST(s01 AS DOUBLE) / n01 AS m01,
       CAST(s00 AS DOUBLE) / n00 AS m00,
       (CAST(s11 AS DOUBLE) / n11 - CAST(s10 AS DOUBLE) / n10)
         - (CAST(s01 AS DOUBLE) / n01 - CAST(s00 AS DOUBLE) / n00) AS did
FROM w
""",
    category="pipelines",
)
def pipeline_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the workhorse causal-inference
    readout (treatment assigned by the deterministic Knuth hash of
    the user id, the pipeline_ab_test convention; pre/post split at a
    fixed calendar cutoff): the 2x2 cell means of purchase cents are
    carried as exact BIGINT (sum, count) pairs, each mean is ONE
    double division, and the DiD estimate (m11 - m10) - (m01 - m00)
    is a fixed-order chain of those four correctly-rounded values —
    identical in both engines. The parallel-trends counterfactual is
    the analyst's burden; the query's job is exact cells. Scale: one
    conditional aggregation onto the 4-cell domain — map-side
    partials collapse everything."""
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    r = ev.select(
        (
            (F.col("user_id").bitwiseAND((1 << 31) - 1) * 2654435761) % 2
        ).alias("treated"),
        F.when(F.col("ts") >= F.lit(_DID_CUT).cast("timestamp"), 1)
        .otherwise(0)
        .alias("post"),
        cents.alias("y"),
    )
    w = r.agg(
        *[
            F.sum(
                F.when(
                    (F.col("treated") == t) & (F.col("post") == p), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"n{t}{p}")
            for t in (1, 0)
            for p in (1, 0)
        ],
        *[
            F.sum(
                F.when(
                    (F.col("treated") == t) & (F.col("post") == p), F.col("y")
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"s{t}{p}")
            for t in (1, 0)
            for p in (1, 0)
        ],
    )
    m = {
        f"m{t}{p}": F.col(f"s{t}{p}").cast("double") / F.col(f"n{t}{p}")
        for t in (1, 0)
        for p in (1, 0)
    }
    return w.select(
        "n11", "n10", "n01", "n00", "s11", "s10", "s01", "s00",
        m["m11"].alias("m11"),
        m["m10"].alias("m10"),
        m["m01"].alias("m01"),
        m["m00"].alias("m00"),
        ((m["m11"] - m["m10"]) - (m["m01"] - m["m00"])).alias("did"),
    )


@query(
    "text_burstiness",
    oracle="""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
ndocs AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM d),
tok AS (
  SELECT doc_id, unnest(toks) AS token FROM d
),
per_doc AS (
  SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS k
  FROM tok GROUP BY token, doc_id
),
agg AS (
  SELECT token, CAST(SUM(k) AS BIGINT) AS tot,
         CAST(SUM(k * k) AS BIGINT) AS sumsq,
         CAST(COUNT(*) AS BIGINT) AS df
  FROM per_doc GROUP BY token
)
SELECT token, tot, sumsq, df, ndocs.nd AS n_docs,
       (CAST(sumsq AS DOUBLE) - CAST(tot AS DOUBLE) * tot / ndocs.nd)
         / (ndocs.nd - 1)
         / (CAST(tot AS DOUBLE) / ndocs.nd) AS vmr
FROM agg CROSS JOIN ndocs
""",
    category="text",
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token burstiness (Church-Gale variance-to-mean ratio) — the
    corpus statistic separating bursty content words (a word that
    appears once in a doc tends to appear again) from evenly-spread
    function words; VMR = 1 is the Poisson baseline, the quantity
    deduplication and topicality heuristics key off. Per-doc counts
    include the zero-count docs ANALYTICALLY (zeros contribute
    nothing to sum or sumsq, so sum over present docs + the exact
    total doc count give the full-population moments), every sum is
    an exact BIGINT, and VMR is one fixed-order double chain. Scale:
    one corpus explode, a (token, doc) rollup, then a
    vocabulary-domain-bounded aggregate with the 1-row doc-count
    broadcast."""
    docs = table(spark, sf_dir, "documents")
    nd = docs.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    per_doc = tok.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    agg = per_doc.groupBy("token").agg(
        F.sum("k").cast("long").alias("tot"),
        F.sum(F.col("k") * F.col("k")).cast("long").alias("sumsq"),
        F.count(F.lit(1)).cast("long").alias("df"),
    )
    j = agg.crossJoin(F.broadcast(nd))
    totd = F.col("tot").cast("double")
    return j.select(
        "token",
        "tot",
        "sumsq",
        "df",
        F.col("nd").alias("n_docs"),
        (
            (F.col("sumsq").cast("double") - totd * F.col("tot") / F.col("nd"))
            / (F.col("nd") - 1)
            / (totd / F.col("nd"))
        ).alias("vmr"),
    )


@query(
    "agg_leverage",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
s AS (SELECT d, x FROM g WHERE event_type = 'click'),
i AS (SELECT d, x AS y, ROW_NUMBER() OVER (ORDER BY d) AS t,
             COUNT(*) OVER () AS n
      FROM s),
m AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(t * y) AS BIGINT) AS sty
  FROM i
)
SELECT CAST(i.d AS TIMESTAMP) AS d, CAST(i.t AS BIGINT) AS t, i.y,
       CAST((m.n * m.n - 1) + 3 * (2 * i.t - m.n - 1) * (2 * i.t - m.n - 1)
            AS BIGINT) AS h_num,
       CAST(m.n * (m.n * m.n - 1) AS BIGINT) AS h_den,
       CAST((m.n * m.n - 1)
            + 3 * (2 * i.t - m.n - 1) * (2 * i.t - m.n - 1) AS DOUBLE)
         / (m.n * (m.n * m.n - 1.0)) AS leverage,
       (m.n * m.n - 1)
         + 3 * (2 * i.t - m.n - 1) * (2 * i.t - m.n - 1)
         > 4 * (m.n * m.n - 1) AS high_leverage,
       (CAST(12 * m.sty AS DOUBLE) - 6.0 * (m.n + 1) * m.sy)
         / (m.n * (CAST(m.n AS DOUBLE) * m.n - 1)) AS slope,
       CAST(m.sy AS DOUBLE) / m.n
         - (CAST(12 * m.sty AS DOUBLE) - 6.0 * (m.n + 1) * m.sy)
           / (m.n * (CAST(m.n AS DOUBLE) * m.n - 1)) * (m.n + 1) / 2.0
         + (CAST(12 * m.sty AS DOUBLE) - 6.0 * (m.n + 1) * m.sy)
           / (m.n * (CAST(m.n AS DOUBLE) * m.n - 1)) * i.t
         AS fitted
FROM i CROSS JOIN m
""",
    category="aggregations",
)
def agg_leverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression leverage diagnostics for the trend fit of click
    daily revenue on time — the hat-matrix diagonal every influence
    audit starts from: for simple regression on the equispaced index
    t = 1..n the leverage has the CLOSED integer form h_t = [(n^2-1)
    + 3(2t-n-1)^2] / [n(n^2-1)] (exact h_num/h_den pair; the >2p/n
    rule-of-thumb flag h > 4/n is the exact integer comparison h_num
    > 4(n^2-1)), the OLS slope over the same index is b = [12*Sty -
    6(n+1)*Sy] / [n(n^2-1)] from two exact integer sums, and the
    fitted line is one fixed-order double chain. agg_linear_
    regression fits y-on-cents; this is its DIAGNOSTIC companion on
    the design the hat matrix is closed-form for. Scale: the grid
    rollup is bounded; the 1-row moment table broadcasts back."""
    g = _day_grid(spark, sf_dir)
    s = g.where(F.col("event_type") == "click").select("d", "x")
    wi = Window.orderBy("d")
    wn = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    i = s.select(
        "d",
        F.col("x").alias("y"),
        F.row_number().over(wi).alias("t"),
        F.count(F.lit(1)).over(wn).alias("n0"),
    )
    m = i.agg(
        F.max("n0").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("sty"),
    )
    j = i.crossJoin(F.broadcast(m))
    n, t, sy, sty = F.col("n"), F.col("t"), F.col("sy"), F.col("sty")
    dev = 2 * t - n - 1
    h_num = (n * n - 1) + 3 * dev * dev
    h_den = n * (n * n - 1)
    slope = (
        (12 * sty).cast("double") - 6.0 * (n + 1) * sy
    ) / (n * (n.cast("double") * n - 1))
    fitted = (
        sy.cast("double") / n
        - slope * (n + 1) / 2.0
        + slope * t
    )
    return j.select(
        F.col("d").cast("timestamp").alias("d"),
        t.cast("long").alias("t"),
        "y",
        h_num.cast("long").alias("h_num"),
        h_den.cast("long").alias("h_den"),
        (h_num.cast("double") / (n * (n * n - 1.0))).alias("leverage"),
        (h_num > 4 * (n * n - 1)).alias("high_leverage"),
        slope.alias("slope"),
        fitted.alias("fitted"),
    )


@query(
    "agg_c_index",
    oracle=f"""
WITH u AS (
  SELECT user_id,
         MAX(CAST(date_trunc('day', ts) AS DATE)) AS churn_day,
         CAST(SUM({_CENTS_SQL}) AS BIGINT) AS spend
  FROM events GROUP BY user_id
),
pairs AS (
  SELECT a.user_id AS ia, b.user_id AS ib,
         CASE WHEN a.spend > b.spend THEN 2
              WHEN a.spend = b.spend THEN 1 ELSE 0 END AS conc2
  FROM u a JOIN u b
    ON a.churn_day < b.churn_day
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_comparable,
         CAST(SUM(conc2) AS BIGINT) AS conc2_sum
  FROM pairs
)
SELECT n_comparable, conc2_sum,
       CAST(conc2_sum AS DOUBLE) / (2 * n_comparable) AS c_index
FROM t
""",
    category="aggregations",
)
def agg_c_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harrell's concordance index — the survival-analysis ranking
    metric joining agg_survival_hazard (whose churn clock this
    reuses: a user's event time is their last observed day) to
    pipeline_eval_auc (whose tie convention this doubles the same
    way): over all COMPARABLE pairs (i churns strictly before j),
    count score-concordant pairs — here score = lifetime spend, so
    c > 0.5 means higher spenders survive longer — with ties worth
    1/2, carried as the exact integer conc2 in {{0, 1, 2}} so
    c_index = conc2_sum / (2 * n_comparable) is exact integers + one
    double division. Scale shape: the comparable-pair join is a
    range join on churn_day — at production scale it blocks on the
    bounded day domain (every pair join here follows the
    dedup-blocking discipline); user count is data-proportional, so
    the demo's direct pair join stands in for the day-blocked plan
    the docstrings of dedup_edit_distance describe."""
    ev = table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    u = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.max("ts"))).alias("churn_day"),
        F.sum(cents).cast("long").alias("spend"),
    )
    a = u.select(
        F.col("user_id").alias("ia"),
        F.col("churn_day").alias("da"),
        F.col("spend").alias("sa"),
    )
    b = u.select(
        F.col("user_id").alias("ib"),
        F.col("churn_day").alias("db"),
        F.col("spend").alias("sb"),
    )
    pairs = a.join(b, F.col("da") < F.col("db")).select(
        F.when(F.col("sa") > F.col("sb"), 2)
        .when(F.col("sa") == F.col("sb"), 1)
        .otherwise(0)
        .alias("conc2")
    )
    t = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_comparable"),
        F.sum("conc2").cast("long").alias("conc2_sum"),
    )
    return t.select(
        "n_comparable",
        "conc2_sum",
        (F.col("conc2_sum").cast("double") / (2 * F.col("n_comparable"))).alias(
            "c_index"
        ),
    )


_NW_LAGS = 3  # Bartlett truncation L


@query(
    "agg_newey_west",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
s AS (SELECT d, x FROM g WHERE event_type = 'click'),
i AS (SELECT d, x, ROW_NUMBER() OVER (ORDER BY d) AS t FROM s),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
      FROM i),
c AS (SELECT i.t, CAST(m.n * i.x - m.sx AS BIGINT) AS e, m.n
      FROM i CROSS JOIN m),
l AS (
  SELECT e, n,
         {", ".join(f"lead(e, {k}) OVER (ORDER BY t) AS e{k}" for k in range(1, _NW_LAGS + 1))}
  FROM c
),
a AS (
  SELECT MAX(n) AS n,
         SUM(CAST(e AS HUGEINT) * e) AS g0,
         {", ".join(f"SUM(CAST(e AS HUGEINT) * e{k}) AS g{k}" for k in range(1, _NW_LAGS + 1))}
  FROM l
)
SELECT CAST(n AS BIGINT) AS n, CAST({_NW_LAGS} AS BIGINT) AS n_lags,
       CAST(CAST(g0 AS VARCHAR) AS DOUBLE)
         / (CAST(n AS DOUBLE) * n * n) AS gamma0,
       (CAST(CAST(g0 AS VARCHAR) AS DOUBLE)
        + {" + ".join(
            f"2.0 * {_NW_LAGS + 1 - k} / {_NW_LAGS + 1}.0"
            f" * CAST(CAST(g{k} AS VARCHAR) AS DOUBLE)"
            for k in range(1, _NW_LAGS + 1))})
         / (CAST(n AS DOUBLE) * n * n) AS nw_variance
FROM a
""",
    category="aggregations",
)
def agg_newey_west(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newey-West (HAC) long-run variance of the click daily-revenue
    series (Bartlett kernel, L = 3) — the autocorrelation-robust
    variance every serially-correlated standard error leans on:
    sigma^2_NW = gamma_0 + 2 sum_l (1 - l/(L+1)) gamma_l. The
    autocovariance numerators come from n-SCALED deviations e_t =
    n*x_t - S (the agg_ljung_box machinery — exact HUGEINT products,
    VARCHAR route), and each Bartlett weight 1 - l/4 enters the one
    fixed-order double chain as the exact rational (4-l)/4 — no
    float accumulates across rows anywhere. Scale: lead windows and
    the rollup on the value-domain-bounded day grid."""
    g = _day_grid(spark, sf_dir)
    s = g.where(F.col("event_type") == "click").select("d", "x")
    m = s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    )
    c = s.crossJoin(F.broadcast(m)).select(
        "d",
        (F.col("n") * F.col("x") - F.col("sx")).cast("long").alias("e"),
        "n",
    )
    w = Window.orderBy("d")
    l = c.select(
        "e",
        "n",
        *[F.lead("e", k).over(w).alias(f"e{k}") for k in range(1, _NW_LAGS + 1)],
    )
    edec = F.col("e").cast("decimal(38,0)")
    a = l.agg(
        F.max("n").alias("n"),
        F.sum(edec * F.col("e")).alias("g0"),
        *[
            F.sum(edec * F.col(f"e{k}")).alias(f"g{k}")
            for k in range(1, _NW_LAGS + 1)
        ],
    )
    n = F.col("n")
    n3 = n.cast("double") * n * n
    g0d = F.col("g0").cast("string").cast("double")
    nw = g0d
    for k in range(1, _NW_LAGS + 1):
        nw = nw + 2.0 * (_NW_LAGS + 1 - k) / float(_NW_LAGS + 1) * F.col(
            f"g{k}"
        ).cast("string").cast("double")
    return a.select(
        n.cast("long").alias("n"),
        F.lit(_NW_LAGS).cast("long").alias("n_lags"),
        (g0d / n3).alias("gamma0"),
        (nw / n3).alias("nw_variance"),
    )

_KFOLD_K = 5


@query(
    "pipeline_group_kfold",
    oracle=f"""
WITH anchors AS (
  SELECT source, CAST(MIN(doc_id) AS BIGINT) AS anchor
  FROM documents GROUP BY source
),
folds AS (
  SELECT source,
         ((anchor & {(1 << 31) - 1}) * 2654435761) % {_KFOLD_K} AS fold
  FROM anchors
),
d AS (
  SELECT doc.doc_id, doc.n_chars, folds.source, folds.fold
  FROM documents doc JOIN folds ON folds.source = doc.source
),
per_fold AS (
  SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
  FROM d GROUP BY fold
),
leak AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_leaky_sources
  FROM (SELECT source FROM d GROUP BY source
        HAVING COUNT(DISTINCT fold) > 1) t
)
SELECT CAST(per_fold.fold AS BIGINT) AS fold, per_fold.n_docs,
       per_fold.sum_chars, per_fold.n_sources, leak.n_leaky_sources
FROM per_fold CROSS JOIN leak
""",
    category="pipelines",
)
def pipeline_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group k-fold assignment (k = 5) — the leakage-proof eval split
    pipeline_train_split and pipeline_stratified_split do NOT give
    you: the fold is a pure function of the GROUP (source), so every
    document of a source lands in the same fold and a model evaluated
    on fold i never saw fold i's sources (the held-out-domain
    protocol). Portability subtlety this query pins: hashing the
    source STRING with each engine's hash() would silently diverge
    (Spark xxhash vs DuckDB's hash are different functions), so the
    group key is reduced to an engine-portable integer anchor first —
    the source's MIN doc id — and the fold is the 31-bit-masked Knuth
    hash of that anchor, identical arithmetic in both engines. The
    output is the per-fold manifest plus the leakage certificate
    n_leaky_sources == 0 (sources spanning more than one fold; pinned
    by test). Scale shape: one per-source anchor rollup (broadcast
    back — the source domain is small), one fold-domain rollup."""
    docs = table(spark, sf_dir, "documents")
    anchors = docs.groupBy("source").agg(
        F.min("doc_id").cast("long").alias("anchor")
    )
    folds = anchors.select(
        "source",
        (
            (F.col("anchor").bitwiseAND((1 << 31) - 1) * 2654435761)
            % _KFOLD_K
        ).alias("fold"),
    )
    d = docs.join(F.broadcast(folds), "source")
    per_fold = d.groupBy("fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )
    leak = (
        d.groupBy("source")
        .agg(F.countDistinct("fold").alias("nf"))
        .where(F.col("nf") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("n_leaky_sources"))
    )
    return per_fold.crossJoin(F.broadcast(leak)).select(
        F.col("fold").cast("long").alias("fold"),
        "n_docs",
        "sum_chars",
        "n_sources",
        "n_leaky_sources",
    )


@query(
    "pipeline_eval_threshold",
    oracle="""
WITH q AS (
  SELECT vec_id, label >= 5 AS pos,
         list_sum(list_transform(range(1, 65),
           i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000)
                     AS BIGINT)
                * (CASE WHEN i % 2 = 1 THEN 1 ELSE -1 END))) AS score
  FROM embeddings
),
tot AS (
  SELECT CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
         CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nn
  FROM q
),
th AS (
  SELECT CAST(score AS BIGINT) AS thr,
         CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS tp_at,
         CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS fp_at
  FROM q GROUP BY score
),
cum AS (
  SELECT thr,
         SUM(tp_at) OVER (ORDER BY thr DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS tp,
         SUM(fp_at) OVER (ORDER BY thr DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS fp
  FROM th
),
j AS (
  SELECT cum.thr, cum.tp, cum.fp, tot.np, tot.nn,
         CAST(cum.tp * tot.nn - cum.fp * tot.np AS BIGINT) AS j_num
  FROM cum CROSS JOIN tot
),
best AS (
  SELECT MAX(j_num) AS best_j FROM j
),
pick AS (
  SELECT MIN(thr) AS best_thr FROM j CROSS JOIN best
  WHERE j.j_num = best.best_j
)
SELECT j.thr, CAST(j.tp AS BIGINT) AS tp, CAST(j.fp AS BIGINT) AS fp,
       j.np, j.nn, j.j_num,
       CAST(j.tp AS DOUBLE) / j.np AS tpr,
       CAST(j.fp AS DOUBLE) / j.nn AS fpr,
       CAST(j.tp AS DOUBLE) / j.np - CAST(j.fp AS DOUBLE) / j.nn
         AS youden_j,
       j.thr = pick.best_thr AS is_optimal
FROM j CROSS JOIN pick
""",
    category="pipelines",
)
def pipeline_eval_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC operating-point selection by Youden's J — the
    threshold-picking step downstream of pipeline_eval_auc (same
    scorer, same exact-int machinery): for every candidate threshold
    (each distinct score; predict positive when score >= thr) the TP
    and FP counts come from ONE descending cumulative sum over the
    score-grouped counts, and the argmax of J = TPR - FPR is decided
    by the EXACT integer cross-product j_num = tp*nn - fp*np (equal
    denominators np*nn for every threshold, so comparing j_num IS
    comparing J — no float ever ranks thresholds; ties break to the
    smallest threshold). TPR/FPR/J doubles are display-only. Scale:
    score-domain-bounded rollup + cumulative sum; at data-proportional
    score domains the cumsum runs through grouped_cumsum_distributed
    (this demo's score domain is the bounded quantized-dot lattice)."""
    e = table(spark, sf_dir, "embeddings")
    score = None
    for jj in range(1, 65):
        term = F.round(
            F.element_at("embedding", jj).cast("double") * 1_000_000
        ).cast("long") * (1 if jj % 2 == 1 else -1)
        score = term if score is None else score + term
    q = e.select((F.col("label") >= 5).alias("pos"), score.alias("score"))
    tot = q.agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0))
        .cast("long")
        .alias("np"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1))
        .cast("long")
        .alias("nn"),
    )
    th = q.groupBy(F.col("score").alias("thr")).agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0))
        .cast("long")
        .alias("tp_at"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1))
        .cast("long")
        .alias("fp_at"),
    )
    wc = Window.orderBy(F.desc("thr")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = th.select(
        "thr",
        F.sum("tp_at").over(wc).alias("tp"),
        F.sum("fp_at").over(wc).alias("fp"),
    )
    j = cum.crossJoin(F.broadcast(tot)).select(
        "thr",
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        "np",
        "nn",
        (F.col("tp") * F.col("nn") - F.col("fp") * F.col("np"))
        .cast("long")
        .alias("j_num"),
    )
    best = j.agg(F.max("j_num").alias("best_j"))
    pick = (
        j.crossJoin(F.broadcast(best))
        .where(F.col("j_num") == F.col("best_j"))
        .agg(F.min("thr").alias("best_thr"))
    )
    return j.crossJoin(F.broadcast(pick)).select(
        "thr",
        "tp",
        "fp",
        "np",
        "nn",
        "j_num",
        (F.col("tp").cast("double") / F.col("np")).alias("tpr"),
        (F.col("fp").cast("double") / F.col("nn")).alias("fpr"),
        (
            F.col("tp").cast("double") / F.col("np")
            - F.col("fp").cast("double") / F.col("nn")
        ).alias("youden_j"),
        (F.col("thr") == F.col("best_thr")).alias("is_optimal"),
    )


@query(
    "text_yule_k",
    oracle="""
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token
  FROM documents
),
tf AS (
  SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS m
  FROM tok GROUP BY lang, token
),
fof AS (
  SELECT lang, m, CAST(COUNT(*) AS BIGINT) AS vm
  FROM tf GROUP BY lang, m
),
agg AS (
  SELECT lang,
         CAST(SUM(m * vm) AS BIGINT) AS n_tokens,
         CAST(SUM(vm) AS BIGINT) AS n_types,
         CAST(SUM(m * m * vm) AS BIGINT) AS s2
  FROM fof GROUP BY lang
)
SELECT lang, n_tokens, n_types,
       CAST(10000 * (s2 - n_tokens) AS BIGINT) AS k_num,
       CAST(n_tokens * n_tokens AS BIGINT) AS k_den,
       CAST(10000 * (s2 - n_tokens) AS DOUBLE)
         / (CAST(n_tokens AS DOUBLE) * n_tokens) AS yule_k
FROM agg
""",
    category="text",
)
def text_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K per language — the classic lexical-
    diversity constant (author-attribution era) that, unlike TTR or
    hapax ratio (text_hapax_ratio), is length-invariant: K = 10^4 *
    (sum_m m^2*V_m - N) / N^2 over the frequency-of-frequencies
    spectrum V_m (how many types occur exactly m times). Every
    quantity is an exact BIGINT off two nested rollups (type
    frequencies, then the frequency spectrum), K ships as an exact
    num/den pair with the double display-only. Scale: one corpus
    explode, then everything lands on the bounded (lang, frequency)
    spectrum domain."""
    tok = table(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split("text", " ")).alias("token")
    )
    tf = tok.groupBy("lang", "token").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    fof = tf.groupBy("lang", "m").agg(
        F.count(F.lit(1)).cast("long").alias("vm")
    )
    agg = fof.groupBy("lang").agg(
        F.sum(F.col("m") * F.col("vm")).cast("long").alias("n_tokens"),
        F.sum("vm").cast("long").alias("n_types"),
        F.sum(F.col("m") * F.col("m") * F.col("vm"))
        .cast("long")
        .alias("s2"),
    )
    k_num = 10000 * (F.col("s2") - F.col("n_tokens"))
    return agg.select(
        "lang",
        "n_tokens",
        "n_types",
        k_num.cast("long").alias("k_num"),
        (F.col("n_tokens") * F.col("n_tokens")).cast("long").alias("k_den"),
        (
            k_num.cast("double")
            / (F.col("n_tokens").cast("double") * F.col("n_tokens"))
        ).alias("yule_k"),
    )


@query(
    "pipeline_eval_pr",
    oracle="""
WITH q AS (
  SELECT vec_id, label >= 5 AS pos,
         list_sum(list_transform(range(1, 65),
           i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000)
                     AS BIGINT)
                * (CASE WHEN i % 2 = 1 THEN 1 ELSE -1 END))) AS score
  FROM embeddings
),
tot AS (SELECT CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np
        FROM q),
th AS (
  SELECT CAST(score AS BIGINT) AS thr,
         CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS tp_at,
         CAST(COUNT(*) AS BIGINT) AS n_at
  FROM q GROUP BY score
),
cum AS (
  SELECT thr, tp_at,
         SUM(tp_at) OVER w AS tp,
         SUM(n_at) OVER w AS pred_pos
  FROM th
  WINDOW w AS (ORDER BY thr DESC ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
),
terms AS (
  SELECT cum.thr, CAST(cum.tp AS BIGINT) AS tp,
         CAST(cum.pred_pos AS BIGINT) AS pred_pos, tot.np,
         CAST(cum.tp_at * cum.tp AS BIGINT) AS ap_term_num,
         CAST(tot.np * cum.pred_pos AS BIGINT) AS ap_term_den
  FROM cum CROSS JOIN tot
)
SELECT thr, tp, pred_pos, np,
       CAST(tp AS DOUBLE) / pred_pos AS precision,
       CAST(tp AS DOUBLE) / np AS recall,
       ap_term_num, ap_term_den
FROM terms
""",
    category="pipelines",
)
def pipeline_eval_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall curve + average precision — the ranking eval
    that matters under class imbalance where ROC flatters
    (pipeline_eval_auc's PR companion, same scorer): per threshold
    (descending), precision tp/pred_pos and recall tp/np come from
    one cumulative sum, and each AP summand dRecall_k * Precision_k
    ships as the EXACT integer pair tp_at*tp / (np*pred_pos) — a
    float running sum was tried first and the parity run caught
    DuckDB's windowed SUM aggregating through a SEGMENT TREE (tree
    addition order != sequential order -> last-ulp divergence), so
    the engine emits exact rationals and the caller folds AP (the
    tests certify it in Fraction arithmetic). Counts exact;
    divisions per-row. Scale: score-domain rollup + ordered
    cumsums, the eval_threshold shape."""
    e = table(spark, sf_dir, "embeddings")
    score = None
    for jj in range(1, 65):
        term = F.round(
            F.element_at("embedding", jj).cast("double") * 1_000_000
        ).cast("long") * (1 if jj % 2 == 1 else -1)
        score = term if score is None else score + term
    q = e.select((F.col("label") >= 5).alias("pos"), score.alias("score"))
    tot = q.agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("long").alias("np")
    )
    th = q.groupBy(F.col("score").alias("thr")).agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0))
        .cast("long")
        .alias("tp_at"),
        F.count(F.lit(1)).cast("long").alias("n_at"),
    )
    wc = Window.orderBy(F.desc("thr")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = th.select(
        "thr",
        "tp_at",
        F.sum("tp_at").over(wc).alias("tp"),
        F.sum("n_at").over(wc).alias("pred_pos"),
    )
    terms = cum.crossJoin(F.broadcast(tot)).select(
        "thr",
        F.col("tp").cast("long").alias("tp"),
        F.col("pred_pos").cast("long").alias("pred_pos"),
        "np",
        (F.col("tp_at") * F.col("tp")).cast("long").alias("ap_term_num"),
        (F.col("np") * F.col("pred_pos")).cast("long").alias("ap_term_den"),
    )
    return terms.select(
        "thr",
        "tp",
        "pred_pos",
        "np",
        (F.col("tp").cast("double") / F.col("pred_pos")).alias("precision"),
        (F.col("tp").cast("double") / F.col("np")).alias("recall"),
        "ap_term_num",
        "ap_term_den",
    )


def _mod97_weights(length: int) -> list:
    """10^(length-1-i) mod 97 for i = 0..length-1 (leftmost digit
    first) — the positional coefficients that turn the big-number
    mod into a bounded weighted sum."""
    return [pow(10, length - 1 - i, 97) for i in range(length)]


def _mod97_sql(col: str, length: int) -> str:
    ws = _mod97_weights(length)
    terms = " + ".join(
        f"CAST(substring({col}, {i + 1}, 1) AS BIGINT) * {w}"
        for i, w in enumerate(ws)
    )
    return f"(({terms}) % 97)"


@query(
    "fn_mod97",
    oracle=f"""
WITH b AS (
  SELECT c_custkey,
         lpad(CAST(c_custkey * 7919 + 13 AS VARCHAR), 18, '0') AS bban
  FROM customer
),
c AS (
  SELECT c_custkey, bban,
         {_mod97_sql("bban || '353500'", 24)} AS r
  FROM b
),
d AS (
  SELECT c_custkey, bban,
         lpad(CAST(98 - r AS VARCHAR), 2, '0') AS check_digits
  FROM c
)
SELECT c_custkey, bban, check_digits,
       'ZZ' || check_digits || bban AS iban,
       {_mod97_sql("bban || '3535' || check_digits", 24)} AS mod97_verify,
       {_mod97_sql("bban || '3535' || check_digits", 24)} = 1 AS is_valid
FROM d
""",
    category="functions",
)
def fn_mod97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO 7064 mod-97-10 check digits (the IBAN algorithm) — compute
    AND verify: an 18-digit account body derives deterministically
    from the customer key, the check digits are 98 minus the mod-97
    of the rearranged string (country 'ZZ' maps to '3535' per the
    letter table A=10..Z=35), and the verification column re-runs the
    mod on the completed string and must equal 1 on EVERY row (pinned
    by test). The 24-digit number never exists as a number: mod 97 is
    taken positionally — each digit times its precomputed 10^k mod 97
    coefficient, a bounded weighted sum (the fn_adler32 closed-form
    discipline; both engines share the literal coefficient table).
    Map-only codegen plan, no UDF."""
    c = table(spark, sf_dir, "customer")
    b = c.select(
        "c_custkey",
        F.lpad(
            (F.col("c_custkey") * 7919 + 13).cast("string"), 18, "0"
        ).alias("bban"),
    )
    r = F.expr(_mod97_sql("concat(bban, '353500')", 24))
    d = b.select(
        "c_custkey",
        "bban",
        F.lpad((98 - r).cast("string"), 2, "0").alias("check_digits"),
    )
    verify = F.expr(_mod97_sql("concat(bban, '3535', check_digits)", 24))
    return d.select(
        "c_custkey",
        "bban",
        "check_digits",
        F.concat(F.lit("ZZ"), F.col("check_digits"), F.col("bban")).alias(
            "iban"
        ),
        verify.cast("long").alias("mod97_verify"),
        (verify == 1).alias("is_valid"),
    )


_MP_W = 8  # motif window length
_MP_EXCL = 4  # exclusion half-width (trivial-match zone)


@query(
    "win_matrix_profile",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
s AS (SELECT d, x FROM g WHERE event_type = 'click'),
i AS (SELECT d, x, ROW_NUMBER() OVER (ORDER BY d) AS t,
             COUNT(*) OVER () AS n
      FROM s),
win AS (
  SELECT t AS wstart, d,
         array_agg(x) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                            AND {_MP_W - 1} FOLLOWING) AS w,
         n
  FROM i
),
full_win AS (
  SELECT wstart, d, w FROM win WHERE len(w) = {_MP_W}
),
dists AS (
  SELECT a.wstart, a.d,
         CAST(MIN(list_sum(list_transform(range(1, {_MP_W + 1}),
              k -> CAST(a.w[k] - b.w[k] AS HUGEINT)
                   * (a.w[k] - b.w[k])))) AS HUGEINT) AS min_sed
  FROM full_win a JOIN full_win b
    ON abs(a.wstart - b.wstart) > {_MP_EXCL}
  GROUP BY a.wstart, a.d
),
best AS (SELECT MIN(min_sed) AS motif_sed FROM dists)
SELECT CAST(dists.d AS TIMESTAMP) AS d,
       CAST(dists.wstart AS BIGINT) AS wstart,
       CAST(CAST(dists.min_sed AS VARCHAR) AS DOUBLE) AS profile_sed,
       dists.min_sed = best.motif_sed AS is_motif
FROM dists CROSS JOIN best
""",
    category="windows",
)
def win_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix profile (unnormalized squared-Euclidean variant) of the
    click daily-revenue series — the time-series motif/discord
    primitive (Yeh et al., the all-pairs-similarity-search backbone):
    for every length-8 window, the distance to its NEAREST
    NON-TRIVIAL neighbor (exclusion zone |i-j| > 4 suppresses
    self-overlap matches), with the window pair marked is_motif where
    the profile attains its global minimum. Distances are exact
    HUGEINT/DECIMAL integer sums of squared cent differences (the
    z-normalized variant's per-window sqrt would break cross-engine
    exactness; the unnormalized SED profile is the standard
    exact-arithmetic member of the family), crossing to double via
    the VARCHAR route for display. Profile minima and the motif flag
    are integer comparisons. Scale: O(windows^2 * w) pair join on
    the value-domain-bounded day grid (the agg_isotonic O(domain^3)
    precedent); at raw-events scale the MASS/STOMP streaming
    recurrences replace the pair join."""
    g = _day_grid(spark, sf_dir)
    s = g.where(F.col("event_type") == "click").select("d", "x")
    wt = Window.orderBy("d")
    i = s.select("d", "x", F.row_number().over(wt).alias("t"))
    ww = Window.orderBy("t").rowsBetween(Window.currentRow, _MP_W - 1)
    win = i.select(
        F.col("t").alias("wstart"),
        "d",
        F.collect_list("x").over(ww).alias("w"),
    ).where(F.size("w") == _MP_W)
    a = win.select(
        F.col("wstart").alias("sa"), F.col("d").alias("da"), F.col("w").alias("wa")
    )
    b = win.select(F.col("wstart").alias("sb"), F.col("w").alias("wb"))
    sed_terms = " + ".join(
        f"CAST(element_at(wa, {k}) - element_at(wb, {k}) AS DECIMAL(38,0))"
        f" * (element_at(wa, {k}) - element_at(wb, {k}))"
        for k in range(1, _MP_W + 1)
    )
    dists = (
        a.join(b, F.abs(F.col("sa") - F.col("sb")) > _MP_EXCL)
        .select("sa", "da", F.expr(sed_terms).alias("sed"))
        .groupBy("sa", "da")
        .agg(F.min("sed").alias("min_sed"))
    )
    best = dists.agg(F.min("min_sed").alias("motif_sed"))
    return dists.crossJoin(F.broadcast(best)).select(
        F.col("da").cast("timestamp").alias("d"),
        F.col("sa").cast("long").alias("wstart"),
        F.col("min_sed").cast("string").cast("double").alias("profile_sed"),
        (F.col("min_sed") == F.col("motif_sed")).alias("is_motif"),
    )


_SAX_W = 6  # PAA segment length (days per symbol)
# Standard SAX breakpoints for a 4-symbol alphabet (standard-normal
# quartiles): fixed literal constants, identical in both engines.
_SAX_BPS = (-0.6745, 0.0, 0.6745)


@query(
    "win_sax",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
s AS (SELECT d, x FROM g WHERE event_type = 'click'),
i AS (SELECT d, x, ROW_NUMBER() OVER (ORDER BY d) AS t FROM s),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
             SUM(CAST(x AS HUGEINT) * x) AS sxx
      FROM i),
seg AS (
  SELECT (t - 1) // {_SAX_W} AS seg_id,
         CAST(MIN(d) AS TIMESTAMP) AS seg_start,
         CAST(COUNT(*) AS BIGINT) AS seg_n,
         CAST(SUM(x) AS BIGINT) AS seg_sum
  FROM i GROUP BY (t - 1) // {_SAX_W}
  HAVING COUNT(*) = {_SAX_W}
),
z AS (
  SELECT seg.seg_id, seg.seg_start, seg.seg_n, seg.seg_sum,
         (CAST(seg.seg_sum AS DOUBLE) / seg.seg_n
          - CAST(m.sx AS DOUBLE) / m.n)
         / sqrt((CAST(CAST(m.sxx AS VARCHAR) AS DOUBLE)
                 - CAST(m.sx AS DOUBLE) * m.sx / m.n) / (m.n - 1))
           AS zpaa
  FROM seg CROSS JOIN m
)
SELECT CAST(seg_id AS BIGINT) AS seg_id, seg_start, seg_n, seg_sum, zpaa,
       CASE WHEN zpaa < {_SAX_BPS[0]} THEN 'a'
            WHEN zpaa < {_SAX_BPS[1]} THEN 'b'
            WHEN zpaa < {_SAX_BPS[2]} THEN 'c' ELSE 'd' END AS symbol
FROM z
""",
    category="windows",
)
def win_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization (Lin-Keogh) of the click daily-revenue
    series — Piecewise Aggregate Approximation (6-day segment means,
    exact integer sums; ragged tail segments dropped) followed by
    quantization of the series-z-scored PAA values against the
    standard-normal quartile breakpoints for a 4-symbol alphabet
    {{a,b,c,d}}. The breakpoints are FIXED LITERAL constants
    (+-0.6745, 0) identical in both engines, the z-score is one
    fixed-order double chain from exact integer moments (HUGEINT
    sxx, VARCHAR route), and a threshold comparison of
    identically-computed doubles is deterministic cross-engine — the
    same argument every exact-tier flag column here makes. Scale:
    segment rollup + 1-row moments broadcast on the bounded grid;
    the symbol string feeds motif mining (win_matrix_profile's
    discrete sibling)."""
    g = _day_grid(spark, sf_dir)
    s = g.where(F.col("event_type") == "click").select("d", "x")
    wt = Window.orderBy("d")
    i = s.select("d", "x", F.row_number().over(wt).alias("t"))
    m = i.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    )
    seg = (
        i.groupBy(((F.col("t") - 1) / _SAX_W).cast("long").alias("seg_id"))
        .agg(
            F.min("d").cast("timestamp").alias("seg_start"),
            F.count(F.lit(1)).cast("long").alias("seg_n"),
            F.sum("x").cast("long").alias("seg_sum"),
        )
        .where(F.col("seg_n") == _SAX_W)
    )
    j = seg.crossJoin(F.broadcast(m))
    mean = F.col("sx").cast("double") / F.col("n")
    sd = F.sqrt(
        (
            F.col("sxx").cast("string").cast("double")
            - F.col("sx").cast("double") * F.col("sx") / F.col("n")
        )
        / (F.col("n") - 1)
    )
    zpaa = (F.col("seg_sum").cast("double") / F.col("seg_n") - mean) / sd
    sym = (
        F.when(zpaa < _SAX_BPS[0], "a")
        .when(zpaa < _SAX_BPS[1], "b")
        .when(zpaa < _SAX_BPS[2], "c")
        .otherwise("d")
    )
    return j.select(
        "seg_id",
        "seg_start",
        "seg_n",
        "seg_sum",
        zpaa.alias("zpaa"),
        sym.alias("symbol"),
    )


_HAAR_N = 16  # dyadic window (first 16 days of the series)


def _haar_terms() -> list:
    """(name, [+1/-1/0 coefficient per t in 1..16]) for the
    unnormalized Haar basis: details at levels 1..4 + the level-4
    approximation (total sum)."""
    out = []
    for lvl in range(1, 5):
        blk = 1 << lvl
        for i in range(_HAAR_N // blk):
            co = [0] * _HAAR_N
            for t in range(i * blk, i * blk + blk // 2):
                co[t] = 1
            for t in range(i * blk + blk // 2, (i + 1) * blk):
                co[t] = -1
            out.append((f"d{lvl}_{i}", co))
    out.append(("a4_0", [1] * _HAAR_N))
    return out


def _haar_sql(col_t: str, col_x: str) -> str:
    cols = []
    for name, co in _haar_terms():
        terms = " + ".join(
            f"({c}) * (CASE WHEN {col_t} = {t + 1} THEN {col_x} ELSE 0 END)"
            for t, c in enumerate(co)
            if c
        )
        cols.append(f"CAST(SUM({terms}) AS BIGINT) AS {name}")
    return ", ".join(cols)


@query(
    "win_haar_dwt",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
s AS (SELECT d, x FROM g WHERE event_type = 'click'),
i AS (SELECT x, ROW_NUMBER() OVER (ORDER BY d) AS t FROM s),
head AS (SELECT * FROM i WHERE t <= {_HAAR_N})
SELECT {_haar_sql('t', 'x')} FROM head
""",
    category="windows",
)
def win_haar_dwt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnormalized Haar wavelet transform of the first 16 days of
    click revenue — the multiresolution decomposition behind
    wavelet-based compression/anomaly tiers: details d_l,i = (sum of
    the first half of each dyadic block) - (second half) at levels
    1..4 plus the level-4 approximation (the total), 16 coefficients
    in all. The transform is CLOSED-FORMED into one aggregation of
    16 conditional integer sums (no iterative pairing rounds — the
    basis is known, so each coefficient is a literal +-1 pattern over
    the window; the fn_hamming74/adler32 discipline applied to a
    transform), exactly invertible and Parseval-checked in the tests
    with pure integers. Scale: a single bounded-window aggregation;
    on a hypertable the same 16 patterns run per series key."""
    g = _day_grid(spark, sf_dir)
    s = g.where(F.col("event_type") == "click").select("d", "x")
    wt = Window.orderBy("d")
    i = s.select("x", F.row_number().over(wt).alias("t")).where(
        F.col("t") <= _HAAR_N
    )
    aggs = []
    for name, co in _haar_terms():
        expr = None
        for t, c in enumerate(co):
            if not c:
                continue
            term = F.when(F.col("t") == t + 1, F.col("x")).otherwise(0) * c
            expr = term if expr is None else expr + term
        aggs.append(F.sum(expr).cast("long").alias(name))
    return i.agg(*aggs)


_WHT_D = 16  # transform size (first 16 embedding dims)


def _wht_signs() -> list:
    return [
        [(-1) ** bin(i & j).count("1") for i in range(_WHT_D)]
        for j in range(_WHT_D)
    ]


@query(
    "vec_hadamard_transform",
    oracle=f"""
WITH q AS (
  SELECT vec_id,
         list_transform(range(1, {_WHT_D + 1}),
           i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000)
                     AS BIGINT)) AS xq
  FROM embeddings WHERE vec_id < 64
)
SELECT vec_id, CAST(g.j AS BIGINT) AS component,
       CAST(CASE {" ".join(
         f"WHEN g.j = {j} THEN ("
         + " + ".join(f"({s}) * xq[{i + 1}]" for i, s in enumerate(signs))
         + ")"
         for j, signs in enumerate(_wht_signs()))}
       END AS BIGINT) AS coef
FROM q, LATERAL (SELECT unnest(generate_series(0, {_WHT_D - 1})) AS j) g
""",
    category="similarity",
)
def vec_hadamard_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walsh-Hadamard transform (H_16) of the leading 16 embedding
    dimensions — the +-1 orthogonal transform fast-JL projections and
    LSH preconditioners apply before sampling (rotating the energy so
    no single coordinate dominates): y_j = sum_i (-1)^popcount(i&j)
    x_i over the 1e-6-quantized lattice, EXACT int64 throughout (the
    only weights are +-1). The sign matrix is generated once in
    Python and embedded as literals in both engines' expressions —
    16 components x 16 terms of pure add/subtract, the rp_project
    sign-literal discipline. Tests certify Parseval (sum y^2 = 16 *
    sum x^2, exact integers) and the involution H(Hx) = 16x. Scale:
    map-only, zero shuffle beyond the final posexplode projection."""
    e = table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 64)
    q = e.select(
        "vec_id",
        F.expr(
            f"transform(sequence(1, {_WHT_D}),"
            " i -> CAST(round(CAST(element_at(embedding, i) AS DOUBLE)"
            " * 1000000) AS BIGINT))"
        ).alias("xq"),
    )
    comps = []
    for j, signs in enumerate(_wht_signs()):
        expr = " + ".join(
            f"({s}) * element_at(xq, {i + 1})" for i, s in enumerate(signs)
        )
        comps.append(f"CAST(({expr}) AS BIGINT)")
    return q.select(
        "vec_id",
        F.posexplode(F.expr("array(" + ", ".join(comps) + ")")).alias(
            "component", "coef"
        ),
    ).select("vec_id", F.col("component").cast("long").alias("component"), "coef")


_DBSCAN_N = 96
_DBSCAN_EPS2 = 1_600_000_000_000  # squared lattice distance threshold
_DBSCAN_MINPTS = 6  # neighborhood size incl. the point itself

_QDIST_SQL = " + ".join(
    f"CAST(a.xq[{k}] - b.xq[{k}] AS HUGEINT) * (a.xq[{k}] - b.xq[{k}])"
    for k in range(1, 65)
)
_QUANT_SQL = (
    "list_transform(range(1, 65),"
    " i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT))"
)


@query(
    "vec_dbscan_core",
    oracle=f"""
WITH q AS (
  SELECT vec_id, {_QUANT_SQL} AS xq
  FROM embeddings WHERE vec_id < {_DBSCAN_N}
),
nbr AS (
  SELECT a.vec_id,
         CAST(1 + SUM(CASE WHEN a.vec_id <> b.vec_id
                       AND {_QDIST_SQL} <= {_DBSCAN_EPS2}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_nbrs
  FROM q a CROSS JOIN q b
  GROUP BY a.vec_id
),
core AS (SELECT vec_id, n_nbrs, n_nbrs >= {_DBSCAN_MINPTS} AS is_core
         FROM nbr),
border AS (
  SELECT a.vec_id,
         CAST(MAX(CASE WHEN c.is_core AND a.vec_id <> b.vec_id
                        AND {_QDIST_SQL} <= {_DBSCAN_EPS2}
                       THEN 1 ELSE 0 END) AS BIGINT) AS near_core
  FROM q a CROSS JOIN q b JOIN core c ON c.vec_id = b.vec_id
  GROUP BY a.vec_id
)
SELECT core.vec_id, core.n_nbrs, core.is_core,
       CASE WHEN core.is_core THEN 'core'
            WHEN border.near_core = 1 THEN 'border'
            ELSE 'noise' END AS role
FROM core JOIN border ON border.vec_id = core.vec_id
""",
    category="similarity",
)
def vec_dbscan_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN point classification (eps^2 = 1.6e12 on the 1e-6
    lattice, minPts = 6 incl. self) — the density-based clustering
    primitive: CORE points have a dense eps-neighborhood, BORDER
    points are within eps of a core, everything else is NOISE. Both
    the neighborhood counts and the near-core test are exact integer
    comparisons of HUGEINT/DECIMAL squared lattice distances — no
    float enters the classification (once roles are fixed, the
    cluster extraction is exactly dedup_cluster_cc's min-label
    propagation over the core-core adjacency, already certified).
    Scale: the demo classifies a bounded 96-vector subset via direct
    pair joins; at corpus scale the neighborhood queries run through
    the LSH/IVF bucketing tier (sim_index_probe) — the pair join here
    is the semantics oracle, not the production plan."""
    e = table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") < _DBSCAN_N
    )
    q = e.select(
        "vec_id",
        F.expr(
            f"transform(sequence(1, 64),"
            " i -> CAST(round(CAST(element_at(embedding, i) AS DOUBLE)"
            " * 1000000) AS BIGINT))"
        ).alias("xq"),
    ).localCheckpoint(eager=True)
    a = q.select(F.col("vec_id").alias("ia"), F.col("xq").alias("qa"))
    b = q.select(F.col("vec_id").alias("ib"), F.col("xq").alias("qb"))
    dist = " + ".join(
        f"CAST(element_at(qa, {k}) - element_at(qb, {k}) AS DECIMAL(38,0))"
        f" * (element_at(qa, {k}) - element_at(qb, {k}))"
        for k in range(1, 65)
    )
    pairs = a.crossJoin(b).select(
        "ia",
        "ib",
        (F.expr(dist) <= _DBSCAN_EPS2).alias("near"),
    )
    nbr = pairs.groupBy("ia").agg(
        (
            1
            + F.sum(
                F.when((F.col("ia") != F.col("ib")) & F.col("near"), 1).otherwise(
                    0
                )
            )
        )
        .cast("long")
        .alias("n_nbrs")
    )
    core = nbr.select(
        F.col("ia").alias("vec_id"),
        "n_nbrs",
        (F.col("n_nbrs") >= _DBSCAN_MINPTS).alias("is_core"),
    )
    core_ids = core.select(
        F.col("vec_id").alias("ib"), F.col("is_core").alias("core_b")
    )
    border = (
        pairs.join(F.broadcast(core_ids), "ib")
        .groupBy("ia")
        .agg(
            F.max(
                F.when(
                    F.col("core_b")
                    & F.col("near")
                    & (F.col("ia") != F.col("ib")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("near_core")
        )
        .select(F.col("ia").alias("vec_id"), "near_core")
    )
    j = core.join(border, "vec_id")
    return j.select(
        "vec_id",
        "n_nbrs",
        "is_core",
        F.when(F.col("is_core"), "core")
        .when(F.col("near_core") == 1, "border")
        .otherwise("noise")
        .alias("role"),
    )


_SIL_N = 128


@query(
    "vec_silhouette",
    oracle=f"""
WITH q AS (
  SELECT vec_id, label, {_QUANT_SQL} AS xq
  FROM embeddings WHERE vec_id < {_SIL_N}
),
pd AS (
  SELECT a.vec_id, a.label AS la, b.label AS lb,
         CAST(SUM({_QDIST_SQL}) AS HUGEINT) AS dsum,
         CAST(COUNT(*) AS BIGINT) AS dcnt
  FROM q a JOIN q b ON a.vec_id <> b.vec_id
  GROUP BY a.vec_id, a.label, b.label
),
aa AS (
  SELECT vec_id, la AS label,
         CAST(CAST(dsum AS VARCHAR) AS DOUBLE) / dcnt AS a_mean
  FROM pd WHERE la = lb
),
bb AS (
  SELECT vec_id, la AS label,
         MIN(CAST(CAST(dsum AS VARCHAR) AS DOUBLE) / dcnt) AS b_mean
  FROM pd WHERE la <> lb
  GROUP BY vec_id, la
)
SELECT aa.vec_id, aa.label, aa.a_mean, bb.b_mean,
       (bb.b_mean - aa.a_mean) / GREATEST(aa.a_mean, bb.b_mean)
         AS silhouette
FROM aa JOIN bb ON bb.vec_id = aa.vec_id
""",
    category="similarity",
)
def vec_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silhouette coefficient per point (squared-Euclidean variant)
    over the label clustering of the embedding corpus — the cluster-
    quality diagnostic: a(i) = mean distance to own cluster, b(i) =
    the nearest other cluster's mean distance, s = (b - a) /
    max(a, b). Distance sums are exact HUGEINT/DECIMAL lattice
    integers; each mean is ONE double division (VARCHAR route) and
    identical in both engines, so the MIN over other labels and the
    final ratio are deterministic cross-engine. Scale: the demo runs
    a bounded 128-vector subset through the direct pair rollup
    (grouped on (point, other-label) — the pair mass collapses
    map-side); corpus-scale silhouette uses per-cluster centroids +
    counts (the vec_centroid machinery) as the standard
    approximation."""
    e = table(spark, sf_dir, "embeddings").where(F.col("vec_id") < _SIL_N)
    q = e.select(
        "vec_id",
        "label",
        F.expr(
            f"transform(sequence(1, 64),"
            " i -> CAST(round(CAST(element_at(embedding, i) AS DOUBLE)"
            " * 1000000) AS BIGINT))"
        ).alias("xq"),
    ).localCheckpoint(eager=True)
    a = q.select(
        F.col("vec_id").alias("ia"), F.col("label").alias("la"),
        F.col("xq").alias("qa"),
    )
    b = q.select(
        F.col("vec_id").alias("ib"), F.col("label").alias("lb"),
        F.col("xq").alias("qb"),
    )
    dist = " + ".join(
        f"CAST(element_at(qa, {k}) - element_at(qb, {k}) AS DECIMAL(38,0))"
        f" * (element_at(qa, {k}) - element_at(qb, {k}))"
        for k in range(1, 65)
    )
    pd_ = (
        a.join(b, F.col("ia") != F.col("ib"))
        .select("ia", "la", "lb", F.expr(dist).alias("d2"))
        .groupBy("ia", "la", "lb")
        .agg(
            F.sum("d2").alias("dsum"),
            F.count(F.lit(1)).cast("long").alias("dcnt"),
        )
    )
    mean = F.col("dsum").cast("string").cast("double") / F.col("dcnt")
    aa = pd_.where(F.col("la") == F.col("lb")).select(
        F.col("ia").alias("vec_id"),
        F.col("la").alias("label"),
        mean.alias("a_mean"),
    )
    bb = (
        pd_.where(F.col("la") != F.col("lb"))
        .groupBy(F.col("ia").alias("vec_id"), F.col("la").alias("label"))
        .agg(F.min(mean).alias("b_mean"))
    )
    j = aa.join(bb, ["vec_id", "label"])
    return j.select(
        "vec_id",
        "label",
        "a_mean",
        "b_mean",
        (
            (F.col("b_mean") - F.col("a_mean"))
            / F.greatest(F.col("a_mean"), F.col("b_mean"))
        ).alias("silhouette"),
    )


@query(
    "agg_kneedle",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
s AS (SELECT d, x FROM g WHERE event_type = 'click'),
i AS (SELECT d, x, ROW_NUMBER() OVER (ORDER BY d) AS t FROM s),
c AS (
  SELECT d, t,
         SUM(x) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum
  FROM i
),
ends AS (
  SELECT MIN(t) AS t1, MAX(t) AS t2,
         MIN(CASE WHEN t = 1 THEN cum END) AS y1,
         MAX(CASE WHEN t = tmax THEN cum END) AS y2
  FROM (SELECT c.*, MAX(t) OVER () AS tmax FROM c) w
),
cross_ AS (
  SELECT c.d, c.t, CAST(c.cum AS BIGINT) AS cum,
         CAST((ends.t2 - ends.t1) * (c.cum - ends.y1)
              - (ends.y2 - ends.y1) * (c.t - ends.t1) AS BIGINT)
           AS cross_num
  FROM c CROSS JOIN ends
),
best AS (
  SELECT MAX(abs(cross_num)) AS k FROM cross_
  WHERE t NOT IN (SELECT t1 FROM ends) AND t NOT IN (SELECT t2 FROM ends)
),
pick AS (
  SELECT MIN(t) AS t_knee FROM cross_ CROSS JOIN best
  WHERE abs(cross_num) = best.k
)
SELECT CAST(cross_.d AS TIMESTAMP) AS d, CAST(cross_.t AS BIGINT) AS t,
       cross_.cum, cross_.cross_num,
       cross_.t = pick.t_knee AS is_knee
FROM cross_ CROSS JOIN pick
""",
    category="aggregations",
)
def agg_kneedle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Knee-point detection (the Kneedle idea reduced to its exact
    geometric core) on the cumulative click-revenue curve — the
    diminishing-returns cutoff pickers use for k selection, budget
    cutoffs and CCDF truncation: the knee is the interior point
    maximizing distance to the first-to-last chord, and since that
    distance is |cross product| / |chord| with the chord CONSTANT,
    the argmax is decided entirely by the exact integer cross product
    (t2-t1)(cum-y1) - (y2-y1)(t-t1) — no normalization, no float,
    deterministic first-index tie-break. Scale: one cumulative sum
    and a 1-row endpoint broadcast on the bounded day grid."""
    g = _day_grid(spark, sf_dir)
    s = g.where(F.col("event_type") == "click").select("d", "x")
    wt = Window.orderBy("d")
    wc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    i = s.select("d", "x", F.row_number().over(wt).alias("t"))
    c = i.select("d", "t", F.sum("x").over(wc).alias("cum"))
    ends = c.agg(
        F.min("t").alias("t1"),
        F.max("t").alias("t2"),
        F.min(F.when(F.col("t") == 1, F.col("cum"))).alias("y1"),
        F.max(F.col("cum")).alias("y2_tmp"),
        F.max("t").alias("tmax"),
    ).select(
        "t1",
        "t2",
        "y1",
        F.col("y2_tmp").alias("y2"),
    )
    # y2 = cum at t = tmax == running max of a positive series == max
    cross = c.crossJoin(F.broadcast(ends)).select(
        "d",
        "t",
        F.col("cum").cast("long").alias("cum"),
        (
            (F.col("t2") - F.col("t1")) * (F.col("cum") - F.col("y1"))
            - (F.col("y2") - F.col("y1")) * (F.col("t") - F.col("t1"))
        )
        .cast("long")
        .alias("cross_num"),
        "t1",
        "t2",
    )
    interior = cross.where(
        (F.col("t") != F.col("t1")) & (F.col("t") != F.col("t2"))
    )
    best = interior.agg(F.max(F.abs(F.col("cross_num"))).alias("k"))
    pick = (
        interior.crossJoin(F.broadcast(best))
        .where(F.abs(F.col("cross_num")) == F.col("k"))
        .agg(F.min("t").alias("t_knee"))
    )
    return cross.crossJoin(F.broadcast(pick)).select(
        F.col("d").cast("timestamp").alias("d"),
        F.col("t").cast("long").alias("t"),
        "cum",
        "cross_num",
        (F.col("t") == F.col("t_knee")).alias("is_knee"),
    )
