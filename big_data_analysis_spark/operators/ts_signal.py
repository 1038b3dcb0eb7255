"""Time-series signal screens (split out of the r9-era screening.py
catch-all per VERDICT r10 item 6): reflected-walk clamped balance,
Hampel robust outlier filter, Lo-MacKinlay variance-ratio, matrix
profile (bounded-window exact), SAX symbolization, and the Haar
discrete wavelet transform.

Exactness: same integer-lattice discipline as stats_ext (cents
lattice, cross-multiplied decisions, bounded-domain windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import table
from ..registry import query
from .stats_ext import _CENTS_SQL, _GRID_SQL, _day_grid


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


# ------------------------------------------------------------------ #
# tabular CUSUM control chart (r11 wave 1)
# ------------------------------------------------------------------ #

_CUSUM_K_CENTS = 250  # allowance k (cents of daily revenue)
_CUSUM_H_CENTS = 1250  # decision interval h = 5k


def _cusum_sql(grid_ref: str, idiv: str, datefmt: str) -> str:
    """Tabular CUSUM shared text (grid_ref/idiv/datefmt as in
    _macd_sql).  Centering is exact: at per-series scale N (= day
    count) the deviation X'_t = N*x_t - Sx is an integer, the
    allowance and decision interval scale the same way, and the
    one-sided recursions S+ = max(0, S+ + X' - kN) / S- =
    max(0, S- - X' - kN) advance as pure integer max/add — bit-exact
    in any engine, no mean ever materialized as a float."""
    return f"""
WITH RECURSIVE stats AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx
  FROM {grid_ref} GROUP BY event_type
),
gi AS (
  SELECT g.event_type, g.d, g.x, s.n, s.sx,
         g.x * s.n - s.sx AS xc,
         ROW_NUMBER() OVER (PARTITION BY g.event_type ORDER BY g.d) AS idx
  FROM {grid_ref} g JOIN stats s ON s.event_type = g.event_type
),
r(event_type, idx, s_plus, s_minus) AS (
  SELECT event_type, idx,
         GREATEST(CAST(0 AS BIGINT), xc - {_CUSUM_K_CENTS} * n),
         GREATEST(CAST(0 AS BIGINT), -xc - {_CUSUM_K_CENTS} * n)
  FROM gi WHERE idx = 1
  UNION ALL
  SELECT g.event_type, g.idx,
         GREATEST(CAST(0 AS BIGINT),
                  r.s_plus + g.xc - {_CUSUM_K_CENTS} * g.n),
         GREATEST(CAST(0 AS BIGINT),
                  r.s_minus - g.xc - {_CUSUM_K_CENTS} * g.n)
  FROM r JOIN gi g ON g.event_type = r.event_type AND g.idx = r.idx + 1
)
SELECT r.event_type, %DATEFMT_GI% AS day,
       CAST(gi.x AS BIGINT) AS x,
       CAST(gi.n AS BIGINT) AS n_days,
       CAST(r.s_plus AS BIGINT) AS s_plus_scaled,
       CAST(r.s_minus AS BIGINT) AS s_minus_scaled,
       CAST(CASE WHEN r.s_plus > {_CUSUM_H_CENTS} * gi.n
                 THEN 1 ELSE 0 END AS INT) AS shift_up,
       CAST(CASE WHEN r.s_minus > {_CUSUM_H_CENTS} * gi.n
                 THEN 1 ELSE 0 END AS INT) AS shift_down
FROM r JOIN gi ON gi.event_type = r.event_type AND gi.idx = r.idx
""".replace("%DATEFMT_GI%", datefmt)


@query(
    "win_cusum",
    oracle=_cusum_sql(f"({_GRID_SQL})", "//", "strftime(gi.d, '%Y-%m-%d')"),
    category="windows",
)
def win_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's tabular CUSUM over the daily-revenue grid — the
    change-detection chart (one-sided cumulative sums with allowance
    k, decision interval h = 5k) that flags small persistent mean
    shifts Shewhart charts miss; the sequential complement to the
    retrospective Pettitt test and the win_spc_rules Western-Electric
    screen.  The recursion S+_t = max(0, S+_{t-1} + (x_t - mu) - k)
    runs entirely on integers: at per-series scale N the centered
    deviation N*x_t - Sx is exact, k and h scale by N, and each step
    is one integer max — WITH RECURSIVE over the bounded day grid
    (Spark 4 first-class), bit-exact cross-engine with no float mean.

    Scale: the grid is one data-proportional groupBy (bounded
    types x days domain); recursion depth = calendar days, never row
    count — same envelope as win_macd."""
    g = _day_grid(spark, sf_dir)
    return spark.sql(
        _cusum_sql("{g}", "DIV", "date_format(gi.d, 'yyyy-MM-dd')"), g=g
    )
