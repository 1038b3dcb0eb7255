"""Technical-analysis momentum/volume/recursive-smoother tier (split
from ta_stats.py per VERDICT r10 item 6's module-size cap): TRIX,
Heikin-Ashi, Parabolic SAR, Renko bricks, money-flow (MFI, force
index, accumulation/distribution, Chaikin oscillator), momentum
oscillators (Williams %R, ROC, Coppock, ultimate oscillator, ADX,
RVI, TSI, KST, Elder-ray, mass index), adaptive/multi-stage EMAs
(KAMA, DEMA/TEMA, Holt-Winters), SPC Western-Electric rules, and
ZigZag pivots.

Same exactness discipline as ta_stats.py (integer-cents OHLC grid,
scaled half-integers, EMA recurrences as integer floor divisions
inside ANSI recursive CTEs) — see that module's docstring; the
shared daily-bar constructors (`_ohlc_grid` / `_ohlcv_grid` /
`_OHLC_SQL`) are imported from it, so both engines keep reading the
identical bounded (types x days) grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import table
from ..registry import query
from .stats_ext import _CENTS_SQL, _GRID_SQL, _day_grid
from .ta_stats import _OHLC_SQL, _ohlc_grid, _ohlcv_grid


def _trix_sql(grid_ref: str, idiv: str, datefmt: str) -> str:
    """TRIX query text shared by both engines: a TRIPLE EMA(9) chain
    as one recursion carrying (e1, e2, e3) integer states at 1000x
    scale — each level floor-divides (2*prev_in + 8*prev_self) by 10
    — followed by a 1-day rate-of-change of e3 in basis points via
    integer division (nonzero denominator: e3 > 0 since x > 0)."""
    return f"""
WITH RECURSIVE gi AS (
  SELECT event_type, d, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS idx
  FROM {grid_ref}
),
r(event_type, idx, e1, e2, e3) AS (
  SELECT event_type, idx, x * 1000, x * 1000, x * 1000
  FROM gi WHERE idx = 1
  UNION ALL
  SELECT g.event_type, g.idx,
         (2 * g.x * 1000 + 8 * r.e1) {idiv} 10,
         (2 * ((2 * g.x * 1000 + 8 * r.e1) {idiv} 10) + 8 * r.e2) {idiv} 10,
         (2 * ((2 * ((2 * g.x * 1000 + 8 * r.e1) {idiv} 10)
                + 8 * r.e2) {idiv} 10) + 8 * r.e3) {idiv} 10
  FROM r JOIN gi g ON g.event_type = r.event_type AND g.idx = r.idx + 1
),
o AS (
  SELECT r.event_type, gi.d, gi.x, r.e1, r.e2, r.e3,
         lag(r.e3) OVER (PARTITION BY r.event_type ORDER BY r.idx) AS pe3
  FROM r JOIN gi ON gi.event_type = r.event_type AND gi.idx = r.idx
)
SELECT event_type, {datefmt} AS day,
       CAST(x AS BIGINT) AS x,
       CAST(e3 AS BIGINT) AS ema3_s,
       CAST((e3 - pe3) * 10000 {idiv} pe3 AS BIGINT) AS trix_bp
FROM o WHERE pe3 IS NOT NULL
"""


@query(
    "win_trix",
    oracle=_trix_sql(f"({_GRID_SQL})", "//", "strftime(d, '%Y-%m-%d')"),
    category="windows",
)
def win_trix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIX (triple-smoothed EMA rate-of-change, period 9) over the
    daily-revenue series — the momentum indicator that needs THREE
    chained EMAs, each the input of the next: one recursive CTE
    carries (e1, e2, e3) together, every level an integer
    floor-division recurrence at 1000x scale (win_macd's recipe
    deepened), and the final TRIX reading is the 1-day change of e3
    in basis points via integer division — zero floats end to end,
    bit-exact in both engines.  Scale: recursion depth = calendar
    days over the bounded grid; one data-proportional groupBy."""
    g = _day_grid(spark, sf_dir)
    return spark.sql(_trix_sql("{g}", "DIV", "date_format(d, 'yyyy-MM-dd')"), g=g)


def _heikin_ashi_sql(grid_ref: str, idiv: str, datefmt: str) -> str:
    """Heikin-Ashi query text shared by both engines: ha_close is the
    EXACT bar average carried at 4x (o+h+l+c); ha_open is the
    recursive half-sum of the previous HA pair, floor-divided at the
    same 4x scale; highs/lows are maxima over scaled raw and HA
    values.  Candle color is a pure integer comparison."""
    return f"""
WITH RECURSIVE gi AS (
  SELECT event_type, d, o, h, l, c,
         o + h + l + c AS hc4,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS idx
  FROM {grid_ref}
),
r(event_type, idx, ho4, hc4) AS (
  SELECT event_type, idx, 2 * (o + c), hc4
  FROM gi WHERE idx = 1
  UNION ALL
  SELECT g.event_type, g.idx, (r.ho4 + r.hc4) {idiv} 2, g.hc4
  FROM r JOIN gi g ON g.event_type = r.event_type AND g.idx = r.idx + 1
)
SELECT r.event_type, {datefmt} AS day,
       CAST(gi.c AS BIGINT) AS close_c,
       CAST(r.ho4 AS BIGINT) AS ha_open_x4,
       CAST(r.hc4 AS BIGINT) AS ha_close_x4,
       CAST(GREATEST(4 * gi.h, r.ho4, r.hc4) AS BIGINT) AS ha_high_x4,
       CAST(LEAST(4 * gi.l, r.ho4, r.hc4) AS BIGINT) AS ha_low_x4,
       CAST(CASE WHEN r.hc4 > r.ho4 THEN 1
                 WHEN r.hc4 < r.ho4 THEN -1 ELSE 0 END AS BIGINT) AS candle
FROM r JOIN gi ON gi.event_type = r.event_type AND gi.idx = r.idx
"""


@query(
    "win_heikin_ashi",
    oracle=_heikin_ashi_sql(f"({_OHLC_SQL})", "//", "strftime(gi.d, '%Y-%m-%d')"),
    category="windows",
)
def win_heikin_ashi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heikin-Ashi candles over daily OHLC bars — the trend-smoothing
    re-draw whose open is RECURSIVE (ha_open_t = (ha_open_{t-1} +
    ha_close_{t-1})/2): carried at 4x cent scale so ha_close =
    (o+h+l+c)/4 is the exact integer o+h+l+c, the recursive halving
    is a floor division on the same lattice, and the HA highs/lows
    and candle color are integer max/min/sign — a recursive CTE in
    both engines, bit-exact, the win_macd certification applied to
    the canonical candle transform.  Scale: recursion depth =
    calendar days over the bounded OHLC grid."""
    g = _ohlc_grid(spark, sf_dir)
    return spark.sql(
        _heikin_ashi_sql("{g}", "DIV", "date_format(gi.d, 'yyyy-MM-dd')"), g=g
    )


def _psar_sql(grid_ref: str, idiv: str, datefmt: str) -> str:
    """Parabolic SAR (simplified: no prior-two-bar clamp) shared by
    both engines.  State per series day: (dir, sar, ep, af100) — all
    integers, AF in hundredths stepping 2 from 2 to 20 on new
    extremes, SAR advancing by af*(ep-sar) DIV 100, trend flipping
    when price crosses SAR (flip resets sar=ep, ep=today's extreme,
    af=2).  The repeated CASE texts avoid lateral aliases."""
    adv = f"r.sar + r.af100 * (r.ep - r.sar) {idiv} 100"
    return f"""
WITH RECURSIVE gi AS (
  SELECT event_type, d, h, l,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS idx
  FROM {grid_ref}
),
r(event_type, idx, dir, sar, ep, af100) AS (
  SELECT event_type, idx, 1, l, h, 2
  FROM gi WHERE idx = 1
  UNION ALL
  SELECT g.event_type, g.idx,
         CASE WHEN r.dir = 1 AND g.l < ({adv}) THEN -1
              WHEN r.dir = -1 AND g.h > ({adv}) THEN 1
              ELSE r.dir END,
         CASE WHEN r.dir = 1 AND g.l < ({adv}) THEN r.ep
              WHEN r.dir = -1 AND g.h > ({adv}) THEN r.ep
              ELSE {adv} END,
         CASE WHEN r.dir = 1 AND g.l < ({adv}) THEN g.l
              WHEN r.dir = -1 AND g.h > ({adv}) THEN g.h
              WHEN r.dir = 1 THEN GREATEST(r.ep, g.h)
              ELSE LEAST(r.ep, g.l) END,
         CASE WHEN r.dir = 1 AND g.l < ({adv}) THEN 2
              WHEN r.dir = -1 AND g.h > ({adv}) THEN 2
              WHEN r.dir = 1 AND g.h > r.ep THEN LEAST(20, r.af100 + 2)
              WHEN r.dir = -1 AND g.l < r.ep THEN LEAST(20, r.af100 + 2)
              ELSE r.af100 END
  FROM r JOIN gi g ON g.event_type = r.event_type AND g.idx = r.idx + 1
)
SELECT r.event_type, {datefmt} AS day,
       CAST(gi.h AS BIGINT) AS h, CAST(gi.l AS BIGINT) AS l,
       CAST(r.dir AS BIGINT) AS direction,
       CAST(r.sar AS BIGINT) AS sar_c,
       CAST(r.ep AS BIGINT) AS extreme_c,
       CAST(r.af100 AS BIGINT) AS af100
FROM r JOIN gi ON gi.event_type = r.event_type AND gi.idx = r.idx
"""


@query(
    "win_psar",
    oracle=_psar_sql(f"({_OHLC_SQL})", "//", "strftime(gi.d, '%Y-%m-%d')"),
    category="windows",
)
def win_psar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parabolic SAR (Wilder; simplified without the prior-two-bar
    clamp, documented) over daily OHLC bars — the accelerating
    trailing stop with the most state of any classic indicator:
    (direction, SAR, extreme point, acceleration factor) evolve
    jointly, AF ratchets 0.02->0.20 on new extremes and resets on
    trend flips.  Carried entirely in integers: AF in hundredths,
    the SAR advance is af*(ep-sar) DIV 100 (truncation toward zero
    identical in both engines even when ep < sar), flips are pure
    comparisons — one recursive CTE per engine, bit-exact.  Scale:
    recursion depth = calendar days over the bounded grid."""
    g = _ohlc_grid(spark, sf_dir)
    return spark.sql(
        _psar_sql("{g}", "DIV", "date_format(gi.d, 'yyyy-MM-dd')"), g=g
    )


def _renko_sql(grid_ref: str, idiv: str, datefmt: str) -> str:
    """Renko brick ladder shared by both engines.  Brick size is the
    per-series (max-min) DIV 20 (pre-stage integer, floored to >= 1);
    the recursion carries (level, n_up, n_down): a move of >= B above
    the level lays (x - level) DIV B up-bricks and raises the level
    by that many B's; mirrored downward."""
    return f"""
WITH RECURSIVE gi AS (
  SELECT g.event_type, g.d, g.x, b.bs,
         ROW_NUMBER() OVER (PARTITION BY g.event_type ORDER BY g.d) AS idx
  FROM {grid_ref} g
  JOIN (SELECT event_type,
               GREATEST(1, (MAX(x) - MIN(x)) {idiv} 20) AS bs
        FROM {grid_ref} GROUP BY event_type) b
    ON b.event_type = g.event_type
),
r(event_type, idx, lvl, bs, n_up, n_down) AS (
  SELECT event_type, idx, x, bs, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  FROM gi WHERE idx = 1
  UNION ALL
  SELECT g.event_type, g.idx,
         CASE WHEN g.x >= r.lvl + r.bs
              THEN r.lvl + ((g.x - r.lvl) {idiv} r.bs) * r.bs
              WHEN g.x <= r.lvl - r.bs
              THEN r.lvl - ((r.lvl - g.x) {idiv} r.bs) * r.bs
              ELSE r.lvl END,
         r.bs,
         r.n_up + CASE WHEN g.x >= r.lvl + r.bs
                       THEN (g.x - r.lvl) {idiv} r.bs ELSE 0 END,
         r.n_down + CASE WHEN g.x <= r.lvl - r.bs
                         THEN (r.lvl - g.x) {idiv} r.bs ELSE 0 END
  FROM r JOIN gi g ON g.event_type = r.event_type AND g.idx = r.idx + 1
)
SELECT r.event_type, {datefmt} AS day,
       CAST(gi.x AS BIGINT) AS x,
       CAST(r.bs AS BIGINT) AS brick_size,
       CAST(r.lvl AS BIGINT) AS brick_level,
       CAST(r.n_up AS BIGINT) AS n_bricks_up,
       CAST(r.n_down AS BIGINT) AS n_bricks_down
FROM r JOIN gi ON gi.event_type = r.event_type AND gi.idx = r.idx
"""


@query(
    "win_renko",
    oracle=_renko_sql(f"({_GRID_SQL})", "//", "strftime(gi.d, '%Y-%m-%d')"),
    category="windows",
)
def win_renko(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Renko brick ladder over the daily-revenue series — the
    time-free price filter that only advances when the value moves a
    full brick from the last brick LEVEL (noise below one brick
    never registers): brick size is the per-series range DIV 20
    (integer pre-stage, so the parameter scales with the data
    instead of being a magic cent count), and the recursion lays
    (move DIV B) bricks and snaps the level to the brick lattice —
    all integer floor arithmetic, bit-exact in both engines via
    recursive CTEs.  Cumulative up/down brick counts give the
    net-trend readout.  Scale: recursion depth = calendar days;
    the pre-stage max/min is one bounded aggregation."""
    g = _day_grid(spark, sf_dir)
    return spark.sql(
        _renko_sql("{g}", "DIV", "date_format(gi.d, 'yyyy-MM-dd')"), g=g
    )


# OHLC + volume bars (win_obv's construction: event count as volume).
_OHLCV_SQL = f"""
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         MAX({_CENTS_SQL}) AS h,
         MIN({_CENTS_SQL}) AS l,
         arg_max({_CENTS_SQL}, ts) AS c,
         CAST(COUNT(*) AS BIGINT) AS vol
  FROM events
  GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
"""


@query(
    "win_mfi",
    oracle=f"""
WITH g AS ({_OHLCV_SQL}),
t AS (
  SELECT event_type, d, (h + l + c) * vol AS mf,
         h + l + c AS tp3,
         lag(h + l + c) OVER (PARTITION BY event_type ORDER BY d) AS ptp3
  FROM g
),
w AS (
  SELECT event_type, d,
         COUNT(ptp3) OVER w14 AS n14,
         SUM(CASE WHEN tp3 > ptp3 THEN mf ELSE 0 END) OVER w14 AS pos14,
         SUM(CASE WHEN tp3 < ptp3 THEN mf ELSE 0 END) OVER w14 AS neg14
  FROM t
  WINDOW w14 AS (PARTITION BY event_type ORDER BY d
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
       CAST(pos14 AS BIGINT) AS pos_flow,
       CAST(neg14 AS BIGINT) AS neg_flow,
       CAST(CASE WHEN pos14 + neg14 = 0 THEN 5000
                 ELSE pos14 * 10000 // (pos14 + neg14) END AS BIGINT) AS mfi_bp
FROM w WHERE n14 = 14
""",
    category="windows",
)
def win_mfi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money flow index (14-day) over daily bars with event count as
    volume — the volume-weighted RSI sibling (win_rsi weights price
    moves equally; MFI weights them by how much traded): raw money
    flow = typical-price x volume at 3x scale (tp3 = h+l+c, the
    win_cci lattice), split into positive/negative by the
    typical-price direction, and MFI = 10000*pos/(pos+neg) in exact
    integer basis points via floor division (an all-flat window pins
    to the 5000 midpoint).  Scale: one lag + one trailing frame over
    the bounded OHLCV grid, one event_type shuffle."""
    g = _ohlcv_grid(spark, sf_dir)
    wo = Window.partitionBy("event_type").orderBy("d")
    tp3 = F.col("h") + F.col("l") + F.col("c")
    t = g.select(
        "event_type",
        "d",
        (tp3 * F.col("vol")).alias("mf"),
        tp3.alias("tp3"),
        F.lag(tp3).over(wo).alias("ptp3"),
    )
    w14 = Window.partitionBy("event_type").orderBy("d").rowsBetween(-13, 0)
    w = t.select(
        "event_type",
        "d",
        F.count("ptp3").over(w14).alias("n14"),
        F.sum(
            F.when(F.col("tp3") > F.col("ptp3"), F.col("mf")).otherwise(0)
        )
        .over(w14)
        .alias("pos14"),
        F.sum(
            F.when(F.col("tp3") < F.col("ptp3"), F.col("mf")).otherwise(0)
        )
        .over(w14)
        .alias("neg14"),
    ).where(F.col("n14") == 14)
    return w.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("pos14").cast("long").alias("pos_flow"),
        F.col("neg14").cast("long").alias("neg_flow"),
        F.expr(
            "CASE WHEN pos14 + neg14 = 0 THEN 5000"
            " ELSE pos14 * 10000 DIV (pos14 + neg14) END"
        )
        .cast("long")
        .alias("mfi_bp"),
    )


@query(
    "win_williams_r",
    oracle=f"""
WITH g AS ({_OHLC_SQL}),
w AS (
  SELECT event_type, d, c,
         COUNT(*) OVER w14 AS n14,
         MAX(h) OVER w14 AS hi14,
         MIN(l) OVER w14 AS lo14
  FROM g
  WINDOW w14 AS (PARTITION BY event_type ORDER BY d
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
       CAST(c AS BIGINT) AS close_c,
       CAST(hi14 AS BIGINT) AS hi14, CAST(lo14 AS BIGINT) AS lo14,
       CAST(CASE WHEN hi14 = lo14 THEN -5000
                 ELSE -((hi14 - c) * 10000 // (hi14 - lo14)) END AS BIGINT)
         AS williams_r_bp
FROM w WHERE n14 = 14
""",
    category="windows",
)
def win_williams_r(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Williams %R (14-day) over daily bars — the inverted stochastic
    (where does the CLOSE sit below the trailing high): %R =
    -(hi14 - c)/(hi14 - lo14), carried in exact integer basis points
    (0 at the high, -10000 at the low; non-negative floor division
    then negated, flat bands pin to the -5000 midpoint).  Pure
    integers throughout.  Scale: one trailing frame over the bounded
    OHLC grid."""
    g = _ohlc_grid(spark, sf_dir)
    w14 = Window.partitionBy("event_type").orderBy("d").rowsBetween(-13, 0)
    w = g.select(
        "event_type",
        "d",
        "c",
        F.count(F.lit(1)).over(w14).alias("n14"),
        F.max("h").over(w14).alias("hi14"),
        F.min("l").over(w14).alias("lo14"),
    ).where(F.col("n14") == 14)
    return w.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("c").cast("long").alias("close_c"),
        F.col("hi14").cast("long").alias("hi14"),
        F.col("lo14").cast("long").alias("lo14"),
        F.expr(
            "CASE WHEN hi14 = lo14 THEN -5000"
            " ELSE -((hi14 - c) * 10000 DIV (hi14 - lo14)) END"
        )
        .cast("long")
        .alias("williams_r_bp"),
    )


@query(
    "win_roc_momentum",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
w AS (
  SELECT event_type, d, x,
         lag(x, 10) OVER (PARTITION BY event_type ORDER BY d) AS x10
  FROM g
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day, x,
       CAST(x10 AS BIGINT) AS x_10_back,
       CAST(x - x10 AS BIGINT) AS momentum,
       CAST((x - x10) * 10000 // x10 AS BIGINT) AS roc_bp
FROM w WHERE x10 IS NOT NULL
""",
    category="windows",
)
def win_roc_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate of change + momentum (10-day) over the daily series —
    the raw velocity pair under every oscillator: momentum = x -
    x_{t-10} (integer difference) and ROC in integer basis points
    via floor division by the 10-back value (positive cents, so the
    denominator is never zero).  Scale: one lag over the bounded day
    grid."""
    g = _day_grid(spark, sf_dir)
    wo = Window.partitionBy("event_type").orderBy("d")
    w = g.select(
        "event_type",
        "d",
        "x",
        F.lag("x", 10).over(wo).alias("x10"),
    ).where(F.col("x10").isNotNull())
    return w.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "x",
        F.col("x10").cast("long").alias("x_10_back"),
        (F.col("x") - F.col("x10")).cast("long").alias("momentum"),
        F.expr("(x - x10) * 10000 DIV x10").cast("long").alias("roc_bp"),
    )


@query(
    "win_coppock",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
r AS (
  SELECT event_type, d,
         (x - lag(x, 10) OVER wo) * 10000 // lag(x, 10) OVER wo
           + (x - lag(x, 7) OVER wo) * 10000 // lag(x, 7) OVER wo AS rr
  FROM g WINDOW wo AS (PARTITION BY event_type ORDER BY d)
),
w AS (
  SELECT event_type, d, rr,
         lag(rr, 1) OVER wo AS r1, lag(rr, 2) OVER wo AS r2,
         lag(rr, 3) OVER wo AS r3, lag(rr, 4) OVER wo AS r4,
         lag(rr, 5) OVER wo AS r5
  FROM r WHERE rr IS NOT NULL
  WINDOW wo AS (PARTITION BY event_type ORDER BY d)
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
       CAST(rr AS BIGINT) AS roc_sum_bp,
       CAST(6 * rr + 5 * r1 + 4 * r2 + 3 * r3 + 2 * r4 + 1 * r5 AS BIGINT)
         AS coppock_s,
       CAST(CASE WHEN 6 * rr + 5 * r1 + 4 * r2 + 3 * r3 + 2 * r4 + 1 * r5 > 0
                 THEN 1 ELSE -1 END AS BIGINT) AS signal
FROM w WHERE r5 IS NOT NULL
""",
    category="windows",
)
def win_coppock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coppock curve (periods scaled 10/7 ROC, WMA 6 for the 30-day
    calendar) over the daily series — the long-horizon momentum
    bottom-finder: the summed ROC pair is integer basis points
    (floor divisions), and the linear-weighted moving average is an
    EXPLICIT 6-lag weighted sum (weights 6..1, 21x scale) — a fixed
    handful of lags beats a positional-weight window trick for both
    clarity and exactness, zero floats anywhere.  Scale: lags over
    the bounded day grid, one event_type shuffle."""
    g = _day_grid(spark, sf_dir)
    wo = Window.partitionBy("event_type").orderBy("d")
    x10 = F.lag("x", 10).over(wo)
    x7 = F.lag("x", 7).over(wo)
    r = g.select(
        "event_type",
        "d",
        (
            F.expr("(x - lag(x, 10) OVER (PARTITION BY event_type ORDER BY d))"
                   " * 10000 DIV lag(x, 10) OVER (PARTITION BY event_type ORDER BY d)")
            + F.expr("(x - lag(x, 7) OVER (PARTITION BY event_type ORDER BY d))"
                     " * 10000 DIV lag(x, 7) OVER (PARTITION BY event_type ORDER BY d)")
        ).alias("rr"),
    ).where(F.col("rr").isNotNull())
    w = r.select(
        "event_type",
        "d",
        "rr",
        F.lag("rr", 1).over(wo).alias("r1"),
        F.lag("rr", 2).over(wo).alias("r2"),
        F.lag("rr", 3).over(wo).alias("r3"),
        F.lag("rr", 4).over(wo).alias("r4"),
        F.lag("rr", 5).over(wo).alias("r5"),
    ).where(F.col("r5").isNotNull())
    cop = (
        6 * F.col("rr")
        + 5 * F.col("r1")
        + 4 * F.col("r2")
        + 3 * F.col("r3")
        + 2 * F.col("r4")
        + 1 * F.col("r5")
    )
    return w.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("rr").cast("long").alias("roc_sum_bp"),
        cop.cast("long").alias("coppock_s"),
        F.when(cop > 0, 1).otherwise(-1).cast("long").alias("signal"),
    )


@query(
    "win_ultimate_osc",
    oracle=f"""
WITH g AS ({_OHLC_SQL}),
t AS (
  SELECT event_type, d,
         c - LEAST(l, lag(c) OVER wo) AS bp,
         GREATEST(h, lag(c) OVER wo) - LEAST(l, lag(c) OVER wo) AS tr
  FROM g WINDOW wo AS (PARTITION BY event_type ORDER BY d)
),
w AS (
  SELECT event_type, d,
         COUNT(bp) OVER w20 AS n20,
         SUM(bp) OVER w5 AS bp5, SUM(tr) OVER w5 AS tr5,
         SUM(bp) OVER w10 AS bp10, SUM(tr) OVER w10 AS tr10,
         SUM(bp) OVER w20 AS bp20, SUM(tr) OVER w20 AS tr20
  FROM t
  WINDOW w5 AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         w10 AS (PARTITION BY event_type ORDER BY d
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
         w20 AS (PARTITION BY event_type ORDER BY d
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
       CAST(bp5 AS BIGINT) AS bp5, CAST(tr5 AS BIGINT) AS tr5,
       CAST(bp10 AS BIGINT) AS bp10, CAST(tr10 AS BIGINT) AS tr10,
       CAST(bp20 AS BIGINT) AS bp20, CAST(tr20 AS BIGINT) AS tr20,
       100.0 * (4.0 * (CAST(bp5 AS DOUBLE) / CAST(tr5 AS DOUBLE))
                + 2.0 * (CAST(bp10 AS DOUBLE) / CAST(tr10 AS DOUBLE))
                + (CAST(bp20 AS DOUBLE) / CAST(tr20 AS DOUBLE))) / 7.0
         AS ultimate_osc
FROM w WHERE n20 = 20
""",
    category="windows",
)
def win_ultimate_osc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ultimate oscillator (Williams; periods scaled 5/10/20) over
    daily bars — the three-horizon buying-pressure blend designed to
    dodge single-period divergence traps: buying pressure
    bp = c - min(l, prev_c) and true range tr = max(h, prev_c) -
    min(l, prev_c) are exact integers, the six window sums are
    exact int64, and UO combines the three ratios in ONE fixed-order
    double expression (each ratio divides two exact integers — same
    operands both engines).  Scale: one lag + three trailing frames
    over the bounded OHLC grid, one event_type shuffle."""
    g = _ohlc_grid(spark, sf_dir)
    wo = Window.partitionBy("event_type").orderBy("d")
    prev_c = F.lag("c").over(wo)
    t = g.select(
        "event_type",
        "d",
        (F.col("c") - F.least(F.col("l"), prev_c)).alias("bp"),
        (F.greatest(F.col("h"), prev_c) - F.least(F.col("l"), prev_c)).alias(
            "tr"
        ),
    )

    def fr(n):
        return Window.partitionBy("event_type").orderBy("d").rowsBetween(1 - n, 0)

    w = t.select(
        "event_type",
        "d",
        F.count("bp").over(fr(20)).alias("n20"),
        F.sum("bp").over(fr(5)).alias("bp5"),
        F.sum("tr").over(fr(5)).alias("tr5"),
        F.sum("bp").over(fr(10)).alias("bp10"),
        F.sum("tr").over(fr(10)).alias("tr10"),
        F.sum("bp").over(fr(20)).alias("bp20"),
        F.sum("tr").over(fr(20)).alias("tr20"),
    ).where(F.col("n20") == 20)
    uo = (
        100.0
        * (
            4.0 * (F.col("bp5").cast("double") / F.col("tr5").cast("double"))
            + 2.0 * (F.col("bp10").cast("double") / F.col("tr10").cast("double"))
            + (F.col("bp20").cast("double") / F.col("tr20").cast("double"))
        )
        / 7.0
    )
    return w.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("bp5").cast("long").alias("bp5"),
        F.col("tr5").cast("long").alias("tr5"),
        F.col("bp10").cast("long").alias("bp10"),
        F.col("tr10").cast("long").alias("tr10"),
        F.col("bp20").cast("long").alias("bp20"),
        F.col("tr20").cast("long").alias("tr20"),
        uo.alias("ultimate_osc"),
    )


@query(
    "win_adx",
    oracle=f"""
WITH g AS ({_OHLC_SQL}),
t AS (
  SELECT event_type, d,
         CASE WHEN lag(c) OVER wo IS NULL THEN h - l
              ELSE GREATEST(h - l, ABS(h - lag(c) OVER wo),
                            ABS(l - lag(c) OVER wo)) END AS tr,
         CASE WHEN h - lag(h) OVER wo > lag(l) OVER wo - l
               AND h - lag(h) OVER wo > 0
              THEN h - lag(h) OVER wo ELSE 0 END AS dm_plus,
         CASE WHEN lag(l) OVER wo - l > h - lag(h) OVER wo
               AND lag(l) OVER wo - l > 0
              THEN lag(l) OVER wo - l ELSE 0 END AS dm_minus
  FROM g WINDOW wo AS (PARTITION BY event_type ORDER BY d)
),
w AS (
  SELECT event_type, d,
         COUNT(dm_plus) OVER w14 AS n14,
         SUM(dm_plus) OVER w14 AS sdp,
         SUM(dm_minus) OVER w14 AS sdm,
         SUM(tr) OVER w14 AS str
  FROM t
  WINDOW w14 AS (PARTITION BY event_type ORDER BY d
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
),
di AS (
  SELECT event_type, d,
         CAST(sdp * 10000 // str AS BIGINT) AS di_plus_bp,
         CAST(sdm * 10000 // str AS BIGINT) AS di_minus_bp
  FROM w WHERE n14 = 14
),
dx AS (
  SELECT event_type, d, di_plus_bp, di_minus_bp,
         CASE WHEN di_plus_bp + di_minus_bp = 0 THEN 0
              ELSE ABS(di_plus_bp - di_minus_bp) * 10000
                   // (di_plus_bp + di_minus_bp) END AS dx_bp
  FROM di
),
adx AS (
  SELECT event_type, d, di_plus_bp, di_minus_bp, dx_bp,
         COUNT(*) OVER w7 AS n7,
         SUM(dx_bp) OVER w7 // 7 AS adx_bp
  FROM dx
  WINDOW w7 AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
       di_plus_bp, di_minus_bp, CAST(dx_bp AS BIGINT) AS dx_bp,
       CAST(adx_bp AS BIGINT) AS adx_bp,
       CAST(CASE WHEN di_plus_bp > di_minus_bp THEN 1
                 WHEN di_plus_bp < di_minus_bp THEN -1 ELSE 0 END AS BIGINT)
         AS trend_dir
FROM adx WHERE n7 = 7
""",
    category="windows",
)
def win_adx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average directional index (14-day DI, 7-day ADX smoothing, SMA
    variant of Wilder's recursion) over daily bars — the
    trend-STRENGTH gauge that separates "trending" from "choppy"
    regardless of direction: directional movements +DM/-DM keep only
    the larger of the up/down moves (exact integer CASE logic),
    DI± = 10000*sum(DM)/sum(TR) in integer basis points, DX =
    10000*|DI+ - DI-|/(DI+ + DI-) is integer arithmetic ON the bp
    values, and ADX is the trailing-7 floor-average of DX — zero
    floats end to end.  Scale: one lag + two trailing frames over
    the bounded OHLC grid, one event_type shuffle."""
    g = _ohlc_grid(spark, sf_dir)
    wo = Window.partitionBy("event_type").orderBy("d")
    prev_c = F.lag("c").over(wo)
    up = F.col("h") - F.lag("h").over(wo)
    dn = F.lag("l").over(wo) - F.col("l")
    t = g.select(
        "event_type",
        "d",
        F.when(prev_c.isNull(), F.col("h") - F.col("l"))
        .otherwise(
            F.greatest(
                F.col("h") - F.col("l"),
                F.abs(F.col("h") - prev_c),
                F.abs(F.col("l") - prev_c),
            )
        )
        .alias("tr"),
        # null lag (first bar) falls through to 0, exactly like the
        # oracle's CASE ... ELSE 0 under three-valued logic
        F.when((up > dn) & (up > 0), up).otherwise(0).alias("dm_plus"),
        F.when((dn > up) & (dn > 0), dn).otherwise(0).alias("dm_minus"),
    )
    w14 = Window.partitionBy("event_type").orderBy("d").rowsBetween(-13, 0)
    w = t.select(
        "event_type",
        "d",
        F.count("dm_plus").over(w14).alias("n14"),
        F.sum("dm_plus").over(w14).alias("sdp"),
        F.sum("dm_minus").over(w14).alias("sdm"),
        F.sum("tr").over(w14).alias("str"),
    ).where(F.col("n14") == 14)
    di = w.select(
        "event_type",
        "d",
        F.expr("CAST(sdp * 10000 DIV str AS BIGINT)").alias("di_plus_bp"),
        F.expr("CAST(sdm * 10000 DIV str AS BIGINT)").alias("di_minus_bp"),
    )
    dx = di.select(
        "event_type",
        "d",
        "di_plus_bp",
        "di_minus_bp",
        F.expr(
            "CASE WHEN di_plus_bp + di_minus_bp = 0 THEN 0"
            " ELSE ABS(di_plus_bp - di_minus_bp) * 10000"
            " DIV (di_plus_bp + di_minus_bp) END"
        ).alias("dx_bp"),
    )
    w7 = Window.partitionBy("event_type").orderBy("d").rowsBetween(-6, 0)
    adx = dx.select(
        "event_type",
        "d",
        "di_plus_bp",
        "di_minus_bp",
        "dx_bp",
        F.count(F.lit(1)).over(w7).alias("n7"),
        F.expr(
            "SUM(dx_bp) OVER (PARTITION BY event_type ORDER BY d"
            " ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) DIV 7"
        ).alias("adx_bp"),
    ).where(F.col("n7") == 7)
    return adx.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "di_plus_bp",
        "di_minus_bp",
        F.col("dx_bp").cast("long").alias("dx_bp"),
        F.col("adx_bp").cast("long").alias("adx_bp"),
        F.when(F.col("di_plus_bp") > F.col("di_minus_bp"), 1)
        .when(F.col("di_plus_bp") < F.col("di_minus_bp"), -1)
        .otherwise(0)
        .cast("long")
        .alias("trend_dir"),
    )


@query(
    "win_force_index",
    oracle=f"""
WITH g AS ({_OHLCV_SQL}),
t AS (
  SELECT event_type, d, vol,
         (c - lag(c) OVER wo) * vol AS fi
  FROM g WINDOW wo AS (PARTITION BY event_type ORDER BY d)
),
w AS (
  SELECT event_type, d, fi,
         COUNT(fi) OVER w13 AS n13,
         SUM(fi) OVER w13 AS sfi
  FROM t
  WINDOW w13 AS (PARTITION BY event_type ORDER BY d
                 ROWS BETWEEN 12 PRECEDING AND CURRENT ROW)
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
       CAST(fi AS BIGINT) AS force_raw,
       CAST(sfi AS BIGINT) AS force_sum13,
       CAST(sfi // 13 AS BIGINT) AS force_sma13,
       CAST(CASE WHEN sfi > 0 THEN 1 WHEN sfi < 0 THEN -1 ELSE 0 END
            AS BIGINT) AS pressure
FROM w WHERE n13 = 13
""",
    category="windows",
)
def win_force_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Force index (Elder, 13-day SMA variant) over daily bars — the
    price-move-times-volume pressure gauge: raw FI = (c - prev_c) *
    vol is an exact signed integer, the 13-day sum and its floor
    average stay integer (DIV truncates toward zero on the signed
    sum identically in both engines), and the buying/selling
    pressure sign reads the integer directly.  Scale: one lag + one
    trailing frame over the bounded OHLCV grid."""
    g = _ohlcv_grid(spark, sf_dir, close_only=True)
    wo = Window.partitionBy("event_type").orderBy("d")
    t = g.select(
        "event_type",
        "d",
        ((F.col("c") - F.lag("c").over(wo)) * F.col("vol")).alias("fi"),
    )
    w13 = Window.partitionBy("event_type").orderBy("d").rowsBetween(-12, 0)
    w = t.select(
        "event_type",
        "d",
        "fi",
        F.count("fi").over(w13).alias("n13"),
        F.sum("fi").over(w13).alias("sfi"),
    ).where(F.col("n13") == 13)
    return w.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("fi").cast("long").alias("force_raw"),
        F.col("sfi").cast("long").alias("force_sum13"),
        F.expr("sfi DIV 13").cast("long").alias("force_sma13"),
        F.when(F.col("sfi") > 0, 1)
        .when(F.col("sfi") < 0, -1)
        .otherwise(0)
        .cast("long")
        .alias("pressure"),
    )


@query(
    "win_accumulation_distribution",
    oracle=f"""
WITH g AS ({_OHLCV_SQL}),
t AS (
  SELECT event_type, d, h, l, c, vol,
         CASE WHEN h = l THEN 0
              ELSE (2 * c - h - l) * 10000 // (h - l) END AS clv_bp
  FROM g
),
w AS (
  SELECT event_type, d, clv_bp, vol,
         SUM(clv_bp * vol) OVER (PARTITION BY event_type ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ad
  FROM t
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
       CAST(clv_bp AS BIGINT) AS clv_bp,
       CAST(vol AS BIGINT) AS vol,
       CAST(ad AS BIGINT) AS ad_line,
       CAST(CASE WHEN ad > lag(ad) OVER (PARTITION BY event_type ORDER BY d)
                 THEN 1
                 WHEN ad < lag(ad) OVER (PARTITION BY event_type ORDER BY d)
                 THEN -1 ELSE 0 END AS BIGINT) AS flow_dir
FROM w
""",
    category="windows",
)
def win_accumulation_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulation/distribution line over daily bars — the
    where-in-the-range volume-flow accumulator (win_obv weighs whole
    days; A/D weighs WHERE the close landed inside the bar): the
    close-location value is kept integer at 10000x via floor
    division ((2c-h-l)*10000 DIV (h-l); a degenerate h=l bar
    contributes 0), multiplied by integer volume and cumulatively
    summed — the float-cumsum trap (windowed double sums use
    different summation trees per engine) never appears because the
    lattice is integer end to end.  Scale: one map + one running
    window over the bounded OHLCV grid."""
    g = _ohlcv_grid(spark, sf_dir)
    t = g.select(
        "event_type",
        "d",
        "vol",
        F.expr(
            "CASE WHEN h = l THEN 0"
            " ELSE (2 * c - h - l) * 10000 DIV (h - l) END"
        ).alias("clv_bp"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wo = Window.partitionBy("event_type").orderBy("d")
    w = t.select(
        "event_type",
        "d",
        "clv_bp",
        "vol",
        F.sum(F.col("clv_bp") * F.col("vol")).over(w_cum).alias("ad"),
    )
    return w.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("clv_bp").cast("long").alias("clv_bp"),
        F.col("vol").cast("long").alias("vol"),
        F.col("ad").cast("long").alias("ad_line"),
        F.when(F.col("ad") > F.lag("ad").over(wo), 1)
        .when(F.col("ad") < F.lag("ad").over(wo), -1)
        .otherwise(0)
        .cast("long")
        .alias("flow_dir"),
    )


def _elder_ray_sql(grid_ref: str, idiv: str, datefmt: str) -> str:
    """Elder-ray query text shared by both engines: EMA13 of the
    close as the win_macd integer recurrence at 1000x, joined back to
    the bars so bull power = 1000*h - ema13 and bear power =
    1000*l - ema13 stay exact integers."""
    return f"""
WITH RECURSIVE gi AS (
  SELECT event_type, d, h, l, c,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS idx
  FROM {grid_ref}
),
r(event_type, idx, e13) AS (
  SELECT event_type, idx, c * 1000 FROM gi WHERE idx = 1
  UNION ALL
  SELECT g.event_type, g.idx, (2 * g.c * 1000 + 12 * r.e13) {idiv} 14
  FROM r JOIN gi g ON g.event_type = r.event_type AND g.idx = r.idx + 1
)
SELECT r.event_type, {datefmt} AS day,
       CAST(r.e13 AS BIGINT) AS ema13_s,
       CAST(1000 * gi.h - r.e13 AS BIGINT) AS bull_power_s,
       CAST(1000 * gi.l - r.e13 AS BIGINT) AS bear_power_s,
       CAST(CASE WHEN 1000 * gi.l - r.e13 > 0 THEN 1
                 WHEN 1000 * gi.h - r.e13 < 0 THEN -1
                 ELSE 0 END AS BIGINT) AS regime
FROM r JOIN gi ON gi.event_type = r.event_type AND gi.idx = r.idx
"""


@query(
    "win_elder_ray",
    oracle=_elder_ray_sql(f"({_OHLC_SQL})", "//", "strftime(gi.d, '%Y-%m-%d')"),
    category="windows",
)
def win_elder_ray(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elder-ray bull/bear power over daily bars — how far the bar's
    extremes push above/below the EMA13 trend (bull power = h -
    EMA13, bear power = l - EMA13; both positive = bulls own the
    whole bar): the EMA is win_macd's integer floor-division
    recurrence at 1000x scale via a recursive CTE, and the powers
    are exact integer differences at the same scale.  The regime
    flag (whole bar above / below the EMA) is two comparisons.
    Scale: recursion depth = calendar days over the bounded grid."""
    g = _ohlc_grid(spark, sf_dir)
    return spark.sql(
        _elder_ray_sql("{g}", "DIV", "date_format(gi.d, 'yyyy-MM-dd')"), g=g
    )


@query(
    "win_rvi",
    oracle=f"""
WITH g AS ({_OHLC_SQL}),
w AS (
  SELECT event_type, d,
         COUNT(*) OVER w4 AS n4,
         SUM(c - o) OVER w4 AS num4,
         SUM(h - l) OVER w4 AS den4
  FROM g
  WINDOW w4 AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
       CAST(num4 AS BIGINT) AS close_open_sum,
       CAST(den4 AS BIGINT) AS range_sum,
       CAST(CASE WHEN den4 = 0 THEN 0
                 ELSE num4 * 10000 {'//'} den4 END AS BIGINT) AS rvi_bp,
       CAST(CASE WHEN num4 > 0 THEN 1 WHEN num4 < 0 THEN -1 ELSE 0 END
            AS BIGINT) AS vigor_sign
FROM w WHERE n4 = 4
""",
    category="windows",
)
def win_rvi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative vigor index (4-day) over daily bars — do closes beat
    opens relative to the bar ranges (conviction of the move):
    RVI = sum(c - o) / sum(h - l) over the window, computed as the
    ratio of two exact integer sums in basis points (numerator and
    denominator summed SEPARATELY — never a float ratio per day;
    signed floor division truncates toward zero identically in both
    engines; an all-degenerate window pins to 0).  Scale: one
    trailing frame over the bounded OHLC grid."""
    g = _ohlc_grid(spark, sf_dir)
    w4 = Window.partitionBy("event_type").orderBy("d").rowsBetween(-3, 0)
    w = g.select(
        "event_type",
        "d",
        F.count(F.lit(1)).over(w4).alias("n4"),
        F.sum(F.col("c") - F.col("o")).over(w4).alias("num4"),
        F.sum(F.col("h") - F.col("l")).over(w4).alias("den4"),
    ).where(F.col("n4") == 4)
    return w.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("num4").cast("long").alias("close_open_sum"),
        F.col("den4").cast("long").alias("range_sum"),
        F.expr(
            "CASE WHEN den4 = 0 THEN 0 ELSE num4 * 10000 DIV den4 END"
        )
        .cast("long")
        .alias("rvi_bp"),
        F.when(F.col("num4") > 0, 1)
        .when(F.col("num4") < 0, -1)
        .otherwise(0)
        .cast("long")
        .alias("vigor_sign"),
    )


def _mass_index_sql(grid_ref: str, idiv: str, datefmt: str) -> str:
    """Mass-index query text shared by both engines: single and
    double EMA9 of the bar range as integer recurrences at 1000x
    (one recursion carrying both), the per-day ratio in integer
    basis points, and a trailing-9 sum of the ratio (integer bp sum
    — the deterministic variant of the classic float ratio sum,
    documented)."""
    return f"""
WITH RECURSIVE gi AS (
  SELECT event_type, d, h - l AS rng,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS idx
  FROM {grid_ref}
),
r(event_type, idx, e1, e2) AS (
  SELECT event_type, idx, rng * 1000, rng * 1000 FROM gi WHERE idx = 1
  UNION ALL
  SELECT g.event_type, g.idx,
         (2 * g.rng * 1000 + 8 * r.e1) {idiv} 10,
         (2 * ((2 * g.rng * 1000 + 8 * r.e1) {idiv} 10) + 8 * r.e2) {idiv} 10
  FROM r JOIN gi g ON g.event_type = r.event_type AND g.idx = r.idx + 1
),
q AS (
  SELECT r.event_type, gi.d, r.e1, r.e2,
         CASE WHEN r.e2 = 0 THEN 10000
              ELSE r.e1 * 10000 {idiv} r.e2 END AS ratio_bp
  FROM r JOIN gi ON gi.event_type = r.event_type AND gi.idx = r.idx
),
w AS (
  SELECT event_type, d, ratio_bp,
         COUNT(*) OVER w9 AS n9,
         SUM(ratio_bp) OVER w9 AS mass_s
  FROM q
  WINDOW w9 AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)
)
SELECT event_type, {datefmt} AS day,
       CAST(ratio_bp AS BIGINT) AS ratio_bp,
       CAST(mass_s AS BIGINT) AS mass_index_s,
       CAST(CASE WHEN mass_s > 95000 THEN 1 ELSE 0 END AS BIGINT)
         AS bulge
FROM w WHERE n9 = 9
"""


@query(
    "win_mass_index",
    oracle=_mass_index_sql(f"({_OHLC_SQL})", "//", "strftime(d, '%Y-%m-%d')"),
    category="windows",
)
def win_mass_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mass index (9-day, scaled from Dorsey's 25) over daily bars —
    range-volatility bulges that precede trend reversals: the
    single/double EMA9 of the bar range advance together in ONE
    recursive CTE (integer floor recurrences at 1000x), the per-day
    EMA ratio is floored to integer basis points, and the mass index
    sums those integer bp over the trailing window (the
    deterministic variant of the classic float ratio sum — same
    signal shape, bit-exact cross-engine; documented).  The bulge
    flag fires above 9.5 (95000 in bp-sum units).  Scale: recursion
    depth = calendar days; one trailing frame on the bounded
    grid."""
    g = _ohlc_grid(spark, sf_dir)
    return spark.sql(
        _mass_index_sql("{g}", "DIV", "date_format(d, 'yyyy-MM-dd')"), g=g
    )


def _kama_sql(grid_ref: str, idiv: str, datefmt: str) -> str:
    """KAMA query text shared by both engines.  The efficiency ratio
    is precomputed per day as the integer er_s = 1000*|x_t - x_{t-10}|
    DIV sum|Δx| over the same 10 days; the smoothing constant squared
    is integer milli-scale arithmetic (fast/slow SC constants 667/65
    = the standard 2/(2+1), 2/(30+1) at 1000x), and the KAMA state
    advances by sc2*(1000x - kama) DIV 1e6 at 1000x value scale —
    every step a floor division, bit-exact cross-engine."""
    return f"""
WITH RECURSIVE gl AS (
  SELECT event_type, d, x,
         lag(x, 10) OVER wo AS x10,
         ABS(x - lag(x) OVER wo) AS dx
  FROM {grid_ref} WINDOW wo AS (PARTITION BY event_type ORDER BY d)
),
g0 AS (
  SELECT event_type, d, x, x10,
         ABS(x - x10) AS chg10,
         SUM(dx) OVER (PARTITION BY event_type ORDER BY d
                       ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vol10
  FROM gl
),
gi AS (
  SELECT event_type, d, x,
         CASE WHEN vol10 = 0 THEN 1000
              ELSE chg10 * 1000 {idiv} vol10 END AS er_s,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS idx
  FROM g0 WHERE x10 IS NOT NULL
),
r(event_type, idx, kama) AS (
  SELECT event_type, idx, x * 1000 FROM gi WHERE idx = 1
  UNION ALL
  SELECT g.event_type, g.idx,
         r.kama + ((g.er_s * 602 {idiv} 1000 + 65)
                   * (g.er_s * 602 {idiv} 1000 + 65))
                  * (g.x * 1000 - r.kama) {idiv} 1000000
  FROM r JOIN gi g ON g.event_type = r.event_type AND g.idx = r.idx + 1
)
SELECT r.event_type, {datefmt} AS day,
       CAST(gi.x AS BIGINT) AS x,
       CAST(gi.er_s AS BIGINT) AS er_milli,
       CAST(r.kama AS BIGINT) AS kama_s,
       CAST(CASE WHEN 1000 * gi.x > r.kama THEN 1
                 WHEN 1000 * gi.x < r.kama THEN -1 ELSE 0 END AS BIGINT)
         AS above_kama
FROM r JOIN gi ON gi.event_type = r.event_type AND gi.idx = r.idx
"""


@query(
    "win_kama",
    oracle=_kama_sql(f"({_GRID_SQL})", "//", "strftime(gi.d, '%Y-%m-%d')"),
    category="windows",
)
def win_kama(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaufman adaptive moving average (10-day efficiency, 2/30 SC
    bounds at milli-scale) — the moving average whose smoothing SPEED
    adapts to the signal-to-noise ratio (trending series track fast,
    choppy ones damp): the efficiency ratio |net move| / sum|moves|
    is an integer milli-fraction (a zero-volatility window pins to
    1000), the Kaufman smoothing constant (er*(fast-slow)+slow)^2
    squares in integer milli-arithmetic (fast-slow = 602, slow = 65 —
    the standard 2/(n+1) constants at 1000x), and the KAMA state
    advances by sc2*(x - kama) DIV 1e6 at 1000x value scale inside a
    recursive CTE — floor divisions end to end, bit-exact in both
    engines.  Scale: recursion depth = calendar days over the
    bounded grid (win_macd's shape) after one windowed pre-stage."""
    g = _day_grid(spark, sf_dir)
    return spark.sql(
        _kama_sql("{g}", "DIV", "date_format(gi.d, 'yyyy-MM-dd')"), g=g
    )


def _tsi_sql(grid_ref: str, idiv: str, datefmt: str) -> str:
    """TSI query text shared by both engines: one recursion carries
    FOUR integer EMA states (EMA13 then EMA7 of momentum, and of
    |momentum|) at raw cent scale x1000; the index is the final
    ratio in basis points by integer division."""
    return f"""
WITH RECURSIVE g0 AS (
  SELECT event_type, d, x,
         x - lag(x) OVER (PARTITION BY event_type ORDER BY d) AS mom
  FROM {grid_ref}
),
gi AS (
  SELECT event_type, d, mom,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS idx
  FROM g0 WHERE mom IS NOT NULL
),
r(event_type, idx, e1, e2, a1, a2) AS (
  SELECT event_type, idx, mom * 1000, mom * 1000,
         ABS(mom) * 1000, ABS(mom) * 1000
  FROM gi WHERE idx = 1
  UNION ALL
  SELECT g.event_type, g.idx,
         (2 * g.mom * 1000 + 12 * r.e1) {idiv} 14,
         (2 * ((2 * g.mom * 1000 + 12 * r.e1) {idiv} 14) + 6 * r.e2)
           {idiv} 8,
         (2 * ABS(g.mom) * 1000 + 12 * r.a1) {idiv} 14,
         (2 * ((2 * ABS(g.mom) * 1000 + 12 * r.a1) {idiv} 14) + 6 * r.a2)
           {idiv} 8
  FROM r JOIN gi g ON g.event_type = r.event_type AND g.idx = r.idx + 1
)
SELECT r.event_type, {datefmt} AS day,
       CAST(gi.mom AS BIGINT) AS momentum,
       CAST(r.e2 AS BIGINT) AS smoothed_mom_s,
       CAST(r.a2 AS BIGINT) AS smoothed_abs_s,
       CAST(CASE WHEN r.a2 = 0 THEN 0
                 ELSE r.e2 * 10000 {idiv} r.a2 END AS BIGINT) AS tsi_bp
FROM r JOIN gi ON gi.event_type = r.event_type AND gi.idx = r.idx
"""


@query(
    "win_tsi",
    oracle=_tsi_sql(f"({_GRID_SQL})", "//", "strftime(gi.d, '%Y-%m-%d')"),
    category="windows",
)
def win_tsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True strength index (13/7 double smoothing, scaled from
    Blau's 25/13) over the daily series — double-EMA-smoothed
    momentum normalized by double-EMA-smoothed |momentum|, the
    oscillator that self-normalizes to ±10000 bp without a lookback
    window: ONE recursive CTE advances four integer EMA states
    (momentum and absolute momentum, first and second smoothing) at
    1000x scale, and TSI is the final integer basis-point division —
    signed floor division truncating toward zero identically in both
    engines.  Scale: recursion depth = calendar days over the
    bounded grid."""
    g = _day_grid(spark, sf_dir)
    return spark.sql(
        _tsi_sql("{g}", "DIV", "date_format(gi.d, 'yyyy-MM-dd')"), g=g
    )


@query(
    "win_kst",
    oracle=f"""
WITH g AS ({_GRID_SQL}),
r AS (
  SELECT event_type, d,
         (x - lag(x, 4) OVER wo) * 10000 {'//'} lag(x, 4) OVER wo AS roc1,
         (x - lag(x, 6) OVER wo) * 10000 {'//'} lag(x, 6) OVER wo AS roc2,
         (x - lag(x, 8) OVER wo) * 10000 {'//'} lag(x, 8) OVER wo AS roc3,
         (x - lag(x, 10) OVER wo) * 10000 {'//'} lag(x, 10) OVER wo AS roc4
  FROM g WINDOW wo AS (PARTITION BY event_type ORDER BY d)
),
w AS (
  SELECT event_type, d,
         COUNT(roc4) OVER w6 AS n6,
         SUM(roc1) OVER w3 AS s1, SUM(roc2) OVER w4 AS s2,
         SUM(roc3) OVER w5 AS s3, SUM(roc4) OVER w6 AS s4
  FROM r
  WINDOW w3 AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
         w4 AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
         w5 AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         w6 AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
       CAST(s1 AS BIGINT) AS sma_roc1_x3,
       CAST(s4 AS BIGINT) AS sma_roc4_x6,
       CAST(20 * s1 + 15 * s2 + 12 * s3 + 10 * s4 AS BIGINT) AS kst_s,
       CAST(CASE WHEN 20 * s1 + 15 * s2 + 12 * s3 + 10 * s4 > 0 THEN 1
                 WHEN 20 * s1 + 15 * s2 + 12 * s3 + 10 * s4 < 0 THEN -1
                 ELSE 0 END AS BIGINT) AS signal
FROM w WHERE n6 = 6
""",
    category="windows",
)
def win_kst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Know Sure Thing (Pring; ROC periods 4/6/8/10, SMA windows
    3/4/5/6, weights 1..4 — scaled to the 30-day calendar) over the
    daily series — the four-horizon smoothed-momentum blend: each ROC
    is integer basis points by floor division, each SMA is kept as
    the raw window SUM, and the classic weighted combination
    1*sma1 + 2*sma2 + 3*sma3 + 4*sma4 clears all four divisors as
    20*s1 + 15*s2 + 12*s3 + 10*s4 (the 60x common scale) — one
    exact integer, zero floats.  Scale: four lags + four trailing
    frames over the bounded day grid, one event_type shuffle."""
    g = _day_grid(spark, sf_dir)
    wo = Window.partitionBy("event_type").orderBy("d")

    def roc(n):
        lagx = F.lag("x", n).over(wo)
        return F.expr(
            f"(x - lag(x, {n}) OVER (PARTITION BY event_type ORDER BY d))"
            f" * 10000 DIV lag(x, {n}) OVER (PARTITION BY event_type ORDER BY d)"
        )

    r = g.select(
        "event_type",
        "d",
        roc(4).alias("roc1"),
        roc(6).alias("roc2"),
        roc(8).alias("roc3"),
        roc(10).alias("roc4"),
    )

    def fr(n):
        return Window.partitionBy("event_type").orderBy("d").rowsBetween(1 - n, 0)

    w = r.select(
        "event_type",
        "d",
        F.count("roc4").over(fr(6)).alias("n6"),
        F.sum("roc1").over(fr(3)).alias("s1"),
        F.sum("roc2").over(fr(4)).alias("s2"),
        F.sum("roc3").over(fr(5)).alias("s3"),
        F.sum("roc4").over(fr(6)).alias("s4"),
    ).where(F.col("n6") == 6)
    kst = 20 * F.col("s1") + 15 * F.col("s2") + 12 * F.col("s3") + 10 * F.col("s4")
    return w.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("s1").cast("long").alias("sma_roc1_x3"),
        F.col("s4").cast("long").alias("sma_roc4_x6"),
        kst.cast("long").alias("kst_s"),
        F.when(kst > 0, 1).when(kst < 0, -1).otherwise(0).cast("long").alias(
            "signal"
        ),
    )


# ------------------------------------------------------------------ #
# r10 wave 6: SPC control rules, EMA-compound trend lines, volume
# oscillator, and the zigzag pivot state machine
# ------------------------------------------------------------------ #


def _spc_sql(grid_ref: str, bigt: str, datefmt: str) -> str:
    """Western Electric control-rule query text shared by both
    engines.  Zone tests avoid sqrt entirely: |x - mu| > k*sigma over
    the per-type series is equivalent to (n*x - S)^2 > k^2*(n*Sx2 -
    S^2) — all exact integers (squares in {bigt}: DECIMAL(38,0) /
    HUGEINT), so the zone flags are bit-exact cross-engine."""
    return f"""
WITH g AS (
  SELECT event_type, d, x,
         CAST(COUNT(*) OVER p AS BIGINT) AS n,
         CAST(SUM(x) OVER p AS BIGINT) AS s,
         SUM(CAST(x AS {bigt}) * x) OVER p AS sx2
  FROM {grid_ref}
  WINDOW p AS (PARTITION BY event_type)
),
z AS (
  SELECT event_type, d, x,
         CASE WHEN n * x - s > 0 THEN 1
              WHEN n * x - s < 0 THEN -1 ELSE 0 END AS side,
         CASE WHEN (CAST(n AS {bigt}) * x - s) * (n * x - s)
                   > 1 * (n * sx2 - CAST(s AS {bigt}) * s)
              THEN 1 ELSE 0 END AS beyond1,
         CASE WHEN (CAST(n AS {bigt}) * x - s) * (n * x - s)
                   > 4 * (n * sx2 - CAST(s AS {bigt}) * s)
              THEN 1 ELSE 0 END AS beyond2,
         CASE WHEN (CAST(n AS {bigt}) * x - s) * (n * x - s)
                   > 9 * (n * sx2 - CAST(s AS {bigt}) * s)
              THEN 1 ELSE 0 END AS beyond3
  FROM g
),
r AS (
  SELECT event_type, d, x, side, beyond1, beyond2, beyond3,
         CAST(beyond3 AS INT) AS rule1,
         CASE WHEN COUNT(*) OVER w3 = 3 AND
                   (SUM(CASE WHEN beyond2 = 1 AND side = 1
                             THEN 1 ELSE 0 END) OVER w3 >= 2
                    OR SUM(CASE WHEN beyond2 = 1 AND side = -1
                                THEN 1 ELSE 0 END) OVER w3 >= 2)
              THEN 1 ELSE 0 END AS rule2,
         CASE WHEN COUNT(*) OVER w5 = 5 AND
                   (SUM(CASE WHEN beyond1 = 1 AND side = 1
                             THEN 1 ELSE 0 END) OVER w5 >= 4
                    OR SUM(CASE WHEN beyond1 = 1 AND side = -1
                                THEN 1 ELSE 0 END) OVER w5 >= 4)
              THEN 1 ELSE 0 END AS rule3,
         CASE WHEN COUNT(*) OVER w8 = 8
                   AND MIN(side) OVER w8 = MAX(side) OVER w8
                   AND MIN(side) OVER w8 <> 0
              THEN 1 ELSE 0 END AS rule4
  FROM z
  WINDOW w3 AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
         w5 AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         w8 AS (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
)
SELECT event_type, {datefmt} AS day, CAST(x AS BIGINT) AS x,
       CAST(side AS INT) AS side,
       CAST(beyond1 AS INT) AS beyond1, CAST(beyond2 AS INT) AS beyond2,
       CAST(beyond3 AS INT) AS beyond3,
       rule1, rule2, rule3, rule4
FROM r
""".replace("%D%", datefmt)


@query(
    "win_spc_rules",
    oracle=_spc_sql(f"({_GRID_SQL})", "HUGEINT", "strftime(d, '%Y-%m-%d')"),
    category="windows",
)
def win_spc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Western Electric SPC control rules over the per-type daily
    revenue series — the process-monitoring classifier run on every
    manufacturing/SRE control chart: rule 1 (point beyond 3 sigma),
    rule 2 (2 of 3 beyond 2 sigma, same side), rule 3 (4 of 5 beyond
    1 sigma, same side), rule 4 (8 consecutive on one side of
    center).  sqrt never happens: |x-mu| > k*sigma is evaluated as
    (n*x-S)^2 > k^2*(n*Sx2-S^2) in DECIMAL(38,0)/HUGEINT — zone
    membership is an exact integer predicate, so every flag is
    bit-stable cross-engine; the rule windows are bounded ROWS
    frames.  One shared SQL text, entry-point-2 style.  Scale: the
    center/sigma stats come from one per-partition window over the
    bounded day grid; at raw-event scale the same flags ride on the
    streaming day rollup."""
    g = _day_grid(spark, sf_dir)
    return spark.sql(
        _spc_sql("{g}", "DECIMAL(38,0)", "date_format(d, 'yyyy-MM-dd')"),
        g=g,
    )


def _dema_sql(grid_ref: str, idiv: str, datefmt: str) -> str:
    """DEMA/TEMA query text: the EMA-of-EMA-of-EMA chain as one
    recursive CTE, each level the win_macd integer recurrence at
    1000x scale (period 10: e' = (2*v + 9*e) idiv 11)."""
    return f"""
WITH RECURSIVE gi AS (
  SELECT event_type, d, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS idx
  FROM {grid_ref}
),
r(event_type, idx, e1, e2, e3) AS (
  SELECT event_type, idx, x * 1000, x * 1000, x * 1000
  FROM gi WHERE idx = 1
  UNION ALL
  SELECT g.event_type, g.idx,
         (2 * g.x * 1000 + 9 * r.e1) {idiv} 11,
         (2 * ((2 * g.x * 1000 + 9 * r.e1) {idiv} 11) + 9 * r.e2)
           {idiv} 11,
         (2 * ((2 * ((2 * g.x * 1000 + 9 * r.e1) {idiv} 11)
                + 9 * r.e2) {idiv} 11) + 9 * r.e3) {idiv} 11
  FROM r JOIN gi g ON g.event_type = r.event_type AND g.idx = r.idx + 1
)
SELECT r.event_type, {datefmt} AS day, CAST(gi.x AS BIGINT) AS x,
       CAST(r.e1 AS BIGINT) AS ema_s,
       CAST(2 * r.e1 - r.e2 AS BIGINT) AS dema_s,
       CAST(3 * r.e1 - 3 * r.e2 + r.e3 AS BIGINT) AS tema_s
FROM r JOIN gi ON gi.event_type = r.event_type AND gi.idx = r.idx
"""


@query(
    "win_dema_tema",
    oracle=_dema_sql(f"({_GRID_SQL})", "//", "strftime(gi.d, '%Y-%m-%d')"),
    category="windows",
)
def win_dema_tema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEMA and TEMA (Mulloy 1994) — the lag-compensated EMA
    compounds: DEMA = 2*EMA - EMA(EMA), TEMA = 3*EMA - 3*EMA(EMA) +
    EMA(EMA(EMA)), period 10.  All three nesting levels advance
    together in ONE recursive CTE as the win_macd integer recurrence
    (1000x scale, shared floor division), so the whole compound is
    bit-exact cross-engine — the inner EMA's fresh value feeds the
    outer level within the same recursion step (the repeated-
    subexpression text keeps both parsers on identical arithmetic).
    Depth = calendar days; each level a 1-row-per-series join."""
    g = _day_grid(spark, sf_dir)
    return spark.sql(
        _dema_sql("{g}", "DIV", "date_format(gi.d, 'yyyy-MM-dd')"), g=g
    )


def _chaikin_sql(grid_ref: str, idiv: str, datefmt: str) -> str:
    """Chaikin A/D oscillator text: money-flow volume per bar as one
    exact scaled floor division (range-degenerate bars contribute 0),
    the A/D line as a running sum, and the EMA3/EMA10 pair of the
    line as one recursive CTE."""
    return f"""
WITH RECURSIVE mf AS (
  SELECT event_type, d,
         CASE WHEN h = l THEN 0
              ELSE (vol * ((2 * c - h - l) * 1000)) {idiv} (h - l) END
           AS mfv_s
  FROM {grid_ref}
),
ad AS (
  SELECT event_type, d,
         CAST(SUM(mfv_s) OVER (PARTITION BY event_type ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS ad_s,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS idx
  FROM mf
),
r(event_type, idx, e3, e10) AS (
  SELECT event_type, idx, ad_s, ad_s FROM ad WHERE idx = 1
  UNION ALL
  SELECT a.event_type, a.idx,
         (2 * a.ad_s + 2 * r.e3) {idiv} 4,
         (2 * a.ad_s + 9 * r.e10) {idiv} 11
  FROM r JOIN ad a ON a.event_type = r.event_type AND a.idx = r.idx + 1
)
SELECT r.event_type, {datefmt} AS day,
       CAST(a.ad_s AS BIGINT) AS ad_line_s,
       CAST(r.e3 AS BIGINT) AS ema3_s,
       CAST(r.e10 AS BIGINT) AS ema10_s,
       CAST(r.e3 - r.e10 AS BIGINT) AS chaikin_s
FROM r JOIN ad a ON a.event_type = r.event_type AND a.idx = r.idx
"""


_OHLCV_SQL = f"""
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         MAX({_CENTS_SQL}) AS h,
         MIN({_CENTS_SQL}) AS l,
         arg_max({_CENTS_SQL}, ts) AS c,
         CAST(COUNT(*) AS BIGINT) AS vol
  FROM events
  GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
"""


@query(
    "win_chaikin_osc",
    oracle=_chaikin_sql(
        f"({_OHLCV_SQL})", "//", "strftime(a.d, '%Y-%m-%d')"
    ),
    category="windows",
)
def win_chaikin_osc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chaikin Accumulation/Distribution oscillator — the volume-flow
    divergence detector: per-bar money-flow volume vol * ((c-l)-(h-c))
    / (h-l) ships as ONE exact 1000x-scaled floor division (the
    close-location value; degenerate h = l bars contribute 0 by the
    standard convention), the A/D line is its running sum, and the
    oscillator is EMA3(AD) - EMA10(AD) advancing as the win_macd
    integer recurrence in one recursive CTE.  Signed numerators make
    this the floor-division case that VERIFIES the shared Spark DIV
    == DuckDB // truncation on negatives (the supertrend
    precedent)."""
    g = _ohlcv_grid(spark, sf_dir)
    return spark.sql(
        _chaikin_sql("{g}", "DIV", "date_format(a.d, 'yyyy-MM-dd')"), g=g
    )


def _zigzag_sql(grid_ref: str, datefmt: str) -> str:
    """ZigZag 5% reversal pivots as a recursive state machine over
    (direction, running extreme, extreme index): a flip confirms the
    PRIOR extreme as a pivot.  All comparisons are integer products
    (100*c vs 95/105 * ext)."""
    return f"""
WITH RECURSIVE gi AS (
  SELECT event_type, d, c,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS idx
  FROM {grid_ref}
),
r(event_type, idx, dir, ext, extidx, flip, piv, pividx) AS (
  SELECT event_type, idx, 1, c, idx, 0, CAST(0 AS BIGINT),
         CAST(0 AS BIGINT)
  FROM gi WHERE idx = 1
  UNION ALL
  SELECT g.event_type, g.idx,
         CASE WHEN r.dir = 1 AND 100 * g.c <= 95 * r.ext THEN -1
              WHEN r.dir = -1 AND 100 * g.c >= 105 * r.ext THEN 1
              ELSE r.dir END,
         CASE WHEN r.dir = 1 AND 100 * g.c <= 95 * r.ext THEN g.c
              WHEN r.dir = -1 AND 100 * g.c >= 105 * r.ext THEN g.c
              WHEN r.dir = 1 AND g.c > r.ext THEN g.c
              WHEN r.dir = -1 AND g.c < r.ext THEN g.c
              ELSE r.ext END,
         CASE WHEN r.dir = 1 AND 100 * g.c <= 95 * r.ext THEN g.idx
              WHEN r.dir = -1 AND 100 * g.c >= 105 * r.ext THEN g.idx
              WHEN r.dir = 1 AND g.c > r.ext THEN g.idx
              WHEN r.dir = -1 AND g.c < r.ext THEN g.idx
              ELSE r.extidx END,
         CASE WHEN (r.dir = 1 AND 100 * g.c <= 95 * r.ext)
                OR (r.dir = -1 AND 100 * g.c >= 105 * r.ext)
              THEN 1 ELSE 0 END,
         CASE WHEN (r.dir = 1 AND 100 * g.c <= 95 * r.ext)
                OR (r.dir = -1 AND 100 * g.c >= 105 * r.ext)
              THEN r.ext ELSE CAST(0 AS BIGINT) END,
         CASE WHEN (r.dir = 1 AND 100 * g.c <= 95 * r.ext)
                OR (r.dir = -1 AND 100 * g.c >= 105 * r.ext)
              THEN CAST(r.extidx AS BIGINT) ELSE CAST(0 AS BIGINT) END
  FROM r JOIN gi g ON g.event_type = r.event_type AND g.idx = r.idx + 1
)
SELECT r.event_type, {datefmt} AS confirm_day,
       CAST(r.piv AS BIGINT) AS pivot_cents,
       CAST(r.pividx AS BIGINT) AS pivot_idx,
       CASE WHEN r.dir = -1 THEN 'high' ELSE 'low' END AS pivot_kind
FROM r JOIN gi ON gi.event_type = r.event_type AND gi.idx = r.idx
WHERE r.flip = 1
"""


@query(
    "win_zigzag",
    oracle=_zigzag_sql(f"({_OHLC_SQL})", "strftime(gi.d, '%Y-%m-%d')"),
    category="windows",
)
def win_zigzag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZigZag 5% reversal pivots over the daily close series — the
    swing-structure extractor chartists and pattern miners run
    before wave/support analysis: a rising leg tracks its running
    high; a close 5% below it CONFIRMS that high as a pivot and
    flips the leg (symmetrically for lows).  Inherently a per-series
    STATE MACHINE (the running extreme resets on flips — no window
    frame expresses it), so it rides the recursive-CTE state pattern
    (win_supertrend's), with all reversal tests as exact integer
    products (100*c vs 95*ext / 105*ext — no percent floats).  The
    emitted rows are the CONFIRMATIONS: (confirm day, pivot value,
    pivot index, kind); dir at the flip row has already flipped, so
    kind reads from the new direction."""
    g = _ohlc_grid(spark, sf_dir)
    return spark.sql(
        _zigzag_sql("{g}", "date_format(gi.d, 'yyyy-MM-dd')"), g=g
    )


def _holt_winters_sql(grid_ref: str, idiv: str, datefmt: str) -> str:
    """Additive Holt-Winters (weekly period 7, alpha=beta=gamma=1/2)
    query text: the recursive CTE carries level, trend and ALL SEVEN
    seasonal slots, rotating the active slot by (idx-1) % 7 — the
    dyadic smoothing constants keep every update one shared floor
    division at 1000x scale.  Seeds: l = x_1*1000, b = 0, s_i = 0
    (the zero-season convention; the recurrences converge to the
    weekly pattern within two seasons and the certification target
    is the exact ROUND STRUCTURE, not a fitted forecast)."""
    slots = ", ".join(f"s{i}" for i in range(7))
    zero_slots = ", ".join("CAST(0 AS BIGINT)" for _ in range(7))
    s_prev = "CASE (g.idx - 1) % 7 " + " ".join(
        f"WHEN {i} THEN r.s{i}" for i in range(7)
    ) + " END"
    l_new = f"(g.x * 1000 - ({s_prev}) + r.l + r.b) {idiv} 2"
    b_new = f"(({l_new}) - r.l + r.b) {idiv} 2"
    s_new = f"(g.x * 1000 - ({l_new}) + ({s_prev})) {idiv} 2"
    slot_updates = ", ".join(
        f"CASE WHEN (g.idx - 1) % 7 = {i} THEN {s_new} ELSE r.s{i} END"
        for i in range(7)
    )
    return f"""
WITH RECURSIVE gi AS (
  SELECT event_type, d, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS idx
  FROM {grid_ref}
),
r(event_type, idx, l, b, fc, {slots}) AS (
  SELECT event_type, idx, x * 1000, CAST(0 AS BIGINT),
         CAST(0 AS BIGINT), {zero_slots}
  FROM gi WHERE idx = 1
  UNION ALL
  SELECT g.event_type, g.idx,
         {l_new}, {b_new},
         r.l + r.b + ({s_prev}),
         {slot_updates}
  FROM r JOIN gi g ON g.event_type = r.event_type AND g.idx = r.idx + 1
)
SELECT r.event_type, {datefmt} AS day, CAST(gi.x AS BIGINT) AS x,
       CAST(r.l AS BIGINT) AS level_s,
       CAST(r.b AS BIGINT) AS trend_s,
       CAST(r.fc AS BIGINT) AS forecast_s,
       CAST(gi.x * 1000 - r.fc AS BIGINT) AS resid_s
FROM r JOIN gi ON gi.event_type = r.event_type AND gi.idx = r.idx
WHERE r.idx > 1
"""


@query(
    "win_holt_winters",
    oracle=_holt_winters_sql(
        f"({_GRID_SQL})", "//", "strftime(gi.d, '%Y-%m-%d')"
    ),
    category="windows",
)
def win_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive HOLT-WINTERS triple exponential smoothing (weekly
    period 7) — the seasonal forecaster agg_holt_linear lacks a
    season term for: level, trend and the seven seasonal components
    advance together in ONE recursive CTE, the active slot rotating
    by day-of-sequence, every update a shared dyadic floor division
    at 1000x scale (alpha = beta = gamma = 1/2) — the whole state
    trajectory is bit-exact cross-engine, and the one-step-ahead
    forecast l + b + s_{{t-7}} plus its residual are emitted per
    day.  The seasonal state is SEVEN rotating columns, not an
    array — the recursion stays flat-typed in both engines.  Depth
    = calendar days; each level one bounded join."""
    g = _day_grid(spark, sf_dir)
    return spark.sql(
        _holt_winters_sql("{g}", "DIV", "date_format(gi.d, 'yyyy-MM-dd')"),
        g=g,
    )
