"""Non-equi joins (SURVEY.md §2.3 hard tier): theta/banded join,
as-of join, interval-overlap join.

Spark has no native physical operator for any of these (a raw
non-equi condition plans as BroadcastNestedLoopJoin). The scale
strategies used here:
- theta/banded: the band table is a bounded literal dim -> broadcast
  nested loop is O(rows x bands) map-side work, no shuffle.
- as-of: union the two streams, one shuffle on the key, and a
  forward-fill window (last non-null at-or-before) — O(n log n) per
  key, no range explosion. (pd.merge_asof via applyInPandas is the
  per-group escape hatch; the window form stays JVM-side.)
- interval overlap: explode each interval to its covered coarse time
  buckets, equi-join on bucket (this is the shuffle key), exact
  overlap residual, dedup — the standard sub-quadratic banding of an
  IEJoin. Bucket width ~ max interval length bounds the fan-out at 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import table
from ..registry import query

_BANDS = [("low", 0, 100000), ("mid", 100000, 300000), ("high", 300000, 10**9)]


@query(
    "join_theta",
    oracle=f"""
SELECT b.band, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders o
JOIN (VALUES {", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)})
     AS b(band, lo, hi)
  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band
""",
    category="joins_nonequi",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded (theta) join: orders against literal price bands on a
    range predicate. The band side is 3 rows -> broadcast nested
    loop, zero shuffle of the fact side."""
    o = table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(_BANDS, "band string, lo long, hi long")
    return (
        o.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@query(
    "join_asof",
    oracle="""
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       c.event_id AS click_id, c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
""",
    category="joins_nonequi",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click by the same
    user at-or-before it (inner semantics — purchases with no prior
    click drop, matching DuckDB ASOF JOIN).

    Implementation: tag clicks 0 / purchases 1, union, then a
    forward-fill window per user ordered by (ts, tag, event_id) —
    the last click-struct at or before each purchase. One shuffle on
    user_id; ties at equal ts resolve click-before-purchase, same as
    the <= predicate. events.ts is globally unique (monotone source)
    so the match is well-defined."""
    e = table(spark, sf_dir, "events")
    tagged = e.where(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("tag"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_struct = F.when(
        F.col("tag") == 0, F.struct(F.col("ts").alias("cts"), F.col("event_id").alias("cid"))
    )
    filled = tagged.withColumn(
        "last_click", F.last(click_struct, ignorenulls=True).over(w)
    )
    return (
        filled.where((F.col("tag") == 1) & F.col("last_click").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("last_click.cid").alias("click_id"),
            F.col("last_click.cts").alias("click_ts"),
        )
    )


@query(
    "join_asof_forward",
    oracle="""
SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
       p.event_id AS purchase_id, p.ts AS purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts <= p.ts
""",
    category="joins_nonequi",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join — the mirror of join_asof: for each click,
    the EARLIEST purchase by the same user at-or-after it (the
    "time to next conversion" direction; inner semantics, clicks
    with no later purchase drop — matching DuckDB's forward ASOF).

    Implementation mirrors the backward kernel with the frame
    reversed: tag purchases, union with clicks, and a BACKWARD-fill
    window (first purchase-struct in [current row, unbounded
    following)) per user ordered by (ts, tag, event_id) — clicks
    sort before a same-ts purchase so ts-equality matches, same as
    the <= predicate. One shuffle on user_id."""
    e = table(spark, sf_dir, "events")
    tagged = e.where(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("tag"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    purchase_struct = F.when(
        F.col("tag") == 1,
        F.struct(F.col("ts").alias("pts"), F.col("event_id").alias("pid")),
    )
    filled = tagged.withColumn(
        "next_purchase", F.first(purchase_struct, ignorenulls=True).over(w)
    )
    return (
        filled.where((F.col("tag") == 0) & F.col("next_purchase").isNotNull())
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("next_purchase.pid").alias("purchase_id"),
            F.col("next_purchase.pts").alias("purchase_ts"),
        )
    )


_BUCKET_S = 1800  # 30 min — equals the max interval length


@query(
    "join_interval",
    oracle=f"""
WITH a AS (
  SELECT event_id, user_id, ts AS s, ts + INTERVAL 30 MINUTE AS e
  FROM events WHERE user_id < 3
),
b AS (
  SELECT event_id, user_id, ts AS s, ts + INTERVAL 30 MINUTE AS e
  FROM events WHERE user_id >= 3
)
SELECT a.event_id AS a_id, b.event_id AS b_id
FROM a JOIN b ON a.s < b.e AND b.s < a.e
""",
    category="joins_nonequi",
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join between two activity-interval sets
    ([ts, ts+30min) for two user populations): explode each interval
    to its covered 30-min buckets, equi-join on bucket, exact overlap
    residual, dedup. The oracle states the textbook a.s < b.e AND
    b.s < a.e condition directly (DuckDB plans it as an IEJoin);
    Spark gets the equivalent result with an equi-join shuffle
    instead of a nested loop."""
    e = table(spark, sf_dir, "events")

    def intervals(df: DataFrame) -> DataFrame:
        epoch = F.col("ts").cast("double")
        return df.select(
            "event_id",
            epoch.alias("s"),
            (epoch + _BUCKET_S).alias("e"),
        )

    a = intervals(e.where(F.col("user_id") < 3))
    b = intervals(e.where(F.col("user_id") >= 3))

    def with_buckets(df: DataFrame) -> DataFrame:
        lo = F.floor(F.col("s") / _BUCKET_S).cast("long")
        hi = F.floor(F.col("e") / _BUCKET_S).cast("long")
        return df.withColumn("bucket", F.explode(F.sequence(lo, hi)))

    ab, bb = with_buckets(a).alias("a"), with_buckets(b).alias("b")
    return (
        ab.join(
            bb,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.s") < F.col("b.e"))
            & (F.col("b.s") < F.col("a.e")),
        )
        .select(F.col("a.event_id").alias("a_id"), F.col("b.event_id").alias("b_id"))
        .distinct()
    )


@query(
    "join_asof_nearest",
    oracle="""
WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
p AS (SELECT * FROM events WHERE event_type = 'purchase'),
pairs AS (
  SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
         c.event_id AS click_id, c.ts AS click_ts,
         ABS(CAST(epoch_us(p.ts) AS BIGINT)
             - CAST(epoch_us(c.ts) AS BIGINT)) AS gap_us
  FROM p JOIN c ON c.user_id = p.user_id
)
SELECT purchase_id, user_id, purchase_ts, click_id, click_ts
FROM pairs
QUALIFY row_number() OVER (PARTITION BY purchase_id
                           ORDER BY gap_us, click_ts, click_id) = 1
""",
    category="joins_nonequi",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join — the third direction of the family: for
    each purchase, the click by the same user with the SMALLEST
    absolute time distance, before or after (ties prefer the earlier,
    i.e. backward, click; same-timestamp ties prefer the smallest
    click_id — appended to the oracle's QUALIFY ORDER BY and mirrored
    by the min_by/max_by keys below, so the order is total even when
    two same-user clicks share a timestamp). The oracle is the
    quadratic per-user
    pair-join definition; the engine never builds pairs — one tagged
    union, ONE shuffle on user_id, and both a backward fill and a
    forward fill planned into a single Window node over that
    Exchange (the win_interpolate trick), then an arithmetic pick of
    the closer side. Inner semantics: purchases with no click drop."""
    e = table(spark, sf_dir, "events")
    tagged = e.where(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("tag"),
    )
    order = ["ts", "tag", "event_id"]
    w_b = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    click_struct = F.when(
        F.col("tag") == 0,
        F.struct(F.col("ts").alias("cts"), F.col("event_id").alias("cid")),
    )
    # Tie-break keys (null for non-click rows -> ignored by
    # min_by/max_by): backward wants the LATEST click then smallest
    # id (max over (cts, -cid)); forward wants the EARLIEST click
    # then smallest id (min over (cts, cid)).
    key_b = F.when(
        F.col("tag") == 0, F.struct(F.col("ts"), (-F.col("event_id")).alias("nid"))
    )
    key_f = F.when(F.col("tag") == 0, F.struct(F.col("ts"), F.col("event_id")))
    filled = tagged.select(
        "event_id",
        "user_id",
        "ts",
        "tag",
        F.max_by(click_struct, key_b).over(w_b).alias("bwd"),
        F.min_by(click_struct, key_f).over(w_f).alias("fwd"),
    )
    us = F.unix_micros(F.col("ts"))
    gap_b = us - F.unix_micros(F.col("bwd.cts"))
    gap_f = F.unix_micros(F.col("fwd.cts")) - us
    pick_bwd = F.col("fwd").isNull() | (
        F.col("bwd").isNotNull() & (gap_b <= gap_f)
    )
    best = F.when(pick_bwd, F.col("bwd")).otherwise(F.col("fwd"))
    return (
        filled.where(F.col("tag") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            best.alias("best"),
        )
        .where(F.col("best").isNotNull())
        .select(
            "purchase_id",
            "user_id",
            "purchase_ts",
            F.col("best.cid").alias("click_id"),
            F.col("best.cts").alias("click_ts"),
        )
    )


@query(
    "join_fuzzy_blocked",
    oracle="""
WITH n AS (
  SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts,
         string_split(p_name, ' ')[-1] AS block
  FROM part GROUP BY p_name
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM n a JOIN n b ON b.block = a.block AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 2
""",
    category="joins_nonequi",
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join with blocking — the entity-resolution kernel:
    candidate pairs come from an EQUI-join on a blocking key (here
    the trailing noun of the part name), then an exact Levenshtein
    verify keeps pairs within edit distance 2. Blocking is part of
    the operator contract (a pair that disagrees on the block key is
    not a candidate) — the standard recall/compute trade every
    record-linkage system makes, and what turns the quadratic
    all-pairs distance join into a per-block one. Dedup to distinct
    names first so the pair space is over entities, not rows; both
    engines run unit-cost Levenshtein, so distances are identical
    integers. Hot blocks are the skew risk at scale — same df-cap /
    salt remedies as the shared-gram join."""
    p = table(spark, sf_dir, "part")
    n = p.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts")).select(
        "p_name",
        "n_parts",
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("block"),
    )
    a = n.select(
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("n_parts_a"),
        "block",
    )
    b = n.select(
        F.col("p_name").alias("name_b"),
        F.col("n_parts").alias("n_parts_b"),
        F.col("block").alias("block_b"),
    )
    return (
        a.join(b, (F.col("block_b") == F.col("block")) & (F.col("name_a") < F.col("name_b")))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("long"))
        .where(F.col("edit_dist") <= 2)
        .select("name_a", "name_b", "edit_dist", "n_parts_a", "n_parts_b")
    )


@query(
    "join_asof_tolerance",
    oracle="""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
c AS (SELECT * FROM events WHERE event_type = 'click'),
matched AS (
  SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
         c.event_id AS click_id, c.ts AS click_ts
  FROM p ASOF JOIN c
    ON p.user_id = c.user_id AND c.ts <= p.ts
)
SELECT purchase_id, user_id, purchase_ts, click_id, click_ts
FROM matched
WHERE CAST(epoch_us(purchase_ts) AS BIGINT)
      - CAST(epoch_us(click_ts) AS BIGINT) <= 3600000000
""",
    category="joins_nonequi",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE bound (pandas merge_asof
    tolerance= semantics): the latest same-user click at-or-before
    each purchase, but only if it happened within the last hour —
    stale matches drop instead of attributing a purchase to a
    week-old click. Same single-shuffle tagged-union window kernel
    as join_asof with one exact integer-microsecond gap predicate on
    top; the oracle is DuckDB's ASOF JOIN + the same gap filter.
    Matching AT the tolerance boundary is kept (<=, like pandas)."""
    e = table(spark, sf_dir, "events")
    tagged = e.where(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("tag"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_struct = F.when(
        F.col("tag") == 0,
        F.struct(F.col("ts").alias("cts"), F.col("event_id").alias("cid")),
    )
    filled = tagged.select(
        "event_id",
        "user_id",
        "ts",
        "tag",
        F.last(click_struct, ignorenulls=True).over(w).alias("last_click"),
    )
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_click.cts"))
    return (
        filled.where(F.col("tag") == 1)
        .where(F.col("last_click").isNotNull())
        .where(gap_us <= 3600 * 1_000_000)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("last_click.cid").alias("click_id"),
            F.col("last_click.cts").alias("click_ts"),
        )
    )


# Spatial grid join parameters: synthetic integer points on a
# 1000x1000 plane derived from the keys (deterministic, no RNG);
# radius 120 < cell size 125, so the 3x3 neighborhood of a point's
# cell provably contains every candidate within radius.
_SP_CELL = 125
_SP_R2 = 120 * 120


@query(
    "join_spatial_grid",
    oracle=f"""
WITH a AS (
  SELECT c_custkey AS a_id,
         CAST(c_custkey * 37 % 1000 AS BIGINT) AS ax,
         CAST(c_custkey * 91 % 1000 AS BIGINT) AS ay
  FROM customer
),
b AS (
  SELECT s_suppkey AS b_id,
         CAST(s_suppkey * 53 % 1000 AS BIGINT) AS bx,
         CAST(s_suppkey * 71 % 1000 AS BIGINT) AS by_
  FROM supplier
)
SELECT b.b_id, a.a_id,
       (a.ax - b.bx) * (a.ax - b.bx) + (a.ay - b.by_) * (a.ay - b.by_) AS dist2
FROM b JOIN a
  ON (a.ax - b.bx) * (a.ax - b.bx) + (a.ay - b.by_) * (a.ay - b.by_) <= {_SP_R2}
""",
    category="joins",
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRID-BLOCKED spatial radius join — the geospatial analogue of
    LSH banding (and the pattern behind geohash/S2/H3 joins): points
    land in {_SP_CELL}-unit grid cells, each probe point expands to
    its 3x3 cell neighborhood (radius {{r}} < cell size, so the
    neighborhood provably covers the ball), candidates equi-join on
    cell id, and the exact integer squared distance verifies. The
    oracle states the quadratic textbook join; the engine never
    builds it — candidates are bounded by local density x 9, the
    spatial equivalent of the df-cap/banding bounds in the dedup
    tier. All arithmetic exact int64 on deterministic synthetic
    coordinates.

    At 100 TB: both sides shuffle once on cell id (or the build side
    bucket-partitions by cell at write time) — the standard
    billions-of-points proximity-join shape."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    a = c.select(
        F.col("c_custkey").alias("a_id"),
        (F.col("c_custkey") * 37 % 1000).cast("long").alias("ax"),
        (F.col("c_custkey") * 91 % 1000).cast("long").alias("ay"),
    )
    b = s.select(
        F.col("s_suppkey").alias("b_id"),
        (F.col("s_suppkey") * 53 % 1000).cast("long").alias("bx"),
        (F.col("s_suppkey") * 71 % 1000).cast("long").alias("by_"),
    )
    cell = lambda x, y: (F.floor(x / _SP_CELL) * 100 + F.floor(y / _SP_CELL)).cast(
        "long"
    )
    a_cells = a.withColumn("cell", cell(F.col("ax"), F.col("ay")))
    probe_cells = b.withColumn(
        "cell",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(-1), F.lit(1)),
                    lambda dx: F.transform(
                        F.sequence(F.lit(-1), F.lit(1)),
                        lambda dy: (
                            (F.floor(F.col("bx") / _SP_CELL) + dx) * 100
                            + (F.floor(F.col("by_") / _SP_CELL) + dy)
                        ).cast("long"),
                    ),
                )
            )
        ),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by_")
    ) * (F.col("ay") - F.col("by_"))
    # no dedup needed: each A point lives in exactly ONE cell, so a
    # (b, a) pair can match on at most one of B's 9 probed cells
    return (
        probe_cells.join(a_cells, "cell")
        .where(d2 <= _SP_R2)
        .select("b_id", "a_id", d2.alias("dist2"))
    )


@query(
    "join_band_bucketed",
    oracle="""
WITH o AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders WHERE o_totalprice < 30000
),
p AS (
  SELECT a.o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(ABS(a.cents - b.cents)) AS BIGINT) AS sum_gap_cents,
         CAST(MIN(ABS(a.cents - b.cents)) AS BIGINT) AS min_gap_cents
  FROM o a JOIN o b
    ON b.o_orderpriority = a.o_orderpriority
   AND a.o_orderkey < b.o_orderkey
   AND ABS(a.cents - b.cents) <= 10000
  GROUP BY a.o_orderpriority
)
SELECT o_orderpriority, n_pairs, sum_gap_cents, min_gap_cents
FROM p
""",
    category="joins",
)
def join_band_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band self-join (|price difference| <= $100 within priority,
    over the sub-$30k order slice) via
    the BUCKETED band-join strategy — the scale pattern for
    similarity-band joins that a naive theta join turns into a cross
    product: each row is assigned to bucket cents DIV 10000 and
    joined only against its own and the two ADJACENT buckets (any
    pair within the band shares or neighbors a bucket, so recall is
    exact), then the exact band predicate filters inside the bucket
    — candidate volume is O(rows x bucket occupancy), never O(n^2).
    The oracle states the naive quadratic semantics on the filtered
    slice; the Spark plan is the bucketed rewrite, equi-joined on
    (priority, bucket) — three shuffled equi-joins unioned, zero
    theta joins.  Dedup of pairs found in two shared buckets falls
    out of the a.key < b.key orientation plus distinct."""
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") < 30000)
        .select(
            "o_orderkey",
            "o_orderpriority",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
    )
    band = 10000
    a = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderkey").alias("ka"),
        F.col("cents").alias("ca"),
        F.expr(f"cents DIV {band}").alias("bucket"),
    )
    # each left row probes its own bucket and both neighbors
    probes = a.select(
        "pri", "ka", "ca", F.explode(
            F.array(
                F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1
            )
        ).alias("bucket")
    )
    b = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderkey").alias("kb"),
        F.col("cents").alias("cb"),
        F.expr(f"cents DIV {band}").alias("bucket"),
    )
    pairs = (
        probes.join(b, ["pri", "bucket"])
        .where(
            (F.col("ka") < F.col("kb"))
            & (F.abs(F.col("ca") - F.col("cb")) <= band)
        )
        .select("pri", "ka", "kb", F.abs(F.col("ca") - F.col("cb")).alias("gap"))
        .distinct()  # a pair can meet in two shared buckets
    )
    return pairs.groupBy(F.col("pri").alias("o_orderpriority")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("gap").cast("long").alias("sum_gap_cents"),
        F.min("gap").cast("long").alias("min_gap_cents"),
    )
