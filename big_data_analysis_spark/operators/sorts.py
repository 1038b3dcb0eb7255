"""Sorts, limits, top-K, row dedup, sampling (SURVEY.md §2.6).

Determinism discipline: every LIMIT is preceded by a total order
(unique tie-break key) — a bare limit is nondeterministic under
parallel scan and would flap the oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import api
from ..io import table
from ..registry import query


@query(
    "sort_multi",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM orders
ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey
LIMIT 100
""",
    category="sorts",
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key mixed-direction sort; LIMIT makes the sort visible
    to the order-insensitive comparator. Physical plan is
    TakeOrderedAndProject (per-partition top-N + merge), not a full
    sort — the scale-safe shape."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(
            F.col("o_orderpriority").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
        .limit(100)
    )


@query(
    "limit_n",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 50
""",
    category="sorts",
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First N by a unique key (deterministic limit)."""
    o = table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").limit(50)


@query(
    "topk_global",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 10
""",
    category="sorts",
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K: per-partition heap + single merge of K rows
    (TakeOrderedAndProject), O(K) driver memory at any scale."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(10)
    )


@query(
    "distinct_rows",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus, l_quantity FROM lineitem
""",
    category="sorts",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row dedup == group-by-all-columns (shuffles on the full row)."""
    l = table(spark, sf_dir, "lineitem")
    return l.select("l_returnflag", "l_linestatus", "l_quantity").distinct()


@query(
    "dedup_by_key",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) = 1
""",
    category="sorts",
)
def dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keep-one-per-key: window row_number over a total
    order, NOT dropDuplicates (which keeps an arbitrary row under
    parallelism). One shuffle on the key; state is one row per key."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey", "o_orderdate")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@query("sample_frac", oracle=None, category="sorts")
def sample_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (RNG differs across engines ->
    rows-only check; unit test asserts the fraction is ~10%)."""
    l = table(spark, sf_dir, "lineitem")
    return l.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "sample_per_group",
    oracle="""
SELECT lang, doc_id, n_chars
FROM documents
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 5
""",
    category="sorts",
)
def sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic K-per-group sampling: order each group by
    md5(doc_id) — a uniform, engine-agnostic pseudo-random permutation
    — and keep the first 5. The reproducible "sample 5 docs per
    language" primitive of a training-data pipeline: no RNG state, no
    seed drift, identical on any cluster layout (vs sample()/
    sampleBy(), whose partition-dependent RNG is not comparable
    across engines)."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("lang", "doc_id", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


@query("sample_stratified", oracle=None, category="sorts")
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-stratum fractions (sampleBy):
    over-sample rare languages, down-sample the dominant one — the
    rebalancing primitive for corpus mixing. Seeded but
    partition-RNG-dependent -> rows-only; unit test asserts the
    per-language fractions land near their targets."""
    d = table(spark, sf_dir, "documents")
    fractions = {"en": 0.2, "de": 0.8, "es": 0.8, "fr": 0.8, "zh": 0.8}
    return d.sampleBy("lang", fractions, seed=42).select("doc_id", "lang")


@query("topk_freq_items", oracle=None, category="sorts")
def topk_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters (freqItems, lossy-counting sketch):
    single-pass, constant memory — the 100 TB path for hot-token /
    hot-key detection before an exact confirm pass. Sketch contents
    are support-threshold approximations -> rows-only; the unit test
    confirms every truly-frequent value is present (the sketch
    guarantees no false negatives at the support level)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    freq = toks.stat.freqItems(["tok"], support=0.05)
    return freq.select(
        F.array_sort(F.col("tok_freqItems")).alias("frequent_tokens")
    )


@query(
    "sort_paginate",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 40
""",
    category="sorts",
)
def sort_paginate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-free pagination — page 3 of a 20-row listing via
    ``offset(40).limit(20)`` over a deterministic total order (the
    REST-API result-page idiom, first-class since Spark 3.4). Scale
    note: OFFSET still evaluates the global order up to
    offset+limit rows (a per-partition heap of 60, like top-k) — fine
    for UI pages, wrong for deep crawls, where the keyset predicate
    (WHERE key > last_seen) is the at-scale replacement."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(40)
        .limit(20)
    )


@query(
    "sort_paginate_keyset",
    oracle="""
WITH cur AS (
  SELECT o_totalprice AS cp, o_orderkey AS ck
  FROM orders ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 1 OFFSET 39
)
SELECT o.o_orderkey, o.o_totalprice
FROM orders o, cur
WHERE o.o_totalprice <= cur.cp
  AND (o.o_totalprice < cur.cp
       OR (o.o_totalprice = cur.cp AND o.o_orderkey > cur.ck))
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 20
""",
    category="sorts",
)
def sort_paginate_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYSET pagination — the at-scale replacement sort_paginate's
    docstring names: resume AFTER the client's cursor (the last row
    of the previous page, here the 40th row in the total order, so
    the result is bit-identical to sort_paginate's page 3) with a
    WHERE-tuple predicate instead of OFFSET.  The redundant
    ``o_totalprice <= cursor`` conjunct is deliberately separate
    from the strict tuple comparison: a single-column range
    predicate reaches the parquet scan (PushedFilters + row-group
    min/max skipping), so deep pages read only the tail of the sort
    key's value range instead of heap-scanning offset+limit rows —
    OFFSET-pagination cost grows with page depth, keyset cost
    doesn't.  The page itself is a TakeOrderedAndProject (per-
    partition heap of 20, no global sort).  The one-row cursor
    lookup stands in for the client-supplied token (bounded scalar
    staging); a real API keeps it from the previous response."""
    o = table(spark, sf_dir, "orders")
    cur = (
        o.select("o_totalprice", "o_orderkey")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(39)
        .limit(1)
        .collect()[0]
    )
    cp, ck = cur["o_totalprice"], cur["o_orderkey"]
    price, key = F.col("o_totalprice"), F.col("o_orderkey")
    return (
        o.select("o_orderkey", "o_totalprice")
        .where(
            (price <= F.lit(cp))
            & ((price < F.lit(cp)) | ((price == F.lit(cp)) & (key > F.lit(ck))))
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@query("sample_weighted", oracle=None, category="sorts")
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-ES) — 50 documents drawn with inclusion probability
    proportional to byte size (n_chars), via api.weighted_sample:
    deterministic Knuth-hash uniforms, key = ln(u)/weight, top-k by
    key.  The importance-sampling primitive of a data-mixing recipe
    where sample SIZE must be exact (Bernoulli sample_frac can't
    guarantee it) and heavier documents must be proportionally more
    likely.

    Rows-only (⊘): ln() is libm (1-ulp cross-engine, not bit-exact);
    tests/test_quality.py recomputes every key in NumPy (1e-12
    relative agreement), asserts the exact same 50-document sample
    set, determinism across runs, and a weight-bias sanity check
    (the sampled mean weight exceeds the corpus mean)."""
    d = table(spark, sf_dir, "documents")
    return api.weighted_sample(d, "doc_id", "n_chars", k=50)
