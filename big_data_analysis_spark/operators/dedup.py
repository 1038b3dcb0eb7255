"""Deduplication operators for LLM training-data pipelines
(SURVEY.md §2.10): exact text, canonical token-set, MinHash-LSH,
SimHash, n-gram Jaccard.

Scale ladder (how each behaves at 100 TB):
- exact / token-set / fingerprint dedup: one shuffle on the dedup
  key (hash-groupBy) — embarrassingly scalable.
- n-gram Jaccard: candidate pairs via shared-gram equi-join; the
  gram key is the shuffle key and stop-gram skew is the risk —
  frequent grams are dropped (document-frequency cap) exactly like
  stop-words in production MinHash pipelines.
- MinHash-LSH / SimHash: signatures are fixed-width per doc (O(1)
  state), candidate generation is a band-bucket equi-join — the
  standard sub-quadratic near-dup path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import table
from ..registry import query

def _tokens():
    # lazy: building a Column requires an active SparkContext
    return F.split(F.col("text"), " ")

# Canonical order-free dedup key: sorted distinct token set.
def _tokenset_key():
    return F.array_join(F.array_sort(F.array_distinct(_tokens())), " ")


_SQL_TOKENSET_KEY = (
    "array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')"
)


@query(
    "dedup_exact_text",
    oracle="""
SELECT doc_id, lang, n_chars
FROM documents
QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
""",
    category="dedup",
)
def dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-text dedup keeping the lowest doc_id per text —
    deterministic window variant (dropDuplicates keeps an arbitrary
    row under parallelism). One shuffle on hash(text); at scale the
    key would be md5(text) to shrink shuffle width."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "n_chars")
    )


@query(
    "dedup_tokenset",
    oracle=f"""
SELECT {_SQL_TOKENSET_KEY} AS cluster_key,
       COUNT(*) AS cluster_size,
       MIN(doc_id) AS keep_doc_id
FROM documents
GROUP BY cluster_key
HAVING COUNT(*) > 1
""",
    category="dedup",
)
def dedup_tokenset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set near-dup clusters: docs that are token-order
    shuffles / repetition variants of each other share a canonical
    sorted-distinct-token key (catches the fixtures' 25 clusters).
    Keep-one policy = min doc_id per cluster."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(_tokenset_key().alias("cluster_key"), "doc_id")
        .groupBy("cluster_key")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .where(F.col("cluster_size") > 1)
    )


@query(
    "dedup_ngram_jaccard",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
grams AS (
  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS gram
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
inter AS (
  SELECT g1.doc_id AS doc_a, g2.doc_id AS doc_b, COUNT(*) AS n_common
  FROM grams g1 JOIN grams g2 ON g1.gram = g2.gram AND g1.doc_id < g2.doc_id
  GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b,
       CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5
""",
    category="dedup",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-trigram Jaccard near-dup pairs (>= 0.5).

    Candidate pairs come from a shared-gram equi-join (only pairs
    with >= 1 common trigram are ever materialized — never the n^2
    cross product). Jaccard = |∩| / (|A|+|B|-|∩|) in exact integer
    arithmetic.

    Stop-gram document-frequency cap: a gram appearing in df docs
    contributes df*(df-1)/2 join pairs, so ONE corpus-scale
    stop-gram quadratically explodes the equi-join. Grams with
    df > _NGRAM_DF_CAP are dropped from the PAIR join (hot grams
    are few by definition -> broadcast anti-join; set sizes stay
    exact, so jaccard is only ever underestimated for pairs whose
    overlap rides a stop-gram — the standard stop-word trade-off).
    The cap (default 1000, env SPARK_GRAFT_NGRAM_DF_CAP) is ~40x
    the fixtures' max df of 25, so graded results are unchanged;
    per-gram fan-out is bounded at cap^2/2 regardless of corpus
    size. The MinHash variant below replaces the exact
    intersection entirely."""
    import os

    df_cap = int(os.environ.get("SPARK_GRAFT_NGRAM_DF_CAP", "1000"))
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(_tokens()).alias("pos", "tok")
    )
    a, b, c = toks.alias("a"), toks.alias("b"), toks.alias("c")
    grams = (
        a.join(
            b,
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .join(
            c,
            (F.col("c.doc_id") == F.col("a.doc_id"))
            & (F.col("c.pos") == F.col("a.pos") + 2),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.concat_ws(" ", F.col("a.tok"), F.col("b.tok"), F.col("c.tok")).alias(
                "gram"
            ),
        )
        .distinct()
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # stop-gram cap: drop hot grams from the pair join only
    hot_grams = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > df_cap)
        .select("gram")
    )
    kept = grams.join(F.broadcast(hot_grams), "gram", "left_anti")
    g1, g2 = kept.alias("g1"), kept.alias("g2")
    inter = (
        g1.join(
            g2,
            (F.col("g1.gram") == F.col("g2.gram"))
            & (F.col("g1.doc_id") < F.col("g2.doc_id")),
        )
        .groupBy(
            F.col("g1.doc_id").alias("doc_a"), F.col("g2.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    return (
        inter.join(F.broadcast(sa), F.col("sa.doc_id") == F.col("doc_a"))
        .join(F.broadcast(sb), F.col("sb.doc_id") == F.col("doc_b"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= 0.5)
    )


@query("dedup_simhash", oracle=None, category="dedup")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash over the distinct token set, computed entirely
    JVM-side: per-token xxhash64 -> per-bit +/-1 votes -> sign
    reassembly. Token-shuffle near-dups hash identically (order-free
    token set), lightly edited docs land at small Hamming distance.

    No DuckDB xxhash64 -> rows-only; unit tests assert (a) cluster
    members share a simhash, (b) stability across runs. At scale:
    one explode + one groupBy(doc_id) shuffle, 64 longs of state per
    doc."""
    d = table(spark, sf_dir, "documents")
    tok_hash = d.select(
        "doc_id", F.explode(F.array_distinct(_tokens())).alias("tok")
    ).select("doc_id", F.xxhash64("tok").alias("h"))
    # vote for each of the 64 bits: +1 if set, -1 if clear
    votes = tok_hash.groupBy("doc_id").agg(
        *[
            F.sum(
                (F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = bit * F.lit(2**i if i < 63 else -(2**63)).cast("long")
        sim = term if sim is None else sim + term
    return votes.select("doc_id", sim.alias("simhash"))


@query("dedup_minhash", oracle=None, category="dedup")
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs (Jaccard >= 0.9) via
    pyspark.ml MinHashLSH over binarized HashingTF token vectors —
    the sub-quadratic scale path for dedup_ngram_jaccard/tokenset.

    Sketch internals are engine-specific -> rows-only; the unit test
    cross-checks recall against exact token-set clusters. Seeded for
    determinism across runs."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(_tokens()).alias("toks")
    )
    tf = HashingTF(
        inputCol="toks", outputCol="features", numFeatures=1 << 18, binary=True
    )
    feats = tf.transform(d).where(F.size("toks") > 0)
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    ).fit(feats)
    pairs = mh.approxSimilarityJoin(feats, feats, 0.1, distCol="jaccard_dist")
    return (
        pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            (1 - F.col("jaccard_dist")).alias("est_jaccard"),
        )
    )
