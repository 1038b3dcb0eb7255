"""Text-analysis operators for LLM data pipelines (SURVEY.md §2.10):
tokenization, term frequencies, TF-IDF, corpus stats, language ID,
quality scoring, BPE-ish token counting, document fingerprinting.

All operators are pure DataFrame algebra (explode/groupBy/higher-order
functions) — no Python in the row path. At 100 TB the explode-based
ops shuffle on (token) or (doc_id); both are high-cardinality keys
with bounded skew (vocab-frequency skew is absorbed by partial
aggregation, since the map-side combiner collapses each token to one
row per task before the shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import query

def _tokens():
    # lazy: building a Column requires an active SparkContext
    return F.split(F.col("text"), " ")

# Deterministic marker-word sets for the language-ID heuristic (drawn
# from the fixture vocabulary; real deployments would plug frequency
# tables per language here — the *operator shape* is the deliverable).
_LANG_MARKERS = {
    "en": ["the", "a", "table", "query"],
    "de": ["data", "hash", "window"],
    "es": ["row", "value", "vector"],
    "fr": ["join", "merge", "sort"],
    "zh": ["spark", "stream", "batch"],
}


@query(
    "text_tokenize",
    oracle="""
SELECT tok AS token, COUNT(*) AS total_count, COUNT(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
GROUP BY tok
""",
    category="text",
)
def text_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token counts: doc -> token rows -> per-token totals."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("total_count"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


@query(
    "text_termfreq",
    oracle="""
SELECT doc_id, tok AS token, COUNT(*) AS tf
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
GROUP BY doc_id, tok
""",
    category="text",
)
def text_termfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document term frequencies."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(_tokens()).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


@query(
    "text_tfidf",
    oracle="""
WITH tf AS (
  SELECT doc_id, tok AS token, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok
),
df AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT tf.doc_id, tf.token, tf.tf, df.df,
       tf.tf * ((CAST(n.n_docs AS DOUBLE) + 1.0) / (df.df + 1.0)) AS tfidf
FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
""",
    category="text",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF per (doc, term) with add-one-smoothed *linear* inverse
    document frequency: tf x (N+1)/(df+1) — exact int-ratio double
    arithmetic, bit-identical across engines. The classic
    logarithmically-damped variant is text_tfidf_ln (rows-only:
    libm ln() differs by 1 ulp between JVM and DuckDB).

    The df table and the one-row corpus count are broadcast — the big
    side streams once."""
    d = table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(_tokens()).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            (
                F.col("tf")
                * ((F.col("n_docs").cast("double") + 1.0) / (F.col("df") + 1.0))
            ).alias("tfidf"),
        )
    )


@query("text_tfidf_ln", oracle=None, category="text")
def text_tfidf_ln(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic TF-IDF (tf x ln(N/df)). Rows-only: transcendental
    libm results differ by 1 ulp across engines; a unit test asserts
    1e-12 relative closeness to a NumPy reference."""
    d = table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(_tokens()).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            (
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))
            ).alias("tfidf"),
        )
    )


@query(
    "text_stats",
    oracle="""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY lang
""",
    category="text",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats (exact integer sums -> double avg)."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum(F.size(_tokens())).alias("total_tokens"),
    )


def _marker_score(lang: str) -> Column:
    lits = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
    return F.size(F.array_intersect(F.array_distinct(_tokens()), lits))


def _sql_marker_score(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return f"len(list_intersect(list_distinct(string_split(text,' ')), [{words}]))"


_LANG_ORDER = ["de", "en", "es", "fr", "zh"]  # tie-break: alphabetical


@query(
    "text_langid",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
         {", ".join(f"{_sql_marker_score(lg)} AS s_{lg}" for lg in _LANG_ORDER)}
  FROM documents
)
SELECT doc_id, lang AS actual_lang,
       CASE GREATEST(s_de, s_en, s_es, s_fr, s_zh)
            WHEN s_de THEN 'de' WHEN s_en THEN 'en' WHEN s_es THEN 'es'
            WHEN s_fr THEN 'fr' ELSE 'zh' END AS predicted_lang,
       CAST(GREATEST(s_de, s_en, s_es, s_fr, s_zh) AS INT) AS best_score
FROM scored
""",
    category="text",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic: score each language's
    marker set against the doc's distinct tokens, argmax with
    deterministic alphabetical tie-break (CASE picks the first
    language whose score equals the max)."""
    d = table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        *[_marker_score(lg).alias(f"s_{lg}") for lg in _LANG_ORDER],
    )
    best = F.greatest(*[F.col(f"s_{lg}") for lg in _LANG_ORDER])
    pred = F.when(F.col("s_de") == best, "de")
    for lg in _LANG_ORDER[1:-1]:
        pred = pred.when(F.col(f"s_{lg}") == best, lg)
    pred = pred.otherwise("zh")
    return scored.select(
        "doc_id",
        "actual_lang",
        pred.alias("predicted_lang"),
        best.alias("best_score"),
    )


@query(
    "text_quality",
    oracle="""
WITH t AS (
  SELECT doc_id, n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_unique,
         len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS n_stop
  FROM documents
)
SELECT doc_id, n_chars, n_tokens,
       CAST(n_unique AS DOUBLE) / n_tokens AS unique_ratio,
       CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
       CAST(n_chars AS DOUBLE) / n_tokens AS avg_token_len,
       (CAST(n_unique AS DOUBLE) / n_tokens) * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) AS quality_score
FROM t
""",
    category="text",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic doc-quality scoring: lexical diversity x (1 -
    stopword share). All ratios are int/int double divisions —
    bit-identical across engines."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "n_chars",
        F.size(_tokens()).alias("n_tokens"),
        F.size(F.array_distinct(_tokens())).alias("n_unique"),
        F.size(F.filter(_tokens(), lambda x: x.isin("the", "a"))).alias("n_stop"),
    )
    uq = F.col("n_unique").cast("double") / F.col("n_tokens")
    sw = F.col("n_stop").cast("double") / F.col("n_tokens")
    return t.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        uq.alias("unique_ratio"),
        sw.alias("stopword_ratio"),
        (F.col("n_chars").cast("double") / F.col("n_tokens")).alias("avg_token_len"),
        (uq * (F.lit(1.0) - sw)).alias("quality_score"),
    )


@query(
    "text_token_count_bpe",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
       CAST(ceil(CAST(n_chars AS DOUBLE) / 4) AS BIGINT) AS n_chars_div4
FROM documents
""",
    category="text",
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, a BPE-ish regex
    segmentation (letters/digits/other runs), and the chars/4 rule of
    thumb used for LLM budget estimates."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_tokens()).alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
        ).alias("n_bpe_tokens"),
        F.ceil(F.col("n_chars").cast("double") / 4).alias("n_chars_div4"),
    )


_FP_MOD = 1_000_000_007
_FP_BASE = 131


@query(
    "text_fingerprint",
    oracle=f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ' '),
                          t -> CAST(31 * length(t) + ascii(t) AS BIGINT))),
         (acc, x) -> (acc * {_FP_BASE} + x) % {_FP_MOD}) AS fingerprint,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(list_sort(list_distinct(string_split(text, ' '))),
                          t -> CAST(31 * length(t) + ascii(t) AS BIGINT))),
         (acc, x) -> (acc * {_FP_BASE} + x) % {_FP_MOD}) AS tokenset_fingerprint
FROM documents
""",
    category="text",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial fingerprints (mod-prime Rabin-Karp style):
    order-sensitive over the token stream, plus an order-free variant
    over the sorted distinct token set (equal for token-shuffled
    near-dups — a cheap dedup key). Integer arithmetic stays under
    2^63 in both engines."""
    d = table(spark, sf_dir, "documents")

    def tval(t: Column) -> Column:
        return (F.lit(31) * F.length(t) + F.ascii(t)).cast("long")

    def fold(arr: Column) -> Column:
        return F.aggregate(
            arr,
            F.lit(0).cast("long"),
            lambda acc, x: (acc * _FP_BASE + tval(x)) % _FP_MOD,
        )

    return d.select(
        "doc_id",
        fold(_tokens()).alias("fingerprint"),
        fold(F.array_sort(F.array_distinct(_tokens()))).alias("tokenset_fingerprint"),
    )
