"""Scalar function families (SURVEY.md §2.8) — one query per family
exercising several functions at once, all JVM-side built-ins (no
Python in the row path; these run inside whole-stage codegen).

Cross-engine gotchas baked into the choices below:
- day-of-week numbering differs (Spark weekday()=0-Mon ↔ DuckDB
  isodow-1); months_between has no DuckDB twin (excluded).
- double->int CAST truncates in Spark but ROUNDS in DuckDB — integer
  conversions go through floor/ceil/explicit decimal instead.
- round() on a 2-decimal double at 1 decimal sits exactly on the
  half-up/half-even fault line; round targets here are irrational
  (sqrt outputs), far from midpoints.
- xxhash64/crc32 have no DuckDB equivalent -> separate rows-only
  query (fn_hash_native).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import register_views, table
from ..registry import query
from ..session import harden_session


@query(
    "fn_string",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       trim(concat(' ', p_name, ' ')) AS name_trimmed,
       substring(p_name, 1, 4) AS name_prefix,
       concat(p_name, '/', p_brand) AS name_brand,
       length(p_name) AS name_len,
       lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
       replace(p_name, ' ', '_') AS name_snake,
       string_split(p_name, ' ')[1] AS first_word,
       instr(p_name, 'widget') AS widget_pos
FROM part
""",
    category="functions",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, trim, substring, concat, length, pad,
    replace, split+index, instr."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.concat(F.col("p_name"), F.lit("/"), F.col("p_brand")).alias("name_brand"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.instr(F.col("p_name"), "widget").alias("widget_pos"),
    )


@query(
    "fn_regexp",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS brand_num,
       regexp_replace(p_name, '[aeiou]', '*', 'g') AS name_devoweled,
       regexp_matches(p_name, '^(cold|small) ') AS is_cold_or_small
FROM part
""",
    category="functions",
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp family (POSIX-simple patterns so Java regex and DuckDB
    RE2 agree). NOTE: Spark regexp_replace is global by default;
    DuckDB needs the 'g' flag."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract(F.col("p_brand"), "Brand#([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "*").alias("name_devoweled"),
        F.col("p_name").rlike("^(cold|small) ").alias("is_cold_or_small"),
    )


@query(
    "fn_date",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       CAST(day(o_orderdate) AS INT) AS order_day,
       CAST(isodow(o_orderdate) - 1 AS INT) AS order_weekday,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS TIMESTAMP) AS plus3m,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_y2k
FROM orders
""",
    category="functions",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family: parts, weekday (Spark weekday()=Mon0 == DuckDB
    isodow-1), truncation, month arithmetic, last_day, datediff."""
    o = table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).alias("order_year"),
        F.month(od).alias("order_month"),
        F.dayofmonth(od).alias("order_day"),
        F.weekday(od).alias("order_weekday"),
        F.date_trunc("month", od).alias("month_start"),
        F.add_months(od.cast("date"), 3).cast("timestamp").alias("plus3m"),
        F.last_day(od.cast("date")).cast("timestamp").alias("month_end"),
        F.datediff(F.lit("2000-01-01").cast("date"), od.cast("date")).alias(
            "days_to_y2k"
        ),
    )


@query(
    "fn_timestamp",
    oracle="""
SELECT event_id,
       CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date,
       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
       CAST(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)) AS TIMESTAMP) AS ts_rounded,
       make_timestamp(2024, 6, 1, 12, 0, 0) AS fixed_ts,
       CAST(hour(ts) AS INT) AS event_hour,
       CAST(minute(ts) AS INT) AS event_minute
FROM events
""",
    category="functions",
)
def fn_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp family: date cast, epoch seconds (floor == Spark's
    unix_timestamp truncation for post-1970 data), epoch round-trip,
    make_timestamp, clock parts."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.col("ts").cast("date").cast("timestamp").alias("event_date"),
        F.unix_timestamp("ts").alias("epoch_s"),
        F.from_unixtime(F.unix_timestamp("ts")).cast("timestamp").alias("ts_rounded"),
        F.make_timestamp(
            F.lit(2024), F.lit(6), F.lit(1), F.lit(12), F.lit(0), F.lit(0)
        ).alias("fixed_ts"),
        F.hour("ts").alias("event_hour"),
        F.minute("ts").alias("event_minute"),
    )


@query(
    "fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_quantity - 25) AS qty_dev,
       CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
       CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
       sqrt(l_extendedprice) AS price_sqrt,
       round(sqrt(l_quantity), 3) AS qty_sqrt_3,
       CAST(sign(l_quantity - 25) AS DOUBLE) AS qty_sign,
       mod(CAST(l_quantity AS BIGINT), 7) AS qty_mod7,
       greatest(l_quantity, l_discount * 100) AS gr,
       least(l_quantity, l_discount * 100) AS ls,
       power(2, l_linenumber) AS pow2
FROM lineitem
""",
    category="functions",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. sqrt is IEEE-correctly-rounded (safe cross-engine
    on any double); round targets are irrational so no midpoint
    ambiguity; pmod on exact integers; exp/ln live in fn_math_libm
    (rows-only) because libm implementations may differ by 1 ulp."""
    l = table(spark, sf_dir, "lineitem")
    q, ep, d = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(q - 25).alias("qty_dev"),
        F.ceil(ep / 1000).alias("price_k_ceil"),
        F.floor(ep / 1000).alias("price_k_floor"),
        F.sqrt(ep).alias("price_sqrt"),
        F.round(F.sqrt(q), 3).alias("qty_sqrt_3"),
        F.signum(q - 25).alias("qty_sign"),
        F.pmod(q.cast("bigint"), F.lit(7)).alias("qty_mod7"),
        F.greatest(q, d * 100).alias("gr"),
        F.least(q, d * 100).alias("ls"),
        F.pow(F.lit(2), F.col("l_linenumber")).alias("pow2"),
    )


@query("fn_math_libm", oracle=None, category="functions")
def fn_math_libm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exp/ln/log10 — transcendental libm functions are not
    guaranteed correctly-rounded, so cross-engine bits may differ by
    1 ulp: rows-only check + unit test asserting 1e-12 closeness."""
    l = table(spark, sf_dir, "lineitem")
    ep = F.col("l_extendedprice")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.exp(F.col("l_discount")).alias("disc_exp"),
        F.log(ep).alias("price_ln"),
        F.log10(ep).alias("price_log10"),
    )


@query(
    "fn_conditional",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'large'
            WHEN o_totalprice > 100000 THEN 'medium'
            ELSE 'small' END AS size_class,
       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
       nullif(o_orderstatus, 'F') AS status_nullable,
       CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END AS pending_value
FROM orders
""",
    category="functions",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif chains."""
    o = table(spark, sf_dir, "orders")
    tp, st = F.col("o_totalprice"), F.col("o_orderstatus")
    return o.select(
        "o_orderkey",
        F.when(tp > 300000, "large")
        .when(tp > 100000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif(st, F.lit("O")), F.lit("OPEN")).alias("status_or_open"),
        F.nullif(st, F.lit("F")).alias("status_nullable"),
        F.when(st == "P", tp).otherwise(F.lit(0.0)).alias("pending_value"),
    )


@query(
    "fn_cast",
    oracle="""
SELECT c_custkey,
       CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal_decimal_roundtrip,
       CAST(c_acctbal AS VARCHAR) AS bal_str,
       CAST(CAST(c_custkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
       CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS key_from_name,
       CAST(floor(c_acctbal) AS BIGINT) AS bal_floor_int
FROM customer
""",
    category="functions",
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast family. Integer conversion goes through floor() — a raw
    double->int CAST truncates in Spark but rounds in DuckDB.
    2-decimal doubles print identically in both engines."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_acctbal").cast("decimal(12,2)").cast("double").alias(
            "bal_decimal_roundtrip"
        ),
        F.col("c_acctbal").cast("string").alias("bal_str"),
        F.col("c_custkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.regexp_extract(F.col("c_name"), "([0-9]+)", 1)
        .cast("bigint")
        .alias("key_from_name"),
        F.floor(F.col("c_acctbal")).cast("bigint").alias("bal_floor_int"),
    )


@query(
    "fn_array",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       list_contains(string_split(text, ' '), 'spark') AS has_spark,
       len(list_distinct(string_split(text, ' '))) AS n_unique,
       array_to_string(string_split(text, ' ')[1:3], ' ') AS first3,
       array_to_string(list_sort(list_distinct(string_split(substring(text, 1, 40), ' '))), ' ') AS head_tokens
FROM documents
""",
    category="functions",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: split, size, contains, distinct, slice, join,
    sorted arrays (array cells sorted for deterministic hashing)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.array_join(
            F.array_sort(
                F.array_distinct(F.split(F.substring(F.col("text"), 1, 40), " "))
            ),
            " ",
        ).alias("head_tokens"),
    )


@query(
    "fn_higher_order",
    oracle="""
SELECT doc_id,
       array_to_string(list_transform(string_split(text, ' ')[1:5], x -> CAST(length(x) AS VARCHAR)), ',') AS first5_lens,
       len(list_filter(string_split(text, ' '), x -> length(x) > 5)) AS n_long_tokens,
       CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS BIGINT) AS total_chars
FROM documents
""",
    category="functions",
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambdas on arrays: transform / filter / aggregate
    (integer outputs — exact in both engines)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.array_join(
            F.transform(F.slice(toks, 1, 5), lambda x: F.length(x).cast("string")),
            ",",
        ).alias("first5_lens"),
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).alias("n_long_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("total_chars"),
    )


@query(
    "fn_map",
    oracle="""
SELECT event_id,
       map_extract(MAP(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)]), 'type')[1] AS type_val,
       array_to_string(list_sort(map_keys(MAP(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)]))), ',') AS keys_sorted,
       cardinality(MAP(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)])) AS map_size,
       map_extract(MAP([string_split(concat('type:', event_type), ':')[1]],
                       [string_split(concat('type:', event_type), ':')[2]]), 'type')[1] AS strmap_val
FROM events
""",
    category="functions",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: construction, element access, sorted keys, size
    (scalar/array outputs only — raw map cells hash differently
    across engines)."""
    e = table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    strmap = F.str_to_map(
        F.concat(F.lit("type:"), F.col("event_type")), F.lit(","), F.lit(":")
    )
    return e.select(
        "event_id",
        F.element_at(m, "type").alias("type_val"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.size(m).alias("map_size"),
        F.element_at(strmap, "type").alias("strmap_val"),
    )


@query(
    "fn_json",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
       CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing_val
FROM events
""",
    category="functions",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family over the props column: path extraction (string +
    int + missing->NULL), typed from_json struct access."""
    e = table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k BIGINT, missing BIGINT")
    return e.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").alias("k_str"),
        parsed["k"].alias("k_int"),
        parsed["missing"].alias("missing_val"),
    )


@query(
    "fn_hash",
    oracle="""
SELECT c_custkey,
       md5(c_name) AS name_md5,
       sha256(c_name) AS name_sha256
FROM customer
""",
    category="functions",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digests that match across engines (md5, sha256
    hex strings)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name")).alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
    )


@query("fn_hash_native", oracle=None, category="functions")
def fn_hash_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native hashes (xxhash64 / crc32 / murmur3) — no DuckDB
    equivalent, rows-only; unit test asserts stability across runs
    (these seed shuffle partitioners and dedup keys at scale)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.xxhash64(F.col("c_name")).alias("name_xxh64"),
        F.crc32(F.col("c_name")).alias("name_crc32"),
        F.hash(F.col("c_name")).alias("name_murmur3"),
    )


@query(
    "fn_string_distance",
    oracle="""
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       levenshtein(a.p_name, b.p_name) AS edit_dist,
       CAST(length(a.p_name) = length(b.p_name) AS BOOLEAN) AS same_len
FROM part a
JOIN part b ON b.p_partkey = a.p_partkey + 1
""",
    category="functions",
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-distance family: Levenshtein edit distance between
    consecutive part names — the fuzzy-matching primitive for
    entity-resolution/dedup pipelines (both engines implement the
    same Wagner-Fischer distance on unicode code points)."""
    p = table(spark, sf_dir, "part")
    a = p.select(F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"))
    b = p.select(F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"))
    return (
        a.join(b, F.col("key_b") == F.col("key_a") + 1)
        .select(
            "key_a",
            "key_b",
            F.levenshtein(F.col("name_a"), F.col("name_b")).alias("edit_dist"),
            (F.length("name_a") == F.length("name_b")).alias("same_len"),
        )
    )


@query(
    "fn_struct_argmax",
    oracle="""
SELECT o_custkey, o_totalprice AS best_price, o_orderkey AS best_orderkey
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey DESC) = 1
""",
    category="functions",
)
def fn_struct_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct-typed argmax: MAX over a (price, orderkey) struct is
    lexicographic, so one hash aggregate returns each customer's
    priciest order WITH its key — no window, no self-join, one
    shuffle carrying a single struct per group (the idiomatic
    Spark argmax; ties break toward the higher orderkey, mirrored
    by the oracle's window ordering)."""
    o = table(spark, sf_dir, "orders")
    best = F.max(F.struct(F.col("o_totalprice"), F.col("o_orderkey")))
    return o.groupBy("o_custkey").agg(
        best.getField("o_totalprice").alias("best_price"),
        best.getField("o_orderkey").alias("best_orderkey"),
    )


@query(
    "fn_bitwise",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_orderkey & 255 AS and_mask,
       l_orderkey | 4096 AS or_flag,
       xor(l_orderkey, l_partkey) AS xor_keys,
       ~l_orderkey AS not_key,
       l_linenumber << 4 AS shl,
       l_orderkey >> 2 AS shr,
       CAST(bit_count(l_orderkey) AS INT) AS popcount
FROM lineitem
WHERE l_orderkey % 50 = 0
""",
    category="functions",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function family over 64-bit keys: AND/OR/XOR/NOT,
    shifts, popcount — the partition-mask / bitmap-index primitives.
    All primitive long ops inside whole-stage codegen; both engines
    use two's-complement BIGINT semantics, so results are bit-exact
    by construction."""
    li = table(spark, sf_dir, "lineitem")
    k, ln, pk = F.col("l_orderkey"), F.col("l_linenumber"), F.col("l_partkey")
    return li.where(k % 50 == 0).select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(F.lit(255)).alias("and_mask"),
        k.bitwiseOR(F.lit(4096)).alias("or_flag"),
        k.bitwiseXOR(pk).alias("xor_keys"),
        F.bitwise_not(k).alias("not_key"),
        F.shiftleft(ln, 4).alias("shl"),
        F.shiftright(k, 2).alias("shr"),
        F.bit_count(k).alias("popcount"),
    )


@query(
    "fn_url",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://host' || (doc_id % 7) || '.example.com/corpus/' || lang ||
         '/doc?id=' || doc_id || '&src=' || source AS url
  FROM documents
)
SELECT doc_id, url,
       regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
       regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query,
       regexp_extract(url, '[?&]id=([^&]*)', 1) AS id_param
FROM u
""",
    category="functions",
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing family over synthesized crawl URLs: scheme, host,
    path, query string, single query parameter — `parse_url` is the
    native Spark primitive (shown against a regexp oracle, since
    DuckDB has no URL parser; the synthesized URLs avoid the
    encoding edge cases where the two approaches diverge). The
    provenance-extraction step of every crawl-corpus pipeline."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://host"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com/corpus/"),
        F.col("lang"),
        F.lit("/doc?id="),
        F.col("doc_id").cast("string"),
        F.lit("&src="),
        F.col("source"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.lower(F.parse_url(F.col("url"), F.lit("PROTOCOL"))).alias("scheme"),
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("id")).alias("id_param"),
    )


@query(
    "fn_variant",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_long,
       json_extract_string(props, '$.k') AS k_str,
       COALESCE(json_valid(props), FALSE) AS is_valid
FROM events
WHERE event_id % 20 = 0
""",
    category="functions",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion of semi-structured JSON:
    parse_json() shreds the props string into the binary Variant
    encoding once, then variant_get() extracts typed paths without
    re-parsing — the modern replacement for repeated
    get_json_object string scans (one parse, many typed reads;
    columnar-shreddable at rest in parquet). Oracle: DuckDB JSON
    extraction of the same paths."""
    ev = table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return ev.where(F.col("event_id") % 20 == 0).select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_long"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.col("props").try_cast("variant").isNotNull().alias("is_valid"),
    )


@query(
    "fn_explode_outer",
    oracle="""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> length(t) >= 7) AS longs
  FROM documents WHERE doc_id % 25 = 0
)
SELECT d.doc_id, t.tok AS long_token
FROM d LEFT JOIN (
  SELECT doc_id, unnest(longs) AS tok FROM d
) t USING (doc_id)
""",
    category="functions",
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows whose array is EMPTY survive with a NULL
    element instead of disappearing — the difference between "this
    doc has no long tokens" being a fact in the output vs silently
    dropped (plain explode loses the row, the LEFT-JOIN-unnest
    equivalent keeps it). Filter derives genuinely empty arrays from
    the corpus."""
    d = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 25 == 0)
        .select(
            "doc_id",
            F.filter(
                F.split(F.col("text"), " "), lambda t: F.length(t) >= 7
            ).alias("longs"),
        )
    )
    return d.select("doc_id", F.explode_outer("longs").alias("long_token"))


@query(
    "fn_try_arith",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice / NULLIF(l_quantity - 25, 0) AS price_per_off25,
       CASE WHEN l_orderkey > 7 THEN NULL
            ELSE CAST(CAST(9223372036854775800 AS HUGEINT) + l_orderkey AS BIGINT)
       END AS near_max_plus,
       TRY_CAST(CAST(l_partkey AS VARCHAR) AS BIGINT) AS parsed_ok,
       TRY_CAST('x' || CAST(l_partkey AS VARCHAR) AS BIGINT) AS parsed_bad
FROM lineitem
WHERE l_orderkey % 50 = 0
""",
    category="functions",
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic (Spark try_* family): try_divide turns
    division by zero into NULL instead of an ANSI error (real zeros
    manufactured via quantity-25), try_add turns 64-bit overflow
    into NULL (manufactured near Long.MAX), try_to_number returns
    NULL on unparseable numerics — the ingest-hardening functions a
    pipeline uses instead of wrapping every expression in CASE.
    DuckDB twins: NULLIF denominator, HUGEINT-widened guarded add,
    TRY_CAST. All pure map-stage codegen. The try_to_number results
    are cast to BIGINT on both twins — a DECIMAL final column hashes
    unequal across engines even for equal values (driver comparator
    renders Spark Decimal objects vs DuckDB float64)."""
    l = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 50 == 0)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - 25
        ).alias("price_per_off25"),
        F.try_add(
            F.lit(9223372036854775800).cast("long"),
            F.col("l_orderkey").cast("long"),
        ).alias("near_max_plus"),
        F.try_to_number(F.col("l_partkey").cast("string"), F.lit("99999999"))
        .cast("long")
        .alias("parsed_ok"),
        F.try_to_number(
            F.concat(F.lit("x"), F.col("l_partkey").cast("string")),
            F.lit("99999999"),
        )
        .cast("long")
        .alias("parsed_bad"),
    )


@query(
    "fn_timezone",
    oracle="""
SELECT event_id, ts,
       timezone('America/New_York', ts::TIMESTAMPTZ) AS ny_local,
       timezone('Asia/Kolkata', ts::TIMESTAMPTZ) AS kolkata_local,
       TRUE AS roundtrip_ok
FROM events
WHERE event_id % 10 = 0
""",
    category="functions",
)
def fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-zone timestamp conversion (from_utc_timestamp /
    to_utc_timestamp) — the wall-clock arithmetic the UTC-pinned
    session otherwise never exercises: a DST-observing zone
    (America/New_York, offset varies -4/-5 by date) and a half-hour
    zone (Asia/Kolkata, +5:30). Both engines resolve zones from the
    IANA tzdb, so the shifted wall times are hash-exact; the
    roundtrip_ok column proves to_utc_timestamp inverts
    from_utc_timestamp on every row rather than trusting it.
    DuckDB twin feeds TIMESTAMPTZ so its two-arg timezone() runs the
    same UTC-instant -> zone-local direction. Pure map stage."""
    ev = table(spark, sf_dir, "events").where(F.col("event_id") % 10 == 0)
    ny = F.from_utc_timestamp(F.col("ts"), "America/New_York")
    kol = F.from_utc_timestamp(F.col("ts"), "Asia/Kolkata")
    return ev.select(
        "event_id",
        "ts",
        ny.alias("ny_local"),
        kol.alias("kolkata_local"),
        (F.to_utc_timestamp(ny, "America/New_York") == F.col("ts")).alias(
            "roundtrip_ok"
        ),
    )


@query(
    "fn_xpath",
    oracle="""
SELECT p_partkey, p_name, p_retailprice AS price_rt,
       CAST(len(string_split(p_name, ' ')) AS INT) AS n_words
FROM part
WHERE p_partkey % 10 = 0
""",
    category="functions",
)
def fn_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPath extraction family (xpath_long / xpath_string /
    xpath_double / list-valued xpath) — the query-side complement of
    scan_xml for XML-in-a-column payloads. The test is a round-trip
    IDENTITY: an XML document is synthesized from part columns (one
    <w> element per name token), the xpath_* calls must recover the
    original typed values exactly, and the oracle simply selects
    those originals. Double round trip is exact because Spark's
    string(double) is shortest-repr and parses back to the same
    bits. Pure map stage, JVM-side XPath, no shuffle."""
    p = table(spark, sf_dir, "part").where(F.col("p_partkey") % 10 == 0)
    words_xml = F.concat_ws(
        "",
        F.transform(
            F.split(F.col("p_name"), " "),
            lambda t: F.concat(F.lit("<w>"), t, F.lit("</w>")),
        ),
    )
    doc = F.concat(
        F.lit("<part><k>"),
        F.col("p_partkey").cast("string"),
        F.lit("</k><name>"),
        F.col("p_name"),
        F.lit("</name><price>"),
        F.col("p_retailprice").cast("string"),
        F.lit("</price><words>"),
        words_xml,
        F.lit("</words></part>"),
    )
    d = p.select(doc.alias("xml_doc"))
    return d.select(
        F.expr("xpath_long(xml_doc, '/part/k/text()')").alias("p_partkey"),
        F.expr("xpath_string(xml_doc, '/part/name')").alias("p_name"),
        F.expr("xpath_double(xml_doc, '/part/price')").alias("price_rt"),
        F.size(F.expr("xpath(xml_doc, '/part/words/w/text()')")).alias("n_words"),
    )


@query(
    "fn_collation",
    oracle="""
WITH m AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 2 = 0 THEN p_name ELSE upper(p_name) END
           AS name_mixed
  FROM part
)
SELECT p_partkey, name_mixed,
       lower(name_mixed) LIKE '%green%' AS has_green,
       lower(name_mixed) LIKE 'bl%' AS starts_bl,
       lower(name_mixed) LIKE '%rose' AS ends_rose
FROM m
""",
    category="functions",
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collation surface: string predicates evaluated under
    an explicit UTF8_LCASE collation (``F.collate``) — the engine-
    level answer to case-insensitive matching, replacing scattered
    lower() calls and letting comparisons/joins/groupBys be
    collation-aware. Input case is deliberately mixed per row (odd
    keys uppercased) so the collation actually decides the result;
    DuckDB twin lowers explicitly, which is the semantic UTF8_LCASE
    contract for this ASCII fixture. Pure map stage — predicates
    stay in whole-stage codegen."""
    p = table(spark, sf_dir, "part")
    mixed = F.when(
        F.col("p_partkey") % 2 == 0, F.col("p_name")
    ).otherwise(F.upper(F.col("p_name")))
    ci = F.collate(mixed, "UTF8_LCASE")
    return p.select(
        "p_partkey",
        mixed.alias("name_mixed"),
        ci.contains(F.lit("GREEN")).alias("has_green"),
        ci.startswith(F.lit("Bl")).alias("starts_bl"),
        ci.endswith(F.lit("ROSE")).alias("ends_rose"),
    )


@query(
    "fn_scalar_subquery",
    oracle="""
SELECT c.c_custkey, c.c_name,
       (SELECT COUNT(*) FROM orders o
         WHERE o.o_custkey = c.c_custkey) AS n_orders,
       EXISTS(SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_totalprice > 200000) AS has_big,
       (SELECT MAX(o.o_orderdate) FROM orders o
         WHERE o.o_custkey = c.c_custkey) AS last_order
FROM customer c
""",
    category="functions",
)
def fn_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subqueries through the SQL surface: a scalar COUNT
    subquery, a select-list EXISTS predicate, and a scalar MAX — the
    three shapes users paste in from warehouse SQL. Catalyst
    decorrelates all three into outer joins + aggregates (no
    per-row re-execution — the logical plan after RewriteCorrelated
    ScalarSubquery/RewritePredicateSubquery is a 3-way join), so the
    declarative SQL is as scalable as the hand-written DataFrame
    equivalent. Uses parameterized spark.sql with DataFrame args —
    no temp-view session state."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return spark.sql(
        """
SELECT c.c_custkey, c.c_name,
       (SELECT COUNT(*) FROM {orders} o
         WHERE o.o_custkey = c.c_custkey) AS n_orders,
       EXISTS(SELECT 1 FROM {orders} o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_totalprice > 200000) AS has_big,
       (SELECT MAX(o.o_orderdate) FROM {orders} o
         WHERE o.o_custkey = c.c_custkey) AS last_order
FROM {customer} c
""",
        orders=o,
        customer=c,
    )


@query(
    "fn_recursive_cte",
    oracle="""
WITH RECURSIVE e AS (
  SELECT DISTINCT l_orderkey % 100 AS src, l_partkey % 100 AS dst
  FROM lineitem
  WHERE l_orderkey % 100 <> l_partkey % 100
),
r(node, hops) AS (
  SELECT CAST(0 AS BIGINT) AS node, 0 AS hops
  UNION ALL
  SELECT e.dst, r.hops + 1
  FROM r JOIN e ON e.src = r.node
  WHERE r.hops < 3
)
SELECT node, MIN(hops) AS min_hops, CAST(COUNT(*) AS BIGINT) AS n_paths
FROM r
GROUP BY node
""",
    category="functions",
)
def fn_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI recursive CTE (WITH RECURSIVE — first-class in Spark 4):
    3-hop reachability from node 0 over the lineitem-derived digraph,
    counting distinct-by-arrival-depth paths and the minimum hop
    count per reached node. The declarative recursion is the SQL
    twin of graph.py's iterative DataFrame loops — same semantics,
    but the engine drives the fixpoint (bounded here by hops < 3, so
    both engines terminate identically).

    Scale: each recursion level is one equi-join of the frontier
    against the edge table — identical shuffle structure to the
    hand-written loop; the bound keeps the UNION ALL path expansion
    finite on cyclic graphs."""
    li = table(spark, sf_dir, "lineitem")
    return spark.sql(
        """
WITH RECURSIVE e AS (
  SELECT DISTINCT l_orderkey % 100 AS src, l_partkey % 100 AS dst
  FROM {lineitem}
  WHERE l_orderkey % 100 <> l_partkey % 100
),
r(node, hops) AS (
  SELECT CAST(0 AS BIGINT) AS node, 0 AS hops
  UNION ALL
  SELECT e.dst, r.hops + 1
  FROM r JOIN e ON e.src = r.node
  WHERE r.hops < 3
)
SELECT node, MIN(hops) AS min_hops, CAST(COUNT(*) AS BIGINT) AS n_paths
FROM r
GROUP BY node
""",
        lineitem=li,
    )


@query(
    "fn_in_subquery",
    oracle="""
WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 250000)
SELECT c_custkey, c_name,
       c_custkey IN (SELECT o_custkey FROM big) AS has_big_order,
       c_custkey NOT IN (SELECT o_custkey FROM big) AS no_big_order,
       NOT EXISTS (SELECT 1 FROM orders o
                   WHERE o.o_custkey = c_custkey
                     AND o.o_orderstatus = 'P') AS never_pending
FROM customer
""",
    category="functions",
)
def fn_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN / NOT EXISTS subqueries in the select list — the
    membership predicates with the famously divergent ANSI
    three-valued-logic corner: NOT IN against a subquery that yields
    any NULL is NULL for non-members (which is why production
    pipelines prefer NOT EXISTS). The subquery column here is a
    non-null key, so both engines agree bit-exactly while the
    operator still exercises Catalyst's RewritePredicateSubquery
    (IN -> semi join, NOT IN -> null-aware anti join, NOT EXISTS ->
    anti join) — three different join plans from three predicates."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return spark.sql(
        """
WITH big AS (SELECT o_custkey FROM {orders} WHERE o_totalprice > 250000)
SELECT c_custkey, c_name,
       c_custkey IN (SELECT o_custkey FROM big) AS has_big_order,
       c_custkey NOT IN (SELECT o_custkey FROM big) AS no_big_order,
       NOT EXISTS (SELECT 1 FROM {orders} o
                   WHERE o.o_custkey = c_custkey
                     AND o.o_orderstatus = 'P') AS never_pending
FROM {customer}
""",
        orders=o,
        customer=c,
    )


@query(
    "fn_aes_roundtrip",
    oracle="""
SELECT doc_id,
       text AS plain,
       text AS decrypted,
       CAST(TRUE AS BOOLEAN) AS roundtrip_ok
FROM documents WHERE doc_id < 100
""",
    category="functions",
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption surface: aes_encrypt/aes_decrypt
    round-trip in deterministic ECB mode (GCM's random IV would make
    the ciphertext — and any hash of it — nondeterministic, so ECB
    is the only gradable mode; real deployments use GCM and never
    grade raw ciphertext). The graded columns are the PLAINTEXT, the
    decrypted output and the equality flag — the oracle knows only
    that decrypt(encrypt(x)) == x, so a broken key path, padding bug
    or charset mangling cannot cancel out."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    key = F.lit("0123456789abcdef")  # 16-byte AES-128 key
    ct = F.aes_encrypt(F.col("text").cast("binary"), key.cast("binary"), F.lit("ECB"))
    pt = F.aes_decrypt(ct, key.cast("binary"), F.lit("ECB")).cast("string")
    return d.select(
        "doc_id",
        F.col("text").alias("plain"),
        pt.alias("decrypted"),
        (pt == F.col("text")).alias("roundtrip_ok"),
    )


@query(
    "fn_width_bucket",
    oracle="""
SELECT CASE WHEN o_totalprice < 0 THEN 0
            WHEN o_totalprice >= 600000.0 THEN 13
            ELSE CAST(floor(o_totalprice / 50000.0) AS BIGINT) + 1 END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key
FROM orders
GROUP BY bucket
""",
    category="functions",
)
def fn_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI width_bucket equi-width bucketing (the histogram
    primitive as a FUNCTION, vs agg_histogram's hand-rolled floor
    arithmetic). DuckDB has no width_bucket, so the oracle emulates
    the standard semantics (underflow->0, overflow->n+1, else
    floor((v-min)/w)+1) with the identical IEEE ops — the bucket
    width 600000/12=50000 is exactly representable, so both engines
    floor the same doubles."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            F.width_bucket(
                F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(12)
            ).alias("bucket"),
            "o_orderkey",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderkey").alias("min_key"),
        )
    )


@query(
    "fn_sql_function",
    oracle="""
SELECT o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 0.9 AS DOUBLE) AS discounted,
       CASE WHEN o_totalprice > 200000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS band
FROM orders
""",
    category="functions",
)
def fn_sql_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-LANGUAGE user-defined functions (Spark 4 CREATE FUNCTION
    ... RETURNS ... RETURN <expr>) — warehouse logic shared as
    catalog objects instead of engine-side code: the function body is
    a plain SQL expression, so Catalyst INLINES it (no Python, no
    serialization boundary, full pushdown through it). One scalar
    arithmetic function and one scalar CASE classifier, both applied
    in a SQL query; the oracle restates the inlined expressions."""
    harden_session(spark)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION discount_price(p DOUBLE) "
        "RETURNS DOUBLE RETURN CAST(CAST(p AS DECIMAL(18,2)) * 0.9 AS DOUBLE)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN p > 200000 THEN 'high' "
        "WHEN p > 100000 THEN 'mid' ELSE 'low' END"
    )
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        "SELECT o_orderkey, discount_price(o_totalprice) AS discounted, "
        "price_band(o_totalprice) AS band FROM orders"
    )


@query(
    "fn_zorder_key",
    oracle="""
WITH q AS (
  SELECT o_orderkey,
         CAST(o_custkey % 65536 AS BIGINT) AS x,
         CAST(datediff('day', DATE '1992-01-01', o_orderdate) % 65536 AS BIGINT) AS y
  FROM orders
)
SELECT o_orderkey, x, y,
       CAST(SUM(((x >> b) & 1) * POWER(4::BIGINT, b) * 2 +
                ((y >> b) & 1) * POWER(4::BIGINT, b)) AS BIGINT) AS z
FROM q, LATERAL (SELECT unnest(generate_series(0, 15)) AS b) g
GROUP BY o_orderkey, x, y
""",
    category="functions",
)
def fn_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton) interleave key over two 16-bit dimensions —
    the multi-dimensional clustering layout key behind data-skipping
    file layouts (sorting by z co-locates rows close in BOTH customer
    and date, so min/max stats prune on either predicate). Pure
    integer bit arithmetic: bit b of x lands at position 2b+1, bit b
    of y at 2b — identical closed form in both engines, zero
    shuffles.

    At 100 TB the key feeds repartitionByRange(z) +
    sortWithinPartitions(z) at write time; the query grades the key
    computation itself, bit-exact."""
    o = table(spark, sf_dir, "orders")
    x = (F.col("o_custkey") % 65536).cast("long")
    y = (
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")) % 65536
    ).cast("long")
    d = o.select("o_orderkey", x.alias("x"), y.alias("y"))
    # unrolled closed form: bit b of x -> position 2b+1, of y -> 2b
    z = None
    for b in range(16):
        w = 4**b
        part = F.shiftright(F.col("x"), b).bitwiseAND(F.lit(1)).cast("long") * F.lit(
            2 * w
        ) + F.shiftright(F.col("y"), b).bitwiseAND(F.lit(1)).cast("long") * F.lit(w)
        z = part if z is None else z + part
    return d.select("o_orderkey", "x", "y", z.cast("long").alias("z"))


@query(
    "fn_sql_table_function",
    oracle="""
SELECT d.doc_id, g.i AS pos, g.tok
FROM documents d,
     LATERAL (SELECT unnest(string_split(d.text, ' ')) AS tok,
                     generate_subscripts(string_split(d.text, ' '), 1) AS i) g
WHERE d.doc_id < 25
""",
    category="functions",
)
def fn_sql_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language TABLE function (CREATE FUNCTION ... RETURNS
    TABLE ... RETURN SELECT ...) applied as a correlated LATERAL —
    the catalog-shared tokenizer pattern: the expansion logic lives
    in the catalog as declarative SQL, Catalyst inlines it into the
    caller's plan (a plain Generate node — no UDTF worker, no Python
    boundary), and any query can LATERAL-join it. The scalar twin is
    fn_sql_function; the imperative twin is udtf_python."""
    harden_session(spark)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sql_tokens(t STRING) "
        "RETURNS TABLE(pos INT, tok STRING) "
        "RETURN SELECT posexplode(split(t, ' '))"
    )
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 25)
    d.createOrReplaceTempView("docs_for_sqltvf")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos + 1 AS pos, t.tok
        FROM docs_for_sqltvf d, LATERAL sql_tokens(d.text) t
        """
    )


@query(
    "fn_surrogate_key",
    oracle="""
WITH k AS (
  SELECT c_custkey,
         CAST(('0x' || substring(md5(c_name || '|' || CAST(c_nationkey AS VARCHAR)),
                                 1, 15)) AS BIGINT) AS sk
  FROM customer
)
SELECT c_custkey, sk,
       CAST(COUNT(*) OVER (PARTITION BY sk) AS BIGINT) AS sk_collisions
FROM k
""",
    category="functions",
)
def fn_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC surrogate keys — the warehouse key-generation
    pattern that replaces monotonically_increasing_id (whose values
    depend on partition layout and are unusable for reproducible
    dimension loads): a 60-bit integer derived from the md5 of the
    business key, identical on every engine, every run, every
    partitioning. The per-key collision count is the load-time audit
    (1 everywhere on this data; the birthday bound at 2^60 keeps it
    1 in practice at any realistic dimension size).

    Map-side key derivation; the audit window shuffles once on sk."""
    c = table(spark, sf_dir, "customer")
    sk = F.conv(
        F.substring(
            F.md5(
                F.concat(F.col("c_name"), F.lit("|"), F.col("c_nationkey").cast("string"))
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    k = c.select("c_custkey", sk.alias("sk"))
    from pyspark.sql.window import Window as W

    return k.select(
        "c_custkey",
        "sk",
        F.count(F.lit(1)).over(W.partitionBy("sk")).cast("long").alias("sk_collisions"),
    )


@query("fn_phonetic_blocking", oracle=None, category="functions")
def fn_phonetic_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PHONETIC blocking keys — census Soundex over the first word of
    every part name: the classic entity-resolution blocking
    complement to join_fuzzy_blocked's prefix keys (phonetic codes
    catch spelling variants Levenshtein blocking windows miss;
    candidate pairs then verify with an exact distance). Rows-only —
    DuckDB ships no soundex — with a pure-Python reimplementation of
    the census algorithm (incl. the H/W collapse rule) asserting
    every code in tests/test_quality.py.

    Per-code block sizes are the blocking-quality diagnostic: a hot
    code (like a hot shuffle key) means the block degenerates toward
    all-pairs and needs a longer compound key."""
    p = table(spark, sf_dir, "part")
    w1 = F.split(F.col("p_name"), " ").getItem(0)
    codes = p.select(F.soundex(w1).alias("code"), w1.alias("word"))
    return codes.groupBy("code").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.countDistinct("word").alias("n_words"),
        F.min("word").alias("example"),
    )


@query(
    "fn_sql_pipe_syntax",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderstatus
HAVING COUNT(*) > 10
""",
    category="functions",
)
def fn_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE syntax (Spark 4's |> operator chains, SPARK-49555 —
    the 2024 'SQL Has Problems' pipelined-SQL proposal landed as a
    first-class parser mode): the query reads top-to-bottom as
    FROM -> WHERE -> AGGREGATE -> WHERE instead of inside-out, and
    parses to the IDENTICAL Catalyst plan as the nested form — the
    oracle twin is the classic GROUP BY + HAVING spelling, so the
    hash match proves pipe syntax is pure sugar over the same
    semantics (exact-decimal sum convention intact through it)."""
    harden_session(spark)
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        "FROM orders "
        "|> WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "|> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_orders, "
        "   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total "
        "   GROUP BY o_orderstatus "
        "|> WHERE n_orders > 10 "
        "|> SELECT o_orderstatus, n_orders, total"
    )


@query(
    "fn_sql_parameterized",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
WHERE o_totalprice BETWEEN 50000.0 AND 250000.0
  AND o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY o_orderpriority
""",
    category="functions",
)
def fn_sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAMETERIZED SQL (spark.sql(..., args=...) — the
    injection-safe query API, Spark 3.4+/4.x): named :markers bound
    from a dict, values passed as TYPED literals through the parser
    (a string cannot smuggle syntax). The oracle twin inlines the
    same literals; a hash match proves binding semantics equal
    textual substitution for well-typed values. Parameters reach
    Catalyst BEFORE optimization, so pushdown/pruning work exactly
    as with literal SQL — this is the API a query service should
    expose instead of f-strings."""
    harden_session(spark)
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total "
        "FROM orders "
        "WHERE o_totalprice BETWEEN :lo AND :hi AND o_orderdate >= :cutoff "
        "GROUP BY o_orderpriority",
        args={
            "lo": 50000.0,
            "hi": 250000.0,
            "cutoff": datetime.datetime(1997, 1, 1),
        },
    )


@query(
    "fn_interval_arith",
    oracle="""
SELECT event_id,
       ts + INTERVAL 90 MINUTE AS plus_90m,
       ts - INTERVAL 1 DAY - INTERVAL 12 HOUR - INTERVAL 30 MINUTE
           AS minus_1d12h30m,
       ts + to_minutes(CAST(event_id % 60 AS BIGINT)) AS plus_row_minutes,
       ts + to_months(CAST(event_id % 12 AS INT)) AS plus_row_months,
       ts + to_hours(CAST(event_id % 5 AS BIGINT)) AS plus_scaled_hours,
       CAST(CAST(ts AS DATE) + INTERVAL 1 MONTH AS TIMESTAMP) AS next_month_same_day
FROM events
""",
    category="functions",
)
def fn_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI INTERVAL arithmetic — the typed-interval surface next to
    fn_date's add_months/datediff: day-time interval literals
    (single- and multi-unit), per-row intervals built with
    make_dt_interval / make_interval from data columns, interval *
    integer scaling, and year-month addition with its end-of-month
    clamp (Jan 31 + 1 month = Feb 29/28 — both engines clamp, and
    the oracle proves the clamp matches row-for-row).  All
    calendar-aware JVM codegen — no epoch round-trips, which would
    get DST/overflow edge cases wrong at corpus scale."""
    e = table(spark, sf_dir, "events")
    ts = F.col("ts")
    return e.select(
        "event_id",
        (ts + F.expr("INTERVAL '90' MINUTE")).alias("plus_90m"),
        (ts - F.expr("INTERVAL '1 12:30' DAY TO MINUTE")).alias("minus_1d12h30m"),
        (
            ts
            + F.make_dt_interval(
                F.lit(0), F.lit(0), (F.col("event_id") % 60).cast("int"), F.lit(0.0)
            )
        ).alias("plus_row_minutes"),
        (
            ts
            + F.make_interval(
                F.lit(0), (F.col("event_id") % 12).cast("int"), F.lit(0), F.lit(0),
                F.lit(0), F.lit(0), F.lit(0.0),
            )
        ).alias("plus_row_months"),
        (ts + F.expr("INTERVAL '1' HOUR") * (F.col("event_id") % 5)).alias(
            "plus_scaled_hours"
        ),
        (ts.cast("date") + F.expr("INTERVAL '1' MONTH"))
        .cast("timestamp")
        .alias("next_month_same_day"),
    )


@query(
    "fn_sql_variables",
    oracle="""
SELECT o_orderpriority AS dyn_group,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
WHERE o_totalprice >= 75000.0 AND o_orderdate < DATE '1997-06-01'
GROUP BY o_orderpriority
""",
    category="functions",
)
def fn_sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables + the IDENTIFIER clause (both
    first-class in Spark 4): thresholds DECLAREd once and SET per
    session (typed, injection-proof — the governed alternative to
    f-string SQL, same motivation as fn_sql_parameterized but with
    server-side state that multiple statements share), and the
    grouping column resolved DYNAMICALLY from a string variable via
    IDENTIFIER() — the metadata-driven-report shape.  Variables
    fold to literals at analysis time, so the physical plan is
    byte-identical to the hand-inlined query: pushdown and pruning
    are unaffected at any scale."""
    harden_session(spark)
    register_views(spark, sf_dir, "orders")
    spark.sql("DECLARE OR REPLACE VARIABLE price_lo DOUBLE DEFAULT 50000.0")
    spark.sql("DECLARE OR REPLACE VARIABLE cutoff DATE DEFAULT DATE '1998-01-01'")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE group_col STRING DEFAULT 'o_orderpriority'"
    )
    spark.sql("SET VARIABLE price_lo = 75000.0")
    spark.sql("SET VARIABLE cutoff = DATE '1997-06-01'")
    return spark.sql(
        """
        SELECT IDENTIFIER(group_col) AS dyn_group,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        WHERE o_totalprice >= price_lo AND o_orderdate < cutoff
        GROUP BY IDENTIFIER(group_col)
        """
    )


@query(
    "fn_sql_scripting",
    oracle="""
WITH c AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type
)
SELECT CAST(((((SELECT n FROM c WHERE event_type = 'click') * 31
        + (SELECT n FROM c WHERE event_type = 'error')) * 31
        + (SELECT n FROM c WHERE event_type = 'purchase')) * 31
        + (SELECT n FROM c WHERE event_type = 'signup')) * 31
        + (SELECT n FROM c WHERE event_type = 'view') AS BIGINT)
        AS horner_checksum,
       CAST(5 AS BIGINT) AS n_iter
""",
    category="functions",
)
def fn_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING (Spark 4.0's BEGIN...END procedural blocks —
    SPARK-48338): a WHILE loop with local DECLAREd variables folds
    the five per-event-type counts into a base-31 Horner checksum,
    one real aggregation query per iteration — control flow that
    previously forced a driver-side Python loop now runs as a single
    governed SQL statement whose LAST statement's result set is the
    block's result.

    The loop body's scalar subquery is an ordinary aggregate over
    the fact table, so each iteration keeps full pushdown/pruning
    (predicate event_type = <literal> reaches the scan); the loop
    count is the BOUNDED event-type vocabulary, never
    data-proportional — scripting loops over data-sized domains is
    the anti-pattern this query's shape avoids.  Oracle: the
    closed-form Horner polynomial over the same five counts."""
    harden_session(spark)
    register_views(spark, sf_dir, "events")
    return spark.sql(
        """
        BEGIN
          DECLARE acc BIGINT DEFAULT 0;
          DECLARE i INT DEFAULT 0;
          DECLARE kinds ARRAY<STRING> DEFAULT
            ARRAY('click', 'error', 'purchase', 'signup', 'view');
          WHILE i < 5 DO
            SET acc = acc * 31 + (
              SELECT COUNT(*) FROM events
              WHERE event_type = element_at(kinds, i + 1)
            );
            SET i = i + 1;
          END WHILE;
          SELECT acc AS horner_checksum, CAST(i AS BIGINT) AS n_iter;
        END
        """
    )


@query(
    "fn_sql_execute_immediate",
    oracle="""
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_big,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_big
FROM orders
WHERE o_totalprice >= (SELECT MAX(o_totalprice) FROM orders) * 0.5
GROUP BY o_orderpriority
""",
    category="functions",
)
def fn_sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE IMMEDIATE (Spark 4.0 dynamic SQL, SPARK-44751) in its
    two production shapes composed end to end: (1) INTO — a probe
    statement's scalar result (the corpus max price) captured
    directly into a session variable, no driver round-trip through
    Python; (2) named-parameter USING — the report statement lives
    in a STRING variable with a :threshold marker and executes with
    the derived bind value, the injection-proof way to run
    metadata-driven SQL held in config tables.

    Parameters bind at analysis time, so the executed plan is
    byte-identical to the hand-inlined query — the threshold
    predicate still reaches the parquet scan.  The probe is one
    1-row aggregate; the report is the ordinary partial/final
    aggregate; nothing about the dynamic dispatch changes the
    at-scale plan.  Oracle: the same report with the probe inlined
    as a scalar subquery."""
    harden_session(spark)
    register_views(spark, sf_dir, "orders")
    spark.sql("DECLARE OR REPLACE VARIABLE max_price DOUBLE DEFAULT 0.0")
    spark.sql(
        "EXECUTE IMMEDIATE 'SELECT MAX(o_totalprice) FROM orders' INTO max_price"
    )
    spark.sql(
        "DECLARE OR REPLACE VARIABLE report STRING DEFAULT "
        "'SELECT o_orderpriority AS priority, "
        "CAST(COUNT(*) AS BIGINT) AS n_big, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_big "
        "FROM orders WHERE o_totalprice >= :threshold "
        "GROUP BY o_orderpriority'"
    )
    return spark.sql(
        "EXECUTE IMMEDIATE report USING max_price * 0.5 AS threshold"
    )


@query(
    "fn_luhn_checksum",
    oracle="""
WITH acct AS (
  SELECT c_custkey, c_mktsegment,
         lpad(CAST(((c_custkey & 2147483647) * 2654435761) % 10000000000 AS VARCHAR),
              10, '0') AS payload
  FROM customer
),
luhn AS (
  SELECT c_custkey, c_mktsegment, payload,
         list_sum(list_transform(generate_series(1, 10), j ->
           CASE WHEN j % 2 = 1
                THEN CASE WHEN 2 * CAST(substr(payload, 11 - j, 1) AS INT) > 9
                          THEN 2 * CAST(substr(payload, 11 - j, 1) AS INT) - 9
                          ELSE 2 * CAST(substr(payload, 11 - j, 1) AS INT) END
                ELSE CAST(substr(payload, 11 - j, 1) AS INT) END)) AS s
  FROM acct
),
numbered AS (
  SELECT c_mktsegment, payload, (10 - s % 10) % 10 AS check_digit,
         payload || CAST((10 - s % 10) % 10 AS VARCHAR) AS account_no
  FROM luhn
),
validated AS (
  SELECT c_mktsegment, check_digit,
         list_sum(list_transform(generate_series(1, 11), j ->
           CASE WHEN j % 2 = 0
                THEN CASE WHEN 2 * CAST(substr(account_no, 12 - j, 1) AS INT) > 9
                          THEN 2 * CAST(substr(account_no, 12 - j, 1) AS INT) - 9
                          ELSE 2 * CAST(substr(account_no, 12 - j, 1) AS INT) END
                ELSE CAST(substr(account_no, 12 - j, 1) AS INT) END)) % 10 AS rem
  FROM numbered
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_accounts,
       CAST(SUM(CASE WHEN rem = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
       CAST(SUM(check_digit) AS BIGINT) AS sum_check_digits,
       CAST(COUNT(DISTINCT check_digit) AS BIGINT) AS n_distinct_checks
FROM validated
GROUP BY c_mktsegment
""",
    category="functions",
)
def fn_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn mod-10 check-digit GENERATION and round-trip VALIDATION —
    the checksum behind card/IMEI/account identifiers and the
    validation predicate a PII scanner (text_pii_scrub's card regex)
    uses to cut false positives. Synthetic 10-digit payloads (Knuth
    hash of custkey) get their check digit computed by the standard
    double-every-second-digit-from-the-right fold, then the full
    11-digit number is re-validated with the complementary
    even-position fold — n_valid == n_accounts is the
    self-authentication (a parity slip in either fold zeroes it,
    the generation and validation folds cannot share a bug since
    their position parities differ). Everything is exact integer
    digit arithmetic in one codegen map stage; one shuffle for the
    per-segment rollup."""
    c = table(spark, sf_dir, "customer")
    payload = F.lpad(
        ((F.col("c_custkey").bitwiseAND(2147483647) * F.lit(2654435761)) % F.lit(10000000000)).cast(
            "string"
        ),
        10,
        "0",
    )

    def luhn_sum(s, width: int, double_parity: int):
        return F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.lit(width)),
                lambda j: F.when(
                    j % 2 == double_parity,
                    F.when(
                        2 * F.substr(s, width + 1 - j, F.lit(1)).cast("int") > 9,
                        2 * F.substr(s, width + 1 - j, F.lit(1)).cast("int") - 9,
                    ).otherwise(
                        2 * F.substr(s, width + 1 - j, F.lit(1)).cast("int")
                    ),
                ).otherwise(F.substr(s, width + 1 - j, F.lit(1)).cast("int")),
            ),
            F.lit(0),
            lambda a, x: a + x,
        )

    base = c.select("c_mktsegment", payload.alias("payload"))
    withsum = base.withColumn("s", luhn_sum(F.col("payload"), 10, 1))
    numbered = withsum.select(
        "c_mktsegment",
        ((10 - F.col("s") % 10) % 10).alias("check_digit"),
        F.concat(
            F.col("payload"), ((10 - F.col("s") % 10) % 10).cast("string")
        ).alias("account_no"),
    )
    validated = numbered.withColumn(
        "rem", luhn_sum(F.col("account_no"), 11, 0) % 10
    )
    return validated.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_accounts"),
        F.sum(F.when(F.col("rem") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_valid"),
        F.sum("check_digit").cast("long").alias("sum_check_digits"),
        F.countDistinct("check_digit").cast("long").alias("n_distinct_checks"),
    )


@query(
    "fn_sql_group_by_all",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS price_cents
FROM lineitem
GROUP BY ALL
""",
    category="functions",
)
def fn_sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — the modern-SQL ergonomic both engines added
    (Spark 3.4+/DuckDB): every non-aggregate select item becomes a
    grouping key, eliminating the classic copy-the-select-list
    maintenance bug. Run through spark.sql on a temp view so the
    actual SQL-syntax path (not a DataFrame translation) is what's
    graded; the physical plan is the ordinary partial+final hash
    aggregate."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_gba")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS price_cents
        FROM li_gba
        GROUP BY ALL
        """
    )


@query(
    "fn_ipv4_cidr",
    oracle="""
WITH ip AS (
  SELECT event_id,
         (((event_id & 2147483647) * 2654435761) % 4294967296) AS addr
  FROM events
),
parts AS (
  SELECT event_id, addr,
         addr // 16777216 AS o1,
         (addr // 65536) % 256 AS o2,
         (addr // 256) % 256 AS o3,
         addr % 256 AS o4
  FROM ip
),
formed AS (
  SELECT event_id, addr,
         CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.'
           || CAST(o3 AS VARCHAR) || '.' || CAST(o4 AS VARCHAR) AS dotted,
         CASE WHEN o1 = 10 THEN 1
              WHEN o1 = 172 AND o2 >= 16 AND o2 < 32 THEN 1
              WHEN o1 = 192 AND o2 = 168 THEN 1
              ELSE 0 END AS is_private,
         CASE WHEN addr // 268435456 = 0 THEN 1 ELSE 0 END AS in_slash4
  FROM parts
)
SELECT CAST(SUM(is_private) AS BIGINT) AS n_private,
       CAST(SUM(in_slash4) AS BIGINT) AS n_in_slash4,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(addr) AS BIGINT) AS addr_checksum,
       CAST(SUM(len(dotted)) AS BIGINT) AS dotted_chars,
       MIN(dotted) AS min_dotted
FROM formed
""",
    category="functions",
)
def fn_ipv4_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 address arithmetic — the log-analytics primitive set:
    uint32 -> dotted-quad formatting (pure div/mod octet splits,
    string re-assembly), RFC-1918 private-range classification
    (10/8, 172.16/12, 192.168/16 — the 172.16/12 case is the one
    naive string prefixes get wrong), and CIDR membership as a
    prefix integer division (addr >> 28 == 0 for 0.0.0.0/4).
    Addresses are deterministic Knuth hashes of event ids, so the
    oracle recomputes everything from scratch; checksums +
    MIN(dotted) pin both the numeric and the string forms. One map
    + one global aggregate, all integer codegen."""
    e = table(spark, sf_dir, "events")
    addr = (F.col("event_id").bitwiseAND(2147483647) * F.lit(2654435761)) % F.lit(4294967296)
    a = e.select("event_id", addr.alias("addr"))
    o1 = F.expr("addr DIV 16777216")
    o2 = F.expr("(addr DIV 65536) % 256")
    o3 = F.expr("(addr DIV 256) % 256")
    o4 = F.col("addr") % 256
    parts = a.select("event_id", "addr", o1.alias("o1"), o2.alias("o2"),
                     o3.alias("o3"), o4.alias("o4"))
    dotted = F.concat_ws(
        ".",
        F.col("o1").cast("string"),
        F.col("o2").cast("string"),
        F.col("o3").cast("string"),
        F.col("o4").cast("string"),
    )
    is_private = (
        F.when(F.col("o1") == 10, 1)
        .when((F.col("o1") == 172) & (F.col("o2") >= 16) & (F.col("o2") < 32), 1)
        .when((F.col("o1") == 192) & (F.col("o2") == 168), 1)
        .otherwise(0)
    )
    in_slash4 = F.when(F.expr("addr DIV 268435456") == 0, 1).otherwise(0)
    formed = parts.select(
        "addr",
        dotted.alias("dotted"),
        is_private.alias("is_private"),
        in_slash4.alias("in_slash4"),
    )
    return formed.agg(
        F.sum("is_private").cast("long").alias("n_private"),
        F.sum("in_slash4").cast("long").alias("n_in_slash4"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum("addr").cast("long").alias("addr_checksum"),
        F.sum(F.length("dotted")).cast("long").alias("dotted_chars"),
        F.min("dotted").alias("min_dotted"),
    )


@query(
    "fn_base_conv",
    oracle="""
WITH v AS (
  SELECT o_orderkey AS x FROM orders
),
enc AS (
  SELECT x, to_base(x, 2) AS b2, to_base(x, 8) AS b8,
         to_base(x, 16) AS b16, to_base(x, 36) AS b36
  FROM v
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(len(b2)) AS BIGINT) AS bits,
       CAST(SUM(len(b8)) AS BIGINT) AS oct_chars,
       CAST(SUM(len(b16)) AS BIGINT) AS hex_chars,
       CAST(SUM(len(b36)) AS BIGINT) AS b36_chars,
       MIN(b36) AS min_b36, MAX(b36) AS max_b36,
       CAST(SUM(x) AS BIGINT) AS roundtrip_checksum
FROM enc
""",
    category="functions",
)
def fn_base_conv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radix conversion surface (conv): every order key encoded to
    binary/octal/hex/base-36 and PARSED BACK — the roundtrip_checksum
    sums only rows whose base-36 decode reproduces the original, so
    a digit-alphabet or padding bug in either direction collapses
    the checksum rather than passing silently. The oracle encodes
    independently (DuckDB to_base), cross-checking Spark's encoder
    through the per-base character masses and the MIN/MAX base-36
    strings (case and alphabet pinned). Pure codegen map + one
    aggregate."""
    o = table(spark, sf_dir, "orders")
    x = F.col("o_orderkey")
    enc = o.select(
        x.alias("x"),
        F.conv(x.cast("string"), 10, 2).alias("b2"),
        F.conv(x.cast("string"), 10, 8).alias("b8"),
        F.conv(x.cast("string"), 10, 16).alias("b16"),
        F.conv(x.cast("string"), 10, 36).alias("b36"),
    )
    back = F.conv(F.col("b36"), 36, 10).cast("long")
    return enc.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.length("b2")).cast("long").alias("bits"),
        F.sum(F.length("b8")).cast("long").alias("oct_chars"),
        F.sum(F.length("b16")).cast("long").alias("hex_chars"),
        F.sum(F.length("b36")).cast("long").alias("b36_chars"),
        F.min("b36").alias("min_b36"),
        F.max("b36").alias("max_b36"),
        F.sum(F.when(back == F.col("x"), F.col("x")).otherwise(0))
        .cast("long")
        .alias("roundtrip_checksum"),
    )


@query(
    "fn_date_iso",
    oracle="""
SELECT o_orderkey,
       CAST(quarter(o_orderdate) AS INT) AS order_quarter,
       CAST(dayofyear(o_orderdate) AS INT) AS order_doy,
       CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
       CAST(isoyear(o_orderdate) AS INT) AS iso_year,
       CAST(isoyear(o_orderdate) * 100 + weekofyear(o_orderdate) AS INT)
         AS iso_week_key
FROM orders
""",
    category="functions",
)
def fn_date_iso(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 calendar family — the parts fn_date leaves out and
    the ones with the famous cross-engine traps: quarter, day of
    year, ISO week number (both engines are ISO: week 1 contains the
    first Thursday, so Jan 1 can be week 52/53 of the PREVIOUS iso
    year), and the matching ISO week-year (Spark
    extract(YEAROFWEEK), DuckDB isoyear) — plus the combined
    yyyyww key a weekly-rollup pipeline would group by, which is
    only correct with the ISO pair (year(d)*100 + weekofyear(d)
    misbuckets the year-boundary week).  Pure calendar arithmetic,
    map-only plan."""
    o = table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.quarter(od).alias("order_quarter"),
        F.dayofyear(od).alias("order_doy"),
        F.weekofyear(od).alias("iso_week"),
        F.expr("extract(YEAROFWEEK FROM o_orderdate)").cast("int").alias("iso_year"),
        (
            F.expr("extract(YEAROFWEEK FROM o_orderdate)") * 100
            + F.weekofyear(od)
        )
        .cast("int")
        .alias("iso_week_key"),
    )


@query(
    "fn_string_manip",
    oracle="""
SELECT p_partkey,
       translate(p_name, 'aeiou', 'AEIOU') AS vowels_upper,
       reverse(p_brand) AS brand_reversed,
       repeat(left(p_name, 2), 3) AS prefix_echo,
       right(p_name, 3) AS name_tail,
       ascii(p_name) AS first_codepoint,
       contains(p_name, 'e') AS has_e,
       starts_with(p_brand, 'Brand') AS is_brand,
       CAST(length(p_name) - length(replace(p_name, ' ', '')) AS INT)
         AS n_spaces
FROM part
""",
    category="functions",
)
def fn_string_manip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-surface family (beyond fn_string's
    case/trim/pad/split tier): character translation, reverse,
    repeat, left/right slices, leading codepoint, substring
    predicates (contains / starts_with — identical names and
    semantics in both engines), and the classic
    count-without-scanning idiom length(s) - length(replace(s, c,
    '')).  All JVM-side codegen, map-only plan."""
    p = table(spark, sf_dir, "part")
    name = F.col("p_name")
    return p.select(
        "p_partkey",
        F.translate(name, "aeiou", "AEIOU").alias("vowels_upper"),
        F.reverse(F.col("p_brand")).alias("brand_reversed"),
        F.repeat(F.expr("left(p_name, 2)"), 3).alias("prefix_echo"),
        F.expr("right(p_name, 3)").alias("name_tail"),
        F.ascii(name).alias("first_codepoint"),
        F.contains(name, F.lit("e")).alias("has_e"),
        F.startswith(F.col("p_brand"), F.lit("Brand")).alias("is_brand"),
        (F.length(name) - F.length(F.replace(name, F.lit(" "), F.lit(""))))
        .cast("int")
        .alias("n_spaces"),
    )


@query(
    "fn_array_setops",
    oracle="""
WITH d AS (
  SELECT doc_id,
         list_distinct(string_split(substring(text, 1, 60), ' ')) AS a,
         list_distinct(string_split(substring(text, 41, 60), ' ')) AS b
  FROM documents
)
SELECT doc_id,
       CAST(len(a) AS INT) AS n_head,
       CAST(len(b) AS INT) AS n_mid,
       CAST(len(list_intersect(a, b)) AS INT) AS n_common,
       array_to_string(list_sort(list_intersect(a, b)), ' ') AS common_sorted,
       CAST(len(list_distinct(list_concat(a, b))) AS INT) AS n_union,
       list_has_any(a, b) AS overlaps,
       list_has_all(a, list_intersect(a, b)) AS contains_common
FROM d
""",
    category="functions",
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra — intersect / union-distinct / has_any /
    has_all between two token sets (the head and a middle slice of
    each document): the overlap primitive under shingle dedup
    expressed at the SQL surface.  Intersections are emitted SORTED
    (Spark's array_intersect preserves left order, DuckDB's
    list_intersect does not — ordering is the cross-engine trap this
    query pins).  Cardinalities and booleans are exact."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(
            F.split(F.substring(F.col("text"), 1, 60), " ")
        ).alias("a"),
        F.array_distinct(
            F.split(F.substring(F.col("text"), 41, 60), " ")
        ).alias("b"),
    )
    inter = F.array_intersect(F.col("a"), F.col("b"))
    return d.select(
        "doc_id",
        F.size("a").alias("n_head"),
        F.size("b").alias("n_mid"),
        F.size(inter).alias("n_common"),
        F.array_join(F.array_sort(inter), " ").alias("common_sorted"),
        F.size(F.array_union(F.col("a"), F.col("b"))).alias("n_union"),
        F.arrays_overlap(F.col("a"), F.col("b")).alias("overlaps"),
        F.forall(inter, lambda x: F.array_contains(F.col("a"), x)).alias(
            "contains_common"
        ),
    )


@query(
    "fn_null_semantics",
    oracle="""
SELECT p_partkey,
       nullif(p_size, 15) AS size_or_null,
       ifnull(nullif(p_size, 15), -1) AS size_defaulted,
       coalesce(nullif(p_size, 15), nullif(p_size, 20), 0) AS coalesce_chain,
       least(p_size, nullif(p_size, p_size)) AS least_skips_null,
       greatest(p_size, nullif(p_size, p_size)) AS greatest_skips_null,
       (nullif(p_size, 15) = 15) IS NULL AS null_comparison_is_null,
       CAST(nullif(p_size, 15) IS DISTINCT FROM 15 AS BOOLEAN)
         AS distinct_from_15
FROM part
""",
    category="functions",
)
def fn_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic surface — the NULL corners engines love to
    disagree on, pinned: nullif/ifnull/coalesce chains, least and
    greatest SKIPPING null operands (both engines skip rather than
    propagate — the opposite of +), a comparison against NULL being
    NULL (surfaced via IS NULL), and IS DISTINCT FROM as the
    null-safe inequality (true for NULL vs 15 where <> is NULL).
    Map-only plan."""
    p = table(spark, sf_dir, "part")
    sz = F.col("p_size")
    size_or_null = F.nullif(sz, F.lit(15))
    return p.select(
        "p_partkey",
        size_or_null.alias("size_or_null"),
        F.ifnull(size_or_null, F.lit(-1)).alias("size_defaulted"),
        F.coalesce(size_or_null, F.nullif(sz, F.lit(20)), F.lit(0)).alias(
            "coalesce_chain"
        ),
        F.least(sz, F.nullif(sz, sz)).alias("least_skips_null"),
        F.greatest(sz, F.nullif(sz, sz)).alias("greatest_skips_null"),
        (size_or_null == 15).isNull().alias("null_comparison_is_null"),
        F.expr("nullif(p_size, 15) IS DISTINCT FROM 15").alias(
            "distinct_from_15"
        ),
    )


@query(
    "fn_deterministic_uuid",
    oracle="""
WITH h AS (
  SELECT doc_id, md5(concat('ns:docs/', CAST(doc_id AS VARCHAR))) AS hx
  FROM documents
)
SELECT doc_id,
       concat(substr(hx, 1, 8), '-', substr(hx, 9, 4), '-5',
              substr(hx, 14, 3), '-', substr(hx, 17, 4), '-',
              substr(hx, 21, 12)) AS doc_uuid,
       substr(hx, 1, 8) AS shard_hex,
       CAST(CAST('0x' || substr(hx, 1, 8) AS BIGINT) % 64 AS BIGINT)
         AS shard_id
FROM h
""",
    category="functions",
)
def fn_deterministic_uuid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Name-based deterministic UUIDs (the RFC-4122 v5 SHAPE over
    md5, since SHA-1 truncation differs per engine) — the stable
    document identity a pipeline mints when upstream ids are
    unstable: uuid = md5('ns:docs/' || id) formatted 8-4-4-4-12 with
    the version nibble pinned to 5, plus the leading-32-bit shard
    key the same hex prefix yields.  Identical string/md5 machinery
    in both engines; map-only plan."""
    d = table(spark, sf_dir, "documents")
    hx = F.md5(F.concat(F.lit("ns:docs/"), F.col("doc_id").cast("string")))
    h = d.select("doc_id", hx.alias("hx"))
    return h.select(
        "doc_id",
        F.concat(
            F.substring("hx", 1, 8),
            F.lit("-"),
            F.substring("hx", 9, 4),
            F.lit("-5"),
            F.substring("hx", 14, 3),
            F.lit("-"),
            F.substring("hx", 17, 4),
            F.lit("-"),
            F.substring("hx", 21, 12),
        ).alias("doc_uuid"),
        F.substring("hx", 1, 8).alias("shard_hex"),
        (F.conv(F.substring("hx", 1, 8), 16, 10).cast("long") % 64).alias(
            "shard_id"
        ),
    )


@query(
    "fn_regexp_advanced",
    oracle="""
SELECT doc_id,
       COALESCE(array_to_string(regexp_extract_all(text, '[a-z]{6,}'),
                                ','), '') AS long_words,
       CAST(len(regexp_extract_all(text, '[a-z]{6,}')) AS INT) AS n_long,
       regexp_replace(text, '([a-z]+) ([a-z]+)', '\\2 \\1', 'g')
         AS pair_swapped,
       regexp_matches(text, 'spark|stream') AS mentions_engine,
       COALESCE(array_to_string(regexp_extract_all(
                 substring(text, 1, 60), '\\b[a-z]{4}\\b'), ','), '')
         AS four_letter_head
FROM documents
""",
    category="functions",
)
def fn_regexp_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second regexp tier (beyond fn_regexp's extract/replace basics):
    regexp_extract_all (emitted joined — raw array cells are not
    driver-hashable), match counting via the
    array length, group BACKREFERENCES in replacement (the dialect
    trap this query pins: Spark writes $2 $1, DuckDB \\\\2 \\\\1 —
    same semantics, different spellings, identical output), boolean
    match predicates (Spark rlike == DuckDB regexp_matches), and
    word-boundary classes.  The OTHER dialect trap pinned here:
    Spark's regexp_replace is GLOBAL by default while DuckDB's
    replaces only the first match — the oracle needs the explicit
    'g' flag or the twins silently diverge from the second match on
    (caught live in this query's first draft).  Map-only plan."""
    d = table(spark, sf_dir, "documents")
    txt = F.col("text")
    return d.select(
        "doc_id",
        F.array_join(
            F.expr("regexp_extract_all(text, '[a-z]{6,}', 0)"), ","
        ).alias("long_words"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]{6,}', 0)")).alias(
            "n_long"
        ),
        F.regexp_replace(txt, r"([a-z]+) ([a-z]+)", r"$2 $1").alias(
            "pair_swapped"
        ),
        txt.rlike("spark|stream").alias("mentions_engine"),
        F.array_join(
            F.expr(
                r"regexp_extract_all(substring(text, 1, 60),"
                r" '\\b[a-z]{4}\\b', 0)"
            ),
            ",",
        ).alias("four_letter_head"),
    )


_GEO_MASK = (1 << 31) - 1  # 31-bit pre-mask (the fn_surrogate_key lesson)
_GEO_MULT = 2654435761
_GEO_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"  # geohash base32 (no a,i,l,o)


def _geohash_exprs(engine: str) -> dict[str, str]:
    """Engine-specific SQL strings for the geohash pipeline. Identical
    integer arithmetic; only the spellings differ (Spark: shiftleft/
    shiftright functions + DIV, DuckDB: << >> operators + //)."""
    div = "DIV" if engine == "spark" else "//"
    lat_q = f"((c_custkey & {_GEO_MASK}) * {_GEO_MULT} + 40503) % 180000000"
    lon_q = f"((c_custkey & {_GEO_MASK}) * {_GEO_MULT} + 99991) % 360000000"
    lat_i = f"(({lat_q}) * 32768) {div} 180000000"
    lon_i = f"(({lon_q}) * 32768) {div} 360000000"

    def shl(x: str, n: int) -> str:
        if engine == "spark":
            return f"shiftleft({x}, {n})"
        return f"(({x}) << {n})"

    def shr(x: str, n: int) -> str:
        if engine == "spark":
            return f"shiftright({x}, {n})"
        return f"(({x}) >> {n})"

    # interleave 15+15 bits, lon on even positions from the MSB
    # (geohash convention: the first bit is a longitude bit)
    terms = []
    for i in range(15):
        terms.append(shl(f"({shr('lon_i', i)} & 1)", 2 * i + 1))
        terms.append(shl(f"({shr('lat_i', i)} & 1)", 2 * i))
    gh30 = " + ".join(terms)  # disjoint bits: addition == OR
    chars = [
        f"substring('{_GEO_B32}', ({shr('gh30', 5 * (5 - j))} & 31) + 1, 1)"
        for j in range(6)
    ]
    return {
        "lat_i": lat_i,
        "lon_i": lon_i,
        "gh30": gh30,
        "geohash": "concat(" + ", ".join(chars) + ")",
    }


_GEO_DUCK = _geohash_exprs("duck")


@query(
    "fn_geohash",
    oracle=f"""
WITH q AS (
  SELECT c_custkey,
         CAST({_GEO_DUCK["lat_i"]} AS BIGINT) AS lat_i,
         CAST({_GEO_DUCK["lon_i"]} AS BIGINT) AS lon_i
  FROM customer
),
g AS (
  SELECT c_custkey, lat_i, lon_i,
         CAST({_GEO_DUCK["gh30"]} AS BIGINT) AS gh30
  FROM q
)
SELECT c_custkey, lat_i, lon_i, gh30,
       {_GEO_DUCK["geohash"]} AS geohash
FROM g
""",
    category="functions",
)
def fn_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encoding — the 30-bit lat/lon bit-interleave + base32
    spelling every geo-bucketing pipeline leans on (proximity joins
    cluster on a geohash prefix). Coordinates are synthesized
    deterministically from the customer key (Knuth hash onto the
    micro-degree domains, 31-bit pre-masked so the multiply stays in
    int64 on both engines), quantized to 15 bits per axis in PURE
    INTEGER arithmetic (value * 32768 // domain — no float anywhere),
    interleaved lon-first per the geohash convention via 30
    disjoint-bit shift-add terms, and spelled with the canonical
    base32 alphabet (a,i,l,o excluded). The twins share the exact
    same integer expression tree; only the shift spellings differ
    (Spark shiftleft/shiftright functions, DuckDB << >> operators —
    and Spark DIV vs DuckDB // for floor division). Map-only plan:
    one scan-speed projection, no shuffle, no UDF — the entire
    encode runs inside whole-stage codegen."""
    sx = _geohash_exprs("spark")
    c = table(spark, sf_dir, "customer")
    q = c.select(
        "c_custkey",
        F.expr(sx["lat_i"]).cast("long").alias("lat_i"),
        F.expr(sx["lon_i"]).cast("long").alias("lon_i"),
    )
    g = q.select(
        "c_custkey",
        "lat_i",
        "lon_i",
        F.expr(sx["gh30"]).cast("long").alias("gh30"),
    )
    return g.select(
        "c_custkey",
        "lat_i",
        "lon_i",
        "gh30",
        F.expr(sx["geohash"]).alias("geohash"),
    )


_ADLER_MOD = 65521  # largest prime < 2^16 (RFC 1950)


@query(
    "fn_adler32",
    oracle=f"""
WITH s AS (
  SELECT c_custkey, c_name,
         CAST(length(c_name) AS BIGINT) AS n,
         CAST(list_sum(list_transform(range(1, length(c_name) + 1),
              i -> ascii(substring(c_name, i, 1)))) AS BIGINT) AS sum1,
         CAST(list_sum(list_transform(range(1, length(c_name) + 1),
              i -> (length(c_name) - i + 1) * ascii(substring(c_name, i, 1))))
              AS BIGINT) AS wsum
  FROM customer
)
SELECT c_custkey, c_name, n,
       CAST((1 + sum1) % {_ADLER_MOD} AS BIGINT) AS a,
       CAST((n + wsum) % {_ADLER_MOD} AS BIGINT) AS b,
       CAST(((n + wsum) % {_ADLER_MOD}) * 65536
            + (1 + sum1) % {_ADLER_MOD} AS BIGINT) AS adler32
FROM s
""",
    category="functions",
)
def fn_adler32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adler-32 checksum (RFC 1950, the zlib integrity footer) of each
    customer name — the eighth from-spec byte-level codec surface
    (after CRC-32 in multimodal_png_parse): A = 1 + sum(bytes) mod
    65521, B = sum of A's prefix values mod 65521, checksum =
    B*65536 + A. The rolling B is CLOSED-FORMED into a position-
    weighted sum — B = (n + sum((n-i+1) * byte_i)) mod 65521 — so
    neither engine folds sequentially: both evaluate one weighted
    sum over the character positions (Spark: aggregate() over
    sequence(); DuckDB: list_sum over list_transform(range)), exact
    int64 throughout (name length <= 25, bytes < 128: the weighted
    sum tops out far under 2^53, no modular splitting needed).
    Verified against zlib.adler32 in tests/test_r11_stock.py.
    Map-only plan: no shuffle, no UDF."""
    c = table(spark, sf_dir, "customer")
    s = c.select(
        "c_custkey",
        "c_name",
        F.length("c_name").cast("long").alias("n"),
        F.expr(
            "aggregate(sequence(1, length(c_name)), 0L,"
            " (acc, i) -> acc + ascii(substring(c_name, i, 1)))"
        ).alias("sum1"),
        F.expr(
            "aggregate(sequence(1, length(c_name)), 0L,"
            " (acc, i) -> acc + (length(c_name) - i + 1)"
            " * ascii(substring(c_name, i, 1)))"
        ).alias("wsum"),
    )
    a = (1 + F.col("sum1")) % _ADLER_MOD
    b = (F.col("n") + F.col("wsum")) % _ADLER_MOD
    return s.select(
        "c_custkey",
        "c_name",
        "n",
        a.cast("long").alias("a"),
        b.cast("long").alias("b"),
        (b * 65536 + a).cast("long").alias("adler32"),
    )


def _hamming74_exprs(engine: str) -> dict[str, str]:
    """Engine-specific SQL for the Hamming(7,4) pipeline. The parity
    sums use (a + b + c) % 2 — NOT the xor operator, because DuckDB's
    ^ is exponentiation (its xor is a function) while Spark's ^ IS
    xor: sharing the arithmetic spelling sidesteps the whole trap.
    Bit flips are add/subtract of the bit's weight (flip = w - 2*bit*w
    added), again operator-portable. Only shifts differ (Spark
    shiftright function, DuckDB >>)."""

    def shr(x: str, n: int) -> str:
        if engine == "spark":
            return f"shiftright({x}, {n})"
        return f"(({x}) >> {n})"

    nib = "(event_id & 15)"
    d1 = f"({shr(nib, 3)} & 1)"
    d2 = f"({shr(nib, 2)} & 1)"
    d3 = f"({shr(nib, 1)} & 1)"
    d4 = f"({nib} & 1)"
    p1 = f"(({d1} + {d2} + {d4}) % 2)"
    p2 = f"(({d1} + {d3} + {d4}) % 2)"
    p3 = f"(({d2} + {d3} + {d4}) % 2)"
    # codeword bit layout: position i (1..7) carries weight 2^(7-i)
    cw = (
        f"({p1} * 64 + {p2} * 32 + {d1} * 16"
        f" + {p3} * 8 + {d2} * 4 + {d3} * 2 + {d4})"
    )
    err_pos = "(event_id % 7 + 1)"
    # weight of the corrupted position, then an arithmetic bit flip
    w = f"{shr('128', err_pos)}"  # 2^(7-err_pos)
    bit_at = f"({shr('codeword', f'7 - {err_pos}')} & 1)"
    rx = f"(codeword + {w} - 2 * {bit_at} * {w})"
    # syndrome parities from the RECEIVED word
    def rbit(i: int) -> str:
        return f"({shr('received', 7 - i)} & 1)"

    s1 = f"(({rbit(1)} + {rbit(3)} + {rbit(5)} + {rbit(7)}) % 2)"
    s2 = f"(({rbit(2)} + {rbit(3)} + {rbit(6)} + {rbit(7)}) % 2)"
    s3 = f"(({rbit(4)} + {rbit(5)} + {rbit(6)} + {rbit(7)}) % 2)"
    syn = f"({s1} + 2 * {s2} + 4 * {s3})"
    sw = f"{shr('128', 'syndrome')}"
    sbit = f"({shr('received', '7 - syndrome')} & 1)"
    corrected = f"(received + {sw} - 2 * {sbit} * {sw})"
    dec = (
        f"(({shr('corrected', 4)} & 1) * 8 + ({shr('corrected', 2)} & 1) * 4"
        f" + ({shr('corrected', 1)} & 1) * 2 + (corrected & 1))"
    )
    return {
        "nibble": nib,
        "codeword": cw,
        "err_pos": err_pos,
        "received": rx,
        "syndrome": syn,
        "corrected": corrected,
        "decoded": dec,
    }


_H74_DUCK = _hamming74_exprs("duck")


@query(
    "fn_hamming74",
    oracle=f"""
WITH c AS (
  SELECT event_id,
         CAST({_H74_DUCK["nibble"]} AS BIGINT) AS nibble,
         CAST({_H74_DUCK["codeword"]} AS BIGINT) AS codeword,
         CAST({_H74_DUCK["err_pos"]} AS BIGINT) AS err_pos
  FROM events
),
r AS (
  SELECT *, CAST({_H74_DUCK["received"]} AS BIGINT) AS received FROM c
),
s AS (
  SELECT *, CAST({_H74_DUCK["syndrome"]} AS BIGINT) AS syndrome FROM r
),
x AS (
  SELECT *, CAST({_H74_DUCK["corrected"]} AS BIGINT) AS corrected FROM s
)
SELECT event_id, nibble, codeword, err_pos, received, syndrome,
       corrected, CAST({_H74_DUCK["decoded"]} AS BIGINT) AS decoded,
       syndrome = err_pos AND {_H74_DUCK["decoded"]} = nibble AS ok
FROM x
""",
    category="functions",
)
def fn_hamming74(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming(7,4) error-correcting code round-trip — the
    single-bit-correction ECC every storage/transport layer leans on,
    run end-to-end in the engine: encode each event id's low nibble
    (3 parity bits from the standard {1,3,5,7}/{2,3,6,7}/{4,5,6,7}
    covers), corrupt ONE deterministic bit (position = event_id mod 7
    + 1), recompute the syndrome from the received word, correct, and
    decode — per row the query PROVES syndrome == corrupted position
    and decoded == original nibble (the `ok` column; pinned all-true
    by test). Every parity is an (a+b+c) % 2 sum and every bit flip
    an add/subtract of the bit weight, NOT xor — DuckDB's ^ operator
    is exponentiation while Spark's is xor, a silent cross-engine
    trap this query documents by construction. Map-only codegen
    plan: no shuffle, no UDF."""
    sx = _hamming74_exprs("spark")
    ev = table(spark, sf_dir, "events")
    c = ev.select(
        "event_id",
        F.expr(sx["nibble"]).cast("long").alias("nibble"),
        F.expr(sx["codeword"]).cast("long").alias("codeword"),
        F.expr(sx["err_pos"]).cast("long").alias("err_pos"),
    )
    r = c.select("*", F.expr(sx["received"]).cast("long").alias("received"))
    s = r.select("*", F.expr(sx["syndrome"]).cast("long").alias("syndrome"))
    x = s.select("*", F.expr(sx["corrected"]).cast("long").alias("corrected"))
    return x.select(
        "event_id",
        "nibble",
        "codeword",
        "err_pos",
        "received",
        "syndrome",
        "corrected",
        F.expr(sx["decoded"]).cast("long").alias("decoded"),
        (
            (F.col("syndrome") == F.col("err_pos"))
            & (F.expr(sx["decoded"]) == F.col("nibble"))
        ).alias("ok"),
    )


# ------------------------------------------------------------------ #
# r10 wave 5: table-driven check digits (Verhoeff, Damm, EAN-13) and
# the Hilbert space-filling index
# ------------------------------------------------------------------ #

# Verhoeff dihedral-group D5 tables (flattened row-major: [c][v] ->
# c*10 + v) and the inverse permutation.
_VF_D = [
    0,1,2,3,4,5,6,7,8,9, 1,2,3,4,0,6,7,8,9,5, 2,3,4,0,1,7,8,9,5,6,
    3,4,0,1,2,8,9,5,6,7, 4,0,1,2,3,9,5,6,7,8, 5,9,8,7,6,0,4,3,2,1,
    6,5,9,8,7,1,0,4,3,2, 7,6,5,9,8,2,1,0,4,3, 8,7,6,5,9,3,2,1,0,4,
    9,8,7,6,5,4,3,2,1,0,
]
_VF_P = [
    0,1,2,3,4,5,6,7,8,9, 1,5,7,6,2,8,3,0,9,4, 5,8,0,3,7,9,6,1,4,2,
    8,9,1,6,0,4,3,5,2,7, 9,4,5,3,1,2,6,8,7,0, 4,2,8,6,5,7,3,9,0,1,
    2,7,9,3,8,0,6,4,1,5, 7,0,4,6,9,1,3,2,5,8,
]
_VF_INV = [0, 4, 3, 2, 1, 5, 6, 7, 8, 9]

# Damm totally-antisymmetric quasigroup (flattened row-major).
_DAMM = [
    0,3,1,7,5,9,8,6,4,2, 7,0,9,2,1,5,4,8,6,3, 4,2,0,6,8,7,1,3,5,9,
    1,7,5,0,9,8,3,4,2,6, 6,1,2,3,0,4,5,9,7,8, 3,6,7,4,2,0,9,5,8,1,
    5,8,6,9,7,2,0,1,3,4, 8,9,4,5,3,6,2,0,1,7, 9,4,3,8,6,1,7,2,0,5,
    2,5,8,1,4,3,6,7,9,0,
]

_PAYLOAD_SQL = (
    "lpad(CAST(((c_custkey & 2147483647) * 2654435761) % 10000000000"
    " AS VARCHAR), 10, '0')"
)


def _arr(vals, duck: bool) -> str:
    body = ",".join(str(v) for v in vals)
    return f"[{body}]" if duck else f"array({body})"


def _idx(arr: str, i: str, duck: bool) -> str:
    return f"({arr})[{i}]" if duck else f"element_at({arr}, {i})"


def _digit(col: str, pos: int) -> str:
    return f"CAST(substr({col}, {pos}, 1) AS INT)"


def _verhoeff_c(col: str, width: int, start_i: int, duck: bool) -> str:
    """Unrolled Verhoeff state fold: digits right-to-left, position
    index i starting at `start_i` (1 for generation over the payload,
    0 for validation over payload||check)."""
    d, p = _arr(_VF_D, duck), _arr(_VF_P, duck)
    c = "0"
    for k in range(width):
        i = start_i + k
        dig = _digit(col, width - k)
        perm = _idx(p, f"{(i % 8) * 10} + {dig} + 1", duck)
        c = _idx(d, f"({c}) * 10 + {perm} + 1", duck)
    return c


def _damm_c(col: str, width: int, duck: bool) -> str:
    """Unrolled Damm quasigroup fold: digits left-to-right."""
    t = _arr(_DAMM, duck)
    c = "0"
    for pos in range(1, width + 1):
        c = _idx(t, f"({c}) * 10 + {_digit(col, pos)} + 1", duck)
    return c


def _checkdigit_oracle(name: str) -> str:
    duck = True
    inv = _arr(_VF_INV, duck)
    if name == "verhoeff":
        gen = f"{_idx(inv, f'({_verhoeff_c(chr(112) + chr(97) + chr(121), 10, 1, duck)}) + 1', duck)}"
        val = f"({_verhoeff_c('fullcode', 11, 0, duck)}) = 0"
    else:
        gen = _damm_c("pay", 10, duck)
        val = f"({_damm_c('fullcode', 11, duck)}) = 0"
    return f"""
WITH acct AS (
  SELECT c_custkey, c_mktsegment, {_PAYLOAD_SQL} AS pay FROM customer
),
gen AS (
  SELECT c_mktsegment, pay, CAST({gen} AS BIGINT) AS check_digit,
         pay || CAST({gen} AS VARCHAR) AS fullcode
  FROM acct
),
v AS (
  SELECT c_mktsegment, check_digit,
         CASE WHEN {val} THEN 1 ELSE 0 END AS ok
  FROM gen
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_accounts,
       CAST(SUM(ok) AS BIGINT) AS n_valid,
       CAST(SUM(check_digit) AS BIGINT) AS sum_check_digits,
       CAST(COUNT(DISTINCT check_digit) AS BIGINT) AS n_distinct_checks
FROM v GROUP BY c_mktsegment
"""


def _checkdigit_spark(spark, sf_dir, name: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    payload = F.lpad(
        (
            (F.col("c_custkey").bitwiseAND(2147483647) * F.lit(2654435761))
            % F.lit(10000000000)
        ).cast("string"),
        10,
        "0",
    )
    duck = False
    inv = _arr(_VF_INV, duck)
    if name == "verhoeff":
        gen = _idx(inv, f"({_verhoeff_c('pay', 10, 1, duck)}) + 1", duck)
        val = f"({_verhoeff_c('fullcode', 11, 0, duck)}) = 0"
    else:
        gen = _damm_c("pay", 10, duck)
        val = f"({_damm_c('fullcode', 11, duck)}) = 0"
    g = (
        c.select("c_mktsegment", payload.alias("pay"))
        .withColumn("check_digit", F.expr(gen).cast("long"))
        .withColumn(
            "fullcode", F.concat("pay", F.col("check_digit").cast("string"))
        )
    )
    v = g.withColumn(
        "ok", F.when(F.expr(val), 1).otherwise(0)
    )
    return v.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_accounts"),
        F.sum("ok").cast("long").alias("n_valid"),
        F.sum("check_digit").cast("long").alias("sum_check_digits"),
        F.countDistinct("check_digit").cast("long").alias(
            "n_distinct_checks"
        ),
    )


@query(
    "fn_verhoeff",
    oracle=_checkdigit_oracle("verhoeff"),
    category="functions",
)
def fn_verhoeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verhoeff dihedral-group check digit — the strongest classical
    single-digit scheme (catches ALL single-digit errors AND all
    adjacent transpositions, which Luhn misses for 09<->90): the
    D5 multiplication, permutation and inverse tables ride as
    literal flat arrays, and the position-dependent state fold is
    UNROLLED into a pure table-lookup expression chain (state depth
    10 for generation, 11 for round-trip validation) — identical
    element_at arithmetic in both engines, zero UDFs.  n_valid ==
    n_accounts is the self-authentication; generation (positions
    from 1) and validation (positions from 0) cannot share a bug.
    One codegen map + one segment rollup shuffle."""
    return _checkdigit_spark(spark, sf_dir, "verhoeff")


@query("fn_damm", oracle=_checkdigit_oracle("damm"), category="functions")
def fn_damm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damm quasigroup check digit — the modern alternative to
    Verhoeff (same error classes caught, no inverse/permutation
    tables: the totally antisymmetric quasigroup makes the final
    state itself the check digit, and appending it drives the fold
    to 0).  The 10x10 table rides as one literal array; generation
    is the left-to-right unrolled fold over the payload, validation
    the same fold over payload||check asserting state 0.  Same
    self-authenticating rollup shape as fn_verhoeff/fn_luhn."""
    return _checkdigit_spark(spark, sf_dir, "damm")


@query(
    "fn_ean13",
    oracle="""
WITH acct AS (
  SELECT c_custkey, c_mktsegment,
         lpad(CAST(((c_custkey & 2147483647) * 2654435761) % 1000000000000
              AS VARCHAR), 12, '0') AS pay
  FROM customer
),
gen AS (
  SELECT c_mktsegment, pay,
         (10 - list_sum(list_transform(generate_series(1, 12), j ->
            CASE WHEN j % 2 = 1 THEN CAST(substr(pay, j, 1) AS INT)
                 ELSE 3 * CAST(substr(pay, j, 1) AS INT) END)) % 10) % 10
           AS check_digit
  FROM acct
),
v AS (
  SELECT c_mktsegment, check_digit,
         pay || CAST(check_digit AS VARCHAR) AS fullcode,
         substr(pay, 1, 4)
           || CAST((CAST(substr(pay, 5, 1) AS INT) + 1) % 10 AS VARCHAR)
           || substr(pay, 6, 7) || CAST(check_digit AS VARCHAR) AS mutated
  FROM gen
),
chk AS (
  SELECT c_mktsegment, check_digit,
         CASE WHEN list_sum(list_transform(generate_series(1, 13), j ->
            CASE WHEN j % 2 = 1 THEN CAST(substr(fullcode, j, 1) AS INT)
                 ELSE 3 * CAST(substr(fullcode, j, 1) AS INT) END)) % 10 = 0
              THEN 1 ELSE 0 END AS ok,
         CASE WHEN list_sum(list_transform(generate_series(1, 13), j ->
            CASE WHEN j % 2 = 1 THEN CAST(substr(mutated, j, 1) AS INT)
                 ELSE 3 * CAST(substr(mutated, j, 1) AS INT) END)) % 10 = 0
              THEN 1 ELSE 0 END AS ok_mutated
  FROM v
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_codes,
       CAST(SUM(ok) AS BIGINT) AS n_valid,
       CAST(SUM(ok_mutated) AS BIGINT) AS n_valid_mutated,
       CAST(SUM(check_digit) AS BIGINT) AS sum_check_digits
FROM chk GROUP BY c_mktsegment
""",
    category="functions",
)
def fn_ean13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAN-13 / GTIN check digit (ISO/IEC 15420) — the barcode
    weighted mod-10 scheme (weights 1,3 alternating): generation
    over a synthetic 12-digit payload, round-trip validation of the
    13-digit code, AND a single-digit MUTATION probe (digit 5
    bumped +1 mod 10) — EAN-13 provably catches every single-digit
    error, so n_valid == n_codes and n_valid_mutated == 0 are both
    asserted structure, not fixture luck.  Pure digit folds, one
    rollup shuffle."""
    c = table(spark, sf_dir, "customer")
    pay = F.lpad(
        (
            (F.col("c_custkey").bitwiseAND(2147483647) * F.lit(2654435761))
            % F.lit(1000000000000)
        ).cast("string"),
        12,
        "0",
    )

    def wsum(col: str, width: int) -> str:
        return (
            f"aggregate(transform(sequence(1, {width}), j -> "
            f"IF(j % 2 = 1, CAST(substr({col}, j, 1) AS INT), "
            f"3 * CAST(substr({col}, j, 1) AS INT))), 0, (a, x) -> a + x)"
        )

    g = c.select("c_mktsegment", pay.alias("pay")).withColumn(
        "check_digit",
        ((10 - F.expr(wsum("pay", 12)) % 10) % 10).cast("long"),
    )
    v = g.withColumn(
        "fullcode", F.concat("pay", F.col("check_digit").cast("string"))
    ).withColumn(
        "mutated",
        F.concat(
            F.expr("substr(pay, 1, 4)"),
            ((F.expr("CAST(substr(pay, 5, 1) AS INT)") + 1) % 10).cast(
                "string"
            ),
            F.expr("substr(pay, 6, 7)"),
            F.col("check_digit").cast("string"),
        ),
    )
    chk = v.select(
        "c_mktsegment",
        "check_digit",
        F.when(F.expr(wsum("fullcode", 13)) % 10 == 0, 1).otherwise(0).alias(
            "ok"
        ),
        F.when(F.expr(wsum("mutated", 13)) % 10 == 0, 1)
        .otherwise(0)
        .alias("ok_mutated"),
    )
    return chk.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_codes"),
        F.sum("ok").cast("long").alias("n_valid"),
        F.sum("ok_mutated").cast("long").alias("n_valid_mutated"),
        F.sum("check_digit").cast("long").alias("sum_check_digits"),
    )


def _hilbert_sql(intdiv: str) -> str:
    """One SQL text computing the order-8 Hilbert index (xy2d) AND
    its inverse (d2xy) as two chained 8-level CTE walks, ending in a
    round-trip assertion.  `intdiv` is the engine's integer-division
    operator (Spark DIV / DuckDB //; operands non-negative, so both
    are plain truncation)."""
    ctes = [
        "h0 AS (SELECT c_custkey, c_custkey % 256 AS x0,"
        " (c_custkey * 7) % 256 AS y0, c_custkey % 256 AS x,"
        " (c_custkey * 7) % 256 AS y, 0 AS d FROM customer)"
    ]
    lvl = 0
    # forward rotation reflects by the FULL grid (n-1 = 255), per the
    # standard xy2d; the inverse below reflects by the level's s.
    for s in (128, 64, 32, 16, 8, 4, 2, 1):
        prev, lvl = f"h{lvl}", lvl + 1
        ctes.append(f"""h{lvl} AS (
  SELECT c_custkey, x0, y0,
         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 255 - y
                                     ELSE y END) ELSE x END AS x,
         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 255 - x
                                     ELSE x END) ELSE y END AS y,
         d + {s * s} * (CASE WHEN rx = 0 AND ry = 0 THEN 0
                             WHEN rx = 0 AND ry = 1 THEN 1
                             WHEN rx = 1 AND ry = 1 THEN 2
                             ELSE 3 END) AS d
  FROM (SELECT c_custkey, x0, y0, x, y, d,
               CASE WHEN x % {2 * s} >= {s} THEN 1 ELSE 0 END AS rx,
               CASE WHEN y % {2 * s} >= {s} THEN 1 ELSE 0 END AS ry
        FROM {prev}) t{lvl})""")
    ctes.append(
        f"g0 AS (SELECT c_custkey, d AS hd, 0 AS x, 0 AS y, d AS t"
        f" FROM h{lvl})"
    )
    glvl = 0
    for s in (1, 2, 4, 8, 16, 32, 64, 128):
        prev, glvl = f"g{glvl}", glvl + 1
        ctes.append(f"""g{glvl} AS (
  SELECT c_custkey, hd,
         (CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s} - 1 - y
                                      ELSE y END) ELSE x END)
           + {s} * rx AS x,
         (CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s} - 1 - x
                                      ELSE x END) ELSE y END)
           + {s} * ry AS y,
         t {intdiv} 4 AS t
  FROM (SELECT c_custkey, hd, x, y, t,
               CASE WHEN t % 4 = 2 OR t % 4 = 3 THEN 1 ELSE 0 END AS rx,
               CASE WHEN t % 4 = 1 OR t % 4 = 2 THEN 1 ELSE 0 END AS ry
        FROM {prev}) u{glvl})""")
    return f"""
WITH {", ".join(ctes)}
SELECT f.c_custkey,
       CAST(f.x0 AS BIGINT) AS x, CAST(f.y0 AS BIGINT) AS y,
       CAST(f.d AS BIGINT) AS hilbert_d,
       CAST(CASE WHEN inv.x = f.x0 AND inv.y = f.y0 THEN 1 ELSE 0 END
         AS INT) AS ok_roundtrip
FROM h{lvl} f JOIN g{glvl} inv ON inv.c_custkey = f.c_custkey
"""


@query(
    "fn_hilbert_curve",
    oracle=_hilbert_sql("//"),
    category="functions",
)
def fn_hilbert_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-8 Hilbert space-filling index over a 256x256 grid — the
    locality-preserving alternative to fn_zorder_key's Morton
    interleave (Hilbert keeps ALL curve-adjacent cells spatially
    adjacent, the property data-layout clustering and range-sharded
    spatial indexes want): the xy2d walk is 8 chained
    reflect-swap-accumulate levels of pure integer CASE arithmetic,
    and the INVERSE d2xy walk re-derives (x, y) from the index in
    the same query — ok_roundtrip == 1 everywhere is the
    self-authentication (any slip in either walk's rotation algebra
    breaks the bijection).  Identical SQL text runs on both engines
    (only the integer-division token differs); Spark executes it as
    entry-point-2 SQL over a temp view, one codegen map per level,
    one self-join on custkey at the end.  At 100 TB the index is a
    scan-speed derived column feeding a range repartition."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_hilbert_sql("DIV"))


_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_B58_DIGITS = 6  # 58^6 > 1e10, the payload domain


def _base58_sql(strpos_fn: str) -> str:
    """Fixed-width base58 encode of the Knuth payload plus the
    polynomial decode round trip — one SQL text, parameterized only
    by the engine's strpos function name (instr / strpos)."""
    enc_chars = ", ".join(
        f"substr('{_B58_ALPHABET}',"
        f" CAST((v {{idiv}} {58 ** (_B58_DIGITS - 1 - k)}) % 58 AS INT)"
        f" + 1, 1)"
        for k in range(_B58_DIGITS)
    )
    dec_terms = " + ".join(
        f"CAST({strpos_fn}('{_B58_ALPHABET}', substr(code, {k + 1}, 1)) - 1"
        f" AS BIGINT) * {58 ** (_B58_DIGITS - 1 - k)}"
        for k in range(_B58_DIGITS)
    )
    return f"""
WITH pay AS (
  SELECT c_custkey, c_mktsegment,
         CAST(((c_custkey & 2147483647) * 2654435761) % 10000000000
           AS BIGINT) AS v
  FROM customer
),
enc AS (
  SELECT c_custkey, c_mktsegment, v,
         concat({enc_chars}) AS code
  FROM pay
),
dec AS (
  SELECT c_mktsegment, v, code,
         CAST({dec_terms} AS BIGINT) AS v_back
  FROM enc
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_codes,
       CAST(SUM(CASE WHEN v_back = v THEN 1 ELSE 0 END) AS BIGINT)
         AS n_roundtrip,
       CAST(COUNT(DISTINCT code) AS BIGINT) AS n_distinct_codes,
       MIN(code) AS min_code, MAX(code) AS max_code
FROM dec GROUP BY c_mktsegment
"""


@query(
    "fn_base58",
    oracle=_base58_sql("strpos").replace("{idiv}", "//"),
    category="functions",
)
def fn_base58(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base58 encode/decode round trip (the Bitcoin/IPFS alphabet —
    no 0/O/I/l, so codes survive human transcription): fixed-width
    6-symbol encoding of the Knuth payload by unrolled divmod
    (58^6 > the 1e10 payload domain), decoded back by the unrolled
    polynomial over alphabet positions — n_roundtrip == n_codes is
    the self-authentication, and n_distinct_codes == n_codes
    certifies injectivity on the fixture.  Base58's defining
    property vs base64 is ORDER PRESERVATION with a sorted alphabet
    is NOT guaranteed (the alphabet skips characters), hence the
    min/max code columns pin lexical behavior cross-engine.  Pure
    substr/arithmetic codegen; one rollup shuffle."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_base58_sql("instr").replace("{idiv}", "DIV"))
