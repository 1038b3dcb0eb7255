"""Checksum / encoding / integer-algorithm scalar functions (split
from scalar.py per VERDICT r10 item 6's module-size cap): Luhn,
Verhoeff, Damm, EAN-13 and ISO 7064 check digits, Adler-32,
Hamming(7,4) ECC, base conversion, base58, deterministic UUIDv5-style
hashing, Geohash encoding, Hilbert-curve indexing, IPv4/CIDR math,
ISO-8601 date algebra, advanced regexp/string manipulation, array
set-ops and the SQL GROUP BY ALL / null-semantics showcases — all
pure JVM expression chains (zero Python UDFs) with exact integer
arithmetic so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import query


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


# ------------------------------------------------------------------ #
# RFC 4648 base32 (r11 wave 2)
# ------------------------------------------------------------------ #

_B32_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
_B32_CHARS = 8  # one full quantum: 40 bits -> 8 symbols, no padding


def _base32_sql(strpos_fn: str) -> str:
    """RFC 4648 base32 over a 40-bit md5-derived payload (exactly one
    5-byte quantum, so no '=' padding cases) plus the polynomial
    decode round trip — one SQL text, parameterized by the engine's
    strpos function and {idiv}/{hex2int} tokens."""
    enc_chars = ", ".join(
        f"substr('{_B32_ALPHABET}',"
        f" CAST((v {{idiv}} {32 ** (_B32_CHARS - 1 - k)}) % 32 AS INT)"
        f" + 1, 1)"
        for k in range(_B32_CHARS)
    )
    dec_terms = " + ".join(
        f"CAST({strpos_fn}('{_B32_ALPHABET}', substr(code, {k + 1}, 1)) - 1"
        f" AS BIGINT) * {32 ** (_B32_CHARS - 1 - k)}"
        for k in range(_B32_CHARS)
    )
    return f"""
WITH pay AS (
  SELECT c_custkey, c_mktsegment,
         {{hex2int}} AS v
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


_B32_HEX_SPARK = (
    "CAST(conv(substring(md5(c_name), 1, 10), 16, 10) AS BIGINT)"
)
_B32_HEX_DUCK = (
    "CAST(('0x' || substring(md5(c_name), 1, 10)) AS BIGINT)"
)


@query(
    "fn_base32",
    oracle=_base32_sql("strpos")
    .replace("{idiv}", "//")
    .replace("{hex2int}", _B32_HEX_DUCK),
    category="functions",
)
def fn_base32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 4648 base32 encode/decode round trip — the case-robust
    identifier encoding (DNS labels, TOTP secrets, content
    addresses) next to fn_base58/fn_base64: a 40-bit md5-derived
    payload per customer is exactly one 5-byte base32 quantum, so
    the 8-symbol code needs no '=' padding branch, the unrolled
    divmod encode and strpos-polynomial decode are pure integer
    codegen, and n_roundtrip == n_codes self-authenticates while
    n_distinct_codes certifies injectivity on the fixture.  Base32
    WITH the RFC alphabet preserves unsigned numeric order
    lexically (A<B<...<2<...<7 maps 0<1<...<31 in order) — the
    min/max code columns pin that property cross-engine.  One
    rollup shuffle; everything else is a per-row map."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        _base32_sql("instr")
        .replace("{idiv}", "DIV")
        .replace("{hex2int}", _B32_HEX_SPARK)
    )
