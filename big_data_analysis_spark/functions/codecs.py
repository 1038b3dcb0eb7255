"""Byte/string codec scalar functions (split out of the r9-era
screening.py catch-all per VERDICT r10 item 6): base64 dialect
round-trip checks and the ISO 7064 mod-97 check digit (IBAN-style),
both as pure JVM expression chains with exact integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import query


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
