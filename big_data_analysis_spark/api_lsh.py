"""Deterministic-LSH and private-release kernels on caller
DataFrames (r11; split module — the api facade re-imports by name):
md5-keyed MinHash signatures and banded near-dup pairs with exact
cross-multiplied Jaccard verify, shingle SimHash signatures, and
two-sided-geometric DP released counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shingle_rows(
    df: DataFrame, id_col: str, text_col: str, shingle: int, out_id: str
) -> DataFrame:
    """(out_id, shingle) DISTINCT rows of `shingle`-token shingles.

    r13 (guide §1.1, measured): the token array is BOUND as a
    projected column before the transform lambda references it — the
    old inlined `slice(split(text, ' '), ...)` form re-split the
    document once PER SHINGLE ELEMENT (O(tokens^2) per doc; measured
    6x slower on the fixture corpus for the dedup twins).  Identical
    output strings: concat over explicit 0-based element reads
    equals concat_ws over the slice."""
    gram = " , ' ', ".join(f"__tk[i + {j} - 1]" for j in range(shingle))
    return (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias(out_id),
            F.split(F.col(text_col), " ").alias("__tk"),
        )
        .where(F.size("__tk") >= shingle)
        .select(
            out_id,
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(__tk) - {shingle - 1}),"
                    f" i -> concat({gram}))"
                )
            ).alias("shingle"),
        )
        .distinct()
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    shingle: int = 3,
) -> DataFrame:
    """Deterministic MinHash signatures: one row per input row with
    `n_sh` (distinct shingle count) and minhash columns m0..m{k-1},
    each the min over the row's `shingle`-token shingles of a salted
    md5 60-bit integer.  No RNG, no engine-private hash family — the
    same text yields the same signature on any engine or cluster.
    One explode + one groupBy (map-side partial mins)."""
    sh = _shingle_rows(df, id_col, text_col, shingle, "__mh_id")
    hashed = sh.select(
        "__mh_id",
        *[
            F.expr(
                f"CAST(conv(substring(md5(concat('{i}|', shingle)), 1, 15),"
                f" 16, 10) AS BIGINT)"
            ).alias(f"h{i}")
            for i in range(k)
        ],
    )
    return (
        hashed.groupBy("__mh_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sh"),
            *[F.min(f"h{i}").alias(f"m{i}") for i in range(k)],
        )
        .withColumnRenamed("__mh_id", id_col)
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    rows_per_band: int = 2,
    shingle: int = 3,
    tau_num: int = 1,
    tau_den: int = 2,
) -> DataFrame:
    """Banded MinHash-LSH near-dup pairs with exact Jaccard verify at
    tau = tau_num/tau_den, decided by the cross-multiplied integer
    rule (tau_den*inter >= tau_num*union <=> (tau_num+tau_den)*inter
    >= tau_num*(|A|+|B|)) — never a float.  Candidates come from ONE
    self-equi-join on (band_id, band_key): hash-partitioned, never
    doc x doc (the dedup_minhash_exact kernel on caller data)."""
    assert k % rows_per_band == 0
    n_bands = k // rows_per_band
    sig = minhash_signatures(df, id_col, text_col, k=k, shingle=shingle)
    sh = _shingle_rows(df, id_col, text_col, shingle, "__sh_id")
    bands = sig.select(
        F.col(id_col).alias("__b_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"m{b * rows_per_band + r}").cast(
                                    "string"
                                )
                                for r in range(rows_per_band)
                            ],
                        ).alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("__b_id", "bk.band_id", "bk.band_key")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.__b_id") < F.col("b.__b_id")),
        )
        .select(
            F.col("a.__b_id").alias("id_a"), F.col("b.__b_id").alias("id_b")
        )
        .distinct()
    )
    cand_ids = cand.select(
        F.explode(F.array("id_a", "id_b")).alias("__sh_id")
    ).distinct()
    sh_c = sh.join(F.broadcast(cand_ids), "__sh_id")
    sa, sb = sh_c.alias("sa"), sh_c.alias("sb")
    inter = (
        cand.join(sa, F.col("sa.__sh_id") == F.col("id_a"))
        .join(
            sb,
            (F.col("sb.__sh_id") == F.col("id_b"))
            & (F.col("sb.shingle") == F.col("sa.shingle")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter_cnt"))
    )
    na = sig.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sig.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .where(
            (tau_num + tau_den) * F.col("inter_cnt")
            >= tau_num * (F.col("n_a") + F.col("n_b"))
        )
        .select(
            "id_a",
            "id_b",
            "inter_cnt",
            "n_a",
            "n_b",
            (
                F.col("inter_cnt").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("inter_cnt"))
            ).alias("jaccard"),
        )
    )


def simhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    bits: int = 32,
    shingle: int = 3,
) -> DataFrame:
    """Deterministic Charikar SimHash over shingle features: adds a
    `simhash` BIGINT column (bit b = sign of the +/-1 vote sum over
    the row's distinct shingles, votes from salted-md5).  One explode
    + one groupBy."""
    sh = _shingle_rows(df, id_col, text_col, shingle, "__sx_id")
    hashed = sh.select(
        "__sx_id",
        F.expr(
            "CAST(conv(substring(md5(concat('sh|', shingle)), 1, 15), 16, 10)"
            " AS BIGINT)"
        ).alias("h"),
    )
    return (
        hashed.groupBy("__sx_id")
        .agg(
            F.expr(
                " + ".join(
                    f"(CASE WHEN SUM(((h >> {b}) & 1) * 2 - 1) >= 0"
                    f" THEN CAST(1 AS BIGINT) ELSE 0 END) * {1 << b}"
                    for b in range(bits)
                )
            ).alias("simhash")
        )
        .withColumnRenamed("__sx_id", id_col)
    )


def dp_noisy_counts(
    df: DataFrame, key_cols: list[str], *, salt: str = "dp"
) -> DataFrame:
    """Epsilon-DP (eps=1) released counts per key group via the
    two-sided-geometric mechanism: inverse-CDF over a 40-bit md5
    uniform keyed on (salt, group key) against an exact integer
    literal threshold table — deterministic, replayable, no engine
    ever evaluates exp/ln.  Swap the salt for a secret in production.
    Adds true_cnt / noise / released_cnt."""
    from .plans.experiment import _dp_noise_case

    base = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("true_cnt")
    )
    keyexpr = "concat_ws('|', " + ", ".join(
        f"CAST({c} AS STRING)" for c in key_cols
    ) + ")"
    noised = base.withColumn(
        "u",
        F.expr(
            f"CAST(conv(substring(md5(concat('{salt}|', {keyexpr})), 1, 10),"
            f" 16, 10) AS BIGINT)"
        ),
    )
    noise = _dp_noise_case("u")
    return noised.select(
        *key_cols,
        "true_cnt",
        F.expr(noise).alias("noise"),
        F.expr(f"GREATEST(CAST(0 AS BIGINT), true_cnt + ({noise}))").alias(
            "released_cnt"
        ),
    )
