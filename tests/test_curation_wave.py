"""Semantic tests for the r7 curation + statistics wave — invariants
the oracle-parity check can't express: subset nesting, curriculum
phase balance, transcript caps, anomaly-decision integer purity, and
statistic-definition cross-checks against pure Python/NumPy."""

import pytest
from pyspark.sql import functions as F

from big_data_analysis_spark.registry import load_all

REG = load_all()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir)


def test_ablation_subsets_nest(spark, sf_dir):
    """The 10% manifest must be a strict prefix of 25% of 50% of 100%
    (same hash bucket, increasing threshold): counts and token mass
    monotone, 100% == the full corpus."""
    rows = {r.pct: r for r in run("pipeline_ablation_grid", spark, sf_dir).collect()}
    assert sorted(rows) == [10, 25, 50, 100]
    for lo, hi in [(10, 25), (25, 50), (50, 100)]:
        assert rows[lo].n_docs <= rows[hi].n_docs
        assert rows[lo].total_tokens <= rows[hi].total_tokens
    full = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert rows[100].n_docs == full
    # the hash is uniform enough that 10% lands within ±50% relative
    assert 0.05 * full <= rows[10].n_docs <= 0.15 * full or full < 100


def test_ablation_membership_is_nested_per_doc(spark, sf_dir):
    """Row-level nesting: every doc in the 10% subset is in the 25%
    subset (the property that makes scaling-law curves comparable)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    bucket = (F.col("doc_id") * 2654435761) % (1 << 32)
    m10 = {r.doc_id for r in d.where(bucket * 100 < 10 * (1 << 32)).collect()}
    m25 = {r.doc_id for r in d.where(bucket * 100 < 25 * (1 << 32)).collect()}
    assert m10 <= m25 and len(m10) < len(m25)


def test_curriculum_phases_balanced(spark, sf_dir):
    """ntile(4) phase populations differ by at most 1 doc, and
    difficulty ranges are non-overlapping in phase order (shortest
    docs in phase 1)."""
    rows = run("pipeline_curriculum", spark, sf_dir).collect()
    by_phase = {}
    for r in rows:
        p = by_phase.setdefault(r.phase, {"n": 0, "lo": 1 << 60, "hi": -1})
        p["n"] += r.n_docs
        p["lo"] = min(p["lo"], r.min_difficulty)
        p["hi"] = max(p["hi"], r.max_difficulty)
    assert sorted(by_phase) == [1, 2, 3, 4]
    counts = [by_phase[p]["n"] for p in sorted(by_phase)]
    assert max(counts) - min(counts) <= 1
    for p in (1, 2, 3):
        # boundary docs may share a token count; ranges must not invert
        assert by_phase[p]["hi"] <= by_phase[p + 1]["hi"]
        assert by_phase[p]["lo"] <= by_phase[p + 1]["lo"]


def test_rejection_sample_picks_argmax(spark, sf_dir):
    """Every pool's winner has the pool-max score (doc_id tie-break):
    re-derive pools in plain PySpark and compare winner counts."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    cand = d.select(
        F.expr("doc_id DIV 4").alias("prompt_id"),
        (F.size(F.array_distinct(toks)).cast("long") * 1000000).alias("s"),
        F.size(toks).alias("n"),
    ).withColumn("score", F.expr("s DIV n"))
    n_pools = cand.select("prompt_id").distinct().count()
    out = run("pipeline_rejection_sample", spark, sf_dir).collect()
    assert sum(r.n_prompts for r in out) == n_pools
    # mean_score is sum/count of exact ints
    for r in out:
        assert r.min_score <= r.mean_score <= 1000000


def test_sft_transcripts_capped_and_role_sums(spark, sf_dir):
    rows = run("pipeline_sft_transcripts", spark, sf_dir).collect()
    assert rows, "no sessions"
    for r in rows:
        assert 1 <= r.n_turns <= 20
        assert r.n_user_turns + r.n_assistant_turns <= r.n_turns
        assert len(r.transcript.split(" | ")) == r.n_turns
        for turn in r.transcript.split(" | "):
            role, etype = turn.split(":")
            assert role in ("user", "assistant", "system")


def test_rrf_fusion_scores_decrease(spark, sf_dir):
    rows = sorted(
        run("pipeline_rrf_fusion", spark, sf_dir).collect(),
        key=lambda r: r.fused_rank,
    )
    assert len(rows) <= 20
    for a, b in zip(rows, rows[1:]):
        assert (a.rrf_score, -a.doc_id) >= (b.rrf_score, -b.doc_id)
    for r in rows:
        expect = (1.0 / (60 + r.rank_a) if r.rank_a else 0.0) + (
            1.0 / (60 + r.rank_b) if r.rank_b else 0.0
        )
        assert r.rrf_score == expect  # bit-exact: same two IEEE ops


def test_ngram_coverage_bounds(spark, sf_dir):
    rows = run("pipeline_ngram_coverage", spark, sf_dir).collect()
    assert rows, "no eval docs"
    for r in rows:
        assert 0 <= r.n_covered <= r.n_eval_grams
        assert r.coverage == pytest.approx(r.n_covered / r.n_eval_grams)


def test_kendall_tau_matches_scipy_free_python(spark, sf_dir):
    """Re-derive tau-b's concordance counts in pure Python over the
    collected daily grid — definition-level cross-check."""
    import duckdb

    con = duckdb.connect()
    grid = con.execute(
        f"""
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) d,
               CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) x
        FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2
        """
    ).fetchall()
    a = {d: x for et, d, x in grid if et == "click"}
    b = {d: x for et, d, x in grid if et == "purchase"}
    days = sorted(set(a) & set(b))
    nc = nd = ta = tb = npairs = 0
    for i in range(len(days)):
        for j in range(i + 1, len(days)):
            da, db_ = a[days[j]] - a[days[i]], b[days[j]] - b[days[i]]
            npairs += 1
            if da * db_ > 0:
                nc += 1
            elif da * db_ < 0:
                nd += 1
            if da == 0:
                ta += 1
            if db_ == 0:
                tb += 1
    r = run("agg_kendall_tau", spark, sf_dir).collect()[0]
    assert (r.n_concordant, r.n_discordant, r.n_tie_a, r.n_tie_b, r.n_pairs) == (
        nc, nd, ta, tb, npairs,
    )


def test_mann_kendall_sign_convention(spark, sf_dir):
    """S must equal the pure-Python pair walk, and var18 must carry
    the tie correction."""
    import duckdb

    con = duckdb.connect()
    grid = con.execute(
        f"""
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) d,
               CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) x
        FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2
        """
    ).fetchall()
    series = {}
    for et, d, x in grid:
        series.setdefault(et, []).append((d, x))
    out = {r.event_type: r for r in run("agg_mann_kendall", spark, sf_dir).collect()}
    for et, pts in series.items():
        pts.sort()
        xs = [x for _, x in pts]
        s = sum(
            (0 if xs[j] == xs[i] else (1 if xs[j] > xs[i] else -1))
            for i in range(len(xs))
            for j in range(i + 1, len(xs))
        )
        n = len(xs)
        from collections import Counter

        ties = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(xs).values() if t > 1
        )
        r = out[et]
        assert r.s_stat == s and r.n_days == n
        assert r.var18 == n * (n - 1) * (2 * n + 5) - ties


def test_zscore_anomaly_decision_is_integer_pure(spark, sf_dir):
    """The is_anomaly flag must equal the z-score rule recomputed
    INDEPENDENTLY from the raw events (trailing-7 frame excluding the
    current day): exactly, via unbounded Python ints on the integer
    identity n*(n*x-s)^2 > 4*n*(n*ss-s^2); and as floats, via
    |x-mu| > 2*sigma wherever the margin is clear of the boundary.
    The plan must contain no Python stage (pure JVM window +
    codegen decision)."""
    import duckdb

    con = duckdb.connect()
    grid = con.execute(
        f"""
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) d,
               CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) x
        FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series = {}
    for et, d, x in grid:
        series.setdefault(et, []).append((d.isoformat(), int(x)))

    df = run("win_zscore_anomaly", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    rows = df.collect()
    assert rows
    got = {(r.event_type, r.day): r for r in rows}

    n_checked = 0
    for et, seq in series.items():
        for i in range(7, len(seq)):
            day, x = seq[i]
            window = [v for _, v in seq[i - 7 : i]]
            n, s, ss = 7, sum(window), sum(v * v for v in window)
            r = got[(et, day)]
            assert (r.x, r.n, r.s) == (x, n, s)
            exact = n * (n * x - s) ** 2 > 4 * n * (n * ss - s * s)
            assert r.is_anomaly == int(exact), (et, day)
            mu = s / n
            sigma = ((ss / n) - mu * mu) ** 0.5
            margin = abs(abs(x - mu) - 2 * sigma)
            if margin > 1e-6 * max(1.0, sigma):
                assert r.is_anomaly == int(abs(x - mu) > 2 * sigma), (et, day)
            n_checked += 1
    assert n_checked == len(rows)  # every output row was verified


def test_runs_test_run_count(spark, sf_dir):
    """n_runs must equal a pure-Python run count over the daily
    up/down sign sequence."""
    import duckdb

    con = duckdb.connect()
    grid = con.execute(
        f"""
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) d,
               CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) x
        FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series = {}
    for et, d, x in grid:
        series.setdefault(et, []).append(x)
    out = {r.event_type: r for r in run("agg_runs_test", spark, sf_dir).collect()}
    for et, xs in series.items():
        signs = [
            1 if b > a else -1 for a, b in zip(xs, xs[1:]) if b != a
        ]
        if not signs:
            assert et not in out
            continue
        runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        r = out[et]
        assert r.n_runs == runs
        assert r.n_up == sum(1 for s in signs if s == 1)
        assert r.n_down == sum(1 for s in signs if s == -1)


def test_seasonal_error_vs_python(spark, sf_dir):
    import duckdb

    con = duckdb.connect()
    grid = con.execute(
        f"""
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) d,
               CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) x
        FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series = {}
    for et, d, x in grid:
        series.setdefault(et, []).append(x)
    out = {r.event_type: r for r in run("win_seasonal_error", spark, sf_dir).collect()}
    for et, xs in series.items():
        errs = [abs(b - a) for a, b in zip(xs, xs[7:])]
        if not errs:
            assert et not in out
            continue
        r = out[et]
        assert r.n_scored == len(errs)
        assert r.sum_abs_err_cents == sum(errs)
        assert r.max_abs_err_cents == max(errs)


def test_cohens_kappa_identity(spark, sf_dir):
    """kappa from the closed form must match the po/pe definition."""
    r = run("agg_cohens_kappa", spark, sf_dir).collect()[0]
    n = r.n11 + r.n10 + r.n01 + r.n00
    po = (r.n11 + r.n00) / n
    pe = ((r.n11 + r.n10) * (r.n11 + r.n01) + (r.n01 + r.n00) * (r.n10 + r.n00)) / (
        n * n
    )
    assert r.kappa == pytest.approx((po - pe) / (1 - pe), rel=1e-12)


def test_luhn_matches_pure_python(spark, sf_dir):
    """The generated check digits must satisfy the canonical Python
    Luhn validator (the two in-query folds could not share a parity
    bug with this third implementation)."""

    def luhn_valid(number: str) -> bool:
        total = 0
        for idx, ch in enumerate(reversed(number)):
            d = int(ch)
            if idx % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    rows = run("fn_luhn_checksum", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_valid == r.n_accounts
    # independently re-generate a few accounts and validate
    for custkey in (1, 2, 3, 17, 99):
        payload = str((custkey * 2654435761) % 10_000_000_000).zfill(10)
        s = 0
        for idx, ch in enumerate(reversed(payload)):
            d = int(ch)
            if idx % 2 == 0:  # will sit at odd position once check appended
                d *= 2
                if d > 9:
                    d -= 9
            s += d
        check = (10 - s % 10) % 10
        assert luhn_valid(payload + str(check)), (payload, check)


def test_join_strategy_hints_change_physical_plan(spark, sf_dir):
    """The hinted twins must actually produce different physical
    operators for the same logical join."""
    import big_data_analysis_spark.operators.joins as J
    from big_data_analysis_spark.io import table
    import pyspark.sql.functions as F

    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    sh = l.join(o.hint("shuffle_hash"), l["l_orderkey"] == o["o_orderkey"])
    sm = l.join(o.hint("merge"), l["l_orderkey"] == o["o_orderkey"])
    sh_plan = sh._sc._jvm.PythonSQLUtils.explainString(
        sh._jdf.queryExecution(), "formatted"
    )
    sm_plan = sm._sc._jvm.PythonSQLUtils.explainString(
        sm._jdf.queryExecution(), "formatted"
    )
    assert "ShuffledHashJoin" in sh_plan
    assert "SortMergeJoin" in sm_plan and "ShuffledHashJoin" not in sm_plan


def test_medallion_ledger_conserves_mass(spark, sf_dir):
    rows = {r.layer: r for r in run("pipeline_medallion", spark, sf_dir).collect()}
    assert set(rows) == {"bronze", "silver", "gold"}
    assert rows["silver"].n_rows <= rows["bronze"].n_rows
    assert rows["gold"].cents == rows["silver"].cents  # rollup conserves cents
    assert rows["gold"].id_checksum == rows["silver"].n_rows  # sum(n) == rows


def test_matryoshka_prefix_is_consistent_subvector(spark, sf_dir):
    """prefix cosine must equal the exact quantized dot of the first
    16 dims, recomputed in NumPy."""
    import numpy as np

    emb = {
        r.vec_id: np.array(r.embedding, dtype="float64")
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .where("vec_id < 60")
        .collect()
    }
    out = run("vec_matryoshka_probe", spark, sf_dir).collect()
    assert out
    for r in out:
        if r.full_top1 in emb and r.query_id in emb:
            q = np.rint(emb[r.query_id] * 1_000_000).astype("int64")
            d = np.rint(emb[r.full_top1] * 1_000_000).astype("int64")
            assert r.full_cosine == int((q * d).sum()) / 1.0e12


def test_hits_matches_numpy_iteration(spark, sf_dir):
    """graph_hits must agree with an independent NumPy replay of the
    same max-normalized Kleinberg iteration to 1e-9 and be
    deterministic across runs to the same tolerance."""
    import numpy as np

    from big_data_analysis_spark.operators.graph import _edges, graph_hits

    edges = _edges(spark, sf_dir).collect()
    nodes = sorted({r["src"] for r in edges} | {r["dst"] for r in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    hub = np.ones(n)
    auth = np.ones(n)
    for _ in range(12):
        a_raw = np.zeros(n)
        for r in edges:
            a_raw[idx[r["dst"]]] += hub[idx[r["src"]]]
        auth = a_raw / max(a_raw.max(), 1e-300)
        h_raw = np.zeros(n)
        for r in edges:
            h_raw[idx[r["src"]]] += auth[idx[r["dst"]]]
        hub = h_raw / max(h_raw.max(), 1e-300)
    got = {r["node"]: (r["hub"], r["auth"]) for r in run("graph_hits", spark, sf_dir).collect()}
    assert len(got) == n
    for v in nodes:
        assert abs(got[v][0] - hub[idx[v]]) < 1e-9, v
        assert abs(got[v][1] - auth[idx[v]]) < 1e-9, v
    again = {r["node"]: (r["hub"], r["auth"]) for r in run("graph_hits", spark, sf_dir).collect()}
    for v in nodes:
        assert abs(got[v][0] - again[v][0]) < 1e-9
        assert abs(got[v][1] - again[v][1]) < 1e-9


def test_cloze_reconstruction_roundtrip(spark, sf_dir):
    """Re-build the cloze string in Python for a sample of docs and
    match the md5 fingerprint (answer choice, first-occurrence
    blanking, join convention all verified end to end)."""
    import hashlib
    from collections import Counter

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where("doc_id < 40")
        .collect()
    }
    out = {
        r.doc_id: r
        for r in run("pipeline_cloze_questions", spark, sf_dir).collect()
        if r.doc_id in docs
    }
    assert out
    for doc_id, r in out.items():
        toks = docs[doc_id].split(" ")
        cnt = Counter(toks)
        best = min(cnt, key=lambda t: (-cnt[t], t))
        assert r.answer == best
        assert r.n_occurrences == cnt[best]
        pos = toks.index(best)  # 0-based
        assert r.first_pos == pos + 1
        cloze = " ".join("___" if i == pos else t for i, t in enumerate(toks))
        assert r.cloze_md5 == hashlib.md5(cloze.encode()).hexdigest()


def test_stratified_split_membership_matches_ablation_10pct(spark, sf_dir):
    """The stratified eval set and the 10% ablation subset use the
    SAME Knuth bucket and threshold, so their document counts must
    be identical — strata change the report, never the membership."""
    strat = run("pipeline_stratified_split", spark, sf_dir).collect()
    n_eval = sum(r.n_docs for r in strat if r.split == "eval")
    abl = {r.pct: r.n_docs for r in run("pipeline_ablation_grid", spark, sf_dir).collect()}
    assert n_eval == abl[10]


def test_wilson_ci_properties(spark, sf_dir):
    """Wilson bounds must bracket p_hat, stay in [0,1], and match a
    pure-Python evaluation of the closed form."""
    import math

    for r in run("agg_wilson_ci", spark, sf_dir).collect():
        p = r.successes / r.n
        z, z2 = 1.96, 3.8416
        lo = (p + z2 / (2 * r.n) - z * math.sqrt((p * (1 - p) + z2 / (4 * r.n)) / r.n)) / (1 + z2 / r.n)
        hi = (p + z2 / (2 * r.n) + z * math.sqrt((p * (1 - p) + z2 / (4 * r.n)) / r.n)) / (1 + z2 / r.n)
        assert 0.0 <= r.wilson_lo <= r.p_hat <= r.wilson_hi <= 1.0
        assert abs(r.wilson_lo - lo) < 1e-12 and abs(r.wilson_hi - hi) < 1e-12


def test_ipv4_classification_matches_stdlib(spark, sf_dir):
    """Private-range counts must match Python's ipaddress module over
    the same deterministic address set."""
    import ipaddress

    n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    ids = [r.event_id for r in spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id").collect()]
    n_priv = n_s4 = 0
    for eid in ids:
        addr = (eid * 2654435761) % (1 << 32)
        ip = ipaddress.IPv4Address(addr)
        if ip.is_private and (addr >> 24) in (10, 172, 192):
            # restrict to the three RFC-1918 blocks the op classifies
            o1, o2 = addr >> 24, (addr >> 16) & 255
            if o1 == 10 or (o1 == 172 and 16 <= o2 < 32) or (o1 == 192 and o2 == 168):
                n_priv += 1
        if addr >> 28 == 0:
            n_s4 += 1
    r = run("fn_ipv4_cidr", spark, sf_dir).collect()[0]
    assert r.n_total == n
    assert r.n_private == n_priv
    assert r.n_in_slash4 == n_s4


def test_html_extract_recovers_exact_text(spark, sf_dir):
    """Rebuild the expected flattened text in Python for a sample and
    match the md5 (script content must be gone, token order kept)."""
    import hashlib

    docs = {
        r.doc_id: (r.text, r.lang)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where("doc_id < 25")
        .collect()
    }
    out = {r.doc_id: r for r in run("text_html_extract", spark, sf_dir).collect() if r.doc_id in docs}
    for doc_id, r in out.items():
        text = docs[doc_id][0]
        expected = f"Doc {doc_id} " + " ".join(text.split(" "))
        assert r.text_md5 == hashlib.md5(expected.encode()).hexdigest(), doc_id
        assert str(doc_id) not in ("",)  # structure sanity
        assert r.text_chars == len(expected)


def test_vwap_monotone_volume(spark, sf_dir):
    rows = run("win_vwap", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cum_q >= 1
        assert r.vwap == r.cum_pv / r.cum_q / 100.0


def test_session_features_consistency(spark, sf_dir):
    rows = run("pipeline_session_features", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_events >= 1 and r.duration_s >= 0
        assert 0 <= r.n_purchases <= r.n_events
        assert r.had_error in (0, 1)
        assert r.purchase_rate == r.n_purchases / r.n_events


def test_ldp_estimator_close_to_truth(spark, sf_dir):
    """The debiased randomized-response estimate must land near the
    true count (hash coins are uniform enough for a ~n/8 window) and
    the mechanism identity est = (obs - n/8)/0.75 must hold."""
    r = run("pipeline_ldp_frequency", spark, sf_dir).collect()[0]
    assert r.debiased_estimate == (r.observed_ones - 0.125 * r.n) / 0.75
    assert abs(r.debiased_estimate - r.true_ones) < max(0.1 * r.n, 50)


def test_capture_recapture_sane(spark, sf_dir):
    """Chapman estimate must be >= both sample sizes (it estimates
    the union's superset) and within a sane multiple of the true
    population; the recapture count can't exceed either sample."""
    r = run("agg_capture_recapture", spark, sf_dir).collect()[0]
    assert r.n_recaptured <= min(r.n1, r.n2)
    assert r.chapman_estimate >= max(r.n1, r.n2) - 1
    assert r.chapman_estimate <= 10 * r.true_population
    exp = (r.n1 + 1) * (r.n2 + 1) // (r.n_recaptured + 1) - 1
    assert r.chapman_estimate == exp
