"""Semantic tests for the r9-built r10-window stock — the
non-parametric statistics tier, the recursive TA indicators
(TRIX / Heikin-Ashi / PSAR / Renko), graph clustering/assortativity
and the pipeline efficiency/mixture reports: pure-Python definition
replays and invariants beyond what oracle parity shows."""

import math

import duckdb
import pytest

from big_data_analysis_spark.registry import load_all

REG = load_all()

TYPES = ["click", "error", "purchase", "signup", "view"]


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir)


@pytest.fixture(scope="module")
def day_grid(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"""
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS x
        FROM '{sf_dir}/events.parquet'
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()


@pytest.fixture(scope="module")
def cents_df(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"""SELECT event_type, user_id,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
            FROM '{sf_dir}/events.parquet'"""
    ).df()


def _tdiv(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_mood_median_counts_balance(spark, sf_dir, cents_df):
    """Above+below+at-median = N, and above ~ below by the median's
    defining property; chi2 >= 0."""
    row = run("agg_mood_median", spark, sf_dir).collect()[0]
    n = len(cents_df)
    above = sum(getattr(row, f"a_{t}") for t in TYPES)
    below = sum(getattr(row, f"b_{t}") for t in TYPES)
    assert above + below + row.n_at_median == n
    assert abs(above - below) <= row.n_at_median + 1
    assert row.chi2 >= 0.0
    # replay one cell: click above pooled median
    v = sorted(cents_df.cents)
    med2 = v[(n + 1) // 2 - 1] + v[n // 2]
    want = int((2 * cents_df[cents_df.event_type == "click"].cents > med2).sum())
    assert row.a_click == want


def test_cochran_q_replay(spark, sf_dir, day_grid):
    """Replay the binary above-own-median matrix and Q in Python."""
    rows = {}
    for t in TYPES:
        sub = day_grid[day_grid.event_type == t].sort_values("d")
        v = sorted(sub.x)
        n = len(v)
        med2 = v[(n + 1) // 2 - 1] + v[n // 2]
        for _, r in sub.iterrows():
            rows.setdefault(r.d, {})[t] = int(2 * r.x > med2)
    c = dict.fromkeys(TYPES, 0)
    sum_r = sum_r2 = n_days = 0
    for d, m in rows.items():
        if len(m) != 5:
            continue
        n_days += 1
        ri = sum(m.values())
        sum_r += ri
        sum_r2 += ri * ri
        for t in TYPES:
            c[t] += m[t]
    got = run("agg_cochran_q", spark, sf_dir).collect()[0]
    assert got.n_days == n_days and got.sum_r == sum_r and got.sum_r2 == sum_r2
    for t in TYPES:
        assert getattr(got, f"c_{t}") == c[t]
    want = 4.0 * (5.0 * sum(v * v for v in c.values()) - float(sum_r) ** 2) / (
        5.0 * sum_r - sum_r2
    )
    assert math.isclose(got.q_stat, want, rel_tol=1e-9)


def test_mcnemar_cells_partition_users(spark, sf_dir):
    got = run("agg_mcnemar", spark, sf_dir).collect()[0]
    assert got.both_halves + got.first_only + got.second_only <= got.n_users
    assert got.chi2 >= 0.0 and got.chi2_corrected >= 0.0
    if got.first_only + got.second_only > 0:
        d = got.first_only - got.second_only
        assert math.isclose(
            got.chi2, d * d / (got.first_only + got.second_only), rel_tol=1e-12
        )


def test_odds_ratio_consistency(spark, sf_dir):
    got = run("agg_odds_ratio", spark, sf_dir).collect()[0]
    assert got.odds_ratio > 0 and got.relative_risk > 0
    # OR and RR must sit on the same side of 1
    assert (got.odds_ratio > 1) == (got.relative_risk > 1) or math.isclose(
        got.odds_ratio, 1.0, rel_tol=1e-6
    )
    assert math.isclose(
        got.log_or_variance,
        1 / got.a + 1 / got.b + 1 / got.c + 1 / got.d,
        rel_tol=1e-12,
    )


def test_cliffs_delta_maps_to_mann_whitney_auc(spark, sf_dir):
    """delta = 2*AUC - 1 (the exact algebraic identity between the
    two effect sizes), checked against agg_mann_whitney's output."""
    cd = run("agg_cliffs_delta", spark, sf_dir).collect()[0]
    mw = run("agg_mann_whitney", spark, sf_dir).collect()[0]
    assert (cd.n_a, cd.n_b) == (mw.n_a, mw.n_b)
    assert math.isclose(cd.cliffs_delta, 2.0 * mw.auc - 1.0, rel_tol=1e-9)
    assert cd.n_gt + cd.n_lt + cd.n_tie == cd.n_a * cd.n_b
    assert -1.0 <= cd.cliffs_delta <= 1.0


def test_hodges_lehmann_replay(spark, sf_dir, day_grid):
    a = day_grid[day_grid.event_type == "click"].x.tolist()
    b = day_grid[day_grid.event_type == "purchase"].x.tolist()
    diffs = sorted(int(x) - int(y) for x in a for y in b)
    n = len(diffs)
    hl2 = diffs[(n + 1) // 2 - 1] + diffs[n // 2]
    got = run("agg_hodges_lehmann", spark, sf_dir).collect()[0]
    assert got.n_pairs == n and got.hl_x2 == hl2
    assert math.isclose(got.hl_shift, hl2 / 2.0, rel_tol=1e-12)


def test_seasonal_mk_replay(spark, sf_dir, day_grid):
    got = {r.event_type: r for r in run("agg_seasonal_mann_kendall", spark, sf_dir).collect()}
    for t in TYPES:
        sub = day_grid[day_grid.event_type == t].sort_values("d")
        buckets = {}
        for _, r in sub.iterrows():
            buckets.setdefault(r.d.isoweekday() % 7 + 1, []).append(int(r.x))
        s = 0
        var18 = 0
        n_pairs = 0
        for vals in buckets.values():
            ng = len(vals)
            var18 += ng * (ng - 1) * (2 * ng + 5)
            for i in range(ng):
                for j in range(i + 1, ng):
                    s += (vals[j] > vals[i]) - (vals[j] < vals[i])
                    n_pairs += 1
        r = got[t]
        assert (r.s_total, r.n_pairs, r.var18) == (s, n_pairs, var18)
        corr = 1.0 if s > 0 else (-1.0 if s < 0 else 0.0)
        assert math.isclose(r.z, (s - corr) / math.sqrt(var18 / 18.0), rel_tol=1e-9)


def test_fleiss_kappa_range_and_formula(spark, sf_dir):
    got = run("agg_fleiss_kappa", spark, sf_dir).collect()[0]
    assert 0.0 < got.p_bar <= 1.0
    assert 0.0 < got.p_e < 1.0
    assert math.isclose(
        got.fleiss_kappa, (got.p_bar - got.p_e) / (1.0 - got.p_e), rel_tol=1e-12
    )
    assert sum(getattr(got, f"c_{t}") for t in TYPES) == 3 * got.n_items
    assert got.agree_pairs <= 6 * got.n_items


def test_poisson_rate_halves_sum(spark, sf_dir, cents_df):
    got = {r.event_type: r for r in run("agg_poisson_rate_test", spark, sf_dir).collect()}
    totals = cents_df.groupby("event_type").size()
    for t in TYPES:
        assert got[t].k1 + got[t].k2 == int(totals[t])
        assert (got[t].z > 0) == (got[t].rate1 > got[t].rate2)


def test_wilcoxon_signed_rank_replay(spark, sf_dir, day_grid):
    a = day_grid[day_grid.event_type == "click"].set_index("d").x
    b = day_grid[day_grid.event_type == "purchase"].set_index("d").x
    common = a.index.intersection(b.index)
    diffs = [int(a[d]) - int(b[d]) for d in common if a[d] != b[d]]
    sad = sorted((abs(d), d > 0) for d in diffs)
    n = len(diffs)
    # doubled midranks over |diff|
    w2 = 0
    i = 0
    while i < n:
        j = i
        while j < n and sad[j][0] == sad[i][0]:
            j += 1
        rank2 = (i + 1) + (j)  # 2*midrank = (i+1) + j  (1-based i..j)
        for k in range(i, j):
            if sad[k][1]:
                w2 += rank2
        i = j
    got = run("agg_wilcoxon_signed_rank", spark, sf_dir).collect()[0]
    assert got.n == n and got.w2_pos == w2
    wp = w2 / 2.0
    want = (wp - n * (n + 1) / 4.0) / math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0)
    assert math.isclose(got.z, want, rel_tol=1e-9)


def test_trix_replays_triple_chain(spark, sf_dir, day_grid):
    got = {
        (r.event_type, r.day): (r.ema3_s, r.trix_bp)
        for r in run("win_trix", spark, sf_dir).collect()
    }
    n_checked = 0
    for et, grp in day_grid.groupby("event_type"):
        e1 = e2 = e3 = None
        pe3 = None
        for _, row in grp.sort_values("d").iterrows():
            xs = int(row.x) * 1000
            if e1 is None:
                e1, e2, e3 = xs, xs, xs
            else:
                e1 = _tdiv(2 * xs + 8 * e1, 10)
                e2 = _tdiv(2 * e1 + 8 * e2, 10)
                e3 = _tdiv(2 * e2 + 8 * e3, 10)
            key = (et, row.d.strftime("%Y-%m-%d"))
            if pe3 is not None:
                assert got[key] == (e3, _tdiv((e3 - pe3) * 10000, pe3)), key
                n_checked += 1
            pe3 = e3
    assert n_checked == len(got) >= 100


def test_heikin_ashi_invariants(spark, sf_dir):
    rows = run("win_heikin_ashi", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.ha_low_x4 <= r.ha_open_x4 <= r.ha_high_x4
        assert r.ha_low_x4 <= r.ha_close_x4 <= r.ha_high_x4
        assert r.candle == (r.ha_close_x4 > r.ha_open_x4) - (
            r.ha_close_x4 < r.ha_open_x4
        )


def test_psar_state_machine_invariants(spark, sf_dir):
    by_type = {}
    for r in run("win_psar", spark, sf_dir).collect():
        by_type.setdefault(r.event_type, []).append(r)
    flips = 0
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r.day)
        for prev, cur in zip(rs, rs[1:]):
            assert cur.af100 in range(2, 21) and cur.af100 % 2 == 0
            if cur.direction != prev.direction:
                flips += 1
                assert cur.af100 == 2  # AF resets on flip
                assert cur.sar_c == prev.extreme_c  # SAR jumps to prior EP
            elif cur.af100 > prev.af100:
                assert cur.af100 == min(20, prev.af100 + 2)
        for r in rs:
            # in an uptrend EP tracks highs, downtrend lows
            if r.direction == 1:
                assert r.extreme_c >= r.l
            else:
                assert r.extreme_c <= r.h
    assert flips > 0  # the fixture series does flip trend


def test_renko_brick_lattice(spark, sf_dir):
    by_type = {}
    for r in run("win_renko", spark, sf_dir).collect():
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r.day)
        b = rs[0].brick_size
        assert b >= 1
        lvl0 = rs[0].brick_level
        up = down = 0
        for prev, cur in zip(rs, rs[1:]):
            assert cur.brick_size == b
            assert (cur.brick_level - lvl0) % b == 0  # level stays on lattice
            assert abs(cur.x - cur.brick_level) < b or cur.brick_level == prev.brick_level
            up_d = cur.n_bricks_up - prev.n_bricks_up
            dn_d = cur.n_bricks_down - prev.n_bricks_down
            assert up_d >= 0 and dn_d >= 0 and (up_d == 0 or dn_d == 0)
            assert cur.brick_level - prev.brick_level == b * (up_d - dn_d)
            up += up_d
            down += dn_d
        assert up + down > 0  # the series moves at least one brick


def test_clustering_coefficient_vs_python(spark, sf_dir):
    und = duckdb.sql(
        f"""
        SELECT DISTINCT least(src, dst), greatest(src, dst) FROM (
          SELECT l_orderkey % 100 src, l_partkey % 100 dst
          FROM read_parquet('{sf_dir}/lineitem.parquet')
          WHERE l_orderkey % 100 <> l_partkey % 100)
        """
    ).fetchall()
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    got = {r.node: r for r in run("graph_clustering_coefficient", spark, sf_dir).collect()}
    assert set(got) == set(adj)
    for v, nbrs in adj.items():
        t = sum(
            1
            for x in nbrs
            for y in nbrs
            if x < y and y in adj[x]
        )
        r = got[v]
        assert r.degree == len(nbrs) and r.n_triangles == t
        d = len(nbrs)
        want = 0.0 if d < 2 else 2.0 * t / (d * (d - 1))
        assert math.isclose(r.local_clustering, want, rel_tol=1e-12)


def test_assortativity_bounds(spark, sf_dir):
    r = run("graph_degree_assortativity", spark, sf_dir).collect()[0]
    assert -1.0 <= r.assortativity <= 1.0
    assert r.mm == 2 * r.n_edges
    assert r.sx <= r.mm * 99  # degrees bounded by 99 on the 100-node graph


def test_pack_efficiency_consistency(spark, sf_dir):
    rows = run("pipeline_pack_efficiency", spark, sf_dir).collect()
    packs = run("pipeline_pack_sequences", spark, sf_dir).collect()
    by_lang = {}
    for p in packs:
        d = by_lang.setdefault(p.lang, {"n": 0, "tok": 0, "pad": 0, "full": 0})
        d["n"] += 1
        d["tok"] += p.n_tokens
        d["pad"] += max(0, 64 - p.n_tokens)
        d["full"] += int(p.n_tokens >= 64)
    for r in rows:
        d = by_lang[r.lang]
        assert (r.n_packs, r.total_tokens) == (d["n"], d["tok"])
        assert (r.padding_tokens, r.n_full_packs) == (d["pad"], d["full"])
        assert r.utilization_bp == d["tok"] * 10000 // (d["n"] * 64)
        assert 0 < r.utilization_bp  # packs are never empty


def test_mix_temperature_normalizes(spark, sf_dir):
    rows = run("pipeline_mix_sqrt_temperature", spark, sf_dir).collect()
    assert len(rows) == 5
    assert math.isclose(sum(r.p_sample for r in rows), 1.0, rel_tol=1e-9)
    for r in rows:
        assert math.isclose(r.weight, math.sqrt(r.n_tokens), rel_tol=1e-12)
        assert math.isclose(
            r.epochs_at_budget, r.p_sample * 1_000_000 / r.n_tokens, rel_tol=1e-9
        )
    # sqrt temperature flattens: low-resource languages get MORE than
    # their raw token share
    tot = sum(r.n_tokens for r in rows)
    for r in rows:
        raw = r.n_tokens / tot
        if raw < 0.2:
            assert r.p_sample > raw
        elif raw > 0.2:
            assert r.p_sample < raw


def test_dedup_sweep_monotone(spark, sf_dir):
    rows = sorted(
        run("dedup_threshold_sweep", spark, sf_dir).collect(),
        key=lambda r: r.threshold,
    )
    assert [r.threshold for r in rows] == [50, 60, 70, 80, 90]
    for lo, hi in zip(rows, rows[1:]):
        assert lo.n_pairs >= hi.n_pairs  # tighter threshold, fewer pairs
        assert lo.n_docs_dropped >= hi.n_docs_dropped
    pairs = run("dedup_ngram_jaccard", spark, sf_dir).collect()
    assert rows[0].n_pairs == len(pairs)  # threshold 50 = the full pair set


# --- wave 3: momentum oscillators, TS diagnostics, SQL surface ---


def test_mfi_and_williams_bounds(spark, sf_dir):
    for r in run("win_mfi", spark, sf_dir).collect():
        assert 0 <= r.mfi_bp <= 10000
        assert r.pos_flow >= 0 and r.neg_flow >= 0
        if r.pos_flow + r.neg_flow > 0:
            assert r.mfi_bp == r.pos_flow * 10000 // (r.pos_flow + r.neg_flow)
    for r in run("win_williams_r", spark, sf_dir).collect():
        assert -10000 <= r.williams_r_bp <= 0
        assert r.lo14 <= r.close_c <= r.hi14
        if r.close_c == r.hi14 and r.hi14 > r.lo14:
            assert r.williams_r_bp == 0


def test_roc_momentum_identity(spark, sf_dir, day_grid):
    got = {(r.event_type, r.day): r for r in run("win_roc_momentum", spark, sf_dir).collect()}
    for et, grp in day_grid.groupby("event_type"):
        xs = grp.sort_values("d").reset_index(drop=True)
        for i in range(10, len(xs)):
            key = (et, xs.d[i].strftime("%Y-%m-%d"))
            r = got[key]
            assert r.momentum == int(xs.x[i]) - int(xs.x[i - 10])
            assert r.roc_bp == _tdiv((int(xs.x[i]) - int(xs.x[i - 10])) * 10000, int(xs.x[i - 10]))


def test_coppock_weighted_sum(spark, sf_dir):
    by_type = {}
    for r in run("win_coppock", spark, sf_dir).collect():
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r.day)
        # the weighted sum re-derives from the roc_sum_bp series
        series = [r.roc_sum_bp for r in rs]
        # rows are already filtered to have 5 prior rocs; re-check the
        # weighting on rows fully inside the emitted window
        for i in range(5, len(rs)):
            want = sum(
                w * series[i - k] for k, w in enumerate([6, 5, 4, 3, 2, 1])
            )
            assert rs[i].coppock_s == want
            assert rs[i].signal == (1 if want > 0 else -1)


def test_ultimate_osc_range_and_formula(spark, sf_dir):
    for r in run("win_ultimate_osc", spark, sf_dir).collect():
        assert 0.0 <= r.ultimate_osc <= 100.0
        want = (
            100.0
            * (4.0 * (r.bp5 / r.tr5) + 2.0 * (r.bp10 / r.tr10) + r.bp20 / r.tr20)
            / 7.0
        )
        assert math.isclose(r.ultimate_osc, want, rel_tol=1e-12)
        assert 0 <= r.bp5 <= r.tr5 and 0 <= r.bp20 <= r.tr20


def test_ljung_box_matches_numpy(spark, sf_dir, day_grid):
    import numpy as np

    got = {r.event_type: r for r in run("agg_ljung_box", spark, sf_dir).collect()}
    for t in TYPES:
        x = day_grid[day_grid.event_type == t].sort_values("d").x.to_numpy(float)
        n = len(x)
        d = x - x.mean()
        den = (d * d).sum()
        q = 0.0
        for k in range(1, 6):
            rk = (d[k:] * d[:-k]).sum() / den
            assert math.isclose(getattr(got[t], f"r{k}"), rk, rel_tol=1e-6)
            q += rk * rk / (n - k)
        assert math.isclose(got[t].lb_stat, n * (n + 2) * q, rel_tol=1e-6)


def test_durbin_watson_matches_numpy(spark, sf_dir, day_grid):
    got = {r.event_type: r for r in run("agg_durbin_watson", spark, sf_dir).collect()}
    for t in TYPES:
        x = day_grid[day_grid.event_type == t].sort_values("d").x.to_numpy(float)
        d = x - x.mean()
        want = ((d[1:] - d[:-1]) ** 2).sum() / (d * d).sum()
        assert math.isclose(got[t].dw_stat, want, rel_tol=1e-6)
        assert 0.0 <= got[t].dw_stat <= 4.0


def test_fn_date_iso_year_boundary(spark, sf_dir):
    """The ISO pair must agree with Python's isocalendar on every
    order date — including year-boundary weeks where year(d)*100+week
    would misbucket."""
    rows = run("fn_date_iso", spark, sf_dir).collect()
    con = duckdb.connect()
    dates = dict(
        con.execute(
            f"SELECT o_orderkey, o_orderdate FROM '{sf_dir}/orders.parquet'"
        ).fetchall()
    )
    n_boundary = 0
    for r in rows[:2000]:
        d = dates[r.o_orderkey]
        iso = d.isocalendar()
        assert (r.iso_year, r.iso_week) == (iso[0], iso[1]), d
        assert r.iso_week_key == iso[0] * 100 + iso[1]
        if iso[0] != d.year:
            n_boundary += 1
    # the fixture spans year boundaries, so the trap case is exercised
    assert n_boundary > 0 or len(rows) < 2000


def test_truncation_loss_monotone(spark, sf_dir):
    rows = sorted(
        run("pipeline_truncation_loss", spark, sf_dir).collect(),
        key=lambda r: r.context_window,
    )
    assert [r.context_window for r in rows] == [64, 128, 256, 512]
    total = rows[0].tokens_kept + rows[0].tokens_lost
    for lo, hi in zip(rows, rows[1:]):
        assert lo.n_docs_fitting <= hi.n_docs_fitting
        assert lo.tokens_kept <= hi.tokens_kept
        assert lo.tokens_lost >= hi.tokens_lost
        assert hi.tokens_kept + hi.tokens_lost == total  # partition of corpus
        assert lo.loss_bp >= hi.loss_bp


# --- ZIP wire format (eighth parser) ---


def test_zip_synth_is_genuine(spark, sf_dir):
    """The synthesized archives must be REAL ZIPs: stdlib zipfile
    opens them, testzip() verifies every CRC, and the member
    names/sizes match the generator formulas."""
    import io
    import zipfile

    from big_data_analysis_spark.io import table
    from big_data_analysis_spark.operators.multimodal_containers import _synth_zips

    d = table(spark, sf_dir, "documents")
    for r in _synth_zips(d).where("doc_id IN (0, 7, 39)").collect():
        zf = zipfile.ZipFile(io.BytesIO(bytes(r.zipf)))
        assert zf.testzip() is None
        infos = zf.infolist()
        assert [i.filename for i in infos] == [
            f"doc{r.doc_id}_f{m}.txt" for m in range(3)
        ]
        for m, i in enumerate(infos):
            assert i.file_size == 60 + (r.doc_id * 53 + m * 77) % 140
            data = zf.read(i.filename)
            assert all(
                b == 32 + (r.doc_id + 5 * m + j) % 64 for j, b in enumerate(data)
            )


def test_zip_index_parses_stdlib_archive(spark):
    """Genuine-file authentication in the other direction: an archive
    built by Python's zipfile parses to the right member table."""
    import io
    import zipfile

    from big_data_analysis_spark.operators.multimodal_containers import zip_index

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr("hello.txt", "hello world")
        z.writestr("data/x.bin", bytes(range(100)))
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "id long, b binary")
    out = zip_index(df, "id", "b").collect()[0]
    assert out.n_members == 2 and out.n_crc_valid == 2
    assert out.n_entries_eocd == 2 and out.total_uncompressed == 111
    assert out.sum_name_chars == len("hello.txt") + len("data/x.bin")


def test_zip_index_rejects_corruption(spark, sf_dir):
    """Flipping one content byte must break exactly that member's
    CRC; truncating the EOCD must drop the cross-check to -1."""
    from big_data_analysis_spark.io import table
    from big_data_analysis_spark.operators.multimodal_containers import (
        _synth_zips,
        zip_index,
    )
    from pyspark.sql import functions as F

    d = table(spark, sf_dir, "documents")
    synth = _synth_zips(d).where("doc_id = 3")
    # corrupt one byte inside member 0's data (local header is
    # 30 + len('doc3_f0.txt') = 41 bytes, so byte 42 is content)
    corrupted = synth.select(
        "doc_id",
        F.expr(
            "concat(substring(zipf, 1, 41), X'FF', substring(zipf, 43))"
        ).alias("zipf"),
    )
    r = zip_index(corrupted, "doc_id", "zipf").collect()[0]
    assert r.n_members == 3 and r.n_crc_valid == 2
    truncated = synth.select(
        "doc_id",
        F.expr("substring(zipf, 1, octet_length(zipf) - 1)").alias("zipf"),
    )
    t = zip_index(truncated, "doc_id", "zipf").collect()[0]
    assert t.n_entries_eocd == -1 and t.cd_offset == -1
    assert t.n_members == 3  # the walk itself is unaffected


def test_zip_index_plan_pure_map(spark, sf_dir):
    from big_data_analysis_spark.registry import load_all

    reg = load_all()
    df = reg["multimodal_zip_index"].fn(spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in p, marker


# --- wave 5: distribution distances, SQL surface, funnel ---


def test_distribution_distance_vs_scipy_free_python(spark, sf_dir, cents_df):
    import math as _m

    p = cents_df[cents_df.event_type == "purchase"].copy()
    arm_a = ((p.user_id.astype("int64") & 2147483647) * 2654435761) % (1 << 32) < (
        1 << 31
    )
    buckets_a = (p[arm_a].cents // 5000).clip(upper=9)
    buckets_b = (p[~arm_a].cents // 5000).clip(upper=9)
    na, nb = len(buckets_a), len(buckets_b)
    got = run("agg_distribution_distance", spark, sf_dir).collect()[0]
    assert (got.n_a, got.n_b) == (na, nb)
    tv = bc = 0.0
    tvn = 0
    for b in range(10):
        ca = int((buckets_a == b).sum())
        cb = int((buckets_b == b).sum())
        tvn += abs(ca * nb - cb * na)
        bc += _m.sqrt((ca / na) * (cb / nb))
    assert got.tv_num == tvn
    assert math.isclose(got.total_variation, tvn / (2.0 * na * nb), rel_tol=1e-12)
    assert math.isclose(got.bhattacharyya, bc, rel_tol=1e-9)
    assert math.isclose(got.hellinger, _m.sqrt(1 - bc), rel_tol=1e-9)
    assert 0 <= got.total_variation <= 1 and 0 <= got.hellinger <= 1


def test_wasserstein_matches_sorted_quantile_form(spark, sf_dir, cents_df):
    """W1 between empirical distributions cross-checked with the
    numpy CDF-integral form."""
    import numpy as np

    p = cents_df[cents_df.event_type == "purchase"]
    arm_a = ((p.user_id.astype("int64") & 2147483647) * 2654435761) % (1 << 32) < (
        1 << 31
    )
    a = np.sort(p[arm_a].cents.to_numpy())
    b = np.sort(p[~arm_a].cents.to_numpy())
    grid = np.union1d(a, b)
    ca = np.searchsorted(a, grid, side="right") / len(a)
    cb = np.searchsorted(b, grid, side="right") / len(b)
    w1 = float(np.sum(np.abs(ca[:-1] - cb[:-1]) * np.diff(grid)))
    got = run("agg_wasserstein_1d", spark, sf_dir).collect()[0]
    assert math.isclose(got.wasserstein_dollars, w1 / 100.0, rel_tol=1e-9)


def test_array_setops_invariants(spark, sf_dir):
    for r in run("fn_array_setops", spark, sf_dir).collect():
        assert r.n_common <= min(r.n_head, r.n_mid)
        assert r.n_union == r.n_head + r.n_mid - r.n_common
        assert r.overlaps == (r.n_common > 0)
        assert r.contains_common
        if r.n_common:
            toks = r.common_sorted.split(" ")
            assert toks == sorted(toks) and len(toks) == r.n_common


def test_deterministic_uuid_shape(spark, sf_dir):
    import hashlib
    import re

    rows = run("fn_deterministic_uuid", spark, sf_dir).collect()
    pat = re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[0-9a-f]{4}-[0-9a-f]{12}$")
    for r in rows[:50]:
        assert pat.match(r.doc_uuid), r.doc_uuid
        h = hashlib.md5(f"ns:docs/{r.doc_id}".encode()).hexdigest()
        assert r.doc_uuid.replace("-", "")[:8] == h[:8] == r.shard_hex
        assert r.shard_id == int(h[:8], 16) % 64
    assert len({r.doc_uuid for r in rows}) == len(rows)  # unique ids


def test_reciprocity_vs_python(spark, sf_dir):
    edges = set(
        duckdb.sql(
            f"""SELECT DISTINCT l_orderkey % 100, l_partkey % 100
            FROM read_parquet('{sf_dir}/lineitem.parquet')
            WHERE l_orderkey % 100 <> l_partkey % 100"""
        ).fetchall()
    )
    recip = sum(1 for s, d in edges if (d, s) in edges)
    r = run("graph_reciprocity", spark, sf_dir).collect()[0]
    assert (r.n_edges, r.n_reciprocal) == (len(edges), recip)
    assert r.n_mutual_pairs == recip // 2
    assert math.isclose(r.reciprocity, recip / len(edges), rel_tol=1e-12)


def test_filter_funnel_partitions_corpus(spark, sf_dir):
    r = run("pipeline_filter_funnel", spark, sf_dir).collect()[0]
    assert (
        r.killed_too_short
        + r.killed_few_tokens
        + r.killed_repetitive
        + r.killed_long_tokens
        + r.n_survivors
        == r.n_docs
    )
    assert r.survival_bp == r.n_survivors * 10000 // r.n_docs
    assert r.n_survivors > 0  # the fixture corpus is not all junk


# --- wave 6: ADX family + temporal split ---


def test_adx_invariants(spark, sf_dir):
    rows = run("win_adx", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.di_plus_bp <= 10000 and 0 <= r.di_minus_bp <= 10000
        assert 0 <= r.dx_bp <= 10000 and 0 <= r.adx_bp <= 10000
        assert r.trend_dir == (r.di_plus_bp > r.di_minus_bp) - (
            r.di_plus_bp < r.di_minus_bp
        )
        if r.di_plus_bp + r.di_minus_bp > 0:
            assert r.dx_bp == abs(r.di_plus_bp - r.di_minus_bp) * 10000 // (
                r.di_plus_bp + r.di_minus_bp
            )


def test_force_index_and_ad_line_consistency(spark, sf_dir):
    for r in run("win_force_index", spark, sf_dir).collect():
        assert r.pressure == (r.force_sum13 > 0) - (r.force_sum13 < 0)
    by_type = {}
    for r in run("win_accumulation_distribution", spark, sf_dir).collect():
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r.day)
        acc = 0
        for r in rs:
            assert -10000 <= r.clv_bp <= 10000
            acc += r.clv_bp * r.vol
            assert r.ad_line == acc  # the cumulative IS the integer sum


def test_temporal_split_partitions(spark, sf_dir, cents_df):
    r = run("pipeline_temporal_split", spark, sf_dir).collect()[0]
    assert r.n_train_events + r.n_val_events + r.n_test_events == len(cents_df)
    assert r.users_train_and_test <= min(r.n_train_users, r.n_test_users)
    assert r.cold_start_test_users <= r.n_test_users
    assert r.test_seen_user_bp == r.users_train_and_test * 10000 // max(
        r.n_test_users, 1
    )


# --- wave 7: elder ray, RVI, mass index, Bowley, novelty ---


def test_elder_ray_regime_consistency(spark, sf_dir):
    rows = run("win_elder_ray", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.bull_power_s >= r.bear_power_s  # h >= l at equal EMA
        if r.regime == 1:
            assert r.bear_power_s > 0
        elif r.regime == -1:
            assert r.bull_power_s < 0


def test_rvi_and_mass_index_bounds(spark, sf_dir):
    for r in run("win_rvi", spark, sf_dir).collect():
        assert -10000 <= r.rvi_bp <= 10000  # |sum(c-o)| <= sum(h-l)
        assert abs(r.close_open_sum) <= r.range_sum
        assert r.vigor_sign == (r.close_open_sum > 0) - (r.close_open_sum < 0)
    for r in run("win_mass_index", spark, sf_dir).collect():
        assert r.ratio_bp > 0
        assert r.bulge == int(r.mass_index_s > 95000)


def test_bowley_skew_bounded(spark, sf_dir, cents_df):
    got = {r.event_type: r for r in run("agg_bowley_skew", spark, sf_dir).collect()}
    for t in TYPES:
        r = got[t]
        assert -1.0 <= r.bowley_skew <= 1.0  # Bowley is bounded by construction
        v = sorted(cents_df[cents_df.event_type == t].cents)
        n = len(v)
        q1 = v[(n + 3) // 4 - 1]
        q3 = v[(3 * n + 3) // 4 - 1]
        med2 = v[(n + 1) // 2 - 1] + v[n // 2]
        assert (r.q1_cents, r.q3_cents, r.med2_cents) == (q1, q3, med2)
        assert r.skew_num == q1 + q3 - med2


def test_ngram_novelty_replay(spark, sf_dir):
    con = duckdb.connect()
    df = con.execute(
        f"SELECT doc_id, lang, text FROM '{sf_dir}/documents.parquet'"
    ).df()
    train, test = {}, {}
    for _, r in df.iterrows():
        toks = r.text.split(" ")
        grams = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        tgt = train if r.doc_id % 5 < 4 else test
        tgt.setdefault(r.lang, set()).update(grams)
    got = {r.lang: r for r in run("pipeline_ngram_novelty", spark, sf_dir).collect()}
    for lang, te in test.items():
        tr = train.get(lang, set())
        novel = len(te - tr)
        r = got[lang]
        assert (r.n_test_grams, r.n_novel) == (len(te), novel)
        assert r.novelty_bp == novel * 10000 // len(te)


# --- wave 8: lexical richness + cluster separation ---


def test_hapax_ratio_replay(spark, sf_dir):
    con = duckdb.connect()
    df = con.execute(
        f"SELECT lang, text FROM '{sf_dir}/documents.parquet'"
    ).df()
    from collections import Counter

    freq = {}
    for _, r in df.iterrows():
        freq.setdefault(r.lang, Counter()).update(r.text.split(" "))
    got = {r.lang: r for r in run("text_hapax_ratio", spark, sf_dir).collect()}
    for lang, c in freq.items():
        r = got[lang]
        assert r.n_tokens == sum(c.values())
        assert r.n_types == len(c)
        assert r.n_hapax == sum(1 for v in c.values() if v == 1)
        assert r.type_token_bp == len(c) * 10000 // sum(c.values())
        # the 31-word synthetic vocabulary has no hapaxes at any SF —
        # the richness signal here is the (very low) type-token ratio
        assert 0 <= r.hapax_type_bp <= 10000
        assert r.hapax_type_bp == r.n_hapax * 10000 // r.n_types


def test_centroid_pairs_vs_numpy(spark, sf_dir):
    import numpy as np

    con = duckdb.connect()
    df = con.execute(
        f"SELECT label, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).df()
    cents = {}
    for lbl, grp in df.groupby("label"):
        X = np.round(
            np.stack(grp.embedding.to_numpy()).astype(np.float64) * 1e6
        )
        cents[lbl] = X.mean(axis=0) / 1e6
    rows = run("sim_centroid_pairs", spark, sf_dir).collect()
    assert len(rows) == 45  # C(10, 2) label pairs
    for r in rows:
        want = float(np.linalg.norm(cents[r.label_a] - cents[r.label_b]))
        assert math.isclose(r.centroid_distance, want, rel_tol=1e-9)
        assert r.centroid_distance > 0


def test_band_join_bucketed_matches_naive_and_plan(spark, sf_dir):
    """Recall proof: the bucketed rewrite finds EXACTLY the naive
    quadratic pair set (replayed in Python), and the plan contains
    only equi-joins (no CartesianProduct / BroadcastNestedLoop)."""
    rows = duckdb.sql(
        f"""SELECT o_orderkey, o_orderpriority,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM read_parquet('{sf_dir}/orders.parquet')
        WHERE o_totalprice < 30000"""
    ).fetchall()
    by_pri = {}
    for k, pri, c in rows:
        by_pri.setdefault(pri, []).append((k, c))
    want = {}
    for pri, rs in by_pri.items():
        n = 0
        for i in range(len(rs)):
            for j in range(i + 1, len(rs)):
                if abs(rs[i][1] - rs[j][1]) <= 10000:
                    n += 1
        if n:
            want[pri] = n
    got = {
        r.o_orderpriority: r.n_pairs
        for r in run("join_band_bucketed", spark, sf_dir).collect()
    }
    assert got == want
    df = run("join_band_bucketed", spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p


def test_pacf_matches_numpy(spark, sf_dir, day_grid):
    got = {r.event_type: r for r in run("agg_pacf", spark, sf_dir).collect()}
    for t in TYPES:
        x = day_grid[day_grid.event_type == t].sort_values("d").x.to_numpy(float)
        d = x - x.mean()
        den = (d * d).sum()
        r1 = (d[1:] * d[:-1]).sum() / den
        r2 = (d[2:] * d[:-2]).sum() / den
        r = got[t]
        assert math.isclose(r.pacf1, r1, rel_tol=1e-6)
        assert math.isclose(r.pacf2, (r2 - r1 * r1) / (1 - r1 * r1), rel_tol=1e-6)


def test_turning_points_replay(spark, sf_dir, day_grid):
    got = {r.event_type: r for r in run("agg_turning_points", spark, sf_dir).collect()}
    for t in TYPES:
        xs = day_grid[day_grid.event_type == t].sort_values("d").x.tolist()
        n = len(xs)
        tp = sum(
            1
            for i in range(1, n - 1)
            if (xs[i - 1] < xs[i] and xs[i + 1] < xs[i])
            or (xs[i - 1] > xs[i] and xs[i + 1] > xs[i])
        )
        r = got[t]
        assert (r.n, r.n_turning) == (n, tp)
        assert r.excess_x3 == 3 * tp - 2 * (n - 2)
        want = (3 * tp - 2 * (n - 2)) / (3 * math.sqrt((16 * n - 29) / 90))
        assert math.isclose(r.z, want, rel_tol=1e-9)


# --- wave 12: adaptive/double-smoothed momentum ---


def test_kama_replay(spark, sf_dir, day_grid):
    got = {
        (r.event_type, r.day): (r.er_milli, r.kama_s)
        for r in run("win_kama", spark, sf_dir).collect()
    }
    n_checked = 0
    for et, grp in day_grid.groupby("event_type"):
        xs = grp.sort_values("d").reset_index(drop=True)
        kama = None
        for i in range(10, len(xs)):
            chg = abs(int(xs.x[i]) - int(xs.x[i - 10]))
            vol = sum(
                abs(int(xs.x[j]) - int(xs.x[j - 1]))
                for j in range(max(1, i - 9), i + 1)
            )
            er = 1000 if vol == 0 else _tdiv(chg * 1000, vol)
            if kama is None:
                kama = int(xs.x[i]) * 1000
            else:
                smc = _tdiv(er * 602, 1000) + 65
                kama = kama + _tdiv(smc * smc * (int(xs.x[i]) * 1000 - kama), 10**6)
            key = (et, xs.d[i].strftime("%Y-%m-%d"))
            assert got[key] == (er, kama), key
            n_checked += 1
    assert n_checked == len(got) >= 90


def test_tsi_bounded_and_kst_weighting(spark, sf_dir):
    for r in run("win_tsi", spark, sf_dir).collect():
        assert -10000 <= r.tsi_bp <= 10000  # |EMA(mom)| <= EMA(|mom|)
        assert abs(r.smoothed_mom_s) <= r.smoothed_abs_s
    for r in run("win_kst", spark, sf_dir).collect():
        assert r.signal == (r.kst_s > 0) - (r.kst_s < 0)


def test_ccf_matches_numpy(spark, sf_dir, day_grid):
    import numpy as np

    a = day_grid[day_grid.event_type == "click"].sort_values("d").x.to_numpy(float)
    b = day_grid[day_grid.event_type == "purchase"].sort_values("d").x.to_numpy(float)
    da, db = a - a.mean(), b - b.mean()
    denom = math.sqrt((da * da).sum() * (db * db).sum())
    r = run("agg_cross_correlation", spark, sf_dir).collect()[0]
    # lag k = +1 pairs da[t] with db[t+1]
    for name, k in [("ccf_m2", -2), ("ccf_m1", -1), ("ccf_0", 0),
                    ("ccf_p1", 1), ("ccf_p2", 2)]:
        if k >= 0:
            num = (da[: len(da) - k] * db[k:]).sum()
        else:
            num = (da[-k:] * db[: len(db) + k]).sum()
        assert math.isclose(getattr(r, name), num / denom, rel_tol=1e-6), name
        assert -1.0 <= getattr(r, name) <= 1.0


def test_rolling_beta_matches_numpy(spark, sf_dir, day_grid):
    import numpy as np

    a = day_grid[day_grid.event_type == "purchase"].sort_values("d")
    b = day_grid[day_grid.event_type == "click"].sort_values("d")
    merged = a.merge(b, on="d", suffixes=("_y", "_x")).sort_values("d")
    ys = merged.x_y.to_numpy(float)
    xs = merged.x_x.to_numpy(float)
    got = {r.day: r.beta for r in run("win_rolling_beta", spark, sf_dir).collect()}
    for i in range(9, len(xs)):
        xw, yw = xs[i - 9 : i + 1], ys[i - 9 : i + 1]
        want = np.cov(xw, yw, bias=True)[0, 1] / xw.var()
        day = merged.d.iloc[i].strftime("%Y-%m-%d")
        assert math.isclose(got[day], want, rel_tol=1e-9), day


def test_shingle_profile_consistency(spark, sf_dir):
    rows = run("dedup_shingle_profile", spark, sf_dir).collect()
    assert {r.lang for r in rows} == {"de", "en", "es", "fr", "zh"}
    for r in rows:
        assert r.distinct_shingles <= r.total_shingles
        assert r.docs_with_internal_dup <= r.n_docs
        assert r.internal_dup_bp == (
            (r.total_shingles - r.distinct_shingles) * 10000 // r.total_shingles
        )
    # the 31-word vocabulary guarantees internal repeats somewhere
    assert any(r.docs_with_internal_dup > 0 for r in rows)


def test_degree_histogram_ccdf(spark, sf_dir):
    rows = sorted(
        run("graph_degree_histogram", spark, sf_dir).collect(),
        key=lambda r: -r.degree,
    )
    cum = 0
    for r in rows:
        cum += r.n_nodes
        assert r.n_nodes_at_least == cum
    assert cum == 100  # every node of the 100-node demo graph counted


def test_anova_weekday_matches_numpy(spark, sf_dir, day_grid):
    import numpy as np

    sub = day_grid[day_grid.event_type == "click"]
    groups = {}
    for _, r in sub.iterrows():
        groups.setdefault(r.d.isoweekday() - 1, []).append(float(r.x))
    allv = np.array([v for g in groups.values() for v in g])
    ssb = sum(
        len(g) * (np.mean(g) - allv.mean()) ** 2 for g in groups.values()
    )
    ssw = sum(((np.array(g) - np.mean(g)) ** 2).sum() for g in groups.values())
    r = run("agg_anova_weekday", spark, sf_dir).collect()[0]
    assert r.n == len(allv)
    assert math.isclose(r.ss_between, ssb, rel_tol=1e-6)
    assert math.isclose(r.ss_within, ssw, rel_tol=1e-6)
    assert math.isclose(r.f_stat, (ssb / 6) / (ssw / (len(allv) - 7)), rel_tol=1e-6)
