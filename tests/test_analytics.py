"""Semantic invariants for the product-analytics queries beyond oracle
parity (tests/test_oracle_parity.py covers the bit-exact hash match):
retention-matrix axioms, funnel monotonicity, z-score recomputation,
PMI bounds, and a brute-force triangle count cross-check.
"""

from __future__ import annotations

from itertools import combinations

from ccxt_ohlcv_fetcher_spark.plans.analytics import (
    copurchase_graph_stats,
    event_funnel_conversion,
    event_zscore_outliers,
    token_pmi_pairs,
    user_cohort_retention,
)


def test_cohort_retention_axioms(spark, sf_dir):
    rows = user_cohort_retention(spark, sf_dir).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert r["day_offset"] >= 0
        assert 0 < r["active_users"] <= r["cohort_size"]
        assert 0.0 < r["retention"] <= 1.0
        by_cohort.setdefault(r["cohort_ms"], {})[r["day_offset"]] = r
    # day 0 always exists and is complete: every cohort member was active
    # on their own first day by construction
    for offsets in by_cohort.values():
        day0 = offsets[0]
        assert day0["active_users"] == day0["cohort_size"]
        assert day0["retention"] == 1.0


def test_funnel_monotone_and_bounded(spark, sf_dir):
    rows = {r["stage"]: r for r in event_funnel_conversion(spark, sf_dir).collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    users = [rows[k]["users"] for k in (1, 2, 3, 4)]
    assert users == sorted(users, reverse=True)  # each stage loses users
    assert users[0] > 0
    for k in (2, 3, 4):
        r = rows[k]
        assert 0.0 <= r["conv_from_prev"] <= 1.0
        assert 0.0 <= r["conv_from_start"] <= 1.0
    assert rows[1]["conv_from_start"] == 1.0


def test_zscore_outliers_recompute(spark, sf_dir):
    import math

    out = event_zscore_outliers(spark, sf_dir).collect()
    assert out
    # recompute one event type's stats naively and check a flagged z
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    et = out[0]["event_type"]
    vals = [r["value"] for r in events.filter(f"event_type = '{et}'").collect()]
    n = len(vals)
    mu = sum(vals) / n
    sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / (n - 1))
    for r in out:
        if r["event_type"] == et:
            assert abs(r["z"] - (r["value"] - mu) / sd) < 1e-9
            assert abs(r["z"]) > 2.5


def test_pmi_pairs_ordered_and_bounded(spark, sf_dir):
    rows = token_pmi_pairs(spark, sf_dir).collect()
    assert rows
    pmis = [r["pmi"] for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    for r in rows:
        assert r["tok_a"] < r["tok_b"]
        assert r["pair_n"] >= 10
        # PMI upper bound: P(a,b) <= min(P(a), P(b)) -> pmi <= -ln(max marginal P)
        assert r["pair_n"] <= min(r["df_a"], r["df_b"])


def test_copurchase_triangles_match_bruteforce(spark, sf_dir):
    row = copurchase_graph_stats(spark, sf_dir).collect()[0]
    # brute-force the same graph driver-side at test scale
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    orders: dict[int, set[int]] = {}
    for r in li:
        orders.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    pair_n: dict[tuple[int, int], int] = {}
    for parts in orders.values():
        for a, b in combinations(sorted(parts), 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    edges = {p for p, n in pair_n.items() if n >= 2}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if b < c
    )
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    assert row["n_edges"] == len(edges)
    assert row["n_vertices"] == len(adj)
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] == tri
    if wedges:
        assert abs(row["global_clustering"] - 3.0 * tri / wedges) < 1e-12


def test_cms_estimates_dominate_truth(spark, sf_dir):
    from ccxt_ohlcv_fetcher_spark.plans.analytics import cms_heavy_hitters

    rows = cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        # the one-sided CMS error guarantee: min over rows never undercounts
        assert r["est_n"] >= r["true_n"] > 0
    ests = [r["est_n"] for r in rows]
    assert ests == sorted(ests, reverse=True)


def test_rfm_segment_counts_cover_customers(spark, sf_dir):
    from ccxt_ohlcv_fetcher_spark.plans.analytics import customer_rfm_segments

    rows = customer_rfm_segments(spark, sf_dir).collect()
    assert rows
    n_custs_with_orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in rows) == n_custs_with_orders
    for r in rows:
        a, b, c = r["segment"].split("-")
        assert all(1 <= int(x) <= 5 for x in (a, b, c))


def test_weighted_sample_matches_driver_recompute(spark, sf_dir):
    import hashlib
    import math

    from ccxt_ohlcv_fetcher_spark.plans.analytics import weighted_doc_sample

    rows = weighted_doc_sample(spark, sf_dir).collect()
    assert len(rows) == 20
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    ).collect()

    def key(doc_id: int, n_chars: int) -> float:
        h = int(hashlib.md5(f"wsample|{doc_id}".encode()).hexdigest()[:15], 16)
        return round(math.log((h + 1) / float(1 << 60)) / n_chars, 9)

    expect = sorted(
        ((key(d["doc_id"], d["n_chars"]), d["doc_id"]) for d in docs),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    got = [(r["sample_key"], r["doc_id"]) for r in rows]
    assert got == expect


def test_transition_matrix_rows_normalize(spark, sf_dir):
    from ccxt_ohlcv_fetcher_spark.plans.analytics import event_transition_matrix

    rows = event_transition_matrix(spark, sf_dir).collect()
    assert rows
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r["p"])
    for prev, ps in by_prev.items():
        assert abs(sum(ps) - 1.0) < 1e-9, prev


def test_table_profile_known_facts(spark, sf_dir):
    from ccxt_ohlcv_fetcher_spark.plans.analytics import events_table_profile

    prof = {r["col_name"]: r for r in events_table_profile(spark, sf_dir).collect()}
    assert set(prof) == {"event_id", "user_id", "value", "ts", "event_type"}
    n = prof["event_id"]["n_rows"]
    assert prof["event_id"]["n_distinct"] == n  # event_id is unique
    assert prof["event_id"]["n_nulls"] == 0
    assert prof["event_type"]["n_distinct"] == 5
    assert prof["event_type"]["min_str"] == "click"
    assert prof["event_type"]["max_str"] == "view"
    assert prof["value"]["min_num"] is not None


def test_streaks_within_span_and_consistent(spark, sf_dir):
    from ccxt_ohlcv_fetcher_spark.plans.analytics import user_activity_streaks

    rows = user_activity_streaks(spark, sf_dir).collect()
    assert rows
    for r in rows:
        span = r["streak_end_day"] - r["streak_start_day"] + 1
        assert r["streak_len"] == span  # consecutive by construction
        assert r["streak_len"] >= 1


def test_cumulative_users_monotone_and_totals(spark, sf_dir):
    from ccxt_ohlcv_fetcher_spark.plans.analytics import cumulative_unique_users

    rows = sorted(
        cumulative_unique_users(spark, sf_dir).collect(),
        key=lambda r: r["day_ms"],
    )
    assert rows
    cums = [r["cum_users"] for r in rows]
    assert cums == sorted(cums)
    total = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert cums[-1] == total
    assert sum(r["new_users"] for r in rows) == total


def test_monthly_mom_shares_sum_to_one(spark, sf_dir):
    from ccxt_ohlcv_fetcher_spark.plans.analytics import monthly_revenue_mom

    rows = monthly_revenue_mom(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r["share_of_total"] for r in rows) - 1.0) < 1e-9
    first = min(rows, key=lambda r: (r["yr"], r["mo"]))
    assert first["mom_delta"] is None and first["mom_pct"] is None


def test_profile_operator_approx_mode_and_col_selection(spark, sf_dir):
    """exact vs approx distinct: same scaffold, approx within HLL error;
    unsupported column types are skipped from the default selection."""
    from pyspark.sql import functions as F

    from ccxt_ohlcv_fetcher_spark.operators.profile import profile_table

    df = spark.read.parquet(f"{sf_dir}/part.parquet").withColumn(
        "arr", F.array(F.col("p_partkey"))
    )
    prof = {r["col_name"]: r for r in profile_table(df).collect()}
    assert "arr" not in prof  # complex types skipped by default
    approx = {
        r["col_name"]: r
        for r in profile_table(df, exact_distinct=False).collect()
    }
    for c, r in prof.items():
        a = approx[c]
        assert a["n_rows"] == r["n_rows"] and a["n_nulls"] == r["n_nulls"]
        assert abs(a["n_distinct"] - r["n_distinct"]) <= 0.05 * r["n_distinct"] + 2
        assert a["min_num"] == r["min_num"] and a["max_str"] == r["max_str"]


def test_profile_operator_handles_hostile_column_names(spark):
    """Identifier safety: quotes, spaces, hyphens, dots, backticks in
    column names must not break the generated stack() SQL."""
    from ccxt_ohlcv_fetcher_spark.operators.profile import profile_table

    names = ["it's", "a b", "x-y", "d.o.t", "tick`mark"]
    df = spark.createDataFrame(
        [(1, "p", 2.5, 3, "z"), (2, "q", 1.5, None, "z")],
        schema=names,
    )
    prof = {r["col_name"]: r for r in profile_table(df).collect()}
    assert set(prof) == set(names)
    assert prof["a b"]["max_str"] == "q"
    assert prof["x-y"]["min_num"] == 1.5
    assert prof["d.o.t"]["n_nulls"] == 1
    assert prof["tick`mark"]["n_distinct"] == 1


def test_pagerank_fixed_point_matches_python_simulator(spark):
    """pagerank_fixed_point's distributed integer arithmetic equals the
    single-threaded reference simulator exactly on crafted graphs —
    fixed-point BIGINT makes the iteration reduction-order independent,
    so equality is EXACT, not approximate. Covers: an asymmetric
    directed graph (dangling vertex + receiverless vertex) and an
    undirected path (hub outranks leaves)."""
    from ccxt_ohlcv_fetcher_spark.operators.graph import (
        pagerank_fixed_point,
        pagerank_reference_py,
    )

    # directed: 1->2, 1->3, 2->3, 4->1; vertex 3 dangling (no out),
    # vertex 4 receiverless (no in)
    edge_list = [(1, 2), (1, 3), (2, 3), (4, 1)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r["v"]: r["rank"]
        for r in pagerank_fixed_point(edges, n_iters=7).collect()
    }
    assert got == pagerank_reference_py(edge_list, n_iters=7)

    # undirected path a-b-c (pass both directions): hub b outranks a, c
    path = [(10, 20), (20, 10), (20, 30), (30, 20)]
    edges2 = spark.createDataFrame(path, "src long, dst long")
    got2 = {
        r["v"]: r["rank"]
        for r in pagerank_fixed_point(
            edges2, n_iters=10, rejoin_receiverless=False
        ).collect()
    }
    assert got2 == pagerank_reference_py(path, n_iters=10)
    assert got2[20] > got2[10] == got2[30]


def test_pagerank_weighted_and_fixpoint_stop(spark):
    """Weighted edges split mass proportionally (exact vs the
    simulator); stop_on_fixpoint ends early at a true period-1 integer
    fixpoint, and an OSCILLATING graph (period-2 cycle, no period-1
    fixpoint) just runs to the cap — both exact vs the simulator."""
    from ccxt_ohlcv_fetcher_spark.operators.graph import (
        pagerank_fixed_point,
        pagerank_reference_py,
    )

    weighted = [(1, 2, 3), (1, 3, 1), (2, 3, 2), (3, 1, 5)]
    edges = spark.createDataFrame(weighted, "src long, dst long, w long")
    got = {
        r["v"]: r["rank"]
        for r in pagerank_fixed_point(edges, n_iters=8, weight="w").collect()
    }
    assert got == pagerank_reference_py(weighted, n_iters=8)
    # check the weighting actually bit (3:1 split from vertex 1)
    unweighted = pagerank_reference_py([(s, d) for s, d, _ in weighted], 8)
    assert got != unweighted

    # bi-directed triangle: the simulator reaches its exact integer
    # fixpoint at round 4; the capped-30 run with stop must return it
    tri = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)]
    fix = pagerank_reference_py(tri, n_iters=10)
    assert fix == pagerank_reference_py(tri, n_iters=11)  # truly fixed
    e_tri = spark.createDataFrame(tri, "src long, dst long")
    stopped = {
        r["v"]: r["rank"]
        for r in pagerank_fixed_point(
            e_tri, n_iters=30, rejoin_receiverless=False,
            stop_on_fixpoint=True,
        ).collect()
    }
    assert stopped == fix

    # path graph oscillates (period 2, never period-1-equal): the stop
    # never fires and the capped run equals the simulator at the cap
    path = [(10, 20), (20, 10), (20, 30), (30, 20)]
    e2 = spark.createDataFrame(path, "src long, dst long")
    capped = {
        r["v"]: r["rank"]
        for r in pagerank_fixed_point(
            e2, n_iters=9, rejoin_receiverless=False, stop_on_fixpoint=True
        ).collect()
    }
    assert capped == pagerank_reference_py(path, n_iters=9)


def test_pagerank_personalized_matches_simulator(spark):
    """Personalized restarts: mass concentrates on the seed set, a
    vertex unreachable FROM the seeds converges to exactly 0, and the
    distributed integer arithmetic equals the simulator bit-for-bit.
    Seeds absent from the graph are ignored; an empty effective seed
    set raises."""
    import pytest as _pytest

    from ccxt_ohlcv_fetcher_spark.operators.graph import (
        pagerank_fixed_point,
        pagerank_reference_py,
    )

    # two weakly-linked clusters: {1,2} <-> and {3,4} <->, plus 2->3
    # (one-way bridge). Seeding at 1: vertex 4 is reachable, but
    # nothing flows BACK to {1,2} from {3,4}... and an isolated pair
    # {8,9} is fully unreachable -> exact 0.
    el = [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3), (8, 9), (9, 8)]
    edges = spark.createDataFrame(el, "src long, dst long")
    seeds = spark.createDataFrame([(1,), (999,)], "v long")  # 999 ignored
    got = {
        r["v"]: r["rank"]
        for r in pagerank_fixed_point(
            edges, n_iters=8, personalize=seeds
        ).collect()
    }
    assert got == pagerank_reference_py(el, n_iters=8, seeds={1, 999})
    assert got[8] == 0 and got[9] == 0  # unreachable: exact 0
    # restart favors the seed over its in-cluster peer; the one-way
    # bridge makes {3,4} a mass trap, so 3 may legitimately outrank 1
    assert got[1] > got[2] > 0

    with _pytest.raises(ValueError, match="no seed vertex"):
        pagerank_fixed_point(
            edges,
            n_iters=2,
            personalize=spark.createDataFrame([(777,)], "v long"),
        )


def test_attribution_models_conserve_purchase_value(spark, sf_dir):
    from pyspark.sql import functions as F

    from ccxt_ohlcv_fetcher_spark.plans.analytics import event_touch_attribution
    from ccxt_ohlcv_fetcher_spark.sources.tables import load_table

    out = event_touch_attribution(spark, sf_dir)
    totals = {
        r["model"]: r["total"]
        for r in out.groupBy("model")
        .agg(F.sum(F.col("credited").cast("decimal(18,6)")).alias("total"))
        .collect()
    }
    purchases = (
        load_table(spark, sf_dir, "events")
        .filter("event_type = 'purchase'")
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)")).alias("t"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    # every model distributes exactly the total purchase value: first/
    # last by construction; linear because per-purchase shares sum to
    # value (decimal rounding of shares can drift by <= n * 5e-7)
    assert totals["first_touch"] == purchases["t"]
    assert totals["last_touch"] == purchases["t"]
    assert abs(float(totals["linear"]) - float(purchases["t"])) < purchases["n"] * 1e-5
    # conversion counts: first/last models credit each purchase once
    n_first = (
        out.filter("model = 'first_touch'")
        .agg(F.sum("n_conversions").alias("n"))
        .collect()[0]["n"]
    )
    assert n_first == purchases["n"]


def test_k_core_matches_python_reference(spark, sf_dir):
    from ccxt_ohlcv_fetcher_spark.operators.graph import (
        k_core,
        k_core_reference_py,
    )
    from ccxt_ohlcv_fetcher_spark.plans.analytics import _copurchase_edges

    # crafted: a triangle (2-core) with a pendant chain (peels away),
    # and the chain pulls a triangle vertex's degree up so one round
    # is NOT enough
    crafted = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(crafted, "src long, dst long")
    got = {(r["src"], r["dst"]) for r in k_core(df, 2).collect()}
    assert got == k_core_reference_py(crafted, 2) == {(1, 2), (1, 3), (2, 3)}
    # k=3 empties it
    assert k_core(df, 3).count() == 0

    # real fixture edges: distributed fixpoint == python reference
    edges = [(r["pa"], r["pb"]) for r in _copurchase_edges(spark, sf_dir).collect()]
    ref = k_core_reference_py(edges, 2)
    got = {(r["src"], r["dst"]) for r in k_core(
        _copurchase_edges(spark, sf_dir), 2, src="pa", dst="pb"
    ).collect()}
    assert got == ref


def test_ols_price_model_matches_numpy_lstsq(spark, sf_dir):
    """The Cramer's-rule OLS (lineitem_ols_price_model) must reproduce
    numpy's least-squares solution to the query's own 6-decimal
    precision — pinning the math itself, not just cross-engine
    agreement with the DuckDB oracle."""
    import numpy as np

    from ccxt_ohlcv_fetcher_spark.plans import load_all

    got = {
        r["l_returnflag"]: r
        for r in load_all()["lineitem_ols_price_model"]
        .builder(spark, sf_dir)
        .collect()
    }
    li = (
        load_all()["lineitem_ols_price_model"]
        .builder(spark, sf_dir)
        .sparkSession.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_discount", "l_extendedprice")
        .toPandas()
    )
    for flag, g in li.groupby("l_returnflag"):
        X = np.column_stack(
            [
                np.ones(len(g)),
                g.l_quantity.to_numpy(),
                np.round(g.l_discount.to_numpy() * 100),
            ]
        )
        y = np.round(g.l_extendedprice.to_numpy() * 100)
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        row = got[flag]
        assert row["n_rows"] == len(g)
        for name, b in zip(("icept_usd", "beta_qty_usd", "beta_disc_usd"), beta):
            assert abs(row[name] - b / 100) < 1e-5, (flag, name, row[name], b / 100)


def test_local_clustering_matches_python_reference(spark):
    """local_clustering on a handcrafted graph vs a brute-force Python
    computation: K4 minus one edge (mixed coefficients), a pendant
    vertex (deg 1 -> excluded), and an isolated edge (both endpoints
    excluded)."""
    from itertools import combinations

    from ccxt_ohlcv_fetcher_spark.operators.graph import local_clustering

    # K4 on {1,2,3,4} minus edge (3,4), plus pendant 5-1, plus edge 6-7
    edge_list = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (5, 1), (6, 7)]
    edge_list = [tuple(sorted(e)) for e in edge_list]
    df = spark.createDataFrame(edge_list, "pa int, pb int")
    got = {
        r["v"]: (r["deg"], r["tri"], r["lcc"])
        for r in local_clustering(df).collect()
    }

    # brute force
    adj: dict[int, set[int]] = {}
    for a, b in edge_list:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for v, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        t = sum(1 for x, y in combinations(sorted(nb), 2) if y in adj[x])
        want[v] = (d, t, 2.0 * t / (d * (d - 1)))
    assert got == want
    # spot values: 1 has deg 4 (2,3,4,5), triangles (2,3),(2,4) -> 2
    assert got[1] == (4, 2, 2.0 * 2 / 12)
    assert got[3] == (2, 1, 1.0) and got[4] == (2, 1, 1.0)
    assert 5 not in got and 6 not in got and 7 not in got


def test_km_survival_invariants(spark, sf_dir):
    """Kaplan-Meier structural pins (the oracle proves cross-engine
    exactness; this pins the ESTIMATOR's semantics): risk sets
    strictly decrease over event days, every reported day has at
    least one conversion, ln-survival is nonpositive and
    nonincreasing, and the first risk set is bounded by (and with
    censoring strictly related to) the cohort size."""
    from ccxt_ohlcv_fetcher_spark.plans import load_all

    rows = (
        load_all()["user_churn_km"].builder(spark, sf_dir)
        .orderBy("t")
        .collect()
    )
    assert rows, "fixture produced no conversion days"
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    prev_risk, prev_ln = None, 0.0
    for r in rows:
        assert r["d"] >= 1 and r["d"] < r["n_risk"]
        if prev_risk is not None:
            assert r["n_risk"] < prev_risk  # exits are cumulative
        assert r["ln_survival"] <= prev_ln + 1e-12
        prev_risk, prev_ln = r["n_risk"], r["ln_survival"]
    # the whole cohort is at risk on day 0 unless someone exited at t=0
    assert rows[0]["n_risk"] <= n_users
    assert sum(r["d"] for r in rows) <= n_users
