"""Invariant + mirror tests for the wave-8 graph/diagnostics operators
(operators/graph.py, operators/diagnostics.py)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from spark_ml_spark.operators import diagnostics as D  # noqa: F401
from spark_ml_spark.operators import graph as G

SF = "/root/testdata/sf0.001"


def _py_edges(spark):
    """Transition edges recomputed independently in Python."""
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    edges = Counter()
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            edges[(a, b)] += 1
    return edges


def test_transition_matrix_matches_python_mirror(spark):
    edges = _py_edges(spark)
    outw = Counter()
    for (a, _b), w in edges.items():
        outw[a] += w
    got = {
        (r.src, r.dst): (r.w, r.p_ppm)
        for r in G.q_transition_matrix(spark, SF).collect()
    }
    assert set(got) == set(edges)
    for (a, b), w in edges.items():
        p_ppm = math.floor(w * 1000000.0 / outw[a] + 0.5)
        assert got[(a, b)] == (w, p_ppm)


def test_pagerank_matches_python_mirror(spark):
    """The integer-quantized iteration is fully deterministic, so an
    exact Python mirror reproduces every rank."""
    edges = _py_edges(spark)
    outw = Counter()
    nodes = set()
    for (a, b), w in edges.items():
        outw[a] += w
        nodes.update((a, b))
    n = len(nodes)
    base = math.floor(150000000.0 / n + 0.5)
    p = {v: math.floor(1000000000.0 / n + 0.5) for v in nodes}
    for _ in range(G._PR_ITERS):
        s = defaultdict(int)
        for (a, b), w in edges.items():
            s[b] += math.floor(0.85 * p[a] * w / outw[a] + 0.5)
        p = {v: base + s.get(v, 0) for v in nodes}
    got = {r.node: r.p_nano for r in G.q_pagerank(spark, SF).collect()}
    assert got == p


def test_pagerank_conserves_probability_mass(spark):
    out = G.q_pagerank(spark, SF).collect()
    n = len(out)
    total = sum(r.p_nano for r in out)
    # mass leaks only through per-edge/per-node floor rounding: each of
    # the <= n^2 edges and n nodes contributes at most 1 nano per round
    slack = G._PR_ITERS * (n * n + n) + n
    assert abs(total - 1_000_000_000) <= slack
    assert all(r.p_nano > 0 for r in out)


def test_skew_profile_matches_python_mirror(spark):
    rows = spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    counts = Counter()
    for r in rows:
        counts.update(r.text.strip().lower().split())
    total = sum(counts.values())
    n_keys = len(counts)
    max_cnt = max(counts.values())
    singles = sum(1 for c in counts.values() if c == 1)
    cof = Counter(counts.values())
    entropy = sum(
        math.floor(
            (freq * c * 1000000.0 / total) * (-math.log(c * 1.0 / total)) + 0.5
        )
        for c, freq in cof.items()
    )
    r = D.q_skew_profile(spark, SF).collect()[0]
    assert (r.n_keys, r.total_rows, r.max_cnt, r.singleton_keys) == (
        n_keys, total, max_cnt, singles
    )
    assert r.skew_ppm == math.floor(max_cnt * 1000000.0 * n_keys / total + 0.5)
    assert r.top_share_ppm == math.floor(max_cnt * 1000000.0 / total + 0.5)
    # ln() may differ from JVM log by an ulp per distinct-count row
    assert abs(r.entropy_micro_nats - entropy) <= len(cof)


def test_skew_profile_mathematical_bounds(spark):
    """Bounds that hold for ANY distribution: max >= mean (skew_ppm >=
    1e6), the hottest share is at most 1, and entropy lies in
    [0, ln(n_keys)] — at the top only for a perfectly uniform key set.
    (The synthetic fixture's vocabulary is NEAR-uniform, so skew_ppm
    lands close to 1e6 — the profile correctly reporting a safe
    shuffle key; a natural-language Zipf corpus would send it far
    above. The value itself is pinned by the oracle gate.)"""
    r = D.q_skew_profile(spark, SF).collect()[0]
    assert r.skew_ppm >= 1_000_000
    assert 0 < r.top_share_ppm <= 1_000_000
    assert 0 <= r.entropy_micro_nats <= 1_000_000 * math.log(r.n_keys) + 1
    assert 0 <= r.singleton_keys <= r.n_keys


def test_oriented_out_degree_bounded_by_sqrt_2m(spark):
    """Safety argument for the AQE shuffle-join fallback in
    q_triangle_count / q_local_clustering (VERDICT r5 directive #6):
    after the (degree, node)-ordered orientation, every out-neighbor
    array is ≤ √(2m) long — so the adjacency rows the shuffle join moves
    are individually bounded and the intersection work stays O(m^1.5).
    Proof shape: if out-degree(u) = d, each out-neighbor has total
    degree ≥ degree(u) ≥ d, so 2m = Σ degrees ≥ d·d."""
    from spark_ml_spark.operators.graph_metrics import _part_edges

    e = _part_edges(spark, "/root/testdata/sf0.001")
    rows = e.collect()
    deg = Counter()
    for r in rows:
        deg[r.a] += 1
        deg[r.b] += 1
    m = len(rows)
    out = Counter()
    for r in rows:
        u = r.a if (deg[r.a], r.a) < (deg[r.b], r.b) else r.b
        out[u] += 1
    assert max(out.values()) <= math.sqrt(2 * m), (
        max(out.values()), math.sqrt(2 * m)
    )
    # and the oriented edge set is an exact partition of the edge set
    assert sum(out.values()) == m
