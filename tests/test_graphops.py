"""Connected components (operators/components.py) and PageRank
(operators/graphrank.py) against plain-Python oracles: union-find for
CC on seeded random graphs (plus the adversarial path graph the
pointer-jump doubling exists for), dense power iteration for PageRank
with the identical float expression shape."""

import random

import pytest

from track0_spark.operators.components import connected_components
from track0_spark.operators.graphrank import pagerank


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # component label = min member id
    comp = {}
    for u, v in edges:
        for x in (u, v):
            comp.setdefault(find(x), set()).add(x)
    return {x: min({r} | m) for r, m in comp.items() for x in m | {r}}


@pytest.mark.parametrize("seed,n,m", [(1, 60, 40), (2, 200, 150), (3, 100, 300)])
def test_cc_matches_union_find(spark, seed, n, m):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["cluster"]
        for r in connected_components(df, "src", "dst").collect()
    }
    want = _union_find(n, edges)
    assert got == want


def test_cc_path_graph_converges_logarithmically(spark):
    """A 64-node path is the O(diameter) killer for naive label
    propagation; hook+jump must still land every node on cluster 0
    within max_iter (doubling: ~log2(64) + slack rounds)."""
    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, "src", "dst", max_iter=12).collect()
    assert len(out) == 64
    assert {r["cluster"] for r in out} == {0}


def test_cc_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df, "src", "dst").count() == 0


def _py_pagerank(edges, iters=5, damping=0.85):
    outw = {}
    for s, _d, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    nodes = sorted(outw)
    n = len(nodes)
    rank = {u: 1.0 / n for u in nodes}
    for _ in range(iters):
        contrib = {}
        for s, d, w in edges:
            contrib[d] = contrib.get(d, 0.0) + rank[s] * w / outw[s]
        rank = {
            u: (1.0 - damping) / n + damping * contrib.get(u, 0.0)
            for u in nodes
        }
    return rank


def test_pagerank_matches_power_iteration(spark):
    rng = random.Random(7)
    n = 40
    edges = []
    for u in range(n):  # every node gets >= 1 out-edge (no dangling)
        for v in rng.sample(range(n), 4):
            if v != u:
                edges.append((f"n{u}", f"n{v}", float(rng.randint(1, 5))))
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=5).collect()}
    want = _py_pagerank(edges, iters=5)
    assert set(got) == set(want)
    for u in want:
        assert abs(got[u] - want[u]) < 1e-12, u
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_uniform_on_regular_graph(spark):
    """On a symmetric complete graph the uniform vector is stationary:
    every rank stays exactly 1/n under the damped iteration."""
    n = 8
    edges = [
        (f"v{u}", f"v{v}", 1.0) for u in range(n) for v in range(n) if u != v
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    ranks = [r["rank"] for r in pagerank(df, iters=3).collect()]
    assert len(ranks) == n
    for r in ranks:
        assert abs(r - 1.0 / n) < 1e-14


def _py_pagerank_dangling(edges, iters=5, damping=0.85):
    """Dense reference with the standard dangling-mass term."""
    outw = {}
    nodes = set()
    for s, d, w in edges:
        outw[s] = outw.get(s, 0.0) + w
        nodes.add(s)
        nodes.add(d)
    nodes = sorted(nodes)
    n = len(nodes)
    rank = {u: 1.0 / n for u in nodes}
    for _ in range(iters):
        dm = sum(rank[u] for u in nodes if u not in outw)
        contrib = {}
        for s, d, w in edges:
            contrib[d] = contrib.get(d, 0.0) + rank[s] * w / outw[s]
        rank = {
            u: (1.0 - damping) / n
            + damping * (contrib.get(u, 0.0) + dm / n)
            for u in nodes
        }
    return rank


def test_pagerank_forbid_raises_on_sinks(spark):
    """ADVICE r4 low: the default mode now FAILS LOUDLY on a dangling
    node instead of silently leaking its rank mass."""
    df = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "sink", 1.0)], "src string, dst string, w double"
    )
    with pytest.raises(ValueError, match="dangling"):
        pagerank(df, iters=2)


def test_pagerank_dangling_redistribute_known_answer(spark):
    """VERDICT r4 #8 known-answer: a graph WITH sinks ranks correctly
    under dangling='redistribute' — matches the dense reference to
    1e-12 and total mass stays ~1 (no leak)."""
    rng = random.Random(11)
    edges = []
    for u in range(30):  # nodes n30..n39 are pure sinks
        for v in rng.sample(range(40), 3):
            if v != u:
                edges.append((f"n{u}", f"n{v}", float(rng.randint(1, 5))))
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, iters=5, dangling="redistribute").collect()
    }
    want = _py_pagerank_dangling(edges, iters=5)
    assert set(got) == set(want)
    for u in want:
        assert abs(got[u] - want[u]) < 1e-12, u
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_redistribute_equals_plain_when_no_sinks(spark):
    """With zero sinks the dangling term is identically 0: both modes
    produce the same ranks (bitwise-comparable to 1e-15)."""
    edges = [
        (f"v{u}", f"v{v}", 1.0) for u in range(6) for v in range(6) if u != v
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    a = {r["node"]: r["rank"] for r in pagerank(df, iters=4).collect()}
    b = {
        r["node"]: r["rank"]
        for r in pagerank(df, iters=4, dangling="redistribute").collect()
    }
    assert set(a) == set(b)
    for u in a:
        assert abs(a[u] - b[u]) < 1e-15
