"""graph.pagerank: integer-exact PageRank over derived document graphs.

The reference implementation in these tests is a deliberately naive
pure-Python integer loop (dict-based) evaluating the SAME pinned update
rule — any divergence between it and the distributed join/agg path is a
bug in the distributed lowering, not a tolerance question.
"""

from ppocr_spark.functions.graph import PAGERANK_SCALE, pagerank


def ref_pagerank(edges, nodes, iters=3, scale=PAGERANK_SCALE):
    """Naive single-process replay of the pinned integer update rule.
    Python ``//`` floors while the engines truncate toward zero, but all
    PageRank quantities are non-negative so the two agree."""
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    n = len(nodes)
    pr = {v: scale // n for v in nodes}
    for _ in range(iters):
        dang = sum(p for v, p in pr.items() if v not in deg)
        recv = {v: 0 for v in nodes}
        for u, v in edges:
            recv[v] += pr[u] // deg[u]
        pr = {
            v: (15 * (scale // n)) // 100
            + (85 * (recv[v] + dang // n)) // 100
            for v in nodes
        }
    return pr


def run_pagerank(spark, edges, nodes, **kw):
    e = spark.createDataFrame(edges, "u string, v string")
    nd = spark.createDataFrame([(x,) for x in nodes], "node string")
    out = pagerank(e, nd, **kw).collect()
    return {r["node"]: r["pr"] for r in out}


class TestPagerank:
    EDGES = [
        # a near-dup triangle + a chain hanging off it + an isolated pair
        ("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
        ("a", "c"), ("c", "a"), ("c", "d"), ("d", "c"),
        ("e", "f"), ("f", "e"),
    ]
    NODES = ["a", "b", "c", "d", "e", "f", "g"]  # g isolated (dangling)

    def test_matches_naive_reference(self, spark):
        got = run_pagerank(spark, self.EDGES, self.NODES)
        want = ref_pagerank(self.EDGES, self.NODES)
        assert got == want

    def test_centrality_ordering(self, spark):
        pr = run_pagerank(spark, self.EDGES, self.NODES)
        # c has 3 in-edges (a, b, d) — the most central; the dangling
        # isolate g holds only the teleport + dangling share.
        assert pr["c"] == max(pr.values())
        assert pr["g"] == min(pr.values())
        # symmetric positions rank identically
        assert pr["e"] == pr["f"]
        assert pr["a"] == pr["b"]

    def test_mass_approximately_conserved(self, spark):
        pr = run_pagerank(spark, self.EDGES, self.NODES)
        total = sum(pr.values())
        # truncating DIV only ever discards mass; per iteration the rule
        # performs ≤ (|E| + 2n + 2) divisions each losing < 1 unit ×
        # their multipliers (≤ 100) — loose bound, tight enough to catch
        # a double-count or a lost dangling term.
        leak_bound = 3 * 100 * (len(self.EDGES) + 2 * len(self.NODES) + 2)
        assert total <= PAGERANK_SCALE
        assert total >= PAGERANK_SCALE - leak_bound

    def test_layout_independence(self, spark):
        e = spark.createDataFrame(self.EDGES, "u string, v string")
        nd = spark.createDataFrame(
            [(x,) for x in self.NODES], "node string"
        )
        base = {
            r["node"]: r["pr"] for r in pagerank(e, nd).collect()
        }
        shuffled = {
            r["node"]: r["pr"]
            for r in pagerank(
                e.repartition(7, "v"), nd.repartition(3)
            ).collect()
        }
        assert base == shuffled

    def test_single_node_graph(self, spark):
        # one node, no edges: everything is dangling; rank = teleport +
        # its own redistributed mass, replayed by the naive rule too.
        got = run_pagerank(spark, [], ["only"])
        want = ref_pagerank([], ["only"])
        assert got == want

    def test_iters_zero_is_uniform(self, spark):
        got = run_pagerank(spark, self.EDGES, self.NODES, iters=0)
        assert set(got.values()) == {PAGERANK_SCALE // len(self.NODES)}


class TestPagerankScaleShape:
    def test_plan_has_no_bnlj_beyond_constant_attach(self, spark):
        # the 1-row n/dang attaches are BNLJ-as-map (whitelisted); the
        # rank propagation itself must stay hash equi-joins.
        e = spark.createDataFrame(
            [("a", "b"), ("b", "a")], "u string, v string"
        )
        nd = spark.createDataFrame(
            [("a",), ("b",), ("c",)], "node string"
        )
        plan = pagerank(e, nd, iters=1)._jdf.queryExecution().toString()
        assert "CartesianProduct" not in plan
