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


def ref_triangles(pairs, nodes):
    """Naive reference: count triangles by set intersection of
    neighbor sets; clustering via the same integer-ppm rule."""
    nb = {v: set() for v in nodes}
    for a, b in pairs:
        nb[a].add(b)
        nb[b].add(a)
    tri = {v: 0 for v in nodes}
    seen = set()
    for a, b in pairs:
        for c in nb[a] & nb[b]:
            key = tuple(sorted((a, b, c)))
            if key not in seen:
                seen.add(key)
                for v in key:
                    tri[v] += 1
    out = {}
    for v in nodes:
        d = len(nb[v])
        ppm = (2000000 * tri[v]) // (d * (d - 1)) if d >= 2 else 0
        out[v] = (d, tri[v], ppm)
    return out


class TestTriangles:
    PAIRS = [
        # clique {a,b,c,d} (4 triangles), triangle {c,e,f}? no —
        # separate triangle {e,f,g}, chain h-i-j (no triangles)
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
        ("c", "d"),
        ("e", "f"), ("e", "g"), ("f", "g"),
        ("h", "i"), ("i", "j"),
    ]
    NODES = list("abcdefghijk")  # k isolated

    def _run(self, spark, pairs, nodes):
        from ppocr_spark.functions.graph import triangle_stats

        p = spark.createDataFrame(pairs, "a string, b string")
        nd = spark.createDataFrame([(x,) for x in nodes], "node string")
        return {
            r["node"]: (r["degree"], r["triangles"], r["clustering_ppm"])
            for r in triangle_stats(p, nd).collect()
        }

    def test_matches_naive_reference(self, spark):
        got = self._run(spark, self.PAIRS, self.NODES)
        assert got == ref_triangles(self.PAIRS, self.NODES)

    def test_known_counts(self, spark):
        got = self._run(spark, self.PAIRS, self.NODES)
        # clique-of-4 members: deg 3, 3 triangles each, clustering 1.0
        assert got["a"] == (3, 3, 1000000)
        # triangle members: deg 2, 1 triangle, clustering 1.0
        assert got["e"] == (2, 1, 1000000)
        # chain middle: deg 2, no triangle
        assert got["i"] == (2, 0, 0)
        # isolated node present with zeros
        assert got["k"] == (0, 0, 0)

    def test_layout_independence(self, spark):
        from ppocr_spark.functions.graph import triangle_stats

        p = spark.createDataFrame(self.PAIRS, "a string, b string")
        nd = spark.createDataFrame(
            [(x,) for x in self.NODES], "node string"
        )
        a = {r["node"]: r["triangles"]
             for r in triangle_stats(p, nd).collect()}
        b = {r["node"]: r["triangles"]
             for r in triangle_stats(
                 p.repartition(5, "b"), nd.repartition(2)).collect()}
        assert a == b

    def test_star_has_no_triangles(self, spark):
        pairs = [("hub", f"s{i}") for i in range(6)]
        nodes = ["hub"] + [f"s{i}" for i in range(6)]
        got = self._run(spark, pairs, nodes)
        assert got["hub"] == (6, 0, 0)
        assert all(got[f"s{i}"] == (1, 0, 0) for i in range(6))


class TestLabelPropagation:
    def _run(self, spark, edge_pairs, node_ids, iters=2):
        from ppocr_spark.functions.graph import label_propagation

        und = edge_pairs + [(b, a) for a, b in edge_pairs]
        e = spark.createDataFrame(und, "u long, v long")
        n = spark.createDataFrame([(i,) for i in node_ids], "node long")
        return {
            r["node"]: r["community"]
            for r in label_propagation(e, n, iters=iters).collect()
        }

    def test_hand_unrolled_two_rounds(self, spark):
        # two triangles bridged by one edge + an isolated node; the
        # deterministic simultaneous update with (cnt desc, lab asc)
        # tie-break gives exactly this trajectory (hand-unrolled):
        # l1 = {1:2, 2:1, 3:1, 4:3, 5:4, 6:4}
        # l2 = {1:1, 2:1, 3:1, 4:4, 5:3, 6:3}; 7 isolated keeps 7
        edges = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
        got = self._run(spark, edges, range(1, 8), iters=2)
        assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 3, 6: 3, 7: 7}

    def test_zero_iters_identity_and_layout_independence(self, spark):
        edges = [(1, 2), (2, 3)]
        assert self._run(spark, edges, [1, 2, 3], iters=0) == {
            1: 1, 2: 2, 3: 3
        }
        from ppocr_spark.functions.graph import label_propagation

        und = edges + [(b, a) for a, b in edges]
        e = spark.createDataFrame(und, "u long, v long").repartition(7)
        n = spark.createDataFrame([(i,) for i in (1, 2, 3)],
                                  "node long").repartition(3)
        relaid = {
            r["node"]: r["community"]
            for r in label_propagation(e, n, iters=2).collect()
        }
        assert relaid == self._run(spark, edges, [1, 2, 3], iters=2)
