"""linalg.gram_matrix_q / pca_power_top: exact integer Gram + power
iteration. Reference = numpy brute force for values, and a naive
pure-Python integer replay of the pinned iteration rule for exactness.
"""

import numpy as np

from ppocr_spark.functions.linalg import (VSCALE, gram_matrix_q,
                                          pca_power_top)

DIM = 8


def _vec_df(spark, x):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(x)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def _rand(n, seed=7, spread=0.5):
    rng = np.random.default_rng(seed)
    return (rng.random((n, DIM)) - 0.5) * 2 * spread


def _quantize_ref(x, quant=10**6):
    """Engine quantization replay: the table stores float32, so the
    engines round (float32 value)·quant half-away-from-zero."""
    x32 = x.astype(np.float32).astype(np.float64)
    return np.floor(np.abs(x32) * quant + 0.5).astype(np.int64) * np.sign(
        x32
    ).astype(np.int64)


def ref_pca(x, iters=3, quant=10**6, vscale=VSCALE):
    """Naive integer replay: quantize, exact Gram, matvec +
    truncating-DIV renormalize."""
    xq = _quantize_ref(x, quant)
    g = [[int(sum(int(r[i]) * int(r[j]) for r in xq))
          for j in range(DIM)] for i in range(DIM)]
    def tdiv(a, b):
        # exact truncation toward zero = engine DIV semantics
        return abs(a) // b if a >= 0 else -(abs(a) // b)

    v = [vscale] * DIM
    for _ in range(iters):
        w = [sum(g[i][j] * v[j] for j in range(DIM)) for i in range(DIM)]
        m = max(max(abs(c) for c in w), 1)
        v = [tdiv(c * vscale, m) for c in w]
    return v


class TestGram:
    def test_matches_numpy(self, spark):
        x = _rand(40)
        xq = _quantize_ref(x)
        want = xq.T @ xq
        got = gram_matrix_q(_vec_df(spark, x), dim=DIM).collect()
        assert len(got) == DIM * DIM
        for r in got:
            assert int(r["g"]) == int(want[r["i"], r["j"]])

    def test_layout_independence(self, spark):
        x = _rand(60, seed=11)
        d = _vec_df(spark, x)
        a = {(r["i"], r["j"]): int(r["g"])
             for r in gram_matrix_q(d, dim=DIM).collect()}
        b = {(r["i"], r["j"]): int(r["g"])
             for r in gram_matrix_q(d.repartition(9), dim=DIM).collect()}
        assert a == b


class TestPcaPower:
    def test_matches_naive_reference(self, spark):
        x = _rand(50, seed=3)
        got = {
            r["dim"]: r["loading_micro"]
            for r in pca_power_top(_vec_df(spark, x), dim=DIM).collect()
        }
        want = ref_pca(x)
        assert [got[i] for i in range(DIM)] == want

    def test_direction_matches_eigh(self, spark):
        # planted dominant direction: spectrum is well separated, so 3
        # power iterations already align with the true top eigenvector.
        rng = np.random.default_rng(5)
        u = rng.random(DIM) - 0.5
        u /= np.linalg.norm(u)
        x = np.outer(rng.standard_normal(200), u) * 0.4 + _rand(
            200, seed=9, spread=0.02
        )
        got = np.array(
            [
                r["loading_micro"]
                for r in pca_power_top(_vec_df(spark, x), dim=DIM)
                .orderBy("dim")
                .collect()
            ],
            dtype=np.float64,
        )
        xq = np.round(x * 1e6)
        evals, evecs = np.linalg.eigh(xq.T @ xq)
        top = evecs[:, np.argmax(evals)]
        cos = abs(got @ top) / (np.linalg.norm(got) * np.linalg.norm(top))
        assert cos > 0.999

    def test_all_zero_vectors_no_crash(self, spark):
        x = np.zeros((10, DIM))
        got = pca_power_top(_vec_df(spark, x), dim=DIM).collect()
        assert sorted(r["loading_micro"] for r in got) == [0] * DIM

    def test_layout_independence(self, spark):
        x = _rand(80, seed=21)
        d = _vec_df(spark, x)
        a = {r["dim"]: r["loading_micro"]
             for r in pca_power_top(d, dim=DIM).collect()}
        b = {r["dim"]: r["loading_micro"]
             for r in pca_power_top(d.repartition(13), dim=DIM).collect()}
        assert a == b
