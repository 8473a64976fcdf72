"""embedding_covariance (exact integer Gram) and pca_project."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from spork_spark.operators import embedding_covariance, pca_project


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(7)
    X = rng.randn(40, 4) @ np.diag([3.0, 1.0, 0.3, 0.05])
    rows = [(i, [float(x) for x in X[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    return df, X


def test_covariance_matches_numpy_on_quantized(vecs):
    df, X = vecs
    out = {(r.i, r.j): r for r in
           embedding_covariance(df, "embedding", scale=1000).collect()}
    Q = np.floor(X * 1000 + 0.5).astype(np.int64)
    n = Q.shape[0]
    G = Q.T @ Q
    s = Q.sum(axis=0)
    assert len(out) == 4 * 5 // 2
    for (i, j), r in out.items():
        assert r.n == n
        assert r.s_i == s[i - 1] and r.s_j == s[j - 1]
        assert r.s_ij == G[i - 1, j - 1]
        num = int(n) * int(G[i - 1, j - 1]) - int(s[i - 1]) * int(s[j - 1])
        want = (1 if num >= 0 else -1) * (abs(num) // (n * n))
        assert r.cov_e6 == want


def test_covariance_skips_malformed_rows(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [1.0]), (4, [3.0, 4.0])],
        "vec_id bigint, embedding array<double>")
    out = embedding_covariance(df, "embedding", dim=2).collect()
    assert all(r.n == 2 for r in out)          # null + wrong-len excluded


def test_covariance_partition_invariant(vecs):
    df, _ = vecs
    a = sorted(map(tuple, embedding_covariance(
        df.repartition(1), "embedding").collect()))
    b = sorted(map(tuple, embedding_covariance(
        df.repartition(7), "embedding").collect()))
    assert a == b                              # exact integers: no drift


def test_pca_project_recovers_dominant_axes(vecs):
    df, X = vecs
    out = pca_project(df, "embedding", k=2)
    P = np.array([r.pca for r in out.orderBy("vec_id").collect()])
    assert P.shape == (40, 2)
    # exact covariance -> numpy PCA on the same quantized matrix agrees
    Q = np.floor(X * 1000 + 0.5) / 1000.0
    C = np.cov(Q.T, bias=True)
    vals, vecs_np = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:2]
    W = vecs_np[:, order].T
    for r in range(2):
        j = int(np.argmax(np.abs(W[r])))
        if W[r, j] < 0:
            W[r] = -W[r]
    # projections computed on UNQUANTIZED X; dominant-axis variance and
    # near-agreement with the numpy reference (quantization ~1e-3)
    ref = (X - X.mean(axis=0)) @ W.T
    assert P[:, 0].var() > P[:, 1].var()
    assert np.abs(np.abs(P) - np.abs(ref)).max() < 0.05


def test_rademacher_projection_exact_and_distance_preserving(spark):
    import numpy as np
    from spork_spark.operators import rademacher_projection
    import hashlib
    rng = np.random.RandomState(11)
    X = rng.randn(30, 16)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(30)],
        "vec_id bigint, embedding array<double>")
    out = rademacher_projection(df, out_dim=8, seed=7)
    rows = {r.vec_id: r.sketch for r in out.collect()}

    def sign(k, i):
        h = hashlib.md5(f"7:{k}:{i}".encode()).hexdigest()
        return 1 if int(h[0], 16) % 2 == 0 else -1
    S = np.array([[sign(k, i) for i in range(16)] for k in range(8)])
    Q = np.floor(X * 1000 + 0.5).astype(np.int64)
    want = Q @ S.T
    for i in range(30):
        assert list(rows[i]) == list(want[i])       # exact integers
    # JL property (loose): sketch distances correlate with true ones
    P = want / 1000.0 / np.sqrt(8)
    d_true = np.linalg.norm(X[:, None] - X[None, :], axis=2).ravel()
    d_sk = np.linalg.norm(P[:, None] - P[None, :], axis=2).ravel()
    mask = d_true > 0
    # loose sanity bound: an 8-dim sketch of 16-dim data preserves
    # distance ORDER only statistically (JL epsilon is large at k=8)
    assert np.corrcoef(d_true[mask], d_sk[mask])[0, 1] > 0.5
