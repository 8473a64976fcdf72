"""Distributed linear algebra over embedding columns: exact-integer
covariance (Gram) accumulation and PCA projection — the
dimensionality-reduction / whitening step of an embedding-curation
pipeline (extension beyond the reference surface; SURVEY.md §2.11
family, next to similarity and curation).

The covariance follows the repo's exact-arithmetic discipline: each
component quantizes to q = floor(x·scale + 0.5) (int64) and every
statistic is an integer sum of q-products, so the DuckDB oracle
reproduces the full matrix digit-for-digit. The heavy pass is a
mapInPandas kernel that accumulates ONE dim×dim int64 Gram matrix per
partition with numpy (Q^T Q per Arrow batch) — the corpus crosses the
wire as dim(dim+1)/2-row partials per partition, never as vectors —
then a map-side-combined groupBy folds the partials. This is the
tree-aggregate shape that survives 100 TB: work proportional to rows
stays in the partitions; shuffled bytes are O(partitions · dim²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_covariance(df: DataFrame, vec_col: str = "embedding",
                         dim: int | None = None,
                         scale: int = 1000) -> DataFrame:
    """Upper-triangle population covariance of a vector column, exact.

    Output: (i, j, n, s_i, s_j, s_ij, cov_e6) for 1 ≤ i ≤ j ≤ dim —
    s_* are exact integer sums of quantized components / products, and
    cov_e6 = (n·s_ij − s_i·s_j) div n² is the population covariance in
    (x·scale)² units; at the default scale=1000 that reads as the
    x-unit covariance scaled by 10⁶ (sign-split integer division, so
    truncation is engine-portable). Exactness bound: int64 partials
    hold to ~9·10¹² rows per partition at |x| ≤ 1; the global fold sums
    in decimal(38,0), good for ~10²⁴ rows.

    Rows with a null vector or wrong length are excluded (counted out
    by the kernel, not errored — a malformed row must not kill a
    100 TB job; run dq_validate for the census).
    """
    import numpy as np
    import pandas as pd

    if dim is None:
        probe = df.select(F.size(vec_col)).where(
            F.col(vec_col).isNotNull()).first()
        if probe is None:
            raise ValueError("cannot infer dim from an all-null column")
        dim = probe[0]
    d, sc = dim, scale
    iu = [(i, j) for i in range(d) for j in range(i, d)]

    def gram(batches):
        G = np.zeros((d, d), dtype=np.int64)
        s = np.zeros(d, dtype=np.int64)
        n = 0
        for pdf in batches:
            vecs = [v for v in pdf[vec_col]
                    if v is not None and len(v) == d]
            if not vecs:
                continue
            X = np.asarray(vecs, dtype=np.float64)
            Q = np.floor(X * sc + 0.5).astype(np.int64)
            G += Q.T @ Q
            s += Q.sum(axis=0)
            n += Q.shape[0]
        yield pd.DataFrame({
            "i": [i + 1 for i, _ in iu],
            "j": [j + 1 for _, j in iu],
            "pn": np.full(len(iu), n, dtype=np.int64),
            "ps_i": [s[i] for i, _ in iu],
            "ps_j": [s[j] for _, j in iu],
            "ps_ij": [G[i, j] for i, j in iu]})

    partials = df.select(vec_col).mapInPandas(
        gram, schema=("i int, j int, pn long, ps_i long, ps_j long, "
                      "ps_ij long"))
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sums = (partials.groupBy("i", "j")
                    .agg(F.sum(d38("pn")).alias("__n"),
                         F.sum(d38("ps_i")).alias("__si"),
                         F.sum(d38("ps_j")).alias("__sj"),
                         F.sum(d38("ps_ij")).alias("__sij")))
    num = (F.col("__n") * F.col("__sij")
           - F.col("__si") * F.col("__sj")).cast("decimal(38,0)")
    den = (F.col("__n") * F.col("__n")).cast("decimal(38,0)")
    sign = (F.when(num < 0, F.lit(-1)).otherwise(F.lit(1))).cast("long")
    return (sums.withColumn("__num", num).withColumn("__den", den)
                .select("i", "j",
                        F.col("__n").cast("long").alias("n"),
                        F.col("__si").cast("long").alias("s_i"),
                        F.col("__sj").cast("long").alias("s_j"),
                        F.col("__sij").cast("long").alias("s_ij"),
                        F.when(F.col("__den") == 0,
                               F.lit(None).cast("long"))
                         .otherwise(sign * F.expr(
                             "abs(__num) div __den").cast("long"))
                         .alias("cov_e6")))


def pca_project(df: DataFrame, vec_col: str = "embedding",
                k: int = 8, scale: int = 1000,
                out_col: str = "pca") -> DataFrame:
    """Project vectors onto the top-k principal components of their own
    covariance.

    The dim×dim covariance is assembled from embedding_covariance's
    exact integers (ONE bounded collect of dim(dim+1)/2 rows — model-
    sized, never data-sized), eigendecomposed on the driver with
    numpy.linalg.eigh (symmetric, deterministic for a fixed input
    matrix; each component's sign is canonicalized to a non-negative
    largest-|loading| entry so reruns agree), and the k×dim component
    matrix returns to the executors as a BROADCAST numpy constant
    inside a mapInPandas projection kernel — X_centered @ W^T per Arrow
    batch. Appends ``out_col`` as array<double> rounded to 6 digits.
    Eigenvectors are float by nature, so this is a tested operator, not
    an oracle query (no SQL engine eigendecomposes).
    """
    import numpy as np
    import pandas as pd

    cov_rows = embedding_covariance(df, vec_col, scale=scale) \
        .select("i", "j", "n", "s_i", "s_j", "s_ij").collect()
    d = max(r.j for r in cov_rows)
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}]")
    n = cov_rows[0].n
    C = np.zeros((d, d))
    mu = np.zeros(d)
    for r in cov_rows:
        c = (r.n * r.s_ij - r.s_i * r.s_j) / (r.n * r.n * scale * scale)
        C[r.i - 1, r.j - 1] = C[r.j - 1, r.i - 1] = c
        mu[r.i - 1] = r.s_i / (r.n * scale)
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:k]
    W = vecs[:, order].T                       # k × d
    for r in range(k):                         # canonical sign
        j = int(np.argmax(np.abs(W[r])))
        if W[r, j] < 0:
            W[r] = -W[r]
    sess = df.sparkSession
    bW = sess.sparkContext.broadcast(W)
    bmu = sess.sparkContext.broadcast(mu)
    out_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in df.schema.fields)

    def project(batches):
        Wl, mul = bW.value, bmu.value
        for pdf in batches:
            X = np.asarray(
                [v if v is not None and len(v) == len(mul)
                 else mul for v in pdf[vec_col]], dtype=np.float64)
            P = np.round((X - mul) @ Wl.T, 6)
            pdf = pdf.copy()
            pdf[out_col] = [row.tolist() for row in P]
            yield pdf

    return df.mapInPandas(
        project, schema=f"{out_fields}, {out_col} array<double>")


def rademacher_projection(df: DataFrame, vec_col: str = "embedding",
                          out_dim: int = 16, seed: int = 42,
                          scale: int = 1000,
                          out_col: str = "sketch") -> DataFrame:
    """Johnson-Lindenstrauss sketch with a ±1 (Rademacher) projection
    matrix — the data-INDEPENDENT dimensionality reduction next to
    pca_project's data-dependent one: distances are preserved within
    (1±ε) whp, no training pass, and any worker can regenerate the
    matrix from the seed (nothing to ship or store).

    Exactness: components quantize to q = floor(x·scale + 0.5) and the
    plane entries are ±1 from the PARITY OF A HEX DIGIT of
    md5('<seed>:<k>:<i>') — so each output coordinate is an exact
    integer sum the SQL oracle replays digit-for-digit (a Gaussian
    matrix would be float-order-dependent; Rademacher loses nothing:
    Achlioptas 2001 shows ±1 entries satisfy the JL lemma). Appends
    ``out_col`` array<long>, length out_dim, sketch[k] = Σ_i s(k,i)·q_i.

    Pure Column expressions — the signs are k·dim inline literals
    (same pattern as the SRP hyperplanes), the dot products are
    aggregate() HOFs; no Python, no shuffle, fuses into the scan.
    """
    import hashlib

    def sign(k: int, i: int) -> int:
        h = hashlib.md5(f"{seed}:{k}:{i}".encode()).hexdigest()
        return 1 if int(h[0], 16) % 2 == 0 else -1

    v = F.col(vec_col)
    dim_probe = df.select(F.size(vec_col)).where(v.isNotNull()).first()
    if dim_probe is None:
        raise ValueError("cannot infer dim from an all-null column")
    dim = dim_probe[0]
    q = F.transform(v, lambda x: F.floor(x.cast("double") * scale + 0.5)
                    .cast("long"))
    outs = []
    for k in range(out_dim):
        signs = F.array(*[F.lit(sign(k, i)) for i in range(dim)])
        outs.append(F.aggregate(
            F.zip_with(q, signs, lambda a, b: a * b.cast("long")),
            F.lit(0).cast("long"), lambda acc, x: acc + x))
    return df.withColumn(out_col, F.array(*outs))
