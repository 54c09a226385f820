"""PCA / Gram-matrix decomposition operators vs numpy references.

The Gram matrix is the one-pass partial-aggregate shape (each Arrow batch
collapses to d x d before the shuffle); integer mode must be EXACT (the
drift-proof driver-gate contract used by q38's 'gram' part)."""

import numpy as np
import pytest

from duckdb_ddsketch_spark.operators import decomposition as dec


@pytest.fixture(scope="module")
def anisotropic(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(400, 6)) @ np.diag([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(400)]
    rows.append((999, None))  # NULL vector
    rows.append((1000, [1.0, 2.0]))  # ragged vector
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(5)
    return X, df


def test_gram_matrix_matches_numpy(spark, anisotropic):
    X, df = anisotropic
    g = {(r.i, r.j): r.g for r in dec.gram_matrix(df, dims=6).collect()}
    G = X.T @ X
    assert len(g) == 36
    for i in range(6):
        for j in range(6):
            assert g[(i, j)] == pytest.approx(G[i, j], rel=1e-9)


def test_gram_matrix_integer_exact_any_partitioning(spark):
    rng = np.random.default_rng(11)
    Xi = rng.integers(-127, 128, size=(300, 5)).astype(np.int64)
    rows = [(int(i), [int(x) for x in Xi[i]]) for i in range(300)]
    Gi = Xi.T @ Xi
    for parts in (1, 7):
        df = spark.createDataFrame(
            rows, "vec_id long, qcodes array<int>"
        ).repartition(parts)
        g = {
            (r.i, r.j): r.g
            for r in dec.gram_matrix(df, "qcodes", dims=5, integer=True).collect()
        }
        assert all(g[(i, j)] == Gi[i, j] for i in range(5) for j in range(5))


def test_pca_components_match_numpy(spark, anisotropic):
    X, df = anisotropic
    mean, comps, ev = dec.pca_components(df, k=3, dims=6)
    mu = X.mean(axis=0)
    w, v = np.linalg.eigh(np.cov(X, rowvar=False, ddof=1))
    order = np.argsort(w)[::-1][:3]
    ref = v[:, order].T
    flip = np.sign(ref[np.arange(3), np.abs(ref).argmax(axis=1)])
    ref = ref * flip[:, None]
    assert np.allclose(mean, mu, atol=1e-9)
    assert np.allclose(np.array(ev), w[order], rtol=1e-9)
    assert np.allclose(np.array(comps), ref, atol=1e-8)
    # orthonormal
    W = np.array(comps)
    assert np.allclose(W @ W.T, np.eye(3), atol=1e-9)


def test_pca_project_matches_numpy_and_nulls(spark, anisotropic):
    X, df = anisotropic
    mean, comps, ev = dec.pca_components(df, k=3, dims=6)
    got = {r.vec_id: r.pc for r in dec.pca_project(df, mean, comps).collect()}
    refp = (X - np.array(mean)) @ np.array(comps).T
    for i in range(400):
        assert np.allclose(got[i], refp[i], atol=1e-8)
    # NULL and ragged vectors -> NULL column, never an array of NULLs
    assert got[999] is None and got[1000] is None
    # projected variance reproduces the eigenvalues, in order
    P = np.array([got[i] for i in range(400)])
    pv = P.var(axis=0, ddof=1)
    assert pv[0] > pv[1] > pv[2]
    assert np.allclose(pv, ev, rtol=1e-6)


def test_pca_validation_errors(spark, anisotropic):
    _, df = anisotropic
    with pytest.raises(ValueError, match="k must be"):
        dec.pca_components(df, k=7, dims=6)
    with pytest.raises(ValueError, match="same width"):
        dec.pca_project(df, [0.0] * 6, [[1.0, 0.0]])
    tiny = df.limit(0)
    with pytest.raises(ValueError):
        dec.pca_components(tiny, k=1, dims=6)


def test_pca_whiten_unit_variance(spark, anisotropic):
    X, df = anisotropic
    mean, comps, ev = dec.pca_components(df, k=3, dims=6)
    got = {
        r.vec_id: r.pc
        for r in dec.pca_project(df, mean, comps, whiten=ev).collect()
    }
    P = np.array([got[i] for i in range(400)])
    assert np.allclose(P.var(axis=0, ddof=1), np.ones(3), rtol=1e-9)
    with pytest.raises(ValueError, match="one explained-variance"):
        dec.pca_project(df, mean, comps, whiten=ev[:2])
    with pytest.raises(ValueError, match="> 0"):
        dec.pca_project(df, mean, comps, whiten=[1.0, 0.0, 1.0])


def test_out_col_collisions_rejected(spark):
    """ADVICE r7: pca_project silently clobbered an existing out_col via
    withColumn, and mahalanobis_scores projected into a hardcoded
    '__maha_pc' temp — both must reject (or avoid) collisions instead of
    overwriting user data."""
    df = spark.createDataFrame(
        [(0, [1.0, 2.0], "keep")], "vec_id long, embedding array<double>, pc string"
    )
    with pytest.raises(ValueError, match="already exists"):
        dec.pca_project(df, [0.0, 0.0], [[1.0, 0.0]], out_col="pc")
    with pytest.raises(ValueError, match="already exists"):
        dec.mahalanobis_scores(df.withColumnRenamed("pc", "maha_sq"))
    # a pre-existing __maha_pc column is user data, not ours to clobber
    rng = np.random.default_rng(5)
    rows = [(int(i), [float(x) for x in rng.normal(size=2)], "u") for i in range(50)]
    df2 = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, __maha_pc string"
    )
    out = dec.mahalanobis_scores(df2)
    assert set(out.columns) == {"vec_id", "embedding", "__maha_pc", "maha_sq"}
    assert out.where("__maha_pc = 'u'").count() == 50


def test_mahalanobis_matches_numpy(spark, anisotropic):
    X, df = anisotropic
    got = {r.vec_id: r.maha_sq for r in dec.mahalanobis_scores(df).collect()}
    mu = X.mean(axis=0)
    prec = np.linalg.inv(np.cov(X, rowvar=False, ddof=1))
    ref = np.einsum("ij,jk,ik->i", X - mu, prec, X - mu)
    for i in range(400):
        assert got[i] == pytest.approx(ref[i], rel=1e-6)
    # NULL / ragged rows score NULL; schema keeps original columns
    assert got[999] is None and got[1000] is None


def test_mahalanobis_degenerate_dimension(spark):
    # a constant dimension has ~zero variance; the floor must drop it
    # instead of exploding the inverse
    rng = np.random.default_rng(3)
    X = rng.normal(size=(200, 3))
    rows = [
        (int(i), [float(X[i, 0]), 7.5, float(X[i, 1]), float(X[i, 2])])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r.maha_sq for r in dec.mahalanobis_scores(df).collect()}
    mu = X.mean(axis=0)
    prec = np.linalg.inv(np.cov(X, rowvar=False, ddof=1))
    ref = np.einsum("ij,jk,ik->i", X - mu, prec, X - mu)
    for i in range(200):
        assert got[i] == pytest.approx(ref[i], rel=1e-5)


def test_gram_property_random_matrices(spark):
    """Randomized widths/values/partitionings: integer gram must equal
    numpy EXACTLY, float gram to 1e-9 relative — deterministic across
    partition counts (hypothesis-style sweep; a session-scoped fixture
    and @given compose badly, so the sweep is explicit)."""
    rng = np.random.default_rng(123)
    for trial in range(8):
        n = int(rng.integers(2, 120))
        d = int(rng.integers(1, 9))
        parts = int(rng.integers(1, 9))
        Xi = rng.integers(-(2**15) + 1, 2**15, size=(n, d)).astype(np.int64)
        rows = [(int(i), [int(x) for x in Xi[i]]) for i in range(n)]
        df = spark.createDataFrame(
            rows, "vec_id long, qcodes array<int>"
        ).repartition(parts)
        g = {
            (r.i, r.j): r.g
            for r in dec.gram_matrix(df, "qcodes", dims=d, integer=True).collect()
        }
        G = Xi.T @ Xi
        assert len(g) == d * d, (trial, n, d, parts)
        bad = [(i, j) for i in range(d) for j in range(d) if g[(i, j)] != G[i, j]]
        assert not bad, (trial, n, d, parts, bad[:3])


def test_gram_matrix_nonfinite_rows_dropped(spark):
    """A NaN/inf component must drop ITS row, not poison every G[i][j]
    through the accumulated matmul (and in integer mode np.rint(NaN)
    .astype(int64) is undefined — silent INT64_MIN garbage)."""
    clean = [(0, [1.0, 2.0]), (1, [3.0, 4.0]), (2, [5.0, 6.0])]
    dirty = clean + [
        (3, [1.0, float("nan")]),
        (4, [float("inf"), 1.0]),
        (5, [1.0, float("-inf")]),
    ]
    Xc = np.array([v for _, v in clean])
    G = Xc.T @ Xc
    df = spark.createDataFrame(
        dirty, "vec_id long, embedding array<double>"
    ).repartition(2)
    g = {(r.i, r.j): r.g for r in dec.gram_matrix(df, dims=2).collect()}
    assert all(
        g[(i, j)] == pytest.approx(G[i, j]) for i in range(2) for j in range(2)
    )
    gi = {
        (r.i, r.j): r.g
        for r in dec.gram_matrix(df, dims=2, integer=True).collect()
    }
    assert all(
        gi[(i, j)] == int(G[i, j]) for i in range(2) for j in range(2)
    )
    # mahalanobis over the same dirty frame: finite rows score finite,
    # non-finite rows score NaN/NULL-ish, nothing raises
    scored = dec.mahalanobis_scores(df, dims=2).collect()
    finite = {r.vec_id: r.maha_sq for r in scored if r.vec_id <= 2}
    assert all(v is not None and np.isfinite(v) for v in finite.values())


def test_gram_matrix_explicit_dims_skips_ragged_probe(spark):
    """dims= is authoritative: a ragged row must be skipped per batch,
    never turned into a partition-order-dependent ValueError by the
    width probe (the probe only runs when dims is None)."""
    rows = [(0, [9.0, 9.0, 9.0])] + [
        (i, [float(i), float(2 * i)]) for i in range(1, 6)
    ]
    # single partition with the ragged width-3 row FIRST: the old
    # probe-then-validate path raised here
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).coalesce(1)
    X = np.array([v for _, v in rows[1:]])
    G = X.T @ X
    g = {(r.i, r.j): r.g for r in dec.gram_matrix(df, dims=2).collect()}
    assert all(
        g[(i, j)] == pytest.approx(G[i, j]) for i in range(2) for j in range(2)
    )


def test_mahalanobis_stats_seam(spark, anisotropic):
    """stats=(mean, components, variances) skips the pca_components scan
    and must score identically to handing the SAME stats through the
    internal path — the calibrate-once/apply-many seam the q38 'maha'
    driver gate stands on."""
    X, df = anisotropic
    mean, comps, ev = dec.pca_components(df, k=X.shape[1], dims=X.shape[1])
    via_stats = {
        r.vec_id: r.maha_sq
        for r in dec.mahalanobis_scores(df, stats=(mean, comps, ev)).collect()
    }
    internal = {
        r.vec_id: r.maha_sq for r in dec.mahalanobis_scores(df).collect()
    }
    for i in range(400):
        # identical literals -> identical plan -> bit-identical scores
        assert via_stats[i] == internal[i]
    # the variance_floor applies to supplied variances identically:
    # flooring out every direction but one leaves the 1-dim score
    one_dir = dec.mahalanobis_scores(
        df, stats=(mean, comps[:1], ev[:1])
    ).collect()
    w = np.array(comps[0]) / np.sqrt(ev[0])
    proj = (X - np.array(mean)) @ w
    got = {r.vec_id: r.maha_sq for r in one_dir}
    for i in range(400):
        assert got[i] == pytest.approx(proj[i] ** 2, rel=1e-6)
    # mismatched lengths are rejected loudly
    with pytest.raises(ValueError):
        dec.mahalanobis_scores(df, stats=(mean, comps, ev[:-1]))
