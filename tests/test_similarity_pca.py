"""Covariance / PCA operators: the distributed augmented-Gram pass and
the driver-side fit are checked against independent numpy linear
algebra on the same rows, and the projection against a hand-computed
numpy projection — the same external-implementation oracle contract
the registry's embedding_pca DuckDB oracle enforces at sf0.01."""

import numpy as np
import pytest

from gbdc_spark.operators.similarity import (
    _fix_sign,
    embedding_covariance,
    pca_fit,
    pca_project,
)


def _mat(seed: int = 7, n: int = 60, d: int = 6) -> np.ndarray:
    rng = np.random.RandomState(seed)
    # anisotropic on purpose: distinct eigenvalues so eigh ordering and
    # sign conventions are exercised on a well-posed problem
    scales = np.linspace(3.0, 0.3, d)
    return (rng.randn(n, d) * scales).astype(np.float32)


@pytest.fixture(scope="module")
def emb_df(spark):
    X = _mat()
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id: long, embedding: array<float>",
    )


def _np_cov(X: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    Xd = X.astype(np.float64)
    mu = Xd.mean(axis=0)
    return mu, Xd.T @ Xd / len(Xd) - np.outer(mu, mu)


def test_embedding_covariance_matches_numpy(spark, emb_df):
    X = _mat()
    _, C = _np_cov(X)
    rows = embedding_covariance(emb_df, decimals=9).collect()
    assert len(rows) == 6 * 7 // 2
    for r in rows:
        assert r["i"] <= r["j"]
        assert r["cov"] == pytest.approx(C[r["i"], r["j"]], abs=2e-9)


def test_embedding_covariance_probe_matches_explicit(spark, emb_df):
    probed = {(r["i"], r["j"]): r["cov"] for r in embedding_covariance(emb_df).collect()}
    explicit = {(r["i"], r["j"]): r["cov"] for r in embedding_covariance(emb_df, dim=6).collect()}
    assert probed == explicit


def test_pca_fit_matches_numpy(spark, emb_df):
    X = _mat()
    mu, C = _np_cov(X)
    w, V = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:3]
    V = _fix_sign(V[:, order])

    fit = pca_fit(emb_df, k=3)
    assert np.allclose(fit["mean"], mu, atol=1e-9)
    assert np.allclose(fit["eigvals"], w[order], atol=1e-9)
    assert np.allclose(fit["components"], V.T, atol=1e-7)
    # contract: descending eigenvalues, orthonormal basis, sign-fixed
    assert fit["eigvals"] == sorted(fit["eigvals"], reverse=True)
    W = np.array(fit["components"])
    assert np.allclose(W @ W.T, np.eye(3), atol=1e-9)
    for comp in W:
        assert comp[int(np.argmax(np.abs(comp)))] > 0


def test_pca_project_matches_numpy(spark, emb_df):
    X = _mat().astype(np.float64)
    fit = pca_fit(emb_df, k=2)
    P = (X - np.array(fit["mean"])) @ np.array(fit["components"]).T
    got = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in pca_project(emb_df, fit["mean"], fit["components"]).collect()
    }
    assert len(got) == len(X)
    for i, (p1, p2) in got.items():
        assert p1 == pytest.approx(round(P[i, 0], 4), abs=1e-9)
        assert p2 == pytest.approx(round(P[i, 1], 4), abs=1e-9)


def test_pca_project_whitened_unit_variance(spark, emb_df):
    # whitening contract: each component's population variance becomes 1
    fit = pca_fit(emb_df, k=3)
    proj = pca_project(
        emb_df, fit["mean"], fit["components"], decimals=9,
        eigvals=fit["eigvals"],
    )
    rows = np.array([(r["pc1"], r["pc2"], r["pc3"]) for r in proj.collect()])
    assert np.allclose(rows.var(axis=0), 1.0, rtol=1e-6)
    with pytest.raises(ValueError):
        pca_project(emb_df, fit["mean"], fit["components"],
                    eigvals=fit["eigvals"][:2])


def test_pca_projection_variance_is_eigenvalue(spark, emb_df):
    # the defining property: the variance captured along component k IS
    # eigenvalue k (population), so the fit and projection agree
    fit = pca_fit(emb_df, k=2)
    proj = pca_project(emb_df, fit["mean"], fit["components"], decimals=9)
    rows = np.array([(r["pc1"], r["pc2"]) for r in proj.collect()])
    var = rows.var(axis=0)  # population, matches the fit's convention
    assert np.allclose(var, fit["eigvals"], rtol=1e-6)
