"""Distributed one-pass PCA (operators/pca.py) vs numpy reference."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vechord_spark.operators.pca import fit_pca, project_pca


@pytest.fixture()
def corr_data(spark):
    """Synthetic data with a known dominant direction."""
    rng = np.random.default_rng(5)
    base = rng.normal(size=(400, 2))
    # embed a 2-D latent into 8 dims with fixed loadings + small noise
    load = rng.normal(size=(2, 8))
    x = base @ load + 0.05 * rng.normal(size=(400, 8))
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "id long, vec array<double>",
    )
    return x, df


def test_fit_matches_numpy(corr_data):
    x, df = corr_data
    model = fit_pca(df, "vec", k=3)
    mu = x.mean(axis=0)
    cov = np.cov(x, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    want = evecs[:, order].T
    assert np.allclose(model.mean, mu, atol=1e-9)
    for i in range(3):
        w = want[i]
        j = int(np.argmax(np.abs(w)))
        if w[j] < 0:
            w = -w
        assert np.allclose(model.components[i], w, atol=1e-7), i
    # 2-D latent + tiny noise: two components explain ~everything
    assert model.explained[0] + model.explained[1] > 0.99
    assert model.explained[0] >= model.explained[1] >= model.explained[2]


def test_projection_matches_numpy_and_stays_jvm(corr_data):
    x, df = corr_data
    model = fit_pca(df, "vec", k=2)
    out = project_pca(df, "vec", model, out_col="pca")
    got = {r.id: np.array(r.pca) for r in out.collect()}
    want = (x - x.mean(axis=0)) @ model.components.T
    for i in range(x.shape[0]):
        assert np.allclose(got[i], want[i], atol=1e-7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan  # projection is pure Column math
    assert "BatchEvalPython" not in plan


def test_fit_partitioning_robust(corr_data):
    x, df = corr_data
    m1 = fit_pca(df.coalesce(1), "vec", k=2)
    m2 = fit_pca(df.repartition(7), "vec", k=2)
    assert np.allclose(m1.components, m2.components, atol=1e-8)
    assert np.allclose(m1.explained, m2.explained, atol=1e-10)


def test_fit_validates(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, vec array<double>")
    with pytest.raises(ValueError):
        fit_pca(df, "vec", k=5)
    with pytest.raises(ValueError):
        fit_pca(df, "vec", k=1)  # n < 2
