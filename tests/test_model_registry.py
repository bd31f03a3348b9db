"""Model persistence + registry: save/load roundtrip, resume-without-truth."""

from __future__ import annotations

import shutil

import numpy as np
import pandas as pd
import pytest

from capelinker_spark.ml.logistic import LogisticModel, train_logistic
from capelinker_spark.ml.registry import ModelStore, model_features, train_registry_model


def _toy_labeled(n=300, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.random(n) < 0.3
    return pd.DataFrame(
        {
            "mlastdist": np.where(y, rng.normal(0.05, 0.02, n), rng.normal(0.5, 0.1, n)),
            "mfirstdist": np.where(y, rng.normal(0.1, 0.05, n), rng.normal(0.6, 0.15, n)),
            "wfirstdist": np.where(y, rng.normal(0.1, 0.05, n), rng.normal(0.5, 0.2, n)),
            "yeardist": np.where(y, 2.0, rng.normal(0, 10, n)),
            "correct": y.astype(float),
        }
    )


def test_save_load_roundtrip(tmp_path):
    pdf = _toy_labeled()
    m = train_logistic(pdf, ["mlastdist", "mfirstdist"], seed=1)
    p = str(tmp_path / "m.json")
    m.save(p)
    m2 = LogisticModel.load(p)
    assert m2.features == m.features
    got = m2.predict_pdf(pdf)
    exp = m.predict_pdf(pdf)
    assert np.allclose(got, exp)


def test_registry_model_training():
    pdf = _toy_labeled()
    m = train_registry_model("m_rf_baptisms_sparse", pdf)
    # all four declared features are present in the toy frame
    assert m.features == model_features("m_rf_baptisms_sparse")
    p = m.predict_pdf(pdf)
    auc_proxy = p[pdf["correct"] == 1].mean() - p[pdf["correct"] == 0].mean()
    assert auc_proxy > 0.5
    with pytest.raises(KeyError):
        model_features("opgaafrol_full")  # the reference's phantom model name


def test_model_store(tmp_path):
    store = ModelStore(str(tmp_path / "models"))
    pdf = _toy_labeled()
    m = train_registry_model("m_rf_baptisms_sparse", pdf)
    store.save("m_rf_baptisms_sparse", m)
    assert store.names() == ["m_rf_baptisms_sparse"]
    back = store.load("m_rf_baptisms_sparse")
    assert back.features == m.features
    with pytest.raises(KeyError):
        store.load("nope")


def test_pipeline_resume_without_truth(spark, pages, truth, tmp_path_factory):
    """After one full run, a resumed pipeline needs NO truth table: the
    trained model is checkpointed alongside the stages."""
    from capelinker_spark.pipeline import LinkagePipeline, PipelineConfig

    wd = str(tmp_path_factory.mktemp("resume_no_truth"))
    first = LinkagePipeline(spark, wd, PipelineConfig()).run(pages, truth, resume=False)
    links_before = {
        (r["persid_from"], r["persid_to"])
        for r in first["links"].select("persid_from", "persid_to").collect()
    }
    for stage in ("scores", "links", "clusters"):
        shutil.rmtree(f"{wd}/{stage}", ignore_errors=True)
    second = LinkagePipeline(spark, wd, PipelineConfig()).run(
        pages, truth=None, resume=True
    )
    links_after = {
        (r["persid_from"], r["persid_to"])
        for r in second["links"].select("persid_from", "persid_to").collect()
    }
    assert links_after == links_before
