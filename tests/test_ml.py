"""ML pair tests: train/persist/load/infer + fallback (SURVEY section 2.9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from real_time_financial_lakehouse_spark.catalog import load_table
from real_time_financial_lakehouse_spark.ml import regression as R
from real_time_financial_lakehouse_spark.operators.relational import positive_filter
from real_time_financial_lakehouse_spark.operators.silver import sliding_window_agg

@pytest.fixture(scope="module")
def silver_df(spark):
    agg = sliding_window_agg(load_table(spark, SF_SMOKE, "events"))
    return positive_filter(agg).cache()

def test_train_save_load_infer_roundtrip(spark, silver_df, tmp_path):
    model = R.train(silver_df)
    path = str(tmp_path / "model")
    R.save_model(model, path)
    loaded = R.load_model(path)
    assert loaded.coefficients[0] == pytest.approx(model.coefficients[0])
    scored = R.infer(loaded, silver_df)
    assert "predicted_price" in scored.columns
    assert scored.count() == silver_df.count()
    # predictions follow the linear form
    row = scored.select("volatility", "predicted_price").first()
    expected = model.intercept + model.coefficients[0] * row["volatility"]
    assert row["predicted_price"] == pytest.approx(expected, rel=1e-9)

def test_train_guard_raises_below_minimum(spark, silver_df):
    with pytest.raises(ValueError):
        R.train(silver_df.limit(3))

def test_infer_fallback_without_model(spark, silver_df):
    out = R.infer_with_fallback(None, silver_df)
    assert out.filter(F.col("predicted_price") != 0.0).count() == 0

def test_infer_fallback_on_bad_model(spark, silver_df):
    class Broken:
        def transform(self, df):
            raise RuntimeError("boom")

    out = R.infer_with_fallback(Broken(), silver_df)
    assert out.filter(F.col("predicted_price") != 0.0).count() == 0

def test_closed_form_matches_mllib(spark):
    """The SQL-expressible OLS twin must agree with pyspark.ml's solver on
    a non-degenerate frame (the sf0.001 sliding windows are mostly
    single-event, so volatility is constant-zero there -- a singular fit)."""
    rows = [(float(i % 17), 3.0 * (i % 17) + 7.0) for i in range(100)]
    df = spark.createDataFrame(rows, ["volatility", "average_price"]).withColumn(
        "symbol", F.lit("all")
    )
    model = R.train(df)
    glob = R.ols_closed_form(df.select("symbol", "volatility", "average_price")).collect()[0]
    assert glob["slope"] == pytest.approx(3.0, abs=1e-6)
    assert glob["intercept"] == pytest.approx(7.0, abs=1e-6)
    assert glob["slope"] == pytest.approx(float(model.coefficients[0]), rel=1e-6)
    assert glob["intercept"] == pytest.approx(float(model.intercept), rel=1e-6)

def test_closed_form_constant_feature_yields_null(spark, silver_df):
    """var_pop == 0 -> NULL slope/intercept, engine and oracle alike."""
    const = silver_df.select(
        "symbol", F.lit(0.0).alias("volatility"), "average_price"
    )
    out = R.ols_closed_form(const).collect()
    assert all(r["slope"] is None and r["intercept"] is None for r in out)

def test_fit_once_caches_loaded_model(spark):
    """fit_once trains + saves + loads exactly once per (session, sf_dir);
    the second call returns the cached loaded model without refitting."""
    rows = [(float(i % 17), 3.0 * (i % 17) + 7.0) for i in range(100)]
    df = spark.createDataFrame(rows, ["volatility", "average_price"])
    m1 = R.fit_once(spark, "test-fit-once-key", df)
    m2 = R.fit_once(spark, "test-fit-once-key", df.limit(0))  # would fail to train
    assert m1 is m2
    from pyspark.ml.regression import LinearRegressionModel

    assert isinstance(m1, LinearRegressionModel)  # the LOADED artifact, not the fit
