"""Scoring surface (U1-U6) — stub/HF engine selection and failure
semantics. The real-model path is capability-gated exactly like the
transformWithStateInPandas variant: its pytest runs only where the
transformers stack + weights exist, and the STUB path must stay
byte-identical to what the q32 oracle checks regardless."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from etl_btc_spark.operators import scoring as SC


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                # len 29 ("x" * 29) trips the stub's simulated failure
                "text": ["bullish breakout", "x" * 29, "bearish slide", "flat"],
            }
        )
    )


def test_stub_default_unchanged_and_null_semantics(spark, docs):
    """engine defaults to the stub scorers — the oracle-checked path.
    A stub failure row NULLs that model everywhere, and a row where
    every model fails is dropped by the >=1-success rule."""
    out = SC.score_documents(docs).orderBy("doc_id").collect()
    # doc 2 (len 29): len % 29 == 0 for ALL salts -> every model NULL
    assert [r["doc_id"] for r in out] == [1, 3, 4]
    expect = SC.stub_model_fn(pd.Series(["bullish breakout"]), salt=0)
    assert out[0]["cryptobert_label"] == expect["label"].iloc[0]
    assert out[0]["cryptobert_score"] == pytest.approx(expect["score"].iloc[0])


def test_auto_engine_falls_back_to_stub_when_hf_missing(spark, docs):
    if SC.hf_available("cryptobert"):
        pytest.skip("transformers present: auto selects the real path here")
    stub = SC.score_documents(docs).orderBy("doc_id").collect()
    auto = SC.score_documents(docs, engine="auto").orderBy("doc_id").collect()
    assert [tuple(r) for r in auto] == [tuple(r) for r in stub]


def test_hf_engine_fails_fast_when_unavailable(spark, docs):
    if SC.hf_available("cryptobert"):
        pytest.skip("transformers present: engine='hf' would run for real")
    with pytest.raises(RuntimeError, match="transformers"):
        SC.score_documents(docs, engine="hf")


def test_custom_model_fn_failure_rows_null(spark, docs):
    """U6 with an injected kernel: a model_fn that fails half its rows
    must NULL exactly those rows through the struct UDF."""
    def flaky(texts: pd.Series) -> pd.DataFrame:
        out = pd.DataFrame(
            {"label": ["Positive"] * len(texts), "score": [0.5] * len(texts)}
        )
        bad = texts.str.len() > 10
        out.loc[bad.to_numpy(), "label"] = None
        out.loc[bad.to_numpy(), "score"] = None
        out.index = texts.index
        return out

    udf = SC.sentiment_udf(model_fn=flaky)
    got = (
        docs.select("doc_id", udf(F.col("text")).alias("s"))
        .select("doc_id", "s.label", "s.score")
        .orderBy("doc_id")
        .collect()
    )
    assert [(r["label"], r["score"]) for r in got] == [
        (None, None),  # len 16
        (None, None),  # len 29
        (None, None),  # len 13
        ("Positive", 0.5),  # len 4
    ]


@pytest.mark.skipif(
    not SC.hf_available("cryptobert"),
    reason="transformers stack / local weights absent (documented env gap)",
)
def test_hf_real_path_schema_and_null_on_failure(spark, docs):
    """Gated like stateful's tws test: the REAL pipeline must return
    the declared struct schema, remapped labels, and NULL-only-the-bad
    -row semantics."""
    out = SC.score_documents(docs, engine="hf", models=("cryptobert", "finbert"))
    kinds = dict(out.dtypes)
    assert kinds["cryptobert_label"] == "string"
    assert kinds["cryptobert_score"] == "double"
    rows = out.collect()
    assert 0 < len(rows) <= 4
    for r in rows:
        for m in ("cryptobert", "finbert"):
            lab = r[f"{m}_label"]
            assert lab is None or lab in ("Positive", "Negative", "Neutral")
            sc = r[f"{m}_score"]
            assert sc is None or 0.0 <= sc <= 1.0
